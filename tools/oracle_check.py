#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the Verify parquet
dumps (column names sorted, values compared cell-by-cell; floats exact and
with 1e-9 relative fallback reported separately).

Usage: oracle_check.py <sfdir> <verify_out>

Besides the stdout report, writes a machine-readable artifact
(AUDITS_LOCAL.json in the cwd, or $GRAFT_AUDITS_OUT) recording every
oracle compare, rows-only count, and audit verdict with counts — the
per-round evidence trail a judge can read without re-running anything
(committed as AUDITS_r{N}.json each round).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single files; Spark-written probe dirs
        # (ScaleUp's /tmp/sf1) are directories of part files
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # builder-side subset runs (SPARK_GRAFT_ONLY set) dump only the named
    # queries; skip the rest instead of flooding SPARK_DUMP_MISSING. The
    # driver never sets the var, so its gate keeps the loud failure.
    subset = os.environ.get("SPARK_GRAFT_ONLY")
    if subset:
        want = {s.strip() for s in subset.split(",") if s.strip()}
        oracle = {k: v for k, v in oracle.items() if k in want}
    results = {}
    rows_only = {}
    audits = {}

    def audit(name, ok, detail):
        audits[name] = {"pass": bool(ok), "detail": detail}
        print(f"{'PASS' if ok else 'FAIL'} {name}: {detail}")

    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            results[name] = f"SPARK_DUMP_MISSING: {e}"
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            results[name] = f"SCHEMA: oracle={list(exp.columns)} spark={list(got.columns)}"
            continue
        if len(exp) != len(got):
            results[name] = f"ROWS: oracle={len(exp)} spark={len(got)}"
            continue
        # sort rows by all columns for order-insensitive compare
        exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
        got = got.sort_values(by=list(got.columns), ignore_index=True)
        bad = None
        approx = 0
        for c in exp.columns:
            for i, (a, b) in enumerate(zip(exp[c], got[c])):
                if a is None and b is None:
                    continue
                af = isinstance(a, float)
                bf = isinstance(b, float)
                if af and bf and math.isnan(a) and math.isnan(b):
                    continue
                if a == b:
                    continue
                if af and bf and b != 0 and abs(a - b) / max(abs(a), abs(b)) < 1e-9:
                    approx += 1
                    continue
                bad = f"VALUE col={c} row={i}: oracle={a!r} spark={b!r}"
                break
            if bad:
                break
        results[name] = bad or ("OK" if approx == 0 else f"OK_APPROX({approx})")
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else 'FAIL'} {name}: {v}")
    # rows-only queries (no oracle): report row counts
    import glob, os
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            n = duckdb.connect().execute(
                f"SELECT COUNT(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            rows_only[name] = int(n)
            print(f"ROWS {name}: {n}")
    # One-sided SOUNDNESS bounds for approximate (rows-only) ops whose
    # OUTPUT is exactly checkable even though their candidate set is not:
    # d02 emits (id_a, id_b, jaccard) banded-candidate pairs — every
    # emitted pair must carry its true exact jaccard, be >= the gate
    # threshold, and therefore sit inside the full exact pair set. Recall
    # (the other half) stays with the banding-survival ScalaTest spec.
    norm = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
    d02 = f"{outdir}/d02_dedup_minhash"
    if os.path.isdir(d02):
        bad, n_pairs = con.execute(f"""
            WITH arrs AS (SELECT doc_id, string_split({norm}, ' ') AS arr
                          FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     array_to_string(arr[i:i+2], ' ') AS g
                   FROM arrs, unnest(generate_series(1,
                     greatest(len(arr) - 2, 1))) AS u(i)),
            sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
            spark_out AS (SELECT * FROM read_parquet('{d02}/*.parquet')),
            ix AS (SELECT o.id_a, o.id_b, o.jaccard, COUNT(*) AS i
                   FROM spark_out o
                     JOIN sh a ON a.doc_id = o.id_a
                     JOIN sh b ON b.doc_id = o.id_b AND a.g = b.g
                   GROUP BY 1, 2, 3),
            chk AS (SELECT o.id_a, o.id_b, o.jaccard,
                      CAST(COALESCE(i, 0) AS DOUBLE)
                        / (sa.sz + sb.sz - COALESCE(i, 0)) AS true_j
                    FROM spark_out o
                      LEFT JOIN ix USING (id_a, id_b, jaccard)
                      JOIN sz sa ON sa.doc_id = o.id_a
                      JOIN sz sb ON sb.doc_id = o.id_b)
            SELECT SUM(CASE WHEN abs(jaccard - true_j) > 1e-9
                         OR true_j < 0.02 THEN 1 ELSE 0 END),
                   COUNT(*) FROM chk""").fetchone()
        ok = (bad or 0) == 0 and n_pairs > 0
        audit("d02_soundness",
              ok, f"{n_pairs} emitted pairs, {bad or 0} with wrong/"
              f"below-threshold exact jaccard")
    # d03 emits (id_a, id_b, dist, sig_a, sig_b) — recompute every pair's
    # hamming from the exported signatures (independent xor + bit_count
    # path) and assert the <= 3 soundness bound. Completeness (pigeonhole
    # blocking loses nothing) stays with the DedupSpec ground truth.
    d03 = f"{outdir}/d03_dedup_simhash"
    if os.path.isdir(d03):
        bad3, n3 = con.execute(f"""
            SELECT SUM(CASE WHEN bit_count(xor(sig_a, sig_b)) != dist
                         OR dist > 3 OR id_a >= id_b THEN 1 ELSE 0 END),
                   COUNT(*)
            FROM read_parquet('{d03}/*.parquet')""").fetchone()
        ok3 = (bad3 or 0) == 0 and n3 > 0
        audit("d03_soundness",
              ok3, f"{n3} emitted pairs, {bad3 or 0} with hamming(sig_a, "
              f"sig_b) != dist or dist > 3")
    # d08 emits a per-id audit: (vec_id, kept, witness_id, witness_cos).
    # Every DROPPED id must carry a lower-id witness whose cosine,
    # recomputed here from the raw embedding vectors (independent of the
    # Spark kernel AND of the k-means cells), matches the export and
    # clears tau = 0.25 — proving each drop was justified. Kept rows must
    # carry no witness, and the audit must cover the corpus exactly.
    # Completeness (greedy rule applied exactly per cell) stays with the
    # DedupSpec ground truth.
    d08 = f"{outdir}/d08_semantic_dedup"
    if os.path.isdir(d08):
        bad8, n_drop, n_rows, n_corpus = con.execute(f"""
            WITH a AS (SELECT * FROM read_parquet('{d08}/*.parquet')),
            chk AS (SELECT a.vec_id, a.kept, a.witness_id, a.witness_cos,
                      list_cosine_similarity(e1.embedding, e2.embedding)
                        AS true_cos
                    FROM a
                      LEFT JOIN embeddings e1 ON e1.vec_id = a.vec_id
                      LEFT JOIN embeddings e2 ON e2.vec_id = a.witness_id)
            SELECT SUM(CASE
                     WHEN kept AND witness_id IS NOT NULL THEN 1
                     WHEN NOT kept AND (witness_id IS NULL
                       OR witness_id >= vec_id
                       OR true_cos IS NULL OR true_cos < 0.25
                       OR abs(true_cos - witness_cos) > 1e-6)
                       THEN 1 ELSE 0 END),
                   SUM(CASE WHEN NOT kept THEN 1 ELSE 0 END),
                   COUNT(*),
                   (SELECT COUNT(*) FROM embeddings)
            FROM chk""").fetchone()
        ok8 = ((bad8 or 0) == 0 and (n_drop or 0) > 0
               and n_rows == n_corpus)
        audit("d08_soundness",
              ok8, f"{n_rows} audit rows ({n_drop} drops) over {n_corpus} "
              f"vectors, {bad8 or 0} with a missing/invalid witness")
    # d13 emits (eval_id, train_id, jaccard) cross-split near-dup pairs —
    # every emitted pair must carry its true exact jaccard (recomputed
    # from raw text, 6-dp rounded like the gate), clear the 0.5 threshold,
    # and point eval -> train (eval = doc_id % 10 == 0). Recall stays with
    # the DedupSpec cross-split ground truth.
    d13 = f"{outdir}/d13_fuzzy_decontam"
    if os.path.isdir(d13):
        bad13, n13 = con.execute(f"""
            WITH arrs AS (SELECT doc_id, string_split({norm}, ' ') AS arr
                          FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     array_to_string(arr[i:i+2], ' ') AS g
                   FROM arrs, unnest(generate_series(1,
                     greatest(len(arr) - 2, 1))) AS u(i)),
            sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
            spark_out AS (SELECT * FROM read_parquet('{d13}/*.parquet')),
            ix AS (SELECT o.eval_id, o.train_id, o.jaccard, COUNT(*) AS i
                   FROM spark_out o
                     JOIN sh a ON a.doc_id = o.eval_id
                     JOIN sh b ON b.doc_id = o.train_id AND a.g = b.g
                   GROUP BY 1, 2, 3),
            chk AS (SELECT o.eval_id, o.train_id, o.jaccard,
                      CAST(COALESCE(i, 0) AS DOUBLE)
                        / (sa.sz + sb.sz - COALESCE(i, 0)) AS true_j
                    FROM spark_out o
                      LEFT JOIN ix USING (eval_id, train_id, jaccard)
                      JOIN sz sa ON sa.doc_id = o.eval_id
                      JOIN sz sb ON sb.doc_id = o.train_id)
            SELECT SUM(CASE WHEN abs(jaccard - true_j) > 1e-6
                         OR true_j < 0.5
                         OR eval_id % 10 != 0 OR train_id % 10 = 0
                         THEN 1 ELSE 0 END),
                   COUNT(*) FROM chk""").fetchone()
        ok13 = (bad13 or 0) == 0 and (n13 or 0) > 0
        audit("d13_soundness",
              ok13, f"{n13} emitted pairs, {bad13 or 0} with wrong "
              f"jaccard, below-threshold, or wrong split orientation")
    # ANN ordering soundness (s02/s03/s04, rows-only): the emitted
    # (probe, neighbor, rank) lists must agree with the TRUE cosine
    # order — rank r's true cosine >= rank r+1's (1e-9 slack for the
    # cross-engine fold), every neighbor id must exist, and ranks must
    # be contiguous from 1. Recall (the other half) stays with the
    # KnnSpec ground truth; this pins that whatever the candidate
    # generation surfaced was RANKED correctly at gate scale.
    def dot(a, b):
        return (f"list_reduce(list_transform(range(1, len({a})+1), "
                f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
                f"(s, x) -> s + x)")
    cos = (f"({dot('p.embedding', 'n.embedding')} / "
           f"(sqrt({dot('p.embedding', 'p.embedding')}) * "
           f"sqrt({dot('n.embedding', 'n.embedding')})))")
    # s07/s08/s09 share the schema AND the exact-refine contract (final
    # order IS true-cosine order), so the audit is even tighter there.
    for ann in ("s02_knn_lsh", "s03_knn_ivf", "s04_knn_graph",
                "s07_knn_pq", "s08_knn_ivfpq", "s09_incr_encode"):
        d = f"{outdir}/{ann}"
        if not os.path.isdir(d):
            continue
        inversions, n_rows, n_scored, bad_rank = con.execute(f"""
            WITH o AS (SELECT * FROM read_parquet('{d}/*.parquet')),
            sc AS (SELECT o.probe_id, o.rank, o.neighbor_id, {cos} AS cos
                   FROM o
                     JOIN embeddings p ON p.vec_id = o.probe_id
                     JOIN embeddings n ON n.vec_id = o.neighbor_id),
            inv AS (SELECT SUM(CASE WHEN a.cos < b.cos - 1e-9
                              THEN 1 ELSE 0 END) AS inversions
                    FROM sc a JOIN sc b
                      ON a.probe_id = b.probe_id AND b.rank = a.rank + 1),
            rk AS (SELECT SUM(CASE WHEN rank != rn THEN 1 ELSE 0 END)
                     AS bad_rank
                   FROM (SELECT rank, row_number() OVER (
                       PARTITION BY probe_id ORDER BY rank) AS rn
                     FROM o))
            SELECT (SELECT inversions FROM inv),
                   (SELECT COUNT(*) FROM o),
                   (SELECT COUNT(*) FROM sc),
                   (SELECT bad_rank FROM rk)""").fetchone()
        ok_ann = ((inversions or 0) == 0 and (bad_rank or 0) == 0
                  and n_rows == n_scored and (n_rows or 0) > 0)
        audit(f"{ann}_soundness",
              ok_ann, f"{n_rows} emitted rows, {inversions or 0} "
              f"true-cosine inversions, {bad_rank or 0} non-contiguous "
              f"ranks, {n_rows - n_scored} dangling neighbor ids")
    # Sketch audits (k01/k02/st09): since r17 the gates ALSO carry
    # exported-estimate SQL oracles (hash-exact above); these audits
    # stay as the independent error-CONTRACT check — recompute the
    # exact answers in DuckDB and assert each estimate inside its
    # published bound.
    k01 = f"{outdir}/k01_sketch_distinct"
    if os.path.isdir(k01):
        # exact columns must match DuckDB exactly; HLL within 5*rsd —
        # the rsd bound derives from the rsd COLUMN the gate emits (the
        # shared-constant discipline: a Scala-side knob tweak moves the
        # audit bound with it); series set must match exactly (inner
        # join == both side counts, the st09_audit guard) so a dropped
        # group can't pass silently
        badk1, nk1, no1, nx1 = con.execute(f"""
            WITH o AS (SELECT * FROM read_parquet('{k01}/*.parquet')),
            x AS (SELECT event_type AS series, COUNT(*) AS n,
                    COUNT(DISTINCT user_id) AS ndv
                  FROM events GROUP BY 1)
            SELECT (SELECT SUM(CASE WHEN o.n_rows != x.n
                         OR o.ndv_exact != x.ndv
                         OR abs(o.ndv_hll - x.ndv) > 5 * o.rsd * x.ndv
                         THEN 1 ELSE 0 END)
                    FROM o JOIN x USING (series)),
                   (SELECT COUNT(*) FROM o JOIN x USING (series)),
                   (SELECT COUNT(*) FROM o),
                   (SELECT COUNT(*) FROM x)""").fetchone()
        okk1 = ((badk1 or 0) == 0 and (nk1 or 0) > 0
                and nk1 == no1 and nk1 == nx1)
        audit("k01_audit",
              okk1, f"{nk1} series matched of {no1} dumped / {nx1} "
              f"exact, {badk1 or 0} with wrong exact columns or HLL "
              f"outside 5*rsd")
    k02 = f"{outdir}/k02_sketch_quantiles"
    if os.path.isdir(k02):
        # each estimate's exact rank window [count(<q), count(<=q)] must
        # intersect target_rank +- n/accuracy (+1 discretization slack);
        # the window size derives from the accuracy COLUMN the gate
        # emits (k01's rsd-column rule)
        badk2, nk2, no2, nx2 = con.execute(f"""
            WITH o AS (SELECT * FROM read_parquet('{k02}/*.parquet')),
            m AS (SELECT series, n_rows, accuracy, 0.50 AS p, p50 AS qv
                    FROM o
                  UNION ALL
                  SELECT series, n_rows, accuracy, 0.90, p90 FROM o
                  UNION ALL
                  SELECT series, n_rows, accuracy, 0.99, p99 FROM o),
            x AS (SELECT event_type AS series, COUNT(value) AS n
                  FROM events GROUP BY 1),
            rk AS (SELECT m.series, m.p, m.qv, m.n_rows, m.accuracy, x.n,
                     CAST(SUM(CASE WHEN e.value <= m.qv THEN 1 ELSE 0
                       END) AS BIGINT) AS r_le,
                     CAST(SUM(CASE WHEN e.value < m.qv THEN 1 ELSE 0
                       END) AS BIGINT) AS r_lt
                   FROM m
                     JOIN x USING (series)
                     JOIN events e ON e.event_type = m.series
                   GROUP BY 1, 2, 3, 4, 5, 6)
            SELECT (SELECT SUM(CASE WHEN n_rows != n
                         OR r_lt > p * n + n / accuracy + 1
                         OR r_le < p * n - n / accuracy - 1
                         THEN 1 ELSE 0 END) FROM rk),
                   (SELECT COUNT(*) FROM rk),
                   (SELECT 3 * COUNT(*) FROM o),
                   (SELECT 3 * COUNT(*) FROM x)""").fetchone()
        okk2 = ((badk2 or 0) == 0 and (nk2 or 0) > 0
                and nk2 == no2 and nk2 == nx2)
        audit("k02_audit",
              okk2, f"{nk2} quantile estimates matched of {no2} dumped "
              f"/ {nx2} exact, {badk2 or 0} outside the n/accuracy rank "
              f"window or with wrong counts")
    st09 = f"{outdir}/st09_sketch_stream"
    if os.path.isdir(st09):
        # per-day exact ndv recomputed over the same UTC day truncation;
        # n_rows exact, HLL inside 5*rsd — bound derived from the rsd
        # COLUMN the gate emits (k01's rule); window set must match
        # exactly (inner-join count == both side counts)
        badst9, nst9, no9, nx9 = con.execute(f"""
            WITH o AS (SELECT * FROM read_parquet('{st09}/*.parquet')),
            x AS (SELECT event_type AS series,
                    strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
                      '%Y-%m-%d') AS day,
                    COUNT(*) AS n, COUNT(DISTINCT user_id) AS ndv
                  FROM events GROUP BY 1, 2)
            SELECT (SELECT SUM(CASE WHEN o.n_rows != x.n
                         OR abs(o.ndv_hll - x.ndv) > 5 * o.rsd * x.ndv
                         THEN 1 ELSE 0 END)
                    FROM o JOIN x USING (series, day)),
                   (SELECT COUNT(*) FROM o JOIN x USING (series, day)),
                   (SELECT COUNT(*) FROM o),
                   (SELECT COUNT(*) FROM x)""").fetchone()
        okst9 = ((badst9 or 0) == 0 and (nst9 or 0) > 0
                 and nst9 == no9 and nst9 == nx9)
        audit("st09_audit",
              okst9, f"{nst9} (series, day) windows matched of {no9} "
              f"streamed / {nx9} exact, {badst9 or 0} with wrong counts "
              f"or HLL outside 5*rsd")
    audit_fail = sum(1 for a in audits.values() if not a["pass"])
    n_ok -= audit_fail  # audit failures surface in the exit summary
    print(f"\n{n_ok}/{len(oracle)} oracle queries pass")
    # Machine-readable evidence trail (VERDICT r12 item 4): committed
    # per round as AUDITS_r{N}.json so the audit verdicts are an
    # artifact, not stdout prose. Metadata block follows leakcheck.py's
    # discipline (commit, timestamp, inputs).
    import datetime
    import subprocess
    try:
        head = subprocess.run(["git", "rev-parse", "HEAD"],
                              capture_output=True, text=True,
                              timeout=10).stdout.strip()
    except Exception:
        head = None
    artifact = {
        "schema": 1,
        "generated_utc": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "git_head": head or None,
        "sfdir": sfdir,
        "outdir": outdir,
        "summary": {
            "oracle_pass": sum(1 for v in results.values()
                               if v.startswith("OK")),
            "oracle_total": len(oracle),
            "rows_only": len(rows_only),
            "audit_pass": sum(1 for a in audits.values() if a["pass"]),
            "audit_total": len(audits),
        },
        "oracle": results,
        "rows_only_counts": rows_only,
        "audits": audits,
    }
    # Subset runs (SPARK_GRAFT_ONLY) must not clobber the canonical
    # full-run artifact (Bench's BENCH_LOCAL rule) unless the caller
    # explicitly names an output path.
    out_path = os.environ.get("GRAFT_AUDITS_OUT")
    if out_path is None and not subset:
        out_path = "AUDITS_LOCAL.json"
    if out_path:
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"audits artifact -> {out_path}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
