package graft

/** DuckDB oracle SQL — one entry per SQL-expressible query in SparkEntry.
  *
  * Written for value-parity with the Spark plans (see SURVEY.md §4):
  * decimal-exact sums cast to double, epoch seconds instead of raw
  * timestamps (events.ts is ns in DuckDB but µs in Spark), identical
  * aliases and ORDER BY.
  */
object OracleSql {

  /** events.ts normalized to µs, matching Spark's read. */
  private val tsUs = "CAST(ts AS TIMESTAMP)"
  private val epoch1970 = "TIMESTAMP '1970-01-01'"
  private def sec(e: String) =
    s"date_diff('second', $epoch1970, date_trunc('second', $e))"
  private def decSum(c: String) =
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  private val discPrice =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  // Text helpers mirroring graft.text.TextOps / graft.dedup.Dedup
  private val normText =
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
  private val padded = s"(' ' || $normText || ' ')"
  private def occ(c: String, pat: String): String = {
    val esc = pat.replace("'", "''")
    s"CAST((length($c) - length(replace($c, '$esc', ''))) / ${pat.length} AS BIGINT)"
  }
  private def langScore(lang: String): String =
    graft.text.TextOps.profiles.toMap.apply(lang)
      .map(p => occ(padded, p)).mkString("(", " + ", ")")

  // -- Notification-oracle generators (q24 + q40), built from the SAME
  // subscription constants the gate queries carry (shared-constant
  // discipline): literals quoted, {col} -> null-safe VARCHAR cast. Gate
  // templates are short and clean, so the subject clip/sanitize steps
  // are identity here (spec-covered).
  private def notifB64(e: String) =
    s"translate(to_base64(encode($e)), '/', '-')"

  /** The SQL form of Subscriptions.renderTemplate. */
  private def notifTpl(t: String): String = {
    val re = "\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r
    val parts = Seq.newBuilder[String]
    var last = 0
    for (m <- re.findAllMatchIn(t)) {
      if (m.start > last)
        parts += s"'${t.substring(last, m.start).replace("'", "''")}'"
      parts += s"COALESCE(CAST(${m.group(1)} AS VARCHAR), '')"
      last = m.end
    }
    if (last < t.length)
      parts += s"'${t.substring(last).replace("'", "''")}'"
    val ps = parts.result()
    if (ps.isEmpty) "''" else ps.mkString(" || ")
  }

  /** One subscription's raw-match SELECT over `from` (the object table
    * for q24; a closure-restricted CTE for q40). */
  private def notifSub(s: graft.monitor.Subscription, idExpr: String,
                       where: String, from: String) =
    s"""SELECT '${s.name}' || ':' || '${s.objectType}' || ':' ||
          ${notifB64(idExpr)} || ':' || ${notifB64("'m0'")}
            AS notification_id,
        '${s.name}' AS subscription, '${s.objectType}' AS object_type,
        $idExpr AS object_id,
        ${notifTpl(s.subject)} AS subject,
        md5(${notifTpl(s.body)}) AS body_md5
        FROM $from WHERE $where"""

  /** Spool register-once over unioned raw matches: exactly one row per
    * notification id, the kept rendering the minimum (subject, body_md5)
    * struct — the same deterministic rule as
    * matchNotificationsRendered. */
  private def notifSpool(selects: Seq[String]): String =
    selects.mkString(
      """SELECT notification_id, subscription, object_type, object_id,
         (min(struct_pack(s := subject, b := body_md5))).s AS subject,
         (min(struct_pack(s := subject, b := body_md5))).b AS body_md5
         FROM (""",
      " UNION ALL ",
      """) GROUP BY notification_id, subscription, object_type,
         object_id ORDER BY notification_id""")

  private lazy val Seq(q24BigOrders, q24NegBal, q24Returned) =
    SparkEntry.q24Subscriptions
  // WHERE strings come from the SAME constant the spec checks against
  // the Column predicates (SparkEntry.q24PredicateSql) — no dual
  // hand-written predicate to drift.
  private lazy val Seq(q24BigOrdersW, q24NegBalW, q24ReturnedW) =
    SparkEntry.q24PredicateSql

  private def dotD(a: String, b: String) =
    s"list_reduce(list_transform(range(1, len($a)+1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (s, x) -> s + x)"
  private def cosD(a: String, b: String) =
    s"(${dotD(a, b)} / (sqrt(${dotD(a, a)}) * sqrt(${dotD(b, b)})))"

  /** d09's exact semantics, shared verbatim with d11 (whose bloom
    * pre-screen must be result-invariant). */
  private lazy val contaminationSql: String =
    s"""WITH arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                      FROM documents),
       ng AS (SELECT DISTINCT doc_id, array_to_string(arr[i:i+2], ' ') AS g
              FROM arrs,
                unnest(generate_series(1, greatest(len(arr) - 2, 1)))
                AS u(i)),
       tg AS (SELECT DISTINCT g FROM ng WHERE doc_id % 10 <> 0),
       ev AS (SELECT doc_id, g FROM ng WHERE doc_id % 10 = 0),
       tot AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM ev GROUP BY 1),
       hit AS (SELECT doc_id, COUNT(*) AS n_hits FROM ev
               WHERE g IN (SELECT g FROM tg) GROUP BY 1)
       SELECT tot.doc_id, n_ngrams,
         CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
         round(CAST(COALESCE(n_hits, 0) AS DOUBLE) / n_ngrams, 6)
           AS overlap,
         CASE WHEN round(CAST(COALESCE(n_hits, 0) AS DOUBLE) / n_ngrams, 6)
           >= 0.5 THEN 1 ELSE 0 END AS contaminated
       FROM tot LEFT JOIN hit USING (doc_id) ORDER BY doc_id"""

  /** p02's per-source weight lookup as a CASE chain, generated from the
    * SAME map the Spark side uses (SparkEntry.p02Weights). */
  private lazy val mixtureWeightSql: String =
    graft.SparkEntry.p02Weights.toSeq.sorted
      .map { case (s, w) => s"WHEN '$s' THEN CAST($w AS DOUBLE)" }
      .mkString("CASE source ", " ", " ELSE CAST(0.0 AS DOUBLE) END")

  /** p08's integer weight CASE chain (same map the Spark side bakes in). */
  private lazy val budgetWeightSql: String =
    graft.SparkEntry.p08Weights.toSeq.sorted
      .map { case (s, w) => s"WHEN '$s' THEN CAST($w AS BIGINT)" }
      .mkString("CASE source ", " ", " ELSE CAST(0 AS BIGINT) END")

  /** Trailing-window rate anomaly — the shared oracle of the q41 batch
    * gate and its st08 streaming twin (exact parity on a one-shot
    * in-order replay: days close in day order, so the trailing deque
    * reproduces the batch ROWS frame). The z arithmetic repeats the
    * Spark side's stated double-op order over integer window sums —
    * mean = s/k, var = (ss - s·mean)/(k-1), z = (n - mean)/sqrt(var). */
  /** e02 + st12 (batch anchor and streaming drift monitor share the
    * statistic verbatim — the cells are order-insensitive counts). */
  private val chi2DriftSql: String =
    s"""WITH b AS (SELECT source AS k, (lang = 'en') AS a
           FROM documents),
       c AS (SELECT k,
           CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS o_a,
           CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS o_b
         FROM b GROUP BY 1),
       t AS (SELECT CAST(SUM(o_a) AS BIGINT) AS n_a,
           CAST(SUM(o_b) AS BIGINT) AS n_b FROM c),
       z AS (SELECT c.k, c.o_a, c.o_b, t.n_a, t.n_b,
           c.o_a + c.o_b AS ct, t.n_a + t.n_b AS n FROM c, t),
       p AS (SELECT 'cell' AS kind, k, o_a, o_b,
           CAST((o_a*n - n_a*ct)*(o_a*n - n_a*ct) AS DOUBLE) /
             CAST(n_a*ct*n AS DOUBLE)
           + CAST((o_b*n - n_b*ct)*(o_b*n - n_b*ct) AS DOUBLE) /
             CAST(n_b*ct*n AS DOUBLE) AS term
         FROM z),
       tt AS (SELECT 'total' AS kind, '' AS k,
           (SELECT n_a FROM t) AS o_a, (SELECT n_b FROM t) AS o_b,
           list_reduce(list(term ORDER BY k), (x, y) -> x + y) AS term
         FROM p)
       SELECT kind, k, o_a, o_b, term FROM
         (SELECT * FROM p UNION ALL SELECT * FROM tt)
       ORDER BY kind, k"""

  private val rateAnomalySql: String =
    s"""WITH daily AS (SELECT event_type AS series,
           strftime(date_trunc('day', $tsUs), '%Y-%m-%d') AS day,
           COUNT(*) AS n
         FROM events GROUP BY 1, 2),
       w AS (SELECT series, day, n,
           CAST(COUNT(n) OVER tw AS BIGINT) AS k_trail,
           CAST(SUM(n) OVER tw AS BIGINT) AS s_trail,
           CAST(SUM(n * n) OVER tw AS BIGINT) AS ss_trail
         FROM daily
         WINDOW tw AS (PARTITION BY series ORDER BY day
           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
       z AS (SELECT series, day, n, k_trail,
           CASE WHEN k_trail >= 1 THEN round(
             CAST(s_trail AS DOUBLE) / CAST(k_trail AS DOUBLE), 6)
           END AS trail_mean,
           CASE WHEN k_trail >= 2 AND
               (CAST(ss_trail AS DOUBLE) - CAST(s_trail AS DOUBLE) *
                 (CAST(s_trail AS DOUBLE) / CAST(k_trail AS DOUBLE))) /
               (CAST(k_trail AS DOUBLE) - 1.0) > 0
             THEN round((CAST(n AS DOUBLE) -
                 CAST(s_trail AS DOUBLE) / CAST(k_trail AS DOUBLE)) /
               sqrt((CAST(ss_trail AS DOUBLE) - CAST(s_trail AS DOUBLE) *
                   (CAST(s_trail AS DOUBLE) / CAST(k_trail AS DOUBLE))) /
                 (CAST(k_trail AS DOUBLE) - 1.0)), 6)
           END AS z
         FROM w)
       SELECT series, day, n, k_trail, trail_mean, z,
         CAST(CASE WHEN z IS NOT NULL AND abs(z) > 2.0
              THEN 1 ELSE 0 END AS INT) AS anomaly
       FROM z ORDER BY series, day"""

  /** Poisson-bootstrap CI — the shared oracle of the e08 batch
    * gate and its st15 streaming twin (the stream-drained reps
    * frame equals the batch build bit-for-bit: integer counting is
    * order-insensitive and the coins hash-derived).
    * Re-draws every 60-bit coin — the xxhash64 chain when the shared
    * e08XxDraw flag is on (the [[xxHashLongSql]] twin; the md5 digest
    * otherwise) — against the pinned integer CDF thresholds
    * (Eval.poissonCdf60, shared constants) and re-picks the identical
    * (mean, b) order statistics. */
  private lazy val bootstrapCiSql: String = {
      val w = graft.operators.Eval.poissonCdf60
        .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
        .mkString("(", " + ", ")")
      val seed = graft.SparkEntry.e08Seed
      val drawsCte =
        if (graft.SparkEntry.e08XxDraw) {
          // the grid with u64 twins of (id, b), then the two long
          // stages; the masked low-60 coin is hb % 2^60 (= Spark's
          // bitwiseAND on the non-negative masked value)
          val grid = s"(SELECT id, v, b, ${toU("id")} AS iu, " +
            s"CAST(b AS HUGEINT) AS bu FROM v, " +
            s"unnest(generate_series(0, " +
            s"${graft.SparkEntry.e08Replicates - 1})) AS t(b))"
          val h0 = java.lang.Long.toUnsignedString(
            graft.operators.Eval.xxSeedHash(seed))
          val idStage = xxHashLongSql(grid,
            Seq("id", "v", "b", "iu", "bu"), "x", "iu", h0, "hid")
          val bStage = xxHashLongSql(idStage,
            Seq("id", "v", "b", "bu", "hid"), "y", "bu", "hid", "hb")
          s"""draws AS (SELECT id, v, b,
             CAST(hb % ${BigInt(1) << 60} AS BIGINT) AS u
           FROM $bStage)"""
        } else
          s"""draws AS (SELECT id, v, b,
             CAST(concat('0x', substr(md5('$seed' ||
               CAST(id AS VARCHAR) || '|' || CAST(b AS VARCHAR)),
               1, 15)) AS BIGINT) AS u
           FROM v, unnest(generate_series(0,
             ${graft.SparkEntry.e08Replicates - 1})) AS t(b))"""
      s"""WITH v AS (SELECT doc_id AS id, $wordCountSql AS v
             FROM documents),
         $drawsCte,
         reps AS (SELECT CAST(b AS BIGINT) AS b,
             CAST(SUM($w) AS BIGINT) AS n_eff,
             CAST(SUM($w * v) AS BIGINT) AS wsum
           FROM draws GROUP BY 1),
         rep_rows AS (SELECT 'rep' AS kind, b, n_eff, wsum,
             CAST(wsum AS DOUBLE)/CAST(n_eff AS DOUBLE) AS mean
           FROM reps),
         total AS (SELECT 'total' AS kind, CAST(-1 AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS n_eff,
             CAST(SUM(v) AS BIGINT) AS wsum,
             CAST(SUM(v) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS mean
           FROM v),
         ord AS (SELECT b, n_eff, wsum, mean,
             row_number() OVER (ORDER BY mean, b) AS rk FROM rep_rows)
         SELECT kind, b, n_eff, wsum, mean FROM (
           SELECT * FROM rep_rows
           UNION ALL SELECT * FROM total
           UNION ALL SELECT 'ci_lo', b, n_eff, wsum, mean FROM ord
             WHERE rk = ${graft.SparkEntry.e08LoRank}
           UNION ALL SELECT 'ci_hi', b, n_eff, wsum, mean FROM ord
             WHERE rk = ${graft.SparkEntry.e08HiRank})
         ORDER BY kind, b"""
  }

  /** Count-min point-query audit — the shared oracle of the k04 batch
    * gate and its st10 streaming twin (the stream-built cell table
    * equals the batch build bit-for-bit: counts are order-insensitive
    * and buckets md5-derived). */
  private lazy val cmsTopKSql: String =
    s"""WITH toks AS (SELECT unnest(string_split($normText, ' '))
           AS token FROM documents),
       cells AS (SELECT r,
           CAST(concat('0x', substr(md5('graft-cms' ||
             CAST(r AS VARCHAR) || '|' || token), 1, 15)) AS BIGINT)
             % 1024 AS b,
           CAST(COUNT(*) AS BIGINT) AS cell
         FROM toks, unnest(generate_series(0, 3)) AS u(r)
         GROUP BY 1, 2),
       top AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq_exact
               FROM toks GROUP BY token
               ORDER BY freq_exact DESC, token LIMIT 25),
       probes AS (SELECT token, freq_exact, r,
           CAST(concat('0x', substr(md5('graft-cms' ||
             CAST(r AS VARCHAR) || '|' || token), 1, 15)) AS BIGINT)
             % 1024 AS b
         FROM top, unnest(generate_series(0, 3)) AS u(r))
       SELECT p.token, p.freq_exact, MIN(c.cell) AS freq_cms,
         MIN(c.cell) - p.freq_exact AS overestimate
       FROM probes p JOIN cells c USING (r, b)
       GROUP BY p.token, p.freq_exact
       ORDER BY p.freq_exact DESC, p.token"""

  /** Gap-based sessionization (30-min gap, per-user numbering) - the
    * shared oracle of the q37 batch gate and its st06 streaming twin
    * (exact parity on a one-shot in-order replay). */
  private val sessionizeSql: String =
    s"""WITH e AS (SELECT user_id, event_id, ${sec(tsUs)} AS ts_sec
                     FROM events),
         f AS (SELECT user_id, event_id, ts_sec,
               CASE WHEN ts_sec - lag(ts_sec) OVER w <= 1800
                 THEN 0 ELSE 1 END AS new_s
               FROM e
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY ts_sec, event_id)),
         s AS (SELECT user_id, ts_sec,
               CAST(SUM(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts_sec, event_id) AS BIGINT)
                 AS session_idx
               FROM f)
         SELECT user_id, session_idx, COUNT(*) AS n_events,
           MIN(ts_sec) AS start_sec, MAX(ts_sec) AS end_sec,
           MAX(ts_sec) - MIN(ts_sec) AS duration_sec
         FROM s GROUP BY user_id, session_idx
         ORDER BY user_id, session_idx"""

  // Binary's synthetic-payload dimension constants (makeWebp /
  // makeRealPng closed forms), interpolated instead of duplicated as
  // SQL literals — the shared-constant discipline (ADVICE r12).
  private def wb = graft.multimodal.Binary.WebpDimBase
  private def wwm = graft.multimodal.Binary.WebpWMod
  private def whm = graft.multimodal.Binary.WebpHMod
  private def pb = graft.multimodal.Binary.PngDimBase
  private def pwm = graft.multimodal.Binary.PngWMod
  private def phm = graft.multimodal.Binary.PngHMod

  // -- Exported-model ANN oracles (s07/s08/s09/st05): only the k-means
  // FITS are non-SQL-expressible, so each gate persists its fitted model
  // frames (ModelStore parquet) at SparkEntry.gateModelDir and the oracle
  // reads them back at the same absolute path
  // (SparkEntry.gateModelSqlPath — Verify pins the sf tag before dumping
  // oracle_sql.json) and re-derives EVERYTHING downstream of the fit:
  // subvector encode (argmin L2), per-probe ADC lookup tables, the
  // ordered ADC accumulation, the refine·k shortlist, and the exact
  // re-rank. All double accumulation is ascending-index (dotD / ordered
  // list_reduce — bit-identical to the Catalyst kernels), every ordering
  // is fully tie-broken (score DESC, id ASC), so the values hash-match.
  // Sequencing contract: the gate dump that wrote the models must be
  // oracle-checked before another run overwrites the same (sf, gate) dir.
  private def modelGlob(gate: String, kind: String): String =
    s"'${graft.SparkEntry.gateModelSqlPath(gate)}/$kind/*.parquet'"

  private def annM = graft.SparkEntry.annM
  private def annProbe = graft.SparkEntry.annProbeMax

  /** Shared encode/LUT prefix: cb (the exported codebooks), sv (every
    * vector's m subspace slices), enc (argmin-L2 code per (vec, sub) —
    * Pq.encode's assignWithin with ties to the lowest code), lut (the
    * probes' per-(sub, code) partial dot products). */
  private def pqPrefixSql(gate: String): String =
    s"""cb AS (SELECT sub, code, centroid
              FROM read_parquet(${modelGlob(gate, "pq_codebooks")})),
       sv AS (SELECT e.vec_id, s.sub,
             e.embedding[s.sub*(len(e.embedding)//$annM)+1 :
                         (s.sub+1)*(len(e.embedding)//$annM)] AS v
           FROM embeddings e,
             unnest(generate_series(0, $annM - 1)) AS s(sub)),
       enc AS (SELECT vec_id, sub, code FROM (
             SELECT sv.vec_id, sv.sub, cb.code,
               row_number() OVER (PARTITION BY sv.vec_id, sv.sub
                 ORDER BY ${dotD("sv.v", "cb.centroid")}
                   - ${dotD("cb.centroid", "cb.centroid")} / 2.0 DESC,
                   cb.code ASC) AS rn
             FROM sv JOIN cb USING (sub)) WHERE rn = 1),
       lut AS (SELECT sv.vec_id AS probe_id, sv.sub, cb.code,
             ${dotD("sv.v", "cb.centroid")} AS pdot
           FROM sv JOIN cb USING (sub) WHERE sv.vec_id < $annProbe)"""

  /** Shared ADC tail over a `cand(probe_id, id)` CTE: ordered per-sub
    * LUT accumulation (Pq's ascending `aggregate`), refine·k shortlist,
    * exact dot re-rank — (probe_id, neighbor_id, rank). */
  private def adcTailSql: String = {
    val shortK = graft.SparkEntry.annRefine * graft.SparkEntry.annK
    s"""sc AS (SELECT c.probe_id, c.id,
             list_reduce(list(l.pdot ORDER BY l.sub), (a, x) -> a + x)
               AS score
           FROM cand c
             JOIN enc en ON en.vec_id = c.id
             JOIN lut l ON l.probe_id = c.probe_id AND l.sub = en.sub
               AND l.code = en.code
           GROUP BY 1, 2),
       sl AS (SELECT probe_id, id FROM (
             SELECT probe_id, id, row_number() OVER (PARTITION BY probe_id
               ORDER BY score DESC, id ASC) AS rn FROM sc)
           WHERE rn <= $shortK),
       rf AS (SELECT sl.probe_id, sl.id AS neighbor_id,
             ${dotD("p.embedding", "c.embedding")} AS s
           FROM sl JOIN embeddings c ON c.vec_id = sl.id
                   JOIN embeddings p ON p.vec_id = sl.probe_id)
       SELECT probe_id, neighbor_id, CAST(rn AS INT) AS rank FROM (
         SELECT probe_id, neighbor_id,
           row_number() OVER (PARTITION BY probe_id
             ORDER BY s DESC, neighbor_id ASC) AS rn FROM rf)
       WHERE rn <= ${graft.SparkEntry.annK}
       ORDER BY probe_id, rank"""
  }

  /** IVF assignment CTEs from the exported centroids: cents (the
    * model frame) and cell (every vector's cosine-nearest cell,
    * Ivf.assign's max_by with ties to the lowest cluster). Shared by
    * the ANN oracles (via [[ivfCellsSql]]) and d08's SemDeDup oracle. */
  private def ivfAssignSql(gate: String): String =
    s"""cents AS (SELECT cluster, centroid
              FROM read_parquet(${modelGlob(gate, "ivf_centroids")})),
       cell AS (SELECT vec_id, cluster FROM (
             SELECT e.vec_id, ct.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cosD("e.embedding", "ct.centroid")} DESC,
                   ct.cluster ASC) AS rn
             FROM embeddings e, cents ct) WHERE rn = 1)"""

  /** [[ivfAssignSql]] plus pcell (each probe's nprobe best cells,
    * TopK's (score DESC, id ASC)). */
  private def ivfCellsSql(gate: String): String =
    s"""${ivfAssignSql(gate)},
       pcell AS (SELECT probe_id, cluster FROM (
             SELECT e.vec_id AS probe_id, ct.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cosD("e.embedding", "ct.centroid")} DESC,
                   ct.cluster ASC) AS rn
             FROM embeddings e, cents ct WHERE e.vec_id < $annProbe)
           WHERE rn <= ${graft.SparkEntry.annNprobe})"""

  // -- 64-bit two's-complement helpers for the hash-dict oracles
  // (d02/d03/d13): DuckDB BIGINT shifts are overflow-CHECKED, so the
  // wrapping 64-bit arithmetic Spark's rotl64/bit-build does runs in
  // HUGEINT space and folds back to signed BIGINT at the end. The rot
  // formula is exact: low and high parts occupy disjoint bit ranges,
  // so + is |.
  private val U64 = "18446744073709551616"
  private def toU(x: String) =
    s"(CAST($x AS HUGEINT) + CASE WHEN $x < 0 THEN CAST($U64 AS HUGEINT)" +
      " ELSE 0::HUGEINT END)"
  private def toS(u: String) =
    s"(CASE WHEN ($u) >= CAST(9223372036854775808 AS HUGEINT) " +
      s"THEN CAST(($u) - $U64 AS BIGINT) ELSE CAST(($u) AS BIGINT) END)"
  /** rotl64 of a BIGINT expr by a column amount s in [0, 63]. */
  private def rotl64(h: String, s: String) = {
    val u = toU(h)
    toS(s"(($u * (1::HUGEINT << ($s))) % CAST($U64 AS HUGEINT)" +
      s" + ($u // (1::HUGEINT << (64 - ($s)))))")
  }

  // -- XXH64 hashLong twin (e08/st15's xxhash64 bootstrap coin,
  // Eval.integerDrawXx): Spark's xxhash64 folds columns left-to-right
  // as hashLong(colN, … hashLong(col1, hashUTF8String(seed, 42))), so
  // the oracle interpolates the string stage as a constant
  // (Eval.xxSeedHash — computed with the engine's OWN XXH64, never
  // re-implemented) and replays only the long stages in wrapping u64
  // HUGEINT arithmetic. Every intermediate lives in its own nested
  // SELECT: DuckDB expands SAME-SELECT alias references textually, so
  // a flat alias chain blows up ~3^24 — the nesting is what keeps the
  // expression tree linear in the 24 steps.
  private val XxP1 = "11400714785074694791"
  private val XxP2 = "14029467366897019727"
  private val XxP3 = "1609587929392839161"
  private val XxP4 = "9650029242287828579"
  private val XxP5 = "2870177450012600261"
  /** Wrapping u64 multiply via 32-bit split (u64·u64 overflows
    * HUGEINT; each split partial stays < 2^97). */
  private def xxMul(a: String, b: String): String =
    s"((($a) % 4294967296) * (($b) % 4294967296) + (((($a) % " +
      s"4294967296) * (($b) // 4294967296) + (($a) // 4294967296) * " +
      s"(($b) % 4294967296)) % 4294967296) * 4294967296) % $U64"
  private def xxRotl(x: String, s: Int): String =
    s"((($x) * ${BigInt(1) << s}) % $U64 + (($x) // ${BigInt(1) << (64 - s)}))"
  private def xxXor(a: String, b: String): String =
    toU(s"xor(${toS(a)}, ${toS(b)})")
  private def xxShr(x: String, s: Int): String =
    s"(($x) // ${BigInt(1) << s})"
  /** Nested-subquery chain computing XXH64.hashLong(`inputU`, `seedU`)
    * into column `out` over `inner`; `keep` columns pass through. */
  private def xxHashLongSql(inner: String, keep: Seq[String], p: String,
                            inputU: String, seedU: String,
                            out: String): String = {
    val steps = Seq(
      (s"(($seedU) + $XxP5 + 8) % $U64", s"${p}h1"),
      (xxMul(inputU, XxP2), s"${p}k1"),
      (xxRotl(s"${p}k1", 31), s"${p}k2"),
      (xxMul(s"${p}k2", XxP1), s"${p}k3"),
      (xxXor(s"${p}h1", s"${p}k3"), s"${p}m1"),
      (xxRotl(s"${p}m1", 27), s"${p}m2"),
      (s"(${xxMul(s"${p}m2", XxP1)} + $XxP4) % $U64", s"${p}m3"),
      (xxXor(s"${p}m3", xxShr(s"${p}m3", 33)), s"${p}f1"),
      (xxMul(s"${p}f1", XxP2), s"${p}f2"),
      (xxXor(s"${p}f2", xxShr(s"${p}f2", 29)), s"${p}f3"),
      (xxMul(s"${p}f3", XxP3), s"${p}f4"),
      (xxXor(s"${p}f4", xxShr(s"${p}f4", 32)), out))
    steps.foldLeft((inner, keep)) { case ((q, ks), (expr, alias)) =>
      (s"(SELECT ${ks.mkString(", ")}, $expr AS $alias FROM $q)",
        ks :+ alias)
    }._1
  }

  /** Shared MinHash prefix over a gate's exported shingle dictionary
    * (Dedup.shingleHashDict): 3-gram shingle sets + sizes, the
    * k=[[graft.SparkEntry.mhK]] rotl-mix permutation values per
    * shingle, per-doc signature mins, and the EXACT slice-value band
    * keys (rowsPerBand = mhK/mhBands — Dedup.bands' concat_ws,
    * reproduced as string_agg ORDER BY s). Knobs interpolate from the
    * SparkEntry shared constants, so gate and oracle can never desync. */
  private def minhashPrefixSql(gate: String): String =
    s"""dict AS (SELECT g, h1, h2
              FROM read_parquet(${modelGlob(gate, "shingle_hashes")})),
       arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                FROM documents),
       sh AS (SELECT DISTINCT doc_id, array_to_string(arr[i:i+2], ' ') AS g
              FROM arrs, unnest(generate_series(1,
                greatest(len(arr) - 2, 1))) AS u(i)),
       sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
       perm AS (SELECT g, q.s, xor(h1, ${rotl64("h2", "q.s")}) AS r
                FROM dict, unnest(generate_series(0,
                  ${graft.SparkEntry.mhK - 1})) AS q(s)),
       sig AS (SELECT sh.doc_id, p.s, MIN(p.r) AS m
               FROM sh JOIN perm p USING (g) GROUP BY 1, 2),
       bd AS (SELECT doc_id,
                s // ${graft.SparkEntry.mhK / graft.SparkEntry.mhBands}
                  AS band,
                string_agg(CAST(m AS VARCHAR), ',' ORDER BY s) AS bh
              FROM sig GROUP BY 1, 2)"""

  /** Shared MinHash exact-jaccard tail over a `cand(ida, idb)` CTE. */
  private def jaccardTailSql(ida: String, idb: String): String =
    s"""ix AS (SELECT c.$ida, c.$idb, COUNT(*) AS i
             FROM cand c JOIN sh a ON a.doc_id = c.$ida
               JOIN sh b ON b.doc_id = c.$idb AND a.g = b.g
             GROUP BY 1, 2),
       j AS (SELECT c.$ida, c.$idb,
               CAST(COALESCE(ix.i, 0) AS DOUBLE)
                 / (sa.sz + sb.sz - COALESCE(ix.i, 0)) AS jaccard
             FROM cand c LEFT JOIN ix USING ($ida, $idb)
               JOIN sz sa ON sa.doc_id = c.$ida
               JOIN sz sb ON sb.doc_id = c.$idb)"""

  /** SRP signature CTEs from a gate's exported plane table
    * ([[graft.sim.Knn.srpPlanes]] — the LSH "model", the one
    * non-SQL-portable piece): pl (plane components), proj (ascending-
    * index ordered projections — SrpSignatures' accumulation), sig
    * (per-table sign buckets; bit j set iff projection > 0, exactly the
    * kernel's rule). The table/bit split derives from the `bits` COLUMN
    * the export carries (the k01 rsd-column discipline), so the gates'
    * AUTO-derived knobs can vary per scale without this SQL going
    * stale. */
  private def srpSigSql(gate: String): String =
    s"""pl AS (SELECT p, i, w, bits
              FROM read_parquet(${modelGlob(gate, "srp_planes")})),
       proj AS (SELECT e.vec_id, pl.p,
             list_reduce(list(CAST(e.embedding[pl.i] AS DOUBLE) * pl.w
               ORDER BY pl.i), (a, x) -> a + x) AS s
           FROM embeddings e, pl GROUP BY 1, 2),
       sig AS (SELECT vec_id, p // bb.bits AS tbl,
             CAST(SUM(CASE WHEN s > 0
               THEN (CAST(1 AS BIGINT) << (p % bb.bits)) ELSE 0 END)
               AS BIGINT) AS bucket
           FROM proj, (SELECT MAX(bits) AS bits FROM pl) bb
           GROUP BY 1, 2)"""

  /** Shared exact-cosine rank tail over a `cand(probe_id, neighbor_id)`
    * CTE — Knn.rankTopK's (cos DESC, id ASC) top-k as SQL. */
  private def cosRankTail: String =
    s"""sc AS (SELECT c.probe_id, c.neighbor_id,
           ${cosD("p.embedding", "n.embedding")} AS cos
         FROM cand c
           JOIN embeddings p ON p.vec_id = c.probe_id
           JOIN embeddings n ON n.vec_id = c.neighbor_id)
       SELECT probe_id, neighbor_id, CAST(rn AS INT) AS rank FROM (
         SELECT probe_id, neighbor_id,
           row_number() OVER (PARTITION BY probe_id
             ORDER BY cos DESC, neighbor_id ASC) AS rn FROM sc)
       WHERE rn <= ${graft.SparkEntry.annK}
       ORDER BY probe_id, rank"""

  /** s08/s09 share this whole shape; only the model dir differs. */
  private def ivfAdcOracleSql(gate: String): String =
    s"""WITH ${pqPrefixSql(gate)},
       ${ivfCellsSql(gate)},
       cand AS (SELECT pc.probe_id, ce.vec_id AS id
             FROM cell ce JOIN pcell pc USING (cluster)
             WHERE ce.vec_id <> pc.probe_id),
       $adcTailSql"""

  // def, not val: the exported-model entries embed gateModelSqlPath,
  // which reads the graft.gate.sfTag system property — a val would
  // freeze the paths at first class touch, so a JVM that touches
  // OracleSql before Verify pins the tag (or verifies two sf dirs in
  // one process) would dump SQL pointing at the WRONG sf's models and
  // fail only as a confusing hash mismatch. Rebuilding the map per
  // call is trivially cheap next to the dump it feeds.
  def all: Map[String, String] = Map(
    "q01_summary_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${decSum("l_quantity")} AS sum_qty,
         ${decSum("l_extendedprice")} AS sum_base_price,
         $discPrice AS sum_disc_price,
         ${decSum("l_quantity")} / COUNT(*) AS avg_qty,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice > 250000
         ORDER BY o_orderkey""",

    "q03_hierarchy_join" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate,
         $discPrice AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-06-01'
           AND l_shipdate > TIMESTAMP '1997-06-01'
         GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
         ORDER BY revenue DESC, l_orderkey ASC
         LIMIT 10""",

    "q04_children_closure" ->
      """SELECT 'customer' AS object_type, CAST(c_custkey AS VARCHAR) AS id,
           '' AS parent_id
         FROM customer WHERE c_custkey IN (21, 22, 23)
         UNION ALL
         SELECT 'orders', CAST(o_orderkey AS VARCHAR),
           CAST(o_custkey AS VARCHAR)
         FROM orders WHERE o_custkey IN (21, 22, 23)
         UNION ALL
         SELECT 'lineitem',
           CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR),
           CAST(l_orderkey AS VARCHAR)
         FROM lineitem WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders WHERE o_custkey IN (21, 22, 23))
         ORDER BY object_type, id""",

    "q05_parents_closure" ->
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey IN (1,2,3,4,5)),
         c AS (SELECT * FROM customer
               WHERE c_custkey IN (SELECT o_custkey FROM o)),
         n AS (SELECT * FROM nation
               WHERE n_nationkey IN (SELECT c_nationkey FROM c)),
         r AS (SELECT * FROM region
               WHERE r_regionkey IN (SELECT n_regionkey FROM n))
         SELECT 'orders' AS object_type, CAST(o_orderkey AS VARCHAR) AS id
           FROM o
         UNION ALL SELECT 'customer', CAST(c_custkey AS VARCHAR) FROM c
         UNION ALL SELECT 'nation', CAST(n_nationkey AS VARCHAR) FROM n
         UNION ALL SELECT 'region', CAST(r_regionkey AS VARCHAR) FROM r
         ORDER BY object_type, id""",

    "q06_load_upsert_merge" ->
      s"""SELECT DISTINCT user_id, event_type,
         last_value(CASE WHEN value >= 50 THEN value END IGNORE NULLS)
           OVER w AS v,
         last_value(props IGNORE NULLS) OVER w AS props,
         MAX(${sec(tsUs)}) OVER w AS ts_sec
         FROM events
         WINDOW w AS (PARTITION BY user_id, event_type
                      ORDER BY $tsUs, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING)
         ORDER BY user_id, event_type""",

    "q07_merge_datasets" ->
      """SELECT DISTINCT event_id, user_id, event_type, value FROM (
           SELECT event_id, user_id, event_type, value FROM events
             WHERE user_id < 20
           UNION ALL
           SELECT event_id, user_id, event_type, value FROM events
             WHERE user_id >= 10 AND user_id < 30
         ) ORDER BY event_id""",

    "q08_count_objects" ->
      graft.sources.Tables.names
        .map(n => s"SELECT '$n' AS object_type, COUNT(*) AS n FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY object_type"),

    "q09_dump_window" ->
      s"""SELECT event_id, user_id, event_type, value,
         ${sec(tsUs)} AS ts_sec
         FROM events
         WHERE $tsUs > TIMESTAMP '2024-01-10'
           AND $tsUs <= TIMESTAMP '2024-01-20'
         ORDER BY event_id""",

    "q31_dump_batched" ->
      s"""SELECT event_id, user_id, event_type, value,
         ${sec(tsUs)} AS ts_sec,
         CAST((ROW_NUMBER() OVER (ORDER BY event_id) - 1) // 500 AS BIGINT)
           AS batch_id
         FROM events
         WHERE $tsUs > TIMESTAMP '2024-01-10'
           AND $tsUs <= TIMESTAMP '2024-01-20'
         ORDER BY event_id""",

    // q34 = q31 with with_metadata=false: the timestamp still drives the
    // window but leaves the projection.
    "q34_dump_meta" ->
      s"""SELECT event_id, user_id, event_type, value,
         CAST((ROW_NUMBER() OVER (ORDER BY event_id) - 1) // 500 AS BIGINT)
           AS batch_id
         FROM events
         WHERE $tsUs > TIMESTAMP '2024-01-10'
           AND $tsUs <= TIMESTAMP '2024-01-20'
         ORDER BY event_id""",

    "q10_purge_before" ->
      s"""SELECT event_type, COUNT(*) AS n, MIN(${sec(tsUs)}) AS min_ts_sec
         FROM events WHERE $tsUs >= TIMESTAMP '2024-01-15'
         GROUP BY event_type ORDER BY event_type""",

    "q11_first_last_modified" ->
      s"""SELECT event_type, MIN(${sec(tsUs)}) AS first_sec,
         MAX(${sec(tsUs)}) AS last_sec, COUNT(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q12_latest_version" ->
      s"""SELECT user_id, event_id, event_type, value FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id
           ORDER BY $tsUs DESC, event_id DESC) = 1
         ORDER BY user_id""",

    "q13_status_rollup" ->
      s"""SELECT COALESCE(r_name, '(all)') AS region_name,
         COALESCE(n_name, '(all)') AS nation_name,
         ${decSum("c_acctbal")} AS total_bal, COUNT(*) AS n_cust
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY region_name, nation_name""",

    "q14_status_pivot" ->
      """SELECT o_orderpriority,
         COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
         COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
         COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q15_worst_status" ->
      """SELECT l_orderkey,
         CASE MIN(CASE l_returnflag WHEN 'R' THEN 0 WHEN 'A' THEN 1
                  WHEN 'N' THEN 2 END)
           WHEN 0 THEN 'R' WHEN 1 THEN 'A' WHEN 2 THEN 'N' END
           AS worst_status
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",

    "q16_pattern_query" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
         FROM lineitem
         WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders WHERE o_custkey IN (21, 22, 23))
         ORDER BY l_orderkey, l_linenumber""",

    "q17_branch_tips" ->
      s"""SELECT n_name, c_mktsegment, COUNT(*) AS n,
         ${decSum("c_acctbal")} AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name, c_mktsegment
         ORDER BY n DESC, n_name ASC, c_mktsegment ASC""",

    "q18_validate" -> {
      // Generated from the same catalog metadata as the Spark plan, so the
      // check inventory cannot drift between engine and oracle.
      val cat = graft.model.TestCatalog.catalog
      val nulls = for {
        t <- cat.types.values.toSeq; c <- t.required
      } yield s"SELECT '${t.name}_null_$c' AS check_name, " +
        s"COUNT(*) AS violations FROM ${t.name} WHERE $c IS NULL"
      val formats = for {
        t <- cat.types.values.toSeq; (c, re) <- t.formats
      } yield s"SELECT '${t.name}_format_$c', COUNT(*) FROM ${t.name} " +
        s"WHERE $c IS NOT NULL AND NOT regexp_matches($c, '$re')"
      val orphans = cat.relations.map { rel =>
        val cond = rel.refCols.zip(cat.types(rel.parent).idCols)
          .map { case (rc, ic) => s"${rel.parent}.$ic = ${rel.child}.$rc" }
          .mkString(" AND ")
        s"SELECT '${rel.child}_orphan_${rel.parent}', COUNT(*) " +
          s"FROM ${rel.child} WHERE NOT EXISTS " +
          s"(SELECT 1 FROM ${rel.parent} WHERE $cond)"
      }
      val extras = Seq("SELECT 'customer_negative_acctbal', COUNT(*) " +
        "FROM customer WHERE c_acctbal < 0")
      (nulls ++ formats ++ orphans ++ extras)
        .mkString("", " UNION ALL ", " ORDER BY check_name")
    },

    "q19_star_join_agg" ->
      s"""SELECT n_name, $discPrice AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
           AND s_nationkey = c_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name ASC""",

    "q20_semi_anti" ->
      """SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer
           WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT 'without_orders', COUNT(*) FROM customer
           WHERE NOT EXISTS
             (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY kind""",

    "q21_topk" ->
      s"""SELECT c_custkey, c_name, ${decSum("o_totalprice")} AS total_spend,
         COUNT(*) AS n_orders
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name
         ORDER BY total_spend DESC, c_custkey ASC
         LIMIT 20""",

    "q22_ultimate_parents" ->
      """WITH li AS (SELECT * FROM lineitem
           WHERE (l_orderkey, l_linenumber)
             IN ((1,3),(3,2),(8,2),(12,5),(13,7))),
         o AS (SELECT * FROM orders
               WHERE o_orderkey IN (SELECT l_orderkey FROM li)),
         c AS (SELECT * FROM customer
               WHERE c_custkey IN (SELECT o_custkey FROM o)),
         s AS (SELECT * FROM supplier
               WHERE s_suppkey IN (SELECT l_suppkey FROM li)),
         n AS (SELECT * FROM nation
               WHERE n_nationkey IN (SELECT c_nationkey FROM c
                                     UNION SELECT s_nationkey FROM s)),
         r AS (SELECT * FROM region
               WHERE r_regionkey IN (SELECT n_regionkey FROM n))
         SELECT 'region' AS object_type, CAST(r_regionkey AS VARCHAR) AS id
           FROM r
         UNION ALL
         SELECT 'part', CAST(p_partkey AS VARCHAR) FROM part
           WHERE p_partkey IN (SELECT l_partkey FROM li)
         ORDER BY object_type, id""",

    "q36_all_descendants" ->
      """WITH o AS (SELECT * FROM orders WHERE o_custkey IN (21, 22, 23))
         SELECT 'orders' AS object_type, CAST(o_orderkey AS VARCHAR) AS id
           FROM o
         UNION ALL
         SELECT 'lineitem', CAST(l_orderkey AS VARCHAR) || '_'
             || CAST(l_linenumber AS VARCHAR)
           FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM o)
         ORDER BY object_type, id""",

    "q23_path_rollup" ->
      """WITH t AS (SELECT
           event_type || '.u' || CAST(user_id % 8 AS VARCHAR)
             || '.e' || CAST(event_id % 4 AS VARCHAR) AS path,
           CASE WHEN value >= 80 THEN 'PASS'
                WHEN value >= 20 THEN 'SKIP' ELSE 'FAIL' END AS status
           FROM events),
         p AS (SELECT
             array_to_string((string_split(path, '.'))[1:d.d], '.')
               AS node_path, status
           FROM t CROSS JOIN (VALUES (1), (2), (3)) d(d))
         SELECT node_path,
           CASE MIN(CASE status WHEN 'FAIL' THEN 0 WHEN 'SKIP' THEN 1
                    WHEN 'PASS' THEN 2 END)
             WHEN 0 THEN 'FAIL' WHEN 1 THEN 'SKIP' WHEN 2 THEN 'PASS' END
             AS worst_status,
           COUNT(*) AS n_tests
         FROM p GROUP BY node_path ORDER BY node_path""",

    "q24_notifications" ->
      notifSpool(Seq(
        notifSub(q24BigOrders, "CAST(o_orderkey AS VARCHAR)",
          q24BigOrdersW, q24BigOrders.objectType),
        notifSub(q24NegBal, "CAST(c_custkey AS VARCHAR)",
          q24NegBalW, q24NegBal.objectType),
        notifSub(q24Returned,
          "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)",
          q24ReturnedW, q24Returned.objectType))),

    "q25_schema_upgrade" ->
      """SELECT event_id, user_id, event_type,
         CASE WHEN event_type = 'error' THEN 'FAIL'
              WHEN value >= 50 THEN 'PASS' ELSE 'SKIP' END AS status,
         CASE WHEN user_id >= 15 THEN value * 2 ELSE value END AS score
         FROM events ORDER BY event_id""",

    // DuckDB integer SUM returns HUGEINT (int128); cast back to BIGINT so
    // the driver's binary hash matches Spark's int64 output.
    "q26_json_misc" ->
      """SELECT event_type,
         CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
         COUNT(*) FILTER
           (WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50) AS n_high
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q27_asof_join" ->
      s"""WITH p AS (SELECT event_id, user_id, $tsUs AS ts FROM events
                     WHERE event_type = 'purchase'),
         v AS (SELECT user_id, $tsUs AS ts, MAX(value) AS view_value
               FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, v.view_value AS asof_view_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND p.ts >= v.ts
         ORDER BY p.event_id""",

    "q28_range_join" ->
      s"""WITH c AS (SELECT event_id AS click_id, ${sec(tsUs)} AS click_sec
                     FROM events WHERE event_type = 'click'),
         su AS (SELECT ${sec(tsUs)} AS lo_sec, ${sec(tsUs)} + 3600 AS hi_sec
                FROM events WHERE event_type = 'signup')
         SELECT click_id, COUNT(*) AS n_active_signups
         FROM c JOIN su ON click_sec >= lo_sec AND click_sec <= hi_sec
         GROUP BY click_id ORDER BY click_id""",

    // Oracle is the PLAIN join — the salted formulation must be
    // result-invariant.
    "q32_skew_join" ->
      s"""SELECT n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    // Bucketing is layout, not semantics: q35's oracle is the plain join.
    "q35_bucketed_join" ->
      s"""SELECT o_orderstatus,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // q33: generated from the SAME catalog metadata and candidate list the
    // Spark side uses (TestCatalog / SparkEntry.rootIdCandidates), the way
    // t01 embeds the language profiles. All testdata id columns are
    // integral, so part-coercibility is TRY_CAST … AS BIGINT here (Spark
    // casts to each id column's exact table type; verdicts agree on
    // integral ids).
    // q42: the planted-entry VALUES list is generated from the SAME
    // constant the gate frames (q33's discipline); the part-derived
    // block and every rule regex come from the shared Scala constants
    // (CatalogEntries.KeyRe/SingleLineRe/UriRe).
    "q42_catalog_validate" -> {
      import graft.model.CatalogEntries.{KeyRe, SingleLineRe, UriRe}
      def q(s: String) =
        if (s == null) "NULL"
        else "'" + s.replace("'", "''")
          .replace("\t", "' || chr(9) || '") + "'"
      val vals = graft.SparkEntry.testCatalogEntries
        .map { case (k, t, h, d) => s"(${q(k)}, ${q(t)}, ${q(h)}, ${q(d)})" }
        .mkString(", ")
      s"""WITH planted AS (SELECT * FROM (VALUES $vals)
               AS v(test_key, title, home, description)),
         derived AS (SELECT
               'p' || p_partkey || '-' ||
                 regexp_replace(lower(p_name), '[^a-z0-9_-]+', '-', 'g')
                 AS test_key,
               p_name AS title,
               'https://example.org/part/' || p_partkey AS home,
               CAST(NULL AS VARCHAR) AS description
             FROM part),
         e AS (SELECT * FROM planted UNION ALL SELECT * FROM derived),
         f AS (SELECT test_key,
             (test_key IS NULL
               OR NOT regexp_matches(test_key, '$KeyRe')) AS bad_key,
             title IS NULL AS missing_title,
             (title IS NOT NULL
               AND NOT regexp_matches(title, '$SingleLineRe'))
               AS multiline_title,
             home IS NULL AS missing_home,
             (home IS NOT NULL
               AND NOT regexp_matches(home, '$UriRe')) AS bad_home_uri
           FROM e)
         SELECT test_key,
           NOT (bad_key OR missing_title OR multiline_title
             OR missing_home OR bad_home_uri) AS valid,
           concat_ws(',',
             CASE WHEN bad_key THEN 'bad_key' END,
             CASE WHEN missing_title THEN 'missing_title' END,
             CASE WHEN multiline_title THEN 'multiline_title' END,
             CASE WHEN missing_home THEN 'missing_home' END,
             CASE WHEN bad_home_uri THEN 'bad_home_uri' END)
             AS violations
         FROM f ORDER BY test_key"""
    },

    // q43: every mux member must hold exactly the full dump window at
    // its own schema version — the oracle recomputes each member's
    // audit from `events` directly (v2.1's score backfills to value and
    // status is FAIL exactly on errors, per the eventsSchematic chain;
    // the legacy member reports the -1 sentinels).
    "q43_mux_load" ->
      s"""WITH w AS (SELECT event_id, user_id, event_type, value
             FROM events
             WHERE $tsUs > TIMESTAMP '2024-01-10'
               AND $tsUs <= TIMESTAMP '2024-01-20'),
         agg AS (SELECT COUNT(*) AS n_rows,
               CAST(SUM(user_id) AS BIGINT) AS sum_users,
               ${decSum("value")} AS sum_value,
               CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                 AS BIGINT) AS nf
             FROM w)
         SELECT m.member, m.version, a.n_rows, a.sum_users, a.sum_value,
           CASE WHEN m.version = '2.1' THEN a.sum_value
             ELSE -1.0 END AS sum_score,
           CAST(CASE WHEN m.version = '2.1' THEN a.nf
             ELSE -1 END AS BIGINT) AS n_fail
         FROM (VALUES ('m0', '2.1'), ('m1', '1.0'))
           AS m(member, version), agg a
         ORDER BY m.member""",

    // q44: per-column profile of orders, one UNION ALL branch per
    // column generated from the SAME (name, kind) list the gate
    // asserts against Profiler.kinds (shared-constant discipline).
    // Sentinels (-1.0 / '') mirror the Profiler's no-NULL output rule.
    "q44_column_profile" -> {
      val branches = graft.SparkEntry.q44Cols.map { case (c, kind) =>
        val (numMin, numMax) = kind match {
          case "num" => (s"round(CAST(MIN($c) AS DOUBLE), 6)",
            s"round(CAST(MAX($c) AS DOUBLE), 6)")
          case "ts" =>
            (s"CAST(${sec(s"MIN(CAST($c AS TIMESTAMP))")} AS DOUBLE)",
              s"CAST(${sec(s"MAX(CAST($c AS TIMESTAMP))")} AS DOUBLE)")
          case _ => ("-1.0", "-1.0")
        }
        val (strMin, strMax) =
          if (kind == "str") (s"MIN($c)", s"MAX($c)") else ("''", "''")
        s"""SELECT '$c' AS "column", COUNT(*) AS n_rows,
           CAST(COUNT($c) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           $numMin AS num_min, $numMax AS num_max,
           $strMin AS str_min, $strMax AS str_max FROM orders"""
      }
      branches.mkString("", " UNION ALL ", """ ORDER BY "column"""")
    },

    // q45: the incremental == full-recompute invariant — the gate
    // merges persisted base state with delta partials; the oracle
    // recomputes the same rollup from the FULL events table. Decimal
    // sums on both sides keep the equality exact.
    "q45_incr_rollup" ->
      s"""SELECT event_type, strftime($tsUs, '%Y-%m-%d') AS day,
         COUNT(*) AS n_rows, ${decSum("value")} AS sum_value,
         MIN(value) AS min_value, MAX(value) AS max_value
         FROM events GROUP BY 1, 2 ORDER BY event_type, day""",

    "q33_root_id_check" -> {
      val cat = graft.model.TestCatalog.catalog
      val sorted = cat.types.values.toSeq.sortBy(_.name)
      val cands = graft.SparkEntry.rootIdCandidates
        .map { case (t, i) => s"('$t', '$i')" }.mkString(", ")
      val typeList = sorted.map(t => s"'${t.name}'").mkString(", ")
      val shapeCase = sorted.map { t =>
        val casts = t.idCols.indices
          .map(i => s"TRY_CAST(parts[${i + 1}] AS BIGINT) IS NOT NULL")
          .mkString(" AND ")
        s"WHEN '${t.name}' THEN len(parts) = ${t.idCols.size} AND $casts"
      }.mkString(" ")
      val idUnion = sorted.map { t =>
        val idExpr = t.idCols.map(c => s"CAST($c AS VARCHAR)")
          .mkString(" || '_' || ")
        s"SELECT '${t.name}' AS object_type, $idExpr AS id FROM ${t.name}"
      }.mkString(" UNION ALL ")
      s"""WITH cand AS (SELECT * FROM (VALUES $cands) AS v(object_type, id)),
         p AS (SELECT object_type, id, string_split(id, '_') AS parts
               FROM cand),
         ids AS ($idUnion)
         SELECT object_type, id,
           object_type IN ($typeList) AS known_type,
           object_type IN ($typeList) AND
             COALESCE(CASE object_type $shapeCase END, FALSE) AS valid,
           EXISTS(SELECT 1 FROM ids i WHERE i.object_type = p.object_type
                  AND i.id = p.id) AS id_exists
         FROM p ORDER BY object_type, id"""
    },

    // Combined closure cascade: parents pass (proot→pcust→pnat→preg), then
    // children pass from the ACCUMULATED sets top-down (reference pass
    // order, sqlite/v04_00.py:614-682). UNION (not ALL) inside the CTEs =
    // the distinct merge of the Spark BFS.
    "q29_full_closure" ->
      """WITH proot AS (SELECT * FROM orders WHERE o_orderkey IN (1,2,3)),
         pcust AS (SELECT * FROM customer
                   WHERE c_custkey IN (SELECT o_custkey FROM proot)),
         pnat AS (SELECT * FROM nation
                  WHERE n_nationkey IN (SELECT c_nationkey FROM pcust)),
         preg AS (SELECT * FROM region
                  WHERE r_regionkey IN (SELECT n_regionkey FROM pnat)),
         cnat AS (SELECT * FROM nation
                  WHERE n_regionkey IN (SELECT r_regionkey FROM preg)
                  UNION SELECT * FROM pnat),
         ccust AS (SELECT * FROM customer
                   WHERE c_nationkey IN (SELECT n_nationkey FROM cnat)
                   UNION SELECT * FROM pcust),
         csupp AS (SELECT * FROM supplier
                   WHERE s_nationkey IN (SELECT n_nationkey FROM cnat)),
         cord AS (SELECT * FROM orders
                  WHERE o_custkey IN (SELECT c_custkey FROM ccust)
                  UNION SELECT * FROM proot),
         cliids AS (SELECT l_orderkey, l_linenumber FROM lineitem
                    WHERE l_orderkey IN (SELECT o_orderkey FROM cord)
                    UNION SELECT l_orderkey, l_linenumber FROM lineitem
                    WHERE l_suppkey IN (SELECT s_suppkey FROM csupp)),
         -- width restored by id, as the reference does (FROM t INNER JOIN
         -- (…ids…) USING (id fields)): every row sharing a matched id
         -- tuple is returned, with its multiplicity
         cli AS (SELECT lineitem.l_orderkey, lineitem.l_linenumber
                 FROM lineitem JOIN cliids
                 USING (l_orderkey, l_linenumber))
         SELECT object_type, id FROM (
           SELECT 'region' AS object_type,
             CAST(r_regionkey AS VARCHAR) AS id FROM preg
           UNION ALL SELECT 'nation', CAST(n_nationkey AS VARCHAR) FROM cnat
           UNION ALL SELECT 'customer', CAST(c_custkey AS VARCHAR) FROM ccust
           UNION ALL SELECT 'supplier', CAST(s_suppkey AS VARCHAR) FROM csupp
           UNION ALL SELECT 'orders', CAST(o_orderkey AS VARCHAR) FROM cord
           UNION ALL SELECT 'lineitem',
             CAST(l_orderkey AS VARCHAR) || '_' ||
             CAST(l_linenumber AS VARCHAR) FROM cli
         ) ORDER BY object_type, id""",

    // Union of the three patterns' matches; UNION (not ALL) = the
    // cross-pattern distinct merge of PatternQuery.runAll.
    "q30_multi_pattern" ->
      """SELECT object_type, id FROM (
           SELECT 'orders' AS object_type, CAST(o_orderkey AS VARCHAR) AS id
           FROM orders WHERE o_custkey IN (21, 22, 23, 30)
           UNION
           SELECT 'customer', CAST(c_custkey AS VARCHAR)
           FROM customer WHERE c_nationkey = 1
         ) ORDER BY object_type, id""",

    "d01_dedup_exact" ->
      s"""SELECT COUNT(*) AS n_docs,
         COUNT(DISTINCT md5($normText)) AS n_unique,
         COUNT(*) - COUNT(DISTINCT md5($normText)) AS n_dup_docs
         FROM documents""",

    // d04 is EXACT, so it gets a full DuckDB oracle (the inverted index
    // generates every pair sharing >= 1 shingle; any pair with jaccard
    // >= tau > 0 shares a shingle, so none is missed): same shingle CTE
    // shape as d09/d10, pairwise jaccard via |A∩B| counting and
    // |A∪B| = |A|+|B|−|A∩B|. Rounded to 6 dp in both engines (the repo's
    // float-emission convention); the threshold filter applies pre-round.
    // MinHash+LSH near-dups over the exported shingle-hash dictionary:
    // permutations, exact band keys, candidate join and exact jaccard
    // all re-derived; only the two shingle hashes are taken as model.
    "d02_dedup_minhash" ->
      s"""WITH ${minhashPrefixSql("d02")},
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM bd a JOIN bd b ON a.band = b.band AND a.bh = b.bh
               WHERE a.doc_id < b.doc_id),
         ${jaccardTailSql("id_a", "id_b")}
         SELECT id_a, id_b, jaccard FROM j
         WHERE jaccard >= ${graft.SparkEntry.d02Tau}
         ORDER BY id_a, id_b""",

    // d13 = d02's prefix with cross-split candidate orientation
    // (eval = doc_id % 10 == 0 probes x train) and the 0.5 threshold
    // applied PRE-round like the gate.
    "d13_fuzzy_decontam" ->
      s"""WITH ${minhashPrefixSql("d13")},
         cand AS (SELECT DISTINCT a.doc_id AS eval_id, b.doc_id AS train_id
               FROM bd a JOIN bd b ON a.band = b.band AND a.bh = b.bh
               WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
         ${jaccardTailSql("eval_id", "train_id")}
         SELECT eval_id, train_id, round(jaccard, 6) AS jaccard
         FROM j WHERE jaccard >= ${graft.SparkEntry.d13Tau}
         ORDER BY eval_id, train_id""",

    // SimHash near-dups over the exported token-hash dictionary:
    // per-bit votes, sign signature (HUGEINT bit build folded to
    // signed BIGINT), pigeonhole chunks, hamming — all re-derived.
    "d03_dedup_simhash" ->
      s"""WITH dict AS (SELECT t, h
               FROM read_parquet(${modelGlob("d03", "token_hashes")})),
         tok AS (SELECT DISTINCT doc_id, u.t
               FROM (SELECT doc_id, string_split($normText, ' ') AS arr
                     FROM documents), unnest(arr) AS u(t)),
         v AS (SELECT tok.doc_id, b.i,
                 CAST(SUM(CASE WHEN (d.h >> b.i) & 1 = 1
                   THEN 1 ELSE -1 END) AS BIGINT) AS v
               FROM tok JOIN dict d USING (t),
                 unnest(generate_series(0, 63)) AS b(i)
               GROUP BY 1, 2),
         sg AS (SELECT doc_id, ${toS(
          "CAST(SUM(CASE WHEN v > 0 THEN (1::HUGEINT << i) " +
            "ELSE 0::HUGEINT END) AS HUGEINT)")} AS sig
               FROM v GROUP BY 1),
         ch AS (SELECT doc_id, sig, c.j AS chunk_idx,
                 (sig >> (16 * c.j)) & 65535 AS chunk
               FROM sg, unnest(generate_series(0, 3)) AS c(j)),
         p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS dist,
                 a.sig AS sig_a, b.sig AS sig_b
               FROM ch a JOIN ch b
                 ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
               WHERE a.doc_id < b.doc_id)
         SELECT id_a, id_b, dist, sig_a, sig_b FROM p WHERE dist <= 3
         ORDER BY id_a, id_b""",

    // m08: pigeonhole pairing over the exported aHash signature frame —
    // d03's chunk/hamming tail, the hash values themselves being the
    // model (BinarySpec pins them against a reference decode).
    "m08_phash_neardup" ->
      s"""WITH sg AS (SELECT id, sig FROM read_parquet(
             ${modelGlob("m08", "hash_sigs")})),
         ch AS (SELECT id, sig, c.j AS chunk_idx,
               (sig >> (16 * c.j)) & 65535 AS chunk
             FROM sg, unnest(generate_series(0, 3)) AS c(j)),
         p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS dist
             FROM ch a JOIN ch b
               ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
             WHERE a.id < b.id)
         SELECT id_a, id_b, dist FROM p WHERE dist <= 3
         ORDER BY id_a, id_b""",

    "d04_ngram_jaccard" ->
      s"""WITH arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                        FROM documents),
         sh AS (SELECT DISTINCT doc_id, array_to_string(arr[i:i+2], ' ') AS g
                FROM arrs,
                  unnest(generate_series(1, greatest(len(arr) - 2, 1)))
                  AS u(i)),
         sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     COUNT(*) AS ix
                   FROM sh a JOIN sh b USING (g)
                   WHERE a.doc_id % 10 = 0 AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         j AS (SELECT id_a, id_b,
                 CAST(ix AS DOUBLE) / (sa.sz + sb.sz - ix) AS jaccard
               FROM inter
                 JOIN sz sa ON sa.doc_id = id_a
                 JOIN sz sb ON sb.doc_id = id_b)
         SELECT id_a, id_b, round(jaccard, 6) AS jaccard
         FROM j WHERE jaccard >= 0.02 ORDER BY id_a, id_b""",

    // d17: plant, shingles, size-orientation and threshold re-derived;
    // the base CTE's quote twin mirrors the gate's raw-word slice
    // BEFORE normalization, exactly as the Spark side builds it.
    "d17_containment" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 2000000,
             array_to_string((string_split(text, ' '))[1:greatest(6,
               len(string_split(text, ' ')) // 3)], ' ')
           FROM documents WHERE doc_id % 20 = 0),
         arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                  FROM base),
         sh AS (SELECT DISTINCT doc_id,
                  array_to_string(arr[i:i+2], ' ') AS g
                FROM arrs,
                  unnest(generate_series(1, greatest(len(arr) - 2, 1)))
                  AS u(i)),
         sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     COUNT(*) AS ix
                   FROM sh a JOIN sh b USING (g)
                   WHERE a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         o AS (SELECT
                 CASE WHEN sa.sz <= sb.sz THEN id_a ELSE id_b END
                   AS id_small,
                 CASE WHEN sa.sz <= sb.sz THEN id_b ELSE id_a END
                   AS id_big,
                 CAST(ix AS BIGINT) AS inter,
                 LEAST(sa.sz, sb.sz) AS sz_small,
                 GREATEST(sa.sz, sb.sz) AS sz_big,
                 CAST(ix AS DOUBLE) / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE)
                   AS containment
               FROM inter
                 JOIN sz sa ON sa.doc_id = id_a
                 JOIN sz sb ON sb.doc_id = id_b)
         SELECT id_small, id_big, inter,
           CAST(sz_small AS BIGINT) AS sz_small,
           CAST(sz_big AS BIGINT) AS sz_big,
           round(containment, 6) AS containment
         FROM o WHERE containment >= 0.9
         ORDER BY id_small, id_big""",

    // d16: d04's exact pair rule + recursive reach + per-cluster argmax
    // by (6-dp quality DESC, doc_id ASC) — keep-the-best disposal.
    "d16_cluster_best" ->
      s"""WITH RECURSIVE
         arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                  FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                  array_to_string(arr[i:i+2], ' ') AS g
                FROM arrs,
                  unnest(generate_series(1, greatest(len(arr) - 2, 1)))
                  AS u(i)),
         sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     COUNT(*) AS ix
                   FROM sh a JOIN sh b USING (g)
                   WHERE a.doc_id % 10 = 0 AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         p AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
                 CAST(ix AS DOUBLE) / (sa.sz + sb.sz - ix) AS jaccard
               FROM inter
                 JOIN sz sa ON sa.doc_id = id_a
                 JOIN sz sb ON sb.doc_id = id_b)
               WHERE jaccard >= 0.02),
         e AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION SELECT id_b, id_a FROM p),
         reach(id, label) AS (
           SELECT src, src FROM e
           UNION
           SELECT e.dst, r.label FROM e JOIN reach r ON e.src = r.id),
         cl AS (SELECT id, MIN(label) AS cluster_id
                FROM reach GROUP BY id),
         scored AS (SELECT cl.cluster_id, cl.id,
             round($qualitySql, 6) AS q
           FROM cl JOIN documents d ON d.doc_id = cl.id),
         ranked AS (SELECT cluster_id, id, q, row_number() OVER (
               PARTITION BY cluster_id ORDER BY q DESC, id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
           FROM scored)
         SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
           id AS rep_doc_id, q AS rep_quality
         FROM ranked WHERE rn = 1 ORDER BY cluster_id""",

    "d05_embed_neardup" ->
      s"""WITH p AS (SELECT vec_id AS id_a, embedding AS v_a
                     FROM embeddings WHERE vec_id % 20 = 0),
         c AS (SELECT vec_id AS id_b, embedding AS v_b FROM embeddings)
         SELECT id_a, id_b FROM p JOIN c ON id_a < id_b
         WHERE ${cosD("v_a", "v_b")} >= 0.25
         ORDER BY id_a, id_b""",

    "d06_dedup_clusters" ->
      s"""WITH RECURSIVE p AS (
           SELECT id_a, id_b FROM (
             SELECT va.vec_id AS id_a, vb.vec_id AS id_b,
               ${cosD("va.embedding", "vb.embedding")} AS cos
             FROM embeddings va JOIN embeddings vb
               ON va.vec_id % 20 = 0 AND va.vec_id < vb.vec_id)
           WHERE cos >= 0.25),
         e AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION SELECT id_b, id_a FROM p),
         reach(id, label) AS (
           SELECT src, src FROM e
           UNION
           SELECT e.dst, r.label FROM e JOIN reach r ON e.src = r.id)
         SELECT id AS vec_id, MIN(label) AS cluster_id
         FROM reach GROUP BY id ORDER BY vec_id""",

    // d15: d06's components + sizes + the universe left join; singletons
    // default to their own id with weight 1.
    "d15_dedup_weights" ->
      s"""WITH RECURSIVE p AS (
           SELECT id_a, id_b FROM (
             SELECT va.vec_id AS id_a, vb.vec_id AS id_b,
               ${cosD("va.embedding", "vb.embedding")} AS cos
             FROM embeddings va JOIN embeddings vb
               ON va.vec_id % 20 = 0 AND va.vec_id < vb.vec_id)
           WHERE cos >= 0.25),
         e AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION SELECT id_b, id_a FROM p),
         reach(id, label) AS (
           SELECT src, src FROM e
           UNION
           SELECT e.dst, r.label FROM e JOIN reach r ON e.src = r.id),
         cl AS (SELECT id, MIN(label) AS cluster FROM reach GROUP BY id),
         sz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM cl GROUP BY 1)
         SELECT emb.vec_id,
           COALESCE(cl.cluster, emb.vec_id) AS cluster_id,
           COALESCE(sz.cluster_size, CAST(1 AS BIGINT)) AS cluster_size,
           CAST(1 AS DOUBLE) /
             COALESCE(sz.cluster_size, CAST(1 AS BIGINT)) AS weight
         FROM embeddings emb
           LEFT JOIN cl ON cl.id = emb.vec_id
           LEFT JOIN sz ON sz.cluster = cl.cluster
         ORDER BY emb.vec_id""",

    // d08: SemDeDup from the gate's exported k-means fit — cell
    // assignment (ivfAssignSql, Ivf.assign's tie-break), within-cell
    // qualifying pairs at exact double cosine, then the min-id witness
    // per dropped id (Spark's min(struct(id_a, cos)) = lexicographic
    // min; (id_a, id_b) pairs are unique so id_a alone decides).
    "d08_semantic_dedup" ->
      s"""WITH ${ivfAssignSql("d08")},
         pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ${cosD("ea.embedding", "eb.embedding")} AS cos
             FROM cell a JOIN cell b
               ON a.cluster = b.cluster AND a.vec_id < b.vec_id
             JOIN embeddings ea ON ea.vec_id = a.vec_id
             JOIN embeddings eb ON eb.vec_id = b.vec_id),
         qp AS (SELECT * FROM pr WHERE cos >= ${graft.SparkEntry.d08Tau}),
         wit AS (SELECT id_b AS vec_id, id_a AS witness_id,
               cos AS witness_cos FROM (
             SELECT id_b, id_a, cos,
               row_number() OVER (PARTITION BY id_b
                 ORDER BY id_a ASC, cos ASC) AS rn FROM qp)
           WHERE rn = 1)
         SELECT e.vec_id, w.witness_id IS NULL AS kept,
           w.witness_id, w.witness_cos
         FROM embeddings e LEFT JOIN wit w ON w.vec_id = e.vec_id
         ORDER BY e.vec_id""",

    "s01_knn_brute" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS v_p
                     FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id, embedding AS v_c
               FROM embeddings)
         SELECT probe_id, neighbor_id,
           CAST(row_number() OVER w AS INTEGER) AS rank
         FROM p JOIN c ON probe_id <> neighbor_id
         WINDOW w AS (PARTITION BY probe_id
                      ORDER BY ${cosD("v_p", "v_c")} DESC, neighbor_id ASC)
         QUALIFY row_number() OVER w <= 3
         ORDER BY probe_id, rank""",

    // SQ8 codes are floor((v-lo)*255/(hi-lo) + 0.5): one stated double
    // operation order, so both engines produce identical integers and the
    // per-vector md5 over the comma-joined code sequence hash-matches.
    "s11_sq8_encode" ->
      """WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
              FROM embeddings,
                unnest(generate_series(1, len(embedding))) AS u(i)),
         mm AS (SELECT i, MIN(v) AS lo, MAX(v) AS hi FROM ex GROUP BY i),
         codes AS (SELECT vec_id, ex.i,
             CASE WHEN hi = lo THEN 0
               ELSE CAST(least(greatest(
                 floor((v - lo) * 255.0 / (hi - lo) + 0.5), 0), 255) AS INT)
             END AS code
           FROM ex JOIN mm ON ex.i = mm.i)
         SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(SUM(code) AS BIGINT) AS code_sum,
           MIN(code) AS code_min, MAX(code) AS code_max,
           md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY i))
             AS codes_md5
         FROM codes GROUP BY vec_id ORDER BY vec_id""",

    // Code-space cosines are integer-derived (dot and norms of byte
    // codes are exact in double under any summation order), so both
    // rankings and every recall are reproduced bit-for-bit.
    "s12_sq8_recall" ->
      s"""WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
              FROM embeddings,
                unnest(generate_series(1, len(embedding))) AS u(i)),
         mm AS (SELECT i, MIN(v) AS lo, MAX(v) AS hi FROM ex GROUP BY i),
         codes AS (SELECT vec_id, ex.i,
             CASE WHEN hi = lo THEN 0
               ELSE CAST(least(greatest(
                 floor((v - lo) * 255.0 / (hi - lo) + 0.5), 0), 255) AS INT)
             END AS code
           FROM ex JOIN mm ON ex.i = mm.i),
         nrm AS (SELECT vec_id, CAST(SUM(code * code) AS BIGINT) AS n2
                 FROM codes GROUP BY vec_id),
         cd AS (SELECT pc.vec_id AS probe_id, cc.vec_id AS neighbor_id,
             CAST(SUM(pc.code * cc.code) AS BIGINT) AS dot
           FROM codes pc JOIN codes cc
             ON pc.i = cc.i AND pc.vec_id < 5 AND pc.vec_id <> cc.vec_id
           GROUP BY 1, 2),
         ck AS (SELECT probe_id, neighbor_id
           FROM (SELECT probe_id, neighbor_id,
               row_number() OVER (PARTITION BY probe_id ORDER BY
                 CAST(dot AS DOUBLE) /
                   (sqrt(CAST(np.n2 AS DOUBLE)) *
                    sqrt(CAST(nc.n2 AS DOUBLE))) DESC,
                 neighbor_id ASC) AS rn
             FROM cd
               JOIN nrm np ON np.vec_id = cd.probe_id
               JOIN nrm nc ON nc.vec_id = cd.neighbor_id)
           WHERE rn <= 5),
         p AS (SELECT vec_id AS probe_id, embedding AS v_p
               FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id, embedding AS v_c
               FROM embeddings),
         bk AS (SELECT probe_id, neighbor_id
           FROM (SELECT probe_id, neighbor_id,
               row_number() OVER (PARTITION BY probe_id
                 ORDER BY ${cosD("v_p", "v_c")} DESC, neighbor_id ASC)
                 AS rn
             FROM p JOIN c ON probe_id <> neighbor_id)
           WHERE rn <= 5),
         hits AS (SELECT bk.probe_id, COUNT(ck.neighbor_id) AS n_hits
           FROM bk LEFT JOIN ck
             ON bk.probe_id = ck.probe_id
               AND bk.neighbor_id = ck.neighbor_id
           GROUP BY 1)
         SELECT probe_id, CAST(n_hits AS BIGINT) AS n_hits,
           round(CAST(n_hits AS DOUBLE) / 5, 6) AS recall
         FROM hits ORDER BY probe_id""",

    // Banded SRP-LSH over the gate's exported plane table: ordered
    // projections, sign buckets, banded candidates, exact cosine rank.
    "s02_knn_lsh" ->
      s"""WITH ${srpSigSql("s02")},
         cand AS (SELECT DISTINCT a.vec_id AS probe_id,
               b.vec_id AS neighbor_id
             FROM sig a JOIN sig b
               ON a.tbl = b.tbl AND a.bucket = b.bucket
             WHERE a.vec_id < $annProbe AND a.vec_id <> b.vec_id),
         $cosRankTail""",

    // s04 = s02 with every row a probe (the kNN-graph construction).
    "s04_knn_graph" ->
      s"""WITH ${srpSigSql("s04")},
         cand AS (SELECT DISTINCT a.vec_id AS probe_id,
               b.vec_id AS neighbor_id
             FROM sig a JOIN sig b
               ON a.tbl = b.tbl AND a.bucket = b.bucket
             WHERE a.vec_id <> b.vec_id),
         $cosRankTail""",

    // IVF over the gate's exported centroids: cell assignment +
    // probe-cell selection (ivfCellsSql) bound the candidates, exact
    // cosine ranks them.
    "s03_knn_ivf" ->
      s"""WITH ${ivfCellsSql("s03")},
         cand AS (SELECT pc.probe_id, ce.vec_id AS neighbor_id
               FROM cell ce JOIN pcell pc USING (cluster)
               WHERE ce.vec_id <> pc.probe_id),
         $cosRankTail""",

    // PQ+refine over the gate's exported codebooks: cand = every
    // (probe, other-vector) pair (pqKnnFromModel streams probes against
    // the whole code table), then the shared ADC tail.
    "s07_knn_pq" ->
      s"""WITH ${pqPrefixSql("s07")},
         cand AS (SELECT l.probe_id, e.vec_id AS id
               FROM (SELECT DISTINCT probe_id FROM lut) l, embeddings e
               WHERE e.vec_id <> l.probe_id),
         $adcTailSql""",

    "s08_knn_ivfpq" -> ivfAdcOracleSql("s08"),

    // s09's query path IS s08's oracle arithmetic: admission is
    // row-local given the loaded models, so one-shot encode+assign over
    // the whole corpus equals the gate's batch-at-a-time union
    // bit-for-bit (ModelStoreSpec pins that equality).
    "s09_incr_encode" -> ivfAdcOracleSql("s09"),

    // Streaming admission re-derived per row from the exported models:
    // cluster = cosine-nearest centroid, codes = the comma-joined
    // argmin-L2 code string (string_agg ORDER BY sub == concat_ws over
    // the sub-sorted array).
    "st05_index_ingest" ->
      s"""WITH ${pqPrefixSql("st05")},
         ${ivfCellsSql("st05")},
         cs AS (SELECT vec_id,
               string_agg(CAST(code AS VARCHAR), ',' ORDER BY sub)
                 AS codes
             FROM enc GROUP BY 1)
         SELECT cs.vec_id AS id, cell.cluster, cs.codes
         FROM cs JOIN cell USING (vec_id) ORDER BY id""",

    // s13: the init-quality profile re-derived from BOTH exported
    // centroid fits — per-row max cosine, exact-decimal cost total
    // (round-6 per row into DECIMAL(28,6), the gate's rule), occupied
    // cells via the assign tie-break.
    "s13_kmeanspp_init" -> {
      def prof(name: String): String =
        s"""SELECT '$name' AS init,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mx_$name) AS n_rows,
           (SELECT CAST(COUNT(DISTINCT cl) AS BIGINT) FROM asg_$name)
             AS n_cells,
           (SELECT round(CAST(SUM(CAST(round(1.0 - mc, 6)
               AS DECIMAL(28,6))) AS DOUBLE), 6) FROM mx_$name)
             AS total_cost"""
      def ctes(name: String): String =
        s"""cents_$name AS (SELECT cluster, centroid FROM read_parquet(
               '${graft.SparkEntry.gateModelSqlPath("s13")}/$name/*.parquet')),
           mx_$name AS (SELECT e.vec_id,
                 MAX(${cosD("e.embedding", "c.centroid")}) AS mc
               FROM embeddings e, cents_$name c GROUP BY 1),
           asg_$name AS (SELECT vec_id, cl FROM (
                 SELECT e.vec_id, c.cluster AS cl,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${cosD("e.embedding", "c.centroid")} DESC,
                       c.cluster ASC) AS rn
                 FROM embeddings e, cents_$name c) WHERE rn = 1)"""
      s"""WITH ${ctes("lowid")},
         ${ctes("kmpp")}
         SELECT * FROM (${prof("lowid")} UNION ALL ${prof("kmpp")})
         ORDER BY init"""
    },

    "s10_random_projection" ->
      s"""WITH dims AS (SELECT unnest(generate_series(1,
               ${graft.SparkEntry.s10OutDim})) AS j),
         prod AS (SELECT vec_id, j,
             CAST(SUM(CAST(embedding[i] AS DOUBLE) *
                 CASE WHEN substr(md5('${graft.SparkEntry.s10Seed}:'
                     || i || ':' || j), 1, 1) <= '7'
                   THEN 1.0 ELSE -1.0 END) AS DOUBLE) AS v
           FROM embeddings, dims,
             unnest(generate_series(1, len(embedding))) AS u(i)
           GROUP BY 1, 2)
         SELECT vec_id, CAST(j AS INT) AS dim, round(v, 6) AS value
         FROM prod ORDER BY vec_id, dim""",

    "s05_knn_classify" ->
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS v_p,
                label AS true_label FROM embeddings WHERE vec_id < 100),
         c AS (SELECT vec_id AS neighbor_id, embedding AS v_c,
               label AS n_label FROM embeddings),
         nn AS (SELECT probe_id, true_label, n_label,
                 row_number() OVER (PARTITION BY probe_id
                   ORDER BY ${cosD("v_p", "v_c")} DESC, neighbor_id ASC)
                   AS rn
                FROM p JOIN c ON probe_id <> neighbor_id),
         votes AS (SELECT probe_id, true_label, n_label, COUNT(*) AS votes
                   FROM nn WHERE rn <= 5 GROUP BY 1, 2, 3),
         best AS (SELECT probe_id, true_label, n_label AS pred_label, votes,
                   row_number() OVER (PARTITION BY probe_id
                     ORDER BY votes DESC, n_label ASC) AS r
                  FROM votes)
         SELECT probe_id, true_label, pred_label, votes
         FROM best WHERE r = 1 ORDER BY probe_id""",

    // Centroid = per-dim DECIMAL-exact SUM surfaced as double (associative
    // -> engine-portable bit-identical; cosine is scale-invariant so the
    // sum classifies exactly like the mean).
    "s06_class_centroids" ->
      s"""WITH ex AS (SELECT label AS c_label, i AS pos,
                CAST(embedding[i] AS DECIMAL(27,10)) AS x
              FROM embeddings,
                unnest(generate_series(1, len(embedding))) AS u(i)),
         cm AS (SELECT c_label, pos, CAST(SUM(x) AS DOUBLE) AS m
                FROM ex GROUP BY 1, 2),
         carr AS (SELECT c_label, list(m ORDER BY pos) AS centroid
                  FROM cm GROUP BY 1),
         scored AS (SELECT vec_id, label, c_label,
                     ${cosD("embedding", "centroid")} AS cos
                    FROM embeddings, carr),
         pred AS (SELECT vec_id, label, c_label AS pred_label,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY cos DESC, c_label ASC) AS rn
                  FROM scored)
         SELECT label, pred_label, COUNT(*) AS n
         FROM pred WHERE rn = 1
         GROUP BY 1, 2 ORDER BY label, pred_label""",

    "t01_langid" -> {
      val scoreCols = graft.text.TextOps.profiles
        .map { case (l, _) => s"${langScore(l)} AS s_$l" }.mkString(",\n")
      val langs = graft.text.TextOps.profiles.map(_._1)
      val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val caseExpr = langs.map(l => s"WHEN s_$l = $m THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH scored AS (SELECT doc_id, $scoreCols FROM documents)
         SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
           $caseExpr AS lang_pred
         FROM scored ORDER BY doc_id"""
    },

    // The t01 scoring CTE grouped against the ground-truth lang column;
    // tie order (first-listed profile wins) is identical in the CASE.
    "t16_langid_eval" -> {
      val scoreCols = graft.text.TextOps.profiles
        .map { case (l, _) => s"${langScore(l)} AS s_$l" }.mkString(",\n")
      val langs = graft.text.TextOps.profiles.map(_._1)
      val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val caseExpr = langs.map(l => s"WHEN s_$l = $m THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH scored AS (SELECT lang AS lang_true, $scoreCols
              FROM documents)
         SELECT lang_true, $caseExpr AS lang_pred, COUNT(*) AS n
         FROM scored GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    // e12: Cohen's kappa over the same langid prediction as t16 —
    // exact confusion totals, per-class chance contributions, the
    // all-integer kappa identity in HUGEINT twinning decimal(38,0).
    "e12_cohens_kappa" -> {
      val scoreCols = graft.text.TextOps.profiles
        .map { case (l, _) => s"${langScore(l)} AS s_$l" }.mkString(",\n")
      val langs = graft.text.TextOps.profiles.map(_._1)
      val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val caseExpr = langs.map(l => s"WHEN s_$l = $m THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH scored AS (SELECT lang AS t, $scoreCols
             FROM documents),
         cm AS (SELECT $caseExpr AS p, t,
             CAST(COUNT(*) AS BIGINT) AS n_pt
           FROM scored GROUP BY 1, 2),
         cls AS (SELECT DISTINCT label FROM
           (SELECT p AS label FROM cm UNION ALL SELECT t FROM cm)),
         pt AS (SELECT p AS label, CAST(SUM(n_pt) AS BIGINT) AS n_pred
           FROM cm GROUP BY 1),
         tt AS (SELECT t AS label, CAST(SUM(n_pt) AS BIGINT) AS n_true
           FROM cm GROUP BY 1),
         dg AS (SELECT p AS label, n_pt AS n_agree FROM cm WHERE p = t),
         bc AS (SELECT c.label,
             COALESCE(pt.n_pred, 0) AS n_pred,
             COALESCE(tt.n_true, 0) AS n_true,
             COALESCE(dg.n_agree, 0) AS n_agree,
             COALESCE(pt.n_pred, 0) * COALESCE(tt.n_true, 0) AS pe
           FROM cls c LEFT JOIN pt USING (label)
           LEFT JOIN tt USING (label) LEFT JOIN dg USING (label)),
         ag AS (SELECT CAST(SUM(n_pred) AS BIGINT) AS n,
             CAST(SUM(n_agree) AS BIGINT) AS agree,
             CAST(SUM(CAST(pe AS HUGEINT)) AS HUGEINT) AS pe FROM bc)
         SELECT kind, label, n_pred, n_true, n_agree, pe, kappa FROM (
           SELECT 'class' AS kind, label, n_pred, n_true, n_agree, pe,
             0.0 AS kappa FROM bc
           UNION ALL
           SELECT 'total', '', n, n, agree, CAST(pe AS BIGINT),
             CAST(CAST(n AS HUGEINT)*agree - pe AS DOUBLE) /
             CAST(CAST(n AS HUGEINT)*n - pe AS DOUBLE)
           FROM ag)
         ORDER BY kind, label"""
    },

    "t02_quality" ->
      s"""SELECT doc_id, $qualitySql AS quality
         FROM documents ORDER BY doc_id""",

    // t17: integer sentence/word/syllable counts (stated rules shared
    // with TextOps.readability), then the Flesch / FK chains in the
    // same double-op order as the Spark side.
    "t17_readability" ->
      s"""WITH c AS (SELECT doc_id,
             $wordCountSql AS n_words,
             greatest(CAST(1 AS BIGINT), CAST(length(
               regexp_extract_all(text, '[.!?]+')) AS BIGINT))
               AS n_sentences,
             CAST(length(regexp_extract_all($normText, '[aeiouy]+'))
               AS BIGINT) +
             CAST(length(list_filter(string_split($normText, ' '),
               w -> NOT regexp_matches(w, '[aeiouy]'))) AS BIGINT)
               AS n_syllables
           FROM documents),
         r AS (SELECT doc_id, n_words, n_sentences, n_syllables,
             CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE) AS wps,
             CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE) AS spw
           FROM c)
         SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words > 0 THEN round(CAST(206.835 AS DOUBLE) -
             CAST(1.015 AS DOUBLE) * wps - CAST(84.6 AS DOUBLE) * spw, 6)
           END AS flesch_ease,
           CASE WHEN n_words > 0 THEN round(CAST(0.39 AS DOUBLE) * wps +
             CAST(11.8 AS DOUBLE) * spw - CAST(15.59 AS DOUBLE), 6)
           END AS fk_grade
         FROM r ORDER BY doc_id""",

    "t07_quality_quota" ->
      s"""WITH q AS (SELECT source, doc_id, $qualitySql AS quality
           FROM documents),
         r AS (SELECT source, doc_id, quality,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY quality DESC, doc_id ASC) AS INT) AS rank
               FROM q)
         SELECT source, doc_id, rank, quality FROM r WHERE rank <= 20
         ORDER BY source, rank""",

    "t03_tokens" ->
      s"""SELECT doc_id, $wordCountSql AS ws_tokens,
         CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
         FROM documents ORDER BY doc_id""",

    "t04_fingerprint" ->
      s"""SELECT doc_id, md5($normText) AS fp
         FROM documents ORDER BY doc_id""",

    "t06_repetition" ->
      s"""WITH arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                        FROM documents),
         toks AS (SELECT doc_id, arr[i] AS tok, i AS ord
                  FROM arrs, unnest(generate_series(1, len(arr))) AS u(i)),
         tc AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2),
         ta AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
                       COUNT(*) AS n_distinct, MAX(n) AS top_tok
                FROM tc GROUP BY 1),
         bg AS (SELECT doc_id, tok || ' ' ||
                       LEAD(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS g
                FROM toks),
         bc AS (SELECT doc_id, g, COUNT(*) AS n FROM bg
                WHERE g IS NOT NULL GROUP BY 1, 2),
         ba AS (SELECT doc_id, MAX(n) AS top_bigram FROM bc GROUP BY 1)
         SELECT ta.doc_id, n_tokens,
           CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_frac,
           CAST(top_tok AS DOUBLE) / n_tokens AS top_tok_frac,
           CASE WHEN n_tokens < 2 THEN 0.0
                ELSE CAST(top_bigram AS DOUBLE) / (n_tokens - 1)
           END AS top_bigram_frac
         FROM ta LEFT JOIN ba USING (doc_id)
         ORDER BY doc_id""",

    "t05_corpus_stats" ->
      s"""SELECT
         (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT CAST(SUM($wordCountSql) AS BIGINT) FROM documents)
            AS total_ws_tokens,
         (SELECT CAST(SUM(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
            FROM documents) AS total_bpe_est,
         (SELECT COUNT(DISTINCT tok) FROM
            (SELECT unnest(string_split($normText, ' ')) AS tok
             FROM documents)) AS vocab_size""",

    "d07_incr_dedup" ->
      s"""WITH d AS (SELECT doc_id, md5($normText) AS fp FROM documents),
         corpus AS (SELECT * FROM d WHERE doc_id < 400),
         batch AS (SELECT * FROM d WHERE doc_id >= 400)
         SELECT MIN(doc_id) AS doc_id, fp FROM batch
         WHERE fp NOT IN (SELECT fp FROM corpus)
         GROUP BY fp ORDER BY doc_id""",

    "d09_contamination" -> contaminationSql,

    // The bloom pre-screen is result-invariant (no false negatives), so
    // d11's oracle IS d09's exact SQL — the gate proves the prefilter
    // never drops a hit.
    "d11_bloom_decontam" -> contaminationSql,

    "p01_pack_sequences" ->
      s"""WITH base AS (SELECT doc_id, $wordCountSql AS n_tokens,
                doc_id % 8 AS bucket FROM documents),
         off AS (SELECT doc_id, n_tokens, bucket,
                COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY bucket
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING) AS BIGINT), 0) AS tok_offset
                FROM base)
         SELECT doc_id, n_tokens, bucket, tok_offset,
           CAST(floor(tok_offset / 256.0) AS BIGINT) AS seq_first,
           CAST(floor((tok_offset + n_tokens - 1) / 256.0) AS BIGINT)
             AS seq_last
         FROM off ORDER BY doc_id""",

    "p02_mixture_sample" ->
      s"""WITH flags AS (SELECT source, $mixtureWeightSql AS weight,
                CAST(concat('0x', substr(md5(concat('${
                  graft.SparkEntry.p02Seed}', CAST(doc_id AS VARCHAR))),
                  1, 15)) AS BIGINT) / 1152921504606846976.0 AS u
                FROM documents)
         SELECT source, weight, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN u < weight THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
         FROM flags GROUP BY source, weight ORDER BY source""",

    // Token-budget mixture plan: all allocation arithmetic integer
    // (// is floor division on non-negative BIGINTs, Spark's div), the
    // one double is a single division of two exact integers.
    "p08_token_budget" ->
      s"""WITH per AS (SELECT source, COUNT(*) AS n_docs,
              CAST(SUM($wordCountSql) AS BIGINT) AS avail_tokens
            FROM documents GROUP BY source),
         tot AS (SELECT CAST(SUM(avail_tokens) AS BIGINT) AS budget
                 FROM per),
         plan AS (SELECT source, n_docs, avail_tokens,
             CAST(budget * ($budgetWeightSql) // ${
               graft.SparkEntry.p08Weights.values.sum} AS BIGINT)
               AS desired_tokens
           FROM per, tot)
         SELECT source, n_docs, avail_tokens, desired_tokens,
           CAST(desired_tokens // avail_tokens AS BIGINT) AS full_epochs,
           round(CAST(desired_tokens AS DOUBLE) / avail_tokens, 6)
             AS epochs
         FROM plan ORDER BY source""",

    // Greedy no-straddle packing replayed as a recursive CTE: the bin
    // state (index, fill) steps doc by doc within each bucket — all
    // integer, bit-identical to the Spark fold.
    // p12: the composed pipeline — every stage's SQL is the SAME
    // fragment its standalone oracle uses (md5-normText fingerprint,
    // qualitySql, wordCountSql, the st07 cumsum-admission window, the
    // p01 pack windows), chained as CTEs.
    "p12_pipeline_e2e" -> {
      val minQ = graft.SparkEntry.p12MinQuality
      val quota = graft.SparkEntry.p12Quota
      s"""WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM
             (SELECT doc_id, md5($normText) AS fp FROM documents)
           GROUP BY fp),
         scored AS (SELECT d.doc_id, d.source,
             CAST($wordCountSql AS BIGINT) AS n_tokens,
             $qualitySql AS quality
           FROM documents d JOIN keep USING (doc_id)),
         qf AS (SELECT * FROM scored WHERE quality >= $minQ),
         adm AS (SELECT *, COALESCE(CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS prior
             FROM qf),
         a AS (SELECT doc_id, source, quality, n_tokens,
               doc_id % 8 AS bucket
             FROM adm WHERE prior < $quota),
         pk AS (SELECT *, COALESCE(CAST(SUM(n_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS tok_offset
             FROM a)
         SELECT doc_id, source, round(quality, 6) AS quality, n_tokens,
           CAST(bucket AS BIGINT) AS bucket, tok_offset,
           tok_offset // 256 AS seq_first,
           (tok_offset + n_tokens - 1) // 256 AS seq_last
         FROM pk ORDER BY doc_id"""
    },

    "p10_pack_greedy" ->
      s"""WITH RECURSIVE
         d AS (SELECT doc_id, doc_id % 8 AS bucket,
              CAST($wordCountSql AS BIGINT) AS n FROM documents),
         r AS (SELECT doc_id, bucket, n,
             row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
               AS rk
           FROM d),
         rec AS (
           SELECT bucket, rk, doc_id, n, CAST(1 AS BIGINT) AS bin,
             n AS used
           FROM r WHERE rk = 1
           UNION ALL
           SELECT r.bucket, r.rk, r.doc_id, r.n,
             CASE WHEN rec.used + r.n <= 256 THEN rec.bin
               ELSE rec.bin + 1 END,
             CASE WHEN rec.used + r.n <= 256 THEN rec.used + r.n
               ELSE r.n END
           FROM rec JOIN r ON r.bucket = rec.bucket AND r.rk = rec.rk + 1)
         SELECT doc_id, bucket, bin AS bin_idx,
           CAST(used - n AS BIGINT) AS "offset"
         FROM rec ORDER BY doc_id""",

    // Epoch expansion re-derived coin by coin: the plan CTEs are p08's,
    // the fractional-copy coin is p02's md5-double convention, and the
    // acceptance bound divides two exact integers — both sides of the
    // comparison bit-identical across engines.
    "p09_mixture_expand" ->
      s"""WITH d AS (SELECT doc_id, source,
              CAST($wordCountSql AS BIGINT) AS n_tokens FROM documents),
         per AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS avail
                 FROM d GROUP BY source),
         tot AS (SELECT CAST(SUM(avail) AS BIGINT) AS budget FROM per),
         plan AS (SELECT source, avail,
             CAST(budget * ($budgetWeightSql) // ${
               graft.SparkEntry.p08Weights.values.sum} AS BIGINT) AS desired
           FROM per, tot),
         ex AS (SELECT d.doc_id, d.source, d.n_tokens,
             CAST(desired // avail AS BIGINT) +
               CASE WHEN CAST(concat('0x', substr(md5('${
                 graft.SparkEntry.p09Seed}' || CAST(doc_id AS VARCHAR)),
                   1, 15)) AS BIGINT) / 1152921504606846976.0
                 < CAST(desired - (desired // avail) * avail AS DOUBLE)
                   / avail
               THEN 1 ELSE 0 END AS copies
           FROM d JOIN plan ON d.source = plan.source)
         SELECT source, CAST(SUM(copies) AS BIGINT) AS n_rows,
           CAST(SUM(n_tokens * copies) AS BIGINT) AS realized_tokens,
           CAST(MAX(copies) AS BIGINT) AS max_epoch
         FROM ex WHERE copies >= 1 GROUP BY source ORDER BY source""",

    // CDC chunk boundaries re-derived positionally (window-gram md5 ≤
    // the boundary digit, doc end always closes); the window join walks
    // consecutive boundary ranks — fine in the oracle, while the Spark
    // side segments row-locally inside array HOFs.
    "d14_cdc_chunks" ->
      s"""WITH arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                        FROM documents),
         nn AS (SELECT doc_id, arr, len(arr) AS n FROM arrs),
         ends AS (
           SELECT doc_id, i AS e
           FROM nn, unnest(generate_series(3, n - 1)) AS u(i)
           WHERE substr(md5(array_to_string(arr[i-2:i], ' ')), 1, 1) <= '1'
           UNION ALL SELECT doc_id, n FROM nn),
         ordered AS (SELECT doc_id, e,
             row_number() OVER (PARTITION BY doc_id ORDER BY e) AS k
           FROM ends),
         chunks AS (SELECT o.doc_id,
             md5(array_to_string(arr[COALESCE(p.e + 1, 1):o.e], ' '))
               AS chunk_md5
           FROM ordered o JOIN nn USING (doc_id)
             LEFT JOIN ordered p
               ON p.doc_id = o.doc_id AND p.k = o.k - 1),
         per AS (SELECT chunk_md5, doc_id, COUNT(*) AS c
                 FROM chunks GROUP BY 1, 2)
         SELECT chunk_md5, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(c) AS BIGINT) AS n_occurs
         FROM per GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY chunk_md5""",

    "d10_dup_spans" ->
      s"""WITH arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                        FROM documents),
         pos AS (SELECT doc_id, array_to_string(arr[i:i+4], ' ') AS g
                 FROM arrs,
                   unnest(generate_series(1, greatest(len(arr) - 4, 1)))
                   AS u(i)),
         dup AS (SELECT g FROM pos GROUP BY g
                 HAVING COUNT(DISTINCT doc_id) >= 2),
         tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM pos GROUP BY 1),
         hit AS (SELECT doc_id, COUNT(*) AS n_dup_spans FROM pos
                 WHERE g IN (SELECT g FROM dup) GROUP BY 1)
         SELECT tot.doc_id, n_spans,
           CAST(COALESCE(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           round(CAST(COALESCE(n_dup_spans, 0) AS DOUBLE) / n_spans, 6)
             AS dup_frac
         FROM tot LEFT JOIN hit USING (doc_id) ORDER BY tot.doc_id""",

    "d12_remove_dup_spans" ->
      s"""WITH arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                        FROM documents),
         toks AS (SELECT doc_id, i AS pos, arr[i] AS token
                  FROM arrs,
                    unnest(generate_series(1, len(arr))) AS s(i)),
         pos AS (SELECT doc_id, i AS p, array_to_string(arr[i:i+4], ' ') AS g
                 FROM arrs,
                   unnest(generate_series(1, greatest(len(arr) - 4, 1)))
                   AS u(i)),
         dup AS (SELECT g FROM pos GROUP BY g
                 HAVING COUNT(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT doc_id, p + o AS pos
                 FROM pos, unnest(generate_series(0, 4)) AS q(o)
                 WHERE g IN (SELECT g FROM dup)),
         kept AS (SELECT t.doc_id, t.pos, t.token
                  FROM toks t LEFT JOIN cov c
                    ON c.doc_id = t.doc_id AND c.pos = t.pos
                  WHERE c.pos IS NULL),
         reb AS (SELECT doc_id, COUNT(*) AS n_kept,
                   string_agg(token, ' ' ORDER BY pos) AS clean_text
                 FROM kept GROUP BY doc_id)
         SELECT a.doc_id, len(arr) AS n_tokens,
           len(arr) - COALESCE(n_kept, 0) AS n_removed,
           COALESCE(clean_text, '') AS clean_text
         FROM arrs a LEFT JOIN reb USING (doc_id)
         ORDER BY a.doc_id""",

    "m01_binary_meta" ->
      """SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
           ELSE 'gif' END AS format,
         CAST(1 + doc_id % 640 AS BIGINT) AS width,
         CAST(1 + doc_id * 7 % 480 AS BIGINT) AS height
         FROM documents ORDER BY doc_id""",

    "m06_mp4_meta" ->
      """SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
           ELSE 'avc1' END AS brand,
         CAST(600 * (1 + doc_id % 4) AS BIGINT) AS timescale,
         CAST(((1 + doc_id % 30) * (600 * (1 + doc_id % 4)) + doc_id % 7)
           * 1000 // (600 * (1 + doc_id % 4)) AS BIGINT) AS duration_ms,
         CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
         CAST(320 + (doc_id % 5) * 16 AS BIGINT) AS width,
         CAST(240 + (doc_id % 4) * 16 AS BIGINT) AS height
         FROM documents ORDER BY doc_id""",

    "m07_mkv_meta" ->
      """SELECT doc_id,
         CASE doc_id % 2 WHEN 0 THEN 'matroska' ELSE 'webm' END
           AS doc_type,
         CAST(1000000 * (1 + doc_id % 3) AS BIGINT) AS timescale_ns,
         CAST(((1 + doc_id % 30) * 1000 + doc_id % 7) * (1 + doc_id % 3)
           AS BIGINT) AS duration_ms,
         CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
         CAST(160 + (doc_id % 6) * 32 AS BIGINT) AS width,
         CAST(120 + (doc_id % 5) * 24 AS BIGINT) AS height
         FROM documents ORDER BY doc_id""",

    // dims interpolated from Binary's makeWebp constants — one side
    // to tweak, a drift shows as a compile error not a hash mismatch
    "m11_webp_meta" ->
      s"""SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'vp8x' WHEN 1 THEN 'vp8l'
           ELSE 'vp8' END AS variant,
         CAST(${wb} + doc_id % ${wwm} AS BIGINT) AS width,
         CAST(${wb} + doc_id % ${whm} AS BIGINT) AS height,
         CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE 1 - doc_id % 2 END
           AS BIGINT) AS has_alpha
         FROM documents ORDER BY doc_id""",

    // Regenerates makeTiff's closed-form IFD fields — byte order by id
    // parity, LONG width / SHORT height+orientation, two-page chain for
    // ids %3==0; an endianness or IFD-walk bug on the Spark side breaks
    // the hash.
    "m15_tiff_meta" ->
      """SELECT doc_id,
         CASE doc_id % 2 WHEN 0 THEN 'II' ELSE 'MM' END AS byte_order,
         CAST(100 + doc_id % 50 AS BIGINT) AS width,
         CAST(80 + doc_id % 40 AS BIGINT) AS height,
         CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT)
           AS n_pages
         FROM documents ORDER BY doc_id""",

    // Regenerates makeFlac's closed-form STREAMINFO fields — the 36-bit
    // total (past u32 for ids %5==0) and the integer-division duration
    // are the hash-sensitive parts; DuckDB's // floor-division matches
    // Spark's Long / on these all-positive values.
    "m16_flac_meta" ->
      """SELECT doc_id,
         CAST(8000 * (1 + doc_id % 6) AS BIGINT) AS sample_rate,
         CAST(1 + doc_id % 8 AS BIGINT) AS channels,
         CAST(8 + (doc_id % 4) * 4 AS BIGINT) AS bits,
         CAST(10000 + doc_id % 9973
           + CASE WHEN doc_id % 5 = 0 THEN 8589934592 ELSE 0 END
           AS BIGINT) AS total_samples,
         CAST((10000 + doc_id % 9973
           + CASE WHEN doc_id % 5 = 0 THEN 8589934592 ELSE 0 END) * 1000
           // (8000 * (1 + doc_id % 6)) AS BIGINT) AS duration_ms,
         CAST(1 + doc_id % 3 AS BIGINT) AS n_blocks
         FROM documents ORDER BY doc_id""",

    // Regenerates makeMp3's closed-form fields — the bitrate/rate
    // table lookups and the truncating duration division are the
    // hash-sensitive parts.
    "m17_mp3_meta" ->
      """SELECT doc_id,
         list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
           CAST(1 + doc_id % 14 AS INT)) AS bitrate_kbps,
         list_extract([44100,48000,32000],
           CAST(1 + doc_id % 3 AS INT)) AS sample_rate,
         CAST(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 2 END AS BIGINT)
           AS channels,
         CAST(5 + doc_id % 20 AS BIGINT) AS n_frames,
         CAST((5 + doc_id % 20) * 1152 * 1000
           // list_extract([44100,48000,32000],
             CAST(1 + doc_id % 3 AS INT)) AS BIGINT) AS duration_ms,
         CAST(20 + doc_id % 200 AS BIGINT) AS id3_size
         FROM documents ORDER BY doc_id""",

    // Regenerates makeZip's closed-form central-directory totals.
    "m18_zip_listing" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 5 AS k FROM documents)
         SELECT doc_id,
         CAST(k AS BIGINT) AS n_entries,
         CAST(list_sum(list_transform(range(k), j ->
           10 + (doc_id + j) % 50)) AS BIGINT) AS total_comp,
         CAST(list_sum(list_transform(range(k), j ->
           10 + (doc_id + j) % 50 + (doc_id + j) % 7)) AS BIGINT)
           AS total_uncomp,
         CAST(list_sum(list_transform(range(k), j ->
           (doc_id + j) % 2)) AS BIGINT) AS n_deflated,
         CAST(list_sum(list_transform(range(k), j ->
           (doc_id * 31 + j) % 4294967296)) AS BIGINT) AS crc_sum
         FROM d ORDER BY doc_id""",

    // m19: makeH264's closed forms — NAL census and the SPS-coded
    // dimensions (16 x mb counts; no cropping, frame_mbs_only).
    "m19_h264_meta" ->
      """SELECT doc_id,
         CAST(4 + doc_id % 6 AS BIGINT) AS n_nals,
         CAST(1 AS BIGINT) AS n_sps,
         CAST(1 AS BIGINT) AS n_pps,
         CAST(1 AS BIGINT) AS n_idr,
         CAST(2 + doc_id % 6 AS BIGINT) AS n_slices,
         CAST(16 * (4 + doc_id % 5) AS BIGINT) AS width,
         CAST(16 * (3 + doc_id % 4) AS BIGINT) AS height
         FROM documents ORDER BY doc_id""",

    // m20: makeIvf's closed forms — header fields, the walked frame
    // census and the summed payload bytes.
    "m20_ivf_meta" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 6 AS nf FROM documents)
         SELECT doc_id, 'VP90' AS codec,
         CAST(64 + 8 * (doc_id % 9) AS BIGINT) AS width,
         CAST(48 + 8 * (doc_id % 7) AS BIGINT) AS height,
         CAST(nf AS BIGINT) AS n_frames_header,
         CAST(nf AS BIGINT) AS n_frames_walked,
         CAST(list_sum(list_transform(range(nf), f ->
           12 + (doc_id + f) % 33)) AS BIGINT) AS frame_bytes,
         CAST(nf - 1 AS BIGINT) AS last_pts
         FROM d ORDER BY doc_id""",

    // m21: the Ogg fixture's closed forms re-derived — page/stream/
    // flag censuses, the packet count over the same lacing grammar
    // (255 = continuation), payload byte totals and last granule.
    "m21_ogg_meta" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 5 AS np,
           CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS extra
           FROM documents),
         m AS (SELECT doc_id, np, extra,
           CAST(list_sum(list_transform(range(np), f ->
             list_sum(list_transform(range(1 + (doc_id + f) % 3), j ->
               CASE WHEN (doc_id + f + j) % 4 = 0 THEN 255
                    ELSE (doc_id + f + j) % 200 END)))) AS BIGINT)
             AS body,
           CAST(list_sum(list_transform(range(np), f ->
             list_sum(list_transform(range(1 + (doc_id + f) % 3), j ->
               CASE WHEN (doc_id + f + j) % 4 = 0 THEN 0
                    ELSE 1 END)))) AS BIGINT) AS pk
           FROM d)
         SELECT doc_id,
           CAST(np + extra AS BIGINT) AS n_pages,
           CAST(1 + extra AS BIGINT) AS n_streams,
           CAST(1 + extra AS BIGINT) AS n_bos,
           CAST(1 + extra AS BIGINT) AS n_eos,
           CAST(pk + extra AS BIGINT) AS n_packets,
           CAST(body + extra * (doc_id % 200) AS BIGINT)
             AS payload_bytes,
           CAST(CASE WHEN extra = 1 THEN 777 ELSE np * 441 END
             AS BIGINT) AS last_granule
         FROM m ORDER BY doc_id""",

    "m02_audio_meta" ->
      """SELECT doc_id, 'wav' AS format,
         CAST(1 + doc_id % 2 AS BIGINT) AS channels,
         CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
         CAST(16 AS BIGINT) AS bits,
         CAST(n_chars AS BIGINT) AS n_samples,
         CAST(n_chars * 1000 // (8000 * (1 + doc_id % 3)) AS BIGINT)
           AS duration_ms
         FROM documents ORDER BY doc_id""",

    // Regenerates m09's closed-form PCM waveform sample by sample and
    // aggregates the same integer moments the Spark-side decoder folds —
    // a byte-level decode bug (endianness, chunk offset, sign extension)
    // breaks the hash.
    "m09_audio_stats" ->
      """WITH d AS (SELECT doc_id, 64 + doc_id % 193 AS n FROM documents),
         s AS (SELECT doc_id, n, i,
               (doc_id * 7919 + i * 104729) % 65536 - 32768 AS v
               FROM d, unnest(generate_series(0, CAST(n - 1 AS BIGINT)))
                 AS u(i)),
         w AS (SELECT doc_id, n, v,
               CASE WHEN lag(v) OVER (PARTITION BY doc_id ORDER BY i)
                      IS NOT NULL
                 AND (v < 0) != (lag(v) OVER (PARTITION BY doc_id
                                              ORDER BY i) < 0)
                 THEN 1 ELSE 0 END AS zc
               FROM s)
         SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(MAX(abs(v)) AS BIGINT) AS peak,
           CAST(SUM(zc) AS BIGINT) AS zcr,
           round(CAST(SUM(v) AS DOUBLE) / MAX(n), 6) AS dc,
           round(sqrt(CAST(SUM(v * v) AS DOUBLE) / MAX(n)), 6) AS rms
         FROM w GROUP BY doc_id ORDER BY doc_id""",

    "q37_sessionize" -> sessionizeSql,

    // The streaming sessionizer's one-shot in-order replay (st06) closes
    // exactly the batch operator's sessions - same SQL oracle as q37.
    "st06_sessionize_stream" -> sessionizeSql,

    // st13: the drained SCD stream equals the batch window pair —
    // floor-second + event_id ordering on BOTH sides so sub-second
    // jitter can never reorder a chain between engines.
    "st13_scd_stream" ->
      s"""WITH e AS (SELECT user_id, event_id, ${sec(tsUs)} AS ts_sec
             FROM events),
         v AS (SELECT user_id,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
             event_id, ts_sec AS valid_from_sec,
             COALESCE(LEAD(ts_sec) OVER w, 9999999999) AS valid_to_sec
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
         SELECT user_id, version, event_id, valid_from_sec,
           CAST(valid_to_sec AS BIGINT) AS valid_to_sec,
           CAST(CASE WHEN valid_to_sec = 9999999999 THEN 1 ELSE 0 END
             AS BIGINT) AS is_current
         FROM v ORDER BY user_id, version""",

    // st09 (r17 promotion): the streamed daily-NDV frame hash-exact
    // via the exported-estimate route — the drained (series, day,
    // n_rows, ndv_hll, rsd) frame read from the gate's own ModelStore
    // export, the batch count n recomputed from raw events in both
    // engines so the hash additionally certifies stream-window ==
    // batch count parity (the error contract itself lives in st14).
    "st09_sketch_stream" ->
      s"""WITH m AS (SELECT series, day, n_rows, ndv_hll, rsd
             FROM read_parquet(
               ${modelGlob("st09", "ndv_stream_profile")})),
         x AS (SELECT event_type AS series,
             strftime(date_trunc('day', $tsUs), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2)
         SELECT x.series, x.day, m.n_rows, x.n, m.ndv_hll, m.rsd
         FROM x JOIN m ON x.series = m.series AND x.day = m.day
         ORDER BY x.series, x.day""",

    // st14: the st09 stream's HLL contract from the exported drained
    // estimate frame — k08's route on the streaming axis: exact
    // per-(series, day) NDV recomputed over events, containment
    // |est − exact| ≤ 5·rsd·exact with the gate's left-associated
    // double product (5 * rsd * exact) from the exported rsd.
    "st14_ndv_contract" ->
      s"""WITH m AS (SELECT series, day, n_rows, ndv_hll, rsd
             FROM read_parquet(
               ${modelGlob("st14", "ndv_stream_profile")})),
         x AS (SELECT event_type AS series,
             strftime(date_trunc('day', $tsUs), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_exact
           FROM events GROUP BY 1, 2)
         SELECT x.series, x.day, m.n_rows, x.n, m.ndv_hll, x.ndv_exact,
           m.rsd,
           CAST(CASE WHEN m.n_rows = x.n
             AND CAST(ABS(m.ndv_hll - x.ndv_exact) AS DOUBLE)
                 <= 5 * m.rsd * CAST(x.ndv_exact AS DOUBLE)
             THEN 1 ELSE 0 END AS INT) AS contained
         FROM x JOIN m ON x.series = m.series AND x.day = m.day
         ORDER BY x.series, x.day""",

    "q38_ingest_patterns" ->
      """WITH lo AS (SELECT o_orderkey, o_custkey FROM orders
                     WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                           AND TIMESTAMP '1995-01-31'),
         ll AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
                FROM lineitem
                WHERE l_shipdate BETWEEN TIMESTAMP '1996-06-01'
                                     AND TIMESTAMP '1996-06-15'),
         -- pattern roots are ID sets: the parents pass traverses the
         -- DATABASE rows matching those ids (all of them — testdata has
         -- duplicate lineitem id tuples whose other columns differ),
         -- not the batch rows themselves
         lrows AS (SELECT lineitem.l_orderkey, lineitem.l_linenumber,
                     lineitem.l_partkey, lineitem.l_suppkey
                   FROM lineitem
                   JOIN (SELECT DISTINCT l_orderkey, l_linenumber FROM ll) s
                   USING (l_orderkey, l_linenumber)),
         -- parents pass, leaves first: loaded objects plus all ancestors
         ord AS (SELECT o_orderkey FROM lo
                 UNION SELECT l_orderkey FROM lrows),
         prt AS (SELECT DISTINCT l_partkey FROM lrows),
         supp AS (SELECT DISTINCT l_suppkey FROM lrows),
         cust AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE o_orderkey IN (SELECT o_orderkey FROM ord)),
         nat AS (SELECT c_nationkey AS nk FROM customer
                 WHERE c_custkey IN (SELECT o_custkey FROM cust)
                 UNION SELECT s_nationkey FROM supplier
                 WHERE s_suppkey IN (SELECT l_suppkey FROM supp)),
         reg AS (SELECT DISTINCT n_regionkey AS rk FROM nation
                 WHERE n_nationkey IN (SELECT nk FROM nat))
         SELECT object_type, id FROM (
           SELECT 'region' AS object_type,
             CAST(rk AS VARCHAR) AS id FROM reg
           UNION ALL SELECT 'nation', CAST(n_nationkey AS VARCHAR)
             FROM nation WHERE n_nationkey IN (SELECT nk FROM nat)
           UNION ALL SELECT 'customer', CAST(c_custkey AS VARCHAR)
             FROM customer WHERE c_custkey IN (SELECT o_custkey FROM cust)
           UNION ALL SELECT 'supplier', CAST(s_suppkey AS VARCHAR)
             FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM supp)
           UNION ALL SELECT 'part', CAST(p_partkey AS VARCHAR)
             FROM part WHERE p_partkey IN (SELECT l_partkey FROM prt)
           UNION ALL SELECT 'orders', CAST(o_orderkey AS VARCHAR)
             FROM orders WHERE o_orderkey IN (SELECT o_orderkey FROM ord)
           UNION ALL SELECT 'lineitem',
             CAST(l_orderkey AS VARCHAR) || '_' ||
             CAST(l_linenumber AS VARCHAR) FROM lrows
         ) ORDER BY object_type, id""",

    // q40 = q38's ingest closure feeding q24's rendered spool — the
    // reference's full post-load loop in one statement: the closure CTEs
    // restrict each watched object table to loaded objects + ancestors,
    // then the shared notification generators run over THOSE rows.
    "q40_ingest_notify" ->
      ("""WITH lo AS (SELECT o_orderkey, o_custkey FROM orders
                      WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                            AND TIMESTAMP '1995-01-31'),
         ll AS (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
                WHERE l_shipdate BETWEEN TIMESTAMP '1996-06-01'
                                     AND TIMESTAMP '1996-06-15'),
         -- closure lineitem rows: DATABASE rows matching the batch ids
         -- (duplicate id tuples all surface, as in q38)
         li_rows AS (SELECT lineitem.* FROM lineitem
                     JOIN ll USING (l_orderkey, l_linenumber)),
         ordk AS (SELECT o_orderkey FROM lo
                  UNION SELECT l_orderkey FROM li_rows),
         o_rows AS (SELECT * FROM orders WHERE o_orderkey IN
                    (SELECT o_orderkey FROM ordk)),
         c_rows AS (SELECT * FROM customer WHERE c_custkey IN
                    (SELECT o_custkey FROM orders WHERE o_orderkey IN
                     (SELECT o_orderkey FROM ordk)))
         """ + notifSpool(Seq(
           notifSub(q24BigOrders, "CAST(o_orderkey AS VARCHAR)",
             q24BigOrdersW, "o_rows"),
           notifSub(q24NegBal, "CAST(c_custkey AS VARCHAR)",
             q24NegBalW, "c_rows"),
           notifSub(q24Returned,
             "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)",
             q24ReturnedW, "li_rows")))),

    // q41: the z arithmetic repeats the Spark side's stated double-op
    // order over integer window sums — mean = s/k, var = (ss - s·mean)/
    // (k-1), z = (n - mean)/sqrt(var) — so scores match bit-for-bit.
    "q41_rate_anomaly" -> rateAnomalySql,

    // st08: the streaming twin closes days in day order on the in-order
    // one-shot replay, so its output equals the batch operator's —
    // literally q41's oracle.
    "st08_anomaly_stream" -> rateAnomalySql,

    // k03: the one SKETCH with an exact oracle — AMS signs are md5-coin
    // derived (the p04/integerDraw convention), so DuckDB reproduces
    // every lane sum, the sorted-lane median, and the error bit-for-bit.
    "k03_ams_f2" ->
      """WITH drawn AS (SELECT event_type AS series,
             CAST(concat('0x', substr(md5('graft-ams' ||
               CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS draw
           FROM events),
         lanes AS (SELECT series, j, draw
           FROM drawn, unnest(generate_series(0, 59)) AS u(j)),
         s AS (SELECT series, j,
             CAST(SUM(1 - 2 * ((draw >> j) & 1)) AS BIGINT) AS s
               FROM lanes GROUP BY 1, 2),
         m AS (SELECT series,
             CAST((arr[30] + arr[31]) AS DOUBLE) / 2.0 AS f2_ams
           FROM (SELECT series, list(s * s ORDER BY s * s) AS arr
                 FROM s GROUP BY series)),
         x AS (SELECT series, CAST(SUM(n * n) AS BIGINT) AS f2_exact
               FROM (SELECT event_type AS series, user_id, COUNT(*) AS n
                     FROM events GROUP BY 1, 2)
               GROUP BY series)
         SELECT x.series, f2_exact, f2_ams,
           round(abs(f2_ams - CAST(f2_exact AS DOUBLE)) /
             CAST(f2_exact AS DOUBLE), 6) AS rel_err
         FROM x JOIN m USING (series) ORDER BY series""",

    // q39's Spark side round-trips constructed JSON through
    // from_json + array explode; the oracle computes the same URL
    // aggregate RELATIONALLY, so a wrong parse/explode hash-mismatches.
    "q39_json_files" ->
      """WITH files AS (
           SELECT 'orders.output_files.url' AS path,
             'https://files.example.org/' || l_orderkey || '/' ||
             l_linenumber || '/part_' || l_partkey || '.' ||
             CASE CAST(l_linenumber % 3 AS INTEGER)
               WHEN 0 THEN 'log' WHEN 1 THEN 'json' ELSE 'tar' END AS url
           FROM lineitem
           UNION ALL
           SELECT DISTINCT 'orders.config_url',
             'https://cfg.example.org/' || l_orderkey || '.cfg'
           FROM lineitem),
         dedup AS (SELECT DISTINCT path, url FROM files)
         SELECT path, regexp_extract(url, '\.([a-z0-9]+)$', 1) AS ext,
           COUNT(*) AS n_urls,
           CAST(SUM(LENGTH(url)) AS BIGINT) AS total_len
         FROM dedup GROUP BY path, ext ORDER BY path, ext""",

    // Output rounds at 8dp (see the t08 gate note): interpolations of
    // 6dp-quantized values at 0.05-grid fracs are EXACT on the 5e-8
    // grid, while 6dp rounding can sit on a half-boundary and flip on
    // 1-ulp engine differences.
    "t08_quality_percentiles" ->
      s"""WITH q AS (SELECT source, round($qualitySql, 6) AS q
                     FROM documents)
         SELECT source, COUNT(q) AS n_docs,
           round(quantile_cont(q, 0.25), 8) AS p25,
           round(quantile_cont(q, 0.50), 8) AS p50,
           round(quantile_cont(q, 0.75), 8) AS p75,
           round(quantile_cont(q, 0.95), 8) AS p95
         FROM q GROUP BY source ORDER BY source""",

    // k04: md5-derived CMS buckets — DuckDB rebuilds the whole
    // depth×width table and every point estimate exactly.
    "k04_cms_topk" -> cmsTopKSql,

    // k05: KMV bottom-k sketches + estimator + exact anchor, all
    // rebuilt relationally (k shared via SparkEntry.k05K). The rank
    // window runs over the per-source hash frame (bounded per group);
    // the estimator takes the k smallest of each pair's sketch UNION.
    // k01 (r17 promotion): the HLL profile hash-exact via the
    // exported-estimate route — ndv_hll/rsd read from the gate's own
    // ModelStore export (the same bytes Spark re-read), the exact
    // anchors n_rows/ndv_exact recomputed from raw events, rel_err
    // re-derived with the gate's 6-dp rounding.
    "k01_sketch_distinct" ->
      s"""WITH m AS (SELECT series, ndv_hll, rsd
             FROM read_parquet(${modelGlob("k01", "hll_profile")})),
         x AS (SELECT event_type AS series,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_exact
           FROM events GROUP BY 1)
         SELECT x.series, x.n_rows, x.ndv_exact, m.ndv_hll,
           ROUND(CAST(ABS(m.ndv_hll - x.ndv_exact) AS DOUBLE)
             / CAST(x.ndv_exact AS DOUBLE), 6) AS rel_err,
           m.rsd
         FROM x JOIN m ON x.series = m.series
         ORDER BY x.series""",

    // k02 (r17 promotion): the GK quantile profile hash-exact via the
    // exported-estimate route — p50/p90/p99/accuracy from the gate's
    // export, n_rows (count of non-null value) recomputed from raw.
    "k02_sketch_quantiles" ->
      s"""WITH m AS (SELECT series, p50, p90, p99, accuracy
             FROM read_parquet(${modelGlob("k02", "gk_quantiles")})),
         x AS (SELECT event_type AS series,
             CAST(COUNT(value) AS BIGINT) AS n_rows
           FROM events GROUP BY 1)
         SELECT x.series, x.n_rows, m.p50, m.p90, m.p99, m.accuracy
         FROM x JOIN m ON x.series = m.series
         ORDER BY x.series""",

    // k07: the GK rank-window CONTRACT verified in SQL from the gate's
    // exported estimate frame — ranks recomputed exactly over events,
    // containment in the audit's q·n ± (n/accuracy + 1) window as pure
    // integer arithmetic scaled by 100·accuracy (no float division).
    "k07_quantile_contract" ->
      s"""WITH o AS (SELECT * FROM read_parquet(
             ${modelGlob("k07", "gk_quantiles")})),
         m AS (SELECT series, n_rows, accuracy,
                 CAST(50 AS BIGINT) AS q100, p50 AS qv FROM o
               UNION ALL
               SELECT series, n_rows, accuracy, 90, p90 FROM o
               UNION ALL
               SELECT series, n_rows, accuracy, 99, p99 FROM o),
         rk AS (SELECT m.series, m.q100, m.qv, m.n_rows, m.accuracy,
                  CAST(COUNT(e.value) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN e.value < m.qv THEN 1 ELSE 0 END)
                    AS BIGINT) AS r_lt,
                  CAST(SUM(CASE WHEN e.value <= m.qv THEN 1 ELSE 0 END)
                    AS BIGINT) AS r_le
                FROM m JOIN events e ON e.event_type = m.series
                GROUP BY 1, 2, 3, 4, 5)
         SELECT series, q100, n_rows, n, qv, r_lt, r_le,
           CAST(CASE WHEN n_rows = n
             AND r_lt * 100 * accuracy
                 <= q100 * n * accuracy + 100 * n + 100 * accuracy
             AND r_le * 100 * accuracy
                 >= q100 * n * accuracy - 100 * n - 100 * accuracy
             THEN 1 ELSE 0 END AS INT) AS contained
         FROM rk ORDER BY series, q100""",

    // k08: the HLL error contract from the exported estimate frame —
    // exact NDV recomputed over events, containment |est − exact| ≤
    // 5·rsd·exact evaluated with the SAME left-associated double
    // product as the gate (5 * rsd * exact) from the exported rsd.
    "k08_distinct_contract" ->
      s"""WITH m AS (SELECT series, n_rows, ndv_hll, rsd
             FROM read_parquet(${modelGlob("k08", "hll_profile")})),
         x AS (SELECT event_type AS series,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_exact
           FROM events GROUP BY 1)
         SELECT x.series, m.n_rows, x.n, m.ndv_hll, x.ndv_exact, m.rsd,
           CAST(CASE WHEN m.n_rows = x.n
             AND CAST(ABS(m.ndv_hll - x.ndv_exact) AS DOUBLE)
                 <= 5 * m.rsd * CAST(x.ndv_exact AS DOUBLE)
             THEN 1 ELSE 0 END AS INT) AS contained
         FROM x JOIN m ON x.series = m.series
         ORDER BY x.series""",

    // k09: the merge contract re-derived — the exported profile's
    // sub-count must equal the SQL day count, merged must equal direct
    // (mergeability), and the merged estimate must sit in the 5·rsd
    // window around the SQL-exact distinct.
    "k09_sketch_merge" ->
      s"""WITH m AS (SELECT series, n_subs, ndv_merged, ndv_direct, rsd
             FROM read_parquet(${modelGlob("k09", "merge_profile")})),
         x AS (SELECT event_type AS series,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_exact,
             CAST(COUNT(DISTINCT strftime(date_trunc('day', $tsUs),
               '%Y-%m-%d')) AS BIGINT) AS n_days
           FROM events GROUP BY 1)
         SELECT x.series, x.n_days, m.n_subs, m.ndv_merged,
           m.ndv_direct, x.ndv_exact, m.rsd,
           CAST(CASE WHEN m.n_subs = x.n_days
             AND CAST(ABS(m.ndv_merged - x.ndv_exact) AS DOUBLE)
                 <= 5 * m.rsd * CAST(x.ndv_exact AS DOUBLE)
             AND CAST(ABS(m.ndv_direct - x.ndv_exact) AS DOUBLE)
                 <= 5 * m.rsd * CAST(x.ndv_exact AS DOUBLE)
             THEN 1 ELSE 0 END AS INT) AS contained
         FROM x JOIN m ON x.series = m.series
         ORDER BY x.series""",

    // k06: priority sampling re-derived — the same md5 60-bit coin,
    // the identical two-division priority tree, row_number ranking
    // (q DESC, id ASC — the TopKByScore tie order), tau as the (k+1)-th
    // priority (0 when the corpus fits the sample), and the total's est
    // folded in doc-id order.
    "k06_priority_sample" -> {
      val k = graft.SparkEntry.k06K
      val seed = graft.SparkEntry.k06Seed
      s"""WITH base AS (SELECT doc_id AS id, CAST(n_chars AS DOUBLE) AS w
             FROM documents),
         sc AS (SELECT id, w,
             w / ((CAST(CAST(concat('0x', substr(md5('$seed' ||
               CAST(id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 1.0)
               / 1152921504606846976.0) AS q
           FROM base),
         r AS (SELECT id, w, q,
             row_number() OVER (ORDER BY q DESC, id ASC) AS rk FROM sc),
         tau AS (SELECT COALESCE(
             (SELECT q FROM r WHERE rk = ${k + 1}), 0.0) AS tau),
         samp AS (SELECT 'sample' AS kind, id AS doc_id, w, q,
             greatest(w, (SELECT tau FROM tau)) AS est
           FROM r WHERE rk <= $k),
         tot AS (SELECT 'total' AS kind, CAST(-1 AS BIGINT) AS doc_id,
             (SELECT CAST(CAST(SUM(CAST(w AS DECIMAL(18,2))) AS
                DECIMAL(18,2)) AS DOUBLE) FROM base) AS w,
             (SELECT tau FROM tau) AS q,
             (SELECT list_reduce(list(est ORDER BY doc_id),
                (x, y) -> x + y) FROM samp) AS est)
         SELECT kind, doc_id, w, q, est FROM
           (SELECT * FROM samp UNION ALL SELECT * FROM tot)
         ORDER BY kind, doc_id"""
    },

    "k05_bottomk_overlap" -> {
      val k = graft.SparkEntry.k05K
      s"""WITH toks AS (SELECT DISTINCT source, tok FROM (
             SELECT source, unnest(list_transform(
               range(len(string_split(text, ' ')) - 1), i ->
                 string_split(text, ' ')[i+1] || ' ' ||
                 string_split(text, ' ')[i+2])) AS tok
             FROM documents)),
         h AS (SELECT source, md5(tok) AS hv FROM toks),
         n AS (SELECT source, COUNT(*) AS nd FROM h GROUP BY source),
         bk AS (SELECT source, hv FROM (
             SELECT source, hv, row_number() OVER (
               PARTITION BY source ORDER BY hv) AS rn FROM h)
           WHERE rn <= $k),
         pairs AS (SELECT a.source AS sa, b.source AS sb
           FROM n a, n b WHERE a.source < b.source),
         pu AS (SELECT p.sa, p.sb, x.hv,
             bool_or(x.source = p.sa) AS ia,
             bool_or(x.source = p.sb) AS ib
           FROM pairs p JOIN bk x ON x.source IN (p.sa, p.sb)
           GROUP BY p.sa, p.sb, x.hv),
         pr AS (SELECT sa, sb, ia, ib,
             row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS rn,
             COUNT(*) OVER (PARTITION BY sa, sb) AS un
           FROM pu),
         est AS (SELECT sa, sb, LEAST($k, MAX(un)) AS k_used,
             CAST(SUM(CASE WHEN rn <= $k AND ia AND ib
               THEN 1 ELSE 0 END) AS BIGINT) AS num
           FROM pr GROUP BY sa, sb),
         ex AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS ni
           FROM toks a JOIN toks b
             ON a.tok = b.tok AND a.source < b.source
           GROUP BY 1, 2)
         SELECT e.sa AS source_a, e.sb AS source_b,
           CAST(na.nd AS BIGINT) AS n_a, CAST(nb.nd AS BIGINT) AS n_b,
           round(CAST(COALESCE(x.ni, 0) AS DOUBLE) /
             (na.nd + nb.nd - COALESCE(x.ni, 0)), 6) AS exact_j,
           round(CAST(e.num AS DOUBLE) / e.k_used, 6) AS est_j,
           CAST(e.k_used AS BIGINT) AS k_used
         FROM est e
           JOIN n na ON na.source = e.sa
           JOIN n nb ON nb.source = e.sb
           LEFT JOIN ex x ON x.sa = e.sa AND x.sb = e.sb
         ORDER BY source_a, source_b""" },

    // st10: the stream-built cell table equals the batch build
    // bit-for-bit (order-insensitive counts) — literally k04's oracle.
    "st10_cms_stream" -> cmsTopKSql,

    // st11: join bounds compare at full µs precision (CAST ts), the
    // emitted gap at floor-seconds — both exactly as the Spark side;
    // window and fix-type are the gate's shared constants.
    "st11_stream_join" ->
      s"""WITH e AS (SELECT user_id, event_id AS error_event_id,
             $tsUs AS e_us, ${sec(tsUs)} AS e_sec
           FROM events WHERE event_type = 'error'),
         s AS (SELECT user_id, event_id AS fix_event_id,
             $tsUs AS f_us, ${sec(tsUs)} AS f_sec
           FROM events
           WHERE event_type = '${graft.SparkEntry.st11FixType}')
         SELECT e.user_id, error_event_id, fix_event_id,
           CAST(f_sec - e_sec AS BIGINT) AS gap_sec
         FROM e JOIN s ON e.user_id = s.user_id
           AND s.f_us >= e.e_us
           AND s.f_us <= e.e_us + INTERVAL ${
             graft.SparkEntry.st11WithinSec} SECOND
         ORDER BY error_event_id, fix_event_id""",

    "t09_top_tokens" ->
      s"""WITH toks AS (SELECT unnest(string_split($normText, ' ')) AS token
                        FROM documents)
         SELECT token, COUNT(*) AS freq FROM toks
         GROUP BY token ORDER BY freq DESC, token ASC LIMIT 25""",

    // q46: snapshot synthesis + full-outer classification re-derived;
    // IS DISTINCT FROM mirrors SnapshotDiff's null-safe <=>.
    // Jinja loop/conditional rendering (q47): the oracle re-renders the
    // EXACT body string — the capped child list via a row_number()-capped
    // string_agg (ties broken by the rendered line, matching the struct
    // sort), the {% if %} via CASE on the child count, the "By" line via
    // a distinct subquery (numeric order, as array_sort on longs).
    "q47_notify_summary" ->
      """WITH cnt AS (SELECT l_orderkey,
             CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_f,
             CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_o,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_r
           FROM lineitem GROUP BY 1),
         ranked AS (SELECT l_orderkey,
             'line ' || l_linenumber || ' part ' || l_partkey AS ln,
             row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber,
                 ('line ' || l_linenumber || ' part ' || l_partkey)) AS rn
           FROM lineitem WHERE l_returnflag = 'R'),
         ret AS (SELECT l_orderkey,
             '        ' || string_agg(CASE WHEN rn <= 5 THEN ln END,
               chr(10) || '        ' ORDER BY rn)
               || CASE WHEN COUNT(*) > 5
                  THEN chr(10) || '        ...' ELSE '' END AS ret_list
           FROM ranked GROUP BY l_orderkey),
         sup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         byl AS (SELECT l_orderkey,
             string_agg(l_suppkey, ', ' ORDER BY l_suppkey) AS by_line
           FROM sup GROUP BY l_orderkey)
         SELECT c.l_orderkey AS o_orderkey,
           'Order ' || c.l_orderkey || ': ' || c.n_r || ' returned of '
             || c.n_f || 'F/' || c.n_o || 'O' AS subject,
           'ORDER ' || c.l_orderkey || chr(10) || '    Status' || chr(10)
             || '        F: ' || c.n_f || '  O: ' || c.n_o
             || CASE WHEN c.n_r > 0 THEN chr(10) || '    Returns'
                  || chr(10) || r.ret_list ELSE '' END
             || chr(10) || '    By' || chr(10) || '        ' || b.by_line
             AS body
         FROM cnt c
         LEFT JOIN ret r ON c.l_orderkey = r.l_orderkey
         JOIN byl b ON c.l_orderkey = b.l_orderkey
         ORDER BY o_orderkey""",

    // q48: the day-window rollup recomputed straight from events (the
    // partitioned LAYOUT is the gate's point — PlanSpec pins the
    // pruning; values must match the unpartitioned recompute exactly).
    "q48_partitioned_dump" ->
      s"""SELECT strftime($tsUs, '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS n_rows, ${decSum("value")} AS sum_value,
           MIN(value) AS min_value, MAX(value) AS max_value
         FROM events
         WHERE strftime($tsUs, '%Y-%m-%d') >= '2024-01-10'
           AND strftime($tsUs, '%Y-%m-%d') < '2024-01-15'
         GROUP BY 1, 2 ORDER BY day, event_type""",

    // q49: every column re-derived from the SAME two parquet trees the
    // gate wrote (filename=true gives the physical file identity,
    // hive_partitioning the day) plus raw events for the expected rows
    // — identical verdict formula, so a conservation bug on either
    // side breaks the hash.
    "q49_compact" -> {
      def leg(sub: String, tag: String) =
        s"""SELECT CAST(day AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT filename) AS BIGINT) AS n_files_$tag,
           CAST(COUNT(*) AS BIGINT) AS n_rows_$tag,
           ${decSum("value")} AS sum_$tag
         FROM read_parquet(
           '${graft.SparkEntry.gateModelSqlPath("q49")}/$sub/*/*.parquet',
           filename=true, hive_partitioning=true)
         GROUP BY 1"""
      s"""WITH sm AS (${leg("events_small", "small")}),
         cp AS (${leg("events_compact", "compact")}),
         x AS (SELECT strftime($tsUs, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n_rows_expected
           FROM events GROUP BY 1)
         SELECT sm.day, sm.n_files_small, cp.n_files_compact,
           sm.n_rows_small AS n_rows, x.n_rows_expected,
           sm.sum_small AS sum_value,
           CAST(CASE WHEN cp.n_files_compact = 1
             AND cp.n_files_compact < sm.n_files_small
             AND sm.n_rows_small = cp.n_rows_compact
             AND sm.n_rows_small = x.n_rows_expected
             AND sm.sum_small = cp.sum_compact
             THEN 1 ELSE 0 END AS INT) AS compact_ok
         FROM sm JOIN cp ON sm.day = cp.day JOIN x ON sm.day = x.day
         ORDER BY sm.day""" },

    // q52: the same window pair over the same (seq, tie) order — a
    // version-chain or open-end bug breaks the hash.
    "q52_scd2" ->
      """WITH v AS (SELECT o_custkey,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
             o_orderkey, o_orderstatus,
             strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')
               AS valid_from,
             COALESCE(LEAD(strftime(CAST(o_orderdate AS TIMESTAMP),
               '%Y-%m-%d')) OVER w, '9999-12-31') AS valid_to
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
             ORDER BY strftime(CAST(o_orderdate AS TIMESTAMP),
               '%Y-%m-%d'), o_orderkey))
         SELECT o_custkey, version, o_orderkey, o_orderstatus,
           valid_from, valid_to,
           CAST(CASE WHEN valid_to = '9999-12-31' THEN 1 ELSE 0 END
             AS BIGINT) AS is_current
         FROM v ORDER BY o_custkey, version""",

    // q54: the issue-editor pattern-object builder + automatch
    // re-derived from the SAME planted fixtures (SparkEntry.issueForms
    // / issueTriples interpolate as VALUES — the shared-constant
    // discipline): arg_max = the gate's max_by last-wins, string_agg
    // ORDER BY = the gate's sorted ';'-join canonical form, and the
    // corpus melt + all-fields-match counting mirror the gate's joins.
    "q54_issue_patterns" -> {
      val formsVals = graft.SparkEntry.issueForms.map { case
        (id, nm, em, subj, ct, url) =>
          s"('$id', '$nm', '$em', '$subj', '$ct', '$url')"
      }.mkString(",\n           ")
      val tripleVals = graft.SparkEntry.issueTriples.map { case
        (id, seq, cat, f, v) => s"('$id', $seq, '$cat', '$f', '$v')"
      }.mkString(",\n           ")
      s"""WITH forms(sub_id, name, email, report_subject, culprit_type,
             report_url) AS (VALUES
           $formsVals),
         triples(sub_id, seq, category, field, value) AS (VALUES
           $tripleVals),
         resolved AS (SELECT sub_id, category, field,
             arg_max(value, seq) AS value
           FROM triples GROUP BY 1, 2, 3),
         kv AS (SELECT sub_id, category,
             category || 's.' || field || '=' || value AS kv
           FROM resolved),
         pat AS (SELECT sub_id,
             string_agg(kv, ';' ORDER BY kv) AS pattern,
             CAST(COUNT(DISTINCT category) AS BIGINT) AS n_categories
           FROM kv GROUP BY 1),
         valid AS (SELECT sub_id FROM forms
           WHERE name <> '' AND email <> ''
             AND report_subject <> '' AND culprit_type <> ''),
         objects AS (
           SELECT 'order' AS category, CAST(o_orderkey AS BIGINT)
               AS obj_id, 'o_orderstatus' AS field,
               o_orderstatus AS value FROM orders
           UNION ALL
           SELECT 'order', CAST(o_orderkey AS BIGINT),
             'o_orderpriority', o_orderpriority FROM orders
           UNION ALL
           SELECT 'customer', CAST(c_custkey AS BIGINT),
             'c_mktsegment', c_mktsegment FROM customer),
         req AS (SELECT r.* FROM resolved r JOIN valid USING (sub_id)),
         nreq AS (SELECT sub_id, category,
             CAST(COUNT(*) AS BIGINT) AS n_req
           FROM req GROUP BY 1, 2),
         hits AS (SELECT q.sub_id, q.category, o.obj_id,
             CAST(COUNT(*) AS BIGINT) AS n_hit
           FROM objects o JOIN req q ON o.category = q.category
             AND o.field = q.field AND o.value = q.value
           GROUP BY 1, 2, 3),
         matched AS (SELECT h.sub_id, h.category,
             CAST(COUNT(*) AS BIGINT) AS n_match
           FROM hits h JOIN nreq n ON h.sub_id = n.sub_id
             AND h.category = n.category AND h.n_hit = n.n_req
           GROUP BY 1, 2)
         SELECT kind, sub_id, category, valid, culprit_code,
           culprit_tool, culprit_harness, n_categories, n_match,
           pattern
         FROM (
           SELECT 'issue' AS kind, f.sub_id, '' AS category,
             CAST(CASE WHEN name <> '' AND email <> ''
               AND report_subject <> '' AND culprit_type <> ''
               THEN 1 ELSE 0 END AS INT) AS valid,
             CAST(CASE WHEN culprit_type = 'code' THEN 1 ELSE 0 END
               AS INT) AS culprit_code,
             CAST(CASE WHEN culprit_type = 'tool' THEN 1 ELSE 0 END
               AS INT) AS culprit_tool,
             CAST(CASE WHEN culprit_type = 'harness' THEN 1 ELSE 0 END
               AS INT) AS culprit_harness,
             COALESCE(p.n_categories, 0) AS n_categories,
             CAST(-1 AS BIGINT) AS n_match,
             COALESCE(p.pattern, '') AS pattern
           FROM forms f LEFT JOIN pat p USING (sub_id)
           UNION ALL
           SELECT 'match', n.sub_id, n.category, CAST(1 AS INT),
             CAST(-1 AS INT), CAST(-1 AS INT), CAST(-1 AS INT),
             CAST(-1 AS BIGINT), COALESCE(m.n_match, 0), ''
           FROM nreq n LEFT JOIN matched m ON n.sub_id = m.sub_id
             AND n.category = m.category)
         ORDER BY kind, sub_id, category""" },

    // q53: the spool delivery state machine re-folded per id by a
    // recursive CTE — each recursion step applies ONE op's transition
    // (post create/update/refuse, pick lease, ack seal) with the
    // identical lease/due comparisons as the gate's replay.
    "q53_spool_deliver" ->
      s"""WITH RECURSIVE
         ops0 AS (SELECT user_id AS id, event_id AS seq,
             ${sec(tsUs)} AS ts_sec,
             CASE WHEN event_id % 5 <= 1 THEN 'post'
                  WHEN event_id % 5 <= 3 THEN 'pick'
                  WHEN event_id % 10 = 4 THEN 'ack'
                  ELSE 'delete' END AS op,
             ${sec(tsUs)} + (event_id % 7) * 900 AS due_sec,
             3600 AS timeout_sec
           FROM events),
         ops AS (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY id ORDER BY ts_sec, seq) AS k FROM ops0),
         st AS (
           SELECT id, CAST(0 AS BIGINT) AS k, false AS ex,
               CAST(-1 AS BIGINT) AS created_sec,
               CAST(-1 AS BIGINT) AS due_sec,
               CAST(0 AS BIGINT) AS msg_rev,
               CAST(-1 AS BIGINT) AS picked_at_sec,
               CAST(-9999999999 AS BIGINT) AS picked_until_sec,
               CAST(-1 AS BIGINT) AS acked_at_sec,
               CAST(0 AS BIGINT) AS n_posts,
               CAST(0 AS BIGINT) AS n_rejected_posts,
               CAST(0 AS BIGINT) AS n_picks,
               CAST(0 AS BIGINT) AS n_rejected_picks
             FROM (SELECT DISTINCT id FROM ops)
           UNION ALL
           SELECT o.id, o.k,
               CASE WHEN o.op = 'delete' THEN false
                    ELSE st.ex OR o.op = 'post' END,
               CASE WHEN o.op = 'delete' THEN CAST(-1 AS BIGINT)
                    WHEN o.op = 'post' AND NOT st.ex
                    THEN o.ts_sec ELSE st.created_sec END,
               CASE WHEN o.op = 'delete' THEN CAST(-1 AS BIGINT)
                    WHEN o.op = 'post' AND (NOT st.ex
                      OR st.picked_until_sec <= o.ts_sec)
                    THEN greatest(o.due_sec, o.ts_sec)
                    ELSE st.due_sec END,
               CASE WHEN o.op = 'delete' THEN CAST(0 AS BIGINT)
                    WHEN o.op = 'post' AND (NOT st.ex
                      OR st.picked_until_sec <= o.ts_sec)
                    THEN st.msg_rev + 1 ELSE st.msg_rev END,
               CASE WHEN o.op = 'delete' THEN CAST(-1 AS BIGINT)
                    WHEN o.op = 'pick' AND st.ex
                      AND st.picked_until_sec <= o.ts_sec
                      AND st.due_sec <= o.ts_sec
                    THEN o.ts_sec ELSE st.picked_at_sec END,
               CASE WHEN o.op = 'delete'
                    THEN CAST(-9999999999 AS BIGINT)
                    WHEN o.op = 'pick' AND st.ex
                      AND st.picked_until_sec <= o.ts_sec
                      AND st.due_sec <= o.ts_sec
                    THEN o.ts_sec + o.timeout_sec
                    WHEN o.op = 'ack' AND st.ex THEN 9999999999
                    ELSE st.picked_until_sec END,
               CASE WHEN o.op = 'delete' THEN CAST(-1 AS BIGINT)
                    WHEN o.op = 'ack' AND st.ex
                    THEN o.ts_sec ELSE st.acked_at_sec END,
               CASE WHEN o.op = 'delete' THEN CAST(0 AS BIGINT)
                 ELSE st.n_posts + CASE WHEN o.op = 'post' AND (NOT st.ex
                     OR st.picked_until_sec <= o.ts_sec)
                   THEN 1 ELSE 0 END END,
               CASE WHEN o.op = 'delete' THEN CAST(0 AS BIGINT)
                 ELSE st.n_rejected_posts + CASE WHEN o.op = 'post'
                     AND st.ex AND st.picked_until_sec > o.ts_sec
                   THEN 1 ELSE 0 END END,
               CASE WHEN o.op = 'delete' THEN CAST(0 AS BIGINT)
                 ELSE st.n_picks + CASE WHEN o.op = 'pick' AND st.ex
                     AND st.picked_until_sec <= o.ts_sec
                     AND st.due_sec <= o.ts_sec
                   THEN 1 ELSE 0 END END,
               CASE WHEN o.op = 'delete' THEN CAST(0 AS BIGINT)
                 ELSE st.n_rejected_picks + CASE
                   WHEN (o.op = 'pick' AND NOT (st.ex
                       AND st.picked_until_sec <= o.ts_sec
                       AND st.due_sec <= o.ts_sec))
                     OR (o.op = 'ack' AND NOT st.ex)
                   THEN 1 ELSE 0 END END
           FROM st JOIN ops o ON o.id = st.id AND o.k = st.k + 1),
         fin AS (SELECT * FROM st QUALIFY
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY k DESC) = 1),
         t AS (SELECT max(${sec(tsUs)}) + 1 AS t_end FROM events)
         SELECT id, created_sec, due_sec, msg_rev, picked_at_sec,
           picked_until_sec, acked_at_sec, n_posts, n_rejected_posts,
           n_picks, n_rejected_picks,
           CAST(CASE WHEN picked_until_sec < t_end THEN 1 ELSE 0 END
             AS INT) AS free_at_end
         FROM fin, t WHERE ex ORDER BY id""",

    // q51: the quarantine classification re-derived from the plant
    // rules over raw orders — the oracle never parses the CSV, it
    // asserts the parser classified EXACTLY the planted-bad rows.
    // PERMISSIVE is partial-result: a quarantined row keeps every
    // field that parsed, so the corrupt group still sums the %41-only
    // prices and counts the %37 custkeys — the oracle mirrors that,
    // not an all-null fiction.
    "q51_csv_robust" ->
      """WITH cls AS (SELECT
             CASE WHEN o_orderkey % 37 = 0 OR o_orderkey % 41 = 0
               THEN '_corrupt' ELSE o_orderstatus END AS status,
             CASE WHEN o_orderkey % 37 = 0 THEN NULL
               ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS p,
             CASE WHEN o_orderkey % 41 = 0 AND o_orderkey % 37 <> 0
               THEN NULL ELSE o_custkey END AS cust
           FROM orders)
         SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
           COALESCE(CAST(SUM(p) AS DOUBLE), 0.0) AS sum_price,
           CAST(COUNT(cust) AS BIGINT) AS n_cust,
           CAST(COUNT(*) AS BIGINT) AS n_dated
         FROM cls GROUP BY status ORDER BY status""",

    // q50: Morton codes, buckets, ranges and verdicts re-derived with
    // the same integer shift/mask/div arithmetic — a bit-order or
    // scaling bug on either side breaks the hash.
    "q50_zorder_skip" -> {
      val probe = "(SELECT max_u // 2 FROM sc)"
      val zTerms = (0 until 16).map(i =>
        s"((us >> $i) & 1) * ${1L << (2 * i + 1)} + " +
          s"((ds >> $i) & 1) * ${1L << (2 * i)}").mkString(" + ")
      def leg(bucket: String, layout: String) =
        s"""SELECT '$layout' AS layout, $bucket AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(u) AS min_u, MAX(u) AS max_u,
           MIN(d) AS min_d, MAX(d) AS max_d,
           CAST(CASE WHEN MIN(u) <= $probe AND MAX(u) >= $probe
             THEN 1 ELSE 0 END AS BIGINT) AS probe_hit
         FROM k2 GROUP BY $bucket"""
      s"""WITH sc AS (SELECT MIN(date_trunc('day', $tsUs)) AS d0,
             date_diff('day', MIN(date_trunc('day', $tsUs)),
               MAX(date_trunc('day', $tsUs))) + 1 AS nd,
             MAX(user_id) AS max_u
           FROM events),
         b AS (SELECT user_id AS u,
             date_diff('day', sc.d0, date_trunc('day', $tsUs)) AS d,
             sc.nd AS nd, sc.max_u AS max_u
           FROM events, sc),
         k AS (SELECT u, d, nd,
             (u * 65535) // max_u AS us,
             (d * 65535) // greatest(nd - 1, 1) AS ds
           FROM b),
         k2 AS (SELECT u, d,
             ($zTerms) >> 29 AS zbucket,
             LEAST(7, (d * 8) // nd) AS tbucket
           FROM k),
         pts AS (${leg("zbucket", "zorder")}
           UNION ALL ${leg("tbucket", "time")}),
         summ AS (SELECT layout, CAST(-1 AS BIGINT) AS bucket,
             CAST(SUM(n_rows) AS BIGINT) AS n_rows,
             MIN(min_u) AS min_u, MAX(max_u) AS max_u,
             MIN(min_d) AS min_d, MAX(max_d) AS max_d,
             CAST(SUM(probe_hit) AS BIGINT) AS probe_hit
           FROM pts GROUP BY layout)
         SELECT * FROM (SELECT * FROM pts UNION ALL SELECT * FROM summ)
         ORDER BY layout, bucket""" },

    "q46_snapshot_diff" ->
      s"""WITH a AS (SELECT o_orderkey AS k, o_custkey, o_orderstatus,
             o_orderpriority
           FROM orders WHERE o_orderkey % 10 <> 0),
         b AS (SELECT o_orderkey AS k,
             o_custkey + CASE WHEN o_orderkey % 5 = 0
               THEN 1000 ELSE 0 END AS o_custkey,
             o_orderstatus,
             o_orderpriority || CASE WHEN o_orderkey % 3 = 1
               THEN '+r2' ELSE '' END AS o_orderpriority
           FROM orders WHERE o_orderkey % 7 <> 3),
         j AS (SELECT a.k IS NOT NULL AS ina, b.k IS NOT NULL AS inb,
             a.o_custkey IS DISTINCT FROM b.o_custkey AS c1,
             a.o_orderstatus IS DISTINCT FROM b.o_orderstatus AS c2,
             a.o_orderpriority IS DISTINCT FROM b.o_orderpriority AS c3
           FROM a FULL OUTER JOIN b ON a.k = b.k),
         st AS (SELECT 'status' AS kind,
             CASE WHEN NOT ina THEN 'added'
                  WHEN NOT inb THEN 'removed'
                  WHEN c1 OR c2 OR c3 THEN 'changed'
                  ELSE 'unchanged' END AS name, COUNT(*) AS n
           FROM j GROUP BY 2),
         fd AS (
           SELECT 'field' AS kind, 'o_custkey' AS name,
             CAST(SUM(CASE WHEN ina AND inb AND c1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n
             FROM j
           UNION ALL SELECT 'field', 'o_orderstatus',
             CAST(SUM(CASE WHEN ina AND inb AND c2 THEN 1 ELSE 0 END)
               AS BIGINT) FROM j
           UNION ALL SELECT 'field', 'o_orderpriority',
             CAST(SUM(CASE WHEN ina AND inb AND c3 THEN 1 ELSE 0 END)
               AS BIGINT) FROM j)
         SELECT kind, name, CAST(n AS BIGINT) AS n FROM
           (SELECT * FROM st UNION ALL
            SELECT * FROM fd WHERE n > 0)
         ORDER BY kind, name""",

    // e01: exact midrank AUC re-derived — everything integer until the
    // final division, so the window formulation here equals the gate's
    // sorted-array fold bit-for-bit.
    // e07: same counts frame as e01, descending-threshold cumulative
    // TP/seen via a window over the BOUNDED score grid, each emitted
    // value one correctly-rounded division of exact int64s, and the AP
    // total a list_reduce in the same descending order the Spark fold
    // runs.
    // p13: the same sqrt/fold/divide/floor chain — Z folded in
    // source-name order (list_reduce starts at the first element;
    // Spark starts at 0.0 + first, identical doubles), sqrt/divide
    // correctly rounded on both engines, so every emitted double is
    // bit-identical.
    "p13_temperature_mix" -> {
      val budget = graft.SparkEntry.p13Budget
      s"""WITH s AS (SELECT source,
             CAST(SUM($wordCountSql) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
         w AS (SELECT source, n_tokens,
             sqrt(CAST(n_tokens AS DOUBLE)) AS weight FROM s),
         z AS (SELECT list_reduce(list(weight ORDER BY source),
             (a, b) -> a + b) AS z FROM w)
         SELECT source, n_tokens, weight, weight / z.z AS share,
           CAST(FLOOR($budget * weight / z.z) AS BIGINT)
             AS budget_tokens
         FROM w, z ORDER BY source""" },

    "e07_pr_auc" ->
      s"""WITH b AS (SELECT $wordCountSql AS s, (lang = 'en') AS y
             FROM documents),
         c AS (SELECT s, COUNT(*) AS n_s,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p_s
           FROM b GROUP BY 1),
         tt AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n,
             CAST(SUM(p_s) AS BIGINT) AS n_pos FROM c),
         pt AS (SELECT s, p_s AS d_tp,
             CAST(SUM(p_s) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
             CAST(SUM(n_s) OVER (ORDER BY s DESC) AS BIGINT) AS seen
           FROM c),
         p2 AS (SELECT 'point' AS kind, s, d_tp, tp,
             seen - tp AS fp, (SELECT n_pos FROM tt) AS n_pos,
             CAST(tp AS DOUBLE) / CAST(seen AS DOUBLE) AS precision,
             CAST(tp AS DOUBLE) / CAST((SELECT n_pos FROM tt) AS DOUBLE)
               AS recall,
             CAST(d_tp * tp AS DOUBLE) /
               CAST((SELECT n_pos FROM tt) * seen AS DOUBLE) AS term
           FROM pt)
         SELECT kind, s, d_tp, tp, fp, n_pos, precision, recall, term
           FROM p2
         UNION ALL
         SELECT 'total', -1, 0, (SELECT n_pos FROM tt),
             (SELECT n - n_pos FROM tt), (SELECT n_pos FROM tt),
             0.0, 0.0,
             list_reduce(list(term ORDER BY s DESC), (x, y) -> x + y)
           FROM p2
         ORDER BY kind, s""",

    "e01_auc_label" ->
      s"""WITH b AS (SELECT $wordCountSql AS s, (lang = 'en') AS y
             FROM documents),
         c AS (SELECT s, COUNT(*) AS n_s,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p_s
           FROM b GROUP BY 1),
         w AS (SELECT s, n_s, p_s,
             COALESCE(CAST(SUM(n_s) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS cumb
           FROM c),
         a AS (SELECT
             CAST(SUM(p_s * (2*cumb + n_s + 1)) AS BIGINT) AS two_r,
             CAST(SUM(p_s) AS BIGINT) AS n_pos,
             CAST(SUM(n_s) AS BIGINT) AS n FROM w)
         SELECT n_pos, n - n_pos AS n_neg,
           two_r - n_pos*(n_pos+1) AS auc_num,
           2*n_pos*(n-n_pos) AS auc_den,
           CAST(two_r - n_pos*(n_pos+1) AS DOUBLE) /
             CAST(2*n_pos*(n-n_pos) AS DOUBLE) AS auc
         FROM a""",

    // e04: the incremental == full-recompute invariant — the oracle
    // recomputes the AUC from the WHOLE table (q45's discipline), so a
    // hash match proves state persist + delta merge lost nothing;
    // n_scores pins the bounded state size.
    "e04_incr_auc" ->
      s"""WITH b AS (SELECT $wordCountSql AS s, (lang = 'en') AS y
             FROM documents),
         c AS (SELECT s, COUNT(*) AS n_s,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p_s
           FROM b GROUP BY 1),
         w AS (SELECT s, n_s, p_s,
             COALESCE(CAST(SUM(n_s) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS cumb
           FROM c),
         a AS (SELECT
             CAST(SUM(p_s * (2*cumb + n_s + 1)) AS BIGINT) AS two_r,
             CAST(SUM(p_s) AS BIGINT) AS n_pos,
             CAST(SUM(n_s) AS BIGINT) AS n,
             COUNT(*) AS n_scores FROM w)
         SELECT n_pos, n - n_pos AS n_neg, n_scores,
           two_r - n_pos*(n_pos+1) AS auc_num,
           2*n_pos*(n-n_pos) AS auc_den,
           CAST(two_r - n_pos*(n_pos+1) AS DOUBLE) /
             CAST(2*n_pos*(n-n_pos) AS DOUBLE) AS auc
         FROM a""",

    // e02: chi-squared homogeneity per source — exact integer
    // numerators, the two window terms summed a-then-b, the total an
    // ordered list fold (the dotD accumulation-order discipline).
    "e02_chi2_drift" -> chi2DriftSql,

    // e05: everything downstream of the exported mean vectors —
    // deltas, the top-k drifted dims (|delta| DESC, i ASC), the
    // ascending-i folded L2/cosine — re-derived from the model parquet
    // with the dotD accumulation order.
    // e06: calibration bins re-derived — p is a binary fraction
    // (num/128), so the p and (p-y)^2 sums are exact doubles in any
    // order in both engines; bin = integer num*10/128 clamped to 9.
    "e06_calibration" ->
      s"""WITH b AS (SELECT ($wordCountSql) % 129 AS num,
             (lang = 'en') AS y
           FROM documents),
         v AS (SELECT LEAST(num * 10 // 128, 9) AS bin,
             CAST(num AS DOUBLE) / 128 AS p,
             CASE WHEN y THEN 1.0 ELSE 0.0 END AS yd,
             CASE WHEN y THEN 1 ELSE 0 END AS pos
           FROM b),
         g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p) AS DOUBLE) AS sum_p,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM((p - yd) * (p - yd)) AS DOUBLE) AS brier_sum
           FROM v GROUP BY 1),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(sum_p) AS DOUBLE) AS sum_p,
             CAST(SUM(n_pos) AS BIGINT) AS n_pos,
             CAST(SUM(brier_sum) AS DOUBLE) AS brier_sum
           FROM g),
         rows_ AS (
           SELECT 'bin' AS kind, bin, n,
             round(sum_p / n, 6) AS avg_p, n_pos,
             round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate,
             round(brier_sum / n, 6) AS brier
           FROM g
           UNION ALL
           SELECT 'total', CAST(-1 AS BIGINT), n,
             round(sum_p / n, 6), n_pos,
             round(CAST(n_pos AS DOUBLE) / n, 6),
             round(brier_sum / n, 6)
           FROM t)
         SELECT * FROM rows_ ORDER BY kind, bin""",

    "e05_embed_drift" ->
      s"""WITH m AS (SELECT pop, i, w
             FROM read_parquet(${modelGlob("e05", "mean_vecs")})),
         d AS (SELECT a.i, a.w AS w_a, b.w AS w_b, a.w - b.w AS delta
           FROM (SELECT i, w FROM m WHERE pop = 'a') a
           JOIN (SELECT i, w FROM m WHERE pop = 'b') b USING (i)),
         dims AS (SELECT 'dim' AS kind, CAST(i AS BIGINT) AS i,
             delta AS v
           FROM d ORDER BY abs(delta) DESC, i ASC
           LIMIT ${graft.SparkEntry.e05TopK}),
         s AS (SELECT
             sqrt(list_reduce(list(delta*delta ORDER BY i),
               (x, y) -> x + y)) AS l2,
             list_reduce(list(w_a*w_b ORDER BY i), (x, y) -> x + y) /
               (sqrt(list_reduce(list(w_a*w_a ORDER BY i),
                  (x, y) -> x + y)) *
                sqrt(list_reduce(list(w_b*w_b ORDER BY i),
                  (x, y) -> x + y))) AS cos
           FROM d)
         SELECT kind, i, v FROM (
           SELECT * FROM dims
           UNION ALL SELECT 'stat', CAST(-1 AS BIGINT), l2 FROM s
           UNION ALL SELECT 'stat', CAST(-2 AS BIGINT), cos FROM s)
         ORDER BY kind, i""",

    // st12: the SAME statistic with the cells maintained in streaming
    // state — counting is order-insensitive, so the drained state
    // equals the batch counts and the oracle is shared verbatim
    // (st10's discipline on the evaluation axis).
    "st12_drift_stream" -> chi2DriftSql,

    // e03: two-sample KS — the D statistic's exact rational form
    // max|cumA*n_b - cumB*n_a|/(n_a*n_b) plus its first witness value,
    // re-derived with windows over the same value grid.
    "e03_ks_2sample" ->
      s"""WITH b AS (SELECT value AS v, (event_type = 'click') AS a
             FROM events WHERE event_type IN ('click', 'error')),
         c AS (SELECT v,
             CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS c_b
           FROM b GROUP BY 1),
         t AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
             CAST(SUM(c_b) AS BIGINT) AS n_b FROM c),
         cum AS (SELECT v,
             CAST(SUM(c_a) OVER (ORDER BY v) AS BIGINT) AS ca,
             CAST(SUM(c_b) OVER (ORDER BY v) AS BIGINT) AS cb FROM c),
         d AS (SELECT v,
             abs(ca*(SELECT n_b FROM t) - cb*(SELECT n_a FROM t)) AS diff
           FROM cum),
         m AS (SELECT MAX(diff) AS num FROM d),
         at AS (SELECT MIN(v) AS ks_at FROM d
           WHERE diff = (SELECT num FROM m))
         SELECT t.n_a, t.n_b, m.num AS ks_num, t.n_a*t.n_b AS ks_den,
           CAST(m.num AS DOUBLE)/CAST(t.n_a*t.n_b AS DOUBLE) AS ks,
           at.ks_at
         FROM t, m, at""",

    // e08: the Poisson bootstrap re-drawn coin-for-coin — the same
    // 60-bit md5 draws, the same pinned integer CDF thresholds
    // (Eval.poissonCdf60, shared constants), exact integer partial
    // sums per replicate, and the nearest-rank CI picked by the
    // identical (mean, b) order statistics.
    "e08_bootstrap_ci" -> bootstrapCiSql,

    // st15: the SAME bootstrap with the replicate partials maintained
    // in streaming state — integer counting is order-insensitive, so
    // the drained complete-mode state equals the batch reps frame
    // bit-for-bit and the oracle is shared verbatim (st10/st12's
    // shared-oracle discipline on the uncertainty axis).
    "st15_bootstrap_stream" -> bootstrapCiSql,


    // g01: fixed-point PageRank replayed round-for-round — the same
    // planted md5 edges, the same integer div/mod/sum arithmetic
    // (DuckDB's // is the BIGINT floor division twinning Spark's div
    // on the all-positive ranks), all iterations UNROLLED as chained
    // CTEs (deterministic fixed iteration count — no recursion needed).
    "g01_pagerank" -> {
      val u = graft.SparkEntry.g01Unit
      val num = graft.SparkEntry.g01DampNum
      val den = graft.SparkEntry.g01DampDen
      val seed = graft.SparkEntry.g01Seed
      val iters = graft.SparkEntry.g01Iters
      val sb = new StringBuilder
      sb ++= s"""WITH nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),
         nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(doc_id) AS BIGINT) AS lo FROM documents),
         edges AS MATERIALIZED (SELECT node AS src,
             lo + (CAST(concat('0x', substr(md5('$seed' ||
               CAST(j AS VARCHAR) || '|' || CAST(node AS VARCHAR)),
               1, 15)) AS BIGINT) % n) AS dst
           FROM nodes, nn, unnest(generate_series(0,
             ${graft.SparkEntry.g01OutDeg - 1})) AS t(j)),
         deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
           FROM edges GROUP BY 1),
         r0 AS MATERIALIZED (SELECT node, $u // n AS r FROM nodes, nn)"""
      for (i <- 1 to iters) {
        sb ++= s""",
         c$i AS MATERIALIZED (SELECT e.dst AS node,
             CAST(SUM(r.r // d.outdeg) AS BIGINT) AS in_sum
           FROM edges e JOIN r${i - 1} r ON e.src = r.node
           JOIN deg d ON e.src = d.src GROUP BY 1),
         d$i AS MATERIALIZED (SELECT COALESCE(CAST(SUM(r.r) AS BIGINT), 0) AS dmass
           FROM r${i - 1} r LEFT JOIN deg dg ON r.node = dg.src
           WHERE dg.src IS NULL),
         r$i AS MATERIALIZED (SELECT nd.node,
             ((${den - num} * $u) // ($den * nn.n)) +
             (($num * (COALESCE(c.in_sum, 0) + (dm.dmass // nn.n)))
               // $den) AS r
           FROM nodes nd CROSS JOIN nn CROSS JOIN d$i dm
           LEFT JOIN c$i c ON nd.node = c.node)"""
      }
      sb ++= s""",
         indeg AS MATERIALIZED (SELECT dst AS node,
             CAST(COUNT(*) AS BIGINT) AS in_deg FROM edges GROUP BY 1)
         SELECT n.node, COALESCE(i.in_deg, 0) AS in_deg, r.r AS r,
           CAST(r.r AS DOUBLE) / CAST($u AS DOUBLE) AS rank
         FROM nodes n JOIN r$iters r ON n.node = r.node
         LEFT JOIN indeg i ON n.node = i.node
         ORDER BY n.node"""
      sb.toString
    },

    // g03: TrustRank replayed round-for-round over g01's edge fixture —
    // teleport + dangling mass to seeds only, the same integer //
    // arithmetic, rounds unrolled as MATERIALIZED chained CTEs.
    "g03_trustrank" -> {
      val u = graft.SparkEntry.g01Unit
      val num = graft.SparkEntry.g01DampNum
      val den = graft.SparkEntry.g01DampDen
      val seed = graft.SparkEntry.g01Seed
      val iters = graft.SparkEntry.g03Iters
      val sb = new StringBuilder
      sb ++= s"""WITH nodes AS MATERIALIZED (SELECT doc_id AS node,
             CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)$$', 1)
                 AS BIGINT) % 3 = 0
               THEN 1 ELSE 0 END AS is_seed
           FROM documents),
         nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(doc_id) AS BIGINT) AS lo FROM documents),
         ns AS MATERIALIZED (SELECT CAST(SUM(is_seed) AS BIGINT)
             AS n_seeds FROM nodes),
         edges AS MATERIALIZED (SELECT node AS src,
             lo + (CAST(concat('0x', substr(md5('$seed' ||
               CAST(j AS VARCHAR) || '|' || CAST(node AS VARCHAR)),
               1, 15)) AS BIGINT) % n) AS dst
           FROM nodes, nn, unnest(generate_series(0,
             ${graft.SparkEntry.g01OutDeg - 1})) AS t(j)),
         deg AS MATERIALIZED (SELECT src,
             CAST(COUNT(*) AS BIGINT) AS outdeg
           FROM edges GROUP BY 1),
         r0 AS MATERIALIZED (SELECT node, is_seed,
             CASE WHEN is_seed = 1 THEN $u // (SELECT n_seeds FROM ns)
               ELSE 0 END AS r
           FROM nodes)"""
      for (i <- 1 to iters) {
        sb ++= s""",
         c$i AS MATERIALIZED (SELECT e.dst AS node,
             CAST(SUM(r.r // d.outdeg) AS BIGINT) AS in_sum
           FROM edges e JOIN r${i - 1} r ON e.src = r.node
           JOIN deg d ON e.src = d.src GROUP BY 1),
         d$i AS MATERIALIZED (SELECT
             COALESCE(CAST(SUM(r.r) AS BIGINT), 0) AS dmass
           FROM r${i - 1} r LEFT JOIN deg dg ON r.node = dg.src
           WHERE dg.src IS NULL),
         r$i AS MATERIALIZED (SELECT nd.node, nd.is_seed,
             (($num * COALESCE(c.in_sum, 0)) // $den) +
             (CASE WHEN nd.is_seed = 1 THEN
                ((${den - num} * $u) + ($num * dm.dmass))
                  // ($den * ns.n_seeds)
              ELSE 0 END) AS r
           FROM nodes nd CROSS JOIN ns CROSS JOIN d$i dm
           LEFT JOIN c$i c ON nd.node = c.node)"""
      }
      sb ++= s"""
         SELECT node, CAST(is_seed AS BIGINT) AS is_seed, r,
           CAST(r AS DOUBLE) / CAST($u AS DOUBLE) AS rank
         FROM r$iters ORDER BY node"""
      sb.toString
    },

    // g02: fixed-point HITS replayed round-for-round over g01's edge
    // fixture — integer L1 normalization, the ·unit products in
    // HUGEINT twinning the gate's decimal(38,0), // the integral
    // division, all rounds unrolled as chained CTEs.
    "g02_hits" -> {
      val u = graft.SparkEntry.g01Unit
      val seed = graft.SparkEntry.g01Seed
      val iters = graft.SparkEntry.g02Iters
      val sb = new StringBuilder
      sb ++= s"""WITH nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),
         nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(doc_id) AS BIGINT) AS lo FROM documents),
         edges AS MATERIALIZED (SELECT node AS src,
             lo + (CAST(concat('0x', substr(md5('$seed' ||
               CAST(j AS VARCHAR) || '|' || CAST(node AS VARCHAR)),
               1, 15)) AS BIGINT) % n) AS dst
           FROM nodes, nn, unnest(generate_series(0,
             ${graft.SparkEntry.g01OutDeg - 1})) AS t(j)),
         h0 AS MATERIALIZED (SELECT node, $u // n AS h FROM nodes, nn)"""
      for (i <- 1 to iters) {
        sb ++= s""",
         ar$i AS MATERIALIZED (SELECT e.dst AS node,
             CAST(SUM(h.h) AS BIGINT) AS a_raw
           FROM edges e JOIN h${i - 1} h ON e.src = h.node GROUP BY 1),
         sa$i AS MATERIALIZED (SELECT CAST(SUM(a_raw) AS BIGINT) AS s FROM ar$i),
         a$i AS MATERIALIZED (SELECT nd.node,
             CAST((CAST(COALESCE(ar.a_raw, 0) AS HUGEINT) * $u)
               // sa.s AS BIGINT) AS a
           FROM nodes nd CROSS JOIN sa$i sa
           LEFT JOIN ar$i ar ON nd.node = ar.node),
         hr$i AS MATERIALIZED (SELECT e.src AS node,
             CAST(SUM(a.a) AS BIGINT) AS h_raw
           FROM edges e JOIN a$i a ON e.dst = a.node GROUP BY 1),
         sh$i AS MATERIALIZED (SELECT CAST(SUM(h_raw) AS BIGINT) AS s FROM hr$i),
         h$i AS MATERIALIZED (SELECT nd.node,
             CAST((CAST(COALESCE(hr.h_raw, 0) AS HUGEINT) * $u)
               // sh.s AS BIGINT) AS h
           FROM nodes nd CROSS JOIN sh$i sh
           LEFT JOIN hr$i hr ON nd.node = hr.node)"""
      }
      sb ++= s"""
         SELECT a.node, a.a, h.h,
           CAST(a.a AS DOUBLE) / CAST($u AS DOUBLE) AS auth,
           CAST(h.h AS DOUBLE) / CAST($u AS DOUBLE) AS hub
         FROM a$iters a JOIN h$iters h USING (node)
         ORDER BY a.node"""
      sb.toString
    },

    // e11: PSI re-derived — the same exact cent binning (decimal cast
    // · 100 → BIGINT, // the integral div, top bin clamped), the same
    // smoothed densities over ALL bins, the same bin-ascending fold;
    // ln at 6 dp is the t14/t25 libm precedent.
    "e11_psi" -> {
      val bins = graft.SparkEntry.e11Bins
      val bc = graft.SparkEntry.e11BinCents
      s"""WITH b AS (SELECT
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             (event_type = 'click') AS a
           FROM events WHERE event_type IN ('click', 'error')),
         c AS (SELECT least(cents // $bc, ${bins - 1}) AS bin,
             CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
               AS c_b
           FROM b GROUP BY 1),
         t AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
             CAST(SUM(c_b) AS BIGINT) AS n_b FROM c),
         dense AS (SELECT u.bin,
             COALESCE(c.c_a, 0) AS c_a, COALESCE(c.c_b, 0) AS c_b,
             (COALESCE(c.c_a, 0) + 0.5) / (t.n_a + 0.5 * $bins) AS p_a,
             (COALESCE(c.c_b, 0) + 0.5) / (t.n_b + 0.5 * $bins) AS p_b
           FROM unnest(generate_series(0, ${bins - 1})) AS u(bin)
           CROSS JOIN t
           LEFT JOIN c ON c.bin = u.bin),
         d2 AS (SELECT bin, c_a, c_b, p_a, p_b,
             (p_a - p_b) * ln(p_a / p_b) AS t_raw FROM dense)
         SELECT kind, bin, c_a, c_b, p_a, p_b, term FROM (
           SELECT 'bin' AS kind, CAST(bin AS BIGINT) AS bin, c_a, c_b,
             p_a, p_b, round(t_raw, 6) AS term FROM d2
           UNION ALL
           SELECT 'total', CAST(-1 AS BIGINT),
             CAST(SUM(c_a) AS BIGINT), CAST(SUM(c_b) AS BIGINT),
             0.0, 0.0,
             round(list_reduce(list(t_raw ORDER BY bin),
               (x, y) -> x + y), 6)
           FROM d2)
         ORDER BY kind, bin"""
    },

    // e10: Mann–Whitney with midranks — the same doubled-midrank
    // cumulative window as e01/e09, the tie term and variance in
    // HUGEINT twinning the gate's decimal(38,0), the same
    // cast/sqrt/divide z chain.
    "e10_mannwhitney" ->
      s"""WITH b AS (SELECT value AS v, (event_type = 'click') AS a
             FROM events WHERE event_type IN ('click', 'error')),
         c AS (SELECT v,
             CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
               AS c_b
           FROM b GROUP BY 1),
         w AS (SELECT v, c_a, c_b, c_a + c_b AS t,
             COALESCE(CAST(SUM(c_a + c_b) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS cumb
           FROM c),
         agg AS (SELECT
             CAST(SUM(c_a) AS BIGINT) AS n_a,
             CAST(SUM(c_b) AS BIGINT) AS n_b,
             CAST(SUM(c_a * (2*cumb + t + 1)) AS BIGINT) AS two_r1,
             CAST(SUM(CAST(t AS HUGEINT)*t*t - t) AS HUGEINT) AS t_ties
           FROM w),
         e AS (SELECT n_a, n_b, n_a + n_b AS n, two_r1, t_ties
           FROM agg),
         f AS (SELECT n_a, n_b,
             two_r1 - n_a*(n_a + 1) AS u2,
             n_a*n_b AS mu2,
             CAST(t_ties AS DOUBLE) AS t_ties,
             CAST(CAST(n_a AS HUGEINT)*n_b*
                 ((CAST(n AS HUGEINT) + 1)*n*(n - 1) - t_ties)
               AS DOUBLE) /
             CAST(12*CAST(n AS HUGEINT)*(n - 1) AS DOUBLE) AS var_u
           FROM e)
         SELECT n_a, n_b, u2, mu2, t_ties, var_u,
           CAST(u2 - mu2 AS DOUBLE) / (2.0 * sqrt(var_u)) AS z
         FROM f""",

    // e09: Spearman with midranks — doubled midranks off each
    // marginal's cumulative window (2·cum_incl − n_v + 1 ≡ the gate's
    // 2·cum_before + n_v + 1), exact HUGEINT moment sums twinning the
    // gate's decimal(38,0), the same single-cast/sqrt/divide chain.
    "e09_spearman" ->
      s"""WITH b AS (SELECT $wordCountSql AS x, n_chars AS y
             FROM documents),
         pc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy
           FROM b GROUP BY 1, 2),
         rx AS (SELECT x,
             2*CAST(SUM(nv) OVER (ORDER BY x) AS BIGINT) - nv + 1
               AS r2x
           FROM (SELECT x, CAST(SUM(n_xy) AS BIGINT) AS nv
                 FROM pc GROUP BY 1)),
         ry AS (SELECT y,
             2*CAST(SUM(nv) OVER (ORDER BY y) AS BIGINT) - nv + 1
               AS r2y
           FROM (SELECT y, CAST(SUM(n_xy) AS BIGINT) AS nv
                 FROM pc GROUP BY 1)),
         m AS (SELECT
             CAST(SUM(CAST(n_xy AS HUGEINT)) AS HUGEINT) AS n,
             CAST(SUM(CAST(n_xy AS HUGEINT)*r2x) AS HUGEINT) AS sx,
             CAST(SUM(CAST(n_xy AS HUGEINT)*r2y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(n_xy AS HUGEINT)*r2x*r2x) AS HUGEINT)
               AS sxx,
             CAST(SUM(CAST(n_xy AS HUGEINT)*r2y*r2y) AS HUGEINT)
               AS syy,
             CAST(SUM(CAST(n_xy AS HUGEINT)*r2x*r2y) AS HUGEINT)
               AS sxy
           FROM pc JOIN rx USING (x) JOIN ry USING (y))
         SELECT CAST(n AS BIGINT) AS n,
           CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
           CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
           CAST(sxy AS DOUBLE) AS sxy,
           CAST(n*sxy - sx*sy AS DOUBLE) AS num,
           CAST(n*sxy - sx*sy AS DOUBLE) /
             (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
              sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS rho
         FROM m""",

    // t22: URL synthesis, canonicalization, dedup and per-domain cap
    // re-derived byte-for-byte (knobs shared via SparkEntry.t22*; the
    // tracking filter mirrors Urls.isTracking: utm_ prefix + fbclid/
    // gclid exact names).
    "t22_url_filters" -> {
      val slots = graft.SparkEntry.t22PathSlots
      val cap = graft.SparkEntry.t22Cap
      val isTrk = "starts_with(p, 'utm_') OR starts_with(p, 'fbclid=')" +
        " OR starts_with(p, 'gclid=')"
      s"""WITH u AS (SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN 'HTTPS' ELSE 'http' END ||
           '://' ||
           CASE WHEN doc_id % 5 = 0 THEN 'blog.' ELSE 'www.' END ||
           source || '.' ||
           CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
             ELSE 'net' END ||
           CASE WHEN doc_id % 11 = 0 THEN ':8080'
                WHEN doc_id % 4 = 0 THEN
                  CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE ':80' END
                ELSE '' END ||
           '/articles/item-' || CAST(doc_id % $slots AS VARCHAR) ||
           CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
           CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=home'
                WHEN doc_id % 3 = 1 THEN '?ref=home&utm_campaign=x'
                ELSE '' END ||
           CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END
             AS url
         FROM documents),
         parts AS (SELECT doc_id,
           lower(regexp_extract(url,
             '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
           lower(regexp_extract(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
             '^([^:]*)', 1)) AS host,
           COALESCE(regexp_extract(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
             ':(\\d+)$$', 1), '') AS port,
           regexp_replace(COALESCE(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), ''),
             '/+$$', '') AS path,
           -- DuckDB regexp_extract yields NULL (not '') on no match
           COALESCE(regexp_extract(url, '\\?([^#]*)', 1), '') AS q
         FROM u),
         canon AS (SELECT doc_id,
           regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
           sch || '://' || host ||
           CASE WHEN port = '' OR (sch = 'https' AND port = '443')
                  OR (sch = 'http' AND port = '80')
             THEN '' ELSE ':' || port END ||
           path ||
           CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canon,
           CASE WHEN len(list_filter(string_split(q, '&'),
             p -> $isTrk)) > 0 THEN 1 ELSE 0 END AS trk
         FROM (SELECT *, COALESCE(array_to_string(list_sort(list_filter(
             string_split(q, '&'),
             p -> NOT ($isTrk) AND p <> '')), '&'), '') AS kept
           FROM parts)),
         perurl AS (SELECT domain, canon,
             COUNT(*) AS n_docs_u, CAST(SUM(trk) AS BIGINT) AS n_trk_u,
             MIN(doc_id) AS doc_id
           FROM canon GROUP BY 1, 2),
         ranked AS (SELECT domain, doc_id, row_number() OVER (
             PARTITION BY domain ORDER BY doc_id) AS rn
           FROM perurl)
         SELECT p.domain,
           CAST(SUM(p.n_docs_u) AS BIGINT) AS n_docs,
           COUNT(*) AS n_urls,
           CAST(SUM(p.n_docs_u) - COUNT(*) AS BIGINT) AS n_dup_docs,
           CAST(SUM(p.n_trk_u) AS BIGINT) AS n_tracking,
           CAST(SUM(CASE WHEN r.rn <= $cap THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN r.rn <= $cap THEN r.doc_id ELSE 0 END)
             AS BIGINT) AS kept_docid_sum
         FROM perurl p JOIN ranked r
           ON r.domain = p.domain AND r.doc_id = p.doc_id
         GROUP BY p.domain ORDER BY p.domain""" },

    // t23: PMI ratio from unigram/adjacent-pair counts; the division
    // association order mirrors TextOps.pmiCollocations literally, so
    // every double is bit-identical (correctly-rounded IEEE ops only).
    "t23_pmi_collocations" -> {
      val mc = graft.SparkEntry.t23MinCount
      val k = graft.SparkEntry.t23K
      s"""WITH arrs AS (SELECT string_split($normText, ' ') AS arr
             FROM documents),
         uni AS (SELECT unnest(arr) AS w FROM arrs),
         uc AS (SELECT w, COUNT(*) AS n FROM uni GROUP BY w),
         n1 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n1 FROM uni),
         big AS (SELECT arr[i] AS tok_a, arr[i+1] AS tok_b
           FROM arrs, unnest(generate_series(1, len(arr) - 1)) AS u(i)),
         bc AS (SELECT tok_a, tok_b, COUNT(*) AS n_ab FROM big
           GROUP BY 1, 2 HAVING COUNT(*) >= $mc),
         n2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n2 FROM big)
         SELECT tok_a, tok_b, n_ab, a.n AS n_a, b.n AS n_b,
           round((CAST(n_ab AS DOUBLE) / n2) /
             ((CAST(a.n AS DOUBLE) / n1) *
              (CAST(b.n AS DOUBLE) / n1)), 6) AS pmi_ratio
         FROM bc JOIN uc a ON a.w = tok_a JOIN uc b ON b.w = tok_b,
           n1, n2
         ORDER BY pmi_ratio DESC, tok_a, tok_b LIMIT $k""" },

    // BPE pair counts re-derived off the word-frequency table exactly
    // as Spark builds them (overlapping adjacent pairs, weighted by
    // word frequency); ties break on pair ASC in both engines.
    "t15_bpe_merges" ->
      s"""WITH toks AS (SELECT unnest(string_split($normText, ' ')) AS w
                        FROM documents),
         words AS (SELECT w, COUNT(*) AS f FROM toks
                   WHERE length(w) >= 2 GROUP BY w),
         pairs AS (SELECT substr(w, i, 2) AS pair, f
                   FROM words,
                     unnest(generate_series(1, length(w) - 1)) AS u(i))
         SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt
         FROM pairs GROUP BY pair
         ORDER BY cnt DESC, pair ASC LIMIT 20""",

    // t20: ln quantized at 6 dp then EXACT decimal sums; the regression
    // closed form repeats the Spark side's double-op order, slope bound
    // in a CTE so the intercept reuses the identical double.
    // t21: page synthesis (SparkEntry.t21* knobs) + the C4 rule set
    // (HeuristicFilters constants) both re-derived relationally, so a
    // drift in either the fixture or a rule hash-mismatches.
    "t21_c4_filters" -> {
      val wpl = graft.SparkEntry.t21WordsPerLine
      val cyc = graft.SparkEntry.t21PunctCycle
      // list_concat is binary in DuckDB; chain with || instead
      val boiler = graft.SparkEntry.t21Boiler.map { case (m, line) =>
        s"|| CASE WHEN doc_id % $m = 0 THEN ['${line.replace("'", "''")}'] ELSE []::VARCHAR[] END"
      }.mkString("\n             ")
      val hf = graft.text.HeuristicFilters
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
             FROM documents),
         pg AS (SELECT doc_id,
             list_transform(range((len(ws) + ${wpl - 1}) // $wpl), i ->
               array_to_string(array_slice(ws, i*$wpl + 1, i*$wpl + $wpl), ' ')
               || CASE WHEN (doc_id + i) % $cyc <> 0 THEN '.' ELSE '' END)
             $boiler AS ls
           FROM w),
         v AS (SELECT doc_id, ls,
             array_to_string(ls, chr(10)) AS page,
             list_filter(ls, l ->
               len(string_split(l, ' ')) >= ${hf.minWordsPerLine}
               AND right(l, 1) IN ('.', '!', '?')
               AND NOT contains(l, 'javascript')) AS kl
           FROM pg),
         r AS (SELECT doc_id, ls, kl,
             CASE WHEN contains(page, 'lorem ipsum') THEN '${hf.reasonLoremIpsum}'
                  WHEN contains(page, '{') THEN '${hf.reasonBrace}'
                  WHEN len(kl) < ${hf.minKeptLines} THEN '${hf.reasonTooFew}'
                  ELSE '${hf.reasonKept}' END AS reason
           FROM v)
         SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(kl) AS BIGINT) AS n_lines_kept,
           CAST(COALESCE(list_sum(list_transform(kl, l ->
             len(string_split(l, ' ')))), 0) AS BIGINT) AS n_words_kept,
           CAST(CASE WHEN reason = '${hf.reasonKept}' THEN 1 ELSE 0 END
             AS BIGINT) AS kept,
           reason,
           CASE WHEN reason = '${hf.reasonKept}'
             THEN md5(array_to_string(kl, chr(10))) ELSE '' END AS clean_md5
         FROM r ORDER BY doc_id""" },

    // Re-derives t24's plants, counts and precedence verdict from the
    // SAME knobs SparkEntry/HeuristicFilters compile against — every
    // ratio an integer cross-multiplication, so no float enters the
    // cross-engine compare.
    "t24_gopher_rules" -> {
      val hf = graft.text.HeuristicFilters
      val e = graft.SparkEntry
      val wpl = e.t21WordsPerLine
      val stop = e.t24StopPhrase.map("'" + _ + "'").mkString("[", ",", "]")
      val stopTerms = hf.gStopWords.map(sw =>
        s"(CASE WHEN list_contains(ws,'$sw') THEN 1 ELSE 0 END)")
        .mkString("\n             + ")
      s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS bw
             FROM documents),
         w AS (SELECT doc_id, bw
             || CASE WHEN doc_id % ${e.t24StopMod} = 1 THEN $stop
                ELSE []::VARCHAR[] END
             || CASE WHEN doc_id % ${e.t24HashMod} = 0 THEN
                  list_transform(range(greatest(1, len(bw) // 8)), x -> '#')
                ELSE []::VARCHAR[] END
             || CASE WHEN doc_id % ${e.t24OnesMod} = 0 THEN
                  list_transform(range(len(bw) * 2), x -> 'a')
                ELSE []::VARCHAR[] END
             || CASE WHEN doc_id % ${e.t24NumMod} = 0 THEN
                  list_transform(range(greatest(1, len(bw) // 3)), x -> '1234')
                ELSE []::VARCHAR[] END AS ws
           FROM b),
         l AS (SELECT doc_id, ws,
             list_transform(range((len(ws) + ${wpl - 1}) // $wpl), i ->
               CASE WHEN doc_id % ${e.t24BulletMod} = 0 THEN '- '
                 ELSE '' END
               || array_to_string(
                    array_slice(ws, i*$wpl + 1, i*$wpl + $wpl), ' ')
               || CASE WHEN doc_id % ${e.t24EllipsisMod} = 0 AND i % 2 = 0
                 THEN '...' ELSE '' END) AS ls
           FROM w),
         s AS (SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
               AS BIGINT) AS sum_word_len,
             CAST(COALESCE(list_sum(list_transform(ws, x ->
               length(x) - length(replace(x, '#', ''))
               + (length(x) - length(replace(x, '...', ''))) // 3)), 0)
               AS BIGINT) AS n_symbols,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ls, x -> substr(x, 1, 2) = '- '))
               AS BIGINT) AS n_bullet_lines,
             CAST(len(list_filter(ls, x -> right(x, 3) = '...'))
               AS BIGINT) AS n_ellipsis_lines,
             CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
               AS BIGINT) AS n_alpha_words,
             CAST($stopTerms AS BIGINT) AS n_stop_words
           FROM l),
         r AS (SELECT *, CASE
             WHEN n_words < ${hf.gMinWords} OR n_words > ${hf.gMaxWords}
               THEN '${hf.gReasons(0)}'
             WHEN sum_word_len < ${hf.gMinMeanLen} * n_words
               OR sum_word_len > ${hf.gMaxMeanLen} * n_words
               THEN '${hf.gReasons(1)}'
             WHEN n_symbols * 100 >= ${hf.gSymbolRatioPct} * n_words
               THEN '${hf.gReasons(2)}'
             WHEN n_bullet_lines * 100 >= ${hf.gBulletPct} * n_lines
               THEN '${hf.gReasons(3)}'
             WHEN n_ellipsis_lines * 100 >= ${hf.gEllipsisPct} * n_lines
               THEN '${hf.gReasons(4)}'
             WHEN n_alpha_words * 100 < ${hf.gAlphaPct} * n_words
               THEN '${hf.gReasons(5)}'
             WHEN n_stop_words < ${hf.gMinStopWords}
               THEN '${hf.gReasons(6)}'
             ELSE '${hf.gReasons(7)}' END AS reason
           FROM s)
         SELECT doc_id, n_words, sum_word_len, n_symbols, n_lines,
           n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_words,
           CAST(CASE WHEN reason = '${hf.gReasons(7)}' THEN 1 ELSE 0 END
             AS BIGINT) AS kept,
           reason
         FROM r ORDER BY doc_id""" },

    "t20_zipf_fit" ->
      s"""WITH toks AS (SELECT unnest(string_split($normText, ' '))
             AS token FROM documents),
         tf AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY token),
         top AS (SELECT token, freq, CAST(row_number() OVER (
               ORDER BY freq DESC, token) AS INT) AS rank
             FROM tf ORDER BY freq DESC, token LIMIT 100),
         q AS (SELECT
             CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6))
               AS x,
             CAST(round(ln(CAST(freq AS DOUBLE)), 6) AS DECIMAL(18,6))
               AS y
           FROM top),
         sums AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
           FROM q),
         fit AS (SELECT n, sx, sy,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
           FROM sums)
         SELECT CAST(n AS BIGINT) AS n_ranked, round(slope, 6) AS slope,
           round((sy - slope * sx) / n, 6) AS intercept
         FROM fit""",

    // t19: every card column from exact integers or 6-dp decimal sums,
    // divisions in the same stated order as the Spark side.
    "t19_data_card" ->
      s"""WITH f AS (SELECT doc_id, source, lang, text,
             md5($normText) AS fp
           FROM documents),
         d AS (SELECT fp, COUNT(*) AS fp_df FROM f GROUP BY fp)
         SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM($wordCountSql) AS BIGINT) AS total_tokens,
           round(CAST(SUM(CAST(round($qualitySql, 6) AS DECIMAL(18,6)))
               AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_quality,
           round(CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS DOUBLE) /
             CAST(COUNT(*) AS DOUBLE), 6) AS share_en,
           COUNT(DISTINCT fp) AS n_unique_fp,
           round(CAST(COUNT(CASE WHEN fp_df >= 2 THEN 1 END) AS DOUBLE) /
             CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
         FROM f JOIN d USING (fp)
         GROUP BY source ORDER BY source""",

    // t18: the t15 counting CTE ranks the merge table (same cnt DESC,
    // pair ASC order), then a recursive CTE replays bpeEncode's stated
    // merge-step rule — single-pass replace of the lowest-rank present
    // pair, re-scan until none applies — state-for-state over the vocab.
    "t18_bpe_encode" ->
      s"""WITH RECURSIVE
         toks AS (SELECT doc_id, unnest(string_split($normText, ' ')) AS w
                  FROM documents),
         tc AS (SELECT doc_id, w, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
         wf AS (SELECT w, CAST(SUM(cnt) AS BIGINT) AS f FROM tc
                WHERE length(w) >= 2 GROUP BY w),
         prs AS (SELECT substr(w, i, 2) AS pair, f
                 FROM wf,
                   unnest(generate_series(1, length(w) - 1)) AS u(i)),
         pc AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt
                FROM prs GROUP BY pair),
         ranked AS (SELECT pair, CAST(row_number() OVER
               (ORDER BY cnt DESC, pair ASC) AS INT) AS rank
             FROM pc ORDER BY cnt DESC, pair ASC LIMIT ${
               graft.SparkEntry.t18Merges}),
         vocab AS (SELECT DISTINCT w FROM tc),
         rec(w, state) AS (
           SELECT w, '|' || regexp_replace(w, '(.)', '\\1|', 'g')
           FROM vocab
           UNION ALL
           SELECT rec.w, replace(rec.state,
               '|' || substr(m.pair, 1, 1) || '|' ||
                 substr(m.pair, 2, 1) || '|',
               '|' || m.pair || '|')
           FROM rec, LATERAL (
             SELECT pair FROM ranked r
             WHERE position(('|' || substr(r.pair, 1, 1) || '|' ||
               substr(r.pair, 2, 1) || '|') IN rec.state) > 0
             ORDER BY r.rank LIMIT 1) m),
         done AS (SELECT w,
             length(state) - length(replace(state, '|', '')) - 1 AS n_bpe
           FROM rec
           WHERE NOT EXISTS (SELECT 1 FROM ranked r
             WHERE position(('|' || substr(r.pair, 1, 1) || '|' ||
               substr(r.pair, 2, 1) || '|') IN rec.state) > 0))
         SELECT tc.doc_id, CAST(SUM(tc.cnt) AS BIGINT) AS n_words,
           CAST(SUM(tc.cnt * d.n_bpe) AS BIGINT) AS n_bpe_tokens
         FROM tc JOIN done d USING (w)
         GROUP BY tc.doc_id ORDER BY tc.doc_id""",

    "t10_tfidf_terms" ->
      s"""WITH toks AS (SELECT doc_id,
               unnest(string_split($normText, ' ')) AS token
             FROM documents),
         tf AS (SELECT doc_id, token, COUNT(*) AS tf
                FROM toks GROUP BY 1, 2),
         df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         scored AS (SELECT doc_id, token,
               tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS score
               FROM tf JOIN df USING (token) CROSS JOIN n),
         r AS (SELECT doc_id, token, score,
               CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, token ASC) AS INT) AS rank
               FROM scored)
         SELECT doc_id, rank, token, round(score, 6) AS score
         FROM r WHERE rank <= 5 ORDER BY doc_id, rank""",

    "p04_stratified_split" ->
      s"""WITH flags AS (SELECT doc_id, source,
             CAST(concat('0x', substr(md5(concat('${
               graft.SparkEntry.p04Seed}', CAST(doc_id AS VARCHAR))),
               1, 15)) AS BIGINT) / 1152921504606846976.0 AS u
           FROM documents),
         lab AS (SELECT doc_id, source,
               CASE WHEN u < 0.8 THEN 'train'
                    WHEN u < 0.9 THEN 'val'
                    ELSE 'test' END AS split
               FROM flags)
         SELECT source, split, COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
         FROM lab GROUP BY source, split ORDER BY source, split""",

    "p03_length_histogram" ->
      s"""WITH b AS (SELECT CASE WHEN $wordCountSql >= 1024 THEN 17
               ELSE CAST($wordCountSql // 64 AS BIGINT) + 1 END AS bucket
             FROM documents)
         SELECT bucket, (bucket - 1) * 64 AS lo_tokens,
           bucket * 64 AS hi_tokens, COUNT(*) AS n_docs
         FROM b GROUP BY bucket ORDER BY bucket""",

    "m03_pixel_stats" ->
      s"""WITH d AS (SELECT doc_id,
             CAST(${pb} + doc_id % ${pwm} AS BIGINT) AS w,
             CAST(${pb} + doc_id % ${phm} AS BIGINT) AS h
           FROM documents),
         px AS (SELECT doc_id, w, h, xs.x AS x, ys.y AS y
                FROM d,
                  unnest(generate_series(0, w - 1)) AS xs(x),
                  unnest(generate_series(0, h - 1)) AS ys(y))
         SELECT doc_id, w AS width, h AS height, w * h AS n_pixels,
           round(CAST(SUM((doc_id + x + y) % 256) AS DOUBLE) / (w * h), 6)
             AS mean_r,
           round(CAST(SUM((doc_id + 2 * x + y) % 256) AS DOUBLE) / (w * h), 6)
             AS mean_g,
           round(CAST(SUM((doc_id + x + 2 * y) % 256) AS DOUBLE) / (w * h), 6)
             AS mean_b
         FROM px GROUP BY doc_id, w, h ORDER BY doc_id""",

    // m12: every bin count recomputed from the closed-form pixel
    // pattern; all 16 bins per doc (zeros included) so the joins are
    // presence-unambiguous.
    "m12_color_histogram" ->
      s"""WITH d AS (SELECT doc_id,
             CAST(${pb} + doc_id % ${pwm} AS BIGINT) AS w,
             CAST(${pb} + doc_id % ${phm} AS BIGINT) AS h
           FROM documents),
         px AS (SELECT doc_id,
                  (doc_id + x + y) % 256 AS r,
                  (doc_id + 2 * x + y) % 256 AS g,
                  (doc_id + x + 2 * y) % 256 AS b
                FROM d,
                  unnest(generate_series(0, w - 1)) AS xs(x),
                  unnest(generate_series(0, h - 1)) AS ys(y)),
         bins AS (SELECT doc_id, CAST(bb AS BIGINT) AS bin
                  FROM d, unnest(generate_series(0, 15)) AS u(bb)),
         hr AS (SELECT doc_id, r // 16 AS bin,
                  CAST(COUNT(*) AS BIGINT) AS n FROM px GROUP BY 1, 2),
         hg AS (SELECT doc_id, g // 16 AS bin,
                  CAST(COUNT(*) AS BIGINT) AS n FROM px GROUP BY 1, 2),
         hb AS (SELECT doc_id, b // 16 AS bin,
                  CAST(COUNT(*) AS BIGINT) AS n FROM px GROUP BY 1, 2)
         SELECT bins.doc_id, bins.bin,
           COALESCE(hr.n, CAST(0 AS BIGINT)) AS n_r,
           COALESCE(hg.n, CAST(0 AS BIGINT)) AS n_g,
           COALESCE(hb.n, CAST(0 AS BIGINT)) AS n_b
         FROM bins
           LEFT JOIN hr USING (doc_id, bin)
           LEFT JOIN hg USING (doc_id, bin)
           LEFT JOIN hb USING (doc_id, bin)
         ORDER BY doc_id, bin""",

    "t11_lm_score" ->
      s"""WITH arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                        FROM documents),
         trbi AS (SELECT arr[i] AS w1, arr[i + 1] AS w2
                  FROM arrs,
                    unnest(generate_series(1, len(arr) - 1)) AS u(i)
                  WHERE doc_id % 10 != 0 AND len(arr) >= 2),
         c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM trbi GROUP BY 1, 2),
         c1 AS (SELECT w1, COUNT(*) AS c1 FROM trbi GROUP BY 1),
         v AS (SELECT COUNT(DISTINCT t.w) AS v
               FROM (SELECT unnest(arr) AS w FROM arrs
                     WHERE doc_id % 10 != 0) t),
         evbi AS (SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
                  FROM arrs,
                    unnest(generate_series(1, len(arr) - 1)) AS u(i)
                  WHERE len(arr) >= 2),
         nll AS (SELECT doc_id,
                   -ln((COALESCE(c2.c2, 0) + 0.5)
                     / (COALESCE(c1.c1, 0) + 0.5 * v.v)) AS nll
                 FROM evbi
                   LEFT JOIN c2 USING (w1, w2)
                   LEFT JOIN c1 USING (w1), v)
         SELECT doc_id, COUNT(*) AS n_bigrams,
           round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
         FROM nll GROUP BY doc_id ORDER BY doc_id""",

    "t13_entropy" ->
      s"""WITH toks AS (SELECT doc_id,
               unnest(string_split($normText, ' ')) AS token
             FROM documents),
         tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         agg AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                   COUNT(*) AS n_types,
                   CAST(SUM(CAST(tf AS DOUBLE) * log2(CAST(tf AS DOUBLE))) AS DOUBLE) AS stl
                 FROM tf GROUP BY 1)
         SELECT doc_id, n_tokens, n_types,
           round(log2(CAST(n_tokens AS DOUBLE)) - stl / n_tokens, 6)
             AS entropy,
           round(CASE WHEN n_types > 1
             THEN (log2(CAST(n_tokens AS DOUBLE)) - stl / n_tokens)
                  / log2(CAST(n_types AS DOUBLE))
             ELSE 0.0 END, 6) AS entropy_norm
         FROM agg ORDER BY doc_id""",

    // DSIR hashed-bigram importance weights: the oracle re-derives the
    // bucket of every bigram (same md5-hex-integer convention as p06/p07)
    // and both smoothed distributions, then the per-doc log-ratio sum.
    // t25: pairwise JS divergence re-derived — the same md5 slot
    // hashing (t14's convention), the same add-0.5 smoothing over ALL
    // slots (empty slots keep their smoothing mass), the same
    // slot-ascending fold; ln at 6 dp is the t14 libm precedent.
    "t25_js_divergence" -> {
      val b = graft.SparkEntry.t25Buckets
      s"""WITH tk AS (SELECT source AS src,
             string_split($normText, ' ') AS t FROM documents),
         bg AS (SELECT src,
             CAST(concat('0x', substr(md5(t[i] || ' ' || t[i + 1]),
               1, 15)) AS BIGINT) % $b AS b
           FROM tk, unnest(generate_series(1, len(t) - 1)) AS u(i)
           WHERE len(t) >= 2),
         cnt AS (SELECT src, b, CAST(COUNT(*) AS BIGINT) AS c
           FROM bg GROUP BY 1, 2),
         tot AS (SELECT src, CAST(SUM(c) AS BIGINT) AS n
           FROM cnt GROUP BY 1),
         dense AS (SELECT t.src, u.b, t.n,
             (COALESCE(c.c, 0) + 0.5) / (t.n + 0.5 * $b) AS p
           FROM tot t
           CROSS JOIN unnest(generate_series(0, $b - 1)) AS u(b)
           LEFT JOIN cnt c ON c.src = t.src AND c.b = u.b),
         pr AS (SELECT x.src AS src_a, y.src AS src_b,
             x.n AS n_a, y.n AS n_b, x.b,
             0.5 * (x.p * ln(2.0 * x.p / (x.p + y.p)) +
                    y.p * ln(2.0 * y.p / (x.p + y.p))) AS t
           FROM dense x JOIN dense y ON x.b = y.b AND x.src < y.src)
         SELECT src_a, src_b,
           CAST(MAX(n_a) AS BIGINT) AS n_a,
           CAST(MAX(n_b) AS BIGINT) AS n_b,
           round(list_reduce(list(t ORDER BY b), (a, x) -> a + x), 6)
             AS js_nats,
           round(list_reduce(list(t ORDER BY b), (a, x) -> a + x)
             / ln(2), 6) AS js_bits
         FROM pr GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    "t14_dsir_weights" ->
      s"""WITH tk AS (SELECT doc_id,
               source = '${graft.SparkEntry.t14Target}' AS is_t,
               string_split($normText, ' ') AS t
             FROM documents),
         bg AS (SELECT doc_id, is_t,
               CAST(concat('0x', substr(md5(t[i] || ' ' || t[i + 1]),
                 1, 15)) AS BIGINT) % ${graft.SparkEntry.t14Buckets} AS b
             FROM tk, unnest(generate_series(1, len(t) - 1)) AS u(i)
             WHERE len(t) >= 2),
         cnt AS (SELECT b,
               CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
               CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
             FROM bg GROUP BY 1),
         tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
                        CAST(SUM(cr) AS BIGINT) AS nr FROM cnt),
         w AS (SELECT b,
               ln(((ct + 0.5) / (nt + 0.5 * ${graft.SparkEntry.t14Buckets}))
                / ((cr + 0.5) / (nr + 0.5 * ${graft.SparkEntry.t14Buckets})))
                 AS w
             FROM cnt, tot),
         sc AS (SELECT doc_id, COUNT(*) AS n_feats,
               round(CAST(SUM(w) AS DOUBLE), 6) AS logw
             FROM bg JOIN w USING (b) WHERE NOT is_t GROUP BY 1)
         SELECT d.doc_id,
           CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
           coalesce(sc.logw, 0.0) AS logw
         FROM documents d LEFT JOIN sc USING (doc_id)
         WHERE d.source != '${graft.SparkEntry.t14Target}'
         ORDER BY doc_id""",

    // p11 = p09's coin-exact expansion chained into p07's draw/rank
    // over the composite 'id:epoch' key.
    "p11_training_order" ->
      s"""WITH d AS (SELECT doc_id, source,
              CAST($wordCountSql AS BIGINT) AS n_tokens FROM documents),
         per AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS avail
                 FROM d GROUP BY source),
         tot AS (SELECT CAST(SUM(avail) AS BIGINT) AS budget FROM per),
         plan AS (SELECT source, avail,
             CAST(budget * ($budgetWeightSql) // ${
               graft.SparkEntry.p08Weights.values.sum} AS BIGINT) AS desired
           FROM per, tot),
         ex AS (SELECT d.doc_id,
             CAST(desired // avail AS BIGINT) +
               CASE WHEN CAST(concat('0x', substr(md5('${
                 graft.SparkEntry.p09Seed}' || CAST(doc_id AS VARCHAR)),
                   1, 15)) AS BIGINT) / 1152921504606846976.0
                 < CAST(desired - (desired // avail) * avail AS DOUBLE)
                   / avail
               THEN 1 ELSE 0 END AS copies
           FROM d JOIN plan ON d.source = plan.source),
         keyed AS (SELECT doc_id, CAST(ep AS BIGINT) AS epoch,
             CAST(doc_id AS VARCHAR) || ':' || CAST(ep AS VARCHAR) AS key
           FROM ex, unnest(generate_series(1, copies)) AS u(ep)
           WHERE copies >= 1),
         drawn AS (SELECT doc_id, epoch, key,
             CAST(concat('0x', substr(md5('${
               graft.SparkEntry.p11Seed}' || key), 1, 15)) AS BIGINT)
               AS draw
           FROM keyed)
         SELECT doc_id, epoch,
           CAST(draw % ${graft.SparkEntry.p11Shards} AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY draw % ${graft.SparkEntry.p11Shards}
             ORDER BY draw, key) AS INT) AS pos
         FROM drawn ORDER BY shard, pos""",

    "p07_shuffle_shard" ->
      s"""WITH d AS (SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('${
               graft.SparkEntry.p07Seed}', CAST(doc_id AS VARCHAR))),
               1, 15)) AS BIGINT) AS draw
           FROM documents)
         SELECT doc_id,
           CAST(draw % ${graft.SparkEntry.p07Shards} AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY draw % ${graft.SparkEntry.p07Shards}
             ORDER BY draw, doc_id) AS INT) AS pos
         FROM d ORDER BY doc_id""",

    "p06_group_sample" ->
      s"""WITH u AS (SELECT source, doc_id,
             CAST(concat('0x', substr(md5(concat('${
               graft.SparkEntry.p06Seed}', CAST(doc_id AS VARCHAR))),
               1, 15)) AS BIGINT) / 1152921504606846976.0 AS u
           FROM documents),
         r AS (SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                                  ORDER BY u, doc_id) AS rk
               FROM u)
         SELECT source, doc_id, CAST(rk AS INT) AS rank
         FROM r WHERE rk <= ${graft.SparkEntry.p06K}
         ORDER BY source, doc_id""",

    "t12_pii_redact" ->
      s"""WITH aug AS (SELECT doc_id, text ||
           CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id ||
             '@mail' || (doc_id % 7) || '.com' ELSE '' END ||
           CASE WHEN doc_id % 4 = 0 THEN ' from ' || (doc_id % 256) ||
             '.' || ((doc_id * 7) % 256) || '.' || ((doc_id * 13) % 256) ||
             '.' || ((doc_id * 29) % 256) ELSE '' END AS t
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '${graft.text.TextOps.EmailPattern}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t,
             '${graft.text.TextOps.Ipv4Pattern}')) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(t,
             '${graft.text.TextOps.EmailPattern}', '<EMAIL>', 'g'),
             '${graft.text.TextOps.Ipv4Pattern}', '<IP>', 'g'))
             AS clean_md5
         FROM aug ORDER BY doc_id""",

    "p05_chunk_windows" ->
      s"""WITH arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                        FROM documents),
         st AS (SELECT doc_id, arr, u.s AS s
                FROM arrs, unnest(generate_series(1,
                  greatest(len(arr) - 8, 1), 56)) AS u(s))
         SELECT doc_id,
           CAST((s - 1) // 56 AS BIGINT) AS chunk_idx,
           CAST(least(64, len(arr) - s + 1) AS BIGINT) AS n_tokens,
           md5(array_to_string(arr[s : s + 63], ' ')) AS chunk_md5
         FROM st ORDER BY doc_id, chunk_idx""",

    "m04_frame_sample" ->
      """WITH d AS (SELECT doc_id,
             CAST(6 + doc_id % 5 AS BIGINT) AS w,
             CAST(6 + doc_id % 3 AS BIGINT) AS h,
             CAST(2 + doc_id % 4 AS BIGINT) AS nf
           FROM documents),
         fr AS (SELECT doc_id, w, h, fs.f AS f
                FROM d, unnest(generate_series(0, nf - 1)) AS fs(f)
                WHERE f % 2 = 0),
         px AS (SELECT doc_id, w, h, f, xs.x AS x, ys.y AS y
                FROM fr,
                  unnest(generate_series(0, w - 1)) AS xs(x),
                  unnest(generate_series(0, h - 1)) AS ys(y))
         SELECT doc_id, f AS frame_idx, w AS width, h AS height,
           w * h AS n_pixels,
           round(CAST(SUM((doc_id + 11 * f + x + y) % 256) AS DOUBLE)
             / (w * h), 6) AS mean_px
         FROM px GROUP BY doc_id, f, w, h ORDER BY doc_id, frame_idx""",

    "m05_video_frames" ->
      """WITH d AS (SELECT doc_id,
             CAST(5 + doc_id % 6 AS BIGINT) AS w,
             CAST(5 + doc_id % 4 AS BIGINT) AS h,
             CAST(2 + doc_id % 3 AS BIGINT) AS nf
           FROM documents),
         fr AS (SELECT doc_id, w, h, fs.f AS f
                FROM d, unnest(generate_series(0, nf - 1)) AS fs(f)
                WHERE f % 2 = 0),
         px AS (SELECT doc_id, w, h, f, xs.x AS x, ys.y AS y
                FROM fr,
                  unnest(generate_series(0, w - 1)) AS xs(x),
                  unnest(generate_series(0, h - 1)) AS ys(y))
         SELECT doc_id, f AS frame_idx, w AS width, h AS height,
           w * h AS n_pixels,
           round(CAST(SUM((doc_id + 17 * f + x + y) % 256) AS DOUBLE)
             / (w * h), 6) AS mean_r,
           round(CAST(SUM((doc_id + 17 * f + 2 * x + y) % 256) AS DOUBLE)
             / (w * h), 6) AS mean_g,
           round(CAST(SUM((doc_id + 17 * f + x + 2 * y) % 256) AS DOUBLE)
             / (w * h), 6) AS mean_b
         FROM px GROUP BY doc_id, f, w, h ORDER BY doc_id, frame_idx""",

    // Scene-cut frames: solid-color closed-form frames (no modular wrap
    // by construction), deltas on the exact integer SUM scale — pure
    // integer arithmetic end to end.
    "m10_scene_cuts" ->
      """WITH d AS (SELECT doc_id,
             CAST(3 + doc_id % 5 AS BIGINT) AS w,
             CAST(3 + doc_id % 4 AS BIGINT) AS h,
             CAST(4 + doc_id % 3 AS BIGINT) AS nf
           FROM documents),
         fr AS (SELECT doc_id, w, h, fs.f AS f,
             20 + (11 * doc_id) % 100 + 5 * (f % 8)
               + CASE WHEN (doc_id + f) % 4 = 0 THEN 100 ELSE 0 END AS r,
             10 + (13 * doc_id) % 100 + 3 * (f % 8)
               + CASE WHEN (doc_id + f) % 4 = 0 THEN 110 ELSE 0 END AS g,
             5 + (17 * doc_id) % 100 + 7 * (f % 8)
               + CASE WHEN (doc_id + f) % 4 = 0 THEN 90 ELSE 0 END AS b
           FROM d, unnest(generate_series(0, nf - 1)) AS fs(f))
         SELECT cur.doc_id, cur.f AS frame_idx, cur.w * cur.h AS n_pixels,
           cur.w * cur.h * abs(cur.r - pre.r) AS d_r,
           cur.w * cur.h * abs(cur.g - pre.g) AS d_g,
           cur.w * cur.h * abs(cur.b - pre.b) AS d_b,
           CAST(CASE WHEN cur.w * cur.h *
               (abs(cur.r - pre.r) + abs(cur.g - pre.g) + abs(cur.b - pre.b))
               > 64 * cur.w * cur.h THEN 1 ELSE 0 END AS INT) AS is_cut
         FROM fr cur JOIN fr pre
           ON cur.doc_id = pre.doc_id AND cur.f = pre.f + 1
         ORDER BY cur.doc_id, frame_idx""",

    // MP4 Motion-JPEG frames: frame set/dims/n_pixels are arithmetic
    // closed forms of doc_id; the DECODED color of each uniform JPEG
    // frame comes from the gate's exported 20-row round-trip palette
    // dict (JPEG's lossy shift is deterministic but not SQL-derivable;
    // Mp4Spec pins dict probe == executor decode at every fixture dim).
    // A demux bug (sample offsets/sizes/stsc runs) corrupts the JPEG
    // bytes and breaks the decoded-sum hash.
    "m13_mp4_frames" ->
      s"""WITH d AS (SELECT doc_id,
             CAST(11 + doc_id % 6 AS BIGINT) AS w,
             CAST(9 + doc_id % 5 AS BIGINT) AS h,
             CAST(3 + doc_id % 4 AS BIGINT) AS nf
           FROM documents),
         dict AS (SELECT c, dr, dg, db
                  FROM read_parquet(${modelGlob("m13", "jpeg_dict")})),
         fr AS (SELECT doc_id, w, h, fs.f AS f,
                  (doc_id + 3 * fs.f) % 20 AS c
                FROM d, unnest(generate_series(0, nf - 1)) AS fs(f))
         SELECT fr.doc_id, fr.f AS frame_idx, fr.w AS width,
           fr.h AS height, fr.w * fr.h AS n_pixels,
           dict.dr * fr.w * fr.h AS sum_r,
           dict.dg * fr.w * fr.h AS sum_g,
           dict.db * fr.w * fr.h AS sum_b
         FROM fr JOIN dict ON fr.c = dict.c
         ORDER BY fr.doc_id, frame_idx""",

    // Matroska Motion-JPEG frames: m13's discipline over the EBML
    // container — frame set/dims/n_pixels arithmetic, decoded colors
    // via the gate's own exported round-trip palette dict.
    "m14_mkv_frames" ->
      s"""WITH d AS (SELECT doc_id,
             CAST(10 + doc_id % 7 AS BIGINT) AS w,
             CAST(8 + doc_id % 6 AS BIGINT) AS h,
             CAST(2 + doc_id % 5 AS BIGINT) AS nf
           FROM documents),
         dict AS (SELECT c, dr, dg, db
                  FROM read_parquet(${modelGlob("m14", "jpeg_dict")})),
         fr AS (SELECT doc_id, w, h, fs.f AS f,
                  (2 * doc_id + 5 * fs.f) % 20 AS c
                FROM d, unnest(generate_series(0, nf - 1)) AS fs(f))
         SELECT fr.doc_id, fr.f AS frame_idx, fr.w AS width,
           fr.h AS height, fr.w * fr.h AS n_pixels,
           dict.dr * fr.w * fr.h AS sum_r,
           dict.dg * fr.w * fr.h AS sum_g,
           dict.db * fr.w * fr.h AS sum_b
         FROM fr JOIN dict ON fr.c = dict.c
         ORDER BY fr.doc_id, frame_idx""",

    // Quota admission replicated as a window cumsum: admit while the
    // PRIOR admitted-token total is under quota (the crossing doc is
    // still taken) — exactly the stream's greedy rule on a one-shot
    // doc_id-ordered replay.
    "st07_quota_admit" ->
      s"""WITH d AS (SELECT doc_id, source,
              CAST($wordCountSql AS BIGINT) AS n_tokens FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
             COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY source
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS prior
           FROM d)
         SELECT doc_id, source, n_tokens FROM c
         WHERE prior < ${graft.SparkEntry.st07Quota}
         ORDER BY source, doc_id""",

    "st01_stream_window" ->
      s"""SELECT date_diff('second', $epoch1970,
           date_trunc('hour', $tsUs)) AS hour_sec,
         event_type, COUNT(*) AS n,
         ${decSum("value")} AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour_sec, event_type""",

    "st02_monitor" ->
      s"""SELECT user_id, event_id, ${sec(tsUs)} AS ts_sec
         FROM events WHERE event_type = 'error'
         QUALIFY row_number() OVER (PARTITION BY user_id
           ORDER BY $tsUs ASC, event_id ASC) = 1
         ORDER BY user_id""",

    "st03_incr_dedup_stream" ->
      s"""SELECT MIN(doc_id) AS doc_id, fp FROM
         (SELECT doc_id, md5($normText) AS fp FROM documents)
         GROUP BY fp ORDER BY doc_id""",

    "st04_contamination_stream" ->
      s"""WITH arrs AS (SELECT doc_id, string_split($normText, ' ') AS arr
                        FROM documents),
         pos AS (SELECT doc_id, i, array_to_string(arr[i:i+2], ' ') AS g
                 FROM arrs,
                   unnest(generate_series(1, greatest(len(arr) - 2, 1)))
                   AS u(i)),
         tg AS (SELECT DISTINCT g FROM pos WHERE doc_id % 10 <> 0)
         SELECT doc_id, CAST(i AS BIGINT) AS pos, g FROM pos
         WHERE doc_id % 10 = 0 AND g IN (SELECT g FROM tg)
         ORDER BY doc_id, pos"""
  )

  /** Quality score (mirrors TextOps.qualityScore): length, word-length,
    * and stopword-ratio terms, identical double arithmetic both engines. */
  private lazy val qualitySql: String = {
    val chars = "CAST(length(text) AS DOUBLE)"
    val words = s"CAST(${wordCountSql} AS DOUBLE)"
    val avgWordLen = s"($chars / $words)"
    val stopRatio = s"(CAST(${langScore("en")} AS DOUBLE) / $words)"
    val lengthTerm =
      s"""(CASE WHEN $chars >= 200 AND $chars <= 2000 THEN 1.0
          WHEN $chars < 200 THEN $chars / 200.0
          ELSE 2000.0 / $chars END)"""
    val wordLenTerm =
      s"""(CASE WHEN $avgWordLen >= 3.0 AND $avgWordLen <= 10.0
          THEN 1.0 ELSE 0.5 END)"""
    s"""($lengthTerm * 0.5 + $wordLenTerm * 0.3 +
        least($stopRatio * 2.0, 1.0) * 0.2)"""
  }

  /** Whitespace token count over normalized text (mirrors
    * TextOps.wordCount): spaces + 1 via length arithmetic. */
  private lazy val wordCountSql: String =
    s"CAST((length($normText) - " +
      s"length(replace($normText, ' ', '')) + 1) AS BIGINT)"
}
