package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable one-pass sketch profiling: HyperLogLog++ distinct counts and
  * GK-summary approximate quantiles — the bounded-memory way to profile a
  * 100 TB column where exact answers need a corpus-sized shuffle (exact
  * ndv) or corpus-proportional state (exact value buffering).
  *
  * Both sketches are partial-aggregate friendly: every partition reduces
  * to a fixed-size sketch buffer before the shuffle, and the merges are
  * commutative/associative (HLL merges by per-register max), so results
  * are deterministic under ANY partitioning. Estimates carry published
  * error bounds instead of a SQL-oracle equality — the driver-side audit
  * in tools/oracle_check.py recomputes the exact answers in DuckDB and
  * asserts each estimate sits inside its bound (the d02-soundness
  * discipline applied to sketches), and the specs pin the bounds plus
  * partitioning-invariance.
  */
object Sketches {

  /** Priority sampling (Duffield, Lund & Thorup 2007, "Priority
    * sampling for estimation of arbitrary subset sums"): a fixed-k
    * WEIGHTED sample with unbiased subset-sum estimates — the
    * principled way to subsample a 100 TB corpus by importance
    * (token counts, quality mass) and still answer "how much weight
    * does stratum X hold" without the full scan. Per item, priority
    * q = w / u with u a deterministic md5 uniform in (0, 1]
    * ([[graft.pack.Pack.integerDraw]]'s 60-bit coin, +1 over 2^60 —
    * the division by a power of two is exact, so u is bit-identical
    * across engines); the sample is the k largest priorities, the
    * threshold τ the (k+1)-th, and each sampled item's
    * Horvitz–Thompson estimate is max(w, τ) — Σ over any subset of
    * the sample unbiasedly estimates that subset's true weight.
    *
    * Scale shape: ONE map-side-combined bounded top-(k+1) aggregate
    * over the corpus (the TopKByScore heap — k+1 entries of state at
    * any size) plus one narrow k-row id join to restore weights (the
    * closure family's width-restoring join). Deterministic given md5,
    * so — like [[bottomKOverlap]] — the whole report carries a FULL
    * SQL oracle, total row included (est fold in doc-id order, the
    * dotD discipline; exact total as the decimal-sum anchor a 100 TB
    * run could keep, since it is one map-side long/decimal sum).
    *
    * Output: k `sample` rows (doc_id, w, q, est = max(w, τ)) and one
    * `total` row (doc_id = −1, w = exact Σw, q = τ, est = Σ est —
    * the estimator's answer for the whole population). When n ≤ k the
    * sample is the population, τ = 0 and every est = w exactly. */
  def prioritySample(df: DataFrame, idCol: Column, weightCol: Column,
      seed: String, k: Int): DataFrame = {
    import graft.functions.TopK
    require(k > 0, s"k must be positive: $k")
    val base = df.select(idCol.cast("long").as("id"),
      weightCol.cast("double").as("w"))
    val u = (graft.pack.Pack.integerDraw(seed, col("id")).cast("double")
      + lit(1.0)) / lit(1152921504606846976.0) // (v+1)/2^60 ∈ (0,1]
    val scored = base.select(col("id"), col("w"), (col("w") / u).as("q"))
    // one bounded aggregate row: best k+1 priorities + the exact total;
    // memoized (q46 discipline) so the sample and total branches both
    // read it without re-running the corpus aggregate
    val agg = scored.agg(
        TopK.topKByScore(col("q"), col("id"), k + 1).as("t"),
        sum(graft.util.dec(col("w"))).cast("double").as("exact_total"))
      .select(col("exact_total"),
        when(size(col("t")) > k,
          element_at(col("t"), k + 1).getField("score"))
          .otherwise(lit(0.0)).as("tau"),
        slice(col("t"), 1, k).as("s"))
      .localCheckpoint()
    val ids = agg.select(explode(col("s")).as("e"), col("tau"))
      .select(col("e").getField("id").as("id"),
        col("e").getField("score").as("q"), col("tau"))
    val sample = ids.join(base, "id")
      .select(lit("sample").as("kind"), col("id").as("doc_id"),
        col("w"), col("q"), greatest(col("w"), col("tau")).as("est"))
      .localCheckpoint()
    val total = sample.agg(
        aggregate(
          array_sort(collect_list(struct(col("doc_id"), col("est")))),
          lit(0.0), (a, x) => a + x("est")).as("est"))
      .crossJoin(agg.select(col("exact_total").as("w"),
        col("tau").as("q")))
      .select(lit("total").as("kind"), lit(-1L).as("doc_id"),
        col("w"), col("q"), col("est"))
    sample.unionByName(total)
  }

  /** Pairwise set-overlap profiling via KMV bottom-k sketches
    * (Beyer et al. 2007, "On Synopses for Distinct-Value Estimation"):
    * per group, the k lexicographically-smallest md5 hashes of the
    * group's DISTINCT elements form a fixed-size mergeable signature;
    * for every group pair the Jaccard estimate is
    * |{v ∈ K : v ∈ S_A ∩ S_B}| / |K| where K is the k smallest values
    * of S_A ∪ S_B — the standard KMV overlap estimator. The sketch is
    * the bounded [[graft.functions.TopKByScoreStr]] heap at constant
    * score (ties resolve by binary string order = hash order), so the
    * per-group state is k strings regardless of group size and the
    * aggregate is map-side combined.
    *
    * Output per (a, b) pair, a < b: exact distinct counts, exact
    * jaccard (the verifiable anchor — computed by an element-level
    * equi-join a 100 TB run DROPS, the distinctProfile discipline),
    * the KMV estimate, and k_used (= min(k, |S_A ∪ S_B|); when the
    * union fits the sketch the estimate is exact by construction).
    * Everything is deterministic given the hash, so unlike the
    * register sketches this one carries a FULL SQL oracle.
    *
    * Scale shape: ONE corpus scan feeding one dedup-by-hash aggregate
    * (map-side partial; the shuffle key is the 32-byte hash, never the
    * raw element), then everything — per-group distinct counts, the
    * bounded sketches AND the exact pair intersections — derives from
    * that already-deduped frame: no corpus-sized element self-join
    * exists anywhere in the plan. The pair join at the end is over the
    * |groups|-row sketch frames (row-local HOFs on ≤2k strings). */
  def bottomKOverlap(df: DataFrame, groupCol: Column, elemCol: Column,
      k: Int): DataFrame = {
    import graft.functions.TopK
    // per-group KMV heaps are k hash strings (tens of KB at k≈1024) —
    // the blanket Floor contract, same as mergeProfile (r19)
    graft.util.OhaHeadroom.ensure(df.sparkSession)
    // one scan + one shuffle: dedup elements across the corpus by hash,
    // collecting the set of groups each element occurs in
    val byElem = df.select(groupCol.as("g"), md5(elemCol).as("hv"))
      .groupBy("hv").agg(array_sort(collect_set(col("g"))).as("srcs"))
    val sk = byElem.select(explode(col("srcs")).as("g"), col("hv"))
      .groupBy("g").agg(
        count(lit(1)).as("nd"),
        transform(TopK.topKByScoreStr(lit(0.0), col("hv"), k),
          x => x.getField("id")).as("bk"))
    val a = sk.select(col("g").as("source_a"), col("nd").as("n_a"),
      col("bk").as("bka"))
    val b = sk.select(col("g").as("source_b"), col("nd").as("n_b"),
      col("bk").as("bkb"))
    // exact pair intersections from the SAME deduped frame: each shared
    // element contributes one row per unordered group pair holding it
    // (srcs is bounded by |groups|, so the pair expansion is row-local
    // and tiny; this replaces a corpus-sized element self-join)
    val pairStructs = flatten(transform(col("srcs"), (x, i) =>
      transform(slice(col("srcs"), i + lit(2), size(col("srcs"))), y =>
        struct(x.as("sa"), y.as("sb")))))
    val inter = byElem.filter(size(col("srcs")) >= 2)
      .select(explode(pairStructs).as("p"))
      .groupBy(col("p.sa").as("source_a"), col("p.sb").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    val merged = array_sort(array_distinct(concat(col("bka"), col("bkb"))))
    val kUsed = least(lit(k), size(merged))
    val estNum = size(filter(slice(merged, 1, k), v =>
      array_contains(col("bka"), v) && array_contains(col("bkb"), v)))
    a.join(b, col("source_a") < col("source_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        col("n_a"), col("n_b"),
        round(coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L))), 6)
          .as("exact_j"),
        round(estNum.cast("double") / kUsed, 6).as("est_j"),
        kUsed.cast("long").as("k_used"))
  }

  /** Per-group cardinality profile: exact row count, exact distinct count
    * (the verifiable anchor) and the HLL++ estimate at `rsd` relative
    * standard deviation, plus the realized relative error.
    *
    * At 100 TB the exact ndv column is the one you DROP — it is only
    * emitted here so the audit can prove the sketch column honest on
    * gate-sized corpora. The HLL path is one map-side-combined aggregate
    * with a fixed register array per (group, sketch). */
  def distinctProfile(df: DataFrame, groupCol: Column, keyCol: Column,
                      rsd: Double = 0.02): DataFrame =
    df.groupBy(groupCol.as("series"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(keyCol).as("ndv_exact"),
        approx_count_distinct(keyCol, rsd).as("ndv_hll"))
      .withColumn("rel_err",
        round(abs(col("ndv_hll") - col("ndv_exact")).cast("double") /
          col("ndv_exact").cast("double"), 6))
      // the published knob rides the output so the driver audit derives
      // its 5*rsd bound from the SAME value the sketch ran with — a
      // knob tweak can never leave the audit checking a stale constant
      .withColumn("rsd", lit(rsd))

  /** Mergeability contract for the Datasketches HLL distinct sketch —
    * THE property that makes sketched distinct usable at 100 TB:
    * per-sub-group (per-day, per-shard) sketches fold into the global
    * answer WITHOUT rescanning the base. Emits, per series: the
    * sub-group count, the estimate from merging the per-sub sketches
    * (`hll_union_agg`), and the estimate from one direct same-lgK
    * pass. The contract is that BOTH estimates carry the sketch's
    * published error bound — NOT that they are equal: measured on this
    * engine (BENCHLOG r15), the Datasketches union is order-sensitive
    * while sketches sit in sparse/coupon mode (a 13-vs-29-partition
    * re-shuffle moved a 1500-NDV estimate by ~1%), so a hard equality
    * or partitioning-invariance claim would be wrong by construction;
    * what survives any merge order is the accuracy envelope, which is
    * exactly what a daily→monthly rollup needs. The published `rsd`
    * (1.04/√2^lgK) rides the output so the containment audit derives
    * its bound from the knob the sketch ran with ([[distinctProfile]]'s
    * discipline). Both aggregation passes are map-side combined; the
    * final join is two |series|-row frames.
    *
    * Deployment note (measured, BENCHLOG r18 third decade): typed-buffer
    * aggregates run as ObjectHashAggregate, which falls back to
    * SORT-BASED aggregation past
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (default 128) distinct groups per task — this pass holds
    * |series|·|subs| groups, and past the default the fallback sorts
    * the whole corpus (2.2× wall at 100M rows). Since r19 the headroom
    * is a LIBRARY guarantee, not a harness conf:
    * [[graft.util.OhaHeadroom.ensure]] raises the session threshold to
    * its 4096 floor at call time (KB-sized sketch buffers — tens of MB
    * per task at the floor), so a consumer session with the Spark
    * default has no silent cliff; `spark.graft.ohaAutoRaise=false`
    * opts out and gets one loud warning instead. */
  def mergeProfile(df: DataFrame, groupCol: Column, subCol: Column,
                   keyCol: Column, lgK: Int = 12): DataFrame = {
    graft.util.OhaHeadroom.ensure(df.sparkSession)
    val rows = df.select(groupCol.as("series"), subCol.as("sub"),
      keyCol.as("k"))
    val perSub = rows.groupBy("series", "sub")
      .agg(expr(s"hll_sketch_agg(k, $lgK)").as("sk"))
    val merged = perSub.groupBy("series")
      .agg(count(lit(1)).as("n_subs"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("ndv_merged"))
    val direct = rows.groupBy("series")
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(k, $lgK))")
        .as("ndv_direct"))
    merged.join(direct, "series")
      .select(col("series"), col("n_subs"), col("ndv_merged"),
        col("ndv_direct"),
        round(lit(1.04) / sqrt(lit((1L << lgK).toDouble)), 6).as("rsd"))
  }

  /** AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996) with
    * its exact anchor: F2 = Σ_key count² — the self-join / join-size
    * estimate a query planner wants without shuffling every distinct
    * key. Each of `estimators` sketch lanes folds Σ sign_j(key) in one
    * map-side-combined pass (signs are md5-coin-derived ±1, so the
    * sketch is bit-reproducible across engines and partitionings —
    * UNLIKE HLL, this one the DuckDB oracle reproduces EXACTLY); the
    * estimate is the median of the squared lane sums.
    *
    * Output per group: exact F2 (the verifiable anchor, needing the
    * distinct-key aggregate a 100 TB run avoids), the AMS estimate, and
    * the relative error. Lanes explode 64× on the narrow (group, lane,
    * sign) projection before the map-side combine — integer-only until
    * the final division. */
  def amsF2(df: DataFrame, groupCol: Column, keyCol: Column,
            estimators: Int = 60, seed: String = "graft-ams")
      : DataFrame = {
    // one md5 draw per row; lane j's ±1 sign is bit j of the 60-bit
    // draw (64× less hashing than a per-lane draw, same independence)
    require(estimators >= 2 && estimators % 2 == 0 && estimators <= 60,
      s"estimators must be even, >= 2 and <= 60 (draw bits): $estimators")
    val lanes = df.select(groupCol.as("series"), keyCol.as("k"))
      .withColumn("draw", graft.pack.Pack.integerDraw(seed, col("k")))
      .select(col("series"), col("draw"),
        explode(sequence(lit(0), lit(estimators - 1))).as("j"))
      .withColumn("sign",
        lit(1L) - lit(2L) * (expr("shiftright(draw, j)") % 2L))
      .groupBy("series", "j")
      .agg(sum(col("sign")).as("s"))
      .withColumn("est", col("s") * col("s"))
    val sketch = lanes.groupBy("series")
      .agg(sort_array(collect_list(col("est"))).as("ests"))
      .select(col("series"),
        ((col("ests").getItem(estimators / 2 - 1) +
          col("ests").getItem(estimators / 2)).cast("double") / 2.0)
          .as("f2_ams"))
    val exact = df.select(groupCol.as("series"), keyCol.as("k"))
      .groupBy("series", "k").agg(count(lit(1)).as("n"))
      .groupBy("series")
      .agg(sum(col("n") * col("n")).as("f2_exact"))
    exact.join(sketch, Seq("series"))
      .select(col("series"), col("f2_exact"), col("f2_ams"),
        round(abs(col("f2_ams") - col("f2_exact").cast("double")) /
          col("f2_exact").cast("double"), 6).as("rel_err"))
  }

  private def cmsBucket(seed: String, width: Int)(row: Column,
                                                  tok: Column): Column =
    pmod(graft.pack.Pack.integerDraw(seed,
      concat_ws("|", row, tok)), lit(width.toLong))

  private def cmsTokens(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(split(
      trim(regexp_replace(lower(textCol), "[^a-z0-9]+", " ")),
      " ")).as("token"))

  /** The CMS table itself: depth × width integer cells as one exploded
    * map-side-combined count. Works identically on batch and STREAMING
    * frames (complete-mode unwindowed aggregation — the state store
    * holds the fixed cell grid, never tokens; st10's gate runs exactly
    * this on the streamed corpus and the counts equal the batch build
    * bit-for-bit because counting is order-insensitive). */
  def cmsCells(docs: DataFrame, textCol: Column, depth: Int = 4,
               width: Int = 1024, seed: String = "graft-cms")
      : DataFrame = {
    require(depth >= 1 && width >= 2)
    // the build parameters ride the cell column's METADATA so
    // cmsPointQuery can verify it probes with the same modulus/seed the
    // table was built with (survives memory-sink and parquet round
    // trips; the streaming state never sees it — metadata is plan-time)
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("cms.depth", depth.toLong)
      .putLong("cms.width", width.toLong)
      .putString("cms.seed", seed)
      .build()
    cmsTokens(docs, textCol)
      .select(col("token"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .groupBy(col("r"),
        cmsBucket(seed, width)(col("r"), col("token")).as("b"))
      .agg(count(lit(1)).as("cell", meta))
  }

  /** Point queries against a (possibly stream-built) CMS cell table:
    * the exact top-`k` tokens probe their depth cells, estimate = min.
    * `depth`/`width`/`seed` MUST equal the values `cells` was built
    * with — a mismatched modulus or seed probes the wrong buckets and
    * can silently break the one-sided guarantee. [[cmsCells]] stamps
    * its parameters into the `cell` column's metadata, and this end
    * REFUSES a mismatch loudly; a cells frame whose metadata was
    * stripped (hand-built, or a path that drops plan metadata) falls
    * back to the documented caller's contract.
    * Emits (token, freq_exact, freq_cms, overestimate). */
  def cmsPointQuery(cells: DataFrame, docs: DataFrame, textCol: Column,
                    k: Int = 25, depth: Int = 4, width: Int = 1024,
                    seed: String = "graft-cms"): DataFrame = {
    require(depth >= 1 && width >= 2 && k >= 1)
    val meta = cells.schema.find(_.name == "cell").map(_.metadata)
      .getOrElse(org.apache.spark.sql.types.Metadata.empty)
    if (meta.contains("cms.depth")) {
      val (bd, bw, bs) = (meta.getLong("cms.depth"),
        meta.getLong("cms.width"), meta.getString("cms.seed"))
      require(bd == depth && bw == width && bs == seed,
        s"cmsPointQuery(depth=$depth, width=$width, seed=$seed) against " +
          s"a cell table built with (depth=$bd, width=$bw, seed=$bs) — " +
          "mismatched parameters probe the wrong buckets and would " +
          "silently break the one-sided estimate >= true guarantee")
    }
    val toks = cmsTokens(docs, textCol)
    val top = toks.groupBy("token")
      .agg(count(lit(1)).as("freq_exact"))
      .orderBy(desc("freq_exact"), col("token")).limit(k)
    val probes = top
      .select(col("token"), col("freq_exact"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("b", cmsBucket(seed, width)(col("r"), col("token")))
    probes.join(cells, Seq("r", "b"))
      .groupBy("token")
      .agg(first(col("freq_exact")).as("freq_exact"),
        min(col("cell")).as("freq_cms"))
      .withColumn("overestimate", col("freq_cms") - col("freq_exact"))
      .orderBy(desc("freq_exact"), col("token"))
  }

  /** Count-min sketch (Cormode-Muthukrishnan 2005) point-query audit
    * over corpus tokens: the CMS table is `depth`·`width` integer cells
    * REGARDLESS of vocabulary size — the bounded-memory way to serve
    * "how often does token X appear" at 100 TB — and its one-sided
    * guarantee (estimate >= true, <= true + εN w.h.p.) is checked here
    * against exact counts for the exact top-`k` tokens.
    *
    * Buckets are md5-coin-derived per (sketch row, token), so the whole
    * table AND every estimate are bit-reproducible across engines and
    * partitionings: this sketch gets a FULL SQL oracle (k03's
    * discipline). Build = [[cmsCells]] (one exploded map-side-combined
    * count to depth·width keys); estimates = [[cmsPointQuery]] (min
    * over depth cells). Emits (token, freq_exact, freq_cms,
    * overestimate). */
  def cmsTopK(docs: DataFrame, textCol: Column, k: Int = 25,
              depth: Int = 4, width: Int = 1024,
              seed: String = "graft-cms"): DataFrame =
    cmsPointQuery(cmsCells(docs, textCol, depth, width, seed),
      docs, textCol, k, depth, width, seed)

  /** Per-group quantile profile via Spark's GK summaries
    * (`percentile_approx`): each returned value's RANK is within
    * n/`accuracy` of the target rank — the contract the driver audit
    * checks against exact DuckDB ranks. Bounded state per (group,
    * sketch) regardless of group size; never Spark's value-buffering
    * exact `percentile`.
    *
    * `percentile_approx` is a typed-buffer aggregate (the
    * ObjectHashAggregate class), so this path carries the same silent
    * sort-fallback cliff as [[mergeProfile]] past the session's
    * fallback threshold — [[graft.util.OhaHeadroom.ensure]] guards it
    * the same way. ([[distinctProfile]] needs no guard: HLL++ has a
    * fixed-width buffer and plans as HashAggregate.) */
  def quantileProfile(df: DataFrame, groupCol: Column, valCol: Column,
                      accuracy: Int = 10000): DataFrame = {
    graft.util.OhaHeadroom.ensure(df.sparkSession)
    val qs = percentile_approx(valCol,
      array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy))
    df.groupBy(groupCol.as("series"))
      .agg(count(valCol).as("n_rows"), qs.as("qs"))
      .select(col("series"), col("n_rows"),
        col("qs").getItem(0).as("p50"),
        col("qs").getItem(1).as("p90"),
        col("qs").getItem(2).as("p99"),
        // published knob rides the output (distinctProfile's rsd rule):
        // the audit's n/accuracy window derives from this column
        lit(accuracy).as("accuracy"))
  }
}
