package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TopK, Vectors}

/** IVF (inverted-file) approximate nearest neighbors: the second scale
  * path next to banded LSH ([[Knn.lshKnn]]).
  *
  * A small spherical k-means (fixed iterations, deterministic init)
  * partitions the corpus into `c` cells; a probe scans only its `nprobe`
  * nearest cells. Everything is DataFrame ops: centroids are c rows
  * (broadcast), assignment is a broadcast join + `max_by` aggregate, cell
  * membership is the shuffle key, and ranking is the bounded top-k
  * aggregate — so at 100 TB the corpus is hashed once per iteration plus
  * once for assignment, and query cost is |probes| × (corpus/c) × nprobe
  * with no window functions and no driver-side loops. With nprobe = c the
  * result equals brute force (recall knob, like L in LSH).
  */
object Ivf {

  /** One-row nested form of a centroid frame — `cents` =
    * array<struct<cluster,centroid>> sorted by cluster id — broadcast
    * into the row-local assignment/probe projections below. Lazily
    * checkpointed: every consumer broadcast-builds it, and without
    * materialization each build would re-execute the centroid lineage
    * (a whole k-means fit). An EMPTY centroid frame nests to ZERO rows
    * (the global aggregate's 1-row empty array is filtered), preserving
    * the join formulation's semantics: no centroids, no assignments. */
  private[graft] def nestedCentroids(centroids: DataFrame): DataFrame =
    centroids.groupBy()
      .agg(array_sort(collect_list(struct(col("cluster"), col("centroid"))))
        .as("cents"))
      .where(size(col("cents")) > 0)
      .localCheckpoint(eager = false)

  /** Per-group nested form — (groupCol, cents) with one sorted
    * array<struct<cluster,centroid>> per group, for the grouped
    * assignment/probe equi-joins. A group with no centroids has no row
    * (the inner-join drop semantics documented on [[assignWithin]]). */
  private[graft] def nestedCentroidsBy(centroids: DataFrame,
                                       groupCol: String): DataFrame =
    centroids.groupBy(groupCol)
      .agg(array_sort(collect_list(struct(col("cluster"), col("centroid"))))
        .as("cents"))
      .localCheckpoint(eager = false)

  /** Row-local argmax-by-score cluster pick over a nested centroid
    * array — EXACTLY the join formulation's
    * `max_by(cluster, struct(score, -cluster))` rule, NaN-sorts-high
    * included: array_max over struct(score, -cluster, cluster). Same
    * score expression, same ties-to-lowest-cluster, same result for
    * EVERY input (AssignEquivalenceSpec pins it row-for-row), but as a
    * single projection: no ×c row explosion, no per-id re-aggregation
    * shuffle. */
  private[graft] def bestCluster(v: Column, cents: Column,
      score: (Column, Column) => Column): Column =
    array_max(transform(cents, e =>
      struct(score(v, e.getField("centroid")).as("s"),
        (-e.getField("cluster")).as("n"),
        e.getField("cluster").as("i"))))
      .getField("i")

  /** Row-local probe-side cell selection — the bounded-TopK path's
    * exact semantics ([[graft.functions.TopKByScore]]: best `nprobe` by
    * (score desc, cluster asc), NaN scores EXCLUDED) as one projection:
    * filter NaN, sort by (-score, cluster), slice, project the ids. */
  private[graft] def topCells(v: Column, cents: Column, nprobe: Int,
      score: (Column, Column) => Column = Vectors.cosine): Column =
    slice(array_sort(filter(transform(cents, e =>
        struct((-score(v, e.getField("centroid"))).as("s"),
          e.getField("cluster").as("i"))),
      p => !isnan(p.getField("s")))), 1, nprobe)
      .getField("i")

  /** The fit-mean step shared by [[fitCentroids]] and
    * [[fitCentroidsWithin]]: per `keys` group, the per-position mean of
    * the `v` vectors as array<float>. r19: ONE grouped pass via the
    * [[graft.functions.VectorAvg]] typed aggregate — the exploded
    * formulation ([[meanByClusterViaExplode]], kept as the reference
    * implementation for MeanStepEquivalenceSpec) generated n·d rows and
    * paid two hash aggregates with two exchanges PER ITERATION; the
    * aggregate's per-position double arithmetic is avg(x)'s exactly
    * (same row-order accumulation, same null skipping, same count-0 →
    * null element), and the `size > 0` filter reproduces the exploded
    * shape's dropping of a group whose every vector is NULL or empty. */
  private[graft] def meanByCluster(assigned: DataFrame,
                                   keys: Seq[String]): DataFrame =
    assigned.groupBy(keys.map(col): _*)
      .agg(graft.functions.VectorAgg.vectorAvg(col("v")).as("m"))
      .where(size(col("m")) > 0)
      .select(keys.map(col) :+
        transform(col("m"), e => e.cast("float")).as("centroid"): _*)

  /** The pre-r19 exploded formulation of [[meanByCluster]] — reference
    * implementation for the equivalence spec. */
  private[graft] def meanByClusterViaExplode(assigned: DataFrame,
                                             keys: Seq[String]): DataFrame =
    assigned
      .select(keys.map(col) :+
        posexplode(col("v")).as(Seq("pos", "x")): _*)
      .groupBy((keys :+ "pos").map(col): _*)
      .agg(avg(col("x")).as("m"))
      .groupBy(keys.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m").cast("float")).as("centroid"))

  /** Deterministic spherical k-means: init = the `c` lowest-id vectors of
    * `seedCorpus` (default: the fit corpus itself; the seed's id doubles as
    * the cluster key — cluster ids are keys, not ordinals, so no
    * window/ordinal assignment is ever needed), `iters` assign/mean rounds
    * over `corpus`. A cell no sample vector maps to drops out of later
    * rounds, as in standard k-means. Returns (cluster, centroid) with
    * centroid as array<float>. */
  def fitCentroids(corpus: DataFrame, c: Int, iters: Int,
                   seedCorpus: Option[DataFrame] = None,
                   initCentroids: Option[DataFrame] = None): DataFrame = {
    // localCheckpoint each round: the centroids frame is c rows but its
    // lineage after i rounds is i nested corpus scans, and it feeds the next
    // round plus (after the loop) two consumers — without materialization
    // every consumer re-executes the whole k-means chain.
    var centroids = initCentroids.getOrElse(
        seedCorpus.getOrElse(corpus).orderBy("id").limit(c)
          .select(col("id").as("cluster"), col("v").as("centroid")))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = assign(corpus, centroids)
      centroids = meanByCluster(assigned, Seq("cluster"))
        .localCheckpoint()
    }
    centroids
  }

  /** Nearest-centroid assignment: broadcast the c centroids AS ONE
    * NESTED ROW and pick the best cell per row in a single row-local
    * projection ([[bestCluster]] — max cosine, ties → lowest cluster
    * id, the same max_by rule as [[assignViaJoin]], pinned
    * row-identical by AssignEquivalenceSpec). r19: the previous join
    * formulation ([[assignViaJoin]]) exploded every row ×c and then
    * re-aggregated by id — a full corpus-sized exchange per call (and
    * per k-means ITERATION) that carried the vectors; this form has no
    * shuffle at all, so an assignment pass is exactly one scan at any
    * scale (guide §2.4: remove shuffles outright). */
  def assign(df: DataFrame, centroids: DataFrame): DataFrame =
    df.crossJoin(broadcast(nestedCentroids(centroids)))
      .select(col("id"), col("v"),
        bestCluster(col("v"), col("cents"), Vectors.cosine).as("cluster"))

  /** The pre-r19 join formulation of [[assign]] — kept as the reference
    * implementation for the equivalence spec and A/B probes. */
  private[graft] def assignViaJoin(df: DataFrame,
                                   centroids: DataFrame): DataFrame =
    df.crossJoin(broadcast(centroids))
      .select(col("id"), col("v"), col("cluster"),
        Vectors.cosine(col("v"), col("centroid")).as("cos"))
      .groupBy("id")
      .agg(first(col("v")).as("v"),
        max_by(col("cluster"), struct(col("cos"), -col("cluster")))
          .as("cluster"))

  /** [[assign]]'s grouped sibling: `centroids` carries a group key next
    * to (cluster, centroid), and each row of `df` (already carrying its
    * own `groupCol`) meets ONLY its group's centroids — the match is an
    * equi-join on the key, never a broadcast, so the TOTAL centroid
    * count can exceed any broadcast cap; only the per-group count needs
    * to stay modest. This is the assignment primitive of the two-level
    * (coarse-then-fine) paths: per-row distance work is the group's
    * centroid count, and the join's shuffle key doubles as the coarse
    * cell, which downstream per-cell operators reuse.
    *
    * A `df` row whose group has no centroid row is DROPPED by the inner
    * join — callers needing full coverage must guarantee every occupied
    * group keeps at least one centroid (see
    * [[graft.dedup.Dedup.semanticDedupTwoLevel]]'s fallback union). */
  /** r19: like [[assign]], the grouped form is row-local past the
    * equi-join — each df row meets its group's centroids as ONE nested
    * array row (c2 centroids in one cell, not c2 joined rows), so the
    * join's output is n rows instead of n·c2 and the per-id
    * re-aggregation shuffle is gone; the only exchange left is the
    * group-keyed join itself (absent when `hintBroadcast`).
    * `hintBroadcast` replaces the callers' broadcast() wrapping (a hint
    * on the raw centroid frame would not survive the nesting
    * aggregate): set it when the caller KNOWS the total centroid count
    * is broadcast-small — e.g. PQ codebooks, m·ksub ≤ a few thousand
    * rows — decisive when groupCol has FEW distinct values (PQ's m
    * subspaces would cap shuffle parallelism at m). */
  def assignWithin(df: DataFrame, groupCol: String,
                   centroids: DataFrame,
                   score: (Column, Column) => Column = Vectors.cosine,
                   hintBroadcast: Boolean = false)
      : DataFrame = {
    val nested = nestedCentroidsBy(centroids, groupCol)
    df.join(if (hintBroadcast) broadcast(nested) else nested, Seq(groupCol))
      .select(col("id"), col(groupCol), col("v"),
        bestCluster(col("v"), col("cents"), score).as("cluster"))
  }

  /** The pre-r19 join formulation of [[assignWithin]] — the reference
    * implementation for the equivalence spec and A/B probes. */
  private[graft] def assignWithinViaJoin(df: DataFrame, groupCol: String,
                   centroids: DataFrame,
                   score: (Column, Column) => Column = Vectors.cosine)
      : DataFrame =
    df.join(centroids, Seq(groupCol))
      .select(col(groupCol), col("id"), col("v"), col("cluster"),
        score(col("v"), col("centroid")).as("cos"))
      .groupBy("id")
      .agg(first(col(groupCol)).as(groupCol),
        first(col("v")).as("v"),
        max_by(col("cluster"), struct(col("cos"), -col("cluster")))
          .as("cluster"))

  /** Grouped deterministic spherical k-means: one independent
    * [[fitCentroids]]-style fit per value of `groupCol`, all run
    * simultaneously as keyed DataFrame aggregates — no per-group driver
    * loop, so a million coarse cells fit in the same handful of jobs as
    * one. Seeds are the `cPerGroup` LOWEST-id rows of each group of
    * `seedCorpus` (default: the fit corpus), selected with the bounded
    * top-k heap under a constant score — k-smallest-by-id exactly, no
    * window and no double-precision id round-trip. Iterations follow
    * [[fitCentroids]]: grouped assign ([[assignWithin]]), then a
    * per-(group, cluster) mean; a cell (or a whole group) with no fit
    * member drops out, as in standard k-means — coverage fallbacks are
    * the caller's concern, as documented on [[assignWithin]].
    * Returns (groupCol, cluster, centroid). */
  /** `hintBroadcast`: set when the caller KNOWS the total centroid
    * count (groups × cPerGroup) is broadcast-small — e.g. PQ codebooks,
    * m·ksub ≤ a few thousand rows. The grouped equi-join then becomes a
    * broadcast hash join instead of hash-partitioning the corpus by
    * `groupCol` — decisive when groupCol has FEW distinct values (PQ's
    * m subspaces would cap shuffle parallelism at m and sort-merge the
    * exploded corpus). Leave false when total centroids can exceed the
    * broadcast cap (the two-level semantic-dedup case this primitive
    * was built for). */
  def fitCentroidsWithin(corpus: DataFrame, groupCol: String,
                         cPerGroup: Int, iters: Int,
                         seedCorpus: Option[DataFrame] = None,
                         score: (Column, Column) => Column = Vectors.cosine,
                         hintBroadcast: Boolean = false)
      : DataFrame = {
    val seedIds = seedCorpus.getOrElse(corpus)
      .groupBy(groupCol)
      .agg(TopK.topKByScore(lit(0.0), col("id"), cPerGroup).as("s"))
      .select(col(groupCol), explode(col("s.id")).as("id"))
    var centroids = seedCorpus.getOrElse(corpus)
      .join(seedIds, Seq(groupCol, "id"))
      .select(col(groupCol), col("id").as("cluster"),
        col("v").as("centroid"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = assignWithin(corpus, groupCol, centroids, score,
        hintBroadcast)
      centroids = meanByCluster(assigned, Seq(groupCol, "cluster"))
        .localCheckpoint()
    }
    centroids
  }

  /** IVF top-k: probes scan their `nprobe` nearest cells; ranking among
    * candidates is exact cosine via the bounded top-k aggregate. Output
    * (probe_id, neighbor_id, rank) like [[Knn.bruteForceKnn]] (approximate:
    * may return < k rows per probe).
    *
    * @param fitFraction fraction of the corpus the k-means fit sees
    *                    (deterministic Bernoulli sample, seed 42). 1.0 fits
    *                    on everything; at 100 TB fit on a small sample —
    *                    cell quality needs only a representative sample,
    *                    and the full corpus is then assigned exactly once.
    *                    Seeding always draws from the FULL corpus, so the
    *                    fit starts from exactly `c` centroids even when the
    *                    (approximate-size) sample yields fewer than `c`
    *                    rows. */
  def ivfKnn(emb: DataFrame, idCol: String, vecCol: String,
             probeFilter: Column, k: Int,
             c: Int, nprobe: Int, iters: Int = 3,
             fitFraction: Double = 1.0): DataFrame = {
    val corpus = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val fitCorpus =
      if (fitFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, fitFraction, seed = 42L)
    val centroids = fitCentroids(fitCorpus, c, iters,
      seedCorpus = if (fitFraction >= 1.0) None else Some(corpus))
    ivfKnnFromCentroids(emb, idCol, vecCol, centroids, probeFilter, k,
      nprobe)
  }

  /** [[ivfKnn]]'s fit-once / apply-many form ([[graft.sim.Pq
    * .ivfPqKnnFromModel]]'s plain-IVF sibling): the coarse centroids
    * (typically [[ModelStore.load]]ed) come from the caller, assignment
    * and probe-cell selection run against them with no refit anywhere —
    * identical results to [[ivfKnn]] for centroids produced by the same
    * fit (the s03 gate's exported-model oracle rides exactly this
    * equality). */
  def ivfKnnFromCentroids(emb: DataFrame, idCol: String, vecCol: String,
                          centroids: DataFrame, probeFilter: Column,
                          k: Int, nprobe: Int): DataFrame = {
    val corpus = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val cells = assign(corpus, centroids)
      .select(col("id").as("neighbor_id"), col("v").as("v_c"), col("cluster"))
    // r19: probe-cell selection is one row-local projection against the
    // nested centroid row ([[topCells]] — the TopK aggregate's exact
    // NaN-excluding semantics) instead of a ×c crossJoin re-aggregated
    // per probe: no probe-side shuffle at all.
    val probeCells = emb.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("v_p"))
      .crossJoin(broadcast(nestedCentroids(centroids)))
      .select(col("probe_id"), col("v_p"),
        explode(topCells(col("v_p"), col("cents"), nprobe)).as("cluster"))
    val scored = probeCells.join(cells, Seq("cluster"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        Vectors.cosine(col("v_p"), col("v_c")).as("cos"))
    // Knn.rankTopK = the identical bounded top-k tail, plus the OHA
    // headroom guarantee for the probe-scaled group domain (r19)
    Knn.rankTopK(scored, k)
  }

  /** Two-level (coarse-then-fine) cell structure — the build half shared
    * by [[graft.dedup.Dedup.semanticDedupTwoLevel]] and [[ivfKnnTwoLevel]]:
    * fit `c1` coarse cells with the usual broadcast assignment, then fit
    * `c2` fine cells INSIDE each coarse cell simultaneously
    * ([[fitCentroidsWithin]]) and assign each row to a fine cell by
    * meeting only its own coarse cell's centroids via the coarse-keyed
    * equi-join — never a broadcast of all c1·c2 centroids, and never the
    * single-level n·(c1·c2)·d assignment flops: total assignment work is
    * n·(c1 + c2)·d (n^1.25 at c1 ≈ c2 ≈ n^0.25 vs single-level's n^1.5
    * at c = √n — the r17 octave's one measured super-linear build term).
    *
    * Fine seeds draw from the FULL corpus's coarse assignment, and a
    * coarse cell whose fine set vanishes (zero FIT rows landed in it)
    * falls back to the coarse centroid as its single fine cell — no
    * corpus row is ever silently lost to an uncovered group
    * ([[assignWithin]]'s inner-join caveat). With c1 = 1 this degenerates
    * exactly to [[fitCentroids]](c2) + [[assign]] (same seeds, same
    * iterations — the equivalence specs pin it for both consumers).
    *
    * Returns (coarseCentroids (cluster, centroid), fineCentroids
    * (coarse, cluster, centroid) incl. fallbacks, cells (id, v, coarse,
    * cluster)). Cell identity is the COMPOSITE (coarse, cluster) key:
    * fine cluster ids are seed-row ids (globally unique), but the
    * vanished-group fallback reuses the coarse id as the fine id, and
    * that id may elsewhere be a legitimate fine seed. */
  def twoLevelCells(corpus: DataFrame, c1: Int, c2: Int, iters: Int,
                    fitFraction: Double)
      : (DataFrame, DataFrame, DataFrame) = {
    val fitCorpus =
      if (fitFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, fitFraction, seed = 42L)
    val coarseCentroids = fitCentroids(fitCorpus, c1, iters,
      seedCorpus = if (fitFraction >= 1.0) None else Some(corpus))
    // Lazy checkpoint: the coarse assignment feeds fine seeding, fine
    // fitting (via the sample re-assignment below when sampling), the
    // fine assignment, and the caller's consumers — the iterative-frame
    // discipline, one level up.
    val coarseCells = assign(corpus, coarseCentroids)
      .select(col("id"), col("v"), col("cluster").as("coarse"))
      .localCheckpoint(eager = false)
    val fitCells =
      if (fitFraction >= 1.0) coarseCells
      else assign(fitCorpus, coarseCentroids)
        .select(col("id"), col("v"), col("cluster").as("coarse"))
        // every fine-fit iteration re-executes this frame's lineage
        // (the sample scan + n·fitFraction·c1·d cosine flops) without
        // materialization — same discipline as coarseCells above
        .localCheckpoint(eager = false)
    // Fine seeds come from the FULL corpus's assignment, so every
    // occupied coarse cell seeds its fine cells even when the fit
    // sample missed it entirely (the seedCorpus discipline, grouped).
    val fine = fitCentroidsWithin(fitCells, "coarse", c2, iters,
      seedCorpus = Some(coarseCells))
    val fallback = coarseCentroids
      .join(fine.select(col("coarse")).distinct(),
        coarseCentroids("cluster") === col("coarse"), "left_anti")
      .select(col("cluster").as("coarse"), col("cluster"), col("centroid"))
    // c1·c2 rows, two consumers in the IVF path (row assignment + the
    // probe-side fine-cell selection) — materialize once
    val fineAll = fine.union(fallback).localCheckpoint(eager = false)
    val cells = assignWithin(coarseCells, "coarse", fineAll)
      .select(col("id"), col("v"), col("coarse"), col("cluster"))
      .localCheckpoint(eager = false)
    (coarseCentroids, fineAll, cells)
  }

  /** Two-level IVF top-k — [[ivfKnn]] past the broadcast/assignment
    * envelope ([[twoLevelCells]] for the build shape): a probe first
    * picks its `nprobe1` nearest COARSE cells against the broadcast c1
    * coarse centroids, then its `nprobe2` nearest FINE cells inside EACH
    * of those via the coarse-keyed equi-join (the inverted-multi-index
    * probing shape: nprobe1·nprobe2 cells probed, per-probe centroid
    * work c1 + nprobe1·c2 instead of c1·c2), and only those cells'
    * members pay exact cosine — ranked by the bounded top-k aggregate
    * like every kNN in this file. With c1 = 1, nprobe1 = 1,
    * nprobe2 = nprobe this is row-identical to [[ivfKnn]](c = c2,
    * nprobe) (spec-pinned): one coarse cell holds everything and the
    * fine level IS the single level. */
  def ivfKnnTwoLevel(emb: DataFrame, idCol: String, vecCol: String,
                     probeFilter: Column, k: Int,
                     c1: Int, c2: Int, nprobe1: Int, nprobe2: Int,
                     iters: Int = 3, fitFraction: Double = 1.0)
      : DataFrame = {
    val corpus = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val (coarseCentroids, fineAll, cellsRaw) =
      twoLevelCells(corpus, c1, c2, iters, fitFraction)
    val cells = cellsRaw.select(col("coarse"), col("cluster"),
      col("id").as("neighbor_id"), col("v").as("v_c"))
    // r19: both probe-side selections are row-local [[topCells]]
    // projections (TopK's exact NaN-excluding semantics) — no ×c row
    // explosion, no per-probe re-aggregation shuffles.
    val probeCoarse = emb.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("v_p"))
      .crossJoin(broadcast(nestedCentroids(coarseCentroids)))
      .select(col("probe_id"), col("v_p"),
        explode(topCells(col("v_p"), col("cents"), nprobe1)).as("coarse"))
    // fine-cell selection: an equi-join on the coarse key — each probe
    // row meets only its own coarse cell's ~c2 fine centroids (as ONE
    // nested row), so the TOTAL fine count c1·c2 never needs to
    // broadcast (assignWithin's argument, probe-side).
    val probeFine = probeCoarse
      .join(nestedCentroidsBy(fineAll, "coarse"), Seq("coarse"))
      .select(col("probe_id"), col("v_p"), col("coarse"),
        explode(topCells(col("v_p"), col("cents"), nprobe2)).as("cluster"))
    val scored = probeFine.join(cells, Seq("coarse", "cluster"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        Vectors.cosine(col("v_p"), col("v_c")).as("cos"))
    // Knn.rankTopK = the identical bounded top-k tail, plus the OHA
    // headroom guarantee for the probe-scaled group domain (r19)
    Knn.rankTopK(scored, k)
  }

  /** [[ivfKnn]] with (c, nprobe) derived from corpus size
    * ([[CellKnobs]]: c ≈ √n, nprobe growing as √c anchored at the
    * gate's 4-of-16, so per-probe candidate work n/√c SHRINKS as a
    * fraction of the corpus — a constant-fraction nprobe would be
    * brute force / constant, see [[CellKnobs.nprobeFor]]) — the
    * deployment entry point at a new scale, [[Knn.lshKnnAuto]]'s IVF
    * sibling. Pass `corpusRows` when known; None counts once. At large
    * n also lower `fitFraction`: the k-means fit needs a sample, the
    * assignment pass is the only full-corpus scan. */
  /** Past [[CellKnobs.TwoLevelMinCells]] derived cells the auto path
    * switches to [[ivfKnnTwoLevel]] with the [[CellKnobs.coarseFineSplit]]
    * / [[CellKnobs.probeSplit]] knobs — assignment work drops from n·√n
    * to n·2·n^0.25 flops (the r17 octave's measured 2.2×-of-linear build
    * term), probed-cell count stays ≈ nprobe. */
  def ivfKnnAuto(emb: DataFrame, idCol: String, vecCol: String,
                 probeFilter: Column, k: Int,
                 corpusRows: Option[Long] = None,
                 probeScale: Double = 1.0, iters: Int = 3,
                 fitFraction: Double = 1.0): DataFrame = {
    val n = corpusRows.getOrElse(emb.count())
    val c = CellKnobs.cellsFor(n)
    // the fit sample must be able to populate every cell (empty cells
    // drop out of fitCentroids) — same guard as semanticDedupAuto
    require(n * math.min(1.0, fitFraction) >= c,
      s"fitFraction=$fitFraction samples ~${(n * fitFraction).toLong} " +
        s"rows but sqrt-rule c=$c cells need at least that many fit rows")
    val nprobe = CellKnobs.nprobeFor(c, probeScale)
    if (c >= CellKnobs.TwoLevelMinCells) {
      val (c1, c2) = CellKnobs.coarseFineSplit(c)
      val (np1, np2) = CellKnobs.probeSplit(nprobe)
      ivfKnnTwoLevel(emb, idCol, vecCol, probeFilter, k,
        c1 = c1, c2 = c2, nprobe1 = np1, nprobe2 = np2,
        iters = iters, fitFraction = fitFraction)
    } else
      ivfKnn(emb, idCol, vecCol, probeFilter, k,
        c = c, nprobe = nprobe,
        iters = iters, fitFraction = fitFraction)
  }

  /** k-means|| initialization (Bahmani et al. 2012, "Scalable
    * k-means++"): the distributed alternative to this file's
    * deterministic lowest-id seeding when init QUALITY matters — each of
    * `rounds` passes oversamples ~`lFactor`·c candidates with
    * probability proportional to each point's distance-to-nearest-center
    * cost, so candidates spread across the data's modes instead of
    * wherever the lowest ids happen to sit.
    *
    * Scale shape: every round is ONE corpus pass against a BROADCAST
    * candidate frame (bounded by rounds·l rows) plus a 1-row cost
    * total; the final reduction weights candidates by assignment counts
    * and keeps the top-c by weight (greedy weighted reduction — the
    * standard recluster step simplified, stated honestly). All sampling
    * coins are md5-derived ([[graft.pack.Pack.integerDraw]]'s 60-bit
    * convention), so the init is bit-reproducible across reruns and
    * partitionings. Returns (cluster, centroid) for
    * [[fitCentroids]]'s `initCentroids`. */
  def kmeansParallelInit(corpus: DataFrame, c: Int, rounds: Int = 4,
                         lFactor: Int = 2,
                         seed: String = "graft-kmpp"): DataFrame = {
    require(c >= 1 && rounds >= 1 && lFactor >= 1)
    val l = lFactor.toLong * c
    var cands = corpus.orderBy("id").limit(1)
      .select(col("id").as("cluster"), col("v").as("centroid"))
      .localCheckpoint()
    for (r <- 0 until rounds) {
      // r19: the per-row distance-to-nearest-center cost is one
      // row-local projection (array_max over the nested candidate row —
      // max is order-exact, so bit-identical to the old groupBy max),
      // lazily checkpointed because BOTH the cost total and the draw
      // consume it — the old shape re-executed the whole corpus×cands
      // pass for the second consumer.
      val scored = corpus.crossJoin(broadcast(nestedCentroids(
          cands.select(col("cluster"), col("centroid")))))
        .select(col("id"), col("v"),
          array_max(transform(col("cents"), e =>
            Vectors.cosine(col("v"), e.getField("centroid"))))
            .as("max_cos"))
        .withColumn("cost", lit(1.0) - col("max_cos"))
        .localCheckpoint(eager = false)
      // exact-decimal cost total: deterministic under any partitioning.
      // r19: rides into the draw as a broadcast 1-row scalar (computed
      // inside the same round job) instead of a per-round driver
      // action — the double it yields is the same
      // Decimal.toDouble the old head()-based literal carried, so the
      // draw compare is bit-identical; `tot <= 0 → no candidates` is
      // now the `tot > 0` conjunct of the filter.
      val tot = scored
        .agg(sum(round(col("cost"), 6).cast("decimal(28,6)"))
          .cast("double").as("tot"))
      val newCands = scored
        .crossJoin(broadcast(tot))
        .withColumn("u",
          graft.pack.Pack.integerDraw(s"$seed-$r", col("id"))
            .cast("double") / lit(1152921504606846976.0))
        .filter(col("tot") > 0 &&
          col("u") < lit(l.toDouble) * col("cost") / col("tot"))
        .select(col("id").as("cluster"), col("v").as("centroid"))
      cands = cands.union(newCands).dropDuplicates("cluster")
        .localCheckpoint()
    }
    val weights = assign(corpus, cands)
      .groupBy("cluster").agg(count(lit(1)).as("w"))
    val selected = cands.join(weights, Seq("cluster"), "left")
      .select(col("cluster"), col("centroid"),
        coalesce(col("w"), lit(0L)).as("w"))
      .orderBy(desc("w"), col("cluster")).limit(c)
      .select(col("cluster"), col("centroid"))
      .localCheckpoint()
    // loud, not silent: a duplicate-heavy or tiny corpus whose rounds
    // never accumulate c candidates must fail here, not fit fewer cells
    // downstream (the assignWithin coverage discipline)
    val got = selected.count()
    require(got == c,
      s"k-means|| accumulated only $got of $c requested centroids — " +
        "raise rounds/lFactor or lower c for this corpus")
    selected
  }
}
