package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TopK, Vectors}

/** Product quantization (PQ) — the vector-COMPRESSION scale path next to
  * the candidate-REDUCTION paths (banded LSH [[Knn.lshKnn]], inverted
  * files [[Ivf.ivfKnn]]): split each d-dim vector into `m` subspaces of
  * d/m dims, learn an independent `ksub`-centroid codebook per subspace
  * (one grouped L2 k-means — [[Ivf.fitCentroidsWithin]] with the L2
  * metric, all subspaces fit simultaneously as keyed aggregates), and
  * store each vector as `m` small codes. A scan then reads m bytes-ish
  * per vector instead of 4·d — at 100 TB of embeddings that is the
  * difference between scanning the corpus and scanning a 32× smaller
  * code table, and the asymmetric-distance (ADC) score is `m` array
  * lookups per candidate instead of a d-element dot product.
  *
  * Semantics: ADC approximates the INNER PRODUCT dot(probe, v) ≈
  * Σ_s lut[s][code_s], where lut[s][c] = dot(probe_s, centroid[s][c]) —
  * on unit-normalized embeddings this is cosine. Everything is
  * deterministic (lowest-id seeds, fixed iterations, ascending-index
  * double accumulation) and distributed: the per-probe lookup table is
  * built by a broadcast join against the m·ksub codebook rows — never a
  * driver-side collect — and scoring is pure whole-stage-codegen array
  * arithmetic (no explode, no per-pair shuffle; ranking is the bounded
  * [[TopK]] heap).
  *
  * Knob guidance (standard PQ practice): dsub = d/m of 4-16 dims; ksub
  * = 16 at gate scale, 256 (one byte per code) in production, with
  * fitFraction chosen so the fit sample has ≥ ksub rows per subspace.
  */
object Pq {

  /** L2 assignment score: argmin ‖v−c‖² = argmax (v·c − ‖c‖²/2). The
    * codebooks quantize SUBvectors, which are not unit vectors even when
    * the full embeddings are — cosine assignment would ignore their
    * magnitude, so PQ fits with the standard L2 rule. */
  private[sim] val l2Score: (Column, Column) => Column =
    (v, c) => Vectors.dot(v, c) - Vectors.dot(c, c) / lit(2.0)

  /** One row per (vector, subspace): `sub` ∈ [0, m), `id` = vec_id·m +
    * sub (the unique Long row id the grouped k-means seed heap needs —
    * requires vec ids ≥ 0), `v` = that subspace's slice. A vector whose
    * length is not divisible by m fails LOUDLY per row (silently
    * truncating the tail dims would be the silent-loss class). */
  private def subVectors(corpus: DataFrame, m: Int): DataFrame =
    corpus
      .select(
        // the id*m+sub packing decodes with `div`, which truncates
        // toward zero — a negative id would fold its subvectors into
        // its neighbor's group, and an id past (Long.MaxValue-(m-1))/m
        // would overflow the multiply and (m being even) wrap
        // NON-injectively, two vectors silently sharing packed row ids;
        // both corrupt codes SILENTLY, so the documented preconditions
        // are enforced as loudly as the length-divisibility guard below
        when(col("id") >= 0 && col("id") <= (Long.MaxValue - (m - 1)) / m,
            col("id"))
          .otherwise(raise_error(concat(
            lit(s"PQ: vector ids must be in [0, ${(Long.MaxValue - (m - 1)) / m}], got "),
            col("id"))))
          .as("id"),
        col("v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("sub"), (col("id") * m + col("sub")).as("id"),
        when(size(col("v")) % m === 0,
          slice(col("v"), col("sub") * (size(col("v")) / m) + 1,
            size(col("v")) / m))
          .otherwise(raise_error(concat(lit(
            s"PQ: vector length not divisible by m=$m for id "),
            col("id"))))
          .as("v"))

  /** PQ codebooks: (sub, code ∈ [0, ksub), centroid). One independent
    * L2 k-means per subspace, run simultaneously as keyed aggregates;
    * k-means cluster labels (seed row ids) are densified to codes via
    * per-sub sorted label arrays — `array_position` on a ksub-element
    * array, no window. A subspace can end with fewer than ksub codes
    * (empty cells drop out, standard k-means), which only shrinks the
    * codebook. */
  def fitCodebooks(emb: DataFrame, idCol: String, vecCol: String,
                   m: Int, ksub: Int, iters: Int = 3,
                   fitFraction: Double = 1.0): DataFrame = {
    val corpus = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val fit =
      if (fitFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, fitFraction, seed = 42L)
    // r19: the exploded subvector frame feeds the seed heap plus every
    // fit iteration — lazily checkpoint so the scan+explode runs once,
    // not once per consumer (memory is bounded by the FIT sample, which
    // production keeps small via fitFraction).
    val sv = subVectors(fit, m).localCheckpoint(eager = false)
    val raw = Ivf.fitCentroidsWithin(sv, "sub", ksub,
      iters, score = l2Score,
      // m*ksub centroids of d/m floats always fit a broadcast; a keyed
      // join on `sub` would cap shuffle parallelism at m distinct keys
      hintBroadcast = true)
    val labels = raw.groupBy("sub")
      .agg(array_sort(collect_list(col("cluster"))).as("labels"))
    raw.join(labels, Seq("sub"))
      .select(col("sub"),
        (array_position(col("labels"), col("cluster")) - 1).cast("int")
          .as("code"),
        col("centroid"))
  }

  /** Encode the corpus: (id, codes) with `codes(s)` = the L2-nearest
    * code of subspace s — the m-byte representation an ADC scan reads
    * instead of the full vector.
    *
    * r19: fully ROW-LOCAL ([[admitStateless]]'s shape): one projection
    * against the broadcast one-row nested codebooks — per sub an
    * argmax of the SAME l2Score with the SAME ties-to-lowest-code rule
    * the join formulation's max_by applied (array_max over
    * struct(score, -code, code) — NaN-high included, so row-identical
    * for EVERY input, AssignEquivalenceSpec). The old shape
    * ([[encodeViaJoin]]) exploded the corpus ×m, joined ×ksub, and
    * re-aggregated BY ID TWICE (argmax + code assembly) — two
    * corpus-sized exchanges per encode that this form deletes
    * outright. Codes index the densified per-sub arrays (contiguous
    * from 0, [[fitCodebooks]]), so array position == code. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             codebooks: DataFrame, m: Int): DataFrame = {
    val v = col("v")
    val dsub = size(v) / m
    val codesExpr = transform(sequence(lit(0), lit(m - 1)), s => {
      val sub = slice(v, s * dsub + 1, dsub)
      val cbs = element_at(col("cb"), (s + 1).cast("int"))
      array_max(zip_with(cbs, sequence(lit(0), size(cbs) - 1),
        (c, i) => struct(l2Score(sub, c).as("s"), (-i).as("n"),
          i.as("i"))))
        .getField("i").cast("int")
    })
    emb
      .select(col(idCol).as("id"),
        // the same loud guard as [[subVectors]]: a vector length not
        // divisible by m must fail, not silently truncate tail dims
        when(size(col(vecCol)) % m === 0, col(vecCol))
          .otherwise(raise_error(concat(
            lit(s"PQ: vector length not divisible by m=$m for id "),
            col(idCol)))).as("v"))
      .crossJoin(broadcast(nestedCodebooks(codebooks)))
      .select(col("id"), codesExpr.as("codes"))
  }

  /** The pre-r19 join formulation of [[encode]] — the reference
    * implementation for the equivalence spec and A/B probes. (Its
    * [[subVectors]] id-packing additionally REQUIRES ids in
    * [0, (Long.Max-(m-1))/m]; the row-local form has no packing and no
    * such bound.) */
  private[graft] def encodeViaJoin(emb: DataFrame, idCol: String,
                                   vecCol: String, codebooks: DataFrame,
                                   m: Int): DataFrame =
    Ivf.assignWithinViaJoin(
        subVectors(emb.select(col(idCol).as("id"), col(vecCol).as("v")), m),
        "sub",
        // broadcast for the same reason as the fit: tiny codebook, few
        // distinct join keys
        broadcast(codebooks.select(col("sub"), col("code").as("cluster"),
          col("centroid"))),
        score = l2Score)
      .select(expr(s"id div $m").as("id"), col("sub"),
        col("cluster").as("code"))
      .groupBy("id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        e => e.getField("code")).as("codes"))

  /** One-row nested form of a codebook frame — cb(sub)(code) = centroid
    * (codes are contiguous from 0 within each sub by [[fitCodebooks]]'
    * densification, so array index == code) — checkpointed for broadcast
    * into the row-local admission path. */
  private def nestedCodebooks(codebooks: DataFrame): DataFrame =
    codebooks.groupBy("sub")
      .agg(transform(
        array_sort(collect_list(struct(col("code"), col("centroid")))),
        e => e.getField("centroid")).as("subCb"))
      .groupBy()
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("subCb")))),
        e => e.getField("subCb")).as("cb"))
      .localCheckpoint(eager = false)

  /** Fully ROW-LOCAL admission of vectors into an IVFADC index:
    * (id, cluster, codes) computed in ONE projection per row against
    * broadcast one-row nested model frames — no shuffle, no groupBy, no
    * state anywhere on the feed path, so the same frame runs unchanged
    * on a `readStream` feed (st05's continuous-ingestion gate: the
    * stream-static class reduced to a pure broadcast projection; at
    * production this IS the admission job that keeps an ANN index
    * current). Codes match [[encode]] and cluster matches
    * [[Ivf.assign]] bit-for-bit on finite scores (same score
    * expressions; ties break to the lowest code/cluster via min-struct
    * over (-score, id) — spec-pinned; rows whose scores are all NaN —
    * zero-norm vectors under cosine — may pick a different cell than
    * the join path's max_by, which sorts NaN high). The per-sub score
    * array is built ONCE per row (zip_with into (score, index)
    * structs — no repeated lambda subexpression; codegen CSE does not
    * reach inside lambdas). */
  def admitStateless(emb: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame, codebooks: DataFrame,
                     m: Int): DataFrame = {
    val nestedCents = centroids
      .groupBy()
      .agg(array_sort(collect_list(struct(col("cluster"), col("centroid"))))
        .as("cents"))
      .localCheckpoint(eager = false)
    val v = col("v")
    val dsub = size(v) / m
    val codesExpr = transform(sequence(lit(0), lit(m - 1)), s => {
      val sub = slice(v, s * dsub + 1, dsub)
      val cbs = element_at(col("cb"), (s + 1).cast("int"))
      array_min(zip_with(cbs, sequence(lit(0), size(cbs) - 1),
        (c, i) => struct((-l2Score(sub, c)).as("s"), i.as("i"))))
        .getField("i").cast("int")
    })
    val clusterExpr = array_min(transform(col("cents"), e =>
      struct((-Vectors.cosine(v, e.getField("centroid"))).as("s"),
        e.getField("cluster").as("i")))).getField("i")
    emb
      .select(col(idCol).as("id"),
        // the same loud guard as [[subVectors]]: a vector length not
        // divisible by m must fail, not silently truncate tail dims
        when(size(col(vecCol)) % m === 0, col(vecCol))
          .otherwise(raise_error(concat(
            lit(s"PQ: vector length not divisible by m=$m for id "),
            col(idCol)))).as("v"))
      .crossJoin(broadcast(nestedCodebooks(codebooks)))
      .crossJoin(broadcast(nestedCents))
      .select(col("id"), clusterExpr.as("cluster"), codesExpr.as("codes"))
  }

  /** ADC top-k over the encoded corpus with exact REFINE: every probe's
    * m·ksub lookup table is built once by a broadcast join with the
    * codebooks; each candidate then scores as m `element_at` lookups
    * inside whole-stage codegen, the ADC pass keeps a `refine`·k
    * shortlist per probe (bounded TopK heap), and the shortlist alone —
    * narrow (probe_id, id) pairs — is re-joined to the full vectors for
    * an EXACT inner-product re-rank (the standard ADC+refine pipeline:
    * quantization error decides only which candidates make the
    * shortlist, never their final order). The probe set is
    * caller-bounded and streamed against the CODE table (the
    * [[Knn.knnBrute]] contract made 4·d/m× cheaper to read and O(m) to
    * score; compose with IVF cells when candidate REDUCTION is also
    * needed); the refine join touches |probes|·refine·k full vectors —
    * negligible at any scale. Ties break toward the lower id. Returns
    * (probe_id, neighbor_id, rank). */
  def pqKnn(emb: DataFrame, idCol: String, vecCol: String,
            probeFilter: Column, k: Int, m: Int, ksub: Int,
            iters: Int = 3, fitFraction: Double = 1.0,
            refine: Int = 4): DataFrame = {
    // validate before the eager k-means fit, not after it
    require(refine >= 1, s"refine=$refine must be >= 1")
    val codebooks = fitCodebooks(emb, idCol, vecCol, m, ksub, iters,
      fitFraction)
    val codes = encode(emb, idCol, vecCol, codebooks, m)
    pqKnnFromModel(emb, idCol, vecCol, codebooks, codes, probeFilter, k,
      m, refine)
  }

  /** [[pqKnn]]'s fit-once / apply-many form: the codebooks (typically
    * [[ModelStore.load]]ed) and an already-encoded code table come from
    * the caller, so a production deployment fits once, persists, encodes
    * arriving batches incrementally ([[encode]] against the same
    * codebooks — row-local, so incremental and full encodes agree
    * bit-for-bit), and queries against the union of code batches without
    * ever refitting. Same plan shape, determinism, and tie-break rules
    * as [[pqKnn]] — identical results for codes produced by the same
    * codebooks (PqSpec pins it). */
  def pqKnnFromModel(emb: DataFrame, idCol: String, vecCol: String,
                     codebooks: DataFrame, codes: DataFrame,
                     probeFilter: Column, k: Int, m: Int,
                     refine: Int = 4): DataFrame = {
    require(refine >= 1, s"refine=$refine must be >= 1")
    val probes = emb.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("v_p"))
    val cands = codes.crossJoin(broadcast(probeLuts(probes, codebooks, m)))
    adcShortlistRefine(emb, idCol, vecCol, probes, cands, k, m, refine)
  }

  /** Per-probe nested lookup tables — lut(sub)(code) — instead of a
    * flat sub·ksub+code array: a subspace that converged below ksub
    * codes would leave GAPS in flat slot space and silently misalign
    * every later subspace's entries, while per-sub arrays stay dense by
    * construction (the array_position densification makes codes
    * contiguous from 0 within each sub). Scoring is two O(1)
    * element_at lookups. Returns (probe_id, lut). */
  private def probeLuts(probes: DataFrame, codebooks: DataFrame,
                        m: Int): DataFrame = {
    // r19: the whole per-probe table is ONE row-local projection over
    // the broadcast nested codebooks (code-ordered by construction, so
    // entry order matches the old array_sort-by-code assembly and the
    // dot is the identical slice/centroid expression) — the old shape
    // exploded probes ×(m·ksub) and re-aggregated per probe twice.
    val v = col("v_p")
    val dsub = size(v) / m
    probes
      .crossJoin(broadcast(nestedCodebooks(codebooks)))
      .select(col("probe_id"),
        zip_with(col("cb"), sequence(lit(0), size(col("cb")) - 1),
          (subCb, s) => transform(subCb, c =>
            Vectors.dot(slice(v, s * dsub + 1, dsub), c))).as("lut"))
  }

  /** The shared ADC tail: score candidates (probe_id, id, codes, lut)
    * with m codegen'd lookups, keep a refine·k shortlist per probe, and
    * exactly re-rank the shortlist on true vectors restored by a
    * narrow-id join (the id-only-through-the-shuffle discipline).
    * Quantization error can only cost shortlist MEMBERSHIP, never final
    * order. */
  private def adcShortlistRefine(emb: DataFrame, idCol: String,
                                 vecCol: String, probes: DataFrame,
                                 cands: DataFrame, k: Int, m: Int,
                                 refine: Int): DataFrame = {
    // both per-probe aggregates below (refine·k shortlist, then final k)
    // have probe-scaled group domains — guarantee OHA hash-aggregation
    // headroom budgeted for the LARGER (refine·k) heap (r19; see
    // OhaHeadroom.ensureSmallBuffer)
    graft.util.OhaHeadroom.ensureSmallBuffer(cands.sparkSession,
      graft.functions.TopK.heapBytes(refine * k))
    val scored = cands
      .select(col("probe_id"), col("id"),
        aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
            (c, s) => element_at(
              element_at(col("lut"), (s + 1).cast("int")),
              (c + 1).cast("int"))),
          lit(0.0), (acc, x) => acc + x).as("score"))
      .filter(col("probe_id") =!= col("id"))
    val shortlist = scored.groupBy("probe_id")
      .agg(TopK.topKByScore(col("score"), col("id"), refine * k).as("nn"))
      .select(col("probe_id"), explode(col("nn.id")).as("id"))
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    shortlist
      .join(vecs, Seq("id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("id"),
        Vectors.dot(col("v_p"), col("v")).as("s"))
      .groupBy("probe_id")
      .agg(TopK.topKByScore(col("s"), col("id"), k).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "nn")))
      .select(col("probe_id"), col("nn.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVFADC — the full composition (FAISS's deployment shape): IVF
    * coarse cells bound the CANDIDATE set (each probe scans its nprobe
    * nearest cells, [[Ivf.ivfKnn]]'s selection), PQ codes make each
    * candidate O(m) to score and the code table 4·d/m× smaller to read,
    * and the refine·k shortlist is exactly re-ranked. The cell
    * assignment travels as a narrow (id, cluster) pair joined to the
    * codes once; per-probe work is (n/c)·nprobe lookups of m adds.
    * Same determinism and tie-break rules as [[pqKnn]]. Returns
    * (probe_id, neighbor_id, rank). */
  def ivfPqKnn(emb: DataFrame, idCol: String, vecCol: String,
               probeFilter: Column, k: Int, c: Int, nprobe: Int,
               m: Int, ksub: Int, iters: Int = 3,
               fitFraction: Double = 1.0, refine: Int = 4): DataFrame = {
    // validate before the eager k-means fits, not after them
    require(refine >= 1, s"refine=$refine must be >= 1")
    val corpus = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    // fitFraction bounds BOTH k-means fits (IVF centroids here, PQ
    // codebooks below via fitCodebooks): fitting on a bounded sample is
    // what keeps total fit work sub-linear at scale — assignment of the
    // FULL corpus stays exact and linear regardless. The r11 octave
    // probe measured the full-corpus fit (fitFraction=1) going
    // super-linear exactly as the n·c cost model predicts (c = √n ⇒
    // n^1.5); the sampled fit is the standard deployment recipe
    // (bounded points-per-centroid, FAISS-style).
    val fitCorpus =
      if (fitFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, fitFraction, seed = 42L)
    // seeds from the FULL corpus (Ivf.ivfKnn's rule): the fit starts
    // from exactly c centroids even when the approximate-size sample
    // yields fewer than c rows — a sample-seeded fit would silently
    // open with fewer cells than requested
    val centroids = Ivf.fitCentroids(fitCorpus, c, iters,
      seedCorpus = Some(corpus))
    val cells = Ivf.assign(corpus, centroids)
      .select(col("id"), col("cluster"))
    val codebooks = fitCodebooks(emb, idCol, vecCol, m, ksub, iters,
      fitFraction)
    val codes = encode(emb, idCol, vecCol, codebooks, m)
      .join(cells, Seq("id"))
    ivfPqKnnFromModel(emb, idCol, vecCol, centroids, codebooks, codes,
      probeFilter, k, nprobe, m, refine)
  }

  /** [[ivfPqKnn]]'s fit-once / apply-many form — the full production
    * IVFADC lifecycle: coarse centroids and PQ codebooks (typically
    * [[ModelStore.load]]ed) plus the celled code table
    * ((id, codes, cluster) — [[encode]] joined with [[Ivf.assign]]'s
    * narrow (id, cluster) pairs, both incrementally appendable per
    * arriving batch) come from the caller. Both model applications are
    * row-local given the frames, so batch-at-a-time encode/assign agrees
    * bit-for-bit with a one-shot pass, and querying never refits. */
  /** IVFADC past the single-level envelope — [[ivfPqKnn]] with the
    * coarse level built by [[Ivf.twoLevelCells]] (assignment
    * n·(c1+c2)·d flops instead of n·(c1·c2)·d — the same n^1.5 term
    * retired from [[Ivf.ivfKnnAuto]] in r18, here for the PQ family)
    * and probed with [[Ivf.ivfKnnTwoLevel]]'s inverted-multi-index
    * shape (nprobe1 coarse × nprobe2 fine each). The code table keys
    * on the composite (coarse, cluster) cell and the candidate join
    * still broadcasts the bounded probe side, so the corpus-sized
    * codes never shuffle ([[ivfPqKnnFromModel]]'s discipline). With
    * c1 = 1, nprobe1 = 1, nprobe2 = nprobe this is row-identical to
    * [[ivfPqKnn]](c = c2, nprobe) — spec-pinned, like its plain-IVF
    * sibling. */
  def ivfPqKnnTwoLevel(emb: DataFrame, idCol: String, vecCol: String,
                       probeFilter: Column, k: Int,
                       c1: Int, c2: Int, nprobe1: Int, nprobe2: Int,
                       m: Int, ksub: Int, iters: Int = 3,
                       fitFraction: Double = 1.0,
                       refine: Int = 4): DataFrame = {
    require(refine >= 1, s"refine=$refine must be >= 1")
    val corpus = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val (coarseCentroids, fineAll, cellsRaw) =
      Ivf.twoLevelCells(corpus, c1, c2, iters, fitFraction)
    val cells = cellsRaw.select(col("id"), col("coarse"), col("cluster"))
    val codebooks = fitCodebooks(emb, idCol, vecCol, m, ksub, iters,
      fitFraction)
    val codes = encode(emb, idCol, vecCol, codebooks, m)
      .join(cells, Seq("id"))
    val probes = emb.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("v_p"))
    // r19: both probe-side selections are row-local Ivf.topCells
    // projections (TopK's exact NaN-excluding semantics) — no ×c row
    // explosion, no per-probe re-aggregation shuffles.
    val probeCoarse = probes
      .crossJoin(broadcast(Ivf.nestedCentroids(coarseCentroids)))
      .select(col("probe_id"), col("v_p"),
        explode(Ivf.topCells(col("v_p"), col("cents"), nprobe1))
          .as("coarse"))
    // fine-cell selection meets only the probe's own coarse cells'
    // fine centroids (as ONE nested row each) via the coarse-keyed
    // equi-join — the total fine count never broadcasts
    // (Ivf.ivfKnnTwoLevel's probe shape)
    val probeFine = probeCoarse
      .join(Ivf.nestedCentroidsBy(fineAll, "coarse"), Seq("coarse"))
      .select(col("probe_id"), col("coarse"),
        explode(Ivf.topCells(col("v_p"), col("cents"), nprobe2))
          .as("cluster"))
      .join(broadcast(probeLuts(probes, codebooks, m)), Seq("probe_id"))
    val cands = codes.join(broadcast(probeFine), Seq("coarse", "cluster"))
    adcShortlistRefine(emb, idCol, vecCol, probes, cands, k, m, refine)
  }

  def ivfPqKnnFromModel(emb: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame, codebooks: DataFrame,
                        codes: DataFrame, probeFilter: Column, k: Int,
                        nprobe: Int, m: Int, refine: Int = 4): DataFrame = {
    require(refine >= 1, s"refine=$refine must be >= 1")
    val probes = emb.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("v_p"))
    // nprobe nearest cells per probe (cosine against the broadcast
    // nested centroid row — Ivf.ivfKnn's selection, r19 row-local:
    // Ivf.topCells, TopK's exact NaN-excluding semantics), then the
    // candidate set is an equi-join on the cell key.
    val probeCells = probes
      .crossJoin(broadcast(Ivf.nestedCentroids(centroids)))
      .select(col("probe_id"),
        explode(Ivf.topCells(col("v_p"), col("cents"), nprobe))
          .as("cluster"))
      .join(broadcast(probeLuts(probes, codebooks, m)), Seq("probe_id"))
    // broadcast the bounded probe side so the corpus-sized code table
    // never shuffles (a keyed join on `cluster` would also cap
    // parallelism at c distinct keys)
    val cands = codes.join(broadcast(probeCells), Seq("cluster"))
    adcShortlistRefine(emb, idCol, vecCol, probes, cands, k, m, refine)
  }
}
