package graft.pack

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus assembly — the last stages of a training-data pipeline, where a
  * curated corpus becomes the token stream actually fed to a trainer:
  * deterministic per-source mixture sampling, and concat-and-chunk packing
  * of documents into fixed-length training sequences.
  *
  * Both operators are pure column arithmetic over engine-portable
  * primitives (md5, window prefix sums), so the DuckDB oracle states the
  * exact same semantics and a hash mismatch means a real bug.
  */
object Pack {

  /** A deterministic uniform draw in [0, 1) from (seed, key): the first 15
    * hex chars of md5(seed ‖ key) read as a 60-bit integer over 2^60.
    * Per-row coin with no global state — the sampling decision for a doc
    * never changes as the corpus grows, reruns are reproducible across
    * engines (md5 and hex semantics are identical in Spark and DuckDB),
    * and changing the seed redraws every coin. */
  def uniformDraw(seed: String, key: Column): Column =
    conv(substring(md5(concat(lit(seed), key.cast("string"))), 1, 15),
      16, 10).cast("long").cast("double") /
      lit(1152921504606846976d) // 2^60

  /** The raw 60-bit integer draw behind [[uniformDraw]] — kept exact
    * (no double division) where the draw feeds ORDERING, so rank
    * comparisons are bit-identical across engines by construction
    * instead of relying on both engines rounding the quotient alike. */
  def integerDraw(seed: String, key: Column): Column =
    conv(substring(md5(concat(lit(seed), key.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Deterministic global training-order shuffle + shard assignment — the
    * "shuffle the corpus once, write N ordered shards" step between a
    * curated corpus and the trainer's data loader. Each row draws a
    * 60-bit [[integerDraw]] coin; its shard is `draw % nShards` and its
    * position is the rank of (draw, key) within the shard. Seeded, so the
    * order is reproducible across reruns and engines, and re-shuffling is
    * just a new seed.
    *
    * Scale shape: shard assignment is per-row hashing (zero shuffles);
    * position ranks WITHIN each shard — one exchange on the shard key
    * plus an in-partition sort, which is exactly the work the ordered
    * shard files require; never a global sort, no driver state. The
    * hash-uniform draw makes shard sizes even (no skew salting needed). */
  def shuffleShard(df: DataFrame, keyCol: Column, nShards: Int,
                   seed: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__draw"), col("id"))
    df.select(keyCol.as("id"), integerDraw(seed, keyCol).as("__draw"))
      .withColumn("shard", (col("__draw") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("id"), col("shard"), col("pos"))
  }

  /** Weighted mixture sampling: keep a row iff its [[uniformDraw]] falls
    * under its source's weight — the per-example hash-mod sampling of a
    * data-mixture pipeline (each source kept at an independent rate, e.g.
    * up-weighting curated sources and down-weighting crawl). Appends
    * `weight` (0.0 for sources absent from `weights`) and `kept` (0/1).
    *
    * The weight lookup is a literal CASE chain, not a join: mixtures have
    * tens of sources, and a chain keeps the whole decision a scalar
    * expression in the scan stage — `.filter(col("kept") === 1)` reaches
    * the parquet scan with zero shuffles. */
  def mixtureFlags(docs: DataFrame, sourceCol: Column, keyCol: Column,
                   weights: Map[String, Double], seed: String): DataFrame = {
    val w = weights.toSeq.sortBy(_._1)
      .foldRight(lit(0.0)) { case ((s, wt), acc) =>
        when(sourceCol === s, lit(wt)).otherwise(acc)
      }
    docs.withColumn("weight", w)
      .withColumn("kept",
        (uniformDraw(seed, keyCol) < col("weight")).cast("int"))
  }

  /** Deterministic stratified split assignment: ONE [[uniformDraw]] coin
    * per row, compared against the cumulative split fractions — the
    * train/val/test labeling of a dataset build. Stable under corpus
    * growth (a doc's label never changes when other docs arrive),
    * reproducible across engines, and a pure scalar CASE in the scan
    * stage — zero shuffles, zero state. The last split absorbs any
    * remaining mass so fractions need not sum to exactly 1. */
  def splitAssign(keyCol: Column, splits: Seq[(String, Double)],
                  seed: String): Column = {
    require(splits.nonEmpty)
    val u = uniformDraw(seed, keyCol)
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.init.zip(bounds.init)
      .foldRight(lit(splits.last._1): Column) { case (((name, _), b), acc) =>
        when(u < b, lit(name)).otherwise(acc)
      }
  }

  /** [[mixtureFlags]], filtered to the kept rows. */
  def mixtureSample(docs: DataFrame, sourceCol: Column, keyCol: Column,
                    weights: Map[String, Double], seed: String): DataFrame =
    mixtureFlags(docs, sourceCol, keyCol, weights, seed)
      .filter(col("kept") === 1).drop("kept")

  /** Concat-and-chunk sequence packing — the standard pretraining packing:
    * documents are concatenated in a deterministic order and the token
    * stream is cut into fixed `seqLen`-token training sequences, documents
    * straddling cut points. Per doc: its packing bucket, token count,
    * token offset within the bucket's stream, and the first/last sequence
    * indexes it lands in (within-bucket; `(bucket, seq)` is the global
    * sequence id).
    *
    * Scale shape: the token stream is ordered WITHIN independent buckets
    * (`bucketCol`, e.g. `pmod(id, B)`), so the prefix sum is a window
    * partitioned by bucket — one shuffle on the bucket key, one in-memory
    * sort per bucket. B is the scale knob: tokens-per-bucket ≈ corpus/B,
    * so pick B to keep a bucket's rows inside one executor's sort budget
    * (at 100 TB, B in the tens of thousands; each bucket is a few GB and
    * sequences never cross buckets, which is also what keeps reshards
    * reproducible). A corpus-global order would serialize the cumsum
    * through one partition — that is the one shape this operator refuses. */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: Column,
                    bucketCol: Column, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    // The pass-through contract reserves the five output names: a caller
    // whose input already carries one would have it silently overwritten
    // by withColumn — fail loudly at the API boundary instead (the same
    // rule as ModelStore's shape check).
    val reserved =
      Seq("n_tokens", "bucket", "tok_offset", "seq_first", "seq_last")
    val clash = docs.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"packSequences reserves output columns ${reserved.mkString(", ")}; " +
        s"input already has: ${clash.toSeq.sorted.mkString(", ")} — " +
        "rename or drop them upstream")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // withColumn (not a projecting select): every input column RIDES
    // through the pack windows, so a pipeline stage downstream of other
    // per-doc evidence (p12's source/quality) needs no re-join — a
    // re-join would re-execute the whole upstream chain (measured 1.4x
    // on the p12 gate)
    docs.withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("bucket", bucketCol)
      .withColumn("tok_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_first", floor(col("tok_offset") / seqLen))
      .withColumn("seq_last",
        floor((col("tok_offset") + col("n_tokens") - lit(1)) / seqLen))
  }

  /** Deterministic k-per-group sample — the eval-set / few-shot-example
    * construction primitive: each group keeps the k rows with the LOWEST
    * [[uniformDraw]] coin (growth-stable: a kept row is only ever
    * displaced by a new row with a smaller coin, never by reordering;
    * same-seed reruns reproduce exactly, across engines). Ranking is the
    * bounded top-k aggregate on the negated coin ([[graft.functions
    * .TopKByScore]], id tiebreak) — map-side partials keep ≤ k rows per
    * group per partition, so no group's rows ever gather in one place:
    * t07's window-free shape, not a row_number window. */
  def sampleKPerGroup(df: DataFrame, groupCol: Column, keyCol: Column,
                      k: Int, seed: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // per-GROUP heap with a data-scaled group domain — guarantee OHA
    // hash-aggregation headroom (r19; see OhaHeadroom.ensureSmallBuffer)
    graft.util.OhaHeadroom.ensureSmallBuffer(df.sparkSession,
      graft.functions.TopK.heapBytes(k))
    df.select(groupCol.as("grp"), keyCol.as("id"),
        (-uniformDraw(seed, keyCol)).as("neg_u"))
      .groupBy("grp")
      .agg(graft.functions.TopK.topKByScore(col("neg_u"), col("id"), k)
        .as("kept"))
      .select(col("grp"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("grp"), col("kv.id").as("id"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Fixed-length sliding token windows with overlap — the per-document
    * context-window chunking that turns long documents into trainer-sized
    * pieces (the within-doc sibling of [[packSequences]]' cross-doc
    * concat-and-chunk). Chunk k starts at token 1 + k·(size − overlap);
    * starts run while ≤ len − overlap (so a final all-overlap chunk is
    * never emitted), every doc emits at least one chunk, and the last
    * chunk may be short. Entirely row-local — one explode off the
    * materialized token array, zero shuffles; at 100 TB this is scan
    * throughput, nothing else. */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap")
    val stride = chunkSize - overlap
    docs.select(col(idCol),
        graft.dedup.Dedup.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"), posexplode(
          expr(s"sequence(1, greatest(size(toks) - $overlap, 1), $stride)"))
        .as(Seq("k", "start")))
      .select(col(idCol),
        col("k").cast("long").as("chunk_idx"),
        least(lit(chunkSize), size(col("toks")) - col("start") + 1)
          .cast("long").as("n_tokens"),
        md5(concat_ws(" ", slice(col("toks"), col("start"), lit(chunkSize))))
          .as("chunk_md5"))
  }

  /** Boundary-respecting greedy packing — the OTHER standard packing
    * mode next to [[packSequences]]' concat-and-chunk: documents never
    * straddle a training sequence (the SFT/instruction-tuning
    * requirement, where an example split across sequences is corrupted).
    * Within each bucket, docs pack in doc_id order into capacity-L bins
    * sequentially: a doc joins the current bin iff it fits, else it
    * opens the next bin (a doc longer than L gets a bin alone and
    * overflows it — flagged by its offset 0 + length, never silently
    * truncated). Output per doc: its bucket, 1-based bin index within
    * the bucket, and token offset within the bin.
    *
    * Scale shape: one shuffle on the bucket key, then a per-bucket
    * sequential fold over the sorted docs (`flatMapGroups`) — the same
    * bucket-bounded memory discipline as packSequences' window sort
    * (tokens-per-bucket ≈ corpus/B; B is the scale knob). The fold is
    * inherently sequential PER BUCKET — greedy packing's bin state has
    * no prefix-sum form — which is exactly why the bucket decomposition
    * is the contract: the corpus-global variant would serialize through
    * one partition, and this operator refuses that shape. */
  def packNoStraddle(docs: DataFrame, idCol: String, tokensCol: Column,
                     bucketCol: Column, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        bucketCol.cast("long").as("bucket"),
        tokensCol.cast("long").as("n"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (bucket: Long, rows: Iterator[(Long, Long, Long)]) =>
        val sorted = rows.toVector.sortBy(_._1)
        var bin = 0L
        var used = capacity // forces the first doc to open bin 1
        sorted.iterator.map { case (id, _, n) =>
          if (used + n <= capacity) {
            val off = used; used += n; (id, bucket, bin, off)
          } else {
            bin += 1; used = n; (id, bucket, bin, 0L)
          }
        }
      }
      .toDF("doc_id", "bucket", "bin_idx", "offset")
  }

  /** Token-budget mixture plan (the Llama/Dolma-style data recipe step):
    * given integer target weights per source and a total token budget,
    * report per source how many tokens the recipe wants
    * (`desired_tokens = budget · w_s / Σw`, floor), how many one corpus
    * pass offers (`avail_tokens`), and the implied repeat factor
    * (`full_epochs` whole passes + `epochs` as the exact ratio) — the
    * numbers a trainer needs to decide up-/down-sampling before any doc
    * is touched. The budget here is the corpus' own token total
    * ("rebalance the same volume to the target mixture").
    *
    * Scale shape: ONE map-side-combined aggregate to |sources| keys,
    * then a 1-row totals zip (the t05 scalar class) — the corpus is
    * scanned once and never shuffled. All allocation arithmetic is
    * integer (weights are integers, divisions are `div`), so the plan is
    * bit-identical across engines; the single double (`epochs`) is one
    * division of two exact integers. */
  def tokenBudget(docs: DataFrame, sourceCol: Column, tokensCol: Column,
                  weights: Map[String, Int]): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val wsum = weights.values.sum
    require(wsum > 0, "at least one positive weight")
    val per = docs
      .select(sourceCol.as("source"), tokensCol.cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("avail_tokens"))
    val tot = per.agg(sum(col("avail_tokens")).as("budget"))
    per.crossJoin(broadcast(tot))
      .withColumn("w",
        coalesce(element_at(typedLit(weights), col("source")), lit(0))
          .cast("long"))
      .withColumn("desired_tokens", expr(s"budget * w div $wsum"))
      .withColumn("full_epochs", expr("desired_tokens div avail_tokens"))
      .withColumn("epochs",
        round(col("desired_tokens").cast("double") / col("avail_tokens"), 6))
      .select(col("source"), col("n_docs"), col("avail_tokens"),
        col("desired_tokens"), col("full_epochs"), col("epochs"))
  }

  /** Temperature-based mixture allocation — the multilingual/
    * multi-source up-weighting trick (mT5 §3.1 / XLM-R: sample source s
    * proportional to size^alpha, alpha < 1, so small sources are seen
    * more than their share and huge ones less): here alpha is FIXED at
    * 0.5 because sqrt is a correctly-rounded IEEE operation on every
    * engine, while a general pow is not — the whole output stays
    * bit-identical cross-engine (the e02 determinism discipline; a
    * caller wanting another alpha accepts pow's ulp risk explicitly).
    * Emits per source: token total, sqrt weight, normalized share, and
    * the floor token budget out of `totalBudget`.
    *
    * Exactness: the normalizer Z folds the sqrt weights in SOURCE-NAME
    * order inside one aggregate row (never an order-dependent double
    * sum), and each emitted double is the same operation chain the SQL
    * oracle runs — sqrt, one multiply, one divide, floor. Scale shape:
    * ONE map-side-combined aggregate to |sources| keys + a 1-row
    * totals zip (the t05 scalar class). */
  def temperatureMix(docs: DataFrame, sourceCol: Column,
                     tokensCol: Column, totalBudget: Long): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    val sizes = docs
      .select(sourceCol.as("source"), tokensCol.cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(sum(col("toks")).as("n_tokens"))
      .withColumn("weight", sqrt(col("n_tokens").cast("double")))
    val z = sizes.agg(
      aggregate(array_sort(collect_list(struct(col("source"),
          col("weight")))),
        lit(0.0), (a, x) => a + x("weight")).as("z"))
    sizes.crossJoin(broadcast(z))
      .select(col("source"), col("n_tokens"), col("weight"),
        (col("weight") / col("z")).as("share"),
        floor(lit(totalBudget.toDouble) * col("weight") / col("z"))
          .cast("long").as("budget_tokens"))
  }

  /** Materialize a [[tokenBudget]] plan into the actual epoch-expanded
    * training mix: every doc of source s appears `full_epochs(s)` times,
    * plus one extra copy with probability `remainder/avail` on a seeded
    * per-doc coin — so each source's realized token count is
    * `desired_tokens` in expectation, with only the fractional epoch
    * randomized (the standard up-/down-sampling materialization behind
    * Llama-style recipes). Output one row per (doc, epoch).
    *
    * Scale shape: the plan is the tokenBudget aggregate (|sources| rows)
    * broadcast back onto the corpus scan; the expansion itself is a
    * row-local seeded coin + sequence explode — no shuffle beyond the
    * plan's own fit aggregate, and the output is emitted directly at
    * scan parallelism. Determinism: the coin is [[uniformDraw]]'s
    * md5-derived double and the acceptance bound divides two exact
    * integers, so both sides of the comparison are bit-identical across
    * engines (the p02 gate convention). */
  def mixtureExpand(docs: DataFrame, sourceCol: Column, keyCol: Column,
                    tokensCol: Column, weights: Map[String, Int],
                    seed: String): DataFrame = {
    val plan = tokenBudget(docs, sourceCol, tokensCol, weights)
      .select(col("source"), col("avail_tokens"), col("desired_tokens"),
        col("full_epochs"))
    docs
      .select(sourceCol.as("source"), keyCol.as("id"),
        tokensCol.cast("long").as("n_tokens"))
      .join(broadcast(plan), Seq("source"))
      .withColumn("rem",
        col("desired_tokens") - col("full_epochs") * col("avail_tokens"))
      .withColumn("n_copies", col("full_epochs") +
        when(uniformDraw(seed, col("id")) <
            col("rem").cast("double") / col("avail_tokens"), 1L)
          .otherwise(0L))
      .select(col("source"), col("id"), col("n_tokens"),
        explode(when(col("n_copies") >= 1,
            sequence(lit(1L), col("n_copies")))
          .otherwise(expr("array()").cast("array<bigint>"))).as("epoch"))
  }
}
