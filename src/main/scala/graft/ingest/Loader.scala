package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Load/merge semantics of the kcidb database layer, Spark-first.
  *
  * kcidb loads are idempotent upserts with per-field merge:
  * `INSERT ... ON CONFLICT (id) DO UPDATE SET col = COALESCE(...)`
  * (/root/reference/kcidb/db/sql/schema.py:235-287) — i.e. for each non-key
  * field, a non-null incoming value overwrites only a null existing value
  * (or vice versa under `prio_db`), and metadata timestamps merge with MAX.
  *
  * Replaying a submission log through that upsert yields, per key: each
  * field's latest non-null value in submission order (load priority) or its
  * first non-null value (db priority), plus max timestamp. That replay is
  * exactly one groupBy of min/max-of-struct aggregates — one shuffle on the
  * key, map-side combined, no per-key sort, no driver loops — which is how
  * graft expresses it for 100 TB logs.
  */
object Loader {

  /** Collapse a submission log to merged records — kcidb load semantics.
    *
    * @param df        submission log
    * @param keys      identity columns (kcidb object id)
    * @param orderBy   submission order (deterministic: include a tiebreaker)
    * @param fields    non-key fields merged by COALESCE priority
    * @param prioDb    false (kcidb `prio_db=false`, the default load): the
    *                  LATEST non-null value per field wins; true: the
    *                  EARLIEST non-null wins (existing db value beats the
    *                  incoming load, schema.py:243-263)
    * @param maxFields fields merged with MAX instead of COALESCE — kcidb's
    *                  `conflict_func` for metadata timestamps
    *                  (schema.py:264-287)
    */
  def upsertMerge(
      df: DataFrame, keys: Seq[String],
      orderBy: Seq[Column], fields: Seq[String],
      prioDb: Boolean = false,
      maxFields: Seq[String] = Seq.empty): DataFrame = {
    // "Latest (earliest under prio_db) non-null value of f in submission
    // order" = max (min) over rows with f non-null of (orderBy…, f),
    // extracting f. ONE groupBy of plain min/max aggregates — fully
    // partial-aggregatable (map-side combine), no per-key sort, no window.
    val merged = fields.map { f =>
      val tagged = when(col(f).isNotNull,
        struct(orderBy :+ col(f).as("__v"): _*))
      (if (prioDb) min(tagged) else max(tagged)).getField("__v").as(f)
    } ++ maxFields.map(f => max(col(f)).as(f))
    df.groupBy(keys.map(col): _*).agg(merged.head, merged.tail: _*)
  }

  /** kcidb-merge (/root/reference/kcidb/__init__.py:452-471): union data
    * sets and drop exact duplicate objects. */
  def mergeDatasets(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_ unionByName _).distinct()

  /** Metadata-column convention (the reference's `metadata_expr` columns,
    * e.g. `_timestamp` — /root/reference/kcidb/db/sql/schema.py:37-64):
    * dump/query projections include metadata columns only when
    * `withMetadata` (format_dump, schema.py:288-340). The timestamp may
    * still DRIVE the window filter while being excluded from the output,
    * exactly as the reference filters on `_timestamp` it then strips. */
  private def stripMeta(df: DataFrame, metaCols: Seq[String],
                        withMetadata: Boolean): DataFrame =
    if (withMetadata || metaCols.isEmpty) df else df.drop(metaCols: _*)

  /** dump_iter's (after, until] window
    * (/root/reference/kcidb/db/abstract.py:192-244); `withMetadata` strips
    * the declared `metaCols` from the projection (abstract.py:192-244's
    * with_metadata flag). */
  def dumpWindow(df: DataFrame, tsCol: Column,
                 after: Column, until: Column,
                 metaCols: Seq[String] = Seq.empty,
                 withMetadata: Boolean = true): DataFrame =
    stripMeta(df.filter(tsCol > after && tsCol <= until),
      metaCols, withMetadata)

  /** purge(before) (/root/reference/kcidb/db/abstract.py:81-103): retain
    * only rows at/after the cutoff. */
  def purge(df: DataFrame, tsCol: Column, before: Column): DataFrame =
    df.filter(tsCol >= before)

  /** Batched dump — `dump_iter(objects_per_report=…)`
    * (/root/reference/kcidb/db/abstract.py:192-244) chunks the dump window
    * into transport-sized reports. The same chunking serves
    * `query_iter(…, objects_per_report=…)`: apply it to any result frame
    * (e.g. a [[graft.model.Catalog.closure]] output) with an always-true
    * window. Appends `batch_id` = global rank /
    * `batchSize` under the total order `orderKey` (pass a UNIQUE key — ties
    * would make batch membership nondeterministic).
    *
    * Scale shape: global ranking WITHOUT a single-partition window — the
    * orderBy is a range-partitioned sort; per-partition row counts fold
    * into exclusive prefix-sum offsets (a frame of #partitions rows —
    * bounded by cluster parallelism, not data — is the only thing a
    * window ever sees), and each row's global rank is its partition
    * offset + its intra-partition position. Each batch's rows are
    * contiguous in the sorted output, so a downstream
    * partitionBy("batch_id") writer emits one transport chunk per batch.
    *
    * The lazy localCheckpoint on the sorted frame is CORRECTNESS, not
    * tuning: the counts branch and the emitting branch would otherwise
    * compile separate range exchanges whose sampled boundaries need not
    * agree (column pruning makes the subtrees differ, so ReuseExchange
    * cannot dedup them), and offsets computed under one partitioning
    * applied to another silently corrupt batch ids. Pinning the sort once
    * keeps rows in Tungsten binary form end-to-end — unlike an
    * `rdd.zipWithIndex` hop, which deserializes every row to an external
    * Row and re-encodes it through createDataFrame. */
  def dumpBatched(df: DataFrame, tsCol: Column, after: Column, until: Column,
                  orderKey: Seq[Column], batchSize: Int,
                  metaCols: Seq[String] = Seq.empty,
                  withMetadata: Boolean = true): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val sorted = dumpWindow(df, tsCol, after, until).orderBy(orderKey: _*)
      .localCheckpoint(eager = false)
    val outCols = sorted.columns.toSeq
    // monotonically_increasing_id = (partition id << 33) | row-in-partition:
    // the masked low bits are exactly the intra-partition position in the
    // sorted order (the documented layout the whole global-index idiom
    // rests on; LoaderSpec pins it against a window-ranked oracle).
    val marked = sorted.select(col("*"),
      spark_partition_id().as("__pid"),
      monotonically_increasing_id()
        .bitwiseAND(lit((1L << 33) - 1)).as("__ctr"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val offsets = marked.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"))
      .select(col("__pid"),
        coalesce(sum(col("__cnt")).over(w), lit(0L)).as("__off"))
    // No broadcast hint: offsets is #partitions rows, AQE broadcasts it.
    val batched = marked.join(offsets, "__pid")
      .withColumn("batch_id",
        expr(s"(__off + __ctr) div $batchSize"))
      .select((outCols :+ "batch_id").map(col): _*)
    stripMeta(batched, metaCols, withMetadata)
  }

  /** [[dumpBatched]] made PHYSICAL: one parquet file per batch id under
    * `path/batch_id=N/` — the reference's `objects_per_report` transport
    * chunking (/root/reference/kcidb/db/abstract.py:192-244 feeding
    * kcidb-dump's one-report-per-chunk emission) as files a downstream
    * consumer can ship/replay per report.
    *
    * Scale shape: [[dumpBatched]]'s ranked frame is hash-repartitioned
    * on `batch_id`, so every batch's rows land in exactly ONE task and
    * the `partitionBy` writer therefore emits exactly ONE file per
    * batch directory (the WarehouseSpec-pinned contract); each file is
    * at most `batchSize` rows regardless of corpus size, and distinct
    * batches spread across the cluster, so the write is as parallel as
    * the data is large while no task ever holds more than one
    * transport chunk per batch. Rows inside a file keep the dump order
    * (`sortWithinPartitions` over the same `orderKey`). Meta columns
    * strip AFTER the sort, so `orderKey` may reference them even when
    * the dump excludes them (`withMetadata = false`), matching
    * [[dumpWindow]]'s filter-on-stripped-timestamp semantics. */
  def dumpBatchedFiles(df: DataFrame, tsCol: Column, after: Column,
                       until: Column, orderKey: Seq[Column],
                       batchSize: Int, path: String,
                       metaCols: Seq[String] = Seq.empty,
                       withMetadata: Boolean = true): Unit =
    stripMeta(
      dumpBatched(df, tsCol, after, until, orderKey, batchSize)
        .repartition(col("batch_id"))
        .sortWithinPartitions(col("batch_id") +: orderKey: _*),
      metaCols, withMetadata)
      .write.mode("overwrite").partitionBy("batch_id").parquet(path)
}
