package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

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

  /** dump_iter's (after, until] window
    * (/root/reference/kcidb/db/abstract.py:192-244). */
  def dumpWindow(df: DataFrame, tsCol: Column,
                 after: Column, until: Column): DataFrame =
    df.filter(tsCol > after && tsCol <= until)

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
    * orderBy is a range-partitioned sort, and zipWithIndex then computes
    * per-partition offsets from partition row COUNTS (an O(#partitions)
    * driver exchange, the standard global-index discipline). Each batch's
    * rows are contiguous in the sorted output, so a downstream
    * partitionBy("batch_id") writer emits one transport chunk per batch. */
  def dumpBatched(df: DataFrame, tsCol: Column, after: Column, until: Column,
                  orderKey: Seq[Column], batchSize: Int): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val windowed = dumpWindow(df, tsCol, after, until).orderBy(orderKey: _*)
    val spark = windowed.sparkSession
    val schema = windowed.schema
      .add(StructField("batch_id", LongType, nullable = false))
    val indexed = windowed.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i / batchSize)
    }
    spark.createDataFrame(indexed, schema)
  }
}
