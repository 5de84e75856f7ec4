package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * exactly an ignore-nulls window aggregate — one shuffle on the key, no
  * driver loops, partial-aggregation friendly — which is how graft expresses
  * it for 100 TB logs.
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
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val merged = fields.map { f =>
      val picked =
        if (prioDb) first(col(f), ignoreNulls = true)
        else last(col(f), ignoreNulls = true)
      picked.over(w).as(f)
    } ++ maxFields.map(f => max(col(f)).over(w).as(f))
    val rn = row_number().over(
      Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*))
    df.select(keys.map(col) ++ merged :+ rn.as("__rn"): _*)
      .filter(col("__rn") === 1).drop("__rn")
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
}
