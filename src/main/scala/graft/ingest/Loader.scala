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

  /** Collapse a submission log to merged records: kcidb load with
    * load-priority (`prio_db=false`): latest non-null value per field wins.
    *
    * @param df       submission log
    * @param keys     identity columns (kcidb object id)
    * @param orderBy  submission order (deterministic: include a tiebreaker)
    * @param fields   non-key fields to merge
    */
  def upsertMerge(
      df: DataFrame, keys: Seq[String],
      orderBy: Seq[Column], fields: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val merged = fields.map(f => last(col(f), ignoreNulls = true).over(w).as(f))
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
