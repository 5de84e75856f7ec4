package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diffing: classify every key across two versions of a
  * table as added / removed / changed / unchanged and name the fields
  * that changed — the crawl-snapshot / warehouse-reconciliation
  * service (which pages appeared, vanished, or mutated between two
  * dumps; the reference's load-merge loop answers the same question
  * implicitly by re-loading, kcidb/db/abstract.py's load+query cycle).
  *
  * Scale shape: ONE full-outer equi-join on the key — both sides
  * shuffle-partition on the same key columns, so at any size this is
  * the canonical co-partitioned sort-merge join; the per-field
  * comparison is a row-local null-safe equality fold, and
  * `changed_fields` is built by concatenating per-field singleton
  * arrays (codegen'd CASE/concat — no HOF lambda, no UDF). Nothing
  * corpus-sized beyond the join itself.
  */
object SnapshotDiff {

  /** Row-level diff of `b` (new) against `a` (old) on `keyCols`,
    * comparing `cols`: emits the key columns, `status` ∈
    * added|removed|changed|unchanged, and `changed_fields` (the
    * compared column names whose values differ, in `cols` order;
    * comparisons are null-safe, so null→value and value→null both
    * count as changes). Rows present only in `b` are `added`, only in
    * `a` are `removed`. */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      cols: Seq[String]): DataFrame = {
    for (f <- Seq(a, b); c <- keyCols ++ cols)
      require(f.columns.contains(c),
        s"SnapshotDiff: missing column '$c' " +
          s"(has: ${f.columns.mkString(", ")})")
    def side(df: DataFrame, p: String): DataFrame =
      df.select(keyCols.map(col) ++ cols.map(c => col(c).as(s"$p$c")) :+
        lit(1).as(s"__in_$p"): _*)
    val j = side(a, "a_").join(side(b, "b_"), keyCols, "full_outer")
    val inA = col("__in_a_").isNotNull
    val inB = col("__in_b_").isNotNull
    val fieldDiff = cols.map(c =>
      c -> !(col(s"a_$c") <=> col(s"b_$c")))
    val changed = fieldDiff.map(_._2).reduce(_ || _)
    val changedFields = concat(fieldDiff.map { case (c, d) =>
      when(d, array(lit(c))).otherwise(array().cast("array<string>"))
    }: _*)
    j.select(keyCols.map(col) :+
      when(!inA, lit("added"))
        .when(!inB, lit("removed"))
        .when(changed, lit("changed"))
        .otherwise(lit("unchanged")).as("status") :+
      when(inA && inB, changedFields)
        .otherwise(array().cast("array<string>")).as("changed_fields"): _*)
  }
}
