package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The OO-layer rollup analytics of kcidb, as reusable Spark operators.
  * Reference: /root/reference/kcidb/oo/__init__.py.
  */
object Rollups {

  /** Latest object version per identity — kcidb's issue → issue_version
    * (max version_num; orm/data.py:437-455) and checkout branch tips.
    * One shuffle; deterministic with a total order. */
  def latestPerKey(df: DataFrame, keys: Seq[String],
                   order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Worst-status aggregate — kcidb `checkouts_valid`
    * (oo/__init__.py:464-477) takes min over a priority order
    * (false < null < true). Generalized: map status to priority, take min,
    * map back. Expressed as min(CASE...) so it stays a partial-aggregatable
    * codegen'd aggregate. */
  def worstStatus(df: DataFrame, keys: Seq[String], status: Column,
                  priorities: Seq[(String, Int)]): DataFrame = {
    val toPrio = priorities.foldLeft(lit(Int.MaxValue)) {
      case (acc, (s, p)) => when(status === s, p).otherwise(acc)
    }
    val fromPrio = priorities.foldLeft(lit(null: String)) {
      case (acc, (s, p)) => when(col("__worst_prio") === p, s).otherwise(acc)
    }
    df.groupBy(keys.map(col): _*)
      .agg(min(toPrio).as("__worst_prio"))
      .withColumn("worst_status", fromPrio)
      .drop("__worst_prio")
  }

  /** Status pivot — kcidb `architecture_status_builds`
    * (oo/__init__.py:157-177): counts per row-key × status value. Uses
    * count(when(...)) rather than .pivot so absent combinations are 0 (not
    * null) and the plan is a single partial-aggregatable pass. */
  def statusPivot(df: DataFrame, rowKey: Column, rowKeyName: String,
                  status: Column, values: Seq[(String, String)]): DataFrame = {
    val aggs = values.map { case (v, alias) =>
      count(when(status === v, lit(1))).as(alias)
    }
    df.groupBy(rowKey.as(rowKeyName)).agg(aggs.head, aggs.tail: _*)
  }

  /** Group-and-count ordered by size — kcidb `repo_branch_checkouts`
    * (oo/__init__.py:413-446): branches ranked by checkout count. */
  def groupCounts(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))

  /** Top-N by measure with deterministic tiebreak — Spark plans this as
    * TakeOrderedAndProject (no global sort at scale). */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)
}
