package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The OO-layer rollup analytics of kcidb, as reusable Spark operators.
  * Reference: /root/reference/kcidb/oo/__init__.py.
  */
object Rollups {

  /** Latest object version per identity — kcidb's issue → issue_version
    * (max version_num; orm/data.py:437-455) and checkout branch tips.
    * ONE partial-aggregatable max_by aggregate (map-side combine keeps one
    * candidate row per key per partition) — no per-key sort, no window.
    * Deterministic iff `order` is a total order within each key. */
  def latestPerKey(df: DataFrame, keys: Seq[String],
                   order: Seq[Column]): DataFrame = {
    val others = df.columns.filterNot(keys.contains).toSeq
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), struct(order: _*)).as("__row"))
      .select(df.columns.toSeq.map(c =>
        if (keys.contains(c)) col(c) else col(s"__row.$c").as(c)): _*)
  }

  /** status -> numeric priority (unlisted statuses sink to MaxValue). */
  private def statusToPrio(status: Column,
                           priorities: Seq[(String, Int)]): Column =
    priorities.foldLeft(lit(Int.MaxValue)) {
      case (acc, (s, p)) => when(status === s, p).otherwise(acc)
    }

  /** numeric priority -> status (inverse of [[statusToPrio]]). */
  private def prioToStatus(prio: Column,
                           priorities: Seq[(String, Int)]): Column =
    priorities.foldLeft(lit(null: String)) {
      case (acc, (s, p)) => when(prio === p, s).otherwise(acc)
    }

  /** Worst-status aggregate — kcidb `checkouts_valid`
    * (oo/__init__.py:464-477) takes min over a priority order
    * (false < null < true). Generalized: map status to priority, take min,
    * map back. Expressed as min(CASE...) so it stays a partial-aggregatable
    * codegen'd aggregate. */
  def worstStatus(df: DataFrame, keys: Seq[String], status: Column,
                  priorities: Seq[(String, Int)]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(statusToPrio(status, priorities)).as("__worst_prio"))
      .withColumn("worst_status",
        prioToStatus(col("__worst_prio"), priorities))
      .drop("__worst_prio")

  /** Dot-path test-tree rollup — kcidb's `Node` hierarchy
    * (oo/__init__.py:277-408): every test with path `a.b.c` contributes to
    * nodes `a`, `a.b`, and `a.b.c`; a node's status is the worst (min
    * priority) over its subtree, and `n_tests` its subtree size.
    *
    * Spark-first shape: split the path, explode its prefixes (depth rows
    * per test), then ONE partial-aggregatable min/count groupBy on the
    * prefix — no recursion, no driver-side tree. At 100 TB the explosion
    * factor is the mean path depth (small constant) and the shuffle key is
    * the node path. Returns (node_path, worst_status, n_tests). */
  def pathRollup(df: DataFrame, path: Column, status: Column,
                 priorities: Seq[(String, Int)]): DataFrame = {
    val parts = split(path, "\\.")
    val prefixes = transform(sequence(lit(1), size(parts)),
      d => concat_ws(".", slice(parts, lit(1), d)))
    df.select(explode(prefixes).as("node_path"),
        statusToPrio(status, priorities).as("__prio"))
      .groupBy(col("node_path"))
      .agg(min(col("__prio")).as("__worst_prio"),
        count(lit(1)).as("n_tests"))
      .select(col("node_path"),
        prioToStatus(col("__worst_prio"), priorities).as("worst_status"),
        col("n_tests"))
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
