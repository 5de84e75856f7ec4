package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ivm

/** Incremental rollup maintenance (operators/Ivm, gate q45): the state
  * is a commutative monoid, so chunked maintenance must equal the
  * one-shot rollup under ANY batch split and ANY partitioning, and the
  * refresh plan must read the base as persisted state — never rescan
  * the base table.
  */
class IvmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows = Seq(
    ("a", "2024-01-01", 1.0), ("a", "2024-01-01", 2.5),
    ("a", "2024-01-02", -3.0), ("b", "2024-01-01", 10.0),
    ("b", "2024-01-03", 0.25), ("c", "2024-01-02", 7.75),
    ("a", "2024-01-01", 4.0), ("b", "2024-01-03", -1.5))
    .toDF("event_type", "day", "value")

  private def state(df: org.apache.spark.sql.DataFrame) =
    Ivm.rollupState(df, Seq(col("event_type"), col("day")), col("value"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_type"), col("day"), col("n_rows"),
        col("sum_value").cast("double"), col("min_value"),
        col("max_value"))
      .orderBy("event_type", "day").collect().map(_.toSeq).toSeq

  test("chunked merge equals one-shot rollup for every split point " +
      "(monoid associativity), under repartitioned inputs") {
    val full = canon(state(rows))
    val df = rows
    for (k <- 1 to 7) {
      // split by stable row hash into [0,k) and [k,8) chunks via a
      // deterministic row index
      val idx = df.withColumn("i", monotonically_increasing_id())
      val ranked = idx.withColumn("r",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("event_type", "day", "value", "i")))
      val base = ranked.filter(col("r") <= k).drop("i", "r")
      val delta = ranked.filter(col("r") > k).drop("i", "r")
      val merged = Ivm.merge(state(base.repartition(5)),
        state(delta.repartition(3)), Seq("event_type", "day"))
      assert(canon(merged) == full, s"split at $k diverged")
    }
  }

  test("keys present only in state or only in delta both survive the " +
      "merge with their own monoid values") {
    val base = Seq(("x", "2024-02-01", 1.0)).toDF("event_type", "day", "value")
    val delta = Seq(("y", "2024-02-02", 2.0)).toDF("event_type", "day", "value")
    val m = canon(Ivm.merge(state(base), state(delta),
      Seq("event_type", "day")))
    assert(m == Seq(Seq("x", "2024-02-01", 1L, 1.0, 1.0, 1.0),
      Seq("y", "2024-02-02", 1L, 2.0, 2.0, 2.0)))
  }

  test("merge refuses frames missing state columns") {
    val bad = Seq(("x", "2024-02-01", 1L)).toDF("event_type", "day", "n_rows")
    val ok = state(Seq(("x", "2024-02-01", 1.0))
      .toDF("event_type", "day", "value"))
    val e = intercept[IllegalArgumentException] {
      Ivm.merge(bad, ok, Seq("event_type", "day"))
    }
    assert(e.getMessage.contains("missing state column"))
  }

  test("q45's refresh plan reads the base as persisted state: exactly " +
      "one events scan (the delta), plus the state parquet") {
    val p = SparkEntry.queries("q45_incr_rollup")(spark, TestSpark.sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val eventScans =
      "Location.*events\\.parquet".r.findAllIn(p).size
    assert(eventScans == 1,
      s"base must come from persisted state, not a rescan:\n$p")
    assert("rollup_state".r.findAllIn(p).nonEmpty,
      s"state parquet scan missing from the plan:\n$p")
    // the sum stays decimal until the gate's final double cast — the
    // merge itself must not round through doubles
    assert(!p.contains("sum(cast(sum_value"), "decimal sum re-summed raw")
  }
}
