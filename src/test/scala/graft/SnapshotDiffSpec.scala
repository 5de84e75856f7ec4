package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("classification, null-safe field compare, changed_fields in " +
      "cols order") {
    val a = Seq(
      (1L, Some("x"), Some(10L)), // unchanged
      (2L, Some("x"), Some(10L)), // value -> null: changed
      (3L, None: Option[String], Some(10L)), // null -> value: changed
      (4L, Some("x"), Some(10L)), // both fields change
      (5L, Some("x"), Some(10L))) // removed
      .toDF("k", "s", "v")
    val b = Seq(
      (1L, Some("x"), Some(10L)),
      (2L, Some("x"), None: Option[Long]),
      (3L, Some("y"), Some(10L)),
      (4L, Some("z"), Some(11L)),
      (6L, Some("n"), Some(1L))) // added
      .toDF("k", "s", "v")
    val d = SnapshotDiff.diff(a, b, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect()
    val got = d.map(r => (r.getLong(0), r.getString(1),
      r.getSeq[String](2).toList)).toList
    assert(got == List(
      (1L, "unchanged", Nil),
      (2L, "changed", List("v")),
      (3L, "changed", List("s")),
      (4L, "changed", List("s", "v")),
      (5L, "removed", Nil),
      (6L, "added", Nil)))
  }

  test("composite keys classify independently per key tuple") {
    val a = Seq((1L, "x", 10L), (1L, "y", 20L), (2L, "x", 30L))
      .toDF("k1", "k2", "v")
    val b = Seq((1L, "x", 10L), (1L, "y", 21L), (3L, "z", 40L))
      .toDF("k1", "k2", "v")
    val got = SnapshotDiff.diff(a, b, Seq("k1", "k2"), Seq("v"))
      .orderBy("k1", "k2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toList
    assert(got == List((1L, "x", "unchanged"), (1L, "y", "changed"),
      (2L, "x", "removed"), (3L, "z", "added")))
  }

  test("missing column is rejected loudly") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val e = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(a, a, Seq("k"), Seq("nope"))
    }
    assert(e.getMessage.contains("missing column 'nope'"))
  }

  test("the diff plan is one co-partitioned equi-join — no broadcast-" +
      "nested-loop, no cartesian — and q46's report reads the join " +
      "through the checkpoint, never re-executing it") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val d = SnapshotDiff.diff(a, a, Seq("k"), Seq("s"))
    val dp = d.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!dp.contains("BroadcastNestedLoopJoin") &&
      !dp.contains("CartesianProduct"), dp)
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(dp).size == 1,
      s"exactly one shuffled equi-join expected:\n$dp")
    // the gate's two report branches share the checkpointed pre-
    // aggregate: the published plan must contain NO join at all
    val gp = SparkEntry.queries("q46_snapshot_diff")(spark, TestSpark.sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!gp.contains("Join"),
      s"report must read the memoized pre-aggregate, not re-join:\n$gp")
  }
}
