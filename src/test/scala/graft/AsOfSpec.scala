package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val left = Seq(
    (1L, "u1", 100L), (2L, "u1", 205L), (3L, "u1", 50L), (4L, "u2", 100L)
  ).toDF("id", "k", "t")
  private val right = Seq(
    ("u1", 90L, "a"), ("u1", 200L, "b"), ("u1", 205L, "c"), ("u3", 10L, "x")
  ).toDF("k", "rt", "payload")

  private def run(l: org.apache.spark.sql.DataFrame = left) =
    AsOf.asOfJoin(l, right, Seq("k"), col("t"), col("rt"), Seq("payload"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq

  test("picks the latest right row with rt <= t, inclusive at equality") {
    assert(run() == Seq(
      (1L, "a"),   // t=100: latest of {90} -> a
      (2L, "c"),   // t=205: rt=205 included (>= semantics) -> c
      (3L, null),  // t=50: nothing at or before -> null
      (4L, null))) // u2 has no right rows at all -> null
  }

  test("matches DuckDB-style ASOF semantics on key without right rows") {
    val rows = run(Seq((9L, "zz", 999L)).toDF("id", "k", "t"))
    assert(rows == Seq((9L, null)))
  }

  test("right ties on (k, ts) resolve by the tiebreak order, last wins") {
    val dupRight = Seq(("u1", 100L, "p"), ("u1", 100L, "q"))
      .toDF("k", "rt", "payload")
    val got = AsOf.asOfJoin(
        Seq((1L, "u1", 150L)).toDF("id", "k", "t"),
        dupRight, Seq("k"), col("t"), col("rt"),
        Seq("payload"), rightTie = Seq(col("payload")))
      .head.getString(3)
    assert(got == "q", "last under the tiebreak order must win")
  }

  test("one shuffle on the key: plan has a single hash exchange, no range join") {
    val df = AsOf.asOfJoin(left, right, Seq("k"), col("t"), col("rt"),
      Seq("payload"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$p")
  }
}
