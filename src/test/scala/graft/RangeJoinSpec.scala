package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val points = Seq((1L, 5L), (2L, 105L), (3L, 250L), (4L, 999L))
    .toDF("pid", "t")
  private val intervals = Seq(
    ("a", 0L, 10L), ("b", 100L, 300L), ("c", 240L, 260L), ("d", 5L, 5L)
  ).toDF("iid", "lo", "hi")

  private def pairs(width: Long) =
    RangeJoin.bandedRangeJoin(points, col("t"), intervals,
        col("lo"), col("hi"), width)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("equals the theta join, for several bucket widths") {
    val expected = points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(expected == Set((1L, "a"), (1L, "d"), (2L, "b"), (3L, "b"),
      (3L, "c")))
    for (w <- Seq(1L, 7L, 64L, 1000L))
      assert(pairs(w) == expected, s"width $w")
  }

  test("inclusive bounds; zero-length intervals match their exact point") {
    assert(pairs(50L).contains((1L, "d")), "t=5 in [5,5]")
  }

  test("plans as an equi-join on the bucket, not a nested loop") {
    val df = RangeJoin.bandedRangeJoin(points, col("t"), intervals,
      col("lo"), col("hi"), 64L)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("rejects colliding column names") {
    intercept[IllegalArgumentException](
      RangeJoin.bandedRangeJoin(points, col("t"),
        points.withColumnRenamed("pid", "lo"), col("lo"), col("t"), 10L))
  }
}
