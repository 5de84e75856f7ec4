package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Percentiles

class PercentilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Textbook quantile_cont (R-7): h = (n-1)p, linear interpolation. */
  private def ref(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted
    val h = (s.length - 1) * p
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    s(lo) + (s(hi) - s(lo)) * (h - lo)
  }

  test("CDF form equals textbook interpolated percentiles per group") {
    val a = Seq(1.0, 3.0, 2.0, 10.0, 4.0)          // odd n, ties absent
    val b = Seq(5.0, 5.0, 1.0, 9.0)                // even n, with a tie
    val df = (a.map("a" -> _) ++ b.map("b" -> _)).toDF("g", "v")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95)
    val got = Percentiles.groupPercentiles(df, "g", "v", ps)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))))
      .toMap
    for ((g, vs) <- Seq("a" -> a, "b" -> b)) {
      val (n, p25, p50, p75, p95) = got(g)
      assert(n == vs.length)
      for ((x, p) <- Seq(p25 -> 0.25, p50 -> 0.5, p75 -> 0.75, p95 -> 0.95))
        assert(math.abs(x - ref(vs, p)) < 1e-12, s"$g p=$p got $x " +
          s"expected ${ref(vs, p)}")
    }
  }

  test("NULL values are excluded: counts and ranks see only non-nulls") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
        ("a", None), ("a", Some(2.0)), ("b", None))
      .toDF("g", "v")
    val got = Percentiles.groupPercentiles(df, "g", "v",
        Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2))))).toMap
    // group a: median of {1,2,3} = 2, n = 3 (nulls invisible)
    assert(got("a") == ((3L, Some(2.0))))
    // group b: all-null -> n = 0, no rank is ever satisfied -> NULL out
    assert(got("b") == ((0L, None)))
  }

  test("degenerate groups: single value, all-equal values") {
    val df = (Seq.fill(5)(7.0).map("c" -> _) :+ ("d" -> 42.0)).toDF("g", "v")
    val got = Percentiles.groupPercentiles(df, "g", "v",
        Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("c") == ((7.0, 7.0)))
    assert(got("d") == ((42.0, 42.0)))
  }

  test("t08 plan: no value-buffering percentile aggregate, windows stay " +
      "group-partitioned") {
    val p = SparkEntry.queries("t08_quality_percentiles")(
        spark, TestSpark.sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("percentile("),
      "must use the bounded CDF form, not the buffering aggregate")
    assert(!p.contains("SinglePartition"),
      "CDF windows must never collapse to one partition")
    assert(p.contains("partial"), "the (group, value) count map-side combines")
  }
}
