package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Series

class SeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Synthetic series: 8 flat days at 10 events/day, then a 30-event
    * spike. The spike's trailing week is exactly the flat plateau, so
    * mean/σ/z have closed forms. */
  private def flatSpike() = {
    val rows = (0 until 8).flatMap { d =>
      (0 until 10).map(i => ("a", f"2024-01-${d + 1}%02d 06:00:00", i))
    } ++ (0 until 30).map(i => ("a", "2024-01-09 06:00:00", i))
    rows.toDF("series", "ts_s", "i")
      .select(col("series"), col("ts_s").cast("timestamp").as("ts"))
  }

  test("flat-then-spike: z math matches the closed form") {
    val got = Series.rateAnomaly(flatSpike(), col("series"), col("ts"))
      .orderBy("day").collect()
    assert(got.length == 9)
    // day 1: no trailing rows -> null mean/z, not anomalous
    val d1 = got.head
    assert(d1.getAs[Long]("k_trail") == 0L)
    assert(d1.isNullAt(d1.fieldIndex("trail_mean")))
    assert(d1.isNullAt(d1.fieldIndex("z")))
    assert(d1.getAs[Int]("anomaly") == 0)
    // days 2..8: trailing counts are constant 10s -> zero variance ->
    // null z (never divide by a zero sigma), mean exactly 10
    for (r <- got.slice(1, 8)) {
      assert(r.getAs[Double]("trail_mean") == 10.0)
      assert(r.isNullAt(r.fieldIndex("z")), r)
      assert(r.getAs[Int]("anomaly") == 0)
    }
    // day 9 (spike): 7 trailing flat days -> mean 10, var 0 from flats?
    // No: trailing window sees days 2..8 (all 10s) -> zero variance ->
    // null z even for the spike. The variance needs a wiggle; covered in
    // the next test. Here assert the spike row's trailing stats.
    val d9 = got.last
    assert(d9.getAs[Long]("n") == 30L)
    assert(d9.getAs[Long]("k_trail") == 7L)
    assert(d9.getAs[Double]("trail_mean") == 10.0)
  }

  test("wiggled baseline: z and the anomaly flag match a hand replica") {
    // counts 9,11,9,11,9,11,9 then a 30 spike: mean = 69/7,
    // var = (687 - 69*(69/7))/6, z = (30 - mean)/sqrt(var)
    val counts = Seq(9, 11, 9, 11, 9, 11, 9, 30)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i => ("a", f"2024-02-${d + 1}%02d 12:00:00", i))
    }
    val df = rows.toDF("series", "ts_s", "i")
      .select(col("series"), col("ts_s").cast("timestamp").as("ts"))
    val got = Series.rateAnomaly(df, col("series"), col("ts"))
      .orderBy("day").collect()
    val s = 69.0; val k = 7.0; val ss = 687.0
    val mean = s / k
    val varD = (ss - s * mean) / (k - 1.0)
    val z = (30.0 - mean) / math.sqrt(varD)
    val last = got.last
    assert(last.getAs[Double]("z") ==
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(last.getAs[Int]("anomaly") == 1)
    // an in-baseline day is not anomalous
    assert(got(6).getAs[Int]("anomaly") == 0)
  }

  test("trailing window is per-series and rows-based over observed days") {
    // series b has a gap: days 1,2,10 - day 10's trailing window is the
    // two OBSERVED days, not the empty calendar week
    val rows = Seq(("b", "2024-03-01"), ("b", "2024-03-02"),
      ("b", "2024-03-02"), ("b", "2024-03-10"))
    val df = rows.toDF("series", "d")
      .select(col("series"),
        concat(col("d"), lit(" 00:00:01")).cast("timestamp").as("ts"))
    val got = Series.rateAnomaly(df, col("series"), col("ts"))
      .orderBy("day").collect()
    val last = got.last
    assert(last.getAs[Long]("k_trail") == 2L)
    assert(last.getAs[Double]("trail_mean") == 1.5)
  }

  test("q41 plan: the window runs over the aggregated day frame") {
    val df = SparkEntry.queries("q41_rate_anomaly")(spark, TestSpark.sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // corpus collapses first: a partial (map-side combined) aggregate
    // below the window
    assert(p.contains("partial"), p)
    assert(p.contains("Window"), p)
    // every Window node's input subtree contains the (series, day)
    // aggregate - the window never consumes the raw scan directly
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
    val lp = df.queryExecution.optimizedPlan
    val wins = lp.collect { case w: Window => w }
    assert(wins.nonEmpty, lp.toString)
    for (w <- wins)
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"window over un-aggregated input:\n$lp")
  }
}
