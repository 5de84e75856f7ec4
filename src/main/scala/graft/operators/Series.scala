package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series monitoring analytics over an event stream: trailing-window
  * rate anomaly detection (the alerting rule a CI-report database like the
  * reference's monitor runs over submission volumes — "this subsystem's
  * failure rate tripled today").
  *
  * Scale shape: the corpus collapses FIRST to the (series, day) count
  * frame — one map-side-combined aggregate, ≤ |series|·|days| rows at any
  * corpus size — and only that bounded frame enters the trailing window
  * (dumpBatched's counts-frame discipline: windows over aggregate-sized
  * frames only, never corpus-sized ones).
  *
  * Determinism: the trailing stats are built from INTEGER window sums
  * (count, Σn, Σn²) and the mean/variance/z arithmetic is a fixed chain
  * of individually-correctly-rounded double ops, so Spark and DuckDB
  * produce bit-identical scores (the SURVEY §4 discipline — never an
  * engine's own stddev aggregate, whose accumulation order is private).
  */
object Series {

  /** Per-(series, day) event counts with a trailing-`trailing`-observed-day
    * z-score and an anomaly flag at |z| > `zThresh`.
    *
    * The window is ROWS-based over observed days (a day with zero events
    * contributes no row — the trailing baseline is the last `trailing`
    * days the series was alive). z is null until 2 trailing days exist
    * and when the trailing counts are constant (zero variance).
    *
    * Emits: series, day (yyyy-MM-dd), n, k_trail, trail_mean, z,
    * anomaly (0/1) — all scalar, oracle-reproducible. */
  def rateAnomaly(events: DataFrame, seriesCol: Column, tsCol: Column,
                  trailing: Int = 7, zThresh: Double = 2.0): DataFrame = {
    require(trailing >= 2, s"trailing window needs >= 2 days: $trailing")
    val daily = events
      .groupBy(seriesCol.as("series"),
        date_format(date_trunc("day", tsCol), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("series").orderBy("day")
      .rowsBetween(-trailing, -1)
    // Integer trailing sums: exact under any partitioning.
    val stats = daily
      .withColumn("k_trail", count(col("n")).over(w))
      .withColumn("s_trail", sum(col("n")).over(w))
      .withColumn("ss_trail", sum(col("n") * col("n")).over(w))
    // One stated double-op order, shared verbatim with the oracle:
    //   mean = s/k;  var = (ss - s*mean)/(k-1);  z = (n - mean)/sqrt(var)
    val k = col("k_trail").cast("double")
    val meanD = col("s_trail").cast("double") / k
    val varD = (col("ss_trail").cast("double") -
      col("s_trail").cast("double") * meanD) / (k - lit(1.0))
    val z = (col("n").cast("double") - meanD) / sqrt(varD)
    stats
      .withColumn("trail_mean",
        when(col("k_trail") >= 1, round(meanD, 6)))
      .withColumn("z",
        when(col("k_trail") >= 2 && varD > 0, round(z, 6)))
      .withColumn("anomaly",
        when(col("z").isNotNull && abs(col("z")) > zThresh, 1)
          .otherwise(0))
      .drop("s_trail", "ss_trail")
  }
}
