package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (the quantile_cont / NIST R-7
  * definition) per group WITHOUT per-group value buffering.
  *
  * Spark's built-in exact `percentile` aggregate holds EVERY group value
  * in its aggregation buffer — corpus-proportional executor memory, the
  * same scale smell as ranking through an unpartitioned window. This is
  * the bounded-state form of the same number, for value columns with a
  * bounded quantized domain (scores rounded to fixed decimals, token
  * counts, …):
  *
  *   1. count per (group, value) — one shuffle, map-side combined;
  *      state per task is bounded by the DOMAIN size, not the corpus;
  *   2. CDF over the distinct values via a group-partitioned running
  *      sum (rows = distinct values per group, again domain-bounded);
  *   3. each percentile = two rank lookups (conditional min) + linear
  *      interpolation: h = (n−1)·p, v = v⌊h⌋ + (v⌈h⌉ − v⌊h⌋)·frac.
  *
  * The DuckDB oracle states the same number as a plain quantile_cont
  * over the raw values — the cross-engine proof that the distributed
  * CDF form implements exactly the textbook definition.
  */
object Percentiles {
  /** @param ps (output column name, percentile in [0,1]) pairs.
    * Output: groupCol, n_rows, one double column per requested p. */
  def groupPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                       ps: Seq[(String, Double)]): DataFrame = {
    // NULL values are excluded like every SQL quantile implementation —
    // but NOT with an isnotnull filter: Catalyst pushes a predicate on a
    // grouping column through the aggregate into the scan, where an
    // expensive derived value column (t08's quality score) would be
    // evaluated a SECOND time per row (measured 4x end-to-end on the 10x
    // corpus). Instead count(valueCol) makes the (group, NULL) row count
    // 0 — it adds nothing to __cum/__n, and the rank lookups can never
    // select it: its cumulative count stays below every rank, and min()
    // skips NULL values anyway.
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(col(valueCol)).as("__c"))
    val cdf = counts
      .withColumn("__cum",
        sum(col("__c")).over(
          Window.partitionBy(groupCol).orderBy(valueCol)))
      .withColumn("__n",
        sum(col("__c")).over(Window.partitionBy(groupCol)))
    val rankAggs = ps.flatMap { case (name, p) =>
      val h = (col("__n") - 1) * lit(p) // 0-based fractional rank
      Seq(
        min(when(col("__cum") >= floor(h) + 1, col(valueCol)))
          .as(s"__lo_$name"),
        min(when(col("__cum") >= ceil(h) + 1, col(valueCol)))
          .as(s"__hi_$name"))
    }
    val agged = cdf.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_rows"), rankAggs: _*)
    ps.foldLeft(agged) { case (d, (name, p)) =>
      val h = (col("n_rows") - 1) * lit(p)
      d.withColumn(name,
          col(s"__lo_$name") +
            (col(s"__hi_$name") - col(s"__lo_$name")) * (h - floor(h)))
        .drop(s"__lo_$name", s"__hi_$name")
    }
  }
}
