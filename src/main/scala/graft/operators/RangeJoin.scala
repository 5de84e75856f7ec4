package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range (interval) join: pairs each point with every interval
  * containing it — `lo <= point <= hi` — without the
  * BroadcastNestedLoopJoin a raw BETWEEN theta-join plans to.
  *
  * The number line is cut into fixed-width buckets: a point belongs to
  * exactly one bucket, an interval explodes into the buckets it covers
  * (⌈len/W⌉ + 1 rows), and the join becomes an EQUI-join on the bucket id
  * followed by the exact BETWEEN filter. Each qualifying (point, interval)
  * pair meets in exactly one bucket — the point's — so no dedup is needed.
  * The shuffle key is the bucket: at 100 TB, cost is linear in points +
  * interval-coverage, and `bucketWidth` trades replication (≈ mean
  * interval length / W) against bucket fan-in (points per bucket) — set it
  * near the typical interval length.
  */
object RangeJoin {

  /** Join `points` and `intervals` (disjoint column names required).
    * `pointCol`, `loCol`, `hiCol` must be integral (e.g. epoch seconds);
    * all original columns of both inputs survive. */
  def bandedRangeJoin(points: DataFrame, pointCol: Column,
                      intervals: DataFrame, loCol: Column, hiCol: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint, both have: $overlap")
    // floor-divide via decimal: `/` on longs is DOUBLE division, which
    // rounds for values beyond 2^53 (epoch-nanos would mis-bucket).
    def bucket(c: Column): Column =
      floor(c.cast("decimal(38,0)") / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", bucket(pointCol))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(bucket(loCol), bucket(hiCol))))
    p.join(iv, Seq("__bucket"))
      .filter(pointCol >= loCol && pointCol <= hiCol)
      .drop("__bucket")
  }
}
