package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Ivf

/** r19 one-pass fit-mean step ([[graft.functions.VectorAvg]] via
  * [[Ivf.meanByCluster]]) == the pre-r19 exploded formulation
  * ([[Ivf.meanByClusterViaExplode]]), row for row — the equivalence
  * contract behind removing the n·d posexplode and one of the two
  * per-iteration exchanges from every k-means fit. The fixture
  * deliberately hits every divergence candidate: NaN elements (avg
  * propagates NaN), NULL elements (skipped per position), NULL vectors
  * (contribute nothing), ragged lengths (result = longest vector,
  * missing tail positions averaged over the rows that have them),
  * empty arrays, and a cluster whose EVERY vector is null/empty (the
  * exploded shape loses the group; the aggregate path filters size>0
  * to match). */
class MeanStepEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture: Seq[(Long, Long, Seq[java.lang.Float])] = Seq(
    // cluster 1: plain uniform vectors
    (0L, 1L, Seq[java.lang.Float](1f, 2f, 3f)),
    (1L, 1L, Seq[java.lang.Float](4f, 5f, 6f)),
    (2L, 1L, Seq[java.lang.Float](-1f, 0.5f, 2.25f)),
    // cluster 2: NaN element + null element + ragged lengths
    (3L, 2L, Seq[java.lang.Float](Float.NaN, 1f)),
    (4L, 2L, Seq[java.lang.Float](2f, null, 5f)),
    (5L, 2L, Seq[java.lang.Float](3f)),
    // cluster 3: a null vector next to real ones
    (6L, 3L, null),
    (7L, 3L, Seq[java.lang.Float](7f, 8f)),
    // cluster 4: ONLY null/empty vectors — must vanish from the output
    (8L, 4L, null),
    (9L, 4L, Seq.empty[java.lang.Float]),
    // cluster 5: empty array next to a real one
    (10L, 5L, Seq.empty[java.lang.Float]),
    (11L, 5L, Seq[java.lang.Float](0.25f, -0.125f, 9f, 10f)))

  private lazy val assigned = fixture.toDF("id", "cluster", "v")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("meanByCluster == meanByClusterViaExplode on the nasty fixture") {
    val a = Ivf.meanByCluster(assigned, Seq("cluster"))
    val b = Ivf.meanByClusterViaExplode(assigned, Seq("cluster"))
    assert(rows(a) == rows(b))
    // cluster 4 (all null/empty) vanished from both
    assert(a.filter(col("cluster") === 4).isEmpty)
    // NaN propagated (cluster 2 pos 0), null-element position averaged
    // over the non-null rows only (cluster 2 pos 1 = avg(1, 3)... the
    // exploded shape is the arbiter — equality above is the assertion)
    assert(a.count() == 4)
  }

  test("grouped keys: meanByCluster == explode shape under (g, cluster)") {
    val grouped = assigned.withColumn("g", pmod(col("id"), lit(2)))
    val a = Ivf.meanByCluster(grouped, Seq("g", "cluster"))
    val b = Ivf.meanByClusterViaExplode(grouped, Seq("g", "cluster"))
    assert(rows(a) == rows(b))
  }

  test("mean step is exact on a many-partition shuffle of the fixture") {
    // same rows, 8 partitions: partial buffers merge across partitions;
    // the per-position result must still match the exploded shape run
    // over the SAME partitioning (both see identical partial layouts)
    val wide = assigned.repartition(8, col("id"))
    val a = Ivf.meanByCluster(wide, Seq("cluster"))
    val b = Ivf.meanByClusterViaExplode(wide, Seq("cluster"))
    assert(rows(a) == rows(b))
  }
}
