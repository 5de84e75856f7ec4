package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TopK, Vectors}
import graft.sim.{Ivf, Pq}

/** r19 row-local model application == the pre-r19 join formulations,
  * row for row — the equivalence contract behind the optimization that
  * removed the ×c row explosion and per-id re-aggregation shuffle from
  * every assignment/encode/probe-selection pass:
  *
  *  - [[Ivf.assign]] / [[Ivf.assignWithin]] replicate
  *    max_by(cluster, struct(score, -cluster)) EXACTLY (array_max over
  *    struct(score, -cluster, cluster)) — including the NaN-sorts-high
  *    rule, exercised here with a zero-norm vector whose cosines are
  *    all NaN.
  *  - [[Pq.encode]] replicates the per-sub argmax the old
  *    assignWithin-based encode applied.
  *  - [[Ivf.topCells]] replicates the bounded-TopK aggregate's
  *    semantics (best nprobe by (score desc, id asc), NaN EXCLUDED).
  */
class AssignEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 8-dim fixture with deliberate nasties: near-duplicates (ties),
    * one exact duplicate pair, and one all-zero vector (cosine NaN
    * against everything). */
  private def fixture(n: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      val v =
        if (i == 7) Seq.fill(8)(0f) // zero-norm: all-NaN scores
        else if (i == 11) Seq.tabulate(8)(j => ((3 + j) % 5).toFloat)
        else Seq.tabulate(8)(j => ((i + j) % 5).toFloat) // i=3 duplicates i=11's pattern class
      (i.toLong, v)
    }

  private val emb = fixture(40).toDF("id", "v")
  private val centroids = fixture(6)
    .map { case (id, v) => (id * 10 + 1, v) } // non-contiguous cluster ids
    .toDF("cluster", "centroid")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("assign == assignViaJoin row-for-row (NaN rows included)") {
    val a = Ivf.assign(emb, centroids)
      .select("id", "cluster")
    val b = Ivf.assignViaJoin(emb, centroids)
      .select("id", "cluster")
    assert(rows(a) == rows(b))
    // the zero-norm row is present in both (max_by keeps NaN-high picks)
    assert(a.filter(col("id") === 7).count() == 1)
  }

  test("assign drops everything when the centroid frame is empty") {
    val none = centroids.limit(0)
    assert(Ivf.assign(emb, none).isEmpty)
  }

  test("assignWithin == assignWithinViaJoin row-for-row") {
    val grouped = emb.withColumn("g", pmod(col("id"), lit(3)))
    val gCents = centroids
      .withColumn("g", pmod(col("cluster"), lit(3)))
    val a = Ivf.assignWithin(grouped, "g", gCents)
      .select("id", "g", "cluster")
    val b = Ivf.assignWithinViaJoin(grouped, "g", gCents)
      .select("id", "g", "cluster")
    assert(rows(a) == rows(b))
  }

  test("encode == encodeViaJoin row-for-row") {
    val e = fixture(40).toDF("vec_id", "embedding")
      // encodeViaJoin's subVectors packing needs non-NaN subvector fits;
      // the zero row is legal in both (l2 scores stay finite)
    val cb = Pq.fitCodebooks(e, "vec_id", "embedding", m = 4, ksub = 4)
    val a = Pq.encode(e, "vec_id", "embedding", cb, 4)
    val b = Pq.encodeViaJoin(e, "vec_id", "embedding", cb, 4)
    assert(rows(a) == rows(b))
  }

  test("topCells == bounded-TopK probe selection (NaN excluded)") {
    val nprobe = 3
    val a = emb
      .crossJoin(broadcast(Ivf.nestedCentroids(centroids)))
      .select(col("id"),
        explode(Ivf.topCells(col("v"), col("cents"), nprobe))
          .as("cluster"))
    // the pre-r19 formulation: ×c crossJoin + bounded TopK per probe
    val b = emb.crossJoin(broadcast(centroids))
      .select(col("id"),
        Vectors.cosine(col("v"), col("centroid")).as("cos"), col("cluster"))
      .groupBy("id")
      .agg(TopK.topKByScore(col("cos"), col("cluster"), nprobe).as("cells"))
      .select(col("id"), explode(col("cells.id")).as("cluster"))
    assert(rows(a) == rows(b))
    // the all-NaN probe selects no cells in either formulation
    assert(a.filter(col("id") === 7).count() == 0)
  }
}
