package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Ivf

class IvfInitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus() =
    graft.sources.Tables(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("v"))

  test("kmeansParallelInit: exactly c corpus-point centroids, " +
      "bit-deterministic across runs and partitionings") {
    val c = corpus()
    val a = Ivf.kmeansParallelInit(c, c = 16).orderBy("cluster").collect()
    assert(a.length == 16)
    // every candidate is a real corpus point: its cluster key is an id
    // and its centroid is that id's vector
    val byId = c.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1)).toMap
    for (r <- a)
      assert(byId(r.getLong(0)) == r.getSeq[Float](1),
        s"centroid of ${r.getLong(0)} is not its corpus vector")
    val b = Ivf.kmeansParallelInit(c.repartition(7), c = 16)
      .orderBy("cluster").collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
  }

  test("s13 gate: cost-proportional init fits at least as well as " +
      "lowest-id seeding, both fully occupied") {
    val rows = SparkEntry.queries("s13_kmeanspp_init")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (nK, cellsK, costK) = rows("kmpp")
    val (nL, cellsL, costL) = rows("lowid")
    assert(nK == nL && nK > 0)
    assert(cellsK == 16L && cellsL == 16L)
    // the whole point of the oversampled init (deterministic coins, so
    // this is a stable measurement, not a flaky one)
    assert(costK <= costL, s"kmpp $costK should not exceed lowid $costL")
  }

  test("kmeansParallelInit degenerates cleanly at c = 1") {
    val one = Ivf.kmeansParallelInit(corpus(), c = 1).collect()
    assert(one.length == 1)
  }
}
