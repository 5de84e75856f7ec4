package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Project

/** Seeded random projection: exact per-cell checks against the driver-side
  * coin formula (the matrix IS the seed), linearity, and the JL
  * norm-preservation envelope on the real corpus. */
class ProjectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val seed = "spec-proj"

  test("one-hot inputs read individual matrix cells") {
    // projecting e_i yields row (coin(i,1), ..., coin(i,outDim))
    val oneHots = (1 to 4).map { i =>
      (i.toLong, Array.tabulate(8)(k => if (k == i - 1) 1.0f else 0.0f))
    }
    val out = Project.randomProjection(oneHots.toDF("vec_id", "embedding"),
        "vec_id", "embedding", inDim = 8, outDim = 5, seed)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    for (i <- 1 to 4; j <- 1 to 5)
      assert(out((i.toLong, j)) == Project.coin(seed, i, j),
        s"cell ($i, $j)")
    // and the coin really is ±1
    assert(out.values.forall(v => v == 1.0 || v == -1.0))
  }

  test("projection is linear and matches a driver-side reference") {
    val v = Array.tabulate(8)(i => (i + 1) * 0.25f)
    val out = Project.randomProjection(
        Seq((1L, v), (2L, v.map(_ * 2))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", inDim = 8, outDim = 5, seed)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    def ref(scale: Double, j: Int): Double = {
      val s = (1 to 8).map(i => v(i - 1).toDouble * scale *
        Project.coin(seed, i, j)).sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (j <- 1 to 5) {
      assert(math.abs(out((1L, j)) - ref(1.0, j)) < 1e-9, s"dim $j")
      assert(math.abs(out((2L, j)) - ref(2.0, j)) < 1e-9, s"2x dim $j")
    }
  }

  test("JL envelope on the real corpus: projected norms concentrate " +
      "around sqrt(outDim) times the input norm") {
    val emb = graft.sources.Tables(spark, TestSpark.sf, "embeddings")
    val outDim = 16
    val proj = Project.randomProjection(emb, "vec_id", "embedding",
      inDim = 64, outDim = outDim, seed)
    // E[||Pv||^2] = outDim * ||v||^2 for ±1 coins; per-vector ratios
    // concentrate near 1 — assert a generous envelope corpus-wide.
    val pn = proj.groupBy("vec_id")
      .agg(sum(col("value") * col("value")).as("p2"))
    val vn = emb.select(col("vec_id"),
      aggregate(transform(col("embedding"), x =>
          x.cast("double") * x.cast("double")),
        lit(0.0), (a, x) => a + x).as("v2"))
    val ratios = pn.join(vn, "vec_id")
      .select((col("p2") / (col("v2") * outDim)).as("r"))
      .agg(min("r").as("lo"), max("r").as("hi"), avg("r").as("mean"))
      .head()
    assert(ratios.getDouble(0) > 0.1, s"min ratio ${ratios.getDouble(0)}")
    assert(ratios.getDouble(1) < 4.0, s"max ratio ${ratios.getDouble(1)}")
    assert(math.abs(ratios.getDouble(2) - 1.0) < 0.25,
      s"mean ratio ${ratios.getDouble(2)}")
  }
}
