package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 groups x known cardinalities; keys deterministic. */
  private def synth() = {
    val rows = for {
      g <- 0 until 3
      i <- 0 until 4000
    } yield (s"g$g", (i % (500 * (g + 1))).toLong, i.toDouble / 4000.0)
    rows.toDF("series", "k", "v")
  }

  test("distinctProfile: exact columns exact, HLL inside 5*rsd, " +
      "partitioning-invariant") {
    val df = synth()
    val got = Sketches.distinctProfile(df, col("series"), col("k"),
        rsd = 0.02)
      .orderBy("series").collect()
    assert(got.length == 3)
    for ((r, g) <- got.zipWithIndex) {
      assert(r.getAs[Long]("n_rows") == 4000L)
      val ndv = 500L * (g + 1)
      assert(r.getAs[Long]("ndv_exact") == ndv)
      val hll = r.getAs[Long]("ndv_hll")
      assert(math.abs(hll - ndv) <= 0.10 * ndv,
        s"series g$g: hll=$hll exact=$ndv")
    }
    // HLL register merge is a per-register max: commutative/associative,
    // so the estimate is identical under any partitioning
    val a = Sketches.distinctProfile(df.repartition(3), col("series"),
      col("k"), rsd = 0.02).orderBy("series").collect().toSeq
    val b = Sketches.distinctProfile(df.repartition(17, col("v")),
      col("series"), col("k"), rsd = 0.02)
      .orderBy("series").collect().toSeq
    assert(a.map(_.getAs[Long]("ndv_hll")) == b.map(_.getAs[Long]("ndv_hll")))
  }

  test("quantileProfile: every estimate's exact rank is inside the " +
      "n/accuracy window") {
    val df = synth()
    val got = Sketches.quantileProfile(df, col("series"), col("v"),
        accuracy = 10000)
      .orderBy("series").collect()
    val vals = (0 until 4000).map(_.toDouble / 4000.0)
    for (r <- got; (p, cName) <- Seq(0.50 -> "p50", 0.90 -> "p90",
        0.99 -> "p99")) {
      val q = r.getAs[Double](cName)
      val n = r.getAs[Long]("n_rows")
      assert(n == 4000L)
      val rLe = vals.count(_ <= q).toLong
      val rLt = vals.count(_ < q).toLong
      val slack = n / 10000.0 + 1
      assert(rLt <= p * n + slack && rLe >= p * n - slack,
        s"$cName=$q rank window [$rLt,$rLe] vs target ${p * n}")
    }
  }

  test("sketch plans are map-side combined (partial aggregation)") {
    for (q <- Seq("k01_sketch_distinct", "k02_sketch_quantiles")) {
      val p = SparkEntry.queries(q)(spark, TestSpark.sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("partial"), s"$q lacks partial aggregation:\n$p")
      assert(!p.contains("Window"), p)
    }
  }
}
