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

  test("mergeProfile: merged AND direct estimates inside 5*rsd of exact " +
      "under every partitioning (the contract that survives merge order)") {
    // 3 series x 8 sub-groups; keys overlap across subs so the union is
    // genuinely smaller than the sum of per-sub cardinalities.
    // NB a hard merged==direct (or partitioning-invariance) assertion
    // would be WRONG: the Datasketches union is order-sensitive in
    // sparse mode (measured r15 — a re-shuffle moves estimates ~1%).
    // The stable property is the accuracy envelope, checked under
    // three different partitionings.
    val rows = for {
      g <- 0 until 3
      i <- 0 until 4000
    } yield (s"g$g", s"sub${i % 8}", (i % (500 * (g + 1))).toLong)
    val df = rows.toDF("series", "sub", "k")
    for (d <- Seq(df, df.repartition(13, col("k")),
        df.repartition(29, col("sub")))) {
      val got = Sketches.mergeProfile(d, col("series"), col("sub"),
          col("k")).orderBy("series").collect()
      assert(got.length == 3)
      for ((r, g) <- got.zipWithIndex) {
        assert(r.getAs[Long]("n_subs") == 8L)
        val ndv = 500.0 * (g + 1)
        val rsd = r.getAs[Double]("rsd")
        assert(math.abs(r.getAs[Long]("ndv_merged") - ndv) <=
          5 * rsd * ndv, s"series g$g merged outside 5*rsd")
        assert(math.abs(r.getAs[Long]("ndv_direct") - ndv) <=
          5 * rsd * ndv, s"series g$g direct outside 5*rsd")
      }
    }
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

  test("amsF2: estimate within the sketch's error envelope of exact F2, " +
      "bit-deterministic across partitionings") {
    val df = synth()
    val got = Sketches.amsF2(df, col("series"), col("k"))
      .orderBy("series").collect()
    assert(got.length == 3)
    for ((r, g) <- got.zipWithIndex) {
      // synth: group g cycles i % (500*(g+1)) over 4000 rows, so the
      // first (4000 mod m) keys appear one extra time
      val m = 500L * (g + 1)
      val q = 4000L / m; val rem = 4000L % m
      val f2 = rem * (q + 1) * (q + 1) + (m - rem) * q * q
      assert(r.getAs[Long]("f2_exact") == f2)
      // AMS median-of-60 concentrates well within 1.0 relative error on
      // these sizes; the md5 coins make this a fixed measurement
      assert(r.getAs[Double]("rel_err") <= 1.0,
        s"series g$g rel_err ${r.getAs[Double]("rel_err")}")
    }
    val a = Sketches.amsF2(df.repartition(3), col("series"), col("k"))
      .orderBy("series").collect().map(_.getAs[Double]("f2_ams")).toSeq
    val b = Sketches.amsF2(df.repartition(17, col("v")), col("series"),
        col("k"))
      .orderBy("series").collect().map(_.getAs[Double]("f2_ams")).toSeq
    assert(a == b)
  }

  test("cmsTopK: one-sided guarantee holds exactly (estimate >= true), " +
      "deterministic across partitionings, exact on collision-free keys") {
    import spark.implicits._
    val docs = Seq("a a a b b c", "a b d e f g", "h i j k").toDF("text")
    val got = Sketches.cmsTopK(docs, col("text"), k = 11, depth = 4,
        width = 1024)
      .collect()
    assert(got.length == 11)
    for (r <- got) {
      assert(r.getAs[Long]("freq_cms") >= r.getAs[Long]("freq_exact"),
        s"${r.getString(0)}: CMS under-counted")
      assert(r.getAs[Long]("overestimate") ==
        r.getAs[Long]("freq_cms") - r.getAs[Long]("freq_exact"))
    }
    // 11 tokens into 4x1024 cells: every row hashes collision-free with
    // overwhelming md5 probability, so estimates are exact here
    assert(got.forall(_.getAs[Long]("overestimate") == 0L))
    val a = Sketches.cmsTopK(docs.repartition(5), col("text"), k = 11)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    val b = Sketches.cmsTopK(docs.repartition(2), col("text"), k = 11)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("cmsPointQuery refuses a cell table built with different " +
      "parameters (metadata stamp), and accepts the matching ones") {
    import spark.implicits._
    val docs = Seq("a a b", "b c d").toDF("text")
    val cells = Sketches.cmsCells(docs, col("text"),
      depth = 4, width = 1024)
    // matching params: plans fine
    Sketches.cmsPointQuery(cells, docs, col("text"), k = 2,
      depth = 4, width = 1024).queryExecution.analyzed
    // drifted width: must fail LOUDLY at plan time, not under-detect
    val e = intercept[IllegalArgumentException] {
      Sketches.cmsPointQuery(cells, docs, col("text"), k = 2,
        depth = 4, width = 512)
    }
    assert(e.getMessage.contains("width=512")
      && e.getMessage.contains("width=1024"))
    // a stripped frame (no metadata) falls back to the caller contract
    val bare = cells.select(col("r"), col("b"), col("cell")
      .as("cell", org.apache.spark.sql.types.Metadata.empty))
    Sketches.cmsPointQuery(bare, docs, col("text"), k = 2,
      depth = 4, width = 512).queryExecution.analyzed
  }

  test("bottomKOverlap: k >= |union| is exact by construction; exact_j " +
      "is set jaccard; output keys are ordered pairs") {
    val df = Seq(
      ("A", "w"), ("A", "x"), ("A", "y"), ("A", "z"), ("A", "w"),
      ("B", "x"), ("B", "y"), ("B", "z"), ("B", "q"),
      ("C", "only")).toDF("g", "e")
    val out = Sketches.bottomKOverlap(df, col("g"), col("e"), k = 64)
      .orderBy("source_a", "source_b").collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
        r.getLong(6)))).toMap
    // |A|=4, |B|=4, inter {x,y,z}=3, union 5 -> j=0.6; sketch holds all
    assert(m(("A", "B")) == ((4L, 4L, 0.6, 0.6, 5L)))
    // disjoint pair: zero both ways
    assert(m(("A", "C"))._3 == 0.0 && m(("A", "C"))._4 == 0.0)
    assert(m.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")),
      "every unordered pair exactly once, a < b")
  }

  test("bottomKOverlap estimate is partitioning-invariant (mergeable " +
      "sketch) and inside the KMV envelope when k < |union|") {
    val rows = for (g <- Seq("A", "B"); i <- 0 until 3000
      // 2000-element overlap: true j = 2000 / 4000 = 0.5
      ) yield (g, if (g == "A") s"e$i" else s"e${i + 1000}")
    val df = rows.toDF("g", "e")
    val r1 = Sketches.bottomKOverlap(df, col("g"), col("e"), k = 256)
      .collect()(0)
    val r2 = Sketches.bottomKOverlap(df.repartition(13), col("g"),
      col("e"), k = 256).collect()(0)
    assert(r1.toSeq == r2.toSeq, "partitioning must not change the sketch")
    assert(r1.getLong(6) == 256L, "k_used saturates below union size")
    val (exact, est) = (r1.getDouble(4), r1.getDouble(5))
    assert(exact == 0.5)
    // KMV rse ~ 1/sqrt(k) = 0.0625; 5 sigma on the jaccard scale
    assert(math.abs(est - exact) <= 5.0 / math.sqrt(256),
      s"estimate $est too far from $exact")
  }

  test("sketch plans are map-side combined (partial aggregation)") {
    // k05's bottom-k is the bounded heap aggregate, never a
    // row_number window (the s04 ranking discipline)
    for (q <- Seq("k01_sketch_distinct", "k02_sketch_quantiles",
        "k03_ams_f2", "k05_bottomk_overlap")) {
      val p = SparkEntry.queries(q)(spark, TestSpark.sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("partial"), s"$q lacks partial aggregation:\n$p")
      assert(!p.contains("Window"), p)
    }
  }

  test("prioritySample matches a brute-force scala twin: same sample, " +
      "same tau, same Horvitz-Thompson estimates") {
    import graft.operators.Sketches
    import spark.implicits._
    val seed = "psamp-spec"
    val k = 5
    val rows = (0L until 40L).map(i => (i, (i % 7 + 1) * 10.0))
    // brute-force twin of the md5 priority
    def q(id: Long, w: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((seed + id.toString).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) /
        1152921504606846976.0
      w / u
    }
    val byQ = rows.map { case (id, w) => (id, w, q(id, w)) }
      .sortBy { case (id, _, qq) => (-qq, id) }
    val tau = byQ(k)._3
    val want = byQ.take(k)
      .map { case (id, w, qq) => (id, w, qq, math.max(w, tau)) }
      .sortBy(_._1)
    val got = Sketches.prioritySample(rows.toDF("doc_id", "wt"),
        col("doc_id"), col("wt"), seed, k)
      .filter(col("kind") === "sample").orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == want)
    // n <= k degenerates to the population with tau = 0 and est = w
    val small = Sketches.prioritySample(
        rows.take(3).toDF("doc_id", "wt"),
        col("doc_id"), col("wt"), seed, k).orderBy("kind", "doc_id")
      .collect()
    assert(small.length == 4)
    assert(small.filter(_.getString(0) == "sample").forall(r =>
      r.getDouble(4) == r.getDouble(2)))
    val totalRow = small.last
    assert(totalRow.getDouble(3) == 0.0 &&
      totalRow.getDouble(4) == totalRow.getDouble(2))
  }
}
