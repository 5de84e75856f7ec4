package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Knn
import graft.functions.Vectors

class KnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(0.9f, 0.1f, 0f, 0f)),
    (2L, Seq(0f, 1f, 0f, 0f)),
    (3L, Seq(0f, 0.9f, 0.1f, 0f)),
    (4L, Seq(-1f, 0f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceKnn ranks by cosine desc with id tiebreak") {
    val rows = Knn.bruteForceKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") === 0, k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // cos(v0,v1) ~ 0.994; cos(v0,v2)=cos(v0,v3)=0 (tie -> id asc); v4 = -1
    assert(rows.toSeq == Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3)))
  }

  test("probe row itself is excluded") {
    val rows = Knn.bruteForceKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") === 0, k = 10).collect()
    assert(rows.forall(r => r.getLong(1) != 0L))
  }

  test("lshKnn returns valid cosine-ordered subsets per probe") {
    val rows = Knn.lshKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 2, k = 3, bitsPerTable = 2, nTables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byProbe = rows.groupBy(_._1)
    for ((p, rs) <- byProbe) {
      val ranks = rs.map(_._3).sorted
      assert(ranks.toSeq == (1 to rs.length).toSeq,
        s"ranks for probe $p must be contiguous from 1, got ${ranks.toSeq}")
      assert(rs.forall(_._2 != p), "probe must not be its own neighbor")
    }
  }

  test("lshKnn ground truth at sf0.001: ranked correctly, solid recall@3") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    val exact = Knn.bruteForceKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Knn.lshKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3,
        bitsPerTable = 4, nTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // ranks are contiguous from 1 per probe (ordering is exact cosine)
    for ((p, rs) <- approx.groupBy(_._1))
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq, s"$p")
    // recall@3 across probes (deterministic on this corpus + hashes)
    val hits = approx.map(t => (t._1, t._2)).toSet intersect exact
    val recall = hits.size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@3 = $recall, expected >= 0.5")
  }

  test("knnGraph ground truth at sf0.001: exact scores, corpus recall@3") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    // brute-force graph over the whole corpus = bruteForceKnn with every
    // row as a probe (bounded corpus at spec scale)
    val exact = Knn.bruteForceKnn(emb, "vec_id", "embedding",
        probeFilter = lit(true), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Knn.knnGraph(emb, "vec_id", "embedding", k = 3,
        bitsPerTable = 4, nTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every row must get SOME neighbors and contiguous ranks from 1
    val byProbe = approx.groupBy(_._1)
    assert(byProbe.size == emb.count(),
      "every corpus row must appear as a graph source")
    for ((p, rs) <- byProbe) {
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq, s"$p")
      assert(rs.forall(_._2 != p), s"$p must not be its own neighbor")
    }
    // same LSH params as s02 -> same per-pair collision odds; corpus-level
    // recall@3 (deterministic on this corpus + hashes)
    val recall =
      (approx.map(t => (t._1, t._2)).toSet intersect exact).size.toDouble /
        exact.size
    assert(recall >= 0.5, s"graph recall@3 = $recall, expected >= 0.5")
  }

  test("ivfKnn ground truth at sf0.001: nprobe=4/16 keeps solid recall@3") {
    import graft.sim.Ivf
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    val exact = Knn.bruteForceKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3, c = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@3 = $recall, expected >= 0.5")
  }

  test("ivfKnn fit-on-sample (fitFraction=0.2) keeps recall@3 at sf0.001") {
    import graft.sim.Ivf
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    val exact = Knn.bruteForceKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // The 100 TB posture: k-means fit sees a 20% sample (deterministic
    // seed), seeds come from the FULL corpus (always c of them), the full
    // corpus is assigned exactly once.
    def run() = Ivf.ivfKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3, c = 16, nprobe = 4,
        fitFraction = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = run()
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"sample-fit recall@3 = $recall, expected >= 0.5")
    assert(run() == approx, "sample fit must be deterministic")
  }

  test("maxBucket cap: no-op at corpus size, removes degenerate buckets") {
    import graft.sources.Tables
    val corpus = Tables(spark, TestSpark.sf, "embeddings")
    val n = corpus.count().toInt
    def run(cap: Option[Int]) = Knn.lshKnn(corpus, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3,
        bitsPerTable = 4, nTables = 8, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // a cap at corpus size can drop nothing: results identical to off
    assert(run(Some(n)) == run(None), "corpus-size cap must change nothing")
    // off is the DEFAULT path: no bucket-count aggregate enters the plan
    val p = Knn.lshKnn(corpus, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3,
        bitsPerTable = 4, nTables = 8)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("__n"), "maxBucket=None must not add the count agg")
    // degenerate corpus: constant vectors collapse into ONE bucket per
    // table (the quadratic hot-key case); the cap removes those buckets
    val flat = Seq.tabulate(50)(i => (i.toLong, Seq(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val hot = Knn.lshKnn(flat, "vec_id", "embedding",
        probeFilter = col("vec_id") < 5, k = 3,
        bitsPerTable = 2, nTables = 2, maxBucket = Some(10))
    assert(hot.count() == 0, "capped hot buckets must emit no candidates")
    // knnGraph honors the same knob with the same no-op bound
    def g(cap: Option[Int]) = Knn.knnGraph(corpus, "vec_id", "embedding",
        k = 3, bitsPerTable = 4, nTables = 8, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g(Some(n)) == g(None))
  }

  test("native SRP signatures are bit-identical to the HOF formulation") {
    val emb10 = Seq.tabulate(10)(i =>
      (i.toLong, Seq.tabulate(16)(d => ((i * 31 + d * 7) % 13 - 6) / 6f)))
      .toDF("vec_id", "embedding")
    val native = emb10.select(col("vec_id"),
        Knn.srpBands("embedding", nTables = 6, bits = 5).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = emb10.select(col("vec_id"),
        Knn.srpBandsHof("embedding", nTables = 6, bits = 5).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == hof)
    assert(native.values.flatten.toSet.size > 1, "signatures must vary")
  }

  test("srpPlanes: signatures rebuilt from the exported plane table " +
      "equal the native kernel's (the s02/s04 oracle's model contract)") {
    // Rebuild signatures from srpPlanes with generic DataFrame ops
    // (ordered projection sum, sign bits — exactly what the DuckDB
    // oracle does) and require bit-equality with srpBands: pins that
    // the exported "model" IS the kernel's plane set.
    val (nT, b) = (6, 5)
    val emb10 = Seq.tabulate(10)(i =>
      (i.toLong, Seq.tabulate(16)(d => ((i * 31 + d * 7) % 13 - 6) / 6f)))
      .toDF("vec_id", "embedding")
    val planes = Knn.srpPlanes(spark, dim = 16, nTables = nT, bits = b)
    // the corpus-derived builder (what the gates export) is the same
    // table
    val fromCorpus = Knn.srpPlanesFromCorpus(emb10, "embedding",
        nTables = nT, bits = b)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(planes.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      == fromCorpus)
    val rebuilt = emb10
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") + 1).as("i"), col("x"))
      .join(planes, "i")
      .groupBy("vec_id", "p")
      // per-plane ordered accumulation: one product per (p, i), summed
      // ascending-index via a sorted collect (bit-equal to the kernel's
      // ascending loop because addition order matches)
      .agg(array_sort(collect_list(struct(col("i"),
        (col("x").cast("double") * col("w")).as("t")))).as("ts"))
      .select(col("vec_id"), col("p"),
        aggregate(col("ts"), lit(0.0), (a, e) => a + e.getField("t"))
          .as("s"))
      .groupBy(col("vec_id"), expr(s"p div $b").as("tbl"))
      .agg(sum(when(col("s") > 0,
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, $b) AS INT))"))
        .otherwise(0L)).as("bucket"))
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("tbl"),
        col("bucket")))), e => e.getField("bucket")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = emb10.select(col("vec_id"),
        Knn.srpBands("embedding", nTables = nT, bits = b).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rebuilt == native)
  }

  test("ivfKnn: nprobe = c recovers exact brute-force ranking") {
    import graft.sim.Ivf
    val exact = Knn.bruteForceKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivf = Ivf.ivfKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 2, k = 3, c = 2, nprobe = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == exact, s"ivf=$ivf exact=$exact")
  }

  test("ivfKnn: nprobe < c returns a valid ranked subset per probe") {
    import graft.sim.Ivf
    val rows = Ivf.ivfKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 2, k = 3, c = 3, nprobe = 1, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    for ((p, rs) <- rows.groupBy(_._1)) {
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq)
      assert(rs.forall(_._2 != p))
    }
  }

  test("cosine kernel matches scalar math") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val got = df.select(Vectors.cosine(col("a"), col("b"))).head.getDouble(0)
    val expect = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - expect) < 1e-12)
  }
}
