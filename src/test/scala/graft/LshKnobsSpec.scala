package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.{Knn, LshKnobs}
import graft.dedup.Dedup

/** Pins the coded form of SURVEY §5's SRP-LSH scaling rule: bits from a
  * target bucket size, tables preserving the expected colliding-table
  * count at the recall-pinned cosine — and that the `*Auto` entry points
  * at gate-equivalent sizes produce EXACTLY the frozen-knob gate plans
  * (so the gate's recall specs transfer to the auto path verbatim). */
class LshKnobsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bitsFor reproduces the gate and 10x-probe knobs") {
    // kNN anchor: 2000-row bench corpus / 125-row target = gate b=4;
    // one decade of growth adds ceil(log2(10)) = 4 bits.
    assert(LshKnobs.bitsFor(2000, Knn.KnnTargetBucket) == 4)
    assert(LshKnobs.bitsFor(20000, Knn.KnnTargetBucket) == 8)
    // near-dup anchor: both gate corpus sizes land on the gate b=1.
    assert(LshKnobs.bitsFor(500, Dedup.NearDupTargetBucket) == 1)
    assert(LshKnobs.bitsFor(2000, Dedup.NearDupTargetBucket) == 1)
    assert(LshKnobs.bitsFor(20000, Dedup.NearDupTargetBucket) == 5)
    // clamps: tiny corpora never go below minBits, huge never above max.
    assert(LshKnobs.bitsFor(1, 1000) == 1)
    assert(LshKnobs.bitsFor(Long.MaxValue, 1) == 30)
    // exact powers of two stay minimal (the double log2 ratio overshoots
    // 2^29 in IEEE arithmetic; integer bit math must not)
    for (b <- Seq(10, 20, 29)) {
      assert(LshKnobs.bitsFor((1L << b) * 1000, 1000, maxBits = 40) == b,
        s"2^$b exact")
      assert(LshKnobs.bitsFor((1L << b) * 1000 + 1, 1000, maxBits = 40)
        == b + 1, s"2^$b + 1")
    }
  }

  test("bits grow with log2 of corpus growth (the measured rule)") {
    for (growth <- Seq(2L, 8L, 10L, 100L, 1000L)) {
      val base = LshKnobs.bitsFor(2000, 125)
      val grown = LshKnobs.bitsFor(2000 * growth, 125)
      val expect = base + math.ceil(math.log(growth.toDouble) /
        math.log(2)).toInt
      assert(math.abs(grown - expect) <= 1,
        s"growth $growth: $base -> $grown, expected ~$expect")
    }
  }

  test("tablesFor: identity at the anchor, compensates when widening") {
    // no widening -> the reference table count, exactly
    assert(LshKnobs.tablesFor(4, 4, 8) == 8)
    assert(LshKnobs.tablesFor(1, 1, 18) == 18)
    // widening multiplies L by p^-(extra bits); p(0.9) ~ 0.856
    val w = LshKnobs.tablesFor(8, 4, 8)
    assert(w > 8 && w <= 20, s"b 4->8 at cos 0.9 gave L=$w")
    // monotone in bits, capped
    val seq = (4 to 14).map(LshKnobs.tablesFor(_, 4, 8, maxTables = 20))
    assert(seq == seq.sorted && seq.last == 20)
    // narrowing reduces L but never below 1
    val narrow = LshKnobs.tablesFor(1, 8, 8)
    assert(narrow >= 1 && narrow < 8, s"narrowing gave L=$narrow")
  }

  test("a binding maxTables cap is LOUD: flagged in Knobs, refused by " +
      "the auto entry points") {
    import graft.dedup.Dedup
    // NearDup anchor (baseBits=1, L=18, p(0.9)~0.856): the uncapped
    // compensation crosses 128 around bits=14 (corpus ~16M at
    // targetBucket=1000) — the ADVICE-flagged silent-degradation point
    val capped = LshKnobs.derive(20000000L, 1000L, 1, 18)
    assert(capped.tablesCapped, s"expected capped knobs, got $capped")
    assert(capped.tables == 128)
    // gate-scale derivations stay uncapped
    assert(!LshKnobs.derive(2000L, 1000L, 1, 18).tablesCapped)
    assert(!LshKnobs.derive(500L, 125L, 4, 8).tablesCapped)
    // the deployment entry point refuses the degraded bound rather than
    // silently shipping it
    val emb = graft.sources.Tables(spark, TestSpark.sf, "embeddings")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupsAuto(emb, "vec_id", "embedding",
        org.apache.spark.sql.functions.col("vec_id") % 20 === 0,
        threshold = 0.25, corpusRows = Some(20000000L))
    }
    assert(e.getMessage.contains("capped"))
  }

  test("srpCollisionProb matches the SRP geometry") {
    assert(math.abs(LshKnobs.srpCollisionProb(1.0) - 1.0) < 1e-12)
    assert(math.abs(LshKnobs.srpCollisionProb(0.0) - 0.5) < 1e-12)
    assert(math.abs(LshKnobs.srpCollisionProb(-1.0)) < 1e-12)
  }

  test("auto entry points at gate-equivalent size == frozen-knob gates") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet

    // corpusRows=2000 derives exactly (b=4, L=8): identical output to the
    // s02/s04 gate calls, signature seeds included.
    assert(rows(Knn.lshKnnAuto(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 5, k = 3,
        corpusRows = Some(2000))) ==
      rows(Knn.lshKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 5, k = 3,
        bitsPerTable = 4, nTables = 8)))
    assert(rows(Knn.knnGraphAuto(emb, "vec_id", "embedding", k = 3,
        corpusRows = Some(2000))) ==
      rows(Knn.knnGraph(emb, "vec_id", "embedding", k = 3,
        bitsPerTable = 4, nTables = 8)))
    // d05's anchor: the TRUE sf0.001 count (auto counts it — None)
    // derives the gate (b=1, L=18).
    assert(rows(Dedup.embeddingNearDupsAuto(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") % 20 === 0, threshold = 0.25)) ==
      rows(Dedup.embeddingNearDups(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") % 20 === 0, threshold = 0.25,
        bitsPerBand = 1, nBands = 18)))
  }

  test("auto kNN from the true corpus count keeps gate-level recall") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    val exact = Knn.bruteForceKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Knn.lshKnnAuto(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"auto-knob recall@3 = $recall, expected >= 0.5")
  }
}
