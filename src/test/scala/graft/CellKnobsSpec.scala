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

  test("nprobeFor holds the probed fraction as c grows") {
    assert(CellKnobs.nprobeFor(16) == 4) // the s03 gate ratio
    assert(CellKnobs.nprobeFor(100) == 25)
    assert(CellKnobs.nprobeFor(1, 0.01) == 1) // floor at 1
  }

  test("cellsForPairs bounds the cell size with integer math") {
    assert(CellKnobs.cellsForPairs(500, 1000) == 1)
    assert(CellKnobs.cellsForPairs(8000, 500) == 16) // the d08 gate c
    assert(CellKnobs.cellsForPairs(1000000, 1000) == 1000)
    // exact boundary stays minimal (no double overshoot)
    assert(CellKnobs.cellsForPairs(1L << 40, 1L << 20) == (1 << 20))
    // pair work n * targetCell is scale-invariant: c grows linearly
    assert(CellKnobs.cellsForPairs(2000000, 1000) ==
      2 * CellKnobs.cellsForPairs(1000000, 1000))
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
