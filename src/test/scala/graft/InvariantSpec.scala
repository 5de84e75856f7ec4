package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{TopKBuffer, TopKStrBuffer}
import graft.sim.{CellKnobs, LshKnobs}

/** Randomized (seeded, deterministic) invariants for the pure-JVM
  * building blocks — the properties partial aggregation at 100 TB rests
  * on: any split-and-merge of a top-k buffer equals one sequential pass
  * (map-side combine correctness), NaN totality, and the knob
  * derivations' minimality contracts. No SparkSession needed: these run
  * hundreds of cases in milliseconds. */
class InvariantSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(20260813L)

  private def randomScores(n: Int): Array[Double] =
    Array.fill(n)(rng.nextInt(6) match {
      case 0 => Double.NaN // must be ignored, never corrupt the heap
      case 1 => 0.0
      case 2 => -0.0
      case 3 => rng.nextInt(4).toDouble // force score ties
      case _ => rng.nextDouble() * 200 - 100
    })

  test("TopKBuffer: split-merge == sequential == sorted reference, " +
      "NaN-total, over 300 random streams") {
    for (_ <- 1 to 300) {
      val n = 1 + rng.nextInt(60)
      val k = 1 + rng.nextInt(8)
      val scores = randomScores(n)
      val ids = Array.fill(n)(rng.nextInt(20).toLong) // id ties too
      val seq = new TopKBuffer(k)
      for (i <- 0 until n) seq.insert(scores(i), ids(i))
      // reference: drop NaN, order (score desc, id asc), take k — with
      // the BUFFER's tie rule (== score equality, so -0.0 ties 0.0 and
      // the id breaks it; Double.compare would rank -0.0 below 0.0 and
      // select differently)
      val ref = (0 until n).filterNot(i => scores(i).isNaN)
        .map(i => (scores(i), ids(i)))
        .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
        .take(k)
      // the buffer's tie order uses == (so -0.0 ties 0.0); compare SETS
      // of (compare-key) to stay robust to that: use the score bits via
      // toString of the pair list after normalizing -0.0 to 0.0
      def norm(p: (Double, Long)) =
        (if (p._1 == 0.0) 0.0 else p._1, p._2)
      assert(seq.sorted.map(norm).toSeq.sortBy(p => (-p._1, p._2)) ==
        ref.map(norm).sortBy(p => (-p._1, p._2)),
        s"n=$n k=$k")
      // split-merge: any partition of the stream merges to the same set
      val cut = rng.nextInt(n + 1)
      val a = new TopKBuffer(k); val b = new TopKBuffer(k)
      for (i <- 0 until cut) a.insert(scores(i), ids(i))
      for (i <- cut until n) b.insert(scores(i), ids(i))
      a.merge(b)
      assert(a.sorted.map(norm).toSeq.sortBy(p => (-p._1, p._2)) ==
        seq.sorted.map(norm).toSeq.sortBy(p => (-p._1, p._2)),
        s"split at $cut of $n, k=$k")
    }
  }

  test("TopKStrBuffer: same invariants with string ids") {
    for (_ <- 1 to 200) {
      val n = 1 + rng.nextInt(40)
      val k = 1 + rng.nextInt(6)
      val scores = randomScores(n)
      val ids = Array.fill(n)(UTF8String.fromString(
        "tok" + rng.nextInt(12)))
      val seq = new TopKStrBuffer(k)
      for (i <- 0 until n) seq.insert(scores(i), ids(i))
      val ref = (0 until n).filterNot(i => scores(i).isNaN)
        .map(i => (scores(i), ids(i)))
        .sortWith((a, b) => a._1 > b._1 ||
          (a._1 == b._1 && a._2.compareTo(b._2) < 0))
        .take(k)
      def norm(p: (Double, UTF8String)) =
        ((if (p._1 == 0.0) 0.0 else p._1, p._2.toString))
      def key(p: (Double, String)) = (-p._1, p._2)
      assert(seq.sorted.map(norm).toSeq.sortBy(key) ==
        ref.map(norm).sortBy(key), s"n=$n k=$k")
      val cut = rng.nextInt(n + 1)
      val a = new TopKStrBuffer(k); val b = new TopKStrBuffer(k)
      for (i <- 0 until cut) a.insert(scores(i), ids(i))
      for (i <- cut until n) b.insert(scores(i), ids(i))
      a.merge(b)
      assert(a.sorted.map(norm).toSeq.sortBy(key) ==
        seq.sorted.map(norm).toSeq.sortBy(key), s"cut=$cut")
    }
  }

  test("LshKnobs.bitsFor minimality: 2^bits buckets suffice and " +
      "2^(bits-1) would not, across random (n, target)") {
    for (_ <- 1 to 500) {
      val n = 1L + math.abs(rng.nextLong()) % (1L << 50)
      val target = 1L + math.abs(rng.nextLong()) % 100000
      val b = LshKnobs.bitsFor(n, target, minBits = 1, maxBits = 62)
      // sufficiency (unless clamped at maxBits)
      if (b < 62)
        assert(BigInt(1) << b >= (BigInt(n) + target - 1) / target,
          s"n=$n target=$target b=$b insufficient")
      // minimality (unless clamped at minBits)
      if (b > 1)
        assert(BigInt(1) << (b - 1) < (BigInt(n) + target - 1) / target,
          s"n=$n target=$target b=$b not minimal")
    }
  }

  test("CellKnobs invariants across random inputs") {
    for (_ <- 1 to 500) {
      val n = 1L + math.abs(rng.nextLong()) % (1L << 50)
      val target = 1L + math.abs(rng.nextLong()) % 100000
      val c = CellKnobs.cellsForPairs(n, target)
      assert(c >= 1 && c <= (1 << 17))
      // sufficiency: c cells keep the expected cell at/under target
      // (unless the broadcast cap binds)
      if (c < (1 << 17))
        assert(BigInt(c) * target >= n, s"n=$n target=$target c=$c")
      // minimality
      if (c > 1) assert(BigInt(c - 1) * target < n,
        s"n=$n target=$target c=$c not minimal")
      val cells = CellKnobs.cellsFor(n)
      val np = CellKnobs.nprobeFor(cells)
      assert(np >= 1 && np <= cells, s"cells=$cells nprobe=$np")
    }
  }
}
