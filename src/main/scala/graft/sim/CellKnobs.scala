package graft.sim

/** Corpus-size-derived k-means cell knobs — [[LshKnobs]]' sibling for the
  * IVF/SemDeDup family, closing the same class of risk the LSH probes
  * measured: a cell count frozen at gate size turns quadratic at scale.
  *
  * Two regimes, because the two consumers have different cost models:
  *
  *  - **IVF search** ([[Ivf.ivfKnn]]): assignment costs n·c·d flops and a
  *    probe scans nprobe·(n/c) candidates, so the balanced choice is the
  *    standard c ≈ √n ([[cellsFor]]); recall then tracks the FRACTION of
  *    cells probed, so nprobe scales with c ([[nprobeFor]]) instead of
  *    staying an absolute count.
  *  - **SemDeDup** ([[graft.dedup.Dedup.semanticDedup]]): the dominant
  *    term is the within-cell pair verify, (n/c)² per cell × c cells =
  *    n²/c total — LINEAR in n only if c grows with n. [[cellsForPairs]]
  *    fixes the expected CELL SIZE (pair work = n·targetCell), the
  *    SemDeDup paper's own deployment shape (cluster count ∝ corpus).
  *    The n·c·d assignment term then grows super-linearly in flops, but
  *    it is a shuffle-free broadcast scan (and `fitFraction` keeps the
  *    FIT cost off the full corpus) — compute, not coordination.
  *
  * Gate queries keep their frozen knobs (specs pin recall/ground truth at
  * gate size); the `*Auto` entry points ([[Ivf.ivfKnnAuto]],
  * [[graft.dedup.Dedup.semanticDedupAuto]]) are the deployment path.
  */
object CellKnobs {

  /** Balanced IVF cell count: round(√n), clamped. */
  def cellsFor(corpusRows: Long, minCells: Int = 4,
               maxCells: Int = 1 << 20): Int = {
    require(corpusRows > 0, s"corpusRows must be positive: $corpusRows")
    require(minCells >= 1 && maxCells >= minCells,
      s"bad clamp [$minCells, $maxCells]")
    // clamp in Long domain: sqrt(Long.MaxValue) overflows Int
    val c = math.round(math.sqrt(corpusRows.toDouble))
    math.min(maxCells.toLong, math.max(minCells.toLong, c)).toInt
  }

  /** Probe width holding the PROBED FRACTION of cells constant (recall
    * tracks the fraction, not the absolute count, as c grows). */
  def nprobeFor(cells: Int, frac: Double = 0.25): Int = {
    require(cells >= 1, s"cells must be >= 1: $cells")
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1]: $frac")
    math.max(1, math.ceil(cells * frac).toInt)
  }

  /** Pair-work-bounded cell count for quadratic within-cell operators:
    * smallest c with expected cell size ≤ targetCell (total verify work
    * = n·targetCell, linear in n). Integer ceiling division — no
    * floating-point boundary overshoot (the [[LshKnobs.bitsFor]]
    * lesson). */
  def cellsForPairs(corpusRows: Long, targetCell: Long,
                    minCells: Int = 1, maxCells: Int = 1 << 24): Int = {
    require(corpusRows > 0, s"corpusRows must be positive: $corpusRows")
    require(targetCell > 0, s"targetCell must be positive: $targetCell")
    val c = (corpusRows + targetCell - 1) / targetCell
    math.min(maxCells.toLong, math.max(minCells.toLong, c)).toInt
  }
}
