package graft.sim

/** Corpus-size-derived SRP-LSH knobs — the code form of SURVEY §5's
  * measured deployment rule (BENCHLOG r08 knob verification): per-table
  * bucket size is corpus / 2^bits, so candidate-pair work per bucket grows
  * QUADRATICALLY in corpus size when bits stay frozen. The 10× scale probe
  * measured exactly that (s04 132×, d05 54×, d06 28× at frozen gate
  * knobs), and verified that raising bits with log2(corpus growth)
  * restores near-linear scaling (s04 297 s → 34.2 s).
  *
  * The two derivations:
  *  - [[bitsFor]]: smallest width keeping the EXPECTED bucket at or under
  *    `targetBucket` rows — bits = ceil(log2(n / targetBucket)). Candidate
  *    work per table is then n × targetBucket, linear in n.
  *  - [[tablesFor]]: widening from a reference (baseBits, baseTables)
  *    configuration multiplies a true pair's per-table collision
  *    probability by p^(bits−baseBits), where p = 1 − θ/π is the SRP
  *    per-bit agreement probability at the pair's cosine. Holding the
  *    expected number of colliding tables invariant (L·p^b = const)
  *    recovers recall: L' = ceil(L · p^(baseBits−bits)). `recallCos` is
  *    the similarity level recall is pinned at — the near-dup pairs
  *    themselves (cos ≳ 0.9), NOT the candidate filter threshold; using
  *    the threshold would over-provision tables by an order of magnitude
  *    for pairs that sit right at the boundary.
  *
  * Gate queries keep their frozen knobs (specs pin recall at gate size);
  * these derivations are the DEPLOYMENT path — call the `*Auto` entry
  * points ([[Knn.lshKnnAuto]], [[Knn.knnGraphAuto]],
  * [[graft.dedup.Dedup.embeddingNearDupsAuto]]) at a new corpus scale
  * instead of hand-porting the gate constants.
  */
object LshKnobs {

  /** `tablesCapped` is true when the recall-preserving table count
    * exceeded `maxTables` and was clamped — the pinned recall bound no
    * longer holds at `recallCos`. Never silent: the `*Auto` entry
    * points refuse capped knobs (raise targetBucket, or accept the
    * degraded bound explicitly by calling the manual-knob entry point
    * with the capped values). */
  final case class Knobs(bits: Int, tables: Int,
                         tablesCapped: Boolean = false)

  /** Per-bit signature-agreement probability of a pair at cosine `cos`
    * under sign-random-projection: p = 1 − arccos(cos)/π. */
  def srpCollisionProb(cos: Double): Double = {
    require(cos >= -1.0 && cos <= 1.0, s"cosine out of range: $cos")
    1.0 - math.acos(cos) / math.Pi
  }

  /** Smallest bit width with expected bucket size ≤ `targetBucket`.
    * Integer arithmetic throughout — 2^b ≥ ⌈n/target⌉ solved by bit
    * position, because the double log-ratio overshoots exact powers of
    * two (log2(2^29) > 29 in IEEE doubles) and would waste a bit (and
    * its ~1/p table compensation) at those corpus sizes. Clamped to
    * [minBits, maxBits] (63 bucket-hash bits is the physical ceiling of
    * the long signature; 30 is already a billion buckets). */
  def bitsFor(corpusRows: Long, targetBucket: Long,
              minBits: Int = 1, maxBits: Int = 30): Int = {
    require(corpusRows > 0, s"corpusRows must be positive: $corpusRows")
    require(targetBucket > 0, s"targetBucket must be positive: $targetBucket")
    require(minBits >= 1 && maxBits >= minBits,
      s"bad clamp [$minBits, $maxBits]")
    // q = ceil(n / target); minimal b has 2^b >= q. Divide-then-adjust:
    // n + target - 1 would wrap near Long.MaxValue.
    val q = corpusRows / targetBucket +
      (if (corpusRows % targetBucket == 0) 0L else 1L)
    val raw = if (q <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(q - 1)
    math.min(maxBits, math.max(minBits, raw))
  }

  /** The UNCAPPED recall-preserving table count: smallest integer L'
    * with L'·p^bits ≥ baseTables·p^baseBits for pairs at `recallCos`.
    * [[tablesFor]] clamps this at its cap; exposing the raw value keeps
    * the clamp observable ([[derive]]'s `tablesCapped`). */
  def tablesForUncapped(bits: Int, baseBits: Int, baseTables: Int,
                        recallCos: Double = 0.9): Double = {
    require(baseTables >= 1, s"baseTables must be >= 1: $baseTables")
    require(bits >= 1 && baseBits >= 1, s"bad bits: $bits / $baseBits")
    val p = srpCollisionProb(recallCos)
    baseTables * math.pow(p, (baseBits - bits).toDouble)
  }

  /** Table count preserving the reference configuration's expected
    * colliding-table count L·p^b for pairs at `recallCos`, after moving
    * from `baseBits` to `bits`. Never returns below 1; capped at
    * `maxTables` (signature cost is linear in L) — when the cap BINDS,
    * the recall bound degrades: use [[derive]] and check `tablesCapped`,
    * or [[tablesForUncapped]], rather than trusting this value blind. */
  def tablesFor(bits: Int, baseBits: Int, baseTables: Int,
                recallCos: Double = 0.9, maxTables: Int = 128): Int = {
    val scaled = tablesForUncapped(bits, baseBits, baseTables, recallCos)
    math.min(maxTables, math.max(1, math.ceil(scaled).toInt))
  }

  /** The `*Auto` entry points' shared cap policy: refuse capped knobs
    * with an actionable message rather than silently shipping a
    * degraded recall bound. `fallbackCall` names the manual-knob entry
    * point a caller can use to accept the clamp explicitly. */
  def requireUncapped(kn: Knobs, fallbackCall: String): Unit =
    require(!kn.tablesCapped,
      s"table compensation capped (bits=${kn.bits}): the pinned recall " +
        "bound no longer holds — raise targetBucket, or accept the " +
        s"degraded bound explicitly via $fallbackCall(bits=${kn.bits}, " +
        s"tables=${kn.tables})")

  /** One-stop derivation from corpus size: widen buckets to
    * `targetBucket` rows, then compensate tables to hold the reference
    * configuration's recall bound at `recallCos`. `tablesCapped` flags
    * a binding `maxTables` clamp (degraded recall bound) — callers must
    * not ignore it silently. */
  def derive(corpusRows: Long, targetBucket: Long,
             baseBits: Int, baseTables: Int,
             recallCos: Double = 0.9, maxTables: Int = 128): Knobs = {
    val bits = bitsFor(corpusRows, targetBucket)
    val uncapped =
      math.ceil(tablesForUncapped(bits, baseBits, baseTables, recallCos))
    Knobs(bits, tablesFor(bits, baseBits, baseTables, recallCos, maxTables),
      tablesCapped = uncapped > maxTables)
  }
}
