package graft.util

import org.apache.spark.sql.SparkSession

/** Library-side guard for the ObjectHashAggregate sort-fallback cliff
  * (VERDICT r18 item 1, BENCHLOG r18 item 6).
  *
  * Typed-buffer aggregates (Datasketches `hll_sketch_agg` /
  * `hll_union_agg`, `percentile_approx`, this repo's
  * [[graft.functions.TopKAggregate]] family) plan as
  * `ObjectHashAggregateExec`, which silently falls back to SORT-BASED
  * aggregation once a task has seen
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * groups (Spark default: 128). The fallback is correct but sorts the
  * task's whole remaining input — measured at 2.1× wall on a 100M-row
  * merge profile with 210 groups. Until r18 only the Bench/Verify
  * harness sessions raised the threshold; a library consumer calling
  * [[graft.operators.Sketches.mergeProfile]] from their own session hit
  * the cliff silently.
  *
  * [[ensure]] makes the headroom a LIBRARY guarantee: called at the top
  * of every typed-buffer profile path, it raises the session threshold
  * to [[Floor]] when it is below (never lowers it), logging one loud
  * warning naming the old and new values. Raising is the
  * safe direction at this floor: the sketch buffers these paths hold
  * are KB-sized (an lgK=12 HLL is ≤4 KB dense, a GK summary at
  * accuracy=10000 is tens of KB, a top-k heap is k entries), so
  * [[Floor]]=4096 in-memory group buffers bound a task at tens of MB —
  * far under an executor's aggregation memory, and far cheaper than
  * sorting the corpus. Past ~4096 groups PER TASK the hash map's memory
  * would bind first and sort-based aggregation becomes the right plan,
  * so the guard deliberately stops there: it removes the silent cliff
  * at modest group counts (the overwhelmingly common profile shape —
  * series × days), it does not pretend unbounded group domains are
  * hash-aggregable.
  *
  * Opt-out: set `spark.graft.ohaAutoRaise=false` to keep a
  * deliberately lower threshold (e.g. a memory-tight session that
  * prefers the sort); the guard then only logs the cliff warning and
  * leaves the conf untouched. Sessions that already meet the floor
  * (Bench/Verify set 4096) are never touched and never logged.
  */
object OhaHeadroom {
  val Key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  val OptOutKey = "spark.graft.ohaAutoRaise"
  val Floor = 4096

  /** Per-task in-memory group budget for [[ensureSmallBuffer]]'s derived
    * floor — the hash map these aggregates hold before the count-based
    * fallback would fire. 64 MB is conservative next to what the
    * fixed-width HashAggregate path routinely holds (it spills under
    * memory pressure; ObjectHashAggregate's fallback is count-based
    * only, which is why the budget must be explicit). */
  val TargetTaskBytes: Long = 64L << 20

  /** Ceiling for any derived floor: past this, group domains stop being
    * hash-aggregable in general and sort-based aggregation is the right
    * plan — the guard removes silent cliffs at modest group counts, it
    * does not pretend unbounded domains fit a hash map. */
  val MaxFloor: Int = 1 << 19

  /** Estimated hash-map entry overhead on top of the aggregate buffer
    * itself (key row + map slot + object headers). */
  val EntryOverheadBytes: Long = 128L

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Raise the session's OHA sort-fallback threshold to [[Floor]] if it
    * is below (and `spark.graft.ohaAutoRaise` is not "false"). Returns
    * the threshold the session ends up with, so callers/specs can pin
    * the contract. Idempotent; call it from any operator whose plan
    * holds a typed-buffer aggregate with more than ~128 groups. */
  def ensure(spark: SparkSession): Int = ensureFloor(spark, Floor)

  /** [[ensure]] for TINY per-group buffers (the bounded top-k heap
    * family: a [[graft.functions.TopKByScore]] buffer is ~16·k+64
    * bytes): derives the floor from the [[TargetTaskBytes]] memory
    * budget instead of the blanket [[Floor]], because the group domain
    * of a per-PROBE ranking aggregate scales with the probe set, not
    * with a profile's series×day grid. Without this, a default-conf
    * session running [[graft.sim.Ivf.ivfKnnAuto]] past ~128 probes per
    * task silently sort-falls-back — sorting the full scored CANDIDATE
    * stream, which is probes × nprobe × cell-size rows (measured: the
    * 2M-vector IvfScaleProbe leg wrote 55 GB of sort spill and died on
    * disk; the same leg's aggregate state is ~100k probes × ~240 B =
    * 24 MB). The derived floor is clamped to [[Floor]] .. [[MaxFloor]];
    * the session threshold is never lowered, and the [[OptOutKey]]
    * opt-out applies. NOTE the raise is session-wide (Spark reads the
    * conf at action time): a session mixing these entry points with a
    * LARGER-buffer aggregate whose per-task group count also exceeds
    * [[Floor]] should opt out and set the threshold per its own memory
    * budget. */
  def ensureSmallBuffer(spark: SparkSession, bufferBytes: Long): Int = {
    require(bufferBytes > 0, s"bufferBytes must be positive: $bufferBytes")
    val perEntry = bufferBytes + EntryOverheadBytes
    val derived = math.min(MaxFloor.toLong,
      math.max(Floor.toLong, TargetTaskBytes / perEntry)).toInt
    ensureFloor(spark, derived)
  }

  private def ensureFloor(spark: SparkSession, floor: Int): Int = {
    // Spark's default when unset is 128 (SQLConf
    // OBJECT_AGG_SORT_BASED_FALLBACK_THRESHOLD); read defensively in
    // case a future Spark changes it
    val current =
      try spark.conf.get(Key, "128").toInt
      catch { case _: NumberFormatException => 128 }
    if (current >= floor) current
    else if (spark.conf.get(OptOutKey, "true") == "false") {
      log.warn(
        s"graft: $Key=$current is below the recommended $floor and " +
        s"$OptOutKey=false — typed-buffer profile aggregates " +
        "(hll_sketch_agg / percentile_approx / top-k heaps) will fall " +
        "back to sort-based aggregation past " + current +
        " groups per task, sorting the task's whole input (measured " +
        "2.1x wall at 100M rows). Raise the threshold or accept the " +
        "sort.")
      current
    } else {
      log.warn(
        s"graft: raising $Key from $current to $floor for this session " +
        "— typed-buffer profile aggregates silently fall back to " +
        "sort-based aggregation past the threshold, sorting the " +
        "task's whole input (measured 2.1x wall at 100M rows); the " +
        s"buffers bound a task's $floor in-memory groups at tens of " +
        s"MB. Set $OptOutKey=false to keep the lower threshold.")
      spark.conf.set(Key, floor.toString)
      floor
    }
  }
}
