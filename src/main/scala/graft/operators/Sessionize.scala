package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a session is a maximal run of one key's
  * events whose inter-event gap is <= gapSec.
  *
  * Scale shape: both window functions (the lag that flags session starts
  * and the running sum that numbers them) share ONE partitioning — hash
  * by the key, per-key local sort — so the whole operator is a single
  * shuffle followed by a partial-aggregatable (key, session) rollup.
  * Nothing is ever globally sorted and no per-key state outlives its
  * task. A pathologically hot key serializes within its one task — the
  * mitigation is [[Sessionize.sessionizeSharded]], which pre-splits the
  * key by a coarse time shard and merges adjacent spans.
  *
  * Determinism: `tieCol` must make (tsCol, tieCol) unique per key so the
  * running-sum frame (RANGE to current row) degenerates to a row frame
  * identically in every engine.
  */
object Sessionize {
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val ts: Column = col(tsCol)
    val newSession =
      when(ts - lag(ts, 1).over(w) <= gapSec, lit(0L)).otherwise(lit(1L))
    events
      .withColumn("__new", newSession)
      .withColumn("session_idx", sum(col("__new")).over(w))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(ts).as("start_sec"), max(ts).as("end_sec"))
      .withColumn("duration_sec", col("end_sec") - col("start_sec"))
  }

  /** Hot-key-safe sessionization, result-identical to [[sessionize]] for
    * every `shardSec` > 0 (spec-pinned on the gate corpus).
    *
    * Pass 1 partitions the window by (key, floor(ts / shardSec)) — a
    * pathological key's events now spread over #shards tasks instead of
    * serializing in one — and reduces each shard to its local session
    * SPANS (start, end, count). Pass 2 runs the same gap rule over the
    * spans per key: consecutive spans merge iff the boundary gap is the
    * same inter-event gap the unsharded operator would have seen, so the
    * merge is exact, and numbering by span start reproduces the original
    * session numbering. The key's pass-2 row count is bounded by
    * sessions + occupied shards, not events — the whole point: the hot
    * key's per-task work is O(events/shard) then O(spans).
    *
    * Cost on NON-skewed data is one extra (narrow) shuffle of the span
    * frame; keep the default single-pass operator unless a key can
    * realistically exceed one task's memory/time budget. `tsCol` must be
    * integral (epoch seconds), as in [[sessionize]]'s gate usage. */
  def sessionizeSharded(events: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, gapSec: Long,
                        shardSec: Long): DataFrame = {
    require(shardSec > 0, s"shardSec must be positive: $shardSec")
    val ts: Column = col(tsCol)
    // exact integral floor-division (ts < 2^53 holds for epoch seconds)
    val shard = ((ts - pmod(ts, lit(shardSec))) / shardSec).cast("long")
    val w1 = Window.partitionBy(col(keyCol), col("__shard"))
      .orderBy(col(tsCol), col(tieCol))
    val newSpan =
      when(ts - lag(ts, 1).over(w1) <= gapSec, lit(0L)).otherwise(lit(1L))
    // (key, shard, span) rollup reuses w1's (key, shard) partitioning —
    // no extra exchange (ClusteredDistribution rule, SessionizeSpec).
    val spans = events
      .withColumn("__shard", shard)
      .withColumn("__new", newSpan)
      .withColumn("__span", sum(col("__new")).over(w1))
      .groupBy(col(keyCol), col("__shard"), col("__span"))
      .agg(count(lit(1)).as("__n"),
        min(ts).as("__start"), max(ts).as("__end"))
    val w2 = Window.partitionBy(keyCol).orderBy(col("__start"))
    val newSession =
      when(col("__start") - lag(col("__end"), 1).over(w2) <= gapSec,
        lit(0L)).otherwise(lit(1L))
    spans
      .withColumn("__new2", newSession)
      .withColumn("session_idx", sum(col("__new2")).over(w2))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(sum(col("__n")).as("n_events"),
        min(col("__start")).as("start_sec"),
        max(col("__end")).as("end_sec"))
      .withColumn("duration_sec", col("end_sec") - col("start_sec"))
  }
}
