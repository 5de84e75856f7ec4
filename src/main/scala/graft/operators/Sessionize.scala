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
  * task. A pathologically hot key serializes within its one task (the
  * standard mitigation — pre-splitting the key by a coarse time shard and
  * merging adjacent spans — composes upstream of this operator).
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
}
