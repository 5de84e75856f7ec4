package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingest analytics — the Spark Structured Streaming counterpart
  * of kcidb's message-queue ingest loop
  * (/root/reference/kcidb/__init__.py:493-531: load → match → notify) and
  * the monitor/subscription layer (/root/reference/kcidb/monitor/).
  *
  * The same transformation functions run in batch (for the DuckDB oracle)
  * and on a `readStream` source (exercised in the test suite with a memory
  * sink): windowed aggregation with watermarks for late data, and
  * `flatMapGroupsWithState` for first-occurrence detection (the "new failure
  * → notification" pattern).
  */
object Streams {

  /** Hourly windowed aggregate per event_type. Window emitted as epoch
    * seconds so batch/stream/oracle all agree. Works on batch and streaming
    * DataFrames alike. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").cast("long").as("hour_sec"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming variant with a watermark (late events beyond 2h dropped). */
  def hourlyAggStream(events: DataFrame): DataFrame =
    hourlyAgg(events.withWatermark("ts", "2 hours"))

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String, value: Double)
  final case class FirstFailure(user_id: Long, event_id: Long, ts_sec: Long)

  /** Batch form of the monitor: first 'error' event per user. */
  def firstFailureBatch(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events.filter(col("event_type") === "error")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_sec"))
  }

  /** Streaming form: stateful first-occurrence detection. State is one
    * boolean per user (bounded; at scale this is why we don't buffer events
    * — kcidb's notification spool dedups the same way). */
  def firstFailureStream(events: Dataset[EventRow]): Dataset[FirstFailure] = {
    import events.sparkSession.implicits._
    events.filter(_.event_type == "error")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[EventRow],
         state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            // Within a micro-batch, pick the earliest deterministically.
            val first = rows.minBy(r => (r.ts.getTime, r.event_id))
            state.update(true)
            Iterator.single(FirstFailure(
              userId, first.event_id, first.ts.getTime / 1000))
          }
        })
  }
}
