package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.streaming.Streams.EventRow

/** End-to-end Structured Streaming specs: MemoryStream source → transform →
  * memory sink, asserting batch/stream equivalence and stateful semantics. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private val rows = Seq(
    EventRow(1L, ts(10, 5), 1L, "click", 1.0),
    EventRow(2L, ts(10, 40), 1L, "click", 2.0),
    EventRow(3L, ts(11, 10), 2L, "error", 5.0),
    EventRow(4L, ts(11, 20), 1L, "error", 7.0),
    EventRow(5L, ts(11, 30), 1L, "error", 9.0))

  test("hourlyAgg: stream with watermark equals batch on same data") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = Streams.hourlyAggStream(input.toDF)
      .writeStream.format("memory").queryName("agg_stream")
      .outputMode("complete").start()
    try {
      input.addData(rows.take(2))
      q.processAllAvailable()
      input.addData(rows.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("agg_stream")
        .orderBy("hour_sec", "event_type").collect().toSeq
      val batch = Streams.hourlyAgg(rows.toDF)
        .orderBy("hour_sec", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(batch.map(r => (r.getLong(0), r.getString(1), r.getLong(2))) ==
        Seq((1704103200L, "click", 2L), (1704106800L, "error", 3L)))
    } finally q.stop()
  }

  test("firstFailureStream emits each user's first error exactly once across batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventRow]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    val q = Streams.firstFailureStream(input.toDS)
      .writeStream.format("memory").queryName("monitor_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // batch 1: user 1 fails twice in one batch -> earliest (id 4) wins
      input.addData(rows.filter(_.user_id == 1L))
      q.processAllAvailable()
      // batch 2: user 1 fails again (must NOT re-emit), user 2 fails
      input.addData(Seq(
        EventRow(6L, ts(12), 1L, "error", 1.0),
        EventRow(7L, ts(12), 2L, "error", 1.0)))
      q.processAllAvailable()
      val got = spark.table("monitor_stream")
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 4L), (2L, 7L)))
    } finally q.stop()
  }

  test("st03 gate parity: streaming incremental dedup equals batch anchor") {
    implicit val sql = spark.sqlContext
    import graft.streaming.Streams.DocFp
    val docs = graft.sources.Tables(spark, TestSpark.sf, "documents")
    val batch = Streams.firstPerFingerprintBatch(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(batch.nonEmpty)
    // Replay the fingerprinted corpus in doc_id order, three micro-batches
    // (the order the batch anchor's min-doc_id rule assumes).
    val all = docs.select(col("doc_id"),
        graft.dedup.Dedup.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
      .as[DocFp].collect().toSeq
    val chunks = all.grouped((all.size + 2) / 3).toSeq
    val input = MemoryStream[DocFp]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-st03-ckpt").toString
    val q = Streams.firstPerFingerprintStream(input.toDS)
      .writeStream.format("memory").queryName("st03_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      for (chunk <- chunks) {
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("st03_stream")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batch,
        s"stream/batch diverge: ${(streamed diff batch).take(3)} / " +
          s"${(batch diff streamed).take(3)}")
    } finally q.stop()
  }

  test("st04 gate parity: stream-static contamination equals the batch") {
    implicit val sql = spark.sqlContext
    val docs = graft.sources.Tables(spark, TestSpark.sf, "documents")
    val trainIdx = Streams.trainGramIndex(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", n = 3)
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
    val batch = Streams.contaminationHits(
        evalDocs, trainIdx, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(batch.nonEmpty, "near-dup corpus must produce contaminated spans")
    // Replay the eval split as three micro-batches through the SAME
    // function over a memory stream, joined to the SAME static index.
    val all = evalDocs.select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val chunks = all.grouped((all.size + 2) / 3).toSeq
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-st04-ckpt").toString
    val q = Streams.contaminationHits(
        input.toDS.toDF("doc_id", "text"), trainIdx, "doc_id", "text", n = 3)
      .writeStream.format("memory").queryName("st04_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      for (chunk <- chunks) {
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("st04_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(streamed == batch,
        s"stream/batch diverge: ${(streamed diff batch).take(3)} / " +
          s"${(batch diff streamed).take(3)}")
    } finally q.stop()
  }

  test("batch monitor matches the same semantics") {
    val got = Streams.firstFailureBatch(rows.toDF)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 4L), (2L, 3L)))
  }
}
