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

  test("firstFailureStream breaks same-millisecond ties at full precision") {
    // Two errors for one user in the SAME millisecond, differing only in
    // sub-ms nanos, with the µs-EARLIER event carrying the HIGHER id:
    // the pick must match the batch min-of-struct oracle, which compares
    // µs timestamps and so keeps event 9 — a getTime-based (ms)
    // tie-break would fall through to the id and wrongly keep event 8.
    implicit val sql = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val early = new Timestamp(t0.getTime); early.setNanos(123000)
    val late = new Timestamp(t0.getTime); late.setNanos(999000)
    val input = MemoryStream[EventRow]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ckpt-tie").toString
    val q = Streams.firstFailureStream(input.toDS)
      .writeStream.format("memory").queryName("monitor_tie")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(Seq(
        EventRow(8L, late, 1L, "error", 1.0),
        EventRow(9L, early, 1L, "error", 1.0)))
      q.processAllAvailable()
      val got = spark.table("monitor_tie").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 9L)),
        s"must pick the µs-earlier event, got $got")
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

  test("checkpoint recovery: dedup state survives a query RESTART " +
      "(chunk 1, stop, new query from the same checkpoint, chunk 2)") {
    // The production exactly-once claim all eleven streaming gates rest
    // on, pinned end-to-end: every other spec replays chunks through ONE
    // query instance, so nothing exercised the state-store recovery path
    // (the reference spool's whole point — its persistent notification
    // dedup survives process death, monitor/spool/__init__.py). Here the
    // flatMapGroupsWithState state must cross a real restart: file
    // source + parquet sink + HDFS-backed state store, query STOPPED
    // between chunks and a NEW query started from the same checkpoint.
    import graft.streaming.Streams.DocFp
    val root = java.nio.file.Files
      .createTempDirectory("graft-ckpt-recovery")
    val srcDir = s"$root/src"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    // fp "a" and "b" recur in chunk 2: without recovered state they
    // would be re-admitted; with it chunk 2 contributes only (5, "c").
    val chunk1 = Seq(DocFp(1L, "a"), DocFp(2L, "b"), DocFp(3L, "a"))
    val chunk2 = Seq(DocFp(4L, "a"), DocFp(5L, "c"), DocFp(6L, "b"))
    def runChunk(chunk: Seq[DocFp], part: String): Unit = {
      chunk.toDS.write.parquet(s"$srcDir/$part")
      val q = Streams.firstPerFingerprintStream(
          spark.readStream.schema("doc_id LONG, fp STRING")
            .option("recursiveFileLookup", "true").parquet(srcDir)
            .as[DocFp])
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    runChunk(chunk1, "p1")
    runChunk(chunk2, "p2") // NEW query instance, same checkpoint
    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (5L, "c")),
      s"state/offset recovery broken: $got — a re-admitted (4,a)/(6,b) " +
        "means dedup state was lost across the restart; a duplicated " +
        "(1,a) means the source offset log was lost")
  }

  test("failure injection: a query KILLED mid-batch leaves no phantom " +
      "commit, and the restart re-admits the batch exactly-once") {
    // The recovery spec above stops the query BETWEEN batches — the
    // graceful path. Here the kill lands INSIDE a running batch (r13
    // verdict item: exactly-once must survive the ungraceful death a
    // 1000-executor run actually sees). Mechanics: per-row sleeps make
    // chunk 2's batch take >= 2 s; stop() fires ~1 s in, interrupting
    // the stream thread mid-batch. Invariants, regardless of the exact
    // interrupt point: (1) the aborted batch must NOT reach the sink
    // metadata log (reading the dir sees only chunk 1 — no partial
    // output, no phantom commit even if orphan part-files exist);
    // (2) the state store must stay at chunk 1's committed version, so
    // the clean restart re-processes chunk 2 from the offset WAL and
    // admits (4,c)/(5,d) exactly once while still rejecting the (3,a)
    // recurrence against chunk-1 state.
    import graft.streaming.Streams.DocFp
    val root = java.nio.file.Files
      .createTempDirectory("graft-kill-midbatch")
    val srcDir = s"$root/src"; val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    val chunk1 = Seq(DocFp(1L, "a"), DocFp(2L, "b"))
    val chunk2 = Seq(DocFp(3L, "a"), DocFp(4L, "c"), DocFp(5L, "d"))
    def src = spark.readStream.schema("doc_id LONG, fp STRING")
      .option("recursiveFileLookup", "true").parquet(srcDir).as[DocFp]
    def sink(df: org.apache.spark.sql.Dataset[DocFp]) =
      df.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append")
    chunk1.toDS.write.parquet(s"$srcDir/p1")
    val q1 = sink(Streams.firstPerFingerprintStream(src)).start()
    try q1.processAllAvailable() finally q1.stop()
    chunk2.toDS.write.parquet(s"$srcDir/p2")
    // the slowed clone: same semantics, each row costs 2 s to read
    val qKill = sink(Streams.firstPerFingerprintStream(
      src.map { d => Thread.sleep(2000); d })).start()
    Thread.sleep(1000) // batch in flight (needs >= 2 s of row sleeps)
    qKill.stop()       // interrupts the execution thread mid-batch
    val afterKill = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(afterKill == Set((1L, "a"), (2L, "b")),
      s"aborted batch leaked into the committed sink output: $afterKill")
    val q2 = sink(Streams.firstPerFingerprintStream(src)).start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.size == rows.distinct.size,
      s"duplicated admission after the kill+restart: $rows")
    assert(rows.toSet == Set((1L, "a"), (2L, "b"), (4L, "c"), (5L, "d")),
      s"exactly-once broken across the mid-batch kill: ${rows.toSet} — " +
        "a present (3,a) means chunk-1 state was lost; a missing (4,c)/" +
        "(5,d) means the aborted batch was skipped instead of replayed")
  }

  test("st07 quota admission: chunked in-order replay equals the window " +
      "cumsum; the cutoff binds and carries across batches") {
    implicit val sql = spark.sqlContext
    import graft.streaming.Streams.DocTok
    val quota = 120L
    val docs = graft.sources.Tables(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("source"),
        graft.text.TextOps.wordCount(col("text")).as("n_tokens"))
      .orderBy("doc_id").as[DocTok].collect().toSeq
    // batch anchor: greedy prefix per source while prior < quota
    val anchor = docs.groupBy(_.source).flatMap { case (_, ds) =>
      ds.sortBy(_.doc_id)
        .foldLeft((Vector.empty[DocTok], 0L)) { case ((acc, used), d) =>
          if (used < quota) (acc :+ d, used + d.n_tokens) else (acc, used)
        }._1
    }.map(d => (d.doc_id, d.source)).toSet
    assert(anchor.nonEmpty && anchor.size < docs.size,
      "quota must bind: some docs admitted, some rejected")
    val chunks = docs.grouped((docs.size + 3) / 4).toSeq
    val input = MemoryStream[DocTok]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-st07-ckpt").toString
    val q = Streams.quotaAdmitStream(input.toDS, quota)
      .writeStream.format("memory").queryName("st07_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      for (chunk <- chunks) {
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("st07_stream")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == anchor,
        s"stream/batch diverge: ${(streamed diff anchor).take(3)} / " +
          s"${(anchor diff streamed).take(3)}")
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

  test("st01 gate streams a directory-shaped events table (the only shape " +
      "at scale) with file-shaped parity") {
    // A Spark-written table root is a DIRECTORY named events.parquet; the
    // r10 10x probe caught st01 symlinking that dir into the scratch dir,
    // where the file source listed zero files and silently emitted nothing.
    val tmp = java.nio.file.Files.createTempDirectory("graft-st01-dir")
    spark.read.parquet(TestSpark.sf + "/events.parquet")
      .write.mode("overwrite")
      .parquet(tmp.resolve("events.parquet").toString)
    val viaDir = SparkEntry.queries("st01_stream_window")(spark, tmp.toString)
      .collect().toSeq
    val viaFile = SparkEntry.queries("st01_stream_window")(spark, TestSpark.sf)
      .collect().toSeq
    assert(viaDir.nonEmpty, "dir-shaped table streamed zero rows")
    assert(viaDir == viaFile,
      s"dir/file shapes diverge: ${(viaDir diff viaFile).take(3)} / " +
        s"${(viaFile diff viaDir).take(3)}")
  }

  test("st03 gate (stateful flatMapGroupsWithState streaming) streams a " +
      "directory-shaped documents table with file-shaped parity") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-st03-dir")
    spark.read.parquet(TestSpark.sf + "/documents.parquet")
      .write.mode("overwrite")
      .parquet(tmp.resolve("documents.parquet").toString)
    val viaDir =
      SparkEntry.queries("st03_incr_dedup_stream")(spark, tmp.toString)
        .collect().toSeq
    val viaFile =
      SparkEntry.queries("st03_incr_dedup_stream")(spark, TestSpark.sf)
        .collect().toSeq
    assert(viaDir.nonEmpty, "dir-shaped table streamed zero rows")
    assert(viaDir == viaFile,
      s"dir/file shapes diverge: ${(viaDir diff viaFile).take(3)} / " +
        s"${(viaFile diff viaDir).take(3)}")
  }

  test("st06 gate (streaming sessionization) equals the q37 batch gate " +
      "and streams a directory-shaped events table with parity") {
    val viaFile =
      SparkEntry.queries("st06_sessionize_stream")(spark, TestSpark.sf)
        .collect().toSeq
    val batch = SparkEntry.queries("q37_sessionize")(spark, TestSpark.sf)
      .collect().toSeq
    assert(viaFile.nonEmpty, "st06 gate emitted zero sessions")
    assert(viaFile == batch,
      s"stream/batch sessions diverge: ${(viaFile diff batch).take(3)} / " +
        s"${(batch diff viaFile).take(3)}")
    // dir shape exercises the per-file symlink + sentinel listing; one
    // part file keeps the replay a single in-order batch (multi-file
    // time-disorder is outside the gate's contract — production feeds
    // arrive time-ordered)
    val tmp = java.nio.file.Files.createTempDirectory("graft-st06-dir")
    spark.read.parquet(TestSpark.sf + "/events.parquet")
      .coalesce(1).write.mode("overwrite")
      .parquet(tmp.resolve("events.parquet").toString)
    val viaDir =
      SparkEntry.queries("st06_sessionize_stream")(spark, tmp.toString)
        .collect().toSeq
    assert(viaDir == viaFile,
      s"dir/file shapes diverge: ${(viaDir diff viaFile).take(3)} / " +
        s"${(viaFile diff viaDir).take(3)}")
  }

  test("st09 gate (HLL sketch in streaming state) equals the batch " +
      "profile exactly — register merges are order-insensitive") {
    val gate =
      SparkEntry.queries("st09_sketch_stream")(spark, TestSpark.sf)
    // r17 shape: (series, day, n_rows, n, ndv_hll, rsd) — n_rows is the
    // STREAMED window count (riding the export), n the batch recount;
    // their equality is the count-parity half of the gate's hash.
    val streamed = gate.select("series", "day", "n_rows", "ndv_hll", "rsd")
      .collect().toSeq.map(_.toSeq)
    val batch = Streams.dailyNdvProfile(
        graft.sources.Tables.events(spark, TestSpark.sf))
      .orderBy("series", "day").collect().toSeq.map(_.toSeq)
    assert(streamed.nonEmpty, "st09 gate emitted zero windows")
    assert(streamed == batch,
      s"stream/batch sketch profiles diverge: " +
        s"${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    assert(gate.filter(col("n_rows") =!= col("n")).count() == 0,
      "streamed window count diverges from the batch recount")
    // and the estimates are honest: within 5*rsd of exact per window
    val exact = graft.sources.Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type").as("series"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("ndv"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (r <- SparkEntry.queries("st09_sketch_stream")(spark, TestSpark.sf)
        .collect()) {
      val key = (r.getString(0), r.getString(1))
      val hll = r.getAs[Long]("ndv_hll")
      assert(math.abs(hll - exact(key)) <= 0.10 * exact(key),
        s"$key: hll=$hll exact=${exact(key)}")
    }
  }

  test("st11 gate (stream-stream interval join) equals the batch " +
      "interval join; bounds are inclusive at both ends") {
    val streamed = SparkEntry.queries("st11_stream_join")(spark, TestSpark.sf)
      .collect().toSeq.map(_.toSeq)
    val batch = Streams.errorResolutionJoin(
        graft.sources.Tables.events(spark, TestSpark.sf), withinSec = 3600)
      .orderBy("error_event_id", "fix_event_id")
      .collect().toSeq.map(_.toSeq)
    assert(streamed.nonEmpty, "st11 gate matched zero pairs")
    assert(streamed == batch,
      s"stream/batch interval joins diverge: " +
        s"${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    // boundary semantics on synthetic rows: fix at error ts (gap 0) and
    // at exactly +within are matched; +within+1s is not
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, "error", "2024-01-01 00:00:00"),
      (1L, 11L, "purchase", "2024-01-01 00:00:00"),
      (1L, 12L, "purchase", "2024-01-01 01:00:00"),
      (1L, 13L, "purchase", "2024-01-01 01:00:01"),
      (2L, 20L, "purchase", "2024-01-01 00:30:00") // no error for user 2
    ).toDF("user_id", "event_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_s").cast("timestamp").as("ts"))
    val got = Streams.errorResolutionJoin(ev, withinSec = 3600)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((10L, 11L, 0L), (10L, 12L, 3600L)))
  }

  test("st10 gate (CMS in streaming state) equals the k04 batch gate; " +
      "chunked replay builds the identical cell table") {
    val streamed = SparkEntry.queries("st10_cms_stream")(spark, TestSpark.sf)
      .collect().toSeq.map(_.toSeq)
    val batch = SparkEntry.queries("k04_cms_topk")(spark, TestSpark.sf)
      .collect().toSeq.map(_.toSeq)
    assert(streamed.nonEmpty && streamed == batch,
      s"stream/batch CMS outputs diverge: " +
        s"${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    // chunked replay: cells accumulate across micro-batches to the same
    // table (counting is order-insensitive)
    implicit val sql = spark.sqlContext
    import graft.operators.Sketches
    val docs = graft.sources.Tables(spark, TestSpark.sf, "documents")
      .select(col("text")).as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq
    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-st10-ckpt").toString
    val q = Sketches.cmsCells(input.toDS.toDF("text"), col("text"))
      .writeStream.format("memory").queryName("st10_cells")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try {
      for (chunk <- docs.grouped((docs.size + 2) / 3)) {
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamedCells = spark.table("st10_cells").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batchCells = Sketches.cmsCells(
          graft.sources.Tables(spark, TestSpark.sf, "documents"),
          col("text"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(streamedCells == batchCells)
    } finally q.stop()
  }

  test("st12 drift cells: chunked replay accumulates to the identical " +
      "batch cells table (order-insensitive counts in state)") {
    implicit val sql = spark.sqlContext
    import graft.operators.Eval
    val docs = graft.sources.Tables(spark, TestSpark.sf, "documents")
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val input = MemoryStream[(String, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-st12-ckpt").toString
    val q = Eval.chi2Cells(input.toDS.toDF("source", "lang"),
        col("source"), col("lang") === "en")
      .writeStream.format("memory").queryName("st12_cells")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try {
      for (chunk <- docs.grouped((docs.size + 3) / 4)) {
        input.addData(chunk)
        q.processAllAvailable()
      }
      val streamed = spark.table("st12_cells").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = Eval.chi2Cells(
          graft.sources.Tables(spark, TestSpark.sf, "documents"),
          col("source"), col("lang") === "en")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("st08 gate (streaming rate anomaly) equals the q41 batch gate") {
    val streamed =
      SparkEntry.queries("st08_anomaly_stream")(spark, TestSpark.sf)
        .collect().toSeq.map(_.toSeq)
    val batch = SparkEntry.queries("q41_rate_anomaly")(spark, TestSpark.sf)
      .collect().toSeq.map(_.toSeq)
    assert(streamed.nonEmpty, "st08 gate emitted zero scored days")
    assert(streamed == batch,
      s"stream/batch anomaly rows diverge: " +
        s"${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
  }

  test("st08 twin: chunked in-order replay equals the batch scorer, " +
      "watermark closes trailing days, bounded state") {
    implicit val sql = spark.sqlContext
    import graft.streaming.Streams.RateEvent
    val batch = SparkEntry.queries("q41_rate_anomaly")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    val all = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("event_type"), col("ts"))
      .orderBy("ts")
      .as[RateEvent].collect().toSeq
    val chunks = all.grouped((all.size + 3) / 4).toSeq
    val input = MemoryStream[RateEvent]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-st08-ckpt").toString
    val q = Streams.rateAnomalyStream(
        input.toDS.withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("st08_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      for (chunk <- chunks) {
        input.addData(chunk)
        q.processAllAvailable()
      }
      // far-future sentinel series: advances the watermark so the
      // timeouts close and score every real series' remaining days
      val far = new Timestamp(all.map(_.ts.getTime).max + 40L * 86400000L)
      for (i <- 0 to 1) {
        input.addData(Seq(RateEvent("__wm__",
          new Timestamp(far.getTime + i * 1000L))))
        q.processAllAvailable()
      }
      val streamed = spark.table("st08_stream")
        .filter(col("series") =!= "__wm__")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream/batch diverge: extra=${(streamed diff batch).take(3)} " +
          s"missing=${(batch diff streamed).take(3)}")
    } finally q.stop()
  }

  test("q37 streaming twin: chunked in-order replay equals the batch " +
      "sessionizer, watermark closes idle sessions") {
    implicit val sql = spark.sqlContext
    import graft.streaming.Streams.SessionEvent
    val batch = SparkEntry.queries("q37_sessionize")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(batch.nonEmpty)
    val all = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_id"), col("ts"))
      .orderBy("ts", "event_id")
      .as[SessionEvent].collect().toSeq
    val chunks = all.grouped((all.size + 3) / 4).toSeq
    val input = MemoryStream[SessionEvent]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-st05-ckpt").toString
    val q = Streams.sessionizeStream(
        input.toDS.withWatermark("ts", "0 seconds"), gapSec = 1800)
      .writeStream.format("memory").queryName("st05_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      for (chunk <- chunks) {
        input.addData(chunk)
        q.processAllAvailable()
      }
      // sentinel user far in event-time future: advances the watermark so
      // EventTimeTimeout closes every real user's open session (two
      // batches: one to advance the watermark, one to fire the timeouts)
      val far = new Timestamp(all.map(_.ts.getTime).max + 86400000L)
      for (i <- 0 to 1) {
        input.addData(Seq(SessionEvent(-1L, 1000000L + i, far)))
        q.processAllAvailable()
      }
      val streamed = spark.table("st05_stream")
        .filter(col("user_id") =!= -1L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .toSet
      assert(streamed == batch,
        s"stream/batch diverge: extra=${(streamed diff batch).take(3)} " +
          s"missing=${(batch diff streamed).take(3)}")
    } finally q.stop()
  }

  test("q37 streaming twin: late events are dropped deterministically, " +
      "never splitting or renumbering a closed session") {
    implicit val sql = spark.sqlContext
    import graft.streaming.Streams.SessionEvent
    def ev(uid: Long, eid: Long, sec: Long) =
      SessionEvent(uid, eid, new Timestamp(sec * 1000))
    val input = MemoryStream[SessionEvent]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-late-ckpt").toString
    val q = Streams.sessionizeStream(
        input.toDS.withWatermark("ts", "0 seconds"), gapSec = 100)
      .writeStream.format("memory").queryName("late_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // user 7: two events, then the watermark advances far past them
      input.addData(Seq(ev(7L, 1L, 1000), ev(7L, 2L, 1050)))
      q.processAllAvailable()
      input.addData(Seq(ev(9L, 3L, 5000))) // advances watermark to 5000
      q.processAllAvailable()
      input.addData(Seq(ev(9L, 4L, 5001))) // lets the timeout fire
      q.processAllAvailable()
      // a straggler INSIDE user 7's closed session window (sec 1060 is
      // within gap of 1050, but far behind the 5001 watermark): must be
      // dropped — no new session row, no renumbering
      input.addData(Seq(ev(7L, 5L, 1060)))
      q.processAllAvailable()
      // close everything still open via a far-future sentinel
      for (i <- 0 to 1) {
        input.addData(Seq(ev(-1L, 100L + i, 100000 + i)))
        q.processAllAvailable()
      }
      val u7 = spark.table("late_stream")
        .filter(col("user_id") === 7L)
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      // exactly the original session (idx 1, 2 events, 1000-1050);
      // the late event contributed nothing
      assert(u7 == Set((1L, 2L, 1000L, 1050L)),
        s"late event corrupted user 7's sessions: $u7")
    } finally q.stop()
  }

  test("TTL dedup: in-window dups suppressed, expired fingerprints " +
      "re-admit, state removed at the watermark") {
    implicit val sql = spark.sqlContext
    import graft.streaming.Streams.{DocFp, DocFpTs}
    val input = MemoryStream[DocFpTs]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ttl-ckpt").toString
    val q = Streams.firstPerFingerprintStreamTtl(
        input.toDS.withWatermark("ts", "0 seconds").as[DocFpTs],
        ttlMs = 2 * 3600 * 1000L) // 2h retention
      .writeStream.format("memory").queryName("ttl_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def emitted() = spark.table("ttl_stream")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    try {
      // batch 1: two fingerprints admit; 'a' duplicates within the batch
      input.addData(Seq(DocFpTs(2L, "a", ts(10)), DocFpTs(1L, "a", ts(10)),
        DocFpTs(3L, "b", ts(10, 30))))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, "a"), (3L, "b")),
        "earliest (ts, doc_id) row admits once per fingerprint")
      // batch 2: 'a' again inside the 2h window -> suppressed
      input.addData(Seq(DocFpTs(4L, "a", ts(11))))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, "a"), (3L, "b")))
      // batch 3: watermark advances past 12:00 (= 10:00 + ttl); 'a'
      // recurs at 13:30, beyond its admission + ttl -> re-admits. The
      // expiry decision is data-path (admission-time compare), so it
      // holds even when the recurrence and the timeout land in the same
      // micro-batch.
      input.addData(Seq(DocFpTs(5L, "c", ts(13)), DocFpTs(6L, "a", ts(13, 30))))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, "a"), (3L, "b"), (5L, "c"), (6L, "a")),
        "a fingerprint recurring after the retention window is new again")
      // batch 4: un-recurred 'b' expired and was cleaned; recurrence
      // re-admits rather than hitting stale state
      input.addData(Seq(DocFpTs(7L, "b", ts(16))))
      q.processAllAvailable()
      assert(emitted() ==
        Seq((1L, "a"), (3L, "b"), (5L, "c"), (6L, "a"), (7L, "b")))
    } finally q.stop()
  }

  test("TTL spool: notification ids re-register after the retention window") {
    implicit val sql = spark.sqlContext
    import graft.monitor.Subscriptions
    import graft.monitor.Subscriptions.{Notif, NotifTs}
    val input = MemoryStream[NotifTs]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-spool-ttl-ckpt").toString
    def n(id: String, t: Timestamp) = NotifTs(id, "sub", "orders", id, t)
    val q = Subscriptions.dedupStreamTtl(
        input.toDS.withWatermark("ts", "0 seconds").as[NotifTs],
        ttlMs = 3600 * 1000L) // 1h retention
      .writeStream.format("memory").queryName("spool_ttl_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(Seq(n("x", ts(10)), n("x", ts(10, 5)), n("y", ts(10))))
      q.processAllAvailable()
      input.addData(Seq(n("x", ts(10, 30)))) // in-window dup
      q.processAllAvailable()
      input.addData(Seq(n("x", ts(12)))) // past 11:00 -> re-registers
      q.processAllAvailable()
      val got = spark.table("spool_ttl_stream")
        .groupBy("notification_id").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("x" -> 2L, "y" -> 1L),
        "once per retention window, exactly")
    } finally q.stop()
  }

  test("batch monitor matches the same semantics") {
    val got = Streams.firstFailureBatch(rows.toDF)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 4L), (2L, 3L)))
  }

  test("q52 streaming twin: chunked in-order replay equals the batch " +
      "SCD2 window pair, watermark flushes current versions") {
    implicit val sql = spark.sqlContext
    import graft.streaming.Streams.SessionEvent
    // batch twin on the same (floor-second, event_id) order
    val batch = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_id"),
        graft.util.epochSec(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._2))
        sorted.zipWithIndex.map { case ((_, eid, sec), i) =>
          val to = if (i + 1 < sorted.length) sorted(i + 1)._3
            else Streams.scd2EndMarkerSec
          (uid, (i + 1).toLong, eid, sec, to,
            if (to == Streams.scd2EndMarkerSec) 1L else 0L)
        }
      }.toSet
    assert(batch.nonEmpty)
    val all = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_id"), col("ts"))
      .orderBy("ts", "event_id")
      .as[SessionEvent].collect().toSeq
    val chunks = all.grouped((all.size + 3) / 4).toSeq
    val input = MemoryStream[SessionEvent]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-st13-ckpt").toString
    // the GATE's watermark: 35 days of lag, so the 30-day corpus never
    // triggers a mid-stream flush (a tight watermark WOULD flush and
    // restart idle chains — scd2Stream's documented trade; this spec
    // pins the batch-parity regime the gate runs in)
    val q = Streams.scd2Stream(input.toDS.withWatermark("ts", "35 days"))
      .writeStream.format("memory").queryName("st13_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      for (chunk <- chunks) {
        input.addData(chunk)
        q.processAllAvailable()
      }
      // the sentinel must outrun the 35-day watermark lag PLUS the
      // 1-day flush delay for every timeout to fire
      val far = new Timestamp(all.map(_.ts.getTime).max + 37L * 86400000L)
      for (i <- 0 to 1) {
        input.addData(Seq(SessionEvent(-1L, 3000000L + i, far)))
        q.processAllAvailable()
      }
      val streamed = spark.table("st13_stream")
        .filter(col("user_id") =!= -1L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .toSet
      assert(streamed == batch,
        s"stream/batch diverge: extra=${(streamed diff batch).take(3)} " +
          s"missing=${(batch diff streamed).take(3)}")
    } finally q.stop()
  }
}
