package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Loader

class LoaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsertMerge keeps latest non-null per field (kcidb load priority)") {
    val log = Seq(
      ("k1", 1L, Option.empty[Long], Option("a")),
      ("k1", 2L, Option(5L), Option.empty[String]),
      ("k1", 3L, Option.empty[Long], Option.empty[String]),
      ("k2", 1L, Option(7L), Option("z"))
    ).toDF("id", "seq", "v", "p")
    val merged = Loader.upsertMerge(log, Seq("id"), Seq(col("seq")), Seq("v", "p"))
      .orderBy("id")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2)))
    assert(merged.toSeq == Seq(("k1", 5L, "a"), ("k2", 7L, "z")))
  }

  test("upsertMerge emits exactly one row per key") {
    val log = Seq(("a", 1L, Option(1L)), ("a", 2L, Option(2L)),
      ("b", 1L, Option.empty[Long])).toDF("id", "seq", "v")
    val out = Loader.upsertMerge(log, Seq("id"), Seq(col("seq")), Seq("v"))
    assert(out.count() == 2)
    // a key whose field is null in every submission stays null after merge
    assert(out.filter(col("id") === "b").head.get(1) == null)
  }

  test("upsertMerge prio_db keeps the EARLIEST non-null (db beats load)") {
    val log = Seq(
      ("k1", 1L, Option.empty[Long], Option("a")),
      ("k1", 2L, Option(5L), Option("b")),
      ("k1", 3L, Option(9L), Option.empty[String])
    ).toDF("id", "seq", "v", "p")
    val merged = Loader.upsertMerge(log, Seq("id"), Seq(col("seq")),
        Seq("v", "p"), prioDb = true)
      .collect().map(r => (r.getString(0), r.get(1), r.get(2)))
    assert(merged.toSeq == Seq(("k1", 5L, "a")),
      "first non-null v is from seq 2; first non-null p from seq 1")
  }

  test("upsertMerge maxFields merge with MAX (metadata timestamps)") {
    val log = Seq(
      ("k1", 1L, Option("x"), 100L),
      ("k1", 2L, Option.empty[String], 300L),
      ("k1", 3L, Option("y"), 200L)
    ).toDF("id", "seq", "v", "ts")
    val merged = Loader.upsertMerge(log, Seq("id"), Seq(col("seq")),
        Seq("v"), maxFields = Seq("ts"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(merged.toSeq == Seq(("k1", "y", 300L)))
  }

  test("mergeDatasets unions and drops exact duplicates") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((2L, "y"), (3L, "z")).toDF("id", "v")
    val m = Loader.mergeDatasets(Seq(a, b))
    assert(m.count() == 3)
  }

  test("dumpWindow is (after, until]") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("t")
      .select(timestamp_seconds(col("t")).as("ts"))
    val got = Loader.dumpWindow(df, col("ts"),
        timestamp_seconds(lit(1)), timestamp_seconds(lit(3)))
      .select(col("ts").cast("long")).as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 3L), "after exclusive, until inclusive")
  }

  test("purge retains rows at or after the cutoff") {
    val df = Seq(1L, 2L, 3L).toDF("t")
      .select(timestamp_seconds(col("t")).as("ts"))
    val got = Loader.purge(df, col("ts"), timestamp_seconds(lit(2)))
      .select(col("ts").cast("long")).as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 3L))
  }

  test("dumpBatched: full batches, exact coverage, key-contiguous chunks") {
    val df = graft.sources.Tables.events(spark, TestSpark.sf)
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-20 00:00:00").cast("timestamp")
    def batch() = Loader.dumpBatched(df, col("ts"), lo, hi,
      orderKey = Seq(col("event_id")), batchSize = 100)
    val batched = batch()
    val n = Loader.dumpWindow(df, col("ts"), lo, hi).count()
    assert(batched.count() == n, "batching must not add or drop rows")
    val sizes = batched.groupBy("batch_id").agg(
        count(lit(1)).as("sz"),
        min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .orderBy("batch_id").collect()
    assert(sizes.length == (n + 99) / 100)
    for (r <- sizes.dropRight(1)) assert(r.getAs[Long]("sz") == 100L)
    assert(sizes.last.getAs[Long]("sz") ==
      (if (n % 100 == 0) 100L else n % 100))
    // batches partition the key ORDER: per-batch key ranges are disjoint
    // and increasing (transport chunks are contiguous in the sort order)
    for (w <- sizes.sliding(2) if w.length == 2)
      assert(w(0).getAs[Long]("hi") < w(1).getAs[Long]("lo"))
    // deterministic: same input, same batching
    assert(batched.select("event_id", "batch_id")
      .except(batch().select("event_id", "batch_id")).isEmpty)
    // the offset-join global rank matches the window-rank contract exactly
    val byWindow = Loader.dumpWindow(df, col("ts"), lo, hi)
      .select(col("event_id"),
        ((row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("event_id")) - 1).cast("long") / 100)
          .cast("long").as("batch_id"))
    assert(batched.select("event_id", "batch_id").except(byWindow).isEmpty &&
      byWindow.except(batched.select("event_id", "batch_id")).isEmpty,
      "partition-offset ranking must equal the single-partition window rank")
  }

  test("with_metadata=false strips metadata columns from dumps only") {
    val df = graft.sources.Tables.events(spark, TestSpark.sf)
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-20 00:00:00").cast("timestamp")
    val noMeta = Loader.dumpWindow(df, col("ts"), lo, hi,
      metaCols = Seq("ts"), withMetadata = false)
    assert(!noMeta.columns.contains("ts"),
      "metadata column must leave the projection")
    // …but it still drives the window filter
    assert(noMeta.count() ==
      Loader.dumpWindow(df, col("ts"), lo, hi).count())
    val noMetaBatched = Loader.dumpBatched(df, col("ts"), lo, hi,
      orderKey = Seq(col("event_id")), batchSize = 100,
      metaCols = Seq("ts"), withMetadata = false)
    assert(!noMetaBatched.columns.contains("ts") &&
      noMetaBatched.columns.contains("batch_id"))
    // batch assignment is identical with and without metadata
    val withMeta = Loader.dumpBatched(df, col("ts"), lo, hi,
      orderKey = Seq(col("event_id")), batchSize = 100)
    assert(noMetaBatched.select("event_id", "batch_id")
      .except(withMeta.select("event_id", "batch_id")).isEmpty)
  }
}
