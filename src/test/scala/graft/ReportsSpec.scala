package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Reports

class ReportsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeReport(name: String, json: String): String = {
    val dir = Files.createTempDirectory("graft-reports")
    val f = dir.resolve(name)
    Files.writeString(f, json)
    f.toString
  }

  private val reportA = """{
    "version": {"major": 4, "minor": 3},
    "checkouts": [{"id": "c1", "origin": "redhat", "valid": true}],
    "builds": [
      {"id": "b1", "checkout_id": "c1", "status": "PASS"},
      {"id": "b2", "checkout_id": "c1", "status": "FAIL"}
    ]
  }"""

  private val reportB = """{
    "version": {"major": 4, "minor": 3},
    "builds": [
      {"id": "b2", "checkout_id": "c1", "status": "FAIL"},
      {"id": "b3", "checkout_id": "c1", "status": "PASS"}
    ],
    "tests": [{"id": "t1", "build_id": "b2", "path": "ltp.sem01"}]
  }"""

  test("read: version header and per-type frames with inferred schema") {
    val r = Reports.read(spark, writeReport("a.json", reportA),
      Seq("checkouts", "builds", "tests"))
    assert(r.version == (4, 3))
    assert(r.tables.keySet == Set("checkouts", "builds"))
    assert(r.tables("builds").count() == 2)
    val co = r.tables("checkouts").head
    assert(co.getAs[String]("id") == "c1")
    assert(co.getAs[Boolean]("valid"))
  }

  test("merge: kcidb-merge unions reports and drops exact duplicates") {
    val a = Reports.read(spark, writeReport("a.json", reportA),
      Seq("checkouts", "builds", "tests"))
    val b = Reports.read(spark, writeReport("b.json", reportB),
      Seq("checkouts", "builds", "tests"))
    val merged = Reports.merge(Seq(a, b))
    assert(merged.keySet == Set("checkouts", "builds", "tests"))
    // b2 appears in both reports -> exactly once after the merge
    val builds = merged("builds").collect()
      .map(_.getAs[String]("id")).sorted.toSeq
    assert(builds == Seq("b1", "b2", "b3"))
  }

  test("end-to-end ingest loop: streaming reports -> match -> notify once") {
    // kcidb's main loop (kcidb/__init__.py:493-531): consume report
    // messages, match subscriptions, notify exactly once. Here: a file
    // stream of report JSONs -> explode builds -> matchRaw -> stateful
    // spool, across two micro-batches with a duplicate failure.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.monitor.{Subscription, Subscriptions}
    val dir = Files.createTempDirectory("graft-report-stream")
    val schema = StructType(Seq(
      StructField("version", StructType(Seq(
        StructField("major", LongType), StructField("minor", LongType)))),
      StructField("builds", ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("checkout_id", StringType),
        StructField("status", StringType)))))))
    val stream = spark.readStream.schema(schema)
      .option("multiLine", "true").json(dir.toString)
    val builds = stream
      .select(explode(col("builds")).as("b")).select("b.*")
    val matched = Subscriptions.matchRaw(_ => builds,
      Seq(Subscription("failed_builds", "builds",
        col("status") === "FAIL", Seq("id"))))
    val deduped = Subscriptions.dedupStream(
      matched.as[Subscriptions.Notif](
        org.apache.spark.sql.Encoders.product[Subscriptions.Notif]))
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    val q = deduped.writeStream.format("memory").queryName("ingest_loop")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      Files.writeString(dir.resolve("r1.json"),
        """{"version": {"major": 4, "minor": 3}, "builds": [
          |  {"id": "b1", "checkout_id": "c1", "status": "FAIL"},
          |  {"id": "b2", "checkout_id": "c1", "status": "PASS"}]}"""
          .stripMargin)
      q.processAllAvailable()
      Files.writeString(dir.resolve("r2.json"),
        """{"version": {"major": 4, "minor": 3}, "builds": [
          |  {"id": "b1", "checkout_id": "c1", "status": "FAIL"},
          |  {"id": "b3", "checkout_id": "c2", "status": "FAIL"}]}"""
          .stripMargin)
      q.processAllAvailable()
      val got = spark.table("ingest_loop")
        .orderBy("object_id").collect().map(_.getString(3)).toSeq
      assert(got == Seq("b1", "b3"),
        "b1's second failure must not re-notify; b3 notifies once")
    } finally q.stop()
  }

  test("read: a directory of reports scans as one dataset") {
    val dir = Files.createTempDirectory("graft-reports-many")
    Files.writeString(dir.resolve("a.json"), reportA)
    Files.writeString(dir.resolve("b.json"), reportB)
    val r = Reports.read(spark, dir.toString, Seq("builds"))
    // 2 builds from A + 2 from B in one frame (merge dedups, read does not)
    assert(r.tables("builds").count() == 4)
  }
}
