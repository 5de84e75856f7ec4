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

  test("read: a directory of reports scans as one dataset") {
    val dir = Files.createTempDirectory("graft-reports-many")
    Files.writeString(dir.resolve("a.json"), reportA)
    Files.writeString(dir.resolve("b.json"), reportB)
    val r = Reports.read(spark, dir.toString, Seq("builds"))
    // 2 builds from A + 2 from B in one frame (merge dedups, read does not)
    assert(r.tables("builds").count() == 4)
  }
}
