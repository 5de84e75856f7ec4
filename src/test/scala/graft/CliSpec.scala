package graft

import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {
  // TestSpark owns the session; Cli.session getOrCreate's into it, so
  // dispatch runs against the shared local session
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("run executes a catalog gate and writes its parquet") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-cli-run").toString
    val df = Cli.dispatch(Array("run", "q01_summary_agg", sf, out)).get
    val back = spark.read.parquet(s"$out/q01_summary_agg")
    assert(back.count() == df.count() && back.count() > 0)
  }

  test("count is the q08 analog") {
    val df = Cli.dispatch(Array("count", sf)).get
    assert(df.columns.toSeq ==
      SparkEntry.queries("q08_count_objects")(spark, sf).columns.toSeq)
  }

  test("dump honors the [after, until) window bounds") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-cli-dump").toString
    val all = Cli.dispatch(Array("dump", sf, s"$out/all")).get.count()
    val some = Cli.dispatch(Array("dump", sf, s"$out/some",
      "2024-01-10T00:00:00", "2024-01-20T00:00:00")).get.count()
    assert(all > 0 && some > 0 && some < all)
  }

  test("load ingests a JSON report per type; merge dedups across " +
      "reports") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cli-load")
    def report(p: String, ids: Seq[Int]): String = {
      val f = dir.resolve(p)
      val builds = ids.map(i =>
        s"""{"id": "b$i", "origin": "o${i % 2}"}""").mkString(",")
      java.nio.file.Files.writeString(f,
        s"""{"version": {"major": 4, "minor": 3},
            "builds": [$builds]}""")
      f.toString
    }
    val r1 = report("r1.json", Seq(1, 2, 3))
    val r2 = report("r2.json", Seq(3, 4))
    val out = dir.resolve("wh").toString
    Cli.dispatch(Array("load", r1, out, "builds"))
    assert(spark.read.parquet(s"$out/builds").count() == 3)
    val mout = dir.resolve("merged").toString
    Cli.dispatch(Array("merge", mout, r1, r2))
    // b3 appears in both reports; exact-duplicate drop keeps one
    assert(spark.read.parquet(s"$mout/builds").count() == 4)
  }

  test("unknown query and bad usage fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      Cli.dispatch(Array("run", "nope", sf, "/tmp/x"))
    }
    assert(e1.getMessage.contains("unknown query"))
    val e2 = intercept[IllegalArgumentException] {
      Cli.dispatch(Array("frobnicate"))
    }
    assert(e2.getMessage.contains("usage:"))
  }
}
