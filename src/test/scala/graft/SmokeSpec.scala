package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"
}

class SmokeSpec extends AnyFunSuite {
  import graft.sources.Tables
  lazy val spark = TestSpark.spark

  test("all tables readable") {
    for (n <- Tables.names) {
      val df = Tables(spark, TestSpark.sf, n)
      assert(df.count() > 0, s"table $n empty")
    }
  }

  test("events ts normalizes to timestamp") {
    val ev = Tables.events(spark, TestSpark.sf)
    val t = ev.schema("ts").dataType.typeName
    assert(t == "timestamp", s"got $t")
    assert(ev.selectExpr("min(ts)").collect()(0).get(0) != null)
  }
}
