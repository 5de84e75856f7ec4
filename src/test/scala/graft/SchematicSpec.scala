package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Schematic

class SchematicSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chain = new Schematic("t", Seq(
    (1, 0) -> identity[DataFrame] _,
    (2, 0) -> ((df: DataFrame) => df.withColumn("status",
      when(col("v") >= 50, "PASS").otherwise("FAIL"))),
    (2, 1) -> ((df: DataFrame) => df.withColumn("score",
      if (df.columns.contains("score")) coalesce(col("score"), col("v"))
      else col("v")))))

  test("history is ordered and upgrade composes every later inherit") {
    assert(chain.history == Seq((1, 0), (2, 0), (2, 1)))
    val v1 = Seq((1L, 60.0), (2L, 10.0)).toDF("id", "v")
    val up = chain.upgradeToLatest(v1, from = (1, 0))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    assert(up.toSeq == Seq((1L, "PASS", 60.0), (2L, "FAIL", 10.0)))
  }

  test("partial upgrade stops at the requested version") {
    val v1 = Seq((1L, 60.0)).toDF("id", "v")
    val v20 = chain.upgrade(v1, from = (1, 0), to = (2, 0))
    assert(v20.columns.toSeq == Seq("id", "v", "status"))
  }

  test("COALESCE carry-forward keeps values already present") {
    // a frame that already carries a partial score column (mid-migration)
    val midway = Seq((1L, 60.0, Some(99.0)), (2L, 10.0, None))
      .toDF("id", "v", "score")
      .withColumn("status", lit("PASS"))
    val up = chain.upgrade(midway, from = (2, 0), to = (2, 1))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("score"))))
    assert(up.toSeq == Seq((1L, 99.0), (2L, 10.0)),
      "existing non-null score must win; null backfills from v")
  }

  test("upgrade from == to is a no-op; downgrades and unknown versions fail") {
    val v1 = Seq((1L, 60.0)).toDF("id", "v")
    assert(chain.upgrade(v1, (1, 0), (1, 0)).columns.toSeq == Seq("id", "v"))
    intercept[IllegalArgumentException](chain.upgrade(v1, (2, 1), (1, 0)))
    intercept[IllegalArgumentException](chain.upgrade(v1, (0, 9), (2, 1)))
  }

  test("q51's parser contract: PERMISSIVE keeps partially-parsed " +
      "fields, and an unreferenced column cannot quarantine a row") {
    import org.apache.spark.sql.functions.col
    val path = "/tmp/graft-q51-probe"
    Seq("1,10,O,100.50,2024-01-01",
        "37,10,F,broken-price,2024-01-02",
        "41,x-cust,P,200.25,2024-01-03")
      .toDF("value").write.mode("overwrite").text(path)
    def read() = spark.read
      .schema("k LONG, cust LONG, status STRING, " +
        "price DECIMAL(18,2), odate DATE, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
    val full = read().select("k", "cust", "status", "price", "odate",
        "_corrupt").collect().map(r => r.getLong(0) -> r).toMap
    // partial results: the broken-price row keeps cust/status/odate,
    // the broken-cust row keeps price/status/odate
    assert(full(37L).get(5) != null && full(37L).isNullAt(3) &&
      !full(37L).isNullAt(1) && !full(37L).isNullAt(4))
    assert(full(41L).get(5) != null && full(41L).isNullAt(1) &&
      full(41L).getDecimal(3).doubleValue == 200.25)
    assert(full(1L).get(5) == null)
    // column pruning: with cust unreferenced the x-cust row never
    // fails — the gate must reference every typed column
    val pruned = read().select("k", "price", "_corrupt")
      .collect().map(r => r.getLong(0) -> (r.get(2) != null)).toMap
    assert(pruned(37L) && !pruned(41L),
      "an unparsed column must not quarantine its row")
  }
}
