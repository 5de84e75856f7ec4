package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd
import graft.sources.Tables

class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scd2: version chain, open end, exactly one current per key, " +
      "tie determinism") {
    val log = Seq(
      (1L, "2024-01-01", 10L, "A"),
      (1L, "2024-02-01", 11L, "B"),
      (1L, "2024-03-01", 12L, "C"),
      // key 2: two versions on the SAME day — tie broken by id
      (2L, "2024-01-05", 21L, "X"),
      (2L, "2024-01-05", 20L, "W"),
      (3L, "2024-04-01", 30L, "S")
    ).toDF("k", "valid_from", "id", "attr")
    val out = Scd.scd2(log, "k", "valid_from", "id", "9999-12-31")
      .orderBy("k", "version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getString(5), r.getLong(6)))
    // (k, valid_from, id, attr, version, valid_to, is_current)
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", 10L, "A", 1L, "2024-02-01", 0L),
      (1L, "2024-02-01", 11L, "B", 2L, "2024-03-01", 0L),
      (1L, "2024-03-01", 12L, "C", 3L, "9999-12-31", 1L),
      (2L, "2024-01-05", 20L, "W", 1L, "2024-01-05", 0L),
      (2L, "2024-01-05", 21L, "X", 2L, "9999-12-31", 1L),
      (3L, "2024-04-01", 30L, "S", 1L, "9999-12-31", 1L)),
      s"got ${out.toSeq}")
    // invariants: one current row per key, versions contiguous
    val byKey = out.groupBy(_._1)
    for ((k, rows) <- byKey) {
      assert(rows.count(_._7 == 1L) == 1, s"key $k current count")
      assert(rows.map(_._5).sorted.toSeq == (1L to rows.length).toSeq,
        s"key $k version contiguity")
    }
  }

  test("scd2 plans with ONE exchange: both windows share the key " +
      "partitioning (the sessionize discipline)") {
    val df = Tables(spark, TestSpark.sf, "orders")
      .select(col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        col("o_orderkey"))
    val plan = Scd.scd2(df, "o_custkey", "valid_from", "o_orderkey",
        "9999-12-31")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected one key exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no global sort expected:\n$plan")
  }
}
