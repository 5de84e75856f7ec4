package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one hot key (90%), several cold ones
  lazy val facts = (Seq.fill(90)(1L) ++ Seq(2L, 2L, 3L, 4L, 5L))
    .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "fact_id")
  lazy val dims = Seq((1L, "hot"), (2L, "warm"), (3L, "c3"), (4L, "c4"),
    (5L, "c5"), (6L, "unmatched")).toDF("k", "name")

  test("saltedJoin equals the plain join, for every safe join type") {
    for (jt <- Seq("inner", "left", "left_semi")) {
      val plain = facts.join(dims, Seq("k"), jt)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val salted = SkewJoin.saltedJoin(facts, dims, Seq("k"),
          saltFactor = 8, joinType = jt)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("salt actually spreads the hot key across sub-keys") {
    val salted = facts.withColumn("__salt",
      pmod(hash(facts.columns.map(col): _*), lit(8)))
    val spread = salted.filter(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(spread > 4, s"hot key must land on many salts, got $spread")
  }

  test("one explicit narrow saltCol spreads the hot key and keeps the " +
      "exact join result") {
    val salted = facts.withColumn("__salt",
      pmod(hash(col("k"), col("fact_id")), lit(8)))
    val spread = salted.filter(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(spread > 4, s"hot key must land on many salts, got $spread")
    val plain = facts.join(dims, Seq("k"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val viaSaltCol = SkewJoin.saltedJoin(facts, dims, Seq("k"),
        saltFactor = 8, saltCols = Seq("fact_id"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(viaSaltCol == plain)
  }

  test("saltFactor 1 degenerates to the plain join; bad types rejected") {
    val plain = facts.join(dims, Seq("k")).count()
    assert(SkewJoin.saltedJoin(facts, dims, Seq("k"), 1).count() == plain)
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(facts, dims, Seq("k"), 4, joinType = "right"))
  }

  test("keyHistogram surfaces the hot key first") {
    val top = SkewJoin.keyHistogram(facts, Seq("k"), 2).collect()
    assert(top.head.getLong(0) == 1L && top.head.getLong(1) == 90L)
  }
}
