package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q54 — issue-editor pattern-object assembly + automatch
  * (model/IssuePatterns vs issue_editor/__init__.py:33-60). */
class IssuePatternsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def gate =
    SparkEntry.queries("q54_issue_patterns")(spark, TestSpark.sf)

  private def issueRow(id: String) =
    gate.where(col("kind") === "issue" && col("sub_id") === id)
      .collect()(0)

  test("last duplicate field wins (the reference's dict assignment)") {
    val r = issueRow("s2")
    assert(r.getAs[String]("pattern") == "orders.o_orderstatus=P")
    assert(r.getAs[Long]("n_categories") == 1L)
  }

  test("multi-category pattern canonicalizes sorted with +s plurals") {
    val r = issueRow("s8")
    assert(r.getAs[String]("pattern") ==
      "customers.c_mktsegment=BUILDING;" +
        "orders.o_orderpriority=5-LOW;orders.o_orderstatus=F")
    assert(r.getAs[Long]("n_categories") == 2L)
    assert(r.getAs[Int]("culprit_code") == 1 &&
      r.getAs[Int]("culprit_tool") == 0 &&
      r.getAs[Int]("culprit_harness") == 0)
  }

  test("each missing required field 400-gates its submission; the " +
      "invalid pattern is still BUILT but never matched") {
    for (id <- Seq("s3", "s4", "s5", "s6"))
      assert(issueRow(id).getAs[Int]("valid") == 0, id)
    assert(issueRow("s3").getAs[String]("pattern") ==
      "orders.o_orderstatus=F")
    assert(gate.where(col("kind") === "match" &&
      col("sub_id").isin("s3", "s4", "s5", "s6")).count() == 0)
  }

  test("valid pattern-less submission emits an empty pattern and no " +
      "match rows") {
    val r = issueRow("s7")
    assert(r.getAs[Int]("valid") == 1)
    assert(r.getAs[String]("pattern") == "")
    assert(r.getAs[Long]("n_categories") == 0L)
    assert(gate.where(col("kind") === "match" &&
      col("sub_id") === "s7").count() == 0)
  }

  test("match counts equal a direct conjunctive recount per category") {
    val orders = graft.sources.Tables(spark, TestSpark.sf, "orders")
    val cust = graft.sources.Tables(spark, TestSpark.sf, "customer")
    val expect = Map(
      ("s1", "order") -> orders.where(col("o_orderstatus") === "F" &&
        col("o_orderpriority") === "1-URGENT").count(),
      ("s2", "order") -> orders.where(col("o_orderstatus") === "P")
        .count(),
      ("s8", "order") -> orders.where(col("o_orderstatus") === "F" &&
        col("o_orderpriority") === "5-LOW").count(),
      ("s8", "customer") -> cust.where(col("c_mktsegment") ===
        "BUILDING").count())
    val got = gate.where(col("kind") === "match").collect()
      .map(r => (r.getAs[String]("sub_id"),
        r.getAs[String]("category")) -> r.getAs[Long]("n_match")).toMap
    assert(got == expect,
      s"match rows diverge from the recount: $got vs $expect")
  }

  test("the corpus-sized melt joins the pattern frame by broadcast — " +
      "no shuffle of the object side before the match filter") {
    val p = gate.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
