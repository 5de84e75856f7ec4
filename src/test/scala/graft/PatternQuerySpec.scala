package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.query.PatternQuery
import graft.query.PatternQuery.Step
import graft.model.TestCatalog
import graft.sources.Tables

class PatternQuerySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf
  private val cat = TestCatalog.catalog

  test("parse: steps, id specs, match markers") {
    val steps = PatternQuery.parse(">customer[21;22]>orders>lineitem#")
    assert(steps == Seq(
      Step(child = true, "customer", Some(Seq(Seq("21"), Seq("22"))), matched = false),
      Step(child = true, "orders", None, matched = false),
      Step(child = true, "lineitem", None, matched = true)))
  }

  test("parse: composite ids and wildcard") {
    val steps = PatternQuery.parse(">lineitem[5,1;6,2]<*#")
    assert(steps.head.ids == Some(Seq(Seq("5", "1"), Seq("6", "2"))))
    assert(steps(1) == Step(child = false, "*", None, matched = true))
  }

  test("parse: rejects garbage") {
    intercept[IllegalArgumentException](PatternQuery.parse(">customer[1] junk"))
  }

  test("run: child chain equals direct semi-join") {
    val res = PatternQuery.run(spark, dir, cat, ">customer[21]>orders#")
    val exp = Tables(spark, dir, "orders").filter(col("o_custkey") === 21)
    assert(res.keySet == Set("orders"))
    assert(res("orders").count() == exp.count())
    assert(res("orders").join(exp, Seq("o_orderkey"), "left_anti").count() == 0)
  }

  test("run: '#' on multiple steps accumulates all matched types") {
    val res = PatternQuery.run(spark, dir, cat, ">customer[21]#>orders#")
    assert(res.keySet == Set("customer", "orders"))
    assert(res("customer").count() == 1)
  }

  test("run: '<*' ascends to all ancestors") {
    val res = PatternQuery.run(spark, dir, cat, ">lineitem[1,3]<*#")
    assert(res.keySet == Set("orders", "part", "supplier", "customer",
      "nation", "region"))
    for (t <- Seq("orders", "part", "supplier", "customer"))
      assert(res(t).count() == 1, s"$t")
    // nation/region are reached via both the customer spine and the
    // supplier side parent; 1 or 2 rows depending on the data.
    for (t <- Seq("nation", "region"))
      assert(res(t).count() >= 1 && res(t).count() <= 2, s"$t")
  }

  test("run: unrelated hop fails loudly") {
    intercept[IllegalArgumentException](
      PatternQuery.run(spark, dir, cat, ">region>lineitem#"))
  }
}
