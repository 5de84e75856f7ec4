package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.query.PatternQuery
import graft.query.PatternQuery.{IdList, NoSpec, Placeholder, Step}
import graft.model.TestCatalog
import graft.sources.Tables

class PatternQuerySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf
  private val cat = TestCatalog.catalog

  test("parse: steps, id specs, match markers") {
    val steps = PatternQuery.parse(">customer[21;22]>orders>lineitem#")
    assert(steps == Seq(
      Step(child = true, "customer",
        IdList(Seq(Seq("21"), Seq("22"))), None),
      Step(child = true, "orders", NoSpec, None),
      Step(child = true, "lineitem", NoSpec, Some('#'))))
  }

  test("parse: composite ids, wildcard, '$' marker") {
    val steps = PatternQuery.parse(">lineitem[5,1;6,2]<*$")
    assert(steps.head.spec == IdList(Seq(Seq("5", "1"), Seq("6", "2"))))
    assert(steps(1) == Step(child = false, "*", NoSpec, Some('$')))
  }

  test("parse: '%' placeholder and quoted id fields with escapes") {
    val steps = PatternQuery.parse(""">customer%>orders["a;b", "c\"d\\e"]#""")
    assert(steps.head.spec == Placeholder)
    assert(steps(1).spec == IdList(Seq(Seq("a;b", "c\"d\\e"))))
  }

  test("parse: whitespace tolerated as in the reference ABNF") {
    val steps = PatternQuery.parse(" > customer [ 21 ; 22 ] # ")
    assert(steps == Seq(Step(child = true, "customer",
      IdList(Seq(Seq("21"), Seq("22"))), Some('#'))))
  }

  test("parse: rejects garbage") {
    intercept[IllegalArgumentException](PatternQuery.parse(">customer[1] junk"))
    intercept[IllegalArgumentException](PatternQuery.parse(""))
    intercept[IllegalArgumentException](
      PatternQuery.parse(">customer[\"unterminated]#"))
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

  test("run: '<*#' matches all ancestors but not the base itself") {
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

  test("run: '<*$' matches only the ultimate parents (dead-end types)") {
    val res = PatternQuery.run(spark, dir, cat, ">lineitem[1,3]<*$")
    // parents of lineitem: orders -> customer -> nation -> region (spine),
    // part (no parents), supplier -> nation -> region. Dead ends: region,
    // part — NOT orders/customer/nation/supplier.
    assert(res.keySet == Set("region", "part"), res.keySet)
    assert(res("part").count() == 1)
    assert(res("region").count() >= 1)
  }

  test("run: '$' frontier chains — '<*$>*#' descends from the roots") {
    val res = PatternQuery.run(spark, dir, cat, ">orders[1]<*$")
    // orders' ancestors: customer -> nation -> region; dead end = region.
    assert(res.keySet == Set("region"))
    assert(res("region").count() == 1)
  }

  test("run: '%' consumes out-of-band id lists in order") {
    val res = PatternQuery.run(spark, dir, cat, ">customer%>orders#",
      idLists = Seq(Seq(Seq("21"))))
    val exp = Tables(spark, dir, "orders").filter(col("o_custkey") === 21)
    assert(res("orders").count() == exp.count())
    intercept[IllegalArgumentException](
      PatternQuery.run(spark, dir, cat, ">customer%>orders#"))
  }

  test("run: '>*$' from root matches childless types only") {
    val res = PatternQuery.run(spark, dir, cat, ">*[999999]$")
    // lineitem is the only type with no child relations
    assert(res.keySet == Set("lineitem"))
  }

  test("run: unrelated hop fails loudly") {
    intercept[IllegalArgumentException](
      PatternQuery.run(spark, dir, cat, ">region>lineitem#"))
  }

  test("run: matches materialize by ID — duplicate-id-tuple rows all " +
      "return (reference id-join semantics)") {
    // supplier-keyed hop selects a SUBSET of a duplicate (l_orderkey,
    // l_linenumber) group; materialization by id must pull the whole group
    // back, exactly like FROM lineitem INNER JOIN (…ids…) USING (ids).
    val li = Tables(spark, dir, "lineitem")
    val res = PatternQuery.run(spark, dir, cat, ">supplier[1]>lineitem#")
    val hopRows = li.filter(col("l_suppkey") === 1)
    val expected = li.join(
      hopRows.select("l_orderkey", "l_linenumber").distinct(),
      Seq("l_orderkey", "l_linenumber"), "left_semi")
    assert(res("lineitem").count() == expected.count())
    assert(expected.count() >= hopRows.count(),
      "id-space materialization is a superset of the hop's own rows")
  }

  test("runAll: unions per-type matches across patterns, with dedup") {
    val patterns = Seq(">customer[21;22]>orders#", ">customer[21]>orders#",
      ">nation[1]>customer#")
    val m = PatternQuery.runAll(spark, dir, cat, patterns)
    assert(m.keySet == Set("orders", "customer"))
    val manual = patterns.map(PatternQuery.run(spark, dir, cat, _))
    def manualUnion(tn: String) =
      manual.flatMap(_.get(tn)).reduce(_ union _).distinct()
    assert(m("orders").count() == manualUnion("orders").count())
    assert(m("customer").count() == manualUnion("customer").count())
    // pattern 2 is a subset of pattern 1 — dedup means no double-counting
    assert(m("orders").count() ==
      PatternQuery.run(spark, dir, cat, ">customer[21;22]>orders#")(
        "orders").count())
  }

  test("runAll: '%' placeholders consume id lists in pattern order") {
    val m = PatternQuery.runAll(spark, dir, cat,
      Seq(">customer%#", ">customer%#"),
      idLists = Seq(Seq(Seq("21")), Seq(Seq("22"))))
    assert(m("customer").count() == 2)
    val keys = m("customer").select("c_custkey")
      .collect().map(_.getLong(0)).toSet
    assert(keys == Set(21L, 22L))
    intercept[IllegalArgumentException](
      PatternQuery.runAll(spark, dir, cat,
        Seq(">customer%#", ">customer%#"), idLists = Seq(Seq(Seq("21")))))
  }
}
