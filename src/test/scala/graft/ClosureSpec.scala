package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.TestCatalog
import graft.sources.Tables

/** Closure semantics vs direct joins, on sf0.001. */
class ClosureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf
  private val cat = TestCatalog.catalog

  test("childrenClosure matches direct join chain") {
    val roots = Seq(21L).toDF("c_custkey")
    val m = cat.childrenClosure(spark, dir, Map("customer" -> roots))
    assert(m.keySet == Set("customer", "orders", "lineitem"))

    val orders = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val expOrders = orders.filter(col("o_custkey") === 21).count()
    val expLi = li.join(orders.filter(col("o_custkey") === 21),
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(m("customer").count() == 1)
    assert(m("orders").count() == expOrders)
    assert(m("lineitem").count() == expLi)
  }

  test("parentsClosure walks every parent relation (incl. side parents)") {
    val roots = Seq((1L, 3L)).toDF("l_orderkey", "l_linenumber")
    val m = cat.parentsClosure(spark, dir, Map("lineitem" -> roots))
    // lineitem's parents: orders (spine) + part + supplier (side), then
    // customer -> nation -> region up the spine.
    assert(m.keySet == Set("lineitem", "orders", "part", "supplier",
      "customer", "nation", "region"))
    assert(m("lineitem").count() == 1)
    assert(m("orders").count() == 1)
    assert(m("customer").count() == 1)
    assert(m("part").count() == 1)
    assert(m("supplier").count() == 1)
    // nation is reached twice: through the customer spine AND through the
    // supplier side parent — expect the distinct union of both nations.
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_orderkey") === 1 && col("l_linenumber") === 3)
      .head
    val custNation = Tables(spark, dir, "orders")
      .filter(col("o_orderkey") === 1)
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .head.getAs[Number]("c_nationkey").longValue
    val suppNation = Tables(spark, dir, "supplier")
      .filter(col("s_suppkey") === li.getAs[Number]("l_suppkey").longValue)
      .head.getAs[Number]("s_nationkey").longValue
    assert(m("nation").count() == Set(custNation, suppNation).size)
    assert(m("region").count() >= 1)
  }

  test("only root id lists carry a broadcast hint, never derived frontiers") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // A hint is legitimate iff its subtree is the caller-supplied root id
    // list (a local relation) — a hint wrapping any table-derived frontier
    // (contains a parquet scan) would force-broadcast unbounded data.
    def assertHintsAreRootOnly(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
        .foreach { h =>
          val scans = h.child.collect { case r: LogicalRelation => r }
          assert(scans.isEmpty,
            s"broadcast hint wraps a derived frontier:\n${h.treeString}")
        }
    val m = cat.childrenClosure(spark, dir,
      Map("customer" -> Seq(21L).toDF("c_custkey")))
    m.values.foreach(assertHintsAreRootOnly)
    val pm = cat.parentsClosure(spark, dir,
      Map("lineitem" -> Seq((1L, 3L)).toDF("l_orderkey", "l_linenumber")))
    pm.values.foreach(assertHintsAreRootOnly)
  }

  test("closures of empty roots are empty") {
    val roots = Seq.empty[Long].toDF("c_custkey")
    val m = cat.childrenClosure(spark, dir, Map("customer" -> roots))
    assert(m.values.forall(_.count() == 0))
  }
}
