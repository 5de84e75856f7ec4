package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Tables, Warehouse}

class WarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf

  /** At sf0.001 everything broadcasts, hiding the bucketing: pin the
    * shuffle-join path (what a fact-fact join takes at scale) for the
    * duration of the assertion. */
  private def withShuffleJoins[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("joining two tables bucketed on the key needs no shuffle at all") {
    val orders = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    val lineitem = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    Warehouse.writeBucketed(orders, "wh_orders", Seq("o_orderkey"), 8)
    Warehouse.writeBucketed(lineitem, "wh_lineitem", Seq("l_orderkey"), 8)

    withShuffleJoins {
      val joined = spark.table("wh_lineitem")
        .join(spark.table("wh_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join must elide both exchanges:\n$p")

      // and it is still the same join result as the plain tables
      val plain = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == plain.count())
    }
  }

  test("q35 gate: the bucketed join contributes zero exchanges — the " +
      "only one in the whole pipeline is the final aggregate's") {
    withShuffleJoins {
      val df = SparkEntry.queries("q35_bucketed_join")(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 1,
        s"expected only the aggregate exchange, got $exchanges:\n$p")
    }
  }

  test("a bucketed-to-unbucketed join shuffles only the unbucketed side") {
    withShuffleJoins {
      val part = Tables(spark, dir, "part").select("p_partkey", "p_name")
      val joined = spark.table("wh_lineitem").join(
        part, col("l_orderkey") === col("p_partkey"))
      val p = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 1,
        s"expected exactly one exchange (unbucketed side), got $exchanges:\n$p")
    }
  }
}
