package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopK

class TopKStrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("string top-k: score desc, binary-order tiebreak, bounded merges") {
    // many partitions force partial buffers + merges; ties on score 2.0
    // must resolve by string order (aa < ab < b)
    val rows = Seq(
      ("g", 2.0, "ab"), ("g", 2.0, "b"), ("g", 2.0, "aa"),
      ("g", 5.0, "z"), ("g", 1.0, "q"), ("g", 3.0, "m"),
      ("h", 1.0, "only"))
    val df = spark.createDataFrame(rows).toDF("g", "score", "id")
      .repartition(8)
    val got = df.groupBy("g")
      .agg(TopK.topKByScoreStr(col("score"), col("id"), 3).as("kept"))
      .select(col("g"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("g"), col("pos"), col("kv.id"), col("kv.score"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      ("g", 0) -> (("z", 5.0)), ("g", 1) -> (("m", 3.0)),
      ("g", 2) -> (("aa", 2.0)),
      ("h", 0) -> (("only", 1.0))))
  }

  test("string top-k equals the long variant under an order-preserving " +
      "id mapping") {
    // ids "000".."299" map to longs 0..299; both rankings must agree
    // (same scores, lexicographic == numeric under zero-padding)
    val rows = (0 until 300).map(i => ("g", (i % 7).toDouble, f"$i%03d", i.toLong))
    val df = spark.createDataFrame(rows).toDF("g", "score", "sid", "lid")
      .repartition(16)
    val viaStr = df.groupBy("g")
      .agg(TopK.topKByScoreStr(col("score"), col("sid"), 10).as("kept"))
      .select(explode(col("kept.id")))
      .collect().map(_.getString(0).toLong).toSeq
    val viaLong = df.groupBy("g")
      .agg(TopK.topKByScore(col("score"), col("lid"), 10).as("kept"))
      .select(explode(col("kept.id")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaStr == viaLong)
  }
}
