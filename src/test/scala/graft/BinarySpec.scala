package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Binary
import graft.sources.Tables

class BinarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf

  test("partition-batched decode matches the column-expression metadata") {
    val docs = Binary.withPayload(Tables(spark, dir, "documents"), "text")
    val viaCols = Binary.metaColumns(docs)
    val viaPartitions = Binary.decodeFrame(docs).toDF()
    assert(viaCols.count() == viaPartitions.count())
    assert(viaCols.exceptAll(viaPartitions).count() == 0)
    assert(viaPartitions.exceptAll(viaCols).count() == 0)
  }

  test("payload is the exact utf8 bytes") {
    import spark.implicits._
    val df = Seq((1L, "héllo")).toDF("doc_id", "text")
    val bytes = Binary.withPayload(df, "text")
      .select("payload").head.getAs[Array[Byte]](0)
    assert(bytes.sameElements("héllo".getBytes("UTF-8")))
  }
}
