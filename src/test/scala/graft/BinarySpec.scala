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

  test("resize stub keeps ids and bounds payloads to the target size") {
    import spark.implicits._
    val ds = Seq((1L, "x" * 100), (2L, "y"))
      .toDF("doc_id", "text")
    val rows = Binary.resizeStub(
        Binary.withPayload(ds, "text")
          .select("doc_id", "payload").as[Binary.PayloadRow], w = 4, h = 8)
      .collect().map(r => (r.doc_id, r.payload.length)).toMap
    assert(rows == Map(1L -> 32, 2L -> 1), "min(len, w*h) bytes survive")
  }

  test("frame sampling emits every stride-th frame, at least one per doc") {
    import spark.implicits._
    val ds = Seq((1L, "a" * 100), (2L, "b"))
      .toDF("doc_id", "text")
    val frames = Binary.sampleFramesStub(
        Binary.withPayload(ds, "text")
          .select("doc_id", "payload").as[Binary.PayloadRow],
        stride = 2, frameBytes = 10)
      .collect().groupBy(_.doc_id)
    // doc 1: 10 frames, stride 2 -> indices 0,2,4,6,8
    assert(frames(1L).map(_.frame_idx).sorted.toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    assert(frames(1L).forall(_.payload.length == 10))
    // doc 2: shorter than one frame -> exactly one (partial) frame
    assert(frames(2L).map(_.frame_idx).toSeq == Seq(0L))
  }

  test("payload is the exact utf8 bytes") {
    import spark.implicits._
    val df = Seq((1L, "héllo")).toDF("doc_id", "text")
    val bytes = Binary.withPayload(df, "text")
      .select("payload").head.getAs[Array[Byte]](0)
    assert(bytes.sameElements("héllo".getBytes("UTF-8")))
  }
}
