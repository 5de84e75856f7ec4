package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake; the Spark-side plumbing — schema,
  * partition batching, iterator discipline (no per-row task setup) — is the
  * real thing, and is what matters at 100 TB: `mapPartitions` amortizes any
  * model/codec initialization once per partition, the Scala analog of
  * `mapInPandas` batch processing.
  */
object Binary {

  /** Attach a binary payload column (here: utf8 bytes of a text column —
    * with real media this is the file/blob bytes). */
  def withPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast(BinaryType))

  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** Column-expression metadata extraction (codegen'd; used by the verify
    * query). The width/height "decode" is a STUB: a deterministic function
    * of the byte length standing in for a real image header parse. */
  def metaColumns(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      (octet_length(col("payload")).cast("long") % 640).as("width"),
      (octet_length(col("payload")).cast("long") * 7 % 480).as("height"),
      md5(col("payload")).as("checksum"))

  final case class PayloadRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedMeta(doc_id: Long, byte_len: Long, width: Long,
                               height: Long, checksum: String)

  /** Batch decode over partitions: the real plumbing for a heavyweight
    * decoder — Dataset-typed `mapPartitions`, so the codec/model handle is
    * initialized once per PARTITION (not per row) and rows stream through
    * with Tungsten encoders (no RDD hop, no Row boxing). Decode itself is
    * a deterministic STUB (the container has no media codecs); it matches
    * [[metaColumns]] bit-for-bit, which the spec asserts. */
  def decodePartitions(ds: Dataset[PayloadRow]): Dataset[DecodedMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // Per-partition init: with a real codec this is the decoder context.
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val len = r.payload.length.toLong
        digest.reset()
        val sum = digest.digest(r.payload).map("%02x".format(_)).mkString
        DecodedMeta(r.doc_id, len, len % 640, len * 7 % 480, sum)
      }
    }
  }

  /** [[decodePartitions]] over a payload frame (see [[withPayload]]). */
  def decodeFrame(df: DataFrame): Dataset[DecodedMeta] = {
    import df.sparkSession.implicits._
    decodePartitions(df.select(col("doc_id"), col("payload")).as[PayloadRow])
  }

  final case class ResizedMeta(doc_id: Long, width: Long, height: Long,
                               payload: Array[Byte])
  final case class Frame(doc_id: Long, frame_idx: Long,
                         payload: Array[Byte])

  /** Resize stub: the payload transform is a deterministic fake (truncate
    * to the target "pixel count"), but the Spark shape is real — a typed
    * map keeping the binary column opaque, fused into codegen'd pipelines
    * upstream/downstream. */
  def resizeStub(ds: Dataset[PayloadRow], w: Long, h: Long)
      : Dataset[ResizedMeta] = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      val n = math.min(r.payload.length.toLong, w * h).toInt
      ResizedMeta(r.doc_id, w, h, r.payload.take(n))
    }
  }

  /** Frame-sample stub: one-to-many partition-batched extraction — every
    * `stride`-th "frame" (here: byte window) becomes a row. The iterator
    * discipline is the real thing: per-partition demux context, lazy
    * output, no per-row setup, no materialized frame lists. */
  def sampleFramesStub(ds: Dataset[PayloadRow], stride: Int,
                       frameBytes: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    require(stride > 0 && frameBytes > 0)
    ds.mapPartitions { rows =>
      // Per-partition init: a real video demuxer context would open here.
      rows.flatMap { r =>
        Iterator.range(0, math.max(r.payload.length / frameBytes, 1))
          .filter(_ % stride == 0)
          .map { i =>
            Frame(r.doc_id, i.toLong,
              r.payload.slice(i * frameBytes,
                math.min((i + 1) * frameBytes, r.payload.length)))
          }
      }
    }
  }
}
