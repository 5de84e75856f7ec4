package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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

  /** Batch decode over partitions: the real plumbing for a heavyweight
    * decoder (codec/model handle initialized once per partition, rows
    * streamed through). Decode itself is stubbed deterministically. */
  def decodePartitions(spark: SparkSession, df: DataFrame): DataFrame = {
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex("doc_id")
    val payloadIdx = inSchema.fieldIndex("payload")
    val outSchema = StructType(
      StructField("doc_id", LongType, nullable = false) +: metaSchema.fields)
    val rdd = df.rdd.mapPartitions { rows =>
      // STUB: with a real codec this is where the per-partition decoder
      // context would be created (once, not per row).
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val len = bytes.length.toLong
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
        Row(r.getLong(idIdx), len, len % 640, len * 7 % 480, digest)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
