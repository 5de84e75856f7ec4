package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    // warmup
    docs.select(count(lit(1))).collect()

    val toks = docs.select(col("doc_id").as("id"),
      Dedup.tokens(col("text")).as("tk"))
    time("tokenize")(toks.select(sum(size(col("tk")))).head().getLong(0))

    val sh = docs.select(col("doc_id").as("id"),
      Dedup.shingles(Dedup.tokens(col("text")), 3).as("sh"))
    time("shingles")(sh.select(sum(size(col("sh")))).head().getLong(0))

    val ex = sh.select(col("id"), explode(col("sh")).as("t"))
    time("explode+2hash")(ex.select(
      sum(hash(col("t")).cast("long") + xxhash64(col("t")))).count())

    time("sig-agg")(Dedup.minhashSignatures(sh, 64).count())

    time("full d02")(Dedup.minhashNearDups(docs, "doc_id", "text",
      64, 16, 0.02).count())

    time("full d04")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3,
      col("doc_id") % 10 === 0, 0.02).count())
    spark.stop()
  }
}
