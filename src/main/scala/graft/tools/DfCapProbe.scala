package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Builder-side timing probe for the df-cap pipeline variants
  * (uncapped vs manual cap vs auto-derived cap) — same JVM, warmup
  * first, so the comparison isolates the cap machinery itself. */
object DfCapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"""{"probe":"$name","sec":${(System.nanoTime()-t0)/1e9}%.2f,"rows":$n}""")
    }
    val probe = col("doc_id") % 10 === 0
    // warmup (JIT + parquet footer caches)
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, probe, 0.02).count()
    for (round <- 1 to 2) {
      time(s"d04_uncapped_$round")(Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", 3, probe, 0.02).count())
      time(s"d04_manual210_$round")(Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", 3, probe, 0.02, maxDf = Some(210)).count())
      time(s"d04_auto_$round")(Dedup.ngramJaccardPairsAuto(
        docs, "doc_id", "text", 3, probe, 0.02).count())
      time(s"capderive_$round") {
        Dedup.autoDfCap(docs, "text", 3)
      }
      time(s"d17_uncapped_$round")(Dedup.containmentPairs(
        docs, "doc_id", "text", 3, 0.9).count())
      time(s"d17_auto_$round")(Dedup.containmentPairsAuto(
        docs, "doc_id", "text", 3, 0.9).count())
    }
    spark.stop()
  }
}
