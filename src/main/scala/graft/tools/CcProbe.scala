package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 probe: connectedComponents pointer-halving vs plain min-label
  * propagation, interleaved in ONE session (the phase-free instrument)
  * over the real gate pair graphs. Args: sfDir reps.
  * Prints per-variant wall seconds and the round count each converged
  * in, for BOTH gate pair sources (d05's embedding near-dups — shallow
  * components — and d04's ngram-jaccard pairs — the deeper text
  * chains d16 clusters). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val sources = Seq(
      "d05_pairs" -> (() => Dedup.embeddingNearDupsAuto(emb, "vec_id",
        "embedding", probeFilter = col("vec_id") % 20 === 0,
        threshold = 0.25)),
      "d04_pairs" -> (() => Dedup.ngramJaccardPairsAuto(docs, "doc_id",
        "text", n = 3, probeFilter = col("doc_id") % 10 === 0,
        threshold = 0.02)))
    // r20: sweep (halving, roundsPerProbe) interleaved — (true, 1) is
    // the r19 shipped shape, (true, 2) the batched-probe candidate,
    // (false, 1) the r18 baseline kept for the d06 halving re-check.
    for ((name, mk) <- sources; rep <- 0 until reps;
         (halving, rpp) <- Seq((false, 1), (true, 1), (true, 2))) {
      val t0 = System.nanoTime()
      val n = Dedup.connectedComponents(mk(), "id_a", "id_b",
        halving = halving, roundsPerProbe = rpp).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ccprobe] $name rep=$rep halving=$halving rpp=$rpp " +
        f"wall=$dt%.2f rounds=${Dedup.lastCcIters} rows=$n")
    }
    spark.stop()
  }
}
