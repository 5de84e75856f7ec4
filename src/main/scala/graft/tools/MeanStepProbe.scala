package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 in-session A/B for the k-means fit-mean step (the CcProbe
  * discipline: the box's noise is bursty, so the two formulations are
  * timed INTERLEAVED in one session). Each rep runs the full
  * [[graft.sim.Ivf.fitCentroids]]-shaped loop (assign → mean →
  * localCheckpoint, `iters` rounds) over the sf embeddings with the
  * exploded mean step (`old`) and the [[graft.functions.VectorAvg]]
  * one-pass step (`new`), and prints both walls plus the resulting
  * centroid checksum (must be IDENTICAL — the equivalence claim,
  * end-to-end). Args: sfDir c iters reps.
  */
object MeanStepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val c = args(1).toInt
    val iters = args(2).toInt
    val reps = args(3).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4096")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("v"))

    def fit(meanStep: DataFrame => DataFrame): DataFrame = {
      var centroids = corpus.orderBy("id").limit(c)
        .select(col("id").as("cluster"), col("v").as("centroid"))
        .localCheckpoint()
      for (_ <- 0 until iters) {
        val assigned = graft.sim.Ivf.assign(corpus, centroids)
        centroids = meanStep(assigned).localCheckpoint()
      }
      centroids
    }

    def checksum(df: DataFrame): String =
      df.select(md5(concat_ws(",",
          col("cluster"),
          concat_ws(";", transform(col("centroid"),
            e => e.cast("string"))))).as("h"))
        .agg(md5(concat_ws("|", sort_array(collect_list(col("h")))))).head()
        .getString(0)

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // the per-iteration mean-step plans (the gate plans don't show the
    // iteration body — each round materializes via localCheckpoint), for
    // plans/r19: args(4) = outDir enables the dump
    if (args.length > 4) {
      val seed = corpus.orderBy("id").limit(c)
        .select(col("id").as("cluster"), col("v").as("centroid"))
        .localCheckpoint()
      val assigned = graft.sim.Ivf.assign(corpus, seed)
      val mode = org.apache.spark.sql.execution.FormattedMode
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(args(4)))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(args(4), "meanstep_iteration_before.txt"),
        graft.sim.Ivf.meanByClusterViaExplode(assigned, Seq("cluster"))
          .queryExecution.explainString(mode).getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(args(4), "meanstep_iteration_after.txt"),
        graft.sim.Ivf.meanByCluster(assigned, Seq("cluster"))
          .queryExecution.explainString(mode).getBytes("UTF-8"))
    }

    // warmup both paths once (JIT/codegen)
    fit(a => graft.sim.Ivf.meanByClusterViaExplode(a, Seq("cluster"))).count()
    fit(a => graft.sim.Ivf.meanByCluster(a, Seq("cluster"))).count()

    for (r <- 0 until reps) {
      spark.sparkContext.setJobDescription(s"meanstep old rep$r")
      val (tOld, hOld) = time(checksum(
        fit(a => graft.sim.Ivf.meanByClusterViaExplode(a, Seq("cluster")))))
      spark.sparkContext.setJobDescription(s"meanstep new rep$r")
      val (tNew, hNew) = time(checksum(
        fit(a => graft.sim.Ivf.meanByCluster(a, Seq("cluster")))))
      println(f"rep$r: old=$tOld%.2f s new=$tNew%.2f s " +
        s"hash_equal=${hOld == hNew} ($hOld)")
    }
    spark.stop()
  }
}
