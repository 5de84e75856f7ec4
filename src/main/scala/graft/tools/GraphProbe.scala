package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Octave probe for the graph family (builder-side tool): times
  * Graph.pageRank (g01's knobs) and Graph.hits (g02's) over a planted
  * CONTIGUOUS id space of `n` nodes — `tools/ScaleUp`'s id-shifted
  * copies deliberately break the hashLinks contiguity contract (the
  * fixture's loud guard), so the graph octave plants its own node
  * frame the way HotShingleProbe plants its boilerplate corpus. The
  * operator work (per-round edge⋈rank join + groupBy) is identical to
  * the gate's; only the node source differs.
  *
  * Usage: runMain graft.tools.GraphProbe <nNodes> [reps]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nodes = spark.range(0L, n).toDF("node")
    // untimed warmup at a small n
    graft.graph.Graph.pageRank(spark.range(0L, 1000L).toDF("node"),
        graft.graph.Graph.hashLinks(spark.range(0L, 1000L).toDF("node"),
          graft.SparkEntry.g01Seed, graft.SparkEntry.g01OutDeg),
        iters = 2)
      .write.format("noop").mode("overwrite").save()
    for (r <- 1 to reps) {
      val e = graft.graph.Graph.hashLinks(nodes,
        graft.SparkEntry.g01Seed, graft.SparkEntry.g01OutDeg)
      val t0 = System.nanoTime()
      graft.graph.Graph.pageRank(nodes, e,
          iters = graft.SparkEntry.g01Iters,
          dampNum = graft.SparkEntry.g01DampNum,
          dampDen = graft.SparkEntry.g01DampDen,
          unit = graft.SparkEntry.g01Unit)
        .write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      graft.graph.Graph.hits(nodes, e,
          iters = graft.SparkEntry.g02Iters,
          unit = graft.SparkEntry.g01Unit)
        .write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      graft.graph.Graph.personalizedPageRank(nodes, e,
          seed = col("node") % 3 === 0,
          iters = graft.SparkEntry.g03Iters,
          dampNum = graft.SparkEntry.g01DampNum,
          dampDen = graft.SparkEntry.g01DampDen,
          unit = graft.SparkEntry.g01Unit)
        .write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"rep $r n=$n pagerank=${(t1 - t0) / 1e9}%.2f " +
        f"hits=${(t2 - t1) / 1e9}%.2f " +
        f"trustrank=${(t3 - t2) / 1e9}%.2f")
    }
    spark.stop()
  }
}
