package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (builder-side, not driver contract): times the two-level
  * coarse-then-fine SemDeDup path against single-level at the SAME
  * effective cell count on a given dir — the overhead price of the
  * scale path (the envelope where two-level becomes MANDATORY,
  * n > targetCell·maxCells ≈ 1.3e8 rows, is out of local reach; what
  * is measurable locally is that the grouped fit/assign machinery
  * carries no pathological constant). Args: sfDir [targetCell]. */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val targetCell = if (args.length > 1) args(1).toLong else 1000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables(spark, dir, "embeddings")
    val n = emb.count()
    val c = graft.sim.CellKnobs.cellsForPairs(n, targetCell)
    // the exact split the auto path would use were the envelope crossed
    // at this corpus's needed cell count — the production derivation,
    // never a re-implementation that could drift from it
    val (c1, c2) = graft.sim.CellKnobs.coarseFineForPairs(n, targetCell)
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = f
      ((System.nanoTime() - t0) / 1e9, out)
    }
    val (tSingle, keptSingle) = timed {
      graft.dedup.Dedup.semanticDedup(emb, "vec_id", "embedding",
        c = c, tau = 0.25).count()
    }
    val (tTwo, keptTwo) = timed {
      graft.dedup.Dedup.semanticDedupTwoLevel(emb, "vec_id", "embedding",
        c1 = c1, c2 = c2, tau = 0.25).count()
    }
    println(f"""{"dir":"$dir","rows":$n,"c":$c,"c1":$c1,"c2":$c2,""" +
      f""""single_sec":$tSingle%.2f,"single_kept":$keptSingle,""" +
      f""""two_sec":$tTwo%.2f,"two_kept":$keptTwo}""")
    spark.stop()
  }
}
