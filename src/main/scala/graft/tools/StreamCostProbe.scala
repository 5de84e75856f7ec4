package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 probe: where does a one-shot AvailableNow gate replay actually
  * spend its wall? Runs representative streaming shapes (stateless
  * projection, windowed agg, flatMapGroupsWithState, stream-stream
  * join) against the events/documents tables and prints every batch's
  * durationMs breakdown (addBatch / getBatch / planning via
  * queryPlanning / walCommit / commitOffsets) plus the query start/stop
  * overhead around them. Args: sfDir. */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
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
    import graft.streaming.Streams

    def streamTable(table: String): DataFrame = {
      val path = java.nio.file.Paths.get(s"$sfDir/$table.parquet")
        .toAbsolutePath
      val schema = spark.read.parquet(path.toString).schema
      val srcDir = java.nio.file.Paths
        .get("target", s"streamcost_src_$table").toAbsolutePath
      java.nio.file.Files.createDirectories(srcDir)
      val link = srcDir.resolve(s"$table.parquet")
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(link, path)
      spark.readStream.schema(schema).parquet(srcDir.toString)
    }

    def events: DataFrame =
      graft.sources.Tables.normalizeTs(streamTable("events"))

    def run(name: String, out: DataFrame, mode: String): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "streamcost_")
      val t0 = System.nanoTime()
      val q = out.writeStream.format("memory").queryName(s"sc_$name")
        .outputMode(mode)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val ps = q.recentProgress
      val batchSum = ps.map(_.durationMs.values().stream()
        .mapToLong(_.longValue).sum).sum / 1e3
      println(f"[streamcost] $name wall=$wall%.2f batches=${ps.length} " +
        f"batch_total=$batchSum%.2f startstop=${wall - batchSum}%.2f")
      for (p <- ps) {
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[streamcost]   batch=${p.batchId} rows=${p.numInputRows} $d")
      }
      spark.catalog.dropTempView(s"sc_$name")
      graft.sources.Warehouse.rmTree(ckpt.toFile)
    }

    import spark.implicits._
    // stateless projection (st04/st05 class)
    run("stateless_proj",
      streamTable("documents").select(col("doc_id"),
        length(col("text")).as("len")), "append")
    // windowed agg with watermark (st01 class)
    run("window_agg", Streams.hourlyAggStream(events), "complete")
    // flatMapGroupsWithState (st06 class)
    run("fmgws", Streams.sessionizeStream(
      events.select(col("user_id"), col("event_id"), col("ts"))
        .withWatermark("ts", "35 days")
        .as[Streams.SessionEvent], gapSec = 1800).toDF(), "append")
    // stream-stream interval join (st11 class)
    run("ss_join", Streams.errorResolutionJoin(
      events, withinSec = 3600, wmDelay = Some("1 hour")), "append")
    spark.stop()
  }
}
