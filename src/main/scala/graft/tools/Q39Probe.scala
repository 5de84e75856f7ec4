package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of q39_json_files (the get-url-stats shape):
  * times the simulated JSON-doc construction (groupBy + collect_list +
  * to_json), the parse/extract side (from_json + explode + distinct),
  * and the full query, each to a noop sink — answers "which phase
  * dominates" without touching the gate. */
object Q39Probe {
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

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[q39probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // warmup: scan footer + JIT
    li.select(count(lit(1))).collect()

    val ext = element_at(array(lit("log"), lit("json"), lit("tar")),
      (col("l_linenumber") % 3 + 1).cast("int"))
    val fileUrl = concat(lit("https://files.example.org/"),
      col("l_orderkey").cast("string"), lit("/"),
      col("l_linenumber").cast("string"), lit("/part_"),
      col("l_partkey").cast("string"), lit("."), ext)
    val docs = li
      .select(col("l_orderkey"),
        struct(
          concat(lit("part_"), col("l_partkey").cast("string"), lit("."),
            ext).as("name"),
          fileUrl.as("url")).as("f"))
      .groupBy("l_orderkey")
      .agg(collect_list(col("f")).as("output_files"))
      .select(to_json(struct(
        col("l_orderkey").as("id"),
        concat(lit("https://cfg.example.org/"),
          col("l_orderkey").cast("string"), lit(".cfg")).as("config_url"),
        col("output_files"))).as("doc"))

    time("doc-construction")(noop(docs))
    val parsed = docs.select(from_json(col("doc"),
      org.apache.spark.sql.types.DataType.fromDDL(
        "id BIGINT, config_url STRING, " +
          "output_files ARRAY<STRUCT<name: STRING, url: STRING>>"))
      .as("o"))
    time("+parse")(noop(parsed))
    val urls = parsed
      .select(explode(concat(
        transform(col("o.output_files.url"),
          u => struct(lit("orders.output_files.url").as("path"),
            u.as("url"))),
        array(struct(lit("orders.config_url").as("path"),
          col("o.config_url").as("url"))))).as("e"))
      .select(col("e.path").as("path"), col("e.url").as("url"))
    time("+explode")(noop(urls))
    time("+distinct")(noop(urls.distinct()))
    time("full q39")(noop(graft.SparkEntry.queries("q39_json_files")(
      spark, sfDir)))
    spark.stop()
  }
}
