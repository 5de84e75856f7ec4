package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table registry for the graft engine.
  *
  * Mirrors the role of kcidb's database table layer
  * (/root/reference/kcidb/db/sqlite/v04_00.py:164-243): a fixed catalog of
  * typed tables. Here each table is a parquet dataset under a scale-factor
  * directory; Spark's parquet source gives us predicate pushdown, column
  * pruning and vectorized reads for free, which is the 100 TB path (at scale
  * these directories are partitioned table roots, not single files).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet timestamp[ns]; normalize to a microsecond
    * timestamp column named `ts` regardless of how the session reads it
    * (Spark reads nanos as LongType when
    * spark.sql.legacy.parquet.nanosAsLong=true, else errors on some
    * versions). Keeping one canonical µs column makes every downstream
    * window/dedup operator engine-portable.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos-as-long: `div` is exact integer division (epoch-ns values
        // exceed double's 2^53 exact range, so `/ 1000` in double could be
        // off by one µs), matching DuckDB's ns->µs cast.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
