package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed warehouse tables: the co-located-join path promised in
  * SURVEY §5. Writing both sides of a recurring fact-fact join bucketed
  * (and sorted) by the join key lets the planner elide BOTH exchanges —
  * the join becomes a zip of pre-shuffled buckets, which at 100 TB turns
  * the recurring ETL join from the dominant shuffle into pure local work.
  * The one-time bucketing cost is the same shuffle the first join would
  * have paid anyway.
  */
object Warehouse {

  /** Write `df` as a bucketed+sorted parquet table in the session catalog.
    * `numBuckets` must match on both sides of an intended co-located join
    * (Spark only elides exchanges for equal bucket counts). */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCols: Seq[String], numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // A managed table's location can outlive its catalog entry (the
    // in-memory catalog forgets across sessions, the directory does not);
    // clear both so the write is a true overwrite.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Read a catalog table back (bucket metadata rides along). */
  def table(df: DataFrame, name: String): DataFrame =
    df.sparkSession.table(name)
}
