package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column table profiling — the corpus-QA "describe" every ingest
  * runs before committing data to a training mix (the generic-table
  * sibling of the documents-only t19 data card): one row per column
  * with row/non-null/distinct counts and type-appropriate extrema.
  * kcidb's operational analog is the per-object-type counting of
  * `kcidb-count` (/root/reference/kcidb/__init__.py:284-301) — this
  * extends it to column granularity.
  *
  * Scale shape: ONE pass over the table; every statistic is a
  * map-side-combinable aggregate. With `exact = false` (the 100 TB
  * default) distinct counts use approx_count_distinct (HLL partials,
  * k01's machinery) and the whole profile is a single partial
  * aggregate — no Expand, no shuffle wider than one row per partition.
  * `exact = true` (the gate/oracle mode) swaps in countDistinct, which
  * plans Spark's Expand over the column set — exact, still one scan,
  * cost ∝ #columns and documented as the small-table mode.
  *
  * Output sentinels instead of NULLs (the st05 scalar-gate rule: the
  * driver's pandas row-sort cannot order None/str mixes): numeric
  * extrema are -1.0 for non-numeric columns, string extrema "" for
  * non-string columns; `column` keys the row, so sentinels can never
  * collide with a real value of the same field. Timestamps profile as
  * epoch seconds (the repo's ts_sec convention); doubles round to 6dp
  * (the float-emission convention).
  */
object Profiler {

  /** Columns this profiler understands, as (name, kind) with kind in
    * {num, ts, str} — shared with the SQL oracle generator. */
  def kinds(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case _: NumericType => f.name -> "num"
        // parquet timestamp[us] without tz reads as TIMESTAMP_NTZ in
        // Spark 4 — both flavors profile as epoch seconds
        case _: TimestampType | TimestampNTZType => f.name -> "ts"
        case _ => f.name -> "str"
      }
    }

  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    def perCol(f: StructField): Column = {
      val c = col(f.name)
      val nd = if (exact) countDistinct(c) else approx_count_distinct(c)
      val (numMin, numMax) = f.dataType match {
        case _: NumericType =>
          (round(min(c).cast("double"), 6), round(max(c).cast("double"), 6))
        case _: TimestampType | TimestampNTZType =>
          // repo ts_sec convention: cast-to-long = UTC epoch seconds.
          // NTZ first re-anchors to session-tz TIMESTAMP (pinned UTC
          // everywhere in graft — Tables.normalizeTs rationale), since
          // Spark forbids a direct TIMESTAMP_NTZ → BIGINT cast.
          val ts = c.cast(TimestampType)
          (min(graft.util.epochSec(ts)).cast("double"),
            max(graft.util.epochSec(ts)).cast("double"))
        case _ => (lit(-1.0), lit(-1.0))
      }
      val (strMin, strMax) = f.dataType match {
        case StringType => (min(c), max(c))
        case _ => (lit(""), lit(""))
      }
      struct(lit(f.name).as("column"), count(c).as("n_nonnull"),
        nd.as("n_distinct"),
        coalesce(numMin, lit(-1.0)).as("num_min"),
        coalesce(numMax, lit(-1.0)).as("num_max"),
        coalesce(strMin, lit("")).as("str_min"),
        coalesce(strMax, lit("")).as("str_max")).as(s"__p_${f.name}")
    }
    df.agg(count(lit(1)).as("__n"), fields.map(perCol): _*)
      .select(col("__n").as("n_rows"),
        explode(array(fields.map(f => col(s"__p_${f.name}")): _*)).as("p"))
      .select(col("p.column").as("column"), col("n_rows"),
        col("p.n_nonnull").as("n_nonnull"),
        col("p.n_distinct").as("n_distinct"),
        col("p.num_min").as("num_min"), col("p.num_max").as("num_max"),
        col("p.str_min").as("str_min"), col("p.str_max").as("str_max"))
  }
}
