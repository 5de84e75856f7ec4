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
  * Scale shape, two modes:
  *   - `exact = false` (the 100 TB default): distinct counts use
  *     approx_count_distinct (HLL partials, k01's machinery) and the
  *     WHOLE profile is ONE scan collapsing into a single partial
  *     aggregate — no Expand, no shuffle wider than one row per
  *     partition (spec-pinned plan).
  *   - `exact = true` (the gate/oracle mode): one single-column
  *     aggregate branch per column, unioned. NOT the tempting
  *     one-aggregate multi-countDistinct form — with ≥2 distinct
  *     columns Catalyst's RewriteDistinctAggregates grounds on an
  *     Expand grouped by the UNION of all distinct columns, a
  *     near-row-unique key, so the "partial" aggregate reduces nothing
  *     and ~#cols×N wide rows sort-aggregate and shuffle (measured 4.3 s
  *     vs 1.0 s at sf0.1 on orders). Per-branch, the single distinct
  *     plans Spark's no-Expand 4-stage aggregate: map-side dedup on the
  *     value, a shuffle of DISTINCT values only, and each branch's
  *     parquet scan prunes to its one column — total I/O across
  *     branches ≈ one full-table scan, all HashAggregate/codegen.
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

  /** The type-appropriate extrema aggregates for one column. */
  private def extrema(f: StructField): (Column, Column, Column, Column) = {
    val c = col(f.name)
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
    (coalesce(numMin, lit(-1.0)), coalesce(numMax, lit(-1.0)),
      coalesce(strMin, lit("")), coalesce(strMax, lit("")))
  }

  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    if (exact) {
      // one branch per column; each scans ONLY its column
      val branches = fields.map { f =>
        val c = col(f.name)
        val (numMin, numMax, strMin, strMax) = extrema(f)
        df.select(c).agg(count(lit(1)).as("n_rows"),
          count(c).as("n_nonnull"), countDistinct(c).as("n_distinct"),
          numMin.as("num_min"), numMax.as("num_max"),
          strMin.as("str_min"), strMax.as("str_max"))
          .select(lit(f.name).as("column"), col("n_rows"),
            col("n_nonnull"), col("n_distinct"), col("num_min"),
            col("num_max"), col("str_min"), col("str_max"))
      }
      branches.reduce(_.unionByName(_))
    } else {
      def perCol(f: StructField): Column = {
        val c = col(f.name)
        val (numMin, numMax, strMin, strMax) = extrema(f)
        struct(lit(f.name).as("column"), count(c).as("n_nonnull"),
          approx_count_distinct(c).as("n_distinct"),
          numMin.as("num_min"), numMax.as("num_max"),
          strMin.as("str_min"), strMax.as("str_max"))
          .as(s"__p_${f.name}")
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
}
