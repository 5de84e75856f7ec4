package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** kcidb-style JSON report ingest: a report is one JSON object with a
  * `version` header and one array of records per object type —
  * `{"version": {"major": 4, "minor": 3}, "checkouts": [...],
  * "builds": [...], "tests": [...]}` (reference: kcidb I/O data passed to
  * kcidb-load / kcidb-merge, /root/reference/kcidb/__init__.py:452-471).
  *
  * Spark-first: `spark.read.json` infers the nested schema distributed;
  * each type's records surface as a DataFrame via one `explode`
  * projection, so a directory of reports at 100 TB is a single JSON scan
  * per type with pushdown on the exploded columns. Composes with
  * [[graft.ingest.Loader.mergeDatasets]] (kcidb-merge) and
  * [[graft.ingest.Loader.upsertMerge]] (load) and with
  * [[graft.ingest.Schematic]] for version upgrades.
  */
object Reports {

  final case class Report(version: (Int, Int),
                          tables: Map[String, DataFrame])

  /** Read one report file (or a directory/glob of same-shaped reports).
    * Returns the version of the FIRST report and a DataFrame per type
    * found among `typeNames`. */
  def read(spark: SparkSession, path: String,
           typeNames: Seq[String]): Report = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val version = {
      val r = raw.select(col("version.major"), col("version.minor")).head()
      (r.getLong(0).toInt, r.getLong(1).toInt)
    }
    val tables = typeNames.filter(raw.columns.contains).map { t =>
      t -> raw.select(explode(col(t)).as("__r")).select(col("__r.*"))
    }.toMap
    Report(version, tables)
  }

  /** kcidb-merge over report files: per type, union all reports' records
    * and drop exact duplicates (kcidb/__init__.py:452-471). */
  def merge(reports: Seq[Report]): Map[String, DataFrame] =
    reports.flatMap(_.tables.keys).distinct.map { t =>
      t -> graft.ingest.Loader.mergeDatasets(
        reports.flatMap(_.tables.get(t)))
    }.toMap
}
