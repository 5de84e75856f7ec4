package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ingest.Schematic

/** Multiplexing writer/reader — the Spark analog of the reference's mux
  * driver (/root/reference/kcidb/db/mux.py:484-518 `load`: "Load data
  * into every driver", with per-member schema upgrade before each
  * member's load; mux.py:397-470 `dump_iter`/`query_iter` and the class
  * doc at mux.py:33-46: "Each database will receive the loaded data,
  * but only the first one will be queried").
  *
  * Members are parquet sinks, each declared at its own version of a
  * shared [[graft.ingest.Schematic]] chain — the reference's member
  * drivers sitting at different schema versions, with `load` upgrading
  * the incoming batch to each member's version
  * (mux.py:505 `driver_io_schema.upgrade(data)`).
  *
  * Scale shape: the incoming frame is lazily localCheckpoint'd, so its
  * (possibly expensive) upstream lineage executes ONCE — the first
  * member write materializes it, every later member re-reads the
  * materialized blocks through its own row-local upgrade projection.
  * Without the pin, an N-member load would re-run the whole upstream
  * pipeline N times (the reference's sibling concern: "We don't want to
  * pack packed data again", mux.py:517). Each member write is
  * embarrassingly parallel over the batch partitions; nothing about the
  * fan-out adds a shuffle.
  */
object Mux {

  /** One member database: a parquet sink at a declared schema version
    * of the shared chain. Order matters — the FIRST member is the one
    * [[query]] reads, the reference's rule. */
  final case class Member(path: String, version: (Int, Int))

  /** Fan one batch out to every member, upgrading it from `from` to
    * each member's declared version first. `mode` follows Spark
    * SaveMode strings; the reference's load() appends into persistent
    * databases, so "append" is the default — gates pass "overwrite"
    * for idempotence. Schematic.upgrade rejects a member OLDER than
    * the data (no downgrade chain), the mux contract that the incoming
    * batch complies with the oldest member's schema (mux.py:503). */
  def load(df: DataFrame, sch: Schematic, from: (Int, Int),
           members: Seq[Member], mode: String = "append"): Unit = {
    require(members.nonEmpty, "mux needs at least one member")
    require(members.map(_.path).distinct.size == members.size,
      s"mux member paths must be distinct: ${members.map(_.path)}")
    val once = df.localCheckpoint(eager = false)
    // unpersist after the last member write: a long-lived session
    // loading repeatedly (the append-mode use case) would otherwise
    // accumulate checkpoint blocks until storage pressure evicts them
    try members.foreach { m =>
      sch.upgrade(once, from, m.version)
        .write.mode(mode).parquet(m.path)
    } finally { once.unpersist(); () }
  }

  /** Read back the FIRST member — mux.py:433 `self.drivers[0]
    * .dump_iter(...)`: dumps and queries serve from the first database
    * only; the rest are write-through replicas. */
  def query(spark: SparkSession, members: Seq[Member]): DataFrame = {
    require(members.nonEmpty, "mux needs at least one member")
    spark.read.parquet(members.head.path)
  }
}
