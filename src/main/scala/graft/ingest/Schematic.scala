package graft.ingest

import org.apache.spark.sql.DataFrame

/** Schema version lineage — the Spark-native analog of kcidb's schematic
  * metaclass (/root/reference/kcidb/db/schematic.py:153-172 `lineage` /
  * `history`, sqlite/v05_00.py:147-210 `_inherit`).
  *
  * kcidb database schemas form a single-inheritance chain; upgrading a
  * database applies each child's `_inherit` (ALTER TABLE ADD COLUMN +
  * UPDATE backfills) in history order. graft expresses one version's
  * inherit step as a `DataFrame => DataFrame` — declarative column
  * add/derive/backfill that Catalyst fuses into the reading scan, so a
  * 100 TB "migration" is no rewrite at all until the next materialization,
  * and the same chain upgrades batch tables and streaming frames alike.
  */
final class Schematic(
    val table: String,
    steps: Seq[((Int, Int), DataFrame => DataFrame)]) {

  require(steps.nonEmpty, "schematic needs at least one version")
  require(steps.map(_._1) == steps.map(_._1).sorted,
    s"versions must be ascending: ${steps.map(_._1)}")

  /** Every version in history order (first → latest), kcidb `history`. */
  val history: Seq[(Int, Int)] = steps.map(_._1)

  private val inherits: Map[(Int, Int), DataFrame => DataFrame] = steps.toMap

  /** Upgrade a frame complying with version `from` to version `to` by
    * composing every later version's inherit step, in order. */
  def upgrade(df: DataFrame, from: (Int, Int), to: (Int, Int)): DataFrame = {
    require(history.contains(from), s"unknown source version $from")
    require(history.contains(to), s"unknown target version $to")
    require(history.indexOf(from) <= history.indexOf(to),
      s"cannot downgrade $table from $from to $to")
    history
      .slice(history.indexOf(from) + 1, history.indexOf(to) + 1)
      .foldLeft(df)((acc, v) => inherits(v)(acc))
  }

  /** Upgrade straight to the latest version. */
  def upgradeToLatest(df: DataFrame, from: (Int, Int)): DataFrame =
    upgrade(df, from, history.last)
}
