package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder — the warehouse
  * primitive that turns a change log (one row per observed version of
  * a key) into interval-versioned history: every row gains a 1-based
  * `version`, a `valid_to` equal to the NEXT version's `valid_from`
  * (the open end carries `endMarker`), and an `is_current` flag. The
  * reference keeps first/last-modified timestamps per object
  * (kcidb-count/dump windows); SCD2 is what a warehouse derives from
  * them when consumers need as-of joins over history.
  *
  * Scale shape: BOTH window functions (row_number and lead) share ONE
  * `partitionBy(key) orderBy(seq, tie)` spec, so the plan carries a
  * single hash exchange on the key and one per-key LOCAL sort — the
  * [[Sessionize]] discipline; never a global sort, and per-key version
  * chains are typically short (bounded window state). Ties are broken
  * by the caller-named unique column so history is deterministic under
  * any partitioning.
  */
object Scd {

  /** See object doc. `seqCol` must order versions within a key
    * (lexicographic for date strings, numeric for epochs); `tieCol`
    * must be unique within (key, seq) for deterministic history. */
  def scd2(df: DataFrame, keyCol: String, seqCol: String,
           tieCol: String, endMarker: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol), col(tieCol))
    df.withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to",
        coalesce(lead(col(seqCol), 1).over(w), lit(endMarker)))
      .withColumn("is_current",
        (col("valid_to") === endMarker).cast("long"))
  }
}
