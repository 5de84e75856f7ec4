package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.dec

/** Incremental view maintenance for grouped rollups: a materialized
  * per-key summary is kept current by merging MERGEABLE partial states
  * with each delta batch — the base corpus is NEVER rescanned. This is
  * the warehouse pattern behind the reference's continuous-ingest
  * analytics (each kcidb load appends objects and every summary query
  * recomputes from the full store, kcidb/__init__.py:284-301's counts;
  * at 100 TB the recompute is the part you cannot afford): maintain
  * `rollup(base ∪ delta) = merge(state(base), state(delta))` where the
  * state per key is the classic commutative-monoid tuple
  * (count, decimal sum, min, max).
  *
  * Everything here is a plain partial aggregate — the same shape
  * Spark's own map-side combine produces — so merges are associative,
  * commutative, and partitioning-invariant by construction, and the
  * sum is exact DECIMAL (addition is associative; a double sum would
  * drift order-dependently and break the incremental == full-recompute
  * invariant the gate's DuckDB oracle checks bit-for-bit).
  *
  * The distinct-count axis is deliberately absent: COUNT(DISTINCT) is
  * not a monoid over these states — the mergeable answer is the HLL
  * register sketch, which is k01_sketch_distinct's row. Variance-class
  * moments would slot in as additional sum lanes (Σv, Σv²) with the
  * same merge rule.
  *
  * Scale shape: state(delta) is one map-side-combined aggregate over
  * the delta only; merge is a union of two |keys|-sized frames plus
  * one aggregate over |keys| rows. Total cost per refresh is
  * O(|delta| + |keys|) regardless of base size.
  */
object Ivm {

  /** Mergeable per-key rollup state over `df`: count / exact decimal
    * sum / min / max of `valueCol` grouped by `keys`. Emitted columns
    * are the reserved state names (n_rows, sum_value, min_value,
    * max_value); key columns pass through under their own names. */
  def rollupState(df: DataFrame, keys: Seq[Column], valueCol: Column)
      : DataFrame =
    df.groupBy(keys: _*).agg(
      count(lit(1)).as("n_rows"),
      sum(dec(valueCol)).as("sum_value"),
      min(valueCol).as("min_value"),
      max(valueCol).as("max_value"))

  /** Merge two state frames (typically: persisted base state ⊎ the
    * delta's fresh partials) into the state of the union. Column-name
    * keyed so persisted state read back from parquet lines up with a
    * live aggregate; the decimal sum re-sums exactly. */
  def merge(state: DataFrame, delta: DataFrame, keyCols: Seq[String])
      : DataFrame = {
    val stateCols = Seq("n_rows", "sum_value", "min_value", "max_value")
    for (f <- Seq(state, delta); c <- keyCols ++ stateCols)
      require(f.columns.contains(c),
        s"Ivm.merge: frame is missing state column '$c' " +
          s"(has: ${f.columns.mkString(", ")})")
    state.select((keyCols ++ stateCols).map(col): _*)
      .unionByName(delta.select((keyCols ++ stateCols).map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("n_rows")).cast("long").as("n_rows"),
        sum(col("sum_value")).as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
  }
}
