package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join splitting is unavailable (disabled, or the skew is in an
  * aggregation feeding the join rather than the join itself).
  *
  * The fact side's hot keys spread over `saltFactor` sub-keys via a
  * deterministic per-row salt; the dimension side replicates each row
  * `saltFactor` times (one per salt value) so every sub-key still finds
  * its match. The join key becomes (key, salt): a key holding s% of the
  * fact table now occupies `saltFactor` shuffle partitions instead of one.
  * Replication multiplies the smaller side by `saltFactor` — pick it from
  * the observed skew ratio, keep the replicated side the small one.
  */
object SkewJoin {

  /** Equi-join `facts` (skewed, salted) with `dims` (replicated).
    * Result = facts.join(dims, keys, joinType) exactly; joinType must not
    * need dim-side multiplicity (inner / left variants are safe).
    *
    * @param saltCols discriminator columns mixed with the key hash to
    *                 spread a hot key's rows across salts. Must vary
    *                 WITHIN a key group (the key hash alone is constant
    *                 per key and would spread nothing); one cheap narrow
    *                 column suffices — hashing a wide fact row per tuple
    *                 is wasted work. Empty (default) falls back to every
    *                 non-key column. Deterministic either way, so task
    *                 retries re-derive identical salts (a random or
    *                 monotonic-id spreader would not). */
  def saltedJoin(facts: DataFrame, dims: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner",
                 saltCols: Seq[String] = Seq.empty): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(Seq("inner", "left", "left_outer", "left_semi")
      .contains(joinType), s"joinType $joinType not multiplicity-safe")
    val discs =
      if (saltCols.nonEmpty) saltCols
      else facts.columns.toSeq.filterNot(keys.contains)
    val salt = pmod(hash((keys ++ discs).map(col): _*), lit(saltFactor))
    val saltedFacts = facts.withColumn("__salt", salt)
    val replicatedDims = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFacts
      .join(replicatedDims, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Top-N heaviest key groups with their counts — the diagnostic that
    * picks saltFactor (one partial-agg pass + TakeOrdered). */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc)
      .limit(topN)
}
