package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k for a bounded probe set — the probe
  * side is broadcast, so the corpus streams once through a codegen'd
  * cosine + TakeOrdered per probe; cost is O(|probes| × |corpus|) with no
  * corpus shuffle. Scale path: random-hyperplane LSH buckets the corpus by
  * signature so each probe only scans its bucket — the bucket id is the
  * shuffle key, and recall/cost trades off via signature bits.
  */
object Knn {

  /** Brute-force top-k cosine neighbors for each probe row.
    * Output: (probe_id, neighbor_id, rank), rank 1..k by cosine desc with
    * neighbor_id as deterministic tiebreak. */
  def bruteForceKnn(emb: DataFrame, idCol: String, vecCol: String,
                    probeFilter: Column, k: Int): DataFrame = {
    val probes = emb.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("v_p"))
    val corpus = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(probes)
      .join(corpus, col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        Vectors.cosine(col("v_p"), col("v_c")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("cos")
  }

  /** LSH-bucketed approximate top-k: candidates share the probe's signature
    * bucket; ranking within bucket is exact cosine. Returns the same shape
    * as bruteForceKnn (may return < k rows per probe — approximate). */
  def lshKnn(emb: DataFrame, idCol: String, vecCol: String,
             probeFilter: Column, k: Int, bits: Int): DataFrame = {
    val sigExpr = lshSignatureExpr(vecCol, bits)
    val withSig = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      sigExpr.as("sig"))
    val probes = withSig.filter(probeFilter)
      .select(col("id").as("probe_id"), col("v").as("v_p"), col("sig"))
    val corpus = withSig
      .select(col("id").as("neighbor_id"), col("v").as("v_c"), col("sig"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    probes.join(corpus, Seq("sig"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        Vectors.cosine(col("v_p"), col("v_c")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("cos")
  }

  /** Signature as a single SQL-lambda expression (shift by a column amount
    * requires the SQL form). */
  def lshSignatureExpr(vecCol: String, bits: Int): Column = expr(
    s"""aggregate(
          sequence(0, ${bits - 1}),
          0L,
          (acc, p) -> acc | CASE WHEN
            aggregate(
              sequence(1, size($vecCol)),
              cast(0.0 as double),
              (s, i) -> s + cast(element_at($vecCol, i) as double) *
                ((cast(pmod(hash(p, i), 2000) as double) - 1000.0) / 1000.0)
            ) > 0 THEN shiftleft(1L, p) ELSE 0L END
        )""")
}
