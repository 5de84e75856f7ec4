package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded random projection (Johnson–Lindenstrauss) of an embedding
  * column — the standard dimensionality-reduction step BEFORE any
  * large-scale similarity structure: a ±1 (Achlioptas) projection keeps
  * pairwise distances within (1±ε) while cutting every downstream ANN
  * cost (LSH hashing, IVF assignment, PQ codebooks) by d/d'.
  *
  * The projection matrix is derived from an md5-seeded coin per (i, j)
  * cell, so it is reproducible across engines and reruns without storing
  * anything: regenerating from the seed IS the model artifact. The coin
  * formula (first hex char of md5("seed:i:j") in '0'..'7' → +1 else −1)
  * is stated identically in the DuckDB oracle.
  *
  * Scale shape: the matrix is a driver-side literal (d'×d doubles — 16×64
  * here, a few KB; even 128×4096 is 4 MB, far under broadcast limits)
  * baked into one codegen'd projection expression, so the whole operator
  * is a per-row map: zero shuffles, zero joins, no fitting pass, no model
  * state. Each output value left-folds the input once via
  * `aggregate(zip_with(...))` — O(d·d') per row inside whole-stage
  * codegen.
  */
object Project {

  /** The (i, j) cell of the seeded ±1 projection matrix; i = input dim,
    * j = output dim, both 1-based. */
  def coin(seed: String, i: Int, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"$seed:$i:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (hex.charAt(0) <= '7') 1.0 else -1.0
  }

  /** Project `vecCol` (array<float|double>, length exactly `inDim`) to
    * `outDim` dims. Output: (idCol, dim 1..outDim, value) in long form —
    * scalar columns, per the rows-gate output rule, and the natural shape
    * for feeding a transposed consumer. Values round to 6 places so the
    * cross-engine float-sum comparison is stable. */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
                       inDim: Int, outDim: Int, seed: String): DataFrame = {
    require(inDim > 0 && outDim > 0,
      s"dims must be positive: in=$inDim out=$outDim")
    val vec = col(vecCol)
    val outs: Seq[Column] = (1 to outDim).map { j =>
      val coins = (1 to inDim).map(i => coin(seed, i, j))
      round(aggregate(
        zip_with(vec, typedLit(coins), (v, c) => v.cast("double") * c),
        lit(0.0), (acc, x) => acc + x), 6)
    }
    df.select(col(idCol), posexplode(array(outs: _*)).as(Seq("__p", "value")))
      .select(col(idCol), (col("__p") + 1).cast("int").as("dim"),
        col("value"))
  }
}
