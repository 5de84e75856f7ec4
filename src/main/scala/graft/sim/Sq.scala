package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization of an embedding column — the memory-side
  * companion to PQ ([[Pq]]): each dimension is linearly mapped to an
  * unsigned byte against the corpus' per-dimension [min, max] envelope,
  * shrinking a float32 vector 4× with no codebook training at all. This
  * is the first compression rung every production vector store offers
  * (faiss `SQ8` / Milvus `SQ8` / Lucene scalar quantization) and the
  * usual default before PQ's accuracy trade is on the table.
  *
  * Scale shape: the FIT is one map-side-combined aggregate to d keys
  * (per-dimension min/max — d rows total regardless of corpus size),
  * folded into a single-row frame of two d-length arrays and zipped
  * into the scan as a broadcast scalar (the t05/t14 1-row class). The
  * ENCODE is then a single codegen'd per-row `transform` — zero
  * shuffles, zero joins on the corpus side, exactly the two-pass
  * fit/apply split that holds at 100 TB (and the fit table is small
  * enough to persist via [[ModelStore]] for the s09-style incremental
  * path).
  *
  * Determinism: codes are `floor((v − lo) · 255 / (hi − lo) + 0.5)`
  * clamped to [0, 255] — floor-of-double with one stated operation
  * order, so Spark and DuckDB produce bit-identical codes (`round()`
  * half-even vs half-up never enters). A constant dimension
  * (hi = lo) codes to 0. In-corpus values never clamp (the envelope is
  * fit on the same corpus); the clamp is the contract for out-of-fit
  * application.
  */
object Sq {

  /** Per-dimension [lo, hi] envelope as ONE row of two d-length arrays
    * (`lo`, `hi`), ordered by dimension. */
  def fitMinMax(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("p", "v")))
      .groupBy(col("p"))
      .agg(min(col("v").cast("double")).as("lo"),
        max(col("v").cast("double")).as("hi"))
      .agg(sort_array(collect_list(struct(col("p"), col("lo")))).as("ls"),
        sort_array(collect_list(struct(col("p"), col("hi")))).as("hs"))
      .select(transform(col("ls"), s => s.getField("lo")).as("lo"),
        transform(col("hs"), s => s.getField("hi")).as("hi"))

  /** Encode `vecCol` against a fitted envelope frame ([[fitMinMax]]
    * output): per input row one `codes: array<int>` of byte values. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             fit: DataFrame): DataFrame =
    df.crossJoin(broadcast(fit))
      .select(col(idCol), transform(col(vecCol), (v, i) => {
        val lo = element_at(col("lo"), i + 1)
        val hi = element_at(col("hi"), i + 1)
        when(hi === lo, lit(0)).otherwise(
          least(greatest(
            floor((v.cast("double") - lo) * 255.0 / (hi - lo) + 0.5),
            lit(0L)), lit(255L)).cast("int"))
      }).as("codes"))

  /** Recall@k of kNN run in the SQ8 CODE space against float-space
    * brute-force kNN — the quality audit a production deployment runs
    * before trading 4× memory for quantized search ("measure, don't
    * guess" as an operator). Per probe: how many of the float-space
    * top-k survive in the code-space top-k.
    *
    * Cross-engine exactness is the design point: code-space cosines are
    * built ONLY from integer aggregates (dot and norms of byte codes —
    * every partial sum an integer exactly representable in double, so
    * ANY summation order yields the same value; sqrt and the final
    * division are single correctly-rounded IEEE ops). Rankings therefore
    * carry no float-accumulation ambiguity at all, and the DuckDB oracle
    * reproduces both top-k sets and every recall bit-for-bit — unlike
    * LSH/IVF paths whose internals are declared non-SQL.
    *
    * Scale shape: the probe side is bounded by construction (s01's
    * declared class) and broadcast against the code table; the fit is
    * [[fitMinMax]]'s d-key aggregate; ranking is the bounded top-k
    * aggregate, never a window. */
  def sq8Recall(df: DataFrame, idCol: String, vecCol: String,
                probeFilter: org.apache.spark.sql.Column, k: Int)
      : DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val brute = Knn.bruteForceKnn(df, idCol, vecCol, probeFilter, k)
    val codes = encode(df, idCol, vecCol, fitMinMax(df, vecCol))
    val probes = codes.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col("codes").as("c_p"))
    val corpus = codes
      .select(col(idCol).as("neighbor_id"), col("codes").as("c_c"))
    val scored = broadcast(probes)
      .join(corpus, col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        graft.functions.Vectors.cosineHof(col("c_p"), col("c_c"))
          .as("cos"))
    val codeKnn = Knn.rankTopK(scored, k)
    val hits = brute
      .join(codeKnn.select(col("probe_id"), col("neighbor_id")),
        Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy(col("probe_id")).agg(count(lit(1)).as("n_hits"))
    brute.select(col("probe_id")).distinct()
      .join(hits, Seq("probe_id"), "left_outer")
      .select(col("probe_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / k, 6)
          .as("recall"))
  }

  /** The driver-checkable gate projection: per vector, exact-integer
    * code aggregates plus an md5 over the full code sequence (scalar
    * columns per the rows-gate rule; the md5 pins every code exactly
    * without shipping the array). All row-local — the only non-scan
    * work in the whole plan is the d-key fit aggregate. */
  def sq8Summary(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    encode(df, idCol, vecCol, fitMinMax(df, vecCol))
      .select(col(idCol),
        size(col("codes")).cast("long").as("n_dims"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        array_min(col("codes")).as("code_min"),
        array_max(col("codes")).as("code_max"),
        md5(concat_ws(",", transform(col("codes"), _.cast("string"))))
          .as("codes_md5"))
}
