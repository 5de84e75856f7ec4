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
