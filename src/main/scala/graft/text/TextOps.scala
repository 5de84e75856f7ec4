package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, fingerprinting. Everything is a closed-form column
  * expression (no UDFs) built from length/replace arithmetic, which is both
  * codegen-friendly in Spark and bit-reproducible in the DuckDB oracle
  * (`replace`/`length` have identical semantics in both engines).
  */
object TextOps {

  /** Number of occurrences of literal `pat` in `c`, via length arithmetic. */
  def occurrences(c: Column, pat: String): Column =
    ((length(c) - length(call_function("replace", c, lit(pat), lit("")))) /
      pat.length).cast("long")

  /** Normalized, space-padded text for word-boundary matching. */
  def padded(c: Column): Column =
    concat(lit(" "), trim(regexp_replace(lower(c), "[^a-z0-9]+", " ")),
      lit(" "))

  /** Per-language marker words (space-padded matching). Tiny n-gram-style
    * heuristic in the spirit of fastText/langid, kept deterministic. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " a "),
    "de" -> Seq(" der ", " und ", " die ", " das "),
    "es" -> Seq(" el ", " los ", " las ", " una "),
    "fr" -> Seq(" le ", " les ", " et ", " une "),
    "zh" -> Seq(" de ", " shi ", " le ", " zai ")
  )

  def langScore(c: Column, lang: String): Column =
    profiles.toMap.apply(lang).map(p => occurrences(padded(c), p))
      .reduce(_ + _)

  /** Predicted language: argmax of profile scores, first-listed wins ties. */
  def langId(c: Column): Column = {
    val scores = profiles.map { case (l, _) => l -> langScore(c, l) }
    scores.foldRight(lit(profiles.head._1)) { case ((l, s), acc) =>
      when(scores.map(_._2).reduce((a, b) => greatest(a, b)) === s, lit(l))
        .otherwise(acc)
    }
  }

  /** Whitespace token count via space arithmetic (identical both engines). */
  def wordCount(c: Column): Column = {
    val t = trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))
    (length(t) - length(call_function("replace", t, lit(" "), lit("")))) +
      lit(1).cast("long")
  }

  /** BPE-ish token estimate: ~4 chars per token. */
  def bpeEstimate(c: Column): Column = ceil(length(c) / lit(4.0)).cast("long")

  /** Token-repetition metrics per document — the Gopher/MassiveText-style
    * repetition filters of a training-data pipeline (Rae et al. 2021 §A1.1:
    * fraction-of-duplicate-content rules), token-based because this corpus
    * has no line structure. Per doc:
    *   n_tokens        whitespace tokens of the normalized text
    *   distinct_frac   distinct tokens / tokens (type-token ratio)
    *   top_tok_frac    occurrences of the most frequent token / tokens
    *   top_bigram_frac occurrences of the most frequent bigram / (tokens-1),
    *                   0.0 for single-token docs
    *
    * Shape: tokens and bigrams each explode from ONE materialized token
    * array (positions explode — the expensive normalization regex runs
    * once per doc, see [[graft.dedup.Dedup]]'s pipeline note), then two
    * count aggregates with map-side combine keyed on (doc, gram) and one
    * per-doc fold; the doc id is the only join key. Repeated docs at 100 TB
    * stay one shuffle per stage — nothing is corpus-global. */
  def repetitionMetrics(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      graft.dedup.Dedup.tokens(col(textCol)).as("toks"))
    def gramCounts(n: Int) = base
      .select(col("id"), col("toks"),
        explode(sequence(lit(1),
          greatest(size(col("toks")) - (n - 1), lit(1)))).as("pos"))
      .select(col("id"),
        concat_ws(" ", slice(col("toks"), col("pos"), lit(n))).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("n"))
    val toks = gramCounts(1).groupBy("id").agg(
      sum(col("n")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      max(col("n")).as("top_tok"))
    // single-token docs degrade to one whole-doc "bigram" in gramCounts(2)
    // (the slice clamps); mask them to 0 below rather than special-casing
    // the explode.
    val bigrams = gramCounts(2).groupBy("id")
      .agg(max(col("n")).as("top_bigram"))
    toks.join(bigrams, Seq("id"))
      .select(col("id").as(idCol),
        col("n_tokens"),
        (col("n_distinct").cast("double") / col("n_tokens"))
          .as("distinct_frac"),
        (col("top_tok").cast("double") / col("n_tokens")).as("top_tok_frac"),
        when(col("n_tokens") < 2, lit(0.0))
          .otherwise(col("top_bigram").cast("double") /
            (col("n_tokens") - 1))
          .as("top_bigram_frac"))
  }

  /** Quality score in [0,1]-ish: rewards mid-length docs, word lengths near
    * natural language, and stopword presence. Single-expression double
    * arithmetic (one division per term, fixed order). */
  def qualityScore(c: Column): Column = {
    val chars = length(c).cast("double")
    val words = wordCount(c).cast("double")
    val avgWordLen = chars / words
    val stopRatio = langScore(c, "en").cast("double") / words
    val lengthTerm =
      when(chars >= 200 && chars <= 2000, lit(1.0))
        .when(chars < 200, chars / 200.0)
        .otherwise(lit(2000.0) / chars)
    val wordLenTerm =
      when(avgWordLen >= 3.0 && avgWordLen <= 10.0, lit(1.0)).otherwise(lit(0.5))
    lengthTerm * 0.5 + wordLenTerm * 0.3 + least(stopRatio * 2.0, lit(1.0)) * 0.2
  }
}
