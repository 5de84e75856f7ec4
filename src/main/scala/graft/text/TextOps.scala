package graft.text

import org.apache.spark.sql.Column
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
