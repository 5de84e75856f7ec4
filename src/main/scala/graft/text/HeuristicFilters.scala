package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style heuristic page filtering — the canonical pretraining-corpus
  * cleanup pass (Raffel et al. 2020, "Exploring the Limits of Transfer
  * Learning", §2.2's C4 rules; the RefinedWeb/Gopher pipelines keep the
  * same shape). Line rules retain a line iff it ends in terminal
  * punctuation, has at least [[minWordsPerLine]] words, and does not
  * mention javascript; page rules drop any page containing "lorem
  * ipsum" or a curly brace, or retaining fewer than [[minKeptLines]]
  * lines. The verdict is emitted AS DATA per page (t02/t06's
  * filter-audit discipline): flag + first-violated reason + line/word
  * counts + an md5 fingerprint of the cleaned text, so a downstream
  * mix can filter, weight, or audit without re-running the rules.
  *
  * Scale shape: one scan, entirely row-local — every rule is a
  * built-in string/array expression (split → filter/aggregate HOFs),
  * no shuffle, no UDF, no explode (the per-line work lives inside
  * array lambdas so the corpus never widens). HOF expressions are
  * CodegenFallback, so whole-stage-codegen CSE does NOT deduplicate
  * them — the kept-lines array is therefore materialized ONCE in a
  * staged projection that five output expressions then reference;
  * CollapseProject keeps that boundary because inlining would
  * duplicate a non-cheap expression (spec pins the single
  * evaluation). The lambda bodies only touch their own line, so the
  * per-element-inlining trap the verify skill documents does not
  * arise.
  */
object HeuristicFilters {

  /** C4 line rule: "retained lines that contained at least 5 words". */
  val minWordsPerLine = 5
  /** C4 page rule: "discarded any page with fewer than 3 sentences". */
  val minKeptLines = 3

  /** Reason labels, in precedence order (first violated wins). */
  val reasonLoremIpsum = "lorem_ipsum"
  val reasonBrace = "brace"
  val reasonTooFew = "too_few_sentences"
  val reasonKept = "kept"

  private def lineKeep(l: Column): Column =
    size(split(l, " ")) >= minWordsPerLine &&
      substring(l, -1, 1).isin(".", "!", "?") &&
      !l.contains("javascript")

  // ------------------------------------------------------ Gopher rules --

  /** Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language
    * Models", Appendix A1.1.1 — the repetition-free half; repetition
    * itself is t06's operator). Every ratio test is run as an integer
    * cross-multiplication so the verdict is exact and the SQL oracle
    * divides nowhere. */
  val gMinWords = 50
  val gMaxWords = 100000
  val gMinMeanLen = 3 // mean word length in [3, 10]
  val gMaxMeanLen = 10
  /** symbol-to-word ratio (`#` chars + `...` runs) must be < 0.1 */
  val gSymbolRatioPct = 10
  /** < 90% of lines may start with a bullet */
  val gBulletPct = 90
  /** < 30% of lines may end with an ellipsis */
  val gEllipsisPct = 30
  /** >= 80% of words must contain an alphabetic character */
  val gAlphaPct = 80
  /** at least 2 distinct members of the stop-word set must appear */
  val gMinStopWords = 2
  val gStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher reason labels, in precedence order (first violated wins). */
  val gReasons: Seq[String] = Seq("word_count", "word_length",
    "symbol_ratio", "bullet_lines", "ellipsis_lines", "alpha_words",
    "stop_words", "kept")

  /** Apply the Gopher rule set to a frame that has already staged the
    * word array and line array ONCE (the [[c4Filter]] HOF discipline:
    * higher-order-function expressions are CodegenFallback, so each
    * array aggregate is computed in its own projection and the verdict
    * references the scalar results — CollapseProject keeps the
    * boundary because inlining would duplicate non-cheap expressions).
    *
    * Output (one row per input row, null-free, all counts long):
    * `idCol, n_words, sum_word_len, n_symbols, n_lines,
    * n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_words,
    * kept, reason`. Entirely row-local — one scan, no shuffle, no UDF,
    * no explode; at 100 TB this is a map-only pass whose cost is the
    * scan itself. */
  def gopherFilter(staged: DataFrame, idCol: String,
                   wordsCol: String, linesCol: String): DataFrame = {
    val ws = col(wordsCol)
    val ls = col(linesCol)
    // `...` occurrences per word: the length delta of a non-overlapping
    // leftmost replace is an exact multiple of 3 in both engines
    def symbolsIn(w: Column): Column =
      (length(w) - length(replace(w, lit("#"), lit("")))) +
        ((length(w) - length(replace(w, lit("..."), lit("")))) / 3)
          .cast("int")
    val scalars = staged.select(col(idCol),
      size(ws).cast("long").as("n_words"),
      aggregate(ws, lit(0), (a, w) => a + length(w)).cast("long")
        .as("sum_word_len"),
      aggregate(ws, lit(0), (a, w) => a + symbolsIn(w)).cast("long")
        .as("n_symbols"),
      size(ls).cast("long").as("n_lines"),
      size(filter(ls, l => substring(l, 1, 2) === "- ")).cast("long")
        .as("n_bullet_lines"),
      size(filter(ls, l => substring(l, -3, 3) === "...")).cast("long")
        .as("n_ellipsis_lines"),
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long")
        .as("n_alpha_words"),
      gStopWords.map(sw =>
          when(array_contains(ws, sw), lit(1L)).otherwise(lit(0L)))
        .reduce(_ + _).as("n_stop_words"))
    val n = col("n_words")
    val nl = col("n_lines")
    val reason =
      when(n < gMinWords || n > gMaxWords, gReasons(0))
        .when(col("sum_word_len") < n * gMinMeanLen ||
          col("sum_word_len") > n * gMaxMeanLen, gReasons(1))
        .when(col("n_symbols") * 100 >= n * gSymbolRatioPct, gReasons(2))
        .when(col("n_bullet_lines") * 100 >= nl * gBulletPct, gReasons(3))
        .when(col("n_ellipsis_lines") * 100 >= nl * gEllipsisPct,
          gReasons(4))
        .when(col("n_alpha_words") * 100 < n * gAlphaPct, gReasons(5))
        .when(col("n_stop_words") < gMinStopWords, gReasons(6))
        .otherwise(gReasons(7))
    scalars.select(col(idCol), n, col("sum_word_len"), col("n_symbols"),
      nl, col("n_bullet_lines"), col("n_ellipsis_lines"),
      col("n_alpha_words"), col("n_stop_words"),
      (reason === gReasons(7)).cast("long").as("kept"),
      reason.as("reason"))
  }

  /** Apply the C4 rule set to newline-separated pages.
    *
    * Output (one row per input row, null-free):
    * `idCol, n_lines, n_lines_kept, n_words_kept, kept, reason,
    * clean_md5` — counts as longs, `kept` 0/1, `clean_md5` the md5 of
    * the newline-joined retained lines for kept pages and the `""`
    * sentinel for dropped ones (the st05 scalar-gate rule).
    */
  def c4Filter(pages: DataFrame, idCol: String, pageCol: String): DataFrame = {
    val page = col(pageCol)
    // stage 1: the per-row arrays, each evaluated exactly once
    val staged = pages.select(col(idCol), page.as("__page"),
      split(page, "\n").as("__lines"),
      filter(split(page, "\n"), lineKeep _).as("__kept"))
    val kept = col("__kept")
    val nKept = size(kept)
    val reason = when(col("__page").contains("lorem ipsum"), reasonLoremIpsum)
      .when(col("__page").contains("{"), reasonBrace)
      .when(nKept < minKeptLines, reasonTooFew)
      .otherwise(reasonKept)
    staged.select(col(idCol),
      size(col("__lines")).cast("long").as("n_lines"),
      nKept.cast("long").as("n_lines_kept"),
      aggregate(kept, lit(0),
        (acc, l) => acc + size(split(l, " "))).cast("long")
        .as("n_words_kept"),
      (reason === reasonKept).cast("long").as("kept"),
      reason.as("reason"),
      when(reason === reasonKept, md5(array_join(kept, "\n")))
        .otherwise(lit("")).as("clean_md5"))
  }
}
