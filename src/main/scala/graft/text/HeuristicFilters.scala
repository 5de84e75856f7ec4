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
