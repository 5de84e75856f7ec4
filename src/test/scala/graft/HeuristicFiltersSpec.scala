package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.HeuristicFilters

class HeuristicFiltersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val goodLine = "one two three four five."
  private def run(pages: (Long, String)*) =
    HeuristicFilters.c4Filter(pages.toDF("doc_id", "page"),
        "doc_id", "page")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5), r.getString(6)))).toMap

  test("line rules: terminal punct, min words, javascript; page rules: " +
      "lorem ipsum, brace, min sentences — each with its reason") {
    val out = run(
      1L -> Seq(goodLine, goodLine, goodLine).mkString("\n"),
      // javascript line dropped, three good lines remain -> kept
      2L -> Seq(goodLine, "please enable javascript on this page.",
        goodLine, goodLine).mkString("\n"),
      // short line + unpunctuated line dropped -> only 2 kept -> too few
      3L -> Seq(goodLine, goodLine, "tiny line.",
        "six seven eight nine ten eleven").mkString("\n"),
      4L -> Seq(goodLine, goodLine, goodLine,
        "lorem ipsum dolor sit amet.").mkString("\n"),
      5L -> Seq(goodLine, goodLine, goodLine,
        "function() { return 0; }.").mkString("\n"),
      // precedence: lorem ipsum beats brace
      6L -> Seq(goodLine, "lorem ipsum { x }.").mkString("\n"))
    val cleaned3 = Seq(goodLine, goodLine, goodLine).mkString("\n")
    assert(out(1L) == ((3L, 3L, 15L, 1L, "kept", md5hex(cleaned3))))
    assert(out(2L) == ((4L, 3L, 15L, 1L, "kept", md5hex(cleaned3))))
    assert(out(3L) == ((4L, 2L, 10L, 0L, "too_few_sentences", "")))
    assert(out(4L)._5 == "lorem_ipsum" && out(4L)._4 == 0L)
    assert(out(5L)._5 == "brace" && out(5L)._4 == 0L)
    assert(out(6L)._5 == "lorem_ipsum")
    assert(out.values.forall(v => v._6 != null && v._5 != null),
      "verdict columns must be null-free")
  }

  private def runGopher(rows: (Long, Seq[String], Seq[String])*) =
    HeuristicFilters.gopherFilter(rows.toDF("doc_id", "ws", "ls"),
        "doc_id", "ws", "ls")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("gopher rules: every reason fires at its documented threshold, " +
      "ratio boundaries are exact, precedence is first-violated-wins") {
    val water = Seq.fill(58)("water") ++ Seq("the", "of") // 60 clean words
    val plainLines = Seq("water water", "water water")
    val out = runGopher(
      (1L, water, plainLines), // kept
      (2L, Seq.fill(10)("water"), plainLines), // too few words
      (3L, Seq.fill(58)("ab") ++ Seq("the", "of"), plainLines), // mean<3
      // 6 '#' of 60 words = exactly 0.1 — the >= threshold trips
      (4L, Seq.fill(52)("water") ++ Seq.fill(4)("#") ++
        Seq("the", "of", "#", "#"), plainLines),
      // 9 of 10 bulleted lines = exactly 90% — trips
      (5L, water, Seq.fill(9)("- water") ++ Seq("water")),
      // 3 of 10 ellipsis lines = exactly 30% — trips
      (6L, water, Seq.fill(3)("water...") ++ Seq.fill(7)("water")),
      // 48 alpha of 60 = exactly 80% — passes (the < test), then kept
      (7L, Seq.fill(46)("water") ++ Seq("the", "of") ++
        Seq.fill(12)("1234"), plainLines),
      // 47 alpha of 60 < 80% — alpha_words
      (8L, Seq.fill(45)("water") ++ Seq("the", "of") ++
        Seq.fill(13)("1234"), plainLines),
      // only one stop word present
      (9L, Seq.fill(59)("water") :+ "the", plainLines),
      // precedence: word_count beats symbol_ratio
      (10L, Seq.fill(10)("#"), plainLines),
      // '...' inside a word counts as one symbol run
      (11L, Seq.fill(54)("water") ++ Seq("the", "of") ++
        Seq.fill(4)("a...b"), plainLines))
    def reason(id: Long) = out(id).getString(10)
    assert(reason(1L) == "kept" && out(1L).getLong(9) == 1L)
    assert(reason(2L) == "word_count")
    assert(reason(3L) == "word_length")
    assert(reason(4L) == "symbol_ratio" && out(4L).getLong(3) == 6L)
    assert(reason(5L) == "bullet_lines" && out(5L).getLong(5) == 9L)
    assert(reason(6L) == "ellipsis_lines" && out(6L).getLong(6) == 3L)
    assert(reason(7L) == "kept" && out(7L).getLong(7) == 48L)
    assert(reason(8L) == "alpha_words")
    assert(reason(9L) == "stop_words" && out(9L).getLong(8) == 1L)
    assert(reason(10L) == "word_count")
    // 4 a...b words: 4 ellipsis runs, 0 hashes -> below 0.1 of 60, kept
    assert(out(11L).getLong(3) == 4L && reason(11L) == "kept")
    // counts null-free and consistent
    assert(out.values.forall(r => (1 to 9).forall(!r.isNullAt(_))))
  }

  test("the filter is one row-local pass: no shuffle, no explode, and " +
      "the kept-lines HOF evaluates once (staged projection holds)") {
    // parquet-backed: a local Seq constant-folds to LocalTableScan
    Seq((1L, goodLine)).toDF("doc_id", "page")
      .write.mode("overwrite").parquet("/tmp/hf_plan_probe")
    val df = HeuristicFilters.c4Filter(
      spark.read.parquet("/tmp/hf_plan_probe"), "doc_id", "page")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"no shuffle expected:\n$plan")
    assert(!plan.contains("Generate"), s"no explode expected:\n$plan")
    // HOFs are CodegenFallback (no whole-stage-codegen CSE), so the
    // line-rule filter must appear exactly once in the plan — if
    // CollapseProject ever starts inlining the staged array, five
    // copies of the per-line pass show up here
    val evals = "javascript".r.findAllIn(plan).size
    assert(evals == 1,
      s"kept-lines filter must evaluate once, found $evals:\n$plan")
  }

  test("the t21 gate covers every rule class at sf0.001") {
    val out = SparkEntry.queries("t21_c4_filters")(
      spark, "/root/testdata/sf0.001")
    val reasons = out.groupBy("reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("kept", "lorem_ipsum", "brace", "too_few_sentences")
      .subsetOf(reasons.keySet), s"degenerate fixture: $reasons")
  }
}
