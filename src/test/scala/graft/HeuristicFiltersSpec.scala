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
