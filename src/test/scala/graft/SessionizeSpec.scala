package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gap rule splits sessions; bounds and counts are exact") {
    // user 1: events at 0, 100, 2000 (gap 1900 > 1800 splits), 2100
    // user 2: single event; user 3: two events exactly at the gap bound
    val e = Seq(
      (1L, 10L, 0L), (1L, 11L, 100L), (1L, 12L, 2000L), (1L, 13L, 2100L),
      (2L, 20L, 50L),
      (3L, 30L, 0L), (3L, 31L, 1800L)
    ).toDF("user_id", "event_id", "ts_sec")
    val got = Sessionize.sessionize(e, "user_id", "ts_sec", "event_id",
        gapSec = 1800)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == Map(
      (1L, 1L) -> ((2L, 0L, 100L, 100L)),
      (1L, 2L) -> ((2L, 2000L, 2100L, 100L)),
      (2L, 1L) -> ((1L, 50L, 50L, 0L)),
      // gap == gapSec stays ONE session (rule is <=)
      (3L, 1L) -> ((2L, 0L, 1800L, 1800L))))
  }

  test("q37 plan: one hash exchange on the session key, partial rollup") {
    val p = SparkEntry.queries("q37_sessionize")(spark, TestSpark.sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // Both window passes AND the (user, session) rollup must reuse the
    // single user_id hash partitioning: hashpartitioning(user_id) once,
    // and no second exchange for the aggregate (ClusteredDistribution on
    // (user_id, session_idx) is satisfied by the user_id partitioning).
    val exchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got " +
      s"$exchanges in:\n$p")
    assert(p.contains("partial"), "session rollup must map-side combine")
    assert(!p.contains("SinglePartition"),
      "sessionize must never collapse to one partition")
    // column pruning reaches the events scan: only (event_id, ts,
    // user_id) are read, not the wide props/value payload columns
    assert(!p.contains("props") && !p.contains("value"),
      s"events scan must prune unused columns:\n$p")
  }
}
