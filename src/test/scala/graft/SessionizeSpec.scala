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

  test("sessionizeSharded is result-identical for any shard width " +
      "(the hot-key pre-split)") {
    // gate-corpus events in q37's exact shape (floor-second ts)
    val e = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"),
        (col("ts").cast("long") / 1000000L).cast("long").as("ts_sec"),
        col("event_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_idx", "n_events", "start_sec",
        "end_sec", "duration_sec")
        .collect().map(_.toSeq).toSet
    val base = rows(Sessionize.sessionize(e, "user_id", "ts_sec",
      "event_id", gapSec = 1800))
    assert(base.nonEmpty)
    // widths spanning degenerate (1s: every event its own shard-ish),
    // sub-gap, and super-gap shards — all must merge back exactly
    for (shardSec <- Seq(1L, 600L, 3600L, 86400L)) {
      val sharded = rows(Sessionize.sessionizeSharded(e, "user_id",
        "ts_sec", "event_id", gapSec = 1800, shardSec = shardSec))
      assert(sharded == base,
        s"shardSec=$shardSec diverges: extra=${(sharded diff base).take(3)}" +
          s" missing=${(base diff sharded).take(3)}")
    }
  }

  test("sessionizeSharded: a hot key spreads over shards; exactly two " +
      "exchanges, both rollups reuse their window partitioning") {
    import spark.implicits._
    // one pathological user, events every 10s for 12h: one session
    val hot = (0L until 4320L).map(i => (7L, i, i * 10L))
      .toDF("user_id", "event_id", "ts_sec")
    val out = Sessionize.sessionizeSharded(hot, "user_id", "ts_sec",
      "event_id", gapSec = 1800, shardSec = 3600)
    // explain BEFORE executing: a post-run AdaptiveSparkPlan prints the
    // initial plan too, double-counting its exchanges
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((7L, 1L, 4320L, 0L, 43190L)))
    // pass 1 partitions by (user_id, __shard), pass 2 by user_id; the
    // two groupBys must add NO further exchanges
    val exchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(exchanges == 2,
      s"expected exactly 2 hash exchanges, got $exchanges in:\n$p")
    assert("hashpartitioning\\(user_id#\\d+L?, __shard".r
      .findAllIn(p).nonEmpty, s"pass 1 must partition by (key, shard):\n$p")
  }
}
