package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Rollups

class RollupsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("worstStatus takes min priority and maps back") {
    val df = Seq((1L, "N"), (1L, "R"), (2L, "A"), (3L, "N")).toDF("k", "st")
    val got = Rollups.worstStatus(df, Seq("k"), col("st"),
        Seq("R" -> 0, "A" -> 1, "N" -> 2))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "R"), (2L, "A"), (3L, "N")))
  }

  test("worstStatus: unknown status maps to null") {
    val df = Seq((1L, "??")).toDF("k", "st")
    val got = Rollups.worstStatus(df, Seq("k"), col("st"), Seq("R" -> 0))
    assert(got.head.get(1) == null)
  }

  test("statusPivot zero-fills absent combinations") {
    val df = Seq(("x", "F"), ("x", "F"), ("y", "O")).toDF("arch", "st")
    val got = Rollups.statusPivot(df, col("arch"), "arch", col("st"),
        Seq("F" -> "F", "O" -> "O", "P" -> "P"))
      .orderBy("arch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("x", 2L, 0L, 0L), ("y", 0L, 1L, 0L)))
  }

  test("pathRollup: every prefix node gets worst status and subtree size") {
    val prio = Seq("FAIL" -> 0, "SKIP" -> 1, "PASS" -> 2)
    val df = Seq(
      ("ltp.sem01", "PASS"),
      ("ltp.sem01", "FAIL"),
      ("ltp.sem02", "PASS"),
      ("kunit", "SKIP")
    ).toDF("path", "status")
    val got = Rollups.pathRollup(df, col("path"), col("status"), prio)
      .orderBy("node_path").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("kunit", "SKIP", 1L),
      ("ltp", "FAIL", 3L),          // parent = worst of subtree, size 3
      ("ltp.sem01", "FAIL", 2L),
      ("ltp.sem02", "PASS", 1L)))
  }

  test("pathRollup: a parent node's status is never better than any child") {
    val prio = Seq("FAIL" -> 0, "SKIP" -> 1, "PASS" -> 2)
    val df = Seq("a.b.c" -> "PASS", "a.b.d" -> "FAIL", "a.e" -> "SKIP",
      "f" -> "PASS").toDF("path", "status")
    val rows = Rollups.pathRollup(df, col("path"), col("status"), prio)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val rank = prio.toMap
    for ((p, s) <- rows; (c, cs) <- rows if c.startsWith(p + "."))
      assert(rank(s) <= rank(cs), s"node $p ($s) vs child $c ($cs)")
  }

  test("latestPerKey is deterministic under ties via tiebreaker column") {
    val df = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), (2L, 5L, 1L, "c"))
      .toDF("k", "ts", "seq", "v")
    val got = Rollups.latestPerKey(df, Seq("k"), Seq(col("ts"), col("seq")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(3)))
    assert(got.toSeq == Seq((1L, "b"), (2L, "c")))
  }

  test("groupCounts and topK") {
    val df = Seq("a", "a", "a", "b", "c", "c").toDF("g")
    val top = Rollups.topK(Rollups.groupCounts(df, Seq("g")),
        Seq(col("n").desc, col("g").asc), 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("a", 3L), ("c", 2L)))
  }
}
