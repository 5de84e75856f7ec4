package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.monitor.Spool
import graft.monitor.Spool.{Op, NegInf, PosInf}

/** Planted-timeline replica of the reference spool semantics
  * (monitor/spool/__init__.py:95-275): every transition arm of
  * post/pick/ack exercised with hand-computed outcomes. */
class SpoolSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def replay(ops: Seq[Op]): Map[Long, Spool.State] = {
    import spark.implicits._
    Spool.replay(spark.createDataset(ops)).collect()
      .map(s => s.id -> s).toMap
  }

  test("post creates free-for-picking; update while unpicked bumps " +
      "revision and due; post while LEASED is refused") {
    val st = replay(Seq(
      Op(1, 1, 1000, "post", 1500, 0),
      Op(1, 2, 2000, "post", 2500, 0),   // unpicked: update ok
      Op(1, 3, 3000, "pick", 0, 600),    // lease to 3600
      Op(1, 4, 3100, "post", 9999, 0)))  // leased: refused
    assert(st(1).created_sec == 1000, "created_at keeps the first post")
    assert(st(1).due_sec == 2500, "refused post must not update due")
    assert(st(1).msg_rev == 2 && st(1).n_posts == 2)
    assert(st(1).n_rejected_posts == 1)
    assert(st(1).picked_until_sec == 3600)
  }

  test("pick refuses before due and during a lease; succeeds after " +
      "lease timeout (the unpicked re-delivery path)") {
    val st = replay(Seq(
      Op(2, 1, 1000, "post", 1500, 0),
      Op(2, 2, 1200, "pick", 0, 600),   // before due 1500: refused
      Op(2, 3, 1600, "pick", 0, 600),   // due passed: lease to 2200
      Op(2, 4, 1700, "pick", 0, 600),   // leased: refused
      Op(2, 5, 2200, "pick", 0, 600)))  // lease expired at 2200: ok
    assert(st(2).n_picks == 2 && st(2).n_rejected_picks == 2)
    assert(st(2).picked_at_sec == 2200)
    assert(st(2).picked_until_sec == 2800)
  }

  test("post with a past due date falls back to the post timestamp " +
      "(reference: due = message.due or now)") {
    val st = replay(Seq(
      Op(3, 1, 5000, "post", 100, 0),
      Op(3, 2, 5001, "pick", 0, 600)))
    assert(st(3).due_sec == 5000)
    assert(st(3).n_picks == 1, "due clamped to post time, pick at +1 ok")
  }

  test("ack seals the notification forever; ops for never-posted ids " +
      "are refused and produce no state row") {
    val st = replay(Seq(
      Op(4, 1, 1000, "post", 1000, 0),
      Op(4, 2, 1100, "pick", 0, 600),
      Op(4, 3, 1200, "ack", 0, 0),
      Op(4, 4, 99999, "pick", 0, 600),  // acked: never re-picked
      Op(5, 1, 1000, "pick", 0, 600),   // id 5 never posted
      Op(5, 2, 1001, "ack", 0, 0)))
    assert(st(4).acked_at_sec == 1200)
    assert(st(4).picked_until_sec == PosInf)
    assert(st(4).n_picks == 1 && st(4).n_rejected_picks == 1)
    assert(!st.contains(5L), "never-posted id must have no spool row")
  }

  test("delete removes regardless of state (even mid-lease or acked); " +
      "a later post re-creates a FRESH incarnation; deleting a " +
      "non-existent id is a silent no-op") {
    val st = replay(Seq(
      Op(7, 1, 1000, "post", 1000, 0),
      Op(7, 2, 1100, "pick", 0, 600),    // lease to 1700
      Op(7, 3, 1200, "delete", 0, 0),    // mid-lease: still removed
      Op(7, 4, 2000, "post", 2500, 0),   // fresh incarnation
      Op(8, 1, 1000, "post", 1000, 0),
      Op(8, 2, 1100, "ack", 0, 0),
      Op(8, 3, 1200, "delete", 0, 0),    // acked: still removed
      Op(9, 1, 500, "delete", 0, 0)))    // never existed: no-op
    assert(st(7).created_sec == 2000 && st(7).msg_rev == 1 &&
      st(7).n_posts == 1 && st(7).n_picks == 0 &&
      st(7).picked_until_sec == NegInf,
      s"re-created incarnation must start fresh: ${st(7)}")
    assert(!st.contains(8L), "deleted-after-ack id has no row")
    assert(!st.contains(9L), "delete of a non-existent id leaves nothing")
  }

  test("ties at one timestamp replay in seq order on both engines' " +
      "convention (ts, seq)") {
    val st = replay(Seq(
      Op(6, 2, 1000, "pick", 0, 600),  // seq 2 runs AFTER the post
      Op(6, 1, 1000, "post", 1000, 0)))
    assert(st(6).n_picks == 1, "same-ts ops order by seq: post first")
  }

  test("unpicked(T) lists never-picked and timed-out ids, never acked " +
      "or live-leased ones") {
    import spark.implicits._
    val state = Spool.replay(spark.createDataset(Seq(
      Op(10, 1, 1000, "post", 1000, 0),                 // never picked
      Op(11, 1, 1000, "post", 1000, 0),
      Op(11, 2, 1100, "pick", 0, 600),                  // timed out @1700
      Op(12, 1, 1000, "post", 1000, 0),
      Op(12, 2, 4900, "pick", 0, 600),                  // live lease @5000
      Op(13, 1, 1000, "post", 1000, 0),
      Op(13, 2, 1100, "pick", 0, 600),
      Op(13, 3, 1200, "ack", 0, 0)))).toDF()
    val free = Spool.unpicked(state, 5000L).collect()
      .map(_.getLong(0)).toSet
    assert(free == Set(10L, 11L),
      s"free set at T=5000 must be the never-picked + timed-out: $free")
  }

  test("replay is input-order invariant (seeded fuzz): any shuffle of " +
      "the op log folds to the identical state table, and every row " +
      "obeys the machine invariants") {
    val rnd = new scala.util.Random(42)
    val ops = (1 to 400).map { seq =>
      val id = 1L + rnd.nextInt(12)
      val ts = 1000L + rnd.nextInt(5000)
      val op = rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => "post"
        case 4 | 5 | 6 | 7 => "pick"
        case 8             => "ack"
        case _             => "delete"
      }
      Op(id, seq.toLong, ts, op, ts + rnd.nextInt(3) * 600L, 900L)
    }
    def key(s: Spool.State) = s.toString
    val sorted = replay(ops).view.mapValues(key).toMap
    for (round <- 1 to 3) {
      val shuffled = new scala.util.Random(round).shuffle(ops)
      assert(replay(shuffled).view.mapValues(key).toMap == sorted,
        s"shuffle $round must not change the replayed state")
    }
    replay(ops).values.foreach { s =>
      assert(s.n_posts >= 1, "a state row implies a live incarnation")
      assert((s.acked_at_sec >= 0) == (s.picked_until_sec == PosInf))
      assert(s.picked_at_sec >= 0 || s.picked_until_sec == NegInf ||
        s.picked_until_sec == PosInf,
        "a finite lease implies a successful pick")
    }
  }

  test("q53 gate smoke at sf0.001: counters are consistent and every " +
      "row's lease state is one of the three machine states") {
    val df = SparkEntry.queries("q53_spool_deliver")(spark, TestSpark.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pu = r.getAs[Long]("picked_until_sec")
      val acked = r.getAs[Long]("acked_at_sec") >= 0
      assert(pu == NegInf || pu == PosInf || pu > 0)
      assert(acked == (pu == PosInf), "acked iff sealed")
      assert(r.getAs[Long]("n_posts") >= 1)
      val free = r.getAs[Int]("free_at_end")
      if (pu == PosInf) assert(free == 0, "acked is never free")
      if (pu == NegInf) assert(free == 1, "never-picked is always free")
    }
  }
}
