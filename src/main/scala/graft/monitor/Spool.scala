package graft.monitor

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Notification-spool delivery bookkeeping — the reference spool's
  * post/pick/ack/unpicked state machine
  * (`kcidb/monitor/spool/__init__.py:95-275`) re-expressed as a REPLAY
  * over an ordered operation log, the form a warehouse can audit:
  * given every spool operation ever attempted (the log an operator
  * actually has), reconstruct each notification's delivery state and
  * the `unpicked(T)` re-delivery scan.
  *
  * Reference semantics, per notification id:
  *  - `post(ts, due)`: CREATE if absent (created_at = ts, picked_until
  *    = −∞ "free for picking", message revision 1); if present and
  *    currently PICKED (picked_until > ts) the post is REFUSED
  *    (spool/__init__.py:119-121 returns False); otherwise the message
  *    and due date are UPDATED in place (revision += 1, created_at
  *    keeps its original value).
  *  - `pick(ts, timeout)`: succeeds iff the id exists, its pick lease
  *    expired (picked_until <= ts) AND it is due (due <= ts); success
  *    sets picked_at = ts, picked_until = ts + timeout
  *    (spool/__init__.py:174-196). Anything else is a refused pick.
  *  - `ack(ts)`: delivery confirmed — acked_at = ts, picked_until = +∞
  *    so the id is never picked again (spool/__init__.py:201-221).
  *    Acks for ids never posted are refused (Firestore would error).
  *  - `delete(ts)`: remove the notification REGARDLESS of state
  *    (spool/__init__.py:223-232's unconditional document delete) —
  *    the id leaves the store entirely; a later post re-creates a
  *    fresh incarnation (new created_at, revision restarts). Deleting
  *    a non-existent id is a silent no-op, as a Firestore delete is.
  *  - `unpicked(T)`: every id with picked_until < T — never-picked ids
  *    (−∞) and TIMED-OUT leases alike; acked ids (+∞) never show
  *    (spool/__init__.py:255-275). This is the re-delivery scan a
  *    notifier loop runs each wakeup.
  *
  * Scale shape: ONE shuffle on the notification id, then a per-id
  * in-memory fold over that id's few operations (bounded by delivery
  * attempts, not corpus size) — `groupByKey.mapGroups`, the batch twin
  * of the streaming state-machine class (st06/st13), declared like the
  * codec boundary: the lease chain is a genuine left-fold (each pick's
  * success depends on the lease set by an arbitrarily-earlier success),
  * which no window/prefix aggregate expresses. Parallelism is across
  * ids; 100 TB of log folds as width, never depth.
  */
object Spool {

  /** picked_until of a never-picked notification (datetime.min's
    * epoch-sec stand-in). */
  val NegInf: Long = -9999999999L

  /** picked_until of an acked notification (datetime.max's stand-in —
    * st13's open-ended-validity sentinel discipline). */
  val PosInf: Long = 9999999999L

  /** One spool operation: `op` in {post, pick, ack}; `seq` breaks ts
    * ties deterministically (the log's own id); `due_sec` is read for
    * post ops, `timeout_sec` for pick ops. */
  final case class Op(id: Long, seq: Long, ts_sec: Long, op: String,
                      due_sec: Long, timeout_sec: Long)

  /** Final delivery state of one notification after the whole log. */
  final case class State(id: Long, created_sec: Long, due_sec: Long,
                         msg_rev: Long, picked_at_sec: Long,
                         picked_until_sec: Long, acked_at_sec: Long,
                         n_posts: Long, n_rejected_posts: Long,
                         n_picks: Long, n_rejected_picks: Long)

  /** Replay an operation log to the final per-id delivery state.
    * Ids whose log never contains a successful post produce no row
    * (the reference spool has no document for them). */
  def replay(ops: Dataset[Op]): Dataset[State] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.id).flatMapGroups { (id: Long, it: Iterator[Op]) =>
      val log = it.toArray.sortInPlaceBy(o => (o.ts_sec, o.seq))
      var exists = false
      var created = -1L; var due = -1L; var msgRev = 0L
      var pickedAt = -1L; var pickedUntil = NegInf; var ackedAt = -1L
      var nPosts = 0L; var nRejPosts = 0L
      var nPicks = 0L; var nRejPicks = 0L
      log.foreach { o =>
        o.op match {
          case "post" =>
            if (!exists) {
              exists = true; created = o.ts_sec
              // reference: due = message.due or the post timestamp
              due = math.max(o.due_sec, o.ts_sec)
              msgRev = 1L; nPosts += 1
            } else if (pickedUntil > o.ts_sec) nRejPosts += 1
            else { due = math.max(o.due_sec, o.ts_sec)
                   msgRev += 1; nPosts += 1 }
          case "pick" =>
            if (exists && pickedUntil <= o.ts_sec && due <= o.ts_sec) {
              pickedAt = o.ts_sec
              pickedUntil = o.ts_sec + o.timeout_sec
              nPicks += 1
            } else nRejPicks += 1
          case "ack" =>
            if (exists) { ackedAt = o.ts_sec; pickedUntil = PosInf }
            else nRejPicks += 1 // ack of a non-existent doc: refused
          case "delete" =>
            // unconditional removal; state (incl. counters) restarts
            // with the next incarnation — the table mirrors the STORE
            exists = false
            created = -1L; due = -1L; msgRev = 0L
            pickedAt = -1L; pickedUntil = NegInf; ackedAt = -1L
            nPosts = 0L; nRejPosts = 0L; nPicks = 0L; nRejPicks = 0L
          case other =>
            throw new IllegalArgumentException(s"unknown spool op $other")
        }
      }
      if (exists)
        Iterator.single(State(id, created, due, msgRev, pickedAt,
          pickedUntil, ackedAt, nPosts, nRejPosts, nPicks, nRejPicks))
      else Iterator.empty
    }
  }

  /** The `unpicked(T)` re-delivery scan: ids free for picking at T —
    * a filter over the state table, never a rescan of the log. */
  def unpicked(state: DataFrame, tSec: Long): DataFrame =
    state.filter(col("picked_until_sec") < tSec).select(col("id"))
}
