package graft.monitor

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Subscription → notification matching: the Spark-native form of kcidb's
  * monitor layer (/root/reference/kcidb/monitor/__init__.py:7-53 `match`,
  * monitor/output.py:109-173 `Notification`).
  *
  * kcidb walks loaded objects through per-subscription Python match
  * functions producing notification messages; the spool then guarantees
  * each notification id is registered exactly once
  * (monitor/spool/__init__.py). graft expresses a subscription as a
  * predicate Column over one object type, so matching a 100 TB load is a
  * filter + projection per subscription (codegen'd, pushed to the scan)
  * and the spool's once-only property is a `distinct` on the deterministic
  * notification id (batch) or per-id state (streaming).
  *
  * Notification id mirrors the reference scheme
  * (output.py:163-172: subscription ":" type ":" b64(obj_id) ":"
  * b64(message_id), base64 altchars "+-"): deviation — the object id is the
  * ":"-joined id column values rather than a Python tuple repr.
  */
final case class Subscription(
    name: String,
    objectType: String,
    predicate: Column,
    idCols: Seq[String],
    messageId: String = "m0",
    subject: String = "",
    body: String = "")

object Subscriptions {

  /** base64 with '/' replaced by '-' — the reference's `altchars=b'+-'`
    * (output.py:115-127), safe for Firestore-style document ids. */
  private def b64(c: Column): Column =
    translate(base64(c.cast("binary")), "/", "-")

  /** Deterministic dedup key (output.py:163-172). */
  def notificationId(sub: Subscription, objId: Column): Column =
    concat_ws(":", lit(sub.name), lit(sub.objectType), b64(objId),
      b64(lit(sub.messageId)))

  /** Raw matches: one row per (matched object row, subscription) — works on
    * batch AND streaming frames (filter + projection only, no state).
    * Output: (notification_id, subscription, object_type, object_id). */
  def matchRaw(load: String => DataFrame,
               subs: Seq[Subscription]): DataFrame =
    subs.map { sub =>
      val df = load(sub.objectType)
      val objId =
        concat_ws(":", sub.idCols.map(c => col(c).cast("string")): _*)
      df.filter(sub.predicate).select(
        notificationId(sub, objId).as("notification_id"),
        lit(sub.name).as("subscription"),
        lit(sub.objectType).as("object_type"),
        objId.as("object_id"))
    }.reduce(_ unionByName _)

  /** Batch spool: raw matches deduplicated to exactly one notification per
    * id (the spool's register-once semantics as a `distinct`). */
  def matchNotifications(load: String => DataFrame,
                         subs: Seq[Subscription]): DataFrame =
    matchRaw(load, subs).distinct()

  /** `{column}` placeholders interpolated into a codegen'd concat of
    * literals and string-cast column values — the deterministic,
    * transport-free core of the reference's Jinja2 message rendering
    * (output.py:180-203: templates render with the matched object's
    * fields in scope). A null field renders empty, as Jinja renders
    * undefined; a placeholder naming a column the object type lacks
    * fails analysis loudly. No UDF anywhere: rendering a 100 TB load's
    * matches is pure projected column arithmetic. */
  private val PlaceholderRe = "\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r

  def renderTemplate(tpl: String): Column = {
    val parts = Seq.newBuilder[Column]
    var last = 0
    for (m <- PlaceholderRe.findAllMatchIn(tpl)) {
      if (m.start > last) parts += lit(tpl.substring(last, m.start))
      parts += coalesce(col(m.group(1)).cast("string"), lit(""))
      last = m.end
    }
    if (last < tpl.length) parts += lit(tpl.substring(last))
    val ps = parts.result()
    if (ps.isEmpty) lit("") else concat(ps: _*)
  }

  private[monitor] val SubjectMaxLen = 256
  private[monitor] val BodyMaxLen = 64 * 1024

  /** Over-long rendering truncates to maxLen-2 characters plus the
    * reference's scissors marker (output.py:190-195, 204-208). */
  private[monitor] def clip(c: Column, maxLen: Int): Column =
    when(length(c) > maxLen,
      concat(substring(c, 1, maxLen - 2), lit("✂️"))).otherwise(c)

  /** Rendered subject Column: template interpolation, then the
    * reference's subject discipline in its order (output.py:190-202) —
    * truncate past 256 characters, then replace control characters
    * (x00-x1f, x7f) with the replacement glyph. */
  def renderSubject(tpl: String): Column =
    regexp_replace(clip(renderTemplate(tpl), SubjectMaxLen),
      "[\\x00-\\x1f\\x7f]", "⯑")

  /** Rendered body Column: interpolation + the 64 KiB body clip
    * (output.py:203-208). Control characters are legal in bodies. */
  def renderBody(tpl: String): Column =
    clip(renderTemplate(tpl), BodyMaxLen)

  /** The body discipline over an already-built Column (the loop/
    * conditional renderings of [[cappedListAgg]] compose bodies from
    * aggregates, not `{col}` templates): the same 64 KiB clip. */
  def renderBodyCol(c: Column): Column = clip(c, BodyMaxLen)

  /** The Jinja loop-with-cap of the reference's container_summary
    * macros (templates/test.j2:11-52: a capped, ordered child list with
    * an overflow "..." line; templates/checkout_description.txt.j2's
    * `max_list_len = 5` slices) as ONE codegen'd aggregate expression:
    * collect (order, line) structs for children passing `include`
    * (`when` without otherwise is null and collect_list drops nulls —
    * Jinja's `if` inside the loop), sort by (order, line) — the line
    * string is the deterministic tiebreak for duplicate orders — cap at
    * `maxListLen`, join with newline+indent, append the overflow
    * marker. Output is bounded (≤ maxListLen+1 lines); collected state
    * is bounded by a single container's child fan-out, not corpus size
    * — exactly what the reference renders from one loaded container.
    * No UDF: rendering every container of a 100 TB load stays inside
    * whole-stage codegen. */
  def cappedListAgg(line: Column, order: Column, include: Column,
                    maxListLen: Int, indent: String): Column = {
    val sorted = array_sort(collect_list(
      when(include, struct(order.as("o"), line.as("l")))))
    val top = transform(slice(sorted, 1, maxListLen), x => x.getField("l"))
    concat(lit(indent), array_join(top, "\n" + indent),
      when(size(sorted) > maxListLen, lit("\n" + indent + "..."))
        .otherwise(lit("")))
  }

  /** The sorted-distinct "By" line of the same macros
    * (test.j2:49-51: `map(attribute="origin") | unique | sort |
    * join(", ")`) — collect_set → array_sort → join, all codegen'd.
    * Sorting happens in the value's own type (numeric ids sort
    * numerically, as the oracle's ORDER BY does), then renders as
    * string. */
  def distinctJoinAgg(value: Column, sep: String): Column =
    array_join(transform(array_sort(collect_set(value)),
      _.cast("string")), sep)

  /** [[matchRaw]] plus the rendered message columns — what a
    * notification consumer reads beyond the spool id. Bodies travel as
    * md5 (the spool stores digests; full bodies are a transport
    * concern the survey scopes out, and the digest keeps wide text out
    * of the dedup shuffle). */
  def matchRendered(load: String => DataFrame,
                    subs: Seq[Subscription]): DataFrame =
    subs.map { sub =>
      val df = load(sub.objectType)
      val objId =
        concat_ws(":", sub.idCols.map(c => col(c).cast("string")): _*)
      df.filter(sub.predicate).select(
        notificationId(sub, objId).as("notification_id"),
        lit(sub.name).as("subscription"),
        lit(sub.objectType).as("object_type"),
        objId.as("object_id"),
        renderSubject(sub.subject).as("subject"),
        md5(renderBody(sub.body)).as("body_md5"))
    }.reduce(_ unionByName _)

  /** [[matchNotifications]] with rendered subject + body digest. The
    * spool invariant stays EXACTLY one row per notification id even
    * when duplicate source rows share an id tuple but differ in
    * template columns (testdata's duplicate lineitem ids do): the kept
    * rendering is the minimum (subject, body_md5) pair — deterministic
    * and engine-portable, where a bare distinct() would emit one row
    * per distinct rendering of the same id. The non-id columns are
    * grouped, not aggregated: the id embeds all three, so they are
    * constant within a group. */
  def matchNotificationsRendered(load: String => DataFrame,
                                 subs: Seq[Subscription]): DataFrame =
    matchRendered(load, subs)
      .groupBy("notification_id", "subscription", "object_type",
        "object_id")
      .agg(min(struct(col("subject"), col("body_md5"))).as("__m"))
      .select(col("notification_id"), col("subscription"),
        col("object_type"), col("object_id"),
        col("__m.subject").as("subject"),
        col("__m.body_md5").as("body_md5"))

  final case class Notif(notification_id: String, subscription: String,
                         object_type: String, object_id: String)

  /** Streaming spool: exactly-once per notification id across micro-batches
    * via one boolean of state per id (the bounded-state analog of the
    * reference spool's register-once documents). Unbounded retention —
    * [[dedupStreamTtl]] is the production-scale form with a retention
    * window. */
  def dedupStream(ds: Dataset[Notif]): Dataset[Notif] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.notification_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Notif], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) })
  }

  final case class NotifRendered(notification_id: String,
                                 subscription: String, object_type: String,
                                 object_id: String, subject: String,
                                 body_md5: String)

  /** Streaming RENDERED spool ([[dedupStream]] carrying the message
    * columns): exactly-once per notification id via one boolean of
    * state, keeping the minimum (subject, body_md5) rendering among the
    * rows the id's first micro-batch carries — the batch
    * [[matchNotificationsRendered]] pick rule, so a single-batch replay
    * (the gate's AvailableNow shape) reproduces the batch spool
    * exactly; across batches, register-once wins as in the reference
    * spool (monitor/spool/__init__.py). The min compares Scala string
    * order (UTF-16 code units) where the batch min-of-struct compares
    * UTF-8 bytes — identical on BMP-only text like the rendered gate
    * subjects; both are deterministic regardless. */
  def dedupRenderedStream(ds: Dataset[NotifRendered]): Dataset[NotifRendered] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.notification_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[NotifRendered],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(r => (r.subject, r.body_md5)))
          })
  }

  final case class NotifTs(notification_id: String, subscription: String,
                           object_type: String, object_id: String,
                           ts: java.sql.Timestamp)

  /** TTL spool: state carries each notification id's registration event
    * time and expires `ttlMs` past it — total state is bounded by the
    * spool's retention window, the streaming analog of the reference
    * spool's age-based `wipe(until)` (monitor/spool/__init__.py:233-250);
    * an id recurring after expiry registers (and notifies) again.
    *
    * Expiry is decided in the DATA path from the stored registration
    * time (correct regardless of timeout-callback interleaving);
    * EventTimeTimeout + the caller's watermark remove the expired state.
    * Caller must set a watermark on `ts` before calling. */
  def dedupStreamTtl(ds: Dataset[NotifTs], ttlMs: Long): Dataset[Notif] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.notification_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: String, rows: Iterator[NotifTs], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // full-precision pick (Streams.TsOrdering — the getTime
            // ms-truncation tie-break trap)
            import graft.streaming.Streams.TsOrdering
            val r = rows.minBy(x => (x.ts, x.object_id))
            if (state.exists && r.ts.getTime < state.get + ttlMs)
              Iterator.empty
            else {
              state.update(r.ts.getTime)
              state.setTimeoutTimestamp(math.max(r.ts.getTime + ttlMs,
                state.getCurrentWatermarkMs + 1))
              Iterator.single(Notif(r.notification_id, r.subscription,
                r.object_type, r.object_id))
            }
          })
  }
}
