package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.functions.struct

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the best `k` (score, id) pairs under the
  * total order (score desc, id asc). Implemented as a binary min-heap whose
  * root is the WORST kept element, so insertion against a full buffer is a
  * root compare + O(log k) sift — and, critically for scale, the buffer
  * never exceeds k entries through any sequence of updates and merges.
  */
final class TopKBuffer(val k: Int) {
  // parallel arrays; heap ordered worst-first
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size: Int = 0

  /** true if (s1,i1) ranks strictly worse than (s2,i2):
    * lower score, or same score with higher id. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long) =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftUp(j0: Int): Unit = {
    var j = j0
    while (j > 0) {
      val p = (j - 1) >> 1
      if (worse(scores(j), ids(j), scores(p), ids(p))) {
        swap(j, p); j = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var j = 0
    while (true) {
      val l = 2 * j + 1
      val r = l + 1
      var m = j
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == j) return
      swap(j, m); j = m
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def insert(score: Double, id: Long): Unit = {
    // NaN never enters the heap: all NaN comparisons are false, so one at
    // the root would be irreplaceable and break the heap invariant.
    // Semantics: a NaN score is "no score" — excluded from the top-k.
    if (java.lang.Double.isNaN(score)) return
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs sorted best-first. */
  def sorted: Array[(Double, Long)] = {
    val arr = Array.tabulate(size)(i => (scores(i), ids(i)))
    arr.sortBy { case (s, id) => (-s, id) }
  }
}

/** Top-k-by-score aggregate: a `TypedImperativeAggregate` whose state is a
  * bounded heap, so per-group ranking needs NO window function and NO
  * per-group materialization of all candidates. Map-side partial
  * aggregation reduces each partition to at most k entries per group before
  * the shuffle; merges stay bounded at k. This replaces the
  * `row_number() over (partition by group)` pattern, which shuffles every
  * candidate row of a group to a single partition — the plan that dies when
  * one group's candidates are the whole corpus.
  *
  * Input: a struct of (score: double, id: long). Null structs and null
  * fields are ignored. Output: array<struct<score double, id bigint>>
  * sorted by (score desc, id asc) — deterministic under ties.
  */
case class TopKByScore(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "top_k_by_score"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
        if a.dataType == DoubleType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.DataTypeMismatch(
        errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map(
          "paramIndex" -> "1",
          "requiredType" -> "STRUCT<score: DOUBLE, id: BIGINT>",
          "inputSql" -> child.sql,
          "inputType" -> other.sql))
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        buf.insert(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (s, id) =>
      InternalRow(s, id)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): TopKByScore =
    copy(child = c)
}

/** [[TopKBuffer]] with STRING ids (stored as UTF8String so the tiebreak
  * is binary/UTF-8 order — identical to an engine's default VARCHAR
  * collation — not Java's UTF-16 order). Same bounded-heap discipline. */
final class TopKStrBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  val scores = new Array[Double](k)
  val ids = new Array[UTF8String](k)
  var size: Int = 0

  @inline private def worse(s1: Double, i1: UTF8String,
                            s2: Double, i2: UTF8String) =
    s1 < s2 || (s1 == s2 && i1.compareTo(i2) > 0)

  private def siftUp(j0: Int): Unit = {
    var j = j0
    while (j > 0) {
      val p = (j - 1) >> 1
      if (worse(scores(j), ids(j), scores(p), ids(p))) {
        swap(j, p); j = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var j = 0
    while (true) {
      val l = 2 * j + 1
      val r = l + 1
      var m = j
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == j) return
      swap(j, m); j = m
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def insert(score: Double, id: UTF8String): Unit = {
    // NaN excluded, same rule (and reason) as [[TopKBuffer.insert]].
    if (java.lang.Double.isNaN(score)) return
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }
  }

  def merge(other: TopKStrBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs sorted best-first: score desc, id asc binary. */
  def sorted: Array[(Double, org.apache.spark.unsafe.types.UTF8String)] = {
    val arr = Array.tabulate(size)(i => (scores(i), ids(i)))
    java.util.Arrays.sort(arr,
      (a: (Double, UTF8String), b: (Double, UTF8String)) => {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else a._2.compareTo(b._2)
      })
    arr
  }
}

/** [[TopKByScore]] with STRING ids — same bounded-heap aggregate for
  * per-group ranking where the ranked entity is a string (tokens, urls).
  * Input: struct(score: double, id: string); output sorted
  * array<struct<score double, id string>>, ties broken by binary string
  * order — reproducible across engines. */
case class TopKByScoreStr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] with UnaryLike[Expression] {
  import org.apache.spark.unsafe.types.UTF8String

  require(k > 0, "k must be positive")

  override def prettyName: String = "top_k_by_score_str"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", StringType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
        if a.dataType == DoubleType && b.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.DataTypeMismatch(
        errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map(
          "paramIndex" -> "1",
          "requiredType" -> "STRUCT<score: DOUBLE, id: STRING>",
          "inputSql" -> child.sql,
          "inputType" -> other.sql))
  }

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        // clone: the input row's backing buffer is reused across rows
        buf.insert(row.getDouble(0), row.getUTF8String(1).clone())
    }
    buf
  }

  override def merge(buf: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKStrBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (s, id) =>
      InternalRow(s, id)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    val payload = buf.ids.take(buf.size).map(_.getBytes)
    val bb = ByteBuffer.allocate(
      8 + buf.size * 12 + payload.map(_.length).sum)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i))
      bb.putInt(payload(i).length).put(payload(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKStrBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.insert(s, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScoreStr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScoreStr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): TopKByScoreStr =
    copy(child = c)
}

object TopK {
  /** Aggregate Column: best-k (score, id) pairs per group as a sorted
    * array<struct<score,id>> — partial-aggregatable, buffer bounded at k. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    B.column(TopKByScore(B.expression(struct(score, id)), k)
      .toAggregateExpression())

  /** [[topKByScore]] for string-identified entries (tokens, urls). */
  def topKByScoreStr(score: Column, id: Column, k: Int): Column =
    B.column(TopKByScoreStr(B.expression(struct(score, id)), k)
      .toAggregateExpression())

  /** Estimated [[TopKBuffer]] heap footprint (k doubles + k longs +
    * object headers) — the `bufferBytes` input to
    * [[graft.util.OhaHeadroom.ensureSmallBuffer]], which every per-KEY
    * top-k consumer (group domain scaling with data: probes, groups)
    * must call so a default-conf session never silently sort-falls-back
    * and sorts the scored candidate stream. */
  def heapBytes(k: Int): Long = 16L * k + 64L
}
