package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge => B}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise running (sum, count) over vectors — the buffer of
  * [[VectorAvg]]. Grows to the longest vector seen; per position the
  * accumulation is EXACTLY `avg(x)`'s: null elements update neither sum
  * nor count, sums are plain double addition in row order, and merges
  * add partial sums unconditionally (a count-0 partial contributes its
  * 0.0 exactly like Average's zero-initialized partial buffer does in
  * the exploded formulation).
  */
final class VectorAvgBuffer {
  var sums: Array[Double] = Array.emptyDoubleArray
  var counts: Array[Long] = Array.emptyLongArray

  private def ensure(n: Int): Unit = if (n > sums.length) {
    sums = java.util.Arrays.copyOf(sums, n)
    counts = java.util.Arrays.copyOf(counts, n)
  }

  def add(arr: ArrayData, elemIsFloat: Boolean): Unit = {
    val n = arr.numElements()
    ensure(n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        sums(i) +=
          (if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        counts(i) += 1L
      }
      i += 1
    }
  }

  def merge(other: VectorAvgBuffer): Unit = {
    ensure(other.sums.length)
    var i = 0
    while (i < other.sums.length) {
      sums(i) += other.sums(i)
      counts(i) += other.counts(i)
      i += 1
    }
  }
}

/** Per-position vector average: `vector_avg(v)` over a group of
  * `array<float|double>` rows equals the exploded formulation
  * `posexplode(v) → groupBy(pos).avg(x) → re-collect in pos order`
  * element-for-element (bit-identical double arithmetic: same per-row
  * accumulation order, same null-element skipping, same count-0 → null
  * element), but as ONE partial-aggregatable pass: no n·d row explosion
  * and one exchange instead of two per k-means iteration — the fit-mean
  * step of [[graft.sim.Ivf.fitCentroids]] /
  * [[graft.sim.Ivf.fitCentroidsWithin]]. Ragged inputs follow the
  * exploded shape too: the result length is the group's longest vector.
  * A group whose every vector is NULL or empty yields an EMPTY array
  * (the exploded formulation loses the group entirely — callers filter
  * `size > 0` to match; [[graft.sim.Ivf.meanByCluster]] does).
  *
  * Output: array<double> (callers cast elements to float where the old
  * collect step did).
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvgBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "vector_avg"

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def nullable: Boolean = false

  private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.DataTypeMismatch(
        errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map(
          "paramIndex" -> "1",
          "requiredType" -> "ARRAY<FLOAT> or ARRAY<DOUBLE>",
          "inputSql" -> child.sql,
          "inputType" -> other.sql))
  }

  override def createAggregationBuffer(): VectorAvgBuffer =
    new VectorAvgBuffer

  override def update(buf: VectorAvgBuffer,
                      input: InternalRow): VectorAvgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], elemIsFloat)
    buf
  }

  override def merge(buf: VectorAvgBuffer,
                     other: VectorAvgBuffer): VectorAvgBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: VectorAvgBuffer): Any = {
    val out = new Array[Any](buf.sums.length)
    var i = 0
    while (i < buf.sums.length) {
      if (buf.counts(i) > 0L) out(i) = buf.sums(i) / buf.counts(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: VectorAvgBuffer): Array[Byte] = {
    val n = buf.sums.length
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < n) { bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new VectorAvgBuffer
    buf.sums = new Array[Double](n)
    buf.counts = new Array[Long](n)
    var i = 0
    while (i < n) { buf.sums(i) = bb.getDouble(); i += 1 }
    i = 0
    while (i < n) { buf.counts(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorAvg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorAvg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): VectorAvg =
    copy(child = c)
}

object VectorAgg {
  /** Aggregate Column: per-position mean of a group's vectors as
    * array<double> — partial-aggregatable, one pass, no row explosion. */
  def vectorAvg(v: Column): Column =
    B.column(VectorAvg(B.expression(v)).toAggregateExpression())
}
