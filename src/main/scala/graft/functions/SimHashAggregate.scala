package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** 64-bit SimHash as ONE aggregate: input is a 64-bit token hash per row;
  * the buffer is the 64 per-bit vote counters (+1 if the token's bit is
  * set, −1 otherwise); the result sets bit i iff its counter is positive.
  *
  * Replaces 64 separate `sum(shiftright(h, i) & 1 ...)` aggregate
  * expressions with a single bounded buffer updated in one pass over the
  * hash's bits — same partial-aggregation shape (map-side combine, 64 ints
  * per group over the wire), ~64× fewer aggregate-expression evaluations
  * per row. Bit-identical to the sum formulation: empty groups yield 0L
  * (every vote sum non-positive).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def prettyName: String = "simhash_agg"

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.DataTypeMismatch(
        errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map(
          "paramIndex" -> "1",
          "requiredType" -> "BIGINT",
          "inputSql" -> child.sql,
          "inputType" -> other.sql))
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buf(i) += (((h >>> i) & 1L).toInt * 2) - 1
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    var i = 0
    while (i < 64) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](64)
    var i = 0
    while (i < 64) { buf(i) = bb.getInt(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): SimHashAgg =
    copy(child = c)
}

object SimHashAgg {
  /** Aggregate Column: 64-bit SimHash of the group's token-hash column. */
  def simhash(tokenHash: Column): Column =
    B.column(SimHashAgg(B.expression(tokenHash)).toAggregateExpression())
}
