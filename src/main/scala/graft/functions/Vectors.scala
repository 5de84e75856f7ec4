package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.functions._

/** Vector kernels over `array<float>` embedding columns.
  *
  * The primary implementations are native Catalyst expressions with
  * `doGenCode` (see [[VectorExpressions]]): a fused single-pass primitive
  * loop inside whole-stage codegen. The `*Hof` variants are the equivalent
  * higher-order-function formulations (`zip_with`/`aggregate`), kept as a
  * portable reference implementation and cross-checked in the test suite —
  * both accumulate ascending-index in double, so results are bit-identical.
  */
object Vectors {
  def dot(a: Column, b: Column): Column =
    B.column(DotProduct(B.expression(a), B.expression(b)))

  def cosine(a: Column, b: Column): Column =
    B.column(CosineSim(B.expression(a), B.expression(b)))

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (normHof(a) * normHof(b))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))
}
