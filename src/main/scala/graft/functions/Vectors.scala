package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels over `array<float>` embedding columns, built entirely from
  * Spark's higher-order functions (`zip_with`/`aggregate`) so they evaluate
  * inside the codegen'd expression pipeline — no UDF serialization, no Python
  * worker, and they vectorize over parquet scans.
  *
  * All arithmetic is promoted to double before accumulating, and accumulation
  * is left-to-right (HOF `aggregate` semantics), giving a well-defined result
  * that the DuckDB oracle can reproduce with the same expression shape.
  */
object Vectors {
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = expr2("bit_count", a.bitwiseXOR(b))

  private def expr2(fn: String, c: Column): Column = {
    // functions.bit_count exists in recent Spark; route through call_function
    // to stay source-compatible.
    call_function(fn, c)
  }
}
