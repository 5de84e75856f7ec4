package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build/probe over Spark's own runtime-filter kernels
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtimeFilter.bloomFilter`), surfaced as
  * explicit operators so a pipeline can pre-screen a probe side against a
  * bounded sketch of a build side without waiting for the optimizer to
  * infer it.
  *
  * The contract that makes this safe as a PREFILTER: a bloom has no false
  * negatives. `mightContain = false` proves the key is absent from the
  * build side, so rows it rejects can skip the exact join entirely; rows
  * it accepts are candidates that still pay the exact check. Results are
  * therefore row-identical to the unfiltered plan — the sketch moves work,
  * never answers.
  */
object Bloom {

  /** Aggregate Column: one serialized bloom sketch over `xxhash64(key)`.
    * Partial-aggregatable (sketches OR-merge), so the build is map-side
    * combined and only merged sketches cross the shuffle. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    B.column(new BloomFilterAggregate(B.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Distributed sketch build. The single-row `head()` here is the
    * broadcast-build collect, not a data collect: the aggregation is
    * distributed and only the merged sketch (bounded by `numBits`, never
    * by data volume) returns to the driver — exactly what Spark's own
    * runtime filter does through its scalar subquery, and what
    * `df.stat.bloomFilter` does through this same aggregate. Returns None
    * on an empty input (no sketch ⇒ nothing can match). */
  def buildBloom(df: DataFrame, key: Column, expectedItems: Long,
                 numBits: Long): Option[Array[Byte]] =
    Option(df.agg(bloomAgg(key, expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf"))

  /** Probe predicate: true iff `key` MIGHT be in the sketch (false proves
    * absence). The sketch rides into the plan as a foldable binary literal
    * — task-side it deserializes once and the probe is a codegen'd hash
    * test, evaluated map-side in the scan stage. None ⇒ constant false. */
  def mightContain(bloom: Option[Array[Byte]], key: Column): Column =
    bloom match {
      case Some(bytes) => B.column(BloomFilterMightContain(
        Literal(bytes, BinaryType), B.expression(xxhash64(key))))
      case None => lit(false)
    }
}
