package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Banded random-hyperplane (sign-random-projection) LSH signatures as ONE
  * fused native expression: `nTables` signatures of `bits` sign bits each
  * over an `array<float>` embedding, returned as `array<long>` indexed by
  * table.
  *
  * Semantically identical — bit-for-bit — to the SQL higher-order-function
  * formulation (kept as `Knn.srpBandsHof` and cross-checked in the spec):
  * plane component (p, i) = (pmod(murmur3_hash(p, i), 2000) − 1000) / 1000
  * with p = table*bits + bit and i the 1-based dimension, accumulated
  * ascending-index in double; a null element nulls the projection (bit 0).
  * The HOF version evaluates interpreted lambdas with per-element variable
  * binding and recomputes `size()`/`element_at()` per plane; this kernel is
  * a single primitive loop nest inside whole-stage codegen reading the
  * vector once per plane directly from the array data.
  */
case class SrpSignatures(child: Expression, nTables: Int, bits: Int)
    extends UnaryExpression {

  require(nTables > 0 && bits > 0 && bits <= 64,
    s"invalid SRP shape: $nTables tables x $bits bits")

  override def prettyName: String = "srp_signatures"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.DataTypeMismatch(
        errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map(
          "paramIndex" -> "1",
          "requiredType" -> "ARRAY<FLOAT>",
          "inputSql" -> child.sql,
          "inputType" -> other.sql))
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val sigs = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        val p = t * bits + j
        var s = 0.0
        var anyNull = false
        var i = 0
        while (i < n && !anyNull) {
          if (vec.isNullAt(i)) anyNull = true
          else s += vec.getFloat(i).toDouble *
            SrpSignatures.plane(p, i + 1)
          i += 1
        }
        if (!anyNull && s > 0) sig |= 1L << j
        j += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val cls = SrpSignatures.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val n = ctx.freshName("n")
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |int $n = $vec.numElements();
         |long[] $sigs = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double $s = 0.0;
         |    boolean $anyNull = false;
         |    for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |      if ($vec.isNullAt($i)) { $anyNull = true; }
         |      else {
         |        $s += ((double) $vec.getFloat($i)) *
         |          $cls.plane($t * $bits + $j, $i + 1);
         |      }
         |    }
         |    if (!$anyNull && $s > 0) $sig |= 1L << $j;
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SrpSignatures =
    copy(child = c)
}

object SrpSignatures {
  /** Pseudo-random plane component for (plane p, 1-based dim i): exactly
    * Spark's `hash(p, i)` (murmur3, seed 42, ints folded in order) mapped
    * through `(pmod(h, 2000) - 1000) / 1000`. */
  def plane(p: Int, i: Int): Double = {
    val h1 = Murmur3_x86_32.hashInt(p, 42)
    val h2 = Murmur3_x86_32.hashInt(i, h1)
    val m = ((h2 % 2000) + 2000) % 2000
    (m - 1000).toDouble / 1000.0
  }
}
