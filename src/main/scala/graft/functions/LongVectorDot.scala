package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd exact integer dot product of two `array<long>` columns — the
  * inner loop of the integer-exact similarity chain
  * ([[graft.ops.VectorOps.bruteTopKExact]] and friends), where embeddings
  * are fixed-point-quantized FIRST ([[graft.ops.KMeans.quantize]]) and
  * every similarity is derived from this dot with integer-only math, so
  * two engines agree bit-for-bit (integer sums are order-free, unlike the
  * float fold in [[FloatVectorDot]]). Same custom-`Expression` reasoning
  * as its siblings (SURVEY.md §7.3): the HOF
  * `aggregate(zip_with(_*_), 0L, _+_)` form expresses the semantics but
  * pays per-element interpreted lambda calls on the candidate-pair hot
  * path; this is one tight primitive loop inside whole-stage codegen.
  *
  * Overflow THROWS (`Math.*Exact`), matching the ANSI-mode behavior of the
  * HOF arithmetic it replaces. Operating envelope: with quantization scale
  * s and |x| ≤ m, the sum is bounded by dims·(s·m)² — at the similarity
  * chain's s=1e5, m≈1, dims=64 that is ~6.4e11, five decades under the
  * 9.2e18 edge.
  *
  * Null semantics mirror the HOF form: null array, null element, or
  * mismatched lengths → null.
  */
case class LongVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected array<bigint> on both sides, got ${left.dataType} / ${right.dataType}")
    }
  }

  // see FloatVectorDot: null ELEMENTS null the result regardless of the
  // array columns' own nullability
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc = Math.addExact($acc,
         |      Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}
