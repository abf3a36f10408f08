package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd exact squared L2 distance between two `array<long>` columns —
  * the k-means / PQ trainers' inner loop ([[graft.ops.KMeans.qdist2]]),
  * evaluated n·k times per Lloyd's round over the quantized corpus. Same
  * reasoning as [[FloatVectorDot]] (custom Catalyst `Expression`, SURVEY.md
  * §7.3): the HOF `aggregate(zip_with((x,y) => (x-y)*(x-y)), 0, _+_)` form
  * expresses the semantics but pays per-element interpreted lambda calls on
  * the hot path; this is one tight primitive loop inside whole-stage
  * codegen. Integer math is order-free, so the result is bit-identical to
  * the HOF form (parity-pinned in OpsSpec).
  *
  * Overflow THROWS (`Math.*Exact`), matching the ANSI-mode behavior of the
  * HOF arithmetic it replaces — out-of-regime inputs fail loudly on both
  * paths instead of silently wrapping on one. (In the operating regime —
  * quantization scale 1e6, |x| ≤ ~1e3 — the sum is ≤ ~4e17 per 1024 dims,
  * far from the 9.2e18 edge.)
  *
  * Null semantics mirror the HOF form: null array, null element, or
  * mismatched lengths → null.
  */
case class LongVectorDist2(left: Expression, right: Expression)
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
      val d = Math.subtractExact(a.getLong(i), b.getLong(i))
      acc = Math.addExact(acc, Math.multiplyExact(d, d))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = Math.subtractExact($a.getLong($i), $b.getLong($i));
         |    $acc = Math.addExact($acc, Math.multiplyExact($d, $d));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDist2 =
    copy(left = newLeft, right = newRight)
}
