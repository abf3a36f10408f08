package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a NORMALIZED string, in one compiled pass —
  * bit-identical to the Column chain it replaces
  * (`array_distinct(slice(transform(sequence(...), i => concat_ws(" ",
  * slice(split(nm, "\\s+"), i+1, k))), 1, max(n-k+1, 0)))`), which paid
  * interpreted higher-order-function lambda calls per token and, worse,
  * ran wherever the optimizer placed the projection — including after an
  * AQE-coalesced exchange on ONE task (measured 2.7 s single-threaded on
  * q_doc_incremental_dedup's old-candidate re-shingle). The kernel makes
  * the per-row cost small enough that placement stops mattering.
  *
  * Parity notes: tokens are `nm.split("\\s+", -1)` exactly like Spark's
  * `split(nm, "\\s+")` (normalized text has single spaces, no leading /
  * trailing — "" yields [""], one windowless token); only full k-windows
  * are emitted; distinct keeps first occurrence order (`array_distinct`).
  */
case class WordShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected string, got $t")
    }

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    WordShinglesKernel.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WordShinglesKernel.compute($c, $k);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WordShinglesExpr = copy(child = newChild)
}

object WordShinglesKernel {
  def compute(nm: UTF8String, k: Int): GenericArrayData = {
    val toks = nm.toString.split("\\s+", -1)
    val n = toks.length - (k - 1)
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) {
      out(m) = UTF8String.fromString(it.next())
      m += 1
    }
    new GenericArrayData(out)
  }
}
