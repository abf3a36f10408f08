package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.PublicSuffixes

/** Registered domain of a host column under Public-Suffix-List semantics
  * (rule/wildcard/exception longest-match — see [[PublicSuffixes]]).
  *
  * The rule table rides INSIDE the expression: it serializes with the
  * plan (a rule list is KBs; the full live list ~200 KB — plan-shipping
  * territory, no broadcast join needed), deserializes once per executor,
  * and compiles to three hash sets, so evaluation is O(host labels) hash
  * probes per row independent of rule count. Codegen emits one call into
  * the referenced table object (the `RegExpReplace`-holds-its-compiled-
  * pattern idiom) — the domain ops that key on this stay pure in-row
  * Column algebra with zero extra shuffle or join.
  */
case class PslDomain(child: Expression, rules: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected string host, got ${child.dataType}")
    }

  private lazy val table = new PublicSuffixes.Table(rules)

  override def nullSafeEval(h: Any): Any =
    UTF8String.fromString(
      table.registrable(h.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("pslTable", table,
      classOf[PublicSuffixes.Table].getName)
    nullSafeCodeGen(ctx, ev, h =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $tbl.registrable($h.toString()));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PslDomain =
    copy(child = newChild)
}
