package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL exposure of the engine's custom Catalyst expressions.
  *
  * Two registration paths:
  *  - config-time: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard library-extension hook, applied at session build);
  *  - runtime: [[GraftFunctionRegistry.register]] on an existing session
  *    (tests, notebooks).
  *
  * After either, `spark.sql("SELECT rolling_hash(text), float_dot(a, b)")`
  * plans the codegen'd expressions directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctionRegistry.builtins.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // optimizer-time guardrail: refuse unhinted cartesian products
    // (see CartesianGuard scaladoc; spark.graft.guard.cartesian=false
    // opts a session out)
    e.injectOptimizerRule(graft.plans.CartesianGuard.apply)
  }
}

object GraftFunctionRegistry {

  private[functions] val builtins
      : Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)),
    ("float_dot",
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatVectorDot(exprs(0), exprs(1))),
    ("long_dist2",
      new ExpressionInfo(classOf[LongVectorDist2].getName, "long_dist2"),
      (exprs: Seq[Expression]) => LongVectorDist2(exprs(0), exprs(1))),
    ("long_dot",
      new ExpressionInfo(classOf[LongVectorDot].getName, "long_dot"),
      (exprs: Seq[Expression]) => LongVectorDot(exprs(0), exprs(1))),
    ("psl_domain",
      new ExpressionInfo(classOf[PslDomain].getName, "psl_domain"),
      (exprs: Seq[Expression]) =>
        PslDomain(exprs.head, graft.ops.PublicSuffixes.Default)))

  /** Register the functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    builtins.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
