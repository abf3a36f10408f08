package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression conversions —
  * the supported path for libraries exposing custom Catalyst expressions as
  * `Column` functions (Spark 4's public `Column` wraps a ColumnNode, not an
  * Expression). Lives inside the `org.apache.spark.sql` package solely for
  * access; no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True when the session holds no cached plans — lets library tests
    * assert that scoped pipelines (graft.ops.Dedup.Scoped) really release
    * their persisted bases (`sharedState` is `private[sql]`).
    */
  def noCachedPlans(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
