package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation: declarative per-row expectations audited in
  * ONE pass — the ingest gate a training pipeline runs before letting a
  * new drop of data near the corpus ("quantity in [1,50]", "ship date
  * never null", "discount ≤ 10%").
  *
  * Shape: every rule becomes one `sum(violates)` column in a single
  * aggregate over a single scan — N rules cost one pass and one 1-row
  * partial per mapper, not N jobs (the naive rule-per-action loop reads
  * the table N times; at 100 TB that is N×the whole job). The wide 1-row
  * result is melted to (rule, n_violations) rows with an inline-table
  * Generate, no shuffle beyond the global agg's single exchange.
  *
  * The report is a DataFrame, not an exception: callers decide whether a
  * violation is fatal (`require(ok)`), quarantines rows, or just records
  * drift. `violations(df, rules)` returns the offending rows themselves
  * for the quarantine path.
  */
object Expectations {

  /** Audit `rules` (name → per-row PASS predicate) in one aggregate.
    * Returns one row per rule: (rule, n_rows, n_violations, passed),
    * rule order preserved. A NULL predicate value counts as a violation
    * (contracts are ternary-hostile: unknown is not compliant).
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation required")
    val aggs = count(lit(1)).as("_n") +: rules.zipWithIndex.map {
      case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"_v$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // melt via an inline struct array: (idx, name) pairs are literals, so
    // this is a Generate over ONE row — no second aggregate, no shuffle
    val entries = array(rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"_v$i").as("n_violations"))
    }: _*)
    wide.select(col("_n").as("n_rows"), explode(entries).as("e"))
      .select(col("e.rule").as("rule"), col("n_rows"),
        col("e.n_violations").as("n_violations"),
        (col("e.n_violations") === 0L).as("passed"))
  }

  /** Rows violating ANY rule, tagged with the (first) failed rule name —
    * the quarantine feed. Same one-pass shape: a codegen'd projection +
    * filter, no shuffle.
    */
  def violations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation required")
    val firstFailed = rules.foldRight(lit(null).cast("string")) {
      case ((name, pred), els) =>
        when(!coalesce(pred, lit(false)), lit(name)).otherwise(els)
    }
    df.withColumn("failed_rule", firstFailed)
      .where(col("failed_rule").isNotNull)
  }
}
