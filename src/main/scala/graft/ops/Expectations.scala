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
    // sum over zero rows is NULL — coalesce so an EMPTY ingest drop audits
    // as "0 violations, passed=true" rather than a ternary non-answer that
    // NPEs the caller's require(passed)
    val aggs = count(lit(1)).as("_n") +: rules.zipWithIndex.map {
      case ((_, pred), i) =>
        coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)),
          lit(0L)).as(s"_v$i")
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

  /** Contract metrics that ride ANOTHER job: attach the rule counters to
    * `df` via Spark's `observe` (CollectMetrics) and read them AFTER the
    * caller's own action — the audit costs ZERO extra passes, because the
    * counters accumulate on the very scan that writes the shards /
    * trains the index. [[check]] is the standalone one-pass audit; this
    * is the free-rider variant for pipelines that are about to read the
    * data anyway.
    *
    * Usage:
    * {{{
    *   val (instrumented, obs) = Expectations.observed(df, rules)
    *   instrumented.write.parquet(out)          // the real job
    *   val report = Expectations.fromObserved(obs.get, rules) // no new job
    * }}}
    */
  def observed(df: DataFrame, rules: Seq[(String, Column)],
      name: String = "expectations")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(rules.nonEmpty, "at least one expectation required")
    val obs = org.apache.spark.sql.Observation(name)
    // same empty-input coalesce as [[check]]: a zero-row observed scan must
    // report 0 violations, not NULL
    val metrics = count(lit(1)).as("_n") +: rules.zipWithIndex.map {
      case ((_, pred), i) =>
        coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)),
          lit(0L)).as(s"_v$i")
    }
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Decode an [[observed]] metrics row into the same (rule, n_rows,
    * n_violations, passed) shape [[check]] returns — driver-side, no job.
    */
  def fromObserved(metrics: Map[String, Any],
      rules: Seq[(String, Column)]): Seq[(String, Long, Long, Boolean)] = {
    val n = metrics("_n").asInstanceOf[Long]
    rules.zipWithIndex.map { case ((rule, _), i) =>
      val v = metrics(s"_v$i").asInstanceOf[Long]
      (rule, n, v, v == 0L)
    }
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

  /** Per-row pipeline PROVENANCE: which stage dropped (or kept) each row,
    * as data — the audit trail a composed curation pipeline otherwise
    * loses ("this doc vanished; which filter ate it, and why?").
    * `stages` are (name, drops-row predicate, reason expression) in
    * PIPELINE ORDER; the FIRST stage whose predicate fires owns the row
    * (matching what a sequential pipeline actually does — later filters
    * never see a dropped row), survivors get (`keepStage`, "keep",
    * `keepReason`). Every row is explained by exactly one stage, by
    * construction.
    *
    * Cost shape: ONE nested-CASE projection appended to the caller's
    * plan — zero extra corpus passes; the stage predicates reuse the
    * very columns the pipeline already computes (the
    * [[observed]]/CollectMetrics free-rider discipline, here with
    * per-row rows instead of counters). A NULL predicate counts as a
    * drop ([[check]]'s ternary-hostile rule).
    */
  def provenance(df: DataFrame, stages: Seq[(String, Column, Column)],
      keepStage: String, keepReason: Column): DataFrame = {
    require(stages.nonEmpty, "at least one stage required")
    val assigned = stages.foldRight(
      struct(lit(keepStage).as("stage"), lit("keep").as("action"),
        keepReason.cast("string").as("reason"))) {
      case ((name, drops, reason), tail) =>
        when(coalesce(drops, lit(true)),
          struct(lit(name).as("stage"), lit("drop").as("action"),
            reason.cast("string").as("reason"))).otherwise(tail)
    }
    df.withColumn("__prov", assigned)
      .withColumn("stage", col("__prov.stage"))
      .withColumn("action", col("__prov.action"))
      .withColumn("reason", col("__prov.reason"))
      .drop("__prov")
  }
}
