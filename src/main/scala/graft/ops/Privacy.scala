package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk auditing over quasi-identifiers — the structural
  * complement of [[TextOps.scrub]]'s pattern-level PII removal: scrubbing
  * deletes explicit identifiers, but a row remains re-identifiable when
  * the COMBINATION of innocuous attributes (language × length bucket ×
  * source, ...) is rare. k-anonymity (Sweeney 2002) is the standard
  * audit: every row must share its quasi-identifier (QI) tuple with at
  * least k−1 others; l-diversity (Machanavajjhala 2007) additionally
  * requires each QI class to hold ≥ l distinct sensitive values, closing
  * the homogeneity attack (a 5-anonymous class whose sensitive value is
  * constant still leaks it).
  *
  * Scale shape: the audit is ONE map-side-combinable aggregate on the QI
  * key (class count + distinct-sensitive count); suppression is the
  * class table joined back on the same key — two shuffles total on the
  * natural key, no window, no driver state. At 100 TB the QI key is the
  * partition-prune axis: layouts keyed by (source, lang, …) audit each
  * shard independently.
  */
object Privacy {

  /** Per-class audit: (qiCols…, class_size, l_distinct, violates_k,
    * violates_l). `violates_k` marks classes smaller than k;
    * `violates_l` marks classes with fewer than l distinct sensitive
    * values. NULL QI values group as their own class (standard SQL
    * grouping), matching the suppression output's NULLed tuples.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .select(qiCols.map(col) ++ Seq(
        col("class_size"), col("l_distinct"),
        (col("class_size") < k).as("violates_k"),
        (col("l_distinct") < l).as("violates_l")): _*)
  }

  /** Row-level suppression — the deterministic baseline generalization:
    * rows whose QI class violates k-anonymity OR l-diversity get every
    * QI column NULLed (full suppression collapses all violating rows
    * into one maximal class), others pass through unchanged; the
    * `suppressed` flag records which. Row count is PRESERVED — the audit
    * decides, the caller filters or generalizes further.
    */
  def suppress(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Long, l: Long): DataFrame = {
    val audit = kAnonymityAudit(df, qiCols, sensitiveCol, k, l)
      .select(qiCols.map(c => col(c).as(s"__qi_$c")) :+
        (col("violates_k") || col("violates_l")).as("__viol"): _*)
    // NULL-SAFE join: a NULL QI value is a class of its own in the audit,
    // and a plain equi-join would never match it back (NULL ≠ NULL), so
    // a violating NULL-QI row would silently escape suppression
    val cond = qiCols.map(c => df(c) <=> audit(s"__qi_$c")).reduce(_ && _)
    val joined = df.join(audit, cond, "left")
    val suppressed = coalesce(col("__viol"), lit(false))
    joined.select(
      df.columns.toSeq.map { c =>
        if (qiCols.contains(c))
          when(suppressed, lit(null).cast(df.schema(c).dataType))
            .otherwise(df(c)).as(c)
        else df(c)
      } :+ suppressed.as("suppressed"): _*)
  }
}
