package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for each left row, attach the latest
  * right row with `rightTime <= leftTime` on the same key — the canonical
  * time-series enrichment operator (DuckDB/Pandas call it ASOF JOIN /
  * merge_asof).
  *
  * Spark-first composition per the custom-operator preference ladder
  * (SURVEY.md §4: compose built-ins before writing a custom plan): tag both
  * sides, union, ONE window over each key's merged timeline carrying the
  * last-seen right row forward, keep the left rows. One shuffle on the key,
  * one per-key sort, O(1) window state per row — a custom
  * LogicalPlan/SparkPlan could only remove the union overhead, not the
  * shuffle or sort, so the declarative form is the 100 TB shape already.
  * (A range join — `l.t BETWEEN r.t AND r.t + d` — would multiply rows and
  * need a re-aggregation; the merge-window form touches each row once.)
  */
object AsOf {

  /** @param right must be UNIQUE per (key, rightTime) — pre-aggregate
    *   otherwise — so "the latest right row" is well-defined and results
    *   deterministic (the same contract DuckDB ASOF needs for stable
    *   output). Ties in time count as visible: a right row at exactly
    *   `leftTime` is matched (`<=`, like `ASOF ... ON l.t >= r.t`).
    * @return left.* plus `outTime`, `outValue` (null when no prior right)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTime: String, rightTime: String, rightValue: String,
      outTime: String = "asof_time", outValue: String = "asof_value"): DataFrame = {
    val leftCols = left.columns.toSeq
    val ltType = left.schema(leftTime).dataType
    val rtType = right.schema(rightTime).dataType
    val rvType = right.schema(rightValue).dataType
    // the carried right row is ONE nullable struct (not two independent
    // columns): two separate last(_, ignoreNulls) calls would skip a
    // matched right row whose VALUE is null and pair its time with an
    // older row's value — the struct is non-null for every right row, so
    // (time, value) always come from the same row, and a null right value
    // surfaces as null (matching ASOF semantics and the DuckDB oracle)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts AFTER right at equal time
      .withColumn("__r",
        lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rt", rtType),
          org.apache.spark.sql.types.StructField("rv", rvType)))))
    val r = right.select(
      leftCols.map { c =>
        if (key.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(
        col(rightTime).cast(ltType).as("__t"),
        lit(0).as("__side"),
        struct(col(rightTime).as("rt"), col(rightValue).as("rv")).as("__r")): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumn(outTime, col("__last.rt"))
      .withColumn(outValue, col("__last.rv"))
      .select((leftCols :+ outTime :+ outValue).map(col): _*)
  }
}
