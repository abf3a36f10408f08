package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-set algebra over per-key span collections — the
  * gaps-and-islands family (coverage windows, downtime detection,
  * validity-range consolidation).
  */
object Intervals {

  /** Merge overlapping (or touching, since bounds are inclusive) intervals
    * per key: the classic sort + running-max island scan. A row starts a
    * new island when its start exceeds the running max of all previous
    * ends in its key; islands then collapse to (min start, max end,
    * n_spans).
    *
    * Deterministic under ties by construction: rows with equal starts
    * always share an island (the running max is ≥ their common start), so
    * the merged output is invariant to tie order even though the window
    * frame is not.
    *
    * Scale shape: ONE window (partitioned by key — per-key state is the
    * running max, not the span list) feeding one hash aggregation on
    * (key, island); both shuffles on the key. Skewed keys sort within
    * their partition — at web scale pre-split pathological keys (the
    * Skew.saltedJoin discipline) or bound spans per key upstream.
    */
  def mergeIntervals(spans: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(startCol, endCol)
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val island = sum(
      when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spans
      .select(col(keyCol), col(startCol), col(endCol), island.as("island"))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_spans"))
  }
}
