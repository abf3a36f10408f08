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
  /** Allen's interval algebra (Allen 1983): classify an ordered pair of
    * intervals [aS, aE), [bS, bE) into exactly one of the 13 basic
    * relations — the vocabulary of every temporal-reasoning join
    * (med-events vs stays, ad exposure vs session, license validity vs
    * usage). Half-open convention: `meets` is aE = bS; `equals` needs
    * both endpoints equal. The CASE ladder is exhaustive and mutually
    * exclusive (each arm adds one constraint), so exactly one label fires
    * for any well-formed pair (aS < aE, bS < bE) — ill-formed input is
    * the caller's filter. Pure codegen'd scalar; compose with
    * [[RangeJoin]] to classify only OVERLAP-candidate pairs at scale
    * instead of a product.
    */
  def allenRelation(aS: org.apache.spark.sql.Column,
      aE: org.apache.spark.sql.Column, bS: org.apache.spark.sql.Column,
      bE: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(aE < bS, "before")
      .when(aE === bS, "meets")
      .when(bE < aS, "after")
      .when(bE === aS, "met_by")
      .when(aS === bS && aE === bE, "equals")
      .when(aS === bS && aE < bE, "starts")
      .when(aS === bS, "started_by") // aE > bE by exclusion
      .when(aE === bE && aS > bS, "finishes")
      .when(aE === bE, "finished_by") // aS < bS by exclusion
      .when(aS > bS && aE < bE, "during")
      .when(aS < bS && aE > bE, "contains")
      .when(aS < bS, "overlaps") // bS < aE < bE by exclusion
      .otherwise("overlapped_by")

  def mergeIntervals(spans: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(startCol, endCol)
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    // flag first, THEN number islands with flag DESC as the tiebreak:
    // duplicate (start,end) spans are identical under the first sort but
    // distinguishable after flagging ({1,0}), and an island running-sum
    // ordered by (start,end) alone is underdetermined on that tie — the
    // island-opening row MUST precede its duplicate peers or a peer
    // inherits the previous island's number (observed: DuckDB's parallel
    // re-sort swapped a tied pair at sf1; Spark only escaped by reusing
    // the first window's sort). flag DESC pins both engines to the same,
    // semantically-correct answer regardless of sort stability.
    val flagged = spans.select(col(keyCol), col(startCol), col(endCol),
      when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L)
        .as("island_flag"))
    val w2 = Window.partitionBy(keyCol)
      .orderBy(col(startCol), col(endCol), col("island_flag").desc)
    flagged
      .select(col(keyCol), col(startCol), col(endCol),
        sum(col("island_flag"))
          .over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("island"))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_spans"))
  }
}
