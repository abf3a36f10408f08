package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-state grouped quantiles — the sketch-family member the exact
  * path can't replace at 100 TB: [[Rank.groupedExactPercentiles]] sorts
  * every group's full value set (correct, but the state is the data);
  * this keeps a FIXED k-row sample per group and answers any quantile
  * from it, with the standard sampled-quantile error (the estimated
  * quantile's true rank deviates by O(1/√k) of the group, ~12% at
  * k = 64, ~4% at k = 512).
  *
  * The sample is BOTTOM-k BY CONTENT HASH (the [[Kmv]] discipline): keep
  * the k rows whose md5-derived 52-bit key hash is smallest — a uniform
  * row sample that is deterministic (no rand(): same input → same sample
  * on any partitioning, retry, or engine, so a DuckDB oracle replays it
  * row for row) and MERGEABLE (bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
  * bottom-k(B)) — the persisted-serve identity: store yesterday's
  * sample, merge today's batch, never rescan history).
  *
  * Scale shape: ONE map-side-combinable aggregate to k (hash, value)
  * pairs per group (the bounded [[graft.functions.TopKAgg]], never a
  * window), then per-group rank picks off the k-length array. State is k
  * longs per group FOREVER.
  */
object QuantileSketch {

  /** The mergeable sample state: (groupCols…, smp: array<struct<key =
    * hash, id = value>>, ascending by hash) — at most k rows per group.
    * `key` must uniquely identify rows (a doc/row id); hash ties break
    * on the smaller value, pinned in the oracle.
    */
  def sampleTable(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      key: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 4096, "k in [2, 4096] — state is k longs/group")
    val smp = graft.functions.TopKAgg.smallest_k_long(k)
    df.select(groupCols.map(col) :+ Kmv.hash52(key).as("__h") :+
        valueCol.cast("long").as("__v"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(smp(col("__h"), col("__v")).as("smp"))
  }

  /** Register-merge of two sample tables ([[Hll.mergeRegisters]]'s
    * analog): union the retained rows, re-keep the bottom k — exactly
    * the sample the union of the raw inputs would have produced.
    */
  def mergeSamples(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val smp = graft.functions.TopKAgg.smallest_k_long(k)
    a.unionByName(b)
      .select(groupCols.map(col) :+ explode(col("smp")).as("e"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(smp(col("e.key"), col("e.id")).as("smp"))
  }

  /** Quantile estimates off a sample table: one row per (group, p) with
    * `est` = the sample's 1-based-rank ⌈n·p/100⌉ order statistic (the
    * [[Rank.exactPercentiles]] rank rule applied to the sample) and
    * `n_sample` so callers can see how filled the sketch is.
    */
  def quantilesFromSample(samples: DataFrame, groupCols: Seq[String],
      ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "percentiles in [1, 100]")
    val vals = array_sort(transform(col("smp"), e => e.getField("id")))
    val n = size(col("smp")).cast("long")
    samples
      .select(groupCols.map(col) ++ Seq(vals.as("__vals"), n.as("n_sample"),
        explode(typedLit(ps)).as("p")): _*)
      .select(groupCols.map(col) ++ Seq(col("p"), col("n_sample"),
        element_at(col("__vals"),
          greatest(call_function("div",
              col("n_sample") * col("p") + 99, lit(100L)),
            lit(1L)).cast("int")).as("est")): _*)
  }

  /** [[sampleTable]] + [[quantilesFromSample]] in one call — the batch
    * entry point: (groupCols…, p, n_sample, est).
    */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      key: Column, k: Int, ps: Seq[Int]): DataFrame =
    quantilesFromSample(sampleTable(df, groupCols, valueCol, key, k),
      groupCols, ps)
}
