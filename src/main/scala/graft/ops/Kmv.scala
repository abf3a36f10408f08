package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count estimation (Bar-Yossef et al.
  * 2002; the bottom-k / theta-sketch family): hash every key, keep only
  * the k SMALLEST distinct hash values, and estimate the cardinality from
  * the k-th order statistic —
  *
  *   N̂ = (k−1)·M div h₍k₎   (M = hash-space size; exact count when the
  *                            sketch never filled)
  *
  * Why it exists next to `approx_count_distinct` (HLL++) and the linear-
  * counting bitmap: the HLL estimate runs through a float harmonic mean
  * an external engine cannot replay bit-for-bit, and the bitmap needs a
  * bucket range chosen up front. KMV state is k longs per group on every
  * mapper (mergeable: sorted union trimmed to k — a union of sketches is
  * the sketch of the union, so per-partition partials compose exactly),
  * and the estimate is PURE INTEGER rank algebra over a portable md5
  * prefix — the oracle recomputes the identical estimate, so "the sketch
  * is right" is a bit-exact gate, not a tolerance check.
  *
  * Hash family: the first 13 md5 nibbles (52 bits, M = 2⁵²), keeping
  * `(k−1)·M` inside a signed long for k ≤ 2047 — the same ANSI-envelope
  * reasoning as the 60-bit identity keys (Dedup header); standard error
  * is ~1/√(k−2) (k = 128 → ~9%).
  *
  * Scale shape: one projection (md5 per row), one grouped aggregate with
  * k-bounded buffers — no distinct shuffle of the raw keys, which is the
  * entire point at a 10¹² -key domain.
  */
object Kmv {

  val HashSpace: Long = 1L << 52

  /** 52-bit md5-prefix hash of a key column — non-negative, portable. */
  def hash52(key: Column): Column =
    conv(substring(md5(key), 1, 13), 16, 10).cast("long")

  /** The scalar estimate off a sketch buffer — shared with the streaming
    * tracker ([[graft.streaming.StreamingDistinct]]) so stream and batch
    * report the identical number for identical inputs. */
  def estimateOf(mins: Array[Long], k: Int): Long =
    if (mins.length < k) mins.length.toLong
    else ((k - 1).toLong * HashSpace) / mins(k - 1)

  /** Theta-sketch set algebra over two KMV sketches (the Datasketches
    * theta idiom): with θ = min of the two k-th order statistics (an
    * unfilled side contributes θ = M), every retained hash below θ is a
    * uniform sample of the union at rate θ/M, so
    *
    *   est_union     = |{h ∈ A ∪ B : h < θ}| · M div θ
    *   est_intersect = |{h ∈ A ∩ B : h < θ}| · M div θ
    *
    * — distinct-set overlap between two corpora (vocabulary drift,
    * cross-snapshot dedup pressure) from two k-long sketches, never a
    * shuffle of either key domain, and the whole algebra integer rank
    * arithmetic an oracle replays bit-for-bit. Exact when both sides
    * fit their sketches. Returns per group:
    * (groupCols…, est_a, est_b, est_union, est_intersect).
    */
  def overlapEstimate(dfA: DataFrame, dfB: DataFrame,
      groupCols: Seq[String], key: Column, k: Int = 128): DataFrame = {
    require(k >= 2 && k <= 2047, "k must be in [2, 2047]")
    val sk = graft.functions.SigAggregators.kmv_sketch(k)
    def side(df: DataFrame, out: String): DataFrame =
      df.select(groupCols.map(col) :+ hash52(key).as("__h"): _*)
        .groupBy(groupCols.map(col): _*)
        .agg(sk(col("__h")).as(out))
    def theta(mins: Column): Column =
      when(size(mins) < k, lit(HashSpace))
        .otherwise(try_element_at(mins, lit(k)))
    def estOf(mins: Column): Column =
      when(size(mins) < k, size(mins).cast("long"))
        .otherwise(call_function("div", lit((k - 1).toLong * HashSpace),
          try_element_at(mins, lit(k))))
    def scaled(n: Column, th: Column): Column =
      call_function("div", n.cast("long") * lit(HashSpace), th)
    side(dfA, "ma").join(side(dfB, "mb"), groupCols)
      .withColumn("th", least(theta(col("ma")), theta(col("mb"))))
      .select(groupCols.map(col) ++ Seq(
        estOf(col("ma")).as("est_a"),
        estOf(col("mb")).as("est_b"),
        scaled(size(filter(array_union(col("ma"), col("mb")),
          x => x < col("th"))), col("th")).as("est_union"),
        scaled(size(filter(array_intersect(col("ma"), col("mb")),
          x => x < col("th"))), col("th")).as("est_intersect")): _*)
  }

  /** Per-group distinct estimate: (groupCols…, k_used, kth_min, est).
    * `k_used < k` means the sketch holds every distinct hash — the
    * estimate IS the exact hash-distinct count (md5-prefix collisions
    * under-count by ~n²/2⁵³, the documented envelope).
    */
  def distinctEstimate(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int = 128): DataFrame = {
    require(k >= 2 && k <= 2047,
      "k must be in [2, 2047] — (k-1)*2^52 must stay inside a long")
    val sk = graft.functions.SigAggregators.kmv_sketch(k)
    df.select(groupCols.map(col) :+ hash52(key).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sk(col("__h")).as("mins"))
      .select(groupCols.map(col) ++ Seq(
        size(col("mins")).cast("long").as("k_used"),
        // try_element_at: an unfilled sketch has no kth value (NULL),
        // and ANSI element_at would throw there
        try_element_at(col("mins"), lit(k)).as("kth_min"),
        when(size(col("mins")) < k, size(col("mins")).cast("long"))
          .otherwise(call_function("div",
            lit((k - 1).toLong * HashSpace),
            try_element_at(col("mins"), lit(k)))).as("est")): _*)
  }
}
