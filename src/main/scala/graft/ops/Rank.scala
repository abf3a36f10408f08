package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics — global ranks and percentiles
  * WITHOUT a single-task sort and WITHOUT buffering a group's values.
  *
  * Spark's `percentile`/`median` aggregates hold every value of a group
  * in one executor buffer (OOM at a billion rows per group), and a bare
  * `row_number()` window with no partition moves the whole relation to
  * one task. The classic fix is the two-pass bucket-offset rank (the
  * distributed zipWithIndex): bucket rows by an ORDER-CONTIGUOUS prefix
  * of the sort key, turn per-bucket counts into cumulative offsets with
  * ONE running-sum window over the counts table itself (B rows on a
  * single trivially-sized task — no driver collect, and no O(B²)
  * non-equi self-join, which a caller-picked narrow bucketWidth over a
  * wide value range would otherwise blow up), and add a PARTITIONED
  * row_number to each bucket's offset. Every stage is a bounded shuffle;
  * the value at any rank is exact.
  *
  * [[Dedup.sortedNeighborhoodPairs]] inlines the same discipline for
  * string keys; this object is the numeric/general form.
  */
object Rank {

  /** Adds an exact 1-based global rank column `rk` in the total order of
    * `order`. `bucket` MUST be order-contiguous with `order` (all rows of
    * bucket b sort before all rows of bucket b' > b) — e.g. `v div width`
    * for a non-negative numeric key, `substring(key, 1, 1)` for strings.
    * Ties in `order` rank arbitrarily but deterministically per plan;
    * the VALUE at any rank is unaffected.
    */
  def withGlobalRank(df: DataFrame, bucket: Column,
      order: Seq[Column]): DataFrame = {
    val b = df.withColumn("__bk", bucket)
    val cnt = b.groupBy("__bk").agg(count(lit(1)).as("__n"))
    val off = cnt.withColumn("__off",
      coalesce(sum(col("__n")).over(Window.orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bk", "__off")
    b.join(broadcast(off), Seq("__bk"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("__bk").orderBy(order: _*)).cast("long")
        + col("__off"))
      .drop("__bk", "__off")
  }

  /** Exact nearest-rank percentiles of a NON-NEGATIVE long column:
    * percentile p is the value at rank `ceil(n·p/100)` (= `(n·p + 99)
    * div 100`, the classic type-1 definition — an actual data value,
    * never an interpolation, so it is integer-exact and engine-
    * replayable). `bucketWidth` sizes the order-contiguous buckets
    * (`v div bucketWidth`); any width works for correctness, widths
    * near (max−min)/partitions balance them.
    *
    * Returns one row per requested percent: (p, v).
    */
  def exactPercentiles(df: DataFrame, valueCol: String,
      percents: Seq[Int], bucketWidth: Long): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "percents must be in [1, 100]")
    require(bucketWidth >= 1, "bucketWidth must be positive")
    val vals = df.select(col(valueCol).cast("long").as("v"))
    val ranked = withGlobalRank(vals,
      call_function("div", col("v"), lit(bucketWidth)), Seq(col("v")))
    val n = ranked.agg(count(lit(1)).as("n"))
    val targets = n.select(posexplode(
        array(percents.map(p => lit(p)): _*)).as(Seq("i", "p")),
        col("n"))
      .select(col("p").cast("int").as("p"),
        call_function("div", col("n") * col("p") + lit(99L), lit(100L))
          .as("rk"))
    ranked.join(broadcast(targets).hint("broadcast"), Seq("rk"))
      .select(col("p"), col("v"))
  }

  /** Per-GROUP exact nearest-rank percentiles — [[exactPercentiles]]
    * with the whole chain keyed by `groupCol`: ranks come from a window
    * PARTITIONED BY (group, bucket) plus per-group cumulative bucket
    * offsets (a running-sum window over the counts table, G·B tiny rows),
    * so no group's values ever sort on one task and no group's values
    * ever buffer in an aggregator — the two failure modes of
    * `percentile()` and bare `row_number()` at a billion rows per group.
    * Targets join back on (group, rank). Returns (groupCol, p, v).
    */
  def groupedExactPercentiles(df: DataFrame, groupCol: String,
      valueCol: String, percents: Seq[Int],
      bucketWidth: Long): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "percents must be in [1, 100]")
    require(bucketWidth >= 1, "bucketWidth must be positive")
    val vals = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"))
      .withColumn("__bk", call_function("div", col("v"), lit(bucketWidth)))
    val cnt = vals.groupBy("g", "__bk").agg(count(lit(1)).as("__n"))
    val off = cnt.withColumn("__off",
      coalesce(sum(col("__n")).over(Window.partitionBy("g")
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("g", "__bk", "__off")
    val ranked = vals.join(broadcast(off), Seq("g", "__bk"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("g", "__bk").orderBy("v")).cast("long")
        + col("__off"))
    val targets = vals.groupBy("g").agg(count(lit(1)).as("n"))
      .select(col("g"), posexplode(
        array(percents.map(p => lit(p)): _*)).as(Seq("i", "p")), col("n"))
      .select(col("g"), col("p").cast("int").as("p"),
        call_function("div", col("n") * col("p") + lit(99L), lit(100L))
          .as("rk"))
    ranked.join(broadcast(targets).hint("broadcast"), Seq("g", "rk"))
      .select(col("g").as(groupCol), col("p"), col("v"))
  }

  /** Per-group WEIGHTED nearest-rank percentiles — the value at the
    * point where cumulative WEIGHT first reaches `ceil(W_g·p/100)`
    * (W_g = the group's total weight). With weight = token count this
    * answers "the document length at the p-th percentile of TOKEN MASS"
    * — the number that matters when budgets are tokens, not documents
    * (half the corpus's tokens live in docs longer than the mass
    * median, however many tiny docs there are).
    *
    * Same bucket-offset discipline as [[groupedExactPercentiles]], with
    * weight sums in place of counts: per-(group, bucket) weight totals
    * → per-group running offsets (tiny counts-table window), intra-
    * bucket cumulative weight via a PARTITIONED window, and the target
    * row found by the interval membership `cum − w < target ≤ cum` —
    * the (cum−w, cum] intervals partition the weight axis, so exactly
    * one row matches per target and the selected VALUE is invariant to
    * tie order among equal values. Weights must be ≥ 0 (raise_error on
    * negatives — a silent negative would corrupt every downstream
    * cumulative); zero-weight rows own an empty interval and are never
    * selected. Returns (groupCol, p, v).
    */
  def groupedWeightedPercentiles(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String, percents: Seq[Int],
      bucketWidth: Long): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "percents must be in [1, 100]")
    require(bucketWidth >= 1, "bucketWidth must be positive")
    val wChecked = when(col(weightCol).cast("long") >= 0,
      col(weightCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("groupedWeightedPercentiles: negative weight: "),
        col(weightCol).cast("string"))))
    val vals = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"), wChecked.as("w"))
      .withColumn("__bk", call_function("div", col("v"), lit(bucketWidth)))
    val cnt = vals.groupBy("g", "__bk").agg(sum("w").as("__n"))
    val off = cnt.withColumn("__off",
      coalesce(sum(col("__n")).over(Window.partitionBy("g")
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("g", "__bk", "__off")
    val ranked = vals.join(broadcast(off), Seq("g", "__bk"))
      .withColumn("cum", sum(col("w")).over(
        Window.partitionBy("g", "__bk").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)) + col("__off"))
    val targets = vals.groupBy("g").agg(sum("w").as("tw"))
      .select(col("g").as("g2"), posexplode(
        array(percents.map(p => lit(p)): _*)).as(Seq("i", "p")),
        col("tw"))
      .select(col("g2"), col("p").cast("int").as("p"),
        call_function("div", col("tw") * col("p") + lit(99L), lit(100L))
          .as("tgt"))
    ranked.join(broadcast(targets).hint("broadcast"),
        col("g") === col("g2") &&
          col("tgt") > col("cum") - col("w") && col("tgt") <= col("cum"))
      .select(col("g").as(groupCol), col("p"), col("v"))
  }
}
