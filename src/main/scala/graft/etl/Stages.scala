package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The core ETL stages, each a pure `DataFrame => DataFrame` transform over
  * the long-form model `(stay_id, feature_id, tidx, value)` (SURVEY.md §1.1).
  * Every stage is declarative Column algebra — Catalyst fuses the whole chain
  * (scan → project → broadcast join → partial agg → exchange → final agg)
  * into a single-shuffle plan with whole-stage codegen; nothing here iterates
  * rows on the driver.
  */
object Stages {

  val TimestampFmt = "yyyy-MM-dd HH:mm:ss"

  /** Parse a `yyyy-MM-dd HH:mm:ss` (timezone-naive, treated as UTC) string
    * column to epoch seconds. Reference:
    * `/root/reference/src/mimic2ts/__init__.py:84-91` (strict format) and
    * `:113-115,301-306,416-421` (event columns, same data).
    */
  def epochSeconds(c: Column): Column =
    unix_timestamp(to_timestamp(c, TimestampFmt))

  /** Stay dimension: `icustays → (stay_id, intime, outtime, total_windows)`
    * with times in epoch seconds and
    * `total_windows = floor((outtime - intime) / timestep)` — the grid is
    * `0..total_windows` INCLUSIVE, i.e. `floor(dur/step)+1` columns.
    * This replicates the implementation (`__init__.py:93-98`), not the
    * reference's own test which asserts `ceil` (SURVEY.md §2.5 W2 documents
    * the divergence; the goldens encode `floor(...)+1`).
    *
    * The result is small (one row per stay) and is broadcast everywhere it is
    * joined — never shuffled.
    */
  def stayIndex(icustays: DataFrame, timestepSeconds: Long): DataFrame =
    icustays.select(
        col("stay_id").cast("long").as("stay_id"),
        epochSeconds(col("intime")).as("intime"),
        epochSeconds(col("outtime")).as("outtime"))
      .withColumn("total_windows",
        floor((col("outtime") - col("intime")) / lit(timestepSeconds)).cast("long"))

  /** Interval → point expansion for interval-typed sources (inputevents,
    * procedureevents). One mark per spanned window:
    * `sequence(start, end, step)` yields `floor((end-start)/step)+1` marks,
    * element-for-element identical to the reference's
    * `range(start, end+step, step)` (`__init__.py:319-327,435-443`;
    * equivalence proven in SURVEY.md §2.7). The value is split evenly across
    * the marks so totals are conserved (`__init__.py:329-332`).
    *
    * Marks deliberately start at the raw `starttime`, NOT aligned to the
    * stay's window grid — after bucketize's floor-divide two adjacent marks
    * can land in one window (then summed) or skip one. That is the reference
    * behavior the conservation tests encode; do not "fix" it.
    *
    * Input columns: `start_epoch_time`, `end_epoch_time`, `value`.
    * Output: adds `event_epoch_time`, divides `value`; drops the interval
    * columns. Rows with `end < start` or null bounds are dropped (the
    * reference would raise inside the worker; real MIMIC has `end >= start`).
    */
  def intervalExpand(df: DataFrame, timestepSeconds: Long): DataFrame =
    df.where(col("start_epoch_time").isNotNull && col("end_epoch_time").isNotNull &&
        col("end_epoch_time") >= col("start_epoch_time"))
      .withColumn("marks",
        sequence(col("start_epoch_time"), col("end_epoch_time"), lit(timestepSeconds)))
      .withColumn("value", col("value") / size(col("marks")))
      .withColumn("event_epoch_time", explode(col("marks")))
      .drop("marks", "start_epoch_time", "end_epoch_time")

  /** Assign each event to its stay-relative tumbling window:
    * `tidx = floor((event_epoch_time - intime) / timestep)`, clamped below to
    * window 0 (events before `intime`, `__init__.py:160-162`) and dropped
    * above `total_windows` (events after `outtime`, `__init__.py:164-165`).
    *
    * The stay index is broadcast (it is the small dimension side); a stay
    * missing from `icustays` is dropped by the inner join — the reference
    * raises `KeyError` there (`__init__.py:151-152`), so no silent semantic
    * widening either way.
    *
    * Input: `(stay_id, event_epoch_time, feature_id, value)`.
    * Output: `(stay_id, feature_id, tidx, value, total_windows)`.
    */
  def bucketize(events: DataFrame, stayIdx: DataFrame, timestepSeconds: Long): DataFrame =
    events
      .join(broadcast(stayIdx.select("stay_id", "intime", "total_windows")),
        Seq("stay_id"), "inner")
      .withColumn("tidx",
        greatest(
          floor((col("event_epoch_time") - col("intime")) / lit(timestepSeconds)).cast("long"),
          lit(0L)))
      .where(col("tidx") <= col("total_windows"))
      .select("stay_id", "feature_id", "tidx", "value", "total_windows")

  /** Per-(stay, feature, window) combine — the reference's three-level
    * groupby-apply pyramid (`__init__.py:213-214,170-173,119-123`) dissolved
    * into ONE multi-key hash aggregation = one shuffle with map-side partial
    * aggregation. `avg`/`sum` ignore nulls exactly like pandas skipna
    * (SURVEY.md §2.4 A3).
    */
  def combine(bucketized: DataFrame, combiner: graft.model.Combiner): DataFrame =
    bucketized
      .groupBy("stay_id", "feature_id", "tidx")
      .agg(combiner.agg(col("value")).as("value"),
        first("total_windows").as("total_windows"))

  /** Densify the time axis: for every observed (stay, feature) pair emit one
    * row per `tidx ∈ 0..total_windows`, filling gaps with 0.0 — optionally
    * forward-filling first (leading gaps still 0.0). Reference
    * `reindex(0..tidx_max)` + `fillna` (`__init__.py:124-136`).
    *
    * Shuffle-frugal formulation: instead of generating a dense spine and
    * left-joining (two extra shuffles), aggregate observed cells into a
    * per-(stay, feature) map and posexplode a dense `0..total_windows`
    * lookup over it — a single hash aggregation whose output is already
    * partitioned by (stay_id, feature_id), so the subsequent forward-fill
    * window sort needs no extra exchange. Per-group state is bounded by
    * windows-per-stay (days/step — small), so executor memory is safe at any
    * row scale.
    *
    * Input/output: long form `(stay_id, feature_id, tidx, value)`.
    */
  def densify(combined: DataFrame, ffill: Boolean): DataFrame =
    densify(combined, if (ffill) ForwardFill else ZeroFill)

  sealed trait FillMode
  /** Gaps → 0.0 (the reference default, `__init__.py:132-136`). */
  case object ZeroFill extends FillMode
  /** Carry last observation forward; leading gaps → 0.0 (`--ffill`). */
  case object ForwardFill extends FillMode
  /** Linear interpolation between observations (beyond-reference): interior
    * gaps get `prev + (next-prev)·(t-pt)/(nt-pt)`; leading gaps → 0.0,
    * trailing gaps carry the last observation (pandas-interpolate shape).
    */
  case object LinearInterp extends FillMode

  def densify(combined: DataFrame, mode: FillMode): DataFrame = {
    val packed = combined
      .groupBy("stay_id", "feature_id")
      .agg(
        // struct-collect (not map_from_arrays of two collect_lists): a
        // window whose combined value is null (e.g. mean of all-null) must
        // stay a present-key/null-value entry, and collect_list on a bare
        // column would drop it.
        map_from_entries(collect_list(struct(col("tidx"), col("value")))).as("cells"),
        first("total_windows").as("total_windows"))
    val dense = packed
      .select(col("stay_id"), col("feature_id"),
        posexplode(transform(
          sequence(lit(0L), col("total_windows")),
          t => element_at(col("cells"), t))))
      .withColumnRenamed("pos", "tidx")
      .withColumn("tidx", col("tidx").cast("long"))
    // all window frames sort within the (stay, feature) partitioning the
    // groupBy above already produced — no extra exchange
    val wPrev = Window.partitionBy("stay_id", "feature_id").orderBy("tidx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("stay_id", "feature_id").orderBy("tidx")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = mode match {
      case ZeroFill => dense.withColumn("out", coalesce(col("col"), lit(0.0)))
      case ForwardFill => dense.withColumn("out",
        coalesce(last(col("col"), ignoreNulls = true).over(wPrev), lit(0.0)))
      case LinearInterp =>
        dense
          .withColumn("pv", last(col("col"), ignoreNulls = true).over(wPrev))
          .withColumn("pt", last(when(col("col").isNotNull, col("tidx")),
            ignoreNulls = true).over(wPrev))
          .withColumn("nv", first(col("col"), ignoreNulls = true).over(wNext))
          .withColumn("nt", first(when(col("col").isNotNull, col("tidx")),
            ignoreNulls = true).over(wNext))
          .withColumn("out",
            when(col("col").isNotNull, col("col"))
              .when(col("pv").isNull, lit(0.0)) // leading gap
              .when(col("nv").isNull, col("pv")) // trailing gap
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                (col("tidx") - col("pt")).cast("double") /
                (col("nt") - col("pt")).cast("double")))
    }
    filled.select(col("stay_id"), col("feature_id"), col("tidx"),
      col("out").as("value"))
  }

  /** Membership filter with the reference's ½-selectivity rewrite
    * (`__init__.py:180-193`, disabled there — enabled and pushed down here):
    * small keep-lists become `isin` (pushed to the scan); keep-lists covering
    * more than half the universe become a NOT-isin over the complement.
    * For very large lists callers should pass a DataFrame and use a
    * `left_semi` join instead (see [[semiFilter]]).
    *
    * The complement rewrite is only equivalent to `isin(keep)` when the
    * column's values all lie inside `universe` (dimension integrity — true
    * for MIMIC itemids vs d_items); out-of-universe keys would pass the
    * NOT-isin branch. Nulls are dropped by BOTH branches (a null key is in
    * no keep-list), so the two branches agree for in-universe data.
    */
  def membershipFilter(df: DataFrame, column: String, keep: Seq[Long],
      universe: Option[Seq[Long]]): DataFrame = {
    universe match {
      case Some(u) if keep.size > u.size / 2 =>
        val complement = u.toSet -- keep.toSet
        if (complement.isEmpty) df.where(col(column).isNotNull)
        else df.where(col(column).isNotNull &&
          !col(column).isin(complement.toSeq: _*))
      case _ => df.where(col(column).isin(keep: _*))
    }
  }

  /** Large-list membership as a broadcast left-semi join (SURVEY.md §2.3 J2). */
  def semiFilter(df: DataFrame, column: String, keys: DataFrame): DataFrame =
    df.join(broadcast(keys), Seq(column), "left_semi")
}
