package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Stages
import graft.model.{MeanCombine, SumCombine}

/** Property-style invariants over seeded random stays/events (the reference's
  * own test strategy, SURVEY.md §5): conservation for sum sources across the
  * explode/split/bucket/densify chain, grid width, and clamp bounds.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  private val rng = new Random(42)
  private val step = 3600L

  // 20 random stays: intime in 2020, duration 1..72 h (some exact multiples)
  private val stays = (1L to 20L).map { id =>
    val intime = 1577836800L + rng.nextInt(10000000).toLong
    val dur = if (id % 5 == 0) step * (1 + rng.nextInt(72)) // exact multiple
    else 600L + rng.nextInt(72 * 3600).toLong
    (id, intime, intime + dur)
  }
  private lazy val stayIdx = stays.toDF("stay_id", "intime", "outtime")
    .withColumn("total_windows",
      floor((col("outtime") - col("intime")) / lit(step)).cast("long"))

  // 2000 random interval events fully inside their stay
  private val intervalEvents = (1 to 2000).map { i =>
    val (sid, in, out) = stays(rng.nextInt(stays.length))
    val maxOff = math.max(1L, out - in - 1)
    val start = in + (rng.nextLong().abs % maxOff)
    val end = math.min(out - 1, start + (rng.nextLong().abs % (6 * step)))
    (sid, 100L + rng.nextInt(5), start, math.max(start, end),
      1.0 + rng.nextInt(1000) / 10.0)
  }

  test("conservation: interval explode + split + bucket + densify keeps totals") {
    val iv = intervalEvents
      .toDF("stay_id", "feature_id", "start_epoch_time", "end_epoch_time", "value")
    val expanded = Stages.intervalExpand(iv, step)
    val b = Stages.bucketize(expanded, stayIdx, step)
    val dense = Stages.densify(Stages.combine(b, SumCombine), ffill = false)
    val got = dense.agg(sum("value")).head().getDouble(0)
    val expected = intervalEvents.map(_._5).sum
    assert(math.abs(got - expected) / expected < 1e-9,
      s"total $got != $expected")
  }

  test("width invariant: every (stay, feature) series has total_windows+1 rows") {
    val iv = intervalEvents
      .toDF("stay_id", "feature_id", "start_epoch_time", "end_epoch_time", "value")
    val dense = Stages.densify(
      Stages.combine(Stages.bucketize(Stages.intervalExpand(iv, step), stayIdx, step),
        SumCombine), ffill = true)
    val widths = dense.groupBy("stay_id", "feature_id").count()
      .join(stayIdx.select("stay_id", "total_windows"), "stay_id")
      .where(col("count") =!= col("total_windows") + 1)
    assert(widths.count() == 0)
  }

  test("clamp bounds: tidx always within [0, total_windows], incl. stragglers") {
    // point events, 10% deliberately outside the stay bounds
    val pts = (1 to 1000).map { i =>
      val (sid, in, out) = stays(rng.nextInt(stays.length))
      val t =
        if (i % 10 == 0) in - 1 - rng.nextInt(100000) // before intime
        else if (i % 10 == 1) out + 1 + rng.nextInt(100000) // after outtime
        else in + (rng.nextLong().abs % math.max(1L, out - in))
      (sid, 7L, t, 1.0)
    }.toDF("stay_id", "feature_id", "event_epoch_time", "value")
    val b = Stages.bucketize(pts, stayIdx, step)
    assert(b.where(col("tidx") < 0).count() == 0)
    assert(b.where(col("tidx") > col("total_windows")).count() == 0)
    // pre-intime events land in window 0 (clamped, not dropped)
    val n = b.count()
    assert(n >= 900) // only post-outtime events may be dropped
  }

  test("mean combine matches direct per-window average on random data") {
    val pts = (1 to 1000).map { _ =>
      val (sid, in, out) = stays(rng.nextInt(stays.length))
      val t = in + (rng.nextLong().abs % math.max(1L, out - in))
      (sid, 5L + rng.nextInt(3), t, rng.nextDouble() * 100)
    }
    val df = pts.toDF("stay_id", "feature_id", "event_epoch_time", "value")
    val combined = Stages.combine(Stages.bucketize(df, stayIdx, step), MeanCombine)
      .select("stay_id", "feature_id", "tidx", "value").as[(Long, Long, Long, Double)]
      .collect().map { case (s, f, t, v) => (s, f, t) -> v }.toMap
    // oracle computed in plain Scala
    val byStay = stays.map(s => s._1 -> s).toMap
    val oracle = pts
      .map { case (sid, fid, t, v) =>
        val (_, in, out) = byStay(sid)
        ((sid, fid, math.max(0L, (t - in) / step)), v)
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum / vs.size }
    oracle.foreach { case (k, v) =>
      assert(combined.contains(k) && math.abs(combined(k) - v) < 1e-9,
        s"mismatch at $k")
    }
  }
}
