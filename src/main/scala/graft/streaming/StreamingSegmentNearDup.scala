package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{Dedup, TextOps}

/** One banded arrival: a distinct segment's presence in one 16-bit
  * SimHash band.
  */
final case class SegBandArrival(bkey: String, fp: String,
    event_time: Timestamp, sig: Long)

/** Per-(band, chunk) state: distinct segments inside the horizon —
  * (fp, lastSeen seconds, sig), one entry per DISTINCT segment.
  */
final case class BucketSegs(segs: List[(String, Long, Long)])

/** A streaming segment near-dup hit (fp_a < fp_b lexicographically —
  * the batch operator's pair order).
  */
final case class SegNearHit(fp_a: String, fp_b: String, hamming: Int)

/** Streaming cross-doc NEAR-dup segment detection: the live counterpart
  * of [[graft.ops.Dedup.segmentNearDup]] (the X146→X150 batch→stream
  * relationship) — as documents arrive, each normalized segment is
  * SimHashed STATELESSLY with the shared scalar core
  * ([[graft.ops.Dedup.simhashOf]], bit-identical to the batch
  * aggregator), fanned out to its 4 16-bit bands, and checked against
  * the horizon's distinct segments in per-(band, chunk) state. The
  * pigeonhole recall argument carries over: a pair at hamming ≤ 3
  * shares an untouched band, so the banded stream sees every pair the
  * batch screen would (within the horizon). A pair sharing several
  * bands emits once per band — `dropDuplicates(fp_a, fp_b)` downstream,
  * exactly the batch path's dropDuplicates moved past the tracker.
  *
  * State is per DISTINCT segment (identical repeats refresh the
  * timestamp, never grow the bucket), horizon-bounded, with
  * watermark-clamped event-time eviction like every tracker here. The
  * templated-boilerplate cardinality argument from the batch operator is
  * what bounds the bucket: state scales with live template diversity,
  * not corpus throughput.
  */
object StreamingSegmentNearDup {

  /** Hits for a streaming (doc_id, event_time, text) frame. */
  def hits(docs: DataFrame, sep: String, maxDist: Int,
      minTokens: Int, horizonSeconds: Long,
      watermarkDelay: String): Dataset[SegNearHit] = {
    require(maxDist <= 3,
      "4x16-bit banding guarantees recall only for maxDist <= 3 (pigeonhole)")
    require(minTokens >= 1, "minTokens must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val segs = docs
      .select(col("event_time"),
        explode(split(col("text"),
          java.util.regex.Pattern.quote(sep), -1)).as("seg0"))
      .select(col("event_time"), TextOps.normalize(col("seg0")).as("seg"))
      .where(size(split(col("seg"), " ")) >= minTokens)
      .select(col("event_time"), col("seg"), md5(col("seg")).as("fp"))
      .as[(Timestamp, String, String)]
      .map { case (et, seg, fp) =>
        (et, fp, Dedup.simhashOf(seg.split(" ").toSeq))
      }
      .toDF("event_time", "fp", "sig")
    val banded = segs
      .select(col("event_time"), col("fp"), col("sig"),
        posexplode(array((0 until 4).map(t =>
          pmod(shiftright(col("sig"), t * 16), lit(65536L))): _*))
          .as(Seq("band", "chunk")))
      .select(concat_ws(":", col("band"), col("chunk")).as("bkey"),
        col("fp"), col("event_time"), col("sig"))
      .as[SegBandArrival]
    banded
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.bkey)
      .flatMapGroupsWithState[BucketSegs, SegNearHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, batch: Iterator[SegBandArrival], state: GroupState[BucketSegs]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = batch.toSeq
              .sortBy(a => (a.event_time.getTime, a.fp))
            val latest = arrivals.map(_.event_time.getTime / 1000).max
            val floor = latest - horizonSeconds
            var segsIn = state.getOption.map(_.segs).getOrElse(Nil)
              .filter(_._2 >= floor)
            val out = Seq.newBuilder[SegNearHit]
            arrivals.foreach { a =>
              val secs = a.event_time.getTime / 1000
              val known = segsIn.exists(_._1 == a.fp)
              if (!known) {
                segsIn.foreach { case (ofp, _, osig) =>
                  val ham = java.lang.Long.bitCount(osig ^ a.sig)
                  if (ham <= maxDist)
                    out += SegNearHit(
                      if (a.fp < ofp) a.fp else ofp,
                      if (a.fp < ofp) ofp else a.fp, ham)
                }
                segsIn = (a.fp, secs, a.sig) :: segsIn
              } else {
                // identical segment repeats refresh the horizon, never
                // grow the bucket or re-emit
                segsIn = segsIn.map { s =>
                  if (s._1 == a.fp) (s._1, math.max(s._2, secs), s._3) else s
                }
              }
            }
            state.update(BucketSegs(segsIn))
            state.setTimeoutTimestamp(math.max(
              (latest + horizonSeconds) * 1000,
              state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }
  }
}
