package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Multimodal

/** One banded arrival: an audio clip's presence in one 16-bit frame band. */
final case class AudioArrival(bkey: String, media_id: Long,
    event_time: Timestamp, fp: Long)

/** Per-(band, chunk) state: clips currently inside the horizon. */
final case class BucketClips(clips: List[(Long, Long, Long)])

/** A streaming audio near-dup hit (media_a < media_b). */
final case class AudioDupHit(media_a: Long, media_b: Long, hamming: Int)

/** Streaming audio near-dup detection: the live counterpart of
  * [[graft.ops.Multimodal.whtFpPairs]] — arriving clips are checked
  * against everything seen inside a time horizon, emitting WHT-verified
  * re-encode/volume-rescale duplicates as they happen (the ingestion
  * path: drop perceptual audio dups BEFORE storage).
  *
  * Shape mirrors [[StreamingVisualDedup]]: the fingerprint is computed
  * STATELESSLY per row from the identical decode
  * ([[Multimodal.decodePcm16le]]) and butterfly
  * ([[Multimodal.whtFrameSig]]) cores as batch — a StreamingSpec pins the
  * stream/batch fingerprint parity bit-for-bit. Each clip fans out to its
  * 4 16-bit frame bands; per-(band, chunk) state holds the horizon's
  * clips; a pair at hamming <= 3 shares an untouched band (pigeonhole),
  * so the banded stream provably sees every pair the batch screen would.
  * Multi-band hits collapse downstream via dropDuplicates, as in every
  * banded tracker here. State is (media_id, seconds, fp) per live bucket
  * — 24 bytes per clip per band, horizon-bounded; event-time timeout is
  * watermark-clamped; undecodable payloads drop before banding exactly
  * as batch (fail-closed).
  */
object StreamingAudioDedup {

  /** Verified hits for a streaming (media_id, event_time, payload) frame. */
  def hits(media: DataFrame, maxDist: Int, horizonSeconds: Long,
      watermarkDelay: String): Dataset[AudioDupHit] = {
    require(maxDist <= 3,
      "4x16-bit banding guarantees recall only for maxDist <= 3 (pigeonhole)")
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media
      .select(col("media_id").cast("long"), col("event_time"), col("payload"))
      .as[(Long, Timestamp, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, et, payload) =>
        Multimodal.decodePcm16le(payload, 256).map { samples =>
          val sigs = (0 until 4).map(f =>
            Multimodal.whtFrameSig(samples.slice(f * 64, f * 64 + 64)))
          val fp = sigs.zipWithIndex.map { case (s, f) => s << (16 * f) }.sum
          (id, et, fp)
        }
      })
      .toDF("media_id", "event_time", "fp")
    val banded = hashed
      .select(col("media_id"), col("event_time"), col("fp"),
        posexplode(array((0 until 4).map(t =>
          pmod(shiftright(col("fp"), t * 16), lit(65536L))): _*))
          .as(Seq("band", "chunk")))
      .select(concat_ws(":", col("band"), col("chunk")).as("bkey"),
        col("media_id"), col("event_time"), col("fp"))
      .as[AudioArrival]
    banded
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.bkey)
      .flatMapGroupsWithState[BucketClips, AudioDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, batch: Iterator[AudioArrival], state: GroupState[BucketClips]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = batch.toSeq
              .sortBy(a => (a.event_time.getTime, a.media_id))
            val latest = arrivals.map(_.event_time.getTime / 1000).max
            val floor = latest - horizonSeconds
            var clips = state.getOption.map(_.clips).getOrElse(Nil)
              .filter(_._2 >= floor)
            val out = Seq.newBuilder[AudioDupHit]
            arrivals.foreach { a =>
              clips.foreach { case (oid, _, ofp) =>
                if (oid != a.media_id) {
                  val ham = java.lang.Long.bitCount(ofp ^ a.fp)
                  if (ham <= maxDist)
                    out += AudioDupHit(math.min(a.media_id, oid),
                      math.max(a.media_id, oid), ham)
                }
              }
              clips = (a.media_id, a.event_time.getTime / 1000, a.fp) :: clips
            }
            state.update(BucketClips(clips))
            state.setTimeoutTimestamp(math.max((latest + horizonSeconds) * 1000,
              state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }
  }
}
