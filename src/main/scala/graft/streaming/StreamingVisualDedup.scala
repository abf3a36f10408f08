package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Multimodal

/** One banded arrival: an image's presence in one 16-bit aHash band. */
final case class VisualArrival(bkey: String, media_id: Long,
    event_time: Timestamp, ahash: Long, dhash: Long)

/** Per-(band, chunk) state: images currently inside the horizon. */
final case class BucketImages(imgs: List[(Long, Long, Long, Long)])

/** A streaming perceptual near-dup hit (media_a < media_b). */
final case class VisualDupHit(media_a: Long, media_b: Long,
    hamming: Int, dhash_match: Boolean)

/** Streaming perceptual image near-dup detection: the live counterpart of
  * [[graft.ops.Multimodal.perceptualPairs]] — arriving images are checked
  * against everything seen inside a time horizon, emitting
  * hamming-verified re-encode/resize duplicates as they happen (the crawl
  * ingestion path: drop perceptual dups BEFORE they reach storage).
  *
  * Shape mirrors [[StreamingNearDup]]: the aHash/dHash are computed
  * STATELESSLY per row (`mapPartitions` decode — the identical
  * [[Multimodal.hashImage]] core as batch, so stream and batch hash
  * identically bit-for-bit), then each image fans out to its 4 16-bit
  * aHash bands and per-(band, chunk) state holds the horizon's images.
  * The pigeonhole argument carries over: a pair at hamming <= 3 shares at
  * least one untouched band, so the banded stream provably sees every
  * pair the batch all-pairs screen would. A pair sharing several bands
  * emits once PER band — downstream `dropDuplicates(media_a, media_b)`
  * collapses multi-band hits (the batch path's dropDuplicates moved
  * downstream, as in the text tracker).
  *
  * State: one (media_id, seconds, ahash, dhash) list per LIVE bucket —
  * 32 bytes per image per band, horizon-bounded; event-time timeout
  * evicts idle buckets (watermark-clamped like every tracker here), and
  * arrivals prune in-bucket images older than the horizon. Quarantined
  * payloads (undecodable) drop out before banding, exactly as batch.
  */
object StreamingVisualDedup {

  /** Verified hits for a streaming (media_id, event_time, payload) frame.
    */
  def hits(media: DataFrame, maxDist: Int, horizonSeconds: Long,
      watermarkDelay: String): Dataset[VisualDupHit] = {
    require(maxDist <= 3,
      "4x16-bit banding guarantees recall only for maxDist <= 3 (pigeonhole)")
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media
      .select(col("media_id").cast("long"), col("event_time"), col("payload"))
      .as[(Long, Timestamp, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, et, payload) =>
        Multimodal.hashImage(payload).map { case (_, _, a, d) => (id, et, a, d) }
      })
      .toDF("media_id", "event_time", "ahash", "dhash")
    val banded = hashed
      .select(col("media_id"), col("event_time"), col("ahash"), col("dhash"),
        posexplode(array((0 until 4).map(t =>
          pmod(shiftright(col("ahash"), t * 16), lit(65536L))): _*))
          .as(Seq("band", "chunk")))
      .select(concat_ws(":", col("band"), col("chunk")).as("bkey"),
        col("media_id"), col("event_time"), col("ahash"), col("dhash"))
      .as[VisualArrival]
    banded
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.bkey)
      .flatMapGroupsWithState[BucketImages, VisualDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, batch: Iterator[VisualArrival], state: GroupState[BucketImages]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = batch.toSeq
              .sortBy(a => (a.event_time.getTime, a.media_id))
            val latest = arrivals.map(_.event_time.getTime / 1000).max
            val floor = latest - horizonSeconds
            var imgs = state.getOption.map(_.imgs).getOrElse(Nil)
              .filter(_._2 >= floor)
            val out = Seq.newBuilder[VisualDupHit]
            arrivals.foreach { a =>
              imgs.foreach { case (oid, _, oa, od) =>
                if (oid != a.media_id) {
                  val ham = java.lang.Long.bitCount(oa ^ a.ahash)
                  if (ham <= maxDist)
                    out += VisualDupHit(math.min(a.media_id, oid),
                      math.max(a.media_id, oid), ham, od == a.dhash)
                }
              }
              imgs = (a.media_id, a.event_time.getTime / 1000,
                a.ahash, a.dhash) :: imgs
            }
            state.update(BucketImages(imgs))
            // clamp to just past the watermark: a key lagging the watermark
            // by > horizon would otherwise throw and kill the query
            state.setTimeoutTimestamp(math.max((latest + horizonSeconds) * 1000,
              state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }
  }
}
