package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, posexplode, split}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One segment occurrence flowing through the tracker. */
final case class SegOcc(doc_id: Long, pos: Int,
    event_time: java.sql.Timestamp, seg: String)

/** Per-segment state: epoch seconds of the last sighting. */
final case class SegSeen(lastSeen: Long)

/** A surviving (canonical) segment occurrence. */
final case class SegKeep(doc_id: Long, pos: Int, seg: String)

/** Streaming CROSS-document segment dedup — the live counterpart of
  * [[graft.ops.Dedup.segmentDedup]]: as documents arrive, each line (or
  * paragraph, via `sep`) survives only at its FIRST-SEEN occurrence;
  * every later sighting — in the same micro-batch (earliest event time,
  * then doc_id, then position wins) or any later one inside the horizon —
  * is dropped. The batch operator's canonical is the global
  * (min doc_id, pos); a stream cannot know the future, so first-seen-wins
  * is the streaming semantics (identical when ids arrive in order, which
  * the parity spec pins), exactly the [[StreamingDedup]] relationship to
  * exact-dup groups.
  *
  * State is per DISTINCT segment (one timestamp), never a document
  * buffer, and bounded by `horizonSeconds` past the last sighting
  * (event-time timeout, watermark-clamped like every tracker here): a
  * boilerplate line that keeps arriving never expires; one that stops
  * is forgotten and would re-admit after the horizon — the standard
  * bounded-state trade. Stitching survivors back into documents is a
  * per-micro-batch groupBy in the sink (a document's segments arrive in
  * one row, hence one batch), or the consumer's job when it only needs
  * the kept-segment stream.
  */
object StreamingSegmentDedup {

  /** `docs` needs (doc_id: long, event_time: timestamp, text: string). */
  def keptSegments(docs: DataFrame, sep: String, horizonSeconds: Long,
      watermarkDelay: String): Dataset[SegKeep] = {
    require(sep.nonEmpty, "sep must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long").as("doc_id"), col("event_time"),
        posexplode(split(col("text"),
          java.util.regex.Pattern.quote(sep), -1)).as(Seq("pos", "seg")))
      .select("doc_id", "pos", "event_time", "seg").as[SegOcc]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.seg)
      .flatMapGroupsWithState[SegSeen, SegKeep](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (seg: String, batch: Iterator[SegOcc], state: GroupState[SegSeen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val occs = batch.toSeq
            val latest = occs.map(_.event_time.getTime / 1000).max
            val out =
              if (state.exists) Iterator.empty
              else {
                val first = occs.minBy(o =>
                  (o.event_time.getTime, o.doc_id, o.pos))
                Iterator.single(SegKeep(first.doc_id, first.pos, seg))
              }
            val seen = SegSeen(math.max(state.getOption.map(_.lastSeen)
              .getOrElse(Long.MinValue), latest))
            state.update(seen)
            // clamp just past the watermark (a lagging key must not throw)
            state.setTimeoutTimestamp(math.max(
              (seen.lastSeen + horizonSeconds) * 1000,
              state.getCurrentWatermarkMs + 1))
            out
          }
      }
  }
}
