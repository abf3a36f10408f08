package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One chunk occurrence flowing through the tracker. */
final case class ChunkOcc(doc_id: Long, chunk_idx: Int,
    event_time: java.sql.Timestamp, chunk_fp: String, chunk: String)

/** Per-fingerprint state: epoch seconds of the last sighting. */
final case class ChunkFpSeen(lastSeen: Long)

/** A chunk payload the store has not seen before (within the horizon). */
final case class ChunkNew(chunk_fp: String, chunk: String, doc_id: Long,
    chunk_idx: Int)

/** Streaming content-defined chunk dedup — the LIVE ingest half of
  * [[graft.io.ChunkStore]] (the X150/X165b/X173 relationship to its
  * batch operator): documents arrive, chunk STATELESSLY through the
  * identical [[graft.ops.Dedup.contentChunks]] Column algebra (pure
  * projection + explode — it composes with a streaming frame
  * unchanged), and each DISTINCT chunk payload is emitted exactly once
  * at its first sighting — the stream a live store ingests as its
  * payload appends, while the full per-occurrence manifest stream is
  * the tracker's stateless input side. First-seen-wins within a batch
  * breaks ties on (event time, doc, position), matching the other
  * trackers.
  *
  * State is ONE timestamp per distinct fingerprint (never a payload
  * buffer — the payload rides the emitted row), horizon-bounded with
  * the watermark-clamped event-time timeout every tracker here uses:
  * a chunk that keeps re-arriving never expires; one that stops is
  * forgotten and would re-emit after the horizon — the standard
  * bounded-state trade, and exactly the batch `append`'s anti-join
  * semantics while the fingerprint stays in state.
  */
object StreamingChunkDedup {

  /** `docs` needs (doc_id: long, event_time: timestamp, text: string). */
  def newChunks(docs: DataFrame, horizonSeconds: Long,
      watermarkDelay: String, k: Int = 8,
      mask: Int = 63): Dataset[ChunkNew] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.ops.Dedup.contentChunks(docs, "doc_id", "text", k, mask,
        keep = Seq("event_time"))
      .select(col("doc_id").cast("long").as("doc_id"), col("chunk_idx"),
        col("event_time"), col("chunk_fp"), col("chunk")).as[ChunkOcc]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.chunk_fp)
      .flatMapGroupsWithState[ChunkFpSeen, ChunkNew](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (fp: String, batch: Iterator[ChunkOcc],
            state: GroupState[ChunkFpSeen]) =>
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
                  (o.event_time.getTime, o.doc_id, o.chunk_idx))
                Iterator.single(
                  ChunkNew(fp, first.chunk, first.doc_id, first.chunk_idx))
              }
            val seen = ChunkFpSeen(math.max(state.getOption.map(_.lastSeen)
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
