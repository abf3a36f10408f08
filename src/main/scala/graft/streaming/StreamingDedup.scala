package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextOps

/** A document entering the streaming dedup, with its engine-computed
  * fingerprint attached (same [[TextOps.fingerprint]] column as the batch
  * path — md5 of the normalized text — so stream and batch agree on what
  * is a duplicate).
  */
final case class FpDoc(doc_id: Long, event_time: java.sql.Timestamp,
    fp: String)

/** Dedup state per fingerprint: epoch seconds of the last sighting. */
final case class FpSeen(lastSeen: Long)

/** A first-seen (kept) document. */
final case class DedupKeep(doc_id: Long, fp: String, first_seen: Long)

/** Streaming exact deduplication for a document ingest pipeline: the FIRST
  * document of each fingerprint (earliest event time, doc_id tiebreak)
  * passes through; later sightings are dropped — the streaming counterpart
  * of [[graft.ops.Dedup.exactGroups]]'s keep-min semantics, as keyed state
  * (`flatMapGroupsWithState`) rather than a shuffle-wide groupBy.
  *
  * State is BOUNDED by `horizonSeconds`: a fingerprint is remembered for
  * that long past its last sighting (event-time timeout), then forgotten —
  * a duplicate arriving after the horizon is re-emitted. Exact forever-dedup
  * would need unbounded state by definition; the horizon is the standard
  * trade (set it to the stream's realistic duplicate window). Each sighting
  * EXTENDS the horizon (lastSeen refreshes), so a hot duplicate never
  * expires while it keeps arriving.
  */
object StreamingDedup {

  /** `docs` needs (doc_id: long, event_time: timestamp, text: string). */
  def firstSeen(docs: DataFrame, horizonSeconds: Long,
      watermarkDelay: String): Dataset[DedupKeep] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .select("doc_id", "event_time", "fp").as[FpDoc]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.fp)
      .flatMapGroupsWithState[FpSeen, DedupKeep](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (fp: String, batch: Iterator[FpDoc], state: GroupState[FpSeen]) =>
          if (state.hasTimedOut) {
            // horizon passed with no new sighting: forget the fingerprint
            state.remove()
            Iterator.empty
          } else {
            val docs = batch.toSeq
            val latest = docs.map(_.event_time.getTime / 1000).max
            val out =
              if (state.exists) Iterator.empty
              else {
                val first = docs.minBy(d => (d.event_time.getTime, d.doc_id))
                Iterator.single(DedupKeep(first.doc_id, fp,
                  first.event_time.getTime / 1000))
              }
            val seen = FpSeen(math.max(state.getOption.map(_.lastSeen)
              .getOrElse(Long.MinValue), latest))
            state.update(seen)
            // clamp to just past the watermark: a key lagging the watermark
            // by > horizon would otherwise throw and kill the query
            state.setTimeoutTimestamp(math.max((seen.lastSeen + horizonSeconds) * 1000,
              state.getCurrentWatermarkMs + 1))
            out
          }
      }
  }
}
