package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A typed event entering the change-point compressor. */
final case class TypedEvent(user_id: Long, event_type: String,
    event_time: java.sql.Timestamp, value: Double)

/** Compressor state per (user, type) stream: the last value seen and its
  * epoch-second timestamp (for the GC horizon).
  */
final case class LastValue(last: Double, lastSeen: Long)

/** An emitted change point. */
final case class ChangePoint(user_id: Long, event_type: String,
    ts_epoch: Long, value: Double)

/** Streaming change-point compression: per (user, type) stream, emit only
  * events whose value DIFFERS from the previous one — the streaming
  * counterpart of the batch consecutive-dedup gate (q_ts_dedup_consecutive),
  * as O(1) keyed state (`flatMapGroupsWithState`) instead of a lag window.
  * The shrink-hold-steady-telemetry op, applied at ingest so the raw stream
  * never lands.
  *
  * Parity contract: with in-order arrival per stream (enforce upstream with
  * the watermark; the spec feeds ordered batches), the emitted set equals
  * the batch lag-filter bit-for-bit — within a micro-batch rows compare
  * consecutively in (event_time, value) order, across batches the head row
  * compares against the remembered last value. Late rows older than the
  * stream's last-seen timestamp would break the "previous row" meaning; they
  * are compared as-arrived (the same contract every keyed-state op here
  * carries — the watermark bounds how late that can be).
  *
  * State is ONE (double, long) per live (user, type) stream, GC'd after
  * `horizonSeconds` of silence (event-time timeout) — an idle stream costs
  * nothing forever; its next event after expiry re-emits unconditionally
  * (same re-admit trade as [[StreamingDedup]]'s horizon).
  */
object StreamingChangePoints {

  /** `events` needs (user_id: long, event_type: string,
    * event_time: timestamp, value: double).
    */
  def compress(events: DataFrame, horizonSeconds: Long,
      watermarkDelay: String): Dataset[ChangePoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select("user_id", "event_type", "event_time", "value").as[TypedEvent]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LastValue, ChangePoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((uid, et), batch, state: GroupState[LastValue]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // in-batch order: event time (unique per stream by contract;
            // value tiebreak keeps the fold total anyway)
            val rows = batch.toSeq.sortBy(e => (e.event_time.getTime, e.value))
            val out = Seq.newBuilder[ChangePoint]
            var last = state.getOption.map(_.last)
            var lastSeen = state.getOption.map(_.lastSeen).getOrElse(Long.MinValue)
            rows.foreach { e =>
              val epoch = e.event_time.getTime / 1000
              if (!last.contains(e.value))
                out += ChangePoint(uid, et, epoch, e.value)
              last = Some(e.value)
              lastSeen = math.max(lastSeen, epoch)
            }
            if (rows.nonEmpty) {
              state.update(LastValue(last.get, lastSeen))
              // clamp to just past the watermark: a key lagging the watermark
              // by > horizon would otherwise throw and kill the query
              state.setTimeoutTimestamp(math.max((lastSeen + horizonSeconds) * 1000,
                state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }
  }
}
