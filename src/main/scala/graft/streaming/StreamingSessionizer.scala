package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event for the stateful sessionizer. */
final case class SessionEvent(user_id: Long, event_time: java.sql.Timestamp, value: Double)

/** Open-session state kept per user between microbatches. */
final case class SessionState(start: Long, last: Long, n: Long, sum: Double)

/** A closed session. */
final case class SessionOut(user_id: Long, session_start: Long,
    session_end: Long, n_events: Long, value_sum: Double)

/** Custom-state streaming operator: inactivity-gap sessionization via
  * `flatMapGroupsWithState` (the engine's showcase of arbitrary keyed state
  * beyond windowed aggregation — SURVEY.md §7.5). A session closes when the
  * gap between consecutive events exceeds `gapSeconds`; in-flight sessions
  * close via event-time timeout once the watermark passes `last + gap`, so
  * state is bounded and emission is append-safe.
  *
  * Batch parity: on fully-delivered data the emitted sessions equal the
  * batch lag/cumsum sessionization (q_ts_sessionize counts them), checked
  * in StreamingSpec.
  */
object StreamingSessionizer {

  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
      watermarkDelay: String): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val gap = gapSeconds
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = state.getOption

          if (state.hasTimedOut) {
            // watermark passed last+gap: the open session can never extend
            cur.foreach(s => out += SessionOut(userId, s.start, s.last, s.n, s.sum))
            state.remove()
          } else {
            // microbatch events arrive unordered — sessionize in time order
            val evs = batch.toSeq.sortBy(e => (e.event_time.getTime, e.value))
            evs.foreach { e =>
              val t = e.event_time.getTime / 1000
              cur = cur match {
                case Some(s) if t - s.last <= gap =>
                  Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
                case Some(s) => // gap exceeded: close and start fresh
                  out += SessionOut(userId, s.start, s.last, s.n, s.sum)
                  Some(SessionState(t, t, 1, e.value))
                case None =>
                  Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close via timeout when the watermark passes last + gap
              // clamp to just past the watermark: a key lagging the watermark
              // by > horizon would otherwise throw and kill the query
              state.setTimeoutTimestamp(math.max((s.last + gap) * 1000,
                state.getCurrentWatermarkMs + 1))
            }
          }
          out.iterator
      }
  }
}
