package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An event entering the funnel tracker. */
final case class FunnelEvent(user_id: Long, event_type: String,
    event_time: java.sql.Timestamp)

/** Tracker state per user: the funnel stage reached (0 = none,
  * 1..stages.length) and the epoch second it was reached.
  */
final case class FunnelState(stage: Int, stageTs: Long)

/** An emitted stage advance. `delay_s` is the exact integer gap to the
  * previous stage entry (0 for the first stage).
  */
final case class StageAdvance(user_id: Long, stage_idx: Int, stage: String,
    ts_epoch: Long, delay_s: Long)

/** Streaming conversion-funnel tracking: the streaming counterpart of the
  * batch q_ts_funnel gate — per-user stage machine as O(1) keyed state,
  * emitting one row per stage ADVANCE as it happens (the batch gate
  * aggregates the same advances after the fact). An event only advances
  * its user when it is the NEXT stage in order and not earlier than the
  * previous stage's entry — identical to the batch min-time-gated
  * semantics on in-order streams (first qualifying arrival IS the min).
  * Events for already-passed or skipped-ahead stages are ignored, exactly
  * like the batch joins drop them.
  *
  * State is ONE (int, long) per user still inside the funnel horizon;
  * event-time timeout drops users idle for `horizonSeconds` (a completed
  * funnel's state also expires that way — re-entry then restarts from
  * stage 0, the same trade as every horizon-bounded tracker here).
  */
object StreamingFunnel {

  val Stages: Seq[String] = Seq("view", "click", "purchase")

  /** `events` needs (user_id: long, event_type: string,
    * event_time: timestamp).
    */
  def track(events: DataFrame, horizonSeconds: Long,
      watermarkDelay: String): Dataset[StageAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select("user_id", "event_type", "event_time").as[FunnelEvent]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageAdvance](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, batch, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = batch.toSeq
              .sortBy(e => (e.event_time.getTime, e.event_type))
            val out = Seq.newBuilder[StageAdvance]
            var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            var lastSeen = Long.MinValue
            rows.foreach { e =>
              val epoch = e.event_time.getTime / 1000
              lastSeen = math.max(lastSeen, epoch)
              val next = st.stage // index into Stages of the awaited stage
              if (next < Stages.length && e.event_type == Stages(next)
                  && (st.stage == 0 || epoch >= st.stageTs)) {
                val delay = if (st.stage == 0) 0L else epoch - st.stageTs
                out += StageAdvance(uid, st.stage + 1, Stages(next), epoch,
                  delay)
                st = FunnelState(st.stage + 1, epoch)
              }
            }
            if (rows.nonEmpty) {
              state.update(st)
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
