package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One side of a battle entering the tracker (a battle event projects
  * into two of these, exactly like the batch op's two-sided explode).
  */
final case class BattleSide(model: Long, event_time: java.sql.Timestamp,
    w: Long, l: Long, t: Long)

/** Tally state per model: four counters FOREVER — the leaderboard is
  * bounded by the MODEL domain (pools are ≤ thousands by the same
  * contract [[graft.ops.Preference.btStrength]] documents), not by the
  * battle volume, so no timeout is needed.
  */
final case class WinState(battles: Long, wins: Long, losses: Long,
    ties: Long)

/** The running leaderboard row for a model after a micro-batch. */
final case class LeaderRow(model: Long, battles: Long, wins: Long,
    losses: Long, ties: Long, win_rate_ppm: Long)

/** Streaming win-rate leaderboard — [[graft.ops.Preference.winMatrix]]
  * as keyed state: battles arrive as a stream (an eval harness or arena
  * emitting comparisons live), each micro-batch folds its per-model
  * sides into four-counter state, and the emitted row carries the same
  * ppm win rate (ties = half a win) the batch op computes. Counter
  * addition is order-free, so stream-vs-batch parity is EXACT after any
  * prefix — the spec pins it against the batch op itself.
  *
  * Malformed outcomes (anything outside {"a","b","tie"}) are dropped
  * before the state fold, identical to the batch filter.
  *
  * NO WATERMARK, deliberately: state is bounded by the model domain (not
  * time), never expires (`NoTimeout`), and counter addition is order-
  * free — so a late battle folds in exactly like an on-time one and the
  * batch-parity contract holds unconditionally. Declaring a watermark
  * here would do nothing except license Spark to DROP late rows before
  * the stateful operator, silently breaking that contract — which is why
  * the earlier `watermarkDelay` knob was removed rather than documented.
  *
  * Output mode Update: one row per model per micro-batch that touched
  * it — the live leaderboard a dashboard sink reads.
  */
object StreamingWinrate {

  /** `battles` needs (model_a: long, model_b: long, outcome: string,
    * event_time: timestamp).
    */
  def track(battles: DataFrame): Dataset[LeaderRow] = {
    val spark = battles.sparkSession
    import spark.implicits._
    battles
      .select("model_a", "model_b", "outcome", "event_time")
      .as[(Long, Long, String, java.sql.Timestamp)]
      .flatMap { case (a, b, o, ts) =>
        o match {
          case "a"   => Seq(BattleSide(a, ts, 1, 0, 0), BattleSide(b, ts, 0, 1, 0))
          case "b"   => Seq(BattleSide(a, ts, 0, 1, 0), BattleSide(b, ts, 1, 0, 0))
          case "tie" => Seq(BattleSide(a, ts, 0, 0, 1), BattleSide(b, ts, 0, 0, 1))
          case _     => Seq.empty // malformed outcome: ignored, as in batch
        }
      }
      .groupByKey(_.model)
      .flatMapGroupsWithState[WinState, LeaderRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (model: Long, batch: Iterator[BattleSide],
            state: GroupState[WinState]) =>
          val st = batch.foldLeft(
            state.getOption.getOrElse(WinState(0, 0, 0, 0))) { (s, e) =>
            WinState(s.battles + 1, s.wins + e.w, s.losses + e.l,
              s.ties + e.t)
          }
          state.update(st)
          Iterator.single(LeaderRow(model, st.battles, st.wins, st.losses,
            st.ties, (st.wins * 2 + st.ties) * 1000000L / (st.battles * 2)))
      }
  }
}
