package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Ams

/** A keyed occurrence entering the F2 tracker. */
final case class KeyedOcc(grp: String, event_time: java.sql.Timestamp,
    key: String)

/** AMS state per group: the d = s1·s2 running sign sums. */
final case class AmsState(z: Array[Long])

/** A group's running second-moment estimate after a micro-batch. */
final case class GroupF2(grp: String, f2_est: Long)

/** Streaming second-moment (F₂) tracking — [[Ams.f2Estimate]] as keyed
  * state: each group carries exactly s1·s2 longs FOREVER (the sketch is
  * the state — no timeout, no growth with the key domain or stream
  * length), every micro-batch folds its occurrences' digest-bit signs
  * in, and the emitted estimate is the same integer mean-of-s1 /
  * median-of-s2 fold. Because Z sums are order-free ADDITIONS,
  * stream-vs-batch parity is EXACT: after any stream prefix, the
  * tracker's Z vector equals the batch [[Ams.zSums]] of that prefix and
  * the estimate matches [[Ams.f2Estimate]] bit-for-bit — the spec pins
  * it.
  *
  * This is the live side of the F2 contract: "how skewed is this key's
  * frequency vector RIGHT NOW" — the hot-key / self-join-size alarm a
  * streaming join planner or rate-limiter consults, at constant state.
  *
  * Output mode Update: one row per group per micro-batch that touched it.
  */
object StreamingAms {

  /** `rows` needs (grp: string, event_time: timestamp, key: string). */
  def estimates(rows: DataFrame, s1: Int = 8, s2: Int = 5,
      watermarkDelay: String): Dataset[GroupF2] = {
    require(s1 >= 1 && s2 >= 1 && s2 % 2 == 1 && s1 * s2 <= 64,
      s"need s1 >= 1, odd s2, s1*s2 <= 64; got s1=$s1 s2=$s2")
    val d = s1 * s2
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select("grp", "event_time", "key").as[KeyedOcc]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.grp)
      .flatMapGroupsWithState[AmsState, GroupF2](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, batch: Iterator[KeyedOcc],
            state: GroupState[AmsState]) =>
          val z = state.getOption.map(_.z.clone())
            .getOrElse(Array.fill(d)(0L))
          batch.foreach(r => Ams.foldSigns(z, r.key, d))
          state.update(AmsState(z))
          Iterator.single(GroupF2(grp, Ams.estimateOf(z, s1, s2)))
      }
  }
}
