package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.SigAggregators
import graft.ops.Kmv

/** A keyed element entering the distinct tracker, pre-hashed to the
  * portable 52-bit md5 prefix ([[Kmv.hash52]] — the SAME hash the batch
  * sketch uses, so stream and batch hold identical sketches).
  */
final case class KeyedHash(grp: String, event_time: java.sql.Timestamp,
    h: Long)

/** KMV sketch state per group: the sorted k smallest distinct hashes. */
final case class KmvState(mins: Array[Long])

/** The running estimate for a group after a micro-batch. */
final case class GroupDistinct(grp: String, k_used: Int, est: Long)

/** Streaming distinct-cardinality tracking — [[Kmv.distinctEstimate]] as
  * keyed state: each group carries at most k longs FOREVER (the sketch is
  * the whole point — no timeout needed, no growth with the key domain),
  * every micro-batch folds its hashes in with the SAME sorted-insert the
  * batch aggregator uses, and the emitted estimate is the same integer
  * rank statistic. Stream-vs-batch parity is therefore EXACT: after any
  * prefix of the stream, the tracker's sketch equals the batch sketch of
  * that prefix (insertion order never matters for a sorted distinct
  * set), which the spec pins.
  *
  * Output mode Update: one row per group per micro-batch that touched
  * it, carrying the running estimate — the live "how many distinct
  * urls/users/shingles so far" counter a monitoring sink reads.
  */
object StreamingDistinct {

  /** `rows` needs (grp: string, event_time: timestamp, key: string). */
  def estimates(rows: DataFrame, k: Int,
      watermarkDelay: String): Dataset[GroupDistinct] = {
    require(k >= 2 && k <= 2047, "k must be in [2, 2047]")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .withColumn("h", Kmv.hash52(col("key")))
      .select("grp", "event_time", "h").as[KeyedHash]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.grp)
      .flatMapGroupsWithState[KmvState, GroupDistinct](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, batch: Iterator[KeyedHash],
            state: GroupState[KmvState]) =>
          val cur = state.getOption.map(_.mins)
            .getOrElse(Array.emptyLongArray)
          val next = batch.foldLeft(cur)((b, r) =>
            SigAggregators.kmvInsert(b, r.h, k))
          state.update(KmvState(next))
          Iterator.single(
            GroupDistinct(grp, next.length, Kmv.estimateOf(next, k)))
      }
  }
}
