package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Cms

/** A keyed element entering the frequency tracker, its d counter
  * positions precomputed by [[Cms.bucketsOf]] — the SAME seeded md5
  * buckets the batch sketch uses, so stream and batch address identical
  * counters.
  */
final case class KeyedBuckets(grp: String, event_time: java.sql.Timestamp,
    key: String, buckets: Seq[Int])

/** CMS state per group: the dense d·w counter table. */
final case class CmsState(counters: Array[Long])

/** A key's running frequency estimate after a micro-batch. */
final case class KeyEstimate(grp: String, key: String, est: Long)

/** Streaming Count-Min frequency tracking — [[Cms.sketch]] as keyed
  * state: each group carries exactly d·w longs FOREVER (state is the
  * sketch — no timeout, no growth with the key domain or the stream
  * length), every micro-batch adds its occurrence counts, and each key
  * seen in the batch emits its running min-counter estimate. Because CMS
  * counters are order-free SUMS, stream-vs-batch parity is EXACT: after
  * any stream prefix, every emitted estimate equals
  * [[Cms.estimate]] over the batch sketch of that prefix — the spec pins
  * it. The whole batch folds in before any estimate is read, so
  * intra-batch ordering cannot leak into the output either.
  *
  * This is the live side of the CMS contract: "how often have we seen
  * THIS url/host/shingle so far" at any key-domain size, the signal a
  * streaming rate-limiter or hot-key guard consults.
  *
  * Output mode Update: one row per (group, key) per micro-batch that
  * touched it.
  */
object StreamingCms {

  /** `rows` needs (grp: string, event_time: timestamp, key: string). */
  def estimates(rows: DataFrame, d: Int, w: Int,
      watermarkDelay: String): Dataset[KeyEstimate] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .withColumn("buckets", Cms.bucketsOf(col("key"), d, w))
      .select("grp", "event_time", "key", "buckets").as[KeyedBuckets]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.grp)
      .flatMapGroupsWithState[CmsState, KeyEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, batch: Iterator[KeyedBuckets],
            state: GroupState[CmsState]) =>
          val counters = state.getOption.map(_.counters)
            .getOrElse(Array.fill(d * w)(0L))
          // fold the WHOLE batch before reading any estimate
          val seen = scala.collection.mutable.LinkedHashMap
            .empty[String, Seq[Int]]
          batch.foreach { r =>
            var i = 0
            while (i < d) {
              counters(i * w + r.buckets(i)) += 1L
              i += 1
            }
            if (!seen.contains(r.key)) seen.update(r.key, r.buckets)
          }
          state.update(CmsState(counters))
          seen.toSeq.sortBy(_._1).iterator.map { case (key, bks) =>
            KeyEstimate(grp, key,
              (0 until d).map(i => counters(i * w + bks(i))).min)
          }
      }
  }
}
