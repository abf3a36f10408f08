package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Kmv

/** A valued element entering the quantile tracker, pre-hashed to the
  * portable 52-bit md5 prefix of its row key — the SAME hash the batch
  * sketch uses, so stream and batch hold identical samples.
  */
final case class KeyedValue(grp: String, event_time: java.sql.Timestamp,
    h: Long, v: Long)

/** Quantile sample state per group: the bottom-k (hash, value) pairs,
  * sorted by (h, v) — the [[graft.ops.QuantileSketch.sampleTable]]
  * multiset, duplicates kept exactly as the batch aggregator keeps them.
  */
final case class QSampleState(hs: Array[Long], vs: Array[Long])

/** One running estimate row after a micro-batch. */
final case class GroupQuantile(grp: String, p: Int, n_sample: Long,
    est: Long)

/** Streaming grouped quantiles — [[graft.ops.QuantileSketch]] as keyed
  * state: each group carries at most k (hash, value) pairs FOREVER (the
  * bounded sample IS the state — no timeout, no growth with the stream),
  * every micro-batch folds its rows in by the same (hash, value) bottom-k
  * rule, and the emitted estimates are the same ⌈n·p/100⌉ rank picks.
  * Stream-vs-batch parity is EXACT after any stream prefix (a bottom-k
  * multiset is insertion-order free), which the spec pins.
  *
  * Output mode Update: one row per (group, p) per micro-batch that
  * touched the group — the live "p50/p99 document length so far" a
  * monitoring sink reads next to [[StreamingDistinct]]'s counter.
  */
object StreamingQuantiles {

  /** `rows` needs (grp: string, event_time: timestamp, key: string —
    * unique per row, e.g. the doc id — and value: numeric).
    */
  def estimates(rows: DataFrame, k: Int, ps: Seq[Int],
      watermarkDelay: String): Dataset[GroupQuantile] = {
    require(k >= 2 && k <= 4096, "k in [2, 4096]")
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "percentiles in [1, 100]")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .withColumn("h", Kmv.hash52(col("key")))
      .withColumn("v", col("value").cast("long"))
      .select("grp", "event_time", "h", "v").as[KeyedValue]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.grp)
      .flatMapGroupsWithState[QSampleState, GroupQuantile](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, batch: Iterator[KeyedValue],
            state: GroupState[QSampleState]) =>
          val cur = state.getOption
            .map(s => s.hs.zip(s.vs)).getOrElse(Array.empty[(Long, Long)])
          // multiset bottom-k by (h, v): concat + sort + take — the batch
          // TopKAgg's trim rule verbatim (duplicates kept, ties on v)
          val next = (cur ++ batch.map(r => (r.h, r.v))).sorted.take(k)
          state.update(QSampleState(next.map(_._1), next.map(_._2)))
          val vals = next.map(_._2).sorted
          val n = vals.length.toLong
          ps.iterator.map { p =>
            val rank = math.max((n * p + 99) / 100, 1L).toInt
            GroupQuantile(grp, p, n, vals(rank - 1))
          }
      }
  }
}
