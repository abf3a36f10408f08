package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Watermarked stream-stream join: two live streams correlated within a
  * time bound — impression⋈click attribution, request⋈response pairing,
  * crawl-fetch⋈parse events. The last streaming shape next to the
  * stateful aggregate/session/dedup family.
  *
  * Spark buffers BOTH sides' rows as state until the watermark proves no
  * match can still arrive; the join condition MUST therefore carry (a) an
  * equi-key (state is hash-partitioned by it) and (b) a time-range bound
  * tying the two event times (it is what lets the watermark evict: a left
  * row older than `watermark - maxDelay` can never match a future right
  * row). An unbounded stream-stream join would hold both streams forever
  * — Spark rejects it in append mode, and this wrapper makes the bound a
  * signature-level requirement rather than a runtime analysis error.
  *
  * Scale: state per partition is (arrival rate × delay window), not
  * stream length — sized by the business bound (attribution window), the
  * same way the sessionizer's state is bounded by the gap.
  */
object StreamingJoin {

  /** Inner-join `right` rows to `left` rows with equal `key` where
    * `right`'s `rightTime` falls in [leftTime, leftTime + maxDelay].
    * Both inputs must be streaming frames; `watermarkDelay` is the
    * lateness allowance applied to both event-time columns.
    */
  def withinTime(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, maxDelay: String,
      watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTime, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTime, watermarkDelay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTime") >= col(s"l.$leftTime") &&
        col(s"r.$rightTime") <= col(s"l.$leftTime") +
          expr(s"INTERVAL $maxDelay"))
      .drop(col(s"r.$key"))
  }
}
