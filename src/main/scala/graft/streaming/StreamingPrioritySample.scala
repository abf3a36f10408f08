package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Sampling

/** A weighted item entering the sample tracker. Ids are item identities —
  * each ROW is one item (replaying an id re-inserts it, exactly as a
  * duplicate row would in the batch gate).
  */
final case class WeightedItem(grp: String, event_time: java.sql.Timestamp,
    id: String, w: Long)

/** Priority-sample state per group: the top-(k+1) items by
  * (priority desc, id asc) — parallel arrays in that order.
  */
final case class PrioState(prios: Array[Long], ids: Array[String],
    ws: Array[Long])

/** A group's running sample summary after a micro-batch: kept count, the
  * (k+1)-th priority threshold τ, and the unbiased subset-sum estimate of
  * the group's TOTAL weight from just the kept items (Σ max(w, τ)).
  */
final case class GroupSampleStat(grp: String, n_kept: Int, tau: Long,
    est_total_w: Long)

/** Streaming priority sampling — [[Sampling.prioritySample]] as keyed
  * state: each group carries at most k+1 (priority, id, weight) triples
  * FOREVER (no timeout, no growth with the stream), every micro-batch
  * folds its items in by the SAME md5-40bit integer priority, and the
  * emitted summary carries the same τ and ŵ = max(w, τ) estimator
  * algebra. Priorities are DETERMINISTIC PER ID, so the top-(k+1) set is
  * order-free: after any stream prefix the tracker's state equals the
  * batch gate's top-(k+1) of that prefix and the total-weight estimate
  * matches bit-for-bit — the spec pins it.
  *
  * This is the live side of the weighted-sampling contract: a running
  * k-item weighted-without-replacement sample of an unbounded stream
  * PLUS an unbiased "total token mass so far" estimate — the pair a
  * streaming corpus monitor reads (E[Σ_{kept∩A} ŵ] = Σ_A w for any
  * stratum A, so downstream slices of the sample estimate their strata
  * honestly).
  *
  * Output mode Update: one row per group per micro-batch that touched it.
  */
object StreamingPrioritySample {

  /** `rows` needs (grp: string, event_time: timestamp, id: string,
    * w: long). The batch envelope w ∈ [0, 2²²] is enforced per item,
    * loudly ([[Sampling.prioOf]]).
    */
  def estimates(rows: DataFrame, k: Int,
      watermarkDelay: String): Dataset[GroupSampleStat] = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select("grp", "event_time", "id", "w").as[WeightedItem]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.grp)
      .flatMapGroupsWithState[PrioState, GroupSampleStat](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, batch: Iterator[WeightedItem],
            state: GroupState[PrioState]) =>
          val cur = state.getOption
            .map(s => s.prios.indices
              .map(i => (s.prios(i), s.ids(i), s.ws(i))).toVector)
            .getOrElse(Vector.empty)
          val all = cur ++ batch.map(r =>
            (Sampling.prioOf(r.id, r.w), r.id, r.w))
          // (prio desc, id asc): the batch gate's exact rank order
          val top = all.sortBy { case (p, id, _) => (-p, id) }
            .take(k + 1)
          state.update(PrioState(top.map(_._1).toArray,
            top.map(_._2).toArray, top.map(_._3).toArray))
          val tau = if (top.length == k + 1) top.last._1 else 0L
          val kept = top.take(k)
          val est = kept.map { case (_, _, w) => math.max(w, tau) }.sum
          Iterator.single(GroupSampleStat(grp, kept.length, tau, est))
      }
  }
}
