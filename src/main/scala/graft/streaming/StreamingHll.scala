package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{Hll, Kmv}

/** HLL register state per group: a FIXED 2^p-slot array (index = top-p
  * hash bits, value = max leading-zero rank, 0 = never hit).
  */
final case class HllState(regs: Array[Int])

/** The running HLL estimate for a group after a micro-batch. */
final case class GroupHll(grp: String, v_empty: Int, est: Long)

/** Streaming distinct-cardinality tracking on FIXED-SIZE state —
  * [[Hll.distinctEstimate]] as keyed state: each group carries exactly
  * 2^p small ints FOREVER (vs the KMV tracker's k longs; the HLL trade
  * is fixed bytes and ~1.04/√m error for no exactness below k), every
  * micro-batch folds hashes in with register-wise max — the merge is
  * commutative, associative, and idempotent, so after ANY prefix of the
  * stream the tracker's registers equal the batch register table of that
  * prefix and the emitted estimate is [[Hll.estimateOf]], the SAME
  * integer chain the batch gate oracles. Stream-vs-batch parity is
  * exact by construction; the spec pins it per micro-batch.
  *
  * Output mode Update: one row per touched group per micro-batch with
  * the running estimate and the empty-register regime dial.
  */
object StreamingHll {

  /** `rows` needs (grp: string, event_time: timestamp, key: string). */
  def estimates(rows: DataFrame, p: Int,
      watermarkDelay: String): Dataset[GroupHll] = {
    graft.ops.Hll.requireP(p) // p <= 9: the shared integer-estimate envelope
    val m = 1 << p
    val r = 52 - p
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .withColumn("h", Kmv.hash52(col("key")))
      .select("grp", "event_time", "h").as[KeyedHash]
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.grp)
      .flatMapGroupsWithState[HllState, GroupHll](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, batch: Iterator[KeyedHash],
            state: GroupState[HllState]) =>
          val regs = state.getOption.map(_.regs)
            .getOrElse(new Array[Int](m))
          batch.foreach { row =>
            val idx = (row.h >>> r).toInt
            val w = row.h & ((1L << r) - 1)
            val rank =
              if (w == 0) r + 1
              else r + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
            if (rank > regs(idx)) regs(idx) = rank
          }
          state.update(HllState(regs))
          Iterator.single(GroupHll(grp, regs.count(_ == 0),
            Hll.estimateOf(regs, p)))
      }
  }
}
