package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch as a mergeable typed `Aggregator` —
  * heavy hitters in ONE pass with state bounded by the sketch capacity
  * `m`, independent of the key cardinality.
  *
  * Why it exists next to [[TopKAgg]]: the exact top-k pipelines first
  * compute a full `groupBy(term).count()` — state and shuffle proportional
  * to the VOCABULARY. Fine when the vocabulary fits (it does for the
  * corpus ops here); at open-web scale the key domain itself (URLs,
  * hosts, n-grams) can be the thing that doesn't fit, and then a bounded
  * sketch is the only one-pass shape. Each mapper keeps ≤ m counters, the
  * shuffle carries m-bounded maps, and merges stay m-bounded — the same
  * contract as a t-digest/HLL partial.
  *
  * Guarantee (standard MG): for every key, `true - N/(m+1) <= est <= true`
  * where N is the stream length; every key with true count > N/(m+1) is
  * retained. Estimates are UNDERestimates; counts of keys that never hit
  * a decrement are exact. In the degenerate regime `distinct keys <= m`
  * no decrement ever fires, every count is exact and the output is
  * deterministic under any partitioning — that regime is what the
  * bit-exact gate pins (same pattern as the LSH recall-regime gate); the
  * bounded-capacity guarantee is spec-checked on adversarial data, where
  * counts are order-dependent within the error bound by design.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries", PODS'12): sum
  * counts, then subtract the (m+1)-th largest combined count from all and
  * drop non-positives — keeps ≤ m keys and adds at most that subtrahend
  * to every key's error, preserving the N/(m+1) bound.
  */
object FreqSketch {

  final case class TermCount(term: String, n: Long)

  final class MisraGries(m: Int)
      extends Aggregator[String, Map[String, Long], Seq[TermCount]] {
    require(m >= 1, "capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], term: String): Map[String, Long] =
      b.get(term) match {
        case Some(n) => b.updated(term, n + 1)
        case None if b.size < m => b.updated(term, 1L)
        case None =>
          // classic MG step: a full sketch meeting a new key decrements
          // every counter (the new key is charged against all of them)
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    override def merge(a: Map[String, Long],
        b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (t, n)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + n)
      }
      if (sum.size <= m) sum
      else {
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(m)
        sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }

    /** Descending count, term tiebreak — a total order, so the output is
      * deterministic whenever the counts themselves are (exact regime).
      */
    override def finish(b: Map[String, Long]): Seq[TermCount] =
      b.toSeq.sortBy { case (t, n) => (-n, t) }
        .map { case (t, n) => TermCount(t, n) }

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[TermCount]] =
      ExpressionEncoder[Seq[TermCount]]()
  }

  /** `frequent_terms(m)(term)` → `array<struct<term,n>>`, every retained
    * key, descending count (term tiebreak). posexplode for 1-based ranks.
    */
  def frequent_terms(m: Int): Column => Column = {
    val fn = udaf(new MisraGries(m), Encoders.STRING)
    term => fn(term)
  }
}
