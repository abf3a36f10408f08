package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact median as a typed `Aggregator` — the engine's pluggable
  * `_feature_combiner` extension surface (SURVEY.md §2.9): anything beyond
  * the built-in mean/sum slots in as a `CustomCombine` wrapping a column
  * function like [[GraftFunctions.median_combine]].
  *
  * Null inputs are skipped (pandas-skipna semantics, like the built-in
  * combiners); an all-null group yields null. Even-sized groups interpolate
  * the two middle values (continuous median, matching DuckDB's `median` on
  * doubles, which makes the combiner oracle-checkable).
  *
  * Buffer is the value multiset — only viable because per-(stay, feature,
  * window) groups are small by construction; a sketch (e.g. KLL) would take
  * this slot for heavy-tailed groups.
  */
object MedianAggregator
    extends Aggregator[java.lang.Double, ArrayBuffer[Double], java.lang.Double] {

  override def zero: ArrayBuffer[Double] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Double], a: java.lang.Double): ArrayBuffer[Double] = {
    if (a != null) b += a.doubleValue()
    b
  }

  override def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] =
    b1 ++= b2

  override def finish(b: ArrayBuffer[Double]): java.lang.Double =
    if (b.isEmpty) null
    else {
      val s = b.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

  override def bufferEncoder: Encoder[ArrayBuffer[Double]] =
    ExpressionEncoder[ArrayBuffer[Double]]()
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object MedianCombine {
  private lazy val fn = udaf(MedianAggregator, Encoders.DOUBLE)

  /** Column-level exact median, usable as a `CustomCombine(median_combine)`. */
  def median_combine(value: Column): Column = fn(value)
}
