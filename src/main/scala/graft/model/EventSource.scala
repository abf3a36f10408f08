package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** How a source's rows carry event time.
  *
  * Point events carry a single timestamp column (reference:
  * `/root/reference/src/mimic2ts/__init__.py:112-115`); interval events carry
  * a `[start, end]` pair that is later expanded into one mark per spanned
  * window (`__init__.py:300-306,415-421`).
  */
sealed trait TimeSpec
final case class PointTime(timeCol: String) extends TimeSpec
final case class IntervalTime(startCol: String, endCol: String) extends TimeSpec

/** Per-(feature, window) combiner. The reference exposes this as the abstract
  * `_feature_combiner` hook (`/root/reference/src/mimic2ts/__init__.py:108-110`)
  * with mean (`:261-262`) and sum (`:297-298,376-377,412-413`) overrides.
  * `CustomCombine` is the open extension point: any Column-level aggregate
  * over the `value` column (e.g. built on an `Aggregator`).
  */
sealed trait Combiner {
  /** Aggregate expression over the long-form `value` column. */
  def agg(value: Column): Column
}
case object MeanCombine extends Combiner {
  override def agg(value: Column): Column = avg(value)
}
case object SumCombine extends Combiner {
  override def agg(value: Column): Column = sum(value)
}
final case class CustomCombine(f: Column => Column) extends Combiner {
  override def agg(value: Column): Column = f(value)
}

/** Declarative source config. The reference's four aggregator subclasses
  * (`/root/reference/src/mimic2ts/__init__.py:228-457`) collapse into four
  * values of this type (see [[graft.api.Sources]]): the subclass-override
  * "UDF surface" (`_feature_id_parser`, `_value_parser`, `_feature_combiner`,
  * `_parse_dates`) becomes plain Column expressions that Catalyst can fuse
  * into whole-stage codegen instead of row-at-a-time Python.
  *
  * @param name        source name; output file is `{stay}/{name}_features.csv`
  * @param fileName    CSV file under `{mimicPath}/icu/`
  * @param schema      declared read schema (never inferred)
  * @param timeSpec    point vs interval time columns
  * @param featureExpr expression producing the long `feature_id`
  * @param valueExpr   expression producing the double `value`
  * @param combiner    per-(feature, window) reducer
  */
final case class EventSource(
    name: String,
    fileName: String,
    schema: StructType,
    timeSpec: TimeSpec,
    featureExpr: Column,
    valueExpr: Column,
    combiner: Combiner)
