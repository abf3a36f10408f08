package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

package object queries {
  /** Load one driver-provided parquet table from the scale-factor dir.
    * `events.ts` has shipped as both parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects unless `nanosAsLong` surfaces it as
    * epoch-nanos LongType — and plain timestamp[us] (TIMESTAMP_NTZ to
    * Spark). Setting `nanosAsLong` is a no-op for non-nanos files, so it
    * stays on unconditionally; consumers dispatch on the arriving type via
    * [[epochSeconds]].
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Epoch-seconds Column for an events frame's `ts`, whichever encoding
    * the parquet carries: epoch-nanos LongType (legacy TIMESTAMP(NANOS)
    * under `nanosAsLong`) floors via integer `DIV` — never double math,
    * which loses precision above 2^53 — while TimestampType/TIMESTAMP_NTZ
    * casts timestamp→long, which floor-divides the micros toward -inf,
    * matching the oracle's `floor(epoch(ts))`. NTZ→LTZ is epoch-identity
    * because every session here pins `spark.sql.session.timeZone=UTC`.
    */
  def epochSeconds(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts DIV 1000000000")
    case _        => col("ts").cast("timestamp").cast("long")
  }

  /** The driver's sf tables are single-row-group parquet files: Spark
    * parallelizes parquet scans by row group, so a bare scan is ONE task and
    * per-row-heavy pipelines (shingling, hashing, decode) run
    * single-threaded no matter the core count. `wide` adds a round-robin
    * repartition (a few MB of shuffle) to unlock parallelism for exactly
    * those pipelines; cheap scan→agg queries skip it (the extra stage costs
    * more than it saves). Catalyst still pushes filters/pruning through
    * RepartitionOperation into the scan. Real multi-row-group data at scale
    * doesn't need this.
    */
  def wide(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  type QueryFn = (SparkSession, String) => DataFrame
}
