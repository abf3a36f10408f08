package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Load one driver-provided parquet table from the scale-factor dir.
    * `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; `nanosAsLong` reads it as epoch-nanos LongType instead (the
    * queries convert with integer `DIV` — never double math, which would lose
    * precision above 2^53).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
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
