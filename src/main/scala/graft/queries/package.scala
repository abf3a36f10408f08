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

  type QueryFn = (SparkSession, String) => DataFrame
}
