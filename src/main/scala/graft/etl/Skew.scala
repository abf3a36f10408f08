package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilience utilities for the 100 TB posture.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins; these
  * cover the cases it can't: aggregations over heavy-hitter keys, and
  * shuffle joins where one side must be replicated per salt.
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (keys + salt) —
    * spreading a heavy-hitter key over `saltBuckets` reducers — then final
    * aggregate on the keys alone. Correct for any algebraic aggregate
    * (sum/count/min/max); for avg pass sum+count and divide after.
    *
    * `partialAggs` and `finalAggs` must compose (e.g. partial `sum(x) as s`,
    * final `sum(s) as s`).
    */
  /** Deterministic per-row salt: hash of the row content (not
    * monotonically_increasing_id, which is nondeterministic across stage
    * retries — a re-fetched task could re-salt the same rows differently
    * and double-count/drop them under executor failure). Columns whose type
    * contains a MapType are excluded (xxhash64 rejects them at analysis
    * time). Rows identical in every hashable column share a bucket; only a
    * key that is heavy-hitting in *identical* rows would defeat the spread,
    * and such data defeats any content-derived salt.
    */
  private def rowSalt(df: DataFrame, saltBuckets: Int): Column = {
    import org.apache.spark.sql.types._
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(cols.nonEmpty, "rowSalt needs at least one hashable column")
    pmod(xxhash64(cols.toIndexedSeq: _*), lit(saltBuckets.toLong))
  }

  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, saltBuckets))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a random salt in
    * [0, saltBuckets); the (smaller, but not broadcastable) right side is
    * replicated once per salt value, so a heavy-hitter join key spreads over
    * `saltBuckets` reducers instead of one straggler task.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", rowSalt(left, saltBuckets))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
