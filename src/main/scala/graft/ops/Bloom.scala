package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership pre-filtering — the web-scale form of the
  * broadcast semi-join: when the key set is too big to ship as an in-list
  * or hashed relation (hundreds of millions of benchmark shingles,
  * URL blocklists), ship fixed-size bits instead and let exact
  * verification clean up the false positives. FP rate trades extra
  * verification work, NEVER correctness.
  */
object Bloom {

  /** Build the filter over xxhash64(keyCol) of `keys`, distributed:
    * Spark's `stat.bloomFilter` merges per-partition partial filters via
    * treeAggregate, so the driver only ever holds final bits whose size
    * is set by (expectedItems, fpp) — independent of the key count.
    */
  def buildFilter(keys: DataFrame, keyCol: Column, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val bf = keys.select(xxhash64(keyCol).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership test: Spark's OWN runtime-filter expression
    * (`BloomFilterMightContain`) over the serialized bits — the same
    * machinery AQE injects for join runtime filters, exposed as a Column
    * (via the [[org.apache.spark.sql.graftshim.ColumnBridge]] seam, like
    * the other custom expressions). No UDF, stays inside whole-stage
    * codegen; the bits literal broadcasts with the task binary.
    */
  def mightContain(filterBytes: Array[Byte], keyCol: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(filterBytes),
        ColumnBridge.expression(xxhash64(keyCol))))
  }
}
