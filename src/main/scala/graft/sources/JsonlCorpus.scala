package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** JSONL (one JSON document per line) corpus source/sink — the interchange
  * format LLM data pipelines actually ship. Two rules matter at 100 TB:
  *
  *  - ALWAYS an explicit schema. Schema inference is a full extra pass
  *    over the data before the real one, and a heterogeneous corpus makes
  *    it nondeterministic (the inferred type is whatever the sample
  *    contained). The default schema matches the `documents` table.
  *  - NEVER silently drop bad lines. PERMISSIVE mode with a corrupt-record
  *    column quarantines unparseable lines as data — [[readSplit]] returns
  *    (parsed, quarantined) so a pipeline can count/inspect the rejects;
  *    a web-scale crawl ALWAYS has them, and a silent drop is an unnoticed
  *    data loss.
  */
object JsonlCorpus {

  val CorruptCol = "_corrupt_record"

  /** Schema of the `documents` table plus the quarantine column. */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField(CorruptCol, StringType)))

  /** Read JSONL with the explicit `schema`; unparseable lines surface as
    * rows whose `_corrupt_record` holds the raw line (all other fields
    * null).
    */
  def read(spark: SparkSession, path: String,
      schema: StructType = DocumentsSchema): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** (parsed rows without the quarantine column, quarantined raw lines).
    * Spark requires caching the frame before filtering on the corrupt
    * column (queries referencing only the corrupt column are rejected
    * otherwise); the split is two filters over one cached parse.
    */
  def readSplit(spark: SparkSession, path: String,
      schema: StructType = DocumentsSchema): (DataFrame, DataFrame, () => Unit) = {
    val raw = read(spark, path, schema).cache()
    val good = raw.where(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = raw.where(col(CorruptCol).isNotNull).select(CorruptCol)
    (good, bad, () => { raw.unpersist(); () })
  }

  /** Write one JSON object per line (codec-splittable when uncompressed or
    * zstd-framed — never gzip whole-file at scale).
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
