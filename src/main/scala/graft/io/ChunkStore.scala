package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Content-addressed chunk store over
  * [[graft.ops.Dedup.contentChunks]] — the rsync/LBFS/restic storage
  * model as a Spark-native serving layout: each DISTINCT chunk payload
  * is written ONCE, keyed by its fingerprint and partitioned by an
  * fp-hash bucket (`cb=`), next to a per-document manifest of
  * (doc_id, chunk_idx, chunk_fp). Because chunk boundaries are
  * content-defined, a re-crawl of a lightly-edited page appends only
  * the chunks the edit touched — the storage side of the X183 dedup
  * story (build once / append deltas / reconstruct any doc), the
  * [[graft.ops.Search.savePostings]] /
  * [[graft.ops.VectorOps.saveIvfIndex]] discipline for text bytes.
  *
  * Scale shape: dedup-before-write is one fingerprint-keyed aggregate
  * (payloads shuffle once, already chunk-sized); append anti-joins new
  * distinct fingerprints against the fingerprint column of the existing
  * store (a column scan, not a payload read); reconstruction is a
  * manifest ⋈ chunks equi-join + one doc-keyed ordered stitch —
  * linear, no window.
  */
object ChunkStore {

  /** Write the store fresh: distinct chunks (payload written once per
    * fingerprint — payloads are identical per fp by construction) and
    * the full manifest.
    */
  def save(path: String, chunks: DataFrame, buckets: Int = 64): Unit = {
    require(buckets >= 1 && buckets <= 65536, "buckets in [1, 65536]")
    chunks.select(col("chunk_fp"), col("chunk"))
      .groupBy("chunk_fp").agg(first(col("chunk")).as("chunk"))
      .withColumn("cb", Sampling.hashBucket(col("chunk_fp"), buckets))
      .write.mode("overwrite").partitionBy("cb").parquet(s"$path/chunks")
    chunks.select("doc_id", "chunk_idx", "chunk_fp")
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Append a new batch, IDEMPOTENT per doc_id (first write wins — the
    * segmentDedup first-seen discipline): doc_ids already in the
    * manifest are dropped whole (an operational retry or a re-crawl
    * under the same id must not duplicate manifest rows — duplicated
    * rows would stitch every chunk twice on reconstruct), and only
    * fingerprints the store has never seen write payloads (left-anti on
    * the fingerprint column of the surviving rows). An unchanged
    * re-crawl therefore adds ZERO bytes on either side; a
    * version-REPLACING update is a partition-overwrite upsert, out of
    * this method's scope.
    */
  def append(spark: SparkSession, path: String, chunks: DataFrame,
      buckets: Int = 64): Unit = {
    require(buckets >= 1 && buckets <= 65536, "buckets in [1, 65536]")
    val existingDocs = spark.read.parquet(s"$path/manifest")
      .select("doc_id").distinct()
    val fresh = chunks.join(existingDocs, Seq("doc_id"), "left_anti")
      .persist()
    val existing = spark.read.parquet(s"$path/chunks").select("chunk_fp")
    fresh.select(col("chunk_fp"), col("chunk"))
      .groupBy("chunk_fp").agg(first(col("chunk")).as("chunk"))
      .join(existing, Seq("chunk_fp"), "left_anti")
      .withColumn("cb", Sampling.hashBucket(col("chunk_fp"), buckets))
      .write.mode("append").partitionBy("cb").parquet(s"$path/chunks")
    fresh.select("doc_id", "chunk_idx", "chunk_fp")
      .write.mode("append").parquet(s"$path/manifest")
    fresh.unpersist()
    ()
  }

  /** Rebuild every document's normalized text from the store:
    * manifest ⋈ chunks on the fingerprint, stitch in chunk_idx order
    * via an in-group sorted collect (array_sort on (idx, chunk) structs
    * — order-free under any shuffle arrival). Returns (doc_id, n_chunks,
    * text); `text` is byte-identical to the normalized source the
    * chunker saw — reconstruct ∘ chunk ≡ normalize is the store's
    * contract, pinned by LayoutSpec and the serve gate.
    */
  def reconstruct(spark: SparkSession, path: String): DataFrame = {
    val manifest = spark.read.parquet(s"$path/manifest")
    val chunks = spark.read.parquet(s"$path/chunks")
      .select("chunk_fp", "chunk")
    manifest.join(chunks, Seq("chunk_fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk"))))
          .as("ps"))
      .select(col("doc_id"), col("n_chunks"),
        concat_ws("", expr("transform(ps, e -> e.chunk)")).as("text"))
  }
}
