package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8): embeddings compressed to int8 codes with one
  * per-vector scale — 4× smaller than float32, and similarity search
  * becomes an exact INTEGER dot product (64 dims × 127² < 2²⁰ per term,
  * order-free long sums) rescaled by two doubles. The third compression
  * point on the accuracy/size curve next to PQ ([[KMeans.pqEncode]], 32×,
  * coarser) and raw float scan ([[VectorOps.bruteTopK]], exact.)
  *
  * Determinism, like the PQ/k-means trainers: quantization is
  * `floor(x/scale + 0.5)` in doubles (identical IEEE ops in any engine),
  * the dot product is exact integer math, and the final score multiplies
  * the exact integer by the two scales in a pinned order — bit-identical
  * rankings under any partitioning, retry, or engine replay.
  *
  * Zero vectors: scale 0 → every code 0 (nullif/coalesce guard), score 0 —
  * never a division error (ANSI mode throws on bare x/0).
  */
object ScalarQuant {

  /** Encode `vecCol` (array<float|double>) to (vec_id, sq_scale, codes):
    * scale = max|x|/127, codes ∈ [-127, 127] as array<long> (long spares
    * downstream integer products a cast; the information content is int8).
    */
  def sq8Encode(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("_v"))
      .withColumn("sq_scale",
        array_max(transform(col("_v"), x => abs(x.cast("double"))))
          / lit(127.0))
      .withColumn("codes", transform(col("_v"), x =>
        coalesce(
          floor(x.cast("double") / nullif(col("sq_scale"), lit(0.0))
            + lit(0.5)),
          lit(0L))))
      .drop("_v")

  /** Exact integer dot of two code arrays. */
  private def idot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)

  /** Top-k search over SQ8 codes: both sides quantized (symmetric), score
    * = idot · scale_a · scale_q. Queries must be small (broadcast); the
    * ranking is the same bounded [[graft.functions.TopKAgg]] aggregation
    * as the float/PQ paths — never a per-query window sort. Returns
    * (query_id, rank, vec_id, score).
    */
  def sq8SearchTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame = {
    val enc = sq8Encode(corpus, idCol, vecCol)
    val qenc = sq8Encode(queries, queryIdCol, queryVecCol)
      .select(col("vec_id").as("query_id"), col("sq_scale").as("q_scale"),
        col("codes").as("q_codes"))
    val scored = enc.crossJoin(broadcast(qenc))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        idot(col("codes"), col("q_codes")).cast("double")
          * col("sq_scale") * col("q_scale"))
    VectorOps.topKPerQuery(scored, k, scoreCol = "score")
  }
}
