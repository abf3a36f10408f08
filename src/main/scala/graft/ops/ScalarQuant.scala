package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8): embeddings compressed to int8 codes with one
  * per-vector scale — 4× smaller than float32, and similarity search
  * becomes an exact INTEGER dot product (64 dims × 127² < 2²⁰ per term,
  * order-free long sums) rescaled by two doubles. The third compression
  * point on the accuracy/size curve next to PQ ([[KMeans.pqEncode]], 32×,
  * coarser) and raw float scan ([[VectorOps.bruteTopK]], exact.) Binary
  * quantization ([[bqEncode]], 32× at 64 dims) is the fourth: sign bits +
  * Hamming prefilter + exact rerank ([[bqSearchTopK]]).
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

  /** Bits packed per binary-quantization word: 63, NOT 64 — setting bit 63
    * means left-shifting into the sign bit, which ANSI engines treat as
    * overflow (DuckDB raises `Out of Range: Overflow in left shift`; Spark
    * silently wraps). Staying at 63 keeps every word arithmetic-safe and
    * every engine bit-identical.
    */
  val BqWordBits = 63

  /** Binary quantization: each dimension collapses to its sign bit
    * (x > 0 → 1), packed [[BqWordBits]] per long — 32× smaller than
    * float32, the coarsest point on the compression curve after PQ (8×
    * here at 64 dims) and SQ8 (4×). Returns (vec_id, bq_words:
    * array<long>); word j holds dims [63j, 63j+63) at bit positions
    * 0..62. Ties (x == 0, NaN-free corpora) pin to 0 in both engines.
    */
  def bqEncode(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("_v"))
      .withColumn("bq_words", expr(
        s"""transform(sequence(0, int((size(_v) - 1) div $BqWordBits)), j ->
           |  aggregate(zip_with(
           |      slice(_v, j * $BqWordBits + 1, $BqWordBits),
           |      sequence(0, ${BqWordBits - 1}),
           |      (x, i) -> if(x > 0.0D, shiftleft(1L, i), 0L)),
           |    0L, (a, b) -> a + b))""".stripMargin))
      .drop("_v")

  /** Hamming distance between two packed signatures: Σ popcount(xor) over
    * words — integer, exact, codegen'd (`bit_count` + `^` are built-ins).
    */
  def bqHamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), _ + _)

  /** Two-stage binary-quantized search — the 100 TB memory path: stage 1
    * scans only the packed sign bits (32× smaller than the float corpus)
    * and keeps each query's `rerank` smallest-Hamming candidates under the
    * bounded [[graft.functions.TopKAgg]] (never a window); stage 2 joins
    * just those k-bounded candidates back to the float corpus (broadcast —
    * nq·rerank rows) for exact cosine, ranked (cos desc, vec_id asc).
    * Hamming ties at the candidate boundary break on vec_id asc in both
    * engines. Returns (query_id, rank, vec_id, ham, cos).
    */
  def bqSearchTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, rerank: Int): DataFrame =
    bqSearchTopKIndexed(bqEncode(corpus, idCol, vecCol), corpus, idCol,
      vecCol, queries, queryIdCol, queryVecCol, k, rerank)

  /** Persist / load the packed-signature layout — the BQ serving index:
    * 32× smaller than the float corpus, so the Hamming prefilter scan
    * reads 1/32nd the bytes every query batch while the float vectors
    * are touched only for the k-bounded rerank join.
    */
  def saveBqIndex(path: String, enc: DataFrame): Unit =
    enc.write.mode("overwrite").parquet(s"$path/words")

  def loadBqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/words")

  /** Incremental maintenance: pack ONLY the new batch and append — the
    * existing signatures are never re-read or rewritten (the daily
    * embedding ingest; [[graft.ops.VectorOps.appendToIvfIndex]]'s BQ
    * analog, drift-free here because sign packing has no trained state).
    */
  def appendToBqIndex(path: String, newVecs: DataFrame, idCol: String,
      vecCol: String): Unit =
    bqEncode(newVecs, idCol, vecCol).write.mode("append")
      .parquet(s"$path/words")

  /** [[bqSearchTopK]] over a PREBUILT signature table ([[bqEncode]]
    * output, typically [[loadBqIndex]]) — the serving path: the corpus is
    * packed once at index-build time; a query batch scans only
    * signatures, then reranks its candidates against the float corpus.
    */
  def bqSearchTopKIndexed(enc: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, k: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank pool $rerank must be >= k=$k")
    val qenc = bqEncode(queries, queryIdCol, queryVecCol)
      .select(col("vec_id").as("query_id"), col("bq_words").as("q_words"))
    val topH = graft.functions.TopKAgg.smallest_k_long(rerank)
    val cands = enc.crossJoin(broadcast(qenc))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        bqHamming(col("bq_words"), col("q_words")).as("ham"))
      .groupBy("query_id")
      .agg(topH(col("ham"), col("vec_id")).as("top"))
      .select(col("query_id"), explode(col("top")).as("e"))
      .select(col("query_id"), col("e.id").as("vec_id"), col("e.key").as("ham"))
    val c = corpus.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("_cv"))
    val q = queries.select(col(queryIdCol).cast("long").as("query_id"),
      col(queryVecCol).as("_qv"))
    val scored = c.join(broadcast(cands), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos", VectorOps.cosine(col("_cv"), col("_qv")))
    VectorOps.topKPerQuery(scored, k)
      .join(broadcast(cands), Seq("query_id", "vec_id"))
      .select(col("query_id"), col("rank"), col("vec_id"), col("ham"),
        col("cos"))
  }

  /** INTEGER-EXACT top-k over SQ8 codes — the cross-engine-exact twin of
    * [[sq8SearchTopK]] (the [[VectorOps.bruteTopKExact]] discipline,
    * but on the SQ8 LAYOUT: per-vector scale + int8 codes instead of one
    * global fixed-point scale). Cosine is scale-invariant, so the
    * per-vector scales CANCEL and the whole similarity runs on the codes
    * alone: `cos_x1m = (idot(codes_a, codes_q)·10⁶) div
    * (isqrt(n2_a)·isqrt(n2_q))` — no float materialized anywhere, so the
    * chain reproduces bit-for-bit on any 64-bit-integer engine.
    * Envelope: |idot| ≤ dims·127² (~10⁶ at 64 dims), ×10⁶ ≈ 10¹² ≪ 2⁶³.
    * Zero vectors: all-zero codes → NULL cosine → excluded (the
    * [[VectorOps.topKPerQueryExact]] policy). Ranking is the bounded
    * TopKAgg, ties (cos_x1m, then vec_id asc) pinned in the oracle.
    * Returns (query_id, rank, vec_id, cos_x1m) — [[VectorOps
    * .marginPairsExact]]-compatible, which is how margin mining runs
    * over the SQ8 serving layout.
    */
  def sq8SearchCosExact(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame = {
    def withRoot(enc: DataFrame): DataFrame =
      enc.withColumn("r", VectorOps.isqrt(idot(col("codes"), col("codes"))))
    val c = withRoot(sq8Encode(corpus, idCol, vecCol))
    val q = withRoot(sq8Encode(queries, queryIdCol, queryVecCol))
      .select(col("vec_id").as("query_id"), col("codes").as("q_codes"),
        col("r").as("q_r"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_x1m", VectorOps.exactCosX1m(
        idot(col("codes"), col("q_codes")), col("r"), col("q_r")))
    VectorOps.topKPerQueryExact(scored, k)
  }

  /** INTEGER-EXACT two-stage search over a PREBUILT BQ signature table —
    * [[bqSearchTopKIndexed]]'s serving shape with the rerank on the
    * quantize-first integer chain instead of a float cosine: stage 1
    * scans only the packed sign bits (Hamming is already exact integer
    * math; candidate ties at the boundary break on vec_id asc), stage 2
    * scores just the k-bounded pool with [[VectorOps.exactCosX1m]] over
    * scale-quantized vectors + exact isqrt norms. No float similarity is
    * materialized or rounded anywhere, so the whole composition
    * reproduces bit-for-bit cross-engine. Returns
    * (query_id, rank, vec_id, cos_x1m) — [[VectorOps.marginPairsExact]]-
    * compatible, which is how margin mining runs over the BQ serving
    * layout.
    */
  def bqSearchCosExactIndexed(enc: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, k: Int, rerank: Int,
      scale: Double = 1e5): DataFrame = {
    require(rerank >= k, s"rerank pool $rerank must be >= k=$k")
    val qenc = bqEncode(queries, queryIdCol, queryVecCol)
      .select(col("vec_id").as("query_id"), col("bq_words").as("q_words"))
    val topH = graft.functions.TopKAgg.smallest_k_long(rerank)
    val cands = enc.crossJoin(broadcast(qenc))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        bqHamming(col("bq_words"), col("q_words")).as("ham"))
      .groupBy("query_id")
      .agg(topH(col("ham"), col("vec_id")).as("top"))
      .select(col("query_id"), explode(col("top")).as("e"))
      .select(col("query_id"), col("e.id").as("vec_id"))
    val (cq, cr) = VectorOps.quantized(col(vecCol), scale)
    val c = corpus.select(col(idCol).cast("long").as("vec_id"),
      cq.as("qv"), cr.as("c_r"))
    val (qq, qr) = VectorOps.quantized(col(queryVecCol), scale)
    val q = queries.select(col(queryIdCol).cast("long").as("query_id"),
      qq.as("qq"), qr.as("q_r"))
    val scored = c.join(broadcast(cands), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos_x1m", VectorOps.exactCosX1m(
        graft.functions.GraftFunctions.long_dot(col("qv"), col("qq")),
        col("c_r"), col("q_r")))
    VectorOps.topKPerQueryExact(scored, k)
  }

  /** Top-k search over SQ8 codes: both sides quantized (symmetric), score
    * = idot · scale_a · scale_q. Queries must be small (broadcast); the
    * ranking is the same bounded [[graft.functions.TopKAgg]] aggregation
    * as the float/PQ paths — never a per-query window sort. Returns
    * (query_id, rank, vec_id, score).
    */
  def sq8SearchTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame =
    sq8SearchTopKIndexed(sq8Encode(corpus, idCol, vecCol), queries,
      queryIdCol, queryVecCol, k)

  /** [[sq8SearchTopK]] over a PREBUILT code table ([[sq8Encode]] output,
    * typically [[loadSq8Index]]) — the serving path: the corpus is
    * quantized once at index-build time, and a query batch scans only
    * the 4×-compressed codes (the per-vector scale rides along as one
    * double, so nothing float-width is read per dimension).
    */
  def sq8SearchTopKIndexed(enc: DataFrame, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, k: Int): DataFrame = {
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

  /** Persist / load the SQ8 code layout — the 4× serving index (the
    * accuracy point between raw float and PQ/BQ on the compression
    * curve; every other layout already had its persisted form). No
    * trained state, so the layout never drifts.
    */
  def saveSq8Index(path: String, enc: DataFrame): Unit =
    enc.write.mode("overwrite").parquet(s"$path/codes")

  def loadSq8Index(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/codes")

  /** Incremental maintenance: quantize ONLY the new batch and append —
    * per-vector scales make each row self-contained, so existing codes
    * are never re-read or rewritten ([[appendToBqIndex]]'s discipline).
    */
  def appendToSq8Index(path: String, newVecs: DataFrame, idCol: String,
      vecCol: String): Unit =
    sq8Encode(newVecs, idCol, vecCol).write.mode("append")
      .parquet(s"$path/codes")
}
