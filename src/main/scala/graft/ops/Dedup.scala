package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed around
  * its 100 TB shuffle shape:
  *
  *  - exact: one hash-groupBy on a 128-bit fingerprint — a single shuffle of
  *    (fingerprint, id), never of document bodies.
  *  - n-gram Jaccard: candidate generation by equi-join on shared shingles
  *    (only docs sharing ≥1 shingle ever meet a reducer), then exact
  *    verification. Shuffle is (shingle, id) pairs — linear in corpus
  *    shingle count, NOT quadratic in documents.
  *  - MinHash+LSH: constant-size signature per doc (nHashes longs), banded
  *    into buckets; candidate pairs only within equal (band, bucket). At
  *    scale this replaces the shingle join's heavy-hitter risk with a fixed
  *    band-key join; common-shingle skew disappears.
  *  - SimHash: 64-bit signature, 4×16-bit band join for hamming-≤k pairs.
  *
  * All hashing is xxhash64 (Spark-native, codegen'd, deterministic across
  * runs/partitions — signatures are reproducible, unlike Random-seeded LSH).
  */
object Dedup {

  /** Exact duplicate groups: fingerprint → (n_docs, keep = min id).
    * Input needs columns (idCol, textCol).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))

  /** Docs with their distinct word-k-shingle set attached.
    *
    * NOTE for pipeline authors: `explode` this column IN THE SAME select
    * that computes it (as [[shingleRows]] does) — projecting the array
    * column first and exploding in a later select leaves a non-collapsed
    * Project of the higher-order expression in the plan, measured ~14x
    * slower than the fused generate.
    */
  def withShingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextOps.wordShingles(col(textCol), k).as("shingles"))

  /** One row per (doc_id, distinct shingle) — the base relation for both
    * Jaccard candidate generation and MinHash signatures.
    */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(TextOps.wordShingles(col(textCol), k)).as("sh"))

  /** Exact Jaccard-similar pairs (j >= threshold) via shared-shingle
    * candidate join. Returns (doc_a, doc_b, jaccard).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    // exploded (doc, shingle) rows are the cached base: consumed by the
    // candidate join (twice) and the per-doc sizes. Long-lived sessions
    // should spark.catalog.clearCache() between pipelines (Verify/Bench
    // do) — a lazily-returned DataFrame gives no post-action unpersist hook.
    val e = shingleRows(docs, idCol, textCol, k).persist()
    val sizes = e.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val cand = e.as("a").join(e.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    // no broadcast hint: sizes is one row per doc (huge at corpus scale) —
    // AQE picks broadcast when it actually fits
    cand
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Per-seed re-hash of a base 64-bit hash without overflow (Spark 4 runs
    * ANSI mode, so wrap-around `*`/`+` would throw):
    * `((h >>> 8) * (2i+1)) XOR c_i` — the shifted operand keeps the product
    * under 2^63 for i < 64, XOR never overflows, and `c_i = i * φ64` (Scala
    * compile-time wrap) decorrelates the seeds. Not a bijection (low 8 bits
    * dropped) but minhash needs only uniform hashing, and 2^-56 collision
    * mass is negligible.
    */
  private def seeded(h: Column, i: Int): Column =
    (shiftrightunsigned(h, 8) * lit(2L * i + 1))
      .bitwiseXOR(lit(-0x61c8864680b583ebL * i))

  /** MinHash signatures for a (doc_id, shingles) table, computed in the
    * scale shape: explode → one xxhash64 per (doc, shingle) → nHashes
    * `min(affine(h, i))` aggregate expressions in a single codegen'd hash
    * aggregation (NOT a nested per-row higher-order loop, which evaluates
    * nHashes × |shingles| string hashes per document and dominated the
    * benchmark at 100× the cost). Docs with empty shingle sets drop out.
    * Returns (doc_id, sig: array<long>[nHashes]).
    */
  /** Signatures from a (doc_id, sh) exploded-row table (see [[shingleRows]]). */
  def minhashSignatures(shingleRows: DataFrame, nHashes: Int): DataFrame = {
    val e = shingleRows.withColumn("h", xxhash64(col("sh")))
    val aggs = (0 until nHashes).map(i => min(seeded(col("h"), i)).as(s"m$i"))
    e.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until nHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH candidate pairs from banded minhash signatures, verified with exact
    * Jaccard. `bands` bands of `nHashes/bands` rows; a pair is a candidate
    * iff some band's sub-signature matches exactly. With 32 bands × 2 rows,
    * P(miss | j=0.8) ≈ 0.36^32 ≈ 6e-15 — recall is effectively 1 at the
    * 0.8 threshold, while the band join keys are fixed-width (no shingle
    * heavy-hitter skew). Returns (doc_a, doc_b, jaccard) with j >= threshold.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, nHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(nHashes % bands == 0, "bands must divide nHashes")
    val r = nHashes / bands
    // exploded (doc, shingle) rows: reused by signatures + both verify
    // sides — persist so the shingle derivation runs once (empty-shingle
    // docs produce no rows, so the old size>0 filter is implicit)
    val e = shingleRows(docs, idCol, textCol, k).persist()
    val banded = minhashSignatures(e, nHashes)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * r + lit(1), lit(r)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // exact-Jaccard verification: shingle sets rebuilt from the cached rows
    // and shuffled only for candidates (collect order is irrelevant to the
    // set intersection; per-doc shingles are distinct by construction)
    val arrs = e.groupBy("doc_id")
      .agg(collect_list(col("sh")).as("shingles"), count(lit(1)).as("n"))
    cand
      .join(arrs.select(col("doc_id").as("doc_a"), col("shingles").as("sha"),
        col("n").as("na")), Seq("doc_a"))
      .join(arrs.select(col("doc_id").as("doc_b"), col("shingles").as("shb"),
        col("n").as("nb")), Seq("doc_b"))
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash signatures for (id, text): bit i is the sign of
    * Σ_tokens (bit i of xxhash64(token) ? +1 : -1) over NORMALIZED tokens.
    * Same scale shape as minhash: explode → one hash per token → 64
    * `sum(±1)` aggregate expressions → fold to one long. Empty docs drop out.
    * Returns (doc_id, sig: long).
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val e = docs.select(col(idCol).as("doc_id"),
        explode(TextOps.normTokens(col(textCol))).as("tk"))
      .withColumn("h", xxhash64(col("tk")))
    val aggs = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    e.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("sig"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist, candidates via
    * 4×16-bit band join. Recall is GUARANTEED only for maxDist <= 3 (a pair
    * differing in <= 3 bits must leave one of the 4 bands untouched, by
    * pigeonhole); pairs at distance 4..maxDist are found only when their
    * differing bits happen to cluster outside some band. For guaranteed
    * recall at larger distances, raise the band count (e.g. 8×8-bit for
    * maxDist <= 7).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    val sig = simhashSignatures(docs, idCol, textCol)
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sig"), b * lit(16)).bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("siga"), col("b.sig").as("sigb"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("siga").bitwiseXOR(col("sigb"))))
      .where(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
  }
}
