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

  /** Docs with their distinct word-k-shingle set attached. */
  def withShingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextOps.wordShingles(col(textCol), k).as("shingles"))

  /** Exact Jaccard-similar pairs (j >= threshold) via shared-shingle
    * candidate join. Returns (doc_a, doc_b, jaccard).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    val sh = withShingles(docs, idCol, textCol, k)
    val e = sh.select(col("doc_id"), col("shingles"), explode(col("shingles")).as("sh"))
    val cand = e.as("a").join(e.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"),
        first(size(col("a.shingles"))).as("na"),
        first(size(col("b.shingles"))).as("nb"))
    cand.withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash signature: for seed i, min over shingles of xxhash64(sh, i).
    * Null (empty shingle set) → empty signature.
    */
  def minhashSignature(shingles: Column, nHashes: Int): Column =
    when(size(shingles) > 0,
      transform(sequence(lit(0), lit(nHashes - 1)),
        i => array_min(transform(shingles, sh => xxhash64(sh, i)))))
      .otherwise(array().cast("array<bigint>"))

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
    val sh = withShingles(docs, idCol, textCol, k)
      .withColumn("sig", minhashSignature(col("shingles"), nHashes))
      .where(size(col("sig")) > 0)
    val banded = sh.select(col("doc_id"), col("shingles"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * r + lit(1), lit(r)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.shingles").as("sha"), col("b.shingles").as("shb"))
      .dropDuplicates("doc_a", "doc_b")
    cand.withColumn("jaccard",
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash of the token multiset: bit i is the sign of
    * Σ_tokens (bit i of xxhash64(token) ? +1 : -1).
    */
  def simhash(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val bitSums = transform(sequence(lit(0), lit(63)), i =>
      aggregate(toks, lit(0),
        (acc, tk) => acc + when(call_function("shiftright", xxhash64(tk), i).bitwiseAND(lit(1L)) === 1L,
          lit(1)).otherwise(lit(-1))))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, i) => when(s > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist, candidates via
    * 4×16-bit band join (any pair with distance <= 3 shares at least one of
    * the 4 bands by pigeonhole).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    val sig = docs.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sig"))
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
