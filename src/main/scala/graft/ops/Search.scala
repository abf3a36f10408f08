package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import java.util.Locale

/** Inverted-index retrieval primitives: posting lists and conjunctive
  * term queries — the exact-match complement to the similarity-search
  * operators (a corpus pipeline greps as often as it embeds).
  */
object Search {

  /** Posting rows (term, doc_id), distinct per doc — write once, partition
    * by term prefix at scale; the build is one explode + distinct, linear
    * in corpus tokens.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(TextOps.normTokens(col(textCol))).as("term"))
      .distinct()

  /** The partition bucket a term's postings live in — md5 hash bucket
    * (uniform; a raw first-letter prefix would skew toward hot letters),
    * computed identically by [[Sampling.hashBucket]] in-plan and by this
    * driver-side replica for partition-pruning literals.
    */
  private[graft] def termBucket(term: String, buckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // Locale.ROOT: %x under an exotic default locale can emit non-ASCII
    // digits, which would bucket terms differently from the in-plan hash
    val hex = md.digest(term.getBytes("UTF-8")).take(2)
      .map(String.format(Locale.ROOT, "%02x", _)).mkString
    Integer.parseInt(hex, 16) % buckets
  }

  /** Persist postings in the SERVING layout: partitioned by term hash
    * bucket (`tb=`), so a term-list query prunes to its terms' directories
    * instead of scanning the whole index — the inverted-index analog of
    * [[VectorOps.saveIvfIndex]] (build once, serve every query after).
    * At corpus scale each bucket holds ~vocab/buckets posting lists;
    * appending a new crawl batch is a partition-wise `mode(append)` write
    * of its postings, old buckets untouched.
    */
  def savePostings(path: String, postings: DataFrame,
      buckets: Int = 64): Unit = {
    require(buckets >= 1 && buckets <= 65536, "buckets in [1, 65536]")
    postings
      .withColumn("tb", Sampling.hashBucket(col("term"), buckets))
      .write.mode("overwrite").partitionBy("tb").parquet(path)
  }

  def loadPostings(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.parquet(path)

  /** [[matchAll]] against a persisted postings layout: the query's term
    * buckets become a partition filter (pruned at the scan — only the
    * terms' `tb=` directories are read), then the same two-op
    * filter + count-match shape.
    */
  def matchAllIndexed(postings: DataFrame, terms: Seq[String],
      buckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    val ts = terms.map(_.toLowerCase(Locale.ROOT)).distinct
    val tbs = ts.map(termBucket(_, buckets)).distinct
    postings
      .where(col("tb").isin(tbs: _*) && col("term").isin(ts: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"))
      .where(col("n_matched") === ts.length)
      .select("doc_id")
  }

  /** Docs containing ALL `terms`: one selective postings scan (term IN
    * list — pushable) + one doc-keyed count aggregation, regardless of
    * term count. The per-term intersect chain would be |terms| shuffles;
    * this is always two.
    */
  def matchAll(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    // dedupe AFTER lowercasing: postings are distinct per doc, so a
    // duplicated input term (e.g. "spark" and "Spark") can match at most
    // once — comparing n_matched against the raw length would silently
    // return zero docs
    val ts = terms.map(_.toLowerCase(Locale.ROOT)).distinct
    postings
      .where(col("term").isin(ts: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched")) // postings are distinct per doc
      .where(col("n_matched") === ts.length)
      .select("doc_id")
  }

  /** TF-IDF-ranked OR retrieval: top-k docs by Σ_matched tf·ln(N/df) —
    * the scoring complement to [[matchAll]]'s boolean intersect.
    *
    * Scale shape: the term filter lands BEFORE the tf aggregation (only
    * query-term rows survive the explode), df comes from one tiny agg
    * over those rows, N is a broadcast scalar, and the final ranking is
    * TakeOrderedAndProject (k-bounded) — never a global sort. Per-term
    * weights are summed in MICRO-UNITS (round(w·1e6) → long): a double
    * sum re-associates with shuffle arrival order and can flip a rank at
    * the k boundary; the integer sum is order-free and the oracle replays
    * it exactly. Returns (doc_id, score, n_terms).
    *
    * Known portability caveat — this is the ONE gate whose oracle depends
    * on libm `ln` agreeing between engines (every other oracle stays in
    * count/fixed-point space, see [[Curation.typicalityProfile]]): a 1-ulp
    * `ln` divergence could flip `round(w·1e6)` only if tf·ln(N/df)·1e6
    * sits within ~1 ulp (≈1e-10 relative) of a half-integer. The sole
    * exactly-on-boundary input is df = N, where ln(1) = 0 exactly in both
    * engines; elsewhere the flip probability per row is ~1e-10. Accepted
    * and documented rather than rebuilt in rational form, because
    * tf·N/df without the log is a semantically different (undamped)
    * ranking.
    */
  def rankedSearch(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && k >= 1, "need terms and k >= 1")
    val ts = terms.map(_.toLowerCase(Locale.ROOT)).distinct
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.normTokens(col(textCol))).as("term"))
      .where(col("term").isin(ts: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val n = docs.agg(count(lit(1)).cast("double").as("nd"))
    tf.join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("w_micro",
        round((col("tf") * log(col("nd") / col("df_t"))) * lit(1e6), 0)
          .cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("w_micro")).as("sm"), count(lit(1)).as("n_terms"))
      .select(col("doc_id"),
        (col("sm").cast("double") / lit(1e6)).as("score"), col("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** BM25 ranked retrieval (Robertson–Spärck Jones weighting with tf
    * saturation and length normalization) — the standard lexical ranker
    * [[rankedSearch]]'s undamped tf·idf approximates. Every rational in
    * the formula is fixed-point integer with PINNED truncation so two
    * engines replay the ranking bit-for-bit:
    *
    *   inner_m = 1000 − b_m + (b_m·dl·N) div TT          (dl/avgdl in milli)
    *   K_m     = (k1_m · inner_m) div 1000
    *   s_ppm   = (tf·1000·(k1_m + 1000)·1000) div (tf·1000 + K_m)
    *   c_micro = (idf_micro · s_ppm) div 10⁶,  summed per doc
    *
    * with idf_micro = round(ln((N − df + ½)/(df + ½) + 1)·10⁶) — the one
    * libm `ln` in the chain, the SAME documented portability caveat as
    * [[rankedSearch]] (flip probability ~1e-10 per term; everything after
    * the rounding is order-free integer math). Defaults k1 = 1.2,
    * b = 0.75 (the classic Okapi operating point). Returns
    * (doc_id, score_micro: long, n_terms), top `k` by
    * (score_micro desc, doc_id) — deterministic at the boundary.
    *
    * Scale shape: two linear token aggregates (per-doc length, per-doc
    * matched-term tf), a term-keyed broadcast of the df table, one-row
    * corpus stats broadcast, and a k-bounded TakeOrderedAndProject —
    * never a global sort, the corpus scanned once for lengths and once
    * for matches (Catalyst collapses both over one shuffle-free scan
    * pipeline each).
    */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1Milli: Long = 1200L, bMilli: Long = 750L): DataFrame = {
    require(terms.nonEmpty && k >= 1, "need terms and k >= 1")
    require(k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000,
      "k1Milli >= 0 and bMilli in [0, 1000]")
    val ts = terms.map(_.toLowerCase(Locale.ROOT)).distinct
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.normTokens(col(textCol))).as("term"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = toks.where(col("term").isin(ts: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val stats = docs.agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(toks.agg(count(lit(1)).as("tt"))))
    tf.join(dl, Seq("doc_id"))
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro",
        round(log((col("nd") - col("df_t") + lit(0.5))
          / (col("df_t") + lit(0.5)) + lit(1.0)) * lit(1e6), 0)
          .cast("long"))
      .withColumn("inner_m", lit(1000L) - lit(bMilli)
        + idiv(lit(bMilli) * col("dl") * col("nd"), col("tt")))
      .withColumn("k_m", idiv(lit(k1Milli) * col("inner_m"), lit(1000L)))
      .withColumn("s_ppm", idiv(
        col("tf") * lit(1000L) * lit(k1Milli + 1000L) * lit(1000L),
        col("tf") * lit(1000L) + col("k_m")))
      .withColumn("c_micro",
        idiv(col("idf_micro") * col("s_ppm"), lit(1000000L)))
      .groupBy("doc_id")
      .agg(sum(col("c_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Hybrid retrieval: a lexical recall stage ([[rankedSearch]] top
    * `kLex`) re-ranked by embedding cosine against a one-row query
    * vector — the standard RAG retrieval shape (cheap sparse recall,
    * expensive dense precision, in that order). Returns the top `kFinal`
    * of the candidates as (doc_id, lex_score, cos), ordered and
    * tie-broken on (round(cos, 6) desc, doc_id) so the selected set is
    * deterministic.
    *
    * Scale shape: the dense stage scores only `kLex` candidates — the
    * candidate frame broadcasts into the embeddings join (hinted; it is
    * post-limit so size stats lag without the hint), the query vector is
    * a broadcast scalar, and the final ranking is TakeOrderedAndProject.
    * The embedding table is touched once, filtered by the semi-join-like
    * candidate join — never scanned per term.
    */
  def hybridSearch(docs: DataFrame, embeddings: DataFrame, idCol: String,
      textCol: String, terms: Seq[String], queryVec: DataFrame,
      kLex: Int, kFinal: Int): DataFrame = {
    require(kFinal >= 1 && kLex >= kFinal, "need kLex >= kFinal >= 1")
    val lex = rankedSearch(docs, idCol, textCol, terms, kLex)
      .select(col("doc_id"), col("score").as("lex_score"))
    embeddings.select(col("vec_id"), col("embedding"))
      .join(broadcast(lex), col("vec_id") === col("doc_id"))
      .crossJoin(broadcast(queryVec))
      .select(col("doc_id"), col("lex_score"),
        round(VectorOps.cosine(col("embedding"), col("query_vec")), 6)
          .as("cos"))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(kFinal)
  }

  /** Reciprocal-rank fusion of the lexical and dense rankings:
    * score = Σ_lists 1/(c + rank) — the standard rank-only fusion
    * (c = 60 in the original formulation), robust to incomparable score
    * scales because only POSITIONS enter, where [[hybridSearch]]'s
    * rerank lets the dense score overrule lexical recall entirely. A doc
    * present in one list contributes only that list's term.
    *
    * Determinism: each candidate list is a bounded top-k with a total
    * tie-break (lexical: micro-unit score desc, id; dense: round(cos, 6)
    * desc, id), and 1/(c+rank) is ONE IEEE division of small exact ints —
    * no libm, identical in any engine — summed in rounded micro-units.
    *
    * Scale shape: both stages are k-bounded TakeOrderedAndProject; the
    * rank windows and the full-outer fusion join run over ≤ kCand rows
    * each (post-limit frames — a single-task window over k rows, the
    * same bound the TakeOrdered output already carries). The embedding
    * scan is the one corpus-sized pass; everything after is O(k).
    */
  def rrfSearch(docs: DataFrame, embeddings: DataFrame, idCol: String,
      textCol: String, terms: Seq[String], queryVec: DataFrame,
      kCand: Int, c: Int, kFinal: Int): DataFrame = {
    require(kFinal >= 1 && kCand >= kFinal && c >= 1,
      "need kCand >= kFinal >= 1 and c >= 1")
    import org.apache.spark.sql.expressions.Window
    val lexW = Window.orderBy(col("score").desc, col("doc_id"))
    val lex = rankedSearch(docs, idCol, textCol, terms, kCand)
      .select(col("doc_id"), row_number().over(lexW).as("lex_rank"))
    val denseW = Window.orderBy(col("cos_r").desc, col("vec_id"))
    val dense = embeddings.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queryVec))
      .select(col("vec_id"),
        round(VectorOps.cosine(col("embedding"), col("query_vec")), 6)
          .as("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_id")).limit(kCand)
      .select(col("vec_id"), row_number().over(denseW).as("dense_rank"))
    def rrfTerm(rank: org.apache.spark.sql.Column) =
      coalesce(round(lit(1e6) / (lit(c) + rank), 0).cast("long"), lit(0L))
    lex.join(dense, col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        col("lex_rank"), col("dense_rank"),
        (rrfTerm(col("lex_rank")) + rrfTerm(col("dense_rank")))
          .as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(kFinal)
  }

  /** Positional PHRASE query — the adjacency-exact retrieval mode the
    * boolean/ranked modes cannot express ([[matchAll]] finds docs with
    * all of "new", "york", "times" ANYWHERE; a phrase query requires
    * them adjacent and in order). Classic screen + verify shape:
    *   1. screen — conjunctive containment over the normalized token
    *      array (the same ALL-terms semantics as [[matchAll]]; at
    *      serving scale this stage is [[matchAllIndexed]] against the
    *      `tb=`-partitioned postings and only candidates reach step 2);
    *   2. verify — slide a |phrase|-wide slice over the token array and
    *      array-compare against the literal phrase (branch-free: flags
    *      over all positions, sliced to the valid window — the
    *      [[TextOps.wordShingles]] idiom), keeping true matches with
    *      their count and first 1-based position.
    * Both stages are per-row Column algebra — zero shuffle, codegen'd,
    * linear in corpus tokens; the phrase is a literal array (broadcast
    * by constant folding, not a join). Returns (doc_id, n_hits,
    * first_pos) for matching docs only.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "need a non-empty phrase")
    val ts = phrase.map(_.toLowerCase(Locale.ROOT))
    val k = ts.length
    val litArr = array(ts.map(lit): _*)
    val toks = TextOps.normTokens(col(textCol))
    val screened = docs
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .where(ts.distinct.map(t => array_contains(col("__toks"), t))
        .reduce(_ && _))
    val tk = col("__toks")
    val flags = transform(sequence(lit(1), size(tk)),
      i => slice(tk, i, lit(k)) === litArr)
    val window = slice(flags, lit(1), greatest(size(tk) - (k - 1), lit(0)))
    // window behind its own projection: referenced twice below, and a
    // Column val is INLINED per reference — the |toks| slice-compares
    // ran twice per candidate (CollapseProject keeps the boundary for a
    // non-cheap expr used more than once, so this computes it once)
    screened
      .select(col("doc_id"), window.as("__w"))
      .select(col("doc_id"),
        size(filter(col("__w"), b => b)).cast("long").as("n_hits"),
        array_position(col("__w"), true).as("first_pos"))
      .where(col("n_hits") > 0)
  }
}
