package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * All vector math is sequential left-fold in DOUBLE over the array order —
  * deterministic across partitions and bit-matchable by an oracle that does
  * the same (cast to DOUBLE[] first; float accumulation would diverge).
  *
  * Scale shapes:
  *  - brute-force top-k: broadcast the (small) query set, one pass over the
  *    corpus, bounded per-query top-k aggregation (never a window sort).
  *    Linear scan — the baseline.
  *  - IVF: assign every vector to its nearest of K fixed centroids (one
  *    broadcast pass), bucket by cell; queries probe only `nprobe` cells —
  *    the scan shrinks by ~K/nprobe. Cell assignment is itself a broadcast
  *    argmax, no shuffle of the corpus.
  */
object VectorOps {

  /** Sequential double-precision dot product of two float arrays —
    * the codegen'd [[graft.functions.FloatVectorDot]] expression
    * (bit-identical to the HOF fold `aggregate(zip_with(_*_), 0.0, _+_)`,
    * see [[dotHof]], but a primitive loop).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.float_dot(a, b)

  /** Built-ins-only reference implementation of [[dot]] (kept for parity
    * testing and for inputs that are not float arrays).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Zero-norm guard on every cosine denominator: under Spark 4's ANSI
    * mode a double division by zero THROWS (probed) — a single zero vector
    * in a 100 TB corpus must yield a NULL similarity (dropped by any
    * threshold/rank), not kill the job. The SQL oracles carry the same
    * nullif so both engines agree on degenerate inputs.
    */
  private def over(nprod: Column): Column = nullif(nprod, lit(0.0))

  def cosine(a: Column, b: Column): Column = dot(a, b) / over(norm(a) * norm(b))

  /** Scale-safe per-query ranking of (query_id, vec_id, cos) rows: bounded
    * top-k aggregation ([[graft.functions.TopKAgg]]) — each mapper keeps at
    * most ~4k candidates per query and the shuffle carries k-bounded
    * buffers, where a `row_number` window would sort a query's ENTIRE
    * scored corpus on one task (the 100 TB killer; same discipline as the
    * q_topk TakeOrderedAndProject fix, per-group form). Ordering (cos desc,
    * vec_id asc) via the negated-key trick — bit-exact, and `cos` itself is
    * carried through untouched. Null cos (zero-norm vectors) is excluded
    * from ranking (the window form admitted such rows only when a query had
    * fewer than k finite candidates).
    */
  private[ops] def topKPerQuery(scored: DataFrame, k: Int,
      scoreCol: String = "cos"): DataFrame = {
    val top = graft.functions.TopKAgg.smallest_k(k)
    scored.where(col(scoreCol).isNotNull)
      .groupBy("query_id")
      .agg(top(negate(col(scoreCol)), col("vec_id").cast("long"),
        col(scoreCol)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("vec_id"), col("e.value").as(scoreCol))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. `queries` must be small (broadcast). Returns
    * (query_id, rank, vec_id, cos).
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms precomputed per vector (not per pair): 1 dot product per pair
    // instead of 3, bit-identical result (same fold, same operand order)
    val c = corpus.withColumn("c_norm", norm(col("embedding")))
    val q = queries.withColumn("q_norm", norm(col("query_vec")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("embedding"), col("query_vec"))
        / over(col("c_norm") * col("q_norm")))
    topKPerQuery(scored, k)
  }

  /** Hard-negative mining: each query's top-k nearest neighbors BELOW a
    * similarity ceiling — the contrastive-training picks that are close
    * enough to be informative but not near-duplicates (near-dups as
    * negatives are label noise; see [[nearDupPairs]] for the positives
    * side). The ceiling compares the 6dp-ROUNDED cosine so the boundary
    * cannot flip on a last-ulp engine difference. Same bounded TopKAgg
    * ranking and broadcast-queries shape as [[bruteTopK]]; at corpus
    * scale the scan side swaps for the IVF/PQ serving layouts like any
    * other dense search.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      maxCos: Double): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val c = corpus.withColumn("c_norm", norm(col("embedding")))
    val q = queries.withColumn("q_norm", norm(col("query_vec")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("embedding"), col("query_vec"))
        / over(col("c_norm") * col("q_norm")))
      .where(round(col("cos"), 6) <= maxCos)
    topKPerQuery(scored, k)
  }

  /** IVF cell assignment: nearest centroid by cosine (ties → lowest centroid
    * id). Centroids must be small (broadcast). Adds `cell` and `cell_cos`.
    *
    * r16 note: a zero-shuffle literal-centroid argmax projection was
    * tried here and MEASURED SLOWER end to end for every consumer that
    * joins the assignment onward (q_emb_jl_ivf 1.1→3.6 s, in-query
    * margin mining 2.9→7.1 s at sf0.1): the aggregate's exchange is a
    * materialization point that decouples the corpus-side projection
    * pipeline from the probe join; without it the fused stage re-runs
    * the expensive upstream (JL folds, quantize) with worse parallelism.
    * The map-side-combined argmax below keeps that materialization.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = corpus.withColumn("v_norm", norm(col("embedding")))
    val cen = centroids.withColumn("cen_norm", norm(col("centroid_vec")))
    val scored = c.crossJoin(broadcast(cen))
      .withColumn("c_cos", dot(col("embedding"), col("centroid_vec"))
        / over(col("v_norm") * col("cen_norm")))
    // argmax as max(struct(cos, -id)) aggregation, NOT a window sort: the
    // groupBy gets map-side partial aggregation, so only one row per
    // vector survives each mapper instead of shuffling K centroid-scored
    // copies of the corpus. Tie semantics identical: equal cos → larger
    // -id → lowest centroid id.
    scored.groupBy("vec_id")
      .agg(
        max(struct(col("c_cos"), (-col("centroid_id")).as("neg_id"))).as("best"),
        first(col("embedding")).as("embedding"),
        first(col("label")).as("label"),
        first(col("v_norm")).as("v_norm"))
      .select(col("vec_id"), col("embedding"), col("label"), col("v_norm"),
        (-col("best.neg_id")).as("cell"), col("best.c_cos").as("cell_cos"))
  }

  /** IVF top-k: probe the query's `nprobe` nearest cells only. Returns
    * (query_id, rank, vec_id, cos) — approximate: recall < 1 when true
    * neighbors live outside probed cells.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    ivfTopKIndexed(assignCells(corpus, centroids), centroids, queries,
      k, nprobe)

  /** [[ivfTopK]] over a PREBUILT cell assignment ([[assignCells]] output,
    * typically loaded from a persisted index) — the serving path: the
    * corpus is assigned once at index-build time and every query batch
    * afterwards probes without re-scoring corpus × centroids.
    */
  def ivfTopKIndexed(cells: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val qScored = queries.crossJoin(broadcast(centroids))
      .withColumn("c_cos", cosine(col("query_vec"), col("centroid_vec")))
    // probe selection is the same bounded top-k (nprobe nearest cells,
    // ties → lowest centroid id) — no window even on the small query side,
    // so the whole operator stays Window-free (ExplainCheck pins it)
    val topP = graft.functions.TopKAgg.smallest_k(nprobe)
    val probes = qScored.where(col("c_cos").isNotNull)
      .groupBy("query_id")
      .agg(first(col("query_vec")).as("query_vec"),
        topP(negate(col("c_cos")), col("centroid_id").cast("long"),
          col("c_cos")).as("top"))
      .select(col("query_id"), col("query_vec"),
        // precomputed per query, not per candidate pair (see bruteTopK)
        norm(col("query_vec")).as("q_norm"),
        explode(col("top")).as("e"))
      .select(col("query_id"), col("query_vec"), col("q_norm"),
        col("e.id").as("cell"))
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("embedding"), col("query_vec"))
        / over(col("v_norm") * col("q_norm")))
    topKPerQuery(scored, k)
  }

  /** Recall@k evaluation: per query, the fraction of ground-truth
    * neighbors (`truth`, e.g. a [[bruteTopK]] sample) that the approximate
    * searcher (`approx`, e.g. [[ivfTopK]]) recovered — THE quality dial
    * for nprobe/band tuning, computed in-engine so the sweep runs where
    * the data is. Both inputs need (query_id, vec_id); extra columns are
    * ignored. Recall is reported in integer micro-units via floor
    * division — engine-exact, no float ratio.
    *
    * Scale shape: one equi-join on (query_id, vec_id) + one agg, both
    * k·queries-sized — the evaluation never touches embeddings, so it
    * costs nothing next to the searches it scores.
    */
  def recallAtK(truth: DataFrame, approx: DataFrame): DataFrame =
    truth.select("query_id", "vec_id")
      .join(approx.select(col("query_id"), col("vec_id"), lit(1).as("hit")),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .select(col("query_id"), col("k"), col("n_hit"),
        expr("(n_hit * 1000000L) div k").as("recall_ppm"))

  /** Ranked-retrieval quality metrics beyond [[recallAtK]] — the eval
    * row a serving team reads per query: against a relevant set `truth`
    * (query_id, vec_id), score a RANKED candidate list `ranked`
    * (query_id, rank, vec_id) with
    *
    *   - `hits`      relevant candidates in the top k,
    *   - `mrr_ppm`   10⁶ div rank-of-first-relevant (0 = none),
    *   - `dcg_micro` Σ_{relevant r} LUT(r), binary-relevance DCG in
    *                 micro-units with LUT(r) = round(10⁶ / log₂(r+1))
    *                 — the discounts are k PRECOMPUTED integer literals
    *                 baked identically into the plan and the oracle, so
    *                 "a float logarithm" never enters either engine,
    *   - `ndcg_ppm`  dcg · 10⁶ div Σ LUT(1..min(k, |truth|)) — the
    *                 ideal places every relevant doc first.
    *
    * One equi-join + one grouped aggregate, both query-keyed; k is the
    * LUT bound (ranks past k are ignored, documented). Queries with an
    * empty ranked list still report (their truth rows drive the join).
    */
  def rankMetrics(truth: DataFrame, ranked: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, "k must be in [1, 100]")
    val lut: Seq[Long] =
      (1 to k).map(r => math.round(1e6 / (math.log(r + 1) / math.log(2))))
    val lutCol = array(lut.map(lit): _*)
    val j = truth.select(col("query_id"), col("vec_id"))
      .join(ranked.select(col("query_id"), col("vec_id"), col("rank")),
        Seq("query_id", "vec_id"), "left")
      // a relevant doc ranked past k counts as unranked (rank nulls out)
      // rather than dropping the truth row — n_truth stays the full set
      .withColumn("rank", when(col("rank") <= k, col("rank")))
    j.groupBy("query_id")
      .agg(
        count(lit(1)).as("n_truth"),
        count(col("rank")).as("hits"),
        min(col("rank")).as("first_rank"),
        coalesce(sum(try_element_at(lutCol, col("rank").cast("int"))),
          lit(0L)).as("dcg_micro"))
      .select(col("query_id"), col("n_truth"), col("hits"),
        coalesce(call_function("div", lit(1000000L), col("first_rank")),
          lit(0L)).as("mrr_ppm"),
        col("dcg_micro"),
        call_function("div", col("dcg_micro") * lit(1000000L),
          aggregate(
            transform(sequence(lit(1), least(col("n_truth"), lit(k))),
              i => try_element_at(lutCol, i.cast("int"))),
            lit(0L), (a, x) => a + x))
        .as("ndcg_ppm"))
  }

  /** Persist an IVF index in the SERVING layout: centroids + the cell
    * assignment written PARTITIONED BY cell — a probe of nprobe cells then
    * reads only those directories (partition pruning; with the probe set
    * broadcast, Spark's dynamic partition pruning pushes it into the file
    * listing). Build once ([[assignCells]]), serve every later query
    * batch via [[loadIvfIndex]] + [[ivfTopKIndexed]] without re-scoring
    * corpus × centroids — the ANN analog of [[Dedup.minhashIndex]].
    */
  def saveIvfIndex(path: String, centroids: DataFrame,
      cells: DataFrame): Unit = {
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    cells.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/cells")
  }

  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/cells"))

  /** Incremental index maintenance: assign ONLY the new batch against the
    * SAVED centroids and append its rows into the cell-partitioned layout
    * — the existing corpus is never re-read, re-scored, or rewritten (the
    * daily embedding ingest; the ANN analog of the incremental MinHash
    * path, [[Dedup.incrementalNearDupsScoped]]). Quantization drift is the
    * caller's trade: appended vectors use the ORIGINAL centroids, so after
    * heavy distribution shift rebuild rather than append.
    */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, newVecs: DataFrame): Unit = {
    val centroids = spark.read.parquet(s"$path/centroids")
    assignCells(newVecs, centroids).write.mode("append")
      .partitionBy("cell").parquet(s"$path/cells")
  }

  /** Random-hyperplane (SimHash-for-vectors) near-dup blocking — the scale
    * path for [[nearDupPairs]] when no natural block key exists: vectors
    * hash to a `nPlanes`-bit sign bucket (bit j = sign of the projection
    * onto pseudo-plane j), pairs are generated WITHIN buckets only and
    * then exact-verified by cosine. 2^nPlanes buckets bound the expected
    * block size at |corpus| / 2^nPlanes; by the random-hyperplane bound a
    * pair at angle θ lands in one bucket with probability (1 - θ/π)^nPlanes
    * — recall < 1 (approximate by design; raise recall with multiple bucket
    * tables OR fewer planes at the cost of bigger blocks).
    * Returns (vec_a, vec_b, bucket, cos) with cos >= threshold.
    */
  /** Heavy-hitter guard for similarity blocking, mirroring the MinHash
    * path's `Dedup.capBuckets`: drop blocks holding more than `cap`
    * vectors before the in-block self-join — a block of n near-identical
    * embeddings funnels O(n²) pairs through one reducer. Blocks that hot
    * are exact-dup residue (dedup first) or a degenerate block key; the
    * cap bounds every block's contribution. Default =
    * [[graft.ops.Dedup.DefaultCap]] (finite — a bare library call can
    * never go quadratic on a viral block); pass
    * [[graft.ops.Dedup.Uncapped]] explicitly for exact blocking
    * semantics on a corpus known to have no hot blocks.
    */
  private def capBlocks(v: DataFrame, keyCol: String, cap: Int): DataFrame =
    if (cap == graft.ops.Dedup.Uncapped) v
    else v.join(
      // hot-set anti join, not keep-set semi join (Dedup.capBuckets): the
      // over-cap blocks are few by construction, so AQE broadcasts them
      // and the corpus rows never shuffle on the block key here
      v.groupBy(keyCol).agg(count(lit(1)).as("c"))
        .where(col("c") > cap).select(keyCol),
      Seq(keyCol), "left_anti")

  /** Signed projection of `emb` (statically `dims` wide) onto plane j of
    * the shared splitmix64 ±1 family ([[jlSign]]): one ARRAY-LITERAL sign
    * row zipped and left-folded (0.0-seeded, the dotHof shape) — a
    * compact 3-node expression where a flat 64-term multiply-add chain
    * bloats the generated code ~1 s of Janino per plane set (measured:
    * q_emb_lsh_neardup 0.57→1.61 s on the chain form). The oracle replays
    * the identical 0.0-seeded left fold.
    */
  private def planeSumLit(j: Int, emb: Column, dims: Int): Column =
    aggregate(
      zip_with(emb.cast("array<double>"),
        lit((0 until dims).map(d => jlSign(j, d)).toArray),
        (x, s) => x * s),
      lit(0.0), (acc, x) => acc + x)

  /** splitmix64 finalizer — a full-avalanche integer mix, evaluated
    * DRIVER-SIDE only (the ±1 entries it derives are embedded as plan
    * literals, so nothing engine-specific ever executes per row).
    */
  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic ±1 JL matrix entry for (component j, dimension d).
    * splitmix64 parity — full avalanche, so rows are effectively
    * independent — the r1-r6 mod-97 parity family correlated across rows
    * (up to perfect anti-correlation), which both collapsed a
    * projection's rank AND concentrated the sign buckets onto ~half the
    * keyspace (measured: 120 of 256 buckets, 6x the candidate pairs).
    */
  private[graft] def jlSign(j: Int, d: Int): Double =
    if ((splitmix64(j * 1009L + d) & 1L) == 0L) 1.0 else -1.0

  /** Johnson-Lindenstrauss SIGN projection: reduce `embCol` (exactly
    * `inDims` wide) to `outDims` components y_j = Σ_d sign(j,d)·x_d —
    * the Achlioptas 2003 ±1 construction, which preserves pairwise
    * distances to (1±ε) at outDims = O(log n / ε²). The sign matrix is
    * derived driver-side (splitmix64 parity — RNG-free, reproducible on
    * any engine) and embedded as ARRAY LITERALS: each component is one
    * zip-and-fold over its sign row ([[planeSumLit]]), zero shuffle —
    * the pure in-row reduction a 100 TB pipeline runs once before every
    * downstream IVF/PQ/brute pass shrinks 12-48×.
    */
  def jlProject(corpus: DataFrame, idCol: String, embCol: String,
      inDims: Int, outDims: Int): DataFrame = {
    require(outDims >= 1 && outDims <= 64, "outDims must be in [1, 64]")
    require(inDims >= 1, "inDims must be positive")
    // guard in its own select (not inlined into the 16 plane folds):
    // CollapseProject keeps a multiply-referenced non-trivial alias
    // un-substituted, so the width CASE evaluates once per row
    corpus.select(col(idCol), assertWidth(col(embCol), inDims).as(embCol))
      .select(col(idCol),
        array((0 until outDims)
          .map(j => planeSumLit(j, col(embCol), inDims)): _*).as("jl"))
  }

  /** Row-level width contract for the literal-matrix projections: a vector
    * that is not exactly `dims` wide raises instead of silently zip-padding
    * (pad → null plane sum → sign bit falls to 0 and the row lands in a
    * wrong bucket). Codegen-friendly (`CASE WHEN … ELSE raise_error`), zero
    * cost on conforming rows.
    */
  private def assertWidth(emb: Column, dims: Int): Column =
    when(size(emb) === dims, emb).otherwise(raise_error(concat(
      lit(s"embedding width != $dims (found "),
      size(emb).cast("string"), lit(")"))))

  def signLshNearDupPairs(corpus: DataFrame, threshold: Double,
      inDims: Int, nPlanes: Int = 8, blockCap: Int = graft.ops.Dedup.DefaultCap): DataFrame = {
    require(nPlanes >= 1 && nPlanes <= 30, "nPlanes must be in [1, 30]")
    require(inDims >= 1, "inDims must be positive")
    // two selects: projections first (plain HOF columns), THEN the CASE
    // bucket fold over the scalar sums — conditionals wrapping higher-order
    // expressions defeat codegen collapse (measured 20x on the shingle
    // pipelines)
    // inDims is EXPLICIT (the jlProject contract): a probed width ran a
    // Spark job at query-construction time and silently zip-padded ragged
    // vectors (pad → null plane sum → sign bit 0). A row narrower than
    // inDims now yields a null bucket, which the equi-join drops — and the
    // width guard below turns a wrong-width corpus into a loud error
    val guarded = corpus.select(col("vec_id"),
      assertWidth(col("embedding"), inDims).as("embedding"))
    val sums = guarded.select(Seq(col("vec_id"), col("embedding")) ++
      (0 until nPlanes)
        .map(j => planeSumLit(j, col("embedding"), inDims).as(s"s$j")): _*)
    val v = capBlocks(
      sums.select(col("vec_id"), col("embedding"),
        (0 until nPlanes)
          .map(j => when(col(s"s$j") > 0, lit(1 << j)).otherwise(lit(0)))
          .reduce(_ + _).as("bucket"))
        .withColumn("nrm", norm(col("embedding"))),
      "bucket", blockCap)
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dot(col("a.embedding"), col("b.embedding"))
        / over(col("a.nrm") * col("b.nrm")))
      .where(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.bucket").as("bucket"), col("cos"))
  }

  /** Semantic dedup (SemDeDup, Abbas et al. 2023): near-duplicate pairs
    * WITHIN k-means cells — the blocking key is learned (nearest centroid)
    * rather than a natural label ([[nearDupPairs]]) or a random projection
    * ([[signLshNearDupPairs]]). Recall trade: a pair straddling a cell
    * boundary is missed (the paper's trade too — raise k for purity,
    * lower for recall). Composition: [[assignCells]] (broadcast argmax,
    * no corpus shuffle) → in-cell pairs with the same heavy-hitter
    * `blockCap` guard as every other blocked self-join here.
    * Returns (vec_a, vec_b, cell, cos) with cos >= threshold.
    */
  def semanticDedupPairs(corpus: DataFrame, centroids: DataFrame,
      threshold: Double, blockCap: Int = graft.ops.Dedup.DefaultCap): DataFrame = {
    // assignCells carries a label column through; semantic dedup has no
    // use for one — synthesize it when the corpus doesn't have it
    val c = if (corpus.columns.contains("label")) corpus
      else corpus.withColumn("label", lit(null).cast("string"))
    val v = capBlocks(
      assignCells(c, centroids)
        .select(col("vec_id"), col("embedding"), col("cell"),
          col("v_norm").as("nrm")),
      "cell", blockCap)
    v.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dot(col("a.embedding"), col("b.embedding"))
        / over(col("a.nrm") * col("b.nrm")))
      .where(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.cell").as("cell"), col("cos"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold. Blocked by `label`
    * here (the clustering key); [[signLshNearDupPairs]] is the variant for
    * corpora with no natural block key. Returns (vec_a, vec_b, cos).
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      blockCap: Int = graft.ops.Dedup.DefaultCap): DataFrame = {
    val v = capBlocks(
      corpus.select(col("vec_id"), col("label"), col("embedding"))
        .withColumn("nrm", norm(col("embedding"))),
      "label", blockCap)
    v.as("a").join(v.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dot(col("a.embedding"), col("b.embedding"))
        / over(col("a.nrm") * col("b.nrm")))
      .where(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))
  }

  /** Per-label centroid statistics over an embedding column — the vector
    * analog of a grouped mean (class prototypes, cluster summaries,
    * per-source embedding drift).
    *
    * Determinism: float sums re-associate with partition order, so the
    * vectors are quantized once to fixed-point longs ([[KMeans.quantize]],
    * 1e-6 units) and summed in exact integer math — bit-identical on any
    * cluster layout, and the mean is ONE double division of exact integers
    * (both engines run the identical IEEE ops).
    *
    * Scale shape: posexplode feeds a (label, pos) hash aggregate whose
    * map-side partials bound the shuffle at partitions × labels × dims
    * rows regardless of corpus size — the n·dims exploded rows never cross
    * the wire. Output is dimension-bounded (labels × dims rows).
    */
  /** Margin-based pair mining (the CCMatrix/LASER bitext criterion,
    * Artetxe & Schwenk ratio margin): a cross-corpus pair (x, y) scores
    * `cos(x,y) / ((avg cos of x's k fwd neighbors + avg cos of y's k bwd
    * neighbors) / 2)` — a raw-cosine threshold over-selects hubs (vectors
    * near everything); dividing by each side's neighborhood density
    * cancels the hubness. Takes the two PRECOMPUTED kNN tables
    * ((query_id, rank, vec_id, cos) — [[bruteTopK]] here, the IVF/PQ/BQ
    * serving layouts at corpus scale; the margin is backend-agnostic
    * post-processing), so this adds k-bounded aggregates + two key joins,
    * never a new all-pairs pass.
    *
    * Determinism: cosines round to 6dp micro-units FIRST, then every
    * average/margin is exact integer math — the per-side sums are
    * order-free longs, and `margin_ppm = cos·2·cntF·cntB·10⁶ div
    * (sumF·cntB + sumB·cntF)` (≤ 1.3e14, long-safe) truncates toward zero
    * identically in both engines. Pairs whose combined denominator is ≤ 0
    * (hostile neighborhoods, all-negative cosines) are dropped — a ratio
    * against a negative density is meaningless for mining. Candidate set
    * = union of both directions' top-k, deduplicated (cos(x,y) bits match
    * across directions: same fold order, commutative per-term products).
    * Returns (src_id, tgt_id, cos_x1m, margin_ppm).
    *
    * Coverage precondition: the candidate union inner-joins both per-side
    * denominator aggregates, so every candidate's src_id must appear as a
    * query in `fwdKnn` AND its tgt_id as a query in `bwdKnn` — i.e. both
    * kNN tables must cover all endpoint ids (true whenever both are built
    * over the full respective corpora, as every composition here does). A
    * pair whose endpoint has no neighborhood on one side has no density
    * estimate and is dropped by the join — run the kNN over the full id
    * sets if that silent drop is not acceptable.
    *
    * Portability note: the 6dp rounding here quantizes AFTER a float
    * cosine — adequate for in-engine mining, but a last-ulp difference in
    * another engine's dot/sqrt at a `.5` boundary can flip `cos_x1m` by 1.
    * Cross-engine-exact pipelines (the correctness gates) use
    * [[marginPairsExact]] over [[bruteTopKExact]]/[[ivfTopKExact]], which
    * never materialize a float similarity.
    */
  def marginPairs(fwdKnn: DataFrame, bwdKnn: DataFrame): DataFrame = {
    def micro(c: Column): Column = round(c * lit(1e6)).cast("long")
    marginTail(
      fwdKnn.select(col("query_id").as("src_id"),
        col("vec_id").as("tgt_id"), micro(col("cos")).as("cos_x1m")),
      bwdKnn.select(col("vec_id").as("src_id"),
        col("query_id").as("tgt_id"), micro(col("cos")).as("cos_x1m")))
  }

  /** [[marginPairs]] over kNN tables whose similarity column is ALREADY the
    * exact integer `cos_x1m` ([[bruteTopKExact]]/[[ivfTopKExact]] output) —
    * the cross-engine-exact form: no float similarity is materialized or
    * rounded anywhere in the chain, so the whole composition (quantize →
    * integer dot → isqrt cosine → integer ratio margin) reproduces
    * bit-for-bit on any engine with 64-bit integer arithmetic.
    */
  def marginPairsExact(fwdKnn: DataFrame, bwdKnn: DataFrame): DataFrame =
    marginTail(
      fwdKnn.select(col("query_id").as("src_id"),
        col("vec_id").as("tgt_id"), col("cos_x1m")),
      bwdKnn.select(col("vec_id").as("src_id"),
        col("query_id").as("tgt_id"), col("cos_x1m")))

  /** Shared ratio-margin tail over (src_id, tgt_id, cos_x1m) sides —
    * backend-agnostic and integer-only past this point (see
    * [[marginPairs]] for the formula and envelope).
    *
    * r17 (guide §2.4 duplicated subtrees, §5 localCheckpoint): the tail
    * references each kNN side twice — once in the candidate union, once
    * in its denominator aggregate — and the measured static plans held
    * every expensive kNN subtree (cross-scan + top-k) TWICE per
    * direction (q_emb_margin_sq8: 8 scan subtrees for 2 directions).
    * The sides are k-bounded (≤ nQueries·k rows), so one eager
    * materialization of their union makes every downstream reference a
    * tiny in-memory scan, and the denominator joins broadcast instead of
    * sort-merging. Values are bit-identical: same rows, same order-free
    * integer aggregates. The checkpoint is intra-query (recomputed every
    * run) and routed through [[graft.util.PlanTap]] so the audit tools
    * still see the pre-checkpoint kNN plan.
    */
  private def marginTail(f: DataFrame, b: DataFrame): DataFrame = {
    val u = graft.util.PlanTap.local(
      f.select(col("src_id"), col("tgt_id"), col("cos_x1m"),
        lit(true).as("fwd"))
        .unionAll(b.select(col("src_id"), col("tgt_id"), col("cos_x1m"),
          lit(false).as("fwd"))),
      "margin-knn-union")
    val denomF = u.where(col("fwd")).groupBy("src_id")
      .agg(sum("cos_x1m").as("sum_f"), count(lit(1)).as("cnt_f"))
    val denomB = u.where(!col("fwd")).groupBy("tgt_id")
      .agg(sum("cos_x1m").as("sum_b"), count(lit(1)).as("cnt_b"))
    u.select("src_id", "tgt_id", "cos_x1m").distinct()
      .join(denomF, Seq("src_id"))
      .join(denomB, Seq("tgt_id"))
      .withColumn("den",
        col("sum_f") * col("cnt_b") + col("sum_b") * col("cnt_f"))
      .where(col("den") > 0)
      .select(col("src_id"), col("tgt_id"), col("cos_x1m"),
        expr("(cos_x1m * 2 * cnt_f * cnt_b * 1000000L) div den")
          .as("margin_ppm"))
  }

  // ------------------------------------------------------------------
  // Integer-exact similarity chain: quantize FIRST, then integer-only
  // math — the cross-engine-reproducible variants of bruteTopK / ivfTopK
  // (KMeans.quantize discipline; no float dot, sqrt, or rounding of a
  // float anywhere downstream of the quantization).
  // ------------------------------------------------------------------

  /** Exact integer square root (floor(√p)) of a non-negative long column.
    * Seeded by the double sqrt — correctly within ±1 of the true root for
    * p < 2^52 (the quantized-norm envelope: dims·(scale·max|x|)², ~2^40 at
    * scale 1e5/dims 64) — then corrected by one exact integer step each
    * way, so the result is the true floor regardless of the seed's last-ulp
    * rounding. Both engines run the identical seed+correct, hence agree.
    */
  private[graft] def isqrt(p: Column): Column = {
    val r0 = floor(sqrt(p.cast("double"))).cast("long")
    val up = when((r0 + 1) * (r0 + 1) <= p, r0 + 1).otherwise(r0)
    when(up * up > p, up - 1).otherwise(up)
  }

  /** The ONE scalar twin of [[isqrt]] — same seed + one exact integer
    * step each way, shared by every driver-side fixed-point trainer
    * (KMeans PQ scoring, power iteration) so the numeric kernel cannot
    * silently fork across call sites. Exact floor(√p) for p < 2^62
    * (the correction steps repair any last-ulp seed rounding).
    */
  private[graft] def isqrtScalar(p: Long): Long = {
    require(p >= 0L, "isqrtScalar domain")
    val r0 = math.floor(math.sqrt(p.toDouble)).toLong
    val up = if ((r0 + 1) * (r0 + 1) <= p) r0 + 1 else r0
    if (up * up > p) up - 1 else up
  }

  /** Exact integer cosine in micro-units over pre-quantized long vectors:
    * `cos_x1m = (dot·10⁶) div (isqrt(n2a)·isqrt(n2b))`, truncating toward
    * zero in both engines; zero-norm → NULL (the [[over]] guard's integer
    * twin). The denominator uses the PRODUCT OF PER-VECTOR integer roots
    * (not isqrt(n2a·n2b), whose argument would overflow a long at ~1e11²):
    * a deterministic, engine-exact definition that differs from the float
    * cosine by < 2·10⁻⁴ relative (one isqrt truncation per side at norms
    * ≥ scale/10) — ranking fidelity equal to the quantization itself.
    *
    * Envelope (documented, ANSI-checked): |dot| ≤ dims·(scale·max|x|)²
    * must stay under 2^63/10⁶ ≈ 9.2e12 — at scale 1e5, dims 64, |x| ≤ 1.4
    * the bound is ~1.25e12. Wider vectors or hotter scales: drop `scale`.
    */
  private[ops] def exactCosX1m(dotL: Column, ra: Column, rb: Column): Column =
    call_function("div", dotL * lit(1000000L), nullif(ra * rb, lit(0L)))

  /** Quantize an embedding column and pair it with its exact integer norm
    * root: (qv = round-half-up(x·scale) per element, r = isqrt(qv·qv)).
    *
    * INLINE-COST WARNING: `qv` is a `transform(...)` higher-order function
    * — Spark evaluates it INTERPRETED (CodegenFallback), and a Column is
    * re-inlined at every reference site: `r` embeds qv twice inside the
    * dot and [[isqrt]] references ITS argument five times, so a single
    * projection of this pair evaluates the per-element quantize ~11× per
    * row (measured ~200 µs/row at 64 dims — 2 s per 10k query rows on
    * the round-15 margin-serve probes). Row-at-scale callers must use
    * [[quantizedStaged]]; this pair form is for bounded tables
    * (centroids) and expression-level composition. */
  private[ops] def quantized(vec: Column, scale: Double): (Column, Column) = {
    val qv = KMeans.quantize(vec, scale)
    (qv, isqrt(graft.functions.GraftFunctions.long_dot(qv, qv)))
  }

  /** [[quantized]] materialized in three projection steps so the
    * interpreted quantize transform runs ONCE per row: project qv, then
    * the self-dot off the materialized attribute, then the isqrt off the
    * materialized dot (CollapseProject keeps each boundary because the
    * produced expression is non-cheap and referenced more than once
    * downstream). Same values bit-for-bit as the pair form — only the
    * evaluation count changes. Returns `keep ++ (outVec, outR)`. */
  private[ops] def quantizedStaged(df: DataFrame, keep: Seq[String],
      vecCol: Column, outVec: String, outR: String,
      scale: Double): DataFrame = {
    val ks = keep.map(col)
    val q0 = df.select(ks :+ KMeans.quantize(vecCol, scale).as(outVec): _*)
    val q1 = q0.select(ks :+ col(outVec) :+
      graft.functions.GraftFunctions.long_dot(col(outVec), col(outVec))
        .as("__n2"): _*)
    q1.select(ks :+ col(outVec) :+ isqrt(col("__n2")).as(outR): _*)
  }

  /** Per-query bounded top-k over integer-scored candidates — the
    * [[topKPerQuery]] shape with EXACT long keys ([[graft.functions
    * .TopKAgg.smallest_k_long]]): no double round-trip of the key, so
    * ordering is exact for any 64-bit score. Ties (equal `cos_x1m`, far
    * likelier than with float scores) break by vec_id ascending — pinned
    * identically in the oracles.
    */
  private[ops] def topKPerQueryExact(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.functions.TopKAgg.smallest_k_long(k)
    scored.where(col("cos_x1m").isNotNull)
      .groupBy("query_id")
      .agg(top(negate(col("cos_x1m")), col("vec_id").cast("long")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("vec_id"), negate(col("e.key")).as("cos_x1m"))
  }

  /** Integer-exact brute-force top-k: [[bruteTopK]]'s broadcast-scan shape
    * with the quantize-first chain — embeddings fixed-point-quantized to
    * `array<long>` ([[KMeans.quantize]], half-up), exact codegen'd integer
    * dot ([[graft.functions.LongVectorDot]]), exact [[isqrt]] norms, and
    * the [[exactCosX1m]] micro-unit cosine. Returns
    * (query_id, rank, vec_id, cos_x1m: long) — bit-identical on any
    * engine, at a similarity resolution set by `scale` (default 1e5:
    * ~10⁻⁴ relative, inside the long envelope for dims ≤ 64, |x| ≤ 1.4;
    * see [[exactCosX1m]]).
    */
  def bruteTopKExact(corpus: DataFrame, queries: DataFrame, k: Int,
      scale: Double = 1e5): DataFrame = {
    val (cq, cr) = quantized(col("embedding"), scale)
    val (qq, qr) = quantized(col("query_vec"), scale)
    val c = corpus.select(col("vec_id"), cq.as("qv"), cr.as("c_r"))
    val q = queries.select(col("query_id"), qq.as("qq"), qr.as("q_r"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_x1m", exactCosX1m(
        graft.functions.GraftFunctions.long_dot(col("qv"), col("qq")),
        col("c_r"), col("q_r")))
    topKPerQueryExact(scored, k)
  }

  /** Integer-exact IVF top-k: [[ivfTopK]]'s cell-probe shape with every
    * similarity — cell assignment, probe ranking, in-cell scoring — on the
    * [[exactCosX1m]] integer chain. Assignment argmax ties → lowest
    * centroid id; probe and candidate ties → lowest id (both pinned in
    * the oracles). Vectors/queries whose every centroid similarity is
    * NULL (zero-norm) are dropped — no density, no neighborhood, same
    * policy as [[topKPerQuery]]'s null exclusion.
    */
  def ivfTopKExact(corpus: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int,
      scale: Double = 1e5): DataFrame = {
    val cen = ivfExactCentroids(centroids, scale)
    ivfTopKExactIndexed(ivfExactCells(corpus, cen), cen, queries, k,
      nprobe, scale)
  }

  /** Quantized centroid table for the integer-exact IVF chain —
    * (centroid_id, cv, cen_r). Shared by the in-query composition
    * ([[ivfTopKExact]]) and the persisted serving index (the build side
    * writes this next to [[ivfExactCells]]' assignment via
    * [[saveIvfIndex]]; [[ivfTopKExactIndexed]] probes against it).
    */
  def ivfExactCentroids(centroids: DataFrame,
      scale: Double = 1e5): DataFrame = {
    val (cv, cenR) = quantized(col("centroid_vec"), scale)
    centroids.select(col("centroid_id"), cv.as("cv"), cenR.as("cen_r"))
  }

  /** Integer-exact IVF cell assignment — (vec_id, qv, v_r, cell), the
    * persistable half of [[ivfTopKExact]]: each vector's quantized form
    * plus its argmax cell over exact centroid cosines (ties → lowest
    * centroid id). Build once, write with [[saveIvfIndex]] (partitioned
    * by cell), and every later query batch serves via
    * [[ivfTopKExactIndexed]] without re-scoring corpus × centroids —
    * per-vector assignment is independent of every other vector, so
    * filtering the loaded assignment (e.g. to a src/tgt split) yields
    * exactly the cells an in-query assignment of that subset would.
    */
  def ivfExactCells(corpus: DataFrame, cen: DataFrame,
      scale: Double = 1e5): DataFrame = {
    // staged quantize: one interpreted transform per corpus row, not ~11
    val corp = quantizedStaged(corpus, Seq("vec_id"), col("embedding"),
      "qv", "v_r", scale)
    // cell assignment: argmax over exact cell cosines as a map-side
    // combined aggregation (see assignCells — the r16 literal-projection
    // experiment measured slower for every join consumer; the agg's
    // exchange is the materialization point that keeps the quantize
    // pipeline decoupled from the candidate join)
    corp.crossJoin(broadcast(cen))
      .withColumn("c_cos", exactCosX1m(
        graft.functions.GraftFunctions.long_dot(col("qv"), col("cv")),
        col("v_r"), col("cen_r")))
      .where(col("c_cos").isNotNull)
      .groupBy("vec_id")
      .agg(
        max(struct(col("c_cos"), (-col("centroid_id")).as("neg_id"))).as("best"),
        first(col("qv")).as("qv"), first(col("v_r")).as("v_r"))
      .select(col("vec_id"), col("qv"), col("v_r"),
        (-col("best.neg_id")).as("cell"))
  }

  /** [[ivfTopKExact]] over a PREBUILT integer-exact cell assignment
    * ([[ivfExactCells]] output, typically [[loadIvfIndex]]-loaded from
    * the cell-partitioned serving layout) — the serving path: probe
    * selection + candidate scoring only, the corpus × centroids
    * assignment already paid at build time. Identical ranking to the
    * in-query form by construction (same chain, same tie pins).
    */
  def ivfTopKExactIndexed(cells: DataFrame, cen: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int,
      scale: Double = 1e5): DataFrame = {
    val topP = graft.functions.TopKAgg.smallest_k_long(nprobe)
    // staged quantize: one interpreted transform per query row, not ~11
    // (measured 2 s per direction per 10k queries on the margin-serve
    // decomposition probe before staging)
    val probes = quantizedStaged(queries, Seq("query_id"),
        col("query_vec"), "qq", "q_r", scale)
      .crossJoin(broadcast(cen))
      .withColumn("c_cos", exactCosX1m(
        graft.functions.GraftFunctions.long_dot(col("qq"), col("cv")),
        col("q_r"), col("cen_r")))
      .where(col("c_cos").isNotNull)
      .groupBy("query_id")
      .agg(first(col("qq")).as("qq"), first(col("q_r")).as("q_r"),
        topP(negate(col("c_cos")), col("centroid_id").cast("long")).as("top"))
      .select(col("query_id"), col("qq"), col("q_r"),
        explode(col("top")).as("e"))
      .select(col("query_id"), col("qq"), col("q_r"),
        col("e.id").as("cell"))
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_x1m", exactCosX1m(
        graft.functions.GraftFunctions.long_dot(col("qv"), col("qq")),
        col("v_r"), col("q_r")))
    topKPerQueryExact(scored, k)
  }

  /** Multi-probe sign-LSH top-k ANN — the recall lever for bucketed sign
    * projections WITHOUT more tables or a bigger join: a query probes its
    * own `nPlanes`-bit sign bucket plus (at `probeHamming = 1`) the
    * `nPlanes` buckets one bit-flip away — the buckets a near neighbor
    * lands in when ONE plane sum sits on the other side of zero, which is
    * exactly how sign-LSH misses (Lv et al., VLDB 2007 multi-probe
    * argument). Recall rises toward brute while candidates stay
    * bucket-bounded; single-probe (`probeHamming = 0`) is the classic
    * one-bucket lookup for comparison.
    *
    * Everything is the quantize-first integer chain: plane sums are exact
    * integer dots of the micro-quantized vector against the ±1 literal
    * rows ([[jlSign]] — bit set iff the sum is strictly positive), and
    * candidate scoring is [[exactCosX1m]] with k-bounded
    * [[topKPerQueryExact]] selection — bit-identical on any engine, no
    * float similarity anywhere.
    *
    * Scale shape: corpus signatures are a zero-shuffle in-row projection
    * (computed once, cacheable next to the vectors); the probe frame is
    * `|queries|·(nPlanes+1)` rows — broadcast into the bucket equi-join,
    * so the corpus never shuffles; scoring is candidate-bounded and the
    * final agg is the k-bounded TopKAgg (never a window sort). A corpus
    * vector matches at most ONE probe of a given query (buckets are
    * distinct values), so no candidate dedup pass is needed.
    */
  def multiProbeLshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      inDims: Int, nPlanes: Int = 8, probeHamming: Int = 1,
      scale: Double = 1e5): DataFrame =
    lshSearchTopKIndexed(
      lshEncode(corpus, "vec_id", "embedding", inDims, nPlanes, scale),
      queries, k, inDims, nPlanes, probeHamming, scale)

  /** Sign-bucket encoding for the persisted LSH index: quantize-first
    * integer plane dots against the ±1 [[jlSign]] rows (bit set iff
    * strictly positive). Returns (vec_id, qv, v_r, bucket) — everything
    * the serve path scores with, so serving never touches the float
    * corpus. Two selects (the [[signLshNearDupPairs]] discipline):
    * quantize first, THEN the bucket fold over scalar integer dots.
    */
  def lshEncode(corpus: DataFrame, idCol: String, vecCol: String,
      inDims: Int, nPlanes: Int = 8, scale: Double = 1e5): DataFrame = {
    require(nPlanes >= 1 && nPlanes <= 30, "nPlanes must be in [1, 30]")
    require(inDims >= 1, "inDims must be positive")
    val (cq, cr) = quantized(col(vecCol), scale)
    corpus
      .select(col(idCol).cast("long").as("vec_id"),
        assertWidth(col(vecCol), inDims).as(vecCol))
      .select(col("vec_id"), cq.as("qv"), cr.as("v_r"))
      .select(col("vec_id"), col("qv"), col("v_r"),
        lshSig(col("qv"), inDims, nPlanes).as("bucket"))
  }

  private def lshSig(qv: Column, inDims: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { j =>
      when(graft.functions.GraftFunctions.long_dot(qv,
        lit((0 until inDims).map(d => jlSign(j, d).toLong).toArray)) > 0,
        lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Persist an [[lshEncode]] table BUCKET-PARTITIONED — the serve-side
    * point: a probe set touches `nPlanes + 1` of the `2^nPlanes`
    * partition directories, and the broadcast bucket join makes the
    * probed values available for dynamic partition pruning, so a query
    * batch reads a sliver of the index, not a full scan.
    */
  def saveLshIndex(path: String, enc: DataFrame): Unit =
    enc.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/buckets")

  def loadLshIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/buckets")

  /** Incremental maintenance: encode ONLY the new batch and append into
    * its bucket directories — drift-free, because the plane family is a
    * deterministic literal matrix with no trained state (the
    * [[graft.ops.ScalarQuant.appendToBqIndex]] argument; contrast
    * [[appendToIvfIndex]], whose centroids age).
    */
  def appendToLshIndex(path: String, newVecs: DataFrame, idCol: String,
      vecCol: String, inDims: Int, nPlanes: Int = 8,
      scale: Double = 1e5): Unit =
    lshEncode(newVecs, idCol, vecCol, inDims, nPlanes, scale)
      .write.mode("append").partitionBy("bucket").parquet(s"$path/buckets")

  /** [[multiProbeLshTopK]] over a PREBUILT encoding (typically
    * [[loadLshIndex]]) — the serving path: signatures, quantized vectors
    * and norm roots come off the index scan; only the query batch is
    * encoded per call. Results are identical to the in-query composition
    * (same integer chain end to end).
    */
  def lshSearchTopKIndexed(enc: DataFrame, queries: DataFrame, k: Int,
      inDims: Int, nPlanes: Int = 8, probeHamming: Int = 1,
      scale: Double = 1e5): DataFrame = {
    require(probeHamming == 0 || probeHamming == 1,
      "probeHamming must be 0 (single-probe) or 1 (flip each bit once)")
    require(k >= 1, "k must be positive")
    val (qq, qr) = quantized(col("query_vec"), scale)
    val q0 = queries
      .select(col("query_id"),
        assertWidth(col("query_vec"), inDims).as("query_vec"))
      .select(col("query_id"), qq.as("qq"), qr.as("q_r"))
      .select(col("query_id"), col("qq"), col("q_r"),
        lshSig(col("qq"), inDims, nPlanes).as("sig"))
    val probeCols = col("sig") +: (if (probeHamming == 0) Seq.empty[Column]
      else (0 until nPlanes).map(j => col("sig").bitwiseXOR(lit(1 << j))))
    val probes = q0.select(col("query_id"), col("qq"), col("q_r"),
      explode(array(probeCols: _*)).as("bucket"))
    val scored = enc.join(broadcast(probes), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_x1m", exactCosX1m(
        graft.functions.GraftFunctions.long_dot(col("qv"), col("qq")),
        col("v_r"), col("q_r")))
    topKPerQueryExact(scored, k)
  }

  def labelCentroids(corpus: DataFrame, labelCol: String, vecCol: String,
      scale: Double = 1e6): DataFrame =
    corpus
      .select(col(labelCol).as("label"),
        KMeans.quantize(col(vecCol), scale).as("qv"))
      .select(col("label"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_q"))
      .withColumn("mean",
        col("sum_q").cast("double") / col("n") / lit(scale))

  /** Label-separation audit for metric-learning / classifier corpora: per
    * label, how tight the cluster is (mean squared distance to its own
    * centroid) versus how far the nearest OTHER centroid sits (mean of
    * each vector's min distance to a foreign centroid). A sep_ratio near
    * 1 means the labels are not separable in this embedding — the signal
    * to retrain before mining hard negatives from it.
    *
    * Exact integer end-to-end: vectors quantize to micro-units
    * ([[KMeans.quantize]]), the centroid is the FLOOR of the exact
    * rational mean — computed as `floor(sum/n)` in double, which is the
    * true mathematical floor whenever |sum| < 2^53 and the quotient is
    * at least 1/n away from any non-integer crossing (it is: the
    * quotient is a rational with denominator n), so both engines agree
    * bit-for-bit — and distances are the codegen'd
    * [[graft.functions.LongVectorDist2]]. Per-vector d2 is bounded by
    * dims·(2·scale)² independent of corpus size; the per-label sums hold
    * to ~10⁴ vectors/label/dim=64 under the long envelope (beyond that,
    * scale down or shard the sum — same discipline as dim stats).
    *
    * Scale shape: centroids are labels×dims rows (one partially
    * aggregated pass, same as [[labelCentroids]]); scoring is a
    * broadcast of L centroid arrays over one corpus pass with a map-side
    * argmin/argmax groupBy on vec_id; the report is labels-sized.
    */
  def labelMargin(corpus: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding", scale: Double = 1e6): DataFrame = {
    val q = corpus.select(col("vec_id"), col(labelCol).as("lab"),
      KMeans.quantize(col(vecCol), scale).as("qv"))
    val cents = q
      .select(col("lab"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("lab", "pos").agg(sum("v").as("s"), count(lit(1)).as("cn"))
      .groupBy("lab")
      .agg(max("cn").as("cn"),
        array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .select(col("lab").as("clab"),
        transform(col("ps"), e => floor(e.getField("s").cast("double")
          / col("cn")).cast("long")).as("cen"))
    val scored = q.crossJoin(broadcast(cents))
      .withColumn("d2",
        graft.functions.GraftFunctions.long_dist2(col("qv"), col("cen")))
    scored.groupBy("vec_id")
      .agg(first("lab").as("lab"),
        max(when(col("lab") === col("clab"), col("d2"))).as("own_d2"),
        min(when(col("lab") =!= col("clab"), col("d2"))).as("min_other_d2"))
      .groupBy("lab")
      .agg(count(lit(1)).as("n"),
        sum("own_d2").as("sum_own_d2"),
        sum("min_other_d2").as("sum_other_d2"))
      .withColumn("sep_ratio",
        round(col("sum_other_d2").cast("double")
          / greatest(col("sum_own_d2"), lit(1L)).cast("double"), 6))
  }
  /** Top principal component by fixed-point POWER ITERATION over the
    * mean-centered quantized embeddings — the "all-but-the-top" (Mu &
    * Viswanath, ICLR'18) post-processing step: embedding matrices carry a
    * large common component that dominates every cosine; measuring it
    * (and projecting it out downstream) sharpens similarity search and
    * near-dup screens alike.
    *
    * Reproducibility follows the [[graft.ops.KMeans.fit]] discipline:
    * vectors quantize once to milli-unit longs, every round is exact
    * integer math in a pinned order (dot per vector → per-dim weighted
    * sum → driver-side rescale by max|w| → isqrt normalize back to a
    * ~1000-norm vector), truncating division throughout — bit-identical
    * under any partitioning, replayable in DuckDB (HUGEINT covers the
    * one intermediate, w·1000, that exceeds Long; the Scala driver uses
    * BigInt for exactly that step).
    *
    * Overflow audit (all exact): |c| <= ~2·scale·max|x|; dot <=
    * dims·|c|·1500; |w_d| <= n·|c|·dot. At scale = 1e3, dims <= 512,
    * |x| <= 16, n <= `maxRows` = 1e8: w <= ~8e17 < 2^63. The per-round
    * driver traffic is dims longs — dimension-bounded like the k-means
    * centroid collect.
    *
    * Scale shape per round: ONE map-side-combined (dim)-keyed aggregate
    * over the posexploded centered vectors (shuffle = partitions·dims
    * partials), no lineage between rounds (literal v vector each round).
    * Returns per-vector milli-quantized projections onto the component,
    * the component itself, and the per-dim mean.
    */
  final case class TopComponent(projections: DataFrame,
      component: Seq[Long], mean: Seq[Long], release: () => Unit)

  /** "All-but-the-top" APPLY half: residual embeddings with the
    * [[powerIteration]] component projected out, division-free —
    * r' = vv·c − (c·v)·v where vv = ‖v‖² (the vv scaling is
    * cosine-invariant, so downstream similarity search is unchanged
    * while every value stays an EXACT integer; a division would
    * re-introduce per-element truncation choices). Every element is
    * bounded by ~4e11 ≪ 2^53, so the residuals cast to double exactly
    * and external engines replay the whole chain bit-for-bit. Returns
    * (vec_id, residual: array<long>) plus the release handle.
    */
  def abttResiduals(vectors: DataFrame, idCol: String, vecCol: String,
      rounds: Int): (DataFrame, () => Unit) = {
    val tc = powerIteration(vectors, idCol, vecCol, rounds)
    val litV = array(tc.component.map(lit): _*)
    val litMu = array(tc.mean.map(lit): _*)
    val vv = tc.component.map(x => x * x).sum
    val q = vectors.select(col(idCol).cast("long").as("vec_id"),
      graft.ops.KMeans.quantize(col(vecCol), 1e3).as("qv"))
    val out = q
      .select(col("vec_id"),
        zip_with(col("qv"), litMu, (x, m) => x - m).as("cv"))
      .select(col("vec_id"), col("cv"),
        aggregate(zip_with(col("cv"), litV, (x, y) => x * y), lit(0L),
          _ + _).as("dt"))
      .select(col("vec_id"),
        zip_with(col("cv"), litV,
          (x, vd) => lit(vv) * x - col("dt") * vd).as("residual"))
    (out, tc.release)
  }

  def powerIteration(vectors: DataFrame, idCol: String, vecCol: String,
      rounds: Int, maxRows: Long = 100L * 1000 * 1000): TopComponent = {
    require(rounds >= 1 && rounds <= 16, "rounds in [1, 16]")
    val scale = 1e3
    val dims = vectors.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(dims >= 1 && dims <= 512, "dims in [1, 512]")
    val q = vectors
      .select(col(idCol).cast("long").as("vec_id"),
        graft.ops.KMeans.quantize(col(vecCol), scale).as("qv"))
      .persist()
    val n = q.count()
    require(n >= 1 && n <= maxRows,
      s"powerIteration over $n rows exceeds maxRows=$maxRows — the " +
        "integer overflow audit is sized for 1e8 rows at milli scale; " +
        "shard the corpus or raise the bound deliberately")
    // per-dim truncating mean (exact; matches DuckDB sum(v) // n) —
    // elementwise vec_sum, no ×dims melt (see SigAggregators scaladoc)
    val mu: Seq[Long] = q
      .where(col("qv").isNotNull) // explode-of-null parity
      .agg(graft.functions.SigAggregators.vec_sum(col("qv")).as("s"))
      .head().getSeq[Long](0).map(_ / n).toSeq
    def centered: Column =
      zip_with(col("qv"), array(mu.map(lit): _*), (x, m) => x - m)
    def isqrt(x: Long): Long = {
      // the shared corrected kernel equals plain floor(IEEE sqrt) below
      // 2^52 (this trainer's audited envelope — keep the loud check)
      require(x >= 0 && x < (1L << 52), "isqrt domain")
      isqrtScalar(x)
    }
    var v: Seq[Long] = Seq.fill(dims)(1000L)
    for (_ <- 1 to rounds) {
      // one-pass round statistics (dot + weighted accumulation inside
      // the aggregator): the old `select(dot, posexplode(centered))`
      // shape collapsed the interpreted dot fold ABOVE the generator and
      // re-ran it ×dims per row — see PowerIterAggregator's scaladoc
      val w: Seq[Long] = q
        .where(col("qv").isNotNull) // explode-of-null parity
        .agg(graft.functions.SigAggregators.power_iter_round(mu, v)(
          col("qv")).as("w"))
        .head().getSeq[Long](0).toSeq
      val s = math.max(w.map(math.abs).max, 1L)
      // w·1000 can pass 2^63 — BigInt replays DuckDB's HUGEINT exactly
      // (both truncate toward zero)
      val wp = w.map(x => (BigInt(x) * 1000 / BigInt(s)).toLong)
      val nv = math.max(isqrt(wp.map(x => x * x).sum), 1L)
      v = wp.map(x => x * 1000 / nv)
    }
    val projDf = q
      .select(col("vec_id"),
        aggregate(zip_with(centered, array(v.map(lit): _*),
          (x, y) => x * y), lit(0L), _ + _).as("dt"))
      .select(col("vec_id"), expr("dt div 1000").as("proj_milli"))
    TopComponent(projDf, v, mu, () => { q.unpersist(); () })
  }

  /** MMR (Maximal Marginal Relevance, Carbonell & Goldstein 1998)
    * re-ranking — the diversification pass between retrieval and a RAG
    * prompt or annotation batch: greedily pick `k` of each query's
    * `topC` candidates maximizing
    *
    *   λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)
    *
    * (λ in ppm; the first pick reduces to argmax rel since the penalty
    * over an empty selection is 0). Everything rides the integer-exact
    * chain: rel is [[bruteTopKExact]]'s `cos_x1m`, pairwise candidate
    * sims are the same [[exactCosX1m]] micro-units, and the MMR score is
    * `λ·rel − (10⁶−λ)·pen` (|score| ≤ 2·10¹², inside a long) — the
    * greedy argmax is therefore bit-reproducible on any engine; ties
    * break to the larger candidate id (struct-max ordering), pinned in
    * the oracle.
    *
    * Scale shape: retrieval is the k-bounded TopKAgg chain; pairwise
    * sims join the candidate lists to themselves PER QUERY (≤ C(C−1)/2
    * rows per query — never corpus×corpus); the greedy loop is a
    * k-round `aggregate()` fold over the per-query candidate/sim arrays,
    * pure codegen'd expression work on ≤ topC + topC² bounded state —
    * no iterative jobs, no window, no driver loop. Returns
    * (query_id, mmr_rank, vec_id, mmr_score).
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, k: Int, topC: Int,
      lambdaPpm: Long, scale: Double = 1e5): DataFrame = {
    require(k >= 1 && topC >= k && topC <= 64, "need 1 <= k <= topC <= 64")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L, "lambdaPpm in [0, 1e6]")
    val cands = bruteTopKExact(corpus, queries, topC, scale)
    val (cq, cr) = quantized(col("embedding"), scale)
    val cv = corpus.select(col("vec_id"), cq.as("qv"), cr.as("r"))
    val withVec = cands.select("query_id", "vec_id").join(cv, Seq("vec_id"))
    val x = withVec.select(col("query_id"), col("vec_id").as("a"),
      col("qv").as("aq"), col("r").as("ar"))
    val y = withVec.select(col("query_id"), col("vec_id").as("b"),
      col("qv").as("bq"), col("r").as("br"))
    val pairs = x.join(y, Seq("query_id")).where(col("a") < col("b"))
      .select(col("query_id"), col("a"), col("b"),
        exactCosX1m(graft.functions.GraftFunctions.long_dot(
          col("aq"), col("bq")), col("ar"), col("br")).as("s"))
    val cs = cands.groupBy("query_id")
      .agg(collect_list(struct(col("vec_id").as("id"),
        col("cos_x1m").as("rel"))).as("cs"))
    val ss = pairs.groupBy("query_id")
      .agg(collect_list(struct(col("a"), col("b"), col("s"))).as("ss"))
    val joined = cs.join(ss, Seq("query_id"), "left")
      .withColumn("ss", coalesce(col("ss"),
        array().cast("array<struct<a:bigint,b:bigint,s:bigint>>")))
    val init = struct(
      array().cast("array<bigint>").as("sel"),
      array().cast("array<struct<r:int,id:bigint,m:bigint>>").as("out"))
    val folded = aggregate(sequence(lit(1), lit(k)), init, (acc, rnd) => {
      val sel = acc.getField("sel")
      val scoredArr = transform(
        filter(col("cs"), c => !array_contains(sel, c.getField("id"))),
        c => {
          val pen = coalesce(array_max(transform(
            filter(col("ss"), p =>
              (p.getField("a") === c.getField("id") &&
                array_contains(sel, p.getField("b"))) ||
              (p.getField("b") === c.getField("id") &&
                array_contains(sel, p.getField("a")))),
            p => p.getField("s"))), lit(0L))
          struct(
            (lit(lambdaPpm) * c.getField("rel") -
              (lit(1000000L) - lit(lambdaPpm)) * pen).as("m"),
            c.getField("id").as("id"))
        })
      val pick = array_max(scoredArr)
      when(pick.isNull, acc).otherwise(struct(
        array_append(sel, pick.getField("id")).as("sel"),
        array_append(acc.getField("out"), struct(rnd.as("r"),
          pick.getField("id").as("id"), pick.getField("m").as("m")))
          .as("out")))
    })
    joined.select(col("query_id"), explode(folded.getField("out")).as("e"))
      .select(col("query_id"), col("e.r").as("mmr_rank"),
        col("e.id").as("vec_id"), col("e.m").as("mmr_score"))
  }

  /** Similarity-ordered training curriculum (in-context pretraining, Shi
    * et al. 2023): within each IVF cell, order documents along a greedy
    * nearest-neighbor chain so adjacent training examples are
    * semantically related — the shard-local reading order an ICP loader
    * consumes. Input is an [[ivfExactCells]] assignment
    * (vec_id, qv, v_r, cell); output (cell, pos, vec_id) with pos the
    * 1-based chain position.
    *
    * Chain rule, fully pinned for engine replay: the anchor is the cell's
    * LOWEST vec_id; each step moves to the unvisited member with the
    * highest exact integer cosine to the CURRENT member —
    * `(dot·10⁶) / (r_a·r_b)` in the [[exactCosX1m]] micro-units, plain
    * long division (truncation ≡ Spark `div` ≡ DuckDB `//`, verified
    * incl. negatives) — ties to the lowest vec_id. Every quantity is
    * integer, so the chain is bit-identical on any engine, partitioning,
    * or parallelism.
    *
    * Scale shape: ONE shuffle (groupByKey on cell), then each cell chains
    * independently inside `flatMapGroups` — per-cell O(m²·d) integer dots
    * with m bounded by `maxCellSize` (a LOUD require, not a silent cap:
    * at 100 TB pick the centroid count so cells land in the 1-4k range,
    * C ≈ N/2048 — the [[semanticDedupPairs]] in-cell discipline). There
    * is never a global sort and never a doc×doc shuffle; the final
    * curriculum is written `partitionBy(cell)` like [[graft.ops.Sampling
    * .epochOrder]]'s shard files.
    */
  def icpOrder(cells: DataFrame, maxCellSize: Int = 8192): DataFrame = {
    require(maxCellSize >= 1, "maxCellSize must be positive")
    val spark = cells.sparkSession
    import spark.implicits._
    cells.select(col("cell").cast("long"), col("vec_id").cast("long"),
        col("qv"), col("v_r").cast("long"))
      .as[(Long, Long, Array[Long], Long)]
      .groupByKey(_._1)
      .flatMapGroups { (cell: Long, it: Iterator[(Long, Long, Array[Long], Long)]) =>
        val m = it.toArray.sortBy(_._2) // vec_id asc — scan order IS the tie pin
        require(m.length <= maxCellSize,
          s"cell $cell has ${m.length} members > maxCellSize=$maxCellSize" +
            " — raise the centroid count so cells stay bounded")
        val n = m.length
        val visited = new Array[Boolean](n)
        val order = new Array[Int](n)
        visited(0) = true // anchor: lowest vec_id
        var cur = 0
        var step = 1
        while (step < n) {
          var best = -1
          var bestCos = Long.MinValue
          val qc = m(cur)._3
          val rc = m(cur)._4
          var j = 0
          while (j < n) {
            if (!visited(j)) {
              val qb = m(j)._3
              var dot = 0L
              var i = 0
              while (i < qc.length) { dot += qc(i) * qb(i); i += 1 }
              val den = rc * m(j)._4
              // zero-norm members never reach here (ivfExactCells drops
              // null-cosine vectors); den > 0 by construction
              val cos = if (den == 0L) Long.MinValue else dot * 1000000L / den
              if (best == -1 || cos > bestCos) { bestCos = cos; best = j }
            }
            j += 1
          }
          visited(best) = true
          order(step) = best
          cur = best
          step += 1
        }
        (0 until n).iterator.map(p => (cell, (p + 1).toLong, m(order(p))._2))
      }
      .toDF("cell", "pos", "vec_id")
  }

}
