package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means — the trainer for the IVF index
  * ([[VectorOps]] probes cells; this learns them).
  *
  * Reproducibility is the design driver: floating-point sums re-associate
  * with partition order, so a float-accumulating trainer produces different
  * centroids under AQE re-plans, task retry, or a different partition
  * count. This trainer therefore runs in FIXED-POINT INTEGER arithmetic:
  * vectors are quantized once to longs (`floor(x·scale + 0.5)`), distances
  * and centroid sums are exact integer math (order-free), and centroid
  * updates use truncating integer division — bit-identical results on any
  * cluster layout, any engine (the DuckDB oracle replays it exactly), any
  * retry. Quantization error is 1/scale per dimension (1e-6 default) —
  * far below any embedding's meaningful precision.
  *
  * Scale shape per iteration: one broadcast of k centroids into a
  * map-side-combined argmin aggregation (shuffle carries k·dims partials
  * per partition, not n·k rows), one posexplode + (cid, dim) sum, one
  * k·dims driver collect (k=1024, dims=1024 → 8 MB — dimension-bounded,
  * like the feature-universe collect). No iteration-to-iteration lineage:
  * each round rebuilds from the quantized cache + a literal centroid table.
  *
  * Ties and degenerate cases are pinned: argmin breaks ties by lowest
  * centroid id (`min(struct(dist, cid))`), empty clusters are dropped for
  * subsequent rounds (documented, engine-reproducible).
  */
object KMeans {

  /** Fixed-point quantization of a float/double vector to `array<long>`. */
  def quantize(vec: Column, scale: Double): Column =
    transform(vec, x => floor(x.cast("double") * lit(scale) + lit(0.5)))

  /** Exact squared L2 distance between two `array<long>` columns — the
    * codegen'd [[graft.functions.LongVectorDist2]] expression (bit-identical
    * to the HOF fold [[qdist2Hof]]; integer math is order-free).
    */
  def qdist2(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.long_dist2(a, b)

  /** Built-ins-only reference implementation of [[qdist2]] (kept for parity
    * testing, like [[VectorOps.dotHof]]).
    */
  def qdist2Hof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  final case class Result(assignments: DataFrame,
      centroids: Seq[(Int, Seq[Long])], release: () => Unit)

  /** Argmin over a DRIVER-SIDE codebook as a zero-shuffle projection: one
    * codegen'd [[qdist2]] per (row, centroid) against a literal centroid
    * vector, `array_min` over the (d, cid) structs — identical ordering
    * semantics to the former `min(struct(d, cid))` aggregation (lowest
    * distance, ties → lowest cid), with NO broadcast join and NO
    * `groupBy(vec_id)` re-shuffle of the corpus (guide §2.4: the k
    * centroid-scored copies of every vector used to be collapsed by a
    * full-corpus map-side-combined shuffle; now nothing ever fans out).
    */
  private def argminCid(vec: Column, cs: Seq[(Int, Seq[Long])]): Column =
    array_min(array(cs.map { case (cid, cv) =>
      struct(qdist2(vec, typedlit(cv)).as("d"), lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** Literal-codebook expression size guard: k·dims literal cells per
    * argmin projection. Far past this, generated code size (Janino) and
    * driver plan size become their own cost — callers above it keep the
    * broadcast-join form. 2^16 cells ≈ k=1024 at dims=64.
    */
  private val MaxLiteralCells = 1L << 16

  /** Train `iters` rounds of Lloyd's algorithm over `vectors`
    * (`idCol`: long, `vecCol`: array<float|double>); initial centroids are
    * the k lowest-id vectors (deterministic). Returns the final
    * assignments (vec_id, cluster) — computed against the LAST round's
    * centroids — plus the quantized centroids themselves.
    */
  def fit(vectors: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Double = 1e6,
      maxCentroidCells: Long = 8L * 1000 * 1000): Result = {
    require(k >= 1 && iters >= 1, "k and iters must be positive")
    val dims = vectors.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(k.toLong * dims <= maxCentroidCells,
      s"k-means got k*dims = $k*$dims = ${k.toLong * dims} centroid cells > " +
        s"maxCentroidCells=$maxCentroidCells; each round collects one " +
        "(cluster, dim) row per cell onto the driver — at k=2^18, dims=1024 " +
        "that is ~270M rows. Shard the corpus and train per shard, use PQ " +
        "sub-space trainers (pqEncode: m independent k'-sized codebooks), " +
        "or raise the bound deliberately on a driver sized for it")
    val spark = vectors.sparkSession
    import spark.implicits._
    val q = vectors
      .select(col(idCol).cast("long").as("vec_id"),
        quantize(col(vecCol), scale).as("qv"))
      .persist()

    var centroids: Seq[(Int, Seq[Long])] = q.orderBy("vec_id").limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Long](1).toSeq }.toSeq

    // assignment as a PROJECTION when the codebook fits the literal
    // budget (every gate regime: k ≤ 64): zero shuffle per round, vs the
    // old crossJoin(broadcast) + groupBy(vec_id) which re-shuffled the
    // whole quantized corpus once per Lloyd's round (guide §2.4). The
    // join form is kept for codebooks past the literal budget (and for
    // the degenerate empty-corpus case, where there is no literal array
    // to build).
    def literalOk(cs: Seq[(Int, Seq[Long])]): Boolean =
      cs.nonEmpty && k.toLong * dims <= MaxLiteralCells

    def assignJoin(cs: Seq[(Int, Seq[Long])]): DataFrame = {
      val cdf = cs.toDF("cid", "cv")
      q.crossJoin(broadcast(cdf))
        .select(col("vec_id"), col("qv"),
          struct(qdist2(col("qv"), col("cv")).as("d"), col("cid").as("cid"))
            .as("s"))
        .groupBy("vec_id")
        .agg(min(col("s")).getField("cid").as("cluster"),
          first(col("qv")).as("qv")) // constant within the group
    }

    var lastIterations = 0
    while (lastIterations < iters) {
      // per-round statistics: ONE pass over the cached corpus — the
      // argmin as a grouping expression (evaluated once per row by the
      // hash aggregate) and the centroid sums as the elementwise
      // [[graft.functions.SigAggregators.vec_sum]] buffer, so nothing is
      // melted ×dims (see vec_sum's scaladoc for the generator-collapse
      // hazard the old posexplode shape hit)
      val sums: Seq[(Int, Seq[Long], Long)] =
        if (literalOk(centroids))
          // null-qv rows contribute neither sums nor counts — exactly
          // the melted shape (posexplode of a null array emits no rows)
          q.where(col("qv").isNotNull)
            .groupBy(argminCid(col("qv"), centroids).as("cluster"))
            .agg(graft.functions.SigAggregators.vec_sum(col("qv")).as("sm"),
              count(lit(1)).as("n"))
            .collect()
            .map(r => (r.getInt(0), r.getSeq[Long](1), r.getLong(2)))
            .toSeq
        else
          assignJoin(centroids)
            .select(col("cluster"), posexplode(col("qv")).as(Seq("dim", "v")))
            .groupBy("cluster", "dim")
            .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
            .collect()
            .groupBy(_.getInt(0)).toSeq.map { case (cid, rows) =>
              (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq,
                rows.head.getLong(3))
            }
      centroids = sums.sortBy(_._1).map { case (cid, sm, n) =>
        // truncating long division == DuckDB's `//` == Spark SQL DIV
        cid -> sm.map(_ / n).toSeq
      }.toSeq
      lastIterations += 1
    }
    val assignments =
      if (literalOk(centroids))
        q.select(col("vec_id"), argminCid(col("qv"), centroids).as("cluster"))
      else assignJoin(centroids).select("vec_id", "cluster")
    Result(assignments, centroids, () => { q.unpersist(); () })
  }

  /** Product quantization: split each vector into `m` contiguous
    * sub-vectors, train an INDEPENDENT fixed-point codebook per sub-space
    * ([[fit]]), and emit each vector's per-sub-space cluster ids as its
    * compressed code — m·log₂(k) bits per vector instead of dims·32
    * (64-dim float → 2 bytes at m=2, k=256). The standard ANN compression;
    * asymmetric-distance search then scans codes with per-query lookup
    * tables. Inherits [[fit]]'s bit-reproducibility: the whole encoding is
    * deterministic under any partitioning, and the DuckDB oracle replays
    * every sub-space trainer exactly. Returns (vec_id, code0..code{m-1}).
    */
  def pqEncode(vectors: DataFrame, idCol: String, vecCol: String, m: Int,
      k: Int, iters: Int, scale: Double = 1e6): DataFrame =
    pqEncodeDetailed(vectors, idCol, vecCol, m, k, iters, scale).codes

  final case class PqModel(codes: DataFrame,
      codebooks: Seq[(Int, Seq[(Int, Seq[Long])])], subDims: Int)

  /** [[pqEncode]] plus the trained sub-space codebooks (quantized centroid
    * vectors) — the model [[pqSearchAdc]] scans with.
    *
    * All `m` sub-space trainers run FUSED over ONE quantized corpus cache
    * (slicing commutes with the elementwise quantize, so `slice(quantize(v))
    * == quantize(slice(v))` cell-for-cell): per Lloyd's round, every
    * sub-space's argmin is a zero-shuffle literal-codebook projection
    * ([[argminCid]]) and all sub-spaces share ONE (sub, cluster, dim)
    * partial-aggregated collect — m·iters trainer jobs collapse to iters,
    * the m per-sub `localCheckpoint`s and the (m−1)-way code join collapse
    * to a single final projection (guide §1.2 step 1 / §2.4). Each
    * sub-space's math — init (k lowest-id vectors' slices), integer argmin
    * with ties → lowest cid, exact integer sums, truncating division,
    * empty-cluster drop — is unchanged, so codebooks and codes are
    * bit-identical to the former independent-[[fit]] composition (the
    * oracle replays the independent trainers and still matches).
    */
  def pqEncodeDetailed(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int, scale: Double = 1e6): PqModel = {
    require(k >= 1 && iters >= 1, "k and iters must be positive")
    val dims = vectors.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    require(k.toLong * dims <= MaxLiteralCells,
      s"pqEncode got k*dims = $k*$dims > $MaxLiteralCells literal cells — " +
        "past the literal-codebook budget; split the corpus or lower k")
    val d = dims / m
    val q = vectors
      .select(col(idCol).cast("long").as("vec_id"),
        quantize(col(vecCol), scale).as("qv"))
      .persist()
    // init: the k lowest-id vectors, sliced per sub-space — one collect
    // for all m trainers (identical to each fit's own init on its slice)
    val initRows = q.orderBy("vec_id").limit(k).collect()
    if (initRows.isEmpty) {
      // degenerate empty corpus: empty codes with the regular schema,
      // empty codebooks — what the per-sub fit composition produced
      val codes = q.where(lit(false))
        .select(col("vec_id") +: (0 until m).map(s =>
          lit(0).as(s"code$s")): _*)
        .localCheckpoint()
      q.unpersist()
      return PqModel(codes, (0 until m).map(s => s -> Seq.empty), d)
    }
    var books: Seq[Seq[(Int, Seq[Long])]] = (0 until m).map { s =>
      initRows.zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Long](1).slice(s * d, (s + 1) * d).toSeq
      }.toSeq
    }
    def subCol(s: Int): Column = slice(col("qv"), s * d + 1, d)
    for (_ <- 1 to iters) {
      // one job per round for ALL sub-spaces: the m (sub, cluster, slice)
      // structs are built INSIDE the generator (a generator's own
      // expression is evaluated once per input row — a projection NEXT TO
      // a generator is collapsed above it and re-evaluated per output
      // row, the hazard vec_sum's scaladoc records), then one
      // (sub, cluster)-keyed elementwise vec_sum — m rows per vector,
      // never a ×dims melt
      val subStructs = array((0 until m).map { s =>
        struct(lit(s).as("sub"), argminCid(subCol(s), books(s)).as("cluster"),
          subCol(s).as("sl"))
      }: _*)
      val sums = q
        .select(explode(subStructs).as("sc"))
        .select(col("sc.sub").as("sub"), col("sc.cluster").as("cluster"),
          col("sc.sl").as("sl"))
        // null-slice rows (null vector) contribute neither sums nor
        // counts — the melted shape's explode-of-null semantics
        .where(col("sl").isNotNull)
        .groupBy("sub", "cluster")
        .agg(graft.functions.SigAggregators.vec_sum(col("sl")).as("sm"),
          count(lit(1)).as("n"))
        .collect()
      books = (0 until m).map { s =>
        sums.filter(_.getInt(0) == s)
          .map(r => (r.getInt(1), r.getSeq[Long](2), r.getLong(3)))
          .sortBy(_._1).map { case (cid, sm, n) =>
            // truncating long division == DuckDB `//` == Spark SQL DIV
            cid -> sm.map(_ / n).toSeq
          }.toSeq
      }
    }
    // final codes: one zero-shuffle projection (was: m assign shuffles +
    // m localCheckpoints + an (m-1)-way join); checkpointed because the
    // search gates scan the code table repeatedly (PlanTap so the audit
    // tools can still dump the pre-checkpoint trainer plan — VERDICT r16
    // item 8)
    val codes = graft.util.PlanTap.local(
      q.select(col("vec_id") +: (0 until m).map(s =>
        argminCid(subCol(s), books(s)).as(s"code$s")): _*),
      "pq-codes")
    q.unpersist()
    PqModel(codes, (0 until m).map(s => s -> books(s)), d)
  }

  /** Persist a PQ model in the SERVING layout — codes as a parquet table,
    * codebooks + sub-dims as tiny metadata tables. The ANN analog of
    * [[VectorOps.saveIvfIndex]]: train once, serve every later query batch
    * via [[loadPqModel]] + [[pqSearchAdc]]/[[ivfPqSearchAdc]] without
    * re-running the sub-space trainers (the dominant cost — the search
    * stage itself is a code-table scan).
    */
  def savePqModel(path: String, model: PqModel): Unit = {
    val spark = model.codes.sparkSession
    import spark.implicits._
    model.codes.write.mode("overwrite").parquet(s"$path/codes")
    val rows = for {
      (s, cents) <- model.codebooks
      (cid, cv) <- cents
    } yield (s, cid, cv)
    rows.toDF("sub", "cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebooks")
    Seq(model.subDims).toDF("sub_dims").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Per-vector PQ reconstruction error — the quantization-quality dial
    * that decides m/k for a corpus (the PQ analog of
    * [[VectorOps.recallAtK]]): exact integer Σ‖sub − codeword‖² across
    * sub-spaces, in quantized units (scale² · float-space MSE). All
    * arithmetic inherits [[fit]]'s fixed-point discipline, so the error
    * surface is engine- and partitioning-exact.
    *
    * Scale shape: per sub-space, one broadcast codebook join onto the
    * (vec_id, code) frame + one codegen'd integer distance — linear in
    * vectors, no shuffle beyond the code join; the m sub-frames equi-join
    * back on vec_id.
    */
  def pqReconstructionError(vectors: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int, iters: Int,
      scale: Double = 1e6): DataFrame = {
    val model = pqEncodeDetailed(vectors, idCol, vecCol, m, k, iters, scale)
    val d = model.subDims
    // per sub-space: re-derive the code in-row (identical integer argmin
    // over the same literal codebook → identical cid, deterministically)
    // and look the codeword up in a literal map — the former shape paid a
    // corpus equi-join onto the code table plus a broadcast codebook join
    // PER SUB-SPACE and an (m−1)-way join to sum the errors; this is one
    // zero-shuffle projection (guide §2.4)
    // stage the quantize transform once per row (the quantizedStaged
    // discipline: a HOF Column is re-inlined at every reference site);
    // the per-sub slices of the materialized attribute are cheap codegen
    val q0 = vectors.select(col(idCol).cast("long").as("vec_id"),
      quantize(col(vecCol), scale).as("qv"))
    val errCols = model.codebooks.map { case (s, cents) =>
      val sub = slice(col("qv"), s * d + 1, d)
      val cwMap = map(cents.flatMap { case (cid, cv) =>
        Seq(lit(cid), typedlit(cv))
      }: _*)
      qdist2(sub, element_at(cwMap, argminCid(sub, cents)))
    }
    q0.select(col("vec_id"), errCols.reduce(_ + _).as("err2"))
  }

  /** Load a [[savePqModel]] layout. The codebook collect is m·k-bounded
    * (the LUT build needs it driver-side anyway); codes stay distributed.
    */
  def loadPqModel(spark: org.apache.spark.sql.SparkSession,
      path: String): PqModel = {
    val codes = spark.read.parquet(s"$path/codes")
    val cb = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, rs) =>
        s -> rs.sortBy(_._2).map(t => (t._2, t._3)).toSeq
      }
    val subDims = spark.read.parquet(s"$path/meta").head().getInt(0)
    PqModel(codes, cb, subDims)
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: per query, the
    * distance to each sub-space centroid is computed ONCE into a lookup
    * table (nq·m·k entries, driver-built from the tiny codebooks and
    * broadcast), then every corpus vector's estimated distance is just m
    * table lookups summed — the compressed scan never touches the original
    * vectors. All integer math on the quantized grid, so ranking is
    * deterministic (ties by vec_id) and engine-reproducible. Returns
    * (query_id, vec_id, adc_d2, rnk <= topK).
    *
    * `maxQueryBatch` is a HARD bound, not advice: the code-melt join
    * replicates every corpus code row once per matching LUT entry, i.e.
    * the compressed corpus flows through the distance aggregation
    * ×nQueries (map-side combined, but still scanned). The LUT itself is
    * driver-built and broadcast at nq·m·k rows. Both grow linearly in the
    * batch — a million-query workload must loop over batches (each batch
    * is one job; the codes frame is reusable across batches), not widen
    * one.
    */
  def pqSearchAdc(model: PqModel, queries: DataFrame, idCol: String,
      vecCol: String, topK: Int, scale: Double = 1e6,
      maxQueryBatch: Int = 1024): DataFrame = {
    val tdf = adcLut(model, queries, idCol, vecCol, scale, maxQueryBatch)
    val scored = meltedCodes(model).join(broadcast(tdf), Seq("sub", "code"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("d2")).as("adc_d2"))
    rankTopK(scored, topK)
  }

  /** Integer-exact reconstructed-vector COSINE search over PQ codes — the
    * ADC variant that bitext margin mining composes over
    * ([[VectorOps.marginPairsExact]] is kNN-backend-agnostic; this gives
    * it the compressed-serving backend). Per (query, sub-space, codeword)
    * the broadcast LUT carries the exact integer DOT of the quantized
    * query slice against the codeword (not the squared distance the
    * distance-ADC scan uses), each candidate's reconstructed norm² is the
    * sum of its codewords' exact norms², and
    * `cos_x1m = (dot·10⁶) div (rq·rv)` is the same truncating integer
    * cosine as the brute/IVF exact chains — the whole composition replays
    * bit-for-bit on any 64-bit-integer engine. `scale` defaults to 1e5
    * (the exact-chain envelope: dot·10⁶ stays inside a signed long at 64
    * dims), NOT the 1e6 of the distance-ADC gates — train the model at
    * the same scale. Corpus side restricted to `corpusIds` (semi join);
    * self-matches dropped; zero-norm sides → NULL cos → excluded, the
    * standard policy. Returns (query_id, rank, vec_id, cos_x1m), top-k
    * per query by (cos desc, vec_id asc), k-bounded agg — never a window.
    */
  def pqSearchCosExact(model: PqModel, corpusIds: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, topK: Int,
      scale: Double = 1e5, maxQueryBatch: Int = 1024): DataFrame = {
    val spark = model.codes.sparkSession
    import spark.implicits._
    val d = model.subDims
    val qrows = queries
      .select(col(idCol).cast("long").as("query_id"),
        quantize(col(vecCol), scale).as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    require(qrows.length <= maxQueryBatch,
      s"cos-ADC search got ${qrows.length} queries > " +
        s"maxQueryBatch=$maxQueryBatch — run batches in a loop")
    // exact integer sqrt — the ONE shared scalar kernel
    def isqrtL(p: Long): Long = VectorOps.isqrtScalar(p)
    // per-query LUT row: (query_id, rq, dots[sub][code]) — the code id
    // indexes straight into the array, so scoring each (vector, query)
    // pair is m element_at lookups in WHOLE-STAGE CODEGEN. A melted
    // (sub, code) equi-join + re-aggregate would shuffle |corpus|·nq·m
    // rows to reassemble what the code columns already hold per row —
    // measured 39× at a 10× both-sides probe vs this shape's brute-gate
    // profile.
    val lutRows = qrows.toSeq.map { case (qid, qv) =>
      val rq = isqrtL(qv.map(x => x * x).sum)
      val dots: Seq[Seq[Long]] = model.codebooks.map { case (s, cents) =>
        val sub = qv.slice(s * d, (s + 1) * d)
        cents.sortBy(_._1)
          .map(_._2.zip(sub).map { case (b, a) => a * b }.sum)
      }
      (qid, rq, dots)
    }
    val tdf = lutRows.toDF("query_id", "rq", "dots")
    // codeword norms² are model constants: literal arrays, zero joins
    val n2v = model.codebooks.map { case (s, cents) =>
      element_at(array(cents.sortBy(_._1)
        .map(c => lit(c._2.map(x => x * x).sum)): _*),
        col(s"code$s").cast("int") + 1)
    }.reduce(_ + _)
    val dot = model.codebooks.indices.map { s =>
      element_at(element_at(col("dots"), s + 1),
        col(s"code$s").cast("int") + 1)
    }.reduce(_ + _)
    val scored = model.codes
      .join(corpusIds.select(col("vec_id")).distinct(), Seq("vec_id"),
        "left_semi")
      .withColumn("rv", VectorOps.isqrt(n2v))
      .crossJoin(broadcast(tdf))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_x1m", call_function("div",
        dot * lit(1000000L), nullif(col("rq") * col("rv"), lit(0L))))
      .select("query_id", "vec_id", "cos_x1m")
    VectorOps.topKPerQueryExact(scored, topK)
  }

  /** IVF-PQ: the billion-scale ANN composition — a coarse quantizer
    * restricts each query's ADC scan to its `nprobe` nearest cells, so the
    * per-query work is ~|corpus|·nprobe/K code lookups instead of the whole
    * compressed corpus. `cells` is the coarse assignment
    * ([[VectorOps.assignCells]]: vec_id, cell), `centroids` the coarse
    * centroid table (centroid_id, centroid_vec) — the probe selection is
    * the same bounded top-k as [[VectorOps.ivfTopK]] (cosine, ties → lowest
    * centroid id, Window-free). The candidate restriction happens BEFORE
    * the per-query LUT join, so non-probed cells' codes are never
    * replicated. Approximate like IVF: recall < 1 when true neighbors live
    * outside probed cells. Returns (query_id, vec_id, adc_d2, rnk <= topK).
    */
  def ivfPqSearchAdc(model: PqModel, cells: DataFrame, centroids: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, topK: Int,
      nprobe: Int, scale: Double = 1e6, maxQueryBatch: Int = 1024): DataFrame = {
    val topP = graft.functions.TopKAgg.smallest_k(nprobe)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("c_cos", VectorOps.cosine(col(vecCol), col("centroid_vec")))
      .where(col("c_cos").isNotNull)
      .groupBy(col(idCol))
      .agg(topP(negate(col("c_cos")), col("centroid_id").cast("long"),
        col("c_cos")).as("top"))
      .select(col(idCol).cast("long").as("query_id"),
        explode(col("top")).as("e"))
      .select(col("query_id"), col("e.id").as("cell"))
    val tdf = adcLut(model, queries, idCol, vecCol, scale, maxQueryBatch)
    val candidates = meltedCodes(model)
      .join(cells.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .join(broadcast(probes), Seq("cell"))
    val scored = candidates
      .join(broadcast(tdf), Seq("query_id", "sub", "code"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("d2")).as("adc_d2"))
    rankTopK(scored, topK)
  }

  /** Per-(query, sub-space, centroid) integer distance lookup table:
    * nq·m·k rows, driver-built from the tiny codebooks (broadcast by the
    * callers). `maxQueryBatch` is a HARD bound — see [[pqSearchAdc]].
    */
  private def adcLut(model: PqModel, queries: DataFrame, idCol: String,
      vecCol: String, scale: Double, maxQueryBatch: Int): DataFrame = {
    val spark = model.codes.sparkSession
    import spark.implicits._
    val d = model.subDims
    val qrows = queries
      .select(col(idCol).cast("long").as("query_id"),
        quantize(col(vecCol), scale).as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    require(qrows.length <= maxQueryBatch,
      s"ADC search got ${qrows.length} queries > maxQueryBatch=$maxQueryBatch; " +
        "the ADC scan replicates the corpus codes per query — run batches " +
        "in a loop (or raise the bound deliberately)")
    val table = for {
      (qid, qv) <- qrows.toSeq
      (s, cents) <- model.codebooks
      (cid, cv) <- cents
    } yield {
      val sub = qv.slice(s * d, (s + 1) * d)
      (qid, s, cid, sub.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    table.toDF("query_id", "sub", "code", "d2")
  }

  /** Codes melted long: (vec_id, sub, code). */
  private def meltedCodes(model: PqModel): DataFrame =
    model.codes.select(col("vec_id"),
      posexplode(array((0 until model.codebooks.length)
        .map(s => col(s"code$s")): _*)).as(Seq("sub", "code")))

  /** Bounded per-query top-k over (query_id, vec_id, adc_d2) — exact long
    * keys (no double round-trip), never a row_number window sorting a
    * query's whole scored corpus on one task; see
    * [[graft.functions.TopKAgg]].
    */
  private def rankTopK(scored: DataFrame, topK: Int): DataFrame = {
    val top = graft.functions.TopKAgg.smallest_k_long(topK)
    scored.groupBy("query_id")
      .agg(top(col("adc_d2"), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.id").as("vec_id"),
        col("e.key").as("adc_d2"), (col("pos") + 1).cast("int").as("rnk"))
  }
}
