package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.CorpusLayout

/** The physical-layout contract: bucketed tables join without a shuffle,
  * partitioned directories prune non-matching values out of the scan.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  test("bucketed co-located join plans with no shuffle exchange") {
    val docs = (0L until 200L).map(i => (i, s"doc $i text")).toDF("doc_id", "text")
    val scores = (0L until 200L).map(i => (i, i * 0.01)).toDF("doc_id", "score")
    CorpusLayout.writeBucketed(docs, "layout_docs", "doc_id", buckets = 4)
    CorpusLayout.writeBucketed(scores, "layout_scores", "doc_id", buckets = 4)
    val savedT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val savedA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    // disable broadcast so the join would OTHERWISE be a shuffled SMJ —
    // bucket co-location is what must remove the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = CorpusLayout.table(spark, "layout_docs")
        .join(CorpusLayout.table(spark, "layout_scores"), "doc_id")
      assert(joined.count() == 200)
      assert(!CorpusLayout.hasShuffleExchange(joined),
        "bucketed join must not shuffle:\n" +
          joined.queryExecution.executedPlan.toString.take(2000))
      // sanity: the same join over plain (unbucketed) frames DOES shuffle
      val plain = docs.join(scores, "doc_id")
      plain.count()
      assert(CorpusLayout.hasShuffleExchange(plain),
        "control join should shuffle when unbucketed")
    } finally {
      savedT.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      savedA.fold(spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
      spark.sql("DROP TABLE IF EXISTS layout_docs")
      spark.sql("DROP TABLE IF EXISTS layout_scores")
    }
  }

  test("JSONL roundtrip preserves docs; corrupt lines quarantine, not drop") {
    import graft.sources.JsonlCorpus
    val out = java.nio.file.Files.createTempDirectory("jsonl").toString + "/docs"
    val docs = Seq((1L, "hello world", "en", "src0", 11L),
      (2L, "bonjour", "fr", "src1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    JsonlCorpus.write(docs, out)
    // plant a corrupt line among the part files
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "part-corrupt.json"),
      "{not valid json at all\n".getBytes)
    val (good, bad, release) = JsonlCorpus.readSplit(spark, out)
    try {
      val got = good.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == Set((1L, "hello world", "en"), (2L, "bonjour", "fr")))
      val rejects = bad.collect().map(_.getString(0))
      assert(rejects.length == 1 && rejects.head.startsWith("{not valid"),
        s"corrupt line must be quarantined verbatim: ${rejects.toSeq}")
    } finally release()
  }

  test("fileStats counts rows per physical file from one scan") {
    val out = java.nio.file.Files.createTempDirectory("fstats").toString + "/t"
    (0L until 100L).map(i => (i, s"row $i")).toDF("id", "payload")
      .repartition(4).write.parquet(out)
    val stats = CorpusLayout.fileStats(spark.read.parquet(out))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(stats.length == 4) // one row per part-file
    assert(stats.map(_._2).sum == 100L)
    assert(stats.forall(_._1.endsWith(".parquet")))
  }

  test("compaction merges small files without losing rows") {
    val out = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // 64 tiny files
    (0L until 640L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(64).write.parquet(out)
    val (before, after) = CorpusLayout.compact(spark, out, targetBytes = 1L << 20)
    assert(before == 64 && after < before, s"$before -> $after")
    val back = spark.read.parquet(out)
    assert(back.count() == 640)
    assert(back.agg(sum(col("doc_id"))).head.getLong(0) == 639L * 640 / 2)
  }

  test("partitioned layout prunes the scan by partition value") {
    val out = java.nio.file.Files.createTempDirectory("layout_part").toString
    val docs = Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"),
      (4L, "fr", "d")).toDF("doc_id", "lang", "text")
    CorpusLayout.writePartitioned(docs, out, Seq("lang"))
    // directory structure is the partition encoding
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("lang=")).sorted
    assert(dirs.sameElements(Array("lang=de", "lang=en", "lang=fr")))
    val en = spark.read.parquet(out).where(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"scan must prune on the partition column:\n${plan.take(1500)}")
    assert(en.collect().map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L))
  }

  test("z-order clusters BOTH dimensions; single-column sort only one") {
    // 64×64 grid of (x, y) points — every (x, y) combination exists, so
    // clustering quality is purely a property of the layout, not the data
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong, x * 64L + y)).toDF("x", "y", "payload")
    val zDir = java.nio.file.Files.createTempDirectory("layout_z").toString
    val xDir = java.nio.file.Files.createTempDirectory("layout_x").toString
    CorpusLayout.writeZOrdered(grid, zDir, "x", 0, 64, "y", 0, 64,
      nFiles = 16, bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir) // control: linear sort on x
    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).where(pred)
        .select(input_file_name()).distinct().count()
    val yPred = col("y") >= 10 && col("y") < 14 // selective on the OTHER dim
    val zTouched = filesTouched(zDir, yPred)
    val xTouched = filesTouched(xDir, yPred)
    // linear-on-x spreads a y-slice over every file; z-order concentrates
    // it (16-file layout: a 1/16 y-slice lands in ~4 of 16 z-runs)
    assert(xTouched == 16, s"control layout should spread: $xTouched")
    assert(zTouched <= 8, s"z-order should concentrate the y-slice: $zTouched")
    // and the x dimension stays clustered too (not a plain y-sort)
    val xPred = col("x") >= 10 && col("x") < 14
    assert(filesTouched(zDir, xPred) <= 8,
      s"z-order should also concentrate an x-slice: ${filesTouched(zDir, xPred)}")
    // row fidelity: z-ordering is a permutation, nothing lost
    assert(spark.read.parquet(zDir).agg(sum(col("payload"))).head.getLong(0)
      == grid.agg(sum(col("payload"))).head.getLong(0))
  }

  test("persisted postings index prunes to the query terms' buckets") {
    import graft.ops.Search
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("postings").toString
    val p = Search.postings(docs, "doc_id", "text")
    Search.savePostings(dir, p, buckets = 16)
    // tb= directory layout exists
    val tbDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("tb=")).map(_.getName)
    assert(tbDirs.nonEmpty && tbDirs.length <= 16)
    val loaded = Search.loadPostings(spark, dir)
    val terms = Seq("spark", "query", "join")
    // served result == direct matchAll on the in-memory postings
    val direct = Search.matchAll(p, terms).collect().map(_.getLong(0)).toSet
    val served = Search.matchAllIndexed(loaded, terms, buckets = 16)
      .collect().map(_.getLong(0)).toSet
    assert(served == direct && served.nonEmpty)
    // partition pruning: the scan touches only the terms' buckets' files,
    // not the whole index
    val tbs = terms.map(Search.termBucket(_, 16)).distinct
    val touched = loaded
      .where(col("tb").isin(tbs: _*) && col("term").isin(terms.map(lit): _*))
      .select(input_file_name()).distinct().count()
    val total = loaded.select(input_file_name()).distinct().count()
    assert(touched <= tbs.length, s"touched $touched > ${tbs.length} buckets")
    assert(total > touched, s"pruning should beat the full scan ($total)")
    // the partition filter reaches the scan as a PartitionFilter
    val plan = Search.matchAllIndexed(loaded, terms, buckets = 16)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
    assert(pf.exists(l => l.contains("tb") && !l.contains("PartitionFilters: []")),
      s"partition filter missing: $pf")
  }

  test("persisted IVF index serves identical results without re-assignment") {
    import graft.ops.VectorOps
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroids = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    val queries = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    VectorOps.saveIvfIndex(dir, centroids, VectorOps.assignCells(emb, centroids))
    // build-once layout: the cell assignment is partitioned by cell on
    // disk, so an nprobe-cell probe can prune to those directories
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(cellDirs.length == 4, cellDirs.mkString(","))
    val (cen2, cells2) = VectorOps.loadIvfIndex(spark, dir)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    val direct = key(VectorOps.ivfTopK(emb, centroids, queries, k = 3, nprobe = 2))
    val served = key(VectorOps.ivfTopKIndexed(cells2, cen2, queries, k = 3, nprobe = 2))
    assert(direct == served)
    assert(direct.nonEmpty)
  }

  test("shard export: stable membership, one file per shard, sorted content") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    CorpusLayout.writeShards(docs, dir, col("text"), nShards = 8,
      sortCols = Seq("doc_id"))
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    // membership is exactly the content-hash prediction (engine-portable)
    val predicted = docs.select(col("doc_id"),
        graft.ops.Sampling.hashBucket(col("text"), 8).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val actual = back.select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(actual == predicted)
    // one parquet file per shard directory, rows sorted within it
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == 8)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
      val ids = spark.read.parquet(files(0).getPath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"${d.getName} not sorted")
    }
  }

  test("IVF index append folds a new batch without touching the old corpus") {
    import graft.ops.VectorOps
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroids = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid_vec"))
    val queries = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_app").toString
    // day 0: index the even half; day 1: append the odd half
    VectorOps.saveIvfIndex(dir, centroids,
      VectorOps.assignCells(emb.where(col("vec_id") % 2 === 0), centroids))
    VectorOps.appendToIvfIndex(spark, dir, emb.where(col("vec_id") % 2 === 1))
    val (cen2, cells2) = VectorOps.loadIvfIndex(spark, dir)
    assert(cells2.count() == emb.count()) // nothing lost, nothing doubled
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    // served results over the appended index == one-shot index of everything
    val oneShot = key(VectorOps.ivfTopK(emb, centroids, queries, k = 3, nprobe = 2))
    val served = key(VectorOps.ivfTopKIndexed(cells2, cen2, queries, k = 3, nprobe = 2))
    assert(served == oneShot)
  }

  test("chunk store: byte-exact round-trip, dedup storage, delta append") {
    import graft.io.ChunkStore
    import graft.ops.{Dedup, TextOps}
    val dir = java.nio.file.Files.createTempDirectory("chunkstore").toString
    val para = "the quarterly report shows steady growth across " +
      "all regions with particular strength in the northern market " * 4
    val day0 = Seq(
      (0L, s"intro for doc zero $para"),
      (1L, s"a different opening line here $para"),
      (2L, "an entirely unrelated short document"))
      .toDF("doc_id", "text")
    val chunks0 = Dedup.contentChunks(day0, "doc_id", "text")
    ChunkStore.save(dir, chunks0, buckets = 4)
    // round-trip: reconstruct ∘ chunk ≡ normalize, byte-for-byte
    val rebuilt = ChunkStore.reconstruct(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val want = day0.select(col("doc_id"),
        TextOps.normalize(col("text")).as("nm")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt == want)
    // storage dedup: the shared paragraph's chunks are written once
    val stored0 = spark.read.parquet(s"$dir/chunks").count()
    assert(stored0 < chunks0.count())
    assert(stored0 == chunks0.select("chunk_fp").distinct().count())
    // delta append: an UNCHANGED re-crawl adds zero chunk payloads; an
    // edited doc adds only the chunks its edit touched
    val recrawl = Seq((3L, s"intro for doc zero $para"))
      .toDF("doc_id", "text") // doc 0's exact text under a new id
    ChunkStore.append(spark, dir, Dedup.contentChunks(recrawl,
      "doc_id", "text"), buckets = 4)
    assert(spark.read.parquet(s"$dir/chunks").count() == stored0)
    // RETRY safety: appending the same batch again is a no-op on BOTH
    // sides — duplicated manifest rows would stitch every chunk twice
    val manifest0 = spark.read.parquet(s"$dir/manifest").count()
    ChunkStore.append(spark, dir, Dedup.contentChunks(recrawl,
      "doc_id", "text"), buckets = 4)
    assert(spark.read.parquet(s"$dir/chunks").count() == stored0)
    assert(spark.read.parquet(s"$dir/manifest").count() == manifest0)
    val edited = Seq((4L, s"intro for doc zero EDITED $para"))
      .toDF("doc_id", "text")
    ChunkStore.append(spark, dir, Dedup.contentChunks(edited,
      "doc_id", "text"), buckets = 4)
    val stored1 = spark.read.parquet(s"$dir/chunks").count()
    assert(stored1 > stored0) // the edited head chunk(s) are new...
    assert(stored1 - stored0 < chunks0.where(col("doc_id") === 0).count())
    // ...and the appended docs reconstruct byte-exactly too
    val all = ChunkStore.reconstruct(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(all(3L) == want(0L))
    assert(all(4L) == s"intro for doc zero EDITED $para".trim
      .replaceAll("\\s+", " ").toLowerCase) // the normalize contract
  }

  test("LSH index layout: bucket directories prune the signature scan") {
    import graft.ops.VectorOps
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("lshlayout").toString
    VectorOps.saveLshIndex(dir,
      VectorOps.lshEncode(emb, "vec_id", "embedding", 64, nPlanes = 8))
    // the physical layout IS bucket directories...
    val dirs = new java.io.File(s"$dir/buckets").listFiles()
      .map(_.getName).filter(_.startsWith("bucket="))
    assert(dirs.length > 1, "expected multiple bucket partitions")
    // ...so a probe-set filter reaches the scan as a partition filter —
    // the serve path reads nPlanes+1 directories of 2^nPlanes, never
    // the whole index
    val probed = VectorOps.loadLshIndex(spark, dir)
      .where(col("bucket").isin(1, 2, 3))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket filter must prune the scan:\n${plan.take(1500)}")
    assert(probed.select("bucket").distinct().collect()
      .map(_.getInt(0)).forall(Set(1, 2, 3)))
  }
}
