package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

/** Physical corpus layout for the 100 TB posture: hash-bucketed tables for
  * shuffle-free co-located joins, and value-partitioned directories for
  * partition-pruned scans.
  *
  *  - BUCKETING kills the join shuffle: two tables bucketed by the same
  *    key into the same bucket count sort-merge-join with NO Exchange on
  *    either side — the join that dominates a doc-id-keyed pipeline
  *    (docs ⋈ scores ⋈ annotations) becomes a per-bucket local merge.
  *    LayoutSpec asserts the Exchange-free plan. Spark requires the table
  *    catalog for bucket metadata (`saveAsTable`), so callers set
  *    `spark.sql.warehouse.dir` to the corpus root.
  *  - PARTITIONING prunes the scan: `partitionBy` on low-cardinality
  *    columns (language, source, date) turns `WHERE lang = 'en'` into a
  *    directory skip — the scan never opens non-matching files
  *    (LayoutSpec asserts PartitionFilters in the plan). Keep partition
  *    columns low-cardinality: a high-cardinality partition key produces
  *    the millions-of-tiny-files layout that kills any file index.
  */
object CorpusLayout {

  /** Write `df` as a managed table hash-bucketed (and sorted) by `idCol`. */
  def writeBucketed(df: DataFrame, table: String, idCol: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` under `path` partitioned by `cols` (low-cardinality). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(cols: _*)
      .parquet(path)

  /** Training-shard export: the final "hand the corpus to the trainer"
    * sink. Shard membership is the content hash of `key`
    * ([[graft.ops.Sampling.hashBucket]]) — a pure key function, so the
    * SAME document lands in the SAME shard on every run, every
    * partitioning, every engine (a trainer can resume/compare across
    * exports; `repartition(n)` round-robin cannot promise that). Rows are
    * sorted by `sortCols` within each shard for reproducible file
    * content. One file per shard: all rows of a shard hash-collect into
    * one task, so `shard=K/` holds exactly one parquet file — the fixed
    * fan-in data loaders expect.
    *
    * Shard-size skew equals hash skew (< nShards·2⁻¹⁶ bias) — uniform for
    * any real corpus, no planning needed.
    */
  def writeShards(df: DataFrame, path: String, key: Column, nShards: Int,
      sortCols: Seq[String]): Unit = {
    require(nShards >= 1 && nShards <= 65536, "nShards in [1, 65536]")
    df.withColumn("shard", graft.ops.Sampling.hashBucket(key, nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)
  }

  /** Compact a parquet directory's small files into ~`targetBytes` files
    * (streaming sinks and fine-grained batch appends leave thousands of
    * KB-scale files; at corpus scale the file LISTING becomes the scan
    * bottleneck before the data does). File count = ceil(bytes/target),
    * written via round-robin repartition to equalize sizes; returns
    * (files before, files after). Partition-column layouts should compact
    * per partition directory (call this on each leaf).
    *
    * Swap protocol: compacted data is fully written to a `.compact-tmp`
    * sibling, then the ORIGINAL directory is renamed aside and the tmp
    * renamed into place (two same-filesystem renames), then the aside copy
    * is deleted. A crash at any point never loses or duplicates data: the
    * original survives intact (as `path` or as `path.compact-old`) until
    * the compacted copy is live, and no state ever contains both copies
    * under `path` — the failure modes of delete-then-move (empty dir) and
    * move-then-delete (doubled rows) for in-place file swaps. LOCAL
    * FILESYSTEM ONLY (java.io rename semantics; a concurrent reader mid-
    * swap can still catch the brief no-directory gap between the renames —
    * coordinate compaction with readers, as any file-level compactor
    * without a table format must).
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val dir = new java.io.File(path)
    require(dir.isDirectory,
      s"compact() needs a local directory, got: $path")
    def parquetFiles(d: java.io.File): Array[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = parquetFiles(dir).length
    val totalBytes = parquetFiles(dir).map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new java.io.File(path.stripSuffix("/") + ".compact-tmp")
    val old = new java.io.File(path.stripSuffix("/") + ".compact-old")
    spark.read.parquet(path).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    java.nio.file.Files.move(dir.toPath, old.toPath)
    java.nio.file.Files.move(tmp.toPath, dir.toPath)
    def deleteRecursively(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
      f.delete(); ()
    }
    deleteRecursively(old)
    (before, parquetFiles(dir).length)
  }

  /** True iff the physical plan of `df` contains a shuffle exchange —
    * the thing bucketed joins exist to eliminate (exposed for specs and
    * plan audits).
    */
  /** Per-file health of a parquet dataset: (file, n_rows) from ONE scan
    * via `input_file_name` — the observability that drives [[compact]]
    * (thousands of KB-scale streaming-sink files make the LISTING the
    * bottleneck long before the data). Row-count skew across files also
    * flags a bad writer partitioning. One narrow aggregate, no shuffle
    * wider than (files × partitions) partial rows.
    */
  /** Distributed compaction PLANNER — the metadata-level half of
    * [[compact]], the shape a table-maintenance service actually runs at
    * 100 TB (Delta OPTIMIZE / Iceberg rewrite planning): given a file
    * listing (partition, file_id, bytes), decide WHICH small files merge
    * into WHICH target-sized rewrite group, without touching data. Policy
    * (the standard one):
    *
    *   - only files under `minFileBytes` are eligible (already-compacted
    *     files must not be rewritten again — without this floor every
    *     run re-rewrites the whole table),
    *   - eligible files greedily first-fit-in-order (by file_id — the
    *     deterministic stand-in for listing order) into bins of
    *     `targetBytes` per partition ([[graft.ops.Curation.packBySize]]'s
    *     fold — compaction IS sequence packing on bytes),
    *   - single-file bins are DROPPED (rewriting one file alone is pure
    *     wasted IO; it stays as-is until it has company).
    *
    * Returns (partition, file_id, bytes, bin) — one row per file the plan
    * rewrites; bins number 0.. per partition. The listing is metadata
    * (~10⁶ rows for 100 TB), so the fold's per-partition working set is
    * the file count, never data bytes.
    */
  def compactionPlan(files: DataFrame, partCol: String, fileIdCol: String,
      bytesCol: String, targetBytes: Int, minFileBytes: Int): DataFrame = {
    require(minFileBytes <= targetBytes,
      "minFileBytes above targetBytes would plan oversized bins")
    val eligible = files.where(col(bytesCol) < minFileBytes)
    val packed = graft.ops.Curation.packBySize(eligible, partCol,
        fileIdCol, bytesCol, targetBytes)
      .select(col("grp").as("partition"), col("doc_id").as("file_id"),
        col("n_tokens").cast("long").as("bytes"), col("bin"))
    val keep = packed.groupBy("partition", "bin")
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= 2)
      .select("partition", "bin")
    packed.join(keep, Seq("partition", "bin"), "left_semi")
      .select("partition", "file_id", "bytes", "bin")
  }

  def fileStats(df: DataFrame): DataFrame =
    df.groupBy(org.apache.spark.sql.functions.input_file_name().as("file"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"))

  def hasShuffleExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Morton (Z-order) key of two numeric columns: each value is scaled to
    * a `bits`-bit integer inside its [lo, hi] range, then the bits are
    * interleaved — points close in BOTH dimensions get close z-values.
    * Pure Column algebra (static bit shifts, codegen'd).
    */
  def zValue(x: org.apache.spark.sql.Column, xLo: Double, xHi: Double,
      y: org.apache.spark.sql.Column, yLo: Double, yHi: Double,
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    require(xHi > xLo && yHi > yLo, "empty scaling range")
    val maxB = (1L << bits) - 1
    def scaled(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(greatest(
        floor((c.cast("double") - lo) / (hi - lo) * maxB).cast("long"),
        lit(0L)), lit(maxB))
    val (sx, sy) = (scaled(x, xLo, xHi), scaled(y, yLo, yHi))
    (0 until bits).map { i =>
      (shiftright(sx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(sy, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Write `df` Z-ORDERED on two numeric columns: range-partitioned and
    * sorted by the interleaved Morton key, so row-group/file min-max
    * stats stay TIGHT ON BOTH columns — a selective filter on either one
    * touches a handful of files, where a single-column sort gives perfect
    * pruning on that column and none on the other. The multi-dimensional
    * clustering a (time × user), (lang × quality), (length × score) scan
    * workload needs; bounds come from the caller (or one dimension-bounded
    * min/max agg). Returns the file count written.
    */
  def writeZOrdered(df: DataFrame, path: String,
      xCol: String, xLo: Double, xHi: Double,
      yCol: String, yLo: Double, yHi: Double,
      nFiles: Int, bits: Int = 16): Int = {
    import org.apache.spark.sql.functions._
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    df.withColumn("_z",
        zValue(col(xCol), xLo, xHi, col(yCol), yLo, yHi, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
    nFiles
  }
}
