package graft.cli

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingAggregator

/** Sustained-throughput measurement for the streaming bucketize→combine
  * path: the MEDIUM fixture corpus (GenFixtures 2000 stays × 200
  * chartevents = 400 k events — the same corpus as BASELINE.md's batch
  * table) replayed as a file-source stream in bounded micro-batches, through
  * the watermarked partial aggregation into the parquet partial store.
  *
  * Reported rate = events / wall-clock from stream start until the LAST
  * window is flushed (sentinel past the watermark, same protocol as
  * [[StreamDemo]]) — i.e. including micro-batch scheduling, state-store
  * traffic, watermark eviction, and sink commits, not just the hot loop.
  *
  * Usage: `runMain graft.cli.StreamingBench [nStays] [perStay] [filesPerTrigger]`
  *    or: `runMain graft.cli.StreamingBench neardup <docsDir> [filesPerTrigger]`
  *
  * `neardup` mode measures the stateful LSH tracker
  * ([[graft.streaming.StreamingNearDup]]) at corpus scale: every document
  * of `<docsDir>/documents.parquet` is replayed 1 s apart (the ordered
  * file protocol below) followed 10 s later by an exact duplicate under a
  * fresh id — a PLANTED pair inside the horizon whose identical signature
  * collides in every band, so the tracker must catch 100% of them.
  * Reported rate = stream rows / wall; the run FAILS unless every planted
  * pair (for every shingle-bearing doc) is emitted — a watermark racing
  * the replay, an eviction bug, or state loss all surface as missing
  * planted pairs, the near-dup analog of the r4 zero-drop assertion.
  */
object StreamingBench {

  def neardupMain(spark: SparkSession, docsDir: String,
      filesPerTrigger: Int): Unit = {
    import spark.implicits._
    val base = 1577836800L // 2020-01-01
    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val dupOffset = 1000000000L
    val replay = docs
      .select(col("doc_id"), col("text"),
        timestamp_seconds(lit(base) + col("doc_id")).as("event_time"))
      .unionAll(docs.select((col("doc_id") + dupOffset).as("doc_id"),
        col("text"),
        timestamp_seconds(lit(base) + col("doc_id") + 10L)
          .as("event_time")))
    // docs with at least one 3-shingle are the ones the tracker (and the
    // batch path) can see at all — the planted-pair denominator
    val eligible = docs
      .where(size(graft.ops.TextOps.wordShingles(col("text"), 3)) > 0)
      .select("doc_id").as[Long].collect().toSet
    val nRows = nDocs * 2

    val inDir = Files.createTempDirectory("sbench-nd-in").toString
    val ckDir = Files.createTempDirectory("sbench-nd-ck").toString
    replay.repartitionByRange(40, col("event_time"))
      .write.mode("overwrite").parquet(inDir)
    val parts = new java.io.File(inDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(1600000000000L + i * 60000L)
    }

    val stream = spark.readStream
      .option("maxFilesPerTrigger", filesPerTrigger)
      .schema(replay.schema).parquet(inDir)
    val hits = graft.streaming.StreamingNearDup.hits(stream, k = 3,
      nHashes = 64, bands = 16, threshold = 0.8, horizonSeconds = 60L,
      watermarkDelay = "120 seconds")

    val t0 = System.nanoTime()
    val q = hits.writeStream
      .outputMode("append")
      .format("memory").queryName("nd_hits")
      .option("checkpointLocation", ckDir)
      .start()
    q.processAllAvailable()
    q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val out = spark.table("nd_hits")
      .select("doc_a", "doc_b").distinct().cache()
    val nPairs = out.count()
    // planted coverage: (doc, doc + dupOffset) for every eligible doc
    val planted = out
      .where(col("doc_b") === col("doc_a") + dupOffset)
      .select("doc_a").as[Long].collect().toSet
    val caught = eligible.count(planted.contains)
    // recentProgress is capped (spark.sql.streaming.numRecentProgressUpdates,
    // default 100) and would under-report long replays; batchId is the
    // 0-based id of the last completed micro-batch on this fresh checkpoint
    val batches =
      Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L)
    println(f"""{"metric":"streaming_neardup_rows_per_sec","value":${nRows / wallSec}%.0f,"rows":$nRows,"wall_sec":$wallSec%.2f,"distinct_pairs":$nPairs,"planted":${eligible.size},"caught":$caught,"micro_batches":$batches,"files_per_trigger":$filesPerTrigger}""")
    spark.stop()
    if (caught != eligible.size) sys.exit(1)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("neardup")) {
      val cpusNd = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val builderNd = SparkSession.builder()
        .master(s"local[$cpusNd]").appName("graft-streaming-bench")
        .config("spark.sql.shuffle.partitions", cpusNd)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      // SPARK_GRAFT_STATE_STORE=rocksdb swaps the state backend — the
      // 100 TB question is whether keyed state survives volume without
      // executor-heap pressure; RocksDB keeps it off-heap/on-disk
      if (sys.env.get("SPARK_GRAFT_STATE_STORE").contains("rocksdb"))
        builderNd.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val sparkNd = builderNd.getOrCreate()
      sparkNd.sparkContext.setLogLevel("WARN")
      neardupMain(sparkNd, args(1),
        if (args.length > 2) args(2).toInt else 4)
      return
    }
    val nStays = args.headOption.map(_.toInt).getOrElse(2000)
    val perStay = if (args.length > 1) args(1).toInt else 200
    val filesPerTrigger = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-streaming-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (sys.env.get("SPARK_GRAFT_STATE_STORE").contains("rocksdb"))
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the medium corpus's chartevents, built with GenFixtures' exact
    // hash-derived formulas (stay intime/duration, event offset/value) —
    // deterministic, no CSV round-trip
    val base = 1577836800L // 2020-01-01, GenFixtures.Base
    val stays = spark.range(1, nStays + 1).toDF("stay_id")
      .withColumn("intime", lit(base) +
        pmod(xxhash64(col("stay_id"), lit(1)), lit(30 * 24 * 3600L)))
      .withColumn("dur", lit(3600L) +
        pmod(xxhash64(col("stay_id"), lit(2)), lit(9 * 24 * 3600L)))
    val stayIndex = stays
      .withColumn("total_windows", floor(col("dur") / lit(3600L)).cast("long"))
      .select("stay_id", "intime", "total_windows")
    val events = stays
      .withColumn("i", explode(sequence(lit(0), lit(perStay - 1))))
      .select(col("stay_id"),
        timestamp_seconds(col("intime") +
          pmod(xxhash64(col("stay_id"), col("i"), lit(11)), col("dur")))
          .as("event_time"),
        concat(lit("item"),
          pmod(xxhash64(col("stay_id"), col("i"), lit(10)), lit(200L)))
          .as("feature_id"),
        (pmod(xxhash64(col("stay_id"), col("i"), lit(12)), lit(10000L)) / lit(100.0))
          .as("value"))
    val nEvents = nStays.toLong * perStay

    // stage as many small files so maxFilesPerTrigger yields a real
    // micro-batch cadence instead of one giant batch. RANGE-partitioned by
    // event_time: the file source replays files in order, and a replay must
    // arrive roughly in event-time order or the watermark races ahead and
    // silently drops later files' events as late (measured: random file
    // order retained only ~20% of events) — a real stream is
    // arrival-ordered, so the replay must be too
    val inDir = Files.createTempDirectory("sbench-in").toString
    val outDir = Files.createTempDirectory("sbench-out").toString
    val ckDir = Files.createTempDirectory("sbench-ck").toString
    events.repartitionByRange(40, col("event_time"))
      .write.mode("overwrite").parquet(inDir)
    // the file source replays in MODIFICATION-TIME order, and one write job
    // stamps every part file with the same mtime — stagger them in range
    // (= part-number = event-time) order or pickup order is arbitrary and
    // the watermark races ahead anyway
    val parts = new java.io.File(inDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(1600000000000L + i * 60000L)
    }

    val stream = spark.readStream
      .option("maxFilesPerTrigger", filesPerTrigger)
      .schema(events.schema).parquet(inDir)
    val partials = StreamingAggregator.partials(stream, stayIndex, 3600L,
      watermark = "1 hour")

    val t0 = System.nanoTime()
    val q = partials.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .start()
    q.processAllAvailable()
    // flush the tail: a sentinel far past the data advances the watermark
    // (joins no stay, contributes no rows), then one more pass emits
    // everything still in state
    val maxTs = events.agg(max(col("event_time"))).head().getTimestamp(0)
    Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000),
        "sentinel", 0.0))
      .toDF("stay_id", "event_time", "feature_id", "value")
      .write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9

    val outAgg = spark.read.parquet(outDir)
      .agg(count(lit(1)), coalesce(sum("value_n"), lit(0L))).head()
    val outRows = outAgg.getLong(0)
    // events that actually made it through the watermark into a flushed
    // window — the throughput claim is over RETAINED events, and a lossy
    // replay (watermark racing the file order) fails loudly instead of
    // inflating the rate
    val retained = outAgg.getLong(1)
    // see neardupMain: recentProgress is capped at 100 entries
    val batches =
      Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L)
    println(f"""{"metric":"streaming_rows_per_sec","value":${retained / wallSec}%.0f,"events":$nEvents,"retained":$retained,"wall_sec":$wallSec%.2f,"partial_rows":$outRows,"micro_batches":$batches,"files_per_trigger":$filesPerTrigger,"stays":$nStays}""")
    spark.stop()
    if (outRows == 0 || retained < (nEvents * 99) / 100) sys.exit(1)
  }
}
