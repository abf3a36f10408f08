package graft.io

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hadoop `Configuration` is not `Serializable`; this wrapper ships it to
  * executor tasks via its `Writable` form (public Hadoop API) so tasks can
  * open the SAME filesystem the driver resolved (s3a/hdfs credentials and
  * all) instead of whatever a fresh `new Configuration()` would load.
  */
private class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
  }
}

/** Sink selection for [[graft.api.EventsAggregator.run]]. */
sealed trait SinkMode
/** One CSV matrix per (stay, source) — the reference's layout. */
case object CsvMatrixSink extends SinkMode
/** Long-form partitioned parquet — the >100k-stays scale layout. */
case object LongParquetSink extends SinkMode

/** The per-(stay, source) matrix CSV sink (SURVEY.md §7.4 hard part #1).
  *
  * Contract (reference `/root/reference/src/mimic2ts/__init__.py:174`,
  * `tests/test_EventsAggregator.py:65-72`): one file
  * `{dst}/{stay_id}/{source}_features.csv`, header `feature_id,0,1,...,n`
  * with `n = total_windows` (per-stay dynamic width), rows sorted by
  * `feature_id`, cells = combined value with 0.0 fill. A requested stay with
  * no events still gets a header-only file (`__init__.py:218-225`).
  *
  * Spark-first shape: the matrix rows are built as data (one CSV line per
  * (stay, feature) via `collect_list` + `array_join` — all codegen'd), then
  * `repartition($"stay_id")` so one task owns all of a stay's rows and
  * `foreachPartition` streams them to exact-named files. No global pivot —
  * width is a per-stay function, so a single wide schema cannot exist
  * (SURVEY.md §1.3) — and no driver-side loop over facts.
  *
  * `dstPath` may carry any supported scheme: remote schemes (hdfs://,
  * s3a://, ...) write through the Hadoop `FileSystem` resolved from the
  * session's Hadoop configuration — the cluster-correct path a raw
  * `java.io.FileWriter` would break (it writes to the EXECUTOR-local disk
  * of whichever machine ran the task). The local scheme takes a direct
  * `java.nio` branch: without libhadoop (NativeCodeLoader warns), Hadoop's
  * RawLocalFileSystem applies permissions by EXEC'ING a `chmod` process per
  * created file — measured ~5 ms/file, +60% wall on a 2001-file run.
  *
  * For >100k stays the per-stay-file layout itself is the bottleneck
  * (millions of small files); [[writeLongForm]] is the scale alternative.
  */
object MatrixWriter {

  /** Scheme of `path` by prefix scan — NOT `new java.net.URI(path)`, which
    * throws on URI-illegal characters (spaces, '%', '#') that are legal in
    * plain filesystem paths. A scheme needs >= 2 chars so `C:\out` stays a
    * local path (the standard Hadoop convention).
    */
  private def schemeOf(path: String): Option[String] = {
    val i = path.indexOf(':')
    if (i >= 2 && path(0).isLetter &&
        path.substring(1, i).forall(c => c.isLetterOrDigit || "+.-".contains(c)))
      Some(path.substring(0, i).toLowerCase(java.util.Locale.ROOT))
    else None
  }

  /** UTF-8 buffered writer at `fullPath`, parents created; scheme dispatch
    * per the class note above.
    */
  private def openWriter(conf: Configuration, fullPath: String): BufferedWriter =
    schemeOf(fullPath) match {
      case None | Some("file") =>
        val p =
          if (fullPath.startsWith("file:"))
            java.nio.file.Paths.get(new java.net.URI(fullPath))
          else java.nio.file.Paths.get(fullPath)
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.newBufferedWriter(p, StandardCharsets.UTF_8)
      case Some(_) =>
        // no setWriteChecksum here: Path.getFileSystem returns the
        // JVM-cached shared instance, and mutating it would disable
        // client checksums for every other writer in the process (.crc
        // sidecars only afflict the LOCAL ChecksumFileSystem, which the
        // java.nio branch bypasses entirely)
        val fs = new Path(fullPath).getFileSystem(conf)
        new BufferedWriter(new OutputStreamWriter(
          fs.create(new Path(fullPath), true), StandardCharsets.UTF_8))
    }

  def write(densified: DataFrame, stayIdx: DataFrame, dstPath: String,
      sourceName: String): Unit = {
    val spark = densified.sparkSession
    val hconf =
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    // persisted: consumed twice (file write + produced-stay anti-join for
    // dummies) — without this the WHOLE upstream pipeline re-executes for
    // the dummy pass. One compact row per (stay, feature).
    val lines = densified
      .groupBy("stay_id", "feature_id")
      .agg(array_sort(collect_list(struct(col("tidx"), col("value")))).as("cells"))
      .select(col("stay_id"), col("feature_id"),
        concat_ws(",", col("feature_id").cast("string"),
          array_join(transform(col("cells"), c => c.getField("value").cast("string")), ","))
          .as("line"))
      .join(broadcast(stayIdx.select("stay_id", "total_windows")), Seq("stay_id"))
      .persist()

    lines
      .repartition(col("stay_id"))
      .sortWithinPartitions("stay_id", "feature_id")
      .select("stay_id", "total_windows", "line")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        var currentStay = Long.MinValue
        var out: BufferedWriter = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        try {
          rows.foreach { r =>
            val stay = r.getLong(0)
            if (stay != currentStay) {
              close()
              currentStay = stay
              out = openWriter(hconf.value,
                s"$dstPath/$stay/${sourceName}_features.csv")
              out.write(header(r.getLong(1)))
              out.newLine()
            }
            out.write(r.getString(2))
            out.newLine()
          }
        } finally close()
      }

    writeDummies(lines, stayIdx, dstPath, sourceName)
    lines.unpersist()
  }

  /** Long-form partitioned-parquet sink — the >100k-stays alternative to
    * per-stay CSV files (SCALE.md): at millions of stays the matrix layout
    * IS the bottleneck (millions of tiny files and directories), so the
    * scale path keeps the engine's canonical long form
    * `(stay_id, feature_id, tidx, value)` as one parquet dataset per source
    * under `{dst}/long/source={name}/` (sources as Hive-style partitions —
    * `spark.read.parquet("{dst}/long")` exposes a `source` column with
    * partition pruning). Rows are repartitioned and sorted by stay so each
    * stay lives in one file with tight row-group min/max stats on `stay_id`
    * — a per-stay read prunes to one row group instead of scanning the
    * dataset. Use [[writeStayIndex]] once per run for the companion
    * `(stay_id, total_windows)` table; a reader reconstructs any stay's
    * matrix from the two (dummy stays need no special casing — they are
    * simply absent from the long table).
    */
  def writeLongForm(densified: DataFrame, dstPath: String,
      sourceName: String): Unit =
    densified.select("stay_id", "feature_id", "tidx", "value")
      .repartition(col("stay_id"))
      .sortWithinPartitions("stay_id", "feature_id", "tidx")
      .write.mode("overwrite")
      .parquet(s"$dstPath/long/source=$sourceName")

  /** Companion stay dimension for [[writeLongForm]] readers. */
  def writeStayIndex(stayIdx: DataFrame, dstPath: String): Unit =
    stayIdx.select("stay_id", "total_windows")
      .coalesce(1) // dimension-sized
      .write.mode("overwrite").parquet(s"$dstPath/long_stays")

  private def header(totalWindows: Long): String =
    (0L to totalWindows).mkString("feature_id,", ",", "")

  /** K2: header-only matrices for requested stays that produced no rows —
    * a metadata-only anti-join over the stay dimension; facts are never
    * collected. The header writes run in `foreachPartition` on the
    * EXECUTORS, not a driver loop: at 10⁶ missing stays a driver-serial
    * loop is 10⁶ sequential remote-FS round-trips, while here each task
    * streams its partition's headers in parallel (same per-file bytes,
    * same filenames — byte-identical output).
    */
  private def writeDummies(produced: DataFrame, stayIdx: DataFrame,
      dstPath: String, sourceName: String): Unit = {
    val hconf = new SerializableHadoopConf(
      stayIdx.sparkSession.sparkContext.hadoopConfiguration)
    stayIdx.select("stay_id", "total_windows")
      .join(produced.select("stay_id").distinct(), Seq("stay_id"), "left_anti")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val out = openWriter(hconf.value,
            s"$dstPath/${r.getLong(0)}/${sourceName}_features.csv")
          try { out.write(header(r.getLong(1))); out.newLine() }
          finally out.close()
        }
      }
  }

  /** K3: run manifest, mirroring `/root/reference/src/mimic2ts/__main__.py:83-91`
    * plus the RESOLVED fill policy (the raw `ffill` flag alone misreports
    * runs using the fillMode override).
    */
  def writeManifest(spark: org.apache.spark.sql.SparkSession, dstPath: String,
      timestepSeconds: Long, ffill: Boolean, fillPolicy: String,
      sources: Seq[String], runtimeSec: Double): Unit = {
    val out = openWriter(spark.sparkContext.hadoopConfiguration,
      s"$dstPath/readme.txt")
    try out.write(
      s"""graft spark-native events aggregator
         |version: 0.1.0
         |runtime: $runtimeSec sec
         |timestep_seconds: $timestepSeconds
         |ffill: $ffill
         |fill_policy: $fillPolicy
         |sources: ${sources.mkString(", ")}
         |""".stripMargin)
    finally out.close()
  }
}
