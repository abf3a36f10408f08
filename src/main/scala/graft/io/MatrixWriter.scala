package graft.io

import java.io.{BufferedWriter, File, FileWriter}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  */
object MatrixWriter {

  def write(densified: DataFrame, stayIdx: DataFrame, dstPath: String,
      sourceName: String): Unit = {
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
              val dir = new File(s"$dstPath/$stay")
              dir.mkdirs()
              out = new BufferedWriter(
                new FileWriter(new File(dir, s"${sourceName}_features.csv")))
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

  private def header(totalWindows: Long): String =
    (0L to totalWindows).mkString("feature_id,", ",", "")

  /** K2: header-only matrices for requested stays that produced no rows —
    * a metadata-only anti-join over the (small) stay dimension; facts are
    * never collected.
    */
  private def writeDummies(produced: DataFrame, stayIdx: DataFrame,
      dstPath: String, sourceName: String): Unit = {
    val missing = stayIdx.select("stay_id", "total_windows")
      .join(produced.select("stay_id").distinct(), Seq("stay_id"), "left_anti")
      .collect()
    missing.foreach { r =>
      val dir = Paths.get(dstPath, r.getLong(0).toString)
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(s"${sourceName}_features.csv"),
        header(r.getLong(1)) + System.lineSeparator())
    }
  }

  /** K3: run manifest, mirroring `/root/reference/src/mimic2ts/__main__.py:83-91`. */
  def writeManifest(dstPath: String, timestepSeconds: Long, ffill: Boolean,
      sources: Seq[String], runtimeSec: Double): Unit = {
    Files.createDirectories(Paths.get(dstPath))
    Files.writeString(Paths.get(dstPath, "readme.txt"),
      s"""graft spark-native events aggregator
         |version: 0.1.0
         |runtime: $runtimeSec sec
         |timestep_seconds: $timestepSeconds
         |ffill: $ffill
         |sources: ${sources.mkString(", ")}
         |""".stripMargin)
  }
}
