package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `explain("formatted")` for named gates to files — the
  * before/after plan artifacts an optimization round commits under
  * `plans/rNN/` (the judge checks plan claims against these).
  *
  * Usage: `runMain graft.cli.PlanDump <outDir> <suffix> [queryName ...]`
  * writes `<outDir>/<query>_<suffix>.txt` per gate (suffix = `before` /
  * `after`). With no names, dumps every registered gate. sfDir comes from
  * SPARK_GRAFT_SF_DIR (default sf0.1), like the bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val (outDir, suffix) = (args(0), args(1))
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown gate '$name'"))
      try {
        // PlanTap: also dump the pre-localCheckpoint plans (trainer /
        // margin checkpoint boundaries — VERDICT r16 items 5/8), so the
        // expensive upstream shape stays auditable from the artifact
        graft.util.PlanTap.start()
        val df = fn(spark, sfDir)
        val tapped = graft.util.PlanTap.stop()
        val plan = (df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode) +:
          tapped.map { case (tag, p) =>
            s"\n== Pre-checkpoint plan: $tag ==\n$p"
          }).mkString("\n")
        Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $name ($suffix)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: $e")
      }
      finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
