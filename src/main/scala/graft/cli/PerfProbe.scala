package graft.cli

import org.apache.spark.sql.SparkSession

/** Perf diagnosis harness (round-2 bench-variance investigation): times the
  * named queries over several rounds in ONE JVM, separating first-run cost
  * (Janino compile + JIT of the generated aggregate classes) from
  * steady-state. `graft.Bench` measures each query once in a fresh JVM —
  * when the driver machine is contended, the C2 compile queue starves and
  * expression-heavy generated classes run interpreted, which is the
  * round-1 suspect for q_doc_minhash_lsh's 9x outlier.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
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
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_doc_minhash_lsh", "q_doc_simhash_pairs")
    for (round <- 1 to 3; name <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      println(f"PROBE round=$round $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
