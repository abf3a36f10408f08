package graft.cli

import org.apache.spark.sql.SparkSession

/** Perf diagnosis harness (round-2 bench-variance investigation): times the
  * named queries over several rounds in ONE JVM, separating first-run cost
  * (Janino compile + JIT of the generated aggregate classes) from
  * steady-state. `graft.Bench` measures each query once in a fresh JVM —
  * when the driver machine is contended, the C2 compile queue starves and
  * expression-heavy generated classes run interpreted, which is the
  * round-1 suspect for q_doc_minhash_lsh's 9x outlier.
  *
  * `--all` sweeps EVERY registered gate cold-then-steady and writes the
  * ratio table to `perf_probe.json` — the in-artifact adjudicator for
  * driver-bench outliers: a gate whose driver number exceeds ~3x its
  * recorded steady band is either (ratio high here too) a first-compile
  * hole the bench warmups must cover, or (ratio ~1 here) host contention,
  * with no re-measurement needed. "Cold" is first-run-in-this-JVM measured
  * in sorted name order, the bench's own regime; earlier queries' codegen
  * can pre-warm later ones exactly as in `Bench`.
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

    // a throwing query must be VISIBLE in the artifact — Bench's rule: a
    // crash recorded as a fast time would read as a healthy gate
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[probe] $name FAILED: $e")
      }
      finally spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    if (args.headOption.contains("--all")) {
      // cold pass (sorted order = the bench's measurement order), then two
      // steady passes; steady = min of the two (least-contended estimate)
      val names = graft.SparkEntry.queries.keys.toSeq.sorted
      val cold = names.map(n => n -> time(n)).toMap
      val s1 = names.map(n => n -> time(n)).toMap
      val s2 = names.map(n => n -> time(n)).toMap
      val rows = names.map { n =>
        val steady = math.min(s1(n), s2(n))
        val ratio = if (steady > 0) cold(n) / steady else 0.0
        val fl = if (failed.contains(n)) ""","failed":true""" else ""
        f""""$n":{"cold":${cold(n)}%.3f,"steady":$steady%.3f,"ratio":$ratio%.2f$fl}"""
      }
      val json = rows.mkString("{", ",", "}")
      if (failed.nonEmpty)
        System.err.println(s"[probe] FAILED gates: ${failed.mkString(", ")}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/root/repo/perf_probe.json"),
        (json + "\n").getBytes("UTF-8"))
      names.sortBy(n => -(cold(n) / math.max(math.min(s1(n), s2(n)), 1e-9)))
        .take(15).foreach { n =>
          val steady = math.min(s1(n), s2(n))
          println(f"PROBE $n cold=${cold(n)}%.2f steady=$steady%.2f " +
            f"ratio=${cold(n) / math.max(steady, 1e-9)}%.1f")
        }
    } else {
      val names =
        if (args.nonEmpty) args.toSeq
        else Seq("q_doc_minhash_lsh", "q_doc_simhash_pairs")
      for (round <- 1 to 3; name <- names) {
        val t = time(name)
        println(f"PROBE round=$round $name $t%.2f s")
      }
    }
    spark.stop()
  }
}
