package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one warmed JVM, every query timed individually (sorted
  * name order), one JSON line on stdout. Warmup touches every table and
  * runs one small pipeline so the first measured query doesn't absorb the
  * session's file-index/codegen startup (~5 s) — without it the
  * alphabetically-first query's number is mostly warmup noise.
  */
object Bench {
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
    // warmup: file indexes + reader paths + codegen pipeline
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { name =>
      try spark.read.parquet(s"$sfDir/$name.parquet").count()
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries.get("q_distinct")
      .foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    // shape warmup: run the document-dedup plan shapes on a tiny synthetic
    // corpus so Janino compilation + JIT of their generated join/aggregate
    // stages happens off the per-query clock (codegen classes are keyed by
    // plan shape, not data — measured ~1-2.5 s first-run penalty per
    // pipeline in a fresh JVM, amplified badly on a contended machine).
    // Runs TWICE: once with default conf (AQE broadcasts the tiny joins)
    // and once with broadcast disabled, so both the broadcast and the
    // shuffle join variants — sf0.1 plans mix them — get compiled.
    def warmDedup(): Unit = {
      val tiny = spark.range(64).selectExpr("id AS doc_id",
        "concat('w', id % 7, ' x', id % 11, ' y', id % 13, ' z', id, ' a b c') AS text")
      graft.ops.Dedup.jaccardPairs(tiny, "doc_id", "text", 3, 0.8, 100).count()
      graft.ops.Dedup.minhashLshPairs(tiny, "doc_id", "text", 3, 64, 32, 0.8).count()
      graft.ops.Dedup.simhashPairs(tiny, "doc_id", "text", 3).count()
      val tinyPairs = spark.range(16)
        .selectExpr("id AS doc_a", "id + 1 AS doc_b")
      graft.ops.Dedup.components(tinyPairs, 20).count()
      spark.catalog.clearCache()
    }
    // same idea for the bucketize → combine → densify/fill family (the
    // other expression-heavy generated classes: map-collect aggregate,
    // grid generate, fill windows)
    def warmTimeSeries(): Unit = {
      val idx = spark.range(4).selectExpr("id AS stay_id", "0L AS intime",
        "20L AS total_windows")
      val ev = spark.range(256).selectExpr("id % 4 AS stay_id",
        "id % 3 AS feature_id", "(id * 37) % 1200 AS event_epoch_time",
        "CAST(id AS DOUBLE) AS value")
      val b = graft.etl.Stages.bucketize(ev, idx, 60L)
      Seq(graft.etl.Stages.ZeroFill, graft.etl.Stages.ForwardFill,
        graft.etl.Stages.LinearInterp).foreach { fill =>
        graft.etl.Stages.densify(
          graft.etl.Stages.combine(b, graft.model.MeanCombine), fill).count()
      }
    }
    try {
      warmDedup()
      warmTimeSeries()
      val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      val savedA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try warmDedup() finally {
        saved.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
        savedA.fold(spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
      }
    } catch { case _: Throwable => () }

    // a throwing query is REPORTED and fails the run — swallowing it would
    // make a broken query look like a fast one and *improve* the total
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () } catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: $e")
      }
      finally spark.catalog.clearCache() // bound intra-query persist() use
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
