package graft.ops // throwaway probe needs private[ops] internals

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for the margin-serve fixed cost
  * (round 15): times each stage of q_emb_margin_ivf_serve64 separately
  * at a given corpus dir so the shared ~12 s data-proportional tail both
  * serve forms carry can be attributed. Not part of the gate surface —
  * lives in TEST scope (not shipped in the jar) and uses its own
  * IndexCache key so the gate never serves an index this probe built
  * (ADVICE r15). Run: `java -cp "target/scala-2.13/test-classes:target/
  * scala-2.13/classes:SPARK_JARS" graft.ops.MarginProbe <dir> [C]`.
  */
object MarginProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val c = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]").appName("margin-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[margin-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    val base = graft.io.IndexCache.cacheDir(s"mivf${c}probe", 1,
      s"$dir/embeddings.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .repartition(32)
    graft.io.IndexCache.ensureBuilt(base, s"$base/ivf/cells/_SUCCESS") {
      tmp =>
        val centroids = emb.where(col("vec_id") < c)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").as("centroid_vec"))
        val cen = graft.ops.VectorOps.ivfExactCentroids(centroids)
        graft.ops.VectorOps.saveIvfIndex(s"$tmp/ivf", cen,
          graft.ops.VectorOps.ivfExactCells(emb, cen))
    }
    // warm one full pass (JIT/codegen off the decomposition clock)
    val (cen0, cells0) = graft.ops.VectorOps.loadIvfIndex(spark, s"$base/ivf")
    def qside(par: Int) = emb
      .where(pmod(col("vec_id"), lit(2)) === par)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
    graft.ops.VectorOps.ivfTopKExactIndexed(
      cells0.where(pmod(col("vec_id"), lit(2)) === 1), cen0, qside(0),
      k = 4, nprobe = 2).count()
    spark.catalog.clearCache()

    (1 to 2).foreach { round =>
      println(s"[margin-probe] --- round $round ---")
      val (cen, cells0x) = time("loadIvfIndex")(
        graft.ops.VectorOps.loadIvfIndex(spark, s"$base/ivf"))
      // candidate-join parallelism fix under test: the cell-partitioned
      // layout is one file per cell and the probe join is broadcast, so
      // the streamed side's task count = file splits — the dominant cell
      // runs single-task. Round-robin spread restores width.
      val cells = if (sys.env.contains("MARGIN_PROBE_WIDE"))
        cells0x.repartition(32) else cells0x
      time("cells.count")(cells.count())
      // internals of ivfTopKExactIndexed, staged (replicated verbatim)
      locally {
        val queries = qside(0)
        val (qq, qr) = VectorOps.quantized(col("query_vec"), 1e5)
        val topP = graft.functions.TopKAgg.smallest_k_long(2)
        val probes = queries
          .select(col("query_id"), qq.as("qq"), qr.as("q_r"))
          .crossJoin(broadcast(cen))
          .withColumn("c_cos", VectorOps.exactCosX1m(
            graft.functions.GraftFunctions.long_dot(col("qq"), col("cv")),
            col("q_r"), col("cen_r")))
          .where(col("c_cos").isNotNull)
          .groupBy("query_id")
          .agg(first(col("qq")).as("qq"), first(col("q_r")).as("q_r"),
            topP(negate(col("c_cos")), col("centroid_id").cast("long"))
              .as("top"))
          .select(col("query_id"), col("qq"), col("q_r"),
            explode(col("top")).as("e"))
          .select(col("query_id"), col("qq"), col("q_r"),
            col("e.id").as("cell"))
        println(s"[margin-probe] probes rows = " + time("probes.count")(probes.count()))
        val corpus = cells.where(pmod(col("vec_id"), lit(2)) === 1)
        val scored = corpus.join(broadcast(probes), Seq("cell"))
          .where(col("vec_id") =!= col("query_id"))
        println(s"[margin-probe] candidates = " + time("join-only.count")(scored.count()))
        val withCos = scored.withColumn("cos_x1m",
          VectorOps.exactCosX1m(
            graft.functions.GraftFunctions.long_dot(col("qv"), col("qq")),
            col("v_r"), col("q_r")))
        time("join+dot.count")(
          withCos.where(col("cos_x1m").isNotNull).count())
        time("topk tail")(
          VectorOps.topKPerQueryExact(withCos, 4).count())
      }
      val fwd = graft.ops.VectorOps.ivfTopKExactIndexed(
        cells.where(pmod(col("vec_id"), lit(2)) === 1), cen, qside(0),
        k = 4, nprobe = 2)
      time("fwd.count")(fwd.count())
      val bwd = graft.ops.VectorOps.ivfTopKExactIndexed(
        cells.where(pmod(col("vec_id"), lit(2)) === 0), cen, qside(1),
        k = 4, nprobe = 2)
      time("bwd.count")(bwd.count())
      val full = graft.ops.VectorOps.marginPairsExact(fwd, bwd)
        .orderBy(col("margin_ppm").desc, col("src_id"), col("tgt_id"))
        .limit(20)
      time("full margin")(full.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
