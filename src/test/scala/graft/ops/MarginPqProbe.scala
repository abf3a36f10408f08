package graft.ops // throwaway probe needs private[ops] internals

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for q_emb_margin_pq's fixed cost
  * (round 17): the gate runs on a 1024-vector calibration panel, so its
  * ~3.5 s steady state is job/stage overhead, not data. Times trainer /
  * per-direction kNN / margin tail separately and counts Spark jobs per
  * phase. Test scope — never in the production jar.
  */
object MarginPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("margin-pq-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    def time[A](name: String)(body: => A): A = {
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = body
      println(f"[mpq] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs " +
        f"jobs=${jobs - j0}")
      r
    }
    (1 to 3).foreach { round =>
      println(s"[mpq] --- round $round ---")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .repartition(32)
        .where(col("vec_id") < lit(graft.queries.CorpusOps.marginCalBound))
      val model = time("pqEncodeDetailed") {
        KMeans.pqEncodeDetailed(emb, "vec_id", "embedding", m = 2, k = 8,
          iters = 2, scale = 1e5)
      }
      val src = emb.where(pmod(col("vec_id"), lit(2)) === 0)
      val tgt = emb.where(pmod(col("vec_id"), lit(2)) === 1)
      def qside(d: org.apache.spark.sql.DataFrame) = d.select(
        col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val fwd = time("fwd construct+collect") {
        KMeans.pqSearchCosExact(model, tgt, qside(src), "query_id",
          "query_vec", topK = 4, maxQueryBatch = 16384)
      }
      time("fwd.count")(fwd.count())
      val bwd = time("bwd construct") {
        KMeans.pqSearchCosExact(model, src, qside(tgt), "query_id",
          "query_vec", topK = 4, maxQueryBatch = 16384)
      }
      val full = time("margin construct (ckpt)") {
        VectorOps.marginPairsExact(fwd, bwd)
          .orderBy(col("margin_ppm").desc, col("src_id"), col("tgt_id"))
          .limit(20)
      }
      time("full.count")(full.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
