package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-level probe for the PQ trainer (test scope — never in
  * the production jar). Times each stage of q_emb_pq separately; used to
  * localize the round-16 finding that a projection computed NEXT TO a
  * generator is collapsed above it and re-evaluated per exploded row
  * (see SigAggregators.LongVecSumAggregator).
  */
object PqStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"== round $round")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val model = time("pqEncodeDetailed") {
        KMeans.pqEncodeDetailed(emb, "vec_id", "embedding", m = 2, k = 8,
          iters = 2)
      }
      time("codes-count") { model.codes.count() }
      time("orderBy-count") { model.codes.orderBy("vec_id").count() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
