package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway piece-level probe (test scope) for the round-16 regression
  * hunts: times the IVF exact-cell scan and the incremental-dedup
  * pipeline piece by piece. Kept as the reproduction harness for the two
  * placement hazards this round documented:
  *  - a projection computed next to a generator is collapsed above it
  *    and re-evaluated per exploded row;
  *  - an expensive interpreted projection AFTER an AQE-coalesced
  *    exchange runs on ONE task (the wordShingles-after-semi-join case).
  */
object RegressProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
          stages.add(f"    stage ${si.stageId}%4d ${dur.getOrElse(-1L)}%6d ms tasks=${si.numTasks}%3d")
        }
      })
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"== round $round")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .repartition(32)
      val centroids = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid_vec"))
      val cen = VectorOps.ivfExactCentroids(centroids)
      val tgt = emb.where(pmod(col("vec_id"), lit(2)) === 1)
      val cells = time("ivfExactCells-count") {
        val c = VectorOps.ivfExactCells(tgt, cen)
        c.count(); c
      }
      val src = emb.where(pmod(col("vec_id"), lit(2)) === 0)
      time("ivfTopKExactIndexed-count") {
        VectorOps.ivfTopKExactIndexed(cells, cen,
          src.select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec")), k = 4, nprobe = 2).count()
      }
      // jl_ivf replica: assignCells over a JL-projected corpus
      locally {
        val embDims = 64
        val proj = VectorOps.jlProject(emb, "vec_id", "embedding", embDims, 16)
          .select(col("vec_id"), col("jl").cast("array<float>").as("embedding"),
            lit(null).cast("string").as("label"))
        val centroids = proj.where(col("vec_id") < 8)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").as("centroid_vec"))
        val queries = proj.where(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec"))
        time("jl-assignCells-count") {
          VectorOps.assignCells(proj, centroids).count()
        }
        stages.clear()
        time("jl-ivfTopK-count") {
          VectorOps.ivfTopK(proj, centroids, queries, k = 5, nprobe = 2).count()
        }
        if (round == 2) stages.forEach(println(_))
        time("jl-ivfTopK-OLDCELLS-count") {
          val c = proj.withColumn("v_norm", VectorOps.norm(col("embedding")))
          val cen2 = centroids.withColumn("cen_norm",
            VectorOps.norm(col("centroid_vec")))
          val cellsOld = c.crossJoin(broadcast(cen2))
            .withColumn("c_cos", VectorOps.dot(col("embedding"), col("centroid_vec"))
              / nullif(col("v_norm") * col("cen_norm"), lit(0.0)))
            .groupBy("vec_id")
            .agg(max(struct(col("c_cos"), (-col("centroid_id")).as("neg_id"))).as("best"),
              first(col("embedding")).as("embedding"),
              first(col("label")).as("label"),
              first(col("v_norm")).as("v_norm"))
            .select(col("vec_id"), col("embedding"), col("label"), col("v_norm"),
              (-col("best.neg_id")).as("cell"), col("best.c_cos").as("cell_cos"))
          VectorOps.ivfTopKIndexed(cellsOld, centroids, queries, k = 5,
            nprobe = 2).count()
        }
        // old shape inline
        time("jl-assignCells-OLD-count") {
          val c = proj.withColumn("v_norm", VectorOps.norm(col("embedding")))
          val cen = centroids.withColumn("cen_norm",
            VectorOps.norm(col("centroid_vec")))
          c.crossJoin(broadcast(cen))
            .withColumn("c_cos", VectorOps.dot(col("embedding"), col("centroid_vec"))
              / nullif(col("v_norm") * col("cen_norm"), lit(0.0)))
            .groupBy("vec_id")
            .agg(max(struct(col("c_cos"), (-col("centroid_id")).as("neg_id"))).as("best"),
              first(col("embedding")).as("embedding"),
              first(col("label")).as("label"),
              first(col("v_norm")).as("v_norm"))
            .select(col("vec_id"), col("embedding"), col("label"), col("v_norm"),
              (-col("best.neg_id")).as("cell"), col("best.c_cos").as("cell_cos"))
            .count()
        }
      }
      spark.catalog.clearCache()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .repartition(32)
      val oldDocs = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      val newDocs = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      val idx = time("minhashIndex-count") {
        val i = Dedup.minhashIndex(oldDocs, "doc_id", "text", 3, 64, 32)
        i.count(); i
      }
      time("incremental-count") {
        val sc = Dedup.incrementalNearDupsScoped(newDocs, oldDocs, idx,
          "doc_id", "text", 3, 64, 32, 0.8)
        sc.df.count()
        sc.release()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
