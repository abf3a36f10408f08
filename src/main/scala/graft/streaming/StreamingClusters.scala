package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.ops.Dedup

/** Streaming NEAR-dup clustering — the missing batch/streaming symmetry for
  * the dedup operator family (exact dedup streams via
  * [[StreamingDedup.firstSeen]]; clustering streamed only as this).
  *
  * Semantics: duplicate clusters are computed PER CLOSED EVENT-TIME WINDOW.
  * A tumbling watermark-evicted window aggregation assembles each window's
  * document set; once the watermark passes, the closed window is handed to
  * `foreachBatch`, where the BATCH clustering operators
  * ([[Dedup.minhashLshPairsScoped]] → [[Dedup.componentsDetailed]]) run
  * unchanged on that window's corpus — streaming as incremental batch, the
  * idiomatic Structured Streaming shape for an operator whose output is a
  * fixpoint over a finite set (a global streaming connected-components
  * would either hold every signature forever — unbounded state — or emit
  * cluster ids it later has to retract, which append mode cannot express).
  * Cross-window duplicates are the upstream exact/near dedup horizon's job;
  * within a window, clusters here are byte-identical to the batch operator
  * on the same slice (StreamingSpec asserts this).
  *
  * Scale notes: per-window state is one `collect_list` buffer per window —
  * bounded by the window's corpus volume, the same bound any
  * whole-window operator carries; the per-window batch clustering inside
  * `foreachBatch` is the fully distributed LSH pipeline, so the window
  * corpus itself is NOT driver-bound. Windows per micro-batch is bounded by
  * event-time progress (a driver loop over them is fine).
  */
object StreamingClusters {

  /** Closed-window document sets: (window_start, docs: array<struct<doc_id,
    * text>>), one row per tumbling window, emitted when the watermark
    * passes the window end. `docs` needs (doc_id: long, event_time:
    * timestamp, text: string).
    */
  def windowedDocSets(docs: DataFrame, windowDuration: String,
      watermarkDelay: String): DataFrame =
    docs
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDuration))
      .agg(collect_list(struct(col("doc_id"), col("text"))).as("docs"))
      .select(col("window.start").as("window_start"), col("docs"))

  /** Cluster one closed window's corpus with the batch operators: every doc
    * gets a row (singletons label themselves). Returns (window_start,
    * doc_id, cluster_id, converged) — `converged` surfaces
    * [[Dedup.ComponentsResult.converged]] per window: a maxIters-capped
    * (under-merged) window is marked in its OWN OUTPUT, not just a driver
    * log line a downstream consumer never sees.
    */
  private[streaming] def clusterWindow(winDocs: DataFrame, k: Int,
      nHashes: Int, bands: Int, threshold: Double): DataFrame = {
    val lsh = Dedup.minhashLshPairsScoped(
      winDocs, "doc_id", "text", k, nHashes, bands, threshold)
    val comp = Dedup.componentsDetailed(lsh.df)
    val labeled = winDocs
      .join(comp.df, Seq("doc_id"), "left")
      .select(col("window_start"), col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        lit(comp.converged).as("converged"))
    // foreachBatch is synchronous per batch: materialize before releasing
    // the pipeline caches the labels were computed from
    val rows = labeled.localCheckpoint()
    comp.release(); lsh.release()
    rows
  }

  /** Parquet sink, partitioned by window: each closed window's clusters
    * land under `path/window_start=.../` as (doc_id, cluster_id,
    * converged). IDEMPOTENT under micro-batch replay: foreachBatch is
    * at-least-once, so a blind append would duplicate a window's rows when
    * a batch re-runs after failure/restart — instead each write OVERWRITES
    * exactly the window partitions present in it (dynamic
    * partitionOverwriteMode), so a replayed window rewrites its own
    * directory byte-for-byte (the clustering is deterministic) and touches
    * nothing else. The foreachBatch loop runs the batch clustering once
    * per closed window in the micro-batch.
    */
  def sink(closedWindows: DataFrame, path: String, checkpoint: String,
      k: Int = 3, nHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.8): DataStreamWriter[Row] =
    closedWindows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wins = batch.select("window_start").distinct()
          .collect().map(_.getTimestamp(0))
        wins.foreach { w =>
          val winDocs = batch
            .where(col("window_start") === lit(w))
            .select(col("window_start"), explode(col("docs")).as("d"))
            .select(col("window_start"), col("d.doc_id").as("doc_id"),
              col("d.text").as("text"))
          clusterWindow(winDocs, k, nHashes, bands, threshold)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(path)
        }
      }
}
