package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.ops.Graph

/** Streaming label propagation — the batch/streaming symmetry for the graph
  * family ([[graft.ops.Graph.labelPropagation]] had no streaming
  * counterpart; dedup clustering streams via [[StreamingClusters]], whose
  * discipline this reuses verbatim).
  *
  * Semantics: communities are computed PER CLOSED EVENT-TIME WINDOW over
  * the window's edge set (e.g. the LSH near-dup pair stream, a
  * link-discovery stream). A tumbling watermark-evicted aggregation
  * assembles each window's edges; once the watermark passes, the closed
  * window is handed to `foreachBatch`, where the BATCH operator runs
  * unchanged on that window's graph — streaming as incremental batch,
  * because LPA's output is a fixpoint over a finite edge set: a global
  * streaming variant would either hold every node's label forever
  * (unbounded state) or emit labels it later retracts, which append mode
  * cannot express. Cross-window community identity is a downstream
  * equi-join on stable node ids; within a window the labels are
  * byte-identical to the batch operator on the same slice (StreamingSpec
  * asserts this).
  *
  * Scale notes: per-window state is one `collect_list` edge buffer per
  * window — bounded by the window's edge volume, the same bound any
  * whole-window operator carries ([[StreamingClusters.windowedDocSets]]'s
  * documents are strictly heavier); the per-window LPA inside
  * `foreachBatch` is the fully distributed batch operator (node-keyed
  * shuffles, linear lineage in `iters`), so the window graph itself is NOT
  * driver-bound. Node ids must be numeric — the batch operator's loud
  * seed guard applies unchanged.
  */
object StreamingLabelProp {

  /** Closed-window edge sets: (window_start, edges: array<struct<a, b>>),
    * one row per tumbling window, emitted when the watermark passes the
    * window end. `edges` needs (a: long, b: long, event_time: timestamp);
    * duplicate observations of an edge within a window are fine (the
    * batch operator canonicalizes + distincts).
    */
  def windowedEdgeSets(edges: DataFrame, windowDuration: String,
      watermarkDelay: String): DataFrame =
    edges
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDuration))
      .agg(collect_list(struct(col("a"), col("b"))).as("edges"))
      .select(col("window.start").as("window_start"), col("edges"))

  /** Label one closed window's graph with the batch operator: every
    * endpoint gets a row (the node set is derived from the window's own
    * edges — an isolated node never appears in an edge stream, so there
    * is nothing to label). Returns (window_start, node, label).
    */
  private[streaming] def labelWindow(winEdges: DataFrame, w: java.sql.Timestamp,
      iters: Int): DataFrame = {
    val nodes = winEdges.select(col("a").as("node"))
      .unionAll(winEdges.select(col("b").as("node")))
      .distinct()
    Graph.labelPropagation(winEdges.select("a", "b"), nodes, iters)
      .select(lit(w).as("window_start"), col("node"), col("label"))
  }

  /** Parquet sink, partitioned by window: each closed window's labels land
    * under `path/window_start=.../` as (node, label). IDEMPOTENT under
    * micro-batch replay exactly like [[StreamingClusters.sink]]: each
    * write overwrites only the window partitions present in it (dynamic
    * partitionOverwriteMode), so an at-least-once foreachBatch replay
    * rewrites a window's directory byte-for-byte (LPA is deterministic)
    * and touches nothing else.
    */
  def sink(closedWindows: DataFrame, path: String, checkpoint: String,
      iters: Int = 5): DataStreamWriter[Row] =
    closedWindows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wins = batch.select("window_start").distinct()
          .collect().map(_.getTimestamp(0))
        wins.foreach { w =>
          val winEdges = batch
            .where(col("window_start") === lit(w))
            .select(explode(col("edges")).as("e"))
            .select(col("e.a").as("a"), col("e.b").as("b"))
          labelWindow(winEdges, w, iters)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(path)
        }
      }

  /** LPA over the LSH NEAR-DUP PAIR STREAM — the composition sink: per
    * closed DOCUMENT window ([[StreamingClusters.windowedDocSets]]
    * output), generate the window's LSH pair graph with the batch
    * near-dup operator, then run [[labelWindow]] on those pairs.
    * Communities are LPA's view of the same pair graph
    * [[StreamingClusters.sink]] resolves into connected components —
    * components answer "transitively reachable at all", LPA answers
    * "densely linked" (a chain of borderline matches splits under LPA,
    * merges under components). Every doc gets a row (pairless docs label
    * themselves). Same idempotent dynamic-overwrite layout: (doc_id,
    * label) under `path/window_start=.../`.
    */
  def lshSink(closedDocWindows: DataFrame, path: String,
      checkpoint: String, k: Int = 3, nHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.8, iters: Int = 5): DataStreamWriter[Row] =
    closedDocWindows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wins = batch.select("window_start").distinct()
          .collect().map(_.getTimestamp(0))
        wins.foreach { w =>
          val winDocs = batch
            .where(col("window_start") === lit(w))
            .select(explode(col("docs")).as("d"))
            .select(col("d.doc_id").as("doc_id"), col("d.text").as("text"))
          val lsh = graft.ops.Dedup.minhashLshPairsScoped(
            winDocs, "doc_id", "text", k, nHashes, bands, threshold)
          val labels = labelWindow(
            lsh.df.select(col("doc_a").as("a"), col("doc_b").as("b")),
            w, iters)
          // pairless docs label themselves (the batch operator only sees
          // edge endpoints); materialize before releasing the LSH caches
          val rows = winDocs
            .join(labels, winDocs("doc_id") === labels("node"), "left")
            .select(lit(w).as("window_start"), col("doc_id"),
              coalesce(col("label"), col("doc_id")).as("label"))
            .localCheckpoint()
          lsh.release()
          rows.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(path)
        }
      }
}
