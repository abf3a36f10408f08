package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.ops.TextOps

/** Streaming trending terms: per-tumbling-window heavy hitters over a
  * document stream — "what is this crawl suddenly full of" (spam bursts,
  * event spikes, template floods) while it arrives.
  *
  * Shape: the streaming side keeps ONE count per (window, term) — state
  * is vocabulary-bounded per window and watermark-evicted, never a
  * document buffer (contrast [[StreamingClusters]], whose fixpoint
  * operator genuinely needs the window's doc set). Closed windows emit
  * their (term, n) rows in append mode; the per-window top-k runs INSIDE
  * `foreachBatch` on those closed rows with the bounded
  * [[graft.functions.TopKAgg]] aggregation — the same never-a-window-sort
  * discipline as the batch rankings. The sink partitions by window and
  * dynamically overwrites, so an at-least-once micro-batch replay
  * rewrites its windows instead of duplicating rows.
  */
object StreamingTrends {

  /** Closed-window term counts: (window_start, term, n), emitted when the
    * watermark passes the window end. `docs` needs (event_time: timestamp,
    * text: string).
    */
  def windowedTermCounts(docs: DataFrame, windowDuration: String,
      watermarkDelay: String): DataFrame =
    docs
      .select(col("event_time"),
        explode(TextOps.normTokens(col("text"))).as("term"))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDuration), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("term"), col("n"))

  /** Per-window top-k heavy hitters of a (window_start, term, n) frame —
    * batch side, used by the sink's foreachBatch and by parity tests.
    * Ranking (n desc, term asc) via the bounded tagged top-k Aggregator.
    */
  def topTerms(counts: DataFrame, k: Int): DataFrame = {
    val top = graft.functions.TopKAgg.smallest_k_tagged(k)
    counts
      .groupBy("window_start")
      .agg(top(negate(col("n")), col("term")).as("top"))
      .select(col("window_start"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("window_start"), (col("pos") + 1).cast("int").as("rank"),
        col("e.tag").as("term"), negate(col("e.key")).as("n"))
  }

  /** Replay-idempotent parquet sink of per-window top-k terms: each
    * closed window's ranking lands under `window_start=...`, dynamic
    * overwrite keeps replays from appending duplicates.
    */
  def sink(counts: DataFrame, path: String, k: Int,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    counts.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try topTerms(batch, k).write
          .mode("overwrite").partitionBy("window_start").parquet(path)
        finally saved.fold(
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
        ()
      }
}
