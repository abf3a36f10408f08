package graft.cli

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.MeanCombine
import graft.streaming.StreamingAggregator

/** End-to-end Structured Streaming demo/smoke: a file-source event stream →
  * watermarked partial aggregation → parquet sink → exact finalize fold,
  * printed next to the batch-path result on the same data.
  *
  * Usage: `runMain graft.cli.StreamDemo <sfDir>` (driver testdata layout).
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val batch = raw
      .select(col("user_id").as("stay_id"),
        timestamp_seconds(graft.queries.epochSeconds(raw)).as("event_time"),
        col("event_type").as("feature_id"), col("value"))
    val stayIndex = batch.groupBy("stay_id")
      .agg(min(unix_timestamp(col("event_time"))).as("intime"),
        max(unix_timestamp(col("event_time"))).as("outtime"))
      .withColumn("total_windows",
        floor((col("outtime") - col("intime")) / lit(3600)).cast("long"))

    // stage the batch as a file stream source (one file = one microbatch-ish)
    val inDir = Files.createTempDirectory("stream-in").toString
    val outDir = Files.createTempDirectory("stream-out").toString
    val ckDir = Files.createTempDirectory("stream-ck").toString
    batch.write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream.schema(batch.schema).parquet(inDir)
    val partials = StreamingAggregator.partials(stream, stayIndex, 3600L,
      watermark = "1 hour")
    val q = StreamingAggregator.sink(partials, outDir, ckDir).start()
    q.processAllAvailable()
    // append-mode windows flush only once the watermark passes them: push a
    // sentinel event far past the data (its stay_id joins nothing, so it
    // advances the watermark without contributing rows), then let the next
    // microbatch emit everything
    val maxTs = batch.agg(max(col("event_time"))).head().getTimestamp(0)
    Seq((-1L, new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000),
        "sentinel", 0.0))
      .toDF("stay_id", "event_time", "feature_id", "value")
      .write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()

    val streamed = StreamingAggregator.finalizeView(
      spark.read.parquet(outDir), MeanCombine)
    val batchRef = graft.etl.Stages.combine(
      graft.etl.Stages.bucketize(
        batch.withColumn("event_epoch_time", unix_timestamp(col("event_time")))
          .select("stay_id", "event_epoch_time", "feature_id", "value"),
        stayIndex, 3600L), MeanCombine)
    val sCount = streamed.count()
    val bCount = batchRef.count()
    val mismatches = streamed.as("s")
      .join(batchRef.as("b"), Seq("stay_id", "feature_id", "tidx"), "full")
      .where(abs(col("s.value") - col("b.value")) > 1e-9 ||
        col("s.value").isNull || col("b.value").isNull)
      .count()
    println(s"[stream-demo] streamed=$sCount batch=$bCount mismatches=$mismatches")

    // stateful sessionization (flatMapGroupsWithState) against the batch
    // lag/cumsum session count on the same data
    val sessIn = Files.createTempDirectory("sess-in").toString
    val sessEvents = batch.select(col("stay_id").as("user_id"),
      col("event_time"), col("value"))
    sessEvents.write.mode("overwrite").parquet(sessIn)
    val sessStream = graft.streaming.StreamingSessionizer.sessionize(
      spark.readStream.schema(sessEvents.schema).parquet(sessIn)
        .as[graft.streaming.SessionEvent],
      gapSeconds = 1800, watermarkDelay = "1 hour")
    val q2 = sessStream.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    q2.processAllAvailable()
    // sentinel advances the watermark so in-flight sessions time out
    val maxT = sessEvents.agg(max(col("event_time"))).head().getTimestamp(0)
    Seq((-1L, new java.sql.Timestamp(maxT.getTime + 30L * 24 * 3600 * 1000), 0.0))
      .toDF("user_id", "event_time", "value")
      .write.mode("append").parquet(sessIn)
    q2.processAllAvailable(); q2.stop()
    val streamSessions = spark.table("sessions")
      .where(col("user_id") >= 0).count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_time", "value")
    val batchSessions = sessEvents
      .withColumn("prev", lag(unix_timestamp(col("event_time")), 1).over(w))
      .withColumn("new_s", when(col("prev").isNull ||
        unix_timestamp(col("event_time")) - col("prev") > 1800, 1).otherwise(0))
      .agg(sum("new_s")).head().getLong(0)
    println(s"[stream-demo] sessions streamed=$streamSessions batch=$batchSessions")
    spark.stop()
    if (sCount == 0 || mismatches != 0 || streamSessions != batchSessions)
      sys.exit(1)
  }
}
