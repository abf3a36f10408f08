package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in partition-sized batches.
  *
  * The Spark-side shape is real and tested — schema, partition batching,
  * typed Dataset signatures — while the codec itself is a STUB (this
  * container has no image/audio libraries): `decodeStub` derives
  * deterministic pseudo-features from the bytes. Swapping in a real decoder
  * means replacing only the body of [[decodeStub]]; every seam it plugs into
  * (mapPartitions batching, feature schema, downstream aggregation) stays.
  */
object Multimodal {

  /** One media record: opaque payload + source metadata. */
  final case class MediaRecord(
      media_id: Long,
      modality: String,
      payload: Array[Byte],
      source: String)

  /** Decoded features (what a real image/audio decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      byte_len: Long,
      sha_prefix: String,
      width: Int,
      height: Int,
      mean_channel: Double)

  /** Wrap a text table as pretend media: payload = utf-8 bytes. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    docs.select(col(idCol).as("media_id"), lit("image").as("modality"),
      encode(col(textCol), "UTF-8").as("payload"), col(sourceCol).as("source"))

  /** STUB DECODER — deterministic fake. A real deployment decodes
    * image/audio bytes here (one codec instance per partition, amortized
    * over the iterator — the mapPartitions shape is the point). The fake
    * derives every "feature" from the payload bytes so tests and oracles
    * are exact:
    *   width  = byte_len mod 640, height = byte_len mod 480,
    *   mean_channel = mean byte value, sha_prefix = first 8 hex of sha-256.
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" init (real decoders are expensive to create)
      val digest = MessageDigest.getInstance("SHA-256")
      it.map { m =>
        digest.reset()
        val sha = digest.digest(m.payload).map("%02x".format(_)).mkString
        val len = m.payload.length.toLong
        val mean =
          if (len == 0) 0.0
          else m.payload.map(b => (b & 0xFF).toDouble).sum / len
        MediaFeatures(m.media_id, m.modality, len, sha.take(8),
          (len % 640).toInt, (len % 480).toInt, mean)
      }
    }
  }

  /** Deterministic frame/sample extraction: n evenly spaced byte-slices of
    * the payload (the video frame-sampling shape — a real pipeline slices at
    * container keyframe offsets instead). Pure Column algebra; emits
    * (media_id, frame_idx, frame: binary).
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    val stride = (octet_length(col("payload")).cast("long") / lit(n)).cast("long")
    media.select(col("media_id"), col("payload"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => col("payload").substr((i.cast("long") * stride + 1).cast("int"),
            lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .select("media_id", "frame_idx", "frame")
  }

  /** Deterministic "resize" in the stub codec model: a real implementation
    * decodes and rescales pixels to (tw, th); the stub downsamples the
    * pretend-media text to `sampleN` evenly-spaced units (position
    * `1 + (i·len) div sampleN` — pure integer math, mirrored exactly by the
    * DuckDB oracle) and recomputes the channel mean over the sample. The
    * Spark-side shape — per-row Column algebra, no shuffle, no UDF — is
    * what survives a real-codec swap. Emits
    * (media_id, width, height, mean_channel_resized).
    */
  def resizeStub(docs: DataFrame, idCol: String, textCol: String,
      tw: Int, th: Int, sampleN: Int = 32): DataFrame = {
    val len = length(col(textCol)).cast("long")
    val vals = transform(sequence(lit(0), lit(sampleN - 1)),
      i => ascii(col(textCol).substr(
        ((i.cast("long") * len) / lit(sampleN.toLong) + 1).cast("int"), lit(1)))
        .cast("double"))
    docs.select(col(idCol).as("media_id"),
      lit(tw).as("width"), lit(th).as("height"),
      round(aggregate(vals, lit(0.0), (a, x) => a + x) / lit(sampleN.toDouble), 6)
        .as("mean_channel_resized"))
  }

  /** Container-header sniffing WITHOUT a codec: parse the PNG IHDR fields
    * (width, height, bit depth, color type) straight from the byte layout
    * — magic `89 50 4E 47 0D 0A 1A 0A`, then the IHDR chunk whose
    * big-endian dimensions sit at fixed offsets 17-24. This is the step a
    * real crawl pipeline runs on EVERY fetched blob (filter by size/type
    * before paying for a decode), and unlike [[decodeStub]] it is not a
    * stub: the byte offsets are the real PNG specification. Pure Column
    * algebra (substring on binary + hex→int), zero shuffle, codegen'd.
    * Non-PNG payloads yield is_png=false with null fields.
    */
  def pngHeader(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def be(off: Int, len: Int) = // big-endian unsigned int at byte offset
      conv(hex(substring(payload, off, len)), 16, 10).cast("long")
    val isPng = hex(substring(payload, 1, 8)) === lit("89504E470D0A1A0A") &&
      hex(substring(payload, 13, 4)) === lit("49484452") // "IHDR"
    struct(
      isPng.as("is_png"),
      when(isPng, be(17, 4)).as("width"),
      when(isPng, be(21, 4)).as("height"),
      when(isPng, be(25, 1).cast("int")).as("bit_depth"),
      when(isPng, be(26, 1).cast("int")).as("color_type"))
  }

  /** WAV/RIFF header sniff — the audio counterpart of [[pngHeader]], and
    * the LITTLE-endian case (RIFF numeric fields reverse byte order, so
    * the hex pairs are re-sequenced before the int conversion; PNG was
    * big-endian). Canonical PCM layout: "RIFF" @1, "WAVE" @9, "fmt " @13,
    * then LE u16/u32 fields — audio format @21, channels @23, sample rate
    * @25, bits per sample @35. Pure codegen'd projection, zero shuffle.
    */
  def wavHeader(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def leHex(off: Int, len: Int) = { // reverse `len` hex byte-pairs
      val be = hex(substring(payload, off, len))
      concat((len to 1 by -1).map(i => substring(be, i * 2 - 1, 2)): _*)
    }
    def le(off: Int, len: Int) = conv(leHex(off, len), 16, 10).cast("long")
    val isWav = hex(substring(payload, 1, 4)) === lit("52494646") &&
      hex(substring(payload, 9, 4)) === lit("57415645") && // "WAVE"
      hex(substring(payload, 13, 4)) === lit("666D7420") // "fmt "
    struct(
      isWav.as("is_wav"),
      when(isWav, le(21, 2).cast("int")).as("audio_format"),
      when(isWav, le(23, 2).cast("int")).as("channels"),
      when(isWav, le(25, 4)).as("sample_rate"),
      when(isWav, le(35, 2).cast("int")).as("bits_per_sample"))
  }

  /** End-to-end media feature pipeline over a text table. */
  def featurePipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = asMedia(docs, "doc_id", "text", "source").as[MediaRecord]
    decodeStub(media).toDF()
  }
}
