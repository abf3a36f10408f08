package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TextOps

/** One banded arrival: a document's presence in one LSH (band, bucket),
  * carrying what verification needs (its distinct shingle hashes).
  */
final case class BandArrival(bkey: String, doc_id: Long,
    event_time: Timestamp, hashes: Array[Long])

/** Per-(band, bucket) state: docs currently inside the horizon. */
final case class BucketDocs(docs: List[(Long, Long, Array[Long])])

/** A verified streaming near-duplicate hit (doc_a < doc_b). */
final case class NearDupHit(doc_a: Long, doc_b: Long, jaccard: Double)

/** Streaming MinHash-LSH near-duplicate detection: the streaming
  * counterpart of [[graft.ops.Dedup.minhashLshPairs]] — arriving documents
  * are checked against everything seen inside a time horizon, emitting
  * exact-Jaccard-verified pairs as they happen (the live feed
  * [[StreamingDedup]] provides for EXACT dups, extended to near-dups).
  *
  * Shape: the signature is computed STATELESSLY per row (one xxhash64 per
  * shingle, then the seeded long-multiply rehash family per hash — string
  * hashing happens once, so the nHashes × |shingles| inner loop is cheap
  * integer math), because a streaming groupBy-Aggregator signature would
  * chain two stateful operators (unsupported shape). The SAME seeded
  * family and band-key derivation as the batch path, so stream and batch
  * agree on candidates bit-for-bit; verification stores each doc's
  * distinct shingle HASHES in state — set intersection over 64-bit hashes
  * equals the batch string-set intersection up to hash collisions
  * (~n²·2⁻⁶⁴, ignorable).
  *
  * State: one list of (doc_id, seconds, hashes) per LIVE (band, bucket) —
  * horizon-bounded like [[StreamingDedup]] (event-time timeout evicts
  * idle buckets; arrivals prune in-bucket docs older than the horizon).
  * A pair sharing several buckets emits once PER bucket — downstream
  * consumers dedupe by (doc_a, doc_b) (the batch path dedupes candidates
  * the same way before verification; here verification is per-bucket so
  * the dedupe moves downstream).
  */
object StreamingNearDup {

  /** Mirror of the batch seeded rehash ([[graft.functions.SigAggregators]]
    * `seeded`): base = xxhash64(sh) >>> 8, element i =
    * (base · (2i+1)) XOR (i · −φ64). The XOR constants are precomputed on
    * the JVM (wrapping) — inline SQL multiplication would overflow under
    * ANSI mode.
    */
  private def sigExpr(shingles: org.apache.spark.sql.Column, nHashes: Int) = {
    // LET-BIND the base hashes (the Multimodal letCol discipline): as a
    // plain val, the `bases` transform is INLINED into each of the
    // nHashes array_min entries, so every shingle was string-hashed
    // nHashes times per row (measured ~5 ms/doc at 64 hashes); bound as
    // a lambda variable it evaluates once per row
    val bases = transform(shingles, sh => shiftrightunsigned(xxhash64(sh), 8))
    try_element_at(transform(array(bases), bs =>
      array((0 until nHashes).map { i =>
        array_min(transform(bs,
          h => (h * lit(2L * i + 1)).bitwiseXOR(lit(-0x61c8864680b583ebL * i))))
      }: _*)), lit(1))
  }

  /** Verified near-dup hits for a streaming (doc_id, event_time, text)
    * frame. Emits per matching bucket — `dropDuplicates` or a downstream
    * distinct collapses multi-band hits.
    */
  def hits(docs: DataFrame, k: Int, nHashes: Int, bands: Int,
      threshold: Double, horizonSeconds: Long,
      watermarkDelay: String): Dataset[NearDupHit] = {
    require(nHashes % bands == 0, "bands must divide nHashes")
    require(nHashes <= 64, "seeded rehash is overflow-free only for <= 64")
    val r = nHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = TextOps.wordShingles(col("text"), k)
    val withSig = docs
      .withColumn("hashes", transform(sh, s => xxhash64(s)))
      .where(size(col("hashes")) > 0) // shingle-less docs drop out (batch too)
      .withColumn("sig", sigExpr(sh, nHashes))
    val banded = withSig.select(col("doc_id"), col("event_time"),
        col("hashes"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * r + lit(1), lit(r)), b)))
          .as(Seq("band", "bucket")))
      .select(concat_ws(":", col("band"), col("bucket")).as("bkey"),
        col("doc_id"), col("event_time"), col("hashes"))
      .as[BandArrival]
    banded
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.bkey)
      .flatMapGroupsWithState[BucketDocs, NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, batch: Iterator[BandArrival], state: GroupState[BucketDocs]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = batch.toSeq
              .sortBy(a => (a.event_time.getTime, a.doc_id))
            val latest = arrivals.map(_.event_time.getTime / 1000).max
            var docs = state.getOption.map(_.docs).getOrElse(Nil)
            val out = Seq.newBuilder[NearDupHit]
            arrivals.foreach { a =>
              // horizon pruned per ARRIVAL, not once per micro-batch:
              // pruning only at batch entry made an arrival pair with
              // same-batch docs arbitrarily older than the horizon, so
              // output depended on micro-batch boundaries (and a replay
              // that compresses event time into few batches went
              // quadratic inside viral buckets). Arrivals are sorted, so
              // the floor is monotone and each doc is dropped once.
              val floor = a.event_time.getTime / 1000 - horizonSeconds
              docs = docs.filter(_._2 >= floor)
              val aSet = a.hashes.toSet
              docs.foreach { case (oid, _, oh) =>
                if (oid != a.doc_id) {
                  val common = oh.count(aSet.contains)
                  val j = common.toDouble /
                    (aSet.size + oh.length - common).toDouble
                  if (j >= threshold)
                    out += NearDupHit(math.min(a.doc_id, oid),
                      math.max(a.doc_id, oid), j)
                }
              }
              docs = (a.doc_id, a.event_time.getTime / 1000,
                a.hashes.distinct) :: docs
            }
            state.update(BucketDocs(docs))
            // clamp to just past the watermark: a key lagging the watermark
            // by > horizon would otherwise throw and kill the query
            state.setTimeoutTimestamp(math.max((latest + horizonSeconds) * 1000,
              state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }
  }
}
