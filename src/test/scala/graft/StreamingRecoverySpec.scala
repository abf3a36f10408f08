package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Restart-recovery contract for the stateful trackers: a query killed
  * between micro-batches and restarted FROM ITS CHECKPOINT (same source,
  * same pipeline, same checkpoint dir) must resume with its state intact —
  * pairs/sessions/alerts that straddle the restart boundary still fire,
  * nothing already emitted is emitted again, and the combined output is
  * the batch-parity set. This is Spark's own StopStream/StartStream-
  * from-checkpoint discipline: the foreachBatch sink is the
  * fault-tolerant deployment sink, and the HDFS-backed state store +
  * commit log carry the tracker state and watermark across the restart.
  */
class StreamingRecoverySpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Runs `mkQuery` twice against the same checkpoint dir — add `first`
    * batches, stop (the mid-stream kill), restart, add `second` — and
    * returns every row the two incarnations emitted, tagged by phase.
    */
  private def runWithRestart[A](
      mkQuery: () => Dataset[_],
      addFirst: () => Unit, addSecond: () => Unit): (Seq[Row], Seq[Row]) = {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    def start() = {
      val sink: (Dataset[Row], Long) => Unit =
        (b, _) => b.collect().foreach(buf.add)
      mkQuery().toDF().writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink).start()
    }
    val q1 = start()
    try { addFirst(); q1.processAllAvailable() } finally q1.stop()
    val phase1 = buf.toArray(Array.empty[Row]).toSeq
    val q2 = start()
    try { addSecond(); q2.processAllAvailable() } finally q2.stop()
    val all = buf.toArray(Array.empty[Row]).toSeq
    (phase1, all.drop(phase1.size))
  }

  test("near-dup LSH survives restart: cross-boundary pairs, exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingNearDup
    val texts = Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown fox jumps over the lazy cat",
      2L -> "completely different words entirely unrelated text here",
      3L -> "THE  Quick   Brown fox jumps over the lazy dog")
    val source = MemoryStream[(Long, Timestamp, String)]
    val (p1, p2) = runWithRestart(
      () => StreamingNearDup.hits(
        source.toDF().toDF("doc_id", "event_time", "text"),
        k = 3, nHashes = 64, bands = 32, threshold = 0.5,
        horizonSeconds = 86400, watermarkDelay = "0 seconds"),
      () => source.addData(
        (0L, ts("2020-01-01 00:00:00"), texts(0)._2),
        (1L, ts("2020-01-01 00:10:00"), texts(1)._2)),
      () => source.addData(
        (2L, ts("2020-01-01 00:20:00"), texts(2)._2),
        (3L, ts("2020-01-01 00:30:00"), texts(3)._2)))
    def pairs(rs: Seq[Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 3 arrived AFTER the restart; its pairs with pre-restart docs 0
    // and 1 prove the LSH corpus state was reloaded, not rebuilt empty
    assert(pairs(p2).contains((0L, 3L)) && pairs(p2).contains((1L, 3L)),
      s"cross-restart pairs missing: ${pairs(p2)}")
    // nothing re-emitted, and the union is the batch-parity set
    assert(pairs(p1).intersect(pairs(p2)).isEmpty)
    val batch = graft.ops.Dedup.minhashLshPairs(
      texts.toDF("doc_id", "text"), "doc_id", "text", 3, 64, 32, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(p1) ++ pairs(p2) == batch,
      s"stream ${pairs(p1) ++ pairs(p2)} vs batch $batch")
  }

  test("visual dedup survives restart: re-encode arriving after resume hits") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Multimodal
    import graft.streaming.StreamingVisualDedup
    def pix(x: Int, y: Int): Int = {
      val ph = (x / 2 + y / 2) % 2
      val base = if (ph == 1) 230 else 20
      ((base + x) << 16) | ((base + y) << 8) | ((base + (x ^ y)) % 256)
    }
    val source = MemoryStream[(Long, Timestamp, Array[Byte])]
    val (p1, p2) = runWithRestart(
      () => StreamingVisualDedup.hits(
        source.toDF().toDF("media_id", "event_time", "payload"),
        maxDist = 3, horizonSeconds = 86400, watermarkDelay = "0 seconds"),
      () => source.addData(
        (1L, ts("2020-01-01 00:00:00"), Multimodal.makePng(16, 16, pix)),
        (3L, ts("2020-01-01 00:05:00"),
          Multimodal.makePng(16, 16, (x, y) => if (x < 8) 0xFFFFFF else 0))),
      () => source.addData(
        (2L, ts("2020-01-01 00:10:00"),
          Multimodal.makeBmp(32, 32, (x, y) => pix(x / 2, y / 2)))))
    // the 2x BMP re-encode of pre-restart image 1 arrives after resume:
    // the hit requires image 1's perceptual hash from recovered state
    assert(p1.isEmpty)
    assert(p2.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ==
      Set((1L, 2L, 0)), s"got ${p2.mkString(",")}")
  }

  test("burst detector survives restart: trailing-rate evidence persists") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingBursts
    val source = MemoryStream[(String, Timestamp)]
    val baseline = (0 to 6).map(h => ("api", ts(f"2020-01-01 $h%02d:15:00")))
    val spike = (0 until 10).map(m => ("api", ts(f"2020-01-01 07:${m * 5}%02d:00")))
    val (p1, p2) = runWithRestart(
      () => StreamingBursts.detect(
        source.toDF().toDF("event_type", "event_time"),
        horizonSeconds = 86400, watermarkDelay = "0 seconds"),
      () => source.addData(baseline ++ spike: _*),
      () => source.addData(("api", ts("2020-01-01 08:01:00"))))
    // the hour-8 event closes spike hour 7 AFTER the restart; the alert's
    // 7-hour trailing evidence only exists in the recovered state
    assert(p1.isEmpty, s"no closed hour had full evidence pre-restart: $p1")
    val hr7 = ts("2020-01-01 07:00:00").getTime / 1000 / 3600
    assert(p2.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet == Set(("api", hr7, 10L, 7L, 7L)),
      s"got ${p2.mkString(",")}")
  }

  test("segment dedup survives restart: first-seen state persists") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingSegmentDedup
    val source = MemoryStream[(Long, Timestamp, String)]
    val (p1, p2) = runWithRestart(
      () => StreamingSegmentDedup.keptSegments(
        source.toDF().toDF("doc_id", "event_time", "text"),
        sep = "\n", horizonSeconds = 86400, watermarkDelay = "0 seconds"),
      () => source.addData(
        (1L, ts("2020-01-01 00:00:00"), "nav bar\nreal one")),
      () => source.addData(
        (2L, ts("2020-01-01 00:10:00"), "nav bar\nreal two")))
    def kept(rs: Seq[Row]) = rs.map(r => (r.getLong(0), r.getString(2))).toSet
    // doc 2's "nav bar" arrived after the restart; the reloaded state
    // must drop it (first-seen was doc 1), keeping only the fresh line
    assert(kept(p1) == Set((1L, "nav bar"), (1L, "real one")))
    assert(kept(p2) == Set((2L, "real two")),
      s"state lost across restart: ${kept(p2)}")
  }

  test("chunk dedup survives restart: stored fingerprints stay deduped") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingChunkDedup
    val para = "the quarterly report shows steady growth across " +
      "all regions with particular strength in the northern market " * 4
    val source = MemoryStream[(Long, Timestamp, String)]
    val (p1, p2) = runWithRestart(
      () => StreamingChunkDedup.newChunks(
        source.toDF().toDF("doc_id", "event_time", "text"),
        horizonSeconds = 86400, watermarkDelay = "0 seconds").toDF(),
      () => source.addData(
        (1L, ts("2020-01-01 00:00:00"), s"intro for doc one $para")),
      () => source.addData(
        (2L, ts("2020-01-01 00:10:00"), s"different head here $para")))
    // doc 2 arrives after the restart: its paragraph chunks were stored
    // pre-kill, so only the chunks its distinct head produces are new
    assert(p1.nonEmpty)
    val pre = p1.map(_.getString(0)).toSet
    val post = p2.map(_.getString(0)).toSet
    assert(p2.nonEmpty && (pre & post).isEmpty,
      s"restart re-emitted stored fingerprints: ${pre & post}")
    assert(post.size < pre.size,
      s"shared paragraph must dedup across the restart: ${post.size}")
  }

  test("segment near-dup survives restart: variant arriving after resume hits") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingSegmentNearDup
    val bpA = "sign up for our weekly newsletter and get the best " +
      "stories delivered right to your inbox every single day now"
    val bpB = "sign up for our weekly newsletter and get the best " +
      "stories delivered right to your inbox every single day instant"
    val source = MemoryStream[(Long, Timestamp, String)]
    val (p1, p2) = runWithRestart(
      () => StreamingSegmentNearDup.hits(
        source.toDF().toDF("doc_id", "event_time", "text"),
        sep = "\n", maxDist = 3, minTokens = 3, horizonSeconds = 86400,
        watermarkDelay = "0 seconds"),
      () => source.addData(
        (1L, ts("2020-01-01 00:00:00"), "alpha beta gamma\n" + bpA)),
      () => source.addData(
        (2L, ts("2020-01-01 00:10:00"), "eta theta iota\n" + bpB)))
    // bpA lives only in pre-restart state; bpB arriving after resume must
    // still pair with it at hamming 3
    assert(p1.isEmpty)
    val hits = p2.map(r => r.getInt(2)).toSet
    assert(p2.size >= 1 && hits == Set(3),
      s"cross-restart near-dup lost: ${p2}")
  }

  test("audio dedup survives restart: volume re-encode after resume hits") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Multimodal
    import graft.streaming.StreamingAudioDedup
    def wave(g: Int, amp: Int): Seq[Int] = (0 until 256).map { i =>
      val k = i % 64
      if ((g + 1) * (k * k + k + 41) % 97 < 48) amp else -amp
    }
    val source = MemoryStream[(Long, Timestamp, Array[Byte])]
    val (p1, p2) = runWithRestart(
      () => StreamingAudioDedup.hits(
        source.toDF().toDF("media_id", "event_time", "payload"),
        maxDist = 3, horizonSeconds = 86400, watermarkDelay = "0 seconds"),
      () => source.addData(
        (1L, ts("2020-01-01 00:00:00"), Multimodal.makeWav(8000, wave(0, 1000))),
        (3L, ts("2020-01-01 00:05:00"), Multimodal.makeWav(8000, wave(5, 1000)))),
      () => source.addData(
        (2L, ts("2020-01-01 00:10:00"), Multimodal.makeWav(8000, wave(0, 3000)))))
    // the 3x-volume re-encode of pre-restart clip 1 arrives after resume:
    // the reloaded band state must pair them at hamming 0
    assert(p1.isEmpty)
    val hits = p2.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(hits == Set((1L, 2L, 0)), s"cross-restart audio dup lost: $hits")
  }

  test("trending terms survive restart: open window closes with pre-kill counts") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingTrends
    val source = MemoryStream[(Timestamp, String)]
    val (p1, p2) = runWithRestart(
      () => StreamingTrends.windowedTermCounts(
        source.toDF().toDF("event_time", "text"),
        windowDuration = "1 hour", watermarkDelay = "0 seconds"),
      () => source.addData(
        (ts("2020-01-01 00:05:00"), "alpha alpha beta"),
        // window 1 partial BEFORE the kill; also closes window 0
        (ts("2020-01-01 01:05:00"), "gamma beta")),
      () => source.addData(
        (ts("2020-01-01 01:10:00"), "gamma gamma delta"),
        (ts("2020-01-01 02:05:00"), "omega"))) // closes window 1
    def m(rs: Seq[Row]) = rs
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    assert(m(p1) == Map(
      ("2020-01-01 00:00:00.0", "alpha") -> 2L,
      ("2020-01-01 00:00:00.0", "beta") -> 1L), s"phase1: ${m(p1)}")
    // window 1 closed AFTER the restart: its counts must merge the
    // pre-kill partial (gamma 1, beta 1) with post-restart arrivals —
    // recovered aggregation state, not a rebuilt-empty window
    assert(m(p2) == Map(
      ("2020-01-01 01:00:00.0", "gamma") -> 3L,
      ("2020-01-01 01:00:00.0", "beta") -> 1L,
      ("2020-01-01 01:00:00.0", "delta") -> 1L), s"phase2: ${m(p2)}")
  }

  test("stream-stream join survives restart: buffered left side still pairs") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingJoin
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val (p1, p2) = runWithRestart(
      () => StreamingJoin.withinTime(
        imps.toDF().toDF("ad_id", "imp_time"),
        clicks.toDF().toDF("ad_id", "click_time"),
        "ad_id", "imp_time", "click_time",
        maxDelay = "30 minutes", watermarkDelay = "0 seconds"),
      // the impression arrives, no click yet: buffered as join state
      () => imps.addData((7L, ts("2020-01-01 00:00:00"))),
      // the click arrives only AFTER the restart — the pair requires the
      // pre-kill impression from the recovered join buffer; the second
      // click is outside the 30-minute bound and must not pair
      () => clicks.addData(
        (7L, ts("2020-01-01 00:10:00")),
        (7L, ts("2020-01-01 00:45:00"))))
    assert(p1.isEmpty)
    val pairs = p2.map(r => (r.getLong(0), r.getTimestamp(1).toString,
      r.getTimestamp(2).toString)).toSet
    assert(pairs == Set(
      (7L, "2020-01-01 00:00:00.0", "2020-01-01 00:10:00.0")),
      s"got $pairs")
  }

  test("exact dedup survives restart: duplicate arriving after resume drops") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val source = MemoryStream[(Long, Timestamp, String)]
    val (p1, p2) = runWithRestart(
      () => StreamingDedup.firstSeen(
        source.toDF().toDF("doc_id", "event_time", "text"),
        horizonSeconds = 86400, watermarkDelay = "0 seconds"),
      () => source.addData(
        (1L, ts("2020-01-01 00:00:00"), "the quick brown fox"),
        (2L, ts("2020-01-01 00:05:00"), "something else entirely")),
      () => source.addData(
        // same normalized fingerprint as doc 1 — only the RECOVERED
        // seen-set can know to drop it
        (3L, ts("2020-01-01 00:10:00"), "THE  Quick  Brown   Fox"),
        (4L, ts("2020-01-01 00:15:00"), "a genuinely new document")))
    def kept(rs: Seq[Row]) = rs.map(_.getLong(0)).toSet
    assert(kept(p1) == Set(1L, 2L))
    assert(kept(p2) == Set(4L),
      s"duplicate re-admitted after restart: ${kept(p2)}")
  }

  test("CDC upsert survives restart: snapshot folds on, replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingUpsert
    val root = java.nio.file.Files.createTempDirectory("sur_root").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sur_ckpt").toString
    val base = Seq((0L, 1, "a"), (1L, 1, "b")).toDF("doc_id", "version", "text")
    StreamingUpsert.init(base, root)
    val source = MemoryStream[(Long, Int, String, Boolean)]
    def start() = StreamingUpsert.sink(
      source.toDF().toDF("doc_id", "version", "text", "deleted"),
      root, "doc_id", "version", ckpt).start()
    def snap() = StreamingUpsert.current(spark, root)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2))))
      .toMap
    val q1 = start()
    try {
      source.addData((1L, 2, "b2", false)); q1.processAllAvailable()
    } finally q1.stop()
    val afterKill = snap()
    assert(afterKill == Map(0L -> ((1, "a")), 1L -> ((2, "b2"))))
    // restart from the same checkpoint: the next batch folds onto the
    // pre-kill snapshot (no rebase to the init version, no double apply)
    val q2 = start()
    try {
      source.addData((2L, 1, "c", false), (0L, 2, "", true))
      q2.processAllAvailable()
    } finally q2.stop()
    val fin = snap()
    assert(fin == Map(1L -> ((2, "b2")), 2L -> ((1, "c"))), s"got $fin")
    // at-least-once replay of an ALREADY-APPLIED batch id after the
    // restart: the pointer guard makes it a no-op — same snapshot, same
    // pointer, no crash loop from reading-while-overwriting
    StreamingUpsert.applyBatch(
      Seq((1L, 2, "b2", false)).toDF("doc_id", "version", "text", "deleted"),
      batchId = 0L, root, "doc_id", "version")
    assert(snap() == fin)
  }

  test("sessionizer survives restart: open session closes with pre-kill sums") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{SessionEvent, StreamingSessionizer}
    val source = MemoryStream[SessionEvent]
    val (p1, p2) = runWithRestart(
      () => StreamingSessionizer.sessionize(
        source.toDS(), gapSeconds = 1800, watermarkDelay = "0 seconds"),
      () => source.addData(
        SessionEvent(1L, ts("2020-01-01 00:00:00"), 1.0),
        SessionEvent(1L, ts("2020-01-01 00:10:00"), 2.0)),
      () => source.addData(SessionEvent(2L, ts("2020-01-02 00:00:00"), 8.0)))
    // user 1's session was OPEN at the kill; the post-restart watermark
    // advance must close it with the pre-kill (n=2, sum=3.0) aggregates
    assert(p1.isEmpty)
    val closed = p2.map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
    assert(closed.contains((1L, 2L, 3.0)),
      s"recovered session state lost: $closed")
  }

  test("KMV distinct tracker survives restart: sketch state intact") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDistinct
    import graft.ops.Kmv
    val source = MemoryStream[(String, Timestamp, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_kmv").toString
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    def start() = StreamingDistinct.estimates(
        source.toDF().toDF("grp", "event_time", "key"),
        k = 16, watermarkDelay = "0 seconds")
      .toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: Dataset[Row], _: Long) =>
        b.collect().foreach(buf.add)).start()
    val first = (0 until 10).map(i => ("g1", ts("2020-01-01 00:00:01"),
      s"a$i"))
    val second = (5 until 60).map(i => ("g1", ts("2020-01-01 00:00:02"),
      s"a$i"))
    val q1 = start()
    try { source.addData(first: _*); q1.processAllAvailable() }
    finally q1.stop() // the mid-stream kill: sketch holds 10 hashes
    val q2 = start()
    try { source.addData(second: _*); q2.processAllAvailable() }
    finally q2.stop()
    val last = buf.toArray(Array.empty[Row]).toSeq.last
    // the recovered sketch must fold phase 2 INTO phase 1's state: the
    // final estimate equals the batch sketch of the FULL stream (a lost
    // sketch would re-count a5..a9 fresh and miss a0..a4 entirely)
    val want = Kmv.distinctEstimate(
        (first ++ second).map(t => (t._1, t._3)).toDF("grp", "key"),
        Seq("grp"), col("key"), k = 16)
      .select("k_used", "est").head()
    assert((last.getInt(1).toLong, last.getLong(2))
      == ((want.getLong(0), want.getLong(1))),
      s"recovered $last vs batch $want")
  }

  test("HLL distinct tracker survives restart: registers intact") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingHll
    import graft.ops.Hll
    val source = MemoryStream[(String, Timestamp, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_hll").toString
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    def start() = StreamingHll.estimates(
        source.toDF().toDF("grp", "event_time", "key"),
        p = 6, watermarkDelay = "0 seconds")
      .toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: Dataset[Row], _: Long) =>
        b.collect().foreach(buf.add)).start()
    val first = (0 until 40).map(i => ("g1", ts("2020-01-01 00:00:01"),
      s"a$i"))
    val second = (20 until 200).map(i => ("g1", ts("2020-01-01 00:00:02"),
      s"a$i"))
    val q1 = start()
    try { source.addData(first: _*); q1.processAllAvailable() }
    finally q1.stop() // mid-stream kill: registers hold phase 1's maxes
    val q2 = start()
    try { source.addData(second: _*); q2.processAllAvailable() }
    finally q2.stop()
    val last = buf.toArray(Array.empty[Row]).toSeq.last
    // the recovered registers must fold phase 2 into phase 1's state:
    // the final estimate equals the batch sketch of the FULL stream
    val want = Hll.distinctEstimate(
        (first ++ second).map(t => (t._1, t._3)).toDF("grp", "key"),
        Seq("grp"), col("key"), p = 6)
      .select("v_empty", "est").head()
    assert((last.getInt(1).toLong, last.getLong(2))
      == ((want.getLong(0), want.getLong(1))),
      s"recovered $last vs batch $want")
  }

  test("CMS frequency tracker survives restart: counters intact") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCms
    import graft.ops.Cms
    val source = MemoryStream[(String, Timestamp, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_cms").toString
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    def start() = StreamingCms.estimates(
        source.toDF().toDF("grp", "event_time", "key"),
        d = 4, w = 64, watermarkDelay = "0 seconds")
      .toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: Dataset[Row], _: Long) =>
        b.collect().foreach(buf.add)).start()
    val first = (0 until 6).flatMap(i =>
      Seq.fill(3)(("g1", ts("2020-01-01 00:00:01"), s"u$i")))
    val second = Seq(("g1", ts("2020-01-01 00:00:02"), "u0"))
    val q1 = start()
    try { source.addData(first: _*); q1.processAllAvailable() }
    finally q1.stop() // mid-stream kill: u0's counters hold 3
    val q2 = start()
    try { source.addData(second: _*); q2.processAllAvailable() }
    finally q2.stop()
    val last = buf.toArray(Array.empty[Row]).toSeq.last
    assert(last.getString(1) == "u0")
    // the recovered counters must fold phase 2 onto phase 1's state:
    // u0's estimate equals the batch CMS of the FULL stream (a lost
    // table would report 1)
    val all = (first ++ second).map(t => t._3).toDF("k")
    val want = Cms.estimate(Cms.sketch(all, col("k"), 4, 64),
        Seq("u0").toDF("k"), "k", 4, 64).head().getLong(1)
    assert(last.getLong(2) == want, s"recovered $last vs batch $want")
  }

  test("AMS F2 tracker survives restart: Z sums intact") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingAms
    import graft.ops.Ams
    val source = MemoryStream[(String, Timestamp, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_ams").toString
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    def start() = StreamingAms.estimates(
        source.toDF().toDF("grp", "event_time", "key"),
        watermarkDelay = "0 seconds")
      .toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: Dataset[Row], _: Long) =>
        b.collect().foreach(buf.add)).start()
    val first = (1 to 12).flatMap(j =>
      Seq.fill(j)(("g1", ts("2020-01-01 00:00:01"), s"key-$j")))
    val second = (1 to 6).map(j =>
      ("g1", ts("2020-01-01 00:00:02"), s"key-$j"))
    val q1 = start()
    try { source.addData(first: _*); q1.processAllAvailable() }
    finally q1.stop() // mid-stream kill: Z sums hold the first fold
    val q2 = start()
    try { source.addData(second: _*); q2.processAllAvailable() }
    finally q2.stop()
    val last = buf.toArray(Array.empty[Row]).toSeq.last
    // recovered Z sums must fold phase 2 onto phase 1's state: the final
    // estimate equals the batch fold of the FULL stream
    val want = Ams.f2Estimate((first ++ second).map(t => ("g1", t._3))
        .toDF("grp", "k"), Seq("grp"), col("k")).head().getLong(1)
    assert(last.getLong(1) == want, s"recovered $last vs batch $want")
  }

  test("priority-sample tracker survives restart: top-(k+1) intact") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingPrioritySample
    import graft.ops.Sampling
    val source = MemoryStream[(String, Timestamp, String, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_prio").toString
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    def start() = StreamingPrioritySample.estimates(
        source.toDF().toDF("grp", "event_time", "id", "w"), k = 6,
        watermarkDelay = "0 seconds")
      .toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: Dataset[Row], _: Long) =>
        b.collect().foreach(buf.add)).start()
    val first = (1 to 15).map(i =>
      ("g1", ts("2020-01-01 00:00:01"), s"doc-$i", (i % 4 + 1).toLong))
    val second = (16 to 25).map(i =>
      ("g1", ts("2020-01-01 00:00:02"), s"doc-$i", (i % 3 + 2).toLong))
    val q1 = start()
    try { source.addData(first: _*); q1.processAllAvailable() }
    finally q1.stop() // mid-stream kill: the top-7 triples persist
    val q2 = start()
    try { source.addData(second: _*); q2.processAllAvailable() }
    finally q2.stop()
    val last = buf.toArray(Array.empty[Row]).toSeq.last
    // recovered state must merge phase 2 into phase 1's top set: the
    // final (n_kept, tau, estimate) equals the batch gate on the FULL
    // stream (a lost state would sample phase 2 alone)
    val rows = Sampling.prioritySample(
      (first ++ second).map(t => (t._3, t._4)).toDF("id", "w"),
      "id", "w", 6).collect()
    assert(last.getInt(1) == rows.length &&
      last.getLong(2) == rows.head.getLong(3) &&
      last.getLong(3) == rows.map(_.getLong(4)).sum,
      s"recovered $last vs batch ${rows.mkString(",")}")
  }

  test("quantile tracker survives restart: sample state intact") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingQuantiles
    import graft.ops.QuantileSketch
    val source = MemoryStream[(String, Timestamp, String, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_qs").toString
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    def start() = StreamingQuantiles.estimates(
        source.toDF().toDF("grp", "event_time", "key", "value"),
        k = 16, ps = Seq(50, 99), watermarkDelay = "0 seconds")
      .toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: Dataset[Row], _: Long) =>
        b.collect().foreach(buf.add)).start()
    val first = (0 until 10).map(i =>
      ("g1", ts("2020-01-01 00:00:01"), s"a$i", (i * 11 % 97).toLong))
    val second = (10 until 80).map(i =>
      ("g1", ts("2020-01-01 00:00:02"), s"a$i", (i * 7 % 89).toLong))
    val q1 = start()
    try { source.addData(first: _*); q1.processAllAvailable() }
    finally q1.stop() // mid-stream kill: sample holds phase 1's 10 rows
    val q2 = start()
    try { source.addData(second: _*); q2.processAllAvailable() }
    finally q2.stop()
    val lastByP = buf.toArray(Array.empty[Row]).toSeq
      .groupBy(_.getInt(1)).map { case (p, rs) => p -> rs.last }
    // the recovered sample must fold phase 2 into phase 1's rows: the
    // final estimates equal the batch sketch of the FULL stream (a lost
    // sample would resample phase 2 alone and shift every rank pick)
    val want = QuantileSketch.quantiles(
        (first ++ second).map(t => (t._1, t._3, t._4)).toDF("grp", "key", "v"),
        Seq("grp"), col("v"), col("key"), k = 16, ps = Seq(50, 99))
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    want.foreach { case (p, (n, est)) =>
      val got = lastByP(p)
      assert((got.getLong(2), got.getLong(3)) == ((n, est)),
        s"recovered p$p $got vs batch ($n, $est)")
    }
  }

  test("windowed label propagation survives restart: pre-kill window intact, replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingLabelProp
    val source = MemoryStream[(Long, Long, Timestamp)]
    val out = java.nio.file.Files.createTempDirectory("slp_r_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("slp_r_ckpt").toString
    def start() = StreamingLabelProp.sink(
      StreamingLabelProp.windowedEdgeSets(
        source.toDF().toDF("a", "b", "event_time"),
        windowDuration = "1 hour", watermarkDelay = "0 seconds"),
      out, ckpt, iters = 4).start()
    val q1 = start()
    try {
      // window 0 edges arrive, then the kill lands BEFORE anything
      // closes it — the open window's buffer must survive in state
      source.addData(
        (1L, 2L, ts("2020-01-01 00:05:00")),
        (2L, 3L, ts("2020-01-01 00:10:00")),
        (1L, 3L, ts("2020-01-01 00:15:00")))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      // after restart, a window-1 edge closes window 0 with its
      // PRE-KILL edges; the pusher closes window 1
      source.addData((5L, 6L, ts("2020-01-01 01:10:00")))
      q2.processAllAvailable()
      source.addData((98L, 99L, ts("2020-01-01 03:00:00")))
      q2.processAllAvailable()
    } finally q2.stop()
    val got = spark.read.parquet(out)
      .select("window_start", "node", "label")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("2020-01-01 00:00:00.0", 1L, 1L), ("2020-01-01 00:00:00.0", 2L, 1L),
      ("2020-01-01 00:00:00.0", 3L, 1L),
      ("2020-01-01 01:00:00.0", 5L, 5L), ("2020-01-01 01:00:00.0", 6L, 6L)),
      s"got $got")
  }
}
