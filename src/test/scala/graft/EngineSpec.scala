package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{EventsAggregator, Sources}

/** End-to-end engine spec over synthetic MIMIC-shaped fixtures (FIXTURES.md).
  * Edge cases encoded: exact-multiple stay duration (floor/ceil W2 tension),
  * pre-intime clamp, post-outtime drop, boundary event at exactly
  * `total_windows`, null valuenum, zero-length interval, non-grid-aligned
  * interval, multi-event window (mean vs sum), stay with no events for a
  * source (dummy file), ffill leading gap.
  */
class EngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session

  private def writeFixtures(root: Path): Unit = {
    val icu = root.resolve("icu")
    Files.createDirectories(icu)
    def put(name: String, header: String, rows: Seq[String]): Unit =
      Files.write(icu.resolve(name), (header +: rows).asJava)

    // stay 1: 2020-01-01 00:00 → 05:30 (19800 s) → total_windows=5 (6 cols)
    // stay 2: exact multiple 00:00 → 04:00 (14400 s) → floor+1 = 5 cols
    //         (the reference's test asserts ceil = 4 — we encode the impl)
    // stay 3: no events anywhere → dummy files
    put("icustays.csv",
      "subject_id,hadm_id,stay_id,first_careunit,last_careunit,intime,outtime,los",
      Seq(
        "1,10,1,MICU,MICU,2020-01-01 00:00:00,2020-01-01 05:30:00,0.23",
        "2,20,2,SICU,SICU,2020-01-01 00:00:00,2020-01-01 04:00:00,0.17",
        "3,30,3,MICU,MICU,2020-01-01 00:00:00,2020-01-01 02:00:00,0.08"))

    put("d_items.csv",
      "itemid,label,abbreviation,linksto,category,unitname,param_type,lownormalvalue,highnormalvalue",
      Seq("100,HR,HR,chartevents,vitals,bpm,Numeric,60,100",
        "200,RR,RR,chartevents,vitals,insp/min,Numeric,12,20",
        "300,NaCl,NaCl,inputevents,fluids,mL,Numeric,,",
        "400,Urine,UO,outputevents,output,mL,Numeric,,",
        "500,Vent,Vent,procedureevents,procedures,min,Numeric,,"))

    // chartevents (MEAN): stay 1 itemid 100:
    //  w0: 1.0 @00:30, 3.0 @00:45, pre-intime 7.0 @23:50 prev day (clamped) → mean 11/3
    //  w1: null valuenum @01:30 → mean null → filled 0.0
    //  w2: 5.0 @02:10
    //  dropped: 9.9 @06:30 (tidx 6 > 5)
    // stay 1 itemid 200: single event w3 = 4.0 (ffill case: w4,w5 stay 0.0 / 4.0)
    put("chartevents.csv",
      "subject_id,hadm_id,stay_id,charttime,storetime,itemid,value,valuenum,valueuom,warning",
      Seq(
        "1,10,1,2020-01-01 00:30:00,2020-01-01 00:31:00,100,1,1.0,bpm,0",
        "1,10,1,2020-01-01 00:45:00,2020-01-01 00:46:00,100,3,3.0,bpm,0",
        "1,10,1,2019-12-31 23:50:00,2019-12-31 23:51:00,100,7,7.0,bpm,0",
        "1,10,1,2020-01-01 01:30:00,2020-01-01 01:31:00,100,bad,,bpm,0",
        "1,10,1,2020-01-01 02:10:00,2020-01-01 02:11:00,100,5,5.0,bpm,0",
        "1,10,1,2020-01-01 06:30:00,2020-01-01 06:31:00,100,9.9,9.9,bpm,0",
        "1,10,1,2020-01-01 03:10:00,2020-01-01 03:11:00,200,4,4.0,insp/min,0"))

    // inputevents (SUM, amount/patientweight, interval):
    //  stay 1 itemid 300: 00:30→02:30 amount 6 weight 2 → marks 1800,5400,9000
    //    → w0,w1,w2 each 1.0
    //  zero-length interval 03:10→03:10 amount 4 weight 2 → w3 = 2.0
    val ieCols = "subject_id,hadm_id,stay_id,starttime,endtime,storetime,itemid," +
      "amount,amountuom,rate,rateuom,orderid,linkorderid,ordercategoryname," +
      "secondaryordercategoryname,ordercomponenttypedescription," +
      "ordercategorydescription,patientweight,totalamount,totalamountuom," +
      "isopenbag,continueinnextdept,cancelreason,statusdescription," +
      "originalamount,originalrate"
    put("inputevents.csv", ieCols, Seq(
      "1,10,1,2020-01-01 00:30:00,2020-01-01 02:30:00,2020-01-01 00:31:00,300," +
        "6.0,mL,3.0,mL/hour,1,1,Fluids,,Main,Continuous,2.0,100,mL,0,0,0,FinishedRunning,6.0,3.0",
      "1,10,1,2020-01-01 03:10:00,2020-01-01 03:10:00,2020-01-01 03:11:00,300," +
        "4.0,mL,,mL/hour,2,2,Fluids,,Main,Bolus,2.0,100,mL,0,0,0,FinishedRunning,4.0,"))

    // outputevents (SUM, point, string value):
    //  stay 2 itemid 400: w0 5.5+4.5=10.0; boundary @04:00 → tidx 4 == tw → kept 2.0
    put("outputevents.csv",
      "subject_id,hadm_id,stay_id,charttime,storetime,itemid,value,valueuom",
      Seq(
        "2,20,2,2020-01-01 00:10:00,2020-01-01 00:11:00,400,5.5,mL",
        "2,20,2,2020-01-01 00:20:00,2020-01-01 00:21:00,400,4.5,mL",
        "2,20,2,2020-01-01 04:00:00,2020-01-01 04:01:00,400,2.0,mL"))

    // procedureevents (SUM, interval): stay 1 itemid 500:
    //  00:50→03:20 (3000→12000) → marks 3000,6600,10200 → w0,w1,w2 each 3.0
    val peCols = "subject_id,hadm_id,stay_id,starttime,endtime,storetime,itemid," +
      "value,valueuom,location,locationcategory,orderid,linkorderid," +
      "ordercategoryname,ordercategorydescription,patientweight,isopenbag," +
      "continueinnextdept,statusdescription,originalamount,originalrate"
    put("procedureevents.csv", peCols, Seq(
      "1,10,1,2020-01-01 00:50:00,2020-01-01 03:20:00,2020-01-01 00:51:00,500," +
        "9.0,min,,,1,1,Ventilation,Continuous,2.0,0,0,FinishedRunning,9.0,"))
  }

  private def readCsvLines(p: Path): Seq[String] =
    Files.readAllLines(p).asScala.toSeq

  lazy val outDir: Path = {
    val root = Files.createTempDirectory("graft-mimic")
    val dst = Files.createTempDirectory("graft-out")
    writeFixtures(root)
    new EventsAggregator(spark, root.toString, dst.toString).run()
    dst
  }

  test("dst dir structure: every stay dir has all four matrices") {
    for (stay <- Seq(1, 2, 3); src <- Sources.all.map(_.name))
      assert(Files.exists(outDir.resolve(s"$stay/${src}_features.csv")),
        s"missing $stay/${src}_features.csv")
    assert(Files.exists(outDir.resolve("readme.txt")))
  }

  test("header width = floor(dur/step)+1 columns (W2 impl semantics)") {
    val h1 = readCsvLines(outDir.resolve("1/chartevents_features.csv")).head
    assert(h1 == "feature_id,0,1,2,3,4,5")
    val h2 = readCsvLines(outDir.resolve("2/outputevents_features.csv")).head
    assert(h2 == "feature_id,0,1,2,3,4") // exact multiple: floor+1 = 5 cols
    val h3 = readCsvLines(outDir.resolve("3/chartevents_features.csv")).head
    assert(h3 == "feature_id,0,1,2") // dummy file still has correct width
  }

  test("MatrixReader loads matrices back: reindex, zero-fill, collate pad") {
    import graft.cli.MatrixReader
    val sources = Sources.all.map(_.name)
    // universe spanning both observed features and one no-stay-has feature
    val universe = Vector(100L, 200L, 300L, 999L)
    val m1 = MatrixReader.readStay(outDir.toString, 1L, sources, universe)
    assert(m1.width == 6) // stay 1 header is feature_id,0..5
    // feature 100 row matches the written chartevents CSV line
    val csvRow = readCsvLines(outDir.resolve("1/chartevents_features.csv"))(1)
      .split(",").drop(1).map(_.toDouble).toSeq
    assert(m1.values(universe.indexOf(100L)).take(csvRow.length).toSeq == csvRow)
    // feature 999 exists nowhere → zero row (reference reindex+fillna)
    assert(m1.values(universe.indexOf(999L)).forall(_ == 0.0))
    // dummy stay 3: header-only files → all-zero (features × 3) matrix
    val m3 = MatrixReader.readStay(outDir.toString, 3L, sources, universe)
    assert(m3.width == 3 && m3.values.flatten.forall(_ == 0.0))
    // collate right-pads the time axis to the widest stay in the batch
    val (n, nf, w, padded) = MatrixReader.collate(Seq(m1, m3))
    assert(n == 2 && nf == universe.size && w == m1.width)
    assert(padded(1).forall(_.length == w))
  }

  test("MatrixReader collate parity: all three reference strategies") {
    import graft.cli.MatrixReader
    val sources = Sources.all.map(_.name)
    val universe = Vector(100L, 200L, 300L, 999L)
    val m1 = MatrixReader.readStay(outDir.toString, 1L, sources, universe)
    val m3 = MatrixReader.readStay(outDir.toString, 3L, sources, universe)
    // truncate_collate: per stay only feature row 0 (universe.head =
    // feature 100), right-padded to the batch's widest time axis
    val (tn, tw, rows) = MatrixReader.truncateCollate(Seq(m1, m3))
    assert(tn == 2 && tw == m1.width)
    assert(rows(0).toSeq == m1.values(0).toSeq) // widest stay: unpadded
    assert(rows(1).toSeq ==
      m3.values(0).padTo(tw, 0.0).toSeq) // narrower stay: zero-padded
    // maxlen_padmask_collate: feature axis padded to maxLen, mask true
    // exactly on the real rows (the reference's 0.0/42.0 sentinel trick
    // marks appended rows — same mask)
    val maxLen = universe.size + 2
    val (pm, mask) = MatrixReader.maxlenPadmaskCollate(Seq(m1, m3), maxLen)
    assert(pm.forall(_.length == maxLen))
    assert(pm.forall(_.forall(_.length == tw)))
    // appended rows are all-zero; mask splits real/pad at universe.size
    assert(mask.forall(mk => mk.count(identity) == universe.size &&
      mk.take(universe.size).forall(identity)))
    assert(pm(0).drop(universe.size).forall(_.forall(_ == 0.0)))
    // real rows survive the pad untouched
    assert(pm(0)(0).toSeq == m1.values(0).toSeq)
    // over-full batch refuses loudly rather than silently truncating
    intercept[IllegalArgumentException] {
      MatrixReader.maxlenPadmaskCollate(Seq(m1), universe.size - 1)
    }
    // padding_collate is the existing collate(); pin the trio's shape
    // contract side by side: (batch, features, time) vs (batch, time)
    val (cn, cf, cw, cp) = MatrixReader.collate(Seq(m1, m3))
    assert(cn == tn && cw == tw && cf == universe.size)
    assert(cp(0).length == universe.size && cp(0)(0).length == cw)
  }

  test("chartevents mean combine + clamp + drop + null skip") {
    val lines = readCsvLines(outDir.resolve("1/chartevents_features.csv"))
    assert(lines.length == 3) // header + itemid 100 + itemid 200 (sorted)
    val r100 = lines(1).split(",")
    assert(r100(0) == "100")
    assert(math.abs(r100(1).toDouble - 11.0 / 3) < 1e-12) // clamped pre-intime joins w0
    assert(r100(2).toDouble == 0.0) // null-only window → 0.0 fill
    assert(r100(3).toDouble == 5.0)
    assert(r100.drop(4).forall(_.toDouble == 0.0)) // post-outtime event dropped
    val r200 = lines(2).split(",")
    assert(r200(0) == "200" && r200(4).toDouble == 4.0)
  }

  test("inputevents interval expand conserves dose and splits evenly") {
    val lines = readCsvLines(outDir.resolve("1/inputevents_features.csv"))
    val r300 = lines(1).split(",").drop(1).map(_.toDouble)
    assert(r300.toSeq == Seq(1.0, 1.0, 1.0, 2.0, 0.0, 0.0))
    assert(math.abs(r300.sum - (6.0 / 2.0 + 4.0 / 2.0)) < 1e-9) // conservation
  }

  test("outputevents sum combine + boundary window kept") {
    val lines = readCsvLines(outDir.resolve("2/outputevents_features.csv"))
    val r400 = lines(1).split(",").drop(1).map(_.toDouble)
    assert(r400.toSeq == Seq(10.0, 0.0, 0.0, 0.0, 2.0))
  }

  test("procedureevents non-grid-aligned interval") {
    val lines = readCsvLines(outDir.resolve("1/procedureevents_features.csv"))
    val r500 = lines(1).split(",").drop(1).map(_.toDouble)
    assert(r500.toSeq == Seq(3.0, 3.0, 3.0, 0.0, 0.0, 0.0))
  }

  test("stay with no events gets header-only dummies for every source") {
    for (src <- Sources.all.map(_.name)) {
      val lines = readCsvLines(outDir.resolve(s"3/${src}_features.csv"))
      assert(lines.length == 1, s"$src dummy should be header-only")
    }
  }

  test("ffill carries last value forward, leading gaps stay 0.0") {
    val root = Files.createTempDirectory("graft-mimic-ff")
    val dst = Files.createTempDirectory("graft-out-ff")
    writeFixtures(root)
    new EventsAggregator(spark, root.toString, dst.toString, ffill = true,
      sources = Seq(Sources.chartevents)).run()
    val lines = readCsvLines(dst.resolve("1/chartevents_features.csv"))
    val r200 = lines(2).split(",").drop(1).map(_.toDouble)
    // single event at w3=4.0: leading gap 0.0, then carried to w4, w5
    assert(r200.toSeq == Seq(0.0, 0.0, 0.0, 4.0, 4.0, 4.0))
    val r100 = lines(1).split(",").drop(1).map(_.toDouble)
    // w1 had a null-only window: ffill carries w0's mean forward over it
    assert(math.abs(r100(1) - 11.0 / 3) < 1e-12)
  }

  test("custom Aggregator combiner plugs into the facade (median chartevents)") {
    val root = Files.createTempDirectory("graft-mimic-med")
    val dst = Files.createTempDirectory("graft-out-med")
    writeFixtures(root)
    val medianSource = graft.api.Sources.chartevents.copy(
      combiner = graft.model.CustomCombine(
        graft.functions.MedianCombine.median_combine))
    new EventsAggregator(spark, root.toString, dst.toString,
      sources = Seq(medianSource)).run()
    val lines = readCsvLines(dst.resolve("1/chartevents_features.csv"))
    val r100 = lines(1).split(",")
    // window 0 values {1.0, 3.0, 7.0} → median 3.0 (mean would be 11/3)
    assert(r100(1).toDouble == 3.0)
  }

  test("--fill interp linearly interpolates interior gaps") {
    val root = Files.createTempDirectory("graft-mimic-li")
    val dst = Files.createTempDirectory("graft-out-li")
    writeFixtures(root)
    new EventsAggregator(spark, root.toString, dst.toString,
      sources = Seq(Sources.chartevents),
      fillMode = Some(graft.etl.Stages.LinearInterp)).run()
    val lines = readCsvLines(dst.resolve("1/chartevents_features.csv"))
    val r100 = lines(1).split(",").drop(1).map(_.toDouble)
    // observations: w0 = 11/3, w2 = 5.0 (w1's null-only window is a gap):
    // w1 = midpoint, trailing gap carries 5.0, leading none
    assert(math.abs(r100(1) - (11.0 / 3 + 5.0) / 2) < 1e-12)
    assert(r100(3) == 5.0 && r100(5) == 5.0)
  }

  test("long-parquet sink roundtrip matches the CSV matrices") {
    val root = Files.createTempDirectory("graft-mimic-lp")
    val dst = Files.createTempDirectory("graft-out-lp")
    writeFixtures(root)
    new EventsAggregator(spark, root.toString, dst.toString)
      .run(graft.io.LongParquetSink)
    import org.apache.spark.sql.functions._
    val long = spark.read.parquet(dst.resolve("long").toString)
    // sources surface as a Hive partition column (partition-pruned reads)
    assert(long.columns.toSet ==
      Set("stay_id", "feature_id", "tidx", "value", "source"))
    // stay 1 / chartevents / feature 100 reconstructs the CSV matrix row
    val vals = long
      .where(col("source") === "chartevents" && col("stay_id") === 1 &&
        col("feature_id") === 100)
      .orderBy("tidx").collect().map(_.getAs[Double]("value")).toSeq
    val csv = readCsvLines(outDir.resolve("1/chartevents_features.csv"))(1)
      .split(",").drop(1).map(_.toDouble).toSeq
    assert(vals.size == csv.size)
    vals.zip(csv).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    // companion stay table covers ALL requested stays (incl. eventless 3)
    val stays = spark.read.parquet(dst.resolve("long_stays").toString)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stays == Map(1L -> 5L, 2L -> 4L, 3L -> 2L))
  }

  test("stay filter prunes and still emits dummies for requested empty stays") {
    val root = Files.createTempDirectory("graft-mimic-f")
    val dst = Files.createTempDirectory("graft-out-f")
    writeFixtures(root)
    new EventsAggregator(spark, root.toString, dst.toString,
      stayIds = Some(Seq(2L, 3L)), sources = Seq(Sources.outputevents)).run()
    assert(!Files.exists(dst.resolve("1")))
    assert(readCsvLines(dst.resolve("2/outputevents_features.csv")).length == 2)
    assert(readCsvLines(dst.resolve("3/outputevents_features.csv")).length == 1)
  }
}
