package graft.cli

import java.io.File

/** Consumer-side read-back of the engine's per-stay matrix output — the
  * analog of the reference's PyTorch dataset
  * (`/root/reference/tools/sampleDataset.py:36-110`): per stay, concat
  * every source's `{source}_features.csv`, index rows by `feature_id`
  * (index_col=0 layout), REINDEX to the full feature universe with 0.0
  * rows for features the stay never observed, and emit a dense
  * (features × time) matrix; batches right-pad time to the widest stay
  * (the reference's `padding_collate`).
  *
  * Deliberately driver/consumer-side plain Scala (as the reference is
  * plain pandas): the engine's job ended at the sink; a training loader
  * reads ONE stay's few-KB files per item, which is exactly the layout the
  * per-stay sink exists to serve. The demo proves the round trip: what
  * [[graft.io.MatrixWriter]] wrote, a consumer can load back into model-
  * ready tensors without touching Spark.
  *
  * Usage: `runMain graft.cli.MatrixReader <dstPath> [batchSize]`
  */
object MatrixReader {

  final case class StayMatrix(stayId: Long, featureIds: Vector[Long],
      width: Int, values: Array[Array[Double]])

  /** Parse one `{source}_features.csv`: header `feature_id,0..n` then one
    * row per feature. Returns (width = n+1 time columns, rows keyed by
    * feature id).
    */
  private def readCsv(f: File): (Int, Map[Long, Array[Double]]) = {
    val lines = scala.io.Source.fromFile(f, "UTF-8")
    try {
      val it = lines.getLines()
      val width = it.next().split(',').length - 1
      val rows = it.map { l =>
        val cells = l.split(',')
        cells(0).toLong -> cells.drop(1).map(_.toDouble)
      }.toMap
      (width, rows)
    } finally lines.close()
  }

  /** One stay's combined (features × time) matrix over `universe`. Missing
    * source files are skipped and missing features zero-filled, mirroring
    * the reference's `os.path.exists` guard + `reindex().fillna(0.0)`.
    */
  def readStay(dstPath: String, stayId: Long, sources: Seq[String],
      universe: Vector[Long]): StayMatrix = {
    val perSource = sources
      .map(s => new File(s"$dstPath/$stayId/${s}_features.csv"))
      .filter(_.isFile)
      .map(readCsv)
    val width = if (perSource.isEmpty) 1 else perSource.map(_._1).max
    val combined = perSource.flatMap(_._2).toMap
    val values = universe.map(fid =>
      combined.get(fid) match {
        case Some(row) if row.length == width => row
        case Some(row) => row.padTo(width, 0.0) // narrower source file
        case None => Array.fill(width)(0.0)
      }).toArray
    StayMatrix(stayId, universe, width, values)
  }

  /** Right-pad each matrix's time axis to the batch's widest stay —
    * `padding_collate`. Returns (batch, features, maxWidth) plus the
    * padded tensors.
    */
  def collate(batch: Seq[StayMatrix]): (Int, Int, Int, Seq[Array[Array[Double]]]) = {
    val maxW = batch.map(_.width).max
    val padded = batch.map(_.values.map(_.padTo(maxW, 0.0)))
    (batch.size, batch.headOption.map(_.featureIds.size).getOrElse(0), maxW, padded)
  }

  /** The reference's `truncate_collate`
    * (`tools/sampleDataset.py:36-40`): keep only each stay's FIRST
    * feature row (its own comment says "super simplistic"), right-pad
    * time to the batch's widest stay → one (batch, maxWidth) plane.
    * Returns (batch, maxWidth, rows).
    */
  def truncateCollate(batch: Seq[StayMatrix]): (Int, Int, Seq[Array[Double]]) = {
    val maxW = batch.map(_.width).max
    val rows = batch.map(m =>
      (if (m.values.nonEmpty) m.values(0) else Array.empty[Double])
        .padTo(maxW, 0.0))
    (batch.size, maxW, rows)
  }

  /** The reference's `maxlen_padmask_collate`
    * (`tools/sampleDataset.py:42-61`): pad the FEATURE axis of every stay
    * to exactly `maxLen` rows of zeros and return, per stay, the mask of
    * REAL (non-pad) feature rows. The reference derives the mask by
    * double-padding with 0.0 and 42.0 and testing where the two disagree
    * — a real row can never be 0 and 42 at once, so that trick marks
    * exactly the appended rows; tracking the pre-pad row count is the
    * same mask without the sentinel dance. Time is right-padded to the
    * batch max like [[collate]]. Returns (padded, mask) with
    * padded(i).length == maxLen and mask(i)(j) == true iff row j is real.
    */
  def maxlenPadmaskCollate(batch: Seq[StayMatrix], maxLen: Int)
      : (Seq[Array[Array[Double]]], Seq[Array[Boolean]]) = {
    require(batch.forall(_.values.length <= maxLen),
      s"a stay has more than maxLen=$maxLen feature rows")
    val maxW = batch.map(_.width).max
    val padded = batch.map { m =>
      m.values.map(_.padTo(maxW, 0.0)) ++
        Array.fill(maxLen - m.values.length)(Array.fill(maxW)(0.0))
    }
    val mask = batch.map(m => Array.fill(m.values.length)(true) ++
      Array.fill(maxLen - m.values.length)(false))
    (padded, mask)
  }

  def main(args: Array[String]): Unit = {
    val dstPath = args.headOption.getOrElse(
      sys.error("usage: MatrixReader <dstPath> [batchSize]"))
    val batchSize = if (args.length > 1) args(1).toInt else 4
    val sources = Seq("chartevents", "inputevents", "outputevents",
      "procedureevents")
    val stayIds = Option(new File(dstPath).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.forall(_.isDigit))
      .map(_.getName.toLong).sorted.toVector
    require(stayIds.nonEmpty, s"no stay directories under $dstPath")
    // feature universe = union across all stays' files (the reference takes
    // d_items.csv; the output itself carries the same information)
    val universe = stayIds.flatMap { sid =>
      sources.map(s => new File(s"$dstPath/$sid/${s}_features.csv"))
        .filter(_.isFile)
        .flatMap { f =>
          val src = scala.io.Source.fromFile(f, "UTF-8")
          try src.getLines().drop(1).map(_.takeWhile(_ != ',').toLong).toVector
          finally src.close()
        }
    }.distinct.sorted
    var checksum = 0.0
    stayIds.grouped(batchSize).zipWithIndex.foreach { case (ids, bi) =>
      val (n, nFeat, maxW, padded) =
        collate(ids.map(readStay(dstPath, _, sources, universe)))
      checksum += padded.map(_.map(_.sum).sum).sum
      if (bi < 3 || bi % 50 == 0)
        println(s"[matrix-reader] batch $bi: shape ($n, $nFeat, $maxW)")
    }
    println(f"[matrix-reader] ${stayIds.size} stays, ${universe.size} features, " +
      f"value checksum $checksum%.2f")
  }
}
