package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) Viterbi segmentation — the OTHER major
  * subword tokenizer family next to BPE ([[Bpe]]): instead of replaying a
  * merge history, each word is segmented into the MINIMUM-total-cost piece
  * sequence over a weighted vocabulary (Kudo 2018, arXiv:1804.10959). True
  * SentencePiece costs are float −log p(piece); here the cost is the
  * integer analog `(⌊log₂ total⌋ − ⌊log₂ cnt⌋)·1000 + 500` milli-units —
  * floor-log₂ is exact on both engines (`length(bin(x)) − 1`), the +500
  * per piece penalizes fragmentation, and the whole DP is integer math, so
  * segmentations are bit-identical across engines and partitionings.
  *
  * Determinism pin for cost TIES: the backtrack at position j picks the
  * LONGEST piece whose transition achieves dp[j] — re-derived from dp
  * costs (not stored argmins), which is exactly how the SQL oracle's
  * unrolled backtrack CTEs resolve the same tie.
  *
  * Scale shape, same as [[Bpe.encodeCorpus]]: the vocabulary is
  * vocab-bounded → one broadcast map; the Viterbi DP (O(len·maxPieceLen)
  * per word) runs once per DISTINCT word, not per corpus token (Zipf);
  * the pieces join back to the corpus-scale token stream as a plain
  * equi-join that AQE broadcasts when the vocab fits.
  */
object Unigram {

  /** Bootstrap a unigram vocabulary from a BPE segmentation of the corpus:
    * counts = every BPE piece occurrence plus every character occurrence
    * of the token stream (characters guarantee coverage — any word can
    * always segment), costs as in the object doc. Pieces longer than
    * `maxPieceLen` are dropped. Returns (piece, cnt, cost_milli).
    */
  def vocabFromBpe(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], maxPieceLen: Int): DataFrame = {
    val pieceCnt = Bpe.encodeCorpus(docs, idCol, textCol, merges)
      .select(explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("cnt"))
    val charCnt = docs
      .select(explode(TextOps.normTokens(col(textCol))).as("term"))
      .select(explode(expr(
        "transform(sequence(1, char_length(term)), i -> substring(term, i, 1))"))
        .as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("cnt"))
    val vc = pieceCnt.unionAll(charCnt)
      .where(length(col("piece")) <= maxPieceLen)
      .groupBy("piece").agg(sum("cnt").as("cnt"))
    val tot = vc.agg(sum("cnt").as("tot"))
    def flog2(c: Column): Column = (length(bin(c)) - 1).cast("long")
    vc.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        ((flog2(col("tot")) - flog2(col("cnt"))) * 1000L + 500L)
          .as("cost_milli"))
  }

  /** The per-word DP + backtrack (executor-side, broadcast vocab). An
    * unknown SINGLE character costs `unk` (coverage fallback — with a
    * corpus-derived vocab it only fires on out-of-corpus words; OpsSpec
    * exercises it with a planted fixture). Returns (pieces, total cost).
    */
  private[graft] def viterbi(term: String, vocab: Map[String, Long],
      maxPieceLen: Int, unk: Long): (Seq[String], Long) = {
    val n = term.length
    if (n == 0) return (Nil, 0L)
    def costOf(j0: Int, j: Int): Option[Long] = {
      val p = term.substring(j0, j)
      vocab.get(p).orElse(if (j - j0 == 1) Some(unk) else None)
    }
    val dp = Array.fill(n + 1)(Long.MaxValue / 4)
    dp(0) = 0L
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= math.min(j, maxPieceLen)) {
        costOf(j - l, j).foreach { c =>
          if (dp(j - l) + c < dp(j)) dp(j) = dp(j - l) + c
        }
        l += 1
      }
      j += 1
    }
    var acc: List[String] = Nil
    var pos = n
    while (pos > 0) {
      var chosen = -1
      var l = math.min(pos, maxPieceLen)
      while (l >= 1 && chosen < 0) {
        if (costOf(pos - l, pos).exists(c => dp(pos - l) + c == dp(pos)))
          chosen = l
        l -= 1
      }
      acc = term.substring(pos - chosen, pos) :: acc
      pos -= chosen
    }
    (acc, dp(n))
  }

  /** Segment every token of the corpus under `vocab` ((piece, cost_milli)
    * — e.g. [[vocabFromBpe]]). Returns
    * (doc_id, pos, term, pieces, cost_milli); empty tokens yield empty
    * piece arrays at cost 0.
    */
  def segmentCorpus(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int, unkCostMilli: Long = 20000L,
      maxVocab: Int = 2000000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(maxPieceLen >= 1, "maxPieceLen must be positive")
    // vocab-bounded driver materialization (the KMeans-centroid
    // discipline): guarded, never corpus-scale
    val entries = vocab
      .select(col("piece"), col("cost_milli").cast("long"))
      .limit(maxVocab + 1).as[(String, Long)].collect()
    require(entries.length <= maxVocab,
      s"vocab exceeds maxVocab=$maxVocab — truncate or raise the bound")
    val bc = spark.sparkContext.broadcast(entries.toMap)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(TextOps.normTokens(col(textCol))).as(Seq("pos", "term")))
    val segs = toks.select("term").distinct().as[String]
      .mapPartitions { it =>
        val v = bc.value
        it.map { w =>
          val (pieces, c) = viterbi(w, v, maxPieceLen, unkCostMilli)
          (w, pieces, c)
        }
      }
      .toDF("term", "pieces", "cost_milli")
    toks.join(segs, Seq("term"))
      .select(col("doc_id"), col("pos"), col("term"), col("pieces"),
        col("cost_milli"))
  }
}
