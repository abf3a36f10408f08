package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training, split along its natural scale boundary.
  *
  * The corpus-scale part — reducing 100 TB of text to a WORD-FREQUENCY
  * table and counting adjacent symbol pairs — is distributed and
  * vocabulary-bounded after the first aggregate (every later step touches
  * distinct words, not corpus tokens; this is how real BPE trainers work:
  * the corpus is read once, the merge loop never sees it again). The
  * merge loop itself is inherently sequential (merge i+1 depends on the
  * table AFTER merge i) over the vocab table — it runs on the collected
  * word table, the same bounded-driver-state argument as the k-means
  * centroid collect (k·dims there, distinct-words × avg-len here; a
  * 100 TB web corpus has millions of distinct words, comfortably
  * driver-sized, vs trillions of tokens that are not).
  */
object Bpe {

  /** Distinct-word frequencies over the normalized tokens — ONE corpus
    * pass, map-side combined; everything downstream is vocab-bounded.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.normTokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("f"))

  /** Adjacent character-pair counts weighted by word frequency — the
    * argmax candidates of the FIRST merge round (and the gate's
    * oracle-checkable surface). Runs over the word table: corpus size
    * only enters through the counts.
    */
  def pairStats(docs: DataFrame, textCol: String): DataFrame =
    wordFreq(docs, textCol)
      .where(length(col("term")) >= 2)
      .select(col("f"), explode(expr(
        "transform(sequence(1, length(term) - 1), i -> substring(term, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("f")).as("n"))

  /** Greedy BPE merge training over a (collected, vocab-bounded)
    * word-frequency table: `nMerges` rounds of "merge the most frequent
    * adjacent symbol pair" (ties → lexicographically smallest pair, so
    * training is deterministic). Returns the merge list in order — the
    * tokenizer model.
    */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] =
    trainFrom(
      wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) },
      nMerges)

  private def trainFrom(init: Seq[(Vector[String], Long)],
      nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0, "nMerges must be non-negative")
    var words: Seq[(Vector[String], Long)] = init
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (mergeOnce(syms, best), f) }
        round += 1
      }
    }
    merges.result()
  }

  private def mergeOnce(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Apply a trained merge list to one word — the (driver-side) encoder,
    * for tests and as the single source of truth [[encodeCorpus]]
    * broadcasts to executors.
    */
  def tokenize(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString).toVector)(mergeOnce)

  /** Distributed corpus encode — the step a tokenizer exists for: apply a
    * trained merge table to EVERY document, emitting the piece sequence
    * per token. Returns (doc_id, pos, term, pieces: array<string>).
    *
    * Scale shape: the merge table ships as ONE broadcast; the imperative
    * merge loop (inexpressible in Column algebra — each merge rewrites the
    * symbol sequence the next one scans) runs once per DISTINCT word, not
    * once per corpus token: Zipf's law makes the distinct-word table
    * millions of rows where the token stream is trillions, so the
    * `mapPartitions` encoder touches the vocab-bounded side only and the
    * corpus-scale side stays pure Column algebra (explode + join). The
    * pieces-to-token join is a plain equi-join on `term` that AQE turns
    * into a broadcast join whenever the encoded vocab fits — at web-corpus
    * vocab sizes pre-bucket both sides by term instead.
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toVector)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(TextOps.normTokens(col(textCol))).as(Seq("pos", "term")))
    val vocab = toks.select("term").distinct().as[String]
      .mapPartitions { it =>
        val m = bc.value
        it.map(w => (w, tokenize(w, m)))
      }
      .toDF("term", "pieces")
    toks.join(vocab, Seq("term"))
      .select(col("doc_id"), col("pos"), col("term"), col("pieces"))
  }

  // ------------------------------------------------------------------
  // Byte-level BPE (the GPT-2 / tiktoken family): regex pre-tokenization
  // over the RAW text (case and whitespace preserved — the pretoken
  // carries its leading space), then merges over BYTE symbols rendered
  // through the GPT-2 byte↔unicode bijection. Token counts from THIS
  // path are what the mixture/packing/budget operators should consume:
  // word-BPE counts systematically misstate the quantity they optimize.
  // ------------------------------------------------------------------

  /** GPT-2-style pre-tokenization pattern, restricted to the Java∩RE2
    * portable subset (both engines must split identically): the
    * original's `\s+(?!\S)` lookahead is not RE2-expressible, so a run
    * of whitespace splits as ONE `\s+` pretoken instead of donating its
    * last space to the following word — a definitional simplification
    * both engines state, not a divergence. Alternation order matters
    * (leftmost-first in Java AND RE2): contractions, then
    * space-prefixed letter/digit/punctuation runs, then whitespace; the
    * branches jointly cover every character, so pretokens concatenate
    * back to the original text byte-exactly.
    */
  val PreTokenRe: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Pre-token array of a raw text column (one in-row regex pass). */
  def preTokens(text: Column): Column =
    regexp_extract_all(text, lit(PreTokenRe), lit(0))

  /** GPT-2 byte→unicode bijection: printable bytes (`!`..`~`, `¡`..`¬`,
    * `®`..`ÿ`) map to themselves, the other 68 map to 256+k in byte
    * order — every byte becomes one printable char, so merges operate on
    * plain strings and any byte sequence (incl. split UTF-8) is
    * representable. Public algorithm (GPT-2's bytes_to_unicode).
    */
  private[ops] val ByteToChar: Array[Char] = {
    val printable = (('!'.toInt to '~'.toInt) ++
      (0xA1 to 0xAC) ++ (0xAE to 0xFF)).toSet
    val arr = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (printable(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }
  private[ops] lazy val CharToByte: Map[Char, Byte] =
    ByteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** A word as its byte symbols (mapped chars), the merge-loop alphabet. */
  def toByteSyms(word: String): Vector[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => ByteToChar(b & 0xFF).toString).toVector

  /** Inverse of the byte map: mapped piece/word back to real bytes/text. */
  def unmapBytes(mapped: String): String =
    new String(mapped.map(CharToByte).toArray,
      java.nio.charset.StandardCharsets.UTF_8)

  /** Pre-token frequencies over the RAW text — the byte-level twin of
    * [[wordFreq]]: one corpus pass, map-side combined, vocab-bounded
    * downstream. Pretokens keep their leading space and case, so " the",
    * "the" and " The" are distinct table rows, exactly like GPT-2.
    */
  def byteWordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(preTokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("f"))

  /** Greedy merge training over byte symbols — [[train]]'s loop with the
    * 256-char byte alphabet as the base vocabulary (every pretoken starts
    * as its mapped byte sequence, so merges can cross any byte boundary
    * the data supports, never a word boundary).
    */
  def trainBytes(wordFreq: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String)] =
    trainFrom(wordFreq.map { case (w, f) => (toByteSyms(w), f) }, nMerges)

  /** Byte-level encoder for one pretoken (driver-side source of truth,
    * broadcast by [[encodeCorpusBytes]]). Pieces are in mapped-char
    * space; [[unmapBytes]] of their concatenation is the pretoken.
    */
  def tokenizeBytes(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(toByteSyms(word))(mergeOnce)

  /** Distributed byte-level corpus encode — [[encodeCorpus]]'s exact
    * scale shape (corpus-side pure Column algebra, the imperative merge
    * loop once per DISTINCT pretoken on the vocab-bounded side), with
    * the regex pre-tokenizer and byte mapping in place of whitespace
    * normalization. Returns (doc_id, pos, term, pieces: array<string>)
    * with `term` the raw pretoken and `pieces` mapped-char subwords.
    */
  def encodeCorpusBytes(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toVector)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(preTokens(col(textCol))).as(Seq("pos", "term")))
    val vocab = toks.select("term").distinct().as[String]
      .mapPartitions { it =>
        val m = bc.value
        it.map(w => (w, tokenizeBytes(w, m)))
      }
      .toDF("term", "pieces")
    toks.join(vocab, Seq("term"))
      .select(col("doc_id"), col("pos"), col("term"), col("pieces"))
  }

  /** Inverse of [[encodeCorpusBytes]], FROM THE PIECES ONLY (the carried
    * `term` is never consulted): per distinct piece-concatenation, unmap
    * chars back to bytes (the same vocab-bounded mapPartitions seam as
    * the encoder), then stitch tokens in position order with NO
    * separator — pretokens carry their own whitespace, so the decode
    * equals the ORIGINAL text byte-exactly, case and spacing included.
    * Returns (doc_id, n_tokens, decoded).
    */
  def decodeCorpusBytes(encoded: DataFrame): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val joined = encoded.select(col("doc_id"), col("pos"),
      concat_ws("", col("pieces")).as("mapped"))
    val uniq = joined.select("mapped").distinct().as[String]
      .mapPartitions(_.map(m => (m, unmapBytes(m))))
      .toDF("mapped", "tok")
    joined.join(uniq, Seq("mapped"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            e => e.getField("tok")),
          "").as("decoded"))
  }

  /** Inverse of [[encodeCorpus]]: concatenate each token's pieces and
    * stitch the tokens back in position order — one grouped aggregation,
    * corpus-linear. BPE merges only ever glue adjacent symbols of the
    * same word, so `concat(pieces) == term` is an invariant of a correct
    * encoder and `decode(encode(corpus)) == normalized corpus` byte-exact;
    * the round-trip gate states that identity against the ORIGINAL text
    * (the oracle never sees the pieces), so a dropped token, a corrupted
    * merge, or a lossy piece join all break the hash. Returns
    * (doc_id, n_tokens, decoded).
    */
  def decodeCorpus(encoded: DataFrame): DataFrame =
    encoded
      .select(col("doc_id"), col("pos"),
        concat_ws("", col("pieces")).as("tok"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            e => e.getField("tok")),
          " ").as("decoded"))
}
