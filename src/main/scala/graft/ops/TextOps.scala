package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: tokenization,
  * quality scoring, language ID, fingerprinting, shingling. All pure Column
  * algebra (codegen-friendly, no UDFs) — every function here runs inside
  * whole-stage codegen and scales embarrassingly (no shuffle, no state).
  */
object TextOps {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-style pre-tokenization count: letter runs, digit runs, and single
    * non-alphanumeric marks — the unit a byte-pair tokenizer would merge
    * from (the regex is engine-portable: no lookarounds).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Canonical form for exact-dup detection: collapse whitespace, lowercase. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** 128-bit content fingerprint of the normalized text (rolling-hash
    * equivalent for exact dedup; stable across partitions/engines).
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Tokens of the normalized (lowercased) text — the dedup token stream. */
  def normTokens(text: Column): Column = split(normalize(text), "\\s+")

  /** Distinct word k-shingles ("a b c" 3-grams) over NORMALIZED tokens —
    * the unit set for Jaccard similarity and MinHash (case/whitespace
    * variants of a document must shingle identically).
    */
  def wordShingles(text: Column, k: Int): Column =
    // r16: one compiled pass ([[graft.functions.WordShinglesExpr]]) —
    // bit-identical to the former transform/slice/array_distinct HOF
    // chain, whose interpreted per-token lambdas were both the dominant
    // per-row cost of every shingle pipeline and placement-sensitive
    // (an AQE-coalesced exchange could leave the whole chain on one
    // task; see the kernel scaladoc)
    graft.functions.GraftFunctions.word_shingles(normalize(text), k)

  /** Adjacent word bigrams over normalized tokens ("a b c" → ["a b",
    * "b c"]) — the corpus n-gram statistics unit (vocabulary induction,
    * collocation mining, contamination fingerprints). Branch-free like
    * [[wordShingles]]: zip the token array against its shift; a
    * one-token doc zips two empty slices into the empty set. Pure
    * Column algebra — no shuffle until the caller aggregates.
    */
  def wordBigrams(text: Column): Column = {
    val toks = normTokens(text)
    zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Sequential regex scrub — the PII-redaction seam (emails, phone
    * numbers, IPs, entity names → placeholder tokens). Each rule is
    * (pattern, replacement), applied in order, all occurrences (Spark's
    * `regexp_replace` is global). Patterns must stay in the portable
    * subset shared by Java regex and RE2 (no lookarounds) so external
    * engines reproduce the scrub byte-for-byte. Pure per-row Column
    * algebra — codegen'd, shuffle-free, embarrassingly parallel.
    */
  def scrub(text: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Occurrence count of one scrub pattern (audit column for redaction:
    * how many spans were masked per document).
    */
  def scrubHits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  private val punctPattern = "[^.!?,;:]"

  /** Punctuation character ratio (punct chars / total chars). */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, punctPattern, "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Fraction of tokens that are common-English stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
      .cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Composite quality heuristic in [0, ~2]: long-enough docs with normal
    * word lengths and some stopword mass score high; degenerate docs
    * (no stopwords, extreme word lengths) score low.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val avgWordLen = length(trim(text)).cast("double") / greatest(nTok, lit(1.0))
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val wordLenScore =
      when(avgWordLen >= 3 && avgWordLen <= 10, lit(1.0)).otherwise(lit(0.25))
    val stopScore = least(stopwordRatio(text, EnStopwords) * lit(5.0), lit(1.0))
    round((lenScore + wordLenScore + stopScore) / lit(3.0), 6)
  }

  /** Encoding-noise profile — the mojibake/transcoding-damage detector
    * every crawl pipeline runs before trusting a document's bytes (a doc
    * that went UTF-8 → Latin-1 → UTF-8 is unrecoverable junk for
    * tokenizers and dedup alike). Exact integer counts per doc:
    *   - `n_chars`   codepoints
    *   - `n_nonascii` codepoints above U+007F (volume dial, not a defect)
    *   - `n_repl`    U+FFFD replacement chars (a decoder already gave up)
    *   - `n_ctrl`    control chars other than tab/newline/CR (binary
    *                 spill into text)
    *   - `n_moji`    classic double-encode signatures: Â/Ã followed by a
    *                 codepoint in the continuation range U+0080–U+00BF
    *                 (UTF-8 lead+continuation bytes re-decoded as
    *                 Latin-1), plus the Windows-1252 smart-quote shape
    *                 â+U+20AC (â€™ â€œ …)
    *   - `noise_ppm` (n_repl + n_ctrl + n_moji) per million chars
    * Patterns use `\x{...}` codepoint classes — the syntax shared by
    * Java regex and RE2, so external engines replay the counts exactly.
    * Pure Column algebra: zero shuffle, in-row codegen, linear in bytes.
    */
  def encodingProfile(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val text = col(textCol)
    def hits(pat: String) =
      size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
    docs.select(col(idCol).as("doc_id"),
        length(text).cast("long").as("n_chars"),
        hits("[^\\x{0000}-\\x{007F}]").as("n_nonascii"),
        hits("\\x{FFFD}").as("n_repl"),
        hits("[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}" +
          "\\x{000E}-\\x{001F}\\x{007F}]").as("n_ctrl"),
        hits("[\\x{00C2}\\x{00C3}][\\x{0080}-\\x{00BF}]" +
          "|\\x{00E2}\\x{20AC}").as("n_moji"))
      .select(col("doc_id"), col("n_chars"), col("n_nonascii"),
        col("n_repl"), col("n_ctrl"), col("n_moji"),
        expr("(n_repl + n_ctrl + n_moji) * 1000000" +
          " div greatest(n_chars, 1)").as("noise_ppm"))
  }

  /** Readability profile (Flesch reading-ease, exact integer milli-units
    * — the classic prose-complexity dial, used as a quality band filter:
    * both unreadably dense text AND degenerate telegraphic fragments fall
    * outside the mid band). Counts are engine-portable primitives:
    * sentences = runs of terminal punctuation `[.!?]+` (floored at 1 so a
    * punctuation-free doc reads as one sentence rather than dividing by
    * zero), syllables = vowel-group runs `[aeiouy]+` of the lowercased
    * text (the standard codeless proxy), words = whitespace tokens. The
    * score is the Flesch formula with every division an explicit integer
    * `div` in milli-units —
    *   flesch_milli = 206835 − 1015·(words div-scaled per sentence)
    *                         − 84600·(syllables div-scaled per word)
    * — so external engines replay it bit-for-bit (no float drift), at
    * the cost of the floor in each term (documented, deterministic).
    * Zero shuffle; pure in-row Column algebra.
    */
  def readability(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val text = col(textCol)
    val nSents = greatest(
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")
    val nWords = when(trim(text) === "", lit(0L))
      .otherwise(size(tokens(text)).cast("long"))
    val nSyll = size(regexp_extract_all(lower(text), lit("[aeiouy]+"),
      lit(0))).cast("long")
    docs.select(col(idCol).as("doc_id"), nSents.as("n_sents"),
        nWords.as("n_words"), nSyll.as("n_syll"))
      .select(col("doc_id"), col("n_sents"), col("n_words"), col("n_syll"),
        expr("n_words * 1000 div n_sents").as("wps_milli"),
        expr("CASE WHEN n_words > 0 THEN n_syll * 1000 div n_words " +
          "ELSE 0 END").as("spw_milli"),
        expr("206835 - (1015 * n_words div n_sents)" +
          " - (CASE WHEN n_words > 0 THEN 84600 * n_syll div n_words" +
          " ELSE 0 END)").as("flesch_milli"))
  }

  /** Stopword-marker hit counts for a language. */
  def langHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*)))

  /** Marker lexicons for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni"))

  /** Predicted language = first lexicon (in [[LangMarkers]] order) achieving
    * the maximum hit count; "und" (undetermined) when no marker hits at all.
    * Deterministic CASE chain → trivially mirrored in the SQL oracle.
    */
  def langId(text: Column): Column = {
    val hits = LangMarkers.map { case (lang, m) => lang -> langHits(text, m) }
    val best = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und"): Column) { case ((lang, h), els) =>
      when(best > 0 && h === best, lit(lang)).otherwise(els)
    }
  }

  /** Deterministic MLM corruption: replace ~pct% of a doc's normalized
    * tokens with the mask sentinel, the masked positions decided by
    * md5(doc_id, position) — so the corruption is identical on every
    * run, partition layout, and engine (seeded-Random masking is not),
    * and the label side is recoverable by re-running the same predicate
    * over the original tokens. Pure Column algebra (one transform over
    * the token array), zero shuffle.
    */
  def maskedTokens(id: Column, text: Column, pct: Int): Column = {
    require(pct >= 0 && pct <= 100, "pct is a percentage")
    transform(normTokens(text), (t, i) =>
      when(conv(substring(md5(concat_ws("|", id, i)), 1, 4), 16, 10)
        .cast("int") % 100 < pct, lit("<mask>")).otherwise(t))
  }

  /** Tokenizer-coverage report: per group, the out-of-vocabulary token
    * rate against a corpus-derived top-`vocabSize` vocabulary — the
    * check run before committing a corpus to a fixed tokenizer/vocab
    * (high OOV in one slice means that slice will fragment into bytes).
    * Vocabulary selection is deterministic (count desc, term asc) and the
    * rate is integer micro-units (floor div) — engine-exact.
    *
    * Scale shape: one token explode feeding BOTH the vocab top-k (k-row
    * result, broadcast back) and the grouped coverage agg — linear in
    * corpus tokens, the only wide ops keyed on term and group. The
    * left-join against a k-row broadcast never shuffles the token stream.
    */
  def oovRate(docs: DataFrame, groupCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be positive")
    val toks = docs.select(col(groupCol).as("grp"),
      explode(normTokens(col(textCol))).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc).limit(vocabSize)
      .select(col("term"), lit(1).as("in_v"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("grp"), col("n_tokens"), col("n_oov"),
        expr("(n_oov * 1000000L) div n_tokens").as("oov_ppm"))
  }

  /** Character n-gram repetition profile — the OTHER half of the Gopher
    * repetition battery (Rae et al. 2021 Table A1: "fraction of characters
    * in the most common n-gram"; [[graft.ops.Curation.repetitionProfile]]
    * covers the word-level half): per document, the total char n-gram
    * count, the top n-gram's count, and the top fraction in exact integer
    * ppm (floor div — engine-portable, no float drift). High top_ppm =
    * keyboard-mash/template junk that word-level signals miss ("ababab…",
    * repeated punctuation runs, single-char floods). Docs shorter than
    * `n` chars have no n-gram and drop out (callers outer-join for the
    * distinction — the typicalityProfile convention).
    *
    * Scale shape: the n-gram extraction is an in-row `transform` over a
    * position sequence (linear in chars, no O(L²) in-row counting); the
    * counts are two partially-aggregated shuffles keyed (doc, gram) then
    * doc — the repetitionProfile/TF-IDF shape, linear in corpus chars.
    */
  def charNgramProfile(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2 && n <= 16, "n in [2, 16]")
    val len = length(col(textCol))
    val grams = when(len >= n,
      transform(sequence(lit(1), len - (n - 1)),
        i => col(textCol).substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol).as("doc_id"), explode(grams).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_grams"),
        max(col("c")).cast("long").as("top_cnt"))
      .select(col("doc_id"), col("n_grams"), col("top_cnt"),
        expr("(top_cnt * 1000000L) div n_grams").as("top_ppm"))
  }

  /** Deflate compression ratio — the entropy-proxy quality signal (a
    * document that compresses far below typical prose is repetition junk;
    * one that refuses to compress is noise/base64): compressed size over
    * original UTF-8 bytes in integer ppm, via the JDK's zlib Deflater at
    * a FIXED level (deterministic for fixed input + level + strategy).
    * Runs at the codec seam — compression is not a Catalyst expression,
    * so this is the one `mapPartitions` hop (the [[graft.ops.Multimodal]]
    * decode discipline), with one Deflater reused per partition. Zero
    * shuffle, linear in corpus bytes; spec-covered (no SQL oracle — zlib
    * is not replayable in DuckDB; parity is pinned against a driver-side
    * replica instead).
    */
  def compressionStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val buf = new Array[Byte](16384)
        it.map { case (id, text) =>
          val bytes = Option(text).getOrElse("").getBytes("UTF-8")
          val d = new java.util.zip.Deflater(6)
          d.setInput(bytes); d.finish()
          var comp = 0L
          while (!d.finished()) comp += d.deflate(buf)
          d.end()
          val ratio =
            if (bytes.length > 0) comp * 1000000L / bytes.length
            else 1000000L
          (id, bytes.length.toLong, comp, ratio)
        }
      }
      .toDF(idCol, "orig_bytes", "comp_bytes", "ratio_ppm")
  }

  /** LEARNED quality classifier, trainer half (the CCNet/fastText role:
    * a classifier fit on labeled clean-vs-junk docs, replacing the fixed
    * [[qualityScore]] heuristic with corpus-derived evidence). Count-space
    * naive Bayes with add-one smoothing, kept ENTIRELY in integers so
    * training is bit-reproducible on any engine/partitioning: each token's
    * score is its smoothed posterior P(clean | token) in ppm,
    *   score_ppm = (n_clean + 1) · 10⁶ div (n_clean + n_junk + 2)
    * — the monotone integer stand-in for the float log-ratio (same ranking,
    * no cross-engine float drift). `labelCol` must be 1 (clean) / 0 (junk).
    *
    * The vocabulary is capped at `maxVocab` by (total count desc, token
    * asc) — a deterministic total order — so the model stays broadcastable
    * at any corpus size (the [[oovRate]] discipline). One token explode +
    * one groupBy(token): linear, no doc pairs.
    */
  def nbTrain(docs: DataFrame, textCol: String, labelCol: String,
      maxVocab: Int = 1 << 20): DataFrame = {
    require(maxVocab >= 1, "maxVocab must be positive")
    docs
      .select(explode(tokens(col(textCol))).as("tok"),
        col(labelCol).cast("long").as("lab"))
      .groupBy("tok")
      .agg(sum(when(col("lab") === 1L, 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("lab") === 1L, 0L).otherwise(1L)).as("n_junk"))
      .orderBy((col("n_clean") + col("n_junk")).desc, col("tok").asc)
      .limit(maxVocab)
      .select(col("tok"), col("n_clean"), col("n_junk"),
        expr("((n_clean + 1) * 1000000L) div (n_clean + n_junk + 2)")
          .as("score_ppm"))
  }

  /** Scorer half: per-doc mean token posterior (integer div), unseen
    * tokens neutral at 500000 ppm. The model joins as a BROADCAST integer
    * score table — the token stream never shuffles, the score agg is the
    * only wide op, keyed on the doc id. Output: (id, n_tokens, score_ppm);
    * classify clean at score_ppm > 500000.
    *
    * Zero-token docs are KEPT (`explode_outer`, not `explode`): a doc the
    * tokenizer empties out scores neutral (n_tokens=0, 500000 ppm) rather
    * than silently vanishing from the output — same single pass, no extra
    * join. The null placeholder row never matches the model (null join
    * key) and contributes nothing to either aggregate.
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode_outer(tokens(col(textCol))).as("tok"))
      .join(broadcast(model.select(col("tok"), col("score_ppm"))),
        Seq("tok"), "left")
      .groupBy("id")
      .agg(count(col("tok")).as("n_tokens"),
        sum(when(col("tok").isNull, lit(0L))
          .otherwise(coalesce(col("score_ppm"), lit(500000L)))).as("s"))
      .select(col("id"), col("n_tokens"),
        when(col("n_tokens") === 0L, lit(500000L))
          .otherwise(expr("s div n_tokens")).as("score_ppm"))

  /** LEARNED language ID, trainer half — [[nbTrain]]'s count-space naive
    * Bayes generalized to MULTI-CLASS posteriors (the fastText-class
    * labeler role: a classifier fit on per-language labeled text replaces
    * the [[langId]] stopword heuristic with corpus-derived evidence).
    * Per token and language the model carries the smoothed posterior
    *   post_ppm = (n_{tok,lang} + 1) · 10⁶ div (n_tok + L)
    * (add-one over the L languages seen in training) — all integer, so
    * training is bit-reproducible on any engine/partitioning. Every
    * vocab token carries exactly L rows (absent (tok, lang) counts
    * coalesce to 0), so the scorer's per-language sums share one token
    * join. Vocabulary capped at `maxVocab` by (total count desc, token
    * asc) — deterministic, broadcastable at any corpus size. Returns
    * (tok, lang, n, post_ppm).
    *
    * Scale shape: one token explode + one (tok, lang) hash agg; the
    * vocab × L completion is a broadcast nested-loop of two CAPPED
    * tables (vocab ≤ maxVocab rows, L = distinct labels) — never the
    * corpus.
    */
  def nbTrainMulti(docs: DataFrame, textCol: String, labelCol: String,
      maxVocab: Int = 1 << 20): DataFrame = {
    require(maxVocab >= 1, "maxVocab must be positive")
    val counts = docs
      .select(explode(tokens(col(textCol))).as("tok"),
        col(labelCol).cast("string").as("lang"))
      .groupBy("tok", "lang").agg(count(lit(1)).as("n"))
    val langs = counts.select("lang").distinct()
    val nl = counts.agg(countDistinct("lang").as("l"))
    val vocab = counts.groupBy("tok").agg(sum("n").as("n_tok"))
      .orderBy(col("n_tok").desc, col("tok").asc)
      .limit(maxVocab)
    vocab.crossJoin(broadcast(langs)).crossJoin(broadcast(nl))
      .join(counts, Seq("tok", "lang"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .select(col("tok"), col("lang"), col("n"),
        expr("((n + 1) * 1000000L) div (n_tok + l)").as("post_ppm"))
  }

  /** Scorer half for [[nbTrainMulti]]: per (doc, language) mean token
    * posterior over the doc's IN-VOCAB tokens (integer div; OOV tokens
    * drop from the mean — every language sees the same token set, so the
    * comparison is fair). Docs with zero in-vocab tokens produce no rows
    * (undecidable — route them to the [[langId]] heuristic). The model
    * joins broadcast; the only wide op is the (id, lang) aggregate.
    * Returns (id, lang, n_seen, score_ppm).
    */
  def nbScoreMulti(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .join(broadcast(model.select(col("tok"), col("lang"),
        col("post_ppm"))), Seq("tok"))
      .groupBy("id", "lang")
      .agg(count(lit(1)).as("n_seen"), sum("post_ppm").as("s"))
      .select(col("id"), col("lang"), col("n_seen"),
        expr("s div n_seen").as("score_ppm"))

  /** Argmax language per doc over [[nbScoreMulti]] output, ties broken
    * by language ascending — ONE aggregate, no join-back, no window:
    * max(struct(score, negated-rank lang)) can't order strings inversely,
    * so the lang rides the struct as its per-id candidate list... instead
    * the L-bounded trick: collect the ≤ L (score, lang) pairs per id
    * (L = languages, a constant), sort, take the last-score/first-lang
    * element. Deterministic and engine-replayable. Returns
    * (id, pred_lang, score_ppm).
    */
  def nbPredictLang(scored: DataFrame): DataFrame =
    scored
      .groupBy("id")
      .agg(array_sort(collect_list(
        struct(col("score_ppm"), col("lang")))).as("cand"))
      .select(col("id"),
        expr("""element_at(
          |  filter(cand, c -> c.score_ppm = element_at(cand, -1).score_ppm),
          |  1).lang""".stripMargin).as("pred_lang"),
        expr("element_at(cand, -1).score_ppm").as("score_ppm"))

  /** Stupid Backoff LM scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation" — the web-scale count LM that skips
    * normalization entirely): each token scores by its bigram relative
    * frequency when the reference corpus has seen the bigram, else backs
    * off to α·unigram, else to α²·uniform(1/V), with α = 0.4 = 2/5 kept
    * as an EXACT rational. All arithmetic is integer ppm with `div`
    * truncation in a pinned order (truncate the unigram ppm FIRST, then
    * apply 2x div 5 — the oracle replays the same order), so scores are
    * bit-identical across engines and partitionings where a float
    * log-prob chain never is.
    *
    * Scale shape: the reference counts are vocab-bounded (V and V² rows,
    * Zipf-truncated in practice) → both lookups broadcast; the corpus
    * token stream is built array-at-a-time (no per-doc window for the
    * predecessor — the (pos, w, prev) triple explodes straight off the
    * token array) and shuffles exactly once, for the per-doc aggregate.
    * Output: (doc_id, n_tokens, n_backoff, n_oov, score_ppm = mean token
    * score). Low score_ppm = atypical under the reference LM — the CCNet
    * bucket criterion in count space.
    */
  def backoffLmScore(docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String): DataFrame = {
    def toks(d: DataFrame, id: Column, t: Column): DataFrame =
      d.select(id.cast("long").as("doc_id"), normTokens(t).as("ws"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(ws) - 1), i -> struct(
            |  i AS pos, element_at(ws, i + 1) AS w,
            |  if(i > 0, element_at(ws, i), CAST(null AS STRING)) AS prev))"""
            .stripMargin)).as("e"))
        .select(col("doc_id"), col("e.pos"), col("e.w"), col("e.prev"))
    val refToks = toks(ref, col(idCol), col(refTextCol))
    val c1 = refToks.groupBy("w").agg(count(lit(1)).as("c1"))
    val c2 = refToks.where(col("prev").isNotNull)
      .groupBy("prev", "w").agg(count(lit(1)).as("c2"))
    val tot = c1.agg(sum("c1").as("n_ref"), count(lit(1)).as("v"))
    val scored = toks(docs, col(idCol), col(textCol))
      .join(broadcast(c2), Seq("prev", "w"), "left")
      .join(broadcast(c1), Seq("w"), "left")
      .join(broadcast(c1.select(col("w").as("prev"), col("c1").as("pc"))),
        Seq("prev"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("uni_ppm", expr("c1 * 1000000L div n_ref"))
      .withColumn("score_ppm", expr(
        """CASE
          |  WHEN pos = 0 THEN
          |    coalesce(uni_ppm, 2000000L div (5L * v))
          |  WHEN c2 IS NOT NULL THEN c2 * 1000000L div pc
          |  WHEN uni_ppm IS NOT NULL THEN (2L * uni_ppm) div 5L
          |  ELSE 4000000L div (25L * v)
          |END""".stripMargin))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("pos") > 0 && col("c2").isNull, 1L).otherwise(0L))
          .as("n_backoff"),
        sum(when(col("c1").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum("score_ppm").as("s"))
      .select(col("doc_id"), col("n_tokens"), col("n_backoff"),
        col("n_oov"), expr("s div n_tokens").as("score_ppm"))
  }

  /** Candidate payment-card digit runs: 13–19 digits, optionally
    * separated by single spaces or dashes (the PAN formats that appear in
    * leaked text). Portable regex subset (no lookarounds) — Java regex
    * and RE2 both produce the same leftmost-greedy non-overlapping match
    * list, so external engines replay the candidate set exactly.
    */
  private val cardRunPattern = "[0-9](?:[ -]?[0-9]){12,18}"

  /** Luhn mod-10 checksum over a candidate run (separators stripped):
    * from the RIGHTMOST digit, double every second digit, subtract 9 when
    * the double exceeds 9, sum, valid iff ≡ 0 (mod 10). A pure integer
    * `aggregate()` fold over the digit positions — codegen'd, engine-
    * replayable (no float, no library call).
    */
  private[ops] def luhnValid(run: Column): Column = {
    val ds = regexp_replace(run, "[ -]", "")
    val n = length(ds)
    val s = aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
      val d = ds.substr(n - i + 1, lit(1)).cast("int")
      val dbl = d * 2
      acc + when(i % 2 === 1, d)
        .otherwise(when(dbl > 9, dbl - 9).otherwise(dbl))
    })
    s % 10 === 0
  }

  /** Checksum-validated card-number detection — the high-precision PII
    * pass the regex-only [[scrub]] rules cannot express: a bare 13-19
    * digit run is usually an order id / timestamp / serial, so masking
    * every run destroys data and flagging every run drowns the audit in
    * false positives. Here a run is redacted ONLY when its Luhn mod-10
    * checksum validates (the check every real PAN passes by construction
    * and ~90% of arbitrary digit runs fail).
    *
    * Per doc: `n_runs` candidate digit runs, `n_valid` Luhn-validated,
    * `clean` = text with each validated run replaced by `<CARD>` (literal
    * `replace` fold over the validated list — deterministic, all
    * occurrences). Pure Column algebra: extract + integer fold + literal
    * replace, zero shuffle, linear in corpus bytes.
    */
  def luhnScan(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val text = col(textCol)
    val runs = regexp_extract_all(text, lit(cardRunPattern), lit(0))
    val valid = filter(runs, luhnValid(_))
    docs.select(col(idCol).as("doc_id"), text.as("__t"),
        runs.as("__runs"), valid.as("__valid"))
      .select(col("doc_id"),
        size(col("__runs")).as("n_runs"),
        size(col("__valid")).as("n_valid"),
        aggregate(col("__valid"), col("__t"),
          (acc, r) => replace(acc, r, lit("<CARD>"))).as("clean"))
  }

  /** IBAN token shape: country code, two check digits, 10–30
    * alphanumerics — matched per WHOLE TOKEN (`rlike` anchors), which
    * sidesteps the word-boundary lookarounds the portable regex subset
    * forbids.
    */
  private val ibanShape = "^[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}$"

  /** ISO 13616 mod-97 check over an IBAN-shaped token: move the first 4
    * chars to the end, map digits to themselves and A–Z to 10–35, and
    * fold the resulting digit stream mod 97 incrementally (acc·10+d or
    * acc·100+v, each reduced mod 97 — the textbook big-number-free
    * form); valid iff the residue is 1. Pure integer `aggregate()` fold,
    * `ascii()` on both engines.
    */
  private[ops] def ibanValid(tok: Column): Column = {
    val re = concat(tok.substr(lit(5), length(tok) - 4),
      tok.substr(lit(1), lit(4)))
    val s = aggregate(sequence(lit(1), length(tok)), lit(0), (acc, i) => {
      val a = ascii(re.substr(i, lit(1)))
      when(a <= 57, (acc * 10 + (a - 48)) % 97)
        .otherwise((acc * 100 + (a - 55)) % 97)
    })
    s === 1
  }

  /** Checksum-validated IBAN detection — [[luhnScan]]'s banking sibling
    * (ISO 13616 mod-97; ~99% of arbitrary IBAN-shaped strings fail it):
    * whole-token candidates, validated tokens redacted to `<IBAN>` by a
    * literal-replace fold, counts alongside. Zero shuffle, linear.
    */
  def ibanScan(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val text = col(textCol)
    val cands = filter(tokens(text), t => t.rlike(ibanShape))
    val valid = filter(cands, ibanValid(_))
    docs.select(col(idCol).as("doc_id"), text.as("__t"),
        cands.as("__c"), valid.as("__v"))
      .select(col("doc_id"),
        size(col("__c")).as("n_cands"),
        size(col("__v")).as("n_valid"),
        aggregate(col("__v"), col("__t"),
          (acc, r) => replace(acc, r, lit("<IBAN>"))).as("clean"))
  }

  /** Unicode-script families for [[scriptProfile]]: (name, codepoint
    * class) in PRIORITY order (dominance ties break toward the earlier
    * entry, like [[LangMarkers]]). Classes use the `\x{...}` syntax Java
    * regex and RE2 share; Latin includes the supplement/extended blocks
    * so accented European text counts as Latin, CJK spans the unified
    * ideographs plus kana.
    */
  val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "hebrew" -> "[\\x{0590}-\\x{05FF}]",
    "hangul" -> "[\\x{AC00}-\\x{D7AF}]",
    "devanagari" -> "[\\x{0900}-\\x{097F}]")

  /** Unicode-script distribution per document — the routing step BEFORE
    * language ID in a multilingual pipeline ([[langId]]'s stopword
    * lexicons only make sense once the script is known), and the
    * mixed-script detector (a Latin page with a 30% Cyrillic block is
    * spam/injection shaped; one transliterated name is not). Exact
    * integer counts per script family, dominant script as a
    * deterministic first-max CASE chain over [[ScriptClasses]] order
    * ("none" when no letter matches any family), and `n_major` = number
    * of families holding ≥ 20% of the script-letter mass
    * (cross-multiplied integer compare, no division) — `mixed` when ≥ 2.
    * Pure Column algebra: zero shuffle, codegen'd, linear in bytes.
    */
  def scriptProfile(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val text = col(textCol)
    def hits(pat: String) =
      size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
    val counted = docs.select(col(idCol).as("doc_id") +:
      ScriptClasses.map { case (nm, pat) => hits(pat).as(s"n_$nm") }: _*)
    val names = ScriptClasses.map(_._1)
    val total = names.map(nm => col(s"n_$nm")).reduce(_ + _)
    val best = greatest(names.map(nm => col(s"n_$nm")): _*)
    val dominant = names.foldRight(lit("none"): Column) { case (nm, els) =>
      when(best > 0 && col(s"n_$nm") === best, lit(nm)).otherwise(els)
    }
    val nMajor = names.map(nm =>
      when(col(s"n_$nm") * 5 >= total && col(s"n_$nm") > 0, lit(1L))
        .otherwise(lit(0L))).reduce(_ + _)
    counted.select(col("doc_id") +:
      names.map(nm => col(s"n_$nm")) :+
      total.as("n_letters") :+
      dominant.as("dominant") :+
      nMajor.as("n_major") :+
      (nMajor >= 2).as("mixed"): _*)
  }

  /** Pairwise unigram-distribution divergence between corpus groups
    * (sources, languages, snapshots) — the corpus-mix audit run before
    * setting mixture weights: two sources whose token distributions have
    * drifted apart (different registers, a scraper gone wrong, one source
    * flooded with boilerplate) need different treatment, and the mixture
    * dashboards want ONE number per pair. Distance is L1 between the
    * groups' token-share vectors over a deterministic top-`vocabSize`
    * corpus vocabulary (count desc, term asc — the [[oovRate]] vocab
    * rule), shares in floor-div integer ppm so the whole computation is
    * engine-exact; `l1_ppm` ∈ [0, 2e6] (0 identical, 2e6 disjoint).
    * `n_both` = vocab terms present in both groups rides along.
    *
    * Scale shape: one (group, term) count shuffle — linear in corpus
    * tokens; the vocabulary is a k-bounded TakeOrdered; groups are
    * catalog-bounded BY CONTRACT (sources/langs, not doc ids), so the
    * share grid (groups × vocab) and the pair join are metadata-sized
    * and broadcast. Nothing pairwise ever touches corpus-sized data.
    */
  def sourceDivergence(docs: DataFrame, groupCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1 && vocabSize <= 65536,
      "vocabSize in [1, 65536]")
    val toks = docs.select(col(groupCol).as("grp"),
      explode(normTokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("grp", "tok").agg(count(lit(1)).as("c"))
    val vocab = counts.groupBy("tok").agg(sum(col("c")).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
      .select("tok")
    val inVocab = counts.join(broadcast(vocab), Seq("tok"))
    val totals = inVocab.groupBy("grp").agg(sum(col("c")).as("n_g"))
    val shares = inVocab.join(broadcast(totals), Seq("grp"))
      .select(col("grp"), col("tok"),
        expr("c * 1000000 div n_g").as("ppm"))
    // dense grid over (group, vocab term) so absent terms contribute
    // their full share to the other side's L1 mass
    val grid = totals.select("grp").crossJoin(broadcast(vocab))
      .join(shares, Seq("grp", "tok"), "left")
      .select(col("grp"), col("tok"),
        coalesce(col("ppm"), lit(0L)).as("ppm"))
    grid.as("a").join(broadcast(grid.as("b")),
        col("a.tok") === col("b.tok") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(sum(abs(col("a.ppm") - col("b.ppm"))).as("l1_ppm"),
        sum(when(col("a.ppm") > 0 && col("b.ppm") > 0, lit(1L))
          .otherwise(lit(0L))).as("n_both"))
  }

  /** Consecutive n-gram repetition profile — the degenerate-loop detector
    * for model-generated and scraper-glitch text ("the cat sat the cat
    * sat the cat sat …"), the CONSECUTIVE complement of
    * [[charNgramProfile]]/Gopher top-gram mass (which flag a frequent
    * gram anywhere; a chorus legitimately repeats across a document —
    * only immediate repetition is the junk signature). For n ∈ {1,2,3}:
    * `rep_n` = positions i where tokens[i..i+n) == tokens[i+n..i+2n)
    * (array-equality compare of two slices). Branch-free like
    * [[wordShingles]]: flags computed over ALL positions, then sliced to
    * the valid window — no CASE around the higher-order expression.
    * `max_rep_ppm` = max_n (rep_n · n · 1e6 div n_tokens) — the fraction
    * of the token stream inside an immediately-repeated gram, floor-div
    * exact; `loop_flag` at ≥ 200000 ppm. Zero shuffle, in-row codegen.
    */
  def repeatProfile(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // tokenize behind a projection boundary: as a plain val, the
    // normTokens regexp chain was INLINED into every reference — seven
    // sites across sz + three repN variants, and inside each transform
    // lambda a constant subtree re-evaluates PER ELEMENT, so the split
    // ran O(|tokens|) times per row. As an attribute it computes once
    // (CollapseProject keeps the boundary for non-cheap multi-use exprs).
    val tokenized = docs.select(col(idCol).as("doc_id"),
      normTokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val sz = size(toks)
    def repN(n: Int): Column = {
      val flags = transform(sequence(lit(1), sz),
        i => slice(toks, i, lit(n)) === slice(toks, i + n, lit(n)))
      size(filter(slice(flags, lit(1), greatest(sz - (2 * n - 1), lit(0))),
        b => b)).cast("long")
    }
    val base = tokenized.select(col("doc_id"), sz.cast("long")
        .as("n_tokens"),
      repN(1).as("rep1"), repN(2).as("rep2"), repN(3).as("rep3"))
    base.select(col("doc_id"), col("n_tokens"), col("rep1"), col("rep2"),
      col("rep3"),
      expr("greatest(rep1 * 1000000, rep2 * 2 * 1000000," +
        " rep3 * 3 * 1000000) div greatest(n_tokens, 1)")
        .as("max_rep_ppm"))
      .withColumn("loop_flag", col("max_rep_ppm") >= 200000L)
  }

  /** Aho–Corasick automaton over literal patterns — O(text) scanning
    * regardless of pattern count, where a regex alternation of 10k
    * blocklist terms is both slow and engine-limited. Built once on the
    * driver, broadcast, shared per partition. Match semantics pinned to
    * what an alternation SORTED LONGEST-FIRST with 'g' would do:
    * leftmost start wins, longest pattern at that start wins,
    * non-overlapping, scanning resumes after each match — so a small
    * term list is exactly replayable by `regexp_replace` and the oracle
    * can state byte parity.
    */
  private[graft] final class AcAutomaton(patterns: Seq[String])
      extends Serializable {
    import scala.collection.mutable
    private val gotos = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    private val lens = mutable.ArrayBuffer(0)
    for (p <- patterns if p.nonEmpty) {
      var s = 0
      for (c <- p) s = gotos(s).getOrElseUpdate(c, {
        gotos += mutable.Map.empty[Char, Int]; lens += 0; gotos.size - 1
      })
      lens(s) = math.max(lens(s), p.length)
    }
    private val n = gotos.size
    private val fail = new Array[Int](n)
    // longest match ending at this node, fail-chain inclusive
    private val out = lens.toArray
    locally {
      val q = mutable.Queue.empty[Int]
      gotos(0).valuesIterator.foreach(q.enqueue)
      while (q.nonEmpty) {
        val s = q.dequeue()
        gotos(s).foreach { case (c, t) =>
          var f = fail(s)
          while (f != 0 && !gotos(f).contains(c)) f = fail(f)
          fail(t) = if (f != s && gotos(f).contains(c)) gotos(f)(c) else 0
          // fail(t) computed BEFORE t is processed → out is propagated
          out(t) = math.max(out(t), out(fail(t)))
          q.enqueue(t)
        }
      }
    }
    /** All (start, longest-len) raw matches; shorter same-end overlaps
      * with DIFFERENT starts are found via their own end positions.
      */
    private def rawMatches(text: String): mutable.ArrayBuffer[(Int, Int)] = {
      val ms = mutable.ArrayBuffer.empty[(Int, Int)]
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !gotos(s).contains(c)) s = fail(s)
        s = gotos(s).getOrElse(c, 0)
        // `out` short-circuits the common no-match position; when a match
        // ends here, walk the fail chain for EVERY distinct length
        if (out(s) > 0) {
          var t = s
          while (t != 0) {
            if (lens(t) > 0) ms += ((i - lens(t) + 1, lens(t)))
            t = fail(t)
          }
        }
        i += 1
      }
      ms
    }
    /** (cleaned text, hit count) under the pinned leftmost-longest
      * non-overlapping semantics.
      */
    def scrub(text: String, replacement: String): (String, Int) = {
      val picked = rawMatches(text).sortBy { case (st, ln) => (st, -ln) }
      val sb = new StringBuilder
      var pos = 0
      var hits = 0
      picked.foreach { case (st, ln) =>
        if (st >= pos) {
          sb.append(text.substring(pos, st)).append(replacement)
          pos = st + ln
          hits += 1
        }
      }
      sb.append(text.substring(pos))
      (sb.toString, hits)
    }
  }

  /** Unicode NFC normalization (UAX #15) — the i18n dedup seam: the same
    * visible text can arrive precomposed (é) or decomposed (e + U+0301),
    * and every downstream fingerprint/shingle/dedup treats them as
    * DIFFERENT bytes unless canonicalized first. Spark has no built-in
    * Unicode normalizer, so this is a `mapPartitions` seam on
    * `java.text.Normalizer` (the same UAX #15 algorithm DuckDB's
    * `nfc_normalize` implements — the oracle pins byte parity, including
    * combining-mark reordering). Returns (id, changed, norm).
    */
  def nfcNormalize(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val s = if (t == null) "" else t
        val n = java.text.Normalizer
          .normalize(s, java.text.Normalizer.Form.NFC)
        (id, n != s, n)
      })
      .toDF("id", "changed", "norm")
  }

  /** Blocklist scrub at corpus scale: replace every occurrence of any of
    * `terms` (literal strings, a broadcast-bounded table) with
    * `replacement` in ONE text pass per document via Aho–Corasick.
    * Returns (id, n_hits, clean). For term lists small enough to state
    * as a regex, the result is byte-identical to a longest-first
    * alternation `regexp_replace` — the oracle's replay.
    */
  def blocklistScrub(docs: DataFrame, idCol: String, textCol: String,
      terms: DataFrame, termCol: String, replacement: String,
      maxTerms: Int = 1000000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = terms.select(col(termCol).cast("string"))
      .limit(maxTerms + 1).as[String].collect()
    require(pats.length <= maxTerms,
      s"blocklist exceeds maxTerms=$maxTerms")
    val bc = spark.sparkContext.broadcast(new AcAutomaton(pats.toSeq))
    docs.select(col(idCol).cast("long").as("id"),
        col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = bc.value
        it.map { case (id, t) =>
          val (clean, hits) = ac.scrub(if (t == null) "" else t, replacement)
          (id, hits.toLong, clean)
        }
      }
      .toDF("id", "n_hits", "clean")
  }

  /** Reliability-curve calibration audit for a binary scorer — the check
    * between "the classifier separates" ([[nbScore]] gates) and "its
    * score is a usable KEEP PROBABILITY" (what a curation pipeline
    * actually thresholds on): bin documents by score — ppm range cut
    * into `nBins` bins of floor(10^6 / nBins) ppm each; when nBins does
    * not divide 10^6 the LAST bin absorbs the remainder (the `least`
    * clamp), e.g. nBins = 7 gives six 142857-ppm bins and a final one
    * covering [857142, 10^6] — so bins are equal only when nBins divides
    * 10^6 — compare each bin's mean score (`conf_ppm`) to its empirical
    * positive rate (`acc_ppm`), and summarize as the expected calibration
    * error
    *
    *   ece_ppm = Σ_b n_b · |acc_b − conf_b|  div  N
    *
    * — all integer floor algebra on ppm scores, oracle-replayable.
    * Returns one row per non-empty bin (bin, n, n_pos, conf_ppm,
    * acc_ppm, gap_ppm) with the global `ece_ppm` repeated on each row
    * (the summary and the curve travel together).
    *
    * Scale shape: one bin-keyed aggregate (≤ nBins rows out), then the
    * nBins-row ECE total broadcasts back onto the curve — the corpus is
    * scanned once, nothing shuffles but the tiny bin table.
    */
  def calibrationBins(scored: DataFrame, labelCol: String,
      scoreCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, "nBins in [2, 1000]")
    val width = 1000000L / nBins
    val bin = least(call_function("div", col(scoreCol), lit(width)),
      lit(nBins - 1L))
    val b = scored
      .select(bin.as("bin"), col(labelCol).cast("long").as("y"),
        col(scoreCol).cast("long").as("s"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("s").as("sum_s"))
      .select(col("bin"), col("n"), col("n_pos"),
        call_function("div", col("sum_s"), col("n")).as("conf_ppm"),
        call_function("div", col("n_pos") * lit(1000000L), col("n"))
          .as("acc_ppm"))
      .withColumn("gap_ppm", abs(col("acc_ppm") - col("conf_ppm")))
    val tot = b.agg(call_function("div",
      sum(col("n") * col("gap_ppm")), sum(col("n"))).as("ece_ppm"))
    b.crossJoin(broadcast(tot).hint("broadcast"))
  }
}
