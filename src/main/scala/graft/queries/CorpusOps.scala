package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, ScalarQuant, TextOps, VectorOps}

/** LLM-training-data pipeline operators (dedup, text analysis, similarity
  * search, multimodal) over the `documents` and `embeddings` tables — every
  * query here carries a full DuckDB oracle. The MinHash-LSH query is oracled
  * against brute-force exact Jaccard (with 32 bands × 2 rows its recall at
  * j>=0.8 is 1 - 0.36^32 ≈ 1, candidates are deterministic xxhash64, then
  * exact-verified); the SimHash query is oracled against all-pairs hamming
  * on identically-recomputed md5-derived signatures (recall is exact at
  * maxDist <= 3 by the 4-band pigeonhole bound).
  */
object CorpusOps {

  val defs: Map[String, QueryFn] = Map(
    // tokenization: whitespace + BPE-ish regex token counts per doc
    "q_doc_token_count" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"),
          length(col("text")).as("len_chars"))
        .orderBy("doc_id")),

    // quality scoring: length/punct/stopword heuristics
    "q_doc_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          round(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
          round(TextOps.stopwordRatio(col("text"), TextOps.EnStopwords), 6)
            .as("stop_ratio"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    // LEARNED quality classifier (CCNet/fastText role): labels are
    // synthesized by construction — even docs keep their text (clean=1),
    // odd docs get vowel-stripped gibberish (junk=0). The NB trainer fits
    // integer token posteriors on the doc_id%4<2 half, the broadcast score
    // table scores ALL docs (held-out generalization), and per-class
    // aggregates prove separation: junk predicts junk, clean predicts
    // clean, on training AND held-out slices
    "q_doc_quality_clf" -> ((s, dir) => {
      val lab = wide(s, t(s, dir, "documents"))
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(2)) === 0, col("text"))
            .otherwise(regexp_replace(lower(col("text")), "[aeiou]", ""))
            .as("text"),
          (lit(1L) - pmod(col("doc_id"), lit(2))).as("label"))
      val model = TextOps.nbTrain(
        lab.where(pmod(col("doc_id"), lit(4)) < 2), "text", "label")
      TextOps.nbScore(lab, "doc_id", "text", model)
        .join(lab.select(col("doc_id").as("id"), col("label"),
          (pmod(col("doc_id"), lit(4)) < 2).as("in_train")), Seq("id"))
        .groupBy("label", "in_train")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(score_ppm) div count(1)").as("mean_score_ppm"),
          sum(when(col("score_ppm") > 500000, 1L).otherwise(0L))
            .as("n_clean_pred"))
        .orderBy("label", "in_train")
    }),

    // classifier CALIBRATION audit (reliability curve + ECE): the learned
    // quality scorer binned by score vs empirical positive rate — the
    // dial between "separates" (q_doc_quality_clf) and "the score is a
    // usable keep-probability"; all integer ppm algebra, ECE rides every
    // curve row via the broadcast 1-row total
    "q_doc_quality_ece" -> ((s, dir) => {
      val lab = wide(s, t(s, dir, "documents"))
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(2)) === 0, col("text"))
            .otherwise(regexp_replace(lower(col("text")), "[aeiou]", ""))
            .as("text"),
          (lit(1L) - pmod(col("doc_id"), lit(2))).as("label"))
      val model = TextOps.nbTrain(
        lab.where(pmod(col("doc_id"), lit(4)) < 2), "text", "label")
      val scored = TextOps.nbScore(lab, "doc_id", "text", model)
        .join(lab.select(col("doc_id").as("id"), col("label")), Seq("id"))
      TextOps.calibrationBins(scored, "label", "score_ppm", nBins = 10)
        .orderBy("bin")
    }),

    // tokenizer fertility by language: BPE-unit tokens per whitespace
    // word (micro-units) — the corpus-mix diagnostic for whether one
    // tokenizer taxes some languages with longer sequences than others.
    // Count-space sums in one linear grouped aggregate (group count =
    // languages, tiny); the integer ratios keep the gate libm-free
    "q_doc_fertility" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), TextOps.tokenCount(col("text")).as("nw"),
          TextOps.bpeTokenCount(col("text")).as("nb"),
          length(col("text")).as("nc"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("nw").as("sum_words"),
          sum("nb").as("sum_bpe"), sum("nc").as("sum_chars"))
        .withColumn("fertility_micro",
          expr("sum_bpe * 1000000 DIV greatest(sum_words, 1)"))
        .withColumn("bpe_per_100c_micro",
          expr("sum_bpe * 100000000 DIV greatest(sum_chars, 1)"))
        .orderBy("lang")),

    // relative (per-source) quality filtering: an absolute quality
    // threshold tuned on one source over- or under-prunes the others;
    // ranking WITHIN source makes the cut distribution-free (the Gopher
    // practice). Integer rank space end-to-end — row_number + per-source
    // count, keep the strict top half — so no double-boundary compare
    // can flip a row. One window shuffle on source, which downstream
    // per-source sampling shares anyway; rank state is O(1) per row
    "q_doc_quality_norm" -> ((s, dir) => {
      val w = Window.partitionBy("source")
        .orderBy(col("quality"), col("doc_id"))
      val ws = Window.partitionBy("source")
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.qualityScore(col("text")).as("quality"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n_src", count(lit(1)).over(ws))
        .where(col("rk") * 2 > col("n_src"))
        .select(col("doc_id"), col("source"), col("quality"),
          // rk is widened to BIGINT above: row_number() is INT, and
          // (rk-1)*1e6 overflows int32 once a source holds >2148 docs
          // (surfaced by the sf1 full-surface sweep; DuckDB's
          // row_number() is already BIGINT so the oracle was safe)
          expr("CAST((rk - 1) * 1000000 DIV greatest(n_src - 1, 1) AS BIGINT)")
            .as("q_rank_micro"))
        .orderBy("doc_id")
    }),

    // sentence segmentation stats: split on terminal-punctuation runs,
    // count non-empty trimmed segments, mean/max sentence length — the
    // run-on / fragment signals quality filters cut on. Pure Column
    // algebra (split + transform + filter + aggregate) fused into the
    // scan, no shuffle; integer micro-units for the mean
    "q_doc_sentences" -> ((s, dir) => {
      val segs = filter(
        transform(split(col("text"), "[.!?]+"), x => trim(x)),
        x => length(x) > 0)
      t(s, dir, "documents")
        .select(col("doc_id"), segs.as("segs"))
        .select(col("doc_id"), size(col("segs")).as("n_sentences"),
          aggregate(col("segs"), lit(0L), (a, x) => a + length(x))
            .as("sum_sent_chars"),
          coalesce(array_max(transform(col("segs"), x => length(x))), lit(0))
            .as("max_sent_chars"))
        .withColumn("mean_sent_micro",
          expr("sum_sent_chars * 1000000 DIV greatest(n_sentences, 1)"))
        .orderBy("doc_id")
    }),

    // vocabulary growth (Heaps-law curve) over 3-gram shingles: new
    // distinct n-grams per corpus decile (by doc id) and the cumulative
    // n-gram vocabulary — the diagnostic for dedup health and corpus
    // saturation (a flat tail means new data has stopped contributing
    // new content; unigrams saturate instantly, n-grams keep growing).
    // min(doc_id) per shingle is one shingle-keyed linear aggregate;
    // the decile histogram is 10 rows, so the unpartitioned running-sum
    // window is trivially safe
    "q_doc_vocab_growth" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val first = wide(s, d)
        .select(col("doc_id"),
          explode(TextOps.wordShingles(col("text"), 3)).as("term"))
        .groupBy("term").agg(min("doc_id").as("first_doc"))
      val mx = d.agg(max("doc_id").as("max_id"))
      first.crossJoin(broadcast(mx))
        .withColumn("decile",
          expr("CAST(least(first_doc * 10 DIV (max_id + 1), 9) AS INT)"))
        .groupBy("decile").agg(count(lit(1)).as("new_terms"))
        .withColumn("cum_terms",
          sum("new_terms").over(Window.orderBy("decile")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("decile")
    }),

    // n-gram novelty curve: per doc, the share of its distinct 3-gram
    // shingles never seen in any EARLIER doc (by doc_id) — the
    // crawl-ordering signal for when a source stops contributing new
    // content (near-1 early, decaying as the corpus saturates). ONE
    // shingle-keyed aggregate (min doc per shingle) folded to per-doc
    // novel counts; the denominator is the in-row shingle-set size, so
    // the shingle stream never re-joins itself (the first cut did, and
    // cost 2× the whole min-pass at sf0.1). Hash the shingle at scale;
    // the string key keeps the gate parity-trivial
    "q_doc_ngram_novelty" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val novel = wide(s, d)
        .select(col("doc_id"),
          explode(TextOps.wordShingles(col("text"), 3)).as("g"))
        .groupBy("g").agg(min("doc_id").as("first_doc"))
        .groupBy(col("first_doc").as("doc_id"))
        .agg(count(lit(1)).as("n_novel"))
      // the ≥3-token precondition is the CHEAP equivalent of
      // n_shingles > 0 — as a filter on the computed shingle column it
      // would push below the repartition and run the whole shingle
      // transform on the pre-shuffle scan task
      wide(s, d.where(size(TextOps.normTokens(col("text"))) >= 3))
        .select(col("doc_id"),
          size(TextOps.wordShingles(col("text"), 3)).cast("long")
            .as("n_shingles"))
        .join(novel, Seq("doc_id"), "left")
        .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
        .withColumn("novelty_micro",
          expr("n_novel * 1000000 DIV greatest(n_shingles, 1)"))
        .orderBy("doc_id")
    }),

    // collocation mining: top bigrams by count-space LIFT — the exp(PMI)
    // monotone c_ab·N²/(M·c_a·c_b), one mirrored left-assoc double chain
    // over exact integer counts (no libm log, the typicality discipline);
    // min-support 5 drops rare-pair noise. Bigram+unigram counts are two
    // linear token-keyed aggregates; the unigram join is term-keyed
    "q_doc_pmi" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val toks = d.select(explode(TextOps.normTokens(col("text"))).as("term"))
      val uni = toks.groupBy("term").agg(count(lit(1)).as("c"))
      val bg = d.select(explode(TextOps.wordBigrams(col("text"))).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c_ab"))
        .where(col("c_ab") >= 5)
      val nTok = toks.agg(count(lit(1)).as("n_tok"))
      val nBig = d.select(explode(TextOps.wordBigrams(col("text"))).as("g"))
        .agg(count(lit(1)).as("n_big"))
      bg
        .withColumn("w1", element_at(split(col("g"), " "), 1))
        .withColumn("w2", element_at(split(col("g"), " "), 2))
        .join(uni.select(col("term").as("w1"), col("c").as("c_a")), Seq("w1"))
        .join(uni.select(col("term").as("w2"), col("c").as("c_b")), Seq("w2"))
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBig))
        .select(col("g").as("bigram"), col("c_ab"), col("c_a"), col("c_b"),
          round((col("c_ab").cast("double") * col("n_tok") * col("n_tok"))
            / (col("n_big").cast("double") * col("c_a") * col("c_b")), 6)
            .as("lift"))
        .orderBy(col("lift").desc, col("bigram"))
        .limit(20)
    }),

    // curriculum length binning: quartile bins over token counts via
    // EXACT interpolated-percentile cutoffs (one tiny agg) + per-row
    // comparison — never a global ntile sort (a corpus-wide window with
    // no partition key is one task; the two-pass cutoff shape is the one
    // that survives 100×). Quartile cutoffs over integer counts are
    // dyadic rationals (frac ∈ {0,¼,½,¾} × int deltas), so both engines'
    // interpolation is exact and the bin assignment is engine-stable
    "q_doc_length_bins" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("nt"))
      val cuts = d.agg(
        expr("percentile(nt, 0.25)").as("q1"),
        expr("percentile(nt, 0.5)").as("q2"),
        expr("percentile(nt, 0.75)").as("q3"))
      d.crossJoin(broadcast(cuts))
        .withColumn("bin", lit(1)
          + (col("nt") > col("q1")).cast("int")
          + (col("nt") > col("q2")).cast("int")
          + (col("nt") > col("q3")).cast("int"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          min("nt").as("min_tokens"), max("nt").as("max_tokens"),
          sum(col("nt").cast("long")).as("sum_tokens"))
        .orderBy("bin")
    }),

    // language ID: stopword-marker heuristic
    "q_doc_langid" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          TextOps.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")),

    // LEARNED language ID: multi-class naive-Bayes posteriors trained on
    // synthetic per-language fixtures (the X147 discipline — the corpus
    // has no multilingual text, so four language families with
    // characteristic vocab + shared noise tokens are synthesized from
    // doc_id; train on doc_id%5 != 0, score the held-out fifth). Every
    // number integer ppm (smoothed per-token posteriors, mean over
    // in-vocab tokens, argmax with lang-asc ties), so the oracle replays
    // trainer AND scorer bit-exactly; per-language held-out separation
    // is visible in the output (pred_lang vs true_lang)
    "q_doc_langid_clf" -> ((s, dir) => {
      // true_lang is a pure function of doc_id — derivable anywhere, so
      // the final projection recomputes it from the scored ids instead of
      // joining back to heldOut (one fewer documents scan + repartition +
      // join; scored ids ⊆ heldOut ids and every heldOut doc has in-vocab
      // tokens by construction, so the row set is identical)
      def langOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(pmod(id, lit(4)) === 0, lit("de"))
          .when(pmod(id, lit(4)) === 1, lit("en"))
          .when(pmod(id, lit(4)) === 2, lit("es"))
          .otherwise(lit("fr"))
      val base = wide(s, t(s, dir, "documents")).select(col("doc_id"),
        langOf(col("doc_id")).as("true_lang"),
        concat(
          when(pmod(col("doc_id"), lit(4)) === 0,
            lit("der hund und die katze sind hier oft genug"))
            .when(pmod(col("doc_id"), lit(4)) === 1,
              lit("the quick brown fox and the lazy dog run often"))
            .when(pmod(col("doc_id"), lit(4)) === 2,
              lit("el perro y el gato estan aqui muchas veces"))
            .otherwise(
              lit("le chat noir et le chien blanc sont souvent ici")),
          lit(" tag"), pmod(col("doc_id"), lit(7)).cast("string"))
          .as("text"))
      val train = base.where(pmod(col("doc_id"), lit(5)) =!= 0)
      val heldOut = base.where(pmod(col("doc_id"), lit(5)) === 0)
      val model = TextOps.nbTrainMulti(train, "text", "true_lang")
      TextOps.nbPredictLang(
          TextOps.nbScoreMulti(heldOut, "doc_id", "text", model))
        .select(col("id").as("doc_id"), langOf(col("id")).as("true_lang"),
          col("pred_lang"), col("score_ppm"))
        .orderBy("doc_id")
    }),

    // classifier eval: labeled-vs-predicted language confusion matrix
    // with per-cell share of the labeled language's row (exact ppm) —
    // the accuracy audit for the langid heuristic
    "q_doc_lang_confusion" -> ((s, dir) => {
      val p = t(s, dir, "documents")
        .select(col("lang").as("labeled_lang"),
          TextOps.langId(col("text")).as("pred_lang"))
      val rowTotals = p.groupBy("labeled_lang")
        .agg(count(lit(1)).as("n_labeled"))
      p.groupBy("labeled_lang", "pred_lang").agg(count(lit(1)).as("n"))
        .join(broadcast(rowTotals), Seq("labeled_lang"))
        .select(col("labeled_lang"), col("pred_lang"), col("n"),
          expr("(n * 1000000L) div n_labeled").as("share_ppm"))
        .orderBy("labeled_lang", "pred_lang")
    }),

    // crawl-stitching detection: doc A's literal trailing 3-gram equals
    // doc B's literal leading 3-gram — continuation candidates from
    // paginated crawls (the re-join worklist before chunking splits a
    // document mid-thought). Each doc contributes ONE head and ONE tail
    // trigram in-row (no explode, no distinct — a repeated early
    // trigram must not shadow the true tail); the pair join is equi on
    // the trigram (df-cap it at scale, the jaccard discipline)
    "q_doc_stitch_pairs" -> ((s, dir) => {
      val toks = TextOps.normTokens(col("text"))
      val g = t(s, dir, "documents")
        .where(size(toks) >= 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(toks, 1, 3)).as("head_g"),
          concat_ws(" ", slice(toks, -3, 3)).as("tail_g"))
      g.select(col("doc_id").as("prev_doc"), col("tail_g").as("g"))
        .join(g.select(col("doc_id").as("next_doc"), col("head_g").as("g")),
          Seq("g"))
        .where(col("prev_doc") =!= col("next_doc"))
        .select(col("prev_doc"), col("next_doc"), col("g"))
        .orderBy("prev_doc", "next_doc")
    }),

    // corpus-derived stopword induction: terms present in ≥30% of
    // documents (DOCUMENT frequency, not raw counts — a term repeated
    // in one doc is content, a term in every doc is glue). One
    // per-doc-distinct explode into a term-keyed partial-agg count, the
    // 1-row corpus size broadcast back; the induced list feeds
    // stopwordRatio / langid as a corpus-specific lexicon
    "q_doc_stopword_induce" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val n = d.agg(count(lit(1)).as("n_docs"))
      d.select(col("doc_id"),
          explode(array_distinct(TextOps.normTokens(col("text"))))
            .as("term"))
        .where(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(n))
        .withColumn("df_ppm", expr("df * 1000000 DIV n_docs"))
        .where(col("df_ppm") >= 300000)
        .select("term", "df", "df_ppm")
        .orderBy(col("df").desc, col("term"))
    }),

    // ingest audit: per-source rate of declared-vs-detected language
    // disagreement ('und' tracked separately — absence of marker
    // evidence is not a mislabel) — the routing check that catches a
    // feed whose lang tag went stale. One scan + source-sized aggregate
    "q_doc_lang_mismatch" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("source"), col("lang").as("labeled_lang"),
          TextOps.langId(col("text")).as("pred_lang"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pred_lang") === "und", 1L).otherwise(0L))
            .as("n_und"),
          sum(when(col("pred_lang") =!= "und" &&
              col("pred_lang") =!= col("labeled_lang"), 1L).otherwise(0L))
            .as("n_mismatch"))
        .withColumn("mismatch_ppm",
          expr("n_mismatch * 1000000 DIV greatest(n_docs - n_und, 1)"))
        .orderBy("source")),

    // boilerplate/template detection: fingerprint of the first-8-token
    // normalized prefix; fingerprints shared by ≥2 docs are template
    // candidates (nav chrome, licence headers, form letters). One
    // prefix projection + one fingerprint-keyed partial-agg count —
    // linear, and the report is bounded by distinct templates
    "q_doc_boilerplate" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(md5(concat_ws(" ",
          slice(TextOps.normTokens(col("text")), 1, 8))).as("prefix_fp"))
        .groupBy("prefix_fp").agg(count(lit(1)).as("n_docs"))
        .where(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("prefix_fp"))),

    // dedup ROI audit: token-weighted duplication inflation per source —
    // raw token volume vs the volume after exact dedup (keeper = min
    // doc_id per fingerprint, tokens attributed to the KEEPER's
    // source), i.e. how much compute duplicate copies would waste.
    // Two linear passes (per-source raw sums; per-fp argmin via ONE
    // struct-min aggregate folded to per-source kept sums) joined on
    // the sources-sized key — the corpus never joins a corpus-sized
    // keep table. Integer token sums, ppm inflation
    "q_doc_dup_inflation" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.fingerprint(col("text")).as("fp"),
          TextOps.tokenCount(col("text")).cast("long").as("nt"))
      val raw = d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("raw_tokens"))
      val kept = d
        .groupBy("fp")
        .agg(min(struct(col("doc_id"), col("source"), col("nt"))).as("k"))
        .groupBy(col("k.source").as("source"))
        .agg(sum(col("k.nt")).as("kept_tokens"))
      raw.join(broadcast(kept), Seq("source"), "left")
        .withColumn("kept_tokens", coalesce(col("kept_tokens"), lit(0L)))
        .withColumn("inflation_ppm",
          expr("(raw_tokens - kept_tokens) * 1000000"
            + " DIV greatest(raw_tokens, 1)"))
        .orderBy("source")
    }),

    // document fingerprinting + exact dedup groups
    "q_doc_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(wide(s, t(s, dir, "documents")), "doc_id", "text")
        .orderBy("fp")),

    // robots-style path rules (RFC 9309 longest-match): synthetic crawl
    // URLs against a 4-rule table exercising longest-override (an allow
    // deeper than its deny), mid-segment prefixes, and the no-match
    // default-allow
    "q_doc_url_rules" -> ((s, dir) => {
      import s.implicits._
      val urls = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("https://site"), pmod(col("doc_id"), lit(7)),
          lit(".example.com/sec"), pmod(col("doc_id"), lit(4)),
          lit("/page"), pmod(col("doc_id"), lit(3))).as("url"))
      val rules = Seq(("/sec0", false), ("/sec0/page1", true),
        ("/sec2", false), ("/sec3/page", false)).toDF("prefix", "allow")
      graft.ops.UrlOps.pathRuleFilter(urls, "doc_id", "url", rules)
        .select(col("id").as("doc_id"), col("path"), col("matched_rule"),
          col("allowed"))
        .orderBy("doc_id")
    }),

    // Unicode NFC canonicalization audit: decomposed combining marks are
    // planted on doc_id%7∈{3,5} (incl. the reorder case U+0041 U+0308
    // U+0323 → U+1EA0 U+0308) — every fingerprint upstream of dedup is
    // wrong bytes without this; oracle = DuckDB's nfc_normalize, byte
    // parity via md5
    "q_doc_unicode_norm" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 3,
          concat(col("text"), lit(" cafe\u0301")))
          .when(pmod(col("doc_id"), lit(7)) === 5,
            concat(col("text"), lit(" A\u0308\u0323")))
          .otherwise(col("text")).as("text"))
      graft.ops.TextOps.nfcNormalize(planted, "doc_id", "text")
        .select(col("id").as("doc_id"), col("changed"),
          md5(col("norm")).as("norm_fp"))
        .orderBy("doc_id")
    }),

    // blocklist scrub at scale: Aho–Corasick single-pass replacement of a
    // term TABLE (here 4 literals incl. a phrase and a no-hit probe; in
    // production 10k+ terms where regex alternation dies). Semantics
    // pinned to longest-first alternation — the oracle replays exactly
    // that and requires byte parity
    "q_doc_blocklist_scrub" -> ((s, dir) => {
      import s.implicits._
      val terms = Seq("row fast", "spark", "table", "zz_absent")
        .toDF("term")
      graft.ops.TextOps.blocklistScrub(wide(s, t(s, dir, "documents")),
          "doc_id", "text", terms, "term", "[TERM]")
        .select(col("id").as("doc_id"), col("n_hits"),
          md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // curation-policy audit: duplication rate per quality decile — "are
    // low-quality docs more duplicated?" is the first cross-signal check
    // before choosing a dedup-vs-filter order. Corpus texts are unique by
    // construction, so docs with doc_id%5==4 take their predecessor's
    // text (planted exact dups across the whole quality spectrum); the
    // profile joins exact-dup groups against integer quality deciles
    "q_doc_quality_dup" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      val dupSrc = docs.select((col("doc_id") + 1).as("doc_id"),
        col("text").as("prev_text"))
      val planted = docs.join(dupSrc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(5)) === 4 &&
            col("prev_text").isNotNull, col("prev_text"))
            .otherwise(col("text")).as("text"))
      val scored = planted.select(col("doc_id"),
        round(TextOps.qualityScore(col("text")) * lit(1e6), 0).cast("long")
          .as("q_micro"),
        TextOps.fingerprint(col("text")).as("fp"))
      val groups = scored.groupBy("fp").agg(count(lit(1)).as("n"))
      scored.join(groups, Seq("fp"))
        .select(expr("least(9L, q_micro div 100000L)").as("bucket"),
          when(col("n") > 1, 1L).otherwise(0L).as("is_dup"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("is_dup").as("n_dup_docs"))
        .select(col("bucket"), col("n_docs"), col("n_dup_docs"),
          expr("n_dup_docs * 1000000L div n_docs").as("dup_ppm"))
        .orderBy("bucket")
    }),

    // shingling: distinct word-3-shingles per doc
    "q_doc_shingle_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.wordShingles(col("text"), 3)).as("n_shingles"))
        .orderBy("doc_id")),

    // near-dup: exact n-gram Jaccard via shared-shingle candidate join,
    // df-capped at 100 (heavy-hitter shingles would funnel O(df²) candidate
    // pairs through one reducer at corpus scale; the oracle mirrors the cap)
    "q_doc_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(wide(s, t(s, dir, "documents")), "doc_id", "text", 3, 0.8,
          dfCap = 100)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("doc_a", "doc_b")),

    // asymmetric containment: every 5th doc's 9-token HEAD is planted as
    // a separate mini-doc (id + 1e6) — fully contained in its source,
    // near-zero Jaccard against it (the case symmetric dedup keeps both
    // of); df-cap 50 mirrored in the oracle
    "q_doc_containment" -> ((s, dir) => {
      val base = t(s, dir, "documents")
      val sub = base.where(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 9), " ")
            .as("text"))
      val docs = base.select(col("doc_id"), col("text")).unionByName(sub)
      Dedup.containmentPairs(wide(s, docs), "doc_id", "text", 3,
          minContainPpm = 800000L, dfCap = 50)
        .orderBy("doc_a", "doc_b")
    }),

    // near-dup: MinHash + banded LSH candidates, exact-Jaccard verified
    "q_doc_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(wide(s, t(s, dir, "documents")), "doc_id", "text",
        k = 3, nHashes = 64, bands = 32, threshold = 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("doc_a", "doc_b")),

    // near-dup recall eval: how much of the exact-Jaccard(≥0.8) truth
    // set the cheap SimHash(≤3) screen recovers — the quality dial for
    // hamming-radius / banding tuning, computed in-engine (the text
    // analog of q_emb_recall_ivf). The pair-key join is equi; both
    // inputs are the operators' own bounded pair outputs, so the eval
    // costs nothing next to the screens it scores
    "q_doc_simhash_recall" -> ((s, dir) => {
      val d = wide(s, t(s, dir, "documents"))
      val truth = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.8)
        .select("doc_a", "doc_b")
      val approx = Dedup.simhashPairs(d, "doc_id", "text", 3)
        .select(col("doc_a"), col("doc_b"), lit(1).as("hit"))
      truth.join(approx, Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_truth"),
          coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
        .select(col("n_truth"), col("n_hit"),
          expr("n_hit * 1000000 DIV greatest(n_truth, 1)").as("recall_ppm"))
    }),

    // cross-modal integrity: text-near-dup pairs (MinHash-LSH, exact-
    // verified ≥0.8) should carry similar embeddings — a pair with high
    // Jaccard but low cosine is a stale or mis-joined embedding row (the
    // re-embed worklist). Pairs are the dedup op's own bounded output;
    // the two embedding lookups are id-keyed equi-joins
    "q_emb_dup_consistency" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(wide(s, t(s, dir, "documents")),
        "doc_id", "text", 3, 64, 32, 0.8)
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      pairs
        .join(e.select(col("vec_id").as("doc_a"), col("embedding").as("va")),
          Seq("doc_a"))
        .join(e.select(col("vec_id").as("doc_b"), col("embedding").as("vb")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(col("jaccard"), 6).as("jaccard"),
          round(VectorOps.cosine(col("va"), col("vb")), 6).as("cos"))
        .withColumn("consistent", col("cos") >= 0.9)
        .orderBy("doc_a", "doc_b")
    }),

    // near-dup clusters: LSH pairs → connected components via iterative
    // min-label propagation (the driver-coordinated fixpoint loop); oracle
    // recomputes reachability with a recursive CTE over the exact-Jaccard
    // pair set (equal to the LSH output at this threshold)
    "q_doc_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(wide(s, t(s, dir, "documents")),
        "doc_id", "text", 3, 64, 32, 0.8)
      Dedup.components(pairs, 20).orderBy("doc_id")
    }),

    // b-bit MinHash (Li & König): 16 portable md5-seeded registers cut to
    // their low 3 bits — one 48-bit sketch word per doc, 21x smaller than
    // the full signature — with the collision-corrected Jaccard estimate
    // and the exact Jaccard alongside for calibration. The md5 base makes
    // registers, banding, sketch AND estimator fully engine-replayable
    "q_doc_bbit_minhash" -> ((s, dir) =>
      Dedup.bbitMinhashPairs(wide(s, t(s, dir, "documents")), "doc_id",
          "text", k = 3, nPerms = 16, bands = 4, b = 3)
        .orderBy("doc_a", "doc_b")),

    // near-dup: 64-bit SimHash on an md5-derived portable hash, 4x16-bit
    // band join, hamming <= 3. At maxDist <= 3 the banded result provably
    // equals brute-force all-pairs (pigeonhole) and the md5 nibble math is
    // engine-portable, so DuckDB recomputes the identical signatures and
    // compares all pairs — a full rows+schema+hash oracle.
    "q_doc_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(wide(s, t(s, dir, "documents")), "doc_id", "text", 3)
        .orderBy("doc_a", "doc_b")),

    // exact-substring dedup (ExactSubstr pass, Lee et al. arXiv:2107.06499):
    // corpus-wide duplicated 40-char spans at stride 10 — one groupBy(window)
    // shuffle, no doc pairs ever meet a reducer; top-20 by (spread, freq, win)
    // is a total order so the limit boundary is deterministic
    "q_doc_dup_spans" -> ((s, dir) =>
      Dedup.dupSpans(wide(s, t(s, dir, "documents")), "doc_id", "text")),

    // the per-doc drop signal of the same pass: fraction of a doc's windows
    // also present in another doc, in integer micro-units (floor div —
    // no float division, bit-identical across engines)
    "q_doc_dup_coverage" -> ((s, dir) =>
      Dedup.dupSpanCoverage(wide(s, t(s, dir, "documents")), "doc_id", "text")
        .orderBy("doc_id")),

    // the REWRITE half of the same pass: duplicated windows keep their
    // min-doc_id canonical occurrence and are cut everywhere else; per-doc
    // interval merge + segment stitch happen in-row (aggregate() folds, no
    // explode). md5 of the rewritten text proves byte parity against the
    // oracle's per-character replay of the identical removal decision
    "q_doc_span_dedup" -> ((s, dir) =>
      Dedup.spanRemoval(wide(s, t(s, dir, "documents")), "doc_id", "text")
        .select(col("doc_id"), col("orig_len"), col("n_spans"),
          col("clean_len"), col("removed_chars"),
          md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")),

    // BOUNDARY-EXACT ExactSubstr rewrite: stride-1 windows at minLen=25,
    // so duplicated runs shorter than the strided pass's winLen=40 are
    // found and every removed boundary is the true run edge (no stride
    // quantization). Oracle is the same per-character replay at stride 1
    "q_doc_span_exact" -> ((s, dir) =>
      Dedup.spanRemovalExact(wide(s, t(s, dir, "documents")), "doc_id",
          "text", minLen = 25)
        .select(col("doc_id"), col("orig_len"), col("n_spans"),
          col("clean_len"), col("removed_chars"),
          md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")),

    // the ExactSubstr DROP decision: keep docs whose duplicate-span
    // coverage is under 50% (exact integer ppm — no float boundary);
    // docs too short to window (no coverage row) are kept, since the
    // pass cannot judge them. Composes the gated coverage op end-to-end
    "q_doc_span_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cov = Dedup.dupSpanCoverage(wide(s, docs), "doc_id", "text")
        .select("doc_id", "dup_ppm")
      docs.join(cov, Seq("doc_id"), "left")
        .where(col("dup_ppm").isNull || col("dup_ppm") < 500000)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("lang")
    }),

    // document fingerprinting: codegen'd polynomial rolling hash over the
    // normalized text (Rabin-Karp primitive; md5 variant in q_doc_dedup_exact)
    "q_doc_rolling_fp" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.RollingHashFn.rolling_hash(
            TextOps.normalize(col("text"))).as("fp"))
        .orderBy("doc_id")),

    // corpus statistics: TF-IDF per (doc, term) — two linear aggregations
    // (term frequency per doc, document frequency per term) + one join +
    // a broadcast scalar N; idf = ln(N/df). Everything shuffles on term or
    // (doc, term) — linear in corpus tokens, no all-pairs anywhere.
    "q_doc_tfidf" -> ((s, dir) => {
      val terms = wide(s, t(s, dir, "documents"))
        .select(col("doc_id"),
          explode(graft.ops.TextOps.normTokens(col("text"))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
      val n = t(s, dir, "documents").agg(count(lit(1)).cast("double").as("nd"))
      tf.join(dfT, Seq("term"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"), col("df_t"),
          round(col("tf") * log(col("nd") / col("df_t")), 6).as("tfidf"))
        .orderBy("doc_id", "term")
    }),

    // keyword extraction: each doc's top-3 terms by tf·idf in micro-units
    // (tags/index-terms export). The rank window partitions by doc_id —
    // bounded per group by the doc's own distinct terms, not corpus size
    // (the one place a window IS the scale-safe shape); rank on the
    // integer micro weight, term tiebreak
    "q_doc_keywords" -> ((s, dir) => {
      val terms = wide(s, t(s, dir, "documents"))
        .select(col("doc_id"),
          explode(graft.ops.TextOps.normTokens(col("text"))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
      val n = t(s, dir, "documents").agg(count(lit(1)).cast("double").as("nd"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
        .orderBy(col("w_micro").desc, col("term"))
      tf.join(dfT, Seq("term"))
        .crossJoin(broadcast(n))
        .withColumn("w_micro",
          round(col("tf") * log(col("nd") / col("df_t")) * 1e6, 0)
            .cast("long"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("w_micro"))
        .orderBy("doc_id", "rank")
    }),

    // deterministic hash split: stable train/val/test assignment (80/10/10)
    // by md5 bucket of the normalized text — same assignment on every run,
    // partitioning, and engine (the oracle recomputes it bit-for-bit)
    "q_doc_hash_split" -> ((s, dir) => {
      val splitCol = graft.ops.Sampling.split(
        graft.ops.TextOps.normalize(col("text")),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      t(s, dir, "documents")
        .select(col("doc_id"), splitCol.as("split"))
        .groupBy("split").agg(count(lit(1)).as("n"), min("doc_id").as("min_id"))
        .orderBy("split")
    }),

    // corpus statistics: term frequencies (top 50 by count, tiebreak term).
    // orderBy().limit(k) → TakeOrderedAndProject (per-partition top-k,
    // driver merge) instead of a global row_number window — at corpus scale
    // the vocabulary is huge and a no-partition WindowExec would sort it
    // all in one task. Rank is recomputed over the 50 survivors by a tiny
    // ordering self-join (WindowExec-free plan).
    // BPE round-0 pair statistics: the corpus-scale half of tokenizer
    // training — everything after the word-frequency aggregate is
    // vocabulary-bounded (the merge loop itself, Bpe.train, runs on the
    // collected vocab table and is spec'd, not gated). Top 20, k-bounded
    // ranking
    "q_doc_bpe_pairs" -> ((s, dir) => {
      val top = graft.ops.Bpe.pairStats(t(s, dir, "documents"), "text")
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
      top.as("a").join(top.as("b"),
          col("b.n") > col("a.n") ||
            (col("b.n") === col("a.n") && col("b.pair") < col("a.pair")), "left")
        .groupBy(col("a.pair").as("pair"), col("a.n").as("n"))
        .agg((count(col("b.pair")) + 1).cast("int").as("rk"))
        .select("rk", "pair", "n")
        .orderBy("rk")
    }),

    // distributed BPE corpus ENCODE — the step a tokenizer exists for:
    // a fixed merge table (trained once from the seed vocabulary below, so
    // both engines can state it) is broadcast and applied to every token of
    // every document; the encoder itself runs once per DISTINCT word
    // (vocab-bounded), pieces join back to the corpus-scale token stream.
    // The oracle replays the merge loop as chained replace() calls over a
    // separator-wrapped symbol string — bit-exact, so any divergence in
    // merge order or application breaks the gate
    "q_doc_bpe_encode" -> ((s, dir) =>
      graft.ops.Bpe.encodeCorpus(t(s, dir, "documents"), "doc_id", "text",
          bpeGateMerges)
        .select(col("doc_id"), col("pos"), col("term"),
          posexplode(col("pieces")).as(Seq("piece_idx", "piece")))
        .orderBy("doc_id", "pos", "piece_idx")),

    // tokenizer-efficiency audit: BPE vs unigram piece counts per doc
    // over the SAME corpus and the same bootstrapped vocab budget — the
    // fertility comparison that decides which tokenizer family wastes
    // fewer pieces on this data (Kudo 2018's evaluation, as a gate)
    "q_doc_tokenizer_compare" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val enc = graft.ops.Bpe.encodeCorpus(docs, "doc_id", "text",
        bpeGateMerges)
      val bp = enc.groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(size(col("pieces"))).cast("long").as("bpe_pieces"))
      val vocab = graft.ops.Unigram.vocabFromBpe(docs, "doc_id", "text",
        bpeGateMerges, maxPieceLen = 8)
      val seg = graft.ops.Unigram.segmentCorpus(docs, "doc_id", "text",
        vocab, maxPieceLen = 8)
      val up = seg.groupBy("doc_id")
        .agg(sum(size(col("pieces"))).cast("long").as("uni_pieces"))
      bp.join(up, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("bpe_pieces"),
          col("uni_pieces"),
          (col("uni_pieces") - col("bpe_pieces")).as("piece_delta"))
        .orderBy("doc_id")
    }),

    // T5-style span corruption: deterministic md5-selected mask spans,
    // sentinel-rewritten input + target assembled in one array fold; the
    // oracle rebuilds both strings via an INDEPENDENT window/string_agg
    // formulation — byte-equal md5s pin the objective's data shape
    "q_doc_span_corrupt" -> ((s, dir) =>
      graft.ops.Curation.spanCorrupt(wide(s, t(s, dir, "documents")),
          "doc_id", "text")
        .orderBy("doc_id")),

    // UL2 mixture-of-denoisers (Tay et al., arXiv:2205.05131): each doc's
    // denoiser config is a deterministic doc_id%3 pick — R (10%, short
    // spans), X (20%, longer spans), S (50%, token-level) — one union of
    // three parameterized spanCorrupt branches, each replayed by its own
    // parameterized oracle instance
    "q_doc_ul2_mixture" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      def cfg(m: Int, rate: Int, len: Int, tag: String) =
        graft.ops.Curation.spanCorrupt(
            docs.where(pmod(col("doc_id"), lit(3)) === m),
            "doc_id", "text", startRatePct = rate, maxSpanLen = len)
          .withColumn("denoiser", lit(tag))
      cfg(0, 10, 3, "r").unionAll(cfg(1, 20, 4, "x"))
        .unionAll(cfg(2, 50, 1, "s"))
        .orderBy("doc_id")
    }),

    // SentencePiece-style unigram Viterbi segmentation: min-total-cost
    // pieces under a BPE-bootstrapped integer-cost vocab (floor-log2
    // costs, +500/piece fragmentation penalty, longest-piece tie pin) —
    // the OTHER subword tokenizer family, fully DP-replayed by the oracle
    "q_doc_unigram_segment" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = graft.ops.Unigram.vocabFromBpe(docs, "doc_id", "text",
        bpeGateMerges, maxPieceLen = 8)
      graft.ops.Unigram.segmentCorpus(docs, "doc_id", "text", vocab,
          maxPieceLen = 8)
        .select(col("doc_id"), col("pos"), col("term"), col("cost_milli"),
          posexplode(col("pieces")).as(Seq("piece_idx", "piece")))
        .orderBy("doc_id", "pos", "piece_idx")
    }),

    // tokenizer round-trip audit: decode(encode(corpus)) must equal the
    // normalized corpus BYTE-EXACTLY — the oracle never sees the pieces,
    // it states the identity from the original text, so any encoder loss
    // (dropped token, corrupted merge, lossy piece join) breaks the md5
    "q_doc_bpe_roundtrip" -> ((s, dir) => {
      val enc = graft.ops.Bpe.encodeCorpus(t(s, dir, "documents"),
        "doc_id", "text", bpeGateMerges)
      graft.ops.Bpe.decodeCorpus(enc)
        .select(col("doc_id"), col("n_tokens"),
          md5(col("decoded")).as("rt_fp"))
        .orderBy("doc_id")
    }),

    // byte-level BPE encode (the GPT-2/tiktoken family): regex pretokens
    // over the RAW text (leading space and case preserved — " the" and
    // "the" are distinct), merges over the byte alphabet through the
    // GPT-2 byte↔unicode map. The oracle replays the same split, the
    // byte map restricted to this corpus's alphabet (space is its only
    // non-identity byte), and the chained-replace merge loop — bit-exact
    "q_doc_bpe_bytes" -> ((s, dir) =>
      graft.ops.Bpe.encodeCorpusBytes(t(s, dir, "documents"), "doc_id",
          "text", bpeByteGateMerges)
        .select(col("doc_id"), col("pos"), col("term"),
          posexplode(col("pieces")).as(Seq("piece_idx", "piece")))
        .orderBy("doc_id", "pos", "piece_idx")),

    // byte-level round trip: decode(encode(corpus)) equals the ORIGINAL
    // text byte-exactly — not a normalized form; byte pretokens carry
    // their own case and whitespace, so the identity is stronger than
    // the word-BPE gate's. Decode never consults the carried term
    "q_doc_bpe_bytes_roundtrip" -> ((s, dir) => {
      val enc = graft.ops.Bpe.encodeCorpusBytes(t(s, dir, "documents"),
        "doc_id", "text", bpeByteGateMerges)
      graft.ops.Bpe.decodeCorpusBytes(enc)
        .select(col("doc_id"), col("n_tokens"),
          md5(col("decoded")).as("rt_fp"))
        .orderBy("doc_id")
    }),

    // bounded-memory cardinality: per-lang distinct-vocabulary sketch —
    // a fixed 4096-bit bitmap per group (512 bytes of state regardless of
    // vocabulary size, OR-mergeable partials) vs the exact count that
    // carries every key through an Expand. The occupied count is exact
    // integer state; the oracle replays it as count-distinct-of-buckets
    // over the identical md5-nibble bucket math. At 100 TB the sketch is
    // the only affordable per-stratum vocabulary monitor
    "q_doc_cardinality" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("lang"), explode(TextOps.normTokens(col("text")))
          .as("term"))
      val bucket =
        conv(substring(md5(col("term")), 1, 4), 16, 10).cast("long") % 4096
      toks.select(col("lang"), col("term"), bucket.as("bk"))
        .groupBy("lang")
        .agg(graft.functions.SigAggregators.bitmap_distinct(4096)(col("bk"))
          .as("occupied"),
          countDistinct(col("term")).as("n_exact"))
        .orderBy("lang")
    }),

    // Count-Min point queries: per-term frequency estimates for the top-20
    // exact terms from a d=4 × w=512 counter sketch — the structure a
    // df-cap/rate-limiter consults when the key domain never fits a
    // groupBy. Counters are order-free SUMS over the portable seeded
    // md5-52bit family, so the oracle replays the sketch AND every
    // estimate bit-exactly; over_by shows the collision overestimate live
    "q_doc_cms_freq" -> ((s, dir) => {
      val terms = wide(s, t(s, dir, "documents"))
        .select(explode(graft.ops.TextOps.normTokens(col("text"))).as("term"))
      val sk = graft.ops.Cms.sketch(terms, col("term"), d = 4, w = 512)
      val top = terms.groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(20)
      graft.ops.Cms.estimate(sk, top, "term", d = 4, w = 512)
        .join(top, Seq("term"))
        .select(col("term"), col("n"), col("est"),
          (col("est") - col("n")).as("over_by"))
        .orderBy(col("n").desc, col("term"))
    }),

    // AMS F2 sketch: per-shard second moment of the token-frequency
    // vector (self-join size / hot-key skew mass) from 40 ±1-sign sums —
    // mean over s1=8 per block, median over s2=5 block means (the AMS
    // paper's own two-level concentration; a plain median of squares
    // sits near 0.455*F2). Signs hash (token, seed) jointly via md5, Z
    // sums are order-free longs, block means integer floor-div — the
    // oracle replays sketch AND estimate bit-exactly; the exact F2 rides
    // along to show the ~1/sqrt(s1) error live
    "q_doc_ams_f2" -> ((s, dir) => {
      val tok = wide(s, t(s, dir, "documents"))
        .select(pmod(col("doc_id"), lit(4)).as("grp"),
          explode(graft.ops.TextOps.normTokens(col("text"))).as("w"))
      val exact = tok.groupBy("grp", "w").agg(count(lit(1)).as("f"))
        .groupBy("grp").agg(sum(col("f") * col("f")).as("f2_exact"))
      graft.ops.Ams.f2Estimate(tok, Seq("grp"), col("w"))
        .join(exact, Seq("grp"))
        .orderBy("grp")
    }),

    // exact distributed percentiles: nearest-rank (type-1) token-count
    // percentiles WITHOUT a single-task global sort — order-contiguous
    // buckets (v div 8), one running-sum window over the tiny bucket-
    // count table for offsets, partitioned row_number for ranks, then a
    // broadcast join against the ceil(n*p/100) target ranks. Values at
    // ranks are actual data values (never interpolation), so the replay
    // is integer-exact
    "q_doc_exact_percentile" -> ((s, dir) => {
      val v = wide(s, t(s, dir, "documents"))
        .select(size(split(trim(col("text")), "\\s+")).cast("long")
          .as("nt"))
      graft.ops.Rank.exactPercentiles(v, "nt", Seq(25, 50, 75, 90, 99),
          bucketWidth = 8)
        .orderBy("p")
    }),

    // per-GROUP exact percentiles: the bucket-offset rank chain keyed by
    // lang — no group ever sorts on one task, no group's values buffer
    // in an aggregator (the percentile() failure mode at a billion rows
    // per group); nearest-rank values are actual data, integer-exact
    "q_doc_group_percentile" -> ((s, dir) => {
      val v = wide(s, t(s, dir, "documents"))
        .select(col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
      graft.ops.Rank.groupedExactPercentiles(v, "lang", "nt",
          Seq(25, 50, 75, 90, 99), bucketWidth = 8)
        .orderBy("lang", "p")
    }),

    // WEIGHTED (token-mass) percentiles per lang: the doc length at the
    // p-th percentile of TOKEN MASS, not doc count — the packing-budget
    // view (half the tokens live in docs longer than the mass median);
    // weight-sum bucket offsets + partitioned cumulative windows, target
    // row by (cum−w, cum] interval membership — integer-exact
    "q_doc_wgt_percentile" -> ((s, dir) => {
      val v = wide(s, t(s, dir, "documents"))
        .select(col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
      graft.ops.Rank.groupedWeightedPercentiles(v, "lang", "nt", "nt",
          Seq(25, 50, 75, 90, 99), bucketWidth = 8)
        .orderBy("lang", "p")
    }),

    // KMV distinct sketch: per-lang distinct-shingle cardinality from the
    // k=128 smallest md5-52bit hashes — k-bounded mapper state (no
    // distinct shuffle of the key domain), and the (k−1)·M div h_k
    // estimate is integer rank algebra the oracle replays BIT-EXACTLY
    // (approx_count_distinct's HLL float chain cannot be) — exact count
    // rides along to show the ~1/√k error live
    "q_doc_kmv_distinct" -> ((s, dir) => {
      val sh = wide(s, t(s, dir, "documents"))
        .select(col("lang"),
          explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      graft.ops.Kmv.distinctEstimate(sh, Seq("lang"), col("sh"), k = 128)
        .join(sh.groupBy("lang").agg(countDistinct("sh").as("n_exact")),
          Seq("lang"))
        .orderBy("lang")
    }),

    // HLL distinct sketch: the same per-lang distinct-shingle question
    // with m = 256 FIXED-SIZE registers instead of KMV's k longs — the
    // industry-standard sketch, but with the harmonic mean computed as
    // exact integer algebra (2^(S−M) terms, floor-div α scaling) so the
    // oracle replays the ESTIMATE bit-for-bit, which Spark's own HLL++
    // float chain cannot; exact count rides along showing ~1.04/√m live
    "q_doc_hll_distinct" -> ((s, dir) => {
      val sh = wide(s, t(s, dir, "documents"))
        .select(col("lang"),
          explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      graft.ops.Hll.distinctEstimate(sh, Seq("lang"), col("sh"), p = 8)
        .join(sh.groupBy("lang").agg(countDistinct("sh").as("n_exact")),
          Seq("lang"))
        .orderBy("lang")
    }),

    // PERSISTED incremental HLL — the cross-batch distinct-maintenance
    // serving path: yesterday's registers stored (even-doc half), today's
    // batch (odd half) merged register-wise, estimate off the merged
    // table WITHOUT rescanning history. Merge(a,b) = sketch(a ∪ b) by
    // construction, so the oracle is the FULL-corpus HLL chain — an
    // incremental-path bug (missed registers, wrong max) breaks the gate
    "q_doc_hll_serve" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      def shingles(half: Int) =
        docs.where(pmod(col("doc_id"), lit(2)) === half)
          .select(col("lang"),
            explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      val base = graft.io.IndexCache.cacheDir("hllregs", 1,
        s"$dir/documents.parquet")
      graft.io.IndexCache.ensureBuilt(base, s"$base/regs/_SUCCESS") {
        tmp =>
          graft.ops.Hll.registerTable(shingles(0), Seq("lang"),
            col("sh"), p = 8).write.parquet(s"$tmp/regs")
      }
      val stored = s.read.parquet(s"$base/regs")
      val batch = graft.ops.Hll.registerTable(shingles(1), Seq("lang"),
        col("sh"), p = 8)
      val all = docs.select(col("lang"),
        explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      graft.ops.Hll.estimateFromRegisters(
          graft.ops.Hll.mergeRegisters(stored, batch, Seq("lang")),
          Seq("lang"), p = 8)
        .join(all.groupBy("lang").agg(countDistinct("sh").as("n_exact")),
          Seq("lang"))
        .orderBy("lang")
    }),

    // WARM HLL serving — the deployment number for sketch serving,
    // split from the cold build the way the chunk-store gates split
    // theirs: BOTH halves' registers live in the content-keyed cache
    // (built off-clock on first touch), and the gate itself never sees
    // text or shingles — it scans two ≤ langs×256-row register tables,
    // merges register-wise, estimates. Flat at any corpus scale by
    // construction (state is m small ints per group forever); the cold
    // register build + the exact countDistinct audit stay priced in
    // q_doc_hll_serve's own row
    "q_doc_hll_serve_warm" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      def shingles(half: Int) =
        docs.where(pmod(col("doc_id"), lit(2)) === half)
          .select(col("lang"),
            explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      val base = graft.io.IndexCache.cacheDir("hllregs2", 1,
        s"$dir/documents.parquet")
      graft.io.IndexCache.ensureBuilt(base, s"$base/regs1/_SUCCESS") {
        tmp =>
          graft.ops.Hll.registerTable(shingles(0), Seq("lang"),
            col("sh"), p = 8).write.parquet(s"$tmp/regs0")
          graft.ops.Hll.registerTable(shingles(1), Seq("lang"),
            col("sh"), p = 8).write.parquet(s"$tmp/regs1")
      }
      graft.ops.Hll.estimateFromRegisters(
          graft.ops.Hll.mergeRegisters(
            s.read.parquet(s"$base/regs0"),
            s.read.parquet(s"$base/regs1"), Seq("lang")),
          Seq("lang"), p = 8)
        .orderBy("lang")
    }),

    // bounded-state grouped quantiles — the sketch-family quantile
    // member next to HLL/KMV/CMS/AMS: a deterministic bottom-k-by-
    // content-hash row sample per group (mergeable, oracle-replayable),
    // quantiles as rank picks off the k-array; the exact grouped
    // percentile alongside for calibration (the hll-serve discipline)
    "q_doc_quantile_sketch" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      val sketch = graft.ops.QuantileSketch.quantiles(docs, Seq("lang"),
        length(col("text")).cast("long"), col("doc_id").cast("string"),
        k = 64, ps = Seq(25, 50, 75, 99))
      val exact = graft.ops.Rank.groupedExactPercentiles(
        docs.select(col("lang").as("g"),
          length(col("text")).cast("long").as("v")),
        "g", "v", Seq(25, 50, 75, 99), bucketWidth = 16)
      sketch.join(exact
          .select(col("g").as("lang"), col("p"), col("v").as("exact")),
          Seq("lang", "p"))
        .select("lang", "p", "n_sample", "est", "exact")
        .orderBy("lang", "p")
    }),

    // WARM quantile serving — the persisted form of the sample sketch
    // (the hll_serve_warm discipline): both halves' bottom-k samples
    // live in the content-keyed cache, the gate scans two ≤ langs×k-row
    // tables, merges (bottom-k of unions composes), estimates — the
    // corpus text is never touched at query time
    "q_doc_quantile_serve" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      def half(h: Int) = docs.where(pmod(col("doc_id"), lit(2)) === h)
      def sample(d: org.apache.spark.sql.DataFrame) =
        graft.ops.QuantileSketch.sampleTable(d, Seq("lang"),
          length(col("text")).cast("long"), col("doc_id").cast("string"),
          k = 64)
      val base = graft.io.IndexCache.cacheDir("qsketch", 1,
        s"$dir/documents.parquet")
      graft.io.IndexCache.ensureBuilt(base, s"$base/smp1/_SUCCESS") {
        tmp =>
          sample(half(0)).write.parquet(s"$tmp/smp0")
          sample(half(1)).write.parquet(s"$tmp/smp1")
      }
      graft.ops.QuantileSketch.quantilesFromSample(
          graft.ops.QuantileSketch.mergeSamples(
            s.read.parquet(s"$base/smp0"), s.read.parquet(s"$base/smp1"),
            Seq("lang"), k = 64),
          Seq("lang"), ps = Seq(25, 50, 75, 99))
        .orderBy("lang", "p")
    }),

    // theta-sketch overlap: distinct-shingle intersection/union between
    // the even- and odd-doc halves per lang (the cross-snapshot
    // vocabulary-overlap question) from two k-long sketches — set
    // algebra at bounded state, integer-exact replay, with the exact
    // intersection alongside for calibration
    "q_doc_kmv_overlap" -> ((s, dir) => {
      val sh = wide(s, t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      val a = sh.where(pmod(col("doc_id"), lit(2)) === 0)
      val b = sh.where(pmod(col("doc_id"), lit(2)) === 1)
      graft.ops.Kmv.overlapEstimate(a, b, Seq("lang"), col("sh"), k = 128)
        .join(a.select("lang", "sh").intersect(b.select("lang", "sh"))
          .groupBy("lang").agg(count(lit(1)).as("n_exact_intersect")),
          Seq("lang"), "left")
        .withColumn("n_exact_intersect",
          coalesce(col("n_exact_intersect"), lit(0L)))
        .orderBy("lang")
    }),

    // sorted-neighborhood blocking (merge/purge): each doc paired with
    // its next 3 neighbors in normalized-text sort order, exact Jaccard
    // riding along — the deterministic-recall complement to LSH bands.
    // Global rank is exact and DISTRIBUTED (prefix buckets + offsets +
    // partitioned window), never a single-task sort
    "q_doc_sorted_neighborhood" -> ((s, dir) =>
      graft.ops.Dedup.sortedNeighborhoodPairs(
          wide(s, t(s, dir, "documents")), "doc_id", "text",
          window = 4, shingleK = 3)
        .orderBy("doc_a", "doc_b")),

    // priority sampling (Duffield-Lund-Thorup): k docs by token mass with
    // the unbiased subset-sum estimator w_hat = max(w, tau) — one
    // TakeOrderedAndProject of k+1 rows, no window, no global sort;
    // deterministic md5 uniforms make the draw itself oracle-replayable
    "q_doc_priority_sample" -> ((s, dir) => {
      val w = t(s, dir, "documents")
        .select(col("doc_id"),
          greatest(TextOps.tokenCount(col("text")).cast("long"), lit(1L))
            .as("n_tokens"))
      graft.ops.Sampling.prioritySample(w, "doc_id", "n_tokens", k = 32)
        .orderBy(col("prio").desc, col("doc_id"))
    }),

    // theta-sketch overlap MATRIX: pairwise vocabulary overlap across all
    // 20 sources from 20 k-long sketches — the corpus is read ONCE for
    // the sketch agg; the 190-pair stage is a broadcast self-join of a
    // 20-row table (m²·k longs, corpus-size independent). Same integer
    // set algebra as q_doc_kmv_overlap, plus derived Jaccard ppm
    "q_doc_kmv_matrix" -> ((s, dir) => {
      val sh = wide(s, t(s, dir, "documents"))
        .select(col("source"),
          explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      graft.ops.Kmv.overlapMatrix(sh, "source", col("sh"), k = 128)
        .orderBy("grp_a", "grp_b")
    }),

    // tokenizer-aware packing: context windows packed by BPE PIECE count
    // (not whitespace tokens) — the composition a training pipeline
    // actually runs: encode → count pieces per doc → greedy first-fit
    // bins per language stream. One plan; the oracle chains the bpe
    // merge-loop replay into the recursive packing CTE
    "q_doc_bpe_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val counts = graft.ops.Bpe.encodeCorpus(docs, "doc_id", "text",
          bpeGateMerges)
        .groupBy("doc_id")
        .agg(sum(size(col("pieces"))).cast("int").as("n_pieces"))
      val sized = docs.select(col("doc_id"), col("lang"))
        .join(counts, Seq("doc_id"))
      graft.ops.Curation.packBySize(sized, "lang", "doc_id", "n_pieces",
          capacity = 256)
        .select(col("grp").as("lang"), col("doc_id"),
          col("n_tokens").as("n_pieces"), col("bin"))
        .orderBy("lang", "doc_id")
    }),

    // Misra-Gries heavy hitters in the sketch's EXACT regime (capacity
    // 1024 > the corpus vocabulary at EVERY test scale — the base corpus
    // holds ~31 distinct tokens and a letter-rotated replica multiplies
    // that by at most 26, so 806 is the vocab ceiling; the sf1 sweep
    // caught the old capacity 64 leaving the exact regime at 310 terms):
    // one pass, state bounded by capacity — the shape that still works
    // when the key domain itself (URLs, hosts, n-grams) doesn't fit a
    // groupBy. No decrement fires here, so every count is exact and the
    // full-count oracle matches bit-for-bit; the bounded-capacity error
    // contract is spec-checked on adversarial data
    "q_doc_heavy_hitters" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(graft.ops.TextOps.normTokens(col("text"))).as("term"))
        .agg(graft.functions.FreqSketch.frequent_terms(1024)(col("term")).as("hh"))
        .select(posexplode(col("hh")).as(Seq("pos", "e")))
        .select((col("pos") + 1).cast("int").as("rk"),
          col("e.term").as("term"), col("e.n").as("n"))),

    "q_doc_term_freq" -> ((s, dir) => {
      val top = wide(s, t(s, dir, "documents"))
        .select(explode(graft.ops.TextOps.normTokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term"))
        .limit(50)
      top.as("a").join(top.as("b"),
          col("b.n") > col("a.n") ||
            (col("b.n") === col("a.n") && col("b.term") < col("a.term")), "left")
        .groupBy(col("a.term").as("term"), col("a.n").as("n"))
        .agg((count(col("b.term")) + 1).cast("int").as("rk"))
        .select("rk", "term", "n")
        .orderBy("rk")
    }),

    // similarity search: brute-force cosine top-10 for 3 query vectors
    "q_emb_knn_brute" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val queries = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      VectorOps.bruteTopK(emb, queries, 10)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    }),

    // MMR diversification: retrieval's top-6 re-ranked to 3 diverse picks
    // per query (lambda = 0.7) — greedy argmax of lam*rel − (1−lam)*max
    // sim-to-selected, everything on the integer-exact cosine chain, the
    // greedy loop a k-round in-row fold over bounded candidate/sim arrays
    // (no window, no iterative jobs); ties pinned to the larger id
    "q_emb_mmr" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val queries = emb.where(col("vec_id") < 6)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      VectorOps.mmrRerank(emb, queries, k = 3, topC = 6,
          lambdaPpm = 700000L)
        .orderBy("query_id", "mmr_rank")
    }),

    // bitext-style pair mining (ratio margin): even vec_ids play the
    // "source" corpus, odd the "target"; each pair's cosine divides by
    // its two neighborhoods' mean density — a raw-cos threshold
    // over-selects hubs. kNN both directions via the INTEGER-EXACT brute
    // chain (quantize-first, no float similarity anywhere — the
    // cross-engine gate discipline); at scale marginPairsExact
    // post-processes the IVF/PQ/BQ serving layouts unchanged.
    // CALIBRATION BOUND (the q_mm_audio_fp discipline): brute both-
    // direction kNN is deliberately quadratic — the backend-blind truth
    // this gate calibrates the LSH/IVF/PQ/SQ8/BQ margin backends against
    // — so it runs on the DETERMINISTIC marginCalBound-id sub-corpus:
    // constant work at any corpus size, full semantics on the subset
    // (sf ≤ 0.01 is entirely under the bound, so those gates are
    // byte-identical to the unbounded form). The SCALE paths for this
    // family are q_emb_margin_lsh / _bq — corpus-wide, bucket/Hamming-
    // bounded, never quadratic.
    "q_emb_margin_pairs_i" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
        .where(col("vec_id") < lit(marginCalBound))
      val src = emb.where(pmod(col("vec_id"), lit(2)) === 0)
      val tgt = emb.where(pmod(col("vec_id"), lit(2)) === 1)
      def qside(d: org.apache.spark.sql.DataFrame) = d.select(
        col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val fwd = VectorOps.bruteTopKExact(tgt, qside(src), k = 4)
      val bwd = VectorOps.bruteTopKExact(src, qside(tgt), k = 4)
      VectorOps.marginPairsExact(fwd, bwd)
        .orderBy(col("margin_ppm").desc, col("src_id"), col("tgt_id"))
        .limit(20)
    }),

    // semantic-diversity sampling: IVF cells as semantic clusters, at
    // most 10 kept per cell by deterministic md5 pick — the "spread the
    // budget across clusters" selection (DiverseEvol/SemDeDup-adjacent)
    // with the bounded-TopK cap instead of a per-cell window sort
    "q_emb_cluster_cap" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val centroids = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid_vec"))
      graft.ops.Sampling.diversityCap(
          VectorOps.assignCells(emb, centroids), "cell", "vec_id", 10)
        .select(col("key").as("cell"), col("n_members"),
          col("id").as("vec_id"))
        .orderBy("cell", "vec_id")
    }),

    // the same margin mining on the IVF serving path — marginPairsExact
    // is kNN-backend-agnostic, and THIS is the composition that runs at
    // corpus scale: cell-probed candidate lists both directions, the
    // margin post-processing unchanged (nprobe=2 makes it a real
    // approximation, not a disguised brute force). Integer-exact chain
    // end to end: assignment, probing, and scoring all on exactCosX1m
    "q_emb_margin_ivf_i" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val centroids = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid_vec"))
      def qside(par: Int) = emb
        .where(pmod(col("vec_id"), lit(2)) === par)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      // r17 (guide §2.4): assign cells ONCE over the full corpus and
      // parity-filter per direction — per-vector assignment is
      // independent of the rest of the corpus (the ivfExactCells
      // scaladoc's own serve-path argument), so filtering the shared
      // assignment is bit-identical to assigning src/tgt separately,
      // and the corpus × centroids argmax aggregation runs once instead
      // of twice (the former per-direction ivfTopKExact built its own)
      val cen = VectorOps.ivfExactCentroids(centroids)
      val cells = VectorOps.ivfExactCells(emb, cen)
      val fwd = VectorOps.ivfTopKExactIndexed(
        cells.where(pmod(col("vec_id"), lit(2)) === 1), cen, qside(0),
        k = 4, nprobe = 2)
      val bwd = VectorOps.ivfTopKExactIndexed(
        cells.where(pmod(col("vec_id"), lit(2)) === 0), cen, qside(1),
        k = 4, nprobe = 2)
      VectorOps.marginPairsExact(fwd, bwd)
        .orderBy(col("margin_ppm").desc, col("src_id"), col("tgt_id"))
        .limit(20)
    }),

    // margin mining on the multi-probe LSH backend — the FOURTH kNN
    // backend under the identical margin tail (brute, IVF, PQ, LSH):
    // candidates come from each query's own + one-bit-flip sign buckets
    // only, so the pair work is bucket-bounded rather than quadratic;
    // same quantize-first integer chain end to end, oracle replays
    // sig/probe/cos/rank/margin CTE-for-CTE
    "q_emb_margin_lsh" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val src = emb.where(pmod(col("vec_id"), lit(2)) === 0)
      val tgt = emb.where(pmod(col("vec_id"), lit(2)) === 1)
      def qside(d: org.apache.spark.sql.DataFrame) = d.select(
        col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val fwd = VectorOps.multiProbeLshTopK(tgt, qside(src), k = 4,
        inDims = embDims, nPlanes = 8, probeHamming = 1)
      val bwd = VectorOps.multiProbeLshTopK(src, qside(tgt), k = 4,
        inDims = embDims, nPlanes = 8, probeHamming = 1)
      VectorOps.marginPairsExact(fwd, bwd)
        .orderBy(col("margin_ppm").desc, col("src_id"), col("tgt_id"))
        .limit(20)
    }),

    // multi-probe sign-LSH ANN: each query probes its own 8-bit sign
    // bucket PLUS the 8 one-bit-flip buckets (the buckets a neighbor
    // lands in when one plane sum crosses zero) — recall climbs toward
    // brute while candidates stay bucket-bounded, no extra tables. The
    // whole chain is quantize-first integer math (integer plane dots,
    // exactCosX1m, k-bounded TopKAgg), so the oracle replays bit-exact
    "q_emb_multiprobe" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val queries = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      VectorOps.multiProbeLshTopK(emb, queries, k = 5, inDims = embDims,
          nPlanes = 8, probeHamming = 1)
        .orderBy("query_id", "rank")
    }),

    // ANN quality as DATA: per-query recall@5 of single-probe vs
    // multi-probe LSH against the exact integer brute ranking — the
    // dashboard a serving team reads before turning a probe dial.
    // Everything integer (hits, ppm floor-div), bit-exact replay
    "q_emb_ann_recall" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val queries = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val exact = VectorOps.bruteTopKExact(emb, queries, k = 5)
      def eval(name: String, ph: Int) = VectorOps.recallAtK(exact,
          VectorOps.multiProbeLshTopK(emb, queries, k = 5,
            inDims = embDims, nPlanes = 8, probeHamming = ph))
        .withColumn("method", lit(name))
      eval("probe0", 0).unionAll(eval("probe1", 1))
        .select("method", "query_id", "k", "n_hit", "recall_ppm")
        .orderBy("method", "query_id")
    }),

    // what DIMENSION TRUNCATION costs in recall (the Matryoshka-serving
    // question: store 64 dims, serve a 16- or 32-dim prefix): recall@5
    // of the truncated-prefix exact search vs the full-width exact
    // ranking, same integer chain on sliced vectors — the fourth axis of
    // the serving trade (width) next to bytes, latency, quantization
    "q_emb_trunc_recall" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      def cut(d: Int) = emb.select(col("vec_id"),
        slice(col("embedding"), 1, d).as("embedding"))
      def qside(df: org.apache.spark.sql.DataFrame) =
        df.where(col("vec_id") < 8).select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val truth = VectorOps.bruteTopKExact(emb, qside(emb), k = 5)
      def eval(name: String, d: Int) = VectorOps.recallAtK(truth,
          VectorOps.bruteTopKExact(cut(d), qside(cut(d)), k = 5))
        .withColumn("method", lit(name))
      eval("d16", 16).unionAll(eval("d32", 32))
        .select("method", "query_id", "k", "n_hit", "recall_ppm")
        .orderBy("method", "query_id")
    }),

    // what compression costs in RECALL: per-query recall@5 of the SQ8
    // (4×, codes-cosine) and BQ (32×, Hamming-prefilter + exact rerank)
    // backends against the exact integer brute ranking — the third axis
    // of the serving trade next to bytes (SCALE.md) and latency (bench):
    // the number a team reads before picking a layout. Integer end to
    // end, every chain already gate-pinned individually
    "q_emb_quant_recall" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val queries = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val exact = VectorOps.bruteTopKExact(emb, queries, k = 5)
      val sq8 = graft.ops.ScalarQuant.sq8SearchCosExact(emb, "vec_id",
        "embedding", queries, "query_id", "query_vec", k = 5)
      val bq = graft.ops.ScalarQuant.bqSearchCosExactIndexed(
        graft.ops.ScalarQuant.bqEncode(emb, "vec_id", "embedding"), emb,
        "vec_id", "embedding", queries, "query_id", "query_vec", k = 5,
        rerank = 16)
      VectorOps.recallAtK(exact, sq8).withColumn("method", lit("sq8"))
        .unionAll(
          VectorOps.recallAtK(exact, bq).withColumn("method", lit("bq")))
        .select("method", "query_id", "k", "n_hit", "recall_ppm")
        .orderBy("method", "query_id")
    }),

    // ranked-retrieval metrics beyond recall: MRR, hits@k, and
    // binary-relevance DCG/nDCG with INTEGER LUT discounts (the log2
    // table is k precomputed literals shared by plan and oracle — no
    // float log in either engine) — multi-probe LSH scored against the
    // exact integer brute truth, per query
    "q_emb_rank_metrics" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val queries = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val exact = VectorOps.bruteTopKExact(emb, queries, k = 5)
      val lsh = VectorOps.multiProbeLshTopK(emb, queries, k = 5,
        inDims = embDims, nPlanes = 8, probeHamming = 1)
      VectorOps.rankMetrics(exact, lsh, k = 5)
        .orderBy("query_id")
    }),

    // JL sign projection + search IN THE REDUCED SPACE: embeddings cut to
    // 16 dims by the deterministic ±1 plane family (Achlioptas), float-
    // quantized (both engines round-to-nearest), then the standard brute
    // top-k runs on vectors 4x smaller — the pre-ANN reduction step of a
    // 100 TB embedding pipeline, end-to-end replayed by the oracle
    "q_emb_jl_knn" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val proj = VectorOps.jlProject(emb, "vec_id", "embedding", embDims, 16)
        .select(col("vec_id"), col("jl").cast("array<float>").as("embedding"))
      val queries = proj.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      VectorOps.bruteTopK(proj, queries, 5)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    }),

    // hard-negative mining: nearest neighbors UNDER a 0.95 rounded-cos
    // ceiling — close enough to be hard, excluded if near-duplicate
    // (those would be label noise in the contrastive batch)
    "q_emb_hard_negatives" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val queries = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      VectorOps.hardNegatives(emb, queries, k = 5, maxCos = 0.95)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    }),

    // pipeline-integrity audit: docs↔embeddings id coverage (every doc
    // should embed exactly once; orphans on either side are ingest
    // bugs). The synthetic tables align perfectly, so the gate offsets
    // the two sides (docs < 400, vecs ≥ 100) to exercise ALL three
    // statuses — the audit itself is the plain full-outer + status agg
    "q_emb_coverage" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
        .where(col("doc_id") < 400)
      val e = t(s, dir, "embeddings").select(col("vec_id"))
        .where(col("vec_id") >= 100)
      d.join(e, col("doc_id") === col("vec_id"), "full_outer")
        .select(when(col("doc_id").isNotNull && col("vec_id").isNotNull,
          "matched").when(col("vec_id").isNull, "doc_only")
          .otherwise("vec_only").as("status"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    }),

    // Matryoshka serving: rank by the 16-dim PREFIX of each embedding
    // (a 4× cheaper scan when embeddings are trained nested), then
    // rescore ONLY the k winners at full dimension — the dimension-
    // truncation serving pattern. slice() keeps element order and
    // float→double widening is exact, so prefix cosine is the same IEEE
    // fold in both engines; the full-dim rescore touches k·queries rows
    "q_emb_matryoshka" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val tr = emb.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      val q = tr.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val winners = VectorOps.bruteTopK(tr, q, 5)
        .withColumn("cos16", round(col("cos"), 6)).drop("cos")
      val qfull = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      emb.select(col("vec_id"), col("embedding"))
        .join(broadcast(winners), Seq("vec_id"))
        .join(broadcast(qfull), col("query_id") === col("qid"))
        .select(col("query_id"), col("rank"), col("vec_id"), col("cos16"),
          round(VectorOps.cosine(col("embedding"), col("qv")), 6)
            .as("cos_full"))
        .orderBy("query_id", "rank")
    }),

    // similarity search, scale path: IVF cell assignment histogram
    "q_emb_ivf_assign" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val centroids = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
      VectorOps.assignCells(emb, centroids)
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), round(avg(col("cell_cos")), 6).as("avg_cos"))
        .orderBy("cell")
    }),

    // similarity search: IVF top-5 probing 2 cells
    "q_emb_knn_ivf" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val centroids = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
      val queries = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      VectorOps.ivfTopK(emb, centroids, queries, k = 5, nprobe = 2)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    }),

    // similarity-ordered training curriculum (in-context pretraining,
    // Shi et al. 2023): greedy nearest-neighbor chain per IVF cell in
    // exact integer cosine space — adjacent training examples end up
    // semantically related within each shard. Gate runs on the vec_id
    // decimation so the DuckDB chain replay (a recursive CTE stepping
    // one argmax per cell per iteration) stays bounded at every SF;
    // the operator itself is cell-bounded by construction
    "q_doc_icp_order" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
        .where(pmod(col("vec_id"), lit(10)) === 0)
      val cen = VectorOps.ivfExactCentroids(
        emb.where(col("vec_id") < 80)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").as("centroid_vec")))
      VectorOps.icpOrder(VectorOps.ivfExactCells(emb, cen))
        .orderBy("cell", "pos")
    }),

    // fused signal export (the feature-store pass): every per-doc scalar
    // signal — tokens, length, punct/stopword ratios, quality, language,
    // fingerprint — in ONE projection over ONE scan; at 100 TB this is
    // the difference between one pass and six
    "q_doc_signals" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("len_chars"),
        round(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextOps.stopwordRatio(col("text"), TextOps.EnStopwords), 6)
          .as("stop_ratio"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.langId(col("text")).as("pred_lang"),
        TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // MLM sample prep: ~15% of tokens masked, positions decided by
    // md5(doc, position) — identical corruption on every run/engine
    // (seeded Random would not be); labels recoverable by re-running
    // the same predicate on the originals
    "q_doc_mask" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.maskedTokens(col("doc_id"), col("text"), 15).as("mt"))
        .select(col("doc_id"), array_join(col("mt"), " ").as("masked_text"),
          size(filter(col("mt"), x => x === "<mask>")).as("n_masked"))
        .orderBy("doc_id")),

    // bounded fuzzy match: exact Levenshtein distance computed ONLY on
    // the banded SimHash candidate pairs — the O(len²) DP never runs
    // all-pairs; candidates are k-bounded by the band join. Integer DP,
    // identical in both engines
    "q_doc_edit_distance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.simhashPairs(wide(s, docs), "doc_id", "text", 3)
        .select("doc_a", "doc_b")
      val a = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
      pairs.join(a, "doc_a").join(b, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("text_a"), col("text_b")).as("edit_dist"),
          (length(col("text_a")) + length(col("text_b"))).as("len_sum"))
        .orderBy("doc_a", "doc_b")
    }),

    // contrastive pair mining: positives = near-dup pairs (SimHash d≤3),
    // negatives = 2 deterministic content-hash draws per positive anchor,
    // de-duped and filtered against the positive set — the training-pair
    // prep for embedding fine-tuning, reproducible on any engine/run
    "q_doc_contrastive" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      val pos = Dedup.simhashPairs(docs, "doc_id", "text", 3)
        .select(col("doc_a").as("anchor_id"), col("doc_b").as("other_id"),
          lit(1).as("label"))
      val anchors = pos.select("anchor_id").distinct()
      val negs = graft.ops.Sampling
        .negativeSamples(t(s, dir, "documents"), "doc_id", 2)
        .select(col("anchor_id"), col("neg_id").as("other_id"))
        .join(anchors, Seq("anchor_id"), "left_semi")
        .join(pos.select("anchor_id", "other_id"),
          Seq("anchor_id", "other_id"), "left_anti")
        .distinct() // two slots can hash to the same negative
      pos.unionByName(negs.withColumn("label", lit(0)))
        .orderBy("anchor_id", "label", "other_id")
    }),

    // tokenizer coverage: per-lang OOV rate against the corpus's own
    // top-30 vocabulary (count-desc/term-asc deterministic selection) —
    // the pre-tokenizer slice check, in integer micro-units
    "q_doc_oov" -> ((s, dir) =>
      TextOps.oovRate(wide(s, t(s, dir, "documents")), "lang", "text", 30)
        .select(col("grp").as("lang"), col("n_tokens"), col("n_oov"),
          col("oov_ppm"))
        .orderBy("lang")),

    // hybrid retrieval (the RAG shape): lexical tf·idf top-25 recall →
    // dense cosine rerank of ONLY those candidates against vec 0's
    // embedding → top-10; candidates broadcast into the embeddings join
    "q_doc_hybrid_search" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.Search.hybridSearch(
        wide(s, t(s, dir, "documents")), emb, "doc_id", "text",
        Seq("spark", "vector", "stream"),
        emb.where(col("vec_id") === 0)
          .select(col("embedding").as("query_vec")),
        kLex = 25, kFinal = 10)
    }),

    // reciprocal-rank fusion (the rank-only alternative to the rerank
    // above): top-20 lexical + top-20 dense fused by Σ 1/(60+rank) in
    // micro-units — score scales never meet, only positions do
    "q_doc_rrf_search" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.Search.rrfSearch(
        wide(s, t(s, dir, "documents")), emb, "doc_id", "text",
        Seq("spark", "vector", "stream"),
        emb.where(col("vec_id") === 0)
          .select(col("embedding").as("query_vec")),
        kCand = 20, c = 60, kFinal = 10)
    }),

    // positional phrase query (screen + verify): residue 1 plants the
    // 3-token phrase once mid-doc, residue 3 twice at the head, residue
    // 2 plants all three WORDS scattered (non-adjacent) — the conjunctive
    // screen passes but the positional verify rejects, the assertion
    // separating a phrase query from matchAll; residues 0/4 untouched
    "q_doc_phrase_search" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int, n: Int) = array_join(slice(toks, from, n), " ")
      val m5 = pmod(col("doc_id"), lit(5))
      val synth = when(m5 === 1,
          concat(seg(1, 3), lit(" zephyr quill orchid "), seg(4, 3)))
        .when(m5 === 2,
          concat(lit("zephyr "), seg(1, 3), lit(" quill "), seg(4, 3),
            lit(" orchid")))
        .when(m5 === 3,
          concat(lit("zephyr quill orchid zephyr quill orchid "),
            seg(1, 3)))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synth.as("text"))
      graft.ops.Search.phraseSearch(wide(s, docs), "doc_id", "text",
          Seq("zephyr", "quill", "orchid"))
        .orderBy("doc_id")
    }),

    // FUZZY decontamination: the eval set is every 20th doc with its
    // LAST token dropped (high-Jaccard near-dup of its source — invisible
    // to the exact 13-gram scan's superset logic as a whole-doc match);
    // MinHash band keys cross-join eval→train, exact-Jaccard verify in
    // integer ppm. Oracle = brute-force shingle-join Jaccard (recall of
    // the 32x2 band screen at j >= 0.86 is 1 - ~4e-19 — identical sets)
    "q_doc_fuzzy_decontaminate" -> ((s, dir) => {
      val base = t(s, dir, "documents")
      val toks = split(trim(col("text")), "\\s+")
      val evalD = base.where(pmod(col("doc_id"), lit(20)) === 7)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(slice(toks, lit(1), greatest(size(toks) - 1, lit(1))),
            " ").as("text"))
      val sc = graft.ops.Dedup.crossNearDupScoped(wide(s, base), evalD,
        "doc_id", "text", k = 3, nHashes = 64, bands = 32,
        thresholdPpm = 800000L)
      val out = sc.df.orderBy("train_id", "eval_id").localCheckpoint()
      sc.release()
      out
    }),

    // winnowing (MOSS) fingerprint pairs: docs 10g+2 and 10g+5 share a
    // ~60-char group-unique marker (md5-hex content — every 8-gram
    // inside it is group-specific, so the df-cap cannot eat the planted
    // evidence); winnowing guarantees >= ceil(windows/w) distinct
    // selections inside the shared region regardless of its OFFSET in
    // either doc — the position-robustness the strided screens lack
    "q_doc_winnow_pairs" -> ((s, dir) => {
      val grp = expr("doc_id DIV 10").cast("string")
      val marker = concat(lit(" wm "),
        substring(md5(concat(lit("wm"), grp)), 1, 24), lit(" "),
        substring(md5(concat(lit("wm2"), grp)), 1, 24), lit(" "),
        substring(md5(concat(lit("wm3"), grp)), 1, 24))
      val m10 = pmod(col("doc_id"), lit(10))
      val synth = when(m10 === 2 || m10 === 5, concat(col("text"), marker))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synth.as("text"))
      val fps = graft.ops.Dedup.winnowFingerprints(wide(s, docs),
        "doc_id", "text", k = 8, w = 4)
      // the ~79-char marker spans 69 windows -> >= ceil(69/4) = 18
      // distinct selections shared by the pair, a GUARANTEE (not a hash
      // accident); 14 sits under it with margin. dfCap 8: the planted
      // group-unique fingerprints have df = 2, while the synthetic
      // corpus's 31-word vocabulary makes generic 8-gram fingerprints
      // viral — at cap 32 the pair join carried ~15M candidate rows of
      // pure same-vocabulary noise (measured ~5 s of the gate)
      graft.ops.Dedup.winnowPairs(fps, minShared = 14, dfCap = 8)
        .orderBy("doc_a", "doc_b")
    }),

    // content-defined chunking: docs 14g+2 and 14g+9 carry a variable-
    // length junk PREFIX (doc_id-dependent shift) plus a group-shared
    // ~130-char paragraph — CDC boundaries are content-determined, so
    // the chunks inside the shared region re-align bit-identically
    // despite the shifted offsets (a fixed-grid chunker would share 0)
    "q_doc_cdc_chunks" -> ((s, dir) => {
      val grp = expr("doc_id DIV 14").cast("string")
      val para = concat(lit(" cdc shared "),
        substring(md5(concat(lit("cdc"), grp)), 1, 28), lit(" "),
        substring(md5(concat(lit("cdc2"), grp)), 1, 28), lit(" "),
        substring(md5(concat(lit("cdc3"), grp)), 1, 28), lit(" "),
        substring(md5(concat(lit("cdc4"), grp)), 1, 28))
      val junk = repeat(lit("j"), (pmod(col("doc_id"), lit(19)) + 1)
        .cast("int"))
      val synth = when(pmod(col("doc_id"), lit(7)) === 2,
          concat(junk, lit(" "), col("text"), para))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synth.as("text"))
      val chunks = graft.ops.Dedup.contentChunks(wide(s, docs),
        "doc_id", "text", k = 8, mask = 63)
      graft.ops.Dedup.chunkDedupStats(chunks).orderBy("doc_id")
    }),

    // evaluation harness: recall@5 of the IVF searcher vs brute-force
    // ground truth, per query, in integer micro-units — the in-engine
    // quality dial for the nprobe trade (at nprobe=2 of 8 cells recall
    // is genuinely < 1, so the gate exercises real misses)
    "q_emb_recall_ivf" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val centroids = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid_vec"))
      val queries = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      VectorOps.recallAtK(
        VectorOps.bruteTopK(emb, queries, 5),
        VectorOps.ivfTopK(emb, centroids, queries, k = 5, nprobe = 2))
        .orderBy("query_id")
    }),

    // JL quality dial: distance-DISTORTION quantiles over a deterministic
    // pair sample — JL's guarantee is (1±ε) pairwise distances, not top-k
    // rank (on near-random synthetic vectors rank order is chaotic under
    // ANY projection; distances are what concentrate). ratio = scaled
    // ‖Δy‖²/‖Δx‖²: its p05/p50/p95 measure ε in-engine before a corpus
    // commits to an outDims
    "q_emb_jl_distortion" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val proj = VectorOps.jlProject(emb, "vec_id", "embedding", embDims, 16)
        .select(col("vec_id"), col("jl").cast("array<float>").as("pv"))
      val j = emb.select(col("vec_id"), col("embedding")).join(proj, "vec_id")
        .where(col("vec_id") < 25)
      def d2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) = {
        val diff = zip_with(x.cast("array<double>"), y.cast("array<double>"),
          (a, b) => a - b)
        VectorOps.dotHof(diff, diff)
      }
      val a = j.select(col("vec_id").as("va"), col("embedding").as("ea"),
        col("pv").as("pa"))
      val b = j.select(col("vec_id").as("vb"), col("embedding").as("eb"),
        col("pv").as("pb"))
      // bounded pair sample: broadcast nested-loop over the 25-row side
      // (the knn_brute shape), never an unhinted cartesian
      a.crossJoin(broadcast(b)).where(col("va") < col("vb"))
        .select(round(d2(col("pa"), col("pb")) /
          nullif(lit(16.0) * d2(col("ea"), col("eb")), lit(0.0)), 6)
          .as("ratio"))
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(ratio, 0.05)"), 6).as("p05"),
          round(expr("percentile(ratio, 0.5)"), 6).as("p50"),
          round(expr("percentile(ratio, 0.95)"), 6).as("p95"))
    }),

    // dedup: embedding-cosine near-dup pairs blocked by label.
    // Uncapped EXPLICITLY: the oracle replays the full in-block scan, so
    // the gate must not depend on whether a block crosses Dedup.DefaultCap
    // at some SF (at a 10x replica the label blocks do); the cap is the
    // production dial, exercised by OpsSpec's viral fixture
    "q_emb_neardup" -> ((s, dir) =>
      VectorOps.nearDupPairs(t(s, dir, "embeddings"), 0.4,
          blockCap = Dedup.Uncapped)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("vec_a", "vec_b")),

    // dedup: embedding near-dup pairs collapsed to connected components —
    // the clustering step that turns pairwise cosine hits into dedup
    // groups (keep one per cluster), composing the gated pair generator
    // with the gated union-find; min-id cluster labels
    "q_emb_dedup_clusters" -> ((s, dir) => {
      // SEQUENTIAL-ORACLE BOUND (seqOracleVecBound, see q_doc_pack's
      // note): the oracle's reachability recursion is edges x diameter —
      // super-linear in DuckDB past the sf0.1 pair count (sf1 timed out);
      // the engine's label propagation stays linear per round. sf<=0.1
      // (2000 vecs) sits entirely under the 2048 bound
      val pairs = VectorOps.nearDupPairs(t(s, dir, "embeddings")
            .where(col("vec_id") < lit(seqOracleVecBound)), 0.4,
          blockCap = Dedup.Uncapped) // oracle replays uncapped (see q_emb_neardup)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      Dedup.components(pairs, 20)
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
        .orderBy("vec_id")
    }),

    // embedding-space drift between two corpus halves: per-label centroid
    // movement in QUANTIZED units — per-dim micro-means via truncating
    // integer division (the k-means discipline: order-free, engine-exact),
    // squared diffs summed per label. The embedding counterpart of
    // q_doc_drift: re-embedding or distribution shift surfaces as
    // drift2_q >> 0 before a model ever trains on the snapshot
    "q_emb_drift" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      def half(m: Int) = VectorOps.labelCentroids(
          emb.where(pmod(col("vec_id"), lit(2)) === m), "label", "embedding")
        .select(col("label"), col("pos"),
          expr("sum_q DIV n").as(s"m$m"), col("n").as(s"n$m"))
      // squared diffs widen to decimal(38,0) BEFORE the per-row product
      // (the q_emb_dim_stats discipline): Long would wrap silently at
      // |m0-m1| > ~3e9 where DuckDB's HUGEINT raises. The final value is
      // re-narrowed to BIGINT to keep the gate schema — on true overflow
      // Spark nulls and DuckDB raises, both loud at the compare layer
      val dec = "decimal(38,0)"
      half(0).join(half(1), Seq("label", "pos"))
        .groupBy("label")
        .agg(first(col("n0")).as("n_a"), first(col("n1")).as("n_b"),
          count(lit(1)).as("dims"),
          sum((col("m0") - col("m1")).cast(dec)
            * (col("m0") - col("m1")).cast(dec))
            .cast("long").as("drift2_q"))
        .orderBy("label")
    }),

    // embedding-health audit: per-DIMENSION corpus stats in quantized
    // integers — dead dims (min == max), collapsed spread, off-center
    // means: the pre-index check that catches a broken encoder export.
    // spread_q = n·Σq² − (Σq)² — exact integer variance proxy, NO
    // division, order-free. q², Σq² and the n·Σq²−(Σq)² combination are
    // all carried in decimal(38,0) (the q_ts_trend idiom): for a
    // concentrated dim (q ~ 1e6) n·Σq² passes 2⁶³ at only ~1e4–1e5
    // vectors, where Long would wrap silently while DuckDB's HUGEINT
    // errors — decimal keeps both engines exact to ~1e14 vectors.
    // spread_q ships as exact-digit STRING: both engines print a scale-0
    // decimal as plain digits, sidestepping cross-engine DECIMAL
    // canonicalization in the comparison layer
    "q_emb_dim_stats" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      wide(s, t(s, dir, "embeddings"))
        .select(posexplode(
          graft.ops.KMeans.quantize(col("embedding"), 1e6).cast("array<long>"))
          .as(Seq("pos", "q")))
        .groupBy("pos")
        .agg(count(lit(1)).as("n"), sum("q").as("sum_q"),
          sum(col("q").cast(dec) * col("q").cast(dec)).as("ss_q"),
          min("q").as("min_q"), max("q").as("max_q"))
        .select(col("pos"), col("n"), expr("sum_q DIV n").as("mean_q"),
          (col("n").cast(dec) * col("ss_q").cast(dec)
            - col("sum_q").cast(dec) * col("sum_q").cast(dec))
            .cast(dec).cast("string").as("spread_q"),
          col("min_q"), col("max_q"),
          (col("min_q") === col("max_q")).as("dead"))
        .orderBy("pos")
    }),

    // SemDeDup (Abbas et al. 2023): near-dup pairs within LEARNED blocks
    // (nearest-centroid cells) — the semantic-dedup composition of the
    // IVF assignment and the capped in-block self-join; the oracle
    // replays the argmax assignment then the in-cell pair scan
    "q_emb_semdedup" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val centroids = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid_vec"))
      VectorOps.semanticDedupPairs(emb, centroids, 0.4,
          blockCap = Dedup.Uncapped) // oracle replays uncapped (see q_emb_neardup)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("vec_a", "vec_b")
    }),

    // JL × IVF composition: the full reduced-space serving shape — project
    // once, then centroid assignment, probe selection, and the cell scan
    // ALL run on 16-dim vectors (the pipeline the jlProject docs claim;
    // this gate pins that the composition actually plans and answers)
    "q_emb_jl_ivf" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val proj = VectorOps.jlProject(emb, "vec_id", "embedding", embDims, 16)
        .select(col("vec_id"), col("jl").cast("array<float>").as("embedding"),
          lit(null).cast("string").as("label"))
      val centroids = proj.where(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid_vec"))
      val queries = proj.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      VectorOps.ivfTopK(proj, centroids, queries, k = 5, nprobe = 2)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    }),

    // dedup, scale path: near-dup pairs blocked by an 8-bit random-
    // hyperplane sign bucket (no natural block key needed); the ±1 planes
    // are portable integer math, so DuckDB recomputes identical buckets
    "q_emb_lsh_neardup" -> ((s, dir) =>
      VectorOps.signLshNearDupPairs(wide(s, t(s, dir, "embeddings")), 0.4,
          inDims = embDims, blockCap = Dedup.Uncapped) // oracle replays uncapped
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("vec_a", "vec_b")),

    // threshold calibration: the cos distribution over the sign-LSH
    // CANDIDATE pairs (threshold open) — where to put the near-dup
    // cutoff is read off these quantiles, in-engine, instead of guessed.
    // Candidates are the screen's own bucket-bounded output; one 1-row
    // exact-percentile reduce on top
    "q_emb_cos_calibration" -> ((s, dir) => {
      val pairs = VectorOps.signLshNearDupPairs(
        wide(s, t(s, dir, "embeddings")), -1.0, inDims = embDims,
        blockCap = Dedup.Uncapped) // oracle replays uncapped
      pairs
        .select(round(col("cos"), 6).as("cos"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("percentile(cos, array(0.1,0.25,0.5,0.75,0.9))").as("qs"))
        .select(col("n_pairs"),
          round(col("qs")(0), 6).as("p10"),
          round(col("qs")(1), 6).as("p25"),
          round(col("qs")(2), 6).as("p50"),
          round(col("qs")(3), 6).as("p75"),
          round(col("qs")(4), 6).as("p90"))
    }),

    // vector analytics: per-label centroid stats in fixed-point integer
    // sums (order-free → bit-exact under any partitioning; the mean is one
    // double division of exact integers). Map-side partials bound the
    // shuffle at partitions × labels × dims rows.
    "q_emb_centroids" -> ((s, dir) =>
      VectorOps.labelCentroids(wide(s, t(s, dir, "embeddings")),
        "label", "embedding")
        .orderBy("label", "pos")),

    // embedding norm health per label: exact integer squared-norm stats
    // over micro-quantized vectors — catches un-normalized or collapsed
    // rows before they poison cosine math (the complement of the
    // per-DIM q_emb_dim_stats audit). One in-row fold + one labels-
    // sized partial aggregate
    "q_emb_norm_stats" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"),
          aggregate(graft.ops.KMeans.quantize(col("embedding"), 1e6),
            lit(0L), (a, x) => a + x * x).as("n2"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), min("n2").as("min_n2"),
          max("n2").as("max_n2"), sum("n2").as("sum_n2"))
        .orderBy("label")),

    // vector analytics: label-separation audit — per label, intra-cluster
    // tightness vs the nearest FOREIGN centroid (sep_ratio ≈ 1 means the
    // labels are not separable in this embedding). Exact integer
    // fixed-point throughout (see VectorOps.labelMargin); one broadcast
    // scoring pass, labels-sized output
    "q_emb_label_margin" -> ((s, dir) =>
      VectorOps.labelMargin(wide(s, t(s, dir, "embeddings")))
        .orderBy("lab")),

    // n-gram statistics: corpus-wide top-20 bigrams — explode feeds a
    // partially-aggregated count, the ranking is TakeOrderedAndProject
    // (k-bounded, never a global sort; same discipline as q_topk)
    "q_doc_bigrams" -> ((s, dir) =>
      wide(s, t(s, dir, "documents"))
        .select(explode(TextOps.wordBigrams(col("text"))).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)),

    // PII-style redaction: sequential regex scrub (entity words → [ENT],
    // runs collapsed → [ENTS]) with an audit hit count — pure codegen'd
    // column algebra, byte-identical across engines (portable regex subset)
    "q_doc_redact" -> ((s, dir) => {
      val norm = TextOps.normalize(col("text"))
      val entPat = "\\b(customer|supplier|part)\\b"
      val red = TextOps.scrub(norm,
        Seq(entPat -> "[ENT]", "\\[ENT\\]( \\[ENT\\])+" -> "[ENTS]"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.scrubHits(norm, entPat).as("n_hits"),
          length(red).as("redacted_len"),
          md5(red).as("redacted_fp"))
        .orderBy("doc_id")
    }),

    // context-window chunking: 32-token chunks with 8-token overlap
    // (stride 24) — the pre-training/RAG windowing step; fingerprints
    // instead of full chunk text keep the gate output compact while still
    // proving byte-exact chunk content
    "q_doc_chunk" -> ((s, dir) =>
      graft.ops.Curation.chunk(wide(s, t(s, dir, "documents")),
          "doc_id", "text", chunkSize = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_idx")),

    // compression point 3: int8 scalar quantization — symmetric integer-
    // dot search over 4×-compressed codes (exact long math rescaled by two
    // doubles in pinned order; TopKAgg ranking, never a window)
    "q_emb_sq8_search" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val queries = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      graft.ops.ScalarQuant.sq8SearchTopK(emb, "vec_id", "embedding",
          queries, "query_id", "query_vec", k = 5)
        .withColumn("score", round(col("score"), 6))
        .orderBy("query_id", "rank")
    }),

    // compression point 4: 1-bit binary quantization — Hamming prefilter
    // over 32×-compressed sign signatures (63 bits/word; bit 63 is
    // shift-overflow UB territory in ANSI engines), then exact-cosine
    // rerank of each query's 20-candidate pool; TopKAgg both stages,
    // never a window
    "q_emb_bq_search" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val queries = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      graft.ops.ScalarQuant.bqSearchTopK(emb, "vec_id", "embedding",
          queries, "query_id", "query_vec", k = 5, rerank = 20)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    }),

    // LM-filter analog: corpus-typicality score per doc (mean corpus
    // frequency of its bigrams, exact integer counts + one division —
    // count-space CCNet; ln() would not be bit-identical across engines)
    "q_doc_lm_score" -> ((s, dir) =>
      graft.ops.Curation.typicalityProfile(
        wide(s, t(s, dir, "documents")), "doc_id", "text")
        .orderBy("doc_id")),

    // Stupid Backoff LM (Brants et al.): bigram relfreq → α·unigram →
    // α²·uniform, α = 2/5 exact, all integer ppm — the web-scale count
    // LM. Reference slice doc_id%50=0 (~1/50 of the corpus) keeps every
    // backoff level exercised (measured: ~12k bigram hits, ~15k backoffs,
    // 26 OOV at sf0.01)
    "q_doc_backoff_lm" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.TextOps.backoffLmScore(wide(s, docs), "doc_id", "text",
          docs.where(pmod(col("doc_id"), lit(50)) === 0), "text")
        .orderBy("doc_id")
    }),

    // filter-bias audit: Pearson components between token count and the
    // quality score, as EXACT integer sums (the q_ts_autocorr idiom) —
    // if r ≈ 1 the "quality" filter is just a length filter (the known
    // trap in heuristic quality scoring). One scan, one 1-row reduce
    "q_doc_quality_len_corr" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(TextOps.tokenCount(col("text")).cast("long").as("x"),
          round(TextOps.qualityScore(col("text")) * 1000000, 0)
            .cast("long").as("y"))
        .agg(count(lit(1)).as("n"), sum("x").as("sum_x"),
          sum("y").as("sum_y"), sum(expr("x * y")).as("sum_xy"),
          sum(expr("x * x")).as("sum_x2"),
          sum(expr("y * y")).as("sum_y2"))),

    // CCNet-style perplexity bucketing: per-language head/middle/tail by
    // the corpus-LM typicality terciles — the canonical crawl-quality
    // partition (train on head, sample middle, drop tail). Typicality
    // carries lang through the bigram aggregate (no second corpus join);
    // the tercile cutoffs are a languages-sized broadcast back over the
    // scored frame; report is langs×3 rows
    "q_doc_ppl_buckets" -> ((s, dir) => {
      val d = wide(s, t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("text"))
      val bg = d.select(col("doc_id"), col("lang"),
        explode(TextOps.wordBigrams(col("text"))).as("bigram"))
      val counts = bg.groupBy("bigram").agg(count(lit(1)).as("bg_count"))
      val scored = bg.join(counts, "bigram")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_bigrams"), sum("bg_count").as("sum_count"))
        .withColumn("typicality",
          col("sum_count").cast("double") / col("n_bigrams"))
      val cuts = scored.groupBy("lang")
        .agg(expr("percentile(typicality, array(0.3333, 0.6667))").as("cs"))
      scored.join(broadcast(cuts), Seq("lang"))
        .withColumn("bucket",
          when(col("typicality") > col("cs")(1), "head")
            .when(col("typicality") > col("cs")(0), "middle")
            .otherwise("tail"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n"),
          round(min("typicality"), 6).as("min_typ"),
          round(max("typicality"), 6).as("max_typ"))
        .orderBy("lang", "bucket")
    }),

    // WARC record parsing — the container crawl corpora arrive in: each
    // doc becomes a two-record WARC/1.0 stream (request + response, real
    // grammar: header block, CRLFCRLF, exactly-Content-Length payload),
    // then the GENERIC parser splits records, reads headers, slices
    // payloads by length, and parses the HTTP response. The oracle
    // replays the PARSER (string_split/split_part/regexp/strpos), not
    // the construction — any offset bug on either side breaks the gate
    "q_doc_warc" -> ((s, dir) => {
      val crlf = "\r\n"
      val uri = concat(lit("https://example"),
        pmod(col("doc_id"), lit(5)).cast("string"),
        lit(".com/page/"), col("doc_id").cast("string"))
      val reqPl = concat(lit("GET /page/"), col("doc_id").cast("string"),
        lit(s" HTTP/1.1${crlf}Host: h${crlf}${crlf}"))
      val body = concat(lit("<html>"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " "),
        lit("</html>"))
      val respPl = concat(
        lit(s"HTTP/1.1 200 OK${crlf}Content-Type: text/html${crlf}${crlf}"),
        body)
      def rec(tp: String, pl: org.apache.spark.sql.Column) = concat(
        lit(s"WARC/1.0${crlf}WARC-Type: $tp${crlf}WARC-Target-URI: "),
        uri, lit(s"${crlf}Content-Length: "),
        octet_length(pl).cast("string"), lit(s"${crlf}${crlf}"), pl,
        lit(s"${crlf}${crlf}"))
      val parsed = t(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.Warc.records(
            concat(rec("request", reqPl), rec("response", respPl)))
            .as("recs"))
      parsed.select(col("doc_id"),
          size(col("recs")).as("n_records"),
          element_at(col("recs"), 1).getField("target_uri").as("uri"),
          element_at(col("recs"), 1).getField("rec_type").as("t1"),
          element_at(col("recs"), 2).getField("content_length")
            .as("resp_len"),
          graft.ops.Warc.httpResponse(
            element_at(col("recs"), 2).getField("payload")).as("h"))
        .select(col("doc_id"), col("n_records"), col("uri"), col("t1"),
          col("resp_len"), col("h.status").as("status"),
          col("h.content_type").as("content_type"),
          md5(col("h.body")).as("body_md5"),
          length(col("h.body")).as("body_len"))
        .orderBy("doc_id")
    }),

    // WARC → WET, as ONE pipeline: parse the WARC record, slice the HTTP
    // response body, strip its markup to clean text — the crawl-file-to-
    // training-text path every web corpus starts with, composed from the
    // same three operators the individual gates price (records ∘
    // httpResponse ∘ htmlStrip), all in-row, zero shuffle end to end
    "q_doc_warc_wet" -> ((s, dir) => {
      val crlf = "\r\n"
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int) = array_join(slice(toks, from, 4), " ")
      val body = concat(
        lit("<html><head><script>var a=1;</script></head><body><p>"),
        seg(1), lit(" &amp; "), seg(5), lit("</p><br>"), seg(9),
        lit("</body></html>"))
      val respPl = concat(
        lit(s"HTTP/1.1 200 OK${crlf}Content-Type: text/html${crlf}${crlf}"),
        body)
      val uri = concat(lit("https://example"),
        pmod(col("doc_id"), lit(5)).cast("string"),
        lit(".com/page/"), col("doc_id").cast("string"))
      val warc = concat(
        lit(s"WARC/1.0${crlf}WARC-Type: response${crlf}WARC-Target-URI: "),
        uri, lit(s"${crlf}Content-Length: "),
        octet_length(respPl).cast("string"), lit(s"${crlf}${crlf}"), respPl,
        lit(s"${crlf}${crlf}"))
      val parsed = wide(s, t(s, dir, "documents"))
        .select(col("doc_id"),
          graft.ops.Warc.httpResponse(
            element_at(graft.ops.Warc.records(warc), 1)
              .getField("payload")).getField("body").as("text"))
      graft.ops.Curation.htmlStrip(parsed, "doc_id", "text")
        .select(col("doc_id"), col("n_tags"), col("clean_len"),
          md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // crawl-frontier scheduling — the politeness COMPOSITION: per-host
    // robots.txt (5-row dim) parsed by the X249 grammar for graftbot,
    // longest-match verdict per URL via the host-keyed prefix join, then
    // the allowed frontier ranked top-5 per registered domain by priority
    // through the k-bounded TopKAgg. The '*' group disallows EVERYTHING —
    // graftbot is admitted only because its own group wins selection, so
    // a group-selection bug empties the frontier
    "q_doc_crawl_frontier" -> ((s, dir) => {
      val nl = "\n"
      val host = concat(lit("sub.example"),
        pmod(col("doc_id"), lit(5)).cast("string"), lit(".com"))
      val path = when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("/p/"), col("doc_id").cast("string")))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(lit("/tmp/"), col("doc_id").cast("string")))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(lit("/tmp/ok/"), col("doc_id").cast("string")))
        .otherwise(concat(lit("/private/"), col("doc_id").cast("string")))
      val urls = t(s, dir, "documents").select(col("doc_id"),
        host.as("host"), path.as("path"),
        (TextOps.tokenCount(col("text")).cast("long") * 1000 +
          pmod(col("doc_id"), lit(7))).as("priority"))
      val robotsTxt = concat(
        lit(s"User-agent: *${nl}Disallow: /$nl$nl" +
          s"User-agent: graftbot${nl}Disallow: /tmp$nl" +
          s"Allow: /tmp/ok$nl"),
        when(pmod(col("hn"), lit(2)) === 0, lit(s"Disallow: /p$nl"))
          .otherwise(lit("")))
      val rules = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(5)).as("hn")).distinct()
        .select(concat(lit("sub.example"), col("hn").cast("string"),
            lit(".com")).as("host"),
          explode(graft.ops.UrlOps.robotsRules(robotsTxt,
            "graftbot/1.0")).as("r"))
        .select(col("host"), col("r.prefix").as("prefix"),
          col("r.allow").as("allow"))
      val pref = urls.select(col("doc_id"), col("host"), explode(
        transform(sequence(lit(1), length(col("path"))),
          i => col("path").substr(lit(1), i))).as("prefix"))
      val verdict = pref
        .join(broadcast(rules), Seq("host", "prefix"))
        .groupBy("doc_id")
        .agg(max(struct(length(col("prefix")).as("l"),
          col("allow").as("a"))).as("b"))
      val allowed = urls.join(verdict, Seq("doc_id"), "left")
        .where(coalesce(col("b.a"), lit(true)))
        .select(graft.ops.UrlOps.registeredDomain(col("host"))
          .as("domain"), col("doc_id"), col("priority"))
      val top = graft.functions.TopKAgg.smallest_k_long(5)
      allowed.groupBy("domain")
        .agg(top(negate(col("priority")), col("doc_id")).as("t"))
        .select(col("domain"), posexplode(col("t")).as(Seq("pos", "e")))
        .select(col("domain"), (col("pos") + 1).cast("int").as("rank"),
          col("e.id").as("doc_id"), negate(col("e.key")).as("priority"))
        .orderBy("domain", "rank")
    }),

    // robots.txt GROUP parsing (RFC 9309): per-doc synthesized files with
    // a '*' group, a 'graftbot' group (dropped every 3rd doc), and a
    // two-UA 'graft'/'otherbot' group (dropped every 7th) — the parser
    // folds lines into groups, picks the most specific match for
    // graftbot/1.0 (longest prefixing token; '*' at priority 0), and
    // emits that group's rules in file order; empty Disallow = no rule
    "q_doc_robots" -> ((s, dir) => {
      val nl = "\n"
      val base = concat(
        lit(s"# synthetic${nl}User-agent: *${nl}Disallow: /private$nl" +
          "Allow: /ok-"),
        pmod(col("doc_id"), lit(10)).cast("string"), lit(nl))
      val g2 = when(pmod(col("doc_id"), lit(3)) =!= 0,
        concat(lit(s"${nl}User-agent: graftbot${nl}Disallow: /tmp/"),
          col("doc_id").cast("string"), lit(s"${nl}Crawl-delay: 5$nl")))
        .otherwise(lit(""))
      val g3 = when(pmod(col("doc_id"), lit(7)) =!= 0,
        lit(s"${nl}User-agent: graft${nl}User-agent: otherbot$nl" +
          s"Disallow: /deep${nl}Disallow:$nl")).otherwise(lit(""))
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.ops.UrlOps.robotsRules(
            concat(base, g2, g3), "graftbot/1.0")))
        .select(col("doc_id"), col("pos"),
          col("col.prefix").as("prefix"), col("col.allow").as("allow"))
        .orderBy("doc_id", "pos")
    }),

    // sitemap XML parsing — the third crawl-ingest grammar (WARC records,
    // robots path rules, sitemap entries): per-doc synthesized sitemaps
    // (one full entry, one with priority, one malformed loc-less entry)
    // parsed back by the in-row regex grammar; posexplode keeps entry
    // order; the oracle replays the PARSER over the same synthesis
    "q_doc_sitemap" -> ((s, dir) => {
      val host = concat(lit("example"),
        pmod(col("doc_id"), lit(5)).cast("string"), lit(".com"))
      val month = (pmod(col("doc_id"), lit(9)) + 1).cast("string")
      val xml = concat(
        lit("<?xml version=\"1.0\"?>\n<urlset>\n<url>\n  <loc> https://"),
        host, lit("/p/"), col("doc_id").cast("string"),
        lit(" </loc>\n  <lastmod>2024-0"), month,
        lit("-01</lastmod>\n</url>\n<url><loc>https://sub."), host,
        lit("/q/"), col("doc_id").cast("string"),
        lit("</loc><priority>0.8</priority></url>" +
          "<url><lastmod>2023-01-01</lastmod></url></urlset>"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.ops.UrlOps.sitemapEntries(xml)))
        .select(col("doc_id"), col("pos"),
          col("col.loc").as("loc"), col("col.lastmod").as("lastmod"),
          col("col.priority").as("priority"))
        .orderBy("doc_id", "pos")
    }),

    // multimodal: binary payload + batched decode-stub feature extraction
    // container-header sniffing (NOT a stub — real PNG IHDR byte offsets):
    // payloads assembled as valid PNG headers (every 7th doc a JPEG
    // signature instead), then width/height/depth/color parsed back from
    // the BYTES; the oracle replays assembly+parse in hex space
    "q_mm_headers" -> ((s, dir) => {
      val w = col("doc_id") % 640 + 1
      val h = col("doc_id") % 480 + 1
      val png = unhex(concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0806")))
      val pl = when(pmod(col("doc_id"), lit(7)) === 0,
        unhex(lit("FFD8FFE000104A464946"))).otherwise(png)
      t(s, dir, "documents")
        .select(col("doc_id"), graft.ops.Multimodal.pngHeader(pl).as("hdr"))
        .select(col("doc_id"), col("hdr.is_png").as("is_png"),
          col("hdr.width").as("width"), col("hdr.height").as("height"),
          col("hdr.bit_depth").as("bit_depth"),
          col("hdr.color_type").as("color_type"))
        .orderBy("doc_id")
    }),

    // TIFF/EXIF-IFD sniff — the one container whose integer byte order
    // flips PER FILE: payloads assembled as minimal 3-entry TIFFs,
    // little-endian for even docs, big-endian for odd, every 7th doc a
    // PNG signature; width (SHORT), height (LONG), orientation (SHORT)
    // parsed back from the BYTES through the endian-aware IFD walk; the
    // oracle replays the PARSER over the same hex
    "q_mm_tiff" -> ((s, dir) => {
      import org.apache.spark.sql.Column
      val w = pmod(col("doc_id"), lit(640)) + 1
      val h = pmod(col("doc_id"), lit(480)) + 1
      val o = pmod(col("doc_id"), lit(8)) + 1
      def be16(c: Column) = lpad(hex(c), 4, "0")
      def be32(c: Column) = lpad(hex(c), 8, "0")
      def sw2(x: Column) = concat(substring(x, 3, 2), substring(x, 1, 2))
      def sw4(x: Column) = concat(substring(x, 7, 2), substring(x, 5, 2),
        substring(x, 3, 2), substring(x, 1, 2))
      val leHex = concat(lit("49492A00" + "08000000" + "0300"),
        lit("0001" + "0300" + "01000000"), sw2(be16(w)), lit("0000"),
        lit("0101" + "0400" + "01000000"), sw4(be32(h)),
        lit("1201" + "0300" + "01000000"), sw2(be16(o)), lit("0000"),
        lit("00000000"))
      val beHex = concat(lit("4D4D002A000000080003"),
        lit("0100000300000001"), be16(w), lit("0000"),
        lit("0101000400000001"), be32(h),
        lit("0112000300000001"), be16(o), lit("0000"),
        lit("00000000"))
      val pl = when(pmod(col("doc_id"), lit(7)) === 0,
        unhex(lit("89504E470D0A1A0A")))
        .otherwise(unhex(when(pmod(col("doc_id"), lit(2)) === 0, leHex)
          .otherwise(beHex)))
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.Multimodal.tiffHeader(pl, maxEntries = 8).as("hdr"))
        .select(col("doc_id"), col("hdr.is_tiff").as("is_tiff"),
          col("hdr.little_endian").as("little_endian"),
          col("hdr.n_entries").as("n_entries"),
          col("hdr.width").as("width"), col("hdr.height").as("height"),
          col("hdr.orientation").as("orientation"))
        .orderBy("doc_id")
    }),

    // WAV/RIFF sniff (little-endian fields): payloads assembled as
    // canonical 36-byte PCM headers (every 5th doc gets a PNG magic
    // instead), parsed back from the BYTES. The oracle states the expected
    // OUTPUT directly — assembly∘parse must be the identity, so any
    // offset or endianness bug on either side breaks the gate
    "q_mm_wav" -> ((s, dir) => {
      def le32(v: org.apache.spark.sql.Column) = {
        val be = lpad(hex(v), 8, "0")
        concat(substring(be, 7, 2), substring(be, 5, 2),
          substring(be, 3, 2), substring(be, 1, 2))
      }
      def le16(v: org.apache.spark.sql.Column) = {
        val be = lpad(hex(v), 4, "0")
        concat(substring(be, 3, 2), substring(be, 1, 2))
      }
      val ch = col("doc_id") % 2 + 1
      val rate = element_at(
        array(lit(8000L), lit(16000L), lit(22050L), lit(44100L)),
        (col("doc_id") % 4 + 1).cast("int"))
      val wav = unhex(concat(
        lit("52494646"), le32(lit(36L)), lit("57415645"), lit("666D7420"),
        le32(lit(16L)), le16(lit(1L)), le16(ch), le32(rate),
        le32(rate * ch * 2), le16(ch * 2), le16(lit(16L))))
      val pl = when(pmod(col("doc_id"), lit(5)) === 0,
        unhex(lit("89504E470D0A1A0A"))).otherwise(wav)
      t(s, dir, "documents")
        .select(col("doc_id"), graft.ops.Multimodal.wavHeader(pl).as("h"))
        .select(col("doc_id"), col("h.is_wav").as("is_wav"),
          col("h.audio_format").as("audio_format"),
          col("h.channels").as("channels"),
          col("h.sample_rate").as("sample_rate"),
          col("h.bits_per_sample").as("bits_per_sample"))
        .orderBy("doc_id")
    }),

    // JPEG SOF sniff — the VARIABLE-offset walk: payloads assembled as
    // marker chains whose APP0 length varies by doc_id (and every third
    // doc carries an extra COM segment), so SOF sits at a different byte
    // offset per residue class; baseline C0 vs progressive C2 alternate.
    // Every 7th-residue-3 doc gets a PNG magic (is_jpeg=false). The
    // oracle states the expected OUTPUT in closed form from the
    // generator — assembly∘walk must be the identity, so an offset,
    // length-arithmetic, or marker bug on either side breaks the gate
    "q_mm_jpeg" -> ((s, dir) => {
      def be16(v: org.apache.spark.sql.Column) = lpad(hex(v), 4, "0")
      val zeros = lit("0" * 64)
      val h = col("doc_id") % 50 + 100
      val w = col("doc_id") % 40 + 80
      val app0Len = pmod(col("doc_id"), lit(4)) + 16
      val app0 = concat(lit("FFE0"), be16(app0Len),
        zeros.substr(lit(1), (app0Len - 2) * 2))
      val comLen = lit(5) + pmod(col("doc_id"), lit(2))
      val com = when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit("FFFE"), be16(comLen),
          zeros.substr(lit(1), (comLen - 2) * 2))).otherwise(lit(""))
      val sofM = when(pmod(col("doc_id"), lit(2)) === 0, lit("FFC0"))
        .otherwise(lit("FFC2"))
      val sof = concat(sofM, lit("000B"), lit("08"), be16(h), be16(w),
        lit("01"), lit("110011"))
      val jpeg = concat(lit("FFD8"), app0, com, sof, lit("FFDA"))
      val pl = when(pmod(col("doc_id"), lit(7)) === 3,
        unhex(lit("89504E470D0A1A0A"))).otherwise(unhex(jpeg))
      t(s, dir, "documents")
        .select(col("doc_id"), graft.ops.Multimodal.jpegHeader(pl).as("j"))
        .select(col("doc_id"), col("j.is_jpeg").as("is_jpeg"),
          col("j.sof_marker").as("sof_marker"),
          col("j.height").as("height"), col("j.width").as("width"),
          col("j.precision").as("precision"),
          col("j.n_components").as("n_components"))
        .orderBy("doc_id")
    }),

    // GIF sniff — the remaining fixed-offset family member: LE logical
    // screen, version split 87a/89a, packed color-table flag with the
    // 2^(n+1) size decode; every 7th-residue-3 doc gets a PNG magic.
    // The oracle states the output closed-form from the residues
    "q_mm_gif" -> ((s, dir) => {
      def le16(v: org.apache.spark.sql.Column) = {
        val be = lpad(hex(v), 4, "0")
        concat(substring(be, 3, 2), substring(be, 1, 2))
      }
      val w = col("doc_id") % 300 + 10
      val h = col("doc_id") % 200 + 10
      val ver = when(pmod(col("doc_id"), lit(2)) === 0,
        lit("474946383961")).otherwise(lit("474946383761"))
      val packed = when(pmod(col("doc_id"), lit(3)) === 0,
          lit(128) + pmod(col("doc_id"), lit(8)))
        .otherwise(pmod(col("doc_id"), lit(64)))
      val gif = concat(ver, le16(w), le16(h), lpad(hex(packed), 2, "0"),
        lit("0000"))
      val pl = when(pmod(col("doc_id"), lit(7)) === 3,
          unhex(lit("89504E470D0A1A0A"))).otherwise(unhex(gif))
      t(s, dir, "documents")
        .select(col("doc_id"), pl.as("pl"))
        .select(col("doc_id"),
          graft.ops.Multimodal.gifHeader(col("pl")).as("g"))
        .select(col("doc_id"), col("g.is_gif").as("is_gif"),
          col("g.version").as("version"), col("g.width").as("width"),
          col("g.height").as("height"),
          col("g.has_color_table").as("has_color_table"),
          col("g.table_colors").as("table_colors"))
        .orderBy("doc_id")
    }),

    // WEBP sniff — the THREE-GRAMMAR RIFF case completing the crawl
    // container matrix (PNG/JPEG/GIF/TIFF/WAV/MP4 + WEBP): the fourcc
    // at a fixed offset selects lossy VP8 (sync-code gate + u14 dims),
    // lossless VP8L (one packed LE u32: w-1 | h-1<<14 | alpha<<28), or
    // extended VP8X (flags byte + u24 canvas dims). Residues assemble
    // all three per doc; every 7th-residue-3 doc gets a PNG magic
    // (is_webp=false) and every VP8-class 11th-residue-5 doc a corrupt
    // sync code (is_webp=true, null fields — fail-closed, not misparse).
    // The oracle replays the generator closed-form: assembly∘parse must
    // be the identity, so any endianness/offset/bit-packing bug on
    // either side breaks the gate
    "q_mm_webp" -> ((s, dir) => {
      def leN(v: org.apache.spark.sql.Column, bytes: Int) = {
        val be = lpad(hex(v), bytes * 2, "0")
        concat((bytes to 1 by -1).map(i => substring(be, i * 2 - 1, 2)): _*)
      }
      val id = col("doc_id")
      // VP8 (lossy): frame tag + sync + LE u16 dims (u14 payload)
      val w8 = id % 500 + 16
      val h8 = id % 300 + 16
      val sync = when(pmod(id, lit(11)) === 5, lit("9D0100"))
        .otherwise(lit("9D012A"))
      val vp8 = concat(lit("000000"), sync, leN(w8, 2), leN(h8, 2))
      // VP8L (lossless): 0x2F + one packed LE u32
      val wl = id % 400 + 1
      val hl = id % 250 + 1
      val alphaL = when(pmod(id, lit(2)) === 0, 1L).otherwise(0L)
      val lBits = (wl - 1) + (hl - 1) * 16384L + alphaL * 268435456L
      val vp8l = concat(lit("2F"), leN(lBits, 4))
      // VP8X (extended): flags + reserved + LE u24 canvas dims
      val wx = id % 1000 + 1
      val hx = id % 600 + 1
      val flags = when(pmod(id, lit(2)) === 0, 16).otherwise(0) +
        when(pmod(id, lit(5)) === 0, 2).otherwise(0)
      val vp8x = concat(lpad(hex(flags), 2, "0"), lit("000000"),
        leN(wx - 1, 3), leN(hx - 1, 3))
      val cls = pmod(id, lit(3))
      val fourcc = when(cls === 0, "56503820") // "VP8 "
        .when(cls === 1, lit("5650384C")) // "VP8L"
        .otherwise(lit("56503858")) // "VP8X"
      val chunk = when(cls === 0, vp8).when(cls === 1, vp8l).otherwise(vp8x)
      // closed-form chunk byte counts (VP8 10, VP8L 5, VP8X 10) — a
      // length(chunk) form would re-inline the whole generator tree into
      // both size fields (the Column-val re-inlining trap)
      val chunkSize = when(cls === 1, 5L).otherwise(10L)
      val webp = concat(lit("52494646"), leN(chunkSize + 12L, 4),
        lit("57454250"), fourcc, leN(chunkSize, 4), chunk)
      val pl = when(pmod(id, lit(7)) === 3,
        unhex(lit("89504E470D0A1A0A"))).otherwise(unhex(webp))
      t(s, dir, "documents")
        .select(col("doc_id"), graft.ops.Multimodal.webpHeader(pl).as("w"))
        .select(col("doc_id"), col("w.is_webp").as("is_webp"),
          col("w.format").as("format"), col("w.width").as("width"),
          col("w.height").as("height"),
          col("w.has_alpha").as("has_alpha"),
          col("w.is_animated").as("is_animated"))
        .orderBy("doc_id")
    }),

    // MP4/ISO-BMFF sniff — the NESTED-box case next to q_mm_jpeg's flat
    // chain: payloads assemble ftyp + a variable-length free box (+ every
    // third doc a skip box) + moov[mvhd], so the moov offset varies per
    // residue; every 7th-residue-3 doc gets a PNG magic (is_mp4 false)
    // and every 5th-residue-4 a box declaring a size past the payload end
    // (walk breaks → ok false, null movie fields). The oracle states the
    // expected OUTPUT closed-form from the generator — assembly ∘ walk
    // must be the identity on sizes, offsets, and mvhd field positions
    "q_mm_mp4" -> ((s, dir) => {
      def be32(v: org.apache.spark.sql.Column) = lpad(hex(v), 8, "0")
      val zeros = lit("0" * 240)
      val ts = (pmod(col("doc_id"), lit(3)) + 1) * 1000
      val dur = col("doc_id") % 5000 + 600
      val freeLen = pmod(col("doc_id"), lit(4)) * 4 + 8
      val ftyp = lit("00000010" + "66747970" + "69736F6D" + "00000200")
      val free = concat(be32(freeLen), lit("66726565"),
        zeros.substr(lit(1), (freeLen - 8) * 2))
      val skip = when(pmod(col("doc_id"), lit(3)) === 0,
        lit("0000000C" + "736B6970" + "00000000")).otherwise(lit(""))
      val mvhd = concat(be32(lit(108)), lit("6D766864"), lit("00000000"),
        be32(lit(0)), be32(lit(0)), be32(ts), be32(dur),
        zeros.substr(lit(1), lit(160)))
      val moov = concat(be32(lit(116)), lit("6D6F6F76"), mvhd)
      val good = concat(ftyp, free, skip, moov)
      val pl = when(pmod(col("doc_id"), lit(7)) === 3,
          unhex(lit("89504E470D0A1A0A")))
        .when(pmod(col("doc_id"), lit(5)) === 4,
          unhex(concat(ftyp, be32(lit(4096)), lit("66726565"))))
        .otherwise(unhex(good))
      // materialize the payload into a COLUMN first: the box walk
      // references hex(payload) ~8x per fold step, and an inline payload
      // EXPRESSION would be re-synthesized on every reference (measured
      // 7.9 s steady inline vs 1.2 s with the split at sf0.1 — Catalyst
      // keeps the boundary because the payload is non-cheap and multiply
      // referenced, so CollapseProject does not re-inline it)
      t(s, dir, "documents")
        .select(col("doc_id"), pl.as("pl"))
        .select(col("doc_id"),
          graft.ops.Multimodal.mp4Header(col("pl")).as("h"))
        .select(col("doc_id"), col("h.is_mp4").as("is_mp4"),
          col("h.brand").as("brand"), col("h.n_boxes").as("n_boxes"),
          col("h.ok").as("ok"), col("h.timescale").as("timescale"),
          col("h.duration").as("duration"),
          col("h.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    }),

    "q_mm_decode" -> ((s, dir) =>
      Multimodal.featurePipeline(s, wide(s, t(s, dir, "documents")))
        .withColumn("mean_channel", round(col("mean_channel"), 6))
        .orderBy("media_id")),

    // multimodal: deterministic resize (downsample + channel-mean recompute
    // in the stub codec model; integer sampling math mirrored by the oracle)
    "q_mm_resize" -> ((s, dir) =>
      Multimodal.resizeStub(wide(s, t(s, dir, "documents")), "doc_id", "text",
          64, 64)
        .orderBy("media_id")),

    // multimodal: deterministic frame sampling (binary slices as text)
    "q_mm_frames" -> ((s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"),
        "doc_id", "text", "source")
      Multimodal.sampleFrames(media, n = 4, frameBytes = 16)
        .select(col("media_id"), col("frame_idx"),
          decode(col("frame"), "UTF-8").as("frame_str"))
        .orderBy("media_id", "frame_idx")
    }),

    // multimodal: REAL MP4 frame index — the container-level sample-table
    // walk (stsz/stsc/stco inside moov/trak/mdia/minf/stbl) that yields
    // every frame's exact byte extent WITHOUT a pixel codec, closing the
    // "frame sampling is pseudo" gap: each doc becomes a structurally
    // valid MP4 (ftyp + full moov tree + mdat) whose sample layout varies
    // per doc (2-6 frames, 4-10 bytes each, 1-3 samples per chunk), the
    // GENERIC parser walks the tree, and the gate slices the indexed
    // frames out of mdat and returns their decoded bytes — proving the
    // offsets are real, not derived from the fixture parameters. Two
    // planted failure modes (non-MP4 payload; stsz version=1) pin the
    // fail-closed contract. Oracle = closed-form layout from the
    // generator params (the q_mm_mp4 discipline): frame i's offset is
    // mdat_data_start + sum of prior sizes — any walk bug on either side
    // (box descent, stsc run lookup, chunk advance) breaks the match
    "q_mm_frame_index" -> ((s, dir) =>
      // typed seam (mp4ParseIndex at mapPartitions): the Column walk is
      // higher-order-function algebra, which Spark evaluates INTERPRETED
      // (CodegenFallback) at ~0.9 ms/doc — the round-13 sweep's heaviest
      // non-margin rows. The seam runs the same walk imperatively, and
      // its opaque plan node also stops downstream explode/projections
      // from re-inlining the fixture assembly + walk (the re-inlining the
      // previous localCheckpoint barrier existed to prevent)
      graft.ops.Multimodal.mp4SampleIndexed(
          mp4Fixture(t(s, dir, "documents"), "f", col("doc_id")), "pl")
        .select(col("doc_id"), col("ix.ok").as("ok"),
          col("ix.n_samples").as("n_samples"),
          col("ix.n_chunks").as("n_chunks"),
          explode_outer(col("ix.samples")).as("smp"), col("pl"))
        .select(col("doc_id"), col("ok"), col("n_samples"),
          col("n_chunks"),
          col("smp.idx").cast("long").as("frame_idx"),
          col("smp.off").as("off"), col("smp.sz").as("sz"),
          decode(col("pl").substr(col("smp.off").cast("int") + 1,
            col("smp.sz").cast("int")), "UTF-8").as("frame_str"))
        .orderBy("doc_id", "frame_idx")),

    // cross-video FRAME-LEVEL dedup over the real container index — the
    // composition the frame index exists for: every doc_id%50 class
    // shares identical frame CONTENT (and sizes), but per-doc chunking
    // (spc = doc_id%3+1) places those bytes at different offsets in
    // different containers — so only a correct stsz/stsc/stco walk can
    // line the copies up; frames md5-fingerprint and group exactly (the
    // exactGroups discipline at frame granularity, the storage/near-dup
    // pre-pass a video corpus runs before any expensive pixel work)
    "q_mm_frame_dedup" -> ((s, dir) =>
      // typed seam: assemble + walk once per doc (see q_mm_frame_index)
      graft.ops.Multimodal.mp4SampleIndexed(
          mp4Fixture(t(s, dir, "documents"), "g",
            pmod(col("doc_id"), lit(50))), "pl")
        .select(col("doc_id"),
          explode(col("ix.samples")).as("smp"), col("pl"))
        .select(col("doc_id"),
          md5(col("pl").substr(col("smp.off").cast("int") + 1,
            col("smp.sz").cast("int"))).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("keep_doc"))
        .orderBy("fp")),

    // multimodal: REAL PNG decode (javax.imageio — the JDK's own codec, no
    // stub): payloads are known-pixel PNGs encoded on the driver with the
    // SAME lossless codec (8 distinct gradient grids; every doc_id%10 in
    // {8,9} gets a truncated-JPEG / plain-text payload to prove the
    // quarantine path), decoded back distributed; the oracle states the
    // expected dims + exact per-channel pixel sums in closed form from the
    // generator — decode∘encode must be the identity
    "q_mm_decode_png" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("image").as("modality"),
          mmPngJunkPayload.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.decodeImages(media).toDF().orderBy("media_id")
    }),

    // multimodal: ViT-style patch features after a REAL decode — 2×2
    // cells over the known-pixel PNG grids (edge cells genuinely
    // partial at the odd widths/heights), exact integer channel sums
    // per cell; junk payloads (residues 8/9) emit no patch rows. The
    // oracle states every (residue, cell) row closed-form from the
    // generator — decode ∘ tile must be the identity
    "q_mm_patches" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("image").as("modality"),
          mmPngJunkPayload.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.imagePatches(media, patch = 2).toDF()
        .orderBy("media_id", "py", "px")
    }),

    // multimodal: REAL resize on the decode path — nearest-neighbor
    // downsample to 4×3 after an ImageIO decode (integer source mapping,
    // so the resized channel sums are closed-form stateable); junk
    // payloads keep exercising the quarantine path
    "q_mm_resize_nn" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("image").as("modality"),
          mmPngJunkPayload.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.resizeImages(media, 4, 3).toDF().orderBy("media_id")
    }),

    // multimodal: VISUAL exact dedup across container formats — even docs
    // carry PNG bytes, odd docs carry BMP bytes of the SAME pixel grid;
    // byte-level fingerprints (md5 of payload) would see 16 distinct
    // blobs, the pixel fingerprint sees 8 groups each spanning both
    // formats. The re-encode dedup case every image crawl hits
    "q_mm_visual_dedup" -> ((s, dir) => {
      import s.implicits._
      val pngs = (0 until 8).map { k =>
        val (w, h) = mmPngDims(k)
        lit(Multimodal.makePng(w, h, mmPngPixel(k)))
      }
      val bmps = (0 until 8).map { k =>
        val (w, h) = mmPngDims(k)
        lit(Multimodal.makeBmp(w, h, mmPngPixel(k)))
      }
      // pattern index from doc_id DIV 2 (not doc_id % 8): with %8 every
      // pixel group had a single parity — all-PNG or all-BMP — and
      // n_formats was identically 1, making the cross-format headline
      // vacuous. DIV 2 pairs consecutive docs (2m PNG, 2m+1 BMP) onto the
      // same grid, so n_formats = 2 is a REAL cross-container assertion
      val idx = pmod(expr("doc_id DIV 2"), lit(8)).cast("int") + 1
      val payload = when(pmod(col("doc_id"), lit(2)) === 0,
        element_at(array(pngs: _*), idx))
        .otherwise(element_at(array(bmps: _*), idx))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("image").as("modality"),
          payload.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.decodeImages(media).toDF()
        .groupBy("px_fp")
        .agg(count(lit(1)).as("n"), min("media_id").as("min_id"),
          countDistinct(pmod(col("media_id"), lit(2))).as("n_formats"))
        .orderBy("px_fp")
    }),

    // multimodal: PERCEPTUAL near-dup (aHash/dHash 8×8 integer average
    // pool) — even docs carry a 16×16 PNG, odd docs a 32×32 BMP that is a
    // 2× nearest-neighbor RE-ENCODE+RESIZE of the same pattern: different
    // bytes, different dims, different px_fp (the r6 visual fingerprint is
    // blind here), SAME perceptual hash. Pairs via the 4×16-bit band join
    // (pigeonhole-complete at hamming <= 3), aggregated per pattern group
    "q_mm_perceptual_dedup" -> ((s, dir) => {
      import s.implicits._
      val pngs = (0 until 8).map { k =>
        lit(Multimodal.makePng(16, 16, mmPerceptualPixel(k)))
      }
      val bmps = (0 until 8).map { k =>
        lit(Multimodal.makeBmp(32, 32,
          (x, y) => mmPerceptualPixel(k)(x / 2, y / 2)))
      }
      // pattern from doc_id DIV 2 (see q_mm_visual_dedup): (doc_id%8)%2 ==
      // doc_id%2 made every group single-format and n_cross_format
      // identically zero — the PNG-vs-BMP pairing claim passed vacuously.
      // Now group k holds evens (16×16 PNG) and odds (32×32 BMP re-encode)
      val idx = pmod(expr("doc_id DIV 2"), lit(8)).cast("int") + 1
      val payload = when(pmod(col("doc_id"), lit(2)) === 0,
        element_at(array(pngs: _*), idx))
        .otherwise(element_at(array(bmps: _*), idx))
      // deterministic id panel just above the sf0.1 table size (the
      // margin-gate discipline): every sf ≤ 0.1 result is unchanged, and
      // the per-group pair count is CONSTANT at sf1+ — without it the
      // groups grow past the viral-bucket DefaultCap and the capped band
      // join correctly drops them whole (0 pairs at sf1, surfaced by the
      // sf1 sweep), while an Uncapped escape would grow O(n²) pairs
      val media = t(s, dir, "documents").where(col("doc_id") < 5120)
        .select(col("doc_id").as("media_id"), lit("image").as("modality"),
          payload.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      val ph = Multimodal.perceptualHash(media).toDF()
      val pairs = Multimodal.perceptualPairs(ph, 3)
        .withColumn("grp", pmod(expr("media_a DIV 2"), lit(8)).cast("int"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(pmod(col("media_a"), lit(2)) =!= pmod(col("media_b"),
            lit(2)), 1L).otherwise(0L)).as("n_cross_format"),
          max("hamming").as("max_hamming"),
          sum(when(col("dhash_match"), 1L).otherwise(0L))
            .as("n_dhash_match"))
      val hashes = ph
        .withColumn("grp", pmod(expr("media_id DIV 2"), lit(8)).cast("int"))
        .groupBy("grp")
        .agg(countDistinct(col("ahash")).as("n_hashes"),
          lpad(hex(min(col("ahash"))), 16, "0").as("ahash_hex"),
          lpad(hex(min(col("dhash"))), 16, "0").as("dhash_hex"))
      pairs.join(hashes, Seq("grp")).orderBy("grp")
    }),

    // multimodal: MMC4-style image→text interleaving — two REAL-decoded
    // images per doc (perceptual pattern family) placed at their
    // Hamming-closest 5-token sentence chunk (greedy argmin, ties to the
    // earliest sentence); sentence signatures are the portable 52-bit md5
    // prefix, image signatures the decoded aHash, so the oracle states
    // the hashes from the generator and replays the assignment exactly
    "q_mm_interleave" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val pngs = (0 until 8).map(k =>
        lit(Multimodal.makePng(16, 16, mmPerceptualPixel(k))))
      def side(slot: Int, kIdx: org.apache.spark.sql.Column) = d.select(
        (col("doc_id") * 2 + slot).as("media_id"),
        lit("image").as("modality"),
        element_at(array(pngs: _*), kIdx.cast("int") + 1).as("payload"),
        lit("synth").as("source"))
      val media = side(0, pmod(col("doc_id"), lit(8)))
        .unionByName(side(1, pmod(expr("doc_id DIV 8"), lit(8))))
        .as[Multimodal.MediaRecord]
      val imgs = Multimodal.perceptualHash(media).toDF()
        .where(col("decoded"))
        .select(expr("media_id DIV 2").as("doc_id"),
          pmod(col("media_id"), lit(2L)).as("img_slot"), col("ahash"))
      val words = split(trim(col("text")), "\\s+")
      val nch = call_function("div",
        (size(words) + lit(4)).cast("long"), lit(5L))
      val sents = d
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0L), nch - 1), g =>
            array_join(slice(words, (g * 5 + 1).cast("int"), lit(5)), " ")))
            .as(Seq("sent_idx", "sentence")))
        .select(col("doc_id"), col("sent_idx"),
          graft.ops.Kmv.hash52(col("sentence")).as("sent_sig"))
      Multimodal.interleaveAssign(imgs, "doc_id", "img_slot", "ahash",
          sents, "sent_idx", "sent_sig")
        .orderBy("doc_id", "img_slot")
    }),

    // multimodal: REAL WAV PCM decode (javax.sound.sampled): canonical
    // 52-byte mono 16-bit files assembled IN-QUERY (header as q_mm_wav plus
    // a data chunk of 4 doc_id-derived samples), decoded back by the JDK's
    // audio reader into exact integer (count, sum, peak) — identity oracle;
    // every 5th doc gets a non-audio payload to prove the quarantine path
    "q_mm_decode_wav" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("audio").as("modality"),
          mmWavPayload.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.decodeWav(media).toDF().orderBy("media_id")
    }),

    // multimodal: REAL audio resample — decode the 4-sample PCM stream,
    // nearest-neighbor pick 3 samples (source index i·len div n, integer
    // math → closed-form oracle: samples 0, 1, 2 of the assembly)
    "q_mm_resample_wav" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("audio").as("modality"),
          mmWavPayload.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.resampleWav(media, 3).toDF().orderBy("media_id")
    }),

    // multimodal: per-window audio energy (VAD/silence-trim primitive) —
    // REAL decode of a 12-sample PCM stream into three 4-sample windows;
    // exact integer Σs² energy + peak + silence flag; window w of doc d is
    // all-zero iff (d+w) mod 3 = 0, so every doc exercises the silent path
    "q_mm_audio_energy" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("audio").as("modality"),
          mmWavPayloadWindows.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.wavEnergyWindows(media, 4).toDF()
        .orderBy("media_id", "win_idx")
    }),

    // audio spectral fingerprint: REAL 256-sample decode → exact integer
    // Walsh–Hadamard per 64-sample frame → sign signature → banded pairs.
    // Amplitude-rescaled odd docs (3× volume) must collide with their
    // even twins at Hamming 0 (WHT linearity); junk docs (%29==11) fail
    // closed out of the pair set; cross-group pairs must be zero
    "q_mm_audio_fp" -> ((s, dir) => {
      import s.implicits._
      // doc_id < 2000 bounds the within-group identical-signature pair
      // blowup (C(n_g,2) by construction); the quadratic banding stress
      // is q_mm_perceptual_dedup's job — this gate proves decode + WHT
      val media = t(s, dir, "documents")
        .where(col("doc_id") < 2000)
        .select(col("doc_id").as("media_id"), lit("audio").as("modality"),
          mmWavPayloadWht.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      val pairs = Multimodal.whtFpPairs(Multimodal.wavWhtFp(media), 3)
      pairs
        .withColumn("grp", pmod(expr("media_a DIV 2"), lit(8)).cast("int"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(pmod(col("media_a"), lit(2)) =!=
            pmod(col("media_b"), lit(2)), 1L).otherwise(0L))
            .as("n_amp_pairs"),
          max("hamming").as("max_hamming"),
          sum(when(pmod(expr("media_a DIV 2"), lit(8)) =!=
            pmod(expr("media_b DIV 2"), lit(8)), 1L).otherwise(0L))
            .as("n_cross_grp"))
        .orderBy("grp")
    }),

    // audio quality verdict: majority-silence planted on doc%3==0,
    // clipping on doc%4==0, quarantine on doc%5==0 (decoded=false rows
    // must fail audio_ok as false, not null) — closed-form oracle from
    // the generator formula
    "q_mm_audio_quality" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("audio").as("modality"),
          mmWavPayloadQuality.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      Multimodal.wavQuality(media).orderBy("media_id")
    }),

    // multimodal: incremental dedup — only the NEW batch (odd docs) is
    // decoded and checked against the standing corpus's fingerprints
    // (even docs): j = (doc_id div 2) mod 16 picks a known grid, j < 8
    // collides with the old corpus, j >= 8 is novel. The media analog of
    // q_doc_incremental_dedup's new-batch-only contract; fingerprints
    // broadcast (bounded by distinct images, not corpus size)
    "q_mm_incremental_dedup" -> ((s, dir) => {
      import s.implicits._
      def grid(range: Range) = range.map { k =>
        val (w, h) = mmPngDims(k)
        lit(Multimodal.makePng(w, h, mmPngPixel(k)))
      }
      val j2 = (col("doc_id") / 2).cast("long")
      val oldMedia = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id").as("media_id"), lit("image").as("modality"),
          element_at(array(grid(0 until 8): _*),
            pmod(j2, lit(8)).cast("int") + 1).as("payload"),
          lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      val newMedia = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(2)) === 1)
        .select(col("doc_id").as("media_id"), lit("image").as("modality"),
          element_at(array(grid(0 until 16): _*),
            pmod(j2, lit(16)).cast("int") + 1).as("payload"),
          lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      val index = Multimodal.decodeImages(oldMedia).toDF()
        .where(col("decoded")).select("px_fp").distinct()
      Multimodal.decodeImages(newMedia).toDF()
        .join(broadcast(index.withColumn("is_dup", lit(true))),
          Seq("px_fp"), "left")
        .select(col("media_id"), coalesce(col("is_dup"), lit(false))
          .as("is_dup"))
        .orderBy("media_id")
    }),

    // multimodal curation pipeline in ONE plan (the q_doc_pipeline story
    // for media): decode mixed payloads → quarantine junk → visual exact
    // dedup (keep lowest media_id per pixel fingerprint) → per-dimension
    // summary. Every stage is an already-gated op; this pins the
    // composition
    "q_mm_pipeline" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("image").as("modality"),
          mmPngJunkPayload.as("payload"), lit("synth").as("source"))
        .as[Multimodal.MediaRecord]
      val feats = Multimodal.decodeImages(media).toDF().where(col("decoded"))
      val keep = feats.groupBy("px_fp").agg(min("media_id").as("media_id"))
      feats.join(keep, Seq("px_fp", "media_id"), "left_semi")
        .groupBy("width", "height")
        .agg(count(lit(1)).as("n_kept"), min("media_id").as("min_id"),
          sum("sum_r").as("tot_r"))
        .orderBy("width", "height")
    }))

  /** Fixed seed vocabulary for the BPE encode gate: data-independent, so
    * the trained merge table is identical at every SF and both the query
    * and the oracle can derive it at build time (training over the actual
    * corpus is exercised by the OpsSpec corpus roundtrip instead — its
    * merge table is data-dependent and therefore not SQL-stateable).
    * Letters only: the symbols appear verbatim inside SQL literals.
    */
  private[queries] val bpeSeedFreq: Seq[(String, Long)] = Seq(
    "the" -> 120L, "of" -> 80L, "and" -> 75L, "ing" -> 60L, "tion" -> 50L,
    "er" -> 45L, "in" -> 40L, "at" -> 30L, "es" -> 25L, "en" -> 20L,
    "ed" -> 18L, "is" -> 15L, "on" -> 12L, "re" -> 10L)

  private[queries] lazy val bpeGateMerges: Seq[(String, String)] =
    graft.ops.Bpe.train(bpeSeedFreq, 24)

  /** Fixed seed vocabulary for the BYTE-level BPE gates (the
    * [[bpeSeedFreq]] discipline): GPT-2-style space-prefixed words, so
    * the trained merges include the `Ġx` fusions that make byte-level
    * counts differ from word-level ones.
    */
  private[queries] val bpeByteSeedFreq: Seq[(String, Long)] = Seq(
    " the" -> 120L, " of" -> 80L, " and" -> 75L, "ing" -> 60L,
    " to" -> 55L, "tion" -> 50L, "er" -> 45L, " in" -> 40L, " a" -> 35L,
    "at" -> 30L, "es" -> 25L, "en" -> 20L, "ed" -> 18L, " is" -> 15L,
    "on" -> 12L, "re" -> 10L)

  private[queries] lazy val bpeByteGateMerges: Seq[(String, String)] =
    graft.ops.Bpe.trainBytes(bpeByteSeedFreq, 30)

  /** [[graft.ops.Bpe.PreTokenRe]] as a DuckDB string literal. */
  private lazy val preTokenReSql: String =
    graft.ops.Bpe.PreTokenRe.replace("'", "''")

  /** DuckDB expression producing exactly `s`: printable-ASCII runs as
    * quoted literals, everything else (the GPT-2-mapped bytes, e.g. `Ġ`)
    * as `chr(cp)` — merge symbols survive any source encoding.
    */
  private def duckStr(s: String): String = {
    val parts = scala.collection.mutable.Buffer.empty[String]
    val run = new StringBuilder
    def flush(): Unit =
      if (run.nonEmpty) { parts += s"'${run.toString}'"; run.clear() }
    s.foreach { c =>
      if (c == '\'') run.append("''")
      else if (c >= ' ' && c <= '~') run.append(c)
      else { flush(); parts += s"chr(${c.toInt})" }
    }
    flush()
    if (parts.isEmpty) "''" else parts.mkString("(", " || ", ")")
  }

  /** Byte-level oracle CTEs `btok`/`bmap`/`benc`: the engine's regex
    * split (same pattern string — Java∩RE2 portable), the byte map
    * restricted to this corpus's alphabet (lowercase ASCII + space;
    * space → chr(288) `Ġ` is the only non-identity byte — the ENGINE
    * runs the full 256-byte bijection), then the chained-replace merge
    * replay over chr(1)-separated symbols.
    */
  private lazy val bpeByteEncCteSql: String = {
    val init = "chr(1) || array_to_string([mt[i] for i in " +
      "generate_series(1, length(mt))], chr(1) || chr(1)) || chr(1)"
    val chain = bpeByteGateMerges.foldLeft(init) { case (acc, (a, b)) =>
      s"replace($acc, chr(1)||${duckStr(a)}||chr(1)||chr(1)||" +
        s"${duckStr(b)}||chr(1), chr(1)||${duckStr(a + b)}||chr(1))"
    }
    s"""btok AS (
      |  SELECT doc_id, i - 1 AS pos, toks[i] AS term
      |  FROM (SELECT doc_id, regexp_extract_all(text, '$preTokenReSql')
      |          AS toks
      |        FROM documents),
      |    LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)),
      |bmap AS (
      |  SELECT doc_id, pos, term, replace(term, ' ', chr(288)) AS mt
      |  FROM btok),
      |benc AS (
      |  SELECT doc_id, pos, term,
      |    list_filter(string_split($chain, chr(1)), x -> x <> '') AS pieces
      |  FROM bmap)""".stripMargin
  }

  /** Shared oracle CTEs `tok` (token stream with positions) and `enc`
    * (per-token BPE pieces via the chained-replace merge replay) — used
    * by both the encode gate and the bpe-sized packing gate.
    */
  /** Shared unigram-DP oracle CTE stack (vocab, unrolled dp/backtrack,
    * per-term pieces + counts + word costs) — used by the segmentation
    * gate and the tokenizer-comparison gate.
    */
  private lazy val unigramCtesSql: String = {

      val U = 12
      val P = 8
      val dpDefs = (1 to U).map { j =>
        val branches = (1 to math.min(j, P)).map { l =>
          if (l == 1)
            s"""SELECT d.term, d.c + coalesce(v.cost, 20000) AS cand
               |    FROM dp${j - 1} d LEFT JOIN voc v
               |      ON v.piece = substring(d.term, $j, 1)
               |    WHERE length(d.term) >= $j""".stripMargin
          else
            s"""SELECT d.term, d.c + v.cost AS cand
               |    FROM dp${j - l} d JOIN voc v
               |      ON v.piece = substring(d.term, ${j - l + 1}, $l)
               |    WHERE length(d.term) >= $j""".stripMargin
        }.mkString("\n    UNION ALL\n    ")
        s"dp$j AS MATERIALIZED (SELECT term, min(cand) AS c FROM (\n    $branches) z$j" +
          " GROUP BY term)"
      }
      val dpAll = (0 to U)
        .map(j => s"SELECT term, $j AS j, c FROM dp$j")
        .mkString("\n  UNION ALL ")
      val btDefs = (0 until U).flatMap { s =>
        val candBranches = (1 to P).map { l =>
          val joinV =
            if (l == 1)
              s"LEFT JOIN voc v ON v.piece = substring(b.term, b.j, 1)"
            else
              s"JOIN voc v ON v.piece = substring(b.term, b.j - $l + 1, $l)"
          val costExpr =
            if (l == 1) "coalesce(v.cost, 20000)" else "v.cost"
          s"""SELECT b.term, b.j, $l AS l,
             |      substring(b.term, b.j - $l + 1, $l) AS piece
             |    FROM bt$s b
             |    JOIN dpall da ON da.term = b.term AND da.j = b.j
             |    JOIN dpall db ON db.term = b.term AND db.j = b.j - $l
             |    $joinV
             |    WHERE b.j >= $l AND db.c + $costExpr = da.c""".stripMargin
        }.mkString("\n    UNION ALL\n    ")
        Seq(
          s"""ch$s AS MATERIALIZED (SELECT term, j, l, piece,
             |    row_number() OVER (PARTITION BY term ORDER BY l DESC)
             |      AS rn
             |  FROM (\n    $candBranches) c$s)""".stripMargin,
          s"bt${s + 1} AS MATERIALIZED (SELECT term, j - l AS j FROM ch$s" +
            " WHERE rn = 1 AND j - l > 0)")
      }
      val chUnion = (0 until U)
        .map(s => s"SELECT term, piece, $s AS s FROM ch$s WHERE rn = 1")
        .mkString("\n  UNION ALL ")
      s"""$bpeEncCteSql,
         |pc AS (SELECT p AS piece, CAST(count(*) AS BIGINT) AS cnt
         |  FROM enc, LATERAL (SELECT unnest(pieces) AS p) GROUP BY p),
         |cc AS (SELECT substring(term, i, 1) AS piece,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM tok, LATERAL
         |    (SELECT unnest(generate_series(1, length(term))) AS i)
         |  GROUP BY 1),
         |vc AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt
         |  FROM (SELECT * FROM pc UNION ALL SELECT * FROM cc) u
         |  WHERE length(piece) <= $P GROUP BY piece),
         |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM vc),
         |voc AS MATERIALIZED (SELECT piece,
         |    ((length(bin(tt.tot)) - 1) - (length(bin(cnt)) - 1)) * 1000
         |      + 500 AS cost
         |  FROM vc CROSS JOIN tt),
         |words AS MATERIALIZED (SELECT DISTINCT term FROM tok WHERE length(term) >= 1),
         |dp0 AS (SELECT term, CAST(0 AS BIGINT) AS c FROM words),
         |${dpDefs.mkString(",\n")},
         |dpall AS MATERIALIZED ($dpAll),
         |bt0 AS MATERIALIZED (SELECT term, length(term) AS j FROM words),
         |${btDefs.mkString(",\n")},
         |pieces AS ($chUnion),
         |np AS (SELECT term, CAST(count(*) AS BIGINT) AS total
         |  FROM pieces GROUP BY term),
         |wc AS (SELECT d.term, d.c AS cost_milli FROM dpall d
         |  JOIN words w ON w.term = d.term AND d.j = length(w.term))""".stripMargin
  }

  private lazy val bpeEncCteSql: String = {
    val init = "chr(1) || array_to_string([term[i] for i in " +
      "generate_series(1, length(term))], chr(1) || chr(1)) || chr(1)"
    val chain = bpeGateMerges.foldLeft(init) { case (acc, (a, b)) =>
      s"replace($acc, chr(1)||'$a'||chr(1)||chr(1)||'$b'||chr(1), " +
        s"chr(1)||'$a$b'||chr(1))"
    }
    s"""tok AS (
      |  SELECT doc_id, i - 1 AS pos, ws[i] AS term
      |  FROM (SELECT doc_id,
      |          regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
      |        FROM documents),
      |    LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)),
      |enc AS (
      |  SELECT doc_id, pos, term,
      |    list_filter(string_split($chain, chr(1)), x -> x <> '') AS pieces
      |  FROM tok)""".stripMargin
  }

  /** Shared payload column for the real-decode gates: doc_id%10 ∈ [0,8)
    * selects known-pixel PNG k; 8 → a truncated JPEG stump, 9 → plain
    * text (both must quarantine as decoded=false).
    */
  private[queries] def mmPngJunkPayload: org.apache.spark.sql.Column = {
    val pngs = (0 until 8).map { k =>
      val (w, h) = mmPngDims(k)
      lit(graft.ops.Multimodal.makePng(w, h, mmPngPixel(k)))
    }
    val junk = Seq(
      lit(Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10).map(_.toByte)),
      lit("not an image".getBytes("UTF-8")))
    element_at(array((pngs ++ junk): _*),
      pmod(col("doc_id"), lit(10)).cast("int") + 1)
  }

  /** Shared audio payload for the real-decode gates: canonical 52-byte
    * mono 16-bit PCM WAV with 4 doc_id-derived samples
    * (s_i = (doc_id·7 + i·1231) mod 30000); every 5th doc gets a
    * non-audio payload (quarantine path).
    */
  private[queries] def mmWavPayload: org.apache.spark.sql.Column = {
    def le32(v: org.apache.spark.sql.Column) = {
      val be = lpad(hex(v), 8, "0")
      concat(substring(be, 7, 2), substring(be, 5, 2),
        substring(be, 3, 2), substring(be, 1, 2))
    }
    def le16(v: org.apache.spark.sql.Column) = {
      val be = lpad(hex(v), 4, "0")
      concat(substring(be, 3, 2), substring(be, 1, 2))
    }
    val rate = element_at(
      array(lit(8000L), lit(16000L), lit(22050L), lit(44100L)),
      (col("doc_id") % 4 + 1).cast("int"))
    def samp(i: Int) = (col("doc_id") * 7 + lit(i * 1231)) % 30000
    val wav = unhex(concat(
      lit("52494646"), le32(lit(44L)), lit("57415645"), lit("666D7420"),
      le32(lit(16L)), le16(lit(1L)), le16(lit(1L)), le32(rate),
      le32(rate * 2), le16(lit(2L)), le16(lit(16L)),
      lit("64617461"), le32(lit(8L)),
      concat((0 until 4).map(i => le16(samp(i))): _*)))
    when(pmod(col("doc_id"), lit(5)) === 0,
      encode(lit("not audio"), "UTF-8")).otherwise(wav)
  }

  /** 256-sample variant for the WHT fingerprint gate: pattern group
    * g = (doc_id div 2) mod 8 picks a deterministic ±amp waveform (sign
    * of sample i from a quadratic hash mod 97 — NOT a plain parity, which
    * would degenerate to one alternating wave for every group), parity
    * picks the amplitude (1000 even / 3000 odd — the WHT-linearity probe:
    * rescaled copies must collide at Hamming 0). doc_id % 29 == 11 docs
    * carry junk (decode must fail closed and exclude them from pairing).
    */
  private[queries] def mmWavPayloadWht: org.apache.spark.sql.Column = {
    // only 16 distinct payloads exist ((group, parity) pairs), so they
    // are built ONCE as driver-side hex literals and selected by index —
    // the per-row 256-term hex-concat Column this replaces dominated the
    // gate at 9 s (codegen of a ~2500-node expression), vs ~1 s now
    def le32(v: Long) = f"$v%08x".grouped(2).toSeq.reverse.mkString
    def le16(v: Long) = f"${v & 0xFFFF}%04x".grouped(2).toSeq.reverse.mkString
    def wavHex(g: Int, amp: Long): String = {
      val samples = (0 until 256).map { i =>
        val c = i.toLong * i + i + 41
        if ((g + 1) * c % 97 < 48) amp else -amp
      }
      "52494646" + le32(548L) + "57415645" + "666d7420" + le32(16L) +
        le16(1L) + le16(1L) + le32(8000L) + le32(16000L) + le16(2L) +
        le16(16L) + "64617461" + le32(512L) + samples.map(le16).mkString
    }
    val lits = for (g <- 0 until 8; amp <- Seq(1000L, 3000L))
      yield lit(wavHex(g, amp))
    val idx = (pmod(expr("doc_id DIV 2"), lit(8)) * 2 +
      pmod(col("doc_id"), lit(2))).cast("int") + 1
    val wav = unhex(element_at(array(lits: _*), idx))
    when(pmod(col("doc_id"), lit(29)) === 11,
      encode(lit("junk"), "UTF-8")).otherwise(wav)
  }

  /** 12-sample variant for the energy-window gate: three 4-sample windows,
    * window w of doc d all-zero iff (d + w) mod 3 = 0 (every doc has
    * exactly one silent window); non-zero samples follow the mmWavPayload
    * formula s_i = (doc_id·7 + i·1231) mod 30000. Fixed 8000 Hz mono.
    * Same every-5th-doc quarantine payload.
    */
  private[queries] def mmWavPayloadWindows: org.apache.spark.sql.Column = {
    def le32(v: org.apache.spark.sql.Column) = {
      val be = lpad(hex(v), 8, "0")
      concat(substring(be, 7, 2), substring(be, 5, 2),
        substring(be, 3, 2), substring(be, 1, 2))
    }
    def le16(v: org.apache.spark.sql.Column) = {
      val be = lpad(hex(v), 4, "0")
      concat(substring(be, 3, 2), substring(be, 1, 2))
    }
    def samp(i: Int) =
      when(pmod(col("doc_id") + lit(i / 4), lit(3)) === 0, lit(0L))
        .otherwise((col("doc_id") * 7 + lit(i * 1231)) % 30000)
    val wav = unhex(concat(
      lit("52494646"), le32(lit(60L)), lit("57415645"), lit("666D7420"),
      le32(lit(16L)), le16(lit(1L)), le16(lit(1L)), le32(lit(8000L)),
      le32(lit(16000L)), le16(lit(2L)), le16(lit(16L)),
      lit("64617461"), le32(lit(24L)),
      concat((0 until 12).map(i => le16(samp(i))): _*)))
    when(pmod(col("doc_id"), lit(5)) === 0,
      encode(lit("not audio"), "UTF-8")).otherwise(wav)
  }

  /** 16-sample variant for the audio-quality gate: first half all-zero
    * for doc ≡ 0 (mod 3) — a majority-silent recording; samples 12-15
    * pinned at 32767 for doc ≡ 0 (mod 4) — a clipped recording; all
    * other samples follow the mmWavPayload formula (range < 30000, so
    * they can never trip the 32000 clip threshold by accident). Fixed
    * 8000 Hz mono; same every-5th-doc quarantine payload.
    */
  private[queries] def mmWavPayloadQuality: org.apache.spark.sql.Column = {
    def le32(v: org.apache.spark.sql.Column) = {
      val be = lpad(hex(v), 8, "0")
      concat(substring(be, 7, 2), substring(be, 5, 2),
        substring(be, 3, 2), substring(be, 1, 2))
    }
    def le16(v: org.apache.spark.sql.Column) = {
      val be = lpad(hex(v), 4, "0")
      concat(substring(be, 3, 2), substring(be, 1, 2))
    }
    def samp(i: Int): org.apache.spark.sql.Column = {
      val base = (col("doc_id") * 7 + lit(i * 1231)) % 30000
      if (i < 8)
        when(pmod(col("doc_id"), lit(3)) === 0, lit(0L)).otherwise(base)
      else if (i >= 12)
        when(pmod(col("doc_id"), lit(4)) === 0, lit(32767L)).otherwise(base)
      else base
    }
    val wav = unhex(concat(
      lit("52494646"), le32(lit(68L)), lit("57415645"), lit("666D7420"),
      le32(lit(16L)), le16(lit(1L)), le16(lit(1L)), le32(lit(8000L)),
      le32(lit(16000L)), le16(lit(2L)), le16(lit(16L)),
      lit("64617461"), le32(lit(32L)),
      concat((0 until 16).map(i => le16(samp(i))): _*)))
    when(pmod(col("doc_id"), lit(5)) === 0,
      encode(lit("not audio"), "UTF-8")).otherwise(wav)
  }

  /** Known-pixel generator for q_mm_decode_png: PNG k is a (3+k)×(2+k%3)
    * RGB gradient. Shared by the encoder (query side) and the closed-form
    * expected-sum computation (oracle side) — the single source of truth
    * that makes the decode gate an identity test.
    */
  /** Pixel pattern family for the perceptual-hash gate: k-dependent block
    * size + phase makes the 8 patterns' aHashes mutually far apart
    * (min cross hamming 12 — verified; band-join candidates never bridge
    * groups at maxDist 3), while staying EXACTLY 2×-upscale-invariant.
    */
  private[queries] def mmPerceptualPixel(k: Int)(x: Int, y: Int): Int = {
    val bs = 2 + (k % 4)
    val phase = (x / bs + y / bs + k / 4) % 2
    val base = if (phase == 1) 230 else 20
    val r = (base + x * 3 + k * 11) % 256
    val g = (base + y * 5 + k * 7) % 256
    val b = (base + (x ^ y) * 2 + k * 13) % 256
    (r << 16) | (g << 8) | b
  }

  /** Closed-form (aHash, dHash) for the 16×16 base pattern k — replicates
    * [[graft.ops.Multimodal.perceptualHash]]'s integer pooling from the
    * GENERATOR, not the codec under test; the 32×32 nearest-neighbor
    * upscale hashes identically by the cross-multiplication invariance.
    */
  private def mmPhashExpected(k: Int): (Long, Long) = {
    val w = 16; val h = 16
    val cellSum = Array.ofDim[Long](8, 8)
    val cellArea = Array.ofDim[Long](8, 8)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = mmPerceptualPixel(k)(x, y)
      val luma = (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)).toLong
      cellSum(y * 8 / h)(x * 8 / w) += luma
      cellArea(y * 8 / h)(x * 8 / w) += 1L
      total += luma
    }
    val n = w.toLong * h
    var a = 0L; var d = 0L
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val s = cellSum(cy)(cx); val ar = cellArea(cy)(cx)
      a = (a << 1) | (if (s * n > total * ar) 1L else 0L)
      val nx = (cx + 1) % 8
      d = (d << 1) |
        (if (s * cellArea(cy)(nx) > cellSum(cy)(nx) * ar) 1L else 0L)
    }
    (a, d)
  }

  private[queries] def mmPngPixel(k: Int)(x: Int, y: Int): Int = {
    val r = (x * 37 + y * 11 + k * 5) % 256
    val g = (x * 17 + y * 29 + k * 3) % 256
    val b = (x * 23 + y * 13 + k * 7) % 256
    (r << 16) | (g << 8) | b
  }

  private[queries] def mmPngDims(k: Int): (Int, Int) = (3 + k, 2 + k % 3)

  /** Closed-form (width, height, n_pixels, sum_r, sum_g, sum_b, px_fp)
    * for PNG k — computed from the generator, NOT by decoding, so the
    * oracle is independent of the codec under test.
    */
  private def mmPngExpected(k: Int): (Int, Int, Long, Long, Long, Long, Long) = {
    val (w, h) = mmPngDims(k)
    var sr = 0L; var sg = 0L; var sb = 0L
    var fp = 0xcbf29ce484222325L
    for (y <- 0 until h; x <- 0 until w) {
      val p = mmPngPixel(k)(x, y)
      val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
      sr += r; sg += g; sb += b
      fp = ((fp ^ r) * 0x100000001b3L ^ g) * 0x100000001b3L
      fp = (fp ^ b) * 0x100000001b3L
    }
    (w, h, w.toLong * h, sr, sg, sb, fp)
  }

  /** Closed-form resized sums for PNG k at (tw, th): nearest-neighbor
    * source pixel (x·w div tw, y·h div th) — the same integer mapping
    * [[graft.ops.Multimodal.resizeImages]] applies post-decode.
    */
  private def mmPngResizedExpected(k: Int, tw: Int,
      th: Int): (Long, Long, Long) = {
    val (w, h) = mmPngDims(k)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until th; x <- 0 until tw) {
      val p = mmPngPixel(k)(x * w / tw, y * h / th)
      sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
    }
    (sr, sg, sb)
  }

  /** Width of the testdata `embeddings.embedding` column. Single source of
    * truth for every literal-matrix projection (engine side) and its DuckDB
    * replay (oracle side): both embed a `dims`-wide ±1 matrix, so a corpus
    * shipping a different width must fail LOUDLY on both sides — the engine
    * raises via [[graft.ops.VectorOps.jlProject]]'s width guard, the oracle
    * via [[evGuardSql]] — instead of null-padding plane sums.
    */
  private[graft] val embDims = 64

  /** Deterministic id bound for the three brute/compressed margin
    * CALIBRATION gates (q_emb_margin_pairs_i / _pq / _sq8): both kNN
    * directions there are deliberately all-pairs — they calibrate the
    * bounded backends (LSH/BQ) against exact truth — so the sub-corpus
    * they run on must be CONSTANT-SIZED, not a corpus fraction (a
    * fraction keeps the quadratic). `vec_id < 1024` covers the whole
    * corpus at sf ≤ 0.01 (500 ids — gates unchanged there), a quarter of
    * the pairs at sf0.1, and a fixed 1024-vector panel at any larger
    * scale. The corpus-wide margin gates (_lsh, _bq, _ivf_i) stay
    * UNBOUNDED — their candidate generation is bucket/Hamming/probe-
    * bounded by construction.
    */
  private[graft] val marginCalBound = 1024L

  /** Deterministic id bounds for gates whose ORACLE (not engine) is a
    * sequential recursive-CTE replay — greedy first-fit packing and
    * component reachability. The engine paths are linear (window prefix
    * folds / label propagation), but a DuckDB recursive CTE materializes
    * one iteration per chained row, going quadratic past the sf0.1 row
    * counts (measured: q_doc_pack / q_doc_sft_pack / q_layout_compaction
    * / q_emb_dedup_clusters all >120 s at sf1 while every non-recursive
    * oracle finished). The bounds sit just above the sf0.1 table sizes,
    * so every sf <= 0.1 gate result is byte-identical to the unbounded
    * form and the verification work is CONSTANT at any larger scale.
    */
  private[graft] val seqOracleDocBound = 5120L
  private[graft] val seqOracleVecBound = 2048L

  /** Shared per-doc MP4 fixture for the frame-index/-dedup gates: a
    * structurally valid container (ftyp + moov{mvhd,trak{mdia{minf{stbl{
    * stts,stsc,stsz,stco}}}}} + mdat) whose sample layout varies per doc
    * — n = doc_id%5+2 frames, spc = doc_id%3+1 samples per chunk — while
    * frame CONTENT and sizes key off `key` (doc_id for the index gate:
    * all-unique frames; doc_id%50 for the dedup gate: 50-doc classes of
    * identical frames at different chunk offsets). Two planted failure
    * modes (doc_id%7==3 → PNG bytes; %11==5 → stsz version 1) pin the
    * parser's fail-closed contract. Returns (doc_id, pl binary).
    */
  private def mp4Fixture(docs: org.apache.spark.sql.DataFrame, tag: String,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    def be32(v: org.apache.spark.sql.Column) = lpad(hex(v), 8, "0")
    def tp(t: String) = t.getBytes("UTF-8").map(b => f"$b%02X").mkString
    val spc = pmod(col("doc_id"), lit(3)) + 1
    val n = pmod(col("doc_id"), lit(5)) + 2
    val nCh = call_function("div", n + spc - 1, spc)
    def szAt(i: org.apache.spark.sql.Column) = pmod(key + i, lit(7)) + 4
    def frameStr(i: org.apache.spark.sql.Column) = substring(
      concat(lit(tag), key.cast("string"), lit("_"), i.cast("string"),
        lit("x" * 16)), 1, 10)
    val framesHex = array_join(transform(sequence(lit(0L), n - 1),
      i => hex(frameStr(i).substr(lit(1), szAt(i).cast("int")))), "")
    val sumAll = aggregate(sequence(lit(0L), n - 1), lit(0L),
      (a, j) => a + szAt(j))
    def sumBefore(m: org.apache.spark.sql.Column) = aggregate(
      when(m >= 1L, sequence(lit(0L), m - 1))
        .otherwise(array().cast("array<bigint>")),
      lit(0L), (a, j) => a + szAt(j))
    val dataStart = lit(252L) + n * 4 + nCh * 4
    val stts = concat(be32(lit(16L)), lit(tp("stts")), lit("00000000"),
      be32(lit(0L)))
    val verFail = pmod(col("doc_id"), lit(11)) === 5
    val stsc = concat(be32(lit(28L)), lit(tp("stsc")), lit("00000000"),
      be32(lit(1L)), be32(lit(1L)), be32(spc), be32(lit(1L)))
    val stsz = concat(be32(lit(20L) + n * 4), lit(tp("stsz")),
      when(verFail, lit("01000000")).otherwise(lit("00000000")),
      be32(lit(0L)), be32(n),
      array_join(transform(sequence(lit(0L), n - 1),
        i => be32(szAt(i))), ""))
    val stco = concat(be32(lit(16L) + nCh * 4), lit(tp("stco")),
      lit("00000000"), be32(nCh),
      array_join(transform(sequence(lit(0L), nCh - 1),
        k => be32(dataStart + sumBefore(k * spc))), ""))
    val stbl = concat(be32(lit(88L) + n * 4 + nCh * 4), lit(tp("stbl")),
      stts, stsc, stsz, stco)
    val minf = concat(be32(lit(96L) + n * 4 + nCh * 4), lit(tp("minf")),
      stbl)
    val mdia = concat(be32(lit(104L) + n * 4 + nCh * 4), lit(tp("mdia")),
      minf)
    val trak = concat(be32(lit(112L) + n * 4 + nCh * 4), lit(tp("trak")),
      mdia)
    val mvhd = concat(be32(lit(108L)), lit(tp("mvhd")), lit("0" * 200))
    val moov = concat(be32(lit(228L) + n * 4 + nCh * 4), lit(tp("moov")),
      mvhd, trak)
    val ftyp = lit("00000010" + tp("ftyp") + "69736F6D00000200")
    val mdat = concat(be32(lit(8L) + sumAll), lit(tp("mdat")), framesHex)
    val good = concat(ftyp, moov, mdat)
    val pl = when(pmod(col("doc_id"), lit(7)) === 3,
        unhex(lit("89504E470D0A1A0A"))) // PNG magic: not an MP4
      .otherwise(unhex(good))
    // payload into a COLUMN first (the q_mm_mp4 lesson: the walk
    // references hex(payload) dozens of times per fold step)
    docs.select(col("doc_id"), pl.as("pl"))
  }

  /** Parameterized span-corruption replay (rate %, max span len, doc
    * filter): the q_doc_span_corrupt formulation generalized so the UL2
    * mixture gate can union three denoiser configs. `divisor` must be
    * exact (100 / ratePct) — mirrors the engine's integer rate.
    */
  private def spanCorruptSql(ratePct: Int, maxLen: Int,
      docFilter: String, denoiser: String): String = {
    val d = 100 / ratePct
    raw"""SELECT a.doc_id, a.n_tokens, a.n_masked, a.n_spans,
         |  md5(coalesce(i.instr, '')) AS input_fp,
         |  md5(coalesce(g.tgstr, '')) AS target_fp, '$denoiser' AS denoiser
         |FROM (
         |  SELECT doc_id, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         |    CAST(sum(rs) AS BIGINT) AS n_spans
         |  FROM rr_$denoiser GROUP BY doc_id) a
         |LEFT JOIN (SELECT doc_id, string_agg(
         |    CASE WHEN NOT m THEN w
         |      ELSE '<extra_id_' || (runidx - 1) || '>' END,
         |    ' ' ORDER BY p) AS instr
         |  FROM rr_$denoiser WHERE NOT m OR rs = 1 GROUP BY doc_id) i
         |  USING (doc_id)
         |LEFT JOIN (SELECT doc_id, string_agg(
         |    CASE WHEN rs = 1
         |      THEN '<extra_id_' || (runidx - 1) || '> ' || w
         |      ELSE w END, ' ' ORDER BY p) AS tgstr
         |  FROM rr_$denoiser WHERE m GROUP BY doc_id) g USING (doc_id)"""
      .stripMargin
  }

  /** The shared mask-bit CTE chain for one denoiser config. */
  private def spanCorruptCtes(ratePct: Int, maxLen: Int,
      docFilter: String, denoiser: String): String = {
    val d = 100 / ratePct
    raw"""n_$denoiser AS (SELECT doc_id,
         |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
         |  FROM documents WHERE $docFilter),
         |tok_$denoiser AS (SELECT doc_id, i - 1 AS p,
         |    regexp_split_to_array(t, '\s+')[i] AS w,
         |    len(regexp_split_to_array(t, '\s+')) AS n_tokens
         |  FROM n_$denoiser, LATERAL (SELECT unnest(generate_series(1,
         |    len(regexp_split_to_array(t, '\s+')))) AS i)),
         |bit_$denoiser AS (SELECT doc_id, p, w, n_tokens,
         |    len([s for s in generate_series(greatest(p - ${maxLen - 1}, 0), p)
         |      if ('0x' || substr(md5(doc_id || ':' || s), 1, 8))::BIGINT
         |           % $d = 0
         |        AND s + 1 + (('0x' || substr(md5(doc_id || ':' || s),
         |          1, 8))::BIGINT // $d) % $maxLen > p]) > 0 AS m
         |  FROM tok_$denoiser),
         |r_$denoiser AS (SELECT *, CASE WHEN m AND NOT coalesce(
         |      lag(m) OVER (PARTITION BY doc_id ORDER BY p), false)
         |    THEN 1 ELSE 0 END AS rs FROM bit_$denoiser),
         |rr_$denoiser AS (SELECT *, sum(rs) OVER (PARTITION BY doc_id
         |    ORDER BY p) AS runidx FROM r_$denoiser)"""
      .stripMargin
  }

  /** Shared ratio-margin oracle tail over CTEs `fwd`/`bwd` with
    * (src_id, tgt_id, cos_x1m): per-side sums, pair union, exact integer
    * margin — identical for any kNN backend feeding it (brute or IVF),
    * mirroring [[graft.ops.VectorOps.marginPairs]]'s backend-agnostic
    * contract.
    */
  private[queries] def marginTailSql: String =
    """df AS (SELECT src_id, sum(cos_x1m) AS sum_f,
      |    CAST(count(*) AS BIGINT) AS cnt_f FROM fwd GROUP BY src_id),
      |db AS (SELECT tgt_id, sum(cos_x1m) AS sum_b,
      |    CAST(count(*) AS BIGINT) AS cnt_b FROM bwd GROUP BY tgt_id),
      |u AS (SELECT DISTINCT src_id, tgt_id, cos_x1m FROM (
      |    SELECT * FROM fwd UNION ALL SELECT * FROM bwd) z),
      |m AS (SELECT u.src_id, u.tgt_id, u.cos_x1m,
      |    df.sum_f * db.cnt_b + db.sum_b * df.cnt_f AS den,
      |    df.cnt_f, db.cnt_b
      |  FROM u JOIN df USING (src_id) JOIN db USING (tgt_id))
      |SELECT src_id, tgt_id, cos_x1m,
      |  CAST((cos_x1m * 2 * cnt_f * cnt_b * 1000000) // den AS BIGINT)
      |    AS margin_ppm
      |FROM m WHERE den > 0
      |ORDER BY margin_ppm DESC, src_id, tgt_id LIMIT 20""".stripMargin

  /** IVF-margin replay, INTEGER-EXACT and C-PARAMETERIZED: the knn_ivf
    * cell/probe CTEs in BOTH directions on the same quantize-first chain
    * as the brute gate (assign tie → lowest centroid id; probe top-2;
    * in-cell knn ties → lowest vec_id; every similarity icosSql), then
    * the IDENTICAL margin tail. `c` is the coarse-cell count (centroids
    * = vec_ids < c): 8 is the calibration shape the in-query gate pins;
    * 64 is the deployment shape (C~√N at the sf1 corpus) the persisted
    * serve gate demonstrates — per-query candidate work is N·nprobe/C,
    * so the same SQL at larger C is the flattening claim, made replayable.
    */
  private[queries] def marginIvfOracleSql(c: Int): String = {
    def side(corpus: String, queries: String, cells: String,
        probes: String, fwd: String, qcol: String, ccol: String) =
      s"""$cells AS (SELECT vec_id, cell, qv, r FROM (
         |    SELECT t.vec_id, cent.centroid_id AS cell, t.qv, t.r,
         |      ${icosSql("t.qv", "t.r", "cent.cv", "cent.cr")} AS ccos,
         |      row_number() OVER (PARTITION BY t.vec_id
         |        ORDER BY ${icosSql("t.qv", "t.r", "cent.cv", "cent.cr")}
         |          DESC, cent.centroid_id) AS rn
         |    FROM $corpus t CROSS JOIN cent) z
         |  WHERE rn = 1 AND ccos IS NOT NULL),
         |$probes AS (SELECT query_id, qv, r, cell FROM (
         |    SELECT s.vec_id AS query_id, s.qv, s.r,
         |      cent.centroid_id AS cell,
         |      ${icosSql("s.qv", "s.r", "cent.cv", "cent.cr")} AS ccos,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${icosSql("s.qv", "s.r", "cent.cv", "cent.cr")}
         |          DESC, cent.centroid_id) AS rn
         |    FROM $queries s CROSS JOIN cent) z
         |  WHERE rn <= 2 AND ccos IS NOT NULL),
         |$fwd AS (SELECT $qcol, $ccol, cos_x1m
         |  FROM (SELECT query_id, vec_id, cos_x1m,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos_x1m DESC, vec_id) AS rn
         |    FROM (SELECT p.query_id, c.vec_id,
         |        ${icosSql("c.qv", "c.r", "p.qv", "p.r")} AS cos_x1m
         |      FROM $cells c JOIN $probes p USING (cell)
         |      WHERE c.vec_id != p.query_id) z0
         |    WHERE cos_x1m IS NOT NULL) z1
         |  WHERE rn <= 4)""".stripMargin
    s"""WITH e AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
       |${exactChainSql("e", "qe")},
       |cent AS (SELECT vec_id AS centroid_id, qv AS cv, r AS cr FROM qe
       |  WHERE vec_id < $c),
       |so AS (SELECT * FROM qe WHERE vec_id % 2 = 0),
       |tg AS (SELECT * FROM qe WHERE vec_id % 2 = 1),
       |${side("tg", "so", "cellsT", "probF", "fwd",
           "query_id AS src_id", "vec_id AS tgt_id")},
       |${side("so", "tg", "cellsS", "probB", "bwd",
           "vec_id AS src_id", "query_id AS tgt_id")},
       |$marginTailSql""".stripMargin
  }

  /** DuckDB-side mirror of the engine's width guard: selects the embedding
    * as DOUBLE[] when exactly [[embDims]] wide, else raises through
    * `error()` — a WHERE filter would pass vacuously on a wrong-width
    * corpus, which is precisely the silent mismatch this prevents.
    */
  private[queries] def evGuardSql: String =
    s"CASE WHEN len(embedding) = $embDims THEN embedding::DOUBLE[] " +
      s"ELSE error('embeddings width <> $embDims') END"

  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"
  private[queries] val shinglesSql =
    """(SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |  THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |        for i in generate_series(1, len(t) - 2)]
      |  ELSE [] END) AS s
      | FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |       FROM documents))""".stripMargin
  private val stopList = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")
  private val dotSql = (a: String, b: String) => s"list_dot_product($a, $b)"
  // nullif mirrors VectorOps' zero-norm guard: a zero vector yields NULL
  // cosine in both engines (Spark ANSI would otherwise throw; DuckDB would
  // otherwise produce inf/nan)
  private[queries] def cosSql(a: String, b: String) =
    s"${dotSql(a, b)} / nullif(sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}), 0)"

  /** Exact integer dot of two BIGINT-list expressions: per-element BIGINT
    * products (overflow raises, mirroring the engine's ANSI
    * [[graft.functions.LongVectorDot]]) summed to HUGEINT, cast back. */
  private[queries] def idotSql(a: String, b: String): String =
    s"CAST(list_sum([$a[i] * $b[i] " +
      s"for i in generate_series(1, len($a))]) AS BIGINT)"

  /** Exact micro-unit integer cosine over pre-quantized vectors + their
    * integer norm roots — mirrors `VectorOps.exactCosX1m`: `(dot·10⁶) //
    * (ra·rb)`, truncating toward zero (DuckDB `//` ≡ Spark `div` on
    * BIGINT, verified incl. negatives), zero denominator → NULL. */
  private[queries] def icosSql(aq: String, ar: String, bq: String,
      br: String): String =
    s"(${idotSql(aq, bq)} * 1000000) // nullif($ar * $br, 0)"

  /** Integer-exact embedding chain — CTEs `<out>0..<out>` over input CTE
    * `src` (vec_id, ev DOUBLE[]): `qv` quantized half-up at scale 1e5
    * (`KMeans.quantize` mirror) and `r` the EXACT integer norm root —
    * double-sqrt seed corrected one exact integer step each way, the
    * `VectorOps.isqrt` replay (exact for n2 < 2^52, so engine-agnostic). */
  private[queries] def exactChainSql(src: String, out: String): String =
    s"""${out}0 AS (SELECT vec_id,
       |    [CAST(floor(x * 100000.0 + 0.5) AS BIGINT) for x in ev] AS qv
       |  FROM $src),
       |${isqrtTailSql(out)}""".stripMargin

  /** The isqrt tail of [[exactChainSql]] factored out: CTEs `<out>1..
    * <out>` over `<out>0` (vec_id, qv BIGINT[]) — n2, double-sqrt seed,
    * one exact correction step each way. Shared by every integer-exact
    * vector chain regardless of HOW qv was quantized (global fixed-point
    * scale, SQ8 per-vector scale, ...).
    */
  private[queries] def isqrtTailSql(out: String): String =
    s"""${out}1 AS (SELECT vec_id, qv, ${idotSql("qv", "qv")} AS n2
       |  FROM ${out}0),
       |${out}2 AS (SELECT vec_id, qv, n2,
       |    CAST(floor(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) AS mr0
       |  FROM ${out}1),
       |${out}3 AS (SELECT vec_id, qv, n2,
       |    CASE WHEN (mr0+1)*(mr0+1) <= n2 THEN mr0+1 ELSE mr0 END AS mr1
       |  FROM ${out}2),
       |$out AS (SELECT vec_id, qv,
       |    CASE WHEN mr1*mr1 > n2 THEN mr1-1 ELSE mr1 END AS r
       |  FROM ${out}3)""".stripMargin

  /** SQ8 twin of [[exactChainSql]]: quantize with the PER-VECTOR scale
    * max|x|/127 half-up (the `ScalarQuant.sq8Encode` replay — zero
    * vectors coalesce to all-zero codes), then the identical isqrt tail.
    * The scale itself is NOT emitted: cosine over codes cancels it,
    * which is the whole point of `sq8SearchCosExact`.
    */
  private[queries] def sq8ChainSql(src: String, out: String): String =
    s"""${out}s AS (SELECT vec_id, ev,
       |    list_max([abs(x) for x in ev]) / 127.0 AS scl FROM $src),
       |${out}0 AS (SELECT vec_id,
       |    [CAST(coalesce(floor(x / nullif(scl, 0.0) + 0.5), 0) AS BIGINT)
       |     for x in ev] AS qv
       |  FROM ${out}s),
       |${isqrtTailSql(out)}""".stripMargin

  /** Per-character replay of [[graft.ops.Dedup.spanRemoval]] for any
    * (winLen, stride): mark every character covered by a duplicated
    * non-canonical window, stitch the survivors, count contiguous dropped
    * runs. stride=1 replays the boundary-exact [[graft.ops.Dedup
    * .spanRemovalExact]] — same SQL, denser window grid.
    */
  private def spanReplaySql(winLen: Int, stride: Int): String =
    raw"""WITH n AS (
         |  SELECT doc_id,
         |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
         |  FROM documents),
         |ww AS (
         |  SELECT doc_id,
         |    unnest(generate_series(1, length(t) - ${winLen - 1}, $stride)) AS i
         |  FROM n WHERE length(t) >= $winLen),
         |wt AS (
         |  SELECT ww.doc_id, ww.i, substr(n.t, ww.i, $winLen) AS win
         |  FROM ww JOIN n USING (doc_id)),
         |s AS (SELECT win, count(DISTINCT doc_id) AS nd,
         |        min(doc_id) AS keep_doc
         |      FROM wt GROUP BY win),
         |rem AS (SELECT wt.doc_id, wt.i AS st, wt.i + $winLen AS en
         |        FROM wt JOIN s USING (win)
         |        WHERE s.nd >= 2 AND wt.doc_id <> s.keep_doc),
         |dropped AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(generate_series(st, en - 1)) AS p
         |  FROM rem),
         |pos AS (
         |  SELECT doc_id, unnest(generate_series(1, length(t))) AS p
         |  FROM n),
         |mark AS (
         |  SELECT m.doc_id, m.p, substr(n.t, m.p, 1) AS ch,
         |    d.p IS NOT NULL AS dr
         |  FROM pos m JOIN n USING (doc_id)
         |  LEFT JOIN dropped d ON d.doc_id = m.doc_id AND d.p = m.p),
         |runs AS (
         |  SELECT doc_id, p, ch, dr,
         |    CASE WHEN dr AND NOT coalesce(
         |        lag(dr) OVER (PARTITION BY doc_id ORDER BY p), FALSE)
         |      THEN 1 ELSE 0 END AS ss
         |  FROM mark),
         |agg AS (
         |  SELECT doc_id,
         |    coalesce(string_agg(ch, '' ORDER BY p)
         |      FILTER (WHERE NOT dr), '') AS clean,
         |    sum(ss) AS nspans
         |  FROM runs GROUP BY doc_id)
         |SELECT n.doc_id, CAST(length(n.t) AS INT) AS orig_len,
         |  CAST(coalesce(a.nspans, 0) AS INT) AS n_spans,
         |  CAST(length(coalesce(a.clean, n.t)) AS INT) AS clean_len,
         |  CAST(length(n.t) - length(coalesce(a.clean, n.t)) AS INT)
         |    AS removed_chars,
         |  md5(coalesce(a.clean, n.t)) AS clean_fp
         |FROM n LEFT JOIN agg a USING (doc_id)
         |ORDER BY n.doc_id""".stripMargin

  /** JL component j as the 0.0-seeded left fold over the SAME driver-side
    * ±1 matrix the engine embeds as an array literal
    * ([[graft.ops.VectorOps.jlSign]]) — identical fold order, identical
    * constants, so the projected doubles match bit-for-bit.
    */
  private def jlChainSql(j: Int, dims: Int = embDims,
      ev: String = "ev"): String = {
    val terms = (0 until dims)
      .map(d => s"$ev[${d + 1}] * ${graft.ops.VectorOps.jlSign(j, d)}")
      .mkString(", ")
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [$terms]), (a, b) -> a + b)""".stripMargin
  }

  /** Shared sign-LSH bucket CTEs (v → plane sums → 8-bit bucket) — the
    * DuckDB replica of [[graft.ops.VectorOps.signLshNearDupPairs]]'s
    * blocking, used by both the near-dup gate and the cos-calibration
    * gate.
    */
  private val signBucketCtes: String = {
    // same literal ±1 matrix as the engine (jlSign), same left-assoc chain
    val sumCols = (0 until 8).map(j => s"${jlChainSql(j)} AS s$j")
      .mkString(",\n    ")
    val bucket = (0 until 8)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    s"""v AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
       |s AS (SELECT vec_id, ev,
       |    $sumCols
       |  FROM v),
       |b AS (SELECT vec_id, ev, $bucket AS bucket FROM s)""".stripMargin
  }

  /** Sign-LSH signature CTEs over the exact-chain CTE `c` (vec_id, qv,
    * r): integer plane dots against the SAME ±1 [[graft.ops.VectorOps
    * .jlSign]] rows the engine embeds as literals, bit set iff strictly
    * positive — `sg` carries (vec_id, qv, r, sig). Shared by the
    * multi-probe gate family (q_emb_multiprobe / q_emb_lsh_serve /
    * q_emb_ann_recall).
    */
  private[queries] val lshSigCtes: String = {
    val planeSums = (0 until 8).map { j =>
      (0 until embDims).map { d =>
        s"(${graft.ops.VectorOps.jlSign(j, d).toLong}) * qv[${d + 1}]"
      }.mkString("(", " + ", s") AS s$j")
    }.mkString(",\n    ")
    val bucket = (0 until 8)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    s"""ps AS (SELECT vec_id, qv, r,
       |    $planeSums
       |  FROM c),
       |sg AS (SELECT vec_id, qv, r, $bucket AS sig FROM ps)""".stripMargin
  }

  /** The Hamming-1 probe list over a `sig` column: base + one-bit flips. */
  private[queries] val lshProbeList: String =
    ("sig" +: (0 until 8).map(j => s"xor(sig, ${1 << j})")).mkString(", ")

  /** Brute-force all-pairs mirror of [[Dedup.simhashBands]]: identical
    * integer math (md5 hex nibbles → 64 per-bit sums → majority bands →
    * hamming via bit_count(xor)), generated for 64 bits. Equality with the
    * Spark banded-LSH result at maxDist <= 3 is the pigeonhole argument
    * documented on [[Dedup.simhashPairs]].
    */
  private val simhashPairsSql: String = {
    val nibCols = (0 until 16).map(p =>
      s"instr('0123456789abcdef', substr(hx, ${p + 1}, 1)) - 1 AS nib$p")
      .mkString(",\n    ")
    val sumCols = (0 until 64).map(j =>
      s"sum((nib${j / 4} // ${1 << (j % 4)}) % 2) AS s$j").mkString(",\n    ")
    val bandCols = (0 until 4).map { t =>
      (0 until 16).map { k =>
        val j = 16 * t + k
        s"(CASE WHEN 2*s$j > ntok THEN ${1 << k} ELSE 0 END)"
      }.mkString("(", " + ", s") AS band$t")
    }.mkString(",\n    ")
    val ham = (0 until 4).map(t => s"bit_count(xor(a.band$t, b.band$t))")
      .mkString(" + ")
    raw"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tk
         |  FROM documents),
         |h AS (SELECT doc_id, md5(tk) AS hx FROM toks),
         |nib AS (SELECT doc_id,
         |    $nibCols
         |  FROM h),
         |s AS (SELECT doc_id,
         |    $sumCols,
         |    count(*) AS ntok
         |  FROM nib GROUP BY doc_id),
         |bands AS (SELECT doc_id,
         |    $bandCols
         |  FROM s)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST($ham AS INT) AS hamming
         |FROM bands a JOIN bands b ON a.doc_id < b.doc_id
         |WHERE $ham <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Exact-Jaccard all-pairs oracle; dfCap = None mirrors the uncapped
    * pipeline (sizes from the full shingle set), dfCap = Some(c) mirrors
    * [[Dedup.jaccardPairsScoped]]'s informative-shingle universe (shingles
    * with document frequency > c removed before candidates AND sizes).
    */
  private def jaccardPairsSqlFor(dfCap: Option[Int]): String = {
    val eDef = dfCap match {
      case None => "e AS (SELECT doc_id, unnest(s) AS g FROM sh)"
      case Some(c) =>
        s"""e0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
           |okg AS (SELECT g FROM e0 GROUP BY g HAVING count(*) <= $c),
           |e AS (SELECT e0.doc_id, e0.g FROM e0 JOIN okg USING (g))""".stripMargin
    }
    val sizesDef = dfCap match {
      case None => "sizes AS (SELECT doc_id, len(s) AS n FROM sh)"
      case Some(_) => "sizes AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id)"
    }
    s"""WITH sh AS $shinglesSql,
       |$eDef,
       |$sizesDef,
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE), 6)
       |    AS jaccard
       |FROM cand
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private val jaccardPairsSql = jaccardPairsSqlFor(None)

  /** Recursive-CTE mirror of [[Dedup.componentsScoped]]: duplicate clusters
    * as min reachable id over the (uncapped) exact-Jaccard pair graph.
    */
  private val dedupClustersSql: String =
    s"""WITH RECURSIVE sh AS $shinglesSql,
       |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE)
       |    >= 0.8),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(node, lab) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT e2.b, r.lab FROM reach r JOIN edges e2 ON e2.a = r.node)
       |SELECT node AS doc_id, min(lab) AS cluster_id
       |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_doc_token_count" ->
      s"""SELECT doc_id, CAST(len($toksSql) AS INT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
         |    AS INT) AS n_bpe_tokens,
         |  CAST(length(text) AS INT) AS len_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_doc_pmi" ->
      raw"""WITH w AS (
           |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws
           |  FROM documents),
           |toks AS (SELECT unnest(ws) AS term FROM w),
           |uni AS (SELECT term, CAST(count(*) AS BIGINT) AS c
           |  FROM toks GROUP BY term),
           |bgall AS (
           |  SELECT ws[i] || ' ' || ws[i+1] AS g
           |  FROM w, LATERAL (
           |    SELECT unnest(generate_series(1, len(ws) - 1)) AS i)),
           |bg AS (SELECT g, CAST(count(*) AS BIGINT) AS c_ab
           |  FROM bgall GROUP BY g HAVING count(*) >= 5),
           |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM toks),
           |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_big FROM bgall)
           |SELECT bg.g AS bigram, bg.c_ab, a.c AS c_a, b.c AS c_b,
           |  round(((CAST(bg.c_ab AS DOUBLE) * nt.n_tok) * nt.n_tok)
           |    / ((CAST(nb.n_big AS DOUBLE) * a.c) * b.c), 6) AS lift
           |FROM bg
           |JOIN uni a ON a.term = split_part(bg.g, ' ', 1)
           |JOIN uni b ON b.term = split_part(bg.g, ' ', 2)
           |CROSS JOIN nt CROSS JOIN nb
           |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin,

    "q_doc_length_bins" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($toksSql) AS INT) AS nt FROM documents),
         |c AS (
         |  SELECT quantile_cont(nt, 0.25) AS q1, quantile_cont(nt, 0.5) AS q2,
         |    quantile_cont(nt, 0.75) AS q3 FROM d),
         |b AS (
         |  SELECT nt, 1 + CAST(nt > q1 AS INT) + CAST(nt > q2 AS INT)
         |    + CAST(nt > q3 AS INT) AS bin
         |  FROM d CROSS JOIN c)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(min(nt) AS INT) AS min_tokens,
         |  CAST(max(nt) AS INT) AS max_tokens,
         |  CAST(sum(nt) AS BIGINT) AS sum_tokens
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q_doc_quality" ->
      s"""WITH b AS (
         |  SELECT doc_id, $toksSql AS toks, text FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS INT) AS n_tokens,
         |    CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1) AS praw,
         |    CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE)
         |      / greatest(len(toks), 1) AS sraw,
         |    CAST(length(trim(text)) AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), 1.0)
         |      AS awl,
         |    least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) AS lens
         |  FROM b)
         |SELECT doc_id, n_tokens, round(praw, 6) AS punct_ratio,
         |  round(sraw, 6) AS stop_ratio,
         |  round((lens
         |    + (CASE WHEN awl >= 3 AND awl <= 10 THEN 1.0 ELSE 0.25 END)
         |    + least(sraw * 5.0, 1.0)) / 3.0, 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,

    // NB replay: same synthesized labels, same smoothed integer posterior
    // per token on the doc_id%4<2 training half, same per-doc mean with
    // unseen tokens neutral at 500000 ppm, same per-class aggregates
    "q_doc_quality_clf" ->
      raw"""WITH lab AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 2 = 0 THEN text
           |      ELSE regexp_replace(lower(text), '[aeiou]', '', 'g') END
           |      AS text,
           |    CAST(1 - doc_id % 2 AS BIGINT) AS label,
           |    doc_id % 4 < 2 AS in_train
           |  FROM documents),
           |ttok AS (
           |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
           |    label
           |  FROM lab WHERE in_train),
           |model AS (
           |  SELECT tok,
           |    (sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1) * 1000000
           |      // (count(*) + 2) AS score_ppm
           |  FROM ttok GROUP BY tok),
           |stok AS (
           |  SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           |  FROM lab),
           |sc AS (
           |  SELECT s.doc_id, count(*) AS n_tokens,
           |    sum(coalesce(m.score_ppm, 500000)) // count(*) AS score_ppm
           |  FROM stok s LEFT JOIN model m USING (tok)
           |  GROUP BY s.doc_id)
           |SELECT l.label, l.in_train, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(sc.score_ppm) // count(*) AS BIGINT)
           |    AS mean_score_ppm,
           |  CAST(sum(CASE WHEN sc.score_ppm > 500000 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_clean_pred
           |FROM sc JOIN lab l ON l.doc_id = sc.doc_id
           |GROUP BY l.label, l.in_train
           |ORDER BY l.label, l.in_train""".stripMargin,

    // ECE replay: the q_doc_quality_clf NB chain scores every doc, then
    // bin = least(score div 100000, 9), per-bin integer conf/acc/gap,
    // ece = sum(n*gap) div N joined back onto each row
    "q_doc_quality_ece" ->
      raw"""WITH lab AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 2 = 0 THEN text
           |      ELSE regexp_replace(lower(text), '[aeiou]', '', 'g') END
           |      AS text,
           |    CAST(1 - doc_id % 2 AS BIGINT) AS label
           |  FROM documents),
           |ttok AS (
           |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
           |    label
           |  FROM lab WHERE doc_id % 4 < 2),
           |model AS (
           |  SELECT tok,
           |    (sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1) * 1000000
           |      // (count(*) + 2) AS score_ppm
           |  FROM ttok GROUP BY tok),
           |stok AS (
           |  SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           |  FROM lab),
           |sc AS (
           |  SELECT s.doc_id, count(*) AS n_tokens,
           |    sum(coalesce(m.score_ppm, 500000)) // count(*) AS score_ppm
           |  FROM stok s LEFT JOIN model m USING (tok)
           |  GROUP BY s.doc_id),
           |bi AS (
           |  SELECT CAST(least(sc.score_ppm // 100000, 9) AS BIGINT) AS bin,
           |    l.label AS y, sc.score_ppm AS s
           |  FROM sc JOIN lab l ON l.doc_id = sc.doc_id),
           |b AS (
           |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(y) AS BIGINT) AS n_pos,
           |    CAST(sum(s) // count(*) AS BIGINT) AS conf_ppm,
           |    CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS acc_ppm
           |  FROM bi GROUP BY bin),
           |g AS (SELECT *, abs(acc_ppm - conf_ppm) AS gap_ppm FROM b),
           |t AS (SELECT CAST(sum(n * gap_ppm) // sum(n) AS BIGINT)
           |    AS ece_ppm FROM g)
           |SELECT g.bin, g.n, g.n_pos, g.conf_ppm, g.acc_ppm, g.gap_ppm,
           |  t.ece_ppm
           |FROM g CROSS JOIN t ORDER BY g.bin""".stripMargin,

    "q_doc_fertility" ->
      s"""WITH d AS (
         |  SELECT lang, CAST(len($toksSql) AS BIGINT) AS nw,
         |    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
         |      AS BIGINT) AS nb,
         |    CAST(length(text) AS BIGINT) AS nc
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nw) AS BIGINT) AS sum_words,
         |  CAST(sum(nb) AS BIGINT) AS sum_bpe,
         |  CAST(sum(nc) AS BIGINT) AS sum_chars,
         |  CAST(sum(nb) * 1000000 // greatest(sum(nw), 1) AS BIGINT)
         |    AS fertility_micro,
         |  CAST(sum(nb) * 100000000 // greatest(sum(nc), 1) AS BIGINT)
         |    AS bpe_per_100c_micro
         |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_doc_quality_norm" ->
      s"""WITH b AS (
         |  SELECT doc_id, source, $toksSql AS toks, text FROM documents),
         |m AS (
         |  SELECT doc_id, source,
         |    CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE)
         |      / greatest(len(toks), 1) AS sraw,
         |    CAST(length(trim(text)) AS DOUBLE)
         |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS awl,
         |    least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) AS lens
         |  FROM b),
         |q AS (
         |  SELECT doc_id, source,
         |    round((lens
         |      + (CASE WHEN awl >= 3 AND awl <= 10 THEN 1.0 ELSE 0.25 END)
         |      + least(sraw * 5.0, 1.0)) / 3.0, 6) AS quality
         |  FROM m),
         |r AS (
         |  SELECT doc_id, source, quality,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY quality, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY source) AS n_src
         |  FROM q)
         |SELECT doc_id, source, quality,
         |  CAST((rk - 1) * 1000000 // greatest(n_src - 1, 1) AS BIGINT)
         |    AS q_rank_micro
         |FROM r WHERE rk * 2 > n_src ORDER BY doc_id""".stripMargin,

    "q_doc_sentences" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(string_split_regex(text, '[.!?]+'),
        |      x -> trim(x)), x -> length(x) > 0) AS segs
        |  FROM documents)
        |SELECT doc_id, CAST(len(segs) AS INT) AS n_sentences,
        |  CAST(coalesce(list_sum(list_transform(segs, x -> length(x))), 0)
        |    AS BIGINT) AS sum_sent_chars,
        |  CAST(coalesce(list_max(list_transform(segs, x -> length(x))), 0)
        |    AS INT) AS max_sent_chars,
        |  CAST(coalesce(list_sum(list_transform(segs, x -> length(x))), 0)
        |    * 1000000 // greatest(len(segs), 1) AS BIGINT) AS mean_sent_micro
        |FROM b ORDER BY doc_id""".stripMargin,

    "q_doc_vocab_growth" ->
      s"""WITH tm AS (
        |  SELECT doc_id, unnest(s) AS term FROM $shinglesSql),
        |f AS (SELECT term, min(doc_id) AS first_doc FROM tm GROUP BY term),
        |mx AS (SELECT max(doc_id) AS max_id FROM documents),
        |g AS (
        |  SELECT CAST(least(first_doc * 10 // (max_id + 1), 9) AS INT)
        |    AS decile
        |  FROM f CROSS JOIN mx),
        |h AS (SELECT decile, CAST(count(*) AS BIGINT) AS new_terms
        |  FROM g GROUP BY decile)
        |SELECT decile, new_terms,
        |  CAST(sum(new_terms) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_terms
        |FROM h ORDER BY decile""".stripMargin,

    "q_doc_ngram_novelty" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(s) AS g FROM $shinglesSql),
         |f AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g),
         |nv AS (SELECT first_doc AS doc_id,
         |    CAST(count(*) AS BIGINT) AS n_novel
         |  FROM f GROUP BY first_doc),
         |ns AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_shingles
         |  FROM $shinglesSql WHERE len(s) > 0)
         |SELECT ns.doc_id, ns.n_shingles,
         |  CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel,
         |  CAST(coalesce(nv.n_novel, 0) * 1000000
         |    // greatest(ns.n_shingles, 1) AS BIGINT) AS novelty_micro
         |FROM ns LEFT JOIN nv USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q_doc_langid" -> {
      val hitCols = TextOps.LangMarkers.map { case (lang, m) =>
        val lst = m.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, x -> x IN ($lst))) AS h_$lang"
      }.mkString(",\n    ")
      val bestExpr = TextOps.LangMarkers.map(m => s"h_${m._1}").mkString("greatest(", ", ", ")")
      val caseChain = TextOps.LangMarkers.map { case (lang, _) =>
        s"WHEN best > 0 AND h_$lang = best THEN '$lang'"
      }.mkString(" ")
      s"""WITH b AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |h AS (SELECT doc_id, lang,
         |    $hitCols
         |  FROM b),
         |m AS (SELECT *, $bestExpr AS best FROM h)
         |SELECT doc_id, lang AS labeled_lang,
         |  CASE $caseChain ELSE 'und' END AS pred_lang
         |FROM m ORDER BY doc_id""".stripMargin
    },

    // learned-langid replay: same fixture synthesis, (tok, lang) counts
    // over the train slice, vocab×L completion with add-one posteriors
    // ((n+1)·10⁶ // (n_tok + L)), held-out mean in-vocab posterior per
    // language, argmax with lang-asc tie-break — trainer and scorer
    // integer-exact end to end
    "q_doc_langid_clf" ->
      raw"""WITH base AS (SELECT doc_id,
           |    CASE doc_id % 4 WHEN 0 THEN 'de' WHEN 1 THEN 'en'
           |      WHEN 2 THEN 'es' ELSE 'fr' END AS true_lang,
           |    CASE doc_id % 4
           |      WHEN 0 THEN 'der hund und die katze sind hier oft genug'
           |      WHEN 1 THEN 'the quick brown fox and the lazy dog run often'
           |      WHEN 2 THEN 'el perro y el gato estan aqui muchas veces'
           |      ELSE 'le chat noir et le chien blanc sont souvent ici'
           |      END || ' tag' || (doc_id % 7) AS text
           |  FROM documents),
           |tr AS (SELECT * FROM base WHERE doc_id % 5 != 0),
           |ho AS (SELECT * FROM base WHERE doc_id % 5 = 0),
           |ttok AS (SELECT true_lang AS lang,
           |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           |  FROM tr),
           |cnt AS (SELECT tok, lang, CAST(count(*) AS BIGINT) AS n
           |  FROM ttok GROUP BY tok, lang),
           |nl AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS l
           |  FROM cnt),
           |vocab AS (SELECT tok, CAST(sum(n) AS BIGINT) AS n_tok
           |  FROM cnt GROUP BY tok),
           |langs AS (SELECT DISTINCT lang FROM cnt),
           |model AS (SELECT v.tok, lg.lang,
           |    ((coalesce(c.n, 0) + 1) * 1000000) // (v.n_tok + nl.l)
           |      AS post_ppm
           |  FROM vocab v CROSS JOIN langs lg CROSS JOIN nl
           |  LEFT JOIN cnt c ON c.tok = v.tok AND c.lang = lg.lang),
           |htok AS (SELECT doc_id, true_lang,
           |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           |  FROM ho),
           |sc AS (SELECT h.doc_id, h.true_lang, m.lang,
           |    CAST(count(*) AS BIGINT) AS n_seen,
           |    CAST(sum(m.post_ppm) AS BIGINT) AS s
           |  FROM htok h JOIN model m USING (tok)
           |  GROUP BY h.doc_id, h.true_lang, m.lang),
           |scr AS (SELECT doc_id, true_lang, lang,
           |    s // n_seen AS score_ppm FROM sc),
           |best AS (SELECT doc_id, max(score_ppm) AS b FROM scr
           |  GROUP BY doc_id)
           |SELECT s.doc_id, s.true_lang, min(s.lang) AS pred_lang,
           |  CAST(max(s.score_ppm) AS BIGINT) AS score_ppm
           |FROM scr s JOIN best b
           |  ON s.doc_id = b.doc_id AND s.score_ppm = b.b
           |GROUP BY s.doc_id, s.true_lang
           |ORDER BY s.doc_id""".stripMargin,

    "q_doc_lang_confusion" -> {
      val hitCols = TextOps.LangMarkers.map { case (lang, m) =>
        val lst = m.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, x -> x IN ($lst))) AS h_$lang"
      }.mkString(",\n    ")
      val bestExpr = TextOps.LangMarkers.map(m => s"h_${m._1}")
        .mkString("greatest(", ", ", ")")
      val caseChain = TextOps.LangMarkers.map { case (lang, _) =>
        s"WHEN best > 0 AND h_$lang = best THEN '$lang'"
      }.mkString(" ")
      s"""WITH b AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |h AS (SELECT doc_id, lang,
         |    $hitCols
         |  FROM b),
         |m AS (SELECT *, $bestExpr AS best FROM h),
         |p AS (SELECT lang AS labeled_lang,
         |    CASE $caseChain ELSE 'und' END AS pred_lang FROM m),
         |rt AS (SELECT labeled_lang, CAST(count(*) AS BIGINT) AS n_labeled
         |  FROM p GROUP BY labeled_lang)
         |SELECT p.labeled_lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n,
         |  CAST((count(*) * 1000000) // min(rt.n_labeled) AS BIGINT)
         |    AS share_ppm
         |FROM p JOIN rt USING (labeled_lang)
         |GROUP BY p.labeled_lang, p.pred_lang
         |ORDER BY p.labeled_lang, p.pred_lang""".stripMargin
    },

    "q_doc_lang_mismatch" -> {
      val hitCols = TextOps.LangMarkers.map { case (lang, m) =>
        val lst = m.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, x -> x IN ($lst))) AS h_$lang"
      }.mkString(",\n    ")
      val bestExpr = TextOps.LangMarkers.map(m => s"h_${m._1}")
        .mkString("greatest(", ", ", ")")
      val caseChain = TextOps.LangMarkers.map { case (lang, _) =>
        s"WHEN best > 0 AND h_$lang = best THEN '$lang'"
      }.mkString(" ")
      s"""WITH b AS (SELECT source, lang, $toksSql AS toks FROM documents),
         |h AS (SELECT source, lang,
         |    $hitCols
         |  FROM b),
         |m AS (SELECT *, $bestExpr AS best FROM h),
         |p AS (SELECT source, lang AS labeled_lang,
         |    CASE $caseChain ELSE 'und' END AS pred_lang FROM m)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN pred_lang = 'und' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_und,
         |  CAST(sum(CASE WHEN pred_lang <> 'und'
         |    AND pred_lang <> labeled_lang THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_mismatch,
         |  CAST(sum(CASE WHEN pred_lang <> 'und'
         |    AND pred_lang <> labeled_lang THEN 1 ELSE 0 END) * 1000000
         |    // greatest(count(*) - sum(CASE WHEN pred_lang = 'und'
         |      THEN 1 ELSE 0 END), 1) AS BIGINT) AS mismatch_ppm
         |FROM p GROUP BY source ORDER BY source""".stripMargin
    },

    "q_doc_stitch_pairs" ->
      raw"""WITH tk AS (
           |  SELECT doc_id,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
           |  FROM documents),
           |g AS (
           |  SELECT doc_id, array_to_string(ws[1:3], ' ') AS head_g,
           |    array_to_string(ws[len(ws)-2:len(ws)], ' ') AS tail_g
           |  FROM tk WHERE len(ws) >= 3)
           |SELECT a.doc_id AS prev_doc, b.doc_id AS next_doc,
           |  a.tail_g AS g
           |FROM g a JOIN g b ON a.tail_g = b.head_g
           |  AND a.doc_id <> b.doc_id
           |ORDER BY prev_doc, next_doc""".stripMargin,

    "q_doc_stopword_induce" ->
      raw"""WITH tm AS (
           |  SELECT doc_id, unnest(list_distinct(
           |    regexp_split_to_array(trim(lower(text)), '\s+'))) AS term
           |  FROM documents),
           |f AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tm
           |  WHERE length(term) > 0 GROUP BY term),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
           |SELECT term, df,
           |  CAST(df * 1000000 // n_docs AS BIGINT) AS df_ppm
           |FROM f CROSS JOIN n
           |WHERE df * 1000000 // n_docs >= 300000
           |ORDER BY df DESC, term""".stripMargin,

    "q_doc_dup_inflation" ->
      raw"""WITH d AS (
           |  SELECT doc_id, source,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           |      AS nt
           |  FROM documents),
           |rw AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(nt) AS BIGINT) AS raw_tokens FROM d GROUP BY source),
           |k AS (SELECT fp, min(doc_id) AS keep_id FROM d GROUP BY fp),
           |kp AS (
           |  SELECT d.source, CAST(sum(d.nt) AS BIGINT) AS kept_tokens
           |  FROM d JOIN k ON d.fp = k.fp AND d.doc_id = k.keep_id
           |  GROUP BY d.source)
           |SELECT rw.source, n_docs, raw_tokens,
           |  CAST(coalesce(kept_tokens, 0) AS BIGINT) AS kept_tokens,
           |  CAST((raw_tokens - coalesce(kept_tokens, 0)) * 1000000
           |    // greatest(raw_tokens, 1) AS BIGINT) AS inflation_ppm
           |FROM rw LEFT JOIN kp USING (source) ORDER BY source""".stripMargin,

    "q_doc_boilerplate" ->
      raw"""WITH n AS (
           |  SELECT md5(array_to_string(
           |    regexp_split_to_array(trim(lower(text)), '\s+')[1:8], ' '))
           |    AS prefix_fp
           |  FROM documents)
           |SELECT prefix_fp, CAST(count(*) AS BIGINT) AS n_docs
           |FROM n GROUP BY prefix_fp HAVING count(*) >= 2
           |ORDER BY n_docs DESC, prefix_fp""".stripMargin,

    // rules replay via DIRECT prefix compare (substr = rule), longest
    // first, allow on ties, default-allow on no match — the engine's
    // prefix-explosion join must agree
    "q_doc_url_rules" ->
      """WITH u AS (SELECT doc_id,
        |    '/sec' || (doc_id % 4) || '/page' || (doc_id % 3) AS path
        |  FROM documents),
        |r(prefix, allow) AS (VALUES ('/sec0', false),
        |  ('/sec0/page1', true), ('/sec2', false), ('/sec3/page', false)),
        |m AS (SELECT doc_id, prefix, allow, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY length(prefix) DESC, allow DESC,
        |      prefix DESC) AS rn
        |  FROM u JOIN r ON substr(u.path, 1, length(r.prefix)) = r.prefix)
        |SELECT u.doc_id, u.path, m.prefix AS matched_rule,
        |  coalesce(m.allow, true) AS allowed
        |FROM u LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // NFC replay: same planted decompositions, DuckDB's UAX #15
    "q_doc_unicode_norm" ->
      """WITH p AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 3 THEN text || ' cafe' || chr(769)
        |      WHEN doc_id % 7 = 5
        |        THEN text || ' A' || chr(776) || chr(803)
        |      ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(t) <> t AS changed,
        |  md5(nfc_normalize(t)) AS norm_fp
        |FROM p ORDER BY doc_id""".stripMargin,

    // AC-scrub replay: longest-first alternation (zz_absent 9 > row
    // fast 8 > spark = table 5), global replace — RE2 alternation is
    // leftmost-first-listed, so length-desc ordering IS leftmost-longest
    "q_doc_blocklist_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '(zz_absent|row fast|spark|table)')) AS BIGINT) AS n_hits,
        |  md5(regexp_replace(text, '(zz_absent|row fast|spark|table)',
        |    '[TERM]', 'g')) AS clean_fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // quality-decile dup profile replay: same planted predecessor-text
    // dups, same quality formula (the q_doc_quality m CTE), integer
    // deciles and ppm rates
    "q_doc_quality_dup" ->
      raw"""WITH pl AS (
           |  SELECT d.doc_id,
           |    CASE WHEN d.doc_id % 5 = 4 AND p.text IS NOT NULL
           |      THEN p.text ELSE d.text END AS text
           |  FROM documents d
           |  LEFT JOIN documents p ON p.doc_id = d.doc_id - 1),
           |b AS (SELECT doc_id,
           |    regexp_split_to_array(trim(text), '\s+') AS toks, text
           |  FROM pl),
           |m AS (SELECT doc_id,
           |    CAST(len(list_filter(toks, x -> x IN ($stopList)))
           |      AS DOUBLE) / greatest(len(toks), 1) AS sraw,
           |    CAST(length(trim(text)) AS DOUBLE)
           |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS awl,
           |    least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) AS lens,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
           |      AS fp
           |  FROM b),
           |q AS (SELECT doc_id, fp,
           |    CAST(round(round((lens
           |      + (CASE WHEN awl >= 3 AND awl <= 10 THEN 1.0 ELSE 0.25
           |         END)
           |      + least(sraw * 5.0, 1.0)) / 3.0, 6) * 1000000, 0)
           |      AS BIGINT) AS q_micro
           |  FROM m),
           |g AS (SELECT fp, count(*) AS n FROM q GROUP BY fp),
           |j AS (SELECT least(9, q_micro // 100000) AS bucket,
           |    CASE WHEN g.n > 1 THEN 1 ELSE 0 END AS isd
           |  FROM q JOIN g USING (fp))
           |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(isd) AS BIGINT) AS n_dup_docs,
           |  CAST(sum(isd) AS BIGINT) * 1000000 // count(*) AS dup_ppm
           |FROM j GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_doc_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |  CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_id
        |FROM documents GROUP BY fp ORDER BY fp""".stripMargin,

    "q_doc_shingle_stats" ->
      s"""SELECT doc_id, CAST(len(s) AS INT) AS n_shingles
         |FROM $shinglesSql ORDER BY doc_id""".stripMargin,

    "q_doc_jaccard_pairs" -> jaccardPairsSqlFor(Some(100)),

    "q_doc_dedup_clusters" -> dedupClustersSql,

    // containment replay: union the planted heads, shingle, df-cap 50,
    // shared-shingle pair counts, exact integer-div ppm both directions
    "q_doc_containment" ->
      raw"""WITH d0 AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id,
           |    array_to_string(
           |      regexp_split_to_array(trim(text), '\s+')[1:9], ' ')
           |      AS text
           |  FROM documents WHERE doc_id % 5 = 0),
           |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
           |    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |          for i in generate_series(1, len(t) - 2)]
           |    ELSE [] END) AS s
           |  FROM (SELECT doc_id,
           |      regexp_split_to_array(trim(lower(text)), '\s+') AS t
           |    FROM d0)),
           |e0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
           |okg AS (SELECT g FROM e0 GROUP BY g HAVING count(*) <= 50),
           |e AS (SELECT e0.doc_id, e0.g FROM e0 JOIN okg USING (g)),
           |sizes AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
           |cand AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    count(*) AS common
           |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT doc_a, doc_b, CAST(common AS BIGINT) AS common,
           |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           |  CAST(common * 1000000 // sa.n AS BIGINT) AS contain_a_ppm,
           |  CAST(common * 1000000 // sb.n AS BIGINT) AS contain_b_ppm
           |FROM cand
           |JOIN sizes sa ON doc_a = sa.doc_id
           |JOIN sizes sb ON doc_b = sb.doc_id
           |WHERE greatest(common * 1000000 // sa.n,
           |  common * 1000000 // sb.n) >= 800000
           |ORDER BY doc_a, doc_b""".stripMargin,

    "q_doc_simhash_pairs" -> simhashPairsSql,

    // KMV replay: distinct 52-bit md5 prefixes per lang, k-th order
    // statistic by row_number, identical integer estimate; an unfilled
    // sketch (nhash < k) reports NULL kth and the exact hash count
    // CMS replay: same seeded md5-52bit buckets (odd multiplier XOR i·φ64,
    // constants folded driver-side; & 511 is a sign-safe two's-complement
    // mask both engines compute identically), counter sums per (seed,
    // bucket), min over the 4 rows per queried term
    "q_doc_cms_freq" -> {
      val phi = -0x61c8864680b583ebL
      def bucket(src: String, i: Int): String =
        s"(xor($src * ${2 * i + 1}, ${i * phi}) & 511)"
      val rows = (0 until 4).map { i =>
        s"SELECT $i AS seed, ${bucket("base", i)} AS bucket FROM b"
      }.mkString("\n  UNION ALL ")
      val probes = (0 until 4).map { i =>
        s"SELECT term, n, $i AS seed, ${bucket("base", i)} AS bucket FROM tb"
      }.mkString("\n  UNION ALL ")
      raw"""WITH terms AS (
           |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
           |    AS term
           |  FROM documents),
           |b AS (SELECT
           |    ('0x' || substr(md5(term), 1, 15))::BIGINT // 256 AS base
           |  FROM terms),
           |e AS (SELECT seed, bucket, CAST(count(*) AS BIGINT) AS cnt
           |  FROM ($rows)
           |  GROUP BY seed, bucket),
           |f AS (SELECT term, CAST(count(*) AS BIGINT) AS n
           |  FROM terms GROUP BY term),
           |top AS (SELECT term, n FROM f ORDER BY n DESC, term LIMIT 20),
           |tb AS (SELECT term, n,
           |    ('0x' || substr(md5(term), 1, 15))::BIGINT // 256 AS base
           |  FROM top),
           |qb AS ($probes),
           |est AS (SELECT qb.term, qb.n,
           |    min(coalesce(e.cnt, 0)) AS est
           |  FROM qb LEFT JOIN e USING (seed, bucket)
           |  GROUP BY qb.term, qb.n)
           |SELECT term, n, CAST(est AS BIGINT) AS est,
           |  CAST(est - n AS BIGINT) AS over_by
           |FROM est ORDER BY n DESC, term""".stripMargin
    },

    // AMS replay: sign = bit `seed` of md5(token) (nibble seed//4, bit
    // seed%4 — one digest serves all 40 seeds), Z sums per (grp, seed),
    // integer block means (sum of squares div 8), exact middle element
    // of the 5 sorted block means, exact F2 alongside
    "q_doc_ams_f2" ->
      raw"""WITH tok AS (SELECT doc_id % 4 AS grp,
           |    unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
           |      AS w
           |  FROM documents),
           |sd AS (SELECT unnest(generate_series(0, 39)) AS seed),
           |z AS (SELECT grp, seed,
           |    CAST(sum(1 - 2 * ((('0x' || substr(md5(w),
           |      (seed // 4) + 1, 1))::BIGINT >> (seed % 4)) & 1))
           |      AS BIGINT) AS z
           |  FROM tok CROSS JOIN sd GROUP BY grp, seed),
           |bm AS (SELECT grp, seed // 8 AS blk,
           |    CAST(sum(z * z) // 8 AS BIGINT) AS blk_mean
           |  FROM z GROUP BY grp, seed // 8),
           |md AS (SELECT grp, blk_mean,
           |    row_number() OVER (PARTITION BY grp ORDER BY blk_mean)
           |      AS rn
           |  FROM bm),
           |ex AS (SELECT grp, CAST(sum(f * f) AS BIGINT) AS f2_exact
           |  FROM (SELECT grp, w, count(*) AS f FROM tok GROUP BY grp, w)
           |  GROUP BY grp)
           |SELECT md.grp, md.blk_mean AS f2_est, ex.f2_exact
           |FROM md JOIN ex USING (grp) WHERE rn = 3
           |ORDER BY md.grp""".stripMargin,

    // nearest-rank percentile replay: one global rank (DuckDB sorts; the
    // engine's bucket-offset chain must land on identical values),
    // targets at ceil(n*p/100) by integer arithmetic
    "q_doc_exact_percentile" ->
      raw"""WITH v AS (SELECT CAST(len(regexp_split_to_array(trim(text),
           |      '\s+')) AS BIGINT) AS v
           |  FROM documents),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
           |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM v),
           |p AS (SELECT unnest([25, 50, 75, 90, 99]) AS p),
           |t AS (SELECT p.p, (n.n * p.p + 99) // 100 AS rk FROM p, n)
           |SELECT t.p, r.v FROM t JOIN r USING (rk)
           |ORDER BY t.p""".stripMargin,

    // grouped-percentile replay: per-lang global rank (DuckDB sorts
    // within partitions; the engine's per-group bucket-offset chain must
    // land on identical values), targets at ceil(n_g*p/100)
    // warm-quantile-serve replay: merge(a,b) = sample(a ∪ b) (bottom-k
    // of unions composes), so the oracle is the FULL-corpus sample chain
    // — any merge/persistence bug breaks the gate
    "q_doc_quantile_serve" ->
      raw"""WITH v AS (SELECT lang, CAST(length(text) AS BIGINT) AS val,
           |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
           |      AS h
           |  FROM documents),
           |r AS (SELECT lang, val, row_number() OVER (PARTITION BY lang
           |    ORDER BY h, val) AS rn FROM v),
           |s AS (SELECT lang, val FROM r WHERE rn <= 64),
           |ns AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_sample
           |  FROM s GROUP BY lang),
           |o AS (SELECT lang, val, row_number() OVER (PARTITION BY lang
           |    ORDER BY val) AS vr FROM s),
           |pp AS (SELECT unnest([25, 50, 75, 99]) AS p)
           |SELECT o.lang, pp.p, ns.n_sample, o.val AS est
           |FROM o JOIN ns USING (lang) CROSS JOIN pp
           |WHERE o.vr = greatest((ns.n_sample * pp.p + 99) // 100, 1)
           |ORDER BY o.lang, pp.p""".stripMargin,

    // quantile-sketch replay: bottom-64 rows per lang by md5-52 hash of
    // the id string (ties to the smaller value, the TopKAgg pin), rank
    // picks ⌈n·p/100⌉ off the value-sorted sample; exact side is the
    // group-percentile chain on the full value set
    "q_doc_quantile_sketch" ->
      raw"""WITH v AS (SELECT lang, CAST(length(text) AS BIGINT) AS val,
           |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
           |      AS h
           |  FROM documents),
           |r AS (SELECT lang, val, row_number() OVER (PARTITION BY lang
           |    ORDER BY h, val) AS rn FROM v),
           |s AS (SELECT lang, val FROM r WHERE rn <= 64),
           |ns AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_sample
           |  FROM s GROUP BY lang),
           |o AS (SELECT lang, val, row_number() OVER (PARTITION BY lang
           |    ORDER BY val) AS vr FROM s),
           |pp AS (SELECT unnest([25, 50, 75, 99]) AS p),
           |est AS (SELECT o.lang, pp.p, ns.n_sample, o.val AS est
           |  FROM o JOIN ns USING (lang) CROSS JOIN pp
           |  WHERE o.vr = greatest((ns.n_sample * pp.p + 99) // 100, 1)),
           |fr AS (SELECT lang, val, row_number() OVER (PARTITION BY lang
           |    ORDER BY val) AS rk FROM v),
           |fn AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM v
           |  GROUP BY lang),
           |ex AS (SELECT fn.lang, pp.p, fr.val AS exact
           |  FROM pp, fn JOIN fr ON fn.lang = fr.lang
           |  WHERE fr.rk = (fn.n * pp.p + 99) // 100)
           |SELECT est.lang, est.p, est.n_sample, est.est, ex.exact
           |FROM est JOIN ex ON est.lang = ex.lang AND est.p = ex.p
           |ORDER BY est.lang, est.p""".stripMargin,

    "q_doc_group_percentile" ->
      raw"""WITH v AS (SELECT lang,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
           |      AS BIGINT) AS v
           |  FROM documents),
           |r AS (SELECT lang, v, row_number() OVER (PARTITION BY lang
           |    ORDER BY v) AS rk FROM v),
           |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM v
           |  GROUP BY lang),
           |p AS (SELECT unnest([25, 50, 75, 90, 99]) AS p),
           |t AS (SELECT n.lang, p.p, (n.n * p.p + 99) // 100 AS rk
           |  FROM p, n)
           |SELECT t.lang, t.p, r.v
           |FROM t JOIN r ON t.lang = r.lang AND t.rk = r.rk
           |ORDER BY t.lang, t.p""".stripMargin,

    // weighted-percentile replay: per-lang cumulative weight over value
    // order, target = ceil(W_g*p/100), row by interval membership
    // (cum - w, cum] — the selected VALUE is tie-order-invariant
    "q_doc_wgt_percentile" ->
      raw"""WITH v AS (SELECT lang,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
           |      AS BIGINT) AS v
           |  FROM documents),
           |w AS (SELECT lang, v, v AS w FROM v),
           |c AS (SELECT lang, v, w,
           |    sum(w) OVER (PARTITION BY lang ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS cum
           |  FROM w),
           |n AS (SELECT lang, CAST(sum(w) AS BIGINT) AS tw FROM w
           |  GROUP BY lang),
           |p AS (SELECT unnest([25, 50, 75, 90, 99]) AS p),
           |t AS (SELECT n.lang, p.p, (n.tw * p.p + 99) // 100 AS tgt
           |  FROM p, n)
           |SELECT t.lang, t.p, c.v
           |FROM t JOIN c ON c.lang = t.lang
           |  AND t.tgt > c.cum - c.w AND t.tgt <= c.cum
           |ORDER BY t.lang, t.p""".stripMargin,

    "q_doc_kmv_distinct" ->
      raw"""WITH t AS (SELECT lang,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS t
           |  FROM documents),
           |shr AS (SELECT lang, unnest(CASE WHEN len(t) >= 3
           |    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |          for i in generate_series(1, len(t) - 2)]
           |    ELSE [] END) AS sh
           |  FROM t),
           |h AS (SELECT DISTINCT lang,
           |    ('0x' || substr(md5(sh), 1, 13))::BIGINT AS hv
           |  FROM shr),
           |rk AS (SELECT lang, hv, row_number() OVER (
           |    PARTITION BY lang ORDER BY hv) AS rn FROM h),
           |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS nhash,
           |    max(CASE WHEN rn = 128 THEN hv END) AS kth128
           |  FROM rk GROUP BY lang),
           |ex AS (SELECT lang, CAST(count(DISTINCT sh) AS BIGINT)
           |    AS n_exact
           |  FROM shr GROUP BY lang)
           |SELECT a.lang, least(a.nhash, 128) AS k_used,
           |  a.kth128 AS kth_min,
           |  CASE WHEN a.nhash < 128 THEN a.nhash
           |    ELSE (127 * 4503599627370496) // a.kth128 END AS est,
           |  ex.n_exact
           |FROM a JOIN ex USING (lang) ORDER BY a.lang""".stripMargin,

    // HLL replay: 52-bit md5 hash split top-8/low-44, rank = leading
    // zeros + 1 via bin() bit-length, register max, harmonic sum as
    // exact 2^(45-reg) integers (empty registers contribute 2^45), and
    // the same m^2*2^45 // T floor-div alpha chain the engine computes
    "q_doc_hll_distinct" ->
      raw"""WITH t AS (SELECT lang,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS t
           |  FROM documents),
           |shr AS (SELECT lang, unnest(CASE WHEN len(t) >= 3
           |    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |          for i in generate_series(1, len(t) - 2)]
           |    ELSE [] END) AS sh
           |  FROM t),
           |h AS (SELECT lang,
           |    ('0x' || substr(md5(sh), 1, 13))::BIGINT AS hv
           |  FROM shr),
           |rr AS (SELECT lang, hv // 17592186044416 AS idx,
           |    hv % 17592186044416 AS w FROM h),
           |rk AS (SELECT lang, idx, CASE WHEN w = 0 THEN 45
           |    ELSE 45 - length(bin(w)) END AS rnk FROM rr),
           |regs AS (SELECT lang, idx, max(rnk) AS reg
           |  FROM rk GROUP BY lang, idx),
           |ag AS (SELECT lang,
           |    CAST(256 - count(*) AS BIGINT) AS v_empty,
           |    CAST(sum(1::BIGINT << (45 - reg)) AS BIGINT)
           |      + (256 - count(*)) * 35184372088832 AS tt
           |  FROM regs GROUP BY lang),
           |ex AS (SELECT lang, CAST(count(DISTINCT sh) AS BIGINT)
           |    AS n_exact
           |  FROM shr GROUP BY lang)
           |SELECT ag.lang, ag.v_empty,
           |  CAST(((2305843009213693952 // ag.tt) * 718273) // 1000000
           |    AS BIGINT) AS est,
           |  ex.n_exact
           |FROM ag JOIN ex USING (lang) ORDER BY ag.lang""".stripMargin,

    // serve replay: merge(stored even-half registers, odd-half batch)
    // must equal the FULL-corpus sketch (register max is a set union),
    // so the oracle is exactly the q_doc_hll_distinct chain
    "q_doc_hll_serve" ->
      raw"""WITH t AS (SELECT lang,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS t
           |  FROM documents),
           |shr AS (SELECT lang, unnest(CASE WHEN len(t) >= 3
           |    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |          for i in generate_series(1, len(t) - 2)]
           |    ELSE [] END) AS sh
           |  FROM t),
           |h AS (SELECT lang,
           |    ('0x' || substr(md5(sh), 1, 13))::BIGINT AS hv
           |  FROM shr),
           |rr AS (SELECT lang, hv // 17592186044416 AS idx,
           |    hv % 17592186044416 AS w FROM h),
           |rk AS (SELECT lang, idx, CASE WHEN w = 0 THEN 45
           |    ELSE 45 - length(bin(w)) END AS rnk FROM rr),
           |regs AS (SELECT lang, idx, max(rnk) AS reg
           |  FROM rk GROUP BY lang, idx),
           |ag AS (SELECT lang,
           |    CAST(256 - count(*) AS BIGINT) AS v_empty,
           |    CAST(sum(1::BIGINT << (45 - reg)) AS BIGINT)
           |      + (256 - count(*)) * 35184372088832 AS tt
           |  FROM regs GROUP BY lang),
           |ex AS (SELECT lang, CAST(count(DISTINCT sh) AS BIGINT)
           |    AS n_exact
           |  FROM shr GROUP BY lang)
           |SELECT ag.lang, ag.v_empty,
           |  CAST(((2305843009213693952 // ag.tt) * 718273) // 1000000
           |    AS BIGINT) AS est,
           |  ex.n_exact
           |FROM ag JOIN ex USING (lang) ORDER BY ag.lang""".stripMargin,

    // warm-serve replay: merge(a,b) = sketch(a ∪ b), so the oracle is
    // the full-corpus register chain (same CTEs as q_doc_hll_serve,
    // minus the exact audit column that gate carries)
    "q_doc_hll_serve_warm" ->
      raw"""WITH t AS (SELECT lang,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS t
           |  FROM documents),
           |shr AS (SELECT lang, unnest(CASE WHEN len(t) >= 3
           |    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |          for i in generate_series(1, len(t) - 2)]
           |    ELSE [] END) AS sh
           |  FROM t),
           |h AS (SELECT lang,
           |    ('0x' || substr(md5(sh), 1, 13))::BIGINT AS hv
           |  FROM shr),
           |rr AS (SELECT lang, hv // 17592186044416 AS idx,
           |    hv % 17592186044416 AS w FROM h),
           |rk AS (SELECT lang, idx, CASE WHEN w = 0 THEN 45
           |    ELSE 45 - length(bin(w)) END AS rnk FROM rr),
           |regs AS (SELECT lang, idx, max(rnk) AS reg
           |  FROM rk GROUP BY lang, idx),
           |ag AS (SELECT lang,
           |    CAST(256 - count(*) AS BIGINT) AS v_empty,
           |    CAST(sum(1::BIGINT << (45 - reg)) AS BIGINT)
           |      + (256 - count(*)) * 35184372088832 AS tt
           |  FROM regs GROUP BY lang)
           |SELECT lang, v_empty,
           |  CAST(((2305843009213693952 // tt) * 718273) // 1000000
           |    AS BIGINT) AS est
           |FROM ag ORDER BY lang""".stripMargin,

    // theta-overlap replay: per-side distinct 52-bit hashes, kth-order
    // thetas (unfilled side -> full hash space), retained-below-theta
    // union/intersection counts, integer scaling — plus the exact
    // distinct intersection
    "q_doc_kmv_overlap" ->
      raw"""WITH t AS (SELECT doc_id, lang,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS t
           |  FROM documents),
           |shr AS (SELECT doc_id, lang, unnest(CASE WHEN len(t) >= 3
           |    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |          for i in generate_series(1, len(t) - 2)]
           |    ELSE [] END) AS sh
           |  FROM t),
           |ha AS (SELECT DISTINCT lang,
           |    ('0x' || substr(md5(sh), 1, 13))::BIGINT AS hv
           |  FROM shr WHERE doc_id % 2 = 0),
           |hb AS (SELECT DISTINCT lang,
           |    ('0x' || substr(md5(sh), 1, 13))::BIGINT AS hv
           |  FROM shr WHERE doc_id % 2 = 1),
           |ra AS (SELECT lang, hv, row_number() OVER (
           |    PARTITION BY lang ORDER BY hv) AS rn FROM ha),
           |rb AS (SELECT lang, hv, row_number() OVER (
           |    PARTITION BY lang ORDER BY hv) AS rn FROM hb),
           |sa AS (SELECT lang, CAST(count(*) AS BIGINT) AS na,
           |    max(CASE WHEN rn = 128 THEN hv END) AS ka
           |  FROM ra GROUP BY lang),
           |sb AS (SELECT lang, CAST(count(*) AS BIGINT) AS nb,
           |    max(CASE WHEN rn = 128 THEN hv END) AS kb
           |  FROM rb GROUP BY lang),
           |th AS (SELECT sa.lang,
           |    least(CASE WHEN na < 128 THEN 4503599627370496 ELSE ka END,
           |          CASE WHEN nb < 128 THEN 4503599627370496 ELSE kb END)
           |      AS th,
           |    CASE WHEN na < 128 THEN na
           |      ELSE (127 * 4503599627370496) // ka END AS est_a,
           |    CASE WHEN nb < 128 THEN nb
           |      ELSE (127 * 4503599627370496) // kb END AS est_b
           |  FROM sa JOIN sb ON sa.lang = sb.lang),
           |keepa AS (SELECT lang, hv FROM ra WHERE rn <= 128),
           |keepb AS (SELECT lang, hv FROM rb WHERE rn <= 128),
           |uni AS (SELECT th.lang, CAST(count(DISTINCT u.hv) AS BIGINT)
           |    AS nu
           |  FROM th LEFT JOIN (SELECT * FROM keepa
           |    UNION SELECT * FROM keepb) u
           |    ON u.lang = th.lang AND u.hv < th.th
           |  GROUP BY th.lang),
           |ints AS (SELECT th.lang, CAST(count(i.hv) AS BIGINT) AS ni
           |  FROM th LEFT JOIN (SELECT keepa.lang, keepa.hv FROM keepa
           |    JOIN keepb ON keepa.lang = keepb.lang
           |      AND keepa.hv = keepb.hv) i
           |    ON i.lang = th.lang AND i.hv < th.th
           |  GROUP BY th.lang),
           |ex AS (SELECT a.lang,
           |    CAST(count(DISTINCT a.sh) AS BIGINT) AS n_exact_intersect
           |  FROM (SELECT DISTINCT lang, sh FROM shr WHERE doc_id % 2 = 0) a
           |  JOIN (SELECT DISTINCT lang, sh FROM shr WHERE doc_id % 2 = 1) b
           |    ON a.lang = b.lang AND a.sh = b.sh
           |  GROUP BY a.lang)
           |SELECT th.lang, th.est_a, th.est_b,
           |  (uni.nu * 4503599627370496) // th.th AS est_union,
           |  (coalesce(ints.ni, 0) * 4503599627370496) // th.th
           |    AS est_intersect,
           |  coalesce(ex.n_exact_intersect, 0) AS n_exact_intersect
           |FROM th JOIN uni ON th.lang = uni.lang
           |JOIN ints ON th.lang = ints.lang
           |LEFT JOIN ex ON th.lang = ex.lang
           |ORDER BY th.lang""".stripMargin,

    // sorted-neighborhood replay: one global rank over the normalized
    // key, rank-gap pairs in [1, 3], list_intersect Jaccard; the
    // both-empty-shingle-set pair is defined as jaccard 10^6 (identical
    // empty sets), same CASE both engines
    "q_doc_sorted_neighborhood" ->
      raw"""WITH n AS (SELECT doc_id,
           |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS skey
           |  FROM documents),
           |sh AS $shinglesSql,
           |sz AS (SELECT doc_id, s, len(s) AS n FROM sh),
           |r AS (SELECT doc_id,
           |    row_number() OVER (ORDER BY skey, doc_id) AS rk
           |  FROM n),
           |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    b.rk - a.rk AS gap
           |  FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 3),
           |j AS (SELECT p.doc_a, p.doc_b, p.gap,
           |    len(list_intersect(sa.s, sb.s)) AS c,
           |    sa.n AS na, sb.n AS nb
           |  FROM p JOIN sz sa ON p.doc_a = sa.doc_id
           |  JOIN sz sb ON p.doc_b = sb.doc_id)
           |SELECT doc_a, doc_b, gap,
           |  CAST(CASE WHEN na + nb - c = 0 THEN 1000000
           |    ELSE (c * 1000000) // (na + nb - c) END AS BIGINT)
           |    AS jaccard_ppm
           |FROM j ORDER BY doc_a, doc_b""".stripMargin,

    // priority-sample replay: md5-40bit uniforms, integer priorities,
    // rank 33 is tau (0 if the population never fills k+1), kept = top 32
    "q_doc_priority_sample" ->
      raw"""WITH w AS (SELECT doc_id,
           |    greatest(CAST(len(regexp_split_to_array(trim(text), '\s+'))
           |      AS BIGINT), 1) AS n_tokens
           |  FROM documents),
           |q AS (SELECT doc_id, n_tokens,
           |    (n_tokens * 1099511627776)
           |      // (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10))
           |        ::BIGINT + 1) AS prio
           |  FROM w),
           |r AS (SELECT doc_id, n_tokens, prio,
           |    row_number() OVER (ORDER BY prio DESC, doc_id) AS rn,
           |    count(*) OVER () AS nt
           |  FROM q),
           |b AS (SELECT CASE WHEN max(nt) >= 33
           |      THEN max(CASE WHEN rn = 33 THEN prio END)
           |      ELSE CAST(0 AS BIGINT) END AS tau
           |  FROM r)
           |SELECT r.doc_id, r.n_tokens, r.prio, b.tau,
           |  greatest(r.n_tokens, b.tau) AS w_hat
           |FROM r, b WHERE r.rn <= 32
           |ORDER BY r.prio DESC, r.doc_id""".stripMargin,

    // overlap-matrix replay: one ranked-hash table per source, kth-order
    // thetas pairwise (source_a < source_b), retained-below-theta
    // union/intersection, integer scaling + ppm Jaccard
    "q_doc_kmv_matrix" ->
      raw"""WITH t AS (SELECT source,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS t
           |  FROM documents),
           |shr AS (SELECT source, unnest(CASE WHEN len(t) >= 3
           |    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |          for i in generate_series(1, len(t) - 2)]
           |    ELSE [] END) AS sh
           |  FROM t),
           |h AS (SELECT DISTINCT source,
           |    ('0x' || substr(md5(sh), 1, 13))::BIGINT AS hv
           |  FROM shr),
           |rk AS (SELECT source, hv, row_number() OVER (
           |    PARTITION BY source ORDER BY hv) AS rn FROM h),
           |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
           |    max(CASE WHEN rn = 128 THEN hv END) AS kth
           |  FROM rk GROUP BY source),
           |keep AS (SELECT source, hv FROM rk WHERE rn <= 128),
           |p AS (SELECT a.source AS grp_a, b.source AS grp_b,
           |    least(CASE WHEN a.n < 128 THEN 4503599627370496
           |               ELSE a.kth END,
           |          CASE WHEN b.n < 128 THEN 4503599627370496
           |               ELSE b.kth END) AS th,
           |    CASE WHEN a.n < 128 THEN a.n
           |      ELSE (127 * 4503599627370496) // a.kth END AS est_a,
           |    CASE WHEN b.n < 128 THEN b.n
           |      ELSE (127 * 4503599627370496) // b.kth END AS est_b
           |  FROM s a JOIN s b ON a.source < b.source),
           |uni AS (SELECT p.grp_a, p.grp_b,
           |    CAST(count(DISTINCT u.hv) AS BIGINT) AS nu
           |  FROM p LEFT JOIN keep u
           |    ON (u.source = p.grp_a OR u.source = p.grp_b)
           |      AND u.hv < p.th
           |  GROUP BY p.grp_a, p.grp_b),
           |ints AS (SELECT p.grp_a, p.grp_b,
           |    CAST(count(i.hv) AS BIGINT) AS ni
           |  FROM p LEFT JOIN (SELECT ka.source AS sa, kb.source AS sb,
           |      ka.hv
           |    FROM keep ka JOIN keep kb ON ka.hv = kb.hv) i
           |    ON i.sa = p.grp_a AND i.sb = p.grp_b AND i.hv < p.th
           |  GROUP BY p.grp_a, p.grp_b),
           |sc AS (SELECT p.grp_a, p.grp_b, p.est_a, p.est_b,
           |    (uni.nu * 4503599627370496) // p.th AS est_union,
           |    (ints.ni * 4503599627370496) // p.th AS est_intersect
           |  FROM p JOIN uni ON p.grp_a = uni.grp_a AND p.grp_b = uni.grp_b
           |  JOIN ints ON p.grp_a = ints.grp_a AND p.grp_b = ints.grp_b)
           |SELECT grp_a, grp_b, est_a, est_b, est_union, est_intersect,
           |  CAST((est_intersect * 1000000) // greatest(est_union, 1)
           |    AS BIGINT) AS jaccard_ppm
           |FROM sc ORDER BY grp_a, grp_b""".stripMargin,

    // b-bit minhash replay: md5-60bit base >> 8 through the same seeded
    // family (base·(2i+1) XOR i·φ64, constants Java-wrapped driver-side),
    // per-doc register mins, 3-bit sketch word, band-slice candidates,
    // collision-corrected estimate, exact Jaccard alongside
    "q_doc_bbit_minhash" -> {
      val phi = -0x61c8864680b583ebL
      val regCols = (0 until 16).map { i =>
        s"min(xor(base * ${2 * i + 1}, ${i * phi})) AS g$i"
      }.mkString(",\n    ")
      val sketch = (0 until 16)
        .map(i => s"((g$i & 7) << ${3 * i})").mkString(" + ")
      val bandRows = (0 until 4).map { bb =>
        val lst = (0 until 4).map(j => s"g${4 * bb + j}").mkString(", ")
        s"SELECT doc_id, sketch, $bb AS band, [$lst] AS bucket FROM sk"
      }.mkString("\n  UNION ALL ")
      val eq = (0 until 16)
        .map(i => s"(CASE WHEN ((a.ska >> ${3 * i}) & 7) = " +
          s"((a.skb >> ${3 * i}) & 7) THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH sh AS $shinglesSql,
         |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |hh AS (SELECT doc_id,
         |    ('0x' || substr(md5(g), 1, 15))::BIGINT // 256 AS base
         |  FROM e),
         |regs AS (SELECT doc_id,
         |    $regCols
         |  FROM hh GROUP BY doc_id),
         |sk AS (SELECT *, CAST($sketch AS BIGINT) AS sketch FROM regs),
         |bd AS ($bandRows),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    x.sketch AS ska, y.sketch AS skb
         |  FROM bd x JOIN bd y ON x.band = y.band AND x.bucket = y.bucket
         |    AND x.doc_id < y.doc_id),
         |m AS (SELECT a.doc_a, a.doc_b, CAST($eq AS BIGINT) AS eq
         |  FROM cand a),
         |est AS (SELECT doc_a, doc_b, eq,
         |    greatest(CAST(0 AS BIGINT),
         |      ((eq * 1000000 // 16) - 125000) * 1000000 // 875000)
         |      AS jhat_ppm
         |  FROM m),
         |sz AS (SELECT doc_id, s, len(s) AS n FROM sh)
         |SELECT est.doc_a, est.doc_b, est.eq, est.jhat_ppm,
         |  (len(list_intersect(sa.s, sb.s)) * 1000000)
         |    // (sa.n + sb.n - len(list_intersect(sa.s, sb.s)))
         |    AS jaccard_ppm
         |FROM est JOIN sz sa ON est.doc_a = sa.doc_id
         |JOIN sz sb ON est.doc_b = sb.doc_id
         |ORDER BY est.doc_a, est.doc_b""".stripMargin
    },

    // LSH with 32 bands x 2 rows has recall ≈ 1 at j >= 0.8 and exact-Jaccard
    // verification → its output equals the brute-force pair set.
    "q_doc_minhash_lsh" -> jaccardPairsSql,

    "q_emb_dup_consistency" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
         |SELECT p.doc_a, p.doc_b, p.jaccard,
         |  round(${cosSql("a.ev", "b.ev")}, 6) AS cos,
         |  round(${cosSql("a.ev", "b.ev")}, 6) >= 0.9 AS consistent
         |FROM ($jaccardPairsSql) p
         |JOIN e a ON p.doc_a = a.vec_id
         |JOIN e b ON p.doc_b = b.vec_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    // both pair sets replayed from their own oracles, composed as nested
    // WITH subqueries; recall in integer ppm (floor division both sides)
    "q_doc_simhash_recall" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_truth,
         |  CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hit,
         |  CAST(coalesce(sum(hit), 0) * 1000000 // greatest(count(*), 1)
         |    AS BIGINT) AS recall_ppm
         |FROM ($jaccardPairsSql) tr
         |LEFT JOIN (SELECT doc_a, doc_b, 1 AS hit
         |           FROM ($simhashPairsSql) ap) a
         |  USING (doc_a, doc_b)""".stripMargin,

    "q_doc_dup_spans" ->
      raw"""WITH n AS (
           |  SELECT doc_id,
           |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
           |  FROM documents),
           |w AS (
           |  SELECT doc_id,
           |    unnest([substr(t, i, 40)
           |            for i in generate_series(1, length(t) - 39, 10)]) AS win
           |  FROM n WHERE length(t) >= 40)
           |SELECT win, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |  CAST(count(*) AS BIGINT) AS n_occ
           |FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2
           |ORDER BY n_docs DESC, n_occ DESC, win LIMIT 20""".stripMargin,

    "q_doc_dup_coverage" ->
      raw"""WITH n AS (
           |  SELECT doc_id,
           |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
           |  FROM documents),
           |w AS (
           |  SELECT doc_id,
           |    unnest([substr(t, i, 40)
           |            for i in generate_series(1, length(t) - 39, 10)]) AS win
           |  FROM n WHERE length(t) >= 40),
           |s AS (SELECT win, count(DISTINCT doc_id) AS nd FROM w GROUP BY win)
           |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
           |  CAST(sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_dup,
           |  (CAST(sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    * 1000000) // CAST(count(*) AS BIGINT) AS dup_ppm
           |FROM w JOIN s USING (win)
           |GROUP BY w.doc_id
           |ORDER BY w.doc_id""".stripMargin,

    // span-removal replay: same removal decision (window in >= 2 docs,
    // holder != min doc_id), then a per-CHARACTER keep/drop — contiguous
    // dropped runs == the engine's merged intervals, and the ordered
    // string_agg of kept chars == its stitched rewrite
    "q_doc_span_dedup" -> spanReplaySql(40, 10),

    // identical per-character replay at stride 1 / minLen 25 — the
    // boundary-exact variant differs ONLY in the window grid
    "q_doc_span_exact" -> spanReplaySql(25, 1),

    "q_doc_span_filter" ->
      raw"""WITH n AS (
           |  SELECT doc_id,
           |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
           |  FROM documents),
           |w AS (
           |  SELECT doc_id,
           |    unnest([substr(t, i, 40)
           |            for i in generate_series(1, length(t) - 39, 10)]) AS win
           |  FROM n WHERE length(t) >= 40),
           |sp AS (SELECT win, count(DISTINCT doc_id) AS nd FROM w
           |  GROUP BY win),
           |cov AS (
           |  SELECT w.doc_id,
           |    (CAST(sum(CASE WHEN sp.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |      * 1000000) // CAST(count(*) AS BIGINT) AS dup_ppm
           |  FROM w JOIN sp USING (win) GROUP BY w.doc_id)
           |SELECT d.lang, CAST(count(*) AS BIGINT) AS n,
           |  min(d.doc_id) AS min_id, max(d.doc_id) AS max_id
           |FROM documents d LEFT JOIN cov ON cov.doc_id = d.doc_id
           |WHERE cov.dup_ppm IS NULL OR cov.dup_ppm < 500000
           |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "q_doc_rolling_fp" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(substr(t, i, 1)) AS BIGINT)
        |       for i in generate_series(1, length(t))]),
        |    (h, c) -> (h * 31 + c) % 2147483647) AS fp
        |FROM n ORDER BY doc_id""".stripMargin,

    "q_doc_tfidf" ->
      raw"""WITH t AS (
           |  SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           |  FROM t GROUP BY doc_id, term),
           |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df_t
           |  FROM tf GROUP BY term),
           |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents)
           |SELECT tf.doc_id, tf.term, tf.tf, df.df_t,
           |  round(tf.tf * ln(nd / df_t), 6) AS tfidf
           |FROM tf JOIN df USING (term) CROSS JOIN n
           |ORDER BY tf.doc_id, tf.term""".stripMargin,

    "q_doc_keywords" ->
      raw"""WITH t AS (
           |  SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           |  FROM t GROUP BY doc_id, term),
           |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df_t
           |  FROM tf GROUP BY term),
           |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
           |s AS (
           |  SELECT tf.doc_id, tf.term,
           |    CAST(round(tf.tf * ln(nd / df_t) * 1e6, 0) AS BIGINT)
           |      AS w_micro
           |  FROM tf JOIN df USING (term) CROSS JOIN n),
           |r AS (
           |  SELECT doc_id, term, w_micro,
           |    CAST(row_number() OVER (PARTITION BY doc_id
           |      ORDER BY w_micro DESC, term) AS INT) AS rank
           |  FROM s)
           |SELECT doc_id, rank, term, w_micro FROM r WHERE rank <= 3
           |ORDER BY doc_id, rank""".stripMargin,

    "q_doc_hash_split" ->
      raw"""WITH n AS (
           |  SELECT doc_id,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
           |  FROM documents),
           |b AS (SELECT doc_id,
           |    ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
           |   + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
           |   + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
           |   + (instr('0123456789abcdef', substr(h, 4, 1)) - 1)) % 100 AS bk
           |  FROM n),
           |s AS (SELECT doc_id,
           |    CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM b)
           |SELECT split, CAST(count(*) AS BIGINT) AS n, min(doc_id) AS min_id
           |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q_doc_bpe_pairs" ->
      raw"""WITH terms AS (
           |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |words AS (SELECT term, CAST(count(*) AS BIGINT) AS f
           |          FROM terms GROUP BY term),
           |idx AS (SELECT term, f,
           |    unnest(generate_series(1, length(term) - 1)) AS i
           |  FROM words WHERE length(term) >= 2),
           |p AS (SELECT substr(term, i, 2) AS pair, CAST(sum(f) AS BIGINT) AS n
           |      FROM idx GROUP BY pair)
           |SELECT CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT) AS rk,
           |  pair, n
           |FROM p ORDER BY rk LIMIT 20""".stripMargin,

    "q_doc_heavy_hitters" ->
      """WITH terms AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |f AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM terms GROUP BY term)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, term) AS INT) AS rk,
        |  term, n
        |FROM f ORDER BY rk""".stripMargin,

    "q_doc_term_freq" ->
      """WITH terms AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |f AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM terms GROUP BY term),
        |r AS (SELECT term, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, term) AS INT) AS rk FROM f)
        |SELECT rk, term, n FROM r WHERE rk <= 50 ORDER BY rk""".stripMargin,

    "q_emb_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 3),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |s AS (SELECT q.query_id, c.vec_id, ${cosSql("c.ev", "q.qv")} AS cos
         |  FROM c CROSS JOIN q WHERE c.vec_id != q.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, vec_id) AS INT) AS rank FROM s)
         |SELECT query_id, rank, vec_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // MMR replay: integer-exact brute top-6 (cos desc, id asc tie pin),
    // pairwise candidate sims on the same icos chain, then the k=3
    // greedy rounds UNROLLED — round r's penalty is the max sim to the
    // r−1 already-picked ids, argmax pinned (m desc, id DESC = the
    // engine's struct-max larger-id tie)
    "q_emb_mmr" ->
      s"""WITH v AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
         |${exactChainSql("v", "c")},
         |q AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r
         |  FROM c WHERE vec_id < 6),
         |sc AS (SELECT q.query_id, c.vec_id,
         |    ${icosSql("c.qv", "c.r", "q.qq", "q.q_r")} AS rel
         |  FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id),
         |rk AS (SELECT query_id, vec_id, rel, row_number() OVER (
         |    PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rn
         |  FROM sc WHERE rel IS NOT NULL),
         |cand AS (SELECT query_id, vec_id, rel FROM rk WHERE rn <= 6),
         |cw AS (SELECT cand.query_id, cand.vec_id, c.qv, c.r
         |  FROM cand JOIN c USING (vec_id)),
         |pr AS (SELECT x.query_id, x.vec_id AS a, y.vec_id AS b,
         |    ${icosSql("x.qv", "x.r", "y.qv", "y.r")} AS s
         |  FROM cw x JOIN cw y
         |    ON x.query_id = y.query_id AND x.vec_id < y.vec_id),
         |m1 AS (SELECT query_id, vec_id, 700000 * rel AS m FROM cand),
         |p1 AS (SELECT query_id, vec_id, m, row_number() OVER (
         |    PARTITION BY query_id ORDER BY m DESC, vec_id DESC) AS rn
         |  FROM m1),
         |s1 AS (SELECT query_id, vec_id AS id1, m AS sm1 FROM p1
         |  WHERE rn = 1),
         |pen2 AS (SELECT cand.query_id, cand.vec_id, cand.rel,
         |    max(CASE WHEN (pr.a = cand.vec_id AND pr.b = s1.id1)
         |          OR (pr.b = cand.vec_id AND pr.a = s1.id1)
         |        THEN pr.s END) AS pen
         |  FROM cand JOIN s1 USING (query_id)
         |  LEFT JOIN pr ON pr.query_id = cand.query_id
         |  WHERE cand.vec_id <> s1.id1
         |  GROUP BY cand.query_id, cand.vec_id, cand.rel),
         |m2 AS (SELECT query_id, vec_id,
         |    700000 * rel - 300000 * coalesce(pen, 0) AS m FROM pen2),
         |p2 AS (SELECT query_id, vec_id, m, row_number() OVER (
         |    PARTITION BY query_id ORDER BY m DESC, vec_id DESC) AS rn
         |  FROM m2),
         |s2 AS (SELECT query_id, vec_id AS id2, m AS sm2 FROM p2
         |  WHERE rn = 1),
         |pen3 AS (SELECT cand.query_id, cand.vec_id, cand.rel,
         |    max(CASE WHEN (pr.a = cand.vec_id
         |            AND pr.b IN (s1.id1, s2.id2))
         |          OR (pr.b = cand.vec_id
         |            AND pr.a IN (s1.id1, s2.id2))
         |        THEN pr.s END) AS pen
         |  FROM cand JOIN s1 USING (query_id) JOIN s2 USING (query_id)
         |  LEFT JOIN pr ON pr.query_id = cand.query_id
         |  WHERE cand.vec_id NOT IN (s1.id1, s2.id2)
         |  GROUP BY cand.query_id, cand.vec_id, cand.rel),
         |m3 AS (SELECT query_id, vec_id,
         |    700000 * rel - 300000 * coalesce(pen, 0) AS m FROM pen3),
         |p3 AS (SELECT query_id, vec_id, m, row_number() OVER (
         |    PARTITION BY query_id ORDER BY m DESC, vec_id DESC) AS rn
         |  FROM m3),
         |s3 AS (SELECT query_id, vec_id AS id3, m AS sm3 FROM p3
         |  WHERE rn = 1)
         |SELECT query_id, CAST(1 AS INT) AS mmr_rank, id1 AS vec_id,
         |  sm1 AS mmr_score FROM s1
         |UNION ALL SELECT query_id, CAST(2 AS INT), id2, sm2 FROM s2
         |UNION ALL SELECT query_id, CAST(3 AS INT), id3, sm3 FROM s3
         |ORDER BY query_id, mmr_rank""".stripMargin,

    // multi-probe replay: the same ±1 plane rows over the scale-1e5 qv
    // (integer plane dots, bit set iff strictly positive), base + one-
    // bit-flip probe buckets via xor, exact integer cosine, row_number
    // top-5 with the (cos_x1m desc, vec_id) tie pin
    // LSH-margin replay: shared sig CTEs, each direction's candidates
    // from the probed buckets only (a candidate's single sig matches at
    // most one probe bucket — no dedup needed), per-direction top-4 by
    // (cos desc, id), then the IDENTICAL margin tail as brute/IVF/PQ
    "q_emb_margin_lsh" ->
      s"""WITH v AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
         |${exactChainSql("v", "c")},
         |$lshSigCtes,
         |qf AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r,
         |    unnest([$lshProbeList]) AS bucket
         |  FROM sg WHERE vec_id % 2 = 0),
         |cf AS (SELECT q.query_id AS src_id, t.vec_id AS tgt_id,
         |    ${icosSql("t.qv", "t.r", "q.qq", "q.q_r")} AS cos_x1m
         |  FROM qf q JOIN sg t ON t.sig = q.bucket
         |  WHERE t.vec_id % 2 = 1),
         |fr AS (SELECT src_id, tgt_id, cos_x1m, row_number() OVER (
         |    PARTITION BY src_id ORDER BY cos_x1m DESC, tgt_id) AS rn
         |  FROM cf WHERE cos_x1m IS NOT NULL),
         |fwd AS (SELECT src_id, tgt_id, cos_x1m FROM fr WHERE rn <= 4),
         |qb AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r,
         |    unnest([$lshProbeList]) AS bucket
         |  FROM sg WHERE vec_id % 2 = 1),
         |cb AS (SELECT t.vec_id AS src_id, q.query_id AS tgt_id,
         |    ${icosSql("t.qv", "t.r", "q.qq", "q.q_r")} AS cos_x1m
         |  FROM qb q JOIN sg t ON t.sig = q.bucket
         |  WHERE t.vec_id % 2 = 0),
         |br AS (SELECT src_id, tgt_id, cos_x1m, row_number() OVER (
         |    PARTITION BY tgt_id ORDER BY cos_x1m DESC, src_id) AS rn
         |  FROM cb WHERE cos_x1m IS NOT NULL),
         |bwd AS (SELECT src_id, tgt_id, cos_x1m FROM br WHERE rn <= 4),
         |$marginTailSql""".stripMargin,

    "q_emb_multiprobe" ->
      s"""WITH v AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
         |${exactChainSql("v", "c")},
         |$lshSigCtes,
         |q AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r,
         |    unnest([$lshProbeList]) AS bucket
         |  FROM sg WHERE vec_id < 8),
         |cand AS (SELECT q.query_id, sg.vec_id,
         |    ${icosSql("sg.qv", "sg.r", "q.qq", "q.q_r")} AS cos_x1m
         |  FROM q JOIN sg ON sg.sig = q.bucket AND sg.vec_id <> q.query_id),
         |rk AS (SELECT query_id, vec_id, cos_x1m,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_x1m DESC, vec_id) AS INT) AS rank
         |  FROM cand WHERE cos_x1m IS NOT NULL)
         |SELECT query_id, rank, vec_id, cos_x1m
         |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // recall-eval replay: brute top-5 and both probe variants' top-5 on
    // the shared exact chain + sig CTEs, hits by (query, neighbor)
    // intersection, ppm floor-div — queries the single-probe pass
    // returns nothing for still report 0 via the k_exact left join
    // rank-metrics replay: brute truth + probe-1 LSH ranks as in
    // ann_recall, then MRR/hits/DCG with the SAME five integer LUT
    // literals (round(1e6/log2(r+1))) and the cumulative ideal CASE
    "q_emb_rank_metrics" ->
      s"""WITH v AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
         |${exactChainSql("v", "c")},
         |$lshSigCtes,
         |qx AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r
         |  FROM c WHERE vec_id < 8),
         |f0 AS (SELECT qx.query_id, c.vec_id,
         |    ${icosSql("c.qv", "c.r", "qx.qq", "qx.q_r")} AS cos_x1m
         |  FROM c CROSS JOIN qx WHERE c.vec_id <> qx.query_id),
         |br AS (SELECT query_id, vec_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos_x1m DESC, vec_id) AS rn
         |  FROM f0 WHERE cos_x1m IS NOT NULL),
         |b5 AS (SELECT query_id, vec_id FROM br WHERE rn <= 5),
         |qs AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r, sig
         |  FROM sg WHERE vec_id < 8),
         |p1 AS (SELECT query_id, qq, q_r,
         |    unnest([$lshProbeList]) AS bucket
         |  FROM qs),
         |mc1 AS (SELECT p1.query_id, sg.vec_id,
         |    ${icosSql("sg.qv", "sg.r", "p1.qq", "p1.q_r")} AS cos_x1m
         |  FROM p1 JOIN sg ON sg.sig = p1.bucket
         |    AND sg.vec_id <> p1.query_id),
         |mr1 AS (SELECT query_id, vec_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos_x1m DESC, vec_id) AS rn
         |  FROM mc1 WHERE cos_x1m IS NOT NULL),
         |jj AS (SELECT b5.query_id, b5.vec_id, mt.rn AS rnk
         |  FROM b5 LEFT JOIN (SELECT query_id, vec_id, rn FROM mr1
         |    WHERE rn <= 5) mt USING (query_id, vec_id)),
         |m AS (SELECT query_id,
         |    CAST(count(*) AS BIGINT) AS n_truth,
         |    CAST(count(rnk) AS BIGINT) AS hits,
         |    min(rnk) AS fr,
         |    coalesce(CAST(sum(CASE rnk WHEN 1 THEN 1000000
         |      WHEN 2 THEN 630930 WHEN 3 THEN 500000
         |      WHEN 4 THEN 430677 WHEN 5 THEN 386853 END) AS BIGINT),
         |      0) AS dcg_micro
         |  FROM jj GROUP BY query_id)
         |SELECT query_id, n_truth, hits,
         |  coalesce(1000000 // fr, 0) AS mrr_ppm, dcg_micro,
         |  (dcg_micro * 1000000) // (CASE least(n_truth, 5)
         |    WHEN 1 THEN 1000000 WHEN 2 THEN 1630930
         |    WHEN 3 THEN 2130930 WHEN 4 THEN 2561607
         |    ELSE 2948460 END) AS ndcg_ppm
         |FROM m ORDER BY query_id""".stripMargin,

    "q_emb_ann_recall" ->
      s"""WITH v AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
         |${exactChainSql("v", "c")},
         |$lshSigCtes,
         |qx AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r
         |  FROM c WHERE vec_id < 8),
         |f0 AS (SELECT qx.query_id, c.vec_id,
         |    ${icosSql("c.qv", "c.r", "qx.qq", "qx.q_r")} AS cos_x1m
         |  FROM c CROSS JOIN qx WHERE c.vec_id <> qx.query_id),
         |br AS (SELECT query_id, vec_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos_x1m DESC, vec_id) AS rn
         |  FROM f0 WHERE cos_x1m IS NOT NULL),
         |b5 AS (SELECT query_id, vec_id FROM br WHERE rn <= 5),
         |ke AS (SELECT query_id, CAST(count(*) AS BIGINT) AS k
         |  FROM b5 GROUP BY query_id),
         |qs AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r, sig
         |  FROM sg WHERE vec_id < 8),
         |mc0 AS (SELECT qs.query_id, sg.vec_id,
         |    ${icosSql("sg.qv", "sg.r", "qs.qq", "qs.q_r")} AS cos_x1m
         |  FROM qs JOIN sg ON sg.sig = qs.sig AND sg.vec_id <> qs.query_id),
         |mr0 AS (SELECT query_id, vec_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos_x1m DESC, vec_id) AS rn
         |  FROM mc0 WHERE cos_x1m IS NOT NULL),
         |mt0 AS (SELECT query_id, vec_id FROM mr0 WHERE rn <= 5),
         |mh0 AS (SELECT b5.query_id, CAST(count(*) AS BIGINT) AS hits
         |  FROM b5 JOIN mt0 USING (query_id, vec_id) GROUP BY b5.query_id),
         |p1 AS (SELECT query_id, qq, q_r,
         |    unnest([$lshProbeList]) AS bucket
         |  FROM qs),
         |mc1 AS (SELECT p1.query_id, sg.vec_id,
         |    ${icosSql("sg.qv", "sg.r", "p1.qq", "p1.q_r")} AS cos_x1m
         |  FROM p1 JOIN sg ON sg.sig = p1.bucket
         |    AND sg.vec_id <> p1.query_id),
         |mr1 AS (SELECT query_id, vec_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos_x1m DESC, vec_id) AS rn
         |  FROM mc1 WHERE cos_x1m IS NOT NULL),
         |mt1 AS (SELECT query_id, vec_id FROM mr1 WHERE rn <= 5),
         |mh1 AS (SELECT b5.query_id, CAST(count(*) AS BIGINT) AS hits
         |  FROM b5 JOIN mt1 USING (query_id, vec_id) GROUP BY b5.query_id)
         |SELECT 'probe0' AS method, ke.query_id, ke.k,
         |  coalesce(mh0.hits, 0) AS n_hit,
         |  (coalesce(mh0.hits, 0) * 1000000) // ke.k AS recall_ppm
         |FROM ke LEFT JOIN mh0 USING (query_id)
         |UNION ALL
         |SELECT 'probe1' AS method, ke.query_id, ke.k,
         |  coalesce(mh1.hits, 0) AS n_hit,
         |  (coalesce(mh1.hits, 0) * 1000000) // ke.k AS recall_ppm
         |FROM ke LEFT JOIN mh1 USING (query_id)
         |ORDER BY method, query_id""".stripMargin,

    // truncation-recall replay: the exact chain re-run on list-sliced
    // vectors per width, ranked with the same pins, hits vs full truth
    "q_emb_trunc_recall" -> {
      def side(d: Int, out: String) =
        s"""e$d AS (SELECT vec_id, ev[1:$d] AS ev FROM e),
           |${exactChainSql(s"e$d", out)},
           |q$d AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r
           |  FROM $out WHERE vec_id < 8),
           |f$d AS (SELECT q$d.query_id, $out.vec_id,
           |    ${icosSql(s"$out.qv", s"$out.r", s"q$d.qq", s"q$d.q_r")}
           |      AS cos_x1m
           |  FROM $out CROSS JOIN q$d
           |  WHERE $out.vec_id <> q$d.query_id),
           |r$d AS (SELECT query_id, vec_id, row_number() OVER (
           |    PARTITION BY query_id ORDER BY cos_x1m DESC, vec_id) AS rn
           |  FROM f$d WHERE cos_x1m IS NOT NULL),
           |t$d AS (SELECT query_id, vec_id FROM r$d WHERE rn <= 5),
           |h$d AS (SELECT b5.query_id, CAST(count(*) AS BIGINT) AS hits
           |  FROM b5 JOIN t$d USING (query_id, vec_id)
           |  GROUP BY b5.query_id)""".stripMargin
      s"""WITH e AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
         |${exactChainSql("e", "c")},
         |qx AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r
         |  FROM c WHERE vec_id < 8),
         |f0 AS (SELECT qx.query_id, c.vec_id,
         |    ${icosSql("c.qv", "c.r", "qx.qq", "qx.q_r")} AS cos_x1m
         |  FROM c CROSS JOIN qx WHERE c.vec_id <> qx.query_id),
         |br AS (SELECT query_id, vec_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos_x1m DESC, vec_id) AS rn
         |  FROM f0 WHERE cos_x1m IS NOT NULL),
         |b5 AS (SELECT query_id, vec_id FROM br WHERE rn <= 5),
         |ke AS (SELECT query_id, CAST(count(*) AS BIGINT) AS k
         |  FROM b5 GROUP BY query_id),
         |${side(16, "c16")},
         |${side(32, "c32")}
         |SELECT 'd16' AS method, ke.query_id, ke.k,
         |  coalesce(h16.hits, 0) AS n_hit,
         |  (coalesce(h16.hits, 0) * 1000000) // ke.k AS recall_ppm
         |FROM ke LEFT JOIN h16 USING (query_id)
         |UNION ALL
         |SELECT 'd32' AS method, ke.query_id, ke.k,
         |  coalesce(h32.hits, 0) AS n_hit,
         |  (coalesce(h32.hits, 0) * 1000000) // ke.k AS recall_ppm
         |FROM ke LEFT JOIN h32 USING (query_id)
         |ORDER BY method, query_id""".stripMargin
    },

    // quant-recall replay: exact-brute truth (the ann_recall CTEs), the
    // sq8 codes-cosine chain, and the BQ sign-Hamming + exact-rerank
    // chain, each ranked top-5 with the same (cos desc, id) pin, hit
    // counts per query against the truth set
    "q_emb_quant_recall" ->
      s"""WITH e AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
         |${exactChainSql("e", "c")},
         |qx AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r
         |  FROM c WHERE vec_id < 8),
         |f0 AS (SELECT qx.query_id, c.vec_id,
         |    ${icosSql("c.qv", "c.r", "qx.qq", "qx.q_r")} AS cos_x1m
         |  FROM c CROSS JOIN qx WHERE c.vec_id <> qx.query_id),
         |br AS (SELECT query_id, vec_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos_x1m DESC, vec_id) AS rn
         |  FROM f0 WHERE cos_x1m IS NOT NULL),
         |b5 AS (SELECT query_id, vec_id FROM br WHERE rn <= 5),
         |ke AS (SELECT query_id, CAST(count(*) AS BIGINT) AS k
         |  FROM b5 GROUP BY query_id),
         |${sq8ChainSql("e", "s8")},
         |q8 AS (SELECT vec_id AS query_id, qv AS qq, r AS q_r
         |  FROM s8 WHERE vec_id < 8),
         |m80 AS (SELECT q8.query_id, s8.vec_id,
         |    ${icosSql("s8.qv", "s8.r", "q8.qq", "q8.q_r")} AS cos_x1m
         |  FROM s8 CROSS JOIN q8 WHERE s8.vec_id <> q8.query_id),
         |m8r AS (SELECT query_id, vec_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos_x1m DESC, vec_id) AS rn
         |  FROM m80 WHERE cos_x1m IS NOT NULL),
         |m8t AS (SELECT query_id, vec_id FROM m8r WHERE rn <= 5),
         |h8 AS (SELECT b5.query_id, CAST(count(*) AS BIGINT) AS hits
         |  FROM b5 JOIN m8t USING (query_id, vec_id) GROUP BY b5.query_id),
         |jb AS (SELECT c.vec_id, e.ev, c.qv, c.r
         |  FROM c JOIN e USING (vec_id)),
         |qb AS (SELECT vec_id AS query_id, ev AS qev, qv AS qq, r AS q_r
         |  FROM jb WHERE vec_id < 8),
         |hb AS (SELECT qb.query_id, jb.vec_id, jb.qv AS cqv, jb.r AS cr,
         |    qb.qq, qb.q_r,
         |    list_sum([CASE WHEN (jb.ev[i] > 0) <> (qb.qev[i] > 0)
         |      THEN 1 ELSE 0 END
         |     for i in generate_series(1, len(jb.ev))]) AS ham
         |  FROM jb CROSS JOIN qb WHERE jb.vec_id <> qb.query_id),
         |cb AS (SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY ham, vec_id) AS hrn FROM hb),
         |sb AS (SELECT query_id, vec_id,
         |    ${icosSql("cqv", "cr", "qq", "q_r")} AS cos_x1m
         |  FROM cb WHERE hrn <= 16),
         |mbr AS (SELECT query_id, vec_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos_x1m DESC, vec_id) AS rn
         |  FROM sb WHERE cos_x1m IS NOT NULL),
         |mbt AS (SELECT query_id, vec_id FROM mbr WHERE rn <= 5),
         |hbq AS (SELECT b5.query_id, CAST(count(*) AS BIGINT) AS hits
         |  FROM b5 JOIN mbt USING (query_id, vec_id) GROUP BY b5.query_id)
         |SELECT 'sq8' AS method, ke.query_id, ke.k,
         |  coalesce(h8.hits, 0) AS n_hit,
         |  (coalesce(h8.hits, 0) * 1000000) // ke.k AS recall_ppm
         |FROM ke LEFT JOIN h8 USING (query_id)
         |UNION ALL
         |SELECT 'bq' AS method, ke.query_id, ke.k,
         |  coalesce(hbq.hits, 0) AS n_hit,
         |  (coalesce(hbq.hits, 0) * 1000000) // ke.k AS recall_ppm
         |FROM ke LEFT JOIN hbq USING (query_id)
         |ORDER BY method, query_id""".stripMargin,

    // margin replay, INTEGER-EXACT: identical even/odd split, the
    // quantize-first chain (scale-1e5 qv + exact isqrt norm roots), both
    // directions' top-4 by (cos_x1m desc, id), then the exact integer
    // ratio margin — no float similarity anywhere, mirroring
    // bruteTopKExact → marginPairsExact bit-for-bit
    "q_emb_margin_pairs_i" ->
      s"""WITH e AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings
         |  WHERE vec_id < $marginCalBound),
         |${exactChainSql("e", "qe")},
         |so AS (SELECT * FROM qe WHERE vec_id % 2 = 0),
         |tg AS (SELECT * FROM qe WHERE vec_id % 2 = 1),
         |f0 AS (SELECT so.vec_id AS src_id, tg.vec_id AS tgt_id,
         |    ${icosSql("so.qv", "so.r", "tg.qv", "tg.r")} AS cos_x1m
         |  FROM so CROSS JOIN tg),
         |fr AS (SELECT src_id, tgt_id, cos_x1m, row_number() OVER (
         |    PARTITION BY src_id ORDER BY cos_x1m DESC, tgt_id) AS rn
         |  FROM f0 WHERE cos_x1m IS NOT NULL),
         |fwd AS (SELECT src_id, tgt_id, cos_x1m FROM fr WHERE rn <= 4),
         |br AS (SELECT src_id, tgt_id, cos_x1m, row_number() OVER (
         |    PARTITION BY tgt_id ORDER BY cos_x1m DESC, src_id) AS rn
         |  FROM f0 WHERE cos_x1m IS NOT NULL),
         |bwd AS (SELECT src_id, tgt_id, cos_x1m FROM br WHERE rn <= 4),
         |$marginTailSql""".stripMargin,

    // cluster-cap replay: the knn_ivf assignment CTE, md5 pick order
    "q_emb_cluster_cap" ->
      s"""WITH e AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
         |cent AS (SELECT vec_id AS centroid_id, ev AS cv FROM e
         |  WHERE vec_id < 8),
         |cells AS (SELECT vec_id, cell FROM (
         |    SELECT c.vec_id, cent.centroid_id AS cell,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cosSql("c.ev", "cent.cv")} DESC,
         |          cent.centroid_id) AS rn
         |    FROM e c CROSS JOIN cent) z WHERE rn = 1),
         |h AS (SELECT cell, vec_id,
         |    ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT AS hh
         |  FROM cells),
         |n AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_members
         |  FROM h GROUP BY cell),
         |r AS (SELECT cell, vec_id, row_number() OVER (PARTITION BY cell
         |    ORDER BY hh, vec_id) AS rn FROM h)
         |SELECT r.cell, n.n_members, r.vec_id
         |FROM r JOIN n USING (cell) WHERE rn <= 10
         |ORDER BY cell, vec_id""".stripMargin,

    // IVF-margin replay, INTEGER-EXACT: the knn_ivf cell/probe CTEs in
    // BOTH directions on the same quantize-first chain as the brute gate
    // (assign tie → lowest centroid id; probe top-2; in-cell knn ties →
    // lowest vec_id; every similarity icosSql), then the IDENTICAL margin
    // tail — proving the backend swap changes only the candidate CTEs
    "q_emb_margin_ivf_i" -> marginIvfOracleSql(8),

    // JL replay: the IDENTICAL ±1 literal matrix (generated from the same
    // driver-side jlSign), identical left-associated + chain per
    // component, REAL cast matching Spark's array<float> quantization,
    // then the knn_brute cosine/rank replay over the projected vectors
    "q_emb_jl_knn" -> {
      val sumCols = (0 until 16).map(j => s"${jlChainSql(j)} AS p$j")
        .mkString(",\n         |    ")
      val arr = (0 until 16).map(j => s"CAST(p$j AS REAL)").mkString(", ")
      s"""WITH v0 AS (SELECT vec_id, $evGuardSql AS ev
         |  FROM embeddings),
         |p AS (SELECT vec_id,
         |    $sumCols
         |  FROM v0),
         |pv AS (SELECT vec_id, [$arr]::DOUBLE[] AS ev FROM p),
         |q AS (SELECT vec_id AS query_id, ev AS qv FROM pv
         |  WHERE vec_id < 3),
         |sc AS (SELECT q.query_id, c.vec_id, ${cosSql("c.ev", "q.qv")} AS cos
         |  FROM pv c CROSS JOIN q WHERE c.vec_id != q.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, vec_id) AS INT) AS rank FROM sc)
         |SELECT query_id, rank, vec_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    "q_emb_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 3),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |s AS (SELECT q.query_id, c.vec_id, ${cosSql("c.ev", "q.qv")} AS cos
         |  FROM c CROSS JOIN q WHERE c.vec_id != q.query_id),
         |f AS (SELECT query_id, vec_id, cos FROM s
         |  WHERE round(cos, 6) <= 0.95),
         |r AS (SELECT query_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, vec_id) AS INT) AS rank FROM f)
         |SELECT query_id, rank, vec_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_emb_coverage" ->
      """SELECT CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL
        |         THEN 'matched'
        |       WHEN e.vec_id IS NULL THEN 'doc_only'
        |       ELSE 'vec_only' END AS status,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT doc_id FROM documents WHERE doc_id < 400) d
        |FULL JOIN (SELECT vec_id FROM embeddings WHERE vec_id >= 100) e
        |  ON d.doc_id = e.vec_id
        |GROUP BY status ORDER BY status""".stripMargin,

    "q_emb_matryoshka" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding[1:16]::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 3),
         |c AS (SELECT vec_id, embedding[1:16]::DOUBLE[] AS ev FROM embeddings),
         |s AS (SELECT q.query_id, c.vec_id, ${cosSql("c.ev", "q.qv")} AS cos
         |  FROM c CROSS JOIN q WHERE c.vec_id != q.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, vec_id) AS INT) AS rank FROM s),
         |w AS (SELECT query_id, rank, vec_id, round(cos, 6) AS cos16
         |  FROM r WHERE rank <= 5),
         |cf AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |qf AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv2
         |  FROM embeddings WHERE vec_id < 3)
         |SELECT w.query_id, w.rank, w.vec_id, w.cos16,
         |  round(${cosSql("cf.ev", "qf.qv2")}, 6) AS cos_full
         |FROM w JOIN cf ON cf.vec_id = w.vec_id
         |JOIN qf ON qf.qid = w.query_id
         |ORDER BY query_id, rank""".stripMargin,

    "q_emb_ivf_assign" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |s AS (SELECT c.vec_id, cent.centroid_id, ${cosSql("c.ev", "cent.cv")} AS cos
         |  FROM c CROSS JOIN cent),
         |a AS (SELECT vec_id, centroid_id, cos,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id)
         |    AS rn FROM s)
         |SELECT centroid_id AS cell, CAST(count(*) AS BIGINT) AS n,
         |  round(avg(cos), 6) AS avg_cos
         |FROM a WHERE rn = 1 GROUP BY cell ORDER BY cell""".stripMargin,

    "q_emb_knn_ivf" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |cells AS (
         |  SELECT vec_id, centroid_id AS cell, ev FROM (
         |    SELECT c.vec_id, cent.centroid_id, c.ev,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cosSql("c.ev", "cent.cv")} DESC, cent.centroid_id) AS rn
         |    FROM c CROSS JOIN cent) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 3),
         |probes AS (
         |  SELECT query_id, qv, cell FROM (
         |    SELECT q.query_id, q.qv, cent.centroid_id AS cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${cosSql("q.qv", "cent.cv")} DESC, cent.centroid_id) AS rn
         |    FROM q CROSS JOIN cent) WHERE rn <= 2),
         |s AS (SELECT p.query_id, cl.vec_id, ${cosSql("cl.ev", "p.qv")} AS cos
         |  FROM cells cl JOIN probes p USING (cell)
         |  WHERE cl.vec_id != p.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, vec_id) AS INT) AS rank FROM s)
         |SELECT query_id, rank, vec_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // greedy-chain replay: same integer chain (quantize → isqrt → cell
    // argmax), then a recursive CTE that takes one argmax step per cell
    // per iteration — ORDER BY exact cos_x1m DESC, vec_id inside each
    // step is the engine's (first-lowest-id-on-tie) scan pin. The
    // recursive working set is ONE row per cell; depth = max cell size,
    // bounded by the gate's vec_id decimation
    "q_doc_icp_order" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, $evGuardSql AS ev
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |${exactChainSql("e", "qe")},
         |cent AS (SELECT vec_id AS centroid_id, qv AS cv, r AS cr FROM qe
         |  WHERE vec_id < 80),
         |cells AS (SELECT vec_id, qv, r, cell FROM (
         |    SELECT t.vec_id, cent.centroid_id AS cell, t.qv, t.r,
         |      ${icosSql("t.qv", "t.r", "cent.cv", "cent.cr")} AS ccos,
         |      row_number() OVER (PARTITION BY t.vec_id
         |        ORDER BY ${icosSql("t.qv", "t.r", "cent.cv", "cent.cr")}
         |          DESC, cent.centroid_id) AS rn
         |    FROM qe t CROSS JOIN cent) z
         |  WHERE rn = 1 AND ccos IS NOT NULL),
         |seed AS (SELECT cell, vec_id, qv, r FROM (
         |    SELECT cell, vec_id, qv, r,
         |      row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn
         |    FROM cells) z WHERE rn = 1),
         |chain AS (
         |  SELECT cell, CAST(1 AS BIGINT) AS pos, vec_id, qv, r,
         |    [vec_id] AS seen
         |  FROM seed
         |  UNION ALL
         |  SELECT cell, pos + 1, vec_id, qv, r,
         |    list_append(seen, vec_id)
         |  FROM (
         |    SELECT ch.cell, ch.pos, b.vec_id, b.qv, b.r, ch.seen,
         |      row_number() OVER (PARTITION BY ch.cell
         |        ORDER BY ${icosSql("ch.qv", "ch.r", "b.qv", "b.r")}
         |          DESC, b.vec_id) AS rn
         |    FROM chain ch JOIN cells b ON b.cell = ch.cell
         |      AND NOT list_contains(ch.seen, b.vec_id)) z
         |  WHERE rn = 1)
         |SELECT cell, pos, vec_id FROM chain
         |ORDER BY cell, pos""".stripMargin,

    // every signal formula is the one its standalone gate already proves
    "q_doc_signals" -> {
      val hitCols = TextOps.LangMarkers.map { case (lang, m) =>
        val lst = m.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, x -> x IN ($lst))) AS h_$lang"
      }.mkString(",\n    ")
      val bestExpr = TextOps.LangMarkers.map(m => s"h_${m._1}")
        .mkString("greatest(", ", ", ")")
      val caseChain = TextOps.LangMarkers.map { case (lang, _) =>
        s"WHEN best > 0 AND h_$lang = best THEN '$lang'"
      }.mkString(" ")
      s"""WITH b AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |m AS (
         |  SELECT doc_id, text,
         |    CAST(len(toks) AS INT) AS n_tokens,
         |    CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
         |      AS DOUBLE) / greatest(length(text), 1) AS praw,
         |    CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE)
         |      / greatest(len(toks), 1) AS sraw,
         |    CAST(length(trim(text)) AS DOUBLE)
         |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS awl,
         |    least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) AS lens,
         |    $hitCols
         |  FROM b),
         |m2 AS (SELECT *, $bestExpr AS best FROM m)
         |SELECT doc_id, n_tokens, CAST(length(text) AS INT) AS len_chars,
         |  round(praw, 6) AS punct_ratio, round(sraw, 6) AS stop_ratio,
         |  round((lens
         |    + (CASE WHEN awl >= 3 AND awl <= 10 THEN 1.0 ELSE 0.25 END)
         |    + least(sraw * 5.0, 1.0)) / 3.0, 6) AS quality,
         |  CASE $caseChain ELSE 'und' END AS pred_lang,
         |  md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
         |FROM m2 ORDER BY doc_id""".stripMargin
    },

    // position-hash replay: DuckDB's 1-based series maps to Spark's
    // 0-based transform index via (i-1) in the hash input
    "q_doc_mask" ->
      raw"""WITH n AS (
           |  SELECT doc_id,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           |  FROM documents),
           |m AS (SELECT doc_id,
           |    [CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || '|'
           |            || (i - 1)::VARCHAR), 1, 4))::BIGINT % 100 < 15
           |          THEN '<mask>' ELSE toks[i] END
           |     for i in generate_series(1, len(toks))] AS mt
           |  FROM n)
           |SELECT doc_id, array_to_string(mt, ' ') AS masked_text,
           |  CAST(len(list_filter(mt, x -> x = '<mask>')) AS INT) AS n_masked
           |FROM m ORDER BY doc_id""".stripMargin,

    // same candidate pairs, DuckDB's levenshtein (identical unit-cost DP)
    "q_doc_edit_distance" ->
      s"""WITH pos AS (SELECT doc_a, doc_b FROM ($simhashPairsSql))
         |SELECT p.doc_a, p.doc_b,
         |  CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist,
         |  CAST(length(a.text) + length(b.text) AS INT) AS len_sum
         |FROM pos p
         |JOIN documents a ON a.doc_id = p.doc_a
         |JOIN documents b ON b.doc_id = p.doc_b
         |ORDER BY p.doc_a, p.doc_b""".stripMargin,

    // composed replay: the simhash pair oracle as positives, the
    // q_sample_negatives md5-slot formula (k=2) as negatives, same
    // dedupe/anti-filter
    "q_doc_contrastive" ->
      s"""WITH pos AS (SELECT doc_a AS anchor_id, doc_b AS other_id
         |  FROM ($simhashPairsSql)),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |g AS (
         |  SELECT doc_id AS anchor_id,
         |    ('0x' || substr(md5(doc_id::VARCHAR || '|' || s.slot::VARCHAR),
         |      1, 8))::BIGINT % n_docs AS h,
         |    n_docs
         |  FROM documents CROSS JOIN generate_series(0, 1) AS s(slot)
         |  CROSS JOIN n),
         |negs0 AS (SELECT anchor_id,
         |    CASE WHEN h = anchor_id THEN (h + 1) % n_docs ELSE h END
         |      AS other_id
         |  FROM g),
         |anch AS (SELECT DISTINCT anchor_id FROM pos),
         |negs AS (SELECT DISTINCT ng.anchor_id, ng.other_id
         |  FROM negs0 ng JOIN anch USING (anchor_id)
         |  WHERE NOT EXISTS (SELECT 1 FROM pos p
         |    WHERE p.anchor_id = ng.anchor_id
         |      AND p.other_id = ng.other_id))
         |SELECT anchor_id, other_id, 1 AS label FROM pos
         |UNION ALL
         |SELECT anchor_id, other_id, 0 AS label FROM negs
         |ORDER BY anchor_id, label, other_id""".stripMargin,

    "q_doc_oov" ->
      raw"""WITH toks AS (
           |  SELECT lang AS grp,
           |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |v AS (SELECT term FROM (
           |  SELECT term, count(*) AS n FROM toks GROUP BY term
           |  ORDER BY n DESC, term LIMIT 30)),
           |j AS (SELECT t.grp, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END
           |    AS oov
           |  FROM toks t LEFT JOIN v ON t.term = v.term)
           |SELECT grp AS lang, CAST(count(*) AS BIGINT) AS n_tokens,
           |  CAST(sum(oov) AS BIGINT) AS n_oov,
           |  (CAST(sum(oov) AS BIGINT) * 1000000)
           |    // CAST(count(*) AS BIGINT) AS oov_ppm
           |FROM j GROUP BY grp ORDER BY lang""".stripMargin,

    // composed replay: the rank_search micro-unit lexical stage (top-25)
    // joined to embeddings, cosine-reranked with the same rounded-tie
    // ordering
    "q_doc_hybrid_search" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN ('spark', 'vector', 'stream')
         |  GROUP BY doc_id, term),
         |dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
         |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
         |sc AS (
         |  SELECT tf.doc_id,
         |    sum(CAST(round((tf.tf * ln(nd.nd / dft.df_t)) * 1000000.0)
         |      AS BIGINT)) AS sm
         |  FROM tf JOIN dft USING (term) CROSS JOIN nd
         |  GROUP BY tf.doc_id),
         |lex AS (
         |  SELECT doc_id, CAST(sm AS DOUBLE) / 1000000.0 AS lex_score
         |  FROM sc ORDER BY lex_score DESC, doc_id LIMIT 25),
         |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
         |  WHERE vec_id = 0),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
         |SELECT l.doc_id, l.lex_score,
         |  round(${cosSql("e.ev", "q.qv")}, 6) AS cos
         |FROM lex l JOIN e ON e.vec_id = l.doc_id CROSS JOIN q
         |ORDER BY round(${cosSql("e.ev", "q.qv")}, 6) DESC, l.doc_id
         |LIMIT 10""".stripMargin,

    // composed replay: rank both candidate lists with the same total
    // tie-breaks, fuse by micro-unit 1/(60+rank) terms
    "q_doc_rrf_search" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN ('spark', 'vector', 'stream')
         |  GROUP BY doc_id, term),
         |dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
         |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
         |sc AS (
         |  SELECT tf.doc_id,
         |    sum(CAST(round((tf.tf * ln(nd.nd / dft.df_t)) * 1000000.0)
         |      AS BIGINT)) AS sm
         |  FROM tf JOIN dft USING (term) CROSS JOIN nd
         |  GROUP BY tf.doc_id),
         |lexr AS (
         |  SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY CAST(sm AS DOUBLE) / 1000000.0 DESC, doc_id) AS INT)
         |    AS lex_rank
         |  FROM sc),
         |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
         |  WHERE vec_id = 0),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |denser AS (
         |  SELECT vec_id, CAST(row_number() OVER (
         |    ORDER BY round(${cosSql("e.ev", "q.qv")}, 6) DESC, vec_id)
         |    AS INT) AS dense_rank
         |  FROM e CROSS JOIN q),
         |f AS (
         |  SELECT coalesce(l.doc_id, d.vec_id) AS doc_id,
         |    l.lex_rank, d.dense_rank,
         |    coalesce(CAST(round(1000000.0 / (60 + l.lex_rank)) AS BIGINT), 0)
         |    + coalesce(CAST(round(1000000.0 / (60 + d.dense_rank)) AS BIGINT), 0)
         |      AS rrf_micro
         |  FROM (SELECT * FROM lexr WHERE lex_rank <= 20) l
         |  FULL JOIN (SELECT * FROM denser WHERE dense_rank <= 20) d
         |    ON l.doc_id = d.vec_id)
         |SELECT doc_id, lex_rank, dense_rank, rrf_micro
         |FROM f ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin,

    // phrase replay: same synthesized plants, conjunctive screen via
    // list_contains, adjacency verify via list-slice equality over the
    // normalized token array, 1-based first position
    "q_doc_phrase_search" ->
      raw"""WITH tk0 AS (SELECT doc_id, text,
           |    regexp_split_to_array(trim(text), '\s+') AS tt
           |  FROM documents),
           |d AS (SELECT doc_id,
           |    CASE CAST(doc_id % 5 AS INT)
           |      WHEN 1 THEN array_to_string(tt[1:3], ' ') ||
           |        ' zephyr quill orchid ' || array_to_string(tt[4:6], ' ')
           |      WHEN 2 THEN 'zephyr ' || array_to_string(tt[1:3], ' ') ||
           |        ' quill ' || array_to_string(tt[4:6], ' ') || ' orchid'
           |      WHEN 3 THEN 'zephyr quill orchid zephyr quill orchid ' ||
           |        array_to_string(tt[1:3], ' ')
           |      ELSE text END AS tx
           |  FROM tk0),
           |nt AS (SELECT doc_id,
           |    regexp_split_to_array(trim(lower(tx)), '\s+') AS t
           |  FROM d
           |  WHERE list_contains(
           |      regexp_split_to_array(trim(lower(tx)), '\s+'), 'zephyr')
           |    AND list_contains(
           |      regexp_split_to_array(trim(lower(tx)), '\s+'), 'quill')
           |    AND list_contains(
           |      regexp_split_to_array(trim(lower(tx)), '\s+'), 'orchid')),
           |f AS (SELECT doc_id,
           |    [i for i in generate_series(1, greatest(len(t) - 2, 0))
           |      if t[i:i+2] = ['zephyr', 'quill', 'orchid']] AS hits
           |  FROM nt)
           |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_hits,
           |  CAST(hits[1] AS BIGINT) AS first_pos
           |FROM f WHERE len(hits) > 0 ORDER BY doc_id""".stripMargin,

    // brute-force cross-corpus Jaccard: shingle join between the
    // synthesized eval set and the full corpus, integer-ppm verify —
    // the LSH screen's recall at the planted similarities is 1 to ~1e-19
    "q_doc_fuzzy_decontaminate" ->
      raw"""WITH ev0 AS (
           |  SELECT doc_id + 1000000 AS doc_id,
           |    array_to_string(tt[1:greatest(len(tt) - 1, 1)], ' ') AS text
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(text), '\s+') AS tt
           |        FROM documents WHERE doc_id % 20 = 7)),
           |tsh AS (SELECT doc_id, unnest(list_distinct(
           |    CASE WHEN len(t) >= 3
           |      THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |            for i in generate_series(1, len(t) - 2)]
           |      ELSE [] END)) AS sh
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(lower(text)), '\s+') AS t
           |        FROM documents)),
           |esh AS (SELECT doc_id, unnest(list_distinct(
           |    CASE WHEN len(t) >= 3
           |      THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |            for i in generate_series(1, len(t) - 2)]
           |      ELSE [] END)) AS sh
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(lower(text)), '\s+') AS t
           |        FROM ev0)),
           |tn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
           |  FROM tsh GROUP BY doc_id),
           |en AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
           |  FROM esh GROUP BY doc_id),
           |com AS (SELECT a.doc_id AS train_id, b.doc_id AS eval_id,
           |    CAST(count(*) AS BIGINT) AS common
           |  FROM tsh a JOIN esh b ON a.sh = b.sh GROUP BY 1, 2)
           |SELECT train_id, eval_id,
           |  CAST(common * 1000000 // (tn.n + en.n - common) AS BIGINT)
           |    AS jaccard_ppm
           |FROM com JOIN tn ON tn.doc_id = com.train_id
           |  JOIN en ON en.doc_id = com.eval_id
           |WHERE common * 1000000 // (tn.n + en.n - common) >= 800000
           |ORDER BY train_id, eval_id""".stripMargin,

    // winnowing replay: same k-gram md5 hashes, per-window minimum
    // (values only — the rightmost tie rule moves positions, never the
    // selected VALUE), distinct per doc, df-capped pair join
    "q_doc_winnow_pairs" ->
      raw"""WITH syn AS (SELECT doc_id,
           |    CASE WHEN doc_id % 10 IN (2, 5) THEN text ||
           |      ' wm ' || substr(md5('wm' || (doc_id // 10)), 1, 24) ||
           |      ' ' || substr(md5('wm2' || (doc_id // 10)), 1, 24) ||
           |      ' ' || substr(md5('wm3' || (doc_id // 10)), 1, 24)
           |    ELSE text END AS tx
           |  FROM documents),
           |nmt AS (SELECT doc_id,
           |    lower(trim(regexp_replace(tx, '\s+', ' ', 'g'))) AS nm
           |  FROM syn),
           |h AS (SELECT doc_id, nm,
           |    [((((((((((((((((CAST(0 AS BIGINT) * 131 + ascii(substr(nm, i, 1))) % 2147483647) * 131 + ascii(substr(nm, i + 1, 1))) % 2147483647) * 131 + ascii(substr(nm, i + 2, 1))) % 2147483647) * 131 + ascii(substr(nm, i + 3, 1))) % 2147483647) * 131 + ascii(substr(nm, i + 4, 1))) % 2147483647) * 131 + ascii(substr(nm, i + 5, 1))) % 2147483647) * 131 + ascii(substr(nm, i + 6, 1))) % 2147483647) * 131 + ascii(substr(nm, i + 7, 1))) % 2147483647)
           |     for i in generate_series(1, greatest(length(nm) - 7, 0))]
           |      AS hs
           |  FROM nmt),
           |sel AS (SELECT doc_id, nm, list_distinct(
           |    [j + 4 - list_position(list_reverse(hs[j:j+3]),
           |                           list_min(hs[j:j+3]))
           |     for j in generate_series(1, greatest(len(hs) - 3, 0))])
           |      AS poss
           |  FROM h),
           |f AS (SELECT DISTINCT doc_id, substr(nm, pos, 8) AS fp
           |  FROM (SELECT doc_id, nm, unnest(poss) AS pos FROM sel) z),
           |cap AS (SELECT fp FROM
           |    (SELECT fp, count(*) AS df FROM f GROUP BY fp)
           |  WHERE df <= 8),
           |fc AS (SELECT f.doc_id, f.fp FROM f JOIN cap USING (fp)),
           |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    CAST(count(*) AS BIGINT) AS n_shared
           |  FROM fc a JOIN fc b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT doc_a, doc_b, n_shared FROM p
           |WHERE n_shared >= 14 ORDER BY doc_a, doc_b""".stripMargin,

    // CDC replay: same boundary predicate (md5 k-gram ending at i,
    // mod 64), same end-boundary append, same chunk md5s, same
    // fp-spread -> doc rollup with floor-div shared ppm
    "q_doc_cdc_chunks" ->
      raw"""WITH syn AS (SELECT doc_id,
           |    CASE WHEN doc_id % 7 = 2 THEN
           |      repeat('j', CAST(doc_id % 19 + 1 AS INT)) || ' ' || text
           |      || ' cdc shared '
           |      || substr(md5('cdc' || (doc_id // 14)), 1, 28) || ' '
           |      || substr(md5('cdc2' || (doc_id // 14)), 1, 28) || ' '
           |      || substr(md5('cdc3' || (doc_id // 14)), 1, 28) || ' '
           |      || substr(md5('cdc4' || (doc_id // 14)), 1, 28)
           |    ELSE text END AS tx
           |  FROM documents),
           |nmt AS (SELECT doc_id,
           |    lower(trim(regexp_replace(tx, '\s+', ' ', 'g'))) AS nm
           |  FROM syn),
           |b AS (SELECT doc_id, nm,
           |    [i for i in generate_series(8, length(nm))
           |     if ((((((((((((((((CAST(0 AS BIGINT) * 131 + ascii(substr(nm, i - 7, 1))) % 2147483647) * 131 + ascii(substr(nm, i - 7 + 1, 1))) % 2147483647) * 131 + ascii(substr(nm, i - 7 + 2, 1))) % 2147483647) * 131 + ascii(substr(nm, i - 7 + 3, 1))) % 2147483647) * 131 + ascii(substr(nm, i - 7 + 4, 1))) % 2147483647) * 131 + ascii(substr(nm, i - 7 + 5, 1))) % 2147483647) * 131 + ascii(substr(nm, i - 7 + 6, 1))) % 2147483647) * 131 + ascii(substr(nm, i - 7 + 7, 1))) % 2147483647)
           |        % 64 = 0] AS bounds
           |  FROM nmt),
           |b2 AS (SELECT doc_id, nm,
           |    CASE WHEN len(bounds) > 0 AND bounds[-1] = length(nm)
           |      THEN bounds ELSE list_append(bounds, length(nm)) END AS bb
           |  FROM b),
           |ch AS (SELECT doc_id,
           |    md5(substr(nm,
           |      CASE WHEN idx = 1 THEN 1 ELSE bb[idx - 1] + 1 END,
           |      bb[idx] - CASE WHEN idx = 1 THEN 0 ELSE bb[idx - 1] END))
           |      AS chunk_fp,
           |    bb[idx] - CASE WHEN idx = 1 THEN 0 ELSE bb[idx - 1] END
           |      AS len
           |  FROM (SELECT doc_id, nm, bb,
           |          unnest(generate_series(1, len(bb))) AS idx
           |        FROM b2)
           |  WHERE bb[idx] - CASE WHEN idx = 1 THEN 0 ELSE bb[idx - 1] END
           |        > 0 OR length(nm) = 0),
           |fpc AS (SELECT chunk_fp, count(DISTINCT doc_id) AS fp_docs
           |  FROM ch GROUP BY 1),
           |agg AS (SELECT ch.doc_id,
           |    CAST(count(*) AS BIGINT) AS n_chunks,
           |    CAST(sum(ch.len) AS BIGINT) AS total_len,
           |    CAST(sum(CASE WHEN fpc.fp_docs > 1 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_shared,
           |    CAST(sum(CASE WHEN fpc.fp_docs > 1 THEN ch.len ELSE 0 END)
           |      AS BIGINT) AS shared_len
           |  FROM ch JOIN fpc USING (chunk_fp) GROUP BY ch.doc_id)
           |SELECT doc_id, n_chunks, total_len, n_shared, shared_len,
           |  CAST(shared_len * 1000000 // greatest(total_len, 1) AS BIGINT)
           |    AS shared_ppm
           |FROM agg ORDER BY doc_id""".stripMargin,

    // composed replay: the brute oracle's top-5 as truth, the IVF oracle's
    // probed top-5 as approx, recall in floor-div micro-units
    "q_emb_recall_ivf" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM embeddings WHERE vec_id < 3),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |cent AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |bs AS (SELECT q.query_id, c.vec_id, ${cosSql("c.ev", "q.qv")} AS cos
         |  FROM c CROSS JOIN q WHERE c.vec_id != q.query_id),
         |truth AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, vec_id) AS rn FROM bs) WHERE rn <= 5),
         |cells AS (
         |  SELECT vec_id, centroid_id AS cell, ev FROM (
         |    SELECT c.vec_id, cent.centroid_id, c.ev,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cosSql("c.ev", "cent.cv")} DESC,
         |          cent.centroid_id) AS rn
         |    FROM c CROSS JOIN cent) WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, cell FROM (
         |    SELECT q.query_id, q.qv, cent.centroid_id AS cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${cosSql("q.qv", "cent.cv")} DESC,
         |          cent.centroid_id) AS rn
         |    FROM q CROSS JOIN cent) WHERE rn <= 2),
         |asq AS (SELECT p.query_id, cl.vec_id, ${cosSql("cl.ev", "p.qv")} AS cos
         |  FROM cells cl JOIN probes p USING (cell)
         |  WHERE cl.vec_id != p.query_id),
         |approx AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, vec_id) AS rn FROM asq) WHERE rn <= 5)
         |SELECT t.query_id, CAST(count(*) AS BIGINT) AS k,
         |  CAST(count(a.vec_id) AS BIGINT) AS n_hit,
         |  (CAST(count(a.vec_id) AS BIGINT) * 1000000)
         |    // CAST(count(*) AS BIGINT) AS recall_ppm
         |FROM truth t LEFT JOIN approx a
         |  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
         |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin,

    // JL distortion replay: same literal matrix + REAL quantization, then
    // squared-diff folds (0.0-seeded, mirroring dotHof) over both spaces,
    // rounded ratio quantiles via quantile_cont (the cos-calibration form)
    "q_emb_jl_distortion" -> {
      val sumCols = (0 until 16).map(j => s"${jlChainSql(j)} AS p$j")
        .mkString(",\n         |    ")
      val arr = (0 until 16).map(j => s"CAST(p$j AS REAL)").mkString(", ")
      def d2(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      [($a[d+1] - $b[d+1]) * ($a[d+1] - $b[d+1])
           |       for d in generate_series(0, len($a)-1)]),
           |      (x, y) -> x + y)""".stripMargin
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS ev
         |  FROM embeddings WHERE vec_id < 25),
         |p AS (SELECT vec_id,
         |    $sumCols
         |  FROM (SELECT vec_id, $evGuardSql AS ev FROM embeddings
         |        WHERE vec_id < 25)),
         |pv AS (SELECT vec_id, [$arr]::DOUBLE[] AS ev FROM p),
         |pr AS (
         |  SELECT round(${d2("pa.ev", "pb.ev")}
         |    / nullif(16.0 * ${d2("ca.ev", "cb.ev")}, 0.0), 6) AS ratio
         |  FROM c ca JOIN c cb ON ca.vec_id < cb.vec_id
         |  JOIN pv pa ON pa.vec_id = ca.vec_id
         |  JOIN pv pb ON pb.vec_id = cb.vec_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(quantile_cont(ratio, 0.05), 6) AS p05,
         |  round(quantile_cont(ratio, 0.5), 6) AS p50,
         |  round(quantile_cont(ratio, 0.95), 6) AS p95
         |FROM pr""".stripMargin
    },

    // JL × IVF replay: project (literal-matrix fold + REAL quantization),
    // then the recall_ivf assignment/probe/scan CTEs over projected rows
    "q_emb_jl_ivf" -> {
      val sumCols = (0 until 16).map(j => s"${jlChainSql(j)} AS p$j")
        .mkString(",\n         |    ")
      val arr = (0 until 16).map(j => s"CAST(p$j AS REAL)").mkString(", ")
      s"""WITH p AS (SELECT vec_id,
         |    $sumCols
         |  FROM (SELECT vec_id, $evGuardSql AS ev FROM embeddings)),
         |pv AS (SELECT vec_id, [$arr]::DOUBLE[] AS ev FROM p),
         |cent AS (SELECT vec_id AS centroid_id, ev AS cv FROM pv
         |  WHERE vec_id < 8),
         |q AS (SELECT vec_id AS query_id, ev AS qv FROM pv
         |  WHERE vec_id < 3),
         |cells AS (
         |  SELECT vec_id, centroid_id AS cell, ev FROM (
         |    SELECT pv.vec_id, cent.centroid_id, pv.ev,
         |      row_number() OVER (PARTITION BY pv.vec_id
         |        ORDER BY ${cosSql("pv.ev", "cent.cv")} DESC,
         |          cent.centroid_id) AS rn
         |    FROM pv CROSS JOIN cent) WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, cell FROM (
         |    SELECT q.query_id, q.qv, cent.centroid_id AS cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${cosSql("q.qv", "cent.cv")} DESC,
         |          cent.centroid_id) AS rn
         |    FROM q CROSS JOIN cent) WHERE rn <= 2),
         |asq AS (SELECT p2.query_id, cl.vec_id,
         |    ${cosSql("cl.ev", "p2.qv")} AS cos
         |  FROM cells cl JOIN probes p2 USING (cell)
         |  WHERE cl.vec_id != p2.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, vec_id) AS INT) AS rank FROM asq)
         |SELECT query_id, rank, vec_id, round(cos, 6) AS cos
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    "q_emb_semdedup" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
         |s AS (SELECT c.vec_id, c.ev, cent.centroid_id,
         |    ${cosSql("c.ev", "cent.cv")} AS ccos
         |  FROM c CROSS JOIN cent),
         |cells AS (SELECT vec_id, ev, centroid_id AS cell FROM (
         |    SELECT vec_id, ev, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY ccos DESC, centroid_id) AS rn
         |    FROM s) WHERE rn = 1)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell,
         |  round(${cosSql("a.ev", "b.ev")}, 6) AS cos
         |FROM cells a JOIN cells b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.ev", "b.ev")} >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q_emb_neardup" ->
      s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(${cosSql("a.ev", "b.ev")}, 6) AS cos
         |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.ev", "b.ev")} >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    // pair replay + the recursive min-label reach (dedupClustersSql idiom)
    "q_emb_dedup_clusters" ->
      s"""WITH RECURSIVE v AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
         |  WHERE vec_id < $seqOracleVecBound),
         |pairs AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.ev", "b.ev")} >= 0.4),
         |edges AS (SELECT va AS a, vb AS b FROM pairs
         |  UNION SELECT vb, va FROM pairs),
         |reach(node, lab) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e2.b, r.lab FROM reach r JOIN edges e2 ON e2.a = r.node)
         |SELECT node AS vec_id, min(lab) AS cluster_id
         |FROM reach GROUP BY node ORDER BY vec_id""".stripMargin,

    // per-half quantized sums (q_emb_centroids idiom), truncating integer
    // micro-means, squared diffs summed per label
    "q_emb_dim_stats" ->
      """WITH e AS (
        |  SELECT generate_subscripts(embedding, 1) AS pos1,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS q
        |  FROM embeddings)
        |SELECT CAST(pos1 - 1 AS INT) AS pos, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(q) AS BIGINT) // count(*) AS BIGINT) AS mean_q,
        |  CAST(CAST(count(*) * sum(q * q) - sum(q) * sum(q)
        |    AS DECIMAL(38,0)) AS VARCHAR) AS spread_q,
        |  CAST(min(q) AS BIGINT) AS min_q, CAST(max(q) AS BIGINT) AS max_q,
        |  min(q) = max(q) AS dead
        |FROM e GROUP BY pos1 ORDER BY pos""".stripMargin,

    "q_emb_drift" ->
      """WITH e AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos1,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS v
        |  FROM embeddings),
        |a AS (SELECT label, pos1, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(v) AS BIGINT) AS s
        |      FROM e WHERE vec_id % 2 = 0 GROUP BY label, pos1),
        |b AS (SELECT label, pos1, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(v) AS BIGINT) AS s
        |      FROM e WHERE vec_id % 2 = 1 GROUP BY label, pos1)
        |SELECT a.label, min(a.n) AS n_a, min(b.n) AS n_b,
        |  CAST(count(*) AS BIGINT) AS dims,
        |  CAST(sum((a.s // a.n - b.s // b.n) * (a.s // a.n - b.s // b.n))
        |    AS BIGINT) AS drift2_q
        |FROM a JOIN b ON a.label = b.label AND a.pos1 = b.pos1
        |GROUP BY a.label ORDER BY a.label""".stripMargin,

    // sign-bucket mirror of VectorOps.signLshNearDupPairs: identical ±1
    // literal plane matrix (jlSign), identical left-associated + chain —
    // list_sum could reorder the additions and flip a near-zero sign
    "q_emb_lsh_neardup" ->
      s"""WITH $signBucketCtes
         |SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b, a.bucket AS bucket,
         |  round(${cosSql("a.ev", "b2.ev")}, 6) AS cos
         |FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |WHERE ${cosSql("a.ev", "b2.ev")} >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    // same sign buckets, threshold open (≥ −1): the candidate-cos
    // distribution that calibrates the near-dup threshold
    "q_emb_cos_calibration" ->
      s"""WITH $signBucketCtes,
         |p AS (
         |  SELECT round(${cosSql("a.ev", "b2.ev")}, 6) AS cos
         |  FROM b a JOIN b b2 ON a.bucket = b2.bucket
         |    AND a.vec_id < b2.vec_id
         |  WHERE ${cosSql("a.ev", "b2.ev")} >= -1.0)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(quantile_cont(cos, 0.1), 6) AS p10,
         |  round(quantile_cont(cos, 0.25), 6) AS p25,
         |  round(quantile_cont(cos, 0.5), 6) AS p50,
         |  round(quantile_cont(cos, 0.75), 6) AS p75,
         |  round(quantile_cont(cos, 0.9), 6) AS p90
         |FROM p""".stripMargin,

    // fixed-point quantization replay (same floor(x·1e6 + 0.5) as the
    // kmeans/PQ oracles); HUGEINT sums cast back to BIGINT; the mean is the
    // identical (sum → /n → /scale) IEEE division chain
    "q_emb_centroids" ->
      """WITH e AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS pos1,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT) AS v
        |  FROM embeddings)
        |SELECT label, CAST(pos1 - 1 AS INT) AS pos,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS sum_q,
        |  CAST(sum(v) AS DOUBLE) / count(*) / 1000000.0 AS mean
        |FROM e GROUP BY label, pos1
        |ORDER BY label, pos""".stripMargin,

    "q_emb_norm_stats" ->
      """WITH q AS (
        |  SELECT label,
        |    list_sum([CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
        |                AS BIGINT)
        |              * CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
        |                AS BIGINT)
        |              for x in embedding]) AS n2
        |  FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(n2) AS BIGINT) AS min_n2,
        |  CAST(max(n2) AS BIGINT) AS max_n2,
        |  CAST(sum(n2) AS BIGINT) AS sum_n2
        |FROM q GROUP BY label ORDER BY label""".stripMargin,

    "q_doc_quality_len_corr" -> {
      val qualityExpr =
        """round((least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0)
          |  + (CASE WHEN awl >= 3 AND awl <= 10 THEN 1.0 ELSE 0.25 END)
          |  + least(sraw * 5.0, 1.0)) / 3.0, 6)""".stripMargin
      s"""WITH b AS (SELECT doc_id, $toksSql AS toks, text FROM documents),
         |m AS (
         |  SELECT doc_id, toks,
         |    CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE)
         |      / greatest(len(toks), 1) AS sraw,
         |    CAST(length(trim(text)) AS DOUBLE)
         |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS awl
         |  FROM b),
         |v AS (
         |  SELECT CAST(len(toks) AS BIGINT) AS x,
         |    CAST(round($qualityExpr * 1000000, 0) AS BIGINT) AS y
         |  FROM m)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
         |  CAST(sum(x * y) AS BIGINT) AS sum_xy,
         |  CAST(sum(x * x) AS BIGINT) AS sum_x2,
         |  CAST(sum(y * y) AS BIGINT) AS sum_y2
         |FROM v""".stripMargin
    },

    // floor(sum/n) in double is the exact rational floor (see
    // VectorOps.labelMargin scaladoc), so the centroid arrays and every
    // integer distance replay bit-for-bit
    "q_emb_label_margin" ->
      """WITH q AS (
        |  SELECT vec_id, label AS lab,
        |    [CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |     for x in embedding] AS qv
        |  FROM embeddings),
        |s AS (
        |  SELECT lab, generate_subscripts(qv, 1) AS pos1, unnest(qv) AS v
        |  FROM q),
        |g AS (SELECT lab, pos1, sum(v) AS sm, count(*) AS cn
        |  FROM s GROUP BY lab, pos1),
        |c AS (SELECT lab AS clab,
        |    list(CAST(floor(CAST(sm AS DOUBLE) / cn) AS BIGINT)
        |      ORDER BY pos1) AS cen
        |  FROM g GROUP BY lab),
        |d AS (
        |  SELECT q.vec_id, q.lab, c.clab,
        |    list_sum([(q.qv[i] - c.cen[i]) * (q.qv[i] - c.cen[i])
        |              for i in generate_series(1, len(q.qv))]) AS d2
        |  FROM q CROSS JOIN c),
        |p AS (
        |  SELECT vec_id, lab,
        |    max(CASE WHEN lab = clab THEN d2 END) AS own_d2,
        |    min(CASE WHEN lab <> clab THEN d2 END) AS min_other_d2
        |  FROM d GROUP BY vec_id, lab)
        |SELECT lab, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(own_d2) AS BIGINT) AS sum_own_d2,
        |  CAST(sum(min_other_d2) AS BIGINT) AS sum_other_d2,
        |  round(CAST(sum(min_other_d2) AS DOUBLE)
        |    / CAST(greatest(sum(own_d2), 1) AS DOUBLE), 6) AS sep_ratio
        |FROM p GROUP BY lab ORDER BY lab""".stripMargin,

    "q_doc_bigrams" ->
      raw"""WITH w AS (
           |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws
           |  FROM documents),
           |b AS (
           |  SELECT ws[i] || ' ' || ws[i+1] AS bigram
           |  FROM w, LATERAL (
           |    SELECT unnest(generate_series(1, len(ws) - 1)) AS i))
           |SELECT bigram, CAST(count(*) AS BIGINT) AS n
           |FROM b GROUP BY bigram
           |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    "q_doc_redact" ->
      raw"""WITH nm AS (
           |  SELECT doc_id,
           |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS tx
           |  FROM documents),
           |r AS (
           |  SELECT doc_id, tx,
           |    regexp_replace(
           |      regexp_replace(tx, '\b(customer|supplier|part)\b',
           |        '[ENT]', 'g'),
           |      '\[ENT\]( \[ENT\])+', '[ENTS]', 'g') AS red
           |  FROM nm)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(tx, '\b(customer|supplier|part)\b'))
           |    AS INT) AS n_hits,
           |  CAST(length(red) AS INT) AS redacted_len,
           |  md5(red) AS redacted_fp
           |FROM r ORDER BY doc_id""".stripMargin,

    // chunk replay: same stride arithmetic over the same normalized token
    // list; DuckDB list slices clamp at len like Spark's slice()
    "q_doc_chunk" ->
      raw"""WITH w AS (
           |  SELECT doc_id,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
           |  FROM documents),
           |k AS (
           |  SELECT doc_id, ws,
           |    greatest(CAST(ceil((len(ws) - 8) / 24.0) AS INT), 1) AS nch
           |  FROM w),
           |c AS (
           |  SELECT doc_id, i AS chunk_idx,
           |    ws[i*24 + 1 : least(i*24 + 32, len(ws))] AS toks
           |  FROM k, LATERAL (
           |    SELECT unnest(generate_series(0, nch - 1)) AS i))
           |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           |  CAST(len(toks) AS INT) AS n_tokens,
           |  md5(array_to_string(toks, ' ')) AS chunk_fp
           |FROM c WHERE len(toks) > 0
           |ORDER BY doc_id, chunk_idx""".stripMargin,

    // SQ8 replay: identical floor(x/scale + 0.5) quantization, exact
    // integer dot (BIGINT reduce), score = (CAST(idot) * scale_a) *
    // scale_q — the same left-assoc IEEE chain as the Spark side
    "q_emb_sq8_search" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |s AS (SELECT vec_id, ev,
        |    list_max([abs(x) for x in ev]) / 127.0 AS scl FROM e),
        |c AS (SELECT vec_id, scl,
        |    [CAST(coalesce(floor(x / nullif(scl, 0.0) + 0.5), 0) AS BIGINT)
        |     for x in ev] AS codes
        |  FROM s),
        |q AS (SELECT vec_id AS query_id, scl AS qscl, codes AS qcodes
        |  FROM c WHERE vec_id < 3),
        |sc AS (SELECT q.query_id, c.vec_id,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [c.codes[i] * q.qcodes[i]
        |       for i in generate_series(1, len(c.codes))]),
        |      (a, b) -> a + b) AS DOUBLE) * c.scl * q.qscl AS score
        |  FROM c CROSS JOIN q WHERE c.vec_id != q.query_id),
        |r AS (SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id) AS INT) AS rank FROM sc)
        |SELECT query_id, rank, vec_id, round(score, 6) AS score
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // BQ replay: identical 63-bit sign packing (never bit 63 — DuckDB
    // raises on `1::BIGINT << 63`, Spark wraps; both sides stay at 62),
    // Hamming = Σ bit_count(xor) per word, candidate boundary tie on
    // vec_id, exact-cosine rerank of the 20-pool
    "q_emb_bq_search" -> {
      val nw = (embDims + ScalarQuant.BqWordBits - 1) / ScalarQuant.BqWordBits
      val words = (0 until nw).map { j =>
        val hi = math.min(ScalarQuant.BqWordBits - 1,
          embDims - j * ScalarQuant.BqWordBits - 1)
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    [CASE WHEN ev[${j * ScalarQuant.BqWordBits} + i + 1] > 0
           |          THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END
           |     for i in generate_series(0, $hi)]), (a, b) -> a + b) AS w$j"""
          .stripMargin
      }.mkString(",\n    ")
      val qw = (0 until nw).map(j => s"w$j AS qw$j").mkString(", ")
      val ham = (0 until nw)
        .map(j => s"CAST(bit_count(xor(w.w$j, q.qw$j)) AS BIGINT)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, $evGuardSql AS ev FROM embeddings),
         |w AS (SELECT vec_id, ev,
         |    $words
         |  FROM e),
         |q AS (SELECT vec_id AS query_id, ev AS qv, $qw
         |  FROM w WHERE vec_id < 3),
         |h AS (SELECT q.query_id, w.vec_id, $ham AS ham, w.ev, q.qv
         |  FROM w CROSS JOIN q WHERE w.vec_id != q.query_id),
         |cand AS (SELECT query_id, vec_id, ham, ev, qv,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY ham, vec_id) AS rn FROM h),
         |sc AS (SELECT query_id, vec_id, ham, ${cosSql("ev", "qv")} AS cos
         |  FROM cand WHERE rn <= 20),
         |r AS (SELECT query_id, vec_id, ham, cos,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, vec_id) AS INT) AS rank
         |  FROM sc WHERE cos IS NOT NULL)
         |SELECT query_id, rank, vec_id, ham, round(cos, 6) AS cos
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    // backoff replay: same token/prev triples off the token array, same
    // count tables from the doc_id%50 reference slice, same pinned
    // truncation order (unigram ppm first, then 2x // 5)
    "q_doc_backoff_lm" ->
      raw"""WITH n AS (SELECT doc_id,
           |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
           |  FROM documents),
           |tok AS (SELECT doc_id, i AS pos,
           |    regexp_split_to_array(t, '\s+')[i + 1] AS w,
           |    CASE WHEN i > 0 THEN regexp_split_to_array(t, '\s+')[i]
           |    END AS prev
           |  FROM n, LATERAL (SELECT unnest(generate_series(0,
           |    len(regexp_split_to_array(t, '\s+')) - 1)) AS i)),
           |ref AS (SELECT * FROM tok WHERE doc_id % 50 = 0),
           |c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM ref
           |  GROUP BY w),
           |c2 AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS c2 FROM ref
           |  WHERE prev IS NOT NULL GROUP BY prev, w),
           |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_ref,
           |    CAST(count(*) AS BIGINT) AS v FROM c1),
           |sc AS (SELECT t.doc_id, t.pos, c2.c2, c1.c1,
           |    c1.c1 * 1000000 // tot.n_ref AS uni_ppm,
           |    CASE
           |      WHEN t.pos = 0 THEN coalesce(c1.c1 * 1000000 // tot.n_ref,
           |        2000000 // (5 * tot.v))
           |      WHEN c2.c2 IS NOT NULL THEN c2.c2 * 1000000 // pc.c1
           |      WHEN c1.c1 IS NOT NULL THEN
           |        (2 * (c1.c1 * 1000000 // tot.n_ref)) // 5
           |      ELSE 4000000 // (25 * tot.v)
           |    END AS score_ppm
           |  FROM tok t
           |  LEFT JOIN c2 ON t.prev = c2.prev AND t.w = c2.w
           |  LEFT JOIN c1 ON t.w = c1.w
           |  LEFT JOIN c1 pc ON t.prev = pc.w
           |  CROSS JOIN tot)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           |  CAST(sum(CASE WHEN pos > 0 AND c2 IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_backoff,
           |  CAST(sum(CASE WHEN c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_oov,
           |  CAST(sum(score_ppm) AS BIGINT) // count(*) AS score_ppm
           |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_doc_lm_score" ->
      raw"""WITH w AS (
           |  SELECT doc_id,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
           |  FROM documents),
           |b AS (
           |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
           |  FROM w, LATERAL (
           |    SELECT unnest(generate_series(1, len(ws) - 1)) AS i)),
           |c AS (
           |  SELECT bigram, CAST(count(*) AS BIGINT) AS bg_count
           |  FROM b GROUP BY bigram)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |  CAST(sum(c.bg_count) AS BIGINT) AS sum_count,
           |  CAST(sum(c.bg_count) AS DOUBLE) / count(*) AS typicality
           |FROM b JOIN c USING (bigram)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_doc_ppl_buckets" ->
      raw"""WITH w AS (
           |  SELECT doc_id, lang,
           |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
           |  FROM documents),
           |b AS (
           |  SELECT doc_id, lang, ws[i] || ' ' || ws[i+1] AS bigram
           |  FROM w, LATERAL (
           |    SELECT unnest(generate_series(1, len(ws) - 1)) AS i)),
           |c AS (
           |  SELECT bigram, CAST(count(*) AS BIGINT) AS bg_count
           |  FROM b GROUP BY bigram),
           |sc AS (
           |  SELECT doc_id, lang,
           |    CAST(sum(c.bg_count) AS DOUBLE) / count(*) AS typicality
           |  FROM b JOIN c USING (bigram)
           |  GROUP BY doc_id, lang),
           |cut AS (
           |  SELECT lang,
           |    quantile_cont(typicality, [0.3333, 0.6667]) AS cs
           |  FROM sc GROUP BY lang),
           |bk AS (
           |  SELECT sc.lang,
           |    CASE WHEN typicality > cs[2] THEN 'head'
           |         WHEN typicality > cs[1] THEN 'middle'
           |         ELSE 'tail' END AS bucket,
           |    typicality
           |  FROM sc JOIN cut USING (lang))
           |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n,
           |  round(min(typicality), 6) AS min_typ,
           |  round(max(typicality), 6) AS max_typ
           |FROM bk GROUP BY lang, bucket
           |ORDER BY lang, bucket""".stripMargin,

    "q_mm_wav" ->
      """SELECT doc_id, doc_id % 5 <> 0 AS is_wav,
        |  CASE WHEN doc_id % 5 <> 0 THEN 1 END AS audio_format,
        |  CASE WHEN doc_id % 5 <> 0 THEN CAST(doc_id % 2 + 1 AS INT) END
        |    AS channels,
        |  CASE WHEN doc_id % 5 <> 0 THEN
        |    CAST([8000, 16000, 22050, 44100][CAST(doc_id % 4 + 1 AS INT)]
        |      AS BIGINT) END AS sample_rate,
        |  CASE WHEN doc_id % 5 <> 0 THEN 16 END AS bits_per_sample
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_mm_jpeg" ->
      """SELECT doc_id,
        |  (doc_id % 7 <> 3) AS is_jpeg,
        |  CASE WHEN doc_id % 7 <> 3 THEN
        |    (CASE WHEN doc_id % 2 = 0 THEN 'C0' ELSE 'C2' END)
        |  END AS sof_marker,
        |  CASE WHEN doc_id % 7 <> 3
        |    THEN CAST(doc_id % 50 + 100 AS INT) END AS height,
        |  CASE WHEN doc_id % 7 <> 3
        |    THEN CAST(doc_id % 40 + 80 AS INT) END AS width,
        |  CASE WHEN doc_id % 7 <> 3 THEN 8 END AS precision,
        |  CASE WHEN doc_id % 7 <> 3 THEN 1 END AS n_components
        |FROM documents ORDER BY doc_id""".stripMargin,

    // closed-form GIF replay from the residues; table_colors = 2^(n+1)
    // via an integer shift, matching the engine's shiftleft
    "q_mm_gif" ->
      """SELECT doc_id,
        |  (doc_id % 7 <> 3) AS is_gif,
        |  CASE WHEN doc_id % 7 <> 3 THEN
        |    (CASE WHEN doc_id % 2 = 0 THEN '89a' ELSE '87a' END)
        |  END AS version,
        |  CASE WHEN doc_id % 7 <> 3
        |    THEN CAST(doc_id % 300 + 10 AS INT) END AS width,
        |  CASE WHEN doc_id % 7 <> 3
        |    THEN CAST(doc_id % 200 + 10 AS INT) END AS height,
        |  CASE WHEN doc_id % 7 <> 3 THEN (doc_id % 3 = 0)
        |  END AS has_color_table,
        |  CASE WHEN doc_id % 7 <> 3 AND doc_id % 3 = 0
        |    THEN CAST(2 << CAST(doc_id % 8 AS INT) AS INT)
        |  END AS table_colors
        |FROM documents ORDER BY doc_id""".stripMargin,

    // closed-form WEBP replay from the residues: the PNG-magic class is
    // is_webp=false, the VP8 corrupt-sync class (3k ∧ 11k+5) keeps
    // is_webp=true with null fields, the rest replay the generator's
    // dims/flags exactly
    "q_mm_webp" ->
      """SELECT doc_id,
        |  (doc_id % 7 <> 3) AS is_webp,
        |  CASE WHEN doc_id % 7 <> 3
        |        AND NOT (doc_id % 3 = 0 AND doc_id % 11 = 5) THEN
        |    CASE WHEN doc_id % 3 = 0 THEN 'VP8'
        |         WHEN doc_id % 3 = 1 THEN 'VP8L' ELSE 'VP8X' END
        |  END AS format,
        |  CASE WHEN doc_id % 7 <> 3
        |        AND NOT (doc_id % 3 = 0 AND doc_id % 11 = 5) THEN
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 500 + 16
        |              WHEN doc_id % 3 = 1 THEN doc_id % 400 + 1
        |              ELSE doc_id % 1000 + 1 END AS INT)
        |  END AS width,
        |  CASE WHEN doc_id % 7 <> 3
        |        AND NOT (doc_id % 3 = 0 AND doc_id % 11 = 5) THEN
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 300 + 16
        |              WHEN doc_id % 3 = 1 THEN doc_id % 250 + 1
        |              ELSE doc_id % 600 + 1 END AS INT)
        |  END AS height,
        |  CASE WHEN doc_id % 7 <> 3
        |        AND NOT (doc_id % 3 = 0 AND doc_id % 11 = 5) THEN
        |    CASE WHEN doc_id % 3 = 0 THEN FALSE ELSE (doc_id % 2 = 0) END
        |  END AS has_alpha,
        |  CASE WHEN doc_id % 7 <> 3
        |        AND NOT (doc_id % 3 = 0 AND doc_id % 11 = 5) THEN
        |    CASE WHEN doc_id % 3 = 2 THEN (doc_id % 5 = 0) ELSE FALSE END
        |  END AS is_animated
        |FROM documents ORDER BY doc_id""".stripMargin,

    // closed-form from the generator: residue precedence (PNG magic
    // beats the overrun-box class), box count by which optional boxes
    // the residues add, mvhd fields straight from the residue formulas
    "q_mm_mp4" ->
      """SELECT doc_id,
        |  (doc_id % 7 <> 3) AS is_mp4,
        |  CASE WHEN doc_id % 7 <> 3 THEN 'isom' END AS brand,
        |  CASE WHEN doc_id % 7 = 3 THEN NULL
        |       WHEN doc_id % 5 = 4 THEN 1
        |       WHEN doc_id % 3 = 0 THEN 4 ELSE 3 END AS n_boxes,
        |  (doc_id % 7 <> 3 AND doc_id % 5 <> 4) AS ok,
        |  CASE WHEN doc_id % 7 <> 3 AND doc_id % 5 <> 4
        |    THEN CAST((doc_id % 3 + 1) * 1000 AS BIGINT) END AS timescale,
        |  CASE WHEN doc_id % 7 <> 3 AND doc_id % 5 <> 4
        |    THEN CAST(doc_id % 5000 + 600 AS BIGINT) END AS duration,
        |  CASE WHEN doc_id % 7 <> 3 AND doc_id % 5 <> 4
        |    THEN CAST((doc_id % 5000 + 600) * 1000
        |      // ((doc_id % 3 + 1) * 1000) AS BIGINT) END AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,

    // WARC replay: the same fixture synthesis, then the GENERIC parser
    // in DuckDB string functions — record split on the version line,
    // header block via split_part, payload slice by Content-Length,
    // HTTP status/type/body from the response payload
    // frontier replay: the q_doc_robots parser chain over the 5-host dim
    // (group ids via lag+running-sum, specificity pick for graftbot),
    // longest-match verdict as arg_max(allow, prefix length) over the
    // host-keyed prefix-compare join, unmatched URLs default-allowed,
    // then the per-domain top-5 by (priority DESC, doc_id) row_number —
    // the TopKAgg tie pin
    "q_doc_crawl_frontier" ->
      raw"""WITH hosts AS (SELECT DISTINCT doc_id % 5 AS hn
           |  FROM documents),
           |rx AS (SELECT hn,
           |    'User-agent: *' || chr(10) || 'Disallow: /' || chr(10) ||
           |    chr(10) || 'User-agent: graftbot' || chr(10) ||
           |    'Disallow: /tmp' || chr(10) || 'Allow: /tmp/ok' ||
           |    chr(10) ||
           |    CASE WHEN hn % 2 = 0 THEN 'Disallow: /p' || chr(10)
           |      ELSE '' END AS txt
           |  FROM hosts),
           |ln AS (SELECT hn,
           |    unnest(string_split(txt, chr(10))) AS raw,
           |    unnest(range(len(string_split(txt, chr(10))))) AS p
           |  FROM rx),
           |pf AS (SELECT hn, p,
           |    lower(regexp_extract(trim(regexp_replace(raw, '#.*$$', '')),
           |      '^([A-Za-z-]+)\s*:', 1)) AS f,
           |    trim(regexp_extract(trim(regexp_replace(raw, '#.*$$', '')),
           |      '^[A-Za-z-]+\s*:\s*(.*)$$', 1)) AS v
           |  FROM ln),
           |kk AS (SELECT * FROM pf WHERE f <> ''),
           |g0 AS (SELECT *, (f = 'user-agent') AS isua,
           |    coalesce(lag(f = 'user-agent') OVER (
           |      PARTITION BY hn ORDER BY p), FALSE) AS prevua
           |  FROM kk),
           |g AS (SELECT *, sum(CASE WHEN isua AND NOT prevua
           |      THEN 1 ELSE 0 END) OVER (
           |      PARTITION BY hn ORDER BY p) AS gid
           |  FROM g0),
           |ua AS (SELECT hn, gid,
           |    max(CASE WHEN v = '' THEN -1
           |      WHEN v = '*' THEN 0
           |      WHEN starts_with('graftbot/1.0', lower(v))
           |        THEN length(v)
           |      ELSE -1 END) AS glen
           |  FROM g WHERE isua GROUP BY hn, gid),
           |best AS (SELECT hn, max(glen) AS b FROM ua GROUP BY hn),
           |win AS (SELECT ua.hn, ua.gid FROM ua JOIN best USING (hn)
           |  WHERE glen = b AND glen >= 0),
           |rl AS (SELECT g.hn, g.v AS prefix, (g.f = 'allow') AS allow
           |  FROM g JOIN win ON win.hn = g.hn AND win.gid = g.gid
           |  WHERE g.f IN ('allow', 'disallow') AND g.v <> ''),
           |u AS (SELECT doc_id, doc_id % 5 AS hn,
           |    CASE CAST(doc_id % 4 AS INT)
           |      WHEN 0 THEN '/p/' || doc_id
           |      WHEN 1 THEN '/tmp/' || doc_id
           |      WHEN 2 THEN '/tmp/ok/' || doc_id
           |      ELSE '/private/' || doc_id END AS path,
           |    len(regexp_split_to_array(trim(text), '\s+')) * 1000
           |      + doc_id % 7 AS priority
           |  FROM documents),
           |pv AS (SELECT u.doc_id,
           |    arg_max(rl.allow, length(rl.prefix)) AS a
           |  FROM u JOIN rl ON rl.hn = u.hn
           |    AND substr(u.path, 1, length(rl.prefix)) = rl.prefix
           |  GROUP BY u.doc_id),
           |al AS (SELECT u.doc_id,
           |    'example' || u.hn || '.com' AS domain, u.priority
           |  FROM u LEFT JOIN pv USING (doc_id)
           |  WHERE coalesce(pv.a, TRUE)),
           |rk AS (SELECT domain, doc_id, priority,
           |    CAST(row_number() OVER (PARTITION BY domain
           |      ORDER BY priority DESC, doc_id) AS INT) AS rank
           |  FROM al)
           |SELECT domain, rank, doc_id, priority FROM rk
           |WHERE rank <= 5 ORDER BY domain, rank""".stripMargin,

    // robots replay: same synthesis; kept lines (parseable 'field:'
    // shape) get group ids via a lag+running-sum window (a user-agent
    // line NOT preceded by one starts a group — the fold's inUa flag),
    // per-group specificity = max over its UA tokens, winners join back
    // for the rule rows in file order
    "q_doc_robots" ->
      raw"""WITH x AS (SELECT doc_id,
           |    '# synthetic' || chr(10) || 'User-agent: *' || chr(10) ||
           |    'Disallow: /private' || chr(10) ||
           |    'Allow: /ok-' || (doc_id % 10) || chr(10) ||
           |    CASE WHEN doc_id % 3 <> 0 THEN chr(10) ||
           |      'User-agent: graftbot' || chr(10) ||
           |      'Disallow: /tmp/' || doc_id || chr(10) ||
           |      'Crawl-delay: 5' || chr(10) ELSE '' END ||
           |    CASE WHEN doc_id % 7 <> 0 THEN chr(10) ||
           |      'User-agent: graft' || chr(10) ||
           |      'User-agent: otherbot' || chr(10) ||
           |      'Disallow: /deep' || chr(10) ||
           |      'Disallow:' || chr(10) ELSE '' END AS txt
           |  FROM documents),
           |ln AS (SELECT doc_id,
           |    unnest(string_split(txt, chr(10))) AS raw,
           |    unnest(range(len(string_split(txt, chr(10))))) AS p
           |  FROM x),
           |pf AS (SELECT doc_id, p,
           |    lower(regexp_extract(trim(regexp_replace(raw, '#.*$$', '')),
           |      '^([A-Za-z-]+)\s*:', 1)) AS f,
           |    trim(regexp_extract(trim(regexp_replace(raw, '#.*$$', '')),
           |      '^[A-Za-z-]+\s*:\s*(.*)$$', 1)) AS v
           |  FROM ln),
           |k AS (SELECT * FROM pf WHERE f <> ''),
           |g0 AS (SELECT *, (f = 'user-agent') AS isua,
           |    coalesce(lag(f = 'user-agent') OVER (
           |      PARTITION BY doc_id ORDER BY p), FALSE) AS prevua
           |  FROM k),
           |g AS (SELECT *, sum(CASE WHEN isua AND NOT prevua
           |      THEN 1 ELSE 0 END) OVER (
           |      PARTITION BY doc_id ORDER BY p) AS gid
           |  FROM g0),
           |ua AS (SELECT doc_id, gid,
           |    max(CASE WHEN v = '' THEN -1
           |      WHEN v = '*' THEN 0
           |      WHEN starts_with('graftbot/1.0', lower(v))
           |        THEN length(v)
           |      ELSE -1 END) AS glen
           |  FROM g WHERE isua GROUP BY doc_id, gid),
           |best AS (SELECT doc_id, max(glen) AS b FROM ua
           |  GROUP BY doc_id),
           |win AS (SELECT ua.doc_id, ua.gid FROM ua JOIN best
           |  USING (doc_id) WHERE glen = b AND glen >= 0),
           |r AS (SELECT g.doc_id, g.p, g.v AS prefix,
           |    (g.f = 'allow') AS allow
           |  FROM g JOIN win ON win.doc_id = g.doc_id
           |    AND win.gid = g.gid
           |  WHERE g.f IN ('allow', 'disallow') AND g.v <> '')
           |SELECT doc_id, CAST(row_number() OVER (
           |    PARTITION BY doc_id ORDER BY p) - 1 AS INT) AS pos,
           |  prefix, allow
           |FROM r ORDER BY doc_id, pos""".stripMargin,

    // sitemap replay: same XML synthesis, same (?s) non-greedy block
    // split + anchored child extracts; parallel unnest zips entries with
    // their 0-based positions; '' extracts null out via nullif
    "q_doc_sitemap" ->
      raw"""WITH x AS (SELECT doc_id,
           |    '<?xml version="1.0"?>' || chr(10) || '<urlset>' ||
           |      chr(10) || '<url>' || chr(10) || '  <loc> https://' ||
           |      'example' || (doc_id % 5) || '.com' || '/p/' || doc_id ||
           |      ' </loc>' || chr(10) || '  <lastmod>2024-0' ||
           |      (doc_id % 9 + 1) || '-01</lastmod>' || chr(10) ||
           |      '</url>' || chr(10) || '<url><loc>https://sub.' ||
           |      'example' || (doc_id % 5) || '.com' || '/q/' || doc_id ||
           |      '</loc><priority>0.8</priority></url>' ||
           |      '<url><lastmod>2023-01-01</lastmod></url></urlset>'
           |      AS xml
           |  FROM documents),
           |bl AS (SELECT doc_id,
           |    regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1) AS bs
           |  FROM x),
           |e AS (SELECT doc_id, unnest(bs) AS b,
           |    unnest(range(len(bs))) AS pos
           |  FROM bl)
           |SELECT doc_id, CAST(pos AS INT) AS pos,
           |  nullif(regexp_extract(b, '(?s)<loc>\s*(.*?)\s*</loc>', 1),
           |    '') AS loc,
           |  nullif(regexp_extract(b,
           |    '(?s)<lastmod>\s*(.*?)\s*</lastmod>', 1), '') AS lastmod,
           |  nullif(regexp_extract(b,
           |    '(?s)<priority>\s*(.*?)\s*</priority>', 1), '') AS priority
           |FROM e ORDER BY doc_id, pos""".stripMargin,

    "q_doc_warc" -> {
      val cr = "chr(13) || chr(10)"
      raw"""WITH b AS (SELECT doc_id,
           |    '<html>' || array_to_string(
           |      (regexp_split_to_array(trim(text), '\s+'))[1:8], ' ')
           |      || '</html>' AS body,
           |    'https://example' || (doc_id % 5) || '.com/page/' ||
           |      doc_id AS uri
           |  FROM documents),
           |pl AS (SELECT doc_id, uri,
           |    'GET /page/' || doc_id || ' HTTP/1.1' || $cr ||
           |      'Host: h' || $cr || $cr AS reqpl,
           |    'HTTP/1.1 200 OK' || $cr || 'Content-Type: text/html' ||
           |      $cr || $cr || body AS resppl
           |  FROM b),
           |w AS (SELECT doc_id,
           |    'WARC/1.0' || $cr || 'WARC-Type: request' || $cr ||
           |      'WARC-Target-URI: ' || uri || $cr ||
           |      'Content-Length: ' || octet_length(encode(reqpl)) ||
           |      $cr || $cr || reqpl || $cr || $cr ||
           |    'WARC/1.0' || $cr || 'WARC-Type: response' || $cr ||
           |      'WARC-Target-URI: ' || uri || $cr ||
           |      'Content-Length: ' || octet_length(encode(resppl)) ||
           |      $cr || $cr || resppl || $cr || $cr AS warc
           |  FROM pl),
           |a1 AS (SELECT doc_id, warc,
           |    split_part(warc, $cr || $cr, 1) AS h1
           |  FROM w),
           |a2 AS (SELECT *, octet_length(encode(h1)) AS b1,
           |    CAST(regexp_extract(h1, 'Content-Length: (\d+)', 1)
           |      AS BIGINT) AS c1
           |  FROM a1),
           |a3 AS (SELECT *,
           |    decode(from_hex(substr(hex(encode(warc)),
           |      (b1 + 4 + c1 + 4) * 2 + 1,
           |      octet_length(encode(warc)) * 2))) AS rest2
           |  FROM a2),
           |a4 AS (SELECT *, split_part(rest2, $cr || $cr, 1) AS h2
           |  FROM a3),
           |a5 AS (SELECT *, octet_length(encode(h2)) AS b2,
           |    CAST(regexp_extract(h2, 'Content-Length: (\d+)', 1)
           |      AS BIGINT) AS c2
           |  FROM a4),
           |f AS (SELECT doc_id,
           |    CAST(CASE WHEN starts_with(warc, 'WARC/1.0' || $cr)
           |        THEN 1 ELSE 0 END
           |      + CASE WHEN starts_with(rest2, 'WARC/1.0' || $cr)
           |        THEN 1 ELSE 0 END AS INT) AS n_records,
           |    regexp_extract(h1, 'WARC-Target-URI: ([^\r\n]+)', 1)
           |      AS uri,
           |    regexp_extract(h1, 'WARC-Type: ([^\r\n]+)', 1) AS t1,
           |    c2 AS resp_len,
           |    decode(from_hex(substr(hex(encode(warc)),
           |      (b1 + 4 + c1 + 4 + b2 + 4) * 2 + 1, c2 * 2)))
           |      AS payload
           |  FROM a5),
           |o AS (SELECT doc_id, n_records, uri, t1, resp_len,
           |    CAST(regexp_extract(payload, '^HTTP/1\.[01] (\d{3})', 1)
           |      AS INT) AS status,
           |    regexp_extract(payload, 'Content-Type: ([^\r\n]+)', 1)
           |      AS content_type,
           |    substr(payload, strpos(payload, $cr || $cr) + 4)
           |      AS hbody
           |  FROM f)
           |SELECT doc_id, n_records, uri, t1, resp_len, status,
           |  content_type, md5(hbody) AS body_md5,
           |  CAST(length(hbody) AS INT) AS body_len
           |FROM o ORDER BY doc_id""".stripMargin
    },

    "q_mm_headers" ->
      """WITH p AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN 'FFD8FFE000104A464946'
        |       ELSE '89504E470D0A1A0A' || '0000000D' || '49484452'
        |            || lpad(upper(to_hex(doc_id % 640 + 1)), 8, '0')
        |            || lpad(upper(to_hex(doc_id % 480 + 1)), 8, '0')
        |            || '0806'
        |  END AS hx FROM documents),
        |f AS (SELECT doc_id, hx,
        |    (substr(hx, 1, 16) = '89504E470D0A1A0A'
        |     AND substr(hx, 25, 8) = '49484452') AS is_png
        |  FROM p)
        |SELECT doc_id, is_png,
        |  CASE WHEN is_png THEN ('0x' || substr(hx, 33, 8))::BIGINT END AS width,
        |  CASE WHEN is_png THEN ('0x' || substr(hx, 41, 8))::BIGINT END AS height,
        |  CASE WHEN is_png THEN CAST(('0x' || substr(hx, 49, 2))::BIGINT AS INT) END
        |    AS bit_depth,
        |  CASE WHEN is_png THEN CAST(('0x' || substr(hx, 51, 2))::BIGINT AS INT) END
        |    AS color_type
        |FROM f ORDER BY doc_id""".stripMargin,

    // TIFF replay: same assembly (LE even docs / BE odd / PNG every 7th),
    // then the PARSER replayed generically — endian-aware u16/u32 reads,
    // declared entry count, per-entry tag scan over unnested indices,
    // first inline SHORT/LONG match per wanted tag via arg_min on i
    "q_mm_tiff" ->
      raw"""WITH p AS (SELECT doc_id,
           |    CASE WHEN doc_id % 7 = 0 THEN '89504E470D0A1A0A'
           |      WHEN doc_id % 2 = 0 THEN
           |        '49492A00' || '08000000' || '0300' ||
           |        '0001' || '0300' || '01000000' ||
           |          substr(lpad(upper(to_hex(doc_id % 640 + 1)),4,'0'),3,2)
           |          || substr(lpad(upper(to_hex(doc_id % 640 + 1)),4,'0'),1,2)
           |          || '0000' ||
           |        '0101' || '0400' || '01000000' ||
           |          substr(lpad(upper(to_hex(doc_id % 480 + 1)),8,'0'),7,2)
           |          || substr(lpad(upper(to_hex(doc_id % 480 + 1)),8,'0'),5,2)
           |          || substr(lpad(upper(to_hex(doc_id % 480 + 1)),8,'0'),3,2)
           |          || substr(lpad(upper(to_hex(doc_id % 480 + 1)),8,'0'),1,2) ||
           |        '1201' || '0300' || '01000000' ||
           |          substr(lpad(upper(to_hex(doc_id % 8 + 1)),4,'0'),3,2)
           |          || substr(lpad(upper(to_hex(doc_id % 8 + 1)),4,'0'),1,2)
           |          || '0000' ||
           |        '00000000'
           |      ELSE
           |        '4D4D002A' || '00000008' || '0003' ||
           |        '0100' || '0003' || '00000001' ||
           |          lpad(upper(to_hex(doc_id % 640 + 1)),4,'0') || '0000' ||
           |        '0101' || '0004' || '00000001' ||
           |          lpad(upper(to_hex(doc_id % 480 + 1)),8,'0') ||
           |        '0112' || '0003' || '00000001' ||
           |          lpad(upper(to_hex(doc_id % 8 + 1)),4,'0') || '0000' ||
           |        '00000000'
           |    END AS hx FROM documents),
           |b AS (SELECT doc_id, hx, length(hx) // 2 AS totb,
           |    (substr(hx, 1, 4) = '4949') AS le,
           |    ((substr(hx, 1, 4) = '4949' AND substr(hx, 5, 4) = '2A00')
           |     OR (substr(hx, 1, 4) = '4D4D' AND substr(hx, 5, 4) = '002A'))
           |      AS is_tiff
           |  FROM p),
           |hd AS (SELECT *,
           |    CASE WHEN le THEN ('0x' || substr(hx, 15, 2) ||
           |        substr(hx, 13, 2) || substr(hx, 11, 2) ||
           |        substr(hx, 9, 2))::BIGINT
           |      ELSE ('0x' || substr(hx, 9, 8))::BIGINT END AS ifd
           |  FROM b),
           |nd AS (SELECT *,
           |    CASE WHEN is_tiff AND ifd + 2 <= totb THEN
           |      CASE WHEN le THEN ('0x' || substr(hx, ifd*2 + 3, 2) ||
           |          substr(hx, ifd*2 + 1, 2))::BIGINT
           |        ELSE ('0x' || substr(hx, ifd*2 + 1, 4))::BIGINT END
           |    END AS n
           |  FROM hd),
           |e AS (SELECT doc_id, hx, totb, le, ifd, n,
           |    unnest(range(8)) AS i
           |  FROM nd),
           |pe AS (SELECT *, ifd + 2 + i*12 AS eo FROM e),
           |fx AS (SELECT doc_id, i,
           |    (i < n AND eo + 12 <= totb) AS fits,
           |    CASE WHEN (i < n AND eo + 12 <= totb) THEN
           |      CASE WHEN le THEN ('0x' || substr(hx, eo*2 + 3, 2) ||
           |          substr(hx, eo*2 + 1, 2))::BIGINT
           |        ELSE ('0x' || substr(hx, eo*2 + 1, 4))::BIGINT END
           |    END AS tag,
           |    CASE WHEN (i < n AND eo + 12 <= totb) THEN
           |      CASE WHEN le THEN ('0x' || substr(hx, eo*2 + 7, 2) ||
           |          substr(hx, eo*2 + 5, 2))::BIGINT
           |        ELSE ('0x' || substr(hx, eo*2 + 5, 4))::BIGINT END
           |    END AS typ,
           |    CASE WHEN (i < n AND eo + 12 <= totb) THEN
           |      CASE WHEN le THEN ('0x' || substr(hx, eo*2 + 15, 2) ||
           |          substr(hx, eo*2 + 13, 2) || substr(hx, eo*2 + 11, 2) ||
           |          substr(hx, eo*2 + 9, 2))::BIGINT
           |        ELSE ('0x' || substr(hx, eo*2 + 9, 8))::BIGINT END
           |    END AS cnt,
           |    CASE WHEN (i < n AND eo + 12 <= totb) THEN
           |      CASE WHEN le THEN ('0x' || substr(hx, eo*2 + 19, 2) ||
           |          substr(hx, eo*2 + 17, 2))::BIGINT
           |        ELSE ('0x' || substr(hx, eo*2 + 17, 4))::BIGINT END
           |    END AS v16,
           |    CASE WHEN (i < n AND eo + 12 <= totb) THEN
           |      CASE WHEN le THEN ('0x' || substr(hx, eo*2 + 23, 2) ||
           |          substr(hx, eo*2 + 21, 2) || substr(hx, eo*2 + 19, 2) ||
           |          substr(hx, eo*2 + 17, 2))::BIGINT
           |        ELSE ('0x' || substr(hx, eo*2 + 17, 8))::BIGINT END
           |    END AS v32
           |  FROM pe),
           |m AS (SELECT doc_id,
           |    arg_min(CASE WHEN typ = 3 THEN v16 ELSE v32 END, i)
           |      FILTER (WHERE fits AND tag = 256 AND cnt = 1
           |        AND typ IN (3, 4)) AS width,
           |    arg_min(CASE WHEN typ = 3 THEN v16 ELSE v32 END, i)
           |      FILTER (WHERE fits AND tag = 257 AND cnt = 1
           |        AND typ IN (3, 4)) AS height,
           |    arg_min(CASE WHEN typ = 3 THEN v16 ELSE v32 END, i)
           |      FILTER (WHERE fits AND tag = 274 AND cnt = 1
           |        AND typ IN (3, 4)) AS orientation
           |  FROM fx GROUP BY doc_id)
           |SELECT nd.doc_id, nd.is_tiff,
           |  CASE WHEN nd.is_tiff THEN nd.le END AS little_endian,
           |  nd.n AS n_entries, m.width, m.height, m.orientation
           |FROM nd JOIN m USING (doc_id) ORDER BY nd.doc_id""".stripMargin,

    "q_mm_decode" ->
      """WITH ch AS (
        |  SELECT doc_id, CAST(sum(ascii(substr(text, i, 1))) AS DOUBLE) AS bsum
        |  FROM documents,
        |    LATERAL (SELECT unnest(generate_series(1, length(text))) AS i)
        |  GROUP BY doc_id)
        |SELECT d.doc_id AS media_id, 'image' AS modality,
        |  CAST(octet_length(encode(d.text)) AS BIGINT) AS byte_len,
        |  substr(sha256(d.text), 1, 8) AS sha_prefix,
        |  CAST(octet_length(encode(d.text)) % 640 AS INT) AS width,
        |  CAST(octet_length(encode(d.text)) % 480 AS INT) AS height,
        |  round(ch.bsum / octet_length(encode(d.text)), 6) AS mean_channel
        |FROM documents d JOIN ch ON d.doc_id = ch.doc_id
        |ORDER BY media_id""".stripMargin,

    "q_mm_resize" ->
      """SELECT doc_id AS media_id, 64 AS width, 64 AS height,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    [CAST(ascii(substr(text,
        |        CAST((i * length(text)) // 32 + 1 AS INT), 1)) AS DOUBLE)
        |     for i in generate_series(0, 31)]),
        |    (a, b) -> a + b) / 32.0, 6) AS mean_channel_resized
        |FROM documents ORDER BY media_id""".stripMargin,

    "q_mm_frames" ->
      """SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
        |  substr(text, CAST(f * (octet_length(encode(text)) // 4) + 1 AS INT), 16)
        |    AS frame_str
        |FROM documents, LATERAL (SELECT unnest(generate_series(0, 3)) AS f)
        |ORDER BY media_id, frame_idx""".stripMargin,

    // frame-index replay: CLOSED-FORM layout from the generator params
    // (the q_mm_mp4 discipline) — n/spc/sizes are doc_id algebra, a
    // frame's offset is mdat_data_start (252 + 4n + 4·chunks, the summed
    // box headers) + its running prior-size sum (chunks are contiguous,
    // so the chunked walk must land on the flat prefix sums); any
    // descent/stsc/stco bug in the engine's GENERIC parser breaks this
    "q_mm_frame_index" ->
      """WITH p AS (SELECT doc_id, doc_id % 3 + 1 AS spc,
        |    doc_id % 5 + 2 AS n,
        |    (doc_id % 7 <> 3 AND doc_id % 11 <> 5) AS ok
        |  FROM documents),
        |f AS (SELECT doc_id, spc, n,
        |    unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS i
        |  FROM p WHERE ok),
        |s AS (SELECT *, (doc_id + i) % 7 + 4 AS sz FROM f),
        |c AS (SELECT *, coalesce(SUM(sz) OVER (PARTITION BY doc_id
        |    ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS bef FROM s),
        |good AS (SELECT doc_id, TRUE AS ok, CAST(n AS BIGINT) AS n_samples,
        |    CAST((n + spc - 1) // spc AS BIGINT) AS n_chunks,
        |    CAST(i AS BIGINT) AS frame_idx,
        |    CAST(252 + 4 * n + 4 * ((n + spc - 1) // spc) + bef AS BIGINT)
        |      AS off,
        |    CAST(sz AS BIGINT) AS sz,
        |    substr('f' || doc_id || '_' || i || repeat('x', 16), 1,
        |      CAST(sz AS INT)) AS frame_str
        |  FROM c),
        |bad AS (SELECT doc_id, FALSE AS ok, NULL::BIGINT AS n_samples,
        |    NULL::BIGINT AS n_chunks, NULL::BIGINT AS frame_idx,
        |    NULL::BIGINT AS off, NULL::BIGINT AS sz,
        |    NULL::VARCHAR AS frame_str
        |  FROM p WHERE NOT ok)
        |SELECT * FROM good UNION ALL SELECT * FROM bad
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // frame-dedup replay: same closed-form layout, content keyed on
    // doc_id%50 (identical frames across a class, chunked differently
    // per doc), md5 over the generated frame STRING == the engine's md5
    // over the container-sliced frame BYTES — so the group counts match
    // only if every copy's walked (offset, size) extent is byte-exact
    "q_mm_frame_dedup" ->
      """WITH p AS (SELECT doc_id, doc_id % 50 AS k,
        |    doc_id % 5 + 2 AS n
        |  FROM documents WHERE doc_id % 7 <> 3 AND doc_id % 11 <> 5),
        |f AS (SELECT doc_id, k,
        |    unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS i
        |  FROM p),
        |s AS (SELECT doc_id, k, i, (k + i) % 7 + 4 AS sz FROM f),
        |h AS (SELECT doc_id,
        |    md5(substr('g' || k || '_' || i || repeat('x', 16), 1,
        |      CAST(sz AS INT))) AS fp
        |  FROM s)
        |SELECT fp, CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  min(doc_id) AS keep_doc
        |FROM h GROUP BY fp ORDER BY fp""".stripMargin,

    // bucket replay via the same md5-nibble integer math ('0x'||substr
    // idiom == Spark conv(substring(md5,1,4),16,10)); occupied =
    // count-distinct-of-buckets, exact in both engines
    "q_doc_cardinality" ->
      raw"""WITH tk AS (
           |  SELECT lang,
           |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |b AS (SELECT lang, term,
           |    ('0x' || substr(md5(term), 1, 4))::BIGINT % 4096 AS bk
           |  FROM tk)
           |SELECT lang, CAST(count(DISTINCT bk) AS BIGINT) AS occupied,
           |  CAST(count(DISTINCT term) AS BIGINT) AS n_exact
           |FROM b GROUP BY lang ORDER BY lang""".stripMargin,

    // merge-loop replay in SQL: each symbol is wrapped as SEP||sym||SEP
    // (SEP = chr(1), never inside a symbol), so the pattern for merge (a,b)
    // — SEP a SEP SEP b SEP — can neither match mid-symbol (needs a leading
    // SEP) nor consume the next pair's delimiter (each symbol carries its
    // own); replace() is left-to-right non-overlapping in both engines,
    // matching mergeOnce's greedy scan. Final pieces = split on SEP minus
    // empties.
    "q_doc_bpe_encode" ->
      s"""WITH $bpeEncCteSql
        |SELECT doc_id, CAST(pos AS INT) AS pos, term,
        |  CAST(pi - 1 AS INT) AS piece_idx, pieces[pi] AS piece
        |FROM enc, LATERAL (SELECT unnest(generate_series(1, len(pieces))) AS pi)
        |ORDER BY doc_id, pos, piece_idx""".stripMargin,

    // span-corruption replay, independent formulation: per-position mask
    // bits from the same md5 selectors, then run indexing via window
    // prefix sums and string_agg (ORDER BY p) instead of the engine's
    // array fold — the strings must still agree byte-for-byte
    "q_doc_span_corrupt" ->
      s"""WITH ${spanCorruptCtes(10, 3, "true", "r")}
         |SELECT doc_id, n_tokens, n_masked, n_spans, input_fp, target_fp
         |FROM (${spanCorruptSql(10, 3, "true", "r")}) z
         |ORDER BY doc_id""".stripMargin,

    // UL2 mixture replay: three denoiser configs, each the same replay
    // with its own (rate, span) parameters over its doc_id%3 slice
    "q_doc_ul2_mixture" ->
      s"""WITH ${spanCorruptCtes(10, 3, "doc_id % 3 = 0", "r")},
         |${spanCorruptCtes(20, 4, "doc_id % 3 = 1", "x")},
         |${spanCorruptCtes(50, 1, "doc_id % 3 = 2", "s")}
         |SELECT * FROM (
         |${spanCorruptSql(10, 3, "doc_id % 3 = 0", "r")}
         |UNION ALL
         |${spanCorruptSql(20, 4, "doc_id % 3 = 1", "x")}
         |UNION ALL
         |${spanCorruptSql(50, 1, "doc_id % 3 = 2", "s")}) z
         |ORDER BY doc_id""".stripMargin,

    // unigram Viterbi replay: vocab (BPE pieces + chars, floor-log2
    // costs via unpadded bin()), then the DP UNROLLED — dp0..dp12 CTEs
    // (corpus max word length is 8 at every SF; 12 is headroom, and a
    // longer word would fail the gate loudly, not silently), a dpall
    // union for runtime-j lookups, and 12 backtrack steps re-deriving
    // the longest-piece tie pin from dp costs exactly like the engine
    // fertility-compare replay off the same shared CTE stack: BPE piece
    // sums from enc, unigram sums from the per-term DP piece counts
    // (LEFT JOIN keeps all-empty-token docs on both sides)
    "q_doc_tokenizer_compare" ->
      s"""WITH $unigramCtesSql,
         |bp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(len(pieces)) AS BIGINT) AS bpe_pieces
         |  FROM enc GROUP BY doc_id),
         |up AS (SELECT t.doc_id,
         |    CAST(sum(coalesce(np.total, 0)) AS BIGINT) AS uni_pieces
         |  FROM tok t LEFT JOIN np ON np.term = t.term
         |  GROUP BY t.doc_id)
         |SELECT b.doc_id, b.n_tokens, b.bpe_pieces, u.uni_pieces,
         |  u.uni_pieces - b.bpe_pieces AS piece_delta
         |FROM bp b JOIN up u USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_doc_unigram_segment" ->
      s"""WITH $unigramCtesSql
         |SELECT t.doc_id, CAST(t.pos AS INT) AS pos, t.term,
         |  wc.cost_milli,
         |  CAST(np.total - 1 - p.s AS INT) AS piece_idx, p.piece
         |FROM tok t
         |JOIN pieces p ON p.term = t.term
         |JOIN np ON np.term = t.term
         |JOIN wc ON wc.term = t.term
         |ORDER BY doc_id, pos, piece_idx""".stripMargin,
    // byte-level encode replay: same regex split, corpus-restricted byte
    // map, chained-replace merge loop (see bpeByteEncCteSql)
    "q_doc_bpe_bytes" ->
      s"""WITH $bpeByteEncCteSql
        |SELECT doc_id, CAST(pos AS INT) AS pos, term,
        |  CAST(pi - 1 AS INT) AS piece_idx, pieces[pi] AS piece
        |FROM benc, LATERAL
        |  (SELECT unnest(generate_series(1, len(pieces))) AS pi)
        |ORDER BY doc_id, pos, piece_idx""".stripMargin,

    // byte-level round trip stated from the ORIGINAL text alone: the
    // raw md5 and the pretoken count — Spark must reconstruct the exact
    // bytes (case, whitespace) from the encoded pieces
    "q_doc_bpe_bytes_roundtrip" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$preTokenReSql')) AS BIGINT)
         |    AS n_tokens,
         |  md5(text) AS rt_fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    // round-trip identity stated from the ORIGINAL text: normalize,
    // split, rejoin — never the pieces; Spark must reconstruct this
    // byte-exactly from the encoded stream alone
    "q_doc_bpe_roundtrip" ->
      raw"""WITH n AS (SELECT doc_id,
           |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_split_to_array(t, '\s+')) AS BIGINT)
           |    AS n_tokens,
           |  md5(t) AS rt_fp
           |FROM n ORDER BY doc_id""".stripMargin,

    // the bpe replay chained into the recursive greedy-pack CTE (the
    // q_doc_pack idiom, sized by pieces instead of whitespace tokens)
    "q_doc_bpe_pack" ->
      s"""WITH RECURSIVE $bpeEncCteSql,
        |cnt AS (SELECT doc_id, CAST(sum(len(pieces)) AS INT) AS n_pieces
        |        FROM enc GROUP BY doc_id),
        |tk AS MATERIALIZED (SELECT d.lang, c.doc_id, c.n_pieces,
        |    CAST(row_number() OVER (PARTITION BY d.lang ORDER BY c.doc_id)
        |      AS INT) AS rn
        |  FROM cnt c JOIN documents d USING (doc_id)),
        |p AS (
        |  SELECT lang, doc_id, n_pieces, rn, 0 AS bin, n_pieces AS fill
        |  FROM tk WHERE rn = 1
        |  UNION ALL
        |  SELECT tk.lang, tk.doc_id, tk.n_pieces, tk.rn,
        |    CASE WHEN p.fill + tk.n_pieces <= 256 THEN p.bin
        |         ELSE p.bin + 1 END AS bin,
        |    CASE WHEN p.fill + tk.n_pieces <= 256
        |         THEN p.fill + tk.n_pieces
        |         ELSE tk.n_pieces END AS fill
        |  FROM tk JOIN p ON tk.lang = p.lang AND tk.rn = p.rn + 1)
        |SELECT lang, doc_id, n_pieces, CAST(bin AS INT) AS bin
        |FROM p ORDER BY lang, doc_id""".stripMargin,

    // expected decode facts stated in closed form from the pixel generator
    // (computed here in plain Scala, independent of the codec under test)
    "q_mm_decode_png" -> {
      val rows = (0 until 8).map { k =>
        val (w, h, np, sr, sg, sb, fp) = mmPngExpected(k)
        s"($k, $w, $h, $np, $sr, $sg, $sb, CAST($fp AS BIGINT))"
      }.mkString(",\n        |    ")
      s"""WITH e(k, w, h, np, sr, sg, sb, fp) AS (VALUES
        |    $rows)
        |SELECT d.doc_id AS media_id, d.doc_id % 10 < 8 AS decoded,
        |  CAST(e.w AS INT) AS width, CAST(e.h AS INT) AS height,
        |  CAST(e.np AS BIGINT) AS n_pixels, CAST(e.sr AS BIGINT) AS sum_r,
        |  CAST(e.sg AS BIGINT) AS sum_g, CAST(e.sb AS BIGINT) AS sum_b,
        |  e.fp AS px_fp
        |FROM documents d
        |LEFT JOIN e ON CAST(d.doc_id % 10 AS INT) = e.k
        |ORDER BY media_id""".stripMargin
    },

    // per-(residue, cell) patch sums stated closed-form from the SAME
    // pixel generator — junk residues 8/9 contribute no rows (inner join)
    "q_mm_patches" -> {
      val rows = (for {
        k <- 0 until 8
        (w, h) = mmPngDims(k)
        py <- 0 until (h + 1) / 2
        px <- 0 until (w + 1) / 2
      } yield {
        var sr = 0L; var sg = 0L; var sb = 0L; var n = 0
        for (y <- py * 2 until math.min(py * 2 + 2, h);
             x <- px * 2 until math.min(px * 2 + 2, w)) {
          val p = mmPngPixel(k)(x, y)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          n += 1
        }
        s"($k, $py, $px, $n, $sr, $sg, $sb)"
      }).mkString(",\n        |    ")
      s"""WITH e(k, py, px, n, sr, sg, sb) AS (VALUES
        |    $rows)
        |SELECT d.doc_id AS media_id, CAST(e.py AS INT) AS py,
        |  CAST(e.px AS INT) AS px, CAST(e.n AS INT) AS n_px,
        |  CAST(e.sr AS BIGINT) AS sum_r, CAST(e.sg AS BIGINT) AS sum_g,
        |  CAST(e.sb AS BIGINT) AS sum_b
        |FROM documents d
        |JOIN e ON CAST(d.doc_id % 10 AS INT) = e.k
        |ORDER BY media_id, py, px""".stripMargin
    },

    // nearest-neighbor resized sums stated from the generator via the
    // same integer source mapping (x*w div tw, y*h div th)
    "q_mm_resize_nn" -> {
      val rows = (0 until 8).map { k =>
        val (sr, sg, sb) = mmPngResizedExpected(k, 4, 3)
        s"($k, $sr, $sg, $sb)"
      }.mkString(",\n        |    ")
      s"""WITH e(k, sr, sg, sb) AS (VALUES
        |    $rows)
        |SELECT d.doc_id AS media_id, d.doc_id % 10 < 8 AS decoded,
        |  CASE WHEN d.doc_id % 10 < 8 THEN 4 END AS width,
        |  CASE WHEN d.doc_id % 10 < 8 THEN 3 END AS height,
        |  CAST(e.sr AS BIGINT) AS sum_r, CAST(e.sg AS BIGINT) AS sum_g,
        |  CAST(e.sb AS BIGINT) AS sum_b
        |FROM documents d
        |LEFT JOIN e ON CAST(d.doc_id % 10 AS INT) = e.k
        |ORDER BY media_id""".stripMargin
    },

    // visual dedup groups: one group per pixel grid k, spanning BOTH
    // container formats — n/min_id/n_formats derivable from doc_id math,
    // the fingerprint from the generator
    "q_mm_visual_dedup" -> {
      val rows = (0 until 8).map { k =>
        s"($k, CAST(${mmPngExpected(k)._7} AS BIGINT))"
      }.mkString(",\n        |    ")
      s"""WITH e(k, fp) AS (VALUES
        |    $rows),
        |g AS (SELECT CAST((doc_id // 2) % 8 AS INT) AS k,
        |        CAST(count(*) AS BIGINT) AS n, min(doc_id) AS min_id,
        |        CAST(count(DISTINCT doc_id % 2) AS BIGINT) AS n_formats
        |      FROM documents GROUP BY 1)
        |SELECT e.fp AS px_fp, g.n, g.min_id, g.n_formats
        |FROM g JOIN e USING (k)
        |ORDER BY px_fp""".stripMargin
    },

    // perceptual dedup in closed form: every doc of pattern group k hashes
    // to the generator-derived (aHash, dHash) regardless of container or
    // 2× scale, so pairs = C(n_k,2), cross-format pairs = evens×odds,
    // hamming 0 throughout; hash VALUES come from the generator replica
    "q_mm_perceptual_dedup" -> {
      val rows = (0 until 8).map { k =>
        val (a, d) = mmPhashExpected(k)
        f"($k, '$a%016X', '$d%016X')"
      }.mkString(",\n        |    ")
      s"""WITH e(grp, ahash_hex, dhash_hex) AS (VALUES
        |    $rows),
        |g AS (SELECT CAST((doc_id // 2) % 8 AS INT) AS grp, count(*) AS n,
        |        count(*) FILTER (WHERE doc_id % 2 = 0) AS ne,
        |        count(*) FILTER (WHERE doc_id % 2 = 1) AS no
        |      FROM documents WHERE doc_id < 5120 GROUP BY 1)
        |SELECT g.grp, CAST(g.n * (g.n - 1) // 2 AS BIGINT) AS n_pairs,
        |  CAST(g.ne * g.no AS BIGINT) AS n_cross_format,
        |  CAST(0 AS INT) AS max_hamming,
        |  CAST(g.n * (g.n - 1) // 2 AS BIGINT) AS n_dhash_match,
        |  CAST(1 AS BIGINT) AS n_hashes, e.ahash_hex, e.dhash_hex
        |FROM g JOIN e USING (grp)
        |ORDER BY g.grp""".stripMargin
    },

    // interleave replay: aHashes stated from the generator (the decode
    // gates prove codec identity), sentence 52-bit md5 sigs and the
    // (hamming, sent_idx) argmin replayed; the lexicographic tiebreak is
    // encoded as ham*1e6+idx (sent counts are docs-bounded << 1e6)
    "q_mm_interleave" -> {
      val rows = (0 until 8).map { k =>
        s"($k, CAST(${mmPhashExpected(k)._1} AS BIGINT))"
      }.mkString(",\n        |    ")
      s"""WITH e(k, ahash) AS (VALUES
        |    $rows),
        |w AS (SELECT doc_id,
        |        regexp_split_to_array(trim(text), '\\s+') AS words
        |      FROM documents),
        |sent AS (SELECT doc_id, g.g AS sent_idx,
        |    ('0x' || substr(md5(array_to_string(
        |      words[(g.g*5+1):(g.g*5+5)], ' ')), 1, 13))::BIGINT AS sig
        |  FROM w, UNNEST(range(0, (len(words)+4)//5)) AS g(g)),
        |img AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS img_slot, e.ahash
        |  FROM documents JOIN e ON CAST(doc_id % 8 AS INT) = e.k
        |  UNION ALL
        |  SELECT doc_id, CAST(1 AS BIGINT), e.ahash
        |  FROM documents JOIN e ON CAST((doc_id // 8) % 8 AS INT) = e.k),
        |j AS (SELECT i.doc_id, i.img_slot, i.ahash,
        |        CAST(bit_count(xor(i.ahash, s.sig)) AS BIGINT) * 1000000
        |          + s.sent_idx AS key
        |      FROM img i JOIN sent s ON i.doc_id = s.doc_id),
        |m AS (SELECT doc_id, img_slot, min(ahash) AS ahash,
        |        min(key) AS key, count(*) AS n_sentences
        |      FROM j GROUP BY 1, 2)
        |SELECT doc_id, img_slot, ahash, key % 1000000 AS best_sent_idx,
        |  key // 1000000 AS best_hamming, n_sentences
        |FROM m ORDER BY doc_id, img_slot""".stripMargin
    },

    // new-batch dedup verdicts in closed form: grid j < 8 collides with
    // the standing corpus (which covers all 8 old grids at any corpus
    // size >= 16), j >= 8 is novel
    "q_mm_incremental_dedup" ->
      """SELECT doc_id AS media_id, ((doc_id // 2) % 16) < 8 AS is_dup
        |FROM documents WHERE doc_id % 2 = 1
        |ORDER BY media_id""".stripMargin,

    // NN resample of the 4-sample stream to 3: source indices i·4 div 3 =
    // 0, 1, 2 — the first three assembly samples, stated directly
    "q_mm_resample_wav" ->
      """SELECT doc_id AS media_id, doc_id % 5 <> 0 AS decoded,
        |  CASE WHEN doc_id % 5 <> 0 THEN CAST(3 AS BIGINT) END AS n_out,
        |  CASE WHEN doc_id % 5 <> 0 THEN CAST(
        |    (doc_id * 7) % 30000 + (doc_id * 7 + 1231) % 30000
        |    + (doc_id * 7 + 2462) % 30000 AS BIGINT) END AS sum_val,
        |  CASE WHEN doc_id % 5 <> 0 THEN CAST(greatest(
        |    (doc_id * 7) % 30000, (doc_id * 7 + 1231) % 30000,
        |    (doc_id * 7 + 2462) % 30000) AS BIGINT) END AS peak_abs
        |FROM documents ORDER BY media_id""".stripMargin,

    // decode → quarantine → visual-dedup-keep-min → per-dimension summary:
    // dims are unique per pixel grid k, so each (width, height) keeps
    // exactly the lowest doc_id of its k-residue class
    "q_mm_pipeline" -> {
      val rows = (0 until 8).map { k =>
        val (w, h, _, sr, _, _, _) = mmPngExpected(k)
        s"($k, $w, $h, $sr)"
      }.mkString(",\n        |    ")
      s"""WITH e(k, w, h, sr) AS (VALUES
        |    $rows),
        |m AS (SELECT CAST(doc_id % 10 AS INT) AS k, min(doc_id) AS min_id
        |      FROM documents WHERE doc_id % 10 < 8 GROUP BY 1)
        |SELECT CAST(e.w AS INT) AS width, CAST(e.h AS INT) AS height,
        |  CAST(1 AS BIGINT) AS n_kept, m.min_id,
        |  CAST(e.sr AS BIGINT) AS tot_r
        |FROM e JOIN m USING (k)
        |ORDER BY width, height""".stripMargin
    },

    // identity oracle: the same doc_id-derived sample math the query
    // assembled into the PCM data chunk, stated directly
    "q_mm_decode_wav" ->
      """SELECT doc_id AS media_id, doc_id % 5 <> 0 AS decoded,
        |  CASE WHEN doc_id % 5 <> 0 THEN 1 END AS channels,
        |  CASE WHEN doc_id % 5 <> 0 THEN
        |    CAST([8000, 16000, 22050, 44100][CAST(doc_id % 4 + 1 AS INT)]
        |      AS BIGINT) END AS sample_rate,
        |  CASE WHEN doc_id % 5 <> 0 THEN 16 END AS bits_per_sample,
        |  CASE WHEN doc_id % 5 <> 0 THEN CAST(4 AS BIGINT) END AS n_samples,
        |  CASE WHEN doc_id % 5 <> 0 THEN CAST(
        |    (doc_id * 7) % 30000 + (doc_id * 7 + 1231) % 30000
        |    + (doc_id * 7 + 2462) % 30000 + (doc_id * 7 + 3693) % 30000
        |    AS BIGINT) END AS sum_val,
        |  CASE WHEN doc_id % 5 <> 0 THEN CAST(greatest(
        |    (doc_id * 7) % 30000, (doc_id * 7 + 1231) % 30000,
        |    (doc_id * 7 + 2462) % 30000, (doc_id * 7 + 3693) % 30000)
        |    AS BIGINT) END AS peak_abs
        |FROM documents ORDER BY media_id""".stripMargin,

    // WHT-fp closed-form oracle: the generator plants IDENTICAL sign
    // patterns inside a group (amplitude differs only) and independent
    // quadratic-hash patterns across groups, so the expected pair set is
    // pure combinatorics on group sizes — every within-group pair at
    // Hamming 0 (WHT linearity), zero cross-group pairs, junk docs
    // excluded. Any engine deviation (lossy decode, a sign flip, a
    // banding miss, a cross-group collision) breaks a count
    "q_mm_audio_fp" ->
      """WITH d AS (SELECT doc_id, (doc_id // 2) % 8 AS g, doc_id % 2 AS par
        |  FROM documents WHERE doc_id % 29 <> 11 AND doc_id < 2000),
        |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ne,
        |    CAST(sum(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS BIGINT) AS no
        |  FROM d GROUP BY g)
        |SELECT CAST(g AS INT) AS grp, n * (n - 1) // 2 AS n_pairs,
        |  ne * no AS n_amp_pairs, CAST(0 AS INT) AS max_hamming,
        |  CAST(0 AS BIGINT) AS n_cross_grp
        |FROM s ORDER BY grp""".stripMargin,

    // identity oracle: replay the windowed sample math of the assembly —
    // window w of doc d is zeroed iff (d+w) % 3 = 0, else samples follow
    // the decode_wav formula; quarantined docs (d % 5 = 0) emit no windows
    // audio-quality replay: same sample formula in closed form; the
    // quarantined rows carry NULL counts but a FALSE audio_ok
    "q_mm_audio_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    [CASE WHEN i < 8 AND doc_id % 3 = 0 THEN 0
        |          WHEN i >= 12 AND doc_id % 4 = 0 THEN 32767
        |          ELSE (doc_id*7 + i*1231) % 30000 END
        |     for i in generate_series(0, 15)] AS s
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(16 AS BIGINT) AS n,
        |    CAST(len(list_filter(s, x -> abs(x) <= 100)) AS BIGINT)
        |      AS n_silence,
        |    CAST(len(list_filter(s, x -> abs(x) >= 32000)) AS BIGINT)
        |      AS n_clip,
        |    CAST(list_sum(list_transform(s, x -> x*x)) AS BIGINT)
        |      AS energy,
        |    CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT)
        |      AS peak_abs
        |  FROM base)
        |SELECT doc_id AS media_id,
        |  (doc_id % 5 <> 0) AS decoded,
        |  CASE WHEN doc_id % 5 <> 0 THEN n END AS n,
        |  CASE WHEN doc_id % 5 <> 0 THEN n_silence END AS n_silence,
        |  CASE WHEN doc_id % 5 <> 0 THEN n_clip END AS n_clip,
        |  CASE WHEN doc_id % 5 <> 0 THEN energy END AS energy,
        |  CASE WHEN doc_id % 5 <> 0 THEN peak_abs END AS peak_abs,
        |  CASE WHEN doc_id % 5 <> 0
        |    THEN CAST(n_silence * 1000000 // n AS BIGINT) END
        |    AS silence_ppm,
        |  CASE WHEN doc_id % 5 <> 0
        |    THEN CAST(n_clip * 1000000 // n AS BIGINT) END AS clip_ppm,
        |  CASE WHEN doc_id % 5 <> 0 THEN n_silence * 2 >= n END
        |    AS too_silent,
        |  CASE WHEN doc_id % 5 <> 0 THEN n_clip * 100 >= n END AS clipped,
        |  CASE WHEN doc_id % 5 <> 0
        |    THEN (n_silence * 2 < n AND n_clip * 100 < n)
        |    ELSE false END AS audio_ok
        |FROM c ORDER BY media_id""".stripMargin,

    "q_mm_audio_energy" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(generate_series(0, 2)) AS w
        |  FROM documents WHERE doc_id % 5 <> 0),
        |e AS (
        |  SELECT doc_id, w,
        |    CAST(list_sum(
        |      [CASE WHEN (doc_id + w) % 3 = 0 THEN 0
        |            ELSE ((doc_id*7 + i*1231) % 30000)
        |               * ((doc_id*7 + i*1231) % 30000) END
        |       for i in generate_series(4*w, 4*w + 3)]) AS BIGINT) AS energy,
        |    CAST(list_max(
        |      [CASE WHEN (doc_id + w) % 3 = 0 THEN 0
        |            ELSE (doc_id*7 + i*1231) % 30000 END
        |       for i in generate_series(4*w, 4*w + 3)]) AS BIGINT) AS peak
        |  FROM w)
        |SELECT doc_id AS media_id, CAST(w AS INT) AS win_idx,
        |  CAST(4 AS BIGINT) AS n, energy, peak AS peak_abs,
        |  energy = 0 AS silent
        |FROM e ORDER BY media_id, win_idx""".stripMargin)
}
