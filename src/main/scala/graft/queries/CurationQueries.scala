package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Sampling, TextOps}

/** Corpus-curation gate queries (decontamination, repetition profiling,
  * stratified sampling, sequence packing) — the round-3 additions to the
  * LLM-pipeline surface, each with a full DuckDB oracle.
  */
object CurationQueries {

  private val rates = Map("en" -> 40, "de" -> 75, "fr" -> 100)

  /** Deterministic messy URL per doc for the url-canon gates: every
    * canonicalization rule is exercised by some residue class of doc_id.
    * Mirrored 1:1 by [[synthUrlSql]] on the oracle side.
    */
  private def synthUrl: org.apache.spark.sql.Column = {
    def m(k: Int) = pmod(col("doc_id"), lit(k))
    val scheme = when(m(2) === 0, lit("HTTP")).otherwise(lit("https"))
    val userinfo = when(m(7) === 6, lit("User:Pw@")).otherwise(lit(""))
    val www = when(m(3) === 0, lit("WWW.")).otherwise(lit(""))
    val host = when(m(2) === 0,
        concat(lit("Host"), m(7).cast("string"),
          lit(".Example"), m(4).cast("string"), lit(".COM")))
      .otherwise(concat(lit("Host"), m(7).cast("string"),
        lit(".Blog"), m(3).cast("string"), lit(".Co.UK")))
    val port = when(m(4) === 0,
        when(m(2) === 0, lit(":80")).otherwise(lit(":443")))
      .when(m(4) === 1, lit(":8080"))
      .otherwise(lit(""))
    val path = when(m(5) === 0, lit(""))
      .otherwise(concat(lit("/Page/"), m(5).cast("string")))
    val query = concat(lit("?utm_source=feed&id="), m(4).cast("string"),
      when(m(3) === 1, lit("&fbclid=ZZZ&x=1")).otherwise(lit("&ref=tw")))
    val frag = when(m(3) === 2, lit("#Sec2")).otherwise(lit(""))
    concat(scheme, lit("://"), userinfo, www, host, port, path, query,
      frag)
  }

  /** DuckDB replica of [[synthUrl]] — same residue classes, same bytes. */
  private val synthUrlSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || '://' ||
      | CASE WHEN doc_id % 7 = 6 THEN 'User:Pw@' ELSE '' END ||
      | CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
      | CASE WHEN doc_id % 2 = 0
      |   THEN 'Host' || (doc_id % 7) || '.Example' || (doc_id % 4) || '.COM'
      |   ELSE 'Host' || (doc_id % 7) || '.Blog' || (doc_id % 3) || '.Co.UK'
      | END ||
      | CASE WHEN doc_id % 4 = 0 THEN
      |     (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
      |   WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END ||
      | CASE WHEN doc_id % 5 = 0 THEN '' ELSE '/Page/' || (doc_id % 5) END ||
      | '?utm_source=feed&id=' || (doc_id % 4) ||
      | CASE WHEN doc_id % 3 = 1 THEN '&fbclid=ZZZ&x=1' ELSE '&ref=tw' END ||
      | CASE WHEN doc_id % 3 = 2 THEN '#Sec2' ELSE '' END)"""
      .stripMargin.replace("\n", "")

  /** Generic canonicalization replay (CTE fragment producing doc_id, url,
    * canon, host): the same rule pipeline as
    * [[graft.ops.UrlOps.canonicalizeUrl]] in DuckDB SQL.
    */
  private val urlCanonCtes: String =
    raw"""u AS (SELECT doc_id, $synthUrlSql AS url FROM documents),
         |au AS (SELECT doc_id, url,
         |    regexp_replace(
         |      regexp_extract(url, '^[^:]+://([^/?#]*)', 1),
         |      '^.*@', '') AS hp
         |  FROM u),
         |px AS (SELECT doc_id, url,
         |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
         |      AS scheme,
         |    regexp_replace(lower(regexp_extract(hp, '^([^:]+)', 1)),
         |      '^www\.', '') AS host,
         |    regexp_extract(hp, '^[^:]+:(\d+)$$', 1) AS port,
         |    regexp_extract(url, '^[^:]+://[^/?#]+([^?#]*)', 1) AS pth,
         |    regexp_extract(url, '\?([^#]*)', 1) AS qry
         |  FROM au),
         |cq AS (SELECT doc_id, url, scheme, host, port, pth,
         |    array_to_string(list_filter(string_split(qry, '&'),
         |      p -> NOT regexp_matches(p,
         |             '^(utm_[^=]*|fbclid|gclid|msclkid|ref)=')
         |        AND p <> ''), '&') AS q2
         |  FROM px),
         |c AS (SELECT doc_id, url, host,
         |    CASE WHEN scheme <> '' AND host <> '' THEN
         |      scheme || '://' || host ||
         |      CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
         |             AND NOT (scheme = 'https' AND port = '443')
         |        THEN ':' || port ELSE '' END ||
         |      CASE WHEN pth = '' THEN '/' ELSE pth END ||
         |      CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END
         |    ELSE url END AS canon
         |  FROM cq),
         |rd AS (SELECT doc_id, url, canon,
         |    string_split(regexp_extract(canon, '^[^:]+://([^/:?#]+)', 1),
         |      '.') AS ls
         |  FROM c),
         |dom AS (SELECT doc_id, url, canon,
         |    CASE WHEN len(ls) <= 1 THEN array_to_string(ls, '.')
         |         WHEN len(ls) >= 3
         |              AND ls[len(ls) - 1] IN
         |                ('co', 'com', 'org', 'net', 'ac', 'gov', 'edu')
         |              AND length(ls[len(ls)]) = 2
         |           THEN array_to_string(ls[len(ls) - 2:len(ls)], '.')
         |         ELSE array_to_string(ls[len(ls) - 1:len(ls)], '.')
         |         END AS domain
         |  FROM rd)""".stripMargin

  private val stopList = TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")

  /** Non-ASCII fixtures for the script-profile gate, shared between the
    * Spark synth (as literals) and the DuckDB oracle (as `chr()` chains
    * via [[sqlStr]] — codepoints, not raw bytes, so the oracle text
    * survives any JSON/transport encoding untouched).
    */
  private object ScriptFixtures {
    // escaped, not literal: RTL/CJK literals garble source-file review
    val cyr = "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"     // privet mir
    val cjk = "\u4f60\u597d\u4e16\u754c\u4f60\u597d\u4e16\u754c \u3053\u3093\u306b\u3061\u306f"     // nihao shijie x2 + konnichiwa
    val ara = "\u0645\u0631\u062d\u0628\u0627 \u0645\u0631\u062d\u0628\u0627 \u0628\u0627\u0644\u0639\u0627\u0644\u0645"     // marhaban x2 bialealam
    /** A DuckDB expression producing exactly `s`, codepoint by codepoint. */
    def sqlStr(s: String): String =
      s.map(c => s"chr(${c.toInt})").mkString("(", " || ", ")")
  }

  /** Planted boilerplate pair for the segment near-dup gate: two 20-token
    * newsletter lines differing only in the final token, chosen so their
    * 64-bit token SimHashes sit at hamming distance 3 (verified offline
    * with the same md5-majority math) — inside the banded screen's
    * pigeonhole-complete radius.
    */
  private val bpA = "sign up for our weekly newsletter and get the best " +
    "stories delivered right to your inbox every single day now"
  private val bpB = "sign up for our weekly newsletter and get the best " +
    "stories delivered right to your inbox every single day instant"

  /** Brute-force segment-level SimHash near-dup replay: the
    * [[CorpusOps]] simhash mirror (md5 hex nibbles → 64 bit-sums →
    * majority bands → bit_count(xor)) re-keyed on DISTINCT normalized
    * segments of the synthesized two-line docs.
    */
  private val segNearDupSql: String = {
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
    raw"""WITH tk AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
         |  FROM documents),
         |d AS (SELECT doc_id,
         |    array_to_string(t[1:9], ' ') || chr(10) ||
         |    CASE WHEN doc_id % 2 = 0 THEN '$bpA' ELSE '$bpB' END AS txt
         |  FROM tk),
         |seg0 AS (SELECT doc_id, unnest(string_split(txt, chr(10))) AS sr
         |  FROM d),
         |segn AS (SELECT doc_id,
         |    lower(trim(regexp_replace(sr, '\s+', ' ', 'g'))) AS seg
         |  FROM seg0),
         |segf AS (SELECT doc_id, seg FROM segn
         |  WHERE len(string_split(seg, ' ')) >= 3),
         |dseg AS (SELECT seg, md5(seg) AS fp,
         |    count(DISTINCT doc_id) AS n_docs
         |  FROM segf GROUP BY seg),
         |toks AS (SELECT fp, unnest(string_split(seg, ' ')) AS tk2
         |  FROM dseg),
         |h AS (SELECT fp, md5(tk2) AS hx FROM toks),
         |nib AS (SELECT fp,
         |    $nibCols
         |  FROM h),
         |s AS (SELECT fp,
         |    $sumCols,
         |    count(*) AS ntok
         |  FROM nib GROUP BY fp),
         |bands AS (SELECT fp,
         |    $bandCols
         |  FROM s),
         |bc AS (SELECT bands.*, dseg.n_docs FROM bands
         |  JOIN dseg ON bands.fp = dseg.fp)
         |SELECT a.fp AS fp_a, b.fp AS fp_b, CAST($ham AS INT) AS hamming,
         |  CAST(a.n_docs AS BIGINT) AS docs_a,
         |  CAST(b.n_docs AS BIGINT) AS docs_b
         |FROM bc a JOIN bc b ON a.fp < b.fp
         |WHERE $ham <= 3
         |ORDER BY fp_a, fp_b""".stripMargin
  }

  /** DSIR weight replay (CTE fragment ending in `dsir(doc_id, n_feats,
    * dsir_ppm)`): hashed-bigram buckets, add-one smoothing over the
    * 1024-cell domain, HUGEINT products, per-doc floor mean — shared by
    * the score gate and the resampling gate.
    */
  private val dsirCtes: String =
    raw"""tk AS (
         |  SELECT doc_id, lang,
         |    regexp_split_to_array(
         |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')
         |      AS ws
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, lang, ws[i] || ' ' || ws[i+1] AS g
         |  FROM tk, LATERAL (
         |    SELECT unnest(generate_series(1, len(ws) - 1)) AS i)),
         |gb AS (SELECT doc_id, lang, md5(g) AS h FROM g),
         |bks AS (SELECT doc_id, lang, ${bucketSql(1024)} AS bk FROM gb),
         |rc AS (SELECT bk, CAST(count(*) AS BIGINT) AS n_r
         |  FROM bks GROUP BY bk),
         |tc AS (SELECT bk, CAST(count(*) AS BIGINT) AS n_t
         |  FROM bks WHERE lang = 'en' GROUP BY bk),
         |tot AS (SELECT (SELECT count(*) FROM bks) AS n_raw,
         |               (SELECT count(*) FROM bks WHERE lang = 'en')
         |                 AS n_tgt),
         |tab AS (
         |  SELECT s.bk,
         |    CAST((CAST(coalesce(tc.n_t, 0) + 1 AS HUGEINT)
         |          * (tot.n_raw + 1024) * 1000000)
         |      // (CAST(coalesce(rc.n_r, 0) + 1 AS HUGEINT)
         |          * (tot.n_tgt + 1024)) AS BIGINT) AS ratio_ppm
         |  FROM generate_series(0, 1023) AS s(bk)
         |  LEFT JOIN rc ON rc.bk = s.bk
         |  LEFT JOIN tc ON tc.bk = s.bk
         |  CROSS JOIN tot),
         |sc AS (
         |  SELECT bks.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |    CAST(sum(tab.ratio_ppm) AS BIGINT) AS s
         |  FROM bks JOIN tab ON tab.bk = bks.bk
         |  GROUP BY bks.doc_id),
         |dsir AS (
         |  SELECT d.doc_id,
         |    coalesce(sc.n_feats, 0) AS n_feats,
         |    CAST(CASE WHEN sc.n_feats IS NULL THEN 1000000
         |         ELSE sc.s // sc.n_feats END AS BIGINT) AS dsir_ppm
         |  FROM documents d LEFT JOIN sc USING (doc_id))""".stripMargin

  val defs: Map[String, QueryFn] = Map(

    // benchmark decontamination: train docs sharing any word 3-shingle
    // with the held-out test split (split = the same deterministic md5
    // bucketing as q_doc_hash_split, so the eval set needs no extra input)
    "q_doc_decontaminate" -> ((s, dir) => {
      val splitCol = Sampling.split(TextOps.normalize(col("text")),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      val tagged = wide(s, t(s, dir, "documents"))
        .select(col("doc_id"), col("text"), splitCol.as("split"))
      Curation.contaminationScan(
        tagged.where(col("split") === "train"),
        tagged.where(col("split") === "test"),
        "doc_id", "text", 3)
        .orderBy("doc_id")
    }),

    // the same scan with the eval shingle set shipped as BLOOM BITS
    // (Spark's own BloomFilterMightContain via the ColumnBridge seam)
    // instead of a broadcast relation — the web-scale form; exact
    // verification makes the output bit-identical to q_doc_decontaminate
    "q_doc_bloom_decontaminate" -> ((s, dir) => {
      val splitCol = Sampling.split(TextOps.normalize(col("text")),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      val tagged = wide(s, t(s, dir, "documents"))
        .select(col("doc_id"), col("text"), splitCol.as("split"))
      // auto-sized filter (expectedItems <= 0): the previous fixed 100k
      // capacity saturated at 10x data — fp rate ~1, prefilter dead
      Curation.contaminationScanBloom(
        tagged.where(col("split") === "train"),
        tagged.where(col("split") === "test"),
        "doc_id", "text", 3, expectedItems = -1L, fpp = 0.01)
        .orderBy("doc_id")
    }),

    // split-overlap audit matrix: pairwise shared-shingle counts and
    // containment between the train/val/test hash splits — the corpus-
    // level leak check (the per-doc view is q_doc_decontaminate)
    "q_doc_split_overlap" -> ((s, dir) =>
      Curation.splitOverlap(wide(s, t(s, dir, "documents")), "text", 3,
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .orderBy("split_a", "split_b")),

    // Gopher-style repetition signals: token totals, distinct counts, top
    // token frequency, raw-double ratios (derived fractions stay unrounded
    // — both engines run the identical IEEE division)
    "q_doc_repetition" -> ((s, dir) =>
      Curation.repetitionProfile(wide(s, t(s, dir, "documents")),
        "doc_id", "text")
        .orderBy("doc_id")),

    // deflate compression-ratio signal at the codec seam, gated with the
    // q_mm_wav identity discipline: payloads are assembled closed-form
    // per residue class — pure single-char repetition (deflate ≪ 10%),
    // sha256-chained hex noise (≈52-55%, no block repeats for deflate to
    // reference), and a half-noise/half-run hybrid (≈27%) — so exact
    // orig_bytes (the UTF-8 byte count carried through the seam) plus a
    // wide-margin ratio BAND are both stateable in SQL without replaying
    // zlib. A seam bug (payload truncation, charset drift, Deflater
    // state reuse across rows) breaks orig_bytes or flips a band
    "q_doc_compress_ratio" -> ((s, dir) => {
      val id = col("doc_id")
      val noise = concat((0 until 16).map(i =>
        sha2(concat(id.cast("string"), lit("#"), lit(i)), 256)): _*)
      val runLen = (id % 100 + 1000).cast("int")
      val text = when(pmod(id, lit(3)) === 0, repeat(lit("a"), runLen))
        .when(pmod(id, lit(3)) === 1, noise)
        .otherwise(concat(noise, repeat(lit("a"), lit(1024))))
      val stats = TextOps.compressionStats(
        t(s, dir, "documents").select(id, text.as("text")),
        "doc_id", "text")
      stats.select(col("doc_id"), col("orig_bytes"),
        when(col("ratio_ppm") < 100000, "low")
          .when(col("ratio_ppm") < 400000, "mid")
          .otherwise("high").as("band"))
        .orderBy("doc_id")
    }),

    // char 3-gram repetition (the Gopher char-level half): top-gram
    // fraction in exact integer ppm over the raw text bytes
    "q_doc_char_ngrams" -> ((s, dir) =>
      TextOps.charNgramProfile(wide(s, t(s, dir, "documents")),
          "doc_id", "text", n = 3)
        .orderBy("doc_id")),

    // URL canonicalization: no URL column in the testdata, so messy URLs
    // are synthesized from doc_id (the q_mm_* discipline), covering every
    // canon rule: scheme/host case, www prefix, default vs explicit port,
    // tracking params mixed into real ones, fragments, empty paths, and
    // both .com and .co.uk registered-domain shapes. The oracle replays
    // the GENERIC rule pipeline (regex extracts + param filter), not the
    // construction — it validates the operator
    "q_doc_url_canon" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val url = synthUrl
      val canon = graft.ops.UrlOps.canonicalizeUrl(url)
      docs.select(col("doc_id"), url.as("url"), canon.as("canon"),
          graft.ops.UrlOps.registeredDomain(
            regexp_extract(canon, "^[^:]+://([^/:?#]+)", 1)).as("domain"))
        .orderBy("doc_id")
    }),

    // PSL registered-domain keying: hosts synthesized to hit every rule
    // family — second-level suffixes (gouv.fr/com.br/co.uk/github.io,
    // IDN punycode), wildcard (*.ck, *.kobe.jp), exception (!www.ck,
    // !city.kobe.jp), bare public suffix, single label, and the implicit
    // `*` rule (unknown TLD). The oracle replays the GENERIC longest-
    // match algorithm over an inline rules relation — it validates the
    // matcher, not the construction
    "q_doc_psl_domain" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(12))
      val host = when(m === 0, lit("sub.example.gouv.fr"))
        .when(m === 1, lit("a.b.shop.com.br"))
        .when(m === 2, concat(lit("user"),
          pmod(col("doc_id"), lit(5)).cast("string"), lit(".github.io")))
        .when(m === 3, lit("deep.x.news.co.uk"))
        .when(m === 4, lit("co.uk"))
        .when(m === 5, lit("foo.bar.ck"))
        .when(m === 6, lit("sub.www.ck"))
        .when(m === 7, lit("localhost"))
        .when(m === 8, concat(lit("cdn.media.example"),
          pmod(col("doc_id"), lit(3)).cast("string"), lit(".zz")))
        .when(m === 9, lit("a.shi.xn--55qx5d.cn"))
        .when(m === 10, lit("x.y.pref.kobe.jp"))
        .otherwise(lit("blog.city.kobe.jp"))
      t(s, dir, "documents")
        .select(col("doc_id"), host.as("host"),
          graft.ops.UrlOps.registeredDomainPsl(host).as("domain"))
        .orderBy("doc_id")
    }),

    // PSL keying against the VENDORED FULL rule table (resource-loaded
    // publicsuffix.org format, ICANN + PRIVATE sections): hosts hit rule
    // families the curated subset never had — third-level k12.{state}.us,
    // the *.nagoya.jp/!city.nagoya.jp wildcard city family, gub.uy,
    // co.ke, com.ng, and the multi-level PRIVATE rule blogspot.com.br —
    // plus the done-list anchors (gouv.fr, github.io, *.ck/!www.ck, IDN
    // punycode, implicit `*`). The oracle replays the generic
    // longest-match over the same rules inline
    "q_doc_psl_full" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(14))
      val host = when(m === 0, lit("sub.example.gouv.fr"))
        .when(m === 1, lit("a.b.shop.blogspot.com.br"))
        .when(m === 2, concat(lit("user"),
          pmod(col("doc_id"), lit(5)).cast("string"), lit(".github.io")))
        .when(m === 3, lit("deep.y.k12.tx.us"))
        .when(m === 4, lit("foo.bar.ck"))
        .when(m === 5, lit("sub.www.ck"))
        .when(m === 6, lit("a.blog.nagoya.jp"))
        .when(m === 7, lit("x.city.nagoya.jp"))
        .when(m === 8, lit("ministry.gub.uy"))
        .when(m === 9, lit("shop.co.ke"))
        .when(m === 10, lit("a.shi.xn--55qx5d.cn"))
        .when(m === 11, concat(lit("cdn.example"),
          pmod(col("doc_id"), lit(3)).cast("string"), lit(".zz")))
        .when(m === 12, lit("mysite.streamlit.app"))
        .otherwise(lit("x.firm.com.ng"))
      t(s, dir, "documents")
        .select(col("doc_id"), host.as("host"),
          graft.ops.UrlOps.registeredDomainPsl(host,
            graft.ops.PublicSuffixes.Full).as("domain"))
        .orderBy("doc_id")
    }),

    // host-level dup triage: canonical-URL and content-fingerprint
    // distincts per registered domain (fingerprints synthesized with
    // planted collisions — doc_id mod 50 — so dup_ppm is a real assertion)
    "q_doc_host_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synthUrl.as("url"))
      graft.ops.UrlOps.hostDupStats(docs, "url",
          md5(pmod(col("doc_id"), lit(50)).cast("string")))
        .orderBy("domain")
    }),

    // per-domain boilerplate profile: every doc gets a unique head line,
    // a parity-keyed footer (present in 100% of each domain's docs —
    // synthUrl picks the domain family by the same parity), and a promo
    // line on half the ids (~50% share). Threshold 400000 keeps footer +
    // promo, drops every unique head; shares replay as exact integer ppm
    "q_doc_domain_boilerplate" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      val txt = concat(array_join(slice(toks, 1, 9), " "), lit("\n"),
        lit("footer notice number "), pmod(col("doc_id"), lit(2)), lit("."),
        when(pmod(col("doc_id"), lit(10)) < 5,
          concat(lit("\n"), lit("promo banner text today")))
          .otherwise(lit("")))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synthUrl.as("url"), txt.as("text"))
      graft.ops.UrlOps.domainBoilerplate(wide(s, docs), "url", "doc_id",
          "text", minSharePpm = 400000L)
        .orderBy("domain", "seg_fp")
    }),

    // domain boilerplate REMOVAL (the apply half): same synthesis as the
    // profile gate; footer + (where present) promo vanish from every
    // doc, unique heads survive, md5(clean) byte-identical to the
    // position-ordered stitch replay
    "q_doc_domain_clean" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      val txt = concat(array_join(slice(toks, 1, 9), " "), lit("\n"),
        lit("footer notice number "), pmod(col("doc_id"), lit(2)), lit("."),
        when(pmod(col("doc_id"), lit(10)) < 5,
          concat(lit("\n"), lit("promo banner text today")))
          .otherwise(lit("")))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synthUrl.as("url"), txt.as("text"))
      graft.ops.UrlOps.domainClean(wide(s, docs), "url", "doc_id", "text",
          minSharePpm = 400000L)
        .select(col("doc_id"), col("domain"), col("n_segs"), col("n_kept"),
          col("n_removed"), col("orig_len"), col("clean_len"),
          md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // cross-doc NEAR-dup segments: every doc carries a unique 9-token
    // head line plus one of two planted boilerplate variants (final
    // token differs; simhash hamming exactly 3) — exact segment dedup is
    // blind to the variant pair, the near-dup screen must surface it.
    // The oracle is the brute-force all-pairs simhash replay over
    // distinct segments (pigeonhole equality at maxDist <= 3)
    "q_doc_seg_neardup" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      val txt = concat(array_join(slice(toks, 1, 9), " "), lit("\n"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit(bpA)).otherwise(lit(bpB)))
      val docs = t(s, dir, "documents").select(col("doc_id"), txt.as("text"))
      graft.ops.Dedup.segmentNearDup(wide(s, docs), "doc_id", "text")
        .orderBy("fp_a", "fp_b")
    }),

    // per-domain cap: keep ≤10 docs per registered domain of the synth
    // URLs, selected in content-hash order with doc_id tiebreak — the
    // oracle replays the same md5 rank; survivors + rank compared exactly
    "q_doc_domain_cap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), synthUrl.as("url"))
      graft.ops.UrlOps.domainCap(docs, "url", "doc_id",
          TextOps.normalize(col("text")), k = 10)
        .select(col("doc_id"), col("domain"), col("domain_rank"))
        .orderBy("doc_id")
    }),

    // within-doc repetition REWRITE: the testdata docs are single-line,
    // so line structure is synthesized IN-QUERY from real text (the
    // q_mm_* discipline): three 3-token lines a/b/c per doc, repeated in
    // a doc_id-dependent pattern — a third of docs each exercise heavy
    // repetition, no repetition, and leading repetition. The operator
    // keeps each line's FIRST occurrence in order; md5(clean) is
    // byte-identical against the DuckDB first-occurrence replay
    "q_doc_selfrep_dedup" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      def line(from: Int) = array_join(slice(toks, from, 3), " ")
      val (a, b, c) = (line(1), line(4), line(7))
      val lines = when(pmod(col("doc_id"), lit(3)) === 0,
          array(a, b, a, c, b, a))
        .when(pmod(col("doc_id"), lit(3)) === 1, array(a, b, c))
        .otherwise(array(a, a, b, a, c))
      val multi = t(s, dir, "documents")
        .select(col("doc_id"), array_join(lines, "\n").as("text"))
      Curation.selfRepDedup(wide(s, multi), "doc_id", "text")
        .select(col("doc_id"), col("n_segs"), col("n_uniq"),
          col("n_dup_segs"), col("orig_len"), col("clean_len"),
          col("removed_chars"), md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // C4-style line-level quality rewrite: line structure synthesized
    // from real text (the q_doc_selfrep discipline) so every rule fires —
    // terminal-punctuation misses, short lines, marker lines (javascript /
    // lorem ipsum), brace docs. The oracle replays the GENERIC keep rule
    // (regex + word count + marker containment) per line; md5(clean) is
    // byte-identical
    "q_doc_line_filter" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int) = array_join(slice(toks, from, 3), " ")
      val (a, b, c) = (seg(1), seg(4), seg(7))
      val l1 = concat(a, lit("."))
      val l2 = concat(lit("see "), b, lit("?"))
      val l3 = c // no terminal punctuation
      val l4 = lit("ok.") // too short
      val l5 = concat(lit("enable javascript "), a, lit(".")) // marker
      val l6 = lit("{ code }") // brace doc signal
      val l7 = lit("filler lorem ipsum text.") // doc-level marker
      val base = when(pmod(col("doc_id"), lit(4)) === 0, array(l1, l3, l2))
        .when(pmod(col("doc_id"), lit(4)) === 1, array(l1, l4, l5, l2, l3))
        .when(pmod(col("doc_id"), lit(4)) === 2, array(l2))
        .otherwise(array(l1, l2, l6))
      val lines = when(pmod(col("doc_id"), lit(7)) === 0,
        concat(base, array(l7))).otherwise(base)
      val multi = t(s, dir, "documents")
        .select(col("doc_id"), array_join(lines, "\n").as("text"))
      Curation.lineQualityRewrite(wide(s, multi), "doc_id", "text",
          minWords = 3, minLines = 2)
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          col("orig_len"), col("clean_len"), col("has_brace"),
          col("has_lorem"), col("doc_ok"), md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // HTML strip rewrite: markup synthesized from real text (the
    // q_doc_selfrep discipline) so every rule fires — script payload
    // with a bare '<' inside, style payload, a comment, block closers
    // and <br> becoming newlines, every entity incl. the &amp;-last
    // decode order, and a markup-free pass-through residue. The oracle
    // replays the GENERIC rule chain; md5(clean) is byte-identical
    "q_doc_html_strip" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int) = array_join(slice(toks, from, 3), " ")
      val (a, b, c) = (seg(1), seg(4), seg(7))
      val html = when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("<html><head><title>t</title>" +
              "<script type=\"text/javascript\">var x = 1 < 2;</script>" +
              "<style>.c{color:red}</style></head><body><p>"),
            a, lit(".</p><p>"), b, lit(" &amp; "), c,
            lit("</p></body></html>")))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(a, lit(" &lt;b&gt; &quot;"), b, lit("&quot; &#39;"), c,
            lit("&#39; x&nbsp;y")))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(lit("<!-- hidden "), a, lit(" --><div>"), b,
            lit("<br>"), c, lit("</div><ul><li>"), a, lit("</li></ul>")))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), html.as("text"))
      Curation.htmlStrip(wide(s, docs), "doc_id", "text")
        .select(col("doc_id"), col("n_tags"), col("n_ents"),
          col("orig_len"), col("clean_len"),
          md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // encoding-noise profile: mojibake/replacement/control damage
    // synthesized onto real text per residue class — residue 1 appends
    // the classic double-encode bytes (Ã© Â· â€™), residue 2 U+FFFD
    // replacement chars, residue 3 control chars, residue 0 clean. The
    // oracle replays the generic codepoint-class counts; ppm is exact
    // integer division
    "q_doc_mojibake" -> ((s, dir) => {
      val noisy = when(pmod(col("doc_id"), lit(4)) === 1,
          concat(col("text"),
            lit(" \u00C3\u00A9\u00C2\u00B7\u00E2\u20AC\u2019x")))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(col("text"), lit("\uFFFD\uFFFD")))
        .when(pmod(col("doc_id"), lit(4)) === 3,
          concat(col("text"), lit("\u0007\u0001end")))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), noisy.as("text"))
      TextOps.encodingProfile(wide(s, docs), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // readability: sentence structure synthesized per residue (the raw
    // corpus has no terminal punctuation, so n_sents would floor at 1
    // everywhere) — telegraphic 3-token sentences, one long sentence,
    // mixed !? runs, and the punctuation-free floor case all appear
    "q_doc_readability" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int) = array_join(slice(toks, from, 3), " ")
      val (a, b, c) = (seg(1), seg(4), seg(7))
      val synth = when(pmod(col("doc_id"), lit(4)) === 0,
          concat(a, lit(". "), b, lit(". "), c, lit(".")))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(a, lit(" "), b, lit(" "), c, lit(".")))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(a, lit("?! "), b, lit("... "), c, lit("!")))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synth.as("text"))
      TextOps.readability(wide(s, docs), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Gopher rule battery: residue 0 applies the rules to REAL text
    // (word-count/mean-word-length/stopword thresholds straddle on real
    // docs), residues 1-3 synthesize the structural failure shapes —
    // all-bullet lines, ellipsis-ended lines, symbol spam — so the
    // bullet/ellipsis/symbol rules are real assertions, not vacuous
    "q_doc_gopher_rules" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int) = array_join(slice(toks, from, 3), " ")
      val (a, b, c) = (seg(1), seg(4), seg(7))
      val synth = when(pmod(col("doc_id"), lit(4)) === 1,
          concat(lit("- "), a, lit("\n- "), b, lit("\n- "), c))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(a, lit("...\n"), b, lit("\u2026\n"), c))
        .when(pmod(col("doc_id"), lit(4)) === 3,
          concat(a, lit(" ### # "), b))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synth.as("text"))
      // stopword set adapted to the synthetic corpus vocabulary so the
      // r_stop rule (and thus gopher_ok) genuinely varies across docs
      Curation.gopherRules(wide(s, docs), "doc_id", "text",
          stopwords = Seq("the", "a", "and", "of"))
        .orderBy("doc_id")
    }),

    // DSIR importance weights (Xie et al. 2023): target = the corpus's
    // own 'en' slice, raw = everything; hashed-bigram bucket ratios in
    // exact integer ppm (decimal products, one floor division) — the
    // oracle replays bucketing, smoothing, and the per-doc floor-mean
    // bit-for-bit (HUGEINT on the DuckDB side)
    "q_doc_dsir" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      Curation.dsirWeights(docs, docs.where(col("lang") === "en"),
          "doc_id", "text", buckets = 1024)
        .orderBy("doc_id")
    }),

    // DSIR resampling (the paper's selection half): keep probability
    // proportional to the importance weight, decided by content hash —
    // weightedSample over rate = min(ppm/2e6, 1), so the kept set is
    // deterministic and the per-lang rollup asserts exact membership
    "q_doc_dsir_sample" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      val scores = Curation.dsirWeights(docs,
        docs.where(col("lang") === "en"), "doc_id", "text", buckets = 1024)
      val scored = docs.join(scores, Seq("doc_id"))
      val rate = least(col("dsir_ppm").cast("double") / 2000000.0, lit(1.0))
      Curation.weightedSample(scored, TextOps.normalize(col("text")), rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("dsir_ppm").as("sum_ppm"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("lang")
    }),

    // domain blocklist: registered-domain anti-join over canonicalized
    // synth URLs — evens carry example{0-3}.com domains, odds
    // blog{0-2}.co.uk; blocking one of each plus a never-present domain
    // drops exactly the matching residue classes (even ids only hit
    // example{0,2}.com since doc_id%4 is even there; odd ids hit all
    // blog{0-2}.co.uk residues)
    "q_doc_domain_block" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synthUrl.as("url"))
      val blocked = Seq("example2.com", "blog2.co.uk", "unused.org")
        .toDF("domain")
      graft.ops.UrlOps.blockByDomain(docs, "url", blocked)
        .select(col("doc_id"),
          graft.ops.UrlOps.registeredDomain(
            regexp_extract(graft.ops.UrlOps.canonicalizeUrl(col("url")),
              "^[^:]+://([^/:?#]+)", 1)).as("domain"))
        .orderBy("doc_id")
    }),

    // deterministic epoch-2 shuffle order over 8 shards: (shard, pos)
    // replayed with the same md5 math + row_number in DuckDB — the
    // dataloader permutation as data
    "q_doc_epoch_order" -> ((s, dir) =>
      graft.ops.Sampling.epochOrder(t(s, dir, "documents"), "doc_id",
          TextOps.normalize(col("text")), epoch = 2, shards = 8)
        .orderBy("shard", "pos")),

    // rendezvous (highest-random-weight) shard routing, and the property
    // that justifies it: growing 8 -> 9 shards moves ONLY the docs whose
    // argmax lands on the new shard — every moved doc shows shard9 = 8,
    // ~1/9 of the corpus, zero shard-to-shard churn (mod-hashing remaps
    // about half). Both assignments emitted per doc so the movement set
    // is data, not a claim
    "q_doc_rendezvous_shard" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.Sampling.rendezvousShard(col("doc_id"), 8)
            .as("shard8"),
          graft.ops.Sampling.rendezvousShard(col("doc_id"), 9)
            .as("shard9"))
        .withColumn("moved", col("shard8") =!= col("shard9"))
        .orderBy("doc_id")),

    // CROSS-doc segment dedup: shared boilerplate lines (nav/footer
    // literals planted across residue classes, incl. a within-doc repeat)
    // survive only at their global (min doc_id, min pos) canonical
    // occurrence; md5(clean) byte-identical vs the row_number replay
    "q_doc_crossdoc_dedup" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int) = array_join(slice(toks, from, 3), " ")
      val (a, b) = (seg(1), seg(4))
      val nav = lit("shared nav bar")
      val foot = lit("shared footer line")
      val lines = when(pmod(col("doc_id"), lit(4)) === 0,
          array(nav, a, foot, b))
        .when(pmod(col("doc_id"), lit(4)) === 1, array(a, nav, b))
        .when(pmod(col("doc_id"), lit(4)) === 2, array(nav, nav, a, b))
        .otherwise(array(a, b, foot))
      val multi = t(s, dir, "documents")
        .select(col("doc_id"), array_join(lines, "\n").as("text"))
      graft.ops.Dedup.segmentDedup(wide(s, multi), "doc_id", "text")
        .select(col("doc_id"), col("n_segs"), col("n_kept"),
          col("n_dropped"), col("orig_len"), col("clean_len"),
          md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // deterministic stratified downsampling: keep 40% of en, 75% of de,
    // all fr (and everything in strata without a rate) by content-hash
    // bucket — rebalancing an over-represented language, stable across
    // runs/partitionings/engines
    "q_doc_stratified_sample" -> ((s, dir) =>
      Curation.stratifiedSample(t(s, dir, "documents"), "lang",
        TextOps.normalize(col("text")), rates)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("lang")),

    // context-window packing: greedy first-fit-in-order bins of 256 tokens
    // per language stream; oracle replays the same sequential rule with a
    // recursive CTE
    "q_doc_pack" -> ((s, dir) =>
      // SEQUENTIAL-ORACLE BOUND (CorpusOps.seqOracleDocBound): the greedy
      // first-fit rule is inherently sequential per stream, so its DuckDB
      // replay is a recursive CTE that goes quadratic past ~5k rows/lang
      // (the sf1 sweep timed it out) — the ENGINE path stays linear; the
      // gate verifies the rule on the fixed panel (sf<=0.1 is entirely
      // under the bound, so those results are byte-identical)
      Curation.packSequences(wide(s, t(s, dir, "documents"))
          .where(col("doc_id") < lit(graft.queries.CorpusOps.seqOracleDocBound)),
        "lang", "doc_id", "text", capacity = 256)
        .select(col("grp").as("lang"), col("doc_id"), col("n_tokens"),
          col("bin"))
        .orderBy("lang", "doc_id")),

    // k-anonymity / l-diversity audit over quasi-identifiers — the
    // structural privacy check next to the pattern-level PII scrub: one
    // map-side-combinable aggregate on the QI key (lang × length
    // bucket), class sizes + distinct-sensitive counts + both violation
    // flags
    "q_doc_k_anonymity" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      val qis = docs.select(
        col("lang"),
        call_function("div", length(col("text")).cast("long"), lit(64L))
          .as("len_bucket"),
        pmod(col("doc_id"), lit(7)).as("sensitive"))
      graft.ops.Privacy.kAnonymityAudit(qis, Seq("lang", "len_bucket"),
          "sensitive", k = 5, l = 5)
        .orderBy("lang", "len_bucket")
    }),

    // compaction PLANNER: metadata-level small-file bin-packing per
    // partition — only files under the floor are eligible (compacted
    // files never re-rewrite), greedy target-size fill in listing
    // order, single-file bins dropped (rewriting one file is wasted
    // IO); the listing here is derived from documents (lang=partition,
    // text bytes=file size) the way any synthetic-listing test would
    "q_layout_compaction" -> ((s, dir) => {
      // sequential-oracle bound — see q_doc_pack
      val files = wide(s, t(s, dir, "documents"))
        .where(col("doc_id") < lit(graft.queries.CorpusOps.seqOracleDocBound))
        .select(
        col("lang").as("part"), col("doc_id").as("file_id"),
        length(col("text")).as("bytes"))
      graft.io.CorpusLayout.compactionPlan(files, "part", "file_id",
          "bytes", targetBytes = 1000, minFileBytes = 400)
        .orderBy("partition", "file_id")
    }),

    // inverted-index conjunctive search: docs containing ALL query terms —
    // one selective postings scan + one doc-keyed count agg, independent
    // of term count (an intersect chain would shuffle once per term)
    "q_doc_search" -> ((s, dir) => {
      val p = graft.ops.Search.postings(wide(s, t(s, dir, "documents")),
        "doc_id", "text")
      graft.ops.Search.matchAll(p, Seq("spark", "query", "join"))
        .orderBy("doc_id")
    }),

    // the same conjunctive search served from the PERSISTED postings
    // index: term-bucket partition filter prunes the scan to the query
    // terms' tb= directories (build once, serve every query after —
    // the lexical analog of q_emb_ivfpq_serve). Cache dir is CONTENT-keyed
    // (file sizes/mtimes of the source table) so regenerating the table at
    // the same path rebuilds the index instead of serving stale postings.
    "q_doc_search_serve" -> ((s, dir) => {
      val base = graft.io.IndexCache.cacheDir("postings", 2,
        s"$dir/documents.parquet")
      graft.io.IndexCache.ensureBuilt(base, s"$base/_SUCCESS") { tmp =>
        graft.ops.Search.savePostings(tmp,
          graft.ops.Search.postings(wide(s, t(s, dir, "documents")),
            "doc_id", "text"), buckets = 16)
      }
      graft.ops.Search.matchAllIndexed(
        graft.ops.Search.loadPostings(s, base),
        Seq("spark", "query", "join"), buckets = 16)
        .orderBy("doc_id")
    }),

    // chunk-store BUILD in isolation: chunk the corpus and write the
    // content-addressed layout (distinct payloads cb=-bucketed + the
    // manifest), reporting the per-bucket payload profile — the
    // one-time indexing cost, measured apart from q_doc_chunk_serve so
    // the SERVING number is visible on its own (a conflated gate read
    // as "serve costs build+serve")
    "q_doc_chunk_build" -> ((s, dir) => {
      val base = graft.io.IndexCache.cacheDir("chunkstore", 1,
        s"$dir/documents.parquet")
      graft.io.IndexCache.ensureBuilt(base,
        s"$base/manifest/_SUCCESS") { tmp =>
        graft.io.ChunkStore.save(tmp,
          graft.ops.Dedup.contentChunks(wide(s, t(s, dir, "documents")),
            "doc_id", "text"), buckets = 16)
      }
      s.read.parquet(s"$base/chunks")
        .groupBy("cb")
        .agg(count(lit(1)).as("n_chunks"),
          sum(length(col("chunk"))).cast("long").as("total_len"))
        .orderBy("cb")
    }),

    // content-addressed chunk store round-trip, SERVE side: reconstruct
    // every document from the store — reconstruct ∘ chunk must equal
    // normalize byte-for-byte (the oracle computes md5(normalized)
    // directly plus the chunk count from the boundary replay). The
    // ensureBuilt is a warm-cache no-op when q_doc_chunk_build (or a
    // prior run) has built the store, so this gate times serving only
    "q_doc_chunk_serve" -> ((s, dir) => {
      val base = graft.io.IndexCache.cacheDir("chunkstore", 1,
        s"$dir/documents.parquet")
      graft.io.IndexCache.ensureBuilt(base,
        s"$base/manifest/_SUCCESS") { tmp =>
        graft.io.ChunkStore.save(tmp,
          graft.ops.Dedup.contentChunks(wide(s, t(s, dir, "documents")),
            "doc_id", "text"), buckets = 16)
      }
      graft.io.ChunkStore.reconstruct(s, base)
        .select(col("doc_id"), col("n_chunks"),
          md5(col("text")).as("text_fp"))
        .orderBy("doc_id")
    }),

    // ranked retrieval: top-10 docs by tf·idf over an OR term set —
    // micro-unit integer score sums (order-free), TakeOrderedAndProject
    "q_doc_rank_search" -> ((s, dir) =>
      graft.ops.Search.rankedSearch(wide(s, t(s, dir, "documents")),
        "doc_id", "text", Seq("spark", "vector", "stream"), k = 10)),

    // BM25 (Okapi k1=1.2 b=0.75): tf saturation + doc-length damping in
    // pinned fixed-point integer math; only the idf takes the rounded-ln
    // path rank_search already documents. Deterministic at the k edge
    "q_doc_bm25" -> ((s, dir) =>
      graft.ops.Search.bm25Search(wide(s, t(s, dir, "documents")),
        "doc_id", "text", Seq("spark", "vector", "stream", "data"),
        k = 10)),

    // quality-weighted sampling: each doc kept with probability equal to
    // its quality score, decided by content-hash bucket — deterministic
    // quality-proportional downsampling (both engines recompute the same
    // rounded quality and the same md5 bucket, so the kept set is exact)
    "q_doc_weighted_sample" -> ((s, dir) =>
      Curation.weightedSample(t(s, dir, "documents"),
        TextOps.normalize(col("text")), TextOps.qualityScore(col("text")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("lang")),

    // exact-proportion stratified split: per-source floor-exact 80/10/10
    // by hash-rank boundaries — where q_doc_hash_split's buckets give
    // only EXPECTED proportions (small strata skew), this is the splitter
    // an eval set with per-source quotas needs
    "q_doc_exact_split" -> ((s, dir) =>
      Curation.exactSplit(t(s, dir, "documents"), "source",
        TextOps.normalize(col("text")), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("source", "split")),

    // token-budgeted mixture materialization: each source contributes
    // docs in content-hash order until its 600-token budget fills —
    // the step that turns mixture WEIGHTS into an actual training set
    // ("N tokens per source"). Kept set is a pure content function
    // (hash order, running-sum cutoff), so the oracle replays it exactly
    "q_doc_token_budget" -> ((s, dir) =>
      Curation.tokenBudget(
        t(s, dir, "documents"),
        "source", TextOps.normalize(col("text")), "doc_id",
        TextOps.tokenCount(col("text")), budget = 600L)
        .orderBy("source", "cum_tokens")),

    // incremental dedup: the odd-id half is a "new crawl batch" deduped
    // against the even-id half's PERSISTED LSH index — the old corpus is
    // never re-hashed; verification re-shingles only candidate old docs.
    // ORACLE RECALL BOUND: the DuckDB oracle computes the exhaustive
    // shared-shingle odd×even pair set, while the Spark side emits only
    // LSH band-collision candidates (then exact-verified) — equality is
    // PROBABILISTIC, not structural. It holds because in the pinned regime
    // (r = nHashes/bands = 2 rows per band, 32 bands, threshold j >= 0.8)
    // a qualifying pair misses every band with probability (1-j²)^32
    // ≤ (1-0.64)^32 ≈ 4e-15 — zero expected misses at any realistic
    // corpus size. The guard below pins that regime: loosening it (fewer
    // bands, wider rows, lower threshold) would make this gate flaky
    // rather than wrong, which is worse.
    "q_doc_incremental_dedup" -> ((s, dir) => {
      val (k, nHashes, bands, threshold) = (3, 64, 32, 0.8)
      require(nHashes / bands <= 2 && bands >= 32 && threshold >= 0.8,
        "bit-exact oracle is only valid in the r<=2 / bands>=32 / j>=0.8 " +
          "regime (miss prob <= (1-j^2)^bands ~ 4e-15); see comment")
      val docs = wide(s, t(s, dir, "documents"))
      val oldDocs = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      val newDocs = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      val idx = graft.ops.Dedup.minhashIndex(oldDocs, "doc_id", "text",
        k, nHashes, bands)
      val sc = graft.ops.Dedup.incrementalNearDupsScoped(newDocs, oldDocs,
        idx, "doc_id", "text", k, nHashes, bands, threshold)
      val out = sc.df.withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("new_id", "old_id").localCheckpoint()
      sc.release()
      out
    }),

    // product quantization: independent fixed-point codebooks per
    // sub-space (m=2 halves of the 64-dim vectors, k=8, 2 rounds) — each
    // vector compressed to two cluster ids; the oracle replays both
    // sub-space trainers and joins the codes
    "q_emb_pq" -> ((s, dir) => {
      val out = graft.ops.KMeans.pqEncode(wide(s, t(s, dir, "embeddings")),
        "vec_id", "embedding", m = 2, k = 8, iters = 2)
      out.orderBy("vec_id")
    }),

    // PQ quantization-quality dial: per-vector exact-integer
    // reconstruction error Σ‖sub − codeword‖² in quantized units — what
    // decides m/k for a corpus before committing to a compressed layout
    "q_emb_pq_error" -> ((s, dir) =>
      graft.ops.KMeans.pqReconstructionError(
        wide(s, t(s, dir, "embeddings")), "vec_id", "embedding",
        m = 2, k = 8, iters = 2)
        .orderBy("vec_id")),

    // PQ asymmetric-distance search: 3 queries scan the compressed codes
    // via per-query lookup tables — the original vectors are never touched
    // after encoding; all-integer math makes the ranking engine-exact
    "q_emb_pq_search" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val model = graft.ops.KMeans.pqEncodeDetailed(emb, "vec_id", "embedding",
        m = 2, k = 8, iters = 2)
      graft.ops.KMeans.pqSearchAdc(model, emb.where(col("vec_id") < 3),
        "vec_id", "embedding", topK = 5)
        .orderBy("query_id", "rnk")
    }),

    // IVF-PQ: the billion-scale ANN composition — coarse cells (cosine
    // assignment to 8 fixed centroids) restrict each query's ADC scan to
    // its 2 probed cells' codes; all ranking integer math, so the oracle
    // replays coarse assignment + probes + both sub-space trainers + the
    // restricted LUT scan exactly
    "q_emb_ivfpq_search" -> ((s, dir) => {
      val emb = wide(s, t(s, dir, "embeddings"))
      val centroids = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid_vec"))
      val cells = graft.ops.VectorOps.assignCells(emb, centroids)
      val model = graft.ops.KMeans.pqEncodeDetailed(emb, "vec_id",
        "embedding", m = 2, k = 8, iters = 2)
      graft.ops.KMeans.ivfPqSearchAdc(model, cells, centroids,
        emb.where(col("vec_id") < 3), "vec_id", "embedding",
        topK = 5, nprobe = 2)
        .orderBy("query_id", "rnk")
    }),

    // IVF-PQ SERVING path: identical ranking to q_emb_ivfpq_search, but
    // the coarse index and PQ model are TRAINED ONCE and persisted
    // (saveIvfIndex + savePqModel into a per-SF scratch layout, reused if
    // present — safe because training is bit-reproducible), so the query
    // itself is load + probe + ADC scan only. This is the shape a real
    // deployment runs per query batch — the in-query-trainer gates measure
    // composition, this one isolates serving
    // Cache dir content-keyed like q_doc_search_serve: a rewritten
    // embeddings table gets a fresh index build, never a stale serve.
    "q_emb_ivfpq_serve" -> ((s, dir) => {
      val base = graft.io.IndexCache.cacheDir("serve", 2,
        s"$dir/embeddings.parquet")
      val emb = wide(s, t(s, dir, "embeddings"))
      graft.io.IndexCache.ensureBuilt(base, s"$base/pq/codes/_SUCCESS") {
        tmp =>
          val centroids = emb.where(col("vec_id") < 8)
            .select(col("vec_id").as("centroid_id"),
              col("embedding").as("centroid_vec"))
          val cells = graft.ops.VectorOps.assignCells(emb, centroids)
          graft.ops.VectorOps.saveIvfIndex(s"$tmp/ivf", centroids, cells)
          val model = graft.ops.KMeans.pqEncodeDetailed(emb, "vec_id",
            "embedding", m = 2, k = 8, iters = 2)
          graft.ops.KMeans.savePqModel(s"$tmp/pq", model)
      }
      val (cen, cells) = graft.ops.VectorOps.loadIvfIndex(s, s"$base/ivf")
      val model = graft.ops.KMeans.loadPqModel(s, s"$base/pq")
      graft.ops.KMeans.ivfPqSearchAdc(model, cells, cen,
        emb.where(col("vec_id") < 3), "vec_id", "embedding",
        topK = 5, nprobe = 2)
        .orderBy("query_id", "rnk")
    }),

    // margin mining on the PERSISTED IVF index — q_emb_margin_ivf_i's
    // serving sibling (the q_emb_sq8_serve/_ivfpq_serve discipline):
    // that gate re-runs the corpus × centroids assignment in-query per
    // direction (legitimate as the composition/calibration form, but the
    // slowest row of the sf1 sweep at 29 s); here the integer-exact cell
    // assignment builds ONCE into the content-keyed cache
    // (cell-partitioned layout), and the query is probe + candidate scan
    // + the identical margin tail. Per-vector assignment is independent
    // of the rest of the corpus, so parity-filtering the LOADED cells
    // equals assigning each side separately — byte-identical ranking to
    // the in-query form, same oracle
    "q_emb_margin_ivf_serve" -> ((s, dir) => {
      val base = graft.io.IndexCache.cacheDir("mivf", 1,
        s"$dir/embeddings.parquet")
      val emb = wide(s, t(s, dir, "embeddings"))
      graft.io.IndexCache.ensureBuilt(base, s"$base/ivf/cells/_SUCCESS") {
        tmp =>
          val centroids = emb.where(col("vec_id") < 8)
            .select(col("vec_id").as("centroid_id"),
              col("embedding").as("centroid_vec"))
          val cen = graft.ops.VectorOps.ivfExactCentroids(centroids)
          graft.ops.VectorOps.saveIvfIndex(s"$tmp/ivf", cen,
            graft.ops.VectorOps.ivfExactCells(emb, cen))
      }
      // spread the loaded cells across tasks (the wide() discipline, but
      // load-path specific and REQUIRED at every scale, not a small-file
      // artifact): the serving layout is one directory per cell and the
      // probe join is broadcast, so the streamed side's parallelism is
      // the file-split count — the most-probed cell's entire candidate
      // enumeration (most of the volume, cells are skewed) otherwise
      // lands in ONE task (measured: fwd direction 13.3 s -> 3.1 s at
      // 10x data from this line alone). Round-robin, so no key skew; the
      // ranking is integer-exact with pinned ties — partitioning cannot
      // change a bit of the output.
      val (cen, cells) = graft.ops.VectorOps.loadIvfIndex(s, s"$base/ivf")
        match { case (c0, cl0) => (c0, wide(s, cl0)) }
      def qside(par: Int) = emb
        .where(pmod(col("vec_id"), lit(2)) === par)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val fwd = graft.ops.VectorOps.ivfTopKExactIndexed(
        cells.where(pmod(col("vec_id"), lit(2)) === 1), cen, qside(0),
        k = 4, nprobe = 2)
      val bwd = graft.ops.VectorOps.ivfTopKExactIndexed(
        cells.where(pmod(col("vec_id"), lit(2)) === 0), cen, qside(1),
        k = 4, nprobe = 2)
      graft.ops.VectorOps.marginPairsExact(fwd, bwd)
        .orderBy(col("margin_ppm").desc, col("src_id"), col("tgt_id"))
        .limit(20)
    }),

    // the DEPLOYMENT-SHAPED serving form: identical pipeline to
    // q_emb_margin_ivf_serve but at C=64 coarse cells instead of the
    // C=8 calibration pin. Per-query candidate work in an IVF layout is
    // N·nprobe/C — the C=8 form scans a quarter of the corpus per query
    // (fine for calibrating the exact chain, wrong as a serving claim),
    // while C~√N at the sf1 corpus (~64 for 4k vectors/cell at 260k)
    // is the shape a deployment picks, and the cell-pruned directory
    // scan goes FLATTER as C grows with N. Same integer-exact assignment
    // (ties → lowest centroid id), same probe depth, same margin tail;
    // the oracle replays the identical SQL with the centroid bound at 64
    "q_emb_margin_ivf_serve64" -> ((s, dir) => {
      val base = graft.io.IndexCache.cacheDir("mivf64", 1,
        s"$dir/embeddings.parquet")
      val emb = wide(s, t(s, dir, "embeddings"))
      graft.io.IndexCache.ensureBuilt(base, s"$base/ivf/cells/_SUCCESS") {
        tmp =>
          val centroids = emb.where(col("vec_id") < 64)
            .select(col("vec_id").as("centroid_id"),
              col("embedding").as("centroid_vec"))
          val cen = graft.ops.VectorOps.ivfExactCentroids(centroids)
          graft.ops.VectorOps.saveIvfIndex(s"$tmp/ivf", cen,
            graft.ops.VectorOps.ivfExactCells(emb, cen))
      }
      // cell-spread on load — see q_emb_margin_ivf_serve
      val (cen, cells) = graft.ops.VectorOps.loadIvfIndex(s, s"$base/ivf")
        match { case (c0, cl0) => (c0, wide(s, cl0)) }
      def qside(par: Int) = emb
        .where(pmod(col("vec_id"), lit(2)) === par)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val fwd = graft.ops.VectorOps.ivfTopKExactIndexed(
        cells.where(pmod(col("vec_id"), lit(2)) === 1), cen, qside(0),
        k = 4, nprobe = 2)
      val bwd = graft.ops.VectorOps.ivfTopKExactIndexed(
        cells.where(pmod(col("vec_id"), lit(2)) === 0), cen, qside(1),
        k = 4, nprobe = 2)
      graft.ops.VectorOps.marginPairsExact(fwd, bwd)
        .orderBy(col("margin_ppm").desc, col("src_id"), col("tgt_id"))
        .limit(20)
    }),

    // margin mining over the PQ serving layout: the SAME ratio-margin
    // tail as the brute/IVF gates, but both directions' kNN run on
    // compressed codes via the integer cos-ADC scan (reconstructed-
    // vector cosine from per-(query,sub,codeword) exact dot LUTs) — the
    // corpus-scale serving form of bitext mining: codes train once
    // (scale 1e5, the exact-chain envelope), the margin post-processing
    // is backend-blind. Integer end to end; the oracle replays trainers,
    // LUT dots, reconstructed norms, and the margin tail CTE-for-CTE
    "q_emb_margin_pq" -> ((s, dir) => {
      // calibration bound (CorpusOps.marginCalBound, the q_mm_audio_fp
      // discipline): trainer + both all-pairs kNN directions run on the
      // deterministic id panel — constant work at any corpus size; the
      // corpus-wide scale siblings are q_emb_margin_lsh / _bq
      val emb = wide(s, t(s, dir, "embeddings"))
        .where(col("vec_id") < lit(graft.queries.CorpusOps.marginCalBound))
      val model = graft.ops.KMeans.pqEncodeDetailed(emb, "vec_id",
        "embedding", m = 2, k = 8, iters = 2, scale = 1e5)
      val src = emb.where(pmod(col("vec_id"), lit(2)) === 0)
      val tgt = emb.where(pmod(col("vec_id"), lit(2)) === 1)
      def qside(d: org.apache.spark.sql.DataFrame) = d.select(
        col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      // the gate scales BOTH kNN directions like the brute/IVF margin
      // pair (deliberately super-linear under a replica probe, SCALE.md);
      // maxQueryBatch raised above the 10x-probe query count — the LUT
      // stays tiny (nq × m × k rows), the candidate join is the priced
      // quadratic
      val fwd = graft.ops.KMeans.pqSearchCosExact(model, tgt,
        qside(src), "query_id", "query_vec", topK = 4,
        maxQueryBatch = 16384)
      val bwd = graft.ops.KMeans.pqSearchCosExact(model, src,
        qside(tgt), "query_id", "query_vec", topK = 4,
        maxQueryBatch = 16384)
      graft.ops.VectorOps.marginPairsExact(fwd, bwd)
        .orderBy(col("margin_ppm").desc, col("src_id"), col("tgt_id"))
        .limit(20)
    }),

    // SQ8 SERVING path: codes quantized once into the content-keyed
    // cache, queries scan only the 4×-compressed code table — identical
    // ranking to q_emb_sq8_search (same oracle), build isolated; closes
    // the last layout without a persisted serving form
    "q_emb_sq8_serve" -> ((s, dir) => {
      val base = graft.io.IndexCache.cacheDir("sq8", 1,
        s"$dir/embeddings.parquet")
      val emb = wide(s, t(s, dir, "embeddings"))
      graft.io.IndexCache.ensureBuilt(base, s"$base/codes/_SUCCESS") {
        tmp =>
          graft.ops.ScalarQuant.saveSq8Index(tmp,
            graft.ops.ScalarQuant.sq8Encode(emb, "vec_id", "embedding"))
      }
      val enc = graft.ops.ScalarQuant.loadSq8Index(s, base)
      val queries = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      graft.ops.ScalarQuant.sq8SearchTopKIndexed(enc, queries,
          "query_id", "query_vec", k = 5)
        .withColumn("score", round(col("score"), 6))
        .orderBy("query_id", "rank")
    }),

    // BQ SERVING path: signatures packed once into the content-keyed
    // cache (the ivfpq_serve discipline), queries scan the 32×-compressed
    // words and rerank k-bounded candidates against the float corpus —
    // identical ranking to q_emb_bq_search (same oracle), build isolated
    "q_emb_bq_serve" -> ((s, dir) => {
      val base = graft.io.IndexCache.cacheDir("bq", 1,
        s"$dir/embeddings.parquet")
      val emb = wide(s, t(s, dir, "embeddings"))
      graft.io.IndexCache.ensureBuilt(base, s"$base/words/_SUCCESS") {
        tmp =>
          graft.ops.ScalarQuant.saveBqIndex(tmp,
            graft.ops.ScalarQuant.bqEncode(emb, "vec_id", "embedding"))
      }
      val enc = graft.ops.ScalarQuant.loadBqIndex(s, base)
      val queries = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      graft.ops.ScalarQuant.bqSearchTopKIndexed(enc, emb, "vec_id",
          "embedding", queries, "query_id", "query_vec", k = 5,
          rerank = 20)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    }),

    // margin mining over the SQ8 serving layout — the FIFTH kNN backend
    // under the identical margin tail (brute, IVF, PQ, LSH, SQ8): both
    // directions' kNN run on int8 codes with the per-vector scale
    // CANCELLED by the cosine (codes-only integer chain), so the 4×-
    // compressed layout serves bitext mining without touching floats;
    // the margin post-processing is backend-blind, integer end to end
    "q_emb_margin_sq8" -> ((s, dir) => {
      // calibration bound — see q_emb_margin_pq
      val emb = wide(s, t(s, dir, "embeddings"))
        .where(col("vec_id") < lit(graft.queries.CorpusOps.marginCalBound))
      val src = emb.where(pmod(col("vec_id"), lit(2)) === 0)
      val tgt = emb.where(pmod(col("vec_id"), lit(2)) === 1)
      def qside(d: org.apache.spark.sql.DataFrame) = d.select(
        col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val fwd = graft.ops.ScalarQuant.sq8SearchCosExact(tgt, "vec_id",
        "embedding", qside(src), "query_id", "query_vec", k = 4)
      val bwd = graft.ops.ScalarQuant.sq8SearchCosExact(src, "vec_id",
        "embedding", qside(tgt), "query_id", "query_vec", k = 4)
      graft.ops.VectorOps.marginPairsExact(fwd, bwd)
        .orderBy(col("margin_ppm").desc, col("src_id"), col("tgt_id"))
        .limit(20)
    }),

    // margin mining over the BQ serving layout — the SIXTH backend, and
    // the 100 TB memory shape for the family: both directions' candidate
    // generation scans only the persisted 32×-compressed sign signatures
    // (REUSING q_emb_bq_serve's content-keyed index, parity-filtered per
    // direction), Hamming prefilter to a rerank-bounded pool, then the
    // exact integer-cosine rerank; the margin tail is unchanged. Only
    // the k-bounded pools ever touch float vectors
    "q_emb_margin_bq" -> ((s, dir) => {
      val base = graft.io.IndexCache.cacheDir("bq", 1,
        s"$dir/embeddings.parquet")
      val emb = wide(s, t(s, dir, "embeddings"))
      graft.io.IndexCache.ensureBuilt(base, s"$base/words/_SUCCESS") {
        tmp =>
          graft.ops.ScalarQuant.saveBqIndex(tmp,
            graft.ops.ScalarQuant.bqEncode(emb, "vec_id", "embedding"))
      }
      val enc = graft.ops.ScalarQuant.loadBqIndex(s, base)
      val src = emb.where(pmod(col("vec_id"), lit(2)) === 0)
      val tgt = emb.where(pmod(col("vec_id"), lit(2)) === 1)
      // calibration bound on the QUERY sides only (see q_emb_margin_pq):
      // the persisted index and the candidate scans stay FULL-corpus (the
      // memory-shape claim), but each direction mines margins for the
      // fixed id panel, so verification work is constant at sf1+ — the
      // unbounded oracle's 1e8-row Hamming cross spilled past the disk at
      // sf1; margin pairs need both endpoints panel-side (the tail's
      // inner denominator joins), identical in the oracle
      def qside(d: org.apache.spark.sql.DataFrame) = d
        .where(col("vec_id") < lit(graft.queries.CorpusOps.marginCalBound))
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val fwd = graft.ops.ScalarQuant.bqSearchCosExactIndexed(
        enc.where(pmod(col("vec_id"), lit(2)) === 1), tgt, "vec_id",
        "embedding", qside(src), "query_id", "query_vec", k = 4,
        rerank = 16)
      val bwd = graft.ops.ScalarQuant.bqSearchCosExactIndexed(
        enc.where(pmod(col("vec_id"), lit(2)) === 0), src, "vec_id",
        "embedding", qside(tgt), "query_id", "query_vec", k = 4,
        rerank = 16)
      graft.ops.VectorOps.marginPairsExact(fwd, bwd)
        .orderBy(col("margin_ppm").desc, col("src_id"), col("tgt_id"))
        .limit(20)
    }),

    // sign-LSH SERVING path: the bucket-partitioned signature index is
    // built once into the content-keyed cache; a query batch probes its
    // nPlanes+1 buckets off the index scan (the partition layout prunes
    // the rest) and never touches the float corpus — identical ranking
    // to q_emb_multiprobe (same oracle), build isolated
    "q_emb_lsh_serve" -> ((s, dir) => {
      val base = graft.io.IndexCache.cacheDir("lsh", 1,
        s"$dir/embeddings.parquet")
      val emb = wide(s, t(s, dir, "embeddings"))
      graft.io.IndexCache.ensureBuilt(base, s"$base/buckets/_SUCCESS") {
        tmp =>
          graft.ops.VectorOps.saveLshIndex(tmp,
            graft.ops.VectorOps.lshEncode(emb, "vec_id", "embedding",
              CorpusOps.embDims, nPlanes = 8))
      }
      val enc = graft.ops.VectorOps.loadLshIndex(s, base)
      val queries = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      graft.ops.VectorOps.lshSearchTopKIndexed(enc, queries, k = 5,
          inDims = CorpusOps.embDims, nPlanes = 8, probeHamming = 1)
        .orderBy("query_id", "rank")
    }),

    // END-TO-END curation pipeline in one plan: exact dedup (keep-min per
    // content fingerprint) → quality filter (threshold 0.5) → train/val/
    // test hash split → per-(split, lang) summary. Every stage is the
    // already-gated deterministic op; this gate pins the COMPOSITION
    // (the "switch your pipeline to this library" claim), one job, no
    // intermediate materialization
    "q_doc_pipeline" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      val fp = docs.withColumn("fp", TextOps.fingerprint(col("text")))
      val keep = fp.groupBy("fp").agg(min("doc_id").as("doc_id"))
      val deduped = fp.join(keep, Seq("fp", "doc_id"), "left_semi")
      val scored = deduped
        .withColumn("quality", TextOps.qualityScore(col("text")))
        .where(col("quality") >= 0.5)
      scored
        .withColumn("split", Sampling.split(TextOps.normalize(col("text")),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
          // exact micro-unit sum: quality is already 6dp-rounded, so the
          // integer sum is order-free (a double avg would re-associate)
          sum(round(col("quality") * 1e6, 0).cast("long")).as("q_micro"))
        .orderBy("split", "lang")
    }),

    // per-doc pipeline PROVENANCE: the q_doc_pipeline composition with
    // every document explained — (stage, action, reason) rows via
    // Expectations.provenance, a single nested-CASE projection on the
    // pipeline's own columns (zero extra corpus passes). First-drop
    // ownership: a doc that is both a dup and low-quality reads "dedup",
    // matching what the sequential pipeline actually does
    "q_doc_pipeline_audit" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      val fp = docs.withColumn("fp", TextOps.fingerprint(col("text")))
      val keep = fp.groupBy("fp").agg(min("doc_id").as("keeper_id"))
      val staged = fp.join(keep, Seq("fp"))
        .withColumn("q_micro",
          round(TextOps.qualityScore(col("text")) * 1e6, 0).cast("long"))
        .withColumn("split",
          Sampling.split(TextOps.normalize(col("text")),
            Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      graft.ops.Expectations.provenance(staged,
          Seq(
            ("dedup", col("doc_id") =!= col("keeper_id"),
              concat(lit("dup_of:"), col("keeper_id").cast("string"))),
            ("quality", col("q_micro") < 500000L,
              concat(lit("q_micro:"), col("q_micro").cast("string")))),
          keepStage = "split", keepReason = col("split"))
        .select(col("doc_id"), col("stage"), col("action"), col("reason"))
        .orderBy("doc_id")
    }),

    // near-dup survivor selection: the dedup DROP decision — per LSH
    // cluster keep the best-QUALITY doc (micro-unit argmax, ties →
    // lowest id), not the arbitrary lowest id the exact-dup path uses.
    // The argmax is one struct-max aggregate (the q_doc_upsert shape:
    // partial before the exchange), never a per-cluster window sort
    "q_doc_dedup_survivors" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      val pairs = graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
        3, 64, 32, 0.8)
      val comp = graft.ops.Dedup.components(pairs, 20)
      val q = docs.select(col("doc_id"),
        round(TextOps.qualityScore(col("text")) * 1e6, 0).cast("long")
          .as("q_micro"))
      val scored = comp.join(q, Seq("doc_id"))
      val best = scored.groupBy("cluster_id")
        .agg(max(struct(col("q_micro"), (-col("doc_id")).as("neg_id")))
          .as("b"))
        .select(col("cluster_id"), (-col("b.neg_id")).as("keeper_id"))
      scored.join(best, Seq("cluster_id"))
        .select(col("cluster_id"), col("doc_id"), col("q_micro"),
          col("keeper_id"), (col("doc_id") === col("keeper_id")).as("keep"))
        .orderBy("cluster_id", "doc_id")
    }),

    // soft dedup: keep everything, down-weight dup clusters — each
    // member of a cluster of n carries 10^6 div n ppm of sampling mass
    // (duplication often correlates with quality; weighting preserves
    // the signal hard-dropping destroys). Singletons weigh 10^6
    "q_doc_dedup_weights" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      val pairs = graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
        3, 64, 32, 0.8)
      graft.ops.Dedup.softDedupWeights(docs, "doc_id", pairs)
        .orderBy("doc_id")
    }),

    // SNM → exact-Jaccard verify → soft-dedup weights, as ONE pipeline:
    // the blocking family you choose when LSH recall is contractual —
    // sorted-neighborhood candidates are DETERMINISTIC (every
    // prefix-adjacent pair within the window is examined, no
    // probabilistic bands), the exact Jaccard rides along from the
    // blocking stage, and the surviving pairs feed the same re-weighting
    // consumer as the LSH path (backend swap changes only the pair CTEs)
    "q_doc_snm_weights" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      val pairs = graft.ops.Dedup.sortedNeighborhoodPairs(docs, "doc_id",
          "text", window = 4, shingleK = 3)
        .where(col("jaccard_ppm") >= 800000L)
        .select("doc_a", "doc_b")
      graft.ops.Dedup.softDedupWeights(docs, "doc_id", pairs)
        .orderBy("doc_id")
    }),

    // snapshot drift report: volume, token, and vocabulary movement
    // between two corpus versions (halves stand in for yesterday/today) —
    // the promote-or-rollback check paired with the CDC upsert
    "q_doc_drift" -> ((s, dir) => {
      val docs = wide(s, t(s, dir, "documents"))
      graft.ops.Drift.report(
        docs.where(pmod(col("doc_id"), lit(2)) === 0),
        docs.where(pmod(col("doc_id"), lit(2)) === 1),
        "lang", "text")
        .withColumn("volume_ratio", round(col("volume_ratio"), 6))
        .withColumn("novel_frac", round(col("novel_frac"), 6))
        .orderBy("stratum")
    }),

    // target-mixture resampling: hit 40/20/20/20 en/de/fr/es by
    // downsampling every stratum to the largest feasible total (the
    // binding stratum keeps all); zh has no weight and is dropped.
    // Decision is content-hash deterministic, thresholds a fixed IEEE
    // expression — the oracle replays count, min, threshold, and bucket
    // math identically
    "q_doc_mixture" -> ((s, dir) =>
      Curation.mixtureSample(t(s, dir, "documents"), "lang",
        TextOps.normalize(col("text")),
        Seq("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("lang")),

    // TOKEN-proportional mixture: budgets in tokens (the unit mixtures
    // are specified in), not rows — binding stratum keeps all tokens,
    // others cut at their derived token budget in content-hash order;
    // kept_tokens makes membership an exact assertion
    "q_doc_token_mixture" -> ((s, dir) =>
      Curation.tokenMixture(t(s, dir, "documents"), "lang",
        TextOps.normalize(col("text")), "doc_id",
        TextOps.tokenCount(col("text")),
        Seq("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_tokens").as("kept_tokens"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("lang")),

    // temperature mixture (α = 1/2): shares ∝ √n_lang, derived from the
    // corpus itself — integer isqrt + pinned floor-division chain, so the
    // rebalanced kept set replays exactly; every lang keeps some mass
    // (unlike the explicit-weight gate, which drops unweighted strata)
    "q_doc_temp_mixture" -> ((s, dir) =>
      Curation.temperatureMixture(t(s, dir, "documents"), "lang",
        TextOps.normalize(col("text")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("lang")),

    // CDC snapshot upsert: a change batch (re-crawled texts + takedown
    // tombstones) applied to the corpus — latest version per doc wins,
    // changes beat base on version ties, tombstoned docs drop. One union +
    // one argmax agg; no join, no window (see Snapshot scaladoc)
    "q_doc_upsert" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = docs.select(col("doc_id"), lit(1).as("version"),
        col("text"), col("lang"))
      val recrawl = docs.where(pmod(col("doc_id"), lit(5)) === 0)
        .select(col("doc_id"), lit(2).as("version"),
          upper(col("text")).as("text"), col("lang"),
          lit(false).as("deleted"))
      val takedown = docs.where(pmod(col("doc_id"), lit(11)) === 7)
        .select(col("doc_id"), lit(3).as("version"), col("text"),
          col("lang"), lit(true).as("deleted"))
      graft.ops.Snapshot.upsert(base, recrawl.unionByName(takedown),
          "doc_id", "version")
        .select(col("doc_id"), col("version"), md5(col("text")).as("fp"),
          col("lang"))
        .orderBy("doc_id")
    }),

    // SCD type-2 history build: the customer's order-status stream folded
    // into the point-in-time dimension table — attribute runs collapse,
    // tombstones close runs without opening one, (valid_from, valid_to,
    // is_current) per run. Two KEY-partitioned windows over one exchange;
    // per-key histories are short by the CDC contract, nothing global
    "q_cdc_scd2" -> ((s, dir) => {
      val chg = t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderstatus"), col("o_orderpriority"),
        (pmod(col("o_orderkey"), lit(37)) === 0).as("deleted"))
      graft.ops.Snapshot.scd2History(chg, "o_custkey", "o_orderkey",
          Seq("o_orderstatus", "o_orderpriority"), Some("deleted"))
        .orderBy("o_custkey", "valid_from")
    }),

    // shuffle-skew advisor: the pre-flight read before keying a 100 TB
    // job — heaviest keys, row share, the salt factor that would spread
    // each across 32 partitions, and the reducer-overflow flag; one
    // count agg + a k-bounded heap, never a global sort
    "q_skew_advisor" -> ((s, dir) =>
      graft.ops.Profiler.skewAdvisor(
          t(s, dir, "events"), "event_type", parts = 32, topK = 5)
        .orderBy("rank")),

    // join-size advisor: the pre-flight read before a many-to-many join
    // — exact output-size estimate from per-key counts alone (customer ×
    // supplier on nationkey is the genuine fan-out case: ~25 keys, each
    // contributing n_cust × n_supp pairs), top contributors ranked by a
    // k-bounded heap, grand total on every row
    "q_join_size_advisor" -> ((s, dir) =>
      graft.ops.Profiler.joinSizeAdvisor(
          t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "supplier"), "s_nationkey", topK = 5)
        .orderBy("rank")),

    // Z-order (Morton) key — the multi-dimensional layout op made
    // oracle-backed: interleaved (o_custkey, o_totalprice) bits, the
    // range-partition key writeZOrdered sorts files by (LayoutSpec pins
    // the two-sided pruning it buys); scaling is IEEE double algebra
    // both engines compute identically, interleave is integer bit math
    "q_layout_zvalue" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        graft.io.CorpusLayout.zValue(
          col("o_custkey"), 0.0, 20000.0,
          col("o_totalprice"), 0.0, 600000.0, bits = 8).as("z"))
        .orderBy("o_orderkey")),

    // SFT assembly -> context packing, as ONE pipeline: render the turn
    // table to training strings (X245), then greedy-pack the rendered
    // lengths into 2048-char windows per shard (X69b's fold) — the
    // chat-data analog of the BPE->pack chain, char-budgeted end to end
    "q_doc_sft_pack" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      // sequential-oracle bound — see q_doc_pack
      val turns = t(s, dir, "documents")
        .where(col("doc_id") < lit(graft.queries.CorpusOps.seqOracleDocBound))
        .select(
        call_function("div", col("doc_id"), lit(4L)).as("conv"),
        pmod(col("doc_id"), lit(4)).as("turn_idx"),
        when(pmod(col("doc_id"), lit(4)) === 0, "system")
          .when(pmod(col("doc_id"), lit(4)) === 1, "user")
          .otherwise("assistant").as("role"),
        array_join(slice(toks, 1, 8), " ").as("content"))
      val rendered = graft.ops.Curation.sftRender(turns, "conv",
        "turn_idx", "role", "content")
      graft.ops.Curation.packBySize(
          rendered.select(pmod(col("conv"), lit(4)).as("shard"),
            col("conv"), col("render_len")),
          "shard", "conv", "render_len", capacity = 2048)
        .select(col("grp").as("shard"), col("doc_id").as("conv"),
          col("n_tokens").as("render_len"), col("bin"))
        .orderBy("shard", "conv")
    }),

    // corpus snapshot diff: v2 re-crawls every 5th doc (changed), drops
    // doc_id % 11 = 7 (removed), and adds fresh ids for every 13th —
    // classified by content fp in ONE union + ONE aggregate, no outer
    // join (the upsert shuffle discipline)
    "q_doc_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val v1 = docs.select(col("doc_id"), md5(col("text")).as("fp"))
      val v2 = docs.where(pmod(col("doc_id"), lit(11)) =!= 7)
        .select(col("doc_id"),
          md5(when(pmod(col("doc_id"), lit(5)) === 0, upper(col("text")))
            .otherwise(col("text"))).as("fp"))
        .unionByName(docs.where(pmod(col("doc_id"), lit(13)) === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            md5(concat(lit("new:"), col("text"))).as("fp")))
      graft.ops.Snapshot.diff(v1, v2, "doc_id", "fp")
        .orderBy("doc_id")
    }),

    // preference-pair construction (the DPO/RLHF dataset op): per prompt
    // group, the best- and worst-scored candidates with the exact integer
    // margin, near-ties dropped — ONE struct-extreme hash agg, no window
    "q_doc_pref_pairs" -> ((s, dir) => {
      val pool = t(s, dir, "documents").select(
        pmod(col("doc_id"), lit(97)).as("prompt_id"),
        col("doc_id"),
        (TextOps.tokenCount(col("text")) * lit(1000) +
          pmod(length(col("text")), lit(997))).cast("long").as("score"))
      graft.ops.Curation.preferencePairs(pool, "prompt_id", "doc_id",
          "score", minMargin = 500L)
        .orderBy("prompt_id")
    }),

    // SFT chat-template assembly: turn table -> rendered training string
    // + assistant loss-mask char spans from a running-length window (spans
    // by arithmetic, not re-search) — conv-keyed window + one agg
    "q_doc_sft_render" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      val turns = t(s, dir, "documents").select(
        call_function("div", col("doc_id"), lit(4L)).as("conv"),
        pmod(col("doc_id"), lit(4)).as("turn_idx"),
        when(pmod(col("doc_id"), lit(4)) === 0, "system")
          .when(pmod(col("doc_id"), lit(4)) === 1, "user")
          .otherwise("assistant").as("role"),
        array_join(slice(toks, 1, 8), " ").as("content"))
      graft.ops.Curation.sftRender(turns, "conv", "turn_idx", "role",
          "content")
        .orderBy("conv")
    }),

    // deterministic k-per-group sampling: 5 example docs per language by
    // content-hash order — stable across runs/partitionings/engines;
    // ranked through the bounded k-heap Aggregator, never a group window
    "q_doc_group_sample" -> ((s, dir) =>
      Sampling.groupSample(t(s, dir, "documents"), "lang",
        TextOps.normalize(col("text")), "doc_id", k = 5)
        .orderBy("lang", "rank")),

    // deterministic negative sampling: 4 contrastive negatives per anchor
    // by md5 of (anchor, slot) mod corpus size — reproducible on any run,
    // partitioning, or engine (the oracle replays the identical integer
    // math), self-collisions remapped to the next id
    "q_sample_negatives" -> ((s, dir) =>
      Sampling.negativeSamples(
        t(s, dir, "documents").select(col("doc_id")), "doc_id", k = 4)
        .orderBy("anchor_id", "slot")),

    // IVF centroid training: 3 Lloyd's rounds, k=4, fixed-point integer
    // arithmetic throughout — bit-reproducible under any partitioning, so
    // the oracle replays the identical rounds with unrolled CTEs
    // top principal component by fixed-point power iteration (the
    // "all-but-the-top" measurement pass): 3 exact integer rounds over
    // the mean-centered milli-quantized embeddings; the oracle unrolls
    // the identical rounds (HUGEINT covers the one w*1000 intermediate
    // the Scala driver does in BigInt) — bit-reproducible like q_emb_kmeans
    "q_emb_top_component" -> ((s, dir) => {
      val r = graft.ops.VectorOps.powerIteration(
        wide(s, t(s, dir, "embeddings")), "vec_id", "embedding",
        rounds = 3)
      val out = r.projections.orderBy("vec_id")
      val materialized = out.localCheckpoint()
      r.release()
      materialized
    }),

    // all-but-the-top APPLY: knn in the residual space after the power-
    // iteration component is projected out (division-free r' = vv·c −
    // dt·v, cosine-invariant) — the end-to-end post-processed serving
    // pipeline, replayed CTE-for-CTE including the residual algebra
    "q_emb_abtt_knn" -> ((s, dir) => {
      val (res, release) = graft.ops.VectorOps.abttResiduals(
        wide(s, t(s, dir, "embeddings")), "vec_id", "embedding",
        rounds = 3)
      // array<float>: bruteTopK's codegen'd dot is float-typed (the
      // jl_knn discipline — the oracle replays the REAL quantization)
      val emb = res.select(col("vec_id"),
        col("residual").cast("array<float>").as("embedding"))
      val queries = emb.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec"))
      val out = graft.ops.VectorOps.bruteTopK(emb, queries, 10)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank").localCheckpoint()
      release()
      out
    }),

    "q_emb_kmeans" -> ((s, dir) => {
      val r = graft.ops.KMeans.fit(wide(s, t(s, dir, "embeddings")),
        "vec_id", "embedding", k = 4, iters = 3)
      val out = r.assignments.orderBy("vec_id")
      val materialized = out.localCheckpoint() // release the quantized cache
      r.release()
      materialized
    }),

    // Luhn-validated card redaction: residue 1 plants a checksum-valid
    // Visa test PAN, residue 2 the same digits with a failing check
    // digit (candidate but NOT masked — the precision claim), residue 3
    // a sub-13-digit run (not even a candidate), residue 4 a valid
    // dash-separated 15-digit Amex; residue 0 stays raw. The oracle
    // replays the candidate regex, the mod-10 fold, and the literal
    // replace fold — md5(clean) must agree byte-for-byte
    "q_doc_luhn_scrub" -> ((s, dir) => {
      val m5 = pmod(col("doc_id"), lit(5))
      val synth = when(m5 === 1,
          concat(col("text"), lit(" pay 4111 1111 1111 1111 now")))
        .when(m5 === 2,
          concat(col("text"), lit(" card 4111 1111 1111 1112 held")))
        .when(m5 === 3, concat(col("text"), lit(" ref 123456789 ok")))
        .when(m5 === 4,
          concat(col("text"), lit(" acct 3782-822463-10005 sent")))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synth.as("text"))
      TextOps.luhnScan(wide(s, docs), "doc_id", "text")
        .select(col("doc_id"), col("n_runs"), col("n_valid"),
          md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // padding-efficiency audit: per language, padded-slot waste of
    // length-sorted batches (batch 8) vs content-hash-shuffled order —
    // the loader-design decision number; all-integer window + agg replay
    "q_doc_pad_waste" -> ((s, dir) =>
      Curation.padWaste(t(s, dir, "documents"), "lang", "doc_id", "text",
          batch = 8)
        .orderBy("grp")),

    // mod-97-validated IBAN redaction (the luhn gate's banking sibling):
    // residue 1 plants a valid GB test IBAN, residue 2 the same with a
    // failing check digit (candidate, NOT masked), residue 3 a valid
    // 27-char French IBAN (letters inside the BBAN exercise the *100
    // branch), residue 4 an IBAN-shaped-but-too-short token (not a
    // candidate); md5(clean) must agree byte-for-byte
    "q_doc_iban_scrub" -> ((s, dir) => {
      val m5 = pmod(col("doc_id"), lit(5))
      val synth = when(m5 === 1,
          concat(col("text"), lit(" pay GB82WEST12345698765432 now")))
        .when(m5 === 2,
          concat(col("text"), lit(" acct GB82WEST12345698765433 held")))
        .when(m5 === 3,
          concat(col("text"), lit(" ref FR1420041010050500013M02606 ok")))
        .when(m5 === 4, concat(col("text"), lit(" code DE8937040 short")))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synth.as("text"))
      TextOps.ibanScan(wide(s, docs), "doc_id", "text")
        .select(col("doc_id"), col("n_cands"), col("n_valid"),
          md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")
    }),

    // Unicode-script profile: residue 1 appends Cyrillic to Latin text
    // (Latin-dominant, mixed), residue 2 one Latin word + a longer
    // CJK+kana run (CJK-dominant, mixed), residue 3 replaces the text
    // with Arabic only (Arabic-dominant, NOT mixed — single family),
    // residue 0 raw Latin. The oracle replays the same codepoint-class
    // counts, first-max dominance chain, and ≥20% major-family rule
    "q_doc_script_mix" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int, n: Int) = array_join(slice(toks, from, n), " ")
      val m4 = pmod(col("doc_id"), lit(4))
      val synth = when(m4 === 1,
          concat(seg(1, 3), lit(" " + ScriptFixtures.cyr)))
        .when(m4 === 2,
          concat(seg(1, 1), lit(" " + ScriptFixtures.cjk)))
        .when(m4 === 3, lit(ScriptFixtures.ara))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synth.as("text"))
      TextOps.scriptProfile(wide(s, docs), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // corpus-mix divergence: src0/src1 get distinct skew tokens appended
    // (4 resp. 2 per doc) so their unigram distributions genuinely pull
    // away from the other 18 sources — src0-pairs and src1-pairs carry
    // the largest L1, and n_both drops by the skew terms absent elsewhere
    "q_doc_source_divergence" -> ((s, dir) => {
      val synth = when(col("source") === "src0",
          concat(col("text"),
            lit(" skewzero skewzero skewzero skewzero")))
        .when(col("source") === "src1",
          concat(col("text"), lit(" skewone skewone")))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("source"), synth.as("text"))
      TextOps.sourceDivergence(wide(s, docs), "source", "text", 256)
        .orderBy("grp_a", "grp_b")
    }),

    // consecutive n-gram loop detection: residue 1 repeats a corpus
    // trigram 6x (rep3 trips), residue 2 stutters one token 8x (rep1),
    // residue 3 loops a bigram 5x (rep2), residue 0 stays raw (real text
    // has near-zero immediate repetition — the flag is a real verdict).
    // The oracle replays the slice-equality position counts and the
    // floor-div ppm exactly
    "q_doc_token_loops" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int, n: Int) = array_join(slice(toks, from, n), " ")
      val m4 = pmod(col("doc_id"), lit(4))
      val synth = when(m4 === 1,
          concat(seg(1, 3), lit(" "),
            repeat(concat(seg(4, 3), lit(" ")), 6), seg(7, 3)))
        .when(m4 === 2,
          concat(seg(1, 2), lit(" "),
            repeat(concat(seg(4, 1), lit(" ")), 8), seg(5, 3)))
        .when(m4 === 3,
          concat(repeat(concat(seg(1, 2), lit(" ")), 5), seg(3, 3)))
        .otherwise(col("text"))
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), synth.as("text"))
      TextOps.repeatProfile(wide(s, docs), "doc_id", "text")
        .orderBy("doc_id")
    }))

  /** DuckDB bucket of the md5-of-normalized-text, mirroring
    * [[Sampling.hashBucket]]'s first-4-nibbles integer math.
    */
  private def bucketSql(buckets: Int): String =
    s"""((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
       | + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
       | + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
       | + (instr('0123456789abcdef', substr(h, 4, 1)) - 1)) % $buckets""".stripMargin

  /** Unrolled Lloyd's rounds in SQL: every step is exact integer math
    * (quantize → squared distances → sums → truncating division, `//` ==
    * Spark DIV == Java long division), so DuckDB reproduces the Spark
    * trainer bit-for-bit — the payoff of the fixed-point design.
    */
  /** CTE chain `q$sfx, c0$sfx, a1$sfx … a{iters+1}$sfx` replaying the
    * fixed-point trainer over `vecExpr` (full vector or a sub-slice for
    * PQ); the final assignment CTE is `a${iters + 1}$sfx`.
    */
  private def kmeansCtes(sfx: String, vecExpr: String, k: Int,
      iters: Int, scale: String = "1000000.0",
      from: String = "embeddings"): Seq[String] = {
    def assignStep(name: String, cents: String) =
      s"""$name AS (SELECT vec_id, v, cid FROM (
         |  SELECT q.vec_id, q.v, c.cid,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      list_sum([(q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i])
         |                for i in generate_series(1, len(q.v))]),
         |      c.cid) AS rn
         |  FROM q$sfx q, $cents c) WHERE rn = 1)""".stripMargin
    def updateStep(name: String, assigns: String) =
      s"""$name AS (SELECT cid, list(s ORDER BY dim) AS cv FROM (
         |    SELECT cid, dim, CAST(sum(val) AS BIGINT) // count(*) AS s
         |    FROM (SELECT cid, unnest(v) AS val,
         |            unnest(generate_series(1, len(v))) AS dim FROM $assigns)
         |    GROUP BY cid, dim) GROUP BY cid)""".stripMargin
    Seq(
      s"""q$sfx AS (
         |  SELECT vec_id,
         |    [CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)
         |     for x in $vecExpr] AS v
         |  FROM $from)""".stripMargin,
      s"""c0$sfx AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         |    v AS cv
         |  FROM (SELECT vec_id, v FROM q$sfx ORDER BY vec_id LIMIT $k))""".stripMargin) ++
      (1 to iters).flatMap { i =>
        Seq(assignStep(s"a$i$sfx", if (i == 1) s"c0$sfx" else s"c${i - 1}$sfx"),
          updateStep(s"c$i$sfx", s"a$i$sfx"))
      } :+ assignStep(s"a${iters + 1}$sfx", s"c$iters$sfx")
  }

  private def kmeansSql(k: Int, iters: Int): String =
    s"""WITH ${kmeansCtes("", "embedding", k, iters).mkString(",\n")}
       |SELECT vec_id, cid AS cluster FROM a${iters + 1} ORDER BY vec_id""".stripMargin

  /** PQ oracle: one independent trainer replay per sub-vector slice,
    * joined on vec_id into the code columns.
    */
  private def pqSql(m: Int, dims: Int, k: Int, iters: Int): String = {
    val d = dims / m
    val blocks = (0 until m).flatMap { s =>
      kmeansCtes(s"_s$s", s"embedding[${s * d + 1}:${(s + 1) * d}]", k, iters)
    }
    val joins = (1 until m)
      .map(s => s"JOIN a${iters + 1}_s$s t$s USING (vec_id)").mkString("\n")
    val codes = (0 until m)
      .map(s => s"${if (s == 0) "t0" else s"t$s"}.cid AS code$s").mkString(", ")
    s"""WITH ${blocks.mkString(",\n")}
       |SELECT vec_id, $codes
       |FROM a${iters + 1}_s0 t0
       |$joins
       |ORDER BY vec_id""".stripMargin
  }

  /** Conjunctive-search oracle, shared by the direct and the
    * index-served gates (same result contract).
    */
  private val matchAllSql: String =
    raw"""WITH p AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
         |  FROM documents)
         |SELECT doc_id FROM (
         |  SELECT doc_id, count(*) AS nt FROM p
         |  WHERE term IN ('spark', 'query', 'join')
         |  GROUP BY doc_id)
         |WHERE nt = 3 ORDER BY doc_id""".stripMargin

  /** PQ reconstruction-error oracle: replay the sub-space trainers, then
    * per vector the exact integer distance to its assigned codeword,
    * summed across sub-spaces.
    */
  private def pqErrorSql(m: Int, dims: Int, k: Int, iters: Int): String = {
    val d = dims / m
    val blocks = (0 until m).flatMap { s =>
      kmeansCtes(s"_s$s", s"embedding[${s * d + 1}:${(s + 1) * d}]", k, iters)
    }
    val errs = (0 until m).map { s =>
      s"""err_s$s AS (
         |  SELECT a.vec_id,
         |    CAST(list_sum([(a.v[i] - c.cv[i]) * (a.v[i] - c.cv[i])
         |      for i in generate_series(1, len(a.v))]) AS BIGINT) AS e$s
         |  FROM a${iters + 1}_s$s a
         |  JOIN c${iters}_s$s c USING (cid))""".stripMargin
    }
    val joins = (1 until m)
      .map(s => s"JOIN err_s$s USING (vec_id)").mkString("\n")
    val sum = (0 until m).map(s => s"e$s").mkString(" + ")
    s"""WITH ${(blocks ++ errs).mkString(",\n")}
       |SELECT vec_id, CAST($sum AS BIGINT) AS err2
       |FROM err_s0
       |$joins
       |ORDER BY vec_id""".stripMargin
  }

  /** PQ ADC search oracle: replay the sub-space trainers, build the same
    * per-(query, sub, centroid) integer distance tables, sum m lookups per
    * corpus vector, rank by (distance, vec_id).
    */
  private def pqSearchSql(m: Int, dims: Int, k: Int, iters: Int,
      nQueries: Int, topK: Int): String = {
    val d = dims / m
    val blocks = (0 until m).flatMap { s =>
      kmeansCtes(s"_s$s", s"embedding[${s * d + 1}:${(s + 1) * d}]", k, iters)
    }
    val dts = (0 until m).map { s =>
      s"""dt_s$s AS (
         |  SELECT q.vec_id AS query_id, c.cid,
         |    CAST(list_sum([(q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i])
         |      for i in generate_series(1, len(q.v))]) AS BIGINT) AS d2
         |  FROM (SELECT vec_id, v FROM q_s$s WHERE vec_id < $nQueries) q,
         |       c${iters}_s$s c)""".stripMargin
    }
    val codeJoins = (1 until m)
      .map(s => s"JOIN a${iters + 1}_s$s t$s USING (vec_id)").mkString("\n")
    val dtJoins = (0 until m).map { s =>
      val qj = if (s == 0) "" else s" AND d$s.query_id = d0.query_id"
      s"JOIN dt_s$s d$s ON d$s.cid = t$s.cid$qj"
    }.mkString("\n")
    val distSum = (0 until m).map(s => s"d$s.d2").mkString(" + ")
    s"""WITH ${(blocks ++ dts).mkString(",\n")},
       |adc AS (
       |  SELECT d0.query_id, t0.vec_id,
       |    CAST($distSum AS BIGINT) AS adc_d2
       |  FROM a${iters + 1}_s0 t0
       |$codeJoins
       |$dtJoins),
       |ranked AS (
       |  SELECT query_id, vec_id, adc_d2,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_d2, vec_id) AS INT) AS rnk
       |  FROM adc)
       |SELECT query_id, vec_id, adc_d2, rnk FROM ranked
       |WHERE rnk <= $topK ORDER BY query_id, rnk""".stripMargin
  }

  /** IVF-PQ oracle: coarse cosine cell assignment + per-query probe
    * selection (the q_emb_knn_ivf / q_emb_ivf_assign CTE shapes), composed
    * with the PQ ADC replay — candidates restricted to probed cells before
    * ranking, exactly like the Spark operator.
    */
  /** PQ-margin replay: sub-space trainers at scale 1e5 (the exact-chain
    * envelope), candidate reconstructed norms from codeword norms², LUT
    * dots of the quantized query slice against each assigned codeword,
    * the icos truncating cosine, per-direction top-`topK`, and the SAME
    * margin tail CTEs as the brute/IVF margin gates — proving the
    * compressed backend swap changes only the kNN CTEs.
    */
  private def marginPqSql(m: Int, dims: Int, k: Int, iters: Int,
      topK: Int): String = {
    val d = dims / m
    // calibration bound (CorpusOps.marginCalBound): trainer, corpus and
    // query sides all run on the deterministic id panel — the engine
    // gate applies the same WHERE before training and mining
    val calSrc = "(SELECT * FROM embeddings WHERE vec_id < " +
      s"${CorpusOps.marginCalBound})"
    val blocks = (0 until m).flatMap { s =>
      kmeansCtes(s"_s$s", s"embedding[${s * d + 1}:${(s + 1) * d}]", k,
        iters, scale = "100000.0", from = calSrc)
    }
    val n2s = (0 until m).map { s =>
      s"""n2_s$s AS (SELECT cid, CAST(list_sum([cv[i] * cv[i]
         |    for i in generate_series(1, len(cv))]) AS BIGINT) AS n2
         |  FROM c${iters}_s$s)""".stripMargin
    }
    val a = s"a${iters + 1}"
    val codeJoins = (1 until m)
      .map(s => s"JOIN ${a}_s$s t$s USING (vec_id)").mkString("\n")
    val n2Joins = (0 until m)
      .map(s => s"JOIN n2_s$s n$s ON n$s.cid = t$s.cid").mkString("\n")
    val n2Sum = (0 until m).map(s => s"n$s.n2").mkString(" + ")
    val cols = (0 until m).map(s => s"t$s.cid AS c$s").mkString(", ")
    val cbJoins = (0 until m)
      .map(s => s"JOIN c${iters}_s$s b$s ON b$s.cid = c.c$s").mkString("\n")
    val dotSum = (0 until m).map { s =>
      s"CAST(list_sum([q.qv[${s * d} + i] * b$s.cv[i] " +
        s"for i in generate_series(1, $d)]) AS BIGINT)"
    }.mkString(" + ")
    def side(qs: String, candPar: Int, srcSel: String, tgtSel: String,
        part: String, tie: String, out: String) =
      s"""${out}0 AS (SELECT $srcSel, $tgtSel,
         |    ($dotSum) AS dot, q.r AS rq, c.rv
         |  FROM $qs q, crv c
         |$cbJoins
         |  WHERE c.vec_id % 2 = $candPar AND c.vec_id != q.vec_id),
         |${out}c AS (SELECT src_id, tgt_id,
         |    (dot * 1000000) // nullif(rq * rv, 0) AS cos_x1m
         |  FROM ${out}0),
         |${out}r AS (SELECT src_id, tgt_id, cos_x1m,
         |    row_number() OVER (PARTITION BY $part
         |      ORDER BY cos_x1m DESC, $tie) AS rn
         |  FROM ${out}c WHERE cos_x1m IS NOT NULL),
         |$out AS (SELECT src_id, tgt_id, cos_x1m FROM ${out}r
         |  WHERE rn <= $topK)""".stripMargin
    s"""WITH e AS (SELECT vec_id, ${CorpusOps.evGuardSql} AS ev
       |  FROM embeddings WHERE vec_id < ${CorpusOps.marginCalBound}),
       |${CorpusOps.exactChainSql("e", "qe")},
       |${(blocks ++ n2s).mkString(",\n")},
       |cand AS (SELECT t0.vec_id, $cols, $n2Sum AS n2v
       |  FROM ${a}_s0 t0
       |$codeJoins
       |$n2Joins),
       |cr0 AS (SELECT *, CAST(floor(sqrt(CAST(n2v AS DOUBLE)))
       |    AS BIGINT) AS mr0 FROM cand),
       |cr1 AS (SELECT *, CASE WHEN (mr0+1)*(mr0+1) <= n2v THEN mr0+1
       |    ELSE mr0 END AS mr1 FROM cr0),
       |crv AS (SELECT vec_id, ${(0 until m).map(s => s"c$s")
        .mkString(", ")}, CASE WHEN mr1*mr1 > n2v THEN mr1-1 ELSE mr1 END
       |    AS rv FROM cr1),
       |so AS (SELECT vec_id, qv, r FROM qe WHERE vec_id % 2 = 0),
       |tg AS (SELECT vec_id, qv, r FROM qe WHERE vec_id % 2 = 1),
       |${side("so", 1, "q.vec_id AS src_id", "c.vec_id AS tgt_id",
          "src_id", "tgt_id", "fwd")},
       |${side("tg", 0, "c.vec_id AS src_id", "q.vec_id AS tgt_id",
          "tgt_id", "src_id", "bwd")},
       |${CorpusOps.marginTailSql}""".stripMargin
  }

  /** The [[graft.ops.Curation.htmlStrip]] rule chain as reusable oracle
    * CTEs `x/y/z/w` over a source CTE `h` carrying (doc_id, html); `w`
    * exposes (doc_id, html, clean). Shared by the strip gate and the
    * WARC→WET composition so the rewrite replays from ONE definition.
    */
  private val htmlStripChainSql: String =
    raw"""x AS (SELECT doc_id, html,
         |    regexp_replace(regexp_replace(regexp_replace(html,
         |      '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g'),
         |      '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g'),
         |      '(?s)<!--.*?-->', ' ', 'g') AS s3
         |  FROM h),
         |y AS (SELECT doc_id, html,
         |    regexp_replace(regexp_replace(s3,
         |      '(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/ul|/ol)[^>]*>',
         |      chr(10), 'g'),
         |      '<[^>]*>', ' ', 'g') AS s5
         |  FROM x),
         |z AS (SELECT doc_id, html,
         |    replace(replace(replace(replace(replace(replace(replace(s5,
         |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |      '&#39;', chr(39)), '&apos;', chr(39)), '&nbsp;', ' '),
         |      '&amp;', '&') AS s6
         |  FROM y),
         |w AS (SELECT doc_id, html,
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |      s6, '[ \t\r]+', ' ', 'g'),
         |      ' *\n *', chr(10), 'g'),
         |      '\n+', chr(10), 'g'),
         |      '^\s+|\s+$$', '', 'g') AS clean
         |  FROM z)""".stripMargin

  private def ivfPqSearchSql(m: Int, dims: Int, k: Int, iters: Int,
      nQueries: Int, topK: Int, nprobe: Int, nCoarse: Int): String = {
    val d = dims / m
    val blocks = (0 until m).flatMap { s =>
      kmeansCtes(s"_s$s", s"embedding[${s * d + 1}:${(s + 1) * d}]", k, iters)
    }
    val dts = (0 until m).map { s =>
      s"""dt_s$s AS (
         |  SELECT q.vec_id AS query_id, c.cid,
         |    CAST(list_sum([(q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i])
         |      for i in generate_series(1, len(q.v))]) AS BIGINT) AS d2
         |  FROM (SELECT vec_id, v FROM q_s$s WHERE vec_id < $nQueries) q,
         |       c${iters}_s$s c)""".stripMargin
    }
    val cos = CorpusOps.cosSql _
    val coarse = Seq(
      s"""cents AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
         |  FROM embeddings WHERE vec_id < $nCoarse)""".stripMargin,
      """corpus AS (SELECT vec_id, embedding::DOUBLE[] AS ev
        |  FROM embeddings)""".stripMargin,
      s"""cells AS (SELECT vec_id, centroid_id AS cell FROM (
         |  SELECT c.vec_id, cent.centroid_id,
         |    row_number() OVER (PARTITION BY c.vec_id
         |      ORDER BY ${cos("c.ev", "cent.cv")} DESC, cent.centroid_id) AS rn
         |  FROM corpus c, cents cent) WHERE rn = 1)""".stripMargin,
      s"""probes AS (SELECT query_id, cell FROM (
         |  SELECT q.vec_id AS query_id, cent.centroid_id AS cell,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${cos("q.ev", "cent.cv")} DESC, cent.centroid_id) AS rn
         |  FROM (SELECT vec_id, ev FROM corpus WHERE vec_id < $nQueries) q,
         |       cents cent) WHERE rn <= $nprobe)""".stripMargin)
    val codeJoins = (1 until m)
      .map(s => s"JOIN a${iters + 1}_s$s t$s USING (vec_id)").mkString("\n")
    val dtJoins = (0 until m).map { s =>
      s"JOIN dt_s$s d$s ON d$s.cid = t$s.cid AND d$s.query_id = p.query_id"
    }.mkString("\n")
    val distSum = (0 until m).map(s => s"d$s.d2").mkString(" + ")
    s"""WITH ${(blocks ++ dts ++ coarse).mkString(",\n")},
       |adc AS (
       |  SELECT p.query_id, t0.vec_id,
       |    CAST($distSum AS BIGINT) AS adc_d2
       |  FROM a${iters + 1}_s0 t0
       |$codeJoins
       |JOIN cells cl ON cl.vec_id = t0.vec_id
       |JOIN probes p ON p.cell = cl.cell
       |$dtJoins),
       |ranked AS (
       |  SELECT query_id, vec_id, adc_d2,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_d2, vec_id) AS INT) AS rnk
       |  FROM adc)
       |SELECT query_id, vec_id, adc_d2, rnk FROM ranked
       |WHERE rnk <= $topK ORDER BY query_id, rnk""".stripMargin
  }

  private lazy val decontaminateSql: String =
      s"""WITH n AS (
         |  SELECT doc_id, text,
         |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
         |  FROM documents),
         |sp AS (SELECT doc_id, text,
         |    CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id, text, ${bucketSql(100)} AS bk FROM n)),
         |sh AS (SELECT doc_id, split,
         |    list_distinct(CASE WHEN len(t) >= 3
         |      THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |            for i in generate_series(1, len(t) - 2)]
         |      ELSE [] END) AS s
         |  FROM (SELECT doc_id, split,
         |          regexp_split_to_array(trim(lower(text)), '\\s+') AS t
         |        FROM sp)),
         |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE split = 'test'),
         |tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE split = 'train'),
         |shared AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM tr JOIN ev USING (g) GROUP BY doc_id)
         |SELECT doc_id, CAST(len(s) AS INT) AS n_shingles, n_shared
         |FROM sh JOIN shared USING (doc_id)
         |ORDER BY doc_id""".stripMargin

  /** Unrolled fixed-point power-iteration replay (the kmeansCtes idiom):
    * quantize → truncating per-dim mean → centered vectors → per round
    * (dot per vector, per-dim weighted sum, max-rescale, isqrt
    * normalize) → final milli projections. DuckDB's HUGEINT covers the
    * w·1000 intermediate the Scala driver does in BigInt; `//` and
    * BigInt division both truncate toward zero.
    */
  private def powerIterCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""dot$r AS (SELECT c.vec_id, c.cv,
         |    CAST(list_sum([c.cv[i] * v$r.v[i]
         |      for i in generate_series(1, len(c.cv))]) AS BIGINT) AS dt
         |  FROM c, v$r),
         |w$r AS (SELECT d, CAST(sum(cv * dt) AS BIGINT) AS w
         |  FROM (SELECT generate_subscripts(cv, 1) AS d, unnest(cv) AS cv,
         |          dt FROM dot$r)
         |  GROUP BY d),
         |s$r AS (SELECT greatest(max(abs(w)), 1) AS s FROM w$r),
         |wp$r AS (SELECT d, CAST((w * 1000) // s AS BIGINT) AS wp
         |  FROM w$r, s$r),
         |n$r AS (SELECT greatest(CAST(floor(sqrt(CAST(sum(wp * wp)
         |    AS DOUBLE))) AS BIGINT), 1) AS nv FROM wp$r),
         |v${r + 1} AS (SELECT list(CAST(wp * 1000 // nv AS BIGINT)
         |    ORDER BY d) AS v FROM wp$r, n$r GROUP BY nv)""".stripMargin
    }.mkString(",\n")
    s"""q AS (SELECT vec_id,
       |    [CAST(floor(x * 1000 + 0.5) AS BIGINT)
       |     for x in embedding::DOUBLE[]] AS qv
       |  FROM embeddings),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
       |mu AS (SELECT list(CAST(s // (SELECT n FROM nn) AS BIGINT)
       |    ORDER BY d) AS ml
       |  FROM (SELECT d, sum(v) AS s
       |        FROM (SELECT generate_subscripts(qv, 1) AS d,
       |                unnest(qv) AS v FROM q)
       |        GROUP BY d)),
       |c AS (SELECT vec_id,
       |    [qv[i] - ml[i] for i in generate_series(1, len(qv))] AS cv
       |  FROM q, mu),
       |v1 AS (SELECT [CAST(1000 AS BIGINT)
       |    for i in generate_series(1, (SELECT min(len(qv)) FROM q))]
       |    AS v),
       |$roundCtes""".stripMargin
  }

  private def powerIterSql(rounds: Int): String =
    s"""WITH ${powerIterCtes(rounds)}
       |SELECT c.vec_id,
       |  CAST(CAST(list_sum([c.cv[i] * vf.v[i]
       |    for i in generate_series(1, len(c.cv))]) AS BIGINT) // 1000
       |    AS BIGINT) AS proj_milli
       |FROM c, v${rounds + 1} vf ORDER BY c.vec_id""".stripMargin

  /** [[powerIterCtes]] + the division-free residual (r' = vv·c − dt·v,
    * cosine-invariant) + the standard brute-knn cosine/rank replay over
    * the residual space.
    */
  private def abttKnnSql(rounds: Int, k: Int): String = {
    val vf = s"v${rounds + 1}"
    s"""WITH ${powerIterCtes(rounds)},
       |vvv AS (SELECT CAST(list_sum([v[i] * v[i]
       |    for i in generate_series(1, len(v))]) AS BIGINT) AS vv
       |  FROM $vf),
       |dtf AS (SELECT c.vec_id, c.cv,
       |    CAST(list_sum([c.cv[i] * vf.v[i]
       |      for i in generate_series(1, len(c.cv))]) AS BIGINT) AS dt
       |  FROM c, $vf vf),
       |res AS (SELECT vec_id,
       |    [CAST(CAST(vvv.vv * cv[i] - dt * vf.v[i] AS REAL) AS DOUBLE)
       |     for i in generate_series(1, len(cv))] AS ev
       |  FROM dtf, $vf vf, vvv),
       |qq AS (SELECT vec_id AS query_id, ev AS qv FROM res
       |  WHERE vec_id < 3),
       |sc AS (SELECT qq.query_id, c2.vec_id,
       |    ${CorpusOps.cosSql("c2.ev", "qq.qv")} AS cos
       |  FROM res c2 CROSS JOIN qq WHERE c2.vec_id != qq.query_id),
       |rr AS (SELECT query_id, vec_id, cos,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, vec_id) AS INT) AS rank FROM sc)
       |SELECT query_id, rank, vec_id, round(cos, 6) AS cos
       |FROM rr WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "q_emb_top_component" -> powerIterSql(3),

    "q_emb_abtt_knn" -> abttKnnSql(3, 10),

    // serving gate ranks identically to the in-query-encode gate — the
    // SAME replay is the oracle for both
    "q_emb_bq_serve" -> CorpusOps.oracles("q_emb_bq_search"),

    // serving gate: persistence must not change a single bit — same
    // full replay as the in-query-encode variant
    "q_emb_sq8_serve" -> CorpusOps.oracles("q_emb_sq8_search"),
    // serving returns the in-query composition's exact integer ranking
    "q_emb_lsh_serve" -> CorpusOps.oracles("q_emb_multiprobe"),

    "q_emb_ivfpq_search" -> ivfPqSearchSql(2, 64, 8, 2, nQueries = 3,
      topK = 5, nprobe = 2, nCoarse = 8),

    // serving gate: same ranking contract as the in-query-trainer variant
    // (persistence must not change a single bit), so the same full replay
    "q_emb_ivfpq_serve" -> ivfPqSearchSql(2, 64, 8, 2, nQueries = 3,
      topK = 5, nprobe = 2, nCoarse = 8),

    // serving gate mines the in-query composition's exact margins — the
    // persisted cell assignment must not change a single bit
    "q_emb_margin_ivf_serve" -> CorpusOps.oracles("q_emb_margin_ivf_i"),
    "q_emb_margin_ivf_serve64" -> CorpusOps.marginIvfOracleSql(64),

    "q_emb_margin_pq" -> marginPqSql(2, 64, 8, 2, topK = 4),

    // SQ8-margin replay: the sq8 per-vector-scale quantize chain (scale
    // cancels in the cosine, so codes + isqrt roots are the whole
    // state), both directions' top-4 by (cos_x1m desc, id), the
    // IDENTICAL margin tail — backend swap = chain CTE swap, nothing else
    "q_emb_margin_sq8" ->
      s"""WITH e AS (SELECT vec_id,
         |    ${CorpusOps.evGuardSql} AS ev FROM embeddings
         |    WHERE vec_id < ${CorpusOps.marginCalBound}),
         |${CorpusOps.sq8ChainSql("e", "qe")},
         |so AS (SELECT * FROM qe WHERE vec_id % 2 = 0),
         |tg AS (SELECT * FROM qe WHERE vec_id % 2 = 1),
         |f0 AS (SELECT so.vec_id AS src_id, tg.vec_id AS tgt_id,
         |    ${CorpusOps.icosSql("so.qv", "so.r", "tg.qv", "tg.r")}
         |      AS cos_x1m
         |  FROM so CROSS JOIN tg),
         |fr AS (SELECT src_id, tgt_id, cos_x1m, row_number() OVER (
         |    PARTITION BY src_id ORDER BY cos_x1m DESC, tgt_id) AS rn
         |  FROM f0 WHERE cos_x1m IS NOT NULL),
         |fwd AS (SELECT src_id, tgt_id, cos_x1m FROM fr WHERE rn <= 4),
         |br AS (SELECT src_id, tgt_id, cos_x1m, row_number() OVER (
         |    PARTITION BY tgt_id ORDER BY cos_x1m DESC, src_id) AS rn
         |  FROM f0 WHERE cos_x1m IS NOT NULL),
         |bwd AS (SELECT src_id, tgt_id, cos_x1m FROM br WHERE rn <= 4),
         |${CorpusOps.marginTailSql}""".stripMargin,

    // BQ-margin replay: Hamming prefilter as the VALUE identity Σ[sign
    // disagreements] (Σ bit_count(xor(words)) ≡ count of differing sign
    // bits — the word PACKING itself is replayed in q_emb_bq_search's
    // oracle), 16-candidate pool per query with boundary ties on id,
    // exact integer-cosine rerank at scale 1e5, top-4 both directions,
    // the identical margin tail
    "q_emb_margin_bq" ->
      s"""WITH e AS (SELECT vec_id,
         |    ${CorpusOps.evGuardSql} AS ev FROM embeddings),
         |${CorpusOps.exactChainSql("e", "qe")},
         |je AS (SELECT e.vec_id, e.ev, qe.qv, qe.r
         |  FROM e JOIN qe USING (vec_id)),
         |so AS (SELECT * FROM je WHERE vec_id % 2 = 0),
         |tg AS (SELECT * FROM je WHERE vec_id % 2 = 1),
         |sp AS (SELECT * FROM so
         |       WHERE vec_id < ${CorpusOps.marginCalBound}),
         |tp AS (SELECT * FROM tg
         |       WHERE vec_id < ${CorpusOps.marginCalBound}),
         |hf AS (SELECT sp.vec_id AS src_id, tg.vec_id AS tgt_id,
         |    sp.qv AS qqv, sp.r AS qr, tg.qv AS cqv, tg.r AS cr,
         |    list_sum([CASE WHEN (tg.ev[i] > 0) <> (sp.ev[i] > 0)
         |      THEN 1 ELSE 0 END
         |     for i in generate_series(1, len(tg.ev))]) AS ham
         |  FROM sp CROSS JOIN tg),
         |cf AS (SELECT *, row_number() OVER (
         |    PARTITION BY src_id ORDER BY ham, tgt_id) AS hrn FROM hf),
         |sf AS (SELECT src_id, tgt_id,
         |    ${CorpusOps.icosSql("cqv", "cr", "qqv", "qr")} AS cos_x1m
         |  FROM cf WHERE hrn <= 16),
         |fr AS (SELECT src_id, tgt_id, cos_x1m, row_number() OVER (
         |    PARTITION BY src_id ORDER BY cos_x1m DESC, tgt_id) AS rn
         |  FROM sf WHERE cos_x1m IS NOT NULL),
         |fwd AS (SELECT src_id, tgt_id, cos_x1m FROM fr WHERE rn <= 4),
         |hb AS (SELECT so.vec_id AS src_id, tp.vec_id AS tgt_id,
         |    tp.qv AS qqv, tp.r AS qr, so.qv AS cqv, so.r AS cr,
         |    list_sum([CASE WHEN (so.ev[i] > 0) <> (tp.ev[i] > 0)
         |      THEN 1 ELSE 0 END
         |     for i in generate_series(1, len(so.ev))]) AS ham
         |  FROM tp CROSS JOIN so),
         |cb AS (SELECT *, row_number() OVER (
         |    PARTITION BY tgt_id ORDER BY ham, src_id) AS hrn FROM hb),
         |sb AS (SELECT src_id, tgt_id,
         |    ${CorpusOps.icosSql("cqv", "cr", "qqv", "qr")} AS cos_x1m
         |  FROM cb WHERE hrn <= 16),
         |br AS (SELECT src_id, tgt_id, cos_x1m, row_number() OVER (
         |    PARTITION BY tgt_id ORDER BY cos_x1m DESC, src_id) AS rn
         |  FROM sb WHERE cos_x1m IS NOT NULL),
         |bwd AS (SELECT src_id, tgt_id, cos_x1m FROM br WHERE rn <= 4),
         |${CorpusOps.marginTailSql}""".stripMargin,

    "q_emb_kmeans" -> kmeansSql(4, 3),

    "q_doc_pipeline" ->
      raw"""WITH fps AS (SELECT doc_id, lang, text,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
           |  FROM documents),
           |keep AS (SELECT fp, min(doc_id) AS doc_id FROM fps GROUP BY fp),
           |d AS (SELECT f.doc_id, f.lang, f.text FROM fps f
           |      JOIN keep k ON f.fp = k.fp AND f.doc_id = k.doc_id),
           |b AS (SELECT doc_id, lang, text,
           |    regexp_split_to_array(trim(text), '\s+') AS toks FROM d),
           |m AS (SELECT doc_id, lang, text,
           |    CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE)
           |      / greatest(len(toks), 1) AS sraw,
           |    CAST(length(trim(text)) AS DOUBLE)
           |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS awl,
           |    least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) AS lens
           |  FROM b),
           |q AS (SELECT doc_id, lang, text,
           |    round((lens
           |      + (CASE WHEN awl >= 3 AND awl <= 10 THEN 1.0 ELSE 0.25 END)
           |      + least(sraw * 5.0, 1.0)) / 3.0, 6) AS quality
           |  FROM m),
           |f AS (SELECT * FROM q WHERE quality >= 0.5),
           |n AS (SELECT doc_id, lang, quality,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
           |  FROM f),
           |s AS (SELECT doc_id, lang, quality, ${bucketSql(100)} AS bk FROM n),
           |sp AS (SELECT doc_id, lang, quality,
           |    CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM s)
           |SELECT split, lang, CAST(count(*) AS BIGINT) AS n,
           |  min(doc_id) AS min_id,
           |  CAST(sum(CAST(round(quality * 1000000) AS BIGINT)) AS BIGINT)
           |    AS q_micro
           |FROM sp GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    // CASE-replay of the provenance chain: same fp/keeper, same 6dp
    // quality, same split buckets; the stage CASE re-derives first-drop
    // ownership — every doc gets exactly one (stage, action, reason)
    "q_doc_pipeline_audit" ->
      raw"""WITH fps AS (SELECT doc_id, lang, text,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
           |  FROM documents),
           |keep AS (SELECT fp, min(doc_id) AS keeper_id FROM fps GROUP BY fp),
           |kd AS (SELECT f.doc_id, f.text, k.keeper_id
           |  FROM fps f JOIN keep k USING (fp)),
           |b AS (SELECT doc_id, text, keeper_id,
           |    regexp_split_to_array(trim(text), '\s+') AS toks FROM kd),
           |m AS (SELECT doc_id, text, keeper_id,
           |    CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE)
           |      / greatest(len(toks), 1) AS sraw,
           |    CAST(length(trim(text)) AS DOUBLE)
           |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS awl,
           |    least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) AS lens
           |  FROM b),
           |q AS (SELECT doc_id, text, keeper_id,
           |    CAST(round(round((lens
           |      + (CASE WHEN awl >= 3 AND awl <= 10 THEN 1.0 ELSE 0.25 END)
           |      + least(sraw * 5.0, 1.0)) / 3.0, 6) * 1000000) AS BIGINT)
           |      AS qm
           |  FROM m),
           |n AS (SELECT doc_id, keeper_id, qm,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
           |  FROM q),
           |s AS (SELECT doc_id, keeper_id, qm, ${bucketSql(100)} AS bk
           |  FROM n)
           |SELECT doc_id,
           |  CASE WHEN doc_id <> keeper_id THEN 'dedup'
           |       WHEN qm < 500000 THEN 'quality'
           |       ELSE 'split' END AS stage,
           |  CASE WHEN doc_id <> keeper_id OR qm < 500000
           |    THEN 'drop' ELSE 'keep' END AS action,
           |  CASE WHEN doc_id <> keeper_id THEN 'dup_of:' || keeper_id
           |       WHEN qm < 500000 THEN 'q_micro:' || qm
           |       WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
           |       ELSE 'test' END AS reason
           |FROM s ORDER BY doc_id""".stripMargin,

    "q_doc_drift" ->
      raw"""WITH o AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
           |nw AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
           |vo AS (SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_old,
           |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           |    AS tok_old FROM o GROUP BY lang),
           |vn AS (SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_new,
           |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           |    AS tok_new FROM nw GROUP BY lang),
           |so AS (SELECT DISTINCT lang AS stratum,
           |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           |  FROM o),
           |sn AS (SELECT DISTINCT lang AS stratum,
           |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           |  FROM nw),
           |nv AS (SELECT sn.stratum, CAST(count(*) AS BIGINT) AS terms_new,
           |  CAST(sum(CASE WHEN so.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS terms_novel
           |  FROM sn LEFT JOIN so
           |    ON sn.stratum = so.stratum AND sn.term = so.term
           |  GROUP BY sn.stratum),
           |j AS (SELECT coalesce(vo.stratum, vn.stratum) AS stratum,
           |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new,
           |    coalesce(tok_old, 0) AS tok_old, coalesce(tok_new, 0) AS tok_new
           |  FROM vo FULL OUTER JOIN vn ON vo.stratum = vn.stratum)
           |SELECT j.stratum, n_old, n_new, tok_old, tok_new,
           |  coalesce(terms_new, 0) AS terms_new,
           |  coalesce(terms_novel, 0) AS terms_novel,
           |  round(CAST(n_new AS DOUBLE) / nullif(CAST(n_old AS DOUBLE), 0.0), 6)
           |    AS volume_ratio,
           |  round(CAST(coalesce(terms_novel, 0) AS DOUBLE)
           |    / nullif(CAST(coalesce(terms_new, 0) AS DOUBLE), 0.0), 6)
           |    AS novel_frac
           |FROM j LEFT JOIN nv ON j.stratum = nv.stratum
           |ORDER BY j.stratum""".stripMargin,

    // integer replay: isqrt weights, SW/T scalars, pinned floor-div
    // threshold chain, same md5 bucket membership
    "q_doc_temp_mixture" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt
         |      FROM documents GROUP BY lang),
         |cw AS (SELECT lang, cnt,
         |    CAST(floor(sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS wq FROM c),
         |sw AS (SELECT CAST(sum(wq) AS BIGINT) AS sw FROM cw),
         |t AS (SELECT min((cnt * sw.sw) // wq) AS tt, max(sw.sw) AS sw
         |      FROM cw CROSS JOIN sw),
         |thr AS (SELECT lang,
         |    CAST((10000 * ((t.tt * wq) // cnt)) // t.sw AS BIGINT) AS thr
         |  FROM cw CROSS JOIN t),
         |n AS (SELECT doc_id, lang,
         |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
         |  FROM documents),
         |b AS (SELECT doc_id, lang, ${bucketSql(10000)} AS bk FROM n),
         |k AS (SELECT b.doc_id, b.lang FROM b
         |      JOIN thr ON b.lang = thr.lang WHERE bk < thr)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "q_doc_mixture" ->
      s"""WITH w(stratum, wt) AS (VALUES
         |  ('en', 0.4::DOUBLE), ('de', 0.2::DOUBLE),
         |  ('fr', 0.2::DOUBLE), ('es', 0.2::DOUBLE)),
         |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt
         |      FROM documents GROUP BY lang),
         |cw AS (SELECT lang, cnt, wt FROM c JOIN w ON lang = stratum),
         |t AS (SELECT min(cnt / wt) AS tt FROM cw),
         |thr AS (SELECT lang, CAST(round(10000 * wt * (tt / cnt)) AS BIGINT)
         |          AS thr FROM cw CROSS JOIN t),
         |n AS (SELECT doc_id, lang,
         |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
         |  FROM documents),
         |b AS (SELECT doc_id, lang, ${bucketSql(10000)} AS bk FROM n),
         |k AS (SELECT b.doc_id, b.lang FROM b
         |      JOIN thr ON b.lang = thr.lang WHERE bk < thr)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "q_doc_upsert" ->
      """WITH base AS (
        |  SELECT doc_id, 1 AS version, text, lang, FALSE AS deleted
        |  FROM documents),
        |recrawl AS (
        |  SELECT doc_id, 2 AS version, upper(text) AS text, lang,
        |    FALSE AS deleted
        |  FROM documents WHERE doc_id % 5 = 0),
        |takedown AS (
        |  SELECT doc_id, 3 AS version, text, lang, TRUE AS deleted
        |  FROM documents WHERE doc_id % 11 = 7),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM recrawl
        |      UNION ALL SELECT * FROM takedown),
        |r AS (SELECT *, row_number()
        |        OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
        |      FROM u)
        |SELECT doc_id, version, md5(text) AS fp, lang
        |FROM r WHERE rn = 1 AND NOT deleted ORDER BY doc_id""".stripMargin,

    // SCD2 replay: the same boundary predicate (first version / after a
    // tombstone / null-safe attribute change), valid_to = next boundary
    // version over boundary rows only, tombstones dropped after closing
    "q_cdc_scd2" ->
      """WITH chg AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderpriority,
        |    (o_orderkey % 37 = 0) AS deleted
        |  FROM orders),
        |lagd AS (
        |  SELECT *,
        |    lag(o_orderstatus) OVER w AS p_st,
        |    lag(o_orderpriority) OVER w AS p_pr,
        |    lag(deleted) OVER w AS p_del,
        |    (row_number() OVER w = 1) AS first_row
        |  FROM chg WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)),
        |b AS (
        |  SELECT * FROM lagd
        |  WHERE deleted OR first_row OR coalesce(p_del, FALSE)
        |    OR NOT (o_orderstatus IS NOT DISTINCT FROM p_st
        |            AND o_orderpriority IS NOT DISTINCT FROM p_pr)),
        |v AS (
        |  SELECT *, lead(o_orderkey) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderkey) AS valid_to
        |  FROM b)
        |SELECT o_custkey, o_orderkey AS valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current, o_orderstatus, o_orderpriority
        |FROM v WHERE NOT deleted
        |ORDER BY o_custkey, valid_from""".stripMargin,

    // skew-advisor replay: key counts, (cnt DESC, kh ASC) ranking — the
    // heap's (-cnt, hash) order — and the integer share/salt/hot algebra
    "q_skew_advisor" ->
      """WITH c AS (SELECT CAST(event_type AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM c),
        |h AS (SELECT c.key, c.cnt,
        |    ('0x' || substr(md5(c.key), 1, 13))::BIGINT AS kh, t.n_total
        |  FROM c CROSS JOIN t),
        |r AS (SELECT *, CAST(row_number() OVER (
        |    ORDER BY cnt DESC, kh ASC) AS INT) AS rank FROM h)
        |SELECT rank, key, cnt,
        |  CASE WHEN n_total < 9000000000000 THEN cnt * 1000000 // n_total
        |    ELSE cnt // greatest(n_total // 1000000, 1) END AS share_ppm,
        |  (cnt * 32 + n_total - 1) // n_total AS salt_factor,
        |  cnt > 2 * (n_total // 32) AS hot
        |FROM r WHERE rank <= 5 ORDER BY rank""".stripMargin,

    // join-size replay: per-side key counts, per-key pair products,
    // (pair_rows DESC, kh ASC) ranking, integer share algebra
    "q_join_size_advisor" ->
      """WITH cl AS (SELECT CAST(c_nationkey AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS n_left
        |  FROM customer GROUP BY 1),
        |cr AS (SELECT CAST(s_nationkey AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS n_right
        |  FROM supplier GROUP BY 1),
        |p AS (SELECT cl.key, cl.n_left, cr.n_right,
        |    cl.n_left * cr.n_right AS pair_rows,
        |    ('0x' || substr(md5(cl.key), 1, 13))::BIGINT AS kh
        |  FROM cl JOIN cr USING (key)),
        |t AS (SELECT CAST(sum(pair_rows) AS BIGINT) AS est_total FROM p),
        |r AS (SELECT p.*, t.est_total, CAST(row_number() OVER (
        |    ORDER BY pair_rows DESC, kh ASC) AS INT) AS rank
        |  FROM p CROSS JOIN t)
        |SELECT rank, key, n_left, n_right, pair_rows,
        |  CASE WHEN est_total < 9000000000000
        |    THEN pair_rows * 1000000 // est_total
        |    ELSE pair_rows // greatest(est_total // 1000000, 1) END
        |    AS share_ppm, est_total
        |FROM r WHERE rank <= 5 ORDER BY rank""".stripMargin,

    // z-value replay: the same scale-clamp (double divide then multiply,
    // IEEE-identical) and the same 8-term bit interleave in integer math
    "q_layout_zvalue" ->
      """WITH s AS (SELECT o_orderkey,
        |    least(greatest(CAST(floor((CAST(o_custkey AS DOUBLE) - 0.0)
        |      / 20000.0 * 255) AS BIGINT), 0), 255) AS sx,
        |    least(greatest(CAST(floor((CAST(o_totalprice AS DOUBLE) - 0.0)
        |      / 600000.0 * 255) AS BIGINT), 0), 255) AS sy
        |  FROM orders)
        |SELECT o_orderkey, CAST(list_sum(
        |    [((sx // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i))
        |     + ((sy // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i + 1))
        |     for i in generate_series(0, 7)]) AS BIGINT) AS z
        |FROM s ORDER BY o_orderkey""".stripMargin,

    // sft-pack replay: render_len = per-conv sum of segment lengths
    // (only the LENGTH feeds packing), then the recursive greedy fill
    // per shard — the q_doc_pack CTE with the rendered sizes
    "q_doc_sft_pack" ->
      raw"""WITH RECURSIVE turns AS (
           |  SELECT doc_id // 4 AS conv,
           |    CASE WHEN doc_id % 4 = 0 THEN 'system'
           |         WHEN doc_id % 4 = 1 THEN 'user'
           |         ELSE 'assistant' END AS role,
           |    array_to_string(
           |      (regexp_split_to_array(trim(text), '\s+'))[1:8], ' ')
           |      AS content
           |  FROM documents WHERE doc_id < 5120),
           |seg AS (SELECT conv,
           |    '<|' || role || '|>' || content || '<|end|>' AS s
           |  FROM turns),
           |r AS (SELECT conv, conv % 4 AS shard,
           |    CAST(sum(length(s)) AS INT) AS sz
           |  FROM seg GROUP BY conv),
           |tk AS (SELECT shard, conv, sz,
           |    CAST(row_number() OVER (PARTITION BY shard ORDER BY conv)
           |      AS INT) AS rn
           |  FROM r),
           |p AS (
           |  SELECT shard, conv, sz, rn, 0 AS bin, sz AS fill
           |  FROM tk WHERE rn = 1
           |  UNION ALL
           |  SELECT tk.shard, tk.conv, tk.sz, tk.rn,
           |    CASE WHEN p.fill + tk.sz <= 2048 THEN p.bin
           |         ELSE p.bin + 1 END AS bin,
           |    CASE WHEN p.fill + tk.sz <= 2048 THEN p.fill + tk.sz
           |         ELSE tk.sz END AS fill
           |  FROM tk JOIN p ON tk.shard = p.shard AND tk.rn = p.rn + 1)
           |SELECT shard, conv, sz AS render_len, bin
           |FROM p ORDER BY shard, conv""".stripMargin,

    // snapshot-diff replay: same v2 synthesis, FULL OUTER JOIN
    // classification (the join formulation is fine at oracle scale; the
    // engine's union+agg must agree cell for cell)
    "q_doc_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |v2 AS (
        |  SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0 THEN upper(text)
        |    ELSE text END) AS fp
        |  FROM documents WHERE doc_id % 11 <> 7
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, md5('new:' || text) AS fp
        |  FROM documents WHERE doc_id % 13 = 0)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.fp IS NULL THEN 'added'
        |       WHEN v2.fp IS NULL THEN 'removed'
        |       WHEN v1.fp = v2.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  v1.fp AS fp_old, v2.fp AS fp_new
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin,

    // preference-pair replay: extremes as row_number orderings with the
    // SAME tie-breaks (score desc, id desc for chosen; asc, asc for
    // rejected), margin floor applied after the join of the two picks
    "q_doc_pref_pairs" ->
      raw"""WITH pool AS (
           |  SELECT doc_id % 97 AS prompt_id, doc_id,
           |    len(regexp_split_to_array(trim(text), '\s+')) * 1000
           |      + (length(text) % 997) AS score
           |  FROM documents),
           |r AS (SELECT *,
           |    row_number() OVER (PARTITION BY prompt_id
           |      ORDER BY score DESC, doc_id DESC) AS rc,
           |    row_number() OVER (PARTITION BY prompt_id
           |      ORDER BY score ASC, doc_id ASC) AS rr
           |  FROM pool),
           |c AS (SELECT prompt_id, doc_id AS chosen_id,
           |    score AS chosen_score FROM r WHERE rc = 1),
           |j AS (SELECT prompt_id, doc_id AS rejected_id,
           |    score AS rejected_score FROM r WHERE rr = 1)
           |SELECT c.prompt_id, c.chosen_id, c.chosen_score,
           |  j.rejected_id, j.rejected_score,
           |  c.chosen_score - j.rejected_score AS margin
           |FROM c JOIN j USING (prompt_id)
           |WHERE c.chosen_score - j.rejected_score >= 500
           |ORDER BY c.prompt_id""".stripMargin,

    // SFT render replay: same turn synthesis, segment per turn, running
    // pre-segment length window for span starts, ordered string_agg for
    // the rendered string and the span list (NULL non-assistant spans
    // skipped by string_agg)
    "q_doc_sft_render" ->
      raw"""WITH turns AS (
           |  SELECT doc_id // 4 AS conv, doc_id % 4 AS turn_idx,
           |    CASE WHEN doc_id % 4 = 0 THEN 'system'
           |         WHEN doc_id % 4 = 1 THEN 'user'
           |         ELSE 'assistant' END AS role,
           |    array_to_string(
           |      (regexp_split_to_array(trim(text), '\s+'))[1:8], ' ')
           |      AS content
           |  FROM documents),
           |seg AS (
           |  SELECT *, '<|' || role || '|>' || content || '<|end|>' AS s
           |  FROM turns),
           |sp AS (
           |  SELECT *,
           |    coalesce(sum(length(s)) OVER (PARTITION BY conv
           |      ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING
           |      AND 1 PRECEDING), 0) + length(role) + 5 AS sta
           |  FROM seg)
           |SELECT conv, CAST(count(*) AS BIGINT) AS n_turns,
           |  length(string_agg(s, '' ORDER BY turn_idx)) AS render_len,
           |  md5(string_agg(s, '' ORDER BY turn_idx)) AS render_md5,
           |  coalesce(string_agg(CASE WHEN role = 'assistant'
           |    THEN sta || ':' || (sta + length(content) - 1) END,
           |    ',' ORDER BY turn_idx), '') AS mask_spans
           |FROM sp GROUP BY conv ORDER BY conv""".stripMargin,

    "q_doc_split_overlap" ->
      s"""WITH n AS (
         |  SELECT doc_id, text,
         |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
         |  FROM documents),
         |sp AS (SELECT doc_id, text,
         |    CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id, text, ${bucketSql(100)} AS bk FROM n)),
         |sh AS (SELECT doc_id, split,
         |    CASE WHEN len(t) >= 3
         |      THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |            for i in generate_series(1, len(t) - 2)]
         |      ELSE [] END AS s
         |  FROM (SELECT doc_id, split,
         |          regexp_split_to_array(trim(lower(text)), '\\s+') AS t
         |        FROM sp)),
         |e AS (SELECT DISTINCT split, unnest(s) AS g FROM sh),
         |sizes AS (SELECT split, CAST(count(*) AS BIGINT) AS n
         |  FROM e GROUP BY split),
         |shared AS (
         |  SELECT a.split AS split_a, b.split AS split_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM e a JOIN e b ON a.g = b.g AND a.split < b.split
         |  GROUP BY 1, 2)
         |SELECT s.split_a, s.split_b, x.n AS n_a, y.n AS n_b, s.n_shared,
         |  CAST((s.n_shared * 1000000) // least(x.n, y.n) AS BIGINT)
         |    AS containment_ppm
         |FROM shared s JOIN sizes x ON x.split = s.split_a
         |JOIN sizes y ON y.split = s.split_b
         |ORDER BY split_a, split_b""".stripMargin,

    // cluster replay (recursive CTE) + the weighted-sample quality chain,
    // argmax replayed as a rank-1 window with the same (q desc, id) order
    "q_doc_dedup_survivors" ->
      s"""WITH RECURSIVE sh AS ${CorpusOps.shinglesSql},
         |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |prs AS (
         |  SELECT doc_a, doc_b FROM cand
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE)
         |    >= 0.8),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
         |  UNION SELECT doc_b, doc_a FROM prs),
         |reach(node, lab) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e2.b, r.lab FROM reach r JOIN edges e2 ON e2.a = r.node),
         |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id
         |  FROM reach GROUP BY node),
         |bq AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
         |    text
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(toks, x -> x IN ($stopList)))
         |      AS DOUBLE) / greatest(len(toks), 1) AS sraw,
         |    CAST(length(trim(text)) AS DOUBLE)
         |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS awl,
         |    least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) AS lens
         |  FROM bq),
         |qq AS (
         |  SELECT doc_id,
         |    CAST(round(round((lens
         |      + (CASE WHEN awl >= 3 AND awl <= 10 THEN 1.0 ELSE 0.25 END)
         |      + least(sraw * 5.0, 1.0)) / 3.0, 6) * 1000000) AS BIGINT)
         |      AS q_micro
         |  FROM m),
         |j AS (SELECT c.cluster_id, c.doc_id, qq.q_micro
         |  FROM comp c JOIN qq USING (doc_id)),
         |best AS (SELECT cluster_id, doc_id AS keeper_id FROM (
         |  SELECT cluster_id, doc_id,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY q_micro DESC, doc_id) AS rn FROM j) WHERE rn = 1)
         |SELECT j.cluster_id, j.doc_id, j.q_micro, best.keeper_id,
         |  j.doc_id = best.keeper_id AS keep
         |FROM j JOIN best USING (cluster_id)
         |ORDER BY j.cluster_id, j.doc_id""".stripMargin,

    // BM25 replay: identical fixed-point chain — milli length ratio,
    // milli K, ppm saturation, micro contributions — with the rounded-ln
    // idf as the single float seam (rank_search's documented caveat)
    "q_doc_bm25" ->
      raw"""WITH toks AS (
           |  SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           |  FROM toks GROUP BY doc_id),
           |tf AS (
           |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
           |  WHERE term IN ('spark', 'vector', 'stream', 'data')
           |  GROUP BY doc_id, term),
           |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df_t
           |  FROM tf GROUP BY term),
           |st AS (SELECT
           |    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS nd,
           |    (SELECT CAST(count(*) AS BIGINT) FROM toks) AS tt),
           |sc AS (
           |  SELECT tf.doc_id,
           |    CAST(round(ln((st.nd - dft.df_t + 0.5)
           |      / (dft.df_t + 0.5) + 1.0) * 1000000.0) AS BIGINT)
           |      AS idf_micro,
           |    CAST(1000 AS BIGINT) - 750
           |      + (750 * dl.dl * st.nd) // st.tt AS inner_m,
           |    tf.tf AS tf
           |  FROM tf JOIN dl USING (doc_id)
           |  JOIN dft USING (term) CROSS JOIN st),
           |c AS (
           |  SELECT doc_id,
           |    (idf_micro * ((tf * 1000 * 2200 * 1000)
           |      // (tf * 1000 + (1200 * inner_m) // 1000))) // 1000000
           |      AS c_micro
           |  FROM sc)
           |SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro,
           |  CAST(count(*) AS BIGINT) AS n_terms
           |FROM c GROUP BY doc_id
           |ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin,

    // soft-dedup replay: the survivors gate's cluster CTE chain, then
    // every document left-joined in (singleton -> own id, size 1) with
    // the integer floor-div weight
    "q_doc_dedup_weights" ->
      s"""WITH RECURSIVE sh AS ${CorpusOps.shinglesSql},
         |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |prs AS (
         |  SELECT doc_a, doc_b FROM cand
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE)
         |    >= 0.8),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
         |  UNION SELECT doc_b, doc_a FROM prs),
         |reach(node, lab) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e2.b, r.lab FROM reach r JOIN edges e2 ON e2.a = r.node),
         |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id
         |  FROM reach GROUP BY node),
         |cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM comp GROUP BY cluster_id),
         |j AS (SELECT comp.doc_id, comp.cluster_id, cs.cluster_size
         |  FROM comp JOIN cs USING (cluster_id))
         |SELECT d.doc_id,
         |  coalesce(j.cluster_id, d.doc_id) AS cluster_id,
         |  coalesce(j.cluster_size, 1) AS cluster_size,
         |  CAST(1000000 AS BIGINT) // coalesce(j.cluster_size, 1)
         |    AS weight_ppm
         |FROM documents d LEFT JOIN j ON d.doc_id = j.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // SNM-weights replay: the sorted-neighborhood rank/gap/Jaccard CTEs
    // (one global rank — DuckDB just sorts; the engine's bucket-offset
    // chain must land on identical pairs), threshold 0.8 exact-integer,
    // then the IDENTICAL component/weight chain as the LSH-fed gate
    "q_doc_snm_weights" ->
      raw"""WITH RECURSIVE n AS (SELECT doc_id,
           |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS skey
           |  FROM documents),
           |sh AS ${CorpusOps.shinglesSql},
           |sz AS (SELECT doc_id, s, len(s) AS n FROM sh),
           |r AS (SELECT doc_id,
           |    row_number() OVER (ORDER BY skey, doc_id) AS rk
           |  FROM n),
           |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 3),
           |jj AS (SELECT p.doc_a, p.doc_b,
           |    len(list_intersect(sa.s, sb.s)) AS c,
           |    sa.n AS na, sb.n AS nb
           |  FROM p JOIN sz sa ON p.doc_a = sa.doc_id
           |  JOIN sz sb ON p.doc_b = sb.doc_id),
           |prs AS (SELECT doc_a, doc_b FROM jj
           |  WHERE CAST(CASE WHEN na + nb - c = 0 THEN 1000000
           |    ELSE (c * 1000000) // (na + nb - c) END AS BIGINT)
           |    >= 800000),
           |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
           |  UNION SELECT doc_b, doc_a FROM prs),
           |reach(node, lab) AS (
           |  SELECT DISTINCT a, a FROM edges
           |  UNION
           |  SELECT e2.b, r2.lab FROM reach r2 JOIN edges e2
           |    ON e2.a = r2.node),
           |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id
           |  FROM reach GROUP BY node),
           |cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
           |    AS cluster_size
           |  FROM comp GROUP BY cluster_id),
           |j2 AS (SELECT comp.doc_id, comp.cluster_id, cs.cluster_size
           |  FROM comp JOIN cs USING (cluster_id))
           |SELECT d.doc_id,
           |  coalesce(j2.cluster_id, d.doc_id) AS cluster_id,
           |  coalesce(j2.cluster_size, 1) AS cluster_size,
           |  CAST(1000000 AS BIGINT) // coalesce(j2.cluster_size, 1)
           |    AS weight_ppm
           |FROM documents d LEFT JOIN j2 ON d.doc_id = j2.doc_id
           |ORDER BY d.doc_id""".stripMargin,

    "q_doc_exact_split" ->
      raw"""WITH n AS (SELECT source, doc_id,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
           |  FROM documents),
           |b AS (SELECT source, doc_id,
           |    ('0x' || substr(h, 1, 8))::BIGINT AS h32 FROM n),
           |r AS (SELECT source, doc_id,
           |    CAST(row_number() OVER (PARTITION BY source
           |      ORDER BY h32, doc_id) AS BIGINT) AS rn,
           |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS nn
           |  FROM b),
           |s AS (SELECT source, doc_id,
           |    CASE WHEN rn * 100 <= nn * 80 THEN 'train'
           |         WHEN rn * 100 <= nn * 90 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM r)
           |SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id
           |FROM s GROUP BY source, split
           |ORDER BY source, split""".stripMargin,

    "q_doc_token_budget" ->
      raw"""WITH n AS (SELECT source, doc_id,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           |      AS n_tokens,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
           |  FROM documents),
           |b AS (SELECT source, doc_id, n_tokens,
           |    ('0x' || substr(h, 1, 8))::BIGINT AS h32 FROM n),
           |c AS (SELECT source, doc_id, n_tokens,
           |    CAST(sum(n_tokens) OVER (PARTITION BY source
           |      ORDER BY h32, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS cum_tokens
           |  FROM b)
           |SELECT source, doc_id, n_tokens, cum_tokens FROM c
           |WHERE cum_tokens <= 600
           |ORDER BY source, cum_tokens""".stripMargin,

    // token-mixture replay: token sums, min-feasible total, floor budgets,
    // per-stratum cumsum cut — same IEEE division chain as q_doc_mixture
    "q_doc_token_mixture" ->
      raw"""WITH w(stratum, wt) AS (VALUES
           |  ('en', 0.4::DOUBLE), ('de', 0.2::DOUBLE),
           |  ('fr', 0.2::DOUBLE), ('es', 0.2::DOUBLE)),
           |n AS (SELECT doc_id, lang,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           |      AS n_tokens,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
           |  FROM documents),
           |c AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tok
           |  FROM n GROUP BY lang),
           |cw AS (SELECT lang, tok, wt FROM c JOIN w ON lang = stratum),
           |t AS (SELECT min(tok / wt) AS tt FROM cw),
           |b AS (SELECT lang, CAST(floor(wt * tt) AS BIGINT) AS bud
           |  FROM cw CROSS JOIN t),
           |r AS (SELECT n.doc_id, n.lang, n.n_tokens, b.bud,
           |    ('0x' || substr(n.h, 1, 8))::BIGINT AS h32
           |  FROM n JOIN b ON n.lang = b.lang),
           |cum AS (SELECT doc_id, lang, n_tokens, bud,
           |    CAST(sum(n_tokens) OVER (PARTITION BY lang
           |      ORDER BY h32, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS cum_tokens
           |  FROM r)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id
           |FROM cum WHERE cum_tokens <= bud
           |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_doc_group_sample" ->
      raw"""WITH n AS (SELECT doc_id, lang,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
           |  FROM documents),
           |b AS (SELECT doc_id, lang,
           |    ('0x' || substr(h, 1, 8))::BIGINT AS h32 FROM n),
           |r AS (SELECT lang, doc_id,
           |    CAST(row_number() OVER (PARTITION BY lang
           |      ORDER BY h32, doc_id) AS INT) AS rank
           |  FROM b)
           |SELECT lang, rank, doc_id FROM r WHERE rank <= 5
           |ORDER BY lang, rank""".stripMargin,

    "q_sample_negatives" ->
      """WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |h AS (
        |  SELECT doc_id AS anchor_id, CAST(g.slot AS INT) AS slot,
        |    ('0x' || substr(md5(doc_id::VARCHAR || '|' || g.slot::VARCHAR),
        |      1, 8))::BIGINT % n_docs AS h,
        |    n_docs
        |  FROM documents CROSS JOIN generate_series(0, 3) AS g(slot)
        |  CROSS JOIN n)
        |SELECT anchor_id, slot,
        |  CASE WHEN h = anchor_id THEN (h + 1) % n_docs ELSE h END AS neg_id
        |FROM h ORDER BY anchor_id, slot""".stripMargin,

    "q_emb_pq" -> pqSql(2, 64, 8, 2),

    "q_emb_pq_error" -> pqErrorSql(2, 64, 8, 2),

    "q_emb_pq_search" -> pqSearchSql(2, 64, 8, 2, nQueries = 3, topK = 5),

    // micro-unit replay: identical (tf · ln(nd/df)) · 1e6 rounding and
    // BIGINT sum — double-sum re-association can't flip ranks
    "q_doc_rank_search" ->
      raw"""WITH toks AS (
           |  SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |tf AS (
           |  SELECT doc_id, term, count(*) AS tf FROM toks
           |  WHERE term IN ('spark', 'vector', 'stream')
           |  GROUP BY doc_id, term),
           |dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
           |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
           |s AS (
           |  SELECT tf.doc_id,
           |    sum(CAST(round((tf.tf * ln(nd.nd / dft.df_t)) * 1000000.0)
           |      AS BIGINT)) AS sm,
           |    CAST(count(*) AS BIGINT) AS n_terms
           |  FROM tf JOIN dft USING (term) CROSS JOIN nd
           |  GROUP BY tf.doc_id)
           |SELECT doc_id, CAST(sm AS DOUBLE) / 1000000.0 AS score, n_terms
           |FROM s ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "q_doc_search" -> matchAllSql,

    // identical result contract: the index is a layout, not a semantic —
    // serving from tb= partitions must return exactly the direct scan
    "q_doc_search_serve" -> matchAllSql,

    // chunk-store BUILD contract: replay the boundary chunking, dedup
    // chunks by content, and re-derive the store's bucket assignment
    // (hashBucket of the md5-hex fp) — per-bucket counts and payload
    // bytes must match the written layout exactly
    "q_doc_chunk_build" -> {
      val poly = (0 until 8).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
        val pos = if (j == 0) "i - 7" else s"i - 7 + $j"
        s"(($acc * 131 + ascii(substr(nm, $pos, 1))) % 2147483647)"
      }
      raw"""WITH nmt AS (SELECT doc_id,
           |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nm
           |  FROM documents),
           |b AS (SELECT doc_id, nm,
           |    [i for i in generate_series(8, length(nm))
           |     if $poly % 64 = 0] AS bounds
           |  FROM nmt),
           |b2 AS (SELECT doc_id, nm,
           |    CASE WHEN len(bounds) > 0 AND bounds[-1] = length(nm)
           |      THEN bounds ELSE list_append(bounds, length(nm)) END AS bb
           |  FROM b),
           |ch AS (SELECT doc_id,
           |    [nm[CASE WHEN i = 1 THEN 1 ELSE bb[i - 1] + 1 END : bb[i]]
           |     for i in generate_series(1, len(bb))] AS chunks
           |  FROM b2),
           |d AS (SELECT DISTINCT unnest(chunks) AS chunk FROM ch
           |  WHERE len(chunks) > 0),
           |cbk AS (SELECT chunk,
           |    CAST(('0x' || substr(md5(md5(chunk)), 1, 4))::BIGINT % 16
           |      AS INT) AS cb
           |  FROM d WHERE length(chunk) > 0)
           |SELECT cb, CAST(count(*) AS BIGINT) AS n_chunks,
           |  CAST(sum(length(chunk)) AS BIGINT) AS total_len
           |FROM cbk GROUP BY cb ORDER BY cb""".stripMargin
    },

    // chunk-store round-trip contract: the reconstruction must hash to
    // md5 of the DIRECTLY-normalized text (identity proof), with the
    // chunk count from the polynomial boundary replay
    "q_doc_chunk_serve" -> {
      val poly = (0 until 8).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
        val pos = if (j == 0) "i - 7" else s"i - 7 + $j"
        s"(($acc * 131 + ascii(substr(nm, $pos, 1))) % 2147483647)"
      }
      raw"""WITH nmt AS (SELECT doc_id,
           |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nm
           |  FROM documents),
           |b AS (SELECT doc_id, nm,
           |    [i for i in generate_series(8, length(nm))
           |     if $poly % 64 = 0] AS bounds
           |  FROM nmt),
           |b2 AS (SELECT doc_id, nm,
           |    CASE WHEN len(bounds) > 0 AND bounds[-1] = length(nm)
           |      THEN bounds ELSE list_append(bounds, length(nm)) END AS bb
           |  FROM b)
           |SELECT doc_id, CAST(len(bb) AS BIGINT) AS n_chunks,
           |  md5(nm) AS text_fp
           |FROM b2 ORDER BY doc_id""".stripMargin
    },

    "q_doc_weighted_sample" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang,
         |    regexp_split_to_array(trim(text), '\\s+') AS toks, text,
         |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang, ${bucketSql(100)} AS bk,
         |    CAST(len(list_filter(toks,
         |      x -> x IN (${TextOps.EnStopwords.map(w => s"'$w'").mkString(", ")})))
         |      AS DOUBLE) / greatest(len(toks), 1) AS sraw,
         |    CAST(length(trim(text)) AS DOUBLE)
         |      / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS awl,
         |    least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) AS lens
         |  FROM b),
         |q AS (
         |  SELECT doc_id, lang, bk,
         |    round((lens
         |      + (CASE WHEN awl >= 3 AND awl <= 10 THEN 1.0 ELSE 0.25 END)
         |      + least(sraw * 5.0, 1.0)) / 3.0, 6) AS quality
         |  FROM m)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM q WHERE CAST(bk AS DOUBLE) < quality * 100
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_doc_incremental_dedup" ->
      s"""WITH sh AS ${CorpusOps.shinglesSql},
         |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         |cand AS (
         |  SELECT a.doc_id AS new_id, b.doc_id AS old_id, count(*) AS common
         |  FROM e a JOIN e b ON a.g = b.g
         |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |  GROUP BY 1, 2)
         |SELECT new_id, old_id,
         |  round(CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE), 6)
         |    AS jaccard
         |FROM cand
         |JOIN sizes sa ON new_id = sa.doc_id
         |JOIN sizes sb ON old_id = sb.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, old_id""".stripMargin,

    "q_doc_decontaminate" -> decontaminateSql,

    // same oracle on purpose: the bloom pre-filter is invisible in the
    // output (exact verification removes every false positive), so the
    // web-scale path must reproduce the exact scan bit-for-bit
    "q_doc_bloom_decontaminate" -> decontaminateSql,


    // identity-style oracle for the zlib seam: orig_bytes is the exact
    // closed-form payload length per residue class (all-ASCII payloads,
    // so chars = UTF-8 bytes), and the band restates each class's
    // wide-margin deflate behavior (run ≈2-3% < 10%; 16-block sha-hex
    // noise 52-55% ≥ 40%; half/half ≈27% in [10%, 40%)) — zlib itself is
    // not replayed, its determinism is pinned by the classification
    "q_doc_compress_ratio" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1000 + doc_id % 100
        |            WHEN doc_id % 3 = 1 THEN 1024
        |            ELSE 2048 END AS BIGINT) AS orig_bytes,
        |  CASE WHEN doc_id % 3 = 0 THEN 'low'
        |       WHEN doc_id % 3 = 1 THEN 'high'
        |       ELSE 'mid' END AS band
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_doc_repetition" ->
      raw"""WITH t AS (
           |  SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
           |a AS (SELECT doc_id,
           |    CAST(sum(tf) AS BIGINT) AS n_tokens,
           |    CAST(count(*) AS BIGINT) AS n_distinct,
           |    CAST(max(tf) AS BIGINT) AS max_tf
           |  FROM tf GROUP BY doc_id)
           |SELECT doc_id, n_tokens, n_distinct, max_tf,
           |  1.0 - (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE))
           |    AS dup_ratio,
           |  CAST(max_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_ratio
           |FROM a ORDER BY doc_id""".stripMargin,

    "q_doc_char_ngrams" ->
      """WITH g AS (
        |  SELECT doc_id, substr(text, CAST(i AS INT), 3) AS g
        |  FROM documents, LATERAL (
        |    SELECT unnest(generate_series(1, length(text) - 2)) AS i)
        |  WHERE length(text) >= 3),
        |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  CAST(max(c) AS BIGINT) AS top_cnt,
        |  CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS top_ppm
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // canonicalization replay: the generic rule pipeline over the same
    // synthesized messy URLs — every byte of url/canon/domain compared
    "q_doc_url_canon" ->
      s"""WITH $urlCanonCtes
         |SELECT doc_id, url, canon, domain FROM dom
         |ORDER BY doc_id""".stripMargin,

    // PSL replay: the generic longest-match (suffix/wildcard/exception)
    // over an inline rules table — exception prevails, else longest
    // match, else the implicit `*` rule; registrable = prevailing public
    // suffix + one label; pass-through when the host IS a public suffix
    "q_doc_psl_domain" ->
      """WITH h AS (SELECT doc_id,
        |    CASE doc_id % 12
        |      WHEN 0 THEN 'sub.example.gouv.fr'
        |      WHEN 1 THEN 'a.b.shop.com.br'
        |      WHEN 2 THEN 'user' || (doc_id % 5) || '.github.io'
        |      WHEN 3 THEN 'deep.x.news.co.uk'
        |      WHEN 4 THEN 'co.uk'
        |      WHEN 5 THEN 'foo.bar.ck'
        |      WHEN 6 THEN 'sub.www.ck'
        |      WHEN 7 THEN 'localhost'
        |      WHEN 8 THEN 'cdn.media.example' || (doc_id % 3) || '.zz'
        |      WHEN 9 THEN 'a.shi.xn--55qx5d.cn'
        |      WHEN 10 THEN 'x.y.pref.kobe.jp'
        |      ELSE 'blog.city.kobe.jp' END AS host
        |  FROM documents),
        |r(rule) AS (VALUES ('co.uk'), ('gouv.fr'), ('com.br'),
        |  ('github.io'), ('*.ck'), ('!www.ck'), ('*.kobe.jp'),
        |  ('!city.kobe.jp'), ('xn--55qx5d.cn'), ('or.jp'), ('com.au')),
        |ls AS (SELECT doc_id, host, string_split(host, '.') AS l FROM h),
        |ix AS (SELECT doc_id, host, l,
        |    unnest(generate_series(1, len(l))) AS i FROM ls),
        |sf AS (SELECT doc_id, host, len(l) AS n, i,
        |    array_to_string(l[len(l)-i+1:len(l)], '.') AS sfx,
        |    CASE WHEN i >= 2
        |      THEN array_to_string(l[len(l)-i+2:len(l)], '.') END AS psfx
        |  FROM ix),
        |mt AS (SELECT doc_id, host, n, i, sfx,
        |    EXISTS(SELECT 1 FROM r WHERE r.rule = sf.sfx
        |      OR (sf.psfx IS NOT NULL AND r.rule = '*.' || sf.psfx))
        |      AS is_m,
        |    EXISTS(SELECT 1 FROM r WHERE r.rule = '!' || sf.sfx) AS is_exc
        |  FROM sf),
        |ag AS (SELECT doc_id, host, max(n) AS n,
        |    coalesce(max(CASE WHEN is_m THEN i END), 1) AS mlen,
        |    max(CASE WHEN is_exc THEN i END) AS elen
        |  FROM mt GROUP BY doc_id, host)
        |SELECT a.doc_id, a.host,
        |  CASE WHEN a.elen IS NOT NULL THEN se.sfx
        |       WHEN a.n > a.mlen THEN sm.sfx
        |       ELSE a.host END AS domain
        |FROM ag a
        |LEFT JOIN sf se ON se.doc_id = a.doc_id AND se.i = a.elen
        |LEFT JOIN sf sm ON sm.doc_id = a.doc_id AND sm.i = a.mlen + 1
        |ORDER BY a.doc_id""".stripMargin,

    // full-table PSL replay: the SAME generic longest-match algorithm,
    // rules inline = every vendored rule that is suffix-relevant to the
    // synthesized hosts (incl. the third-level k12.tx.us, the nagoya
    // wildcard/exception family, and the PRIVATE blogspot.com.br rule)
    "q_doc_psl_full" ->
      """WITH h AS (SELECT doc_id,
        |    CASE doc_id % 14
        |      WHEN 0 THEN 'sub.example.gouv.fr'
        |      WHEN 1 THEN 'a.b.shop.blogspot.com.br'
        |      WHEN 2 THEN 'user' || (doc_id % 5) || '.github.io'
        |      WHEN 3 THEN 'deep.y.k12.tx.us'
        |      WHEN 4 THEN 'foo.bar.ck'
        |      WHEN 5 THEN 'sub.www.ck'
        |      WHEN 6 THEN 'a.blog.nagoya.jp'
        |      WHEN 7 THEN 'x.city.nagoya.jp'
        |      WHEN 8 THEN 'ministry.gub.uy'
        |      WHEN 9 THEN 'shop.co.ke'
        |      WHEN 10 THEN 'a.shi.xn--55qx5d.cn'
        |      WHEN 11 THEN 'cdn.example' || (doc_id % 3) || '.zz'
        |      WHEN 12 THEN 'mysite.streamlit.app'
        |      ELSE 'x.firm.com.ng' END AS host
        |  FROM documents),
        |r(rule) AS (VALUES ('gouv.fr'), ('com.br'), ('blogspot.com.br'),
        |  ('github.io'), ('tx.us'), ('k12.tx.us'), ('*.ck'), ('!www.ck'),
        |  ('*.nagoya.jp'), ('!city.nagoya.jp'), ('gub.uy'), ('co.ke'),
        |  ('xn--55qx5d.cn'), ('streamlit.app'), ('com.ng')),
        |ls AS (SELECT doc_id, host, string_split(host, '.') AS l FROM h),
        |ix AS (SELECT doc_id, host, l,
        |    unnest(generate_series(1, len(l))) AS i FROM ls),
        |sf AS (SELECT doc_id, host, len(l) AS n, i,
        |    array_to_string(l[len(l)-i+1:len(l)], '.') AS sfx,
        |    CASE WHEN i >= 2
        |      THEN array_to_string(l[len(l)-i+2:len(l)], '.') END AS psfx
        |  FROM ix),
        |mt AS (SELECT doc_id, host, n, i, sfx,
        |    EXISTS(SELECT 1 FROM r WHERE r.rule = sf.sfx
        |      OR (sf.psfx IS NOT NULL AND r.rule = '*.' || sf.psfx))
        |      AS is_m,
        |    EXISTS(SELECT 1 FROM r WHERE r.rule = '!' || sf.sfx) AS is_exc
        |  FROM sf),
        |ag AS (SELECT doc_id, host, max(n) AS n,
        |    coalesce(max(CASE WHEN is_m THEN i END), 1) AS mlen,
        |    max(CASE WHEN is_exc THEN i END) AS elen
        |  FROM mt GROUP BY doc_id, host)
        |SELECT a.doc_id, a.host,
        |  CASE WHEN a.elen IS NOT NULL THEN se.sfx
        |       WHEN a.n > a.mlen THEN sm.sfx
        |       ELSE a.host END AS domain
        |FROM ag a
        |LEFT JOIN sf se ON se.doc_id = a.doc_id AND se.i = a.elen
        |LEFT JOIN sf sm ON sm.doc_id = a.doc_id AND sm.i = a.mlen + 1
        |ORDER BY a.doc_id""".stripMargin,

    "q_doc_host_dedup" ->
      s"""WITH $urlCanonCtes,
         |f AS (SELECT doc_id, canon, domain,
         |    md5(CAST(doc_id % 50 AS VARCHAR)) AS fp
         |  FROM dom)
         |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
         |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canon,
         |  CAST(count(DISTINCT fp) AS BIGINT) AS n_content,
         |  CAST((count(*) - count(DISTINCT fp)) * 1000000 // count(*)
         |    AS BIGINT) AS dup_ppm
         |FROM f GROUP BY domain ORDER BY domain""".stripMargin,

    // domain-boilerplate replay: same canon/domain chain, same line
    // synthesis, (domain, segment) distinct-doc counts, integer-ppm share
    "q_doc_domain_boilerplate" ->
      s"""WITH $urlCanonCtes,
         |tk AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS t
         |  FROM documents),
         |ln AS (SELECT tk.doc_id,
         |    array_to_string(t[1:9], ' ') || chr(10) ||
         |    'footer notice number ' || (tk.doc_id % 2) || '.' ||
         |    CASE WHEN tk.doc_id % 10 < 5
         |      THEN chr(10) || 'promo banner text today' ELSE '' END
         |      AS txt
         |  FROM tk),
         |base AS (SELECT dom.domain, ln.doc_id, ln.txt
         |  FROM ln JOIN dom ON ln.doc_id = dom.doc_id),
         |dd AS (SELECT domain, count(DISTINCT doc_id) AS domain_docs
         |  FROM base GROUP BY domain),
         |seg0 AS (SELECT domain, doc_id,
         |    unnest(string_split(txt, chr(10))) AS sr
         |  FROM base),
         |segn AS (SELECT domain, doc_id,
         |    lower(trim(regexp_replace(sr, '\\s+', ' ', 'g'))) AS seg
         |  FROM seg0),
         |segf AS (SELECT * FROM segn
         |  WHERE len(string_split(seg, ' ')) >= 3),
         |bp AS (SELECT domain, seg, count(DISTINCT doc_id) AS n_docs
         |  FROM segf GROUP BY 1, 2)
         |SELECT bp.domain, md5(seg) AS seg_fp, seg,
         |  CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(domain_docs AS BIGINT) AS domain_docs,
         |  CAST(n_docs * 1000000 // domain_docs AS BIGINT) AS share_ppm
         |FROM bp JOIN dd ON bp.domain = dd.domain
         |WHERE domain_docs >= 2
         |  AND n_docs * 1000000 // domain_docs >= 400000
         |ORDER BY bp.domain, seg_fp""".stripMargin,

    // domain-clean replay: the boilerplate chain feeding a left join —
    // lines whose normalized form is their domain's template drop,
    // survivors stitch in position order
    "q_doc_domain_clean" ->
      s"""WITH $urlCanonCtes,
         |tk AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS t
         |  FROM documents),
         |ln AS (SELECT tk.doc_id,
         |    array_to_string(t[1:9], ' ') || chr(10) ||
         |    'footer notice number ' || (tk.doc_id % 2) || '.' ||
         |    CASE WHEN tk.doc_id % 10 < 5
         |      THEN chr(10) || 'promo banner text today' ELSE '' END
         |      AS txt
         |  FROM tk),
         |base AS (SELECT dom.domain, ln.doc_id, ln.txt
         |  FROM ln JOIN dom ON ln.doc_id = dom.doc_id),
         |dd AS (SELECT domain, count(DISTINCT doc_id) AS domain_docs
         |  FROM base GROUP BY domain),
         |lines AS (SELECT domain, doc_id,
         |    unnest(string_split(txt, chr(10))) AS sr,
         |    generate_subscripts(string_split(txt, chr(10)), 1) AS pos
         |  FROM base),
         |norm AS (SELECT domain, doc_id, pos, sr,
         |    lower(trim(regexp_replace(sr, '\\s+', ' ', 'g'))) AS segn
         |  FROM lines),
         |segf AS (SELECT domain, doc_id, segn FROM norm
         |  WHERE len(string_split(segn, ' ')) >= 3),
         |bp AS (SELECT domain, segn AS seg, count(DISTINCT doc_id)
         |    AS n_docs
         |  FROM segf GROUP BY 1, 2),
         |tpl AS (SELECT bp.domain, seg FROM bp
         |  JOIN dd ON bp.domain = dd.domain
         |  WHERE domain_docs >= 2
         |    AND n_docs * 1000000 // domain_docs >= 400000),
         |keep AS (SELECT n.domain, n.doc_id, n.pos, n.sr,
         |    (t.seg IS NULL) AS k
         |  FROM norm n LEFT JOIN tpl t
         |    ON t.domain = n.domain AND t.seg = n.segn),
         |agg AS (SELECT doc_id, any_value(domain) AS domain,
         |    count(*) AS n_segs,
         |    count(*) FILTER (WHERE k) AS n_kept,
         |    coalesce(string_agg(sr, chr(10) ORDER BY pos)
         |      FILTER (WHERE k), '') AS clean
         |  FROM keep GROUP BY doc_id),
         |orig AS (SELECT doc_id, length(txt) AS orig_len FROM base)
         |SELECT agg.doc_id, domain, CAST(n_segs AS INT) AS n_segs,
         |  CAST(n_kept AS INT) AS n_kept,
         |  CAST(n_segs - n_kept AS INT) AS n_removed,
         |  CAST(orig_len AS INT) AS orig_len,
         |  CAST(length(clean) AS INT) AS clean_len,
         |  md5(clean) AS clean_fp
         |FROM agg JOIN orig ON agg.doc_id = orig.doc_id
         |ORDER BY agg.doc_id""".stripMargin,

    // segment near-dup replay: distinct normalized segments of the
    // synthesized two-line docs, brute-force all-pairs simhash (the
    // CorpusOps nib/sum/band mirror re-keyed on segment fp)
    "q_doc_seg_neardup" -> segNearDupSql,

    // domain-cap replay: same canon + registered-domain chain, same
    // md5-of-normalized-text rank with doc_id tiebreak, same k=10 cut
    "q_doc_domain_cap" ->
      s"""WITH $urlCanonCtes,
         |r AS (SELECT d.doc_id, dom.domain,
         |    row_number() OVER (PARTITION BY dom.domain
         |      ORDER BY md5(lower(trim(regexp_replace(d.text,
         |        '\\s+', ' ', 'g')))), d.doc_id) AS domain_rank
         |  FROM documents d JOIN dom ON d.doc_id = dom.doc_id)
         |SELECT doc_id, domain, CAST(domain_rank AS INT) AS domain_rank
         |FROM r WHERE domain_rank <= 10 ORDER BY doc_id""".stripMargin,

    // first-occurrence line dedup replay: same synthesized a/b/a/c/b/a
    // line pattern, keep rows whose position equals their line's first
    // position, stitch in order — byte-identical md5
    "q_doc_selfrep_dedup" ->
      raw"""WITH tk AS (
           |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           |  FROM documents),
           |abc AS (
           |  SELECT doc_id,
           |    array_to_string(t[1:3], ' ') AS a,
           |    array_to_string(t[4:6], ' ') AS b,
           |    array_to_string(t[7:9], ' ') AS c
           |  FROM tk),
           |d AS (
           |  SELECT doc_id,
           |    CASE CAST(doc_id % 3 AS INT)
           |      WHEN 0 THEN [a, b, a, c, b, a]
           |      WHEN 1 THEN [a, b, c]
           |      ELSE [a, a, b, a, c] END AS lines
           |  FROM abc),
           |l AS (
           |  SELECT doc_id, unnest(lines) AS seg,
           |    generate_subscripts(lines, 1) AS i
           |  FROM d),
           |fo AS (
           |  SELECT doc_id, seg, i,
           |    min(i) OVER (PARTITION BY doc_id, seg) AS fi
           |  FROM l),
           |cl AS (
           |  SELECT doc_id,
           |    string_agg(seg, chr(10) ORDER BY i)
           |      FILTER (WHERE i = fi) AS clean,
           |    CAST(count(*) AS INT) AS n_segs,
           |    CAST(count(*) FILTER (WHERE i = fi) AS INT) AS n_uniq
           |  FROM fo GROUP BY doc_id),
           |orig AS (
           |  SELECT doc_id,
           |    CAST(length(array_to_string(lines, chr(10))) AS INT)
           |      AS orig_len
           |  FROM d)
           |SELECT cl.doc_id, cl.n_segs, cl.n_uniq,
           |  cl.n_segs - cl.n_uniq AS n_dup_segs, orig.orig_len,
           |  CAST(length(cl.clean) AS INT) AS clean_len,
           |  orig.orig_len - CAST(length(cl.clean) AS INT) AS removed_chars,
           |  md5(cl.clean) AS clean_fp
           |FROM cl JOIN orig USING (doc_id)
           |ORDER BY cl.doc_id""".stripMargin,

    // C4 line-filter replay: same synthesized lines, generic keep rule
    // (terminal punct regex + word count + marker containment) per line
    "q_doc_line_filter" ->
      raw"""WITH tk AS (
           |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           |  FROM documents),
           |seg AS (
           |  SELECT doc_id,
           |    array_to_string(t[1:3], ' ') AS a,
           |    array_to_string(t[4:6], ' ') AS b,
           |    array_to_string(t[7:9], ' ') AS c
           |  FROM tk),
           |d AS (
           |  SELECT doc_id,
           |    CASE CAST(doc_id % 4 AS INT)
           |      WHEN 0 THEN [a || '.', c, 'see ' || b || '?']
           |      WHEN 1 THEN [a || '.', 'ok.',
           |                   'enable javascript ' || a || '.',
           |                   'see ' || b || '?', c]
           |      WHEN 2 THEN ['see ' || b || '?']
           |      ELSE [a || '.', 'see ' || b || '?', '{ code }'] END AS base
           |  FROM seg),
           |d2 AS (
           |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
           |      THEN list_append(base, 'filler lorem ipsum text.')
           |      ELSE base END AS lines
           |  FROM d),
           |x AS (
           |  SELECT doc_id, lines, array_to_string(lines, chr(10)) AS text,
           |    list_filter(lines, l ->
           |      regexp_matches(l, '[.!?"]\s*$$') AND trim(l) <> ''
           |      AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
           |      AND NOT contains(lower(l), 'javascript')
           |      AND NOT contains(lower(l), 'lorem ipsum')
           |      AND NOT contains(lower(l), 'cookie')) AS kept
           |  FROM d2)
           |SELECT doc_id, CAST(len(lines) AS INT) AS n_lines,
           |  CAST(len(kept) AS INT) AS n_kept,
           |  CAST(length(text) AS INT) AS orig_len,
           |  CAST(length(array_to_string(kept, chr(10))) AS INT) AS clean_len,
           |  contains(text, '{') AS has_brace,
           |  contains(lower(text), 'lorem ipsum') AS has_lorem,
           |  (NOT contains(text, '{') AND NOT contains(lower(text),
           |    'lorem ipsum') AND len(kept) >= 2) AS doc_ok,
           |  md5(array_to_string(kept, chr(10))) AS clean_fp
           |FROM x ORDER BY doc_id""".stripMargin,

    // HTML-strip replay: same synthesized markup, generic rule chain —
    // script/style/comment blocks out, block closers → newline, tags →
    // space, entity decode (&amp; last), whitespace normalization
    "q_doc_html_strip" ->
      raw"""WITH tk AS (
           |  SELECT doc_id, text,
           |    regexp_split_to_array(trim(text), '\s+') AS t
           |  FROM documents),
           |seg AS (
           |  SELECT doc_id, text,
           |    array_to_string(t[1:3], ' ') AS a,
           |    array_to_string(t[4:6], ' ') AS b,
           |    array_to_string(t[7:9], ' ') AS c
           |  FROM tk),
           |h AS (
           |  SELECT doc_id,
           |    CASE CAST(doc_id % 4 AS INT)
           |      WHEN 0 THEN '<html><head><title>t</title>' ||
           |        '<script type="text/javascript">var x = 1 < 2;</script>' ||
           |        '<style>.c{color:red}</style></head><body><p>' ||
           |        a || '.</p><p>' || b || ' &amp; ' || c ||
           |        '</p></body></html>'
           |      WHEN 1 THEN a || ' &lt;b&gt; &quot;' || b ||
           |        '&quot; &#39;' || c || '&#39; x&nbsp;y'
           |      WHEN 2 THEN '<!-- hidden ' || a || ' --><div>' || b ||
           |        '<br>' || c || '</div><ul><li>' || a || '</li></ul>'
           |      ELSE text END AS html
           |  FROM seg),
           |$htmlStripChainSql
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS INT)
           |    AS n_tags,
           |  CAST(len(regexp_extract_all(html,
           |    '&(lt|gt|quot|amp|nbsp|apos|#39);')) AS INT) AS n_ents,
           |  CAST(length(html) AS INT) AS orig_len,
           |  CAST(length(clean) AS INT) AS clean_len,
           |  md5(clean) AS clean_fp
           |FROM w ORDER BY doc_id""".stripMargin,

    // WARC→WET replay: fixture synthesis, the generic WARC/HTTP parse
    // (record split, Content-Length slice, body after the blank line),
    // then the SAME strip-chain CTEs as q_doc_html_strip — one rewrite
    // definition serves both gates
    "q_doc_warc_wet" -> {
      val cr = "chr(13) || chr(10)"
      raw"""WITH tk AS (SELECT doc_id,
           |    regexp_split_to_array(trim(text), '\s+') AS t
           |  FROM documents),
           |bb AS (SELECT doc_id,
           |    '<html><head><script>var a=1;</script></head><body><p>' ||
           |      array_to_string(t[1:4], ' ') || ' &amp; ' ||
           |      array_to_string(t[5:8], ' ') || '</p><br>' ||
           |      array_to_string(t[9:12], ' ') || '</body></html>'
           |      AS body,
           |    'https://example' || (doc_id % 5) || '.com/page/' ||
           |      doc_id AS uri
           |  FROM tk),
           |pl AS (SELECT doc_id, uri,
           |    'HTTP/1.1 200 OK' || $cr || 'Content-Type: text/html' ||
           |      $cr || $cr || body AS resppl
           |  FROM bb),
           |wr AS (SELECT doc_id,
           |    'WARC/1.0' || $cr || 'WARC-Type: response' || $cr ||
           |      'WARC-Target-URI: ' || uri || $cr ||
           |      'Content-Length: ' || octet_length(encode(resppl)) ||
           |      $cr || $cr || resppl || $cr || $cr AS warc
           |  FROM pl),
           |rl AS (SELECT doc_id, warc,
           |    split_part(warc, $cr || $cr, 1) AS h1
           |  FROM wr),
           |pp AS (SELECT doc_id,
           |    decode(from_hex(substr(hex(encode(warc)),
           |      (octet_length(encode(h1)) + 4) * 2 + 1,
           |      CAST(regexp_extract(h1, 'Content-Length: (\d+)', 1)
           |        AS BIGINT) * 2))) AS payload
           |  FROM rl),
           |h AS (SELECT doc_id,
           |    substr(payload, strpos(payload, $cr || $cr) + 4) AS html
           |  FROM pp),
           |$htmlStripChainSql
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS INT)
           |    AS n_tags,
           |  CAST(length(clean) AS INT) AS clean_len,
           |  md5(clean) AS clean_fp
           |FROM w ORDER BY doc_id""".stripMargin
    },

    // encoding-noise replay: same synthesized damage (chr() codepoints),
    // same \x{...} codepoint-class patterns — the syntax Java regex and
    // RE2 share — and exact integer-division ppm
    "q_doc_mojibake" ->
      raw"""WITH n AS (
           |  SELECT doc_id,
           |    CASE CAST(doc_id % 4 AS INT)
           |      WHEN 1 THEN text || ' ' || chr(195) || chr(169) ||
           |        chr(194) || chr(183) || chr(226) || chr(8364) ||
           |        chr(8217) || 'x'
           |      WHEN 2 THEN text || chr(65533) || chr(65533)
           |      WHEN 3 THEN text || chr(7) || chr(1) || 'end'
           |      ELSE text END AS t
           |  FROM documents),
           |c AS (
           |  SELECT doc_id,
           |    CAST(length(t) AS BIGINT) AS n_chars,
           |    CAST(len(regexp_extract_all(t,
           |      '[^\x{0000}-\x{007F}]')) AS BIGINT) AS n_nonascii,
           |    CAST(len(regexp_extract_all(t,
           |      '\x{FFFD}')) AS BIGINT) AS n_repl,
           |    CAST(len(regexp_extract_all(t,
           |      '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}]'
           |      )) AS BIGINT) AS n_ctrl,
           |    CAST(len(regexp_extract_all(t,
           |      '[\x{00C2}\x{00C3}][\x{0080}-\x{00BF}]|\x{00E2}\x{20AC}'
           |      )) AS BIGINT) AS n_moji
           |  FROM n)
           |SELECT doc_id, n_chars, n_nonascii, n_repl, n_ctrl, n_moji,
           |  CAST((n_repl + n_ctrl + n_moji) * 1000000
           |    // greatest(n_chars, 1) AS BIGINT) AS noise_ppm
           |FROM c ORDER BY doc_id""".stripMargin,

    // readability replay: same synthesized sentence structures, same
    // terminal-run/vowel-run counts and explicit integer-div milli terms
    "q_doc_readability" ->
      raw"""WITH tk AS (
           |  SELECT doc_id, text,
           |    regexp_split_to_array(trim(text), '\s+') AS t
           |  FROM documents),
           |abc AS (SELECT doc_id, text,
           |    array_to_string(t[1:3], ' ') AS a,
           |    array_to_string(t[4:6], ' ') AS b,
           |    array_to_string(t[7:9], ' ') AS c
           |  FROM tk),
           |d AS (SELECT doc_id,
           |    CASE CAST(doc_id % 4 AS INT)
           |      WHEN 0 THEN a || '. ' || b || '. ' || c || '.'
           |      WHEN 1 THEN a || ' ' || b || ' ' || c || '.'
           |      WHEN 2 THEN a || '?! ' || b || '... ' || c || '!'
           |      ELSE text END AS tx
           |  FROM abc),
           |m AS (SELECT doc_id,
           |    CAST(greatest(len(regexp_extract_all(tx, '[.!?]+')), 1)
           |      AS BIGINT) AS n_sents,
           |    CAST(CASE WHEN trim(tx) = '' THEN 0
           |      ELSE len(regexp_split_to_array(trim(tx), '\s+')) END
           |      AS BIGINT) AS n_words,
           |    CAST(len(regexp_extract_all(lower(tx), '[aeiouy]+'))
           |      AS BIGINT) AS n_syll
           |  FROM d)
           |SELECT doc_id, n_sents, n_words, n_syll,
           |  CAST(n_words * 1000 // n_sents AS BIGINT) AS wps_milli,
           |  CAST(CASE WHEN n_words > 0 THEN n_syll * 1000 // n_words
           |    ELSE 0 END AS BIGINT) AS spw_milli,
           |  CAST(206835 - (1015 * n_words // n_sents)
           |    - (CASE WHEN n_words > 0 THEN 84600 * n_syll // n_words
           |       ELSE 0 END) AS BIGINT) AS flesch_milli
           |FROM m ORDER BY doc_id""".stripMargin,

    // Gopher-rule replay: same synthesized structures, generic counts
    // (token/line list folds) and the same cross-multiplied integer
    // thresholds — no float division on either side
    "q_doc_gopher_rules" ->
      raw"""WITH tk0 AS (
           |  SELECT doc_id, text,
           |    regexp_split_to_array(trim(text), '\s+') AS t0
           |  FROM documents),
           |abc AS (SELECT doc_id, text,
           |    array_to_string(t0[1:3], ' ') AS a,
           |    array_to_string(t0[4:6], ' ') AS b,
           |    array_to_string(t0[7:9], ' ') AS c
           |  FROM tk0),
           |d AS (SELECT doc_id,
           |    CASE CAST(doc_id % 4 AS INT)
           |      WHEN 1 THEN '- ' || a || chr(10) || '- ' || b ||
           |        chr(10) || '- ' || c
           |      WHEN 2 THEN a || '...' || chr(10) || b || chr(8230) ||
           |        chr(10) || c
           |      WHEN 3 THEN a || ' ### # ' || b
           |      ELSE text END AS t
           |  FROM abc),
           |m AS (SELECT doc_id, t,
           |    CASE WHEN trim(t) = '' THEN 0
           |      ELSE len(regexp_split_to_array(trim(t), '\s+')) END
           |      AS n_words,
           |    coalesce(list_sum(list_transform(
           |      regexp_split_to_array(trim(t), '\s+'),
           |      x -> length(x))), 0) AS sum_word_len,
           |    string_split(t, chr(10)) AS lines,
           |    regexp_split_to_array(trim(t), '\s+') AS toks
           |  FROM d),
           |cnt AS (SELECT doc_id,
           |    CAST(n_words AS BIGINT) AS n_words,
           |    CAST(sum_word_len AS BIGINT) AS sum_word_len,
           |    CAST(len(lines) AS BIGINT) AS n_lines,
           |    CAST(len(list_filter(lines, l -> regexp_matches(l,
           |      '^\s*([-*\x{2022}]|[0-9]+[.)])\s'))) AS BIGINT)
           |      AS n_bullet,
           |    CAST(len(list_filter(lines, l -> regexp_matches(l,
           |      '(\.\.\.|\x{2026})\s*$$'))) AS BIGINT) AS n_ell_end,
           |    CAST(length(t) - length(replace(t, '#', '')) +
           |      len(regexp_extract_all(t, '\.\.\.|\x{2026}'))
           |      AS BIGINT) AS n_sym,
           |    CAST(len(list_filter(toks, x -> regexp_matches(x,
           |      '[A-Za-z]'))) AS BIGINT) AS n_alpha,
           |    CAST(len(list_filter(
           |      ['the','a','and','of'],
           |      sw -> list_contains(list_transform(toks, x -> lower(x)),
           |        sw))) AS BIGINT) AS n_stop
           |  FROM m)
           |SELECT doc_id, n_words, sum_word_len, n_lines, n_bullet,
           |  n_ell_end, n_sym, n_alpha, n_stop,
           |  (n_words >= 50 AND n_words <= 100000) AS r_words,
           |  (sum_word_len >= n_words * 3 AND sum_word_len <= n_words * 10)
           |    AS r_mwl,
           |  (n_sym * 10 <= n_words) AS r_sym,
           |  (n_bullet * 10 <= n_lines * 9) AS r_bullet,
           |  (n_ell_end * 10 <= n_lines * 3) AS r_ell,
           |  (n_alpha * 5 >= n_words * 4) AS r_alpha,
           |  (n_stop >= 2) AS r_stop,
           |  ((n_words >= 50 AND n_words <= 100000)
           |    AND sum_word_len >= n_words * 3
           |    AND sum_word_len <= n_words * 10
           |    AND n_sym * 10 <= n_words
           |    AND n_bullet * 10 <= n_lines * 9
           |    AND n_ell_end * 10 <= n_lines * 3
           |    AND n_alpha * 5 >= n_words * 4
           |    AND n_stop >= 2) AS gopher_ok
           |FROM cnt ORDER BY doc_id""".stripMargin,

    // DSIR replay: hashed-bigram buckets (same md5-nibble math), add-one
    // smoothing over the 1024-cell domain, HUGEINT products, floor mean
    "q_doc_dsir" ->
      s"""WITH $dsirCtes
         |SELECT doc_id, n_feats, dsir_ppm FROM dsir
         |ORDER BY doc_id""".stripMargin,

    // DSIR resampling replay: same weight chain, then the hash-bucket
    // keep rule bucket < least(ppm/2e6, 1)*100 and the per-lang rollup
    "q_doc_dsir_sample" ->
      s"""WITH $dsirCtes,
         |k AS (SELECT d.doc_id, d.lang, dsir.dsir_ppm,
         |    md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))))
         |      AS h
         |  FROM documents d JOIN dsir USING (doc_id)),
         |kb AS (SELECT doc_id, lang, dsir_ppm, ${bucketSql(100)} AS bk
         |  FROM k)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(dsir_ppm) AS BIGINT) AS sum_ppm,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM kb
         |WHERE CAST(bk AS DOUBLE) <
         |  least(CAST(dsir_ppm AS DOUBLE) / 2000000.0, 1.0) * 100
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // blocklist replay: canon + registered domain, NOT IN the blocked set
    "q_doc_domain_block" ->
      s"""WITH $urlCanonCtes
         |SELECT doc_id, domain FROM dom
         |WHERE domain NOT IN ('example2.com', 'blog2.co.uk', 'unused.org')
         |ORDER BY doc_id""".stripMargin,

    // epoch-order replay: same md5('2|' || normalized) shard + h32 sort
    "q_doc_epoch_order" ->
      raw"""WITH n AS (
           |  SELECT doc_id,
           |    md5('2|' ||
           |      lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
           |  FROM documents),
           |b AS (
           |  SELECT doc_id,
           |    CAST(('0x' || substr(h, 1, 4))::BIGINT % 8 AS INT) AS shard,
           |    ('0x' || substr(h, 1, 8))::BIGINT AS h32
           |  FROM n)
           |SELECT shard,
           |  CAST(row_number() OVER (PARTITION BY shard
           |    ORDER BY h32, doc_id) AS BIGINT) AS pos,
           |  doc_id
           |FROM b ORDER BY shard, pos""".stripMargin,

    // rendezvous replay: per (doc, s) 60-bit md5-prefix weights, argmax
    // by (w DESC, s ASC) — the engine's greatest((w, -s)) tie pin
    "q_doc_rendezvous_shard" ->
      raw"""WITH s8 AS (
           |  SELECT doc_id, s,
           |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
           |      CAST(s AS VARCHAR)), 1, 15))::BIGINT AS w,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) ||
           |        '|' || CAST(s AS VARCHAR)), 1, 15))::BIGINT DESC, s)
           |      AS rn
           |  FROM documents, unnest(generate_series(0, 7)) AS u(s)),
           |s9 AS (
           |  SELECT doc_id, s,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) ||
           |        '|' || CAST(s AS VARCHAR)), 1, 15))::BIGINT DESC, s)
           |      AS rn
           |  FROM documents, unnest(generate_series(0, 8)) AS u(s)),
           |a8 AS (SELECT doc_id, CAST(s AS INT) AS shard8
           |  FROM s8 WHERE rn = 1),
           |a9 AS (SELECT doc_id, CAST(s AS INT) AS shard9
           |  FROM s9 WHERE rn = 1)
           |SELECT a8.doc_id, shard8, shard9, shard8 <> shard9 AS moved
           |FROM a8 JOIN a9 ON a8.doc_id = a9.doc_id
           |ORDER BY a8.doc_id""".stripMargin,

    // cross-doc segment dedup replay: same planted lines; an occurrence
    // survives iff its (doc_id, pos) row_number within its segment is 1
    "q_doc_crossdoc_dedup" ->
      raw"""WITH tk AS (
           |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           |  FROM documents),
           |sg AS (
           |  SELECT doc_id,
           |    array_to_string(t[1:3], ' ') AS a,
           |    array_to_string(t[4:6], ' ') AS b
           |  FROM tk),
           |d AS (
           |  SELECT doc_id,
           |    CASE CAST(doc_id % 4 AS INT)
           |      WHEN 0 THEN ['shared nav bar', a, 'shared footer line', b]
           |      WHEN 1 THEN [a, 'shared nav bar', b]
           |      WHEN 2 THEN ['shared nav bar', 'shared nav bar', a, b]
           |      ELSE [a, b, 'shared footer line'] END AS lines
           |  FROM sg),
           |l AS (
           |  SELECT doc_id, unnest(lines) AS seg,
           |    generate_subscripts(lines, 1) AS i
           |  FROM d),
           |r AS (
           |  SELECT doc_id, seg, i,
           |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, i) AS rn
           |  FROM l),
           |cl AS (
           |  SELECT doc_id,
           |    CAST(count(*) AS INT) AS n_segs,
           |    CAST(count(*) FILTER (WHERE rn = 1) AS INT) AS n_kept,
           |    coalesce(string_agg(seg, chr(10) ORDER BY i)
           |      FILTER (WHERE rn = 1), '') AS clean
           |  FROM r GROUP BY doc_id),
           |o AS (
           |  SELECT doc_id,
           |    CAST(length(array_to_string(lines, chr(10))) AS INT)
           |      AS orig_len
           |  FROM d)
           |SELECT cl.doc_id, cl.n_segs, cl.n_kept,
           |  cl.n_segs - cl.n_kept AS n_dropped, o.orig_len,
           |  CAST(length(cl.clean) AS INT) AS clean_len,
           |  md5(cl.clean) AS clean_fp
           |FROM cl JOIN o USING (doc_id)
           |ORDER BY cl.doc_id""".stripMargin,

    "q_doc_stratified_sample" ->
      s"""WITH n AS (
         |  SELECT doc_id, lang,
         |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
         |  FROM documents),
         |b AS (SELECT doc_id, lang, ${bucketSql(100)} AS bk FROM n),
         |k AS (SELECT doc_id, lang FROM b
         |  WHERE bk < CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 75
         |                       WHEN 'fr' THEN 100 ELSE 100 END)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "q_doc_pack" ->
      raw"""WITH RECURSIVE tk AS (
           |  SELECT lang, doc_id,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT)
           |      AS n_tokens,
           |    CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
           |      AS INT) AS rn
           |  FROM documents WHERE doc_id < 5120),
           |p AS (
           |  SELECT lang, doc_id, n_tokens, rn, 0 AS bin, n_tokens AS fill
           |  FROM tk WHERE rn = 1
           |  UNION ALL
           |  SELECT tk.lang, tk.doc_id, tk.n_tokens, tk.rn,
           |    CASE WHEN p.fill + tk.n_tokens <= 256 THEN p.bin
           |         ELSE p.bin + 1 END AS bin,
           |    CASE WHEN p.fill + tk.n_tokens <= 256 THEN p.fill + tk.n_tokens
           |         ELSE tk.n_tokens END AS fill
           |  FROM tk JOIN p ON tk.lang = p.lang AND tk.rn = p.rn + 1)
           |SELECT lang, doc_id, n_tokens, bin
           |FROM p ORDER BY lang, doc_id""".stripMargin,

    // k-anonymity replay: one GROUP BY on the QI tuple, count + distinct
    // sensitive, the two violation flags as plain comparisons
    "q_doc_k_anonymity" ->
      raw"""WITH q AS (SELECT lang,
           |    CAST(length(text) // 64 AS BIGINT) AS len_bucket,
           |    doc_id % 7 AS sensitive
           |  FROM documents),
           |a AS (SELECT lang, len_bucket,
           |    CAST(count(*) AS BIGINT) AS class_size,
           |    CAST(count(DISTINCT sensitive) AS BIGINT) AS l_distinct
           |  FROM q GROUP BY lang, len_bucket)
           |SELECT lang, len_bucket, class_size, l_distinct,
           |  class_size < 5 AS violates_k, l_distinct < 5 AS violates_l
           |FROM a ORDER BY lang, len_bucket""".stripMargin,

    // compaction-plan replay: eligibility floor, the q_doc_pack greedy
    // recursion on bytes at the 1000-byte target, then the >= 2-file
    // bin filter
    "q_layout_compaction" ->
      raw"""WITH RECURSIVE f AS (
           |  SELECT lang AS partition, doc_id AS file_id,
           |    CAST(length(text) AS INT) AS bytes,
           |    CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
           |      AS INT) AS rn
           |  FROM documents WHERE length(text) < 400 AND doc_id < 5120),
           |p AS (
           |  SELECT partition, file_id, bytes, rn, 0 AS bin, bytes AS fill
           |  FROM f WHERE rn = 1
           |  UNION ALL
           |  SELECT f.partition, f.file_id, f.bytes, f.rn,
           |    CASE WHEN p.fill + f.bytes <= 1000 THEN p.bin
           |         ELSE p.bin + 1 END AS bin,
           |    CASE WHEN p.fill + f.bytes <= 1000 THEN p.fill + f.bytes
           |         ELSE f.bytes END AS fill
           |  FROM f JOIN p ON f.partition = p.partition AND f.rn = p.rn + 1),
           |b AS (SELECT partition, bin FROM p
           |  GROUP BY partition, bin HAVING count(*) >= 2)
           |SELECT p.partition, p.file_id, CAST(p.bytes AS BIGINT) AS bytes,
           |  p.bin
           |FROM p JOIN b USING (partition, bin)
           |ORDER BY partition, file_id""".stripMargin,

    // Luhn replay: same candidate regex (leftmost-greedy, RE2 ≡ Java
    // here), same right-to-left mod-10 fold (reverse + parity), same
    // literal-replace fold seeded with the document text
    "q_doc_luhn_scrub" -> {
      val ds = "replace(replace(c, ' ', ''), '-', '')"
      val dig = s"CAST(substr(reverse($ds), i, 1) AS INT)"
      raw"""WITH n AS (
           |  SELECT doc_id,
           |    CASE CAST(doc_id % 5 AS INT)
           |      WHEN 1 THEN text || ' pay 4111 1111 1111 1111 now'
           |      WHEN 2 THEN text || ' card 4111 1111 1111 1112 held'
           |      WHEN 3 THEN text || ' ref 123456789 ok'
           |      WHEN 4 THEN text || ' acct 3782-822463-10005 sent'
           |      ELSE text END AS t
           |  FROM documents),
           |r AS (SELECT doc_id, t,
           |    regexp_extract_all(t, '[0-9](?:[ -]?[0-9]){12,18}') AS runs
           |  FROM n),
           |v AS (SELECT doc_id, t, runs,
           |    [c for c in runs if
           |      list_sum([CASE WHEN i % 2 = 1 THEN $dig
           |          ELSE CASE WHEN 2 * $dig > 9 THEN 2 * $dig - 9
           |               ELSE 2 * $dig END END
           |        for i in generate_series(1, length($ds))]) % 10 = 0]
           |      AS valids
           |  FROM r)
           |SELECT doc_id, CAST(len(runs) AS INT) AS n_runs,
           |  CAST(len(valids) AS INT) AS n_valid,
           |  md5(list_reduce(list_prepend(t, valids),
           |    (acc, x) -> replace(acc, x, '<CARD>'))) AS clean_fp
           |FROM v ORDER BY doc_id""".stripMargin
    },

    // pad-waste replay: same rank windows (n desc + hash tiebreak vs
    // hash alone), same div-8 batches, same exact slot/waste integers
    "q_doc_pad_waste" ->
      raw"""WITH base AS (SELECT lang AS grp,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
           |      AS BIGINT) AS n,
           |    md5(doc_id || '|' || text) AS h
           |  FROM documents),
           |s1 AS (SELECT grp, n, CAST(row_number() OVER (
           |    PARTITION BY grp ORDER BY n DESC, h) AS BIGINT) AS rk
           |  FROM base),
           |b1 AS (SELECT grp, (rk - 1) // 8 AS b, max(n) AS mx,
           |    sum(n) AS sm, count(*) AS c
           |  FROM s1 GROUP BY 1, 2),
           |g1 AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_docs,
           |    CAST(sum(sm) AS BIGINT) AS total_tokens,
           |    CAST((sum(mx * c) - sum(sm)) * 1000000 // sum(mx * c)
           |      AS BIGINT) AS sorted_waste_ppm
           |  FROM b1 GROUP BY grp),
           |s2 AS (SELECT grp, n, CAST(row_number() OVER (
           |    PARTITION BY grp ORDER BY h) AS BIGINT) AS rk
           |  FROM base),
           |b2 AS (SELECT grp, (rk - 1) // 8 AS b, max(n) AS mx,
           |    sum(n) AS sm, count(*) AS c
           |  FROM s2 GROUP BY 1, 2),
           |g2 AS (SELECT grp,
           |    CAST((sum(mx * c) - sum(sm)) * 1000000 // sum(mx * c)
           |      AS BIGINT) AS shuffled_waste_ppm
           |  FROM b2 GROUP BY grp)
           |SELECT g1.grp, g1.n_docs, g1.total_tokens,
           |  g1.sorted_waste_ppm, g2.shuffled_waste_ppm
           |FROM g1 JOIN g2 USING (grp) ORDER BY g1.grp""".stripMargin,

    // IBAN replay: whole-token shape match, the same rearrange + mod-97
    // incremental fold (list_reduce seeded by a prepended 0), same
    // literal-replace fold over validated tokens only
    "q_doc_iban_scrub" -> {
      val re = "substr(c, 5) || substr(c, 1, 4)"
      raw"""WITH n AS (
           |  SELECT doc_id,
           |    CASE CAST(doc_id % 5 AS INT)
           |      WHEN 1 THEN text || ' pay GB82WEST12345698765432 now'
           |      WHEN 2 THEN text || ' acct GB82WEST12345698765433 held'
           |      WHEN 3 THEN text || ' ref FR1420041010050500013M02606 ok'
           |      WHEN 4 THEN text || ' code DE8937040 short'
           |      ELSE text END AS t
           |  FROM documents),
           |tk AS (SELECT doc_id, t,
           |    list_filter(regexp_split_to_array(trim(t), '\s+'),
           |      x -> regexp_full_match(x,
           |        '[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}')) AS cands
           |  FROM n),
           |v AS (SELECT doc_id, t, cands,
           |    [c for c in cands if
           |      list_reduce(list_prepend(0,
           |        [ascii(substr($re, i, 1))
           |         for i in generate_series(1, length(c))]),
           |        (acc, a) -> CASE WHEN a <= 57
           |          THEN (acc * 10 + (a - 48)) % 97
           |          ELSE (acc * 100 + (a - 55)) % 97 END) = 1] AS valids
           |  FROM tk)
           |SELECT doc_id, CAST(len(cands) AS INT) AS n_cands,
           |  CAST(len(valids) AS INT) AS n_valid,
           |  md5(list_reduce(list_prepend(t, valids),
           |    (acc, x) -> replace(acc, x, '<IBAN>'))) AS clean_fp
           |FROM v ORDER BY doc_id""".stripMargin
    },

    // script-profile replay: identical codepoint classes (taken from the
    // SAME ScriptClasses constant), first-max dominance chain in the same
    // priority order, cross-multiplied >= 20% major rule
    "q_doc_script_mix" -> {
      val names = TextOps.ScriptClasses.map(_._1)
      val counts = TextOps.ScriptClasses.map { case (nm, pat) =>
        s"    CAST(len(regexp_extract_all(tx, '$pat')) AS BIGINT) AS n_$nm"
      }.mkString(",\n")
      val totalExpr = names.map(nm => s"n_$nm").mkString(" + ")
      val bestExpr = s"greatest(${names.map(nm => s"n_$nm").mkString(", ")})"
      val domChain = names.map(nm =>
        s"       WHEN n_$nm = best THEN '$nm'").mkString("\n")
      val majorExpr = names.map(nm =>
        s"(CASE WHEN n_$nm * 5 >= n_letters AND n_$nm > 0 THEN 1 ELSE 0 END)")
        .mkString(" + ")
      import ScriptFixtures.sqlStr
      s"""WITH tk AS (SELECT doc_id, text,
         |    regexp_split_to_array(trim(text), '\\s+') AS tt
         |  FROM documents),
         |d AS (SELECT doc_id,
         |    CASE CAST(doc_id % 4 AS INT)
         |      WHEN 1 THEN array_to_string(tt[1:3], ' ') || ' ' ||
         |        ${sqlStr(ScriptFixtures.cyr)}
         |      WHEN 2 THEN array_to_string(tt[1:1], ' ') || ' ' ||
         |        ${sqlStr(ScriptFixtures.cjk)}
         |      WHEN 3 THEN ${sqlStr(ScriptFixtures.ara)}
         |      ELSE text END AS tx
         |  FROM tk),
         |c AS (SELECT doc_id,
         |$counts
         |  FROM d),
         |tot AS (SELECT *, $totalExpr AS n_letters, $bestExpr AS best
         |  FROM c)
         |SELECT doc_id, ${names.map(nm => s"n_$nm").mkString(", ")},
         |  n_letters,
         |  CASE WHEN best = 0 THEN 'none'
         |$domChain
         |       ELSE 'none' END AS dominant,
         |  CAST($majorExpr AS BIGINT) AS n_major,
         |  ($majorExpr) >= 2 AS mixed
         |FROM tot ORDER BY doc_id""".stripMargin
    },

    // divergence replay: same skew synthesis, same deterministic vocab
    // (count desc, term asc, limit), same floor-div shares and L1 sum
    "q_doc_source_divergence" ->
      raw"""WITH syn AS (SELECT source,
           |    CASE WHEN source = 'src0'
           |      THEN text || ' skewzero skewzero skewzero skewzero'
           |      WHEN source = 'src1' THEN text || ' skewone skewone'
           |      ELSE text END AS text
           |  FROM documents),
           |tk AS (SELECT source AS grp,
           |    unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
           |      AS tok
           |  FROM syn),
           |c AS (SELECT grp, tok, CAST(count(*) AS BIGINT) AS c
           |  FROM tk GROUP BY 1, 2),
           |v AS (SELECT tok FROM (SELECT tok, sum(c) AS n FROM c
           |  GROUP BY tok ORDER BY n DESC, tok LIMIT 256)),
           |iv AS (SELECT c.grp, c.tok, c.c FROM c JOIN v USING (tok)),
           |tot AS (SELECT grp, sum(c) AS n_g FROM iv GROUP BY grp),
           |sh AS (SELECT iv.grp, iv.tok, iv.c * 1000000 // tot.n_g AS ppm
           |  FROM iv JOIN tot USING (grp)),
           |grid AS (SELECT g.grp, v.tok, coalesce(sh.ppm, 0) AS ppm
           |  FROM (SELECT grp FROM tot) g CROSS JOIN v
           |  LEFT JOIN sh ON sh.grp = g.grp AND sh.tok = v.tok)
           |SELECT a.grp AS grp_a, b.grp AS grp_b,
           |  CAST(sum(abs(a.ppm - b.ppm)) AS BIGINT) AS l1_ppm,
           |  CAST(sum(CASE WHEN a.ppm > 0 AND b.ppm > 0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_both
           |FROM grid a JOIN grid b ON a.tok = b.tok AND a.grp < b.grp
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // token-loop replay: same synthesized loop shapes, same slice-equality
    // position counts over the normalized token array, same floor-div ppm
    "q_doc_token_loops" ->
      raw"""WITH tk AS (SELECT doc_id, text,
           |    regexp_split_to_array(trim(text), '\s+') AS tt
           |  FROM documents),
           |d AS (SELECT doc_id,
           |    CASE CAST(doc_id % 4 AS INT)
           |      WHEN 1 THEN array_to_string(tt[1:3], ' ') || ' ' ||
           |        repeat(array_to_string(tt[4:6], ' ') || ' ', 6) ||
           |        array_to_string(tt[7:9], ' ')
           |      WHEN 2 THEN array_to_string(tt[1:2], ' ') || ' ' ||
           |        repeat(array_to_string(tt[4:4], ' ') || ' ', 8) ||
           |        array_to_string(tt[5:7], ' ')
           |      WHEN 3 THEN repeat(array_to_string(tt[1:2], ' ') || ' ', 5)
           |        || array_to_string(tt[3:5], ' ')
           |      ELSE text END AS tx
           |  FROM tk),
           |nt AS (SELECT doc_id,
           |    regexp_split_to_array(trim(lower(tx)), '\s+') AS t
           |  FROM d),
           |c AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
           |    CAST(len([i for i in generate_series(1,
           |      greatest(len(t) - 1, 0)) if t[i:i] = t[i+1:i+1]])
           |      AS BIGINT) AS rep1,
           |    CAST(len([i for i in generate_series(1,
           |      greatest(len(t) - 3, 0)) if t[i:i+1] = t[i+2:i+3]])
           |      AS BIGINT) AS rep2,
           |    CAST(len([i for i in generate_series(1,
           |      greatest(len(t) - 5, 0)) if t[i:i+2] = t[i+3:i+5]])
           |      AS BIGINT) AS rep3
           |  FROM nt)
           |SELECT doc_id, n_tokens, rep1, rep2, rep3,
           |  CAST(greatest(rep1 * 1000000, rep2 * 2 * 1000000,
           |    rep3 * 3 * 1000000) // greatest(n_tokens, 1) AS BIGINT)
           |    AS max_rep_ppm,
           |  (greatest(rep1 * 1000000, rep2 * 2 * 1000000,
           |    rep3 * 3 * 1000000) // greatest(n_tokens, 1)) >= 200000
           |    AS loop_flag
           |FROM c ORDER BY doc_id""".stripMargin)
}
