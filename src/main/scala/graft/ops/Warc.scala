package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record parsing — the container format
  * crawl corpora actually arrive in (Common Crawl ships WARC/WET/WAT).
  * A crawl-ingest pipeline's first distributed step is exactly this:
  * split a WARC stream into records, read the ASCII header block, slice
  * the payload by Content-Length, and parse the HTTP response inside
  * response records.
  *
  * Grammar handled here (the format's core): each record is
  * `"WARC/1.0\r\n"` + header lines + `"\r\n\r\n"` + exactly
  * Content-Length BYTES of payload + the inter-record `"\r\n\r\n"`.
  * Records are walked BY OFFSET off the parsed Content-Length — never by
  * searching for the next record marker — so a payload containing
  * `"WARC/1.0\r\n"` (a crawled page about WARC, a nested archive) can
  * not split the stream, and Content-Length is honored as the BYTE count
  * ISO 28500 defines: offsets and the payload slice run over the UTF-8
  * bytes (`encode`/`octet_length`), so multi-byte payload text cannot
  * shear the record chain. Only the header/payload boundary uses a
  * search (first `"\r\n\r\n"`), which is safe: headers cannot contain a
  * blank line. Everything is in-row Column algebra — zero shuffle, zero
  * UDF — and generically replayable by an external engine's byte/string
  * functions (the gate's oracle replays the PARSER, not the fixture
  * construction).
  *
  * Real WARCs are gzip-per-record; the decompression seam is
  * [[Multimodal]]'s codec territory — this operator owns the record
  * grammar, which is where the distributed-parsing semantics live.
  */
object Warc {

  private val Sep = "\r\n\r\n"
  private val Marker = "WARC/1.0\r\n"

  /** Parse a WARC/1.0 stream into its records (up to `maxRecords` — the
    * per-row container bound, like [[Multimodal.mp4Header]]'s box walk):
    * array<struct<rec_type, target_uri, content_length, payload>>.
    * Missing headers parse as empty string / NULL length; a record with
    * no Content-Length surfaces with a NULL length and an empty payload
    * and ENDS the walk (the next offset is unknowable), as does a
    * missing record marker — malformed input surfaces as data, not
    * exceptions (the quarantine filter is one `where` away).
    *
    * CAP SEMANTICS: the walk stops SILENTLY after `maxRecords` — an
    * 8-record result is indistinguishable from a capped parse of a
    * longer stream here. Callers that must tell them apart use
    * [[recordsWalk]], which surfaces `truncated` (valid bytes remained
    * when the cap hit) and `next_off` (the resume offset).
    */
  def records(warc: Column, maxRecords: Int = 8): Column =
    recordsWalk(warc, maxRecords).getField("recs")

  /** [[records]] plus the walk's end state — the truncation signal the
    * bare array cannot carry (mirrors how [[Multimodal.tiffHeader]]
    * surfaces the declared n_entries next to the parsed ones):
    * struct<recs, truncated boolean, next_off bigint, malformed
    * boolean>. `truncated` is true iff the walk consumed `maxRecords`
    * records and bytes remained past `next_off` — the remainder is NOT
    * verified well-formed (that would cost a second look ahead); resume
    * by slicing the stream at `next_off` and walking again, and let THAT
    * walk classify the tail. `malformed` is true iff the walk ended
    * early on a bad marker (`next_off` points at the offending bytes) or
    * a missing Content-Length (that header-only record is still
    * appended, as [[records]] documents, and `next_off` sits past its
    * consumed header). A whitespace-only tail after the final separator
    * (trailing CRLF padding, common in hand-cut slices) is tolerated:
    * neither truncated nor malformed.
    */
  def recordsWalk(warc: Column, maxRecords: Int = 8): Column = {
    require(maxRecords >= 1 && maxRecords <= 64, "maxRecords in [1, 64]")
    val bin = encode(warc, "UTF-8")
    val totB = octet_length(warc).cast("long")
    val recType = org.apache.spark.sql.types.DataTypes.createArrayType(
      org.apache.spark.sql.types.StructType.fromDDL(
        "rec_type string, target_uri string, " +
          "content_length bigint, payload string"))
    val init = struct(lit(0L).as("off"),
      array().cast(recType).as("recs"), lit(false).as("bad"))
    val walked = aggregate(sequence(lit(1), lit(maxRecords)), init,
      (acc, _) => {
        val off = acc.getField("off")
        val done = acc.getField("bad") || off >= totB
        // LET-BINDING (the tiffHeader discipline): the decoded tail and
        // its header prefix are referenced many times below
        val stepArr = transform(
          array(decode(bin.substr(off + 1, totB), "UTF-8")), rest => {
            val ok = rest.startsWith(Marker)
            // whitespace-only tail = clean end of stream, not malformed
            val ws = rest.rlike("\\A\\s*\\z")
            val head = substring_index(rest, Sep, 1)
            val clen = nullif(
              regexp_extract(head, "Content-Length: (\\d+)", 1),
              lit("")).cast("long")
            val headB = octet_length(head).cast("long")
            val payload = decode(
              bin.substr(off + headB + 5, coalesce(clen, lit(0L))),
              "UTF-8")
            struct(
              ok.as("ok"),
              ws.as("ws"),
              clen.as("clen"),
              (off + headB + 4 + coalesce(clen, lit(0L)) + 4).as("next"),
              struct(
                regexp_extract(head, "WARC-Type: ([^\r\n]+)", 1)
                  .as("rec_type"),
                regexp_extract(head, "WARC-Target-URI: ([^\r\n]+)", 1)
                  .as("target_uri"),
                clen.as("content_length"),
                payload.as("payload")).as("rec"))
          })
        val step = try_element_at(stepArr, lit(1))
        val ok = step.getField("ok")
        struct(
          when(done || !ok, off).otherwise(step.getField("next"))
            .as("off"),
          when(done || !ok, acc.getField("recs"))
            .otherwise(array_append(acc.getField("recs"),
              step.getField("rec"))).as("recs"),
          when(done, acc.getField("bad"))
            .otherwise((!ok && !step.getField("ws")) ||
              (ok && step.getField("clen").isNull)).as("bad"))
      })
    // one more let-binding: `walked` is referenced four times below
    try_element_at(transform(array(walked), w => struct(
      w.getField("recs").as("recs"),
      (!w.getField("bad") && w.getField("off") < totB &&
        size(w.getField("recs")) === lit(maxRecords)).as("truncated"),
      w.getField("off").as("next_off"),
      w.getField("bad").as("malformed"))), lit(1))
  }

  /** Parse the HTTP response inside a response record's payload:
    * struct<status, content_type, body>. Status/Content-Type come from
    * the response head; the body is everything after the first blank
    * line (HTTP bodies end at the payload end — the WARC layer already
    * cut the payload to Content-Length).
    */
  def httpResponse(payload: Column): Column = {
    val bodyStart = instr(payload, Sep)
    struct(
      regexp_extract(payload, "^HTTP/1\\.[01] (\\d{3})", 1).cast("int")
        .as("status"),
      regexp_extract(payload, "Content-Type: ([^\r\n]+)", 1)
        .as("content_type"),
      when(bodyStart > 0,
        payload.substr(bodyStart + lit(4), length(payload)))
        .otherwise(lit("")).as("body"))
  }
}
