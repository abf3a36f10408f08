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
  * Content-Length bytes of payload (+ the inter-record `"\r\n\r\n"`).
  * Everything is in-row Column algebra (split / substring_index /
  * regexp_extract / Content-Length slice) — zero shuffle, zero UDF,
  * codegen-friendly, and generically replayable by an external engine's
  * string functions (the gate's oracle replays the PARSER, not the
  * fixture construction). Payloads that contain their own
  * `"\r\n\r\n"` are safe: the header/payload boundary is the FIRST
  * separator and the payload end comes from Content-Length, never from
  * searching.
  *
  * Real WARCs are gzip-per-record; the decompression seam is
  * [[Multimodal]]'s codec territory — this operator owns the record
  * grammar, which is where the distributed-parsing semantics live.
  */
object Warc {

  private val Sep = "\r\n\r\n"

  /** Parse a WARC/1.0 stream into its records:
    * array<struct<rec_type, target_uri, content_length, payload>>.
    * Missing headers parse as empty string / NULL length (malformed
    * records surface as data, not exceptions — the quarantine filter is
    * one `where` away).
    */
  def records(warc: Column): Column = {
    val recs = filter(split(warc, "WARC/1\\.0\r\n"),
      r => length(r) > lit(0))
    transform(recs, r => {
      val head = substring_index(r, Sep, 1)
      // nullif before the cast: a missing header extracts as '' and an
      // ANSI cast of '' throws — malformed records must surface as NULL
      // data, not kill the scan
      val clen = nullif(regexp_extract(head, "Content-Length: (\\d+)", 1),
        lit("")).cast("long")
      struct(
        regexp_extract(head, "WARC-Type: ([^\r\n]+)", 1).as("rec_type"),
        regexp_extract(head, "WARC-Target-URI: ([^\r\n]+)", 1)
          .as("target_uri"),
        clen.as("content_length"),
        r.substr(length(head) + lit(5), coalesce(clen, lit(0L)))
          .as("payload"))
    })
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
