package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-static enrichment: an arriving document/event stream joined to a
  * slowly-changing dimension (source metadata, license tiers, domain
  * reputation) — the standard first hop of a streaming curation pipeline.
  *
  * Shape: Spark re-resolves the static side on every micro-batch, so the
  * dimension is freshly read (a dim updated between batches is picked up
  * without restarting the query) and the join itself is stateless — no
  * streaming state at all, unlike the windowed operators. The explicit
  * `broadcast` keeps each micro-batch's join a map-side hash lookup; the
  * contract is a SMALL dim (metadata tables are). A dim too big to
  * broadcast is the one case to pre-bucket both sides on the key and take
  * the shuffle instead — at that point it is not an enrichment dim but a
  * second fact table.
  *
  * Join is LEFT: curation must not drop stream rows just because metadata
  * lags the crawl (new sources appear before their registry entry);
  * missing attributes surface as `fallbacks` defaults so downstream
  * grouping sees a stable "unknown" bucket, never a silent null group.
  */
object StreamingEnrich {

  /** Enrich `stream` with `dims` on equi-key `key` (left, broadcast).
    * `fallbacks` maps dim-attribute name → default used when the dim has
    * no row for the key (applied with coalesce; attributes not listed
    * stay null).
    */
  def enrich(stream: DataFrame, dims: DataFrame, key: String,
      fallbacks: Map[String, Column] = Map.empty): DataFrame = {
    val joined = stream.join(broadcast(dims), Seq(key), "left")
    fallbacks.foldLeft(joined) { case (df, (attr, dflt)) =>
      df.withColumn(attr, coalesce(col(attr), dflt))
    }
  }

  /** Windowed per-attribute counts of an enriched stream — e.g. docs per
    * license tier per hour. State is one count per (window, attr value):
    * attribute-cardinality-bounded, watermark-evicted.
    */
  def windowedDimCounts(enriched: DataFrame, attr: String,
      windowDuration: String, watermarkDelay: String): DataFrame =
    enriched
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDuration), col(attr))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(attr), col("n"))
}
