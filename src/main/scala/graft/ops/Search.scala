package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index retrieval primitives: posting lists and conjunctive
  * term queries — the exact-match complement to the similarity-search
  * operators (a corpus pipeline greps as often as it embeds).
  */
object Search {

  /** Posting rows (term, doc_id), distinct per doc — write once, partition
    * by term prefix at scale; the build is one explode + distinct, linear
    * in corpus tokens.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(TextOps.normTokens(col(textCol))).as("term"))
      .distinct()

  /** Docs containing ALL `terms`: one selective postings scan (term IN
    * list — pushable) + one doc-keyed count aggregation, regardless of
    * term count. The per-term intersect chain would be |terms| shuffles;
    * this is always two.
    */
  def matchAll(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    // dedupe AFTER lowercasing: postings are distinct per doc, so a
    // duplicated input term (e.g. "spark" and "Spark") can match at most
    // once — comparing n_matched against the raw length would silently
    // return zero docs
    val ts = terms.map(_.toLowerCase).distinct
    postings
      .where(col("term").isin(ts: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched")) // postings are distinct per doc
      .where(col("n_matched") === ts.length)
      .select("doc_id")
  }
}
