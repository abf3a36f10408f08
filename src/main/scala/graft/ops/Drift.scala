package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot drift report: how today's crawl differs from yesterday's —
  * the between-versions health check a continuously-refreshed corpus runs
  * before promoting a new snapshot (paired with [[Snapshot.upsert]]:
  * upsert builds the candidate, drift decides whether to flip to it).
  *
  * Per stratum (language, source, license tier): row volume, token
  * volume, and vocabulary novelty (share of the new snapshot's distinct
  * terms never seen in the old). A source whose volume doubles, whose
  * docs shrink to a third, or whose vocabulary turns over overnight is a
  * scraper bug or a spam flood — exactly the regressions that silently
  * poison training data.
  *
  * Scale shape: one count/sum aggregate per side (stratum-bounded
  * output), and vocabulary movement as a (stratum, term)-keyed
  * distinct + left-anti-style count — every shuffle is linear in corpus
  * tokens, nothing is all-pairs, nothing collects. All counts are exact
  * integers; the derived ratios are single IEEE divisions, so the report
  * is engine-reproducible bit-for-bit.
  */
object Drift {

  /** Report per `stratumCol` value: (stratum, n_old, n_new, tok_old,
    * tok_new, terms_new, terms_novel, volume_ratio, novel_frac). Strata
    * present in only one snapshot surface with zeros on the other side
    * (full outer — appearing/vanishing sources are the loudest drift).
    */
  def report(oldDf: DataFrame, newDf: DataFrame, stratumCol: String,
      textCol: String): DataFrame = {
    def volume(df: DataFrame, nCol: String, tokCol: String): DataFrame =
      df.groupBy(col(stratumCol).as("stratum"))
        .agg(count(lit(1)).as(nCol),
          sum(TextOps.tokenCount(col(textCol)).cast("long")).as(tokCol))
    def vocab(df: DataFrame): DataFrame =
      df.select(col(stratumCol).as("stratum"),
          explode(array_distinct(TextOps.normTokens(col(textCol))))
            .as("term"))
        .distinct()
    val vols = volume(oldDf, "n_old", "tok_old")
      .join(volume(newDf, "n_new", "tok_new"), Seq("stratum"), "full_outer")
    // novelty: new snapshot's (stratum, term) pairs minus the old's —
    // counted per stratum; the anti set via a null-padded left join keeps
    // it ONE shuffle pair instead of join + anti-join
    val old = vocab(oldDf).withColumn("seen", lit(1))
    val novelty = vocab(newDf)
      .join(old, Seq("stratum", "term"), "left")
      .groupBy("stratum")
      .agg(count(lit(1)).as("terms_new"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("terms_novel"))
    vols.join(novelty, Seq("stratum"), "full_outer")
      .select(col("stratum"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("tok_old"), lit(0L)).as("tok_old"),
        coalesce(col("tok_new"), lit(0L)).as("tok_new"),
        coalesce(col("terms_new"), lit(0L)).as("terms_new"),
        coalesce(col("terms_novel"), lit(0L)).as("terms_novel"))
      .withColumn("volume_ratio",
        col("n_new").cast("double") / nullif(col("n_old").cast("double"),
          lit(0.0)))
      .withColumn("novel_frac",
        col("terms_novel").cast("double") /
          nullif(col("terms_new").cast("double"), lit(0.0)))
  }
}
