package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextOps}

/** Result of [[CorpusCleaner.clean]]. `nearDupConverged` surfaces
  * [[Dedup.ComponentsResult.converged]]: a maxIters-capped components run
  * under-merges duplicate chains (some near-dups survive the clean), which
  * callers must be able to see and act on — the Dedup contract says the
  * flag "must be surfaced, not swallowed", so it rides in the report, not
  * just a warning log.
  */
final case class CleanReport(docs: DataFrame, dropCounts: Map[String, Long],
    nearDupConverged: Boolean, nearDupIterations: Int)

/** End-to-end training-corpus cleaning facade: annotate → exact-dedup →
  * near-dedup (MinHash-LSH) → quality/language filter. The composition a
  * 100 TB text pipeline runs before tokenization; every stage is one of the
  * library's operators, so the whole clean is a single lazy Spark plan plus
  * the two dedup joins.
  *
  * @param minQuality   drop docs scoring below this ([[TextOps.qualityScore]])
  * @param langs        keep only these predicted languages (None = all)
  * @param jaccard      near-dup threshold; near-dup pairs are closed into
  *                     connected components and only the min-id doc of each
  *                     component is kept (chains collapse consistently)
  */
class CorpusCleaner(
    minQuality: Double = 0.3,
    langs: Option[Set[String]] = None,
    jaccard: Double = 0.8,
    shingleK: Int = 3,
    nHashes: Int = 64,
    bands: Int = 32) {

  /** Annotated input: quality, predicted language, fingerprint, token count. */
  def annotate(docs: DataFrame): DataFrame =
    docs.withColumn("quality", TextOps.qualityScore(col("text")))
      .withColumn("pred_lang", TextOps.langId(col("text")))
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("n_tokens", TextOps.tokenCount(col("text")))

  /** Cleans `docs`; see [[CleanReport]] for what comes back. */
  def clean(docs: DataFrame): CleanReport = {
    val n0 = docs.count()
    val annotated = annotate(docs).persist()

    // exact dedup: keep the lowest doc_id of each fingerprint group
    val keepExact = annotated.groupBy("fp").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val afterExact = annotated.join(keepExact, Seq("doc_id"), "left_semi").persist()
    val n1 = afterExact.count()

    // near-dedup, CLUSTER-AWARE: LSH-verified pairs → connected components,
    // keep the min-id doc of each component. Dropping doc_b per pair would
    // under-drop on chains (a~c, b~c keeps both a and b even though all
    // three are transitive duplicates); min-per-cluster collapses the whole
    // closure consistently. Scoped handles: the pipeline's internal shingle
    // cache and the components' pair cache are released as soon as
    // afterNear is materialized (no cached plans leak from clean())
    val nearScoped = Dedup.minhashLshPairsScoped(afterExact, "doc_id", "text",
      shingleK, nHashes, bands, jaccard)
    val comp = Dedup.componentsDetailed(nearScoped.df)
    val dropNear = comp.df.where(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val afterNear = afterExact.join(dropNear, Seq("doc_id"), "left_anti").persist()
    val n2 = afterNear.count()
    comp.release(); nearScoped.release()

    // quality + language filter
    val cleaned = afterNear
      .where(col("quality") >= minQuality)
      .where(langs.map(ls => col("pred_lang").isin(ls.toSeq: _*))
        .getOrElse(lit(true)))
    val n3 = cleaned.count()

    annotated.unpersist(); afterExact.unpersist(); afterNear.unpersist()
    CleanReport(cleaned, Map(
      "input" -> n0,
      "exact_dups_dropped" -> (n0 - n1),
      "near_dups_dropped" -> (n1 - n2),
      "low_quality_or_lang_dropped" -> (n2 - n3),
      "output" -> n3),
      nearDupConverged = comp.converged,
      nearDupIterations = comp.iterations)
  }
}
