package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** Post-training preference-data analytics — the ops a model-comparison /
  * RLHF data pipeline runs between collection and training: pairwise
  * win-rate matrices, Bradley-Terry strength ratings (the Chatbot-Arena /
  * reward-model-eval aggregate), inter-annotator agreement (Fleiss'
  * kappa), and best-of-n selection with runner-up margins.
  *
  * Everything here is exact fixed-point integer algebra (ppm / ppb
  * scales): ratings and agreement scores are reproducible bit-for-bit on
  * any partitioning and replayable in ANSI SQL, the same discipline as
  * [[KMeans]] / [[VectorOps.powerIteration]]. Envelope limits are
  * documented per op; ANSI mode raises loudly on breach rather than
  * silently wrapping.
  */
object Preference {

  /** Per-model pairwise win/loss/tie tallies + win rate from a battle log
    * (one row per comparison: two model keys and an outcome in
    * {"a","b","tie"}; any other outcome value is ignored as a malformed
    * row). Ties count as half a win: win_rate_ppm =
    * (2*wins + ties) * 1e6 div (2 * battles).
    *
    * Scale shape: each battle is projected into its two per-model views
    * with a 2-element explode (linear, no self-join), then ONE hash
    * aggregate on the model key. Battles per model bound nothing — the
    * aggregate state is 4 counters.
    */
  def winMatrix(battles: DataFrame, aCol: String, bCol: String,
      outcomeCol: String): DataFrame = {
    val o = col(outcomeCol)
    val sides = battles
      .where(o.isin("a", "b", "tie"))
      .select(explode(array(
        struct(col(aCol).as("model"),
          when(o === "a", 1L).otherwise(0L).as("w"),
          when(o === "b", 1L).otherwise(0L).as("l"),
          when(o === "tie", 1L).otherwise(0L).as("t")),
        struct(col(bCol).as("model"),
          when(o === "b", 1L).otherwise(0L).as("w"),
          when(o === "a", 1L).otherwise(0L).as("l"),
          when(o === "tie", 1L).otherwise(0L).as("t")))).as("s"))
      .select(col("s.model").as("model"), col("s.w"), col("s.l"), col("s.t"))
    sides.groupBy("model")
      .agg(count(lit(1)).as("battles"),
        sum("w").as("wins"), sum("l").as("losses"), sum("t").as("ties"))
      .select(col("model"), col("battles"), col("wins"), col("losses"),
        col("ties"),
        call_function("div", (col("wins") * 2 + col("ties")) * 1000000L,
          col("battles") * 2).as("win_rate_ppm"))
  }

  /** Bradley-Terry strength ratings from a battle log via `rounds`
    * fixed-point MM iterations — the leaderboard aggregate behind
    * Chatbot-Arena-style model comparison and reward-model calibration.
    * Ties are the standard half-win: win points w2 = 2*wins + ties,
    * battle points n2 = 2*battles, so every battle hands out exactly 2
    * points and a model that ever appeared holds w2 >= 1 after any tie
    * or win.
    *
    * MM update (Hunter 2004), in exact integer fixed point at ppm scale:
    *   pi'_i = W2_i * 1e12 div ( SUM_j n2_ij * 1e12 div max(pi_i+pi_j, 1) )
    * then renormalized to total mass k*1e6 (k = model count):
    *   pi''_i = min(pi'_i, k*1e6) * (k*1e6) div max(SUM pi', 1).
    * Every step is integer-exact and association-order-free, so the
    * result is a pure function of the battle log on any partitioning and
    * the oracle replays it with unrolled CTEs. The min() clamp bounds a
    * runaway winner at the whole mass, which also bounds the renorm
    * multiply at (k*1e6)^2 — hence the envelope below.
    *
    * Scale shape: the battle log is reduced ONCE to directed pair stats
    * (i, j, n2, w2) — one aggregate over the exploded two-sided view —
    * and per-model win totals. Each round joins the pair stats against
    * the CURRENT ratings as a broadcast-able k-row LocalRelation (rebuilt
    * from driver state per round, so plan lineage stays FLAT — the
    * [[KMeans]] centroid discipline; re-deriving pi as a DataFrame chain
    * would reference the prior state twice per round and send planning
    * exponential, the failure [[Graph.kCoreScoped]] documents). Driver
    * state is k <= maxModels longs — the dims-bounded contract every
    * trainer here uses.
    *
    * Envelope: maxModels <= 3000 (renorm multiply min(pi', k*1e6)*(k*1e6)
    * <= 9e18 just fits a long; ANSI raises beyond), rounds <= 20. Battles
    * per pair AND per model are unbounded: the Spark-side n2*1e12 is
    * ANSI-guarded (raises loudly at ~9.2e6 battles on one PAIR), and the
    * driver-side numerator/renorm multiplies run in BigInt — a model
    * whose battles are spread across many pairs (under the pair guard,
    * over a long's w2*1e12) rates exactly instead of silently wrapping.
    */
  def btStrength(battles: DataFrame, aCol: String, bCol: String,
      outcomeCol: String, rounds: Int, maxModels: Int = 3000): DataFrame = {
    require(rounds >= 1 && rounds <= 20, "rounds must be in [1, 20]")
    require(maxModels >= 2 && maxModels <= 3000,
      "maxModels must be in [2, 3000] — the renorm multiply overflows a " +
        "long beyond 3000 models; shard the pool or rate in ppb offline")
    val o = col(outcomeCol)
    val directed = battles
      .where(o.isin("a", "b", "tie"))
      .select(explode(array(
        struct(col(aCol).as("i"), col(bCol).as("j"),
          (when(o === "a", 2L).otherwise(0L) +
            when(o === "tie", 1L).otherwise(0L)).as("w2")),
        struct(col(bCol).as("i"), col(aCol).as("j"),
          (when(o === "b", 2L).otherwise(0L) +
            when(o === "tie", 1L).otherwise(0L)).as("w2")))).as("s"))
      .select(col("s.i").as("i"), col("s.j").as("j"), lit(2L).as("n2"),
        col("s.w2").as("w2"))
    val pairStats = directed.groupBy("i", "j")
      .agg(sum("n2").as("n2"), sum("w2").as("w2"))
      .persist()
    try {
      val modelStats = pairStats.groupBy("i")
        .agg(sum("n2").as("n2tot"), sum("w2").as("w2tot"))
        .collect()
        .map(r => (r.getAs[Any]("i"), r.getAs[Long]("n2tot"),
          r.getAs[Long]("w2tot")))
        .sortBy(_._1.toString)
      require(modelStats.length <= maxModels,
        s"${modelStats.length} models exceed maxModels=$maxModels")
      val k = modelStats.length.toLong
      val mass = k * 1000000L
      val spark = battles.sparkSession
      var pi: Map[Any, Long] = modelStats.map(m => m._1 -> 1000000L).toMap
      for (_ <- 1 to rounds) {
        val piDF = toPiFrame(spark, battles, aCol, pi)
        val denom = pairStats
          .join(broadcast(piDF.select(col("model").as("i"),
            col("pi").as("pi_i"))), Seq("i"))
          .join(broadcast(piDF.select(col("model").as("j"),
            col("pi").as("pi_j"))), Seq("j"))
          .groupBy("i")
          .agg(sum(call_function("div", col("n2") * 1000000000000L,
            greatest(col("pi_i") + col("pi_j"), lit(1L)))).as("denom"))
          .collect()
          .map(r => r.getAs[Any]("i") -> r.getAs[Long]("denom"))
          .toMap
        // BigInt: w2 (battles per MODEL) is unbounded, so w2*1e12 can
        // wrap a long even while every pair stays under the ANSI-guarded
        // pair-level envelope; the clamp makes the result long-safe
        val raw = modelStats.map { case (m, _, w2) =>
          m -> (BigInt(w2) * 1000000000000L /
            BigInt(math.max(denom(m), 1L))).min(BigInt(mass)).toLong
        }
        val tot = math.max(raw.map(_._2).sum, 1L) // <= k * mass <= 9e12
        pi = raw.map { case (m, r) =>
          m -> (BigInt(r) * mass / tot).toLong // r*mass <= 9e18: headroom
        }.toMap
      }
      val piDF = toPiFrame(spark, battles, aCol, pi)
      pairStats.groupBy("i")
        .agg(call_function("div", sum("n2"), lit(2L)).as("battles"),
          sum("w2").as("win_points"))
        .join(broadcast(piDF.select(col("model").as("i"), col("pi"))),
          Seq("i"))
        .select(col("i").as("model"), col("battles"), col("win_points"),
          col("pi").as("strength_ppm"))
        .localCheckpoint()
    } finally pairStats.unpersist()
  }

  /** The driver-held ratings as a fresh LocalRelation whose model column
    * keeps the battle log's own key type (long or string — matched via
    * the log's schema so the per-round joins never cast).
    */
  private def toPiFrame(spark: SparkSession, battles: DataFrame,
      aCol: String, pi: Map[Any, Long]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val keyType = battles.schema(aCol).dataType
    val rows: java.util.List[org.apache.spark.sql.Row] =
      pi.toSeq.sortBy(_._1.toString)
        .map { case (m, p) => org.apache.spark.sql.Row(m, p) }.asJava
    spark.createDataFrame(rows,
      StructType(Seq(StructField("model", keyType, nullable = false),
        StructField("pi", LongType, nullable = false))))
  }

  /** Fleiss' kappa per group — the inter-annotator agreement audit run
    * before trusting human preference / quality labels. Input: one row
    * per (group, item, rater's categorical label); every item must carry
    * exactly `raters` ratings — items with more or fewer (a rater
    * skipped, a duplicate submission) are EXCLUDED, the standard
    * listwise deletion, and surfaced in `n_items_dropped`. A group whose
    * items are ALL dropped still gets a row — n_items = 0, its drop
    * count, NULL po/pe/kappa (the final rollup is a full outer join, so
    * listwise deletion can never silently erase a whole group).
    *
    * Exact integer algebra at ppb scale (k = raters, N = kept items,
    * n_ic = ratings of item i in category c, T_c = SUM_i n_ic):
    *   po_ppb    = 1e9 * SUM_ic n_ic*(n_ic-1) div (N*k*(k-1))
    *   p_c_ppb   = 1e9 * T_c div (N*k)
    *   pe_ppb    = SUM_c p_c_ppb^2 div 1e9
    *   kappa_ppm = 1e6 * (po_ppb - pe_ppb) div (1e9 - pe_ppb)
    * kappa is NULL when pe_ppb = 1e9 (every kept rating in one category —
    * agreement is undefined, not perfect). Truncation enters only at the
    * three named div sites, identically replayed by the oracle.
    *
    * Envelope: N*k per group <= ~9e9 ratings (the 1e9*T_c multiply),
    * N*k*(k-1) <= ~9e9 likewise; ANSI raises beyond.
    *
    * Scale shape: three linear hash aggregates — (group,item,cat) counts,
    * then item-level (k check + po numerator) and category-level (T_c)
    * rollups — joined at GROUP granularity (rows = groups, broadcast-
    * sized). No window, no self-join, nothing quadratic in items.
    */
  def fleissKappa(ratings: DataFrame, groupCol: String, itemCol: String,
      categoryCol: String, raters: Int): DataFrame = {
    require(raters >= 2, "agreement needs at least 2 raters")
    val nic = ratings.groupBy(groupCol, itemCol, categoryCol)
      .agg(count(lit(1)).as("n_ic"))
    val items = nic.groupBy(groupCol, itemCol)
      .agg(sum("n_ic").as("k_i"),
        sum(col("n_ic") * (col("n_ic") - 1)).as("a_i"))
    val kept = items.where(col("k_i") === raters)
    val dropped = items.where(col("k_i") =!= raters)
      .groupBy(groupCol).agg(count(lit(1)).as("n_items_dropped"))
    val perGroup = kept.groupBy(groupCol)
      .agg(count(lit(1)).as("n_items"), sum("a_i").as("a_tot"))
    // T_c only over kept items: re-scope nic by the kept item set
    val tc = nic.join(kept.select(col(groupCol), col(itemCol)),
        Seq(groupCol, itemCol), "left_semi")
      .groupBy(groupCol, categoryCol)
      .agg(sum("n_ic").as("t_c"))
    val k = lit(raters.toLong)
    val pe = tc.join(perGroup.select(col(groupCol), col("n_items")),
        Seq(groupCol))
      .select(col(groupCol),
        call_function("div", col("t_c") * 1000000000L,
          col("n_items") * k).as("p_ppb"))
      .groupBy(groupCol)
      .agg(sum(call_function("div", col("p_ppb") * col("p_ppb"),
        lit(1000000000L))).as("pe_ppb"))
    // full outer: a group whose items were ALL dropped has no perGroup
    // row but must still surface (n_items = 0, null kappa) — the dropped
    // rollup is its only witness
    perGroup.join(pe, Seq(groupCol))
      .join(dropped, Seq(groupCol), "full")
      .select(col(groupCol),
        coalesce(col("n_items"), lit(0L)).as("n_items"),
        coalesce(col("n_items_dropped"), lit(0L)).as("n_items_dropped"),
        call_function("div", col("a_tot") * 1000000000L,
          col("n_items") * k * (k - 1)).as("po_ppb"),
        col("pe_ppb"))
      .withColumn("kappa_ppm",
        when(col("pe_ppb") === 1000000000L, lit(null).cast("long"))
          .otherwise(call_function("div",
            (col("po_ppb") - col("pe_ppb")) * 1000000L,
            lit(1000000000L) - col("pe_ppb"))))
  }

  /** Per-rater bias (severity/leniency) audit over NUMERIC scores — the
    * companion to [[fleissKappa]] for scored rubrics: for every rating,
    * the deviation from the LEAVE-ONE-OUT consensus (the item's mean
    * over the OTHER raters — comparing against a mean that includes the
    * rater's own score would shrink every bias toward zero), then the
    * per-rater mean deviation. A consistently harsh rater surfaces as a
    * negative bias, a lenient one positive; both are re-centering
    * candidates before the scores train anything.
    *
    * Exact integer algebra at micro scale (scores integer-typed):
    *   dev_micro  = 1e6 * (score*(n_i-1) - (sum_i - score)) div (n_i-1)
    *   bias_micro = SUM(dev_micro) div n_scored
    * Items with a single rating are excluded (no consensus to deviate
    * from) and surface in `n_single`. Truncation only at the two named
    * div sites, replayed identically by the oracle.
    *
    * Scale shape: one item-keyed aggregate joined back onto the ratings
    * (both sides item-partitioned — one shuffle pair), then one
    * rater-keyed aggregate. Linear, no window, nothing pairwise.
    */
  def raterBias(ratings: DataFrame, raterCol: String, itemCol: String,
      scoreCol: String): DataFrame = {
    val items = ratings.groupBy(itemCol)
      .agg(sum(scoreCol).as("sum_i"), count(lit(1)).as("n_i"))
    ratings.join(items, Seq(itemCol))
      .select(col(raterCol), col("n_i"),
        when(col("n_i") > 1, call_function("div",
          (col(scoreCol) * (col("n_i") - 1) -
            (col("sum_i") - col(scoreCol))) * 1000000L,
          col("n_i") - 1)).as("dev_micro"))
      .groupBy(raterCol)
      .agg(count(col("dev_micro")).as("n_scored"),
        sum(when(col("n_i") === 1, 1L).otherwise(0L)).as("n_single"),
        when(count(col("dev_micro")) > 0, call_function("div",
          sum("dev_micro"), count(col("dev_micro")))).as("bias_micro"))
  }

  /** Best-of-n selection with the runner-up margin — the rejection-
    * sampling / BoN-distillation dataset op: per group (prompt), the
    * top-scored candidate plus the gap to the SECOND best (the margin a
    * BoN pipeline thresholds on — margin over the runner-up, not over
    * the pool's worst, which is [[Curation.preferencePairs]]' job).
    * Scores must be integer-typed and non-null. Ties break to the
    * SMALLER id at both ranks, so the pick is a pure function of the
    * pool. Single-candidate groups surface with a NULL runner and
    * margin.
    *
    * Scale shape: ONE ObjectHashAggregate through the k-bounded top-k
    * heap ([[TopKAgg]], k=2) — mappers ship at most 2 entries per group,
    * never the scored pool, and no window touches the plan (the
    * row_number form would sort each group's whole pool on one task).
    */
  def bestOfN(pool: DataFrame, groupCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val top2 = TopKAgg.smallest_k_long(2)(
      negate(col(scoreCol)), col(idCol))
    // get() (not apply/element_at) — ANSI raises on an out-of-bounds
    // index, and singleton groups have no runner entry
    val best = get(col("t"), lit(0))
    val runner = get(col("t"), lit(1))
    pool.groupBy(groupCol)
      .agg(count(lit(1)).as("n_candidates"), top2.as("t"))
      .select(col(groupCol), col("n_candidates"),
        best.getField("id").as("best_id"),
        negate(best.getField("key")).as("best_score"),
        runner.getField("id").as("runner_id"),
        negate(runner.getField("key")).as("runner_score"),
        (negate(best.getField("key")) -
          negate(runner.getField("key"))).as("margin"))
  }
}
