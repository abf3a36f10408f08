package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Preference

/** Preference-data analytics gates (round 13): pairwise win rates,
  * Bradley-Terry strength, Fleiss-kappa annotator agreement, best-of-n
  * selection — the post-training side of the LLM data pipeline. Battle
  * logs / rating tables are synthesized deterministically from the
  * documents table (integer residue algebra only), mirrored term-for-term
  * by the DuckDB oracles.
  */
object PreferenceQueries {

  /** Synthetic battle log: models 0..6 with a built-in strength gradient
    * (LOWER id is stronger — the outcome roll is compared against a
    * threshold shifted by (model_b − model_a), so model 0 beats model 6
    * almost always and adjacent models are near-even with occasional
    * ties). One battle per document whose two derived model ids differ.
    */
  private def battles(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = t(s, dir, "documents")
    val ma = pmod(col("doc_id"), lit(7L))
    val mb = pmod(call_function("div", col("doc_id"), lit(7L)), lit(7L))
    val roll = pmod(col("n_chars") * 31 + col("doc_id"), lit(10L))
    val thr = lit(5L) + mb - ma
    d.where(ma =!= mb).select(ma.as("model_a"), mb.as("model_b"),
      when(roll < thr, "a").when(roll === thr, "tie").otherwise("b")
        .as("outcome"))
  }

  private val battlesSql =
    """SELECT doc_id % 7 AS model_a, (doc_id // 7) % 7 AS model_b,
      |    CASE WHEN (n_chars*31 + doc_id) % 10
      |           < 5 + ((doc_id // 7) % 7) - (doc_id % 7) THEN 'a'
      |         WHEN (n_chars*31 + doc_id) % 10
      |           = 5 + ((doc_id // 7) % 7) - (doc_id % 7) THEN 'tie'
      |         ELSE 'b' END AS outcome
      |  FROM documents WHERE doc_id % 7 <> (doc_id // 7) % 7""".stripMargin

  val defs: Map[String, QueryFn] = Map(

    // pairwise model win/loss/tie matrix + ppm win rate (ties = half a
    // win) — the leaderboard tally; two-sided explode, ONE hash aggregate
    "q_doc_winrate" -> ((s, dir) =>
      Preference.winMatrix(battles(s, dir), "model_a", "model_b", "outcome")
        .orderBy("model")),

    // Bradley-Terry strength via 3 exact fixed-point MM rounds at ppm
    // scale — bit-reproducible under any partitioning (the KMeans
    // discipline: per-round ratings are a k-row driver-held LocalRelation,
    // battles reduce once to pair stats), oracle unrolls identical rounds
    "q_doc_bt_strength" -> ((s, dir) =>
      Preference.btStrength(battles(s, dir), "model_a", "model_b",
          "outcome", rounds = 3)
        .orderBy("model")),

    // Fleiss' kappa per language over 3 synthesized annotators (every
    // 17th doc gets a duplicate submission → listwise-dropped, surfaced
    // in n_items_dropped); exact ppb/ppm integer algebra
    "q_doc_fleiss_kappa" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val base = pmod(col("doc_id") * 13 + col("n_chars"), lit(4L))
      val rs = when(pmod(col("doc_id"), lit(17L)) === 0,
          array(lit(0L), lit(1L), lit(2L), lit(0L)))
        .otherwise(array(lit(0L), lit(1L), lit(2L)))
      val ratings = d
        .select(col("lang"), col("doc_id"), col("n_chars"), base.as("base"),
          explode(rs).as("r"))
        .select(col("lang"), col("doc_id"),
          when(pmod(col("doc_id") + col("r") * col("n_chars"), lit(5L)) < 3,
            col("base"))
            .otherwise(pmod(col("base") + col("r"), lit(4L))).as("label"))
      Preference.fleissKappa(ratings, "lang", "doc_id", "label", raters = 3)
        .orderBy("lang")
    }),

    // per-rater severity audit: 3 synthesized raters per doc, each with
    // a built-in severity offset (rater % 7) the leave-one-out bias must
    // recover; every 13th doc is single-rated → excluded, surfaced in
    // n_single
    "q_doc_rater_bias" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val rs = when(pmod(col("doc_id"), lit(13L)) === 0, array(lit(0L)))
        .otherwise(array(lit(0L), lit(1L), lit(2L)))
      val rater = pmod(col("doc_id") * 7 + col("r") * 31, lit(11L))
      val ratings = d
        .select(col("doc_id"), col("n_chars"), explode(rs).as("r"))
        .select(col("doc_id"), rater.as("rater"),
          (col("n_chars") * 10 + pmod(rater, lit(7L))).as("score"))
      Preference.raterBias(ratings, "rater", "doc_id", "score")
        .orderBy("rater")
    }),

    // best-of-n selection with the runner-up margin — per prompt, top-2
    // through the k-bounded heap aggregate (never a group window)
    "q_doc_best_of_n" -> ((s, dir) => {
      val pool = t(s, dir, "documents").select(
        pmod(col("doc_id"), lit(101L)).as("prompt_id"),
        col("doc_id"),
        (col("n_chars") * 7 + pmod(col("doc_id"), lit(89L))).as("score"))
      Preference.bestOfN(pool, "prompt_id", "doc_id", "score")
        .orderBy("prompt_id")
    }))

  val oracles: Map[String, String] = Map(

    "q_doc_winrate" ->
      s"""WITH battles AS (
         |$battlesSql),
         |sides AS (
         |  SELECT model_a AS model,
         |    CASE WHEN outcome='a' THEN 1 ELSE 0 END AS w,
         |    CASE WHEN outcome='b' THEN 1 ELSE 0 END AS l,
         |    CASE WHEN outcome='tie' THEN 1 ELSE 0 END AS t
         |  FROM battles
         |  UNION ALL
         |  SELECT model_b,
         |    CASE WHEN outcome='b' THEN 1 ELSE 0 END,
         |    CASE WHEN outcome='a' THEN 1 ELSE 0 END,
         |    CASE WHEN outcome='tie' THEN 1 ELSE 0 END
         |  FROM battles)
         |SELECT model, count(*) AS battles,
         |  CAST(sum(w) AS BIGINT) AS wins,
         |  CAST(sum(l) AS BIGINT) AS losses,
         |  CAST(sum(t) AS BIGINT) AS ties,
         |  (CAST(sum(w) AS BIGINT)*2 + CAST(sum(t) AS BIGINT)) * 1000000
         |    // (count(*)*2) AS win_rate_ppm
         |FROM sides GROUP BY model ORDER BY model""".stripMargin,

    // unrolled 3-round MM replay: pair stats once, then per round the
    // exact term/clamp/renorm integer chain the engine runs
    "q_doc_bt_strength" -> {
      def round(r: Int) =
        s"""d$r AS (
           |  SELECT ps.i,
           |    CAST(sum(ps.n2 * 1000000000000
           |      // greatest(x.pi + y.pi, 1)) AS BIGINT) AS denom
           |  FROM ps JOIN pi${r - 1} x ON ps.i = x.i
           |          JOIN pi${r - 1} y ON ps.j = y.i
           |  GROUP BY ps.i),
           |r$r AS (
           |  SELECT ms.i, least(ms.w2tot * 1000000000000
           |    // greatest(d$r.denom, 1),
           |    (SELECT k FROM kk) * 1000000) AS raw
           |  FROM ms JOIN d$r ON ms.i = d$r.i),
           |t$r AS (SELECT greatest(CAST(sum(raw) AS BIGINT), 1) AS tot
           |        FROM r$r),
           |pi$r AS (SELECT i, raw * ((SELECT k FROM kk) * 1000000)
           |    // (SELECT tot FROM t$r) AS pi FROM r$r)""".stripMargin
      s"""WITH battles AS (
         |$battlesSql),
         |directed AS (
         |  SELECT model_a AS i, model_b AS j, 2 AS n2,
         |    CASE WHEN outcome='a' THEN 2 WHEN outcome='tie' THEN 1
         |         ELSE 0 END AS w2
         |  FROM battles
         |  UNION ALL
         |  SELECT model_b, model_a, 2,
         |    CASE WHEN outcome='b' THEN 2 WHEN outcome='tie' THEN 1
         |         ELSE 0 END
         |  FROM battles),
         |ps AS (SELECT i, j, CAST(sum(n2) AS BIGINT) AS n2,
         |         CAST(sum(w2) AS BIGINT) AS w2
         |       FROM directed GROUP BY i, j),
         |ms AS (SELECT i, CAST(sum(n2) AS BIGINT) AS n2tot,
         |         CAST(sum(w2) AS BIGINT) AS w2tot
         |       FROM ps GROUP BY i),
         |kk AS (SELECT count(*) AS k FROM ms),
         |pi0 AS (SELECT i, CAST(1000000 AS BIGINT) AS pi FROM ms),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT ms.i AS model, ms.n2tot // 2 AS battles,
         |  ms.w2tot AS win_points, pi3.pi AS strength_ppm
         |FROM ms JOIN pi3 ON ms.i = pi3.i ORDER BY model""".stripMargin
    },

    "q_doc_fleiss_kappa" ->
      """WITH rat AS (
        |  SELECT lang, doc_id,
        |    CASE WHEN (doc_id + u.r * n_chars) % 5 < 3
        |           THEN (doc_id*13 + n_chars) % 4
        |         ELSE ((doc_id*13 + n_chars) % 4 + u.r) % 4 END AS label
        |  FROM documents,
        |    UNNEST(CASE WHEN doc_id % 17 = 0 THEN [0,1,2,0]
        |           ELSE [0,1,2] END) AS u(r)),
        |nic AS (SELECT lang, doc_id, label, count(*) AS n_ic
        |        FROM rat GROUP BY 1, 2, 3),
        |items AS (SELECT lang, doc_id, CAST(sum(n_ic) AS BIGINT) AS k_i,
        |            CAST(sum(n_ic*(n_ic-1)) AS BIGINT) AS a_i
        |          FROM nic GROUP BY 1, 2),
        |kept AS (SELECT * FROM items WHERE k_i = 3),
        |drp AS (SELECT lang, count(*) AS n_items_dropped FROM items
        |        WHERE k_i <> 3 GROUP BY 1),
        |pg AS (SELECT lang, count(*) AS n_items,
        |         CAST(sum(a_i) AS BIGINT) AS a_tot
        |       FROM kept GROUP BY 1),
        |tc AS (SELECT n.lang, n.label, CAST(sum(n.n_ic) AS BIGINT) AS t_c
        |       FROM nic n JOIN kept k
        |         ON n.lang = k.lang AND n.doc_id = k.doc_id
        |       GROUP BY 1, 2),
        |pe AS (SELECT tc.lang,
        |         CAST(sum((tc.t_c * 1000000000 // (pg.n_items*3))
        |           * (tc.t_c * 1000000000 // (pg.n_items*3))
        |           // 1000000000) AS BIGINT) AS pe_ppb
        |       FROM tc JOIN pg ON tc.lang = pg.lang GROUP BY tc.lang)
        |SELECT coalesce(pg.lang, drp.lang) AS lang,
        |  CAST(coalesce(pg.n_items, 0) AS BIGINT) AS n_items,
        |  CAST(coalesce(drp.n_items_dropped, 0) AS BIGINT)
        |    AS n_items_dropped,
        |  pg.a_tot * 1000000000 // (pg.n_items*3*2) AS po_ppb,
        |  pe.pe_ppb,
        |  CASE WHEN pe.pe_ppb = 1000000000 THEN NULL
        |       ELSE ((pg.a_tot * 1000000000 // (pg.n_items*3*2))
        |              - pe.pe_ppb) * 1000000
        |            // (1000000000 - pe.pe_ppb) END AS kappa_ppm
        |-- full outer (engine parity): a group with every item dropped
        |-- must still surface with n_items 0 and null kappa
        |FROM pg JOIN pe ON pg.lang = pe.lang
        |FULL JOIN drp ON pg.lang = drp.lang
        |ORDER BY 1""".stripMargin,

    "q_doc_rater_bias" ->
      """WITH rat AS (
        |  SELECT doc_id, (doc_id*7 + u.r*31) % 11 AS rater,
        |    n_chars*10 + ((doc_id*7 + u.r*31) % 11) % 7 AS score
        |  FROM documents,
        |    UNNEST(CASE WHEN doc_id % 13 = 0 THEN [0]
        |           ELSE [0, 1, 2] END) AS u(r)),
        |it AS (SELECT doc_id, CAST(sum(score) AS BIGINT) AS sum_i,
        |         count(*) AS n_i
        |       FROM rat GROUP BY 1),
        |dv AS (SELECT r.rater, it.n_i,
        |    CASE WHEN it.n_i > 1 THEN
        |      (r.score*(it.n_i-1) - (it.sum_i - r.score)) * 1000000
        |        // (it.n_i-1) END AS dev
        |  FROM rat r JOIN it USING (doc_id))
        |SELECT rater, count(dev) AS n_scored,
        |  CAST(sum(CASE WHEN n_i = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_single,
        |  CASE WHEN count(dev) > 0
        |       THEN CAST(sum(dev) AS BIGINT) // count(dev) END
        |    AS bias_micro
        |FROM dv GROUP BY rater ORDER BY rater""".stripMargin,

    "q_doc_best_of_n" ->
      """WITH pool AS (
        |  SELECT doc_id % 101 AS prompt_id, doc_id,
        |    n_chars*7 + doc_id % 89 AS score
        |  FROM documents),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY score DESC, doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY prompt_id) AS n_candidates
        |  FROM pool)
        |SELECT b.prompt_id, b.n_candidates, b.doc_id AS best_id,
        |  b.score AS best_score, r2.doc_id AS runner_id,
        |  r2.score AS runner_score, b.score - r2.score AS margin
        |FROM r b LEFT JOIN (SELECT * FROM r WHERE rn = 2) r2
        |  ON b.prompt_id = r2.prompt_id
        |WHERE b.rn = 1 ORDER BY b.prompt_id""".stripMargin)
}
