package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AMS second-moment (F₂) sketch (Alon, Matias & Szegedy 1996): `d`
  * independent ±1 hash signs; estimator `e` keeps the running sum
  * `Z_e = Σ_k f_k·s_e(k)` (one long!), `Z_e²` is an unbiased estimate of
  * `F₂ = Σ_k f_k²`, and the median over the `d` estimators concentrates
  * it. F₂ is the self-join size / skew mass of a key's frequency vector —
  * the number a join planner or hot-key guard wants ("how bad would
  * joining on this key be") at d longs of state per group, when the key
  * domain (URLs, shingles, user ids) never fits a groupBy.
  *
  * Determinism/portability: signs come from bit 0 of the same seeded
  * md5-52bit family as [[Cms]] / the b-bit MinHash registers; the Z sums
  * are order-free longs and the median is a rank statistic over d sorted
  * squares — an external engine replays the sketch and the estimate
  * bit-for-bit. |Z| ≤ stream length, so Z² stays in a long for streams
  * up to 3·10⁹ occurrences per group (the envelope; beyond that, shard
  * the group and merge Z sums — they are additive).
  *
  * Scale shape: one projection + one (group, seed) hash aggregate whose
  * map-side partials bound the shuffle at partitions × groups × d rows;
  * the median stage folds d longs per group. Relative error ~ 1/√d.
  *
  * Returns (groupCols…, f2_est).
  */
object Ams {

  def f2Estimate(rows: DataFrame, groupCols: Seq[String], key: Column,
      d: Int = 15): DataFrame = {
    require(d >= 1 && d <= 31 && d % 2 == 1,
      "d must be odd (exact median element) and in [1, 31]")
    val base = Cms.base52(key)
    val signs = array((0 until d).map { i =>
      val g = (base * lit(2L * i + 1)).bitwiseXOR(lit(i * Cms.Phi))
      lit(1L) - g.bitwiseAND(lit(1L)) * lit(2L)
    }: _*)
    rows.select(groupCols.map(col) :+
        posexplode(signs).as(Seq("seed", "s")): _*)
      .groupBy((groupCols :+ "seed").map(col): _*)
      .agg(sum("s").as("z"))
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(col("z") * col("z"))).as("zz"))
      .select(groupCols.map(col) :+
        try_element_at(col("zz"), lit((d + 1) / 2)).as("f2_est"): _*)
  }
}
