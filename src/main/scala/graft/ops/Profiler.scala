package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiler: per-column row/null/distinct counts and numeric
  * min/max in ONE job — the "what did this crawl drop on us" first look
  * every ingest pipeline runs before schema decisions.
  *
  * Shape: columns are melted with `stack` (per-row generate, no shuffle),
  * then ONE (col_name)-keyed aggregate computes everything; the single
  * count-distinct is over the melted (col_name, value) pairs, so Catalyst
  * plans one Expand — asking for N exact `count(distinct c_i)` in one agg
  * over the WIDE frame would expand every row N× too, but with the whole
  * row carried instead of one value. Profiling cost is rows × profiled
  * columns either way — linear, partially aggregated, spillable.
  *
  * Values are compared through their STRING form (cast preserves null,
  * per-engine formatting is injective so distinct counts agree across
  * engines) and through `try_cast(… as double)` for min/max (non-numeric
  * columns yield null min/max rather than lexicographic surprises).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val stackArgs = cols
      .map(c => s"'$c', cast(`$c` as string)").mkString(", ")
    df.selectExpr(
        s"stack(${cols.size}, $stackArgs) as (col_name, sval)")
      .selectExpr("col_name", "sval", "try_cast(sval as double) as nval")
      .groupBy("col_name")
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - count(col("sval"))).as("n_null"),
        countDistinct(col("sval")).as("n_distinct"),
        min(col("nval")).as("min_num"),
        max(col("nval")).as("max_num"))
  }

  /** Shuffle-skew advisor — the pre-flight read before keying a 100 TB
    * join or aggregate on a column: the k heaviest keys with their row
    * share and the SALT FACTOR that would spread each one evenly over
    * `parts` partitions,
    *
    *   salt = ceil(cnt · parts / N)   (1 = no salting needed)
    *
    * plus a `hot` flag at cnt > 2·(N div parts) — the "this key alone
    * overflows its reducer" line. All integer floor/ceil algebra in ppm.
    *
    * Scale shape: the key-keyed count (the same aggregate the skewed job
    * itself would run, map-side combined) feeds a k-bounded TopKAgg heap
    * — never a global sort — and the k-row picks BROADCAST back into the
    * counts for the key strings (never the other way around: the counts
    * table is one row per distinct key, the very cardinality this
    * advisor warns about). The counts subtree is evaluated for both
    * consumers — two linear passes; cache it upstream if the input scan
    * is the expensive part. Returns (rank, key, cnt, share_ppm,
    * salt_factor, hot).
    *
    * Identity caveat (shared with [[joinSizeAdvisor]]): picks join back
    * to the counts on the 52-bit md5 key hash alone. Two DISTINCT keys
    * colliding on hash52 would both match one pick — a duplicate rank
    * row and one dropped true top key. At 52 bits that needs ~6.7e7
    * distinct HOT-candidate keys for even-odds (birthday bound); accepted
    * for an advisory read, noted here so a consumer treating rank as a
    * unique key knows the envelope.
    */
  def skewAdvisor(df: DataFrame, keyCol: String, parts: Int,
      topK: Int = 10): DataFrame = {
    require(parts >= 1 && topK >= 1, "parts and topK must be positive")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("kh", graft.ops.Kmv.hash52(col("key")))
    val top = graft.functions.TopKAgg.smallest_k_long(topK)
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    // deterministic heap order: (-cnt, md5-52(key)) — count ties break
    // by smallest key hash; the hash also identifies the pick for the
    // join back to the key string below
    val agg = counts.join(broadcast(total).hint("broadcast"))
      .groupBy("n_total")
      .agg(top(negate(col("cnt")), col("kh")).as("t"))
    val picks = agg
      .select(col("n_total"), posexplode(col("t")).as(Seq("pos", "e")))
      .select(col("n_total"), (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("kh"))
    // broadcast the k-ROW picks into the streamed counts — never the
    // counts table (one row per DISTINCT key: the very table whose
    // cardinality this advisor exists to warn about). Key strings come
    // from the counts side; cnt rides along so only this join's output
    // (k rows) ever leaves the scan.
    counts.join(broadcast(picks), Seq("kh"))
      .select(col("rank"), col("key"), col("cnt"),
        sharePpm(col("cnt"), col("n_total")).as("share_ppm"),
        call_function("div",
          col("cnt") * lit(parts.toLong) + col("n_total") - 1,
          col("n_total")).as("salt_factor"),
        (col("cnt") > lit(2L) * call_function("div", col("n_total"),
          lit(parts.toLong))).as("hot"))
  }

  /** Join-size advisor — [[skewAdvisor]]'s sibling for the OTHER way a
    * 100 TB job melts: a many-to-many key whose join output explodes.
    * Exact pre-flight estimate from per-key counts alone (never running
    * the join):
    *
    *   rows(key) = cnt_left(key) · cnt_right(key),   total = Σ rows(key)
    *
    * Returns the k biggest-contribution keys as (rank, key, n_left,
    * n_right, pair_rows, share_ppm, est_total) with the grand total on
    * every row (the summary travels with the curve, the
    * [[TextOps.calibrationBins]] discipline). A key with share_ppm near
    * 10⁶ is the "one hot key IS the join" read; est_total ≫ both input
    * counts is the fan-out warning a planner wants BEFORE the shuffle.
    *
    * Scale shape: two map-side-combined key counts, an equi-join of the
    * two DISTINCT-KEY count tables (each far smaller than its input),
    * one k-bounded TopKAgg heap ordered (−pair_rows, md5-52(key)) — never
    * a global sort — and the k-row picks broadcast back for the key
    * strings, exactly the [[skewAdvisor]] plumbing (including its 52-bit
    * pick-join identity caveat — see there).
    */
  def joinSizeAdvisor(left: DataFrame, leftKey: String, right: DataFrame,
      rightKey: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be positive")
    def counts(df: DataFrame, k: String, out: String) =
      df.groupBy(col(k).cast("string").as("key"))
        .agg(count(lit(1)).as(out))
    val pairs = counts(left, leftKey, "n_left")
      .join(counts(right, rightKey, "n_right"), Seq("key"))
      .withColumn("pair_rows", col("n_left") * col("n_right"))
      .withColumn("kh", graft.ops.Kmv.hash52(col("key")))
    val total = pairs.agg(sum(col("pair_rows")).as("est_total"))
    val top = graft.functions.TopKAgg.smallest_k_long(topK)
    val picks = pairs.join(broadcast(total).hint("broadcast"))
      .groupBy("est_total")
      .agg(top(negate(col("pair_rows")), col("kh")).as("t"))
      .select(col("est_total"), posexplode(col("t")).as(Seq("pos", "e")))
      .select(col("est_total"), (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("kh"))
    pairs.join(broadcast(picks), Seq("kh"))
      .select(col("rank"), col("key"), col("n_left"), col("n_right"),
        col("pair_rows"),
        sharePpm(col("pair_rows"), col("est_total")).as("share_ppm"),
        col("est_total"))
  }

  /** Overflow-bounded integer ppm share `part/total`: the exact
    * `part·10⁶ div total` whenever `total < 9·10¹²` (then `part ≤ total`
    * keeps the product under 2⁶³), else the denominators shrink instead —
    * `part div max(total div 10⁶, 1)` — so the HOT regime the advisors
    * exist for (a key contributing >9.2e12 pairs) cannot silently wrap
    * (non-ANSI) or raise (ANSI) mid-advice. The two branches agree within
    * ±1 ppm·(10⁶/total) — sub-ppm error exactly where the fallback fires.
    * Both engines replay the identical CASE, so gates stay bit-exact.
    * Remaining envelope (documented, [[graft.ops.VectorOps]] exactCosX1m
    * discipline): `pair_rows = n_left·n_right` and `Σ pair_rows` are
    * plain long arithmetic — past 2⁶³ (~9.2e18 pairs) ANSI raises loudly
    * rather than mis-ranking.
    */
  private def sharePpm(part: org.apache.spark.sql.Column,
      total: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(total < lit(9000000000000L),
      call_function("div", part * lit(1000000L), total))
      .otherwise(call_function("div", part,
        greatest(call_function("div", total, lit(1000000L)), lit(1L))))

  /** DuckDB mirror of [[profile]] for a given table name — one UNION ALL
    * branch per column with the identical cast-through-VARCHAR semantics.
    */
  def profileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT CAST($c AS VARCHAR)) AS BIGINT) AS n_distinct,
         |  min(TRY_CAST(CAST($c AS VARCHAR) AS DOUBLE)) AS min_num,
         |  max(TRY_CAST(CAST($c AS VARCHAR) AS DOUBLE)) AS max_num
         |FROM $table""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "\nORDER BY col_name")
}
