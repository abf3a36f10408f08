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
