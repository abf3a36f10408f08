package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CorpusOps, CurationQueries, Extras, PreferenceQueries, Relational, TimeSeries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry is one operator from the SURVEY §2 inventory (or a
  * beyond-reference extension), paired with an equivalent DuckDB oracle in
  * `oracleSql` where ANSI-SQL-expressible.
  */
object SparkEntry {

  /** Flagship: the full time-series pipeline (stay-index join → bucketize →
    * mean combine → densify) over the events table at sf=0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    TimeSeries.defs("q_ts_densify")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ TimeSeries.defs ++ CorpusOps.defs ++ Extras.defs ++
      CurationQueries.defs ++ PreferenceQueries.defs

  def oracleSql: Map[String, String] =
    Relational.oracles ++ TimeSeries.oracles ++ CorpusOps.oracles ++
      Extras.oracles ++ CurationQueries.oracles ++ PreferenceQueries.oracles
}
