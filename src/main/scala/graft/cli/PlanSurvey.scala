package graft.cli

import org.apache.spark.sql.SparkSession

/** Scratch auditor's helper: one line per query naming which signature plan
  * nodes appear — input for authoring ExplainCheck expectations.
  */
object PlanSurvey {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-plansurvey")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val frags = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "CartesianProduct", "BroadcastNestedLoopJoin", "Window", "Generate",
      "HashAggregate", "ObjectHashAggregate", "SortAggregate",
      "TakeOrderedAndProject", "Expand", "Batched: true", "PushedFilters: [")
    val names = args.drop(1)
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(s"PLAN|$n|" + frags.filter(plan.contains).mkString(","))
      } catch { case e: Throwable => println(s"PLAN|$n|ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
