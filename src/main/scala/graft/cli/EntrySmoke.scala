package graft.cli

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: a DEFAULT-config session (200 shuffle
  * partitions, no UTC pin, ANSI on — whatever the driver would use) calling
  * `SparkEntry.entry`, expecting rows > 0. Catches any hidden dependency on
  * our own session tuning.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("driver-like")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
