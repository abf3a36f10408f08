package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Skew

/** Salted aggregation/join must be result-identical to the unsalted form. */
class SkewSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  // heavy-hitter: 90% of rows share key 1
  private lazy val skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) (i % 5) + 2L else 1L, i.toDouble)
  }.toDF("k", "v")

  test("saltedAgg equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(skewed, Seq("k"), 16,
        partialAggs = Seq(sum("v").as("s"), count(lit(1)).as("n")),
        finalAggs = Seq(sum("s").as("s"), sum("n").cast("long").as("n")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    // doubles: sums of integral values here, so exact equality holds
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "name")
    val plain = skewed.join(dim, "k").groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", 8).groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
