package graft

import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB plan-shape contract as a test: pushdown reaches the scans,
  * dimension joins broadcast, top-k plans as TakeOrderedAndProject (never a
  * global window), signature aggs run as ObjectHashAggregate, and nothing
  * degenerates into a cartesian product. Same expectations as the
  * `graft.cli.ExplainCheck` CLI — here so a plan regression fails `sbt test`.
  */
class PlanSpec extends AnyFunSuite {

  test("physical plans keep their scale-critical shapes (sf0.001)") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      "driver testdata not present")
    val failures = graft.cli.ExplainCheck.audit(SparkTest.session, sfDir)
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
