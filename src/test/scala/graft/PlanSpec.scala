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

  test("pin coverage is total: every gate query audited, no stale pins") {
    val qs = graft.SparkEntry.queries.keySet
    val pins = graft.cli.ExplainCheck.expectations.keySet
    assert((qs -- pins).isEmpty,
      s"gates without a plan pin: ${(qs -- pins).toSeq.sorted.mkString(", ")}")
    assert((pins -- qs).isEmpty,
      s"pins without a gate: ${(pins -- qs).toSeq.sorted.mkString(", ")}")
  }

  test("kCore lineage stays linear at rounds=30") {
    val spark = SparkTest.session
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // a small cycle graph (everything survives a k=2 peel) — the point is
    // the PLAN of the 30-round loop, not the data
    val n = 12L
    val edges = spark.range(n).select(
      org.apache.spark.sql.functions.col("id").as("a"),
      ((org.apache.spark.sql.functions.col("id") + 1) % n).as("b"))
    val scoped = graft.ops.Graph.kCoreScoped(edges, k = 2, rounds = 30)
    try {
      val joins = scoped.df.queryExecution.optimizedPlan.collect {
        case j: Join => j
      }.length
      // the windowed peel references the previous state once per round,
      // so a 30-round plan holds 60 window nodes and a CONSTANT number
      // of joins (edge prep + final report) — the join formulation this
      // replaced doubled the tree per round (~2^30 join nodes)
      assert(joins <= 8, s"kCore lineage not linear: $joins joins")
      // and the result is still the full 2-core
      assert(scoped.df.where(org.apache.spark.sql.functions.col("in_core"))
        .count() == n)
    } finally scoped.release()
  }

  test("cartesian guard refuses unhinted products; whole engine is guard-clean") {
    import org.apache.spark.sql.functions.broadcast
    SparkTest.session // ensure the shared context exists first
    val guarded = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .create()
    try {
      val a = guarded.range(5)
      val b = guarded.range(5)
      def trips(body: => Any): Unit = {
        val e = intercept[Exception](body)
        assert(e.getMessage.contains("unhinted cartesian"), e.getMessage)
      }
      trips(a.crossJoin(b).count())
      // condition-less inner join is the same trap, incl. through SQL
      trips(a.join(b).count())
      a.createOrReplaceTempView("ga"); b.createOrReplaceTempView("gb")
      trips(guarded.sql("SELECT * FROM ga, gb").count())
      // the documented escapes pass
      assert(a.crossJoin(broadcast(b)).count() == 25)
      assert(a.join(b, Seq("id")).count() == 5) // using-join untouched
      guarded.conf.set(graft.plans.CartesianGuard.ConfKey, "false")
      assert(a.crossJoin(b).count() == 25)
      guarded.conf.set(graft.plans.CartesianGuard.ConfKey, "true")
      // and the registered SQL functions still resolve in the same session
      assert(guarded.sql("SELECT float_dot(array(1.0f,2.0f), array(3.0f,4.0f))")
        .head().getDouble(0) == 11.0)
      // every engine query OPTIMIZES clean under the guard: each legitimate
      // cartesian in the inventory is broadcast-hinted, none slips through
      val sfDir = "/root/testdata/sf0.001"
      SparkEntry.queries.foreach { case (name, fn) =>
        try fn(guarded, sfDir).queryExecution.optimizedPlan
        catch { case e: Exception if e.getMessage != null &&
            e.getMessage.contains("unhinted cartesian") =>
          fail(s"$name tripped the cartesian guard: ${e.getMessage}")
        }
      }
    } finally guarded.conf.set(graft.plans.CartesianGuard.ConfKey, "true")
  }
}
