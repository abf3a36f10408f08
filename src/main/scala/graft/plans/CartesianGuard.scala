package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner,
  LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join,
  JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-time guardrail: fail any query whose OPTIMIZED plan contains
  * an unhinted cartesian product — at 100 TB an accidental cross join
  * (typo'd join key, condition lost in a refactor) is not a slow query,
  * it is a cluster-sized outage that surfaces hours in. Spark itself
  * allows them silently (the `spark.sql.crossJoin.enabled` check died in
  * 3.0).
  *
  * Why the OPTIMIZER and not an analysis check rule: (a)
  * `Dataset.join(right, usingColumns)` internally analyzes a
  * condition-less inner join as a column-dedup step, so an analysis-time
  * check false-positives on every using-join (probed); (b) by optimizer
  * time `EliminateResolvedHint` has folded hints into `Join.hint`, making
  * the deliberate-broadcast escape exact; (c) predicate pushdown has
  * already moved every usable equality INTO the join condition, so
  * `condition = None` here really means "no key ties the sides".
  *
  * The escape hatch is the pattern every legitimate cartesian in this
  * engine already uses: `a.crossJoin(broadcast(tinyFrame))` — a broadcast
  * hint on either side marks the product as a deliberate small-side
  * replicate (1-row bound frames, centroid tables, query batches).
  * Toggle with `spark.graft.guard.cartesian=false` for exploratory work.
  *
  * Covered shapes — this is a tripwire, not a proof of safety:
  * condition-less CROSS/INNER/LEFT/RIGHT/FULL joins without a broadcast
  * hint (all plan as cartesian or BroadcastNestedLoopJoin). NOT covered:
  * (a) joins whose only condition is non-equi (e.g. a bare range
  * predicate) — they also plan as BNLJ, but flagging them would break
  * legitimate broadcast range joins ([[graft.ops.RangeJoin]] bins
  * instead, precisely to avoid that shape at scale); (b) joins introduced
  * by rewrites that run AFTER this rule's batch (injected optimizer rules
  * run once, early); (c) semi/anti joins (degenerate without a condition
  * but size-bounded by the left side). Review `.explain` for
  * BroadcastNestedLoopJoin before trusting an unfamiliar plan at scale.
  *
  * Wired via [[graft.functions.GraftExtensions]] `injectOptimizerRule`.
  */
case class CartesianGuard(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get(CartesianGuard.ConfKey, "true").toBoolean)
      plan.foreach {
        // outer joins without a condition plan as BroadcastNestedLoopJoin —
        // the same row-product pathology as a bare cross join, so they are
        // flagged too (see "Covered shapes" in the scaladoc)
        case Join(_, _,
            Cross | Inner | LeftOuter | RightOuter | FullOuter, None, hint)
            if !CartesianGuard.broadcastHinted(hint) =>
          throw new SparkException(
            "[graft] unhinted cartesian product: a cross/condition-less " +
              "join with no broadcast-hinted side never finishes at " +
              "scale. If one side is genuinely small, write " +
              "a.crossJoin(broadcast(b)); to disable this guard for the " +
              s"session set ${CartesianGuard.ConfKey}=false.")
        case _ => ()
      }
    plan
  }
}

object CartesianGuard {
  val ConfKey = "spark.graft.guard.cartesian"

  private def broadcastHinted(hint: JoinHint): Boolean =
    hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
      hint.rightHint.exists(_.strategy.contains(BROADCAST))
}
