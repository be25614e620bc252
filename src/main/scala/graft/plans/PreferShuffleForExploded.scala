package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: never broadcast a join side that contains a Generate
  * (explode) below it with no cardinality-resetting operator in between.
  *
  * Why (measured, not guessed — BASELINE.md round 3): Spark's size
  * estimation propagates a Generate's CHILD size as the Generate's own
  * size, so an exploded side looks broadcast-small to the static planner
  * no matter how many rows the explode fans out. On the shingle self-join
  * (q55) that chose a broadcast whose 1.3M-row driver-side hash build
  * dominated the query (2.7–9 s vs 1.2 s for the shuffled plan) — and at
  * cluster scale the same mistake OOMs the driver. The in-query fix is a
  * per-call `hint("shuffle_hash")`; this rule is the engine-level form:
  * installed via [[graft.functions.GraftExtensions]], it stamps a
  * SHUFFLE_HASH hint on any un-hinted equi-join side whose subtree
  * contains a Generate that still determines the side's cardinality
  * (no Aggregate/Join/Limit between the join input and the Generate).
  *
  * Runs in the operator-optimization batch, after EliminateResolvedHint —
  * so writing the JoinHint directly on the Join node is the supported way
  * to reach join selection, and user-supplied hints are never overridden.
  */
object PreferShuffleForExploded extends Rule[LogicalPlan] {

  /** The Generate's fan-out still defines this subtree's row count: stop
    * descending at operators that reset cardinality or carry their own
    * stats (Aggregate, Join, Limit, leaf relations). */
  private def explodeDriven(p: LogicalPlan): Boolean = p match {
    case _: Generate => true
    case _: Aggregate | _: Join | _: GlobalLimit | _: LocalLimit => false
    case _: LeafNode => false
    case other => other.children.exists(explodeDriven)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, _, _, JoinHint(None, None))
        if explodeDriven(left) || explodeDriven(right) =>
      val mk = Some(HintInfo(strategy = Some(SHUFFLE_HASH)))
      j.copy(hint = JoinHint(
        if (explodeDriven(left)) mk else None,
        if (explodeDriven(right)) mk else None))
  }
}
