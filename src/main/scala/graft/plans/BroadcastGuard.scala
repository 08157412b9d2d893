package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer guardrail for the repo's broadcast doctrine (SURVEY §4,
  * BENCH_NOTES "Scale posture"): a forced `broadcast()` hint on a
  * data-sized frame is a deferred OOM — it works at every SF where the
  * frame happens to fit, then kills the job at the SF where it
  * doesn't, bypassing the planner's own size checks. Rounds 4–6
  * removed eleven such hints by hand; this rule is that review as an
  * automated invariant: any join-side broadcast hint whose plan-stats
  * size exceeds `graft.broadcastGuard.maxBytes` (default 256 MiB, far
  * above any genuinely bounded dimension) is STRIPPED, demoting the
  * join to the planner's choice — a shuffle join instead of an
  * executor OOM. Bounded hints (nation/region, 1-row scalars, literal
  * codebooks) pass through untouched.
  *
  * OPT-IN, not wired into GraftConf: plan statistics for typed
  * (object-producing) subtrees are coarse estimates, and a guard that
  * mis-sizes a genuinely bounded frame would silently de-optimize it.
  * Install it where sessions face untrusted query code:
  * `spark.experimental.extraOptimizations ++= Seq(BroadcastGuard)`
  * on a live session, or `GraftExtensions` (spark.sql.extensions) for
  * cluster deployments. Runs after `EliminateResolvedHint`, so it
  * matches the `JoinHint` already attached to the join node.
  */
object BroadcastGuard extends Rule[LogicalPlan] {

  val MaxBytesConf = "graft.broadcastGuard.maxBytes"
  val DefaultMaxBytes: Long = 256L << 20

  private def oversized(side: LogicalPlan, max: BigInt): Boolean =
    side.stats.sizeInBytes > max

  private def strip(h: Option[HintInfo], side: LogicalPlan, max: BigInt,
      which: String): Option[HintInfo] =
    h match {
      case Some(hi) if hi.strategy.contains(BROADCAST) &&
          oversized(side, max) =>
        logWarning(s"graft.BroadcastGuard: dropping forced broadcast of " +
          s"$which join side with estimated size " +
          s"${side.stats.sizeInBytes} > $max bytes")
        val rest = hi.copy(strategy = None)
        if (rest == HintInfo()) None else Some(rest)
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val max = BigInt(conf.getConfString(MaxBytesConf,
      DefaultMaxBytes.toString).toLong)
    plan.transformUp {
      case j @ Join(l, r, _, _, JoinHint(lh, rh)) =>
        val nl = strip(lh, l, max, "left")
        val nr = strip(rh, r, max, "right")
        if ((nl eq lh) && (nr eq rh)) j
        else if (nl == lh && nr == rh) j
        else j.copy(hint = JoinHint(nl, nr))
    }
  }
}
