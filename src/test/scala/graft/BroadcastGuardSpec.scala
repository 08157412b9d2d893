package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The broadcast-doctrine guardrail (plans/BroadcastGuard): a forced
  * broadcast hint on an oversized frame must be stripped (planner
  * demotes to a shuffle join), while a genuinely bounded frame's hint
  * survives. Both checked with the planner's own auto-broadcast OFF so
  * the hint is the ONLY path to a broadcast join — making the
  * strip/keep decision directly visible in the physical plan. */
class BroadcastGuardSpec extends AnyFunSuite {
  import TestSpark._

  private def withGuard[A](maxBytes: Long)(body: => A): A = {
    val prevOpts = spark.experimental.extraOptimizations
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.experimental.extraOptimizations = prevOpts :+ plans.BroadcastGuard
    spark.conf.set(plans.BroadcastGuard.MaxBytesConf, maxBytes.toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.experimental.extraOptimizations = prevOpts
      spark.conf.unset(plans.BroadcastGuard.MaxBytesConf)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("guard strips a forced broadcast of an oversized frame " +
    "(shuffle join instead of a deferred OOM) but keeps bounded hints") {
    withGuard(maxBytes = 16 * 1024) {
      // lineitem (~112 KB of parquet at sf0.001) is over the 16 KB
      // bound: the hint must vanish and, with auto-broadcast off, the
      // join must NOT be a broadcast join
      val big = Tables.orders(spark, sf)
        .join(broadcast(Tables.lineitem(spark, sf)),
          col("o_orderkey") === col("l_orderkey"))
      big.collect()
      val bigPlan = big.queryExecution.executedPlan.toString
      assert(!bigPlan.contains("BroadcastHashJoin"),
        s"oversized forced broadcast survived the guard:\n$bigPlan")
      // nation (~2.7 KB) is bounded: its hint must survive the same
      // guard and produce a broadcast join even with auto-broadcast off
      val small = Tables.customer(spark, sf)
        .join(broadcast(Tables.nation(spark, sf)),
          col("c_nationkey") === col("n_nationkey"))
      small.collect()
      val smallPlan = small.queryExecution.executedPlan.toString
      assert(smallPlan.contains("BroadcastHashJoin"),
        s"bounded broadcast hint was wrongly stripped:\n$smallPlan")
    }
  }

  test("plan-audit BNLJ census: a 1-row scalar-aggregate build side is " +
    "provably bounded; a planted corpus-sized build side is flagged — " +
    "an unbounded BNLJ fails the audit instead of joining the count") {
    // the repo's legitimate shape: crossJoin(broadcast(<global agg>))
    // — the logical Aggregate with no grouping keys proves maxRows = 1
    val scalar = Tables.customer(spark, sf).agg(count(lit(1)).as("n"))
    val bounded = Tables.orders(spark, sf).crossJoin(broadcast(scalar))
    val cb = PlanProbe.census(bounded.queryExecution)
    assert(cb.bnlj >= 1,
      s"fixture lost its nested-loop join: bnlj=${cb.bnlj}")
    assert(cb.violations.isEmpty,
      s"scalar build side wrongly flagged: ${cb.violations}")
    // the hazard the check exists for: a corpus-sized frame forced
    // through a nested-loop broadcast — no provable row bound
    val planted = Tables.orders(spark, sf)
      .crossJoin(broadcast(Tables.customer(spark, sf)))
    val cp = PlanProbe.census(planted.queryExecution)
    assert(cp.bnlj >= 1,
      s"planted fixture lost its nested-loop join: bnlj=${cp.bnlj}")
    assert(cp.violations.nonEmpty,
      "planted unbounded BNLJ build side passed the audit")
    // a bounded LITERAL relation (the codebook/query-set shape) passes
    import spark.implicits._
    val lut = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val lit2 = Tables.orders(spark, sf).crossJoin(broadcast(lut))
    val cl = PlanProbe.census(lit2.queryExecution)
    assert(cl.bnlj >= 1 && cl.violations.isEmpty,
      s"2-row literal build side wrongly flagged: ${cl.violations}")
    // CartesianProduct is counted too (census only — the audit main
    // requires zero): both sides unbounded, no broadcast hint, no
    // equi-keys
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cart = Tables.orders(spark, sf).crossJoin(Tables.customer(spark, sf))
      assert(PlanProbe.census(cart.queryExecution).cartesian >= 1,
        "planted cartesian product not counted")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
  }
}
