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
}
