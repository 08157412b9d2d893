package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join result set equals the plain join (lineitem ⋈ part)") {
    val li = Tables.lineitem(spark, sf)
    val p  = Tables.part(spark, sf)
    val plain = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = plans.SkewJoin.saltedJoin(
        li.withColumnRenamed("l_partkey", "p_partkey"), p, "p_partkey",
        factor = 8,
        largeIdentity = Seq(col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("p_brand")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("join_skew_salted actually shuffles on (key, salt) — the hint " +
    "holds against auto-broadcast") {
    val plan = plans.SkewJoin.joinSkewSalted(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"salted join must not degrade to broadcast (salt would be inert):\n$plan")
    assert(plan.contains("__salt"), "salt column must be in the join key")
  }

  test("salt spreads a hot key across the factor range") {
    import spark.implicits._
    val hot = Seq.tabulate(1000)(i => (42L, i.toLong)).toDF("key", "row_id")
    val salts = hot.select(
      pmod(hash(col("row_id")), lit(8)).as("s")).distinct().count()
    assert(salts == 8)
  }
}
