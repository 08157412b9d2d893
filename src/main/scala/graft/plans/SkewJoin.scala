package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual fallback when AQE's
  * skew-join split isn't enough — e.g. one customer/shingle/bucket key
  * holding >1% of a 100 TB fact table).
  *
  * Shape: the skewed (large) side gets a random-but-deterministic salt
  * in [0, factor); the small side is replicated `factor`× with every
  * salt value; the join key becomes (key, salt), spreading one hot
  * key's rows over `factor` reducers. Result set is identical to the
  * unsalted join (SkewJoinSpec asserts it).
  *
  * Salt derivation is `pmod(hash(<row identity cols>), factor)` —
  * deterministic (no rand(): retries/speculative tasks must agree), and
  * uniform across a hot key's rows as long as the identity columns
  * distinguish them.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      factor: Int, largeIdentity: Seq[Column]): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(largeIdentity: _*), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** `join_skew_salted`: the salted join as a driver query — brand
    * revenue through an 8-way salted lineitem ⋈ part join. The oracle
    * is the PLAIN join aggregate: salting must be invisible in the
    * result (same rows, same hashes), only the shuffle key layout
    * changes. The small side is deliberately NOT broadcast here — the
    * salt path exists for dimension tables too big to broadcast but
    * joined on a skewed fact key. */
  val joinSkewSalted: graft.Q = (spark, dir) => {
    val li = graft.Tables.lineitem(spark, dir)
      .withColumnRenamed("l_partkey", "p_partkey")
    // SHUFFLE_HASH hint: without it the fixture-sized dim auto-
    // broadcasts and the salt never actually distributes anything —
    // the hint forces the shuffled join the salt exists for (the
    // at-scale shape where the dim exceeds the broadcast threshold).
    val p = graft.Tables.part(spark, dir).hint("shuffle_hash")
    saltedJoin(li, p, "p_partkey", factor = 8,
      largeIdentity = Seq(col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("p_brand"))
      .agg(
        sum(col("l_quantity")).as("total_quantity"),
        graft.Tables.revenueSum.as("total_revenue"))
      .orderBy(col("p_brand"))
  }

  def queries: Map[String, graft.Q] = Map(
    "join_skew_salted" -> joinSkewSalted)

  def oracles: Map[String, String] = Map(
    "join_skew_salted" ->
      s"""SELECT p_brand, SUM(l_quantity) AS total_quantity,
         |  ${graft.Tables.revenueSumSql} AS total_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
