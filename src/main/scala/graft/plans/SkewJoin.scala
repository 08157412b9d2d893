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
}
