package graft.plans

import graft.{Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** One-pass pair-count typed aggregate (SURVEY.md §7.2's justified
  * custom): the alternative physical strategy for the §2.J.1 pair
  * co-occurrence semantics.
  *
  * Shape trade-off vs the posexplode self-join
  * (`JoinWindowQueries.joinPairSelfjoin`):
  *  - the self-join shuffles every within-sale pair occurrence
  *    (Σ C(basket,2) rows) and aggregates after — right when the pair
  *    space is large (many distinct products) or baskets are huge;
  *  - this Aggregator folds each basket into a partition-local
  *    (pair → count) map and shuffles only the per-partition maps —
  *    right when the product dimension is small (the reference has 7
  *    products → ≤28 distinct pairs), making the shuffle O(partitions ×
  *    |pair space|) regardless of row count. At 100 TB with a bounded
  *    catalog this is the winning plan; with an unbounded pair space the
  *    map itself becomes the bottleneck and the self-join wins.
  * Both are registered as queries with the SAME oracle. Measured at
  * sf0.1 in BENCH_NOTES.md.
  */
object PairCount {

  case class Pair(product_1: String, product_2: String, n: Long)

  /** Buffer = mutable (sorted-pair → count) map, kryo-serialized between
    * partial and final aggregation. */
  object PairAgg extends Aggregator[Seq[String],
      mutable.HashMap[(String, String), Long], Seq[Pair]] {

    def zero: mutable.HashMap[(String, String), Long] = mutable.HashMap.empty

    def reduce(b: mutable.HashMap[(String, String), Long],
        names: Seq[String]): mutable.HashMap[(String, String), Long] = {
      val s = names.sorted // combinations(sorted(items), 2) — §2.J.1
      var i = 0
      while (i < s.length) {
        var j = i + 1
        while (j < s.length) {
          val k = (s(i), s(j))
          b.update(k, b.getOrElse(k, 0L) + 1L)
          j += 1
        }
        i += 1
      }
      b
    }

    def merge(a: mutable.HashMap[(String, String), Long],
        b: mutable.HashMap[(String, String), Long]): mutable.HashMap[(String, String), Long] = {
      b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
      a
    }

    def finish(b: mutable.HashMap[(String, String), Long]): Seq[Pair] =
      b.iterator.map { case ((p1, p2), n) => Pair(p1, p2, n) }.toSeq

    def bufferEncoder: Encoder[mutable.HashMap[(String, String), Long]] =
      Encoders.kryo[mutable.HashMap[(String, String), Long]]
    def outputEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
  }

  /** Same semantics and oracle as `join_pair_selfjoin`, via the one-pass
    * Aggregator. */
  val joinPairOnepass: Q = (spark, dir) => {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    val baskets = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(collect_list(col("p_name")).as("names"))
      .select(col("names")).as[Seq[String]]
    val pairs = baskets.select(PairAgg.toColumn) // typed select → Dataset[Seq[Pair]]
      .toDF("pairs")
      .select(explode(col("pairs")).as("p"))
      .select(col("p.product_1"), col("p.product_2"), col("p.n"))
    val total = Tables.orders(spark, dir).agg(count(lit(1)).as("total_sales"))
    pairs.crossJoin(broadcast(total))
      .withColumn("probability", col("n").cast("double") / col("total_sales"))
      .select("product_1", "product_2", "n", "probability")
      .orderBy(col("n").desc, col("product_1"), col("product_2"))
  }

  def queries: Map[String, Q] = Map("join_pair_onepass" -> joinPairOnepass)
}
