package graft.plans

import graft.{Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k typed aggregate (§2.F alternative physical strategy):
  * per-group top-k WITHOUT the ranked-window shape.
  *
  * The window form (`JoinWindowQueries.topkHeadPerGroup`) shuffles and
  * sorts EVERY group member to rank the top 10 — at 100 TB that is a
  * full sort of the customer file per segment. This Aggregator keeps a
  * ≤k sorted buffer per group: partial aggregation runs map-side, so
  * each upstream partition contributes at most k entries per group to
  * the shuffle, and once a partition's buffer saturates, rows worse
  * than its floor are dropped in O(1). Shuffle volume becomes
  * O(partitions × groups × k) independent of row count — the same
  * partial-vs-full trade [[PairCount]] documents for pairs, applied to
  * ranking. Measured at sf0.1 (15k customers): window 0.89 s vs heap
  * 1.23 s — the full sort is tiny there while the typed aggregate pays
  * kryo buffer round-trips; the crossover favors the heap as group
  * membership grows past what fits a partition's sort buffer (the
  * window form's shuffle is ALL members, the heap's stays k per
  * partition). Registered with the SAME oracle as topk_head_per_group:
  * the two plans must be result-identical. */
object TopK {

  val K = 10

  /** (custkey, revenue-cents); ordered revenue desc, custkey asc —
    * identical to the window form's (desc, asc) rank ordering. */
  type E = (Long, Long)
  private def better(a: E, b: E): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  object TopKAgg extends Aggregator[E, List[E], Seq[E]] {
    def zero: List[E] = Nil

    def reduce(buf: List[E], e: E): List[E] =
      if (buf.lengthCompare(K) >= 0 && better(buf.last, e)) buf // O(1) drop
      else {
        val (hi, lo) = buf.span(better(_, e))
        (hi ::: e :: lo).take(K)
      }

    def merge(a: List[E], b: List[E]): List[E] =
      b.foldLeft(a)(reduce)

    def finish(buf: List[E]): Seq[E] = buf

    def bufferEncoder: Encoder[List[E]] = Encoders.kryo[List[E]]
    def outputEncoder: Encoder[Seq[E]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[E]]()
  }

  /** Same semantics and oracle as `topk_head_per_group`, via the
    * bounded-buffer aggregate: top-10 customers by revenue per market
    * segment. */
  val topkHeapPerGroup: Q = (spark, dir) => {
    import spark.implicits._
    val perCustomer = Tables.salesHeader(spark, dir)
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(sum(Tables.cents(col("o_totalprice"))).cast("long").as("rev_cents"))
      .select(col("c_mktsegment"), col("o_custkey"), col("rev_cents"))
      .as[(String, Long, Long)]
    perCustomer
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(TopKAgg.toColumn.name("top"))
      .flatMap { case (seg, top) =>
        top.iterator.zipWithIndex.map { case ((ck, rc), i) =>
          (seg, ck, rc / 100.0, i + 1)
        }
      }
      .toDF("c_mktsegment", "o_custkey", "customer_revenue", "rank")
      .orderBy(col("c_mktsegment"), col("rank"))
  }

  def queries: Map[String, Q] = Map("topk_heap_per_group" -> topkHeapPerGroup)
}
