package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reshaping / membership operators rounding out the pandas-style
  * surface of the reference (SURVEY.md §2 extensions): pivot_table,
  * melt/unpivot, quantile bucketing (qcut/ntile), semi/anti membership
  * joins, and an exponentially-weighted rolling mean.
  *
  * Scale design notes:
  *  - [[rshpPivot]] passes an EXPLICIT pivot value list: without one,
  *    Spark runs a separate distinct-collect job on the pivot column
  *    and inlines the result on the driver — an extra full pass (and
  *    an unbounded-width schema risk) at 100 TB;
  *  - [[winNtile]] partitions its window by priority class — a global
  *    ntile is a single-partition sort of the whole table;
  *  - semi/anti joins shuffle only the join keys' rows and never
  *    replicate matches (no fan-out, no post-join distinct), exactly
  *    what EXISTS / NOT IN compile to;
  *  - [[winEwma]]'s fold runs over a bounded 20-row frame, so state per
  *    key is O(window), and the Horner evaluation order is fixed
  *    left-to-right — the same fold the DuckDB oracle replays
  *    (`list_reduce`), keeping the float math bit-identical.
  */
object ReshapeQueries {

  /** `rshp_pivot`: monthly revenue pivoted by return flag — the
    * pandas `pivot_table(index=month, columns=returnflag)` shape. */
  val rshpPivot: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(date_trunc("month", col("l_shipdate")).cast("date").as("month"),
        col("l_returnflag"), Tables.lineRevenueCents.as("rc"))
      .groupBy(col("month"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("rc")) / lit(100.0))
      .select(col("month"), col("A").as("rev_a"), col("N").as("rev_n"),
        col("R").as("rev_r"))
      .orderBy(col("month"))

  /** `rshp_unpivot`: melt a wide per-flag metric table to long
    * (flag, metric, value) — pandas `melt`. Quantities are integral
    * doubles (exact under any add order); money goes through cents. */
  val rshpUnpivot: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity")).as("qty"),
        Tables.revenueSum.as("revenue"),
        (sum(Tables.cents(col("l_tax"))) / lit(100.0)).as("tax"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("qty"), col("revenue"), col("tax")), "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))

  /** `win_ntile`: order-value quartiles within each priority class
    * (pandas `qcut` per group). The (cents, orderkey) sort key is
    * unique, so bucket assignment is deterministic. */
  val winNtile: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        Tables.cents(col("o_totalprice")).as("tc"))
      .withColumn("quartile", ntile(4).over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("tc"), col("o_orderkey"))))
      .select(col("o_orderkey"), col("o_orderpriority"),
        (col("tc") / lit(100.0)).as("o_total"), col("quartile"))
      .orderBy(col("o_orderkey"))

  /** `join_semi`: customers with at least one urgent order — LEFT SEMI
    * keeps each build row at most once (no fan-out + distinct). */
  val joinSemi: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** `join_anti`: customers with no urgent order — LEFT ANTI is the
    * scalable NOT EXISTS (a null-safe NOT IN subquery degenerates to a
    * nested-loop under null semantics). The urgent filter keeps the
    * result non-degenerate: every fixture customer has SOME order. */
  val joinAnti: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** `win_ewma`: exponentially-weighted mean (α=0.2) of daily product
    * revenue over a trailing 20-day frame. Both numerator and
    * normalizer are LEFT-TO-RIGHT Horner folds over the frame list
    * (num = Σ xᵢ·0.8^(m−i), den = Σ 0.8^k): a window-SUM formulation
    * would leave the add order to the engine's window internals
    * (DuckDB uses segment trees) and break cross-engine float parity;
    * closed-form `pow` differs by ulps across libm builds. The fold is
    * interpreted (HOF), but over ≤20 elements per row it is not a
    * hot-path concern. */
  val winEwma: Q = (spark, dir) => {
    val w = Window.partitionBy(col("product")).orderBy(col("sale_date"))
      .rowsBetween(-19, 0)
    CoreQueries.dailyBase(spark, dir)
      .withColumn("xs", collect_list(col("total_revenue")).over(w))
      .select(col("product"), col("sale_date"),
        Tables.round6(
          expr("aggregate(xs, 0D, (a, x) -> a * 0.8 + x)") /
            expr("aggregate(xs, 0D, (a, x) -> a * 0.8 + 1.0)")).as("ewma20"))
      .orderBy(col("product"), col("sale_date"))
  }

  def queries: Map[String, Q] = Map(
    "rshp_pivot"   -> rshpPivot,
    "rshp_unpivot" -> rshpUnpivot,
    "win_ntile"    -> winNtile,
    "join_semi"    -> joinSemi,
    "join_anti"    -> joinAnti,
    "win_ewma"     -> winEwma,
  )

  def oracles: Map[String, String] = Map(
    "rshp_pivot" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |  SUM(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5))
        |    FILTER (l_returnflag = 'A') / 100.0 AS rev_a,
        |  SUM(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5))
        |    FILTER (l_returnflag = 'N') / 100.0 AS rev_n,
        |  SUM(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5))
        |    FILTER (l_returnflag = 'R') / 100.0 AS rev_r
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "rshp_unpivot" ->
      s"""WITH w AS (
         |  SELECT l_returnflag, SUM(l_quantity) AS qty,
         |    ${Tables.revenueSumSql} AS revenue,
         |    ${Tables.centsSumSql("l_tax")} AS tax
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, metric, value FROM (
         |  SELECT l_returnflag, 'qty' AS metric, qty AS value FROM w
         |  UNION ALL SELECT l_returnflag, 'revenue', revenue FROM w
         |  UNION ALL SELECT l_returnflag, 'tax', tax FROM w)
         |ORDER BY l_returnflag, metric""".stripMargin,
    "win_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        |  floor(o_totalprice * 100.0 + 0.5) / 100.0 AS o_total,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |    ORDER BY floor(o_totalprice * 100.0 + 0.5), o_orderkey) AS INT)
        |    AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "win_ewma" ->
      s"""WITH base AS (
         |  SELECT CAST(l_shipdate AS DATE) AS sale_date, p_name AS product,
         |    ${Tables.revenueSumSql} AS total_revenue
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1, 2),
         |framed AS (
         |  SELECT product, sale_date,
         |    list(total_revenue) OVER (PARTITION BY product
         |      ORDER BY sale_date
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
         |  FROM base)
         |SELECT product, sale_date,
         |  ${Tables.round6Sql(
            // bare 1.0/0.8 literals are DECIMAL in DuckDB — cast to keep
            // the fold in IEEE doubles like the Spark side
            "list_reduce(xs, (a, x) -> a * CAST(0.8 AS DOUBLE) + x) / " +
              "list_reduce(list_transform(xs, x -> CAST(1.0 AS DOUBLE)), " +
              "(a, x) -> a * CAST(0.8 AS DOUBLE) + x)")}
         |    AS ewma20
         |FROM framed ORDER BY product, sale_date""".stripMargin,
  )
}
