package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global ranking — the scalable replacement for
  * Spark's unpartitioned `row_number()` window, which moves the entire
  * dataset into ONE partition (the canonical large-cluster OOM; Spark
  * itself warns "No Partition Defined for Window operation").
  *
  * Two-phase plan, the classic distributed-sort ranking:
  *   1. `repartitionByRange` on the order key → P range-ordered
  *      partitions (range exchange, sampled boundaries);
  *   2. per-partition `row_number()` over a window PARTITIONED by the
  *      materialized partition id — parallel, no data-sized single
  *      partition anywhere;
  *   3. global rank = within-partition row number + the partition's
  *      offset, where offsets are a running sum over the P-row
  *      per-partition count frame (bounded by the partition count, never
  *      by the data) broadcast back.
  *
  * Correctness does NOT depend on where the sampled range boundaries
  * fall: RangePartitioning assigns ascending key ranges to ascending
  * partition ids, so offset + within-rank reproduces the exact global
  * `row_number()` for any boundary placement — callers must supply a
  * TOTAL order (include a unique tie-break key), which is the same
  * requirement a deterministic window `row_number()` has anyway.
  */
object GlobalRank {

  /** Adds `rankCol` = exact global row_number over `order` (must be a
    * total order — include a unique tie-break). */
  def withGlobalRank(df: DataFrame, rankCol: String,
      order: Column*): DataFrame = {
    val ranged = df
      .repartitionByRange(order: _*)
      .withColumn("__gr_pid", spark_partition_id())
    val within = Window.partitionBy(col("__gr_pid")).orderBy(order: _*)
    val withRn = ranged.withColumn("__gr_rn", row_number().over(within))
    // bounded-global-window: P rows — one per range partition; the
    // running-sum window is over the PARTITION-COUNT frame, not the
    // data (the expected WindowExec single-partition warning is this
    // P-row frame). Built from `ranged`
    // (not the windowed frame) so the offsets branch re-uses the range
    // exchange without re-running the within-partition sort.
    //
    // The IDENTITY limit stamps the bound INTO THE PLAN (round-19,
    // r17 item 6): spark_partition_id() of a keyless repartitionByRange
    // is < the session shuffle-partition count it planned with (AQE
    // may only coalesce, never grow, that exchange), so the limit
    // never drops a row — it exists so the frame carries a logical
    // maxRows and PlanProbe's unpartitioned-window census can prove
    // the bounded-global-window doctrine instead of trusting scaladoc.
    val offsets = ranged
      .groupBy(col("__gr_pid")).agg(count(lit(1)).as("__gr_cnt"))
      .limit(df.sparkSession.sessionState.conf.numShufflePartitions)
      .withColumn("__gr_offset",
        coalesce(sum(col("__gr_cnt")).over(
          Window.orderBy(col("__gr_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gr_pid"), col("__gr_offset"))
    withRn.join(broadcast(offsets), Seq("__gr_pid"))
      .withColumn(rankCol, col("__gr_offset") + col("__gr_rn"))
      .drop("__gr_pid", "__gr_rn", "__gr_offset")
  }

  /** `win_global_rank`: every order ranked globally by value (ties
    * broken by orderkey) — leaderboard/percentile-index shape, oracled
    * against DuckDB's plain unpartitioned `row_number()`: the
    * hash-match PROVES the distributed two-phase rank equals the
    * single-partition semantics it replaces. */
  val winGlobalRank: graft.Q = (spark, dir) => {
    val o = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        graft.Tables.cents(col("o_totalprice")).cast("long")
          .as("price_cents"))
    withGlobalRank(o, "global_rank",
      col("price_cents").desc, col("o_orderkey").asc)
      .orderBy(col("global_rank"))
  }

  /** `agg_gini`: exact Gini coefficient of order-value concentration —
    * the inequality summary a revenue dashboard quotes ("top orders
    * carry X% of value"). G = (2·Σr·y − (n+1)·Σy) / (n·Σy) over the
    * ascending global rank r from [[withGlobalRank]].
    *
    * Determinism: y is exact cents, r the exact global rank; Σr·y
    * accumulates as Decimal(38,0) (the higher-moments doctrine —
    * r·y ≈ n²·y overflows a long past ~10⁸ rows), so both engines
    * agree on the integers and the final division is one IEEE op,
    * round6'd. Rank ties are impossible (total order), and equal
    * values contribute y·Σr invariantly however ties would split.
    *
    * Scale: the rank is the distributed two-phase plan above (no
    * single-partition window); the Gini reduction is one aggregate. */
  val aggGini: graft.Q = (spark, dir) => {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val o = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        graft.Tables.cents(col("o_totalprice")).cast("long").as("y"))
    val one = lit(1).cast(dec)
    withGlobalRank(o, "r", col("y").asc, col("o_orderkey").asc)
      .agg(count(lit(1)).as("n_orders"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("r").cast(dec) * col("y").cast(dec)).as("sry"))
      .select(col("n_orders"),
        graft.Tables.round6(
          (lit(2).cast(dec) * col("sry") -
            (col("n_orders").cast(dec) + one) * col("sy")).cast("double") /
          (col("n_orders").cast(dec) * col("sy")).cast("double"))
          .as("gini"))
  }

  /** `win_global_pctrank`: distributed `percent_rank` — every order's
    * exact value percentile index (rank−1)/(n−1) over the same total
    * order as [[winGlobalRank]], again with no single-partition
    * window. The per-row percentile feature a ranking model trains on.
    * The 1-row count broadcasts; the division is two exact longs. */
  val winGlobalPctRank: graft.Q = (spark, dir) => {
    val o = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        graft.Tables.cents(col("o_totalprice")).cast("long")
          .as("price_cents"))
    val n = o.agg(count(lit(1)).as("n_total"))
    withGlobalRank(o, "global_rank",
      col("price_cents").desc, col("o_orderkey").asc)
      .crossJoin(broadcast(n))
      .select(col("o_orderkey"), col("price_cents"), col("global_rank"),
        // n=1 guard: (rank−1)/(n−1) is 0/0 on a single-row input; SQL's
        // percent_rank convention is 0.0, mirrored in the oracle
        when(col("n_total") > lit(1L),
          (col("global_rank") - lit(1L)).cast("double") /
            (col("n_total") - lit(1L)).cast("double"))
          .otherwise(lit(0.0)).as("pct_rank"))
      .orderBy(col("global_rank"))
  }

  def queries: Map[String, graft.Q] = Map(
    "win_global_rank" -> winGlobalRank,
    "win_global_pctrank" -> winGlobalPctRank,
    "agg_gini"        -> aggGini,
  )

  def oracles: Map[String, String] = Map(
    "win_global_rank" ->
      """SELECT o_orderkey,
        |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
        |  CAST(row_number() OVER (
        |    ORDER BY floor(o_totalprice * 100.0 + 0.5) DESC, o_orderkey)
        |    AS BIGINT) AS global_rank
        |FROM orders ORDER BY global_rank""".stripMargin,
    "win_global_pctrank" ->
      """SELECT o_orderkey,
        |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
        |  CAST(row_number() OVER w AS BIGINT) AS global_rank,
        |  CASE WHEN (SELECT count(*) FROM orders) > 1
        |       THEN CAST(row_number() OVER w - 1 AS DOUBLE)
        |         / CAST((SELECT count(*) FROM orders) - 1 AS DOUBLE)
        |       ELSE 0.0 END AS pct_rank
        |FROM orders
        |WINDOW w AS (ORDER BY floor(o_totalprice * 100.0 + 0.5) DESC,
        |             o_orderkey)
        |ORDER BY global_rank""".stripMargin,
    "agg_gini" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
        |  FROM orders),
        |r AS (
        |  SELECT y, row_number() OVER (ORDER BY y, o_orderkey) AS r
        |  FROM o),
        |s AS (
        |  SELECT count(*) AS n, SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(r AS HUGEINT) * y) AS sry
        |  FROM r)
        |SELECT n AS n_orders,
        |  floor(CAST(2 * sry - (n + 1) * sy AS DOUBLE)
        |        / CAST(n * sy AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |    AS gini
        |FROM s""".stripMargin,
  )
}
