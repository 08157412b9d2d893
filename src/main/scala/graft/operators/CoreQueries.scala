package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M0 + M1 (SURVEY.md §7.1): flagship aggregation, projection / filter /
  * scalar-derivation layer, and date/time functions (SURVEY.md §2.B, §2.G).
  *
  * Determinism rules used throughout the engine (needed for the driver's
  * DuckDB hash compare, SURVEY.md §5):
  *  - money sums go through [[Tables.revenueSum]] (per-row exact integer
  *    cents → exact long sum → one final /100.0), so results are
  *    independent of partitioning / add order and bit-match DuckDB;
  *  - integer-valued doubles (quantities, counts) sum exactly in IEEE double,
  *    so plain `sum` is safe;
  *  - every ORDER BY carries a full tie-breaking key.
  */
object CoreQueries {

  /** Unordered daily×product aggregate (SURVEY.md §2.D
    * `agg_daily_product` base, dashboard.py:54-106) — the lineitem ⋈ part
    * join is planner-chosen: part GROWS with the corpus (TPC-H scales it
    * linearly — Tables.scala "salesNested" note), so a forced broadcast
    * hint would eventually OOM at 100 TB. AQE broadcasts it at any SF
    * where it actually fits, and falls back to a shuffled join beyond
    * that. The groupBy is one shuffle on (date, product) with map-side
    * partial aggregation, so the join→partial-agg pipeline stays tight.
    * Kept free of ORDER BY: a global sort is a range exchange + full
    * sort that downstream windows/aggregates would immediately redo on
    * their own keys; only leaf queries order. */
  val dailyBase: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(
        to_date(col("l_shipdate")).as("sale_date"),
        col("p_name").as("product"))
      .agg(
        sum(col("l_quantity")).as("total_quantity"),
        Tables.revenueSum.as("total_revenue"))
  }

  /** Flagship: the ordered daily sales report. */
  val aggDailyProduct: Q = (spark, dir) =>
    dailyBase(spark, dir).orderBy(col("sale_date"), col("product"))

  val aggDailyProductSql: String =
    """SELECT CAST(l_shipdate AS DATE) AS sale_date, p_name AS product,
      |       SUM(l_quantity) AS total_quantity,
      |       SUM(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)) / 100.0 AS total_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** §2.B `prj_project` (dashboard.py:191-199): keep 3 fields, drop the rest.
    * Column pruning reaches the parquet scan (ReadSchema shows 3 cols). */
  val prjProject: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))

  /** §2.B `flt_notnull` (dashboard.py:70): `$match saleDate ≠ null`. */
  val fltNotNull: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))

  /** §2.B `prj_cond_coerce` (dashboard.py:57-67): defensive string→date
    * coercion. Here the "string-typed saleDate" case is produced by
    * formatting, then re-parsed null-safe (try_to_timestamp ≙ Mongo
    * `$toDate`; ANSI mode is on in Spark 4, so the try_ variant is the
    * `onError: null` equivalent). */
  val prjCondCoerce: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        try_to_timestamp(
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
          lit("yyyy-MM-dd HH:mm:ss")).as("sale_ts"))

  /** §2.G `dt_parse_nullsafe` (dashboard.py:645-650): `$dateFromString
    * {onError: null}` — a third of the inputs are garbage and must come
    * back null, not error. */
  val dtParseNullsafe: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        try_to_timestamp(
          when(col("o_orderkey") % 3 === 0, lit("not-a-date"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")),
          lit("yyyy-MM-dd HH:mm:ss")).as("sale_ts"))

  /** §2.B `flt_isin_range` (dashboard.py:268-272): the dashboard master
    * filter — product ∈ selection ∧ start ≤ date ≤ end. Both predicates
    * push down to the parquet scan. */
  val fltIsinRange: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag").isin("A", "R") &&
        col("l_shipdate").between("1996-01-01", "1998-12-31"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_shipdate"))

  /** §2.B `flt_eq` (dashboard.py:351): per-product drill-down equality. */
  val fltEq: Q = (spark, dir) =>
    Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_retailprice"))

  /** `flt_bloom_prefilter` (scale ext.): semi-join reduction via a
    * broadcast bloom sketch — lineitems whose part is in the small-size
    * subset (~18% selectivity here), aggregated per return flag. The
    * SEMANTICS are the plain shuffle semi-join (that is the oracle);
    * the bloom probe ([[graft.functions.BloomMightContainLong]], a
    * codegen'd scan-stage predicate) prefilters the fact side to
    * survivors — true matches plus ~1% false positives — BEFORE any
    * exchange, so the semi-join shuffles ~18% of the fact rows instead
    * of all of them. False positives are removed by the exact join, so
    * result and oracle are unchanged by the sketch.
    *
    * Scale: what ships to executors is the SKETCH (~1.2 bytes/key at
    * 1% fpp), not keeper rows — an order of magnitude more keeper-set
    * headroom than a forced row broadcast, and the exact join after it
    * stays planner-chosen either way (the repo's broadcast doctrine).
    * The keeper count is a distributed count with an O(1) driver
    * result; `stat.bloomFilter` builds executor-side and merges by
    * bitwise OR, so the bits are partition-invariant and the query is
    * replayable. Past ~1e9 keepers the sketch itself is GB-sized —
    * drop the prefilter and let the plain semi-join run. */
  val fltBloomPrefilter: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
    val keepers = Tables.part(spark, dir)
      .filter(col("p_size") < 10)
      .select(col("p_partkey"))
    val bf = keepers.stat.bloomFilter("p_partkey", keepers.count(), 0.01)
    graft.functions.VectorExpressions.register(spark)
    li.where(graft.functions.SketchExpressions.bloom_might_contain_long(
        col("l_partkey"),
        lit(graft.functions.SketchExpressions.serialize(bf))))
      .join(keepers, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
  }

  /** §2.B `prj_safe_div` (dashboard.py:138-142): divide-by-zero-guarded
    * derived column (avg price = revenue/quantity if quantity>0 else 0). */
  val prjSafeDiv: Q = (spark, dir) =>
    dailyBase(spark, dir)
      .withColumn("avg_price",
        when(col("total_quantity") > 0,
          col("total_revenue") / col("total_quantity")).otherwise(lit(0.0)))

  /** §2.G `dt_parts` (dashboard.py:113-116): month / weekday / is_weekend
    * calendar features. `weekday` is pandas-parity Mon=0..Sun=6
    * (SURVEY.md §2.J.3 — Spark's `dayofweek` is Sun=1, deliberately not
    * used). */
  val dtParts: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("sale_date"),
        month(col("o_orderdate")).as("month"),
        weekday(col("o_orderdate")).as("weekday"),
        (weekday(col("o_orderdate")) >= 5).cast("int").as("is_weekend"))

  /** §2.G `dt_format_day` + day-name (dashboard.py:78-83,603). */
  val dtFormatDay: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_str"),
        date_format(col("o_orderdate"), "EEEE").as("day_name"))

  /** §2.G `dt_hour` + `%H:%M:%S` formatting (EDA.ipynb:650 (cell 13),
    * EDA.ipynb:244 (cell 6)): `$hour` and time-of-day string over event
    * time. */
  val dtHour: Q = (spark, dir) =>
    Tables.events(spark, dir)
      .select(col("event_id"), hour(col("ts")).as("hour"),
        date_format(col("ts"), "HH:mm:ss").as("time_str"))

  /** §2.G `dt_week_trunc` (EDA.ipynb:2042 (cell 21)): Monday-anchored
    * weekly revenue rollup (`to_period('W')` parity: both Spark and the
    * oracle truncate to Monday). */
  val dtWeekTrunc: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(to_date(date_trunc("week", col("l_shipdate"))).as("week_start"))
      .agg(Tables.revenueSum.as("weekly_revenue"))
      .orderBy(col("week_start"))

  /** §2.G `dt_offset` (dashboard.py:246-255,717-718): "today" = max(date);
    * derived 6-month and 14-day cutoffs. One-row result, computed with a
    * single full-scan max (no driver-side collect). */
  val dtOffset: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .agg(max(to_date(col("o_orderdate"))).as("max_date"))
      .select(
        col("max_date"),
        add_months(col("max_date"), -6).as("six_months_ago"),
        date_sub(col("max_date"), 14).as("cutoff_14d"))

  /** §2.G ext. `dt_ship_delay`: order-to-ship latency distribution —
    * `datediff` over the orders ⋈ lineitem join, floored to 7-day
    * buckets. The fixture contains NEGATIVE delays, where Spark's
    * `pmod` (floor) and DuckDB's `%` (toward zero) disagree — the
    * oracle replays pmod as `((x % 7) + 7) % 7` so bucket −7 covers
    * [−7,−1) in both engines. The join shuffles on orderkey (or rides
    * the bucketed layout at scale); the histogram is a tiny second
    * aggregate. */
  val dtShipDelay: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
        .as("delay_days"))
      .groupBy((col("delay_days") - pmod(col("delay_days"), lit(7)))
        .as("delay_week_floor"))
      .agg(count(lit(1)).as("n_lines"))
      .orderBy(col("delay_week_floor"))
  }

  /** §2.G ext. `dt_gap_fill`: calendar densification — the step every
    * forecasting pipeline needs BEFORE lag features are honest (a
    * product with no sales on a day has quantity 0 for that day, not a
    * skipped row; the reference inherits pandas' observed-dates-only
    * frame and its lags silently span gaps). Per product: span from its
    * own min/max day, `sequence()` builds the day array IN the row (one
    * array per product, no driver work), `explode` makes the calendar,
    * and a left join back to the daily aggregate zero-fills the holes.
    * Scale: the calendar side is |products| × span-days rows of 12-byte
    * keys — the OUTPUT size itself; the join shuffles on (product, day)
    * like every daily aggregate downstream of it. Revenue-less: the
    * zero-filled frame is the demand series, quantity only. */
  val dtGapFill: Q = (spark, dir) => {
    val daily = dailyBase(spark, dir)
      .select(col("sale_date"), col("product"), col("total_quantity"))
    val cal = daily.groupBy(col("product"))
      .agg(min(col("sale_date")).as("d0"), max(col("sale_date")).as("d1"))
      .select(col("product"),
        explode(sequence(col("d0"), col("d1"))).as("sale_date"))
    cal.join(daily, Seq("product", "sale_date"), "left")
      .select(col("product"), col("sale_date"),
        coalesce(col("total_quantity"), lit(0L)).as("total_quantity"))
      .orderBy(col("product"), col("sale_date"))
  }

  /** §2.G ext. `dt_business_days`: ship latency in BUSINESS days —
    * the SLA metric ops teams actually track (a Friday order shipped
    * Monday is 1 business day late, not 3). Pure closed-form integer
    * arithmetic, no calendar explode: with diff = 7·fw + rem
    * (rem = pmod 7) and d0 = pandas weekday(order) (Mon=0), each full
    * week contributes 5 business days and the ≤6-day remainder loses
    * its Saturday/Sunday iff that weekday falls inside it — weekday w
    * lands in the remainder iff pmod(w − d0 − 1, 7) + 1 ≤ rem (each
    * weekday occurs at most once in <7 days).
    *
    * Determinism: every step is exact integer arithmetic (pmod, an
    * exact multiple-of-7 division); the oracle replays the identical
    * formula with isodow−1.
    *
    * Scale: scan-stage expression on the fact join → a hash aggregate
    * onto a calendar-bounded histogram (± the corpus date span in
    * business days; the testdata's ship dates are not order-coupled,
    * so negatives appear and the signed formula handles them — the
    * [[dtShipDelay]] precedent). No calendar table, no explode, no
    * per-row sequence. */
  val dtBusinessDays: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    businessDaysOn(
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(to_date(col("o_orderdate")).as("order_date"),
          to_date(col("l_shipdate")).as("ship_date")))
  }

  /** [[dtBusinessDays]] over an explicit (order_date, ship_date)
    * frame — the spec plants weekend-straddling pairs with
    * hand-counted business days. */
  private[graft] def businessDaysOn(df: DataFrame): DataFrame = {
    val diff = datediff(col("ship_date"), col("order_date"))
    val rem  = pmod(diff, lit(7))
    val fw   = ((diff - rem) / lit(7)).cast("int")
    val d0   = weekday(col("order_date"))
    def lost(w: Int) =
      when(pmod(lit(w) - d0 - lit(1), lit(7)) + lit(1) <= rem, lit(1))
        .otherwise(lit(0))
    df.select((lit(5) * fw + rem - lost(5) - lost(6)).as("bdays_delay"))
      .groupBy(col("bdays_delay"))
      .agg(count(lit(1)).as("n_lines"))
      .orderBy(col("bdays_delay"))
  }

  def queries: Map[String, Q] = Map(
    "dt_business_days"  -> dtBusinessDays,
    "agg_daily_product" -> aggDailyProduct,
    "dt_gap_fill"       -> dtGapFill,
    "prj_project"       -> prjProject,
    "flt_notnull"       -> fltNotNull,
    "prj_cond_coerce"   -> prjCondCoerce,
    "dt_parse_nullsafe" -> dtParseNullsafe,
    "flt_isin_range"    -> fltIsinRange,
    "flt_eq"            -> fltEq,
    "flt_bloom_prefilter" -> fltBloomPrefilter,
    "prj_safe_div"      -> prjSafeDiv,
    "dt_parts"          -> dtParts,
    "dt_format_day"     -> dtFormatDay,
    "dt_hour"           -> dtHour,
    "dt_week_trunc"     -> dtWeekTrunc,
    "dt_offset"         -> dtOffset,
    "dt_ship_delay"     -> dtShipDelay,
  )

  def oracles: Map[String, String] = Map(
    "agg_daily_product" -> aggDailyProductSql,
    "dt_gap_fill" ->
      ("""WITH daily AS (SELECT sale_date, product, total_quantity
        |FROM (""".stripMargin + aggDailyProductSql + """) t),
        |span AS (SELECT product, min(sale_date) AS d0, max(sale_date) AS d1
        |  FROM daily GROUP BY 1),
        |cal AS (SELECT product,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS sale_date
        |  FROM span)
        |SELECT c.product, c.sale_date,
        |  coalesce(d.total_quantity, 0) AS total_quantity
        |FROM cal c LEFT JOIN daily d
        |  ON c.product = d.product AND c.sale_date = d.sale_date
        |ORDER BY 1, 2""".stripMargin),
    "prj_project" ->
      "SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders",
    "flt_notnull" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate IS NOT NULL""".stripMargin,
    "prj_cond_coerce" ->
      """SELECT o_orderkey,
        |  TRY_CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS sale_ts
        |FROM orders""".stripMargin,
    "dt_parse_nullsafe" ->
      """SELECT o_orderkey,
        |  TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-date'
        |                ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END
        |           AS TIMESTAMP) AS sale_ts
        |FROM orders""".stripMargin,
    "flt_isin_range" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R')
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1998-12-31 00:00:00'""".stripMargin,
    "flt_eq" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
        |WHERE p_brand = 'Brand#13'""".stripMargin,
    "flt_bloom_prefilter" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
        |GROUP BY l_returnflag""".stripMargin,
    "prj_safe_div" ->
      ("""SELECT *, CASE WHEN total_quantity > 0
        |               THEN total_revenue / total_quantity
        |               ELSE 0.0 END AS avg_price
        |FROM (""".stripMargin + aggDailyProductSql + ") t"),
    "dt_parts" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS sale_date,
        |  month(o_orderdate) AS month,
        |  isodow(o_orderdate) - 1 AS weekday,
        |  CAST(isodow(o_orderdate) - 1 >= 5 AS INT) AS is_weekend
        |FROM orders""".stripMargin,
    "dt_format_day" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS day_str,
        |  trim(strftime(o_orderdate, '%A')) AS day_name
        |FROM orders""".stripMargin,
    "dt_hour" ->
      """SELECT event_id, hour(ts) AS hour,
        |  strftime(ts, '%H:%M:%S') AS time_str FROM events""".stripMargin,
    "dt_week_trunc" ->
      """SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week_start,
        |  SUM(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)) / 100.0 AS weekly_revenue
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "dt_business_days" ->
      """WITH d AS (
        |  SELECT datediff('day', CAST(o_orderdate AS DATE),
        |           CAST(l_shipdate AS DATE)) AS diff,
        |         isodow(o_orderdate) - 1 AS d0
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |b AS (
        |  SELECT CAST(5 * ((diff - (((diff % 7) + 7) % 7)) // 7)
        |    + (((diff % 7) + 7) % 7)
        |    - (CASE WHEN ((((5 - d0 - 1) % 7) + 7) % 7) + 1
        |             <= (((diff % 7) + 7) % 7) THEN 1 ELSE 0 END)
        |    - (CASE WHEN ((((6 - d0 - 1) % 7) + 7) % 7) + 1
        |             <= (((diff % 7) + 7) % 7) THEN 1 ELSE 0 END)
        |    AS INT) AS bdays_delay
        |  FROM d)
        |SELECT bdays_delay, count(*) AS n_lines
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "dt_ship_delay" ->
      """SELECT delay_days - (((delay_days % 7) + 7) % 7) AS delay_week_floor,
        |  count(*) AS n_lines
        |FROM (SELECT datediff('day', CAST(o_orderdate AS DATE),
        |        CAST(l_shipdate AS DATE)) AS delay_days
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dt_offset" ->
      """SELECT max_date,
        |  CAST(max_date - INTERVAL 6 MONTH AS DATE) AS six_months_ago,
        |  CAST(max_date - INTERVAL 14 DAY AS DATE) AS cutoff_14d
        |FROM (SELECT CAST(max(o_orderdate) AS DATE) AS max_date FROM orders) t""".stripMargin,
  )
}
