package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** M3 — nested/array operators (SURVEY.md §2.C, the reference's signature
  * dimension). The reference's fundamental type is a sale document with an
  * `items: array<struct>` column; here the [[Tables.salesNested]] view
  * rebuilds that genuine nested shape from flat testdata, each operator
  * runs on the real `ArrayType(StructType)`, and the DuckDB oracle states
  * the same result directly from the flat tables (SURVEY.md §7.0).
  *
  * Determinism: `collect_list` order is nondeterministic under shuffle, so
  * every array that reaches output is `array_sort`ed or aggregated
  * order-insensitively (cents fold); arrays are emitted as sorted CSV
  * strings so the oracle can express them with `list_sort` +
  * `array_to_string`.
  *
  * Scale: the re-nest is one shuffle on the sale key; downstream
  * explode+agg pipelines stay in the same stage as the generate. At
  * 100 TB, `collect_list` rows are bounded by basket size (no skew risk
  * here), but wide baskets would push HashAggregate to sort-based
  * fallback — keep re-nesting off the hot path (SURVEY.md §7.3.5).
  */
object NestedQueries {

  /** §2.C `arr_unwind` (dashboard.py:73): `$unwind` items then re-aggregate
    * per product — the nest→explode round trip must reproduce the flat
    * answer exactly (`explode`, not `explode_outer`: Mongo's
    * `preserveNullAndEmptyArrays: false`). */
  val arrUnwind: Q = (spark, dir) =>
    Tables.salesNested(spark, dir)
      .select(explode(col("items")).as("item"))
      .groupBy(col("item.name").as("product"))
      .agg(
        sum(col("item.quantity")).as("total_quantity"),
        (sum(col("item.revenue_cents")) / lit(100.0)).as("total_revenue"))
      .orderBy(col("product"))

  /** §2.C `arr_unwind_outer`: the PRESERVING unwind — Mongo's `$unwind
    * {preserveNullAndEmptyArrays: true}` / pandas explode-keeps-NaN.
    * Orders with no items (257 exist at sf0.01) must survive as a
    * zero row, which plain `explode` silently drops — the semantic
    * difference this operator exists to pin. Implemented as orders
    * LEFT JOIN the nested view + `explode_outer`; re-aggregated per
    * sale so the output is deterministic. */
  val arrUnwindOuter: Q = (spark, dir) =>
    Tables.orders(spark, dir)
      .select(col("o_orderkey").as("sale_id"))
      .join(Tables.salesNested(spark, dir), Seq("sale_id"), "left")
      .select(col("sale_id"), explode_outer(col("items")).as("item"))
      .groupBy(col("sale_id"))
      .agg(
        count(col("item")).as("n_items"),
        coalesce(sum(col("item.quantity")), lit(0.0)).as("total_quantity"))
      .orderBy(col("sale_id"))

  /** §2.C `arr_transform` (dashboard.py:177-185): `$map` items→names,
    * emitted as a sorted CSV (array order itself is not defined). */
  val arrTransform: Q = (spark, dir) =>
    Tables.salesNested(spark, dir)
      .select(
        col("sale_id"),
        array_join(array_sort(transform(col("items"), x => x("name"))), ",")
          .as("item_names"))
      .orderBy(col("sale_id"))

  /** §2.C `arr_distinct_size` (dashboard.py:187-190):
    * `$size($setUnion(names, []))` = distinct item count per sale. */
  val arrDistinctSize: Q = (spark, dir) =>
    Tables.salesNested(spark, dir)
      .select(
        col("sale_id"),
        size(array_distinct(transform(col("items"), x => x("name"))))
          .as("n_products"))
      .orderBy(col("sale_id"))

  /** §2.C `arr_size` (dashboard.py:493): `num_items = len(items)`. */
  val arrSize: Q = (spark, dir) =>
    Tables.salesNested(spark, dir)
      .select(col("sale_id"), size(col("items")).as("num_items"))
      .orderBy(col("sale_id"))

  /** §2.C `arr_agg_nested_sum` (EDA.ipynb:3816 (cell 47)): per-sale revenue
    * computed INSIDE the array with a higher-order `aggregate` fold — no
    * unwind. The fold runs over exact integer cents, so it is independent
    * of the (undefined) array order. */
  val arrAggNestedSum: Q = (spark, dir) =>
    Tables.salesNested(spark, dir)
      .select(
        col("sale_id"),
        (aggregate(col("items"), lit(0L), (acc, x) => acc + x("revenue_cents"))
          / lit(100.0)).as("sale_revenue"))
      .orderBy(col("sale_id"))

  /** §2.C `agg_collect_list` (dashboard.py:479): `$push` re-nest of line
    * numbers per sale, sorted-CSV for order-independence. */
  val aggCollectList: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("sale_id"))
      .agg(array_join(
        transform(array_sort(collect_list(col("l_linenumber"))),
          x => x.cast("string")), ",").as("line_numbers"))
      .orderBy(col("sale_id"))

  /** §2.C `agg_collect_set` (dashboard.py:674): `$addToSet`. */
  val aggCollectSet: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("sale_id"))
      .agg(array_join(array_sort(collect_set(col("l_returnflag"))), ",")
        .as("return_flags"))
      .orderBy(col("sale_id"))

  /** §2.D `agg_group_first` (dashboard.py:467-480): the `dfc` view —
    * unwind → `$group` per sale with 8×`$first` + `$sum` + `$push`.
    * `first` here is over per-sale constants (from the header join), so
    * the value is deterministic even though the function is not. */
  val aggGroupFirst: Q = (spark, dir) => {
    val o  = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey").as("sale_id"))
      .agg(
        first(to_date(col("o_orderdate"))).as("sale_date"),
        first(col("o_orderpriority")).as("purchase_method"),
        (sum(Tables.lineRevenueCents) / lit(100.0)).as("total_revenue"),
        count(lit(1)).as("num_items"))
      .orderBy(col("sale_id"))
  }

  /** §2.C struct access/expansion (dashboard.py:105,531-584): build the
    * customer struct, then read fields with dotted paths — no UDF. */
  val prjStructAccess: Q = (spark, dir) =>
    Tables.salesHeader(spark, dir)
      .select(
        col("o_orderkey"),
        struct(col("c_name").as("name"), col("c_mktsegment").as("segment"),
          col("c_acctbal").as("balance")).as("customer"))
      .select(
        col("o_orderkey"),
        col("customer.name").as("customer_name"),
        col("customer.segment").as("customer_segment"),
        col("customer.balance").as("customer_balance"))
      .orderBy(col("o_orderkey"))

  /** §2.C ext. `arr_zip_dot`: parallel-array arithmetic INSIDE the
    * row — from the nested sale, project the quantity and list-price
    * arrays with `transform`, pair them with `zip_with`, and fold the
    * products with `aggregate` into the order's gross (undiscounted)
    * list value. The HOF triad (transform → zip_with → aggregate) that
    * array-typed feature engineering composes from, proven against a
    * flat-SQL recomputation (the oracle never sees an array).
    *
    * Determinism: quantities are integer-valued and prices go through
    * exact cents, so the fold is an exact long sum — element order
    * inside the array is irrelevant.
    *
    * Scale: everything after the re-nest happens per-row with no
    * shuffle and stays inside whole-stage codegen; the re-nest itself
    * is the one collect_list exchange every nested view shares. */
  val arrZipDot: Q = (spark, dir) => {
    val qty = transform(col("items"), x => x.getField("quantity").cast("long"))
    val pc  = transform(col("items"),
      x => Tables.cents(x.getField("price")).cast("long"))
    Tables.salesNested(spark, dir)
      .select(col("sale_id"), size(col("items")).as("n_items"),
        aggregate(zip_with(qty, pc, (q, c) => q * c), lit(0L),
          (acc, x) => acc + x).as("gross_cents"))
      .orderBy(col("sale_id"))
  }

  def queries: Map[String, Q] = Map(
    "arr_zip_dot"         -> arrZipDot,
    "arr_unwind"          -> arrUnwind,
    "arr_unwind_outer"    -> arrUnwindOuter,
    "arr_transform"       -> arrTransform,
    "arr_distinct_size"   -> arrDistinctSize,
    "arr_size"            -> arrSize,
    "arr_agg_nested_sum"  -> arrAggNestedSum,
    "agg_collect_list"    -> aggCollectList,
    "agg_collect_set"     -> aggCollectSet,
    "agg_group_first"     -> aggGroupFirst,
    "prj_struct_access"   -> prjStructAccess,
  )

  def oracles: Map[String, String] = Map(
    "arr_zip_dot" ->
      """SELECT l_orderkey AS sale_id, count(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)
        |           * CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT))
        |       AS BIGINT) AS gross_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "arr_unwind_outer" ->
      """SELECT o_orderkey AS sale_id, count(l_orderkey) AS n_items,
        |  coalesce(SUM(l_quantity), 0.0) AS total_quantity
        |FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "arr_unwind" ->
      """SELECT p_name AS product, SUM(l_quantity) AS total_quantity,
        |  SUM(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)) / 100.0 AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "arr_transform" ->
      """SELECT l_orderkey AS sale_id,
        |  array_to_string(list_sort(list(p_name)), ',') AS item_names
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "arr_distinct_size" ->
      """SELECT l_orderkey AS sale_id, count(DISTINCT p_name) AS n_products
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "arr_size" ->
      """SELECT l_orderkey AS sale_id, count(*) AS num_items
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "arr_agg_nested_sum" ->
      """SELECT l_orderkey AS sale_id,
        |  SUM(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)) / 100.0 AS sale_revenue
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_collect_list" ->
      """SELECT l_orderkey AS sale_id,
        |  array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_collect_set" ->
      """SELECT l_orderkey AS sale_id,
        |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS return_flags
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_group_first" ->
      """SELECT l_orderkey AS sale_id,
        |  min(CAST(o_orderdate AS DATE)) AS sale_date,
        |  min(o_orderpriority) AS purchase_method,
        |  SUM(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)) / 100.0 AS total_revenue,
        |  count(*) AS num_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "prj_struct_access" ->
      """SELECT o_orderkey, c_name AS customer_name,
        |  c_mktsegment AS customer_segment, c_acctbal AS customer_balance
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
  )
}
