package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the reshape/membership operators beyond what the
  * DuckDB oracle checks: partition/balance properties and plan shape. */
class ReshapeSpec extends AnyFunSuite {
  import TestSpark._

  test("pivot row totals equal the unpivoted revenue total") {
    val p = operators.ReshapeQueries.rshpPivot(spark, sf)
      .agg(sum(coalesce(col("rev_a"), lit(0.0)) +
        coalesce(col("rev_n"), lit(0.0)) +
        coalesce(col("rev_r"), lit(0.0)))).head.getDouble(0)
    val total = Tables.lineitem(spark, sf)
      .agg(Tables.revenueSum).head.getDouble(0)
    assert(math.abs(p - total) < 1e-4, s"pivot $p vs total $total")
  }

  test("explicit pivot values avoid the driver-side distinct pass: one " +
    "aggregate pair in the plan") {
    // A values-less pivot runs a separate collect job for the column's
    // distinct values before planning; with explicit values the plan is
    // a single partial+final aggregate over the scan.
    val plan = operators.ReshapeQueries.rshpPivot(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CollectLimit"), plan)
  }

  test("ntile quartiles are balanced within every priority class") {
    val sizes = operators.ReshapeQueries.winNtile(spark, sf)
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n")).collect()
    sizes.groupBy(_.getString(0)).foreach { case (prio, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4))
      val ns = rs.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$prio quartiles unbalanced: ${ns.toSeq}")
    }
  }

  test("semi and anti on the same predicate partition the customer set") {
    val total = Tables.customer(spark, sf).count()
    val semi = operators.ReshapeQueries.joinSemi(spark, sf).count()
    val anti = operators.ReshapeQueries.joinAnti(spark, sf).count()
    assert(semi > 0 && anti > 0, s"degenerate fixture: semi=$semi anti=$anti")
    assert(semi + anti == total)
  }

  test("ewma of each product's first day equals that day's revenue; " +
    "ewma stays within the frame's min/max") {
    val base = operators.CoreQueries.dailyBase(spark, sf)
    val firstDays = base.groupBy(col("product"))
      .agg(min(col("sale_date")).as("sale_date"))
      .join(base, Seq("product", "sale_date"))
      .select(col("product"), col("sale_date"),
        Tables.round6(col("total_revenue")).as("expect"))
    val ewma = operators.ReshapeQueries.winEwma(spark, sf)
    val joined = ewma.join(firstDays, Seq("product", "sale_date")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("ewma20") - r.getAs[Double]("expect")) < 1e-6)
    }
    val bounds = ewma.join(base, Seq("product", "sale_date"))
      .groupBy(col("product"))
      .agg(min(col("total_revenue")).as("lo"), max(col("total_revenue")).as("hi"),
        min(col("ewma20")).as("elo"), max(col("ewma20")).as("ehi")).collect()
    bounds.foreach { r =>
      assert(r.getAs[Double]("elo") >= r.getAs[Double]("lo") - 1e-6)
      assert(r.getAs[Double]("ehi") <= r.getAs[Double]("hi") + 1e-6)
    }
  }

  test("pii redaction: every customer identifier is masked and no digit " +
    "survives in the redacted name") {
    val rows = operators.TextQueries.txtPiiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("n_digit_runs").toLong).sum >= rows.length,
      "every Customer#NNN name has at least one digit run")
    assert(rows.forall(r =>
      !r.getAs[String]("redacted_name").exists(_.isDigit)))
  }
}
