package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink-layout invariants the oracle can't see: the partitioned write
  * must actually prune at read time, and the ORC round trip must be
  * bit-exact (not merely aggregate-equal). */
class SourceSinkSpec extends AnyFunSuite {
  import TestSpark._

  test("partitioned sink: the month predicate resolves as a partition " +
    "filter (directory pruning), not a row filter") {
    val df = sources.SourceQueries.snkPartitionedPrune(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: ["), scan)
    // the month predicate must appear INSIDE PartitionFilters …
    val pf = scan.linesIterator.find(_.contains("PartitionFilters:")).get
    assert(pf.contains("month"), s"month not a partition filter: $pf")
    // … and NOT as a pushed/data filter on the row scan (in the plain
    // plan string PartitionFilters and PushedFilters share a line — cut
    // at the marker and inspect only the bracket group after it)
    val pushed = scan.split("PushedFilters: \\[").drop(1)
      .map(_.takeWhile(_ != ']'))
    assert(pushed.nonEmpty && pushed.forall(!_.contains("month")),
      s"month leaked into row filters: ${pushed.mkString("; ")}")
    assert(df.count() > 0)
  }

  test("ORC round trip is row-exact, not just aggregate-equal") {
    val base = operators.CoreQueries.dailyBase(spark, sf)
      .orderBy(col("sale_date"), col("product")).collect()
    val out = s"target/tmp/orc_exact_${sf.replaceAll("[^a-zA-Z0-9]", "_")}"
    operators.CoreQueries.dailyBase(spark, sf)
      .write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
      .orderBy(col("sale_date"), col("product")).collect()
    assert(back.toSeq == base.toSeq,
      "ORC must round-trip doubles and dates bit-exactly")
  }
}
