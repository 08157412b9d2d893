package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden invariants for the nested layer (SURVEY.md §5.2): the
  * reference's own correctness practice is cross-pipeline equality of
  * the revenue total (df.ipynb cells 14/15 → $9,894,572.27 on its data);
  * here the same invariant binds the flat, nested-fold, and
  * explode-round-trip pipelines. */
class NestedQueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("unwind → re-nest round trip preserves line counts (dfc identity)") {
    val flat = Tables.lineitem(spark, sf).count()
    val nested = Tables.salesNested(spark, sf)
      .select(sum(size(col("items")))).head.getLong(0)
    assert(flat == nested)
  }

  test("cross-pipeline revenue invariant: flat agg == nested HOF fold == " +
    "explode round trip") {
    val flat = operators.CoreQueries.aggDailyProduct(spark, sf)
      .agg(sum("total_revenue")).head.getDouble(0)
    val fold = operators.NestedQueries.arrAggNestedSum(spark, sf)
      .agg(sum("sale_revenue")).head.getDouble(0)
    val explodePath = operators.NestedQueries.arrUnwind(spark, sf)
      .agg(sum("total_revenue")).head.getDouble(0)
    assert(math.abs(flat - fold) < 1e-6, s"flat=$flat fold=$fold")
    assert(math.abs(flat - explodePath) < 1e-6, s"flat=$flat explode=$explodePath")
  }

  test("explode drops empty arrays (preserveNullAndEmptyArrays=false parity)") {
    import spark.implicits._
    val df = Seq((1, Seq("a", "b")), (2, Seq.empty[String]))
      .toDF("id", "xs")
    val out = df.select(col("id"), explode(col("xs"))).collect()
    assert(out.forall(_.getInt(0) == 1) && out.length == 2)
  }

  test("distinct-size == setUnion semantics on arrays with duplicates") {
    import spark.implicits._
    val df = Seq((1, Seq("a", "b", "a"))).toDF("id", "names")
      .select(size(array_distinct(col("names"))).as("n"))
    assert(df.head.getInt(0) == 2)
  }
}
