package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sketch-accuracy GATE at ALL THREE SFs (round-9): every sketch
  * surface now has an ORACLED exact companion pinning its group
  * structure (`agg_approx_ngroups_exact`, `agg_hll_merge_exact`,
  * `agg_theta_setops_exact`, `agg_percentiles`, `txt_freq_cms_exact`),
  * and this spec pins the estimates to those exact values — so
  * "rows-only" is now confined to the estimate columns themselves,
  * and an estimator regression fails a named test instead of drifting
  * silently behind the rows-only exemption. */
class SketchBoundSpec extends AnyFunSuite {
  import TestSpark._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => new java.io.File(d).isDirectory)

  test("approx_count_distinct (rsd 0.02) within 5% of the oracled exact " +
    "companion at every SF") {
    for (dir <- dirs) {
      val ap = operators.AggQueries.aggApproxNgroups(spark, dir).head()
      val ex = operators.AggQueries.aggApproxNgroupsExact(spark, dir).head()
      for (i <- 0 to 1) {
        val (a, e) = (ap.getLong(i).toDouble, ex.getLong(i).toDouble)
        assert(math.abs(a - e) <= 0.05 * e, s"$dir col $i: approx $a exact $e")
      }
    }
  }

  test("HLL per-group + merged estimates within 5% of the oracled exact " +
    "companion, key set identical, at every SF") {
    for (dir <- dirs) {
      val est = operators.AggQueries.aggHllMerge(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
      val ex = operators.AggQueries.aggHllMergeExact(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.keySet == ex.keySet, s"$dir: key sets differ")
      for ((k, e) <- ex)
        assert(math.abs(est(k) - e) <= 0.05 * e,
          s"$dir/$k: est ${est(k)} exact $e")
    }
  }

  test("theta set algebra equals the oracled exact companion in the " +
    "exact regime (all probed sets < 4096 entries at test SFs), at " +
    "every SF") {
    for (dir <- dirs) {
      val est = plans.ThetaSets.aggThetaSetops(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ex = plans.ThetaSets.aggThetaSetopsExact(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.keySet == ex.keySet, s"$dir: key sets differ")
      if (ex("union") < 4096)
        assert(est == ex, s"$dir: exact-regime mismatch est=$est ex=$ex")
      else
        for ((k, e) <- ex)
          assert(math.abs(est(k) - e) <= 0.04 * math.max(e, 1L),
            s"$dir/$k: est ${est(k)} exact $e")
    }
  }

  test("percentile_approx (accuracy 10000) lands within the sketch's " +
    "rank guarantee of the oracled exact-percentile companion at " +
    "every SF") {
    import org.apache.spark.sql.functions._
    for (dir <- dirs) {
      // per-product sorted value lists (bounded by the date grain)
      val lists = operators.CoreQueries.dailyBase(spark, dir)
        .groupBy(col("product"))
        .agg(sort_array(collect_list(col("total_quantity"))).as("v"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val ap = operators.AggQueries.aggApproxPercentiles(spark, dir)
        .collect()
      assert(ap.nonEmpty)
      for (r <- ap; (p, ci) <- Seq(0.5 -> 2, 0.9 -> 3, 0.99 -> 4)) {
        val v = lists(r.getString(0))
        val n = v.length
        val est = r.getDouble(ci)
        // rank of the estimate vs target rank: the GK sketch guarantee
        // is rank error <= n/accuracy (+1 for boundary discreteness)
        val target = p * (n - 1)
        val lo = v.count(_ < est) // est's rank range in the sorted list
        val hi = v.count(_ <= est) - 1
        val tol = n.toDouble / 10000.0 + 1.0
        assert(lo - tol <= target && target <= hi + tol,
          s"$dir/${r.getString(0)} p$p: est $est rank [$lo,$hi] target $target")
      }
    }
  }

  test("count-min estimates obey the one-sided CMS guarantee against " +
    "the oracled exact companion (exact <= est <= exact + eps*N) at " +
    "every SF") {
    import org.apache.spark.sql.functions._
    for (dir <- dirs) {
      val rows = operators.TextQueries.txtFreqCms(spark, dir).collect()
      val exact = operators.TextQueries.txtFreqCmsExact(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = Tables.documents(spark, dir)
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("t")).count()
      assert(rows.map(_.getString(0)).toSet == exact.keySet,
        s"$dir: top-20 key sets differ")
      for (r <- rows) {
        val (tok, nEx, nEst) = (r.getString(0), r.getLong(1), r.getLong(2))
        assert(nEx == exact(tok), s"$dir/$tok: companion count drifted")
        assert(nEst >= nEx, s"$dir/$tok: CMS underestimated ($nEst < $nEx)")
        assert(nEst <= nEx + math.ceil(1e-4 * total).toLong,
          s"$dir/$tok: est $nEst exceeds exact $nEx + eps*N")
      }
    }
  }
}
