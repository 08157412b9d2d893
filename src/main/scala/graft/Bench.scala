package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf(spark)
    // JIT/codegen warmup so the first measured query doesn't absorb
    // JVM startup; queries run in sorted name order so per-query
    // numbers are comparable across rounds (Map order shifts when
    // keys are added). The sf0.001 pass exercises the heavy codegen
    // families (tokenizer/shingle, vector expressions, windows) —
    // measured ~4 s of one-time compilation otherwise lands on
    // whichever family's first query runs it (CcPhaseProbe: jaccard
    // 6.6 s cold vs 2.6 s warm).
    spark.range(100000).selectExpr("sum(id)").collect()
    val warmDir = "/root/testdata/sf0.001"
    for (q <- Seq("dedup_ngram_jaccard", "sim_knn_brute", "agg_daily_product",
        "evt_sessionize", "txt_chunk_overlap"))
      try SparkEntry.queries(q)(spark, warmDir).count()
      catch { case _: Throwable => () }
    // Each entry is either a seconds Double or the string "err" — a
    // failing query must be visible in the output, not silently timed.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
                 false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) elapsed.toString else "\"err\"")
    }
    // Seconds at 3 decimals: a short line survives the driver's tail
    // capture (the r02 query map was truncated mid-line).
    def fmt(v: String): String =
      if (v == "\"err\"") v else f"${v.toDouble}%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val nErr = results.count(_._2 == "\"err\"")
    val ok = results.filter(_._2 != "\"err\"")
    val total = ok.map(_._2.toDouble).sum
    // per-family subtotals (family = name prefix before first '_')
    val fams = ok.groupBy(_._1.takeWhile(_ != '_')).toSeq.sortBy(_._1)
      .map { case (f, rs) => "\"" + f + "\":" + f"${rs.map(_._2.toDouble).sum}%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","errors":$nErr,"families":$fams,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
