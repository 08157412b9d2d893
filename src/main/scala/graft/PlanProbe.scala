package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints formatted plans for the newest operators so the
  * scan schema / pushdown / exchange count can be eyeballed per round.
  * Usage: `sbt "runMain graft.PlanProbe [sfDir]"`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftConf(spark)
    for ((name, fn) <- Seq[(String, Q)](
        "txt_gopher_rules" -> operators.TextQueries.txtGopherRules,
        "pipe_token_budget" -> operators.PipelineOps.pipeTokenBudget,
        "pipe_semdedup" -> operators.SimilarityQueries.pipeSemDedup,
        "prof_embedding_stats" ->
          operators.SimilarityQueries.profEmbeddingStats,
        "sim_knn_ivfpq" -> operators.SimilarityQueries.simKnnIvfPq,
        "sim_index_upsert" -> operators.SimilarityQueries.simIndexUpsert,
        "evt_window_users" -> streaming.EventStreams.evtWindowUsers,
        "evt_anomaly_mad" -> streaming.EventStreams.evtAnomalyMad,
        "prof_cusum_drift" -> operators.AggQueries.profCusumDrift,
        "agg_winsorized_mean" -> operators.AggQueries.aggWinsorizedMean,
        "smp_quality_weighted" ->
          operators.PipelineOps.smpQualityWeighted)) {
      println(s"========== $name ==========")
      println(fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
