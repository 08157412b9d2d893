package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints formatted plans so scan schema / pushdown /
  * exchange counts can be eyeballed per round.
  *
  * The probe list is CUMULATIVE (round-9 advice: replacing the list
  * each round silently dropped plan-regression coverage for earlier
  * operators): [[probeNames]] only ever grows, and every name resolves
  * against the full [[SparkEntry.queries]] registry, so a renamed or
  * dropped query fails loudly here instead of fading out. Filter with
  * `SPARK_GRAFT_PLAN_ONLY=name1,name2` while iterating, or set
  * `SPARK_GRAFT_PLAN_ONLY=all` to probe the ENTIRE query surface.
  *
  * Usage: `sbt "runMain graft.PlanProbe [sfDir]"`. */
object PlanProbe {

  /** Every operator any round's probe has covered — append, never
    * replace. */
  val probeNames: Seq[String] = Seq(
    // rounds ≤ 8
    "smp_stratified", "pipe_mixture", "txt_chunk_overlap",
    "pipe_pack_sequences",
    // round 9
    "txt_gopher_rules", "pipe_token_budget", "pipe_semdedup",
    "prof_embedding_stats", "sim_knn_ivfpq", "sim_index_upsert",
    "evt_window_users", "evt_anomaly_mad", "prof_cusum_drift",
    "agg_winsorized_mean", "smp_quality_weighted",
    // round 10
    "mm_dedup_phash", "dedup_substring_spans", "txt_bpe_tokenize",
    "dedup_incremental_near", "sim_kmeans_iter",
    // round 11 — the two new queries plus the store-fed near-dup pair
    // (their scans should be store-parquet reads when the artifact
    // exists, full derivations otherwise)
    "mm_decode_png", "sim_knn_ivf_trained", "dedup_simhash",
    "dedup_minhash_lsh")

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
    val registry = SparkEntry.queries
    val selected = sys.env.get("SPARK_GRAFT_PLAN_ONLY") match {
      case Some("all") => registry.keys.toSeq.sorted
      case Some(csv)   => csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None        => probeNames
    }
    val missing = selected.filterNot(registry.contains)
    require(missing.isEmpty,
      s"PlanProbe names not in SparkEntry.queries: ${missing.mkString(", ")}")
    for (name <- selected) {
      println(s"========== $name ==========")
      println(registry(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
