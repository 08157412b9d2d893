package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-splits ml_stream_score's cost at a given SF (the
  * r18 verdict's item 3 — the query's ~2.9 s was core-count-INVARIANT,
  * 8-vs-32-core ratio 1.03, and nobody had attributed the fixed
  * overhead): store train/load, the maxDate probe, the lag-feature
  * holdout, the catalog read, the score join + tree walk, and the
  * final aggregate — each on its own clock — plus the per-partition
  * product-multiplicity diagnostic (the scoring memo rebuilds each
  * product's trees once per PARTITION, so partitions × products is the
  * deserialization bill, not products).
  *
  * Usage: `sbt "runMain graft.ScorePhaseProbe [sfDir] [cpus] [reps]"`.
  */
object ScorePhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-score-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftConf(spark)
    def time[A](label: String)(f: => A): A = {
      var r: A = null.asInstanceOf[A]
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        r = f
        println(f"[score] $label%-36s #$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      r
    }
    spark.range(100000).selectExpr("sum(id)").collect() // JIT warmup
    // warm the model store once (training is ml_forecast's cost, not
    // this query's — the bench runs ml_forecast first alphabetically)
    val path = time("persistedStore (train-or-serve)") {
      ml.Forecast.persistedStore(spark, dir)
    }
    time("maxDate probe") {
      Tables.lineitem(spark, dir)
        .agg(max(to_date(col("l_shipdate")))).head.getDate(0)
    }
    val maxDate = Tables.lineitem(spark, dir)
      .agg(max(to_date(col("l_shipdate")))).head.getDate(0)
    val testCut = java.sql.Date.valueOf(maxDate.toLocalDate.minusDays(14))
    time("holdout featureRows (count)") {
      ml.Scoring.featureRows(spark, dir)
        .filter(col("sale_date") > lit(testCut)).count()
    }
    time("catalog read: ModelStore.load (count)") {
      ml.ModelStore.load(spark, path).count()
    }
    time("catalog read, decoded (trees walked)") {
      import org.apache.spark.sql.Encoders
      ml.ModelStore.load(spark, path)
        .map(pm => pm.model.predict(
          Array.fill(ml.Forecast.LagCols.length)(0.0)))(Encoders.scalaDouble)
        .toDF("p").count()
    }
    time("score join + tree walk (count)") {
      val holdout = ml.Scoring.featureRows(spark, dir)
        .filter(col("sale_date") > lit(testCut))
      ml.Scoring.scoreAgainstStore(spark, path, holdout).count()
    }
    time("full ml_stream_score (count)") {
      ml.Scoring.mlStreamScore(spark, dir).count()
    }
    // diagnostics: the memo multiplier — how many (partition, product)
    // pairs the score stage rebuilds trees for, vs distinct products
    val holdout = ml.Scoring.featureRows(spark, dir)
      .filter(col("sale_date") > lit(testCut))
    val scored = ml.Scoring.scoreAgainstStore(spark, path, holdout)
    println("[score] scored partitions: " + scored.rdd.getNumPartitions)
    import spark.implicits._
    val pairs = scored.toDF()
      .withColumn("pid", spark_partition_id())
      .select("pid", "product").distinct().count()
    val prods = scored.toDF().select("product").distinct().count()
    println(s"[score] (partition, product) pairs=$pairs products=$prods")
    println(scored.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Scan") || l.contains("MapPartitions") ||
        l.contains("Window") || l.contains("AQEShuffleRead"))
      .mkString("\n"))
    spark.stop()
  }
}
