package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-splits ml_forecast's cost at a given SF — lag
  * pipeline, packed decode + product shuffle, and full grid training —
  * so regressions land on the right stage (BENCH_NOTES' round-2 probe,
  * kept as a runnable main like [[RecallProbe]]).
  *
  * Usage: `sbt "runMain graft.ForecastPhaseProbe [sfDir] [cpus]"`.
  */
object ForecastPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-forecast-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftConf(spark)
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup
    spark.range(100000).selectExpr("sum(id)").collect()
    for (i <- 1 to 2) time(s"lag pipeline (count) #$i") {
      operators.JoinWindowQueries.winLagFeaturesBase(spark, dir).count()
    }
    for (i <- 1 to 2) time(s"maxDate probe #$i") {
      Tables.lineitem(spark, dir)
        .agg(max(to_date(col("l_shipdate")))).head.getDate(0)
    }
    for (i <- 1 to 2) time(s"packed decode + shuffle #$i") {
      operators.JoinWindowQueries.winLagFeaturesBase(spark, dir)
        .select(col("product"), col("sale_date"),
          col("total_quantity").cast("double").as("label"),
          array(ml.Forecast.LagCols.map(c => col(c).cast("double")): _*).as("x"))
        .groupBy(col("product")).agg(count(lit(1))).count()
    }
    for (i <- 1 to 3) time(s"full trainPerProduct #$i") {
      ml.Forecast.trainPerProduct(spark, dir).toDF().count()
    }
    println("[phase] train-stage partitions: " +
      ml.Forecast.trainPerProductModels(spark, dir).rdd.getNumPartitions)
    println("[phase] repartition probe: " +
      operators.JoinWindowQueries.winLagFeaturesBase(spark, dir)
        .repartition(32, col("product"))
        .sortWithinPartitions(col("product"), col("sale_date"))
        .rdd.getNumPartitions)
    println(ml.Forecast.trainPerProductModels(spark, dir)
      .queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("Sort") ||
        l.contains("MapPartitions") || l.contains("Window") ||
        l.contains("AQEShuffleRead") || l.contains("Scan"))
      .mkString("\n"))
    val models = ml.Forecast.trainPerProductModels(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("fprobe").toString
    for (i <- 1 to 2) time(s"ModelStore.save #$i") {
      ml.ModelStore.save(models, s"$tmp/m$i")
    }
    for (i <- 1 to 2) time(s"ModelStore.load+predict #$i") {
      import org.apache.spark.sql.Encoders
      ml.ModelStore.load(spark, s"$tmp/m1")
        .map(pm => pm.model.predict(Array.fill(ml.Forecast.LagCols.length)(0.0)))(Encoders.scalaDouble)
        .toDF("p").count()
    }
    spark.stop()
  }
}
