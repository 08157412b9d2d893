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
    time("lag pipeline (count)") {
      operators.JoinWindowQueries.winLagFeaturesBase(spark, dir).count()
    }
    time("maxDate probe") {
      Tables.lineitem(spark, dir)
        .agg(max(to_date(col("l_shipdate")))).head.getDate(0)
    }
    time("packed decode + shuffle") {
      operators.JoinWindowQueries.winLagFeaturesBase(spark, dir)
        .select(col("product"), col("sale_date"),
          col("total_quantity").cast("double").as("label"),
          array(ml.Forecast.LagCols.map(c => col(c).cast("double")): _*).as("x"))
        .groupBy(col("product")).agg(count(lit(1))).count()
    }
    time("full trainPerProduct") {
      ml.Forecast.trainPerProduct(spark, dir).toDF().count()
    }
    time("full trainPerProduct (2nd)") {
      ml.Forecast.trainPerProduct(spark, dir).toDF().count()
    }
    spark.stop()
  }
}
