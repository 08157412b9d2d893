package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-splits dedup_components at a given SF. */
object CcPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftConf(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(100000).selectExpr("sum(id)").collect()
    time("jaccard pairs (count)") {
      operators.DedupQueries.dedupNgramJaccard(spark, dir).count()
    }
    time("jaccard pairs 2nd (count)") {
      operators.DedupQueries.dedupNgramJaccard(spark, dir).count()
    }
    time("full dedup_components") {
      operators.DedupQueries.dedupComponents(spark, dir).count()
    }
    time("full dedup_components 2nd") {
      operators.DedupQueries.dedupComponents(spark, dir).count()
    }
    spark.stop()
  }
}
