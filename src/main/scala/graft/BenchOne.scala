package graft
import org.apache.spark.sql.SparkSession

/** Per-query iteration harness: run ONE registered query N times in a
  * warm session and print each iteration's seconds. Separates one-time
  * plan analysis + whole-stage-codegen compilation (iteration 1) from
  * steady-state execution (iterations 2+) — the split that decides
  * whether a slow bench entry is a data-scaling problem (worth
  * restructuring) or a fixed compile cost (amortized to noise on a
  * real corpus).
  *
  *   runMain graft.BenchOne <query> [n] [sfDir]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf(spark)
    GraftConf.applyEnvOverrides(spark) // ablation parity with Bench/Verify
    val fn = SparkEntry.queries(name)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"[benchone] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
    }
    spark.stop()
  }
}
