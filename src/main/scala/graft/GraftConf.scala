package graft

import org.apache.spark.sql.SparkSession

/** Engine-wide session tuning, applied by Verify/Bench/tests (and safe
  * to apply in any user session).
  *
  * Rationale (measured at sf0.1 with .explain — see BENCH_NOTES.md):
  *  - `InferFiltersFromGenerate` and constraint propagation both
  *    synthesize notnull/size filters below Generate nodes with the
  *    full generator expression INLINED and un-materialized; for
  *    higher-order-function arrays (shingles, signatures) that re-runs
  *    the tokenizer regex per element access. This testdata has no
  *    nullable columns, so the inferred filters buy nothing.
  *  - AQE stays ON (runtime re-plan, skew handling); shuffle
  *    partitions are set by the caller to match cores (local) or
  *    cluster parallelism.
  */
object GraftConf {
  def apply(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    functions.VectorExpressions.register(spark)
    spark
  }
}
