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
  private val ExcludedRule =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def apply(spark: SparkSession): SparkSession = {
    // append, don't clobber: the session owner may have excluded rules
    val merged = spark.conf.getOption("spark.sql.optimizer.excludedRules")
      .map(_.trim).filter(_.nonEmpty) match {
      case Some(r) if r.split(",").map(_.trim).contains(ExcludedRule) => r
      case Some(r) => s"$r,$ExcludedRule"
      case None    => ExcludedRule
    }
    spark.conf.set("spark.sql.optimizer.excludedRules", merged)
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    // The driver's events.ts parquet type has changed across testdata
    // regenerations (INT64 TIMESTAMP(NANOS) rounds ≤6, naive
    // timestamp[us] round 7+). Keep nanosAsLong on: it makes the nanos
    // variant readable (Spark 4 rejects it otherwise) and is a no-op for
    // every other type. Tables.normalizeEventTs branches on the actual
    // inferred type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Write timestamps as INT64 micros, not legacy INT96: INT96 columns
    // carry NO parquet min/max statistics, so every time-predicate scan
    // over a sink loses row-group/file pruning (snk_zorder_prune's
    // footer-band spec would be unprunable). Micros is also what the
    // read side and DuckDB agree on.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    functions.VectorExpressions.register(spark)
    spark
  }

  /** Experiment hook shared by the Verify and Bench mains:
    * `SPARK_GRAFT_CONF` is a comma-separated list of `k=v` session-conf
    * overrides (e.g. `spark.sql.adaptive.enabled=false` for an AQE-off
    * invariance audit); unset for driver runs. Blank segments (a
    * set-but-empty var, a trailing comma) are no-ops; a NON-blank
    * segment without `=` is a typo'd ablation and fails LOUDLY — a
    * silently-dropped override would record baseline numbers labeled
    * as the ablation. */
  def applyEnvOverrides(spark: SparkSession): Unit =
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(',')
      .map(_.trim).filter(_.nonEmpty).foreach { kv =>
        require(kv.contains("="),
          s"SPARK_GRAFT_CONF entry '$kv' is not k=v")
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
}
