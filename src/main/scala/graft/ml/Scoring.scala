package graft.ml

import graft.{Q, Tables}
import graft.operators.JoinWindowQueries
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Model serving as a dataflow — the reference's serve loop
  * (`dashboard.py:753-757`: load `best_model_{product}.pkl`, predict the
  * next day from the last 14 daily totals) re-expressed so the SAME code
  * path scores a batch frame or a live stream.
  *
  * Shape: features ⋈ [[ModelStore]] catalog (inner equi-join on
  * `product`) → per-partition tree walk. On a streaming features frame
  * this is a stateless stream-static join — no watermark, no state
  * store — so `readStream` feature rows score against the persisted
  * catalog with no separate serving system, and a catalog refresh is
  * just restarting the query against the rewritten store.
  *
  * 100 TB posture: the model catalog never touches the driver and is
  * never broadcast by hint — per-product model rows are DATA-SIZED in
  * the general case (millions of fingerprinted sub-models), so the join
  * is planner-chosen like every other unbounded dim join in this repo.
  * Each executor partition reconstructs a product's trees ONCE per
  * partition (local memo keyed by product), not once per row.
  */
object Scoring {

  /** One scorable observation: the 14-lag vector for (product, day). */
  final case class FeatureRow(product: String, sale_date: java.sql.Date,
      label: Double, x: Seq[Double])

  final case class ScoredRow(product: String, sale_date: java.sql.Date,
      label: Double, family: String, prediction: Double)

  /** The lag-feature matrix as typed scoring rows (batch side; the
    * streaming side feeds the same case class through MemoryStream /
    * readStream). */
  def featureRows(spark: SparkSession, dir: String): Dataset[FeatureRow] = {
    import spark.implicits._
    JoinWindowQueries.winLagFeaturesBase(spark, dir)
      .select(col("product"), col("sale_date"),
        col("total_quantity").cast("double").as("label"),
        array(Forecast.LagCols.map(c => col(c).cast("double")): _*).as("x"))
      .as[FeatureRow]
  }

  /** Score feature rows against a persisted catalog. `features` may be
    * batch OR streaming — the plan is a stateless stream-static join
    * plus a typed mapPartitions, legal in append mode. Products absent
    * from the catalog (unscoreable at train time) drop out of the inner
    * join, mirroring the dashboard's "no model for this product" guard.
    */
  def scoreAgainstStore(spark: SparkSession, modelPath: String,
      features: Dataset[FeatureRow]): Dataset[ScoredRow] = {
    import spark.implicits._
    val models = ModelStore.load(spark, modelPath)
    features.joinWith(models, features("product") === models("product"))
      .mapPartitions { it =>
        // rebuild each product's trees once per partition, not per row
        val memo = scala.collection.mutable.HashMap
          .empty[String, (String, LocalTrees.LocalModel)]
        it.map { case (f, pm) =>
          val (family, m) = memo.getOrElseUpdate(pm.product,
            (pm.family, pm.model))
          val pred = m match {
            // the OLS day-trend winner is DAY-aware: it reads the
            // row's date, not its lag vector (same epoch-day axis the
            // grid fit it on)
            case o: LocalTrees.OlsModel =>
              o.predictDay(f.sale_date.toLocalDate.toEpochDay.toDouble)
            case t => t.predict(f.x.toArray)
          }
          ScoredRow(f.product, f.sale_date, f.label, family, pred)
        }
      }
  }

  /** `ml_stream_score` (rows-only — tree predictions aren't
    * SQL-expressible): the 14-day holdout scored THROUGH the persisted
    * catalog by the stream-capable path above, reported per product as
    * (rows scored, holdout MAE). The registered batch form and the
    * streaming form run the identical function — StreamMlSpec asserts
    * stream ≡ batch ≡ direct in-memory predictions, bit-for-bit. Reuses
    * [[Forecast.persistedStore]], so one train+save serves both ML
    * queries in a session. */
  val mlStreamScore: Q = (spark, dir) => {
    val path = Forecast.persistedStore(spark, dir)
    val maxDate = Tables.lineitem(spark, dir)
      .agg(max(to_date(col("l_shipdate")))).head.getDate(0)
    val testCut = java.sql.Date.valueOf(maxDate.toLocalDate.minusDays(14))
    val holdout = featureRows(spark, dir)
      .filter(col("sale_date") > lit(testCut))
    scoreAgainstStore(spark, path, holdout)
      .groupBy(col("product"))
      .agg(count(lit(1)).as("n_scored"),
        avg(abs(col("label") - col("prediction"))).as("mae"))
      .orderBy(col("product"))
  }

  def queries: Map[String, Q] = Map("ml_stream_score" -> mlStreamScore)
  def oracles: Map[String, String] = Map.empty
}
