package graft.ml

import org.apache.spark.sql.{Dataset, SparkSession}

/** Per-product model persistence — the reference's serve path: EDA.ipynb
  * cell 69 (`EDA.ipynb:5657`) dumps one `best_model_{product}.pkl` per
  * product and `dashboard.py:753-757` loads the requested product's model
  * at serve time.
  *
  * [[LocalTrees]] models are plain case-class trees, so persistence is a
  * schema'd parquet dataset rather than opaque pickles: each tree is
  * flattened preorder into (feature, thr, value, left, right) node rows.
  * Doubles round-trip parquet bit-exactly, so a reloaded model predicts
  * BIT-IDENTICALLY (asserted in StreamMlSpec's save/load round trip).
  *
  * Written `partitionBy(product)`: one directory per product ≙ one pkl
  * per product, and the serve-time "load the model for product X" is a
  * partition-pruned read of a single small file — no full-catalog scan
  * even with millions of persisted models.
  */
object ModelStore {

  /** One flattened tree node. `feature < 0` marks a leaf (left/right
    * are -1); otherwise left/right index into the tree's preorder
    * node array. */
  final case class FlatNode(feature: Int, thr: Double, value: Double,
      left: Int, right: Int)

  final case class SavedTree(nodes: Seq[FlatNode])

  /** One product's persisted winner: the selection metadata (the
    * [[Forecast.ProductWinner]] row) plus the refit model itself.
    * f0/shrinkage are meaningful for GBT only; RF averages its trees. */
  final case class ProductModel(product: String, family: String,
      config: String, val_mape: Double, n_test: Long, test_mape: Double,
      rmse: Double, f0: Double, shrinkage: Double, trees: Seq[SavedTree]) {

    def winner: Forecast.ProductWinner = Forecast.ProductWinner(
      product, family, config, val_mape, n_test, test_mape, rmse)

    /** Reconstruct the runnable model — the exact inverse of
      * [[ModelStore.toSaved]]. */
    def model: LocalTrees.LocalModel = {
      val ts = trees.map(t => unflatten(t.nodes.toIndexedSeq)).toArray
      family match {
        case "rf"  => LocalTrees.RfModel(ts)
        case "gbt" => LocalTrees.GbtModel(f0, shrinkage, ts)
        // OLS day-trend winner: (b0, b1) ride the two scalar slots,
        // zero trees — doubles round-trip parquet bit-exactly here too
        case "ols" => LocalTrees.OlsModel(f0, shrinkage)
      }
    }
  }

  private[ml] def flatten(root: LocalTrees.Node): SavedTree = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[FlatNode]
    def go(n: LocalTrees.Node): Int = {
      val id = buf.length
      buf += FlatNode(n.feature, n.thr, n.value, -1, -1)
      if (n.feature >= 0) {
        val l = go(n.left)
        val r = go(n.right)
        buf(id) = FlatNode(n.feature, n.thr, n.value, l, r)
      }
      id
    }
    go(root)
    SavedTree(buf.toSeq)
  }

  private[ml] def unflatten(nodes: IndexedSeq[FlatNode]): LocalTrees.Node = {
    def build(i: Int): LocalTrees.Node = {
      val fn = nodes(i)
      if (fn.feature < 0) LocalTrees.Node(-1, 0, null, null, fn.value)
      else LocalTrees.Node(fn.feature, fn.thr, build(fn.left),
        build(fn.right), fn.value)
    }
    build(0)
  }

  /** Serializable form of a trained winner. */
  def toSaved(w: Forecast.ProductWinner,
      m: LocalTrees.LocalModel): ProductModel = m match {
    case LocalTrees.RfModel(trees) =>
      ProductModel(w.product, w.family, w.config, w.val_mape, w.n_test,
        w.test_mape, w.rmse, f0 = 0.0, shrinkage = 0.0,
        trees.map(flatten).toSeq)
    case LocalTrees.GbtModel(f0, shrinkage, trees) =>
      ProductModel(w.product, w.family, w.config, w.val_mape, w.n_test,
        w.test_mape, w.rmse, f0, shrinkage, trees.map(flatten).toSeq)
    case LocalTrees.OlsModel(b0, b1) =>
      ProductModel(w.product, w.family, w.config, w.val_mape, w.n_test,
        w.test_mape, w.rmse, f0 = b0, shrinkage = b1, trees = Seq.empty)
  }

  def save(models: Dataset[ProductModel], path: String): Unit =
    models.write.mode("overwrite").partitionBy("product").parquet(path)

  def load(spark: SparkSession, path: String): Dataset[ProductModel] = {
    import spark.implicits._
    // Explicit schema, so the `product` partition column is read as a
    // string by declaration. Left to partition-column type inference, an
    // all-numeric product catalog would be inferred numeric and keys
    // like "0123" would reload as "123" after the as[ProductModel]
    // upcast — silently corrupting round-trip fidelity.
    spark.read.schema(implicitly[org.apache.spark.sql.Encoder[ProductModel]].schema)
      .parquet(path).as[ProductModel]
  }
}
