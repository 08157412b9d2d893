package graft.ml

/** Minimal deterministic in-executor regression-tree ensembles (CART
  * with variance-reduction splits; bagged random forest; squared-loss
  * gradient boosting) for per-group model fitting inside
  * `flatMapGroups`.
  *
  * Why not MLlib here: MLlib estimators orchestrate from the driver —
  * fitting one model per key ("best_model_{product}", EDA.ipynb cell
  * 69) through the driver serializes thousands of tiny distributed
  * jobs whose scheduling overhead dwarfs the math (measured: 146 s at
  * sf0.1). The scale shape for millions of small models is grouped
  * LOCAL training: one shuffle by key, then each group trains
  * in-process inside its executor task — exactly how the reference's
  * per-product sklearn fits run (in-process on pandas slices).
  *
  * Determinism: single-threaded per group, seeded xorshift for
  * bootstrap/feature sampling, ties broken by lowest feature index /
  * first threshold — identical results at any parallelism.
  */
object LocalTrees {

  /** Leaf iff feature < 0. */
  final case class Node(feature: Int, thr: Double, left: Node, right: Node,
      value: Double) {
    def predict(x: Array[Double]): Double =
      if (feature < 0) value
      else if (x(feature) <= thr) left.predict(x) else right.predict(x)
  }

  sealed trait LocalModel { def predict(x: Array[Double]): Double }

  final case class RfModel(trees: Array[Node]) extends LocalModel {
    def predict(x: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < trees.length) { s += trees(i).predict(x); i += 1 }
      s / trees.length
    }
  }

  final case class GbtModel(f0: Double, shrinkage: Double,
      trees: Array[Node]) extends LocalModel {
    def predict(x: Array[Double]): Double = {
      var s = f0; var i = 0
      while (i < trees.length) { s += shrinkage * trees(i).predict(x); i += 1 }
      s
    }
  }

  /** Deterministic xorshift64* PRNG (seed must be nonzero). */
  private final class XorShift(seed: Long) {
    private var s: Long = if (seed == 0L) 0x9E3779B97F4A7C15L else seed
    def nextLong(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545F4914F6CDD1DL
    }
    def nextInt(n: Int): Int = {
      val v = (nextLong() >>> 1) % n
      v.toInt
    }
  }

  private val MinLeaf = 2

  /** Best (feature, threshold) by SSE reduction over `idx`, scanning a
    * sorted order per candidate feature with prefix sums. Returns
    * feature = -1 if no split improves.
    *
    * Hot path: rows are ordered per feature by sorting packed longs
    * (order-preserving float32 bits ≪ 32 | row index) with the
    * primitive `Arrays.sort` into a shared scratch buffer — the boxed
    * `sortBy` this replaces was ~50× slower and dominated per-product
    * training. Ties (equal float32 keys) order by row index, so trees
    * are deterministic. */
  private def fitTree(xs: Array[Array[Double]], y: Array[Double],
      idx: Array[Int], depth: Int, nFeat: Int, rng: XorShift,
      scratch: Array[Long]): Node = {
    val n = idx.length
    var sum = 0.0
    var i = 0
    while (i < n) { sum += y(idx(i)); i += 1 }
    val mean = sum / n
    if (depth <= 0 || n < 2 * MinLeaf) return Node(-1, 0, null, null, mean)

    val nFeatures = xs(idx(0)).length
    // feature subset: deterministic partial Fisher-Yates, then sorted so
    // the scan order (and tie-break) is independent of shuffle order
    val feats = Array.tabulate(nFeatures)(identity)
    var k = 0
    while (k < math.min(nFeat, nFeatures)) {
      val j = k + rng.nextInt(nFeatures - k)
      val t = feats(k); feats(k) = feats(j); feats(j) = t
      k += 1
    }
    val cand = feats.take(math.min(nFeat, nFeatures)).sorted

    var bestFeat = -1
    var bestThr = 0.0
    var bestScore = Double.NegativeInfinity // SSE reduction proxy
    var c = 0
    while (c < cand.length) {
      val f = cand(c)
      var j = 0
      while (j < n) {
        val r = idx(j)
        val b = java.lang.Float.floatToIntBits(xs(r)(f).toFloat)
        val ord = if (b < 0) ~b else b | 0x80000000
        scratch(j) = (ord.toLong << 32) | (r.toLong & 0xFFFFFFFFL)
        j += 1
      }
      java.util.Arrays.sort(scratch, 0, n)
      var leftSum = 0.0
      j = 0
      while (j < n - 1) {
        val rj = (scratch(j) & 0xFFFFFFFFL).toInt
        val rk = (scratch(j + 1) & 0xFFFFFFFFL).toInt
        leftSum += y(rj)
        val nl = j + 1
        val nr = n - nl
        if (nl >= MinLeaf && nr >= MinLeaf && xs(rj)(f) < xs(rk)(f)) {
          // maximizing nl*meanL² + nr*meanR² ⇔ minimizing SSE
          val rightSum = sum - leftSum
          val score = leftSum * leftSum / nl + rightSum * rightSum / nr
          if (score > bestScore + 1e-12) {
            bestScore = score
            bestFeat = f
            bestThr = (xs(rj)(f) + xs(rk)(f)) / 2.0
          }
        }
        j += 1
      }
      c += 1
    }
    if (bestFeat < 0) return Node(-1, 0, null, null, mean)
    val leftIdx = idx.filter(r => xs(r)(bestFeat) <= bestThr)
    val rightIdx = idx.filter(r => xs(r)(bestFeat) > bestThr)
    if (leftIdx.isEmpty || rightIdx.isEmpty) return Node(-1, 0, null, null, mean)
    Node(bestFeat, bestThr,
      fitTree(xs, y, leftIdx, depth - 1, nFeat, rng, scratch),
      fitTree(xs, y, rightIdx, depth - 1, nFeat, rng, scratch),
      mean)
  }

  /** Bagged random forest: bootstrap rows per tree, √p features per
    * node-ish (per tree here — sampled once per tree for determinism). */
  def fitRf(xs: Array[Array[Double]], y: Array[Double], numTrees: Int,
      maxDepth: Int, seed: Long): RfModel = {
    val n = xs.length
    val p = xs(0).length
    val nFeat = math.max(1, math.ceil(math.sqrt(p.toDouble)).toInt + 1)
    val scratch = new Array[Long](n)
    val trees = Array.tabulate(numTrees) { t =>
      val rng = new XorShift(seed * 0x9E3779B9L + t + 1)
      val boot = Array.fill(n)(rng.nextInt(n))
      fitTree(xs, y, boot, maxDepth, nFeat, rng, scratch)
    }
    RfModel(trees)
  }

  /** Squared-loss gradient boosting: mean prior + shrunken residual
    * trees on all rows/features (no sampling — deterministic). */
  def fitGbt(xs: Array[Array[Double]], y: Array[Double], numIter: Int,
      maxDepth: Int, seed: Long, shrinkage: Double = 0.1): GbtModel = {
    val n = xs.length
    val p = xs(0).length
    val f0 = y.sum / n
    val pred = Array.fill(n)(f0)
    val resid = new Array[Double](n)
    val all = Array.tabulate(n)(identity)
    val scratch = new Array[Long](n)
    val trees = new Array[Node](numIter)
    var t = 0
    while (t < numIter) {
      var i = 0
      while (i < n) { resid(i) = y(i) - pred(i); i += 1 }
      val rng = new XorShift(seed * 0x9E3779B9L + 7919L * (t + 1))
      val tree = fitTree(xs, resid, all, maxDepth, p, rng, scratch)
      trees(t) = tree
      i = 0
      while (i < n) { pred(i) += shrinkage * tree.predict(xs(i)); i += 1 }
      t += 1
    }
    GbtModel(f0, shrinkage, trees)
  }
}
