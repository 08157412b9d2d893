package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expression for cosine similarity over
  * `array<double>` — the (b) tier of the custom-operator ladder
  * (SURVEY.md §7.2): a codegen'd tight loop with zero per-element
  * lambda/closure overhead, vs composing `zip_with` + `aggregate`.
  *
  * Semantics match the HOF formulation bit-for-bit: one sequential
  * left-to-right accumulation of dot/na/nb, one sqrt each, one divide —
  * so it hash-matches the same DuckDB oracle (`list_dot_product`-based)
  * as the HOF query. Null if either side is null; mismatched lengths
  * truncate to the shorter (callers validate upstream).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<double>; callers cast (ExpectsInputTypes'
  // AbstractDataType is private[sql] in Spark 4)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i);
         |  double y = $b.getDouble($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over `array<double>` — same codegen'd tight-loop
  * tier as [[CosineSimilarity]], same sequential left-fold accumulation
  * as both the `zip_with`+`aggregate` HOF composition and DuckDB's
  * `list_dot_product` (bit-identical results). Used where only the dot
  * (or its sign — LSH hyperplane tests) is needed: `ArrayAggregate` is
  * CodegenFallback, so an interpreted HOF fold per signature bit is
  * ~10× this expression (measured on dedup_embedding_cosine at sf0.1).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** All-subspace product-quantization encoder in ONE compact expression:
  * codes[s] = argmin_j ‖vec[s·subDim, (s+1)·subDim) − codebook[s·k+j]‖²
  * with ties to the lower code id.
  *
  * Why an expression and not 8 × 64 composed argmin columns: inlining
  * the encode as `array_min(array(struct(dist², code)…))` per subspace
  * expands to 512 tight loops in one generated method — past Janino's
  * 64 KB limit, so whole-stage codegen DISABLES for the stage and the
  * HOF fallback runs interpreted (measured 5.4 s steady-state at sf0.1
  * for 2 000 rows; this expression: one short generated loop nest).
  *
  * Float profile is bit-identical to the composed form (so the DuckDB
  * oracle replay is unchanged): sub-norm and dot are the same
  * ascending left-folds, dist² is the same `sn2 − 2·dot + cn2`
  * three-op sequence with cn2 pre-folded ascending, and the argmin
  * uses `Double.compare` — the same −0.0 < 0.0 total order the
  * struct-min form applied.
  *
  * `codebook` (flattened s·k+j order) and `subspaces` must be FOLDABLE
  * literals — bounded driver-side state, evaluated once per plan. */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val subspaces: Int =
    third.eval().asInstanceOf[Int]
  @transient private lazy val codebook: Array[Array[Double]] = {
    val arr = second.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toDoubleArray())
  }
  @transient private lazy val cn2: Array[Double] = codebook.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  override def nullSafeEval(v: Any, cbIgnored: Any, subsIgnored: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = subspaces
    val k = codebook.length / m
    val subDim = x.numElements() / m
    val codes = new Array[Int](m)
    var si = 0
    while (si < m) {
      var sn2 = 0.0
      var i = 0
      while (i < subDim) {
        val e = x.getDouble(si * subDim + i); sn2 += e * e; i += 1
      }
      var best = 0
      var bestD = 0.0
      var j = 0
      while (j < k) {
        val cent = codebook(si * k + j)
        var dp = 0.0
        var i2 = 0
        while (i2 < subDim) {
          dp += x.getDouble(si * subDim + i2) * cent(i2); i2 += 1
        }
        val d2 = sn2 - 2.0 * dp + cn2(si * k + j)
        if (j == 0 || java.lang.Double.compare(d2, bestD) < 0) {
          bestD = d2; best = j
        }
        j += 1
      }
      codes(si) = best
      si += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][]")
    val cn2Ref = ctx.addReferenceObj("pqCn2", cn2, "double[]")
    val m = subspaces
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val k = ctx.freshName("k"); val subDim = ctx.freshName("subDim")
      val codes = ctx.freshName("codes"); val si = ctx.freshName("si")
      val sn2 = ctx.freshName("sn2"); val i = ctx.freshName("i")
      val e = ctx.freshName("e"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val j = ctx.freshName("j")
      val cent = ctx.freshName("cent"); val dp = ctx.freshName("dp")
      val i2 = ctx.freshName("i2"); val d2 = ctx.freshName("d2")
      s"""
         |int $k = $cbRef.length / $m;
         |int $subDim = $v.numElements() / $m;
         |int[] $codes = new int[$m];
         |for (int $si = 0; $si < $m; $si++) {
         |  double $sn2 = 0.0;
         |  for (int $i = 0; $i < $subDim; $i++) {
         |    double $e = $v.getDouble($si * $subDim + $i);
         |    $sn2 += $e * $e;
         |  }
         |  int $best = 0; double $bestD = 0.0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double[] $cent = $cbRef[$si * $k + $j];
         |    double $dp = 0.0;
         |    for (int $i2 = 0; $i2 < $subDim; $i2++) {
         |      $dp += $v.getDouble($si * $subDim + $i2) * $cent[$i2];
         |    }
         |    double $d2 = $sn2 - 2.0 * $dp + $cn2Ref[$si * $k + $j];
         |    if ($j == 0 || java.lang.Double.compare($d2, $bestD) < 0) {
         |      $bestD = $d2; $best = $j;
         |    }
         |  }
         |  $codes[$si] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorExpressions {

  /** Column-API surface for [[CosineSimilarity]] — resolved through the
    * function registry (Column ⇄ Expression bridging is private[sql] in
    * Spark 4), so call [[register]] or install [[GraftExtensions]] first. */
  def cosine_similarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Column-API surface for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** Column-API surface for [[PqEncode]] — `codebook` and `subspaces`
    * must be literals (`typedLit`/`lit`). */
  def pq_encode(vec: Column, codebook: Column, subspaces: Column): Column =
    call_function("pq_encode", vec, codebook, subspaces)

  /** Runtime registration (`SELECT cosine_similarity(a, b)`), used by
    * GraftConf so every engine session has the function. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode",
      exprs => PqEncode(exprs.head, exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain_long",
      exprs => BloomMightContainLong(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dct_phash",
      exprs => DctPhash(exprs.head), "scala_udf")
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` — the
  * injection path for cluster deployments where sessions are built
  * outside this library. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => PqEncode(exprs.head, exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("bloom_might_contain_long"),
      new ExpressionInfo(classOf[BloomMightContainLong].getName,
        "bloom_might_contain_long"),
      (exprs: Seq[Expression]) => BloomMightContainLong(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dct_phash"),
      new ExpressionInfo(classOf[DctPhash].getName, "dct_phash"),
      (exprs: Seq[Expression]) => DctPhash(exprs.head)))
    // deployment guardrail (opt-in by choosing these extensions): strip
    // forced broadcast hints on frames whose stats exceed the bound —
    // see graft.plans.BroadcastGuard
    e.injectOptimizerRule(_ => graft.plans.BroadcastGuard)
  }
}
