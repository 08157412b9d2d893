package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] — the scan-stage half of
  * the bloom-prefiltered semi-join (`flt_bloom_prefilter`).
  *
  * The filter arrives as a binary literal (its serialized bits), is
  * deserialized ONCE per executor lazily, and codegen probes it with a
  * direct `mightContainLong` call — no per-row deserialization, no UDF
  * boxing. `mightContain` can return false positives (rate set at build
  * time) but never false negatives, so a prefilter with it is sound
  * exactly when an exact verify (the real semi-join) runs on the
  * survivors — which is how flt_bloom_prefilter composes it.
  *
  * Scale: the sketch is ~1.2 bytes/key at 1% fpp, so a keeper set that
  * is 10-100x past the row-broadcast budget still ships to every
  * executor as a compact reference object; beyond ~1e9 keys the sketch
  * itself is GB-sized and the plain shuffle semi-join is the right
  * plan. Spark's own AQE runtime filter (InjectRuntimeFilter) applies
  * the same idea automatically to shuffle joins it can see through;
  * the explicit operator form covers the cases it does not: a filter
  * built once and reused across many queries, or persisted next to the
  * dataset like an index.
  */
case class BloomMightContainLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(right.eval().asInstanceOf[Array[Byte]])

  override def nullSafeEval(v: Any, bitsIgnored: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainLong =
    copy(left = newLeft, right = newRight)
}

object SketchExpressions {

  /** Column-API surface for [[BloomMightContainLong]] — `bits` must be a
    * binary literal (`lit(filter.writeTo(...))`). */
  def bloom_might_contain_long(key: Column, bits: Column): Column =
    call_function("bloom_might_contain_long", key, bits)

  /** Serialize a built filter for embedding as a plan literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
