package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd probe of a count-min sketch riding the plan as a binary
  * literal — the CMS analog of Spark's `BloomFilterMightContain` (which
  * `graft.ext.Bloom` reuses directly; Spark ships no equivalent probe
  * expression for CMS, so this supplies it). Replaces the boxed
  * `udf((v: String) => bc.value.estimateCount(v))` in
  * `graft.ext.Sketches`: the probe stays inside whole-stage codegen and
  * is null-safe by construction.
  *
  * The serialized sketch travels as the left child (a foldable binary
  * literal, the same shape Spark's runtime filter takes once its build
  * subquery has evaluated) and is deserialized AT MOST ONCE PER
  * EXECUTOR: codegen references this expression instance, whose lazy
  * `sketch` field inflates on first probe after the plan ships.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_cms_estimate: the sketch must be a literal")
    else if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate: sketch must be BINARY, got ${left.dataType.sql}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate: value must be STRING, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(
      left.eval().asInstanceOf[Array[Byte]]))

  /** Called from generated code — one static-dispatch call per row. */
  def estimate(v: UTF8String): Long = sketch.estimateCount(v.toString)

  override def nullSafeEval(bytes: Any, v: Any): Any =
    estimate(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this,
      classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.estimate($v);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CmsEstimate = copy(newLeft, newRight)
}
