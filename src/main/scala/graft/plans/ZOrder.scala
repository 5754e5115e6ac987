package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) bit interleave of two 32-bit dimension values into
  * one 64-bit key — the space-filling-curve primitive behind
  * multi-dimensional data layout: sorting by the interleaved key keeps
  * rows close in BOTH dimensions close on disk, so parquet row-group
  * min/max pruning works for filters on either column (a plain sort
  * clusters only its leading column).
  *
  * Extension-ladder rung (b) like [[PolyHash]]: scalar expression with
  * `doGenCode`, registered as `graft_zorder` via [[GraftExtensions]].
  * Inputs are the caller-scaled non-negative dimension ints (see
  * `graft.load.Layout.zValue` for the scaling helper); null if either
  * input is null.
  */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder requires (INT, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZInterleave.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ZInterleave.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZInterleave = copy(left = newLeft, right = newRight)
}

object ZInterleave {

  /** Spread the low 32 bits of `v` to the even bit positions of a long
    * (the classic Morton spread via parallel bit masks). */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** a's bits land on even positions, b's on odd: z = ~interleave. */
  def interleave(a: Int, b: Int): Long =
    spread(a) | (spread(b) << 1)
}
