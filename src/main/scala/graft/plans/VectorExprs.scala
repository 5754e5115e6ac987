package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector dot product — the
  * codegen'd form of `aggregate(zip_with(a, b, (x,y) => x*y), 0.0,
  * (acc,x) => acc + x)`, which pays interpreted lambda dispatch per
  * element and dominates the vector operators' runtime (ANN scoring,
  * LSH bucketing, near-dup verification all reduce to dots).
  *
  * Semantics contract (must stay equal to the HOF form, spec-pinned):
  * left-to-right summation of `a(i) * b(i)` in double — bit-identical
  * accumulation order — and NULL when either array is NULL, when any
  * element is NULL, or when lengths differ (`zip_with` pads the shorter
  * side with NULLs, poisoning the HOF sum to NULL).
  *
  * Extension ladder rung (b): registered via [[GraftExtensions]] as
  * `graft_dot`, invoked through `call_function`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_dot requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $res = graft.plans.DotProduct.dot($a, $b);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Shared by interpreted eval and codegen (static dispatch, one call
    * per row). Boxed Double so the three NULL cases stay distinguishable
    * from 0.0. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
