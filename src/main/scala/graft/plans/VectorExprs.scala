package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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

/** Native per-vector symmetric int8 quantization — the codegen'd form
  * of `Similarity.quantizeInt8`'s expression chain
  * (`array_max(transform(abs))` + `transform(floor(x/ma*127 + 0.5))`),
  * which pays ~5 interpreted lambda evaluations PER ELEMENT on what is,
  * at 100 TB, a full-corpus scan pass.
  *
  * Semantics contract (equal to the HOF chain, property-pinned in
  * ExtSpec for finite inputs): `q_i = floor(x_i / max|x| · 127 + 0.5)`
  * with left-to-right IEEE double evaluation; max|x| skips NULL
  * elements (array_max semantics); a NULL element quantizes to NULL;
  * an all-NULL, empty, or all-zero vector maps EVERY element
  * (including NULLs) to 0 — exactly the HOF `when(ma === 0 or isnull,
  * transform(_ => 0))` branch. NULL array → NULL.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_quantize8 requires ARRAY<DOUBLE>, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantize8"

  override def nullSafeEval(a: Any): Any =
    QuantizeInt8.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.QuantizeInt8.quantize($a);")

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeInt8 = copy(child = newChild)
}

object QuantizeInt8 {
  /** Shared by interpreted eval and codegen. Two passes: max|x| over
    * non-null elements, then the code emit — null-free vectors take the
    * primitive-array fast path (no boxing). */
  def quantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var ma = 0.0
    var seen = false
    var hasNull = false
    var nonFinite = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) hasNull = true
      else {
        val v = math.abs(a.getDouble(i))
        if (v != v || java.lang.Double.isInfinite(v)) nonFinite = true
        if (!seen || v > ma) { ma = v; seen = true }
      }
      i += 1
    }
    // non-finite elements: the HOF chain raises here too (ANSI cast of
    // the resulting NaN code to int) — fail loudly rather than silently
    // emitting codes whose separate array_max-based scale column
    // disagrees with them
    if (nonFinite)
      throw new IllegalArgumentException(
        "graft_quantize8: non-finite element — quantization undefined " +
          "(filter NaN/Infinity vectors upstream)")
    if (!seen || ma == 0.0) {
      // zero/empty/all-null scale: every slot (incl. nulls) becomes 0
      UnsafeArrayData.fromPrimitiveArray(new Array[Int](n))
    } else if (!hasNull) {
      val out = new Array[Int](n)
      i = 0
      while (i < n) {
        out(i) = math.floor(a.getDouble(i) / ma * 127.0 + 0.5).toInt
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (a.isNullAt(i)) null
          else Integer.valueOf(
            math.floor(a.getDouble(i) / ma * 127.0 + 0.5).toInt)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
