package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest common prefix length of two strings, in Unicode code points
  * (the unit `length`/`substr` count, so the result plugs directly into
  * substring arithmetic) — as ONE native codegen'd expression.
  *
  * Extension-ladder rung (b) like [[PolyHash]]: the expression-tree form
  * (`split(a, "")` → `zip_with` null-safe compare → `array_position`)
  * materializes two char-per-element string arrays and runs three
  * interpreted HOF passes per row; this walks the UTF-8 bytes once.
  * Measured on the decontamination verify stage (57 k anchor extensions
  * at sf0.1, four LCP evaluations each): the array form dominated the
  * whole query's runtime.
  *
  * Semantics (mirrored by [[graft.ext.Curation]]'s fallback): byte-wise
  * common prefix, counted in COMPLETE code points — a partially matched
  * multi-byte character does not count (UTF-8's self-synchronization
  * makes byte-prefix equality equivalent to code-point-prefix equality).
  * Null input → null, via the standard BinaryExpression contract.
  */
case class StrLcp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lcp requires (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lcp"

  override def nullSafeEval(a: Any, b: Any): Any =
    StrLcp.lcp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.StrLcp.lcp($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): StrLcp = copy(left = newLeft, right = newRight)
}

object StrLcp {
  /** Shared by interpreted eval and codegen (one static call per row).
    * Compares raw UTF-8 bytes — no String materialization — then counts
    * the complete code points inside the common byte prefix. */
  def lcp(a: UTF8String, b: UTF8String): Long = {
    val an = a.numBytes()
    val bn = b.numBytes()
    val n = math.min(an, bn)
    var i = 0
    while (i < n && a.getByte(i) == b.getByte(i)) i += 1
    // i = common prefix length in BYTES; count whole code points in it
    var cp = 0L
    var j = 0
    while (j < i) {
      val w = UTF8String.numBytesForFirstByte(a.getByte(j))
      if (j + w > i) return cp // divergence splits a multi-byte char
      cp += 1
      j += w
    }
    cp
  }
}
