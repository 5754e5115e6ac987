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

/** Anchor-extension kernel for the substring-decontamination verify:
  * given two strings and a matching k-char anchor at 1-based CHAR
  * positions (p, q), walk LEFT from the anchor while code points match
  * and RIGHT from its end while they match, entirely over the UTF-8
  * buffers — zero substring/reverse materialization. Returns
  * `(left << 32) | right` (both counts < 2^31 by string-length bounds);
  * the caller unpacks with shiftright/mask.
  *
  * This replaces four per-row `substr` copies (two of them `reverse`d)
  * plus two [[StrLcp]] walks — the measured hot stage of the
  * contamination queries (742 k anchors × ~300-char texts at sf0.1). */
case class StrExtend(str1: Expression, str2: Expression, p: Expression,
    q: Expression, k: Expression) extends Expression {
  import org.apache.spark.sql.catalyst.InternalRow

  override def children: Seq[Expression] = Seq(str1, str2, p, q, k)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = str1.dataType == StringType && str2.dataType == StringType &&
      children.drop(2).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_extend requires (STRING, STRING, BIGINT, BIGINT, BIGINT), " +
        s"got (${children.map(_.dataType.sql).mkString(", ")})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_extend"

  override def eval(input: InternalRow): Any = {
    val a = str1.eval(input)
    val b = str2.eval(input)
    val pv = p.eval(input)
    val qv = q.eval(input)
    val kv = k.eval(input)
    if (a == null || b == null || pv == null || qv == null || kv == null)
      null
    else StrExtend.extend(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], pv.asInstanceOf[Long],
      qv.asInstanceOf[Long], kv.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cs = children.map(_.genCode(ctx))
    ev.copy(code = code"""
      ${cs(0).code}
      ${cs(1).code}
      ${cs(2).code}
      ${cs(3).code}
      ${cs(4).code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${cs(0).isNull} && !${cs(1).isNull} && !${cs(2).isNull} &&
          !${cs(3).isNull} && !${cs(4).isNull}) {
        ${ev.isNull} = false;
        ${ev.value} = graft.plans.StrExtend.extend(
          ${cs(0).value}, ${cs(1).value}, ${cs(2).value},
          ${cs(3).value}, ${cs(4).value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): StrExtend =
    StrExtend(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4))
}

object StrExtend {
  private def sameBytes(a: UTF8String, ia: Int, b: UTF8String, ib: Int,
      w: Int): Boolean = {
    var i = 0
    while (i < w) {
      if (a.getByte(ia + i) != b.getByte(ib + i)) return false
      i += 1
    }
    true
  }

  /** One static call per row, shared by interpreted eval and codegen.
    * Walks are code-point-aligned: backward steps skip UTF-8 trailing
    * bytes to the previous char start, forward steps compare whole
    * code points (width + bytes), so a partially matched multi-byte
    * char never counts — same contract as [[StrLcp.lcp]]. */
  def extend(a: UTF8String, b: UTF8String, p: Long, q: Long,
      k: Long): Long = {
    val an = a.numBytes()
    val bn = b.numBytes()
    // byte offset of the 1-based char position
    def off(s: UTF8String, n: Int, pos: Long): Int = {
      var o = 0
      var c = 1L
      while (c < pos && o < n) {
        o += UTF8String.numBytesForFirstByte(s.getByte(o)); c += 1
      }
      o
    }
    val ap = off(a, an, p)
    val bq = off(b, bn, q)
    // LEFT: previous code points while equal
    var left = 0L
    var ia = ap
    var ib = bq
    var cont = true
    while (cont && ia > 0 && ib > 0) {
      var pa = ia - 1
      while (pa > 0 && (a.getByte(pa) & 0xC0) == 0x80) pa -= 1
      var pb = ib - 1
      while (pb > 0 && (b.getByte(pb) & 0xC0) == 0x80) pb -= 1
      val wa = ia - pa
      if (wa == ib - pb && sameBytes(a, pa, b, pb, wa)) {
        left += 1; ia = pa; ib = pb
      } else cont = false
    }
    // RIGHT: advance past the k anchor chars, then walk forward
    var ra = ap
    var rb = bq
    var i = 0L
    while (i < k && ra < an && rb < bn) {
      ra += UTF8String.numBytesForFirstByte(a.getByte(ra))
      rb += UTF8String.numBytesForFirstByte(b.getByte(rb))
      i += 1
    }
    var right = 0L
    cont = true
    while (cont && ra < an && rb < bn) {
      val wa = UTF8String.numBytesForFirstByte(a.getByte(ra))
      val wb = UTF8String.numBytesForFirstByte(b.getByte(rb))
      if (wa == wb && ra + wa <= an && rb + wb <= bn &&
          sameBytes(a, ra, b, rb, wa)) {
        right += 1; ra += wa; rb += wb
      } else cont = false
    }
    (left << 32) | right
  }
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
