package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits) of a string's character distribution, as ONE
  * native single-pass expression — the classic gibberish/boilerplate
  * quality signal for training corpora (natural prose sits near 4-4.5
  * bits/char; `aaaa…` → 0, uniform noise → log2(alphabet)).
  *
  * Extension-ladder rung (b) like [[PolyHash]]: an expression-tree form
  * would need explode + two aggregations (a shuffle per document!);
  * this is per-row, shuffle-free, codegen'd.
  *
  * Semantics contract (mirrored by the DuckDB oracle in SparkEntry):
  * frequencies over Unicode CODE POINTS (= characters for the ASCII
  * corpus), H = log2(n) − Σ cᵢ·log2(cᵢ) / n, empty string → 0.0,
  * null → null. Summation runs in ascending code-point order so the
  * result is deterministic run-to-run; cross-engine float drift from
  * DuckDB's own summation order is absorbed by the query-level 6-dp
  * rounding (≤128 terms of magnitude ≤ n·log2(n) — error ~1e-12).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_entropy requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharEntropy.entropy($c.toString());")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy = copy(child = newChild)
}

object CharEntropy {
  private val InvLn2 = 1.0 / math.log(2.0)

  /** Shared by interpreted eval and codegen (one static call per row).
    * ASCII counts live in a flat array; rarer high code points overflow
    * into a sorted map so iteration order — and therefore the float
    * sum — stays deterministic. */
  def entropy(s: String): Double = {
    if (s.isEmpty) return 0.0
    val ascii = new Array[Long](128)
    var high: java.util.TreeMap[Integer, java.lang.Long] = null
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (high == null) high = new java.util.TreeMap[Integer, java.lang.Long]()
        val cur = high.get(cp)
        high.put(cp, if (cur == null) 1L else cur + 1L)
      }
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) acc += k * (math.log(k.toDouble) * InvLn2)
      c += 1
    }
    if (high != null) {
      val it = high.values().iterator()
      while (it.hasNext) {
        val k: Long = it.next()
        acc += k * (math.log(k.toDouble) * InvLn2)
      }
    }
    math.log(n.toDouble) * InvLn2 - acc / n
  }
}
