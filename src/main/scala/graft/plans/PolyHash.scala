package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial rolling hash
  * (base 31, mod 1e9+7 over Unicode code points) — the codegen'd form of
  * `TextAnalysis.polyFingerprint`'s `aggregate(split(text,''), ...)`
  * chain, which pays interpreted-lambda dispatch per character.
  *
  * Semantics contract (must stay equal to the expression form and the
  * DuckDB oracle): fold left over the string's Unicode CODE POINTS with
  * `acc = (acc * 31 + codepoint) % 1_000_000_007`, empty string → 0,
  * null → null. Code points, not UTF-16 units: `split(text, '')` never
  * splits a surrogate pair and Spark's `ascii` returns `codePointAt`,
  * so unit-wise iteration would diverge on non-BMP text (emoji).
  *
  * This is extension ladder rung (b) from the build brief: a scalar
  * `Expression` with `doGenCode`, registered via
  * [[GraftExtensions]] (`spark.sql.extensions=graft.plans.GraftExtensions`)
  * and invoked with `call_function("graft_polyhash", col)`.
  */
case class PolyHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("phStr")
      val i = ctx.freshName("phIdx")
      val cp = ctx.freshName("phCp")
      val acc = ctx.freshName("phAcc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + (long) $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Mod = 1000000007L

  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp.toLong) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Winnowing-style fingerprint as ONE native pass: the minimum
  * [[PolyHash]] over every `k`-code-point window of the string. The
  * expression-tree form (`transform(sequence(...), i => hash(substr))`)
  * pays an interpreted lambda per window; this emits a tight nested
  * loop in codegen. Contract matches
  * `TextAnalysis.minKgramFingerprint`: windows over CODE POINTS,
  * whole-string hash when the text is shorter than `k`. */
case class MinKgramHash(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, "window size must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minkgram requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_minkgram"

  override def nullSafeEval(input: Any): Any =
    MinKgramHash.minHash(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinKgramHash.minHash($c.toString(), $k);")

  override protected def withNewChildInternal(
      newChild: Expression): MinKgramHash = copy(child = newChild)
}

object MinKgramHash {
  /** Shared by interpreted eval and codegen (called directly from the
    * generated code — no reflection, one static-dispatch call per row). */
  def minHash(s: String, k: Int): Long = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return PolyHash.hash(s)
    var best = Long.MaxValue
    var i = 0
    while (i <= cps.length - k) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 31L + cps(i + j).toLong) % PolyHash.Mod
        j += 1
      }
      if (acc < best) best = acc
      i += 1
    }
    best
  }
}

/** Session extension registering the engine's native functions.
  * Activate with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getCanonicalName, "graft_polyhash"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_polyhash takes exactly 1 argument, got ${children.size}")
        PolyHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minkgram"),
      new ExpressionInfo(classOf[MinKgramHash].getCanonicalName,
        "graft_minkgram"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_minkgram takes (text, k), got ${children.size} arguments")
        val k = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_minkgram window size must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "graft_minkgram window size must be a literal")
        }
        MinKgramHash(children.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getCanonicalName,
        "graft_entropy"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_entropy takes exactly 1 argument, got ${children.size}")
        CharEntropy(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZInterleave].getCanonicalName,
        "graft_zorder"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_zorder takes exactly 2 arguments, got ${children.size}")
        ZInterleave(children.head, children(1))
      }))
    // Spark's own runtime-filter probe expression, exposed for manual
    // bloom pruning (graft.ext.Bloom): null-safe, codegen'd — what
    // InjectRuntimeFilter plans once its build subquery has evaluated —
    // instead of a boxed-Long scalar UDF.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_probe"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]
          .getCanonicalName, "graft_bloom_probe"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_bloom_probe takes (bloomBytes, longKey), got ${children.size}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
    // CMS probe: Spark has no estimateCount expression (unlike bloom's
    // BloomFilterMightContain), so graft supplies one — see CmsEstimate
    ext.injectFunction((
      new FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getCanonicalName,
        "graft_cms_estimate"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_cms_estimate takes (sketchBytes, value), got ${children.size}")
        CmsEstimate(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_dot takes exactly 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lcp"),
      new ExpressionInfo(classOf[StrLcp].getCanonicalName, "graft_lcp"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_lcp takes exactly 2 arguments, got ${children.size}")
        StrLcp(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_extend"),
      new ExpressionInfo(classOf[StrExtend].getCanonicalName,
        "graft_extend"),
      (children: Seq[Expression]) => {
        require(children.size == 5,
          s"graft_extend takes (a, b, p, q, k), got ${children.size}")
        StrExtend(children(0), children(1), children(2), children(3),
          children(4))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_quantize8"),
      new ExpressionInfo(classOf[QuantizeInt8].getCanonicalName,
        "graft_quantize8"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_quantize8 takes exactly 1 argument, got ${children.size}")
        QuantizeInt8(children.head)
      }))
    // whole-operator extension: plans AsOfJoinNode as the native
    // co-partitioned merge (see org.apache.spark.sql.graft.AsOfJoinNative),
    // with left-side predicate pushdown restored by a custom rule
    // (Catalyst's own pushdown stops at unknown nodes)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ =>
      org.apache.spark.sql.graft.PushFilterThroughAsOfJoin)
  }
}
