package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial rolling hash
  * (base 31, mod 1e9+7 over UTF-16 code units) — the codegen'd form of
  * `TextAnalysis.polyFingerprint`'s `aggregate(split(text,''), ...)`
  * chain, which pays interpreted-lambda dispatch per character.
  *
  * Semantics contract (must stay equal to the expression form and the
  * DuckDB oracle): fold left over the string's UTF-16 code units with
  * `acc = (acc * 31 + unit) % 1_000_000_007`, empty string → 0, null →
  * null. `split(text, '')` yields one code unit per element and `ascii`
  * returns its numeric value, so unit-wise iteration matches exactly
  * (byte-wise would diverge on non-ASCII).
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
      val acc = ctx.freshName("phAcc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + (long) $s.charAt($i)) % 1000000007L;
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
      acc = (acc * 31L + s.charAt(i).toLong) % Mod
      i += 1
    }
    acc
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
      (children: Seq[Expression]) => PolyHash(children.head)))
  }
}
