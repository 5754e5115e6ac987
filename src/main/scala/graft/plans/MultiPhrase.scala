package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher — the scale path for the
  * blocklist gate (`Curation.blocklistHits`). The compositional form is
  * a BroadcastNestedLoopJoin paying O(len · patterns) `instr` work per
  * row; this automaton scans each document ONCE regardless of pattern
  * count, which is the difference between 4 phrases and the 10⁴-entry
  * blocklists safety teams actually ship.
  *
  * The automaton is built once per plan instance from the literal
  * pattern list (driver side, then serialized with the expression;
  * goto/fail/output tables are plain primitive arrays + per-node char
  * maps). Matching is UTF-16 char-wise, which for substring semantics
  * is exactly `String.contains` / Spark `instr` — a multi-char
  * sequence matches iff its chars appear consecutively, surrogate
  * pairs included.
  *
  * Codegen emits one static-dispatch call on the referenced automaton
  * (the MinKgramHash pattern) — the expression stays inside
  * whole-stage codegen, no boxed lambda per row.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "AhoCorasick: empty pattern")

  // trie: per-node char→child maps; out: pattern ids ending at node
  private val children =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
  private val outBuf =
    scala.collection.mutable.ArrayBuffer(List.empty[Int])
  for ((p, id) <- patterns.zipWithIndex) {
    var node = 0
    for (ch <- p) {
      val next = children(node).get(ch)
      if (next == null) {
        children += new java.util.HashMap[Character, Integer]()
        outBuf += Nil
        children(node).put(ch, children.size - 1)
        node = children.size - 1
      } else node = next
    }
    outBuf(node) = id :: outBuf(node)
  }
  private val fail = new Array[Int](children.size)
  // BFS fail links; out sets absorb the fail target's (suffix matches)
  private val out: Array[Array[Int]] = {
    val o = outBuf.map(_.toArray).toArray
    val q = scala.collection.mutable.Queue.empty[Int]
    children(0).forEach((_, c) => { fail(c) = 0; q.enqueue(c.intValue) })
    while (q.nonEmpty) {
      val u = q.dequeue()
      children(u).forEach { (ch, v) =>
        var f = fail(u)
        while (f != 0 && children(f).get(ch) == null) f = fail(f)
        val t = children(f).get(ch)
        fail(v) = if (t != null && t != v) t.intValue else 0
        if (o(fail(v)).nonEmpty) o(v) = o(v) ++ o(fail(v))
        q.enqueue(v.intValue)
      }
    }
    o
  }
  /** pattern indices in lexicographic pattern order (for `first`) */
  private val lexOrder: Array[Int] =
    patterns.indices.sortBy(patterns).toArray

  private def matchedBits(text: String): java.util.BitSet = {
    val bits = new java.util.BitSet(patterns.length)
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && children(node).get(ch) == null) node = fail(node)
      val t = children(node).get(ch)
      node = if (t != null) t.intValue else 0
      val hits = out(node)
      var j = 0
      while (j < hits.length) { bits.set(hits(j)); j += 1 }
      i += 1
    }
    bits
  }

  /** Number of DISTINCT patterns present as substrings. */
  def count(text: UTF8String): Long =
    matchedBits(text.toString).cardinality().toLong

  /** Lexicographically first matching pattern, null when none match. */
  def first(text: UTF8String): UTF8String = {
    val bits = matchedBits(text.toString)
    var i = 0
    while (i < lexOrder.length) {
      if (bits.get(lexOrder(i))) return UTF8String.fromString(
        patterns(lexOrder(i)))
      i += 1
    }
    null
  }
}

/** `graft_blocklist_count(text, p1, p2, ...)`: distinct literal
  * patterns present in `text` as substrings — one Aho–Corasick pass. */
case class MultiPhraseCount(child: Expression, phrases: Seq[String])
    extends UnaryExpression {
  @transient private lazy val ac = new AhoCorasick(phrases.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_blocklist_count requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_blocklist_count"

  override def nullSafeEval(input: Any): Any =
    ac.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAc", ac,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiPhraseCount = copy(child = newChild)
}

/** `graft_blocklist_first(text, p1, p2, ...)`: the lexicographically
  * first matching pattern (deterministic review evidence), null when
  * clean. */
case class MultiPhraseFirst(child: Expression, phrases: Seq[String])
    extends UnaryExpression {
  @transient private lazy val ac = new AhoCorasick(phrases.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_blocklist_first requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_blocklist_first"

  override def nullSafeEval(input: Any): Any =
    ac.first(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAc", ac,
      classOf[AhoCorasick].getName)
    val tmp = ctx.freshName("mpFirst")
    nullSafeCodeGen(ctx, ev, c => s"""
       |UTF8String $tmp = $ref.first($c);
       |${ev.isNull} = ($tmp == null);
       |${ev.value} = $tmp;
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiPhraseFirst = copy(child = newChild)
}

object MultiPhrase {
  /** Shared builder-arg parsing: trailing args must be foldable string
    * literals (the pattern list is config, not data). */
  def literalPhrases(name: String, args: Seq[Expression]): Seq[String] = {
    require(args.nonEmpty, s"$name needs at least one pattern literal")
    args.map {
      case e if e.foldable && e.dataType == StringType =>
        val v = e.eval()
        require(v != null, s"$name: null pattern literal")
        v.toString
      case other => throw new IllegalArgumentException(
        s"$name patterns must be string literals, got $other")
    }
  }
}
