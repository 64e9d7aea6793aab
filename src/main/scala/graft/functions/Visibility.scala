package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Boolean visibility-expression evaluator with the semantics of Accumulo's
 * `ColumnVisibility` as the reference uses it: every point carries a `viz`
 * expression (reference: common/src/main/java/timely/accumulo/MetricAdapter.java:94-96,
 * 152-167) and a scan only returns the point if the expression evaluates to
 * true against the session's authorization set
 * (server/src/main/java/timely/server/store/cache/VisibilityFilter.java:1-39).
 *
 * Grammar (public Accumulo syntax):
 * {{{
 *   expr   := term (('&' term)* | ('|' term)*)    -- no mixing without parens
 *   term   := token | '"' quoted '"' | '(' expr ')'
 *   token  := [A-Za-z0-9_.+:-]+
 * }}}
 * Empty / null expression => visible to everyone.
 */
object VisibilityEvaluator {

  sealed trait Node
  case object Empty extends Node
  final case class Term(auth: String) extends Node
  final case class And(children: Seq[Node]) extends Node
  final case class Or(children: Seq[Node]) extends Node

  private def isTokenChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '.' || c == '+' || c == '-' || c == ':'

  def parse(expr: String): Node = {
    if (expr == null || expr.isEmpty) return Empty
    val (node, pos) = parseExpr(expr, 0)
    if (pos != expr.length) throw new IllegalArgumentException(s"bad visibility: $expr (at $pos)")
    node
  }

  private def parseExpr(s: String, start: Int): (Node, Int) = {
    var pos = start
    val children = Seq.newBuilder[Node]
    var op: Option[Char] = None
    val (first, p1) = parseTerm(s, pos)
    children += first
    pos = p1
    while (pos < s.length && (s.charAt(pos) == '&' || s.charAt(pos) == '|')) {
      val c = s.charAt(pos)
      op match {
        case Some(o) if o != c =>
          throw new IllegalArgumentException(s"mixed &/| without parens in: $s")
        case _ => op = Some(c)
      }
      val (t, p2) = parseTerm(s, pos + 1)
      children += t
      pos = p2
    }
    val cs = children.result()
    val node = op match {
      case Some('&') => And(cs)
      case Some('|') => Or(cs)
      case _         => cs.head
    }
    (node, pos)
  }

  private def parseTerm(s: String, start: Int): (Node, Int) = {
    if (start >= s.length) throw new IllegalArgumentException(s"bad visibility: $s")
    s.charAt(start) match {
      case '(' =>
        val (n, p) = parseExpr(s, start + 1)
        if (p >= s.length || s.charAt(p) != ')')
          throw new IllegalArgumentException(s"unbalanced parens: $s")
        (n, p + 1)
      case '"' =>
        val sb = new StringBuilder
        var i = start + 1
        while (i < s.length && s.charAt(i) != '"') {
          if (s.charAt(i) == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
          else { sb.append(s.charAt(i)); i += 1 }
        }
        if (i >= s.length) throw new IllegalArgumentException(s"unterminated quote: $s")
        (Term(sb.toString), i + 1)
      case c if isTokenChar(c) =>
        var i = start
        while (i < s.length && isTokenChar(s.charAt(i))) i += 1
        (Term(s.substring(start, i)), i)
      case c => throw new IllegalArgumentException(s"bad visibility char '$c' in: $s")
    }
  }

  def evaluate(node: Node, auths: Set[String]): Boolean = node match {
    case Empty   => true
    case Term(a) => auths.contains(a)
    case And(cs) => cs.forall(evaluate(_, auths))
    case Or(cs)  => cs.exists(evaluate(_, auths))
  }

  // Memoized parse, mirroring the reference's TagFilter accept/reject caches
  // (server/src/main/java/timely/server/store/TagFilter.java:118-133). Distinct
  // viz expressions are few in practice; clear wholesale if oversized.
  private val exprCache = new ConcurrentHashMap[String, Node]()
  private val authCache = new ConcurrentHashMap[String, Set[String]]()
  private val MaxCache = 10000

  def visible(viz: String, auths: Set[String]): Boolean = {
    if (viz == null || viz.isEmpty) return true
    var n = exprCache.get(viz)
    if (n == null) {
      n = parse(viz)
      if (exprCache.size > MaxCache) exprCache.clear()
      exprCache.put(viz, n)
    }
    evaluate(n, auths)
  }

  /** Entry point used by both interpreted eval and generated code. */
  def visibleUtf8(viz: UTF8String, auths: UTF8String): Boolean = {
    if (viz == null) return true
    val key = if (auths == null) "" else auths.toString
    var a = authCache.get(key)
    if (a == null) {
      a = key.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSet
      if (authCache.size > MaxCache) authCache.clear()
      authCache.put(key, a)
    }
    visible(viz.toString, a)
  }
}

/**
 * Native Catalyst expression `viz_visible(viz, auths_csv)` — participates in
 * whole-stage codegen (emits a static call, no UDF boxing). `auths_csv` is a
 * comma-separated authorization list (typically a per-session literal).
 *
 * Null semantics: null/empty viz => row visible (matches reference ingest,
 * which only *optionally* injects a default visibility —
 * server/src/main/java/timely/server/store/DataStore.java:402-407).
 */
case class VizVisible(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val viz = left.eval(input).asInstanceOf[UTF8String]
    val auths = right.eval(input).asInstanceOf[UTF8String]
    VisibilityEvaluator.visibleUtf8(viz, auths)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val helper = "graft.functions.VisibilityEvaluator$.MODULE$"
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        boolean ${ev.value} = $helper.visibleUtf8(
          ${l.isNull} ? null : ${l.value},
          ${r.isNull} ? null : ${r.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VizVisible =
    copy(left = newLeft, right = newRight)
}

object VizFunctions {
  /** Column API: `df.filter(vizVisible($"viz", lit("A,B")))`. */
  def vizVisible(viz: Column, authsCsv: Column): Column =
    GraftSqlBridge.column(VizVisible(GraftSqlBridge.expression(viz), GraftSqlBridge.expression(authsCsv)))
}
