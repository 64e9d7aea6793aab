package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native lexicon-hit counter for the language-ID / quality hot path: the
 * number of whitespace words of `lower(text)` present in a small lexicon.
 *
 * Semantically identical to the declarative form it replaces —
 * `size(filter(split(lower(text), ' '), w -> w IN (...)))` — but Spark
 * evaluates higher-order-function lambdas interpreted, one closure dispatch
 * per word, and the scored-documents pass (curation) runs FIVE of these per
 * row (quality + four languages). This compiles to a split + hash-set probe
 * inside whole-stage codegen. Lowercasing uses UTF8String.toLowerCase — the
 * exact `lower()` the declarative form applied.
 */
case class LexiconHits(child: Expression, lexicon: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"LexiconHits requires STRING, got $other")
  }

  override def dataType: DataType = IntegerType // size() parity

  @transient private lazy val set: java.util.HashSet[String] = LexiconHits.toSet(lexicon)

  override def nullSafeEval(t: Any): Any =
    LexiconHits.count(t.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("lexicon", set, "java.util.HashSet")
    val helper = "graft.functions.LexiconHits$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.count($t, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconHits =
    copy(child = newChild)
}

object LexiconHits {

  def toSet(lexicon: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](lexicon.size * 2)
    lexicon.foreach(w => s.add(w))
    s
  }

  /** Split on single spaces (split-regex ' ' fast path — identical token
    * boundaries, including empty tokens for runs of spaces, which can never
    * be lexicon members) and count set membership. */
  def count(text: UTF8String, set: java.util.HashSet[String]): Int = {
    val words = text.toLowerCase.toString.split(" ", -1)
    var hits = 0
    var i = 0
    while (i < words.length) {
      if (set.contains(words(i))) hits += 1
      i += 1
    }
    hits
  }
}

object TextFunctions {
  /** Column API: # whitespace words of lower(text) present in `lexicon`. */
  def lexiconHits(text: Column, lexicon: Seq[String]): Column =
    GraftSqlBridge.column(LexiconHits(GraftSqlBridge.expression(text), lexicon))
}
