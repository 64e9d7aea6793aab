package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Accumulo-ColumnVisibility-semantics evaluator + Catalyst expression. */
class VisibilitySpec extends AnyFunSuite with SparkSpec {

  private def vis(expr: String, auths: String*): Boolean =
    VisibilityEvaluator.visible(expr, auths.toSet)

  test("terms, conjunction, disjunction") {
    assert(vis("A", "A"))
    assert(!vis("A", "B"))
    assert(vis("A&B", "A", "B"))
    assert(!vis("A&B", "A"))
    assert(vis("A|B", "B"))
    assert(!vis("A|B", "C"))
  }

  test("nesting and precedence via parens") {
    assert(vis("(A|B)&C", "B", "C"))
    assert(!vis("(A|B)&C", "A"))
    assert(vis("A&(B|(C&D))", "A", "C", "D"))
    assert(!vis("A&(B|(C&D))", "A", "C"))
  }

  test("quoted terms") {
    assert(vis("\"a b\"&C", "a b", "C"))
    assert(!vis("\"a b\"&C", "ab", "C"))
  }

  test("empty visibility means visible to all") {
    assert(vis(""))
    assert(vis(null.asInstanceOf[String]))
  }

  test("mixed &/| without parens is rejected") {
    intercept[IllegalArgumentException](VisibilityEvaluator.parse("A&B|C"))
    intercept[IllegalArgumentException](VisibilityEvaluator.parse("(A&"))
    intercept[IllegalArgumentException](VisibilityEvaluator.parse("A&&B"))
  }

  test("VizVisible expression filters rows (codegen path)") {
    import spark.implicits._
    val df = Seq(
      (1, "A"), (2, "A&B"), (3, "C|D"), (4, null.asInstanceOf[String])
    ).toDF("id", "viz")
    val visible = df.where(VizFunctions.vizVisible(col("viz"), lit("A,C")))
      .select("id").as[Int].collect().sorted
    // A -> yes; A&B -> no (no B); C|D -> yes; null viz -> visible to all
    assert(visible.toSeq == Seq(1, 3, 4))
  }
}
