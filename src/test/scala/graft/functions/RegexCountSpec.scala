package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.TextAnalysis

/** RegexCount must be indistinguishable from the declarative
  * `size(regexp_extract_all(text, pattern, 0))` it replaces — same Pattern
  * semantics, same NULL behavior, same zero-match result — on every pattern
  * the scoring scans actually run. */
class RegexCountSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val Patterns = Seq(
    "[A-Za-z0-9]+",
    "[^A-Za-z0-9 ]",
    "[^\\p{L}\\p{N} ]",
    TextAnalysis.BpePattern)

  private val Texts = Seq(
    "",
    "plain ascii words 123",
    "punct!! heavy?? text;; with.. lots,, of-- marks",
    "café Ångström straße 中文 words",
    "it's we're I'll don't 42 3.14 a-b",
    " leading and trailing  double  spaces ",
    "aaaa")

  test("agrees with size(regexp_extract_all) on all scan patterns") {
    val df = Texts.map(Tuple1(_)).toDF("t")
    for (p <- Patterns) {
      val rows = df.select(
        TextFunctions.regexCount(col("t"), p).as("native"),
        size(regexp_extract_all(col("t"), lit(p), lit(0))).as("declarative")).collect()
      for (r <- rows)
        assert(r.getInt(0) == r.getInt(1), s"pattern $p: ${r.getInt(0)} != ${r.getInt(1)}")
    }
  }

  test("NULL input stays NULL, like the declarative form") {
    val df = Seq[Option[String]](None, Some("x!y")).toDF("t")
    val rows = df.select(
      TextFunctions.regexCount(col("t"), "[^A-Za-z0-9 ]").as("native"),
      size(regexp_extract_all(col("t"), lit("[^A-Za-z0-9 ]"), lit(0))).as("declarative")).collect()
    assert(rows.exists(_.isNullAt(0)))
    for (r <- rows)
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getInt(0) == r.getInt(1)))
  }
}
