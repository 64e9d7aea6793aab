package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.TextAnalysis

/** NfcNormalize must agree with java.text.Normalizer (and, via the oracle
  * gate, DuckDB's nfc_normalize) and keep its ASCII fast path exact.
  * All non-ASCII literals are \u-escaped so composed-vs-decomposed intent
  * survives any editor/encoding round trip. */
class NfcNormalizeSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextFunctions.nfcNormalize(col("t"))).head().getString(0)

  test("composes decomposed sequences and the Angstrom singleton") {
    assert(norm("café") == "café")
    assert(norm("Å") == "Å")
    assert(norm("Å") == "Å") // ANGSTROM SIGN -> A WITH RING ABOVE
    assert(norm("ño") == "ño")
  }

  test("identity on ASCII and on already-normalized text") {
    assert(norm("plain ascii words 123") == "plain ascii words 123")
    assert(norm("café Å") == "café Å")
    // NFC-stable oddballs must pass through untouched
    assert(norm("ﬁle") == "ﬁle") // fi ligature: NFC keeps
    assert(norm("ẛ̣") == "ẛ̣") // long s + dot above/below
  }

  test("matches java.text.Normalizer on random multilingual strings") {
    val rnd = new scala.util.Random(13)
    // mix of ASCII, composed, decomposed-combining, and the Angstrom singleton
    val pool = "aéoü ÅñéÅzx".toCharArray
    val strings = (0 until 64).map(_ => new String(Array.fill(20)(pool(rnd.nextInt(pool.length)))))
    val got = strings.map(Tuple1(_)).toDF("t")
      .select(col("t"), TextFunctions.nfcNormalize(col("t"))).collect()
    got.foreach { r =>
      val want = java.text.Normalizer.normalize(r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == want)
    }
  }

  test("null in, null out; participates in whole-stage codegen") {
    val nulls = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
    assert(nulls.select(TextFunctions.nfcNormalize(col("t"))).head().isNullAt(0))
    val df = spark.range(4)
      .select(concat(lit("v"), col("id").cast("string"), lit("é")).as("t"))
      .select(TextFunctions.nfcNormalize(col("t")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"nfc not in a codegen span:\n$plan")
    assert(df.orderBy("n").head().getString(0) == "v0é")
  }

  test("normalizeText strips C0 controls, collapses spaces, trims, counts code points") {
    val docs = Seq(
      (1L, "ab  c  Å  "),
      (2L, "plain"),
      (3L, " x y ")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeText(docs).orderBy("doc_id").collect()
    assert(out(0).getString(1) == "ab c Å")
    assert(out(0).getAs[Long]("n_cp_src") == 13L) // incl. 2 controls, A+ring = 2 cps
    assert(out(0).getAs[Long]("n_cp_norm") == 6L)
    assert(out(0).getAs[Boolean]("changed"))
    assert(out(1).getString(1) == "plain" && !out(1).getAs[Boolean]("changed"))
    assert(out(2).getString(1) == "x y")
  }
}
