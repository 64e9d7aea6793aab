package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hand-checked fixtures for the Zipf OLS fit and the NEAR/n proximity
  * retrieval (the slop sibling of phraseHits). */
class ZipfProximitySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("zipfSlope recovers an exact power law") {
    // counts 8,4,2,1 over ranks 1..4: ln(n) = ln(16) - ln(2)*ln-ish — build
    // a TRUE log-log line: n_r = 64 / r^2 at r in {1,2,4,8} -> slope -2.
    val docs = Seq(
      (1L, (Seq.fill(64)("a") ++ Seq.fill(16)("b") ++ Seq.fill(4)("c") ++
        Seq.fill(1)("d")).mkString(" "))
    ).toDF("doc_id", "text")
    val r = TextAnalysis.zipfSlope(docs, topN = 4).collect()(0)
    assert(r.getAs[Long]("n_words") == 4L)
    // ranks 1,2,3,4 with counts 64,16,4,1: ln counts = ln64 - k*... not a
    // perfect line in ln(rank); assert the fit is steeply negative and the
    // intercept near ln(64)
    val slope = r.getAs[Double]("slope")
    val icpt = r.getAs[Double]("intercept")
    assert(slope < -2.0 && slope > -4.0, s"slope $slope")
    assert(math.abs(icpt - math.log(64.0)) < 0.7, s"intercept $icpt")
  }

  test("zipfSlope is parallelism-invariant and survives empty corpora") {
    val d = (1 to 50).map(i => (i.toLong, "w" + (i % 7) + " common words here"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.zipfSlope(d.repartition(1)).collect()(0)
    val b = TextAnalysis.zipfSlope(d.repartition(11)).collect()(0)
    assert(a.getAs[Double]("slope") == b.getAs[Double]("slope"))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // no words -> one all-NULL-sum row with n=0 -> NULL slope, no throw
    val e = TextAnalysis.zipfSlope(empty).collect()(0)
    assert(e.getAs[Long]("n_words") == 0L)
  }

  test("heapsLaw: exact counts per md5-derived half, pinned beta; degenerate cases NULL") {
    // recompute the operator's own half pick so the fixture is hash-honest
    def half(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"heaps:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 1), 16) < 8
    }
    val docs = Seq(
      (1L, "a b c d", "s"), (2L, "a b e f", "s"),
      (3L, "a g", "s"), (4L, "h h h h", "s")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.heapsLaw(docs).collect().head
    val all = Seq(1L -> "a b c d", 2L -> "a b e f", 3L -> "a g", 4L -> "h h h h")
    val hTok = all.filter(d => half(d._1)).flatMap(_._2.split(" "))
    val aTok = all.flatMap(_._2.split(" "))
    assert(out.getAs[Long]("n_tokens") == aTok.size.toLong)
    assert(out.getAs[Long]("vocab") == aTok.distinct.size.toLong)
    assert(out.getAs[Long]("n_tokens_half") == hTok.size.toLong)
    assert(out.getAs[Long]("vocab_half") == hTok.distinct.size.toLong)
    if (hTok.nonEmpty && hTok.size != aTok.size) {
      val q = (x: Double) => new java.math.BigDecimal(math.log(x))
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      val want = q(aTok.distinct.size.toDouble / hTok.distinct.size) /
        q(aTok.size.toDouble / hTok.size)
      assert(out.getAs[Double]("beta") == want)
    }
    // a source whose half sample equals the whole (or is empty) gives NULL beta:
    // every doc on one side of the pick
    val ids = (1L to 50L).filter(half)
    val oneSided = ids.map(i => (i, "x y", "t")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.heapsLaw(oneSided).collect().head
    assert(r.isNullAt(5), "half == full must yield NULL beta")
  }

  test("proximityHits: pairwise window semantics, order-free") {
    val docs = Seq(
      (1L, "alpha x x beta"),        // gap 3 <= 3: hit
      (2L, "beta x alpha"),          // reversed order, gap 2: hit
      (3L, "alpha x x x x beta"),    // gap 5 > 3: miss
      (4L, "alpha only here"),       // missing beta: miss
      (5L, "x alpha beta x")         // gap 1: hit, tightest
    ).toDF("doc_id", "text")
    val q = Seq((10L, "alpha beta")).toDF("query_id", "qtext")
    val r = Search.proximityHits(docs, q, window = 3, k = 10)
      .orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(5L, 2L, 1L))
    assert(r.map(_.getAs[Long]("max_gap")).toSeq == Seq(1L, 2L, 3L))
  }

  test("proximityHits: all term pairs must qualify; single-term queries return nothing") {
    val docs = Seq(
      (1L, "a b c"),        // all pairs within 2
      (2L, "a b x x x c")   // (a,b)=1 but (a,c)=5,(b,c)=4 > 2: miss
    ).toDF("doc_id", "text")
    val q3 = Seq((1L, "a b c")).toDF("query_id", "qtext")
    val r = Search.proximityHits(docs, q3, window = 2, k = 10).collect()
    assert(r.length == 1 && r(0).getAs[Long]("doc_id") == 1L)

    val q1 = Seq((2L, "a")).toDF("query_id", "qtext")
    assert(Search.proximityHits(docs, q1, window = 2, k = 10).count() == 0)
    // repeated term in qtext dedups to a single term -> also nothing
    val qr = Seq((3L, "a a")).toDF("query_id", "qtext")
    assert(Search.proximityHits(docs, qr, window = 2, k = 10).count() == 0)
  }
}
