package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * The round-8 audit/reporting operators: multi-touch attribution credit
 * conservation, epoch-mix integer schedule, MinHash candidate precision,
 * ANN recall, and BPE fertility consistency.
 */
class PipelineAuditSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // ---- attributionMulti -------------------------------------------------

  private def events(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "user_id", "ts", "event_type")

  private def attrib(rows: (Long, Long, Long, String)*) =
    Funnel.attributionMulti(events(rows: _*), "user_id", "ts", "event_id",
      "event_type", convType = "buy", touchTypes = Seq("click", "view"),
      lookbackMs = 100L)

  test("attribution: single/double/multi touch split 10000/5000+5000/4000-2000-4000") {
    val out = attrib(
      // user 1: one touch -> 10000
      (1L, 1L, 10L, "click"), (2L, 1L, 20L, "buy"),
      // user 2: two touches -> 5000 each
      (3L, 2L, 10L, "click"), (4L, 2L, 15L, "view"), (5L, 2L, 20L, "buy"),
      // user 3: five touches -> 4000 / 667 / 667 / 666 / 4000
      (6L, 3L, 10L, "click"), (7L, 3L, 11L, "view"), (8L, 3L, 12L, "click"),
      (9L, 3L, 13L, "view"), (10L, 3L, 14L, "click"), (11L, 3L, 20L, "buy"))
      .collect().map(r => (r.getLong(0), r.getLong(6), r.getLong(8))) // conv, rank, bp
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq(10000L))
    assert(out.filter(_._1 == 5L).sortBy(_._2).map(_._3).toSeq == Seq(5000L, 5000L))
    assert(out.filter(_._1 == 11L).sortBy(_._2).map(_._3).toSeq ==
      Seq(4000L, 667L, 667L, 666L, 4000L))
  }

  test("attribution: credits of every conversion sum to exactly 10000") {
    // 1..9 middles exercise every remainder branch of 2000 div (n-2)
    val rows = (1 to 11).flatMap { n =>
      val uid = n.toLong
      val touches = (0 until n).map(i =>
        (uid * 100 + i, uid, 10L + i, if (i % 2 == 0) "click" else "view"))
      touches :+ ((uid * 100 + 99, uid, 50L, "buy"))
    }
    val sums = attrib(rows: _*)
      .groupBy("conv_event_id").agg(sum("credit_bp").as("s"))
      .collect().map(_.getLong(1)).toSet
    assert(sums == Set(10000L))
  }

  test("attribution: lookback excludes old touches, conversion-ts touch excluded") {
    val out = attrib(
      (1L, 1L, 0L, "click"),    // 200 before conv: outside lookback 100
      (2L, 1L, 150L, "view"),   // inside
      (3L, 1L, 200L, "click"),  // AT conversion ts: strictly-before fails
      (4L, 1L, 200L, "buy"))
      .collect()
    assert(out.map(_.getLong(3)).toSet == Set(2L))
    assert(out.head.getLong(8) == 10000L)
  }

  // ---- epochMix ---------------------------------------------------------

  private def docsDF(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("epochMix: cap, deficit, and absent-source branches — all integer") {
    val d = docsDF(
      (1L, "big", Seq.fill(100)("w").mkString(" ")),   // 100 tokens
      (2L, "small", "a b c d e"))                      // 5 tokens
    val out = Curation.epochMix(d,
        Map("big" -> 5000L, "small" -> 3000L, "ghost" -> 2000L),
        budgetTokens = 100L, maxEpochBp = 20000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    // big: target 50 of 100 available -> ceil(50*10000/100)=5000bp, no deficit
    assert(out("big") == ((1L, 100L, 50L, 5000L, 50L, 0L)))
    // small: target 30 of 5 -> uncapped 60000bp, capped 20000 -> planned 10
    assert(out("small") == ((1L, 5L, 30L, 20000L, 10L, 20L)))
    // ghost: weighted but absent -> available 0, full deficit
    assert(out("ghost") == ((0L, 0L, 20L, 0L, 0L, 20L)))
  }

  test("epochMix rejects weights not summing to 10000") {
    intercept[IllegalArgumentException] {
      Curation.epochMix(docsDF((1L, "a", "x")), Map("a" -> 9999L), 100L)
    }
  }

  // ---- minhashAudit -----------------------------------------------------

  test("minhashAudit: candidates scored with exact jaccard, consistent with ngramJaccard") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, text), (2L, text),                     // exact dup pair
      (3L, text + " extra tail words here now"),  // near dup of 1/2
      (4L, "completely different content with nothing shared at all ok"))
      .toDF("doc_id", "text")
    val audit = Dedup.minhashAudit(docs, threshold = 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getLong(4)))).toMap
    assert(audit.contains((1L, 2L)) && audit((1L, 2L)) == ((1.0, 1L)))
    // every true_pos flag agrees with the exact-jaccard pairs operator
    val exactPairs = Dedup.ngramJaccard(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    audit.foreach { case (pair, (_, tp)) =>
      assert((tp == 1L) == exactPairs.contains(pair),
        s"pair $pair true_pos=$tp disagrees with ngramJaccard")
    }
  }

  // ---- recallReport -----------------------------------------------------

  test("recallReport: identical frames give recall 1, disjoint give 0") {
    val top = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("query_id", "neighbor_id")
    val all1 = Similarity.recallReport(top, top).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(all1.toSet == Set((1L, 2L, 2L, 1.0), (2L, 1L, 1L, 1.0)))
    val none = Seq((1L, 99L), (2L, 98L)).toDF("query_id", "neighbor_id")
    val all0 = Similarity.recallReport(none, top).collect().map(_.getDouble(3)).toSet
    assert(all0 == Set(0.0))
  }

  // ---- bpeFertility -----------------------------------------------------

  test("bpeFertility totals reconcile with bpeEncodeCounts") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "der hund und die katze und der vogel"),
      (3L, "the dog ran to the house and the tree"))
      .toDF("doc_id", "text")
    val fert = TextAnalysis.bpeFertility(docs, iters = 2).collect()
    val enc = TextAnalysis.bpeEncodeCounts(docs, iters = 2)
      .agg(sum("n_tokens_bpe_trained"), sum("n_words")).collect().head
    assert(fert.map(_.getLong(3)).sum == enc.getLong(0), "token totals")
    assert(fert.map(_.getLong(2)).sum == enc.getLong(1), "word totals")
    fert.foreach { r =>
      assert(r.getDouble(5) == r.getLong(3).toDouble / r.getLong(2).toDouble)
      assert(r.getDouble(6) == r.getLong(4).toDouble / r.getLong(3).toDouble)
    }
  }
}
