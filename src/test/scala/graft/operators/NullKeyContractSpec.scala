package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Pins the NULL-group-key contract of the totals-via-window rewrites
 * (round-13 commit e5716c1, round-14 fix): the original aggregate-and-
 * join-back form derived per-group totals with an INNER join on the group
 * key, which silently drops a NULL-key group (NULL != NULL in a join); a
 * partition window would instead retain NULL as its own partition. The
 * oracle SQL is the join form, so the operators filter NULL keys before
 * the window — these tests feed each operator a corpus WITH NULL keys and
 * assert (a) no NULL-key output group, and (b) non-NULL groups are exactly
 * what the operator computes on the NULL-filtered input (NULL rows leak
 * into no one else's totals).
 */
class NullKeyContractSpec extends SparkSpec {
  import spark.implicits._

  private def assertSameRows(a: org.apache.spark.sql.DataFrame,
                             b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  private val eventsWithNullType = Seq(
    (Some("view"), 1L * 3600000 + 5, "u1"),
    (Some("view"), 2L * 3600000 + 5, "u1"),
    (Some("click"), 1L * 3600000 + 5, "u2"),
    (None, 3L * 3600000 + 5, "u1"),
    (None, 4L * 3600000 + 5, "u3")
  ).toDF("event_type", "ts_ms", "user_id")

  test("hourEntropy drops the NULL event_type group, keeps others intact") {
    val out = Funnel.hourEntropy(eventsWithNullType)
    assert(out.where(col("event_type").isNull).count() == 0)
    assertSameRows(out,
      Funnel.hourEntropy(eventsWithNullType.where(col("event_type").isNotNull)))
  }

  test("weekdayProfile drops the NULL key group, keeps others intact") {
    val out = Funnel.weekdayProfile(eventsWithNullType, "event_type", "ts_ms")
    assert(out.where(col("event_type").isNull).count() == 0)
    assertSameRows(out,
      Funnel.weekdayProfile(
        eventsWithNullType.where(col("event_type").isNotNull), "event_type", "ts_ms"))
  }

  test("langConfusion drops NULL labels, keeps labeled rows intact") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again", Some("en")),
      (2L, "der schnelle braune fuchs springt ueber den faulen hund", Some("de")),
      (3L, "the slow green turtle walks under the busy bridge", None),
      (4L, "a plain english sentence with many common words here", Some("en"))
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langConfusion(docs)
    assert(out.where(col("lang").isNull).count() == 0)
    assertSameRows(out, TextAnalysis.langConfusion(docs.where(col("lang").isNotNull)))
  }

  test("lmBuckets drops NULL-source docs, keeps sourced docs intact") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", Some("srcA")),
      (2L, "alpha beta gamma", Some("srcA")),
      (3L, "epsilon zeta", Some("srcB")),
      (4L, "eta theta iota kappa", None)
    ).toDF("doc_id", "text", "source")
    val kn = Seq((1L, 0.5), (2L, 0.9), (3L, 0.1), (4L, 0.4)).toDF("doc_id", "kn_mean")
    val out = Curation.lmBucketsFrom(docs, kn)
    assert(out.where(col("source").isNull).count() == 0)
    // NULL-source docs contribute to no surviving source's totals; the kn
    // frame is shared (its mean is corpus-wide by contract, unchanged)
    assertSameRows(out,
      Curation.lmBucketsFrom(docs.where(col("source").isNotNull), kn))
  }
}
