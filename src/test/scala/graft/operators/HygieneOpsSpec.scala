package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-8 hygiene/audit operators: fuzzy-exact dedup, mojibake screen,
  * bot flagging, and the per-dimension embedding health table. */
class HygieneOpsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("fuzzyExact: case/punct/spacing variants collapse to one group") {
    val docs = Seq(
      (1L, "hello world"),
      (2L, "Hello,  WORLD!"),
      (3L, "hello\nworld."),
      (4L, "different text")).toDF("doc_id", "text")
    val out = Dedup.fuzzyExact(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 3L, 4L -> 1L))
  }

  test("fuzzyExact: NULL and empty text share the one empty group") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, " .! "))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyExact(docs).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 1L && out.head.getLong(2) == 3L)
  }

  test("fuzzyExact: punctuation runs separate words, never glue them") {
    val docs = Seq((1L, "end.Start"), (2L, "endstart"), (3L, "end start"))
      .toDF("doc_id", "text")
    // "end.Start" normalizes to "end start" (group with 3), not "endstart"
    val groups = Dedup.fuzzyExact(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(groups == Map(1L -> 2L, 2L -> 1L))
  }

  test("mojibakeStats: counts both artifact classes; clean and NULL keep") {
    val docs = Seq(
      (1L, "plain clean text"),
      (2L, "cafÃ© and donâ€™t and Â£5"),
      (3L, "bad�byte here"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.mojibakeStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((0L, 0L, 1L)))
    assert(out(2L) == ((3L, 0L, 0L)))
    assert(out(3L) == ((0L, 1L, 0L)))
    assert(out(4L) == ((0L, 0L, 1L)))
  }

  test("botFlag: burst and cadence tells flag; sparse and small users keep") {
    val events =
      (0 until 25).map(i => ("burst", i.toLong, i * 1000000L)) ++ // 1 s gaps
        (0 until 25).map(i => ("slow", (100 + i).toLong, i * 50000000000L)) ++ // 50k s
        (0 until 3).map(i => ("tiny", (200 + i).toLong, i * 1000L)) ++
        Seq(("solo", 300L, 42L))
    val df = events.toDF("user_id", "event_id", "ts_us")
    val out = Anomaly.botFlag(df, "user_id", "ts_us", "event_id").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("burst").getLong(5) == 1L)
    assert(out("burst").getLong(3) == 1000000L) // min gap exact
    assert(out("burst").getLong(4) == 1000000L) // mean = span div (n-1)
    assert(out("slow").getLong(5) == 0L)
    assert(out("tiny").getLong(5) == 0L) // below minEvents despite 1 ms gaps
    assert(out("solo").getLong(5) == 0L)
    assert(out("solo").isNullAt(3) && out("solo").isNullAt(4)) // no gaps
    assert(out("solo").getLong(2) == 0L) // span
  }

  test("botFlag: identical timestamps tie-break on event_id; gap 0 flags burst") {
    val df = (0 until 21).map(i => ("u", i.toLong, 5000L))
      .toDF("user_id", "event_id", "ts_us")
    val r = Anomaly.botFlag(df, "user_id", "ts_us", "event_id").collect().head
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(5) == 1L)
  }

  test("pathTransitions: branch probabilities are exact count ratios") {
    val ev = Seq(
      ("u1", 1L, 10L, "A"), ("u1", 2L, 20L, "B"),
      ("u2", 3L, 10L, "A"), ("u2", 4L, 20L, "C"),
      ("u3", 5L, 10L, "A"), ("u3", 6L, 20L, "B"))
      .toDF("user_id", "event_id", "ts_ms", "event_type")
    val out = Funnel.pathTransitions(ev, "user_id", "ts_ms", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map(
      ("A", "B") -> ((2L, 3L, 2.0 / 3)),
      ("A", "C") -> ((1L, 3L, 1.0 / 3))))
  }

  test("pathTransitions: ties order by event id; self-transitions count") {
    val ev = Seq(("u", 1L, 10L, "A"), ("u", 2L, 10L, "A"), ("u", 3L, 10L, "B"))
      .toDF("user_id", "event_id", "ts_ms", "event_type")
    val out = Funnel.pathTransitions(ev, "user_id", "ts_ms", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("A", "A") -> 1L, ("A", "B") -> 1L))
  }

  test("codeDetect: symbol density and indentation both flag; prose and empty keep") {
    val docs = Seq(
      (1L, "plain prose words without any markup at all here"),
      (2L, "x = f(a); y = g[0]; { return; }"), // dense symbols
      (3L, "no symbols\n  but indented\n\tlines here"), // layout tell only
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.codeDetect(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(5) == 0L)
    assert(out(2L).getLong(5) == 1L && out(2L).getLong(2) == 0L) // symbols, no indent
    assert(out(3L).getLong(5) == 1L && out(3L).getLong(2) == 2L) // indent tell
    assert(out(4L).getLong(5) == 0L && out(4L).isNullAt(4)) // empty: NULL ratio, prose
  }

  test("ngramNovelty: unique docs score 1, duplicated docs 0, short docs NULL") {
    val docs = Seq(
      (1L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"), // unique 8-grams
      (2L, "d1 d2 d3 d4 d5 d6 d7 d8 d9"),
      (3L, "d1 d2 d3 d4 d5 d6 d7 d8 d9"), // exact twin of 2
      (4L, "too short")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(3) == 1.0 && out(1L).getLong(1) == 2L)
    assert(out(2L).getDouble(3) == 0.0 && out(3L).getDouble(3) == 0.0)
    assert(out(4L).getLong(1) == 0L && out(4L).isNullAt(3))
  }

  test("userPathGini: single-path bots flag, diverse users and small users keep") {
    val bot = (0 until 21).map(i => ("bot", i.toLong, i * 1000L, "ping"))
    val human = (0 until 21).map(i =>
      ("human", (100 + i).toLong, i * 1000L, Seq("a", "b", "c", "d")(i % 4)))
    val tiny = (0 until 3).map(i => ("tiny", (200 + i).toLong, i * 1000L, "ping"))
    val ev = (bot ++ human ++ tiny).toDF("user_id", "event_id", "ts_ms", "event_type")
    val out = Funnel.userPathGini(ev, "user_id", "ts_ms", "event_id", "event_type")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("bot").getDouble(3) == 0.0 && out("bot").getLong(4) == 1L)
    assert(out("human").getDouble(3) > 0.5 && out("human").getLong(4) == 0L)
    assert(out("tiny").getLong(4) == 0L) // gini 0 but below minTransitions
    assert(out("bot").getLong(1) == 20L && out("bot").getLong(2) == 1L)
  }

  test("keepReasons: each screen sets its own mask bit; the conjunction keeps clean docs") {
    // 60 words, avg len in [3,10], stopword-rich, punct-light: gopher-clean
    val base = Seq.fill(5)("the quick brown foxes jumped over lazy dogs near riverbank and stayed")
      .mkString(" ")
    val probeText = "zeta omega kappa sigma delta gamma lambda theta epsilon upsilon"
    val docs = Seq(
      (1L, base), // keep
      (2L, "short text"), // gopher fail
      (3L, base + "\n  x = f(a);\n  y = g[b];"), // code routing
      (4L, base), // fuzzy duplicate of 1
      (5L, base + " " + probeText), // shares the probe's 3 8-grams
      (10L, probeText)).toDF("doc_id", "text")
    val out = Curation.keepReasons(docs, docs.where(col("doc_id") === 10L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(6), r.getLong(7)))).toMap
    assert(out(1L) == ((1L, 0L)))
    assert(out(2L) == ((0L, Curation.ReasonGopher)))
    assert(out(3L) == ((0L, Curation.ReasonCode)))
    assert(out(4L) == ((0L, Curation.ReasonDuplicate)))
    assert(out(5L) == ((0L, Curation.ReasonContaminated)))
    assert(out(10L)._2 == Curation.ReasonGopher) // the probe is short, not contaminated
  }

  test("dimStats: hand-computed grid-exact stats; min/max rank-picked") {
    val emb = Seq(
      (1L, Seq(1.0f, -0.5f)),
      (2L, Seq(0.0f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.dimStats(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2L)
    assert(out(1L).getDouble(2) == 0.0 && out(1L).getDouble(3) == 1.0)
    assert(out(1L).getDouble(4) == 0.5) // (2^20 + 0) / (2 * 2^20)
    assert(out(1L).getDouble(5) == 0.25)
    assert(out(2L).getDouble(2) == -0.5 && out(2L).getDouble(3) == 0.5)
    assert(out(2L).getDouble(4) == 0.0)
    assert(out(2L).getDouble(5) == 0.25)
  }

  test("isotropy: identical vectors read 1, orthogonal read 0, zero vectors excluded") {
    // two copies of (1,0): fp = (16384,0); A = 32768^2, B = 2*16384^2
    // -> mean_pair_cosine = 1.0 exactly, mean_vector_norm = 1.0 exactly
    val same = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r1 = Similarity.isotropy(same).collect().head
    assert(r1.getLong(0) == 2L) // the zero vector has no direction
    assert(r1.getDouble(1) == 1.0)
    assert(r1.getDouble(2) == 1.0)
    // orthogonal pair: cross term vanishes -> 0; ||mean|| = sqrt(2)/2
    val orth = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.isotropy(orth).collect().head
    assert(r2.getDouble(1) == 0.0)
    assert(r2.getDouble(2) == math.sqrt(2.0) / 2.0)
  }

  test("selfKnnDensity: the off-cluster vector scores lowest") {
    val emb = Seq((20L, Seq(1.0f, 0.0f)), (40L, Seq(1.0f, 0.0f)),
      (60L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.selfKnnDensity(emb, k = 2, probeMod = 20L).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(20L, 40L, 60L))
    assert(out.values.forall(_.getLong(1) == 2L)) // k_found
    assert(out(20L).getDouble(2) == 0.5) // (1 + 0) / 2
    assert(out(40L).getDouble(2) == 0.5)
    assert(out(60L).getDouble(2) == 0.0) // the outlier
  }

  test("hardTriplets: hardest positive/negative, tie to lower id, violation margin") {
    // anchor 0 (label 1): positives ids 1 (sim 1.0) and 2 (sim 0.6) ->
    // hardest positive is 2; negatives ids 3 (sim 0) and 4/5 (sim 0.8,
    // tied) -> hardest negative is the LOWER id 4; margin 0.6-0.8 < 0
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 1), (1L, Seq(1.0f, 0.0f), 1),
      (2L, Seq(0.6f, 0.8f), 1), (3L, Seq(0.0f, 1.0f), 2),
      (4L, Seq(0.8f, 0.6f), 2), (5L, Seq(0.8f, 0.6f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardTriplets(emb, anchorMod = 40L).collect()
    assert(out.length == 1) // only id 0 is an anchor
    val r = out.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 2L)                  // hardest positive
    assert(math.abs(r.getDouble(3) - 0.6) < 1e-6)
    assert(r.getLong(4) == 4L)                  // tie -> lower id
    assert(math.abs(r.getDouble(5) - 0.8) < 1e-6)
    assert(r.getDouble(6) < 0.0)                // active violation
    // an anchor whose label is unique has no positive -> absent
    val lone = Seq((0L, Seq(1.0f, 0.0f), 9), (1L, Seq(0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.hardTriplets(lone, anchorMod = 40L).count() == 0)
  }

  test("pcVarianceExplained: one-axis corpus reads 1, symmetric cross reads 1/2") {
    // all variance on axis 1 -> the top PC explains everything
    val oneAxis = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(3.0f, 0.0f))).toDF("vec_id", "embedding")
    val r1 = Similarity.pcVarianceExplained(oneAxis,
      Similarity.topPrincipalComponent(oneAxis)).collect().head
    assert(r1.getLong(0) == 3L)
    assert(math.abs(r1.getDouble(3) - 1.0) < 1e-6)
    // symmetric cross: each axis holds half the variance
    val cross = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f))).toDF("vec_id", "embedding")
    val r2 = Similarity.pcVarianceExplained(cross,
      Similarity.topPrincipalComponent(cross)).collect().head
    assert(math.abs(r2.getDouble(3) - 0.5) < 1e-6)
  }

  test("normOutliers: exploding and dead norms flag; unit norms keep") {
    val emb = ((1L to 20L).map(i => (i, Seq(1.0f, 0.0f))) ++
      Seq((21L, Seq(5.0f, 0.0f)), (22L, Seq(0.01f, 0.0f))))
      .toDF("vec_id", "embedding")
    val out = Similarity.normOutliers(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(4) == 0L)
    assert(out(1L).getDouble(3) == 1.0) // sqrt(2^40)/2^20 exactly
    assert(out(21L).getLong(4) == 1L) // 25x the unit norm2 >> hi bound
    assert(out(22L).getLong(4) == 1L) // near-zero norm << lo bound
    // mean is the exact floor of the LONG sum over 22
    val n2s = out.values.map(_.getLong(1)).sum
    assert(out(1L).getLong(2) == n2s / 22)
  }

  test("decontamFilter: probe-overlapping docs drop, probes and clean docs keep") {
    val common = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10" // 10 words -> 3 shared 8-grams
    val docs = Seq(
      (10L, common), // the probe (doc_id % 1 fixture below passes it explicitly)
      (2L, common + " tail"), // shares the 8-grams -> dropped
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")).toDF("doc_id", "text")
    val probes = docs.where(col("doc_id") === 10L)
    val out = Curation.decontamFilter(docs, probes)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getLong(4) == 0L && out(2L).getLong(1) == 1L)
    assert(out(2L).getLong(3) >= 3L) // max_shared counts the shared grams
    assert(out(3L).getLong(4) == 1L && out(3L).getLong(2) == 0L)
    assert(out(10L).getLong(4) == 1L) // a probe never matches itself
  }

  test("sourceOverlap: distinct hashes count once per pair; within-source dups ignored") {
    val docs = Seq(
      (1L, "shared one", "sA"), (2L, "shared one", "sB"), // cross pair
      (3L, "shared one", "sB"), // duplicate within sB: still ONE distinct hash
      (4L, "shared two", "sA"), (5L, "shared two", "sC"),
      (6L, "only here", "sA")).toDF("doc_id", "text", "source")
    val out = Curation.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("sA", "sB") -> 1L, ("sA", "sC") -> 1L))
  }

  test("cellPurity: majority, tie-break to lower label, exact purity ratio") {
    // 8 vectors forced into distinguishable corners so seeded assignment is
    // stable; labels: one list-dominating label + a tie case
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 7), (2L, Seq(0.9f, 0.1f), 7), (3L, Seq(0.8f, 0.2f), 3),
      (4L, Seq(0.0f, 1.0f), 5), (5L, Seq(0.1f, 0.9f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityIvf.cellPurity(emb, nLists = 2).collect()
    assert(out.map(_.getLong(1)).sum == 5L) // every vector lands in a list
    out.foreach { r =>
      val (nVecs, nMaj, purity) = (r.getLong(1), r.getLong(4), r.getDouble(5))
      assert(purity == nMaj.toDouble / nVecs) // the single mirrored division
      assert(nMaj >= 1L && nMaj <= nVecs)
    }
    // global majority label invariant: sum of majority counts <= total
    assert(out.map(_.getLong(4)).sum <= 5L)
  }

  test("topPrincipalComponent: recovers a known covariance direction") {
    // points along (1, 2): covariance ∝ [[1,2],[2,4]], eigenvector (1,2) ->
    // L1-normalized (1/3, 2/3), first component positive by convention
    val emb = (-10 to 10).filter(_ != 0)
      .map(t => (t.toLong + 100L, Seq(t.toFloat / 10, 2f * t / 10)))
      .toDF("vec_id", "embedding")
    val pc = Similarity.topPrincipalComponent(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(pc(1L) - 333333L) <= 3, s"dim1 = ${pc(1L)}")
    assert(math.abs(pc(2L) - 666666L) <= 3, s"dim2 = ${pc(2L)}")
  }

  test("topPrincipalComponent: sign convention makes the first nonzero dim positive") {
    // anti-correlated axes: direction (1, -1); the raw iterate could land on
    // either sign, the convention must pin dim1 >= 0
    val emb = (-8 to 8).filter(_ != 0)
      .map(t => (t.toLong + 50L, Seq(t.toFloat / 8, -t.toFloat / 8)))
      .toDF("vec_id", "embedding")
    val pc = Similarity.topPrincipalComponent(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pc(1L) > 0 && pc(2L) < 0)
    assert(math.abs(pc(1L) + pc(2L)) <= 2) // symmetric magnitudes on the grid
  }

  test("pcProjection: coordinates along the recovered direction; signs follow the data") {
    // points (t/10, 2t/10) on the (1/3, 2/3)-L1 component: proj = t/6
    val emb = (-10 to 10).filter(_ != 0)
      .map(t => (t.toLong + 100L, Seq(t.toFloat / 10, 2f * t / 10)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pcProjection(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(out(106L) - 1000000L) <= 10) // t=6 -> proj 1.0
    assert(math.abs(out(94L) + 1000000L) <= 10) // t=-6 -> -1.0
    assert(math.abs(out(103L) - 500000L) <= 10) // t=3 -> 0.5
  }

  test("topPrincipalComponent: bit-identical under repartition") {
    val rnd = new scala.util.Random(3)
    val emb = (1L to 60L).map(i =>
      (i, Seq.fill(6)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.topPrincipalComponent(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run(emb) == run(emb.repartition(13)))
  }

  test("dimStats: a dead dimension reports zero variance exactly") {
    val emb = (1L to 40L).map(i => (i, Seq(0.125f, i.toFloat / 64)))
      .toDF("vec_id", "embedding")
    val out = Similarity.dimStats(emb).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(5) == 0.0)
    assert(out(1L).getDouble(4) == 0.125)
    assert(out(2L).getDouble(5) > 0.0)
  }

  test("ocrArtifacts: each tell fires its own column; clean prose stays clean") {
    val docs = Seq(
      (1L, "a clean sentence with ordinary words here"),
      (2L, "broken exam-\nple and hyphen-\nated scans"),   // 2 breaks
      (3L, "tokens like t3xt and w0rd and c0de confuse"),  // 3 mixed
      (4L, "a b c d e f g h i j"),                          // all single-char
      (5L, "version v2 has 3 numbers 2025 alone"))          // digits-only/edge
      .toDF("doc_id", "text")
    val out = TextAnalysis.ocrArtifacts(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("suspect") == 0L)
    assert(out(2L).getAs[Long]("n_hyphen_breaks") == 2L)
    assert(out(2L).getAs[Long]("suspect") == 1L)
    assert(out(3L).getAs[Long]("n_mixed_alnum") == 3L)
    assert(out(3L).getAs[Long]("suspect") == 1L)
    assert(out(4L).getAs[Double]("single_char_ratio") == 1.0)
    assert(out(4L).getAs[Long]("suspect") == 1L)
    // "v2" (no trailing letters) and bare numbers are NOT letter-digit-letter
    assert(out(5L).getAs[Long]("n_mixed_alnum") == 0L)
    assert(out(5L).getAs[Long]("suspect") == 0L)
  }

  test("piiReport: per-source sums and any-pii doc counts; clean source zeroes") {
    val docs = Seq(
      (1L, "mail me at a@b.com and c@d.org", "web"),   // 2 emails
      (2L, "host 10.0.0.7 dialed +1 555 0101", "web"), // 1 ip + 1 phone
      (3L, "nothing sensitive here", "web"),
      (4L, "plain prose", "books"))
      .toDF("doc_id", "text", "source")
    val out = Curation.piiReport(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val w = out("web")
    assert(w.getAs[Long]("n_docs") == 3L)
    assert(w.getAs[Long]("n_emails") == 2L && w.getAs[Long]("n_ips") == 1L &&
      w.getAs[Long]("n_phones") == 1L)
    assert(w.getAs[Long]("n_docs_with_pii") == 2L)
    assert(w.getAs[Double]("pii_doc_rate") == 2.0 / 3.0)
    val b = out("books")
    assert(b.getAs[Long]("n_docs_with_pii") == 0L && b.getAs[Double]("pii_doc_rate") == 0.0)
  }

  test("bigramEntropy: constant text scores 0, templates flag, prose doesn't; short docs absent") {
    val d = Seq(
      (1L, "aaaa"),                                       // one bigram -> 0
      (2L, "abab"),                                       // 2 bigrams, low
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "x"))                                          // no bigram
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramEntropy(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L))
    assert(out(1L).getAs[Long]("n_distinct") == 1L)
    assert(out(1L).getAs[Double]("entropy_nats") == 0.0)
    assert(out(1L).getAs[Long]("gibberish") == 1L)
    // "abab": ab x2, ba x1 -> -(2/3 ln 2/3 + 1/3 ln 1/3) ~ 0.6365 < 2
    assert(out(2L).getAs[Long]("n_bigrams") == 3L)
    assert(out(2L).getAs[Double]("entropy_nats") < 1.0)
    assert(out(2L).getAs[Long]("gibberish") == 1L)
    assert(out(3L).getAs[Double]("entropy_nats") > 2.0)
    assert(out(3L).getAs[Long]("gibberish") == 0L)
  }

  test("licenseScreen: each marker class counts separately; clean prose passes") {
    val d = Seq(
      (1L, "Copyright 2020 Foo Corp. All rights reserved."),
      (2L, "(c) 1999 bar industries"),
      (3L, "this work is licensed under the MIT license"),
      (4L, "plain prose about copyrights in general"), // no dated line
      (5L, "creative commons attribution applies"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.licenseScreen(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_copyright") == 1L)
    assert(out(1L).getAs[Long]("n_rights") == 1L)
    assert(out(1L).getAs[Long]("license_flag") == 1L)
    assert(out(2L).getAs[Long]("n_copyright") == 1L)
    assert(out(3L).getAs[Long]("n_license_terms") == 1L)
    assert(out(4L).getAs[Long]("license_flag") == 0L, "undated mention passes")
    assert(out(5L).getAs[Long]("n_license_terms") == 1L)
  }

  test("mahalanobisDiag: hand-computed chi2 terms; zero-variance dims contribute 0") {
    // dim1 values 0,2,1,1: mean 1, var 0.5; dim2 values 0,0,1,-1: mean 0,
    // var 0.5 -> every vector scores exactly 2.0 (grid-exact values)
    val emb = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(1.0f, 1.0f)), (4L, Seq(1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mahalanobisDiag(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_dims") == 2L)
      assert(r.getAs[Double]("m2") == 2.0)
      assert(r.getAs[Long]("ood_flag") == 0L)
    }
    // constant dim (var 0) contributes 0; the outlier dim still flags the
    // far vector (3 of 4 at 0.25, one at 4.0: mean 1.1875, var ~ 2.37)
    val e2 = Seq(
      (1L, Seq(1.0f, 0.25f)), (2L, Seq(1.0f, 0.25f)),
      (3L, Seq(1.0f, 0.25f)), (4L, Seq(1.0f, 16.0f)))
      .toDF("vec_id", "embedding")
    val o2 = Similarity.mahalanobisDiag(e2, flagAt = 1.0).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(o2(4L).getAs[Long]("ood_flag") == 1L)
    assert(o2(1L).getAs[Double]("m2") < o2(4L).getAs[Double]("m2"))
  }

  test("langMix: code-switching flags when two lexicons clear the fraction; ties to lang order") {
    val d = Seq(
      (1L, "the and of to the and of to"),      // pure en
      (2L, "the and of to el los y un"),        // half en half es -> mixed
      (3L, "der und das ist xyz"),              // de
      (4L, "xyz abc"))                          // nothing -> de by tie order
      .toDF("doc_id", "text")
    val out = TextAnalysis.langMix(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("primary_lang") == "en")
    assert(out(1L).getAs[Long]("h_en") == 8L)
    assert(out(1L).getAs[Long]("n_langs_present") == 1L)
    assert(out(1L).getAs[Long]("mixed") == 0L)
    assert(out(2L).getAs[Long]("h_en") == 4L && out(2L).getAs[Long]("h_es") == 4L)
    assert(out(2L).getAs[Long]("mixed") == 1L)
    assert(out(2L).getAs[String]("primary_lang") == "en", "count tie -> lexicon order")
    assert(out(3L).getAs[String]("primary_lang") == "de")
    assert(out(3L).getAs[Long]("mixed") == 0L)
    assert(out(4L).getAs[String]("primary_lang") == "de")
    assert(out(4L).getAs[Long]("n_langs_present") == 0L)
  }

  test("vocabDrift: corpus-identical source scores 0; skewed sources score symmetric > 0") {
    val d = Seq(
      (1L, "x x x y", "A"),   // x-heavy
      (2L, "x y y y", "B"),   // y-heavy (mirror of A)
      (3L, "x x y y", "C"))   // exactly the corpus mix (x:6/12, y:6/12)
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.vocabDrift(d, topN = 2, flagAt = 0.05).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("C").getAs[Double]("jsd_nats") == 0.0)
    assert(out("C").getAs[Long]("drifted") == 0L)
    val a = out("A").getAs[Double]("jsd_nats")
    val b = out("B").getAs[Double]("jsd_nats")
    assert(a == b, "mirrored skews are symmetric under JSD")
    assert(a > 0.0 && a < math.log(2.0), "JSD bounded by ln 2")
    assert(out("A").getAs[Long]("head_words") == 2L)
    assert(out("A").getAs[Long]("source_head_tokens") == 4L)
  }

  test("casingProfile: shouting flags on all-caps ratio; Capitalized words counted apart") {
    val d = Seq(
      (1L, "BUY NOW LIMITED OFFER today"),   // 4/5 all-caps -> shouting
      (2L, "The Quick Brown fox jumps"),     // Title Case, no all-caps
      (3L, "plain lower case words here"),
      (4L, "an ACRONYM like NASA is fine in prose actually ok"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.casingProfile(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_allcaps") == 4L)
    assert(out(1L).getAs[Long]("shouting") == 1L)
    assert(out(2L).getAs[Long]("n_allcaps") == 0L)
    assert(out(2L).getAs[Long]("n_capitalized") == 3L)
    assert(out(2L).getAs[Long]("shouting") == 0L)
    assert(out(3L).getAs[Double]("allcaps_ratio") == 0.0)
    // 2 acronyms of 10 words = 0.2 <= 0.3 -> keeps
    assert(out(4L).getAs[Long]("n_allcaps") == 2L)
    assert(out(4L).getAs[Long]("shouting") == 0L)
  }

  test("vocabCoverage: hand-computed boundary interpolation over a = 4, b = 2, c = d = 1") {
    val d = Seq((1L, "a a a a b b c d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(d).collect().map(r => r.getLong(0) -> r).toMap
    // T = 8 tokens, 4 distinct. p50: target 4 -> 'a' alone covers it.
    assert(out(50L).getAs[Long]("target_mass") == 4L)
    assert(out(50L).getAs[Long]("vocab_needed") == 1L)
    // p90: target 8 -> a(4) + b(2) + both count-1 words = 4 of 4
    assert(out(90L).getAs[Long]("target_mass") == 8L)
    assert(out(90L).getAs[Long]("vocab_needed") == 4L)
    assert(out(90L).getAs[Long]("boundary_count") == 1L)
    assert(out(99L).getAs[Long]("vocab_needed") == 4L)
    assert(out(50L).getAs[Long]("total_vocab") == 4L)
    assert(out(50L).getAs[Long]("total_tokens") == 8L)
  }

  test("quantizeError: hand-computed int8 reconstruction error; zero vector is lossless") {
    val emb = Seq(
      (1L, Seq(1.0f, -0.5f)),
      (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeError(emb).collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Double]("scale") == 1.0 / 127.0)
    // q = (127, -63): dequant errors (0, -0.5 - (-63/127))
    val e2 = -0.5 - (-63.0 * (1.0 / 127.0))
    assert(r1.getAs[Double]("mse") == (0.0 + e2 * e2) / 2.0)
    assert(r1.getAs[Double]("max_abs_err") == math.abs(e2))
    assert(r1.getAs[Long]("lossy_flag") == 0L, "max-abs int8 stays under 1e-4 MSE here")
    val r2 = out(2L)
    assert(r2.getAs[Double]("scale") == 0.0)
    assert(r2.getAs[Double]("mse") == 0.0 && r2.getAs[Double]("max_abs_err") == 0.0)
  }
}
