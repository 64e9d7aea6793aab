package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Session-5 batch-2 audits: reciprocity, lexical diversity, langid
  * confusion, IVF list balance, CUSUM drift, activity histogram. */
class CorpusAuditSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // ---- Graph.reciprocity ----

  test("reciprocity: mutual, one-way, and in-only nodes; dups and self-loops dropped") {
    val edges = Seq(("A", "B"), ("B", "A"), ("A", "C"), ("A", "A"), ("A", "B"))
      .toDF("src", "dst")
    val out = Graph.reciprocity(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(out("A") == ((2L, 1L, 1L, Some(0.5))))
    assert(out("B") == ((1L, 1L, 1L, Some(1.0))))
    assert(out("C") == ((0L, 1L, 0L, None))) // in-only: rate undefined
  }

  test("reciprocity: fully mutual ring rates 1.0 everywhere") {
    val e = Seq(("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")).toDF("src", "dst")
    val rates = Graph.reciprocity(e).collect().map(_.getDouble(4))
    assert(rates.forall(_ == 1.0))
  }

  // ---- TextAnalysis.lexicalDiversity / langConfusion ----

  test("lexicalDiversity: counts, TTR, hapax fraction; NULL text is one empty token") {
    val d = Seq((1L, "a a b"), (2L, null: String)).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversity(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 2L && r1.getLong(3) == 1L)
    assert(r1.getDouble(4) == 2.0 / 3.0 && r1.getDouble(5) == 0.5)
    val r2 = out(2L)
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 1L && r2.getLong(3) == 1L)
    assert(r2.getDouble(4) == 1.0)
  }

  test("langConfusion: rates sum to 1 within each label; confident text routes right") {
    val en = "the of and to in is was for on with" // pure en stopwords
    val de = "der die und von zu den das nicht mit sich"
    val d = Seq((1L, en, "en"), (2L, en, "en"), (3L, de, "de"), (4L, en, "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langConfusion(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(out(("en", "en")) == ((2L, 1.0)))
    assert(out(("de", "de"))._1 == 1L && out(("de", "en"))._1 == 1L)
    assert(out(("de", "de"))._2 == 0.5 && out(("de", "en"))._2 == 0.5)
  }

  // ---- SimilarityIvf.listBalance ----

  test("listBalance: sizes partition the corpus; load factors average to 1 weighted") {
    val centers = Seq(
      Array(10.0, 0, 0, 0), Array(0, 10.0, 0, 0), Array(0, 0, 10.0, 0))
    val emb = (0L until 90L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.zipWithIndex.map { case (x, d) => (x + ((i * 31 + d * 7) % 100) / 1000.0).toFloat })
    }.toDF("vec_id", "embedding")
    val out = SimilarityIvf.listBalance(emb, nLists = 4).collect()
    assert(out.map(_.getLong(1)).sum == 90L)
    assert(out.forall(_.getLong(2) == out.length)) // n_lists_used on every row
    // sum of n_vecs * load_factor / nLists == n_total  <=>  weighted mean 1
    val weighted = out.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(weighted - out.map(r => r.getLong(1) * r.getLong(1)).sum * 4.0 / 90.0) < 1e-9)
  }

  // ---- Anomaly.cusumDrift ----

  test("cusumDrift: integer prefix sums, pinned deviation, flag only past the band") {
    val ev = (Seq.fill(9)(0L) ++ Seq(1L, 2L, 2L, 2L)).zipWithIndex.map { case (d, i) =>
      (i.toLong, d * 86400000L, "a")
    }.toDF("event_id", "ts_ms", "event_type")
    // daily counts: day0 -> 9, day1 -> 1, day2 -> 3; mean = 13/3
    val out = Anomaly.cusumDrift(ev, "event_type", "ts_ms", threshold = 0.5).collect()
      .map(r => r.getLong(1) -> r).toMap
    val mean = 13.0 / 3.0
    assert(out(0L).getLong(4) == 9L && out(1L).getLong(4) == 10L && out(2L).getLong(4) == 13L)
    assert(out(0L).getDouble(6) == 9.0 - 1.0 * mean)
    assert(out(2L).getDouble(6) == 13.0 - 3.0 * mean) // exactly 0 at the end
    // |9 - mean| = 4.67 > 0.5 * mean = 2.33 -> drift on day 0, none on day 2
    assert(out(0L).getLong(7) == 1L && out(2L).getLong(7) == 0L)
  }

  test("cusumDrift: a flat series never drifts at any threshold") {
    val ev = (0 until 30).map(i => (i.toLong, (i % 10) * 86400000L, "t"))
      .toDF("event_id", "ts_ms", "event_type")
    assert(Anomaly.cusumDrift(ev, "event_type", "ts_ms", 0.001)
      .where(col("is_drift") === 1L).isEmpty)
  }

  // ---- Similarity.cosineSweep ----

  test("cosineSweep: cumulative counts monotone, parallel pair survives to 0.95") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(2f, 0f, 0f, 0f)), // cos 1.0
      (2L, Array(1f, 1f, 0f, 0f)),                              // cos ~0.707 with 0/1
      (3L, Array(-1f, 0f, 0f, 0f))).toDF("vec_id", "embedding") // opposite bucket
    val out = Similarity.cosineSweep(vecs).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).sortBy(_._1)
    assert(out.length == 14)
    assert(out.zip(out.tail).forall { case ((_, a), (_, b)) => a >= b })
    assert(out.last._2 >= 1L)       // the parallel pair clears 0.95
    assert(out.head._2 > out.last._2) // the 0.707 pairs drop out
  }

  // ---- Funnel.churn / seasonality ----

  test("churn: next-week presence retains, last week flagged unjudgeable") {
    val wk = 7L * 86400000L
    val ev = Seq((1L, 0L), (2L, 0L), (1L, wk), (3L, wk))
      .map { case (u, t) => (u, t, "x") }.toDF("user_id", "ts_ms", "event_type")
    val out = Funnel.churn(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getLong(5)))).toMap
    assert(out(0L) == ((2L, 1L, 0.5, 0L))) // u1 returns, u2 churns
    assert(out(1L) == ((2L, 0L, 1.0, 1L))) // last week: all "churn", flagged
  }

  test("seasonality: integer dow/hour cells, shares partition 1") {
    // epoch day 0 is a Thursday; ts 0 -> dow 0, hour 0
    val ev = Seq((1L, 0L), (2L, 3600000L), (3L, 4L * 86400000L))
      .map { case (u, t) => (u, t, "x") }.toDF("user_id", "ts_ms", "event_type")
    val out = Funnel.seasonality(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (4L, 0L) -> 1L))
    val shares = Funnel.seasonality(ev).collect().map(_.getDouble(3)).sum
    assert(math.abs(shares - 1.0) < 1e-12)
  }

  // ---- TextAnalysis.scriptProfile / Funnel.newVsReturning ----

  test("scriptProfile: per-script code-point counts, dominant pick, emoji to other") {
    val d = Seq(
      (1L, "hello мир 中文 سلام"),   // 5 latin, 3 cyr, 2 han, 4 arabic
      (2L, "🎉🎉"),                  // surrogate pairs -> other, no crash
      (3L, ""), (4L, null: String)).toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(d).collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 5L && r1.getLong(2) == 2L && r1.getLong(3) == 3L && r1.getLong(4) == 4L)
    assert(r1.getString(7) == "latin" && r1.getDouble(8) == 5.0 / 14.0)
    val r2 = out(2L)
    assert(r2.getLong(5) == 2L && r2.getString(7) == "other") // 2 code points, not 4 units
    assert(out(3L).isNullAt(7) && out(4L).isNullAt(8))
  }

  test("newVsReturning: first-seen day splits new from returning") {
    val day = 86400000L
    val ev = Seq((1L, 0L), (2L, 0L), (1L, day), (3L, day), (1L, 2 * day))
      .map { case (u, t) => (u, t, "x") }.toDF("user_id", "ts_ms", "event_type")
    val out = Funnel.newVsReturning(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(out(0L) == ((2L, 0L, 1.0)))
    assert(out(1L) == ((1L, 1L, 0.5)))
    assert(out(2L) == ((0L, 1L, 0.0)))
  }

  // ---- Curation.balancedSample / Dedup.lshCurve ----

  test("balancedSample: groups land near the min-group size; min group keeps all") {
    val d = (0L until 400L).map(i =>
      (i, "text", if (i < 40) "de" else if (i < 160) "es" else "en"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.balancedSample(d)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 40L) // rate 1 keeps everything
    assert(byLang("en") <= 80L && byLang("en") >= 15L) // ~40 expected
    val rates = out.select("lang", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("de") == 1.0 && rates("es") == 40.0 / 120 && rates("en") == 40.0 / 240)
  }

  test("lshCurve: textbook S-curve values for the 4x2 banding") {
    val out = Dedup.lshCurve(spark).collect()
      .map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    def expect(t: Double) = { val q = 1.0 - t * t; 1.0 - ((q * q) * q) * q }
    assert(out.size == 10)
    for ((t, p) <- out) assert(p == expect(t))
    // monotone increasing in t
    val sorted = out.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a < b })
  }

  // ---- Multimodal.exactDedup ----

  test("media exactDedup: byte-identical payloads collapse, min id keeps, NULL = empty") {
    val m = Seq(
      (1L, "same bytes", "image"), (2L, "same bytes", "image"),
      (3L, "other", "audio"), (4L, null: String, "video"), (5L, "", "video"))
      .toDF("media_id", "text", "media_type")
      .select(col("media_id"), col("text").cast("binary").as("payload"), col("media_type"))
    val out = Multimodal.exactDedup(m).collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5)
    assert(out(1L).getLong(5) == 1L && out(2L).getLong(5) == 0L)
    assert(out(2L).getLong(3) == 1L && out(2L).getLong(4) == 2L)
    assert(out(3L).getLong(5) == 1L)
    // NULL payload and empty payload share the empty-content group
    assert(out(4L).getString(2) == out(5L).getString(2))
    assert(out(4L).getLong(5) == 1L && out(5L).getLong(5) == 0L)
  }

  // ---- Graph.khopReach / Funnel.stickiness ----

  test("khopReach: BFS levels, min-hop on diamonds, cycles don't re-add") {
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("D", "A"))
      .toDF("src", "dst")
    val seeds = Seq("A").toDF("domain")
    val out = Graph.khopReach(edges, seeds, maxHops = 3).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // level 0: A; level 1: B, C; level 2: D (once, min-hop); cycle back to A ignored
    assert(out == Map(0L -> 1L, 1L -> 2L, 2L -> 1L))
    val shallow = Graph.khopReach(edges, seeds, maxHops = 1).collect()
      .map(r => r.getLong(1)).toSet
    assert(shallow == Set(0L, 1L))
  }

  test("stickiness: exact rolling distinct over the window-end explode") {
    val day = 86400000L
    val ev = Seq((1L, 0L), (1L, day), (2L, 0L), (1L, 100L)) // u1 days 0,1; u2 day 0
      .map { case (u, t) => (u, t, "x") }.toDF("user_id", "ts_ms", "event_type")
    val out = Funnel.stickiness(ev, windowDays = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((2L, 2L, 1.0)))
    assert(out(1L) == ((1L, 2L, 0.5))) // dau u1; mau {u1, u2} from day 0-1
    assert(!out.contains(2L))          // no activity that day -> no row
  }

  // ---- Similarity.knnMargin ----

  test("knnMargin: top1/top2 pivot, margin subtraction, single-candidate NULL") {
    // query 0 against axis-aligned candidates: cos(0,1)=0 for orthogonal,
    // 1.0 for parallel; candidate 3 is the near-parallel runner-up
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(2f, 0f, 0f, 0f)),   // parallel -> sim 1.0
      (2L, Array(0f, 1f, 0f, 0f)),   // orthogonal -> 0.0
      (3L, Array(1f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.knnMargin(vecs, vecs.where(col("vec_id") === 0)).collect()(0)
    assert(out.getLong(1) == 1L && out.getDouble(2) == 1.0)
    assert(math.abs(out.getDouble(4) - (1.0 - 1.0 / math.sqrt(2))) < 1e-12)
    val two = vecs.where(col("vec_id") < 2)
    val solo = Similarity.knnMargin(two, two.where(col("vec_id") === 0)).collect()(0)
    assert(solo.getDouble(2) == 1.0 && solo.isNullAt(3) && solo.isNullAt(4))
  }

  // ---- Dedup.dfProfile ----

  test("dfProfile: log2 bands, exact pair mass, shares partition 1") {
    // 3 identical docs (every shingle df=3, bucket 1) + 1 unique doc
    // (shingles df=1, bucket 0, pair mass 0)
    val d = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta"), (4L, "epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val out = Dedup.dfProfile(d).collect().map(r => r.getLong(0) -> r).toMap
    // 2 distinct shingles per doc-text (4 words -> 2 word-3-grams)
    assert(out(0L).getLong(2) == 2L && out(0L).getLong(3) == 2L
      && out(0L).getDouble(4) == 0.0)
    assert(out(1L).getLong(1) == 2L) // min_df = 2^1
    assert(out(1L).getLong(2) == 2L && out(1L).getLong(3) == 6L)
    assert(out(1L).getDouble(4) == 6.0) // 2 shingles x C(3,2)
    assert(out(1L).getDouble(5) == 1.0) // all pair mass in band 1
  }

  // ---- Funnel.rfm / abReport ----

  test("rfm: recency anchored to the data's last conversion day; non-converters absent") {
    val day = 86400000L
    val ev = Seq(
      (1L, 0L, "purchase", 10.0), (1L, 5 * day, "purchase", 20.0),
      (2L, 3 * day, "purchase", 7.5), (3L, 9 * day, "view", 1.0))
      .toDF("user_id", "ts_ms", "event_type", "value")
    val out = Funnel.rfm(ev).collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L)) // user 3 never purchased
    assert(out(1L).getLong(2) == 0L && out(1L).getLong(3) == 2L && out(1L).getDouble(4) == 30.0)
    assert(out(2L).getLong(2) == 2L && out(2L).getLong(3) == 1L && out(2L).getDouble(4) == 7.5)
  }

  test("abReport: hand-computed rates, lift, pooled z on a planted split") {
    // control: users 0,2 (1 converts); treat: users 1,3 (2 convert)
    val ev = Seq(
      (0L, "purchase"), (2L, "view"), (1L, "purchase"), (3L, "purchase"),
      (0L, "view"), (1L, "view"))
      .map { case (u, t) => (u, t, 0L) }.toDF("user_id", "event_type", "ts_ms")
      .withColumn("variant", when(col("user_id") % 2 === 0, "control").otherwise("treat"))
    val r = Funnel.abReport(ev, "variant").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getDouble(2) == 0.5)
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L && r.getDouble(5) == 1.0)
    assert(r.getDouble(6) == 0.5)           // lift_abs
    assert(r.getDouble(7) == 1.0)           // lift_rel
    val pooled = 3.0 / 4.0
    val se = math.sqrt(pooled * (1 - pooled) * (0.5 + 0.5))
    assert(math.abs(r.getDouble(8) - 0.5 / se) < 1e-12)
  }

  // ---- TimeSeries.seasonalError ----

  test("seasonalError: exact-lag pairs only, MAE/WMAPE, zero-actual NULL") {
    val p = 1000L
    val pts = Seq(
      ("m", "s", 0L, 2.0), ("m", "s", p, 3.0), ("m", "s", 2 * p, 1.0),
      ("m", "s", 3 * p + 1, 9.0), // off-grid: no partner either way
      ("m", "z", 0L, 0.0), ("m", "z", p, 0.0))
      .toDF("metric", "series", "ts", "value")
    val out = TimeSeries.seasonalError(pts, p).collect()
      .map(r => r.getString(1) -> r).toMap
    val s = out("s") // pairs: (3,2), (1,3) -> abs errs 1, 2; actuals 3, 1
    assert(s.getLong(2) == 2L && s.getDouble(3) == 1.5)
    assert(s.getDouble(4) == 3.0 / 4.0)
    val z = out("z") // one pair of zeros: mae 0, wmape NULL
    assert(z.getLong(2) == 1L && z.getDouble(3) == 0.0 && z.isNullAt(4))
  }

  // ---- TimeSeries.topSeries / Funnel.timeToConvert ----

  test("topSeries: two-level prune equals the global top-k, ties on series") {
    val pts = (0L until 60L).map { i =>
      ("m", Map("h" -> s"h${i % 12}"), i, (i % 12).toDouble) // series h11 sums highest
    }.toDF("metric", "tags", "ts", "value")
    val out = TimeSeries.topSeries(pts, "sum", k = 3, nShards = 4).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(out.length == 3)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.head._2 == "h=h11" && out.head._3 == 55.0)
    // sharding must not change the answer
    val wide = TimeSeries.topSeries(pts, "sum", k = 3, nShards = 1).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(wide.toSeq == out.toSeq)
  }

  test("timeToConvert: carry-forward last touch, log2 bands, no-touch bucket") {
    val ev = Seq(
      (1L, 0L, "click"), (1L, 5L, "purchase"),       // delay 5 -> bucket 2
      (2L, 0L, "view"), (2L, 1024L, "purchase"),     // delay 1024 -> bucket 10
      (3L, 0L, "purchase"),                          // no touch -> -1
      (4L, 0L, "click"), (4L, 0L, "purchase"))       // same-ms: window excludes later rows?
      .zipWithIndex.map { case ((u, t, ty), i) => (u, t, i.toLong, ty) }
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val out = Funnel.timeToConvert(ev).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2)))).toMap
    assert(out(2L) == ((Some(4L), 1L)))
    assert(out(10L) == ((Some(1024L), 1L)))
    assert(out(-1L)._1.isEmpty)
    // user 4: click at same ms but EARLIER event_id -> prior row, delay 0 -> bucket 0
    assert(out(0L) == ((Some(1L), 1L)))
    assert(out(-1L)._2 == 1L) // only user 3 never touched
  }

  // ---- TimeSeries.gapReport / Curation.packStats ----

  test("gapReport: max gap, bucket coverage, single-point series") {
    val p = 3600000L
    val pts = Seq(
      ("m", "s", 0L, 1.0), ("m", "s", 1000L, 1.0),      // same bucket
      ("m", "s", 3 * p, 1.0),                            // skips buckets 1-2
      ("m", "z", 42L, 1.0))                              // single point
      .toDF("metric", "series", "ts", "value")
    val out = TimeSeries.gapReport(pts, p).collect().map(r => r.getString(1) -> r).toMap
    val s = out("s")
    assert(s.getLong(2) == 3L && s.getLong(6) == 3 * p - 1000L) // max gap
    assert(s.getLong(7) == 2L && s.getLong(8) == 4L)            // 2 of 4 buckets
    assert(s.getDouble(9) == 0.5)
    val z = out("z")
    assert(z.getLong(2) == 1L && z.isNullAt(6) && z.getDouble(9) == 1.0)
  }

  test("packStats: fill rate and boundary-straddling fraction, hand grid") {
    // one shard (nShards=1), ctxLen=10; docs of 4,4,4 tokens -> starts 0,4,8
    // (md5-order dependent) — totals are order-free: 12 tokens, 2 packs,
    // fill 0.6; exactly one doc straddles the 10-token boundary
    val d = Seq((1L, "a b c d"), (2L, "e f g h"), (3L, "i j k l"))
      .toDF("doc_id", "text")
    val r = Curation.packStats(d, ctxLen = 10L, nShards = 1).collect()(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 12L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 0.6)
    assert(r.getLong(5) == 1L && math.abs(r.getDouble(6) - 1.0 / 3) < 1e-15)
  }

  // ---- Funnel.activityHistogram ----

  test("activityHistogram: log2 buckets, min_events, and shares") {
    // user event counts: u1 -> 1, u2 -> 2, u3 -> 3, u4 -> 8
    val ev = (Seq.fill(1)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(3)(3L) ++ Seq.fill(8)(4L))
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("event_id", "user_id")
    val out = Funnel.activityHistogram(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(0L) == ((1L, 1L, 1L, 0.25, 1.0 / 14)))
    assert(out(1L) == ((2L, 2L, 5L, 0.5, 5.0 / 14)))
    assert(out(3L) == ((8L, 1L, 8L, 0.25, 8.0 / 14)))
    assert(out.values.map(_._2).sum == 4L && out.values.map(_._3).sum == 14L)
  }

  test("qualityCalibration: dup pair shares a bucket; NULL text lands in -1") {
    val good = "the quick brown fox jumps over the lazy dog and then the " +
      "fox runs away into the quiet woods before the dog can even see it"
    val docs = Seq[(Long, Option[String])](
      (1L, Some(good)), (2L, Some(good)),          // exact dups, same bucket
      (3L, Some("zz qq xx ww vv")),                // no stopwords, low score
      (4L, None)                                   // NULL -> sentinel bucket
    ).toDF("doc_id", "text")
    val out = Curation.qualityCalibration(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.values.map(_.getLong(1)).sum == 4L)      // every doc accounted
    assert(out.contains(-1L) && out(-1L).getLong(1) == 1L)
    assert(out(-1L).isNullAt(4))                         // no quality to mean
    val dupBucket = out.values.find(_.getLong(3) > 0L).get
    assert(dupBucket.getLong(3) == 2L)                   // both copies flagged
    assert(dupBucket.getDouble(5) == 2.0 / dupBucket.getLong(1))
    // non-sentinel means sit inside their decile
    out.filter(_._1 >= 0L).foreach { case (b, r) =>
      val m = r.getDouble(4)
      assert(m >= b / 10.0 - 1e-6 && m <= (b + 1) / 10.0 + 1e-6, s"bucket $b mean $m")
    }
  }
}
