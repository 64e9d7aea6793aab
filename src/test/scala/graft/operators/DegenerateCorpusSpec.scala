package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Robustness sweep: every document operator must survive a pathological
 * corpus — empty text, whitespace-only, single char, punctuation-only,
 * multibyte + surrogate-pair unicode, a 10k-char single word, embedded
 * newlines/tabs, and NULL text — without throwing, and with the documented
 * degenerate semantics (NULL scores via safeDiv, zero counts, drops) rather
 * than ANSI division errors or NPEs. One empty doc must never be able to
 * kill a 100 TB curation job.
 */
class DegenerateCorpusSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def nasty: DataFrame = Seq[(Long, Option[String])](
    (1L, Some("")),
    (2L, Some("   ")),
    (3L, Some("x")),
    (4L, Some("!!! ??? ***")),
    (5L, Some("ä 中文 🎉 é words")),
    (6L, Some("w" * 10000)),
    (7L, Some("line one\nline two\nline one\n\n\tend")),
    (8L, None),
    (9L, Some("a normal english sentence with the and of words here"))
  ).toDF("doc_id", "text")

  // lang/source columns for the curation ops that group by them
  private def nastyFull: DataFrame = nasty
    .withColumn("lang", lit("en")).withColumn("source", lit("s"))

  test("row-wise text operators survive the degenerate corpus") {
    val d = nasty
    assert(TextAnalysis.tokenCounts(d).count() == 9)
    assert(TextAnalysis.tokenCountsBpe(d).count() == 9)
    assert(TextAnalysis.languageId(d).count() == 9)
    assert(TextAnalysis.qualityScore(d).count() == 9)
    assert(TextAnalysis.gopherFilter(d).count() == 9)
    assert(TextAnalysis.gopherRepetition(d).count() == 9)
    assert(TextAnalysis.blocklistFilter(d, Seq("x")).count() == 9)
    assert(TextAnalysis.domainFilter(d, Seq("bad.example")).count() == 9)
    assert(TextAnalysis.repetition(d).count() == 9)
    assert(TextAnalysis.fingerprint(d).count() == 9)
    assert(TextAnalysis.urls(d).count() == 9)
    assert(TextAnalysis.redactPii(d).count() == 9)
    assert(TextAnalysis.normalizeText(d).count() == 9)
    // empty/null text chunks to nothing; the rest emit >= 1 window each
    assert(TextAnalysis.chunk(d).count() >= 5)
    assert(TextAnalysis.vocab(d, 10).count() <= 10)
  }

  test("degenerate rows score NULL or zero, never throw ANSI division errors") {
    val q = TextAnalysis.qualityScore(nasty).collect().map(r => r.getLong(0) -> r).toMap
    assert(q(1L).isNullAt(q(1L).fieldIndex("quality")))   // empty: 0-length division -> NULL
    assert(!q(9L).isNullAt(q(9L).fieldIndex("quality")))  // normal text scores
    val g = TextAnalysis.gopherFilter(nasty).collect().map(r => r.getLong(0) -> r).toMap
    assert(g(1L).getLong(g(1L).fieldIndex("keep")) == 0L) // degenerate -> drop, not crash
    val rep = TextAnalysis.gopherRepetition(nasty).collect().map(r => r.getLong(0) -> r).toMap
    assert(rep(1L).isNullAt(rep(1L).fieldIndex("dup_line_frac"))) // no lines -> NULL
    assert(rep(1L).getLong(rep(1L).fieldIndex("keep")) == 1L)     // NULL can't exceed a cap
    assert(rep(7L).getDouble(rep(7L).fieldIndex("dup_line_frac")) > 0.0) // real dup lines
  }

  test("dedup family survives the degenerate corpus") {
    val d = nasty
    assert(Dedup.exact(d).count() >= 1)
    // shingle ops: only docs with >= 3 words participate; none may throw
    assert(Dedup.ngramJaccard(d, threshold = 0.5).count() >= 0)
    assert(Dedup.containment(d, threshold = 0.5).count() >= 0)
    assert(Dedup.minhashLsh(d).count() >= 0)
    assert(Dedup.simhashPairs(d, maxHamming = 6).count() >= 0)
    assert(Dedup.passageDedup(d).count() == 9)
    assert(Dedup.boilerplateStrip(d, minDocs = 2L).count() == 9)
    assert(Dedup.urlDedup(d).count() == 9)
    assert(Dedup.keepBest(d, threshold = 0.5).count() == 9)
    assert(Dedup.substringSpans(d, k = 3).count() >= 0)
    val inc = d.where(col("doc_id") % 2 === 0)
    val exi = d.where(col("doc_id") % 2 =!= 0)
    assert(Dedup.bloomScreen(inc, exi).count() >= 0)
    assert(Dedup.bloomScreenSharded(inc, exi, shardHexDigits = 1).count() >= 0)
  }

  test("curation and tokenizer training survive the degenerate corpus") {
    val d = nastyFull
    assert(d.where(Curation.hashSample(8)).count() >= 0)
    assert(Curation.stratifiedSample(d, Map("en" -> 8)).count() >= 0)
    assert(Curation.topKByLanguage(nasty, 3).count() >= 1)
    assert(Curation.tokenBudget(nasty, 100L).count() >= 1)
    assert(Curation.splitAssign(nasty).count() == 9)
    assert(Curation.mixReport(d).count() >= 1)
    assert(Curation.qualitySummary(nasty).count() >= 1)
    assert(TextAnalysis.bpeTrain(nasty, iters = 2).count() == 2)
    assert(TextAnalysis.bpeEncodeCounts(nasty, iters = 2).count() >= 1)
    // an ALL-degenerate corpus (no trainable words at all) must yield empty
    // results, not a crash
    val empty = Seq[(Long, Option[String])]((1L, Some("")), (2L, None)).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(empty, iters = 2).count() == 0)
    assert(TextAnalysis.bpeEncodeCounts(empty, iters = 2).count() == 0)
  }

  test("round-8 operators survive the degenerate corpus") {
    val d = nasty
    // audit: candidates need >= 3-word docs; candidate-bounded exact side
    assert(Dedup.minhashAudit(d, threshold = 0.5).count() >= 0)
    // html strip: NULL text stays NULL, everything else sanitizes
    assert(TextAnalysis.htmlStrip(d).count() == 9)
    // fertility: only docs with encodable words contribute; no division error
    assert(TextAnalysis.bpeFertility(d, iters = 2).count() >= 1)
    val allEmpty = Seq[(Long, Option[String])]((1L, Some("")), (2L, None)).toDF("doc_id", "text")
    assert(TextAnalysis.bpeFertility(allEmpty, iters = 2).count() == 0)
    // epoch mix: zero-token sources and an empty corpus report full deficit
    assert(Curation.epochMix(nastyFull, Map("s" -> 10000L), budgetTokens = 100L).count() == 1)
    assert(Curation.epochMix(
      allEmpty.withColumn("source", lit("gone")).where(lit(false)),
      Map("gone" -> 10000L), budgetTokens = 100L).count() == 1)
  }

  test("round-8 event/embedding operators survive degenerate inputs") {
    val noEvents = Seq.empty[(Long, Long, Long, String)].toDF("event_id", "user_id", "ts", "event_type")
    assert(Funnel.attributionMulti(noEvents, "user_id", "ts", "event_id", "event_type",
      "buy", Seq("click"), lookbackMs = 100L).count() == 0)
    val noVals = Seq.empty[(Long, String, Double)].toDF("event_id", "event_type", "value")
    assert(Anomaly.zscoreOutliers(noVals).count() == 0)
    // single vector: PQ trains a 1-codeword book, kNN returns nothing
    val one = Seq((1L, Array.fill(16)(1.0f))).toDF("vec_id", "embedding")
    val cb = SimilarityPq.codebook(one, m = 4, ksub = 4, dim = 16)
    assert(SimilarityPq.encode(one, cb).count() == 1)
    assert(SimilarityPq.adcKnn(one, one, k = 3, m = 4, ksub = 4, dim = 16).count() == 0)
    assert(Similarity.bqKnn(one, one, k = 3, bits = 8, dim = 16).count() == 0)
    assert(Similarity.prefixKnn(one, one, k = 3, prefixDim = 8).count() == 0)
  }

  test("session-2 operators survive degenerate inputs") {
    // pageRank: empty edge list -> empty ranks; a single self-loop keeps all
    // its mass (teleport + damped self-contribution, floors only)
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.pageRank(noEdges, iters = 3).count() == 0)
    val selfLoop = Seq(("a", "a")).toDF("src", "dst")
    val sr = Graph.pageRank(selfLoop, iters = 3).collect()
    assert(sr.length == 1 && sr.head.getLong(1) > 999999999990L)
    // eval/MMR: empty hits and empty qrels degrade, never throw
    val noHits = Seq.empty[(Long, Long, Long)].toDF("query_id", "doc_id", "rank")
    val someRels = Seq((1L, 2L)).toDF("query_id", "doc_id")
    val ev0 = Search.evalReport(noHits, someRels).collect()
    assert(ev0.length == 1 && ev0.head.getDouble(5) == 0.0)
    assert(Search.evalReport(noHits, someRels.where(lit(false))).count() == 0)
    val emb = Seq((2L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    assert(Search.mmrSelect(noHits, emb, k = 3).count() == 0)
    // zero-norm embedding: no defined cosine -> excluded by contract (would
    // be an ANSI divide-by-zero in the similarity term otherwise)
    val zcands = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val zemb = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val zout = Search.mmrSelect(zcands, zemb, k = 3).collect().map(_.getLong(2)).toSet
    assert(zout == Set(1L, 3L))
    // length report / sentence stats on the nasty corpus
    assert(Curation.lengthReport(nastyFull).count() == 1)
    assert(TextAnalysis.sentenceStats(nasty).count() == 9)
    val s1 = TextAnalysis.sentenceStats(nasty).collect().map(r => r.getLong(0) -> r).toMap
    assert(s1(1L).getLong(1) == 0L && s1(1L).isNullAt(4)) // empty text: no sentences, NULL mean
    assert(s1(4L).getLong(1) == 1L) // "!!! ??? ***": the non-terminal "***" tail survives
    // MAD / streaming z-score / heavy hitters on empty and tiny frames
    val noVals2 = Seq.empty[(Long, String, Double)].toDF("event_id", "event_type", "value")
    assert(Anomaly.madOutliers(noVals2).count() == 0)
    assert(Anomaly.zscoreStreamFlags(noVals2).count() == 0)
    val oneEvent = Seq((1L, "t", 5.0)).toDF("event_id", "event_type", "value")
    assert(Anomaly.madOutliers(oneEvent).count() == 0)
    assert(Anomaly.zscoreStreamFlags(oneEvent).count() == 0)
    val noTs = Seq.empty[(Long, Long, String)].toDF("user_id", "ts_ms", "event_type")
    assert(Funnel.heavyHitters(noTs, "event_type", "ts_ms", "user_id").count() == 0)
    // negative (pre-1970) timestamps bucket by FLOOR division
    val neg = Seq((1L, -1L, "t"), (2L, -86400001L, "t")).toDF("user_id", "ts_ms", "event_type")
    val days = Funnel.heavyHitters(neg, "event_type", "ts_ms", "user_id")
      .select("day").collect().map(_.getLong(0)).sorted.toSeq
    assert(days == Seq(-2L, -1L))
  }

  test("session-3 operators survive degenerate inputs") {
    // text screens: NULL/empty/unicode rows pass without ANSI errors
    assert(TextAnalysis.mojibakeStats(nasty).count() == 9)
    assert(TextAnalysis.codeDetect(nasty).count() == 9)
    val cd = TextAnalysis.codeDetect(nasty).collect().map(r => r.getLong(0) -> r).toMap
    assert(cd(1L).isNullAt(4) && cd(1L).getLong(5) == 0L) // empty: NULL ratio
    assert(cd(8L).isNullAt(4) && cd(8L).getLong(5) == 0L) // NULL text same
    assert(Dedup.fuzzyExact(nasty).count() >= 1) // "", "   ", "!!!", NULL share one group
    val fz = Dedup.fuzzyExact(nasty).collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(fz(1L) == 4L) // the four normalize-to-empty rows collapse
    // decontam: empty probe overlap -> everything keeps
    val dec = Curation.decontamFilter(nasty, nasty.where(col("doc_id") === 999L))
    assert(dec.where(col("keep") === 1L).count() == 9)
    // sourceOverlap: single source -> no pairs; NULL text hashes as ''
    assert(Curation.sourceOverlap(nastyFull).count() == 0)
    // near-dup matrix over an empty pair frame -> empty, not a crash
    assert(Curation.nearDupSourceMatrix(nastyFull,
      Dedup.containment(nastyFull, threshold = 0.99)).count() >= 0)
    // graphs: empty edge list -> empty outputs, no division errors
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.hits(noEdges, iters = 3).count() == 0)
    assert(Graph.components(noEdges).count() == 0)
    // hits: a single self-loop keeps all mass on one node
    val selfLoop = Seq(("A", "A")).toDF("src", "dst")
    val h = Graph.hits(selfLoop, iters = 2).collect()
    assert(h.length == 1 && h.head.getLong(1) == 1000000000000L)
    // botFlag / pathTransitions: empty and single-event frames
    val noEv = Seq.empty[(String, Long, Long)].toDF("user_id", "event_id", "ts_us")
    assert(Anomaly.botFlag(noEv, "user_id", "ts_us", "event_id").count() == 0)
    assert(Funnel.pathTransitions(
      noEv.withColumnRenamed("ts_us", "ts_ms"), "user_id", "ts_ms", "event_id", "user_id").count() == 0)
    // isotropy over an all-zero-vector corpus: no directions -> empty agg
    // survives (n_vecs NULL is fine, no division error); density over one
    // vector: no neighbors -> empty, not a crash
    val zeros = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.isotropy(zeros).count() == 1)
    assert(Similarity.selfKnnDensity(zeros, k = 2, probeMod = 1L).count() == 0)
    // dimStats/normOutliers: a single vector is its own mean (not outlier)
    val one = Seq((1L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    assert(Similarity.dimStats(one).count() == 2)
    val no1 = Similarity.normOutliers(one).collect().head
    assert(no1.getLong(4) == 0L)
    // topPrincipalComponent: identical vectors -> zero covariance -> the
    // zero vector (tot=0 guard), never a division error
    val same = (1L to 5L).map(i => (i, Seq(0.25f, 0.75f))).toDF("vec_id", "embedding")
    assert(Similarity.topPrincipalComponent(same, iters = 3).collect()
      .forall(_.getLong(1) == 0L))
    // cellPurity: more lists than vectors -> every non-empty list is pure
    val purity = SimilarityIvf.cellPurity(
      Seq((1L, Seq(1f, 0f), 1), (2L, Seq(0f, 1f), 2)).toDF("vec_id", "embedding", "label"),
      nLists = 8)
    assert(purity.collect().forall(_.getDouble(5) == 1.0))
  }

  test("session-4 operators survive degenerate inputs") {
    // charDiversity: empty and NULL drop; single char / unicode / 10k-run fine
    val cd = TextAnalysis.charDiversity(nasty).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!cd.contains(1L) && !cd.contains(8L))
    assert(cd(3L).getLong(1) == 1L && cd(3L).getDouble(4) == 1.0)
    assert(cd(6L).getLong(1) == 10000L && cd(6L).getLong(2) == 1L)
    assert(cd(5L).getLong(1) > 0L) // surrogate-pair emoji counts as one char
    // pmiBigrams: degenerate corpus has no pair above the floor -> empty, no throw
    assert(TextAnalysis.pmiBigrams(nasty, minCount = 5L, topK = 10).count() == 0)
    // winnow: only the long-word and normal rows reach gramLen; no throw
    val wn = Dedup.winnow(nasty)
    assert(wn.where(col("doc_id") === 6L).count() == 1) // 10k same-char doc: one fp
    assert(Dedup.winnowPairs(nasty).collect().forall(r => r.getLong(2) >= 2L))
    // groupSplit: NULL text falls back to the source shard
    val gs = Curation.groupSplit(nastyFull).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gs(8L).startsWith("s:"))
    // triangles: empty edges and a pure self-loop graph yield empty output
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.triangles(noEdges).count() == 0)
    assert(Graph.triangles(Seq(("A", "A")).toDF("src", "dst")).count() == 0)
    // concurrency: empty events; single event = 1-session day of 1 ms
    val noEv = Seq.empty[(Long, Long, String)].toDF("event_id", "ts_ms", "user_id")
    assert(Sessionize.concurrency(noEv, "user_id", "ts_ms", "event_id", 1000L).count() == 0)
    val one = Sessionize.concurrency(
      Seq((1L, 5000L, "u")).toDF("event_id", "ts_ms", "user_id"),
      "user_id", "ts_ms", "event_id", 1000L).collect().head
    assert(one.getLong(1) == 1L && one.getLong(2) == 1L && one.getLong(3) == 1L)
    // rpKnn: fewer corpus rows than k*overfetch still returns <= k rows/query
    val tiny = (0L until 4L).map(i => (i, Array.fill(8)(i.toFloat + 1))).toDF("vec_id", "embedding")
    val knn = Similarity.rpKnn(tiny, tiny.where(col("vec_id") === 0L), k = 5, outDim = 4, dim = 8)
    assert(knn.count() == 3)
  }

  test("session-5 operators survive degenerate inputs") {
    // lexicalDiversity: every doc gets a row; "" and NULL are one empty token
    val ld = TextAnalysis.lexicalDiversity(nasty).collect().map(r => r.getLong(0) -> r).toMap
    assert(ld.size == 9 && ld(1L).getLong(1) == 1L && ld(8L).getLong(1) == 1L)
    assert(ld(6L).getDouble(4) == 1.0) // 10k-char single word: one type
    // langConfusion: degenerate docs fall to the tie-break guess, rates defined
    val lc = TextAnalysis.langConfusion(nastyFull).collect()
    assert(lc.map(_.getLong(2)).sum == 9L && lc.forall(_.getDouble(4) > 0.0))
    // dfProfile / thresholdSweep / clusterSizes / dedupSavings: no throw on a
    // corpus where most docs have no shingle at all
    assert(Dedup.dfProfile(nasty).collect().forall(_.getLong(2) > 0L))
    assert(Dedup.thresholdSweep(nasty).count() == 10)
    val cs = Dedup.clusterSizes(nasty).collect()
    assert(cs.map(r => r.getLong(2)).sum == 9L) // every doc accounted
    val sav = Curation.dedupSavings(nastyFull).collect()(0)
    assert(sav.getLong(1) == 9L && sav.getLong(3) >= 1L)
    // linkPredict/reciprocity: empty and self-loop-only graphs yield empty
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.linkPredict(noEdges).count() == 0)
    assert(Graph.reciprocity(Seq(("A", "A")).toDF("src", "dst")).count() == 0)
    // slidingCounts / cusumDrift / activityHistogram / rfm / abReport on
    // empty events: empty output, no throw
    val noEv = Seq.empty[(Long, Long, String)].toDF("user_id", "ts_ms", "event_type")
    assert(Sessionize.slidingCounts(noEv, "event_type", "ts_ms", "user_id").count() == 0)
    assert(Anomaly.cusumDrift(noEv, "event_type", "ts_ms").count() == 0)
    assert(Funnel.activityHistogram(noEv.withColumnRenamed("ts_ms", "x")).count() == 0)
    assert(Funnel.rfm(noEv.withColumn("value", lit(1.0))).count() == 0)
    // abReport with a single variant present: the a/b sides coincide, z NULL
    val oneVar = Seq((1L, 0L, "purchase")).toDF("user_id", "ts_ms", "event_type")
      .withColumn("variant", lit("only"))
    val ab = Funnel.abReport(oneVar, "variant").collect()(0)
    assert(ab.getLong(0) == 1L && ab.getLong(3) == 1L && ab.isNullAt(8))
    // seasonalError: single-point series have no lag partner -> absent
    val onePt = Seq(("m", "s", 0L, 1.0)).toDF("metric", "series", "ts", "value")
    assert(TimeSeries.seasonalError(onePt, 1000L).count() == 0)
    // downsamplePercentile: empty input; NULL-free single bucket
    val noPts = Seq.empty[(String, Map[String, String], Long, Double)]
      .toDF("metric", "tags", "ts", "value")
    assert(TimeSeries.downsamplePercentile(noPts, 1000L, 0.5).count() == 0)
    // knnMargin: empty corpus beyond the query itself -> no row for the query
    val solo = Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.knnMargin(solo, solo).count() == 0)
  }

  test("session-6 operators survive degenerate inputs") {
    // autocorrelation: single-bucket series -> 0 pairs, NULL acf, no throw
    val onePt = Seq(("m", 0L, 1.0)).toDF("metric", "ts", "value")
    val ac = TimeSeries.autocorrelation(onePt).collect()
    assert(ac.length == 3 && ac.forall(r => r.getLong(3) == 0L && r.isNullAt(4)))
    // paretoReport: empty events -> empty (no boundary row can match);
    // single user -> every pct row is that user at share 1.0
    val noEv = Seq.empty[(Long, Long)].toDF("user_id", "event_id")
    assert(Funnel.paretoReport(noEv).count() == 0)
    val oneU = Seq((1L, 0L), (1L, 1L)).toDF("user_id", "event_id")
    val pr = Funnel.paretoReport(oneU).collect()
    assert(pr.length == 6 && pr.forall(r => r.getDouble(3) == 1.0))
    // interarrival: two events = one gap < minEvents-1 -> dropped, no throw
    val twoEv = Seq((1L, 0L, 10L), (1L, 5L, 11L)).toDF("user_id", "ts_us", "event_id")
    assert(Anomaly.interarrival(twoEv).count() == 0)
    // qualityCalibration over the nasty corpus: every doc lands in a bucket
    val qc = Curation.qualityCalibration(nasty).collect()
    assert(qc.map(_.getLong(1)).sum == 9L)
    // crossCorrelation/degreeHistogram reuse frames already swept above
    assert(TimeSeries.crossCorrelation(
      Seq(("m", 0L, 1.0)).toDF("metric", "ts", "value")).count() == 0)
    assert(Graph.degreeHistogram(Seq(("A", "A")).toDF("src", "dst")).count() == 0)
    // hourEntropy: one event -> entropy exactly 0, not a log-of-zero error
    val oneHit = Seq((1L, 0L, "t")).toDF("user_id", "ts_ms", "event_type")
    val he = Funnel.hourEntropy(oneHit).collect().head
    assert(he.getDouble(4) == 0.0 && he.getDouble(3) == 1.0)
    // pcVarianceExplained: constant corpus (zero variance) -> NULL ratio
    val const = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pcv = Similarity.pcVarianceExplained(const,
      Similarity.topPrincipalComponent(const)).collect().head
    assert(pcv.isNullAt(3))
    // covisitation: single-item users yield no pairs; NULL users drop
    val solo = Seq(("u1", "a"), (null.asInstanceOf[String], "b"))
      .toDF("user", "item")
    assert(Graph.covisitation(solo).count() == 0)
    // hardTriplets: single-label corpus has no negatives -> empty
    val oneLbl = Seq((0L, Seq(1.0f, 0.0f), 1), (1L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.hardTriplets(oneLbl, anchorMod = 40L).count() == 0)
    // phraseHits over the nasty corpus with an empty-phrase query: the
    // empty qtext splits to [""] and can only "match" empty words
    val q = Seq((1L, ""), (2L, "w w w")).toDF("query_id", "qtext")
    assert(graft.operators.Search.phraseHits(nasty, q).count() >= 0)
    // trendReport on an empty points frame -> empty
    assert(TimeSeries.trendReport(
      Seq.empty[(String, Long, Double)].toDF("metric", "ts", "value")).count() == 0)
  }

  test("round-11 operators survive degenerate inputs") {
    // scd2Apply with an EMPTY delta: the history passes through unchanged
    val ev = Seq((1L, "a", 10L, 1L), (1L, "b", 30L, 2L), (2L, "x", 5L, 3L))
      .toDF("user_id", "attr", "ms", "event_id")
    val h = Cdc.scd2(ev, "user_id", "attr", col("ms"), "event_id")
    val emptyDelta = Seq.empty[(Long, String, Long, Long)]
      .toDF("user_id", "attr", "ms", "event_id")
    val applied = Cdc.scd2Apply(h, emptyDelta, "user_id", "attr", col("ms"), "event_id")
    assert(applied.collect().map(_.toSeq).toSet == h.collect().map(_.toSeq).toSet)
    // scd2Apply onto an EMPTY history frame (schema only): acts as scd2
    val noHist = h.limit(0)
    val boot = Cdc.scd2Apply(noHist, ev, "user_id", "attr", col("ms"), "event_id")
    assert(boot.collect().map(_.toSeq).toSet == h.collect().map(_.toSeq).toSet)
    // assignStream: empty input frame -> empty output; empty centroids refuse
    val emb = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val cents = SimilarityIvf.centroids(emb, 1)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(SimilarityIvf.assignStream(noVecs, cents).count() == 0)
    intercept[IllegalArgumentException] {
      SimilarityIvf.assignStream(emb, cents.limit(0))
    }
    // heavyKeysStream: threshold above every count -> silent, not wrong
    val ks = Seq(1L, 1L, 2L).toDF("user_id")
    assert(Profiling.heavyKeysStream(ks, "user_id", threshold = 10L).count() == 0)
    // columnProfileApprox on an empty frame mirrors the exact profiler
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val p = Profiling.columnProfileApprox(empty, Seq("id", "s"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p.size == 2 && p("id").getAs[Long]("n_rows") == 0L &&
      p("id").getAs[Long]("n_distinct") == 0L)
    // imageGeometry refuses a non-image payload loudly (same contract as decode)
    val junk = Seq((1L, "not an image".getBytes("UTF-8"))).toDF("media_id", "payload")
    val e = intercept[Exception] { Multimodal.imageGeometry(junk).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("not a decodable image")))
  }

  test("neymanAllocation on an all-constant corpus allocates nothing (no zero division)") {
    import spark.implicits._
    val df = (Seq.fill(10)(("a", 5L)) ++ Seq.fill(10)(("b", 7L)))
      .toDF("source", "n_chars")
    val r = Curation.neymanAllocation(df, "source", "n_chars", budget = 10L)
      .collect().map(x => (x.getAs[Long]("w_u"), x.getAs[Long]("alloc_floor"), x.getAs[Long]("alloc")))
    assert(r.forall(_ == (0L, 0L, 0L)),
      "zero Neyman signal: allocate nothing rather than divide by zero or top-up arbitrarily")
  }

  test("tCloseness: a single-group corpus matches the global distribution exactly") {
    import spark.implicits._
    val df = Seq(("g", "a"), ("g", "a"), ("g", "b")).toDF("qi", "source")
    val r = Privacy.tCloseness(df, Seq("qi"), "source").collect()
    assert(r.length == 1 && r.head.getAs[Double]("tvd") == 0.0
      && r.head.getAs[Long]("above_t") == 0L)
  }
}
