package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** BM25 ranking semantics, tie-breaks, and the broadcast-only plan shape. */
class SearchSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")
  private def queries(rows: (Long, String)*): DataFrame = rows.toDF("query_id", "qtext")

  test("rrf fusion: both-systems docs outrank single-system docs; audit ranks ride along") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val sem = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(lex, sem, k = 10).orderBy("rank").collect()
    // doc 11: 1/62 + 1/61 beats doc 10 (1/61) and doc 12 (1/62)
    assert(out.map(_.getLong(2)).toSeq == Seq(11L, 10L, 12L))
    assert(out.head.getDouble(3) == 1.0 / 62 + 1.0 / 61)
    val d11 = out.head
    assert(d11.getLong(4) == 2L && d11.getLong(5) == 1L) // rank_a, rank_b audit
    val d10 = out(1)
    assert(d10.getLong(4) == 1L && d10.isNullAt(5))      // lex-only: no sem rank
  }

  test("hard negatives: positives excluded, dense top-k refilled from the fetch margin") {
    val d = docs(
      1L -> "zebra zebra zebra owl bat",  // best lexical match = the positive
      2L -> "zebra zebra cat dog fox",
      3L -> "zebra cat dog fox hen",
      4L -> "zebra owl dog fox hen",
      5L -> "cat dog fox hen owl")
    val q = queries(1L -> "zebra")
    val pos = Seq((1L, 1L)).toDF("query_id", "doc_id")
    val out = Search.bm25HardNegatives(d, q, pos, k = 3, fetchExtra = 2)
      .orderBy("rank").collect()
    assert(!out.exists(_.getLong(2) == 1L), "positive excluded")
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L), "dense re-ranked top-k")
    assert(out.length == 3, "refilled to k from the fetch margin")
    // and rank 1 is the best remaining match (highest zebra tf)
    assert(out.head.getLong(2) == 2L)
  }

  test("higher tf of a query term ranks higher at equal length") {
    val d = docs(
      1L -> "zebra cat dog fox bat owl",
      2L -> "zebra zebra dog fox bat owl",
      3L -> "zebra zebra zebra fox bat owl",
      4L -> "cat dog fox bat owl hen")
    val out = Search.bm25TopK(d, queries(10L -> "zebra"), k = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L), "tf monotone ranking")
    assert(out.forall(_.getLong(0) == 10L))
    // doc 4 has no query term: absent
    assert(!out.exists(_.getLong(2) == 4L))
  }

  test("rare terms outweigh common terms (idf) and ties break by doc_id") {
    val common = (1L to 8L).map(i => i -> s"shared words everywhere doc$i")
    val d = docs((common :+ (9L -> "rareword unique thing here")): _*)
    // query hits 'shared' (df 8) for docs 1-8 and 'rareword' (df 1) for doc 9
    val out = Search.bm25TopK(d, queries(1L -> "shared rareword"), k = 3)
      .orderBy("rank").collect()
    assert(out.head.getLong(2) == 9L, "rare-term doc outranks common-term docs")
    // docs 1..8 all tie on score -> doc_id ascending fills the remaining ranks
    assert(out.map(_.getLong(2)).toSeq == Seq(9L, 1L, 2L))
  }

  test("map-side rank-limit top-k equals the unlimited reference ranking") {
    val rnd = new scala.util.Random(41)
    val vocabAll = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val d = docs((0L until 200L).map(i =>
      i -> Seq.fill(6 + rnd.nextInt(10))(vocabAll(rnd.nextInt(vocabAll.length))).mkString(" ")): _*)
    val q = queries(1L -> "alpha delta", 2L -> "theta beta gamma")
    val got = Search.bm25TopK(d, q, k = 7)
    // reference: same scoring pipeline, single global window per query
    val full = Search.bm25TopK(d, q, k = Int.MaxValue)
      .withColumn("rr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .where(col("rr") <= 7)
    val g = got.select("query_id", "rank", "doc_id").orderBy("query_id", "rank").collect().toSeq
    val w = full.select("query_id", "rr", "doc_id").orderBy("query_id", "rr").collect().toSeq
    assert(g.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      w.map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))))
  }

  test("plan: corpus term table never exchanges on the term key; query side broadcasts") {
    val d = docs((0L until 64L).map(i => i -> s"w$i common words here"): _*)
    val df = Search.bm25TopK(d, queries(1L -> "common w3"), k = 5)
    // inspect the INITIAL physical plan: post-execution AQE wraps exchanges
    // in query stages that tree-collect does not descend into
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bcasts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
    }
    assert(bcasts.nonEmpty, s"expected broadcast joins in:\n$plan")
    // no shuffle exchange may partition on the raw term key: the only
    // hash exchanges allowed are the (doc_id, ...) aggregates and the
    // per-query rank windows
    val termShuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("term#") &&
           !e.child.toString.contains("HashAggregate") => e
    }
    assert(termShuffles.isEmpty,
      s"corpus shuffled on the raw term key:\n${termShuffles.mkString("\n")}")
    // the rank window's map-side prune must be in place: a Partial
    // WindowGroupLimitExec bounds every map partition to its own top-k per
    // query BEFORE the exchange (the skew guard that replaced the manual
    // md5-shard pre-window)
    val partialLimits = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        if w.mode == org.apache.spark.sql.execution.window.Partial => w
    }
    assert(partialLimits.nonEmpty,
      s"no Partial WindowGroupLimitExec below the rank window:\n$plan")
  }

  private def hitsDf(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("query_id", "doc_id", "rank")
  private def qrelsDf(rows: (Long, Long)*): DataFrame =
    rows.toDF("query_id", "doc_id")

  test("evalReport: perfect ranking scores ndcg 1.0 and rr 1.0") {
    val hits = hitsDf((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    val out = Search.evalReport(hits, qrelsDf(1L -> 10L, 1L -> 11L, 1L -> 12L), k = 10)
      .collect().head
    assert(out.getLong(1) == 3L && out.getLong(2) == 3L) // n_rel, n_rel_topk
    assert(out.getLong(3) == 1L)                          // first_rel_rank
    assert(out.getDouble(4) == 1.0 && out.getDouble(5) == 1.0)
  }

  test("evalReport: nothing relevant retrieved -> ndcg 0, NULL rank and rr") {
    val out = Search.evalReport(hitsDf((1L, 10L, 1L)), qrelsDf(1L -> 99L))
      .collect().head
    assert(out.getLong(2) == 0L && out.isNullAt(3) && out.isNullAt(4))
    assert(out.getDouble(5) == 0.0)
  }

  test("evalReport: hand-computed partial ndcg (rel at ranks 2 and 3 of 2 ideal)") {
    // dcg = w2 + w3; idcg = w1 + w2 (n_rel = 2) with the frozen weights
    val hits = hitsDf((7L, 1L, 1L), (7L, 2L, 2L), (7L, 3L, 3L))
    val out = Search.evalReport(hits, qrelsDf(7L -> 2L, 7L -> 3L)).collect().head
    val w = Search.DcgWeights.map(_.doubleValue)
    val expected = (w(1) + w(2)) / (w(0) + w(1))
    assert(out.getLong(3) == 2L && out.getDouble(4) == 0.5)
    assert(math.abs(out.getDouble(5) - expected) < 1e-12)
  }

  test("evalReport: ranks beyond k are ignored even if present in hits") {
    val hits = hitsDf((1L, 10L, 1L), (1L, 20L, 11L))
    val out = Search.evalReport(hits, qrelsDf(1L -> 20L), k = 10).collect().head
    assert(out.getLong(2) == 0L && out.isNullAt(3))
  }

  private def embDf(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("prfExpand recovers a doc that only matches the feedback-derived term") {
    val d = docs(
      1L -> "alpha beta gamma gamma filler",
      2L -> "alpha beta gamma other words",
      3L -> "gamma gamma gamma nothing else here",
      4L -> "totally unrelated content words")
    val q = queries(9L -> "alpha beta")
    val base = Search.bm25TopK(d, q, k = 4).collect().map(_.getLong(2)).toSet
    assert(!base.contains(3L)) // no query term in doc 3
    val prf = Search.prfExpand(d, q, r = 2, m = 1, k = 4).collect()
      .map(_.getLong(2)).toSet
    assert(prf.contains(3L)) // 'gamma' (tfsum 3 in feedback) expands the query
    assert(prf.contains(1L) && prf.contains(2L))
  }

  test("prfExpand: m caps expansion terms; original terms never re-added") {
    val d = docs(
      1L -> "alpha beta xx xx yy",
      2L -> "alpha beta xx yy zz",
      3L -> "yy yy yy",
      4L -> "zz zz zz")
    val q = queries(1L -> "alpha beta")
    // feedback = docs 1,2; candidate new terms by tfsum: xx=3, yy=2, zz=1
    // m=2 -> {xx, yy}: doc 3 (yy-only) retrieved, doc 4 (zz-only) not
    val got = Search.prfExpand(d, q, r = 2, m = 2, k = 4).collect()
      .map(_.getLong(2)).toSet
    assert(got.contains(3L) && !got.contains(4L))
  }

  test("mmrSelect: a near-duplicate of the top pick is deferred behind a diverse doc") {
    // doc 2 duplicates doc 1's embedding; doc 3 is orthogonal. Greedy MMR at
    // λ=0.7 picks 1, then 3 (sim 0 beats the duplicate's sim 1), then 2.
    val cands = hitsDf((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
    val emb = embDf(1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(0f, 1f))
    val out = Search.mmrSelect(cands, emb, k = 3)
      .orderBy("mmr_rank").collect().map(_.getLong(2)).toSeq
    assert(out == Seq(1L, 3L, 2L))
  }

  test("mmrSelect: λ=1 (pure relevance) reproduces the upstream rank order") {
    val cands = hitsDf((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
    val emb = embDf(1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(0.6f, 0.8f))
    val out = Search.mmrSelect(cands, emb, k = 3, lambdaBp = 10000)
      .orderBy("mmr_rank").collect().map(_.getLong(2)).toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("mmrSelect: candidates without embeddings are dropped; short lists truncate") {
    val cands = hitsDf((1L, 1L, 1L), (1L, 2L, 2L), (1L, 9L, 3L))
    val emb = embDf(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f)) // no vec for doc 9
    val out = Search.mmrSelect(cands, emb, k = 5)
      .orderBy("mmr_rank").collect().map(_.getLong(2)).toSeq
    assert(out == Seq(1L, 2L))
  }

  test("randomized: mmr output size = min(k, embedded candidates); order-free") {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 3) {
      val nCand = 3 + rnd.nextInt(10)
      val cands = (1 to nCand).map(r => (1L, 100L + rnd.nextInt(40), r.toLong))
        .groupBy(_._2).map(_._2.head).toSeq // distinct doc_ids, ranks kept dense enough
        .sortBy(_._3).zipWithIndex.map { case ((q, d, _), i) => (q, d, i + 1L) }
      val embRows = (100L until 140L)
        .map(i => (i, Seq.fill(4)(rnd.nextFloat() + 0.1f)))
      val k = 1 + rnd.nextInt(6)
      val out = Search.mmrSelect(cands.toDF("query_id", "doc_id", "rank"),
        embRows.toDF("vec_id", "embedding"), k = k).collect()
      assert(out.length == math.min(k, cands.length), s"trial $trial")
      assert(out.map(_.getLong(1)).sorted.toSeq == (1L to out.length).toSeq)
      // input row order must not matter
      val out2 = Search.mmrSelect(
        scala.util.Random.shuffle(cands).toDF("query_id", "doc_id", "rank").repartition(5),
        embRows.toDF("vec_id", "embedding"), k = k).collect()
      assert(out2.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq ==
        out.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq, s"trial $trial order")
    }
  }

  test("mmrSelect is bit-identical across parallelism") {
    val cands = (1 to 12).map(r => (1L, r.toLong * 7 % 13, r.toLong)) ++
      (1 to 12).map(r => (2L, r.toLong, r.toLong))
    val emb = (0L until 100L).map(i =>
      (i, Seq(((i * 13) % 7).toFloat + 0.5f, ((i * 29) % 11).toFloat - 3f, (i % 3).toFloat)))
    def run(c: DataFrame, e: DataFrame) = Search.mmrSelect(c, e, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq
    val c = cands.toDF("query_id", "doc_id", "rank")
    val e = embDf(emb: _*)
    assert(run(c, e) == run(c.repartition(9), e.repartition(7)))
  }

  test("phraseHits: in-order adjacency only; occurrences counted; case folds") {
    val docs = Seq(
      (1L, "The cat sat on the mat the cat sat"), // phrase at pos 0 and 6
      (2L, "cat the sat"),                        // all words, wrong order
      (3L, "the cat naps"),                       // partial phrase
      (4L, "the cat the cat")                     // for the repeated-word query
    ).toDF("doc_id", "text")
    val q = Seq((10L, "the cat sat"), (11L, "the cat the"))
      .toDF("query_id", "qtext")
    val out = Search.phraseHits(docs, q).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out(10L -> 1L) == 2L)
    assert(!out.contains(10L -> 2L) && !out.contains(10L -> 3L))
    // repeated word in the phrase: every OFFSET must match at one anchor —
    // "the cat the cat" holds "the cat the" once (anchor 0), not twice
    assert(out(11L -> 4L) == 1L)
    // doc 1 never has "the cat the" consecutively (the@{0,4,6}, cat@{1,7}:
    // no anchor completes all three offsets)
    assert(!out.contains(11L -> 1L))
  }

  test("Dirichlet QL: covering both terms beats repeating one; absent terms smooth, non-matches drop") {
    // cf(apple)=4, cf(banana)=1, |C|=10, mu=1000:
    //   doc1 = ln(401/1002) + ln(101/1002)   (both terms)
    //   doc2 = ln(402/1002) + ln(100/1002)   (apple twice, banana smoothed)
    //   doc3 = ln(401/1004) + ln(100/1004)   (longer doc, one hit)
    // 401*101 > 402*100 -> doc1 first; doc4 matches nothing -> absent
    val d = docs(1L -> "apple banana", 2L -> "apple apple",
      3L -> "apple cherry date egg", 4L -> "zebra yak")
    val out = Search.dirichletTopK(d, queries(1L -> "apple banana"), k = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_hit")).toSeq == Seq(2L, 1L, 1L))
    val want1 = math.log(401.0 / 1002) + math.log(101.0 / 1002)
    assert(math.abs(out.head.getAs[Double]("score") - want1) < 1e-8)
    // a query whose terms miss the corpus entirely produces no rows
    assert(Search.dirichletTopK(d, queries(2L -> "qqq www"), k = 5).count() == 0)
  }

  test("boolean retrieval: all MUST terms required, NOT term excludes, empty NOT is no-op") {
    val d = docs(
      1L -> "apple banana cherry",   // all must, no not -> hit
      2L -> "apple banana poison",   // all must, has not -> excluded
      3L -> "apple cherry date",     // missing banana -> no hit
      4L -> "banana apple apple")    // duplicates don't double-count -> hit
    val q = Seq((1L, "apple banana", "poison"), (2L, "cherry", ""))
      .toDF("query_id", "qtext", "nottext")
    val out = Search.booleanHits(d, q).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == Set(1L -> 1L, 1L -> 4L, 2L -> 1L, 2L -> 3L))
    assert(out(1L -> 1L) == 2L && out(2L -> 1L) == 1L)
  }

  test("best snippet: window maximizing distinct-term coverage wins, earliest on ties") {
    // terms a,b: doc 1 has a@0 b@9 a@10 b@12. The w=4 window from 0 sees
    // only 'a'; the window anchored at b@9 sees b@9,a@10,b@12 -> earliest
    // full-coverage start = 9 (anchors are matched positions of EITHER term)
    val d = docs(
      1L -> "a x x x x x x x x b a x b",
      2L -> "a x b x x x x x x x x x x", // best = start 0, covers both
      3L -> "a x x x x x x x x x x x x") // missing b -> not qualified
    val q = queries(1L -> "a b")
    val out = Search.bestSnippets(d, q, window = 4).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == (9L, 2L), "earliest full-coverage anchor wins")
    assert(out(2L) == (0L, 2L), "earliest window on coverage ties")
  }

  test("spellSuggest: frequency breaks distance ties; first-char block bounds candidates") {
    val d = docs(
      1L -> "the the the ten toe",
      2L -> "the the tho")
    val q = Seq((1L, "thz"), (2L, "xhz")).toDF("query_id", "qterm")
    val out = Search.spellSuggest(d, q, maxDist = 1, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getString(3), r.getLong(4), r.getLong(5)))
      .toMap
    // thz -> the (dist 1, n 5) then tho (dist 1, n 1); frequency breaks tie.
    // NOTE plain Levenshtein: a transposition ("teh") costs 2, not 1.
    assert(out((1L, 1L)) == (("the", 1L, 5L)))
    assert(out((1L, 2L)) == (("tho", 1L, 1L)))
    // ten/toe are dist 2 from thz so they never appear
    assert(!out.values.exists(v => v._1 == "ten" || v._1 == "toe"))
    // first-char block: xhz has no x-words -> no suggestions at all
    assert(!out.keys.exists(_._1 == 2L))
  }

  test("snippetText: renders the best window from the original case-preserving text") {
    val d = docs(
      1L -> "A x x x x x x x x B A x B",
      2L -> "a x b x x x x x x x x x x")
    val q = queries(1L -> "a b")
    val out = Search.snippetText(d, q, window = 4).collect()
      .map(r => r.getLong(1) -> r.getString(4)).toMap
    // doc 1 best start 9 (tokens B A x B), doc 2 start 0 (a x b x) —
    // original casing preserved, slice clipped at doc end
    assert(out(1L) == "B A x B")
    assert(out(2L) == "a x b x")
  }

  test("rankCorrelation: identical order = 1, reversed = -1, singleton = NULL") {
    def hits(rows: (Long, Long, Long)*) = rows.toDF("query_id", "doc_id", "rank")
    val a = hits((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (2L, 20L, 1L))
    val same = Search.rankCorrelation(a, a).collect().map(r => r.getLong(0) -> r).toMap
    assert(same(1L).getAs[Double]("spearman_rho") == 1.0)
    assert(same(2L).isNullAt(3), "one common candidate has no correlation")
    val rev = hits((1L, 10L, 3L), (1L, 11L, 2L), (1L, 12L, 1L))
    val r = Search.rankCorrelation(a, rev).collect().map(x => x.getLong(0) -> x).toMap
    // sum d^2 = 4 + 0 + 4 = 8; rho = 1 - 48/24 = -1
    assert(r(1L).getAs[Long]("sum_d2") == 8L)
    assert(r(1L).getAs[Double]("spearman_rho") == -1.0)
    // sparse intersection at extreme ORIGINAL positions: re-ranking within
    // the common set keeps rho in [-1,1] (raw positions would give -391)
    val xa = hits((3L, 30L, 1L), (3L, 31L, 15L))
    val xb = hits((3L, 30L, 15L), (3L, 31L, 1L))
    val x = Search.rankCorrelation(xa, xb).collect().head
    assert(x.getAs[Long]("n_common") == 2L && x.getAs[Long]("sum_d2") == 2L)
    assert(x.getAs[Double]("spearman_rho") == -1.0)
  }
}
