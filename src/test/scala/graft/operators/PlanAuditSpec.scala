package graft.operators

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Window => LWindow}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Plan-shape guards for the round-2/3 scale paths: the distributed percentile
 * sort must be a PARTITIONED window (an unpartitioned WindowExec funnels the
 * whole dataset through one task — the anti-pattern the IVF centroid pick
 * had in round 1), the cross-series fold must really be two aggregation
 * levels with the shard key in the inner one, and the curation rank/budget
 * windows must never put a corpus-sized input through a window partitioned
 * solely by the (few-valued) language key.
 */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def windows(df: org.apache.spark.sql.DataFrame): Seq[WindowExec] = {
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    unwrapped.collect { case w: WindowExec => w }
  }

  private def pts = (0L until 64L)
    .map(i => (s"m${i % 4}", i * 1000L, (i % 7).toDouble, Map("host" -> s"h$i")))
    .toDF("metric", "ts", "value", "tags")

  test("summarize's rank window is partitioned by (metric, window)") {
    val ws = windows(Summarization.summarize(pts, 60000L))
    assert(ws.nonEmpty, "expected a WindowExec for the percentile rank")
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "unpartitioned window in summarize: whole dataset on one task")
  }

  private def langOnlyWindows(df: org.apache.spark.sql.DataFrame): Seq[LWindow] =
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.collect { case a: AttributeReference => a.name } == Seq("lang_guess") => w
    }

  private def curationDocs = ((0L until 96L)
    .map(i => (i, s"the a of and document $i los la el de le " * (1 + (i % 5)).toInt))
    // degenerate docs: empty text gives 0/0 punctuation ratio -> NULL quality;
    // both forms must order them last (NULLS LAST), not drop or promote them
    ++ Seq((96L, ""), (97L, "")))
    .toDF("doc_id", "text")

  /** Partial-mode WindowGroupLimitExec nodes — the map-side rank-limit
    * pushdown that prunes every map partition to its own top-k per key
    * BEFORE the exchange (the bound the old manual md5-shard pre-window
    * enforced, with one fewer Exchange+Sort+Window). */
  private def partialGroupLimits(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.window.{WindowGroupLimitExec, Partial}
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    unwrapped.collect { case w: WindowGroupLimitExec if w.mode == Partial => w }
  }

  test("curation topK: map partitions are rank-limit pruned before the lang window") {
    val df = Curation.topKByLanguage(curationDocs, 3)
    assert(partialGroupLimits(df).nonEmpty,
      "expected a Partial WindowGroupLimitExec below the lang window: " +
        "without the map-side top-k prune a hot language funnels the corpus " +
        "into one window partition")
    assert(langOnlyWindows(df).nonEmpty, "sanity: the rank window exists")
  }

  test("curation tokenBudget: running sum is per (lang, qbucket); lang-only window is the bucket-partial prefix") {
    val df = Curation.tokenBudget(curationDocs, 500L)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.exists(_.partitionSpec.size >= 2),
      "expected a (lang_guess, qbucket)-partitioned running-sum window")
    for (w <- langOnlyWindows(df))
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"lang_guess-only window not over the bucket-partial aggregate:\n$w")
    assert(langOnlyWindows(df).nonEmpty, "sanity: the bucket-prefix window exists")
  }

  test("qualitySummary equals the single-window nearest-rank reference; lang-only windows bounded") {
    val docs = curationDocs
    val sc = docs.select(
      col("doc_id"),
      TextAnalysis.qualityCol.as("quality"),
      TextAnalysis.langGuessCol(
        TextAnalysis.lexiconHits("de"), TextAnalysis.lexiconHits("en"),
        TextAnalysis.lexiconHits("es"), TextAnalysis.lexiconHits("fr")).as("lang_guess"))
      .where(col("quality").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang_guess").orderBy(col("quality"), col("doc_id"))
    val r = sc.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("lang_guess")))
    val ref = r.groupBy("lang_guess").agg(
      max("n").as("n_docs"), min("quality").as("min_q"), max("quality").as("max_q"),
      max(when(col("rk") === ceil(lit(0.5) * col("n")).cast("long"), col("quality"))).as("p50"),
      max(when(col("rk") === ceil(lit(0.9) * col("n")).cast("long"), col("quality"))).as("p90"),
      max(when(col("rk") === ceil(lit(0.99) * col("n")).cast("long"), col("quality"))).as("p99"))
    val got = Curation.qualitySummary(docs)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    // plan: corpus-ranking windows are composite-keyed; lang-only windows
    // run over the bucket-count aggregate (surfacing as the CACHED
    // InMemoryRelation of that aggregate), never raw docs
    for (w <- langOnlyWindows(got))
      assert(w.child.collectFirst {
        case a: Aggregate => a
        // the bn column is the cached bucket-count aggregate's signature — a
        // cached RAW corpus would not satisfy this
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation
          if m.output.exists(_.name == "bn") => m
      }.isDefined,
        s"lang_guess-only window not over the bucket-count aggregate:\n$w")
    assert(langOnlyWindows(got).nonEmpty, "sanity: the bucket prefix/total windows exist")
  }

  test("curation two-level results equal the single-window reference form") {
    val docs = curationDocs
    val sc = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words"),
      TextAnalysis.qualityCol.as("quality"),
      TextAnalysis.langGuessCol(
        TextAnalysis.lexiconHits("de"), TextAnalysis.lexiconHits("en"),
        TextAnalysis.lexiconHits("es"), TextAnalysis.lexiconHits("fr")).as("lang_guess"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang_guess").orderBy(col("quality").desc, col("doc_id"))
    val refTopk = sc.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3).select("lang_guess", "rank", "doc_id", "quality")
    assert(Curation.topKByLanguage(docs, 3).exceptAll(refTopk).isEmpty
      && refTopk.exceptAll(Curation.topKByLanguage(docs, 3)).isEmpty)
    val wb = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val refBudget = sc.withColumn("cum_words", sum(col("n_words")).over(wb))
      .where(col("cum_words") <= 500L)
      .select("lang_guess", "doc_id", "quality", "n_words", "cum_words")
    assert(Curation.tokenBudget(docs, 500L).exceptAll(refBudget).isEmpty
      && refBudget.exceptAll(Curation.tokenBudget(docs, 500L)).isEmpty)
  }

  test("row-wise text/curation ops plan ZERO shuffles (pure scan-level work)") {
    val docs = (0L until 32L)
      .map(i => (i, s"the quick doc $i with some words and https://example.org/x repeated words"))
      .toDF("doc_id", "text")
    def exchanges(df: org.apache.spark.sql.DataFrame) = {
      val plan = df.queryExecution.executedPlan
      val unwrapped = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      unwrapped.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    }
    val rowWise = Seq(
      "tokenCounts" -> TextAnalysis.tokenCounts(docs),
      "tokenCountsBpe" -> TextAnalysis.tokenCountsBpe(docs),
      "repetition" -> TextAnalysis.repetition(docs),
      "urls" -> TextAnalysis.urls(docs),
      "languageId" -> TextAnalysis.languageId(docs),
      "qualityScore" -> TextAnalysis.qualityScore(docs),
      "stratifiedSample" -> Curation.stratifiedSample(docs, Map("en" -> 4)),
      "hashSample" -> docs.where(Curation.hashSample(4)),
      "splitAssign" -> Curation.splitAssign(docs),
      "chunk" -> TextAnalysis.chunk(docs, 8, 6),
      "gopherFilter" -> TextAnalysis.gopherFilter(docs))
    for ((name, df) <- rowWise)
      assert(exchanges(df).isEmpty, s"$name must not shuffle: ${exchanges(df)}")
    val emb = (0L until 8L).map(i => (i, Array.fill(8)(i.toFloat + 1))).toDF("vec_id", "embedding")
    assert(exchanges(Similarity.quantizeInt8(emb)).isEmpty, "quantizeInt8 must not shuffle")
    // packing: exactly ONE exchange (onto shards) and an in-partition sort —
    // no second shuffle for the window or the final projection
    assert(exchanges(Curation.packSequences(docs, 16L, 4)).length == 1,
      "packSequences must shuffle exactly once (onto shards)")
    // vocab: the top-k cut must plan as TakeOrderedAndProject (per-partition
    // heaps), never a global Sort
    val vocabPlan = TextAnalysis.vocab(docs, 5).queryExecution.executedPlan.toString
    assert(vocabPlan.contains("TakeOrderedAndProject"), s"vocab top-k not heap-based:\n$vocabPlan")
  }

  test("centroids: one shuffle, partial aggregation below it") {
    val emb = (0L until 16L).map(i => (i, (i % 3).toInt, Array.fill(8)(i.toFloat)))
      .toDF("vec_id", "label", "embedding")
    val df = Similarity.centroids(emb, "label")
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(shuffles.length == 1, s"centroids must shuffle exactly once:\n$plan")
    // partial (map-side) aggregation must collapse the posexplode'd rows to
    // (groups x dim) partials BEFORE the exchange
    val aggs = plan.collect { case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h }
    assert(aggs.length >= 2, s"expected partial+final hash aggregation:\n$plan")
  }

  test("capPerGroup: map partitions are rank-limit pruned before the source window") {
    val d = (0L until 64L).map(i => (i, s"src${i % 4}", s"doc $i words here"))
      .toDF("doc_id", "source", "text")
    val df = Curation.capPerGroup(d, "source", 3)
    assert(partialGroupLimits(df).nonEmpty,
      "expected a Partial WindowGroupLimitExec below the source window: " +
        "without the map-side top-k prune a hot source funnels the corpus " +
        "into one window partition")
    val srcOnly = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.collect { case a: AttributeReference => a.name } == Seq("source") => w
    }
    assert(srcOnly.nonEmpty, "sanity: the rank window exists")
  }

  test("lmScore: vocab + total broadcast; the corpus side never broadcasts") {
    val d = (0L until 64L).map(i => (i, s"the quick doc $i with words")).toDF("doc_id", "text")
    val df = TextAnalysis.lmScore(d, vocabSize = 4)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bcasts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
    }
    // exactly the two bounded frames broadcast: the top-k vocab and the
    // 1-row total; each must sit under an aggregation (never a raw scan of
    // the corpus)
    assert(bcasts.length == 2, s"expected vocab + total broadcasts only:\n$plan")
    for (b <- bcasts)
      assert(b.collectFirst {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
        case s: org.apache.spark.sql.execution.SortExec => s
        case t if t.getClass.getSimpleName.contains("TakeOrdered") => t
      }.isDefined, s"broadcast side is not an aggregated/bounded frame:\n$b")
  }

  test("lmScoreBigram: only bounded frames broadcast; the pair stream never does") {
    val d = (0L until 64L).map(i => (i, s"the quick doc $i with words")).toDF("doc_id", "text")
    val df = TextAnalysis.lmScoreBigram(d, vocabSize = 4)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bcasts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
    }
    assert(bcasts.nonEmpty)
    // every broadcast side must bottom out in an aggregation or a top-k cut
    // (the vocab+unigram join and the 1-row total) — never the raw corpus
    // pair stream
    for (b <- bcasts)
      assert(b.collectFirst {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
        case s: org.apache.spark.sql.execution.SortExec => s
        case t if t.getClass.getSimpleName.contains("TakeOrdered") => t
      }.isDefined, s"broadcast side is not an aggregated/bounded frame:\n$b")
  }

  test("semanticDedup: only the driver-built centroids and aggregates broadcast") {
    val emb = (0L until 32L).map(i => (i, Array.fill(8)(((i * 7 + 3) % 11).toFloat + 1)))
      .toDF("vec_id", "embedding")
    val df = Dedup.semanticDedup(emb, minCosine = 0.9, nLists = 4)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bcasts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
    }
    // legitimate broadcast sides: the <=nLists-row driver-built centroid
    // frame (an RDD scan by construction) or an aggregated frame (the
    // near-dup-rate-sized count table under AQE) — never a raw corpus scan
    for (b <- bcasts)
      assert(b.collectFirst {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
        case h: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => h
        case r: org.apache.spark.sql.execution.RDDScanExec => r
      }.isDefined, s"broadcast side is a raw corpus frame:\n$b")
  }

  test("bloomScreen: fixed-size bitset broadcast; the probe side never shuffles") {
    val ex = (0L until 64L).map(i => (i, s"existing doc $i words")).toDF("doc_id", "text")
    val in = (100L until 110L).map(i => (i, s"incoming doc $i words")).toDF("doc_id", "text")
    val df = Dedup.bloomScreen(in, ex)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bcasts = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
    }
    assert(bcasts.length == 1, s"expected exactly the 1-row bitset broadcast:\n$plan")
    // the only ShuffleExchange permitted is the bitset build's partial->final
    // merge (SinglePartition over per-task buffers) — never a probe-side or
    // corpus-keyed exchange
    val shuffles = plan.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(shuffles.forall(_.outputPartitioning.numPartitions == 1),
      s"probe/corpus-side shuffle in bloomScreen:\n$plan")
  }

  test("kNN rank: k-bounded aggregate, no corpus-sized rank window") {
    val emb = (0L until 32L).map(i => (i, Array.fill(8)(((i * 7 + 3) % 11).toFloat + 1)))
      .toDF("vec_id", "embedding")
    val q = emb.where($"vec_id" < 3)
    // brute-force scorers: the per-query rank is the topk_score_id partial
    // aggregate — NO WindowExec anywhere (the |corpus|x|queries| exchange
    // into |queries| window partitions is gone)
    for ((name, df) <- Seq(
        "bruteForceKnn" -> Similarity.bruteForceKnn(emb, q, 5),
        "bruteForceKnnInt8" -> Similarity.bruteForceKnnInt8(emb, q, 5))) {
      assert(windows(df).isEmpty, s"$name still plans a rank window")
      assert(df.queryExecution.executedPlan.toString.contains("topk_score_id"),
        s"$name does not rank via the bounded top-k aggregate")
    }
    // IVF scorers: the ONLY window left is the probe selection, whose input
    // is the bounded |queries| x nLists centroid cross join — the in-list
    // scoring ranks through the same bounded aggregate
    for ((name, df) <- Seq(
        "ivfKnn" -> SimilarityIvf.ivfKnn(emb, q, k = 5, nLists = 4, nProbe = 2),
        "ivfKnnInt8" -> SimilarityIvf.ivfKnnInt8(emb, q, k = 5, nLists = 4, nProbe = 2))) {
      val ws = windows(df)
      assert(ws.length == 1, s"$name: expected only the probe-selection window, got ${ws.length}")
      assert(df.queryExecution.executedPlan.toString.contains("topk_score_id"),
        s"$name does not rank via the bounded top-k aggregate")
    }
  }

  test("PQ/binary/prefix ANN: the corpus side never broadcasts") {
    val emb = (0L until 48L).map(i => (i, Array.fill(16)(((i * 7 + 3) % 11).toFloat + 1)))
      .toDF("vec_id", "embedding")
    val q = emb.where($"vec_id" < 3)
    val frames = Seq(
      SimilarityPq.adcKnn(emb, q, k = 3, m = 4, ksub = 8, dim = 16),
      SimilarityPq.ivfAdcKnn(emb, q, k = 3, nLists = 4, nProbe = 2, m = 4, ksub = 8, dim = 16),
      Similarity.bqKnn(emb, q, k = 3, bits = 16, dim = 16),
      Similarity.prefixKnn(emb, q, k = 3, prefixDim = 8, overfetch = 2))
    for (df <- frames) {
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val bcasts = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
      }
      assert(bcasts.nonEmpty, s"expected a query/probe-side broadcast:\n$plan")
      // every broadcast side must be query-bounded (the vec_id cut), an
      // aggregate (k-bounded candidates), or a driver-built RDD frame (the
      // centroid table) — NEVER the raw corpus scan
      for (b <- bcasts)
        assert(b.collectFirst {
          case f: org.apache.spark.sql.execution.FilterExec => f
          case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
          case h: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => h
          case r: org.apache.spark.sql.execution.RDDScanExec => r
          // the query cut constant-folds into a LocalTableScan for in-memory
          // test frames — accept only the QUERY-sized one (3 rows), so a
          // broadcast of the 48-row corpus still fails the audit
          case l: org.apache.spark.sql.execution.LocalTableScanExec if l.rows.size <= 3 => l
          // the cached <=nLists-row centroid table (driver-built, bounded)
          case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
        }.isDefined, s"broadcast side looks like a raw corpus frame:\n$b")
    }
  }

  test("bm25: query-term filter joins below the corpus tf aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val docs = (0L until 50L).map(i => (i, s"alpha beta w$i gamma")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha zebra")).toDF("query_id", "qtext")
    val df = Search.bm25TopK(docs, q, k = 5)
    val tfAggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.groupingExpressions
        .collect { case r: AttributeReference => r.name }.toSet == Set("doc_id", "dl", "term") => a
    }
    assert(tfAggs.nonEmpty, "expected the (doc_id, dl, term) tf aggregate")
    // the broadcast term-set join must sit BELOW the tf aggregate, so the
    // shuffle feeding it carries only query-matched term occurrences — never
    // the whole exploded corpus vocabulary
    for (a <- tfAggs)
      assert(a.child.collectFirst { case j: Join => j }.isDefined,
        "tf aggregate shuffles the whole exploded corpus (term filter not pushed below it)")
  }

  test("keepBest: winner selected by aggregates; no window anywhere in the plan") {
    val d = (0L until 40L).map(i => (i, s"alpha beta gamma delta w$i x y z")).toDF("doc_id", "text")
    val df = Dedup.keepBest(d, threshold = 0.5)
    assert(windows(df).isEmpty, "keepBest must rank via aggregates, not a window")
    // two-stage selection: a per-cluster max(struct(has, q)) then a min(doc_id)
    // among the tied rows — both map-side-combinable aggregates
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("max(") && plan.contains("min("),
      "expected the max-quality + min-doc_id winner aggregates")
  }

  test("hard negatives: every window is query-partitioned (bounded fetch input)") {
    val d = (0L until 40L).map(i => (i, s"alpha beta w$i gamma")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha beta")).toDF("query_id", "qtext")
    val pos = Seq((1L, 1L)).toDF("query_id", "doc_id")
    val df = Search.bm25HardNegatives(d, q, pos, k = 5, fetchExtra = 2)
    val ws = windows(df)
    assert(ws.nonEmpty, "expected the bounded re-rank window")
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "unpartitioned window in hard negatives: whole fetch on one task")
  }

  test("crossSeries sum/avg/dev plan two aggregation levels, sharded inner") {
    for (agg <- Seq("sum", "avg", "dev")) {
      val df = TimeSeries.crossSeries(
        TimeSeries.downsample(pts, 60000L, "avg", exact = true), agg)
      // three aggregation levels: downsample, per-shard fold, cross-shard fold
      val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
      assert(aggs.length >= 3, s"$agg: expected two fold levels above downsample, got ${aggs.length}")
      // the md5 shard is computed below the fold (the optimizer pre-projects
      // it, so the grouping key is an attribute ref) — assert it's in the plan
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("pmod"),
        s"$agg: no md5 series shard in the plan")
      // and no window function sneaks into the fold path
      assert(windows(df).isEmpty, s"$agg: unexpected WindowExec in crossSeries plan")
    }
  }

  test("madOutliers: both rank sorts are key-partitioned windows") {
    val ev = (0L until 128L).map(i => (i, s"t${i % 3}", (i % 11).toDouble))
      .toDF("event_id", "event_type", "value")
    val ws = windows(Anomaly.madOutliers(ev))
    assert(ws.size >= 2, "expected the median and MAD rank windows")
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "unpartitioned window in madOutliers: whole corpus on one task")
  }

  test("lengthReport: the percentile sort is source-partitioned") {
    val d = (0L until 64L).map(i => (i, "a b c", s"s${i % 4}"))
      .toDF("doc_id", "text", "source")
    val ws = windows(Curation.lengthReport(d))
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      "unpartitioned percentile window in lengthReport")
  }

  test("mmrSelect step: the argmax window is query-partitioned (candidate-bounded)") {
    // the final mmrSelect plan hides the loop behind per-step checkpoints,
    // so the audit targets one step's plan directly
    val cand = (1 to 8).map(r => (1L, r.toLong, r.toLong, Seq(1f, r.toFloat), 1.0, 0.01))
      .toDF("query_id", "doc_id", "rank", "embedding", "nrm", "rel")
    val all = (1 to 1).map(r => (1L, 9L, 1L, Seq(1f, 2f), 1.0, 1L))
      .toDF("query_id", "doc_id", "rank", "embedding", "nrm", "mmr_rank")
    val ws = windows(Search.mmrStep(cand, all, 2, 0.7, 0.3))
    assert(ws.nonEmpty, "expected the per-step argmax window")
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "unpartitioned window in mmrSelect step")
  }

  test("botFlag: the gap window is entity-partitioned; one shuffle serves window + aggregate") {
    val ev = (0 until 64).map(i => (s"u${i % 4}", i.toLong, i * 1000L))
      .toDF("user_id", "event_id", "ts_us")
    val df = Anomaly.botFlag(ev, "user_id", "ts_us", "event_id")
    val ws = windows(df)
    assert(ws.nonEmpty, "expected the lag window")
    assert(ws.forall(_.partitionSpec.nonEmpty), "unpartitioned window in botFlag")
    // the aggregate reuses the window's hash partitioning on the entity key:
    // exactly one data shuffle in the whole plan
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = unwrapped.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size <= 1, s"botFlag should shuffle once, saw ${shuffles.size}")
  }

  test("normOutliers: the corpus-mean attach is a broadcast, never a shuffle join") {
    val emb = (1L to 40L).map(i => (i, Seq(i.toFloat / 40, 0.5f)))
      .toDF("vec_id", "embedding")
    val df = Similarity.normOutliers(emb)
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bcasts = unwrapped.collect {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
    }
    assert(bcasts.nonEmpty, "expected the 1-row mean as a BroadcastExchange")
    val smj = unwrapped.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.isEmpty, "normOutliers must not sort-merge the corpus against a scalar")
  }

  test("sourceOverlap: hash-keyed equi-join, no cartesian product") {
    val docs = (1L to 60L).map(i => (i, s"text ${i % 7}", s"s${i % 5}"))
      .toDF("doc_id", "text", "source")
    val df = Curation.sourceOverlap(docs)
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val cartesian = unwrapped.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(cartesian.isEmpty, "sourceOverlap self-join must stay key-equi (hash-partitionable)")
  }

  test("charDiversity and rpProject are row-wise: zero shuffles") {
    val docs = (0L until 32L).map(i => (i, s"doc number $i text")).toDF("doc_id", "text")
    val emb = (0L until 8L).map(i => (i, Array.fill(8)(i.toFloat + 1))).toDF("vec_id", "embedding")
    def exchanges(df: org.apache.spark.sql.DataFrame) = {
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    }
    assert(exchanges(TextAnalysis.charDiversity(docs)).isEmpty, "charDiversity must not shuffle")
    assert(exchanges(Similarity.rpProject(emb, outDim = 4, dim = 8)).isEmpty,
      "rpProject must not shuffle")
  }

  test("concurrency: every window is partitioned (hour-sharded sweep, day combine)") {
    val ev = (0L until 64L).map(i => (i, i * 60000L, s"u${i % 5}"))
      .toDF("event_id", "ts_ms", "user_id")
    val ws = windows(Sessionize.concurrency(ev, "user_id", "ts_ms", "event_id", 300000L))
    assert(ws.nonEmpty)
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "unpartitioned window in concurrency: the global-sort sweep is back")
  }

  test("winnowPairs and triangles: key-equi joins only, no cartesian product") {
    val docs = (1L to 24L).map(i => (i, s"document $i with enough characters to fingerprint"))
      .toDF("doc_id", "text")
    val edges = (1L to 24L).map(i => (s"a${i % 5}", s"b${i % 3}")).toDF("src", "dst")
    for ((name, df) <- Seq(
        "winnowPairs" -> Dedup.winnowPairs(docs),
        "triangles" -> Graph.triangles(edges))) {
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val cartesian = plan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(cartesian.isEmpty, s"$name must stay key-equi (hash-partitionable)")
    }
  }

  test("rpKnn: ranks via the bounded top-k aggregate, no rank window") {
    val emb = (0L until 48L).map(i => (i, Array.fill(8)(((i * 7 + 3) % 11).toFloat + 1)))
      .toDF("vec_id", "embedding")
    val df = Similarity.rpKnn(emb, emb.where($"vec_id" < 3), k = 3, outDim = 4, dim = 8)
    assert(windows(df).isEmpty, "rpKnn still plans a rank window")
    assert(df.queryExecution.executedPlan.toString.contains("topk_score_id"),
      "rpKnn does not rank via the bounded top-k aggregate")
  }

  test("pageRank: plan size stays constant per extra iteration (lineage cut)") {
    // without the per-iteration checkpoint the logical tree grows ~3x per
    // iteration (the round-8 regression this guards): compare node counts
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "A")).toDF("src", "dst")
    def nodes(iters: Int): Int =
      Graph.pageRank(edges, iters = iters).queryExecution.analyzed.collect { case p => p }.size
    val n2 = nodes(2)
    val n6 = nodes(6)
    assert(n6 <= n2 + 5, s"pageRank plan grows with iterations: iters=2 -> $n2 nodes, iters=6 -> $n6")
  }

  test("q6 predicates reach the parquet scan; q4 plans a LEFT SEMI; q18 aggregates below its join") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // a tiny on-disk star layout so the real gate queries run against a
    // genuine parquet scan (pushdown is a scan property, not a plan rewrite)
    val dir = java.nio.file.Files.createTempDirectory("tpch-plan").toString
    val ts0 = java.sql.Timestamp.valueOf("1997-02-01 00:00:00")
    Seq((1L, 1L, ts0, 10.0, 0.05, 100.0))
      .toDF("l_orderkey", "l_partkey", "l_shipdate", "l_quantity", "l_discount", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L, ts0, "1-URGENT", 100.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "seg")).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val q6 = graft.queries.TpchQueries.queries("q6_forecast_revenue")(spark, dir)
    val scan = q6.queryExecution.executedPlan.toString
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(scan.matches(s"(?s).*PushedFilters: \\[[^\\]]*$c.*"),
        s"q6 filter on $c not pushed to the parquet scan")

    val q4 = graft.queries.TpchQueries.queries("q4_late_orders")(spark, dir)
    val semis = q4.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftSemi => j
    }
    assert(semis.nonEmpty, "q4 late-order existence check is not a LEFT SEMI join")

    val q18 = graft.queries.TpchQueries.queries("q18_big_orders")(spark, dir)
    val joins = q18.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.forall(_.collect { case a: Aggregate => a }.nonEmpty),
      "q18 quantity aggregate does not sit below the joins (join input unpruned)")
  }

  // ---- round-9 operators --------------------------------------------------

  private def noCartesian(df: org.apache.spark.sql.DataFrame, what: String,
      allowedNlJoins: Int = 0): Unit = {
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val cart = unwrapped.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    val nl = unwrapped.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(cart.isEmpty, s"$what plans a CartesianProductExec")
    assert(nl.size <= allowedNlJoins,
      s"$what plans ${nl.size} nested-loop joins (allowed $allowedNlJoins 1-row scalar attaches)")
  }

  test("tfidf: term filter below the tf aggregate; only the 1-row n_docs scalar nested-loops") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val docs = (0L until 50L).map(i => (i, s"alpha beta w$i gamma")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha zebra")).toDF("query_id", "qtext")
    val df = Search.tfidfTopK(docs, q, k = 5)
    noCartesian(df, "tfidfTopK", allowedNlJoins = 1) // the broadcast n_docs scalar
    val tfAggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.groupingExpressions
        .collect { case r: AttributeReference => r.name }.toSet == Set("doc_id", "term") => a
    }
    assert(tfAggs.nonEmpty, "expected (doc_id, term) tf aggregates")
    // the CONTRIBUTION-side tf aggregate must keep the broadcast term filter
    // below it; the norm-side aggregate (full doc vectors by design) instead
    // keeps the matched-docs semi join below it — either way every tf
    // aggregate has a join under it, never the raw exploded corpus
    for (a <- tfAggs)
      assert(a.child.collectFirst { case j: Join => j }.isDefined,
        "a tf aggregate shuffles the whole exploded corpus")
  }

  test("pairCosineHistogram: block-keyed equi join, block-partitioned cap window") {
    val e = (1L to 64L).map(i => (i, Array.fill(4)(i.toFloat))).toDF("vec_id", "embedding")
    val df = Similarity.pairCosineHistogram(e, nBlocks = 8, capPerBlock = 4)
    noCartesian(df, "pairCosineHistogram")
    val ws = windows(df)
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      "pair-cap window must be block-partitioned")
  }

  test("adamicAdar and theilSen: key-equi joins only, partitioned windows only") {
    val g = (1L to 40L).map(i => (s"s${i % 7}", s"c${i % 4}")).toDF("src", "dst")
    noCartesian(Graph.adamicAdar(g), "adamicAdar")
    val p = pts
    val ts = TimeSeries.theilSen(p, bucketMs = 4000L)
    noCartesian(ts, "theilSen")
    assert(windows(ts).forall(_.partitionSpec.nonEmpty),
      "theilSen rank windows must be metric-partitioned")
  }

  test("rollingUniques and holtForecast plan aggregates only — no window, no cartesian") {
    val ev = (0L until 64L).map(i => (s"t${i % 3}", i * 3600000L, i % 9))
      .toDF("event_type", "ts_ms", "user_id")
    val ru = Funnel.rollingUniques(ev, "event_type", "ts_ms", "user_id")
    noCartesian(ru, "rollingUniques")
    assert(windows(ru).isEmpty, "rollingUniques must not plan a window")
    val holt = TimeSeries.holtForecast(pts, bucketMs = 4000L)
    noCartesian(holt, "holtForecast")
    assert(windows(holt).isEmpty, "holtForecast must not plan a window")
  }

  test("volumeBands: the trailing window is group-partitioned over the aggregated frame") {
    val ev = (0L until 128L).map(i => (s"t${i % 2}", (i / 2) * 3600000L, i))
      .toDF("event_type", "ts_ms", "user_id")
    val df = Anomaly.volumeBands(ev, "event_type", "ts_ms", window = 4)
    val ws = windows(df)
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      "volumeBands window must partition by group")
  }

  test("centroidDrift: one corpus aggregate feeds a groups-by-dim equi join") {
    val e = (1L to 32L).map(i => (i, Array.fill(4)(i.toFloat), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    noCartesian(Similarity.centroidDrift(e), "centroidDrift")
  }

  // ---- round-10 operators -------------------------------------------------

  test("holtWinters plans aggregates only — no window, no cartesian") {
    val hw = TimeSeries.holtWintersForecast(pts, bucketMs = 4000L, period = 3)
    noCartesian(hw, "holtWintersForecast")
    assert(windows(hw).isEmpty, "holtWintersForecast must not plan a window")
  }

  test("kmvSetOps: key-partitioned sketch windows; pair joins are key-equi (the key_a < key_b theta pairing is the one sketch-bounded nl join)") {
    val d = (1L to 200L).map(i => (s"k${i % 3}", i)).toDF("key", "elem")
    val df = Sketches.kmvSetOps(d, "key", "elem", k = 16)
    // the theta-pair build (ta.key < tb.key over the keys-sized theta table)
    // is a legitimate nested-loop on a KEYS-sized frame, never corpus-sized;
    // the plan tree re-derives it once each under n_a / n_b / common and the
    // final assembly — 4 instances of the same keys-bounded pairing
    noCartesian(df, "kmvSetOps", allowedNlJoins = 4)
    assert(windows(df).forall(_.partitionSpec.nonEmpty),
      "kmv sketch-prune windows must be key-partitioned")
  }

  test("dirichlet decomposed: no candidates-x-terms left join — every aggregate is matched-bounded") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val docs = (0L until 50L).map(i => (i, s"alpha beta w$i gamma")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha zebra")).toDF("query_id", "qtext")
    val df = Search.dirichletTopK(docs, q, k = 5)
    noCartesian(df, "dirichletTopK", allowedNlJoins = 2) // 1-row c_tokens scalar x2
    val outer = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType.sql == "LEFT OUTER" => j
    }
    assert(outer.isEmpty,
      "decomposed Dirichlet must not left-join candidates x terms back onto matched")
  }

  test("scd2: ONE exchange and one sort serve both key-partitioned windows") {
    val ev = (0L until 64L).map(i => (i % 8, s"a${i % 3}", i * 100L, i))
      .toDF("user_id", "attr", "ms", "event_id")
    val df = Cdc.scd2(ev, "user_id", "attr", col("ms"), "event_id")
    val ws = windows(df)
    assert(ws.size == 2 && ws.forall(_.partitionSpec.nonEmpty),
      "scd2 must run two key-partitioned windows")
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle in scd2:\n$plan")
    assert("\\bSort\\b".r.findAllIn(plan).size <= 2,
      "the second window must reuse the first window's sort order")
  }

  test("tCloseness: QI shuffles only; the corpus never broadcasts; no cartesian pair join") {
    val df2 = (0L until 64L).map(i => (s"l${i % 4}", i % 3, s"s${i % 5}"))
      .toDF("lang", "len_bucket", "source")
    val t = Privacy.tCloseness(df2, Seq("lang", "len_bucket"), "source")
    val plan = t.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "no cartesian in tCloseness")
    assert(!plan.contains("SortMergeJoin"),
      "both joins attach BOUNDED frames (marginals, 1-row total) and must broadcast")
    val ws = windows(t)
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      "the n_g window must be QI-partitioned")
  }

  test("intervalOverlap joins on the band equi key — never nested-loops the interval frames") {
    val left = (0L until 32L).map(i => (i, i * 100L, i * 100L + 150L))
      .toDF("lid", "l_start", "l_end")
    val right = (0L until 32L).map(i => (i, i * 90L, i * 90L + 120L))
      .toDF("rid", "r_start", "r_end")
    val plan = AsOf.intervalOverlap(left, right, bandMs = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval pairing must be the band equi join:\n$plan")
  }

  test("joinSkewProfile: its unpartitioned windows sit over the bounded count-of-counts frame") {
    val ev = (0L until 64L).map(i => (i, i % 7)).toDF("event_id", "user_id")
    val df = Profiling.joinSkewProfile(ev, "user_id")
    for (w <- df.queryExecution.optimizedPlan.collect { case w: LWindow => w })
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"window with non-aggregated (corpus-sized) input:\n$w")
    assert(df.count() == 1)
  }

  test("layout profile and prune audit plan aggregates only — no window, no sort-merge join") {
    val ev = (0L until 64L).map(i => (i % 16, (i / 4) % 16)).toDF("u", "d")
    val prof = Layout.zorderProfile(ev, col("u"), col("d"), bits = 4, bucketSize = 16L)
    assert(windows(prof).isEmpty)
    val audit = Layout.pruneAudit(ev, col("u"), col("d"), bits = 4,
      bucketSize = 16L, xLo = 0L, xHi = 3L)
    assert(windows(audit).isEmpty)
    assert(!audit.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
      "the two 1-row stat frames combine by broadcast")
  }

  test("completeness and blockingQuality plan aggregates only — no window, no corpus broadcast join") {
    val ev = (0L until 64L).map(i => (s"t${i % 3}", i * 3600000L)).toDF("event_type", "ts_ms")
    val comp = Profiling.completeness(ev, "event_type", "ts_ms")
    assert(windows(comp).isEmpty)
    val cust = (0L until 64L).map(i => (i, f"Customer#$i%09d")).toDF("c_custkey", "c_name")
    val pairs = Linkage.fuzzyPairs(cust, "c_custkey", "c_name", blockLen = 10)
    val bq = Linkage.blockingQualityFromPairs(cust, pairs, "c_custkey", "c_name", 10, 10000L)
    assert(windows(bq).isEmpty)
    assert(!bq.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    assert(bq.count() == 1)
  }

  test("assignStream is a pure projection — no exchange, no aggregate, no join") {
    val emb = (0L until 32L)
      .map(i => (i, Array.tabulate(8)(d => ((i + d) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = SimilarityIvf.centroids(emb, 4)
    val plan = SimilarityIvf.assignStream(emb, cents)
      .queryExecution.executedPlan.toString
    // the streaming increment must stay embarrassingly parallel: centroids
    // inline as literals, every row maps locally — any Exchange/Aggregate
    // here would also make the operator illegal in append-mode streaming
    Seq("Exchange", "Aggregate", "Join", "Window").foreach { op =>
      assert(!plan.contains(op), s"assignStream plan must not contain $op:\n$plan")
    }
  }

  test("scd2Apply: the closed history passes through with NO exchange above its scan") {
    val ev = (0 until 60).map { i =>
      ((i % 3).toLong, s"v${(i / 5) % 3}", (i / 3).toLong * 10L, i.toLong)
    }.toDF("user_id", "attr", "ms", "event_id")
    val history = Cdc.scd2(ev.where(col("ms") < 100L),
      "user_id", "attr", col("ms"), "event_id")
      .localCheckpoint() // materialize so the apply plan starts from a scan
    val applied = Cdc.scd2Apply(history, ev.where(col("ms") >= 100L),
      "user_id", "attr", col("ms"), "event_id")
    val plan = applied.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // find the union branch that filters is_current = 0 (the closed side)
    // and assert no Exchange sits between it and the union — a pass must
    // cost O(delta + open), never reshuffle immutable history
    val txt = unwrapped.toString
    val unionIdx = txt.indexOf("Union")
    assert(unionIdx >= 0, s"expected a Union in the apply plan:\n$txt")
    val branches = txt.substring(unionIdx).linesIterator.toSeq
    val closedLine = branches.indexWhere(_.contains("is_current#"))
    assert(branches.take(math.max(closedLine, 0)).nonEmpty || closedLine >= 0,
      s"expected the closed-side filter under the Union:\n$txt")
    // the closed branch is the LAST union child (unionByName order): from
    // its filter line to the end there must be no Exchange
    val lastFilter = branches.lastIndexWhere(l => l.contains("Filter") && l.contains("is_current"))
    assert(lastFilter >= 0, s"closed-side filter not found:\n$txt")
    assert(!branches.drop(lastFilter).exists(_.contains("Exchange")),
      s"closed history must not reshuffle:\n$txt")
  }

  test("bestSnippets: no window, no self-join — one aggregate + broadcast joins only") {
    val docs = (0L until 40L)
      .map(i => (i, s"alpha beta gamma delta word$i alpha beta " * (1 + (i % 3)).toInt))
      .toDF("doc_id", "text")
    val q = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("query_id", "qtext")
    val df = Search.bestSnippets(docs, q, window = 6)
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val txt = unwrapped.toString
    // the round-12 restructure: the quadratic anchor x member band self-join
    // and its per-(query,doc) argmax window are GONE — coverage is one
    // sorted-array aggregate + the native two-pointer expression
    assert(windows(df).isEmpty, s"no window expected in the snippet plan:\n$txt")
    assert(!txt.contains("SortMergeJoin") && !txt.contains("CartesianProduct"),
      s"only broadcast joins expected:\n$txt")
    // the native expression lives in the optimized plan (the executed-plan
    // string elides aggregate result expressions)
    val opt = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("bestwindowcover"),
      s"the native coverage expression must be in the plan:\n$opt")
  }

  test("splitLeakage: key-equi joins over the banded pair frame, no cartesian") {
    val docs = (0L until 48L)
      .map(i => (i, s"shared shingle text body common run ${i % 6} tail"))
      .toDF("doc_id", "text")
    val df = Curation.splitLeakage(
      Dedup.minhashLsh(docs), Curation.splitAssign(docs).select("doc_id", "split"))
    val txt = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(!txt.contains("CartesianProduct") && !txt.contains("BroadcastNestedLoop"),
      s"leakage audit must join on keys only:\n$txt")
  }
}
