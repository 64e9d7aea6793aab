package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Sessionize, TextAnalysis}

/**
 * End-to-end training-data pipeline demo over the synthetic corpus: score ->
 * filter -> dedup -> curate -> budget, the flow a 100 TB pretraining mix
 * preparation actually runs, here at demo scale with every stage printed.
 * Usage: `runMain graft.PipelineQuickstart [sfDir]`.
 */
object PipelineQuickstart {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = graft.operators.Points.table(spark, sfDir, "documents")
    // -1. encoding hygiene BEFORE normalization: mojibake / replacement-char
    //     rows mean an upstream charset bug — count them first (the clean
    //     synthetic corpus keeps everything; real crawls drop here)
    println(s"mojibake screen keeps ${TextAnalysis.mojibakeStats(raw)
      .where(col("keep") === 1L).count()} of ${raw.count()} docs")
    // 0. normalize BEFORE anything hashes or tokenizes: NFC + control strip
    //    + space collapse, so visually-identical strings share one byte form
    //    (the synthetic corpus is pure ASCII — every row takes the zero-copy
    //    fast path; on real web data this is the stage that makes dedup keys
    //    meaningful)
    val norm = TextAnalysis.normalizeText(raw)
    val docs = raw.drop("text")
      .join(norm.select(col("doc_id"), col("text_norm").as("text")), "doc_id")
      .cache()
    println(s"corpus: ${docs.count()} docs (${norm.where(col("changed")).count()} changed by normalization)")

    // 1. score: quality + repetition as row-wise columns on the SAME scan —
    //    no corpus self-join for values that are functions of the row
    val scored = docs
      .withColumn("quality", TextAnalysis.qualityCol)
      .withColumn("dup_gram_ratio", TextAnalysis.dupGramRatioCol())

    // 2. filter: Gopher rule flags (auditable drop reasons), then the
    //    score-threshold cut on what survives
    val rules = TextAnalysis.gopherFilter(docs, minWords = 10L)
    println("gopher rule drops by reason:")
    rules.agg(sum(lit(1) - col("ok_words")).as("short"), sum(lit(1) - col("ok_word_len")).as("word_len"),
      sum(lit(1) - col("ok_punct")).as("punct"), sum(lit(1) - col("ok_stop")).as("no_stopwords")).show()
    // repetition screen (Gopher dup-line/top-n-gram rules; the single-line
    // synthetic docs only exercise the n-gram side here)
    println(s"gopher repetition screen keeps " +
      s"${TextAnalysis.gopherRepetition(docs).where(col("keep") === 1L).count()} docs")
    // word-blocklist + domain-denylist screens (C4-style); the synthetic
    // corpus has no links, so the domain screen is a no-op here by design
    println(s"blocklist screen would drop " +
      s"${TextAnalysis.blocklistFilter(docs, Seq("slow")).where(col("keep") === 0L).count()} docs; " +
      s"domain denylist ${TextAnalysis.domainFilter(docs, Seq("bad.example")).where(col("keep") === 0L).count()}")
    // the keep decision composes ROW-WISE into the scored scan (no
    // corpus-vs-corpus join against the audit frame above)
    val kept = scored
      .where(TextAnalysis.gopherKeepCol(minWords = 10L))
      .where(col("quality") > 0.2 && coalesce(col("dup_gram_ratio"), lit(0.0)) < 0.5)
    println(s"after gopher + quality/repetition filter: ${kept.count()}")

    // 3. dedup: a Bloom screen against the "previously trained" corpus first
    //    (fixed-size broadcast bitset, no join), then exact, then near-dup
    //    clustering keeps one representative per jaccard component
    val history = docs.where(col("doc_id") % 7 === 0) // stand-in historical corpus
    val seen = Dedup.bloomScreen(kept, history).select("doc_id")
    val fresh = kept.join(seen, Seq("doc_id"), "left_anti")
    println(s"after bloom screen vs history: ${fresh.count()}")
    val urlKept = fresh.join(
      Dedup.urlDedup(fresh).where(col("doc_id") === col("keep_doc_id")).select("doc_id"),
      "doc_id")
    println(s"after URL-canonical dedup: ${urlKept.count()}")
    val exactReps = Dedup.exact(urlKept).select(col("keep_doc_id").as("doc_id"))
    val exactKept0 = urlKept.join(exactReps, "doc_id")
    // fuzzy-exact pass between byte-exact and near-dup: case/punct/spacing
    // variants collapse on the normalized hash before any pair generation
    val fuzzyReps = Dedup.fuzzyExact(exactKept0).select(col("keep_doc_id").as("doc_id"))
    val exactKept = exactKept0.join(fuzzyReps, "doc_id")
    println(s"after fuzzy-exact normalization dedup: ${exactKept.count()}")
    // benchmark decontamination: anything overlapping the "eval" probes by
    // >= 3 distinct 8-grams is excluded from training
    val decontam = Curation.decontamFilter(exactKept, history)
    println(s"decontamination keeps ${decontam.where(col("keep") === 1L).count()} " +
      s"(dropped ${decontam.where(col("keep") === 0L).count()} probe-overlapping docs)")
    val cleanKept = exactKept.join(
      decontam.where(col("keep") === 1L).select("doc_id"), "doc_id")
    // the same decisions as ONE auditable table: per-doc keep + failed-screen
    // bitmask (encoding=1, gopher=2, code=4, duplicate=8, contaminated=16)
    println("keep-decision table (drop reasons by mask):")
    Curation.keepReasons(docs, history)
      .groupBy("fail_mask").count().orderBy("fail_mask").show()
    // tune BEFORE committing: the shingle-df profile shows where the pair
    // mass lives (the maxDocFreq cap evidence), the threshold sweep shows
    // the dup-count knee — both ride frames the production run reuses —
    // and the analytic S-curve says what the LSH banding CAN catch
    println("shingle-df profile (pair mass per log2 band):")
    Dedup.dfProfile(cleanKept).orderBy("bucket").show()
    println("jaccard threshold sweep (cumulative candidate pairs):")
    Dedup.thresholdSweep(cleanKept).orderBy("threshold").show()
    println("LSH S-curve for the 4x2 banding (detection probability):")
    Dedup.lshCurve(spark).orderBy("threshold").show()
    val pairs = Dedup.ngramJaccard(cleanKept, threshold = 0.7).select("a", "b")
    val comps = Dedup.clusters(pairs)
    val dropped = comps.where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    // cached: steps 4-5 fan out several actions over this frame
    val deduped = cleanKept.join(dropped, Seq("doc_id"), "left_anti").cache()
    val nDeduped = deduped.count()
    println(s"after exact + near-dup dedup: $nDeduped")
    // dedup post-mortem: where did the mass go, and what did each technique
    // buy per source — the report that justifies the pipeline's dedup spend
    println("near-dup cluster sizes (corpus mass per component size):")
    Dedup.clusterSizes(docs).orderBy("cluster_size").show()
    println("dedup savings per source (docs/tokens surviving exact vs near):")
    Curation.dedupSavings(docs).orderBy("source").show(3)

    // 4. curate: per-language quality top-k, then a token budget per language
    val top = Curation.topKByLanguage(deduped, k = 100)
    println(s"per-language top-100 sample:")
    top.groupBy("lang_guess").count().orderBy("lang_guess").show()
    val budget = Curation.tokenBudget(deduped, budget = 5000L)
    println(s"5k-token-per-language budget keeps ${budget.count()} docs:")
    budget.groupBy("lang_guess")
      .agg(count(lit(1)).as("docs"), max("cum_words").as("words_used"))
      .orderBy("lang_guess").show()

    // 4b. distribution-level selection: DSIR importance vs the historical
    //     corpus as the target distribution, and the tokenizer's first merges
    println("DSIR importance weights vs the history target (top 5):")
    Curation.importanceWeights(deduped, history, vocabSize = 64)
      .orderBy(col("importance").desc_nulls_last, col("doc_id")).show(5)
    println("first BPE merge rules learned from the kept corpus:")
    TextAnalysis.bpeTrain(deduped, iters = 3).orderBy("iter").show(truncate = false)
    println("token counts under that trained tokenizer (first 3 docs):")
    TextAnalysis.bpeEncodeCounts(deduped, iters = 3).orderBy("doc_id").show(3)

    // 5. export prep: train/val/test split, mix accounting, RAG chunks
    val split = Curation.splitAssign(deduped)
    split.groupBy("split").count().orderBy("split").show()
    println("training-mix report (per lang x source):")
    Curation.mixReport(deduped).orderBy(col("words_share").desc).show(5)
    println("cross-source duplication overlap (shared distinct hashes per pair):")
    Curation.sourceOverlap(docs).orderBy(col("n_shared_hashes").desc).show(3)
    println(s"retrieval chunks: ${TextAnalysis.chunk(deduped).count()} from $nDeduped docs")
    // retrieval audit: BM25 probes over the kept corpus — "which documents
    // answer this?" without needing an embedding column
    val probes = deduped.where(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(org.apache.spark.sql.functions.split(col("text"), " "), 1, 4), " ")
          .as("qtext"))
    println("BM25 top-3 per probe (first 2 probes):")
    graft.operators.Search.bm25TopK(deduped, probes, k = 3)
      .where(col("query_id").isin(0L, 100L)).orderBy("query_id", "rank").show(6)
    println("hard negatives for those probes (self excluded, dense top-3):")
    graft.operators.Search.bm25HardNegatives(deduped, probes,
        probes.select(col("query_id"), col("query_id").as("doc_id")), k = 3)
      .where(col("query_id").isin(0L, 100L)).orderBy("query_id", "rank").show(6)

    // 5b. domain authority as a curation prior: PageRank over the link
    //     graph (planted here; real pipelines extract it with
    //     TextAnalysis.urls), joined back onto each doc's quality
    val siteOf = concat(lit("site"), (col("doc_id") % 7).cast("string"))
    val cdnOf = concat(lit("cdn"), (col("doc_id") % 3).cast("string"))
    val edges = deduped.select(siteOf.as("src"), cdnOf.as("dst"))
      .union(deduped.select(cdnOf.as("src"),
        concat(lit("site"), (col("doc_id") % 5).cast("string")).as("dst")))
    val ranks = graft.operators.Graph.pageRank(edges, iters = 3)
    println("domain authority (top 3 by fixed-point PageRank):")
    ranks.orderBy(col("rank_fp").desc).show(3)
    println("hub vs authority separation (HITS, top 2 each):")
    val hits = graft.operators.Graph.hits(edges, iters = 3).cache()
    hits.orderBy(col("auth_fp").desc).show(2)
    hits.orderBy(col("hub_fp").desc).show(2)
    println(s"link-graph components: ${graft.operators.Graph.components(edges)
      .select("component_id").distinct().count()}")
    println("retrieval eval vs prefix-share ground truth (MRR / nDCG@10):")
    val qrels = deduped
      .select(col("doc_id"),
        array_join(slice(org.apache.spark.sql.functions.split(col("text"), " "), 1, 4), " ").as("p"))
      .join(broadcast(probes), col("p") === col("qtext"))
      .select(col("query_id"), col("doc_id"))
    graft.operators.Search.evalReport(
        graft.operators.Search.bm25TopK(deduped, probes, k = 10), qrels)
      .orderBy("query_id").show(3)

    // 6. the same engine serves the behavioral side: sessionized events
    val ev = graft.operators.Points.table(spark, sfDir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
    val sessions = Sessionize.sessionStats(ev, "user_id", "ts_ms", "event_id",
      gapMs = 21600000L, valueCol = "value")
    println(s"6h-gap sessions: ${sessions.count()} across ${ev.select("user_id").distinct().count()} users")
    val fun = graft.operators.Funnel.funnel(ev, "user_id", "ts_ms", "event_type",
      Seq("signup", "view", "purchase"), horizonMs = 86400000L)
    println("signup -> view -> purchase funnel (24h gaps):")
    fun.groupBy("steps_reached").count().orderBy("steps_reached").show()
    println("daily heavy hitters (top contributor per event type, first day):")
    graft.operators.Funnel.heavyHitters(ev, "event_type", "ts_ms", "user_id", k = 1)
      .orderBy("day", "event_type").show(5)
    val bots = graft.operators.Anomaly.botFlag(
      ev.withColumn("ts_us", col("ts_ms") * 1000L), "user_id", "ts_us", "event_id")
    println(s"bot screen flags ${bots.where(col("is_bot") === 1L).count()} " +
      s"of ${bots.count()} users (burst/cadence tells)")
    println("top path transitions (Markov view of the stream):")
    graft.operators.Funnel.pathTransitions(ev, "user_id", "ts_ms", "event_id", "event_type")
      .orderBy(col("n").desc, col("from_type"), col("to_type")).show(3)
    val lowDiv = graft.operators.Funnel.userPathGini(
      ev, "user_id", "ts_ms", "event_id", "event_type")
    println(s"path-diversity tell: ${lowDiv.where(col("is_low_diversity") === 1L).count()} " +
      s"low-diversity users (gini)")
    println("volume concentration (log2 activity bands):")
    graft.operators.Funnel.activityHistogram(ev).orderBy("bucket").show()
    println("RFM base (top 3 by monetary):")
    graft.operators.Funnel.rfm(ev)
      .orderBy(col("monetary").desc, col("user_id")).show(3)
    println("A/B readout on the parity split (one-row report):")
    graft.operators.Funnel.abReport(
      ev.withColumn("variant",
        when(col("user_id") % 2 === 0, "control").otherwise("treat")), "variant").show()
    println("CUSUM drift days (slow-ramp detector; drift rows only):")
    graft.operators.Anomaly.cusumDrift(ev, "event_type", "ts_ms")
      .where(col("is_drift") === 1L).orderBy("event_type", "day").show(3)
    println("DAU/MAU stickiness (last 3 days) + weekly churn:")
    graft.operators.Funnel.stickiness(ev).orderBy(col("day").desc).show(3)
    graft.operators.Funnel.churn(ev).orderBy("week").show()
    println("traffic seasonality (top 3 dow x hour cells):")
    graft.operators.Funnel.seasonality(ev)
      .orderBy(col("n_events").desc, col("dow"), col("hour")).show(3)

    // 7. embedding health before any ANN index ships: column-level dim
    //    stats, row-level norm outliers, and IVF label purity
    val emb = graft.operators.Points.table(spark, sfDir, "embeddings")
    println("embedding dim stats (first 3 dims):")
    graft.operators.Similarity.dimStats(emb).orderBy("dim").show(3)
    println(s"norm outliers: ${graft.operators.Similarity.normOutliers(emb)
      .where(col("is_outlier") === 1L).count()} of ${emb.count()} vectors")
    println("IVF label purity (worst 3 lists):")
    graft.operators.SimilarityIvf.cellPurity(emb)
      .orderBy(col("purity"), col("list_id")).show(3)
    println("drift axis: top principal component (3 largest |loadings|):")
    val pcFrame = graft.operators.Similarity.topPrincipalComponent(emb).cache()
    pcFrame.orderBy(abs(col("pc")).desc, col("dim")).show(3)
    println("projection spread along the drift axis (the monitored histogram):")
    graft.operators.Similarity.pcProjectionFrom(emb, pcFrame)
      .agg(min("proj").as("min"), expr("percentile_approx(proj, 0.5)").as("p50"),
        max("proj").as("max")).show()
    println("IVF list balance (hottest 3 lists — probe-latency skew):")
    graft.operators.SimilarityIvf.listBalance(emb)
      .orderBy(col("load_factor").desc, col("list_id")).show(3)
    println("kNN confidence margins (most ambiguous 3 probes):")
    graft.operators.Similarity.knnMargin(emb, emb.where(col("vec_id") < 5))
      .orderBy(col("margin"), col("query_id")).show(3)
    println("cosine threshold sweep over LSH candidates (the minCosine evidence):")
    graft.operators.Similarity.cosineSweep(emb).orderBy("threshold").show(14)

    // 8. the release surface: what leaves the pipeline passes the contract
    //    gate, the privacy audits, and — between corpus versions — the
    //    CDC loop (diff -> incremental near-dup screen -> delta-aggregates)
    println("data contract (NULL-safe constraint report):")
    graft.operators.Profiling.contractCheck(raw, "n_chars = length(text)",
        col("n_chars") === length(col("text")))
      .unionByName(graft.operators.Profiling.contractCheck(ev,
        "user_id positive", col("user_id") > 0)).show(truncate = false)
    val qi = raw.select(col("lang"), col("source"), expr("n_chars div 250").as("len_bucket"))
    println("k-anonymity (k=5) under (lang, source, len-bucket):")
    graft.operators.Privacy.kAnonymityReport(qi, Seq("lang", "source", "len_bucket"), 5).show()
    println("generalization sweep — pick the finest width that clears k:")
    graft.operators.Privacy.kAnonymitySweep(
      raw.select(col("lang"), col("source"), col("n_chars")),
      Seq("lang", "source"), "n_chars", Seq(250L, 1000L, 4000L), 5)
      .select("bucket_width", "groups_below_k", "rows_below_k", "pct_rows_at_risk")
      .orderBy("bucket_width").show()
    println("DP release counts per source (seeded Laplace, eps=0.5):")
    val dpAudit = graft.operators.Privacy.dpCounts(raw, "source",
      epsilon = 0.5, salt = "quickstart-release-1")
    dpAudit.orderBy("source").show(3)
    println("...and the artifact that actually leaves the pipeline (releaseView):")
    graft.operators.Privacy.releaseView(dpAudit, Seq("source")).orderBy("source").show(3)
    // corpus v1 -> v2: the synthetic snapshot pair from the audit gates
    val v1 = raw.where(col("doc_id") % 7 =!= 0).select("doc_id", "source", "n_chars")
    val v2 = raw.where(col("doc_id") % 5 =!= 0).select(col("doc_id"), col("source"),
      when(col("doc_id") % 3 === 0, col("n_chars") + 1L).otherwise(col("n_chars")).as("n_chars"))
    println("snapshot diff v1 -> v2 (per-source churn):")
    graft.operators.Cdc.diffReport(
      graft.operators.Cdc.snapshotDiff(v1, v2, Seq("doc_id"), Seq("n_chars"), Seq("source")),
      Seq("source")).groupBy("status").agg(sum("n").as("n")).orderBy("status").show()
    println("incremental near-dup screen: only the ADDED docs pair against the index:")
    val newDocs = raw.where(col("doc_id") % 7 === 0 && col("doc_id") % 5 =!= 0)
      .select("doc_id", "text")
    println(s"  ${graft.operators.Dedup.minhashLshIncremental(
      raw.where(col("doc_id") % 7 =!= 0).select("doc_id", "text"), newDocs).count()} " +
      "candidate pairs touch a new doc")
    println("incremental aggregate maintenance (delta-sized upgrade, exact match flags):")
    graft.operators.Cdc.aggDeltaAudit(
      graft.operators.Cdc.snapshotDelta(v1, v2, Seq("doc_id"), "n_chars", Seq("source")),
      Seq("source"))
      .agg(sum("n_added").as("added"), sum("n_removed").as("removed"),
        sum("n_changed").as("changed"), min("n_matches").as("all_n_match"),
        min("sum_matches").as("all_sum_match")).show()

    spark.stop()
  }
}
