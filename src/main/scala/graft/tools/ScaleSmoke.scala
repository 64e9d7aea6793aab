package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev-only scale smoke: replicate the sf0.1 corpus ~20x (100k docs, each with
 * 19 near-identical siblings — a deliberately near-dup-RICH corpus) and run
 * every fuzzy-dedup / similarity operator end-to-end. Verifies the plans'
 * scaling behavior one step up from the bench SF: runtimes should grow
 * near-linearly for the banded/blocked operators, and nothing may OOM,
 * broadcast the corpus, or explode quadratically. Not part of the driver
 * contract.
 */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_REPS", "20").toInt
    // embeddings replicate separately (vector ops cost per-dimension, not
    // per-token): 200 reps x 5k = 1M vectors for the 100x tier
    val embReps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_EMB_REPS", "10").toInt
    // bloom filter size: 6 (2^24 bits) fits the 20x corpus; the 100x tier
    // runs 7 (2^28 bits, the single-filter ceiling) + the sharded screen
    val bloomHex = sys.env.getOrElse("SPARK_GRAFT_SMOKE_BLOOM_HEX", "6").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev filter: SPARK_GRAFT_SMOKE_ONLY=sub1,sub2 runs only blocks whose
    // name contains a substring (skipped blocks yield null/0 — include a
    // cap-derivation block's name whenever a dependent block matches)
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY").map(_.split(",").toSeq)
    def t[A](name: String)(f: => A): A = {
      if (only.exists(subs => !subs.exists(name.contains))) {
        println(s"SCALE $name SKIPPED (filter)")
        null.asInstanceOf[A]
      } else {
        val t0 = System.nanoTime(); val r = f
        println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
    }
    val base = graft.operators.Points.table(spark, sfDir, "documents")
    val n = base.count()
    // replica r of a doc: same text plus a distinguishing tail token -> a
    // genuine near-dup (high jaccard, tiny hamming), unique doc_id
    val docs = base
      .crossJoin(spark.range(reps).select(col("id").as("r")))
      .select((col("doc_id") * reps + col("r")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("r")).as("text"))
      .repartition(32)
      .cache()
    println(s"SCALE corpus: ${docs.count()} docs (${n} x $reps)")
    // the replica corpus is a worst case for UNCAPPED candidate generation
    // (every LSH bucket is a reps-clique: in-bucket pairs grow with reps^2 BY
    // DESIGN — that quadratic is exactly what maxBucket exists to cap), so
    // the uncapped op only runs at the 20x tier; the capped 100TB config is
    // the scaling claim and runs at every tier
    if (reps <= 20)
      t("minhashLsh (uncapped; 20x tier only)") { graft.operators.Dedup.minhashLsh(docs).count() }
    else println("SCALE minhashLsh uncapped SKIPPED at reps>20 (reps^2-clique corpus; capped is the scale config)")
    // the cap contract: maxBucket must sit BELOW the expected duplication
    // factor, or a clique of near-identical docs passes under it and pair
    // generation goes reps^2 (measured 100 s at reps=100 under a 200 cap).
    // 200 covers the 20x tier (20-cliques); above that, cap at reps/2.
    val mhCap = if (reps <= 20) 200L else (reps / 2).toLong
    t(s"minhashLsh capped (the 100TB config, maxBucket=$mhCap)") {
      graft.operators.Dedup.minhashLsh(docs, maxBucket = mhCap).count()
    }
    // auto-cap: the replica corpus makes every bucket a reps-clique, so the
    // derived cap must land at factor*reps — below the duplication factor by
    // construction, within ~2x of the hand-tuned row above
    val autoCap = t("minhashAutoCap (quantile pre-aggregate)") {
      graft.operators.Dedup.minhashAutoCap(docs)
    }
    println(s"SCALE minhash auto-derived cap = $autoCap (hand-tuned $mhCap)")
    t(s"minhashLsh auto-capped (maxBucket=$autoCap)") {
      graft.operators.Dedup.minhashLsh(docs, maxBucket = autoCap).count()
    }
    // candidate precision audit under the same cap: exact jaccard is
    // candidate-bounded (shingles semi-joined to candidate docs first), so
    // this must track the capped minhash cost, not ngramJaccard's
    t(s"minhashAudit capped (maxBucket=$mhCap, candidate-bounded exact side)") {
      graft.operators.Dedup.minhashAudit(docs, maxBucket = mhCap).count()
    }
    val ngCap = t("ngramAutoDocFreqCap (quantile pre-aggregate)") {
      graft.operators.Dedup.ngramAutoDocFreqCap(docs)
    }
    println(s"SCALE ngram auto-derived docFreq cap = $ngCap (hand-tuned 50)")
    t(s"ngramJaccard auto-capped (maxDocFreq=$ngCap)") {
      graft.operators.Dedup.ngramJaccard(docs, threshold = 0.7, maxDocFreq = ngCap).count()
    }
    t(s"simhashPairs (capped, the 100TB config, maxBucket=$mhCap)") {
      graft.operators.Dedup.simhashPairs(docs, maxHamming = 6, maxBucket = mhCap).count()
    }
    t("ngramJaccard capped (the 100TB config)") {
      graft.operators.Dedup.ngramJaccard(docs, threshold = 0.7, maxDocFreq = 50L).count()
    }
    t("exact dedup") { graft.operators.Dedup.exact(docs).count() }
    t("keepBest (capped pairs, quality representative per component)") {
      graft.operators.Dedup.keepBest(docs, threshold = 0.7, maxDocFreq = 50L)
        .where(col("doc_id") === col("keep_doc_id")).count()
    }
    t("passageDedup (10-word passages, df >= 2 drop)") {
      // the replica tails make most aligned passages corpus-frequent — the
      // frequency join and reassembly run at full fan-out
      graft.operators.Dedup.passageDedup(docs).count()
    }
    t("packSequences (2048-token packs, 64 shards)") {
      graft.operators.Curation.packSequences(docs, ctxLen = 2048L, nShards = 64).count()
    }
    t("temperatureSample on derived parity group") {
      graft.operators.Curation.temperatureSample(
        docs.withColumn("lang", (col("doc_id") % 3).cast("string")), "lang").count()
    }
    t("vocab top-1000") { graft.operators.TextAnalysis.vocab(docs, 1000).count() }
    t("lmScore (top-4096 vocab)") { graft.operators.TextAnalysis.lmScore(docs, 4096).count() }
    t("lmScoreBigram (top-4096 bigram vocab)") {
      graft.operators.TextAnalysis.lmScoreBigram(docs, 4096).count()
    }
    t("bpeEncode (3 trained merges applied via vocab join)") {
      graft.operators.TextAnalysis.bpeEncodeCounts(docs, iters = 3)
        .agg(sum("n_tokens_bpe_trained")).collect()
    }
    t("bpeTrain (4 merge rounds at distinct-word scale)") {
      graft.operators.TextAnalysis.bpeTrain(docs, iters = 4).count()
    }
    t("importanceWeights (5% target vs 95% raw, top-4096 features)") {
      graft.operators.Curation.importanceWeights(
        docs.where(col("doc_id") % 20 =!= 0), docs.where(col("doc_id") % 20 === 0),
        vocabSize = 4096).count()
    }
    t("urlDedup (canonical first-URL keys)") {
      graft.operators.Dedup.urlDedup(docs).count()
    }
    t("chunk (64-word windows, stride 48)") {
      graft.operators.TextAnalysis.chunk(docs).count()
    }
    t("normalizeText (NFC + cleanup; forced evaluation)") {
      // aggregate over the normalized length so the row-wise expressions
      // actually evaluate (a bare count would prune the Project)
      graft.operators.TextAnalysis.normalizeText(docs).agg(sum("n_cp_norm")).collect()
    }
    t("htmlStrip (wrapped corpus: blocks + tags + entities; forced evaluation)") {
      val wrapped = docs.select(col("doc_id"), concat(
        lit("<html><head><style>b { c: d }</style></head><body><p>"), col("text"),
        lit("</p><script>var x = 1 &lt; 2;</script>&amp;&nbsp;</body></html>")).as("text"))
      graft.operators.TextAnalysis.htmlStrip(wrapped).agg(sum("n_cp_clean")).collect()
    }
    t("boilerplateStrip (hot shared lines across the replica corpus)") {
      // hdr: corpus/40 docs per line (dropped); footer: EVERY doc (the
      // hot-key worst case for the frequency join); body text kept
      val lined = docs.select(col("doc_id"), concat_ws("\n",
        concat(lit("hdr "), (col("doc_id") % 40).cast("string")),
        col("text"),
        lit("footer shared")).as("text"))
      graft.operators.Dedup.boilerplateStrip(lined, minDocs = 1000L).count()
    }
    t("bm25TopK (20 queries, k=10)") {
      val q = docs.where(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
      graft.operators.Search.bm25TopK(docs, q, k = 10).count()
    }
    t("bm25 hard negatives (self-positive excluded, fetch margin 5)") {
      val q = docs.where(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
      val pos = q.select(col("query_id"), col("query_id").as("doc_id"))
      graft.operators.Search.bm25HardNegatives(docs, q, pos, k = 10).count()
    }
    t(s"bloomScreen (5% incoming vs 95% existing, 2^${4 * bloomHex} bits)") {
      // hexDigits=6 -> 16M bits / 2 MiB broadcast: sized for the 1.9M-hash
      // existing side at k=4 (~fill 37%, FP ~2%); 7 = the 32 MiB ceiling
      graft.operators.Dedup.bloomScreen(
        docs.where(col("doc_id") % 20 === 0), docs.where(col("doc_id") % 20 =!= 0),
        hexDigits = bloomHex).count()
    }
    t(s"bloomScreenSharded (16 shards x 2^${4 * bloomHex} bits)") {
      graft.operators.Dedup.bloomScreenSharded(
        docs.where(col("doc_id") % 20 === 0), docs.where(col("doc_id") % 20 =!= 0),
        shardHexDigits = 1, hexDigits = bloomHex).count()
    }
    t("substringSpans (k=10 exact-substring dedup)") {
      // the replica corpus is pathologically duplicated (every window of the
      // shared prefix repeats reps times) — worst-case island merging
      graft.operators.Dedup.substringSpans(docs).count()
    }
    t("mixReport on derived groups") {
      graft.operators.Curation.mixReport(
        docs.withColumn("lang", (col("doc_id") % 5).cast("string"))
          .withColumn("source", (col("doc_id") % 40).cast("string"))).count()
    }
    t("capPerGroup (500 per derived source)") {
      graft.operators.Curation.capPerGroup(
        docs.withColumn("source", (col("doc_id") % 40).cast("string")), "source", 500).count()
    }
    t("qualitySummary (nearest-rank p50/p90/p99)") {
      graft.operators.Curation.qualitySummary(docs).count()
    }
    t("lengthReport (per-source nearest-rank p50/p90/p99)") {
      graft.operators.Curation.lengthReport(
        docs.withColumn("source", (col("doc_id") % 40).cast("string"))).count()
    }
    t("pageRank (5 iters over derived domain graph, ~500 domains)") {
      // one edge per doc + a second for even ids: corpus-sized edge list,
      // fixed node count — the shape of a real host graph (edges >> nodes)
      val e1 = docs.select(
        concat(lit("d"), col("doc_id") % 499).as("src"),
        concat(lit("d"), (col("doc_id") * 13 + 7) % 499).as("dst"))
      val e2 = docs.where(col("doc_id") % 2 === 0).select(
        concat(lit("d"), col("doc_id") % 499).as("src"),
        concat(lit("d"), (col("doc_id") * 31 + 11) % 499).as("dst"))
      graft.operators.Graph.pageRank(e1.union(e2), iters = 5).count()
    }
    t("trustRank (5 iters, 16-domain seed whitelist)") {
      val e1 = docs.select(
        concat(lit("d"), col("doc_id") % 499).as("src"),
        concat(lit("d"), (col("doc_id") * 13 + 7) % 499).as("dst"))
      val seeds = spark.range(16).select(concat(lit("d"), col("id")).as("domain"))
      graft.operators.Graph.trustRank(e1, seeds, iters = 5).count()
    }
    t("components (corpus-sized edge list, ~500 domains)") {
      val e1 = docs.select(
        concat(lit("d"), col("doc_id") % 499).as("src"),
        concat(lit("d"), (col("doc_id") * 13 + 7) % 499).as("dst"))
      graft.operators.Graph.components(e1).count()
    }
    t("hits (5 iters, same corpus-sized edge list, ~500 domains)") {
      val e1 = docs.select(
        concat(lit("d"), col("doc_id") % 499).as("src"),
        concat(lit("d"), (col("doc_id") * 13 + 7) % 499).as("dst"))
      graft.operators.Graph.hits(e1, iters = 5).count()
    }
    t("fuzzyExact dedup (row-wise normalized key + hash groupBy)") {
      graft.operators.Dedup.fuzzyExact(docs).count()
    }
    t("sourceOverlap (distinct hash x source self-join, tiny aggregate)") {
      graft.operators.Curation.sourceOverlap(
        docs.withColumn("source", (col("doc_id") % 40).cast("string"))).count()
    }
    t("keepReasons (five composed screens, doc-keyed joins only)") {
      graft.operators.Curation.keepReasons(
        docs, docs.where(col("doc_id") % 1000 === 0)).agg(sum("keep")).collect()
    }
    t("decontamFilter (0.1% probe set, n-gram-blocked join + rollup)") {
      graft.operators.Curation.decontamFilter(
        docs, docs.where(col("doc_id") % 1000 === 0)).agg(sum("keep")).collect()
    }
    t("mojibakeStats (two native regex scans, row-wise)") {
      graft.operators.TextAnalysis.mojibakeStats(docs)
        .agg(sum("n_mojibake"), sum("keep")).collect()
    }
    t("codeDetect (two native regex scans + length, row-wise)") {
      graft.operators.TextAnalysis.codeDetect(docs)
        .agg(sum("n_symbols"), sum("is_code")).collect()
    }
    t("ngramNovelty (gram df aggregate + join back, no pairs)") {
      graft.operators.TextAnalysis.ngramNovelty(docs).agg(sum("n_novel")).collect()
    }
    t("sentenceStats + dailyTrend-shape ops (row-wise / tiny-frame window)") {
      graft.operators.TextAnalysis.sentenceStats(docs).agg(sum("n_sentence_words")).collect()
    }
    t("mmrSelect + evalReport (20 queries x 15 candidates, corpus-sized qrels)") {
      // candidate-bounded by construction; qrels deliberately corpus-sized
      // (2M rows at 20x) to exercise the per-query aggregate path
      val embKeyed = graft.operators.Points.table(spark, sfDir, "embeddings")
        .crossJoin(spark.range(embReps).select(col("id").as("r")))
        .select((col("vec_id") * embReps + col("r")).as("vec_id"), col("embedding"))
      val nv = embKeyed.count()
      val cands = spark.range(20).select(col("id").as("query_id"))
        .crossJoin(spark.range(1, 16).select(col("id").as("rank")))
        .select(col("query_id"),
          ((col("query_id") * 31 + col("rank") * 7) % nv).as("doc_id"),
          col("rank"))
      graft.operators.Search.mmrSelect(cands, embKeyed, k = 5).count()
      val qrels = docs.select((col("doc_id") % 20).as("query_id"), col("doc_id"))
      graft.operators.Search.evalReport(cands, qrels, k = 10).count()
    }
    // filter on the computed flag: a bare count() over a Project would let
    // Spark prune the scoring columns and measure only the scan
    t("gopherFilter") {
      graft.operators.TextAnalysis.gopherFilter(docs).where(col("keep") === 1L).count()
    }
    t("gopherRepetition (dup lines + top n-grams, native one-pass)") {
      graft.operators.TextAnalysis.gopherRepetition(docs).where(col("keep") === 1L).count()
    }
    t("blocklist + domain screens (row-wise)") {
      graft.operators.TextAnalysis.blocklistFilter(docs, Seq("slow", "spill"))
        .where(col("keep") === 1L).count()
      graft.operators.TextAnalysis.domainFilter(docs, Seq("bad.example"))
        .where(col("keep") === 1L).count()
    }
    t("crossNgramJaccard capped (incoming 5% vs existing 95%)") {
      graft.operators.Dedup.crossNgramJaccard(
        docs.where(col("doc_id") % 20 === 0), docs.where(col("doc_id") % 20 =!= 0),
        threshold = 0.5, maxDocFreq = 50L).count()
    }
    spark.catalog.clearCache()
    val embBase = graft.operators.Points.table(spark, sfDir, "embeddings")
    val emb = embBase
      .crossJoin(spark.range(embReps).select(col("id").as("r")))
      .select((col("vec_id") * embReps + col("r")).as("vec_id"), col("embedding"))
      .repartition(32)
      .cache()
    println(s"SCALE vectors: ${emb.count()}")
    // same clique caveat as minhashLsh: identical replicas make every LSH
    // bucket an embReps-clique, so pair output grows embReps^2 by design
    if (embReps <= 20)
      t("embedCosine dedup (identical replicas cluster; 20x tier only)") {
        graft.operators.Dedup.embedCosine(emb, minCosine = 0.999).count()
      }
    else println("SCALE embedCosine SKIPPED at embReps>20 (embReps^2-clique corpus)")
    t("quantizeInt8 (native one-pass)") {
      // aggregate over the stats so the expression actually evaluates
      graft.operators.Similarity.quantizeInt8(emb).agg(sum("q_sq")).collect()
    }
    t("dimStats (per-dimension health: exact min/max + grid mean/var)") {
      graft.operators.Similarity.dimStats(emb).count()
    }
    t("normOutliers (native LONG grid norms + 1-row mean broadcast)") {
      graft.operators.Similarity.normOutliers(emb).agg(sum("is_outlier")).collect()
    }
    t("topPrincipalComponent (grid scatter + 8 fixed-point power rounds)") {
      graft.operators.Similarity.topPrincipalComponent(emb).count()
    }
    t("pcProjection (corpus explode x broadcast component, one n-row exchange)") {
      graft.operators.Similarity.pcProjection(emb).agg(sum("proj_fp")).collect()
    }
    t("cellPurity (64 lists, derived labels; windows over the counts frame)") {
      graft.operators.SimilarityIvf.cellPurity(
        emb.withColumn("label", (col("vec_id") % 10).cast("int")), nLists = 64).count()
    }
    t("centroids per derived label") {
      graft.operators.Similarity.centroids(
        emb.withColumn("label", (col("vec_id") % 10).cast("int")), "label").count()
    }
    t("ivfKnnInt8 (20 queries, int8 lists)") {
      graft.operators.SimilarityIvf.ivfKnnInt8(
        emb, emb.where(col("vec_id") < 20), k = 10, nLists = 64, nProbe = 8).count()
    }
    // PQ: encode is a pure projection (no shuffle), ADC is codes x broadcast
    // tables — both must grow linearly with the corpus at any tier
    t("pqEncode (m=4 x ksub=256 codebook, projection-only)") {
      val cb = graft.operators.SimilarityPq.codebook(emb, m = 4, ksub = 256)
      graft.operators.SimilarityPq.encode(emb, cb)
        .agg(sum("code_1"), sum("code_4")).collect()
    }
    t("pqAdcKnn (20 queries, m=4 x ksub=256)") {
      graft.operators.SimilarityPq.adcKnn(
        emb, emb.where(col("vec_id") < 20), k = 10, m = 4, ksub = 256).count()
    }
    t("ivfPqKnn (20 queries, 64 lists x 8 probes, m=4 x ksub=256)") {
      graft.operators.SimilarityPq.ivfAdcKnn(
        emb, emb.where(col("vec_id") < 20), k = 10,
        nLists = 64, nProbe = 8, m = 4, ksub = 256).count()
    }
    t("bqKnn (20 queries, 64 sign bits, bit_count scan)") {
      graft.operators.Similarity.bqKnn(emb, emb.where(col("vec_id") < 20), k = 10).count()
    }
    t("prefixKnn (20 queries, 16-dim stage + exact re-rank of 40)") {
      graft.operators.Similarity.prefixKnn(
        emb, emb.where(col("vec_id") < 20), k = 10, prefixDim = 16, overfetch = 4).count()
    }
    // same clique caveat as embedCosine: identical replicas put an
    // embReps-clique in one cell, so in-cell pairs grow embReps^2 BY DESIGN —
    // maxList is the production cap and runs at every tier
    if (embReps <= 20)
      t("semanticDedup (64 cells, uncapped; 20x tier only)") {
        graft.operators.Dedup.semanticDedup(emb, minCosine = 0.999, nLists = 64).count()
      }
    else println("SCALE semanticDedup uncapped SKIPPED at embReps>20 (embReps^2-clique cells)")
    t("semanticDedup capped (64 cells, maxList=2000)") {
      graft.operators.Dedup.semanticDedup(
        emb, minCosine = 0.999, nLists = 64, maxList = 2000L).count()
    }
    spark.catalog.clearCache()
    // temporal operators at 20x events (2M rows): both are single-shuffle
    // window sweeps and must scale linearly
    val evBase = graft.operators.Points.table(spark, sfDir, "events")
    val ev = evBase
      .crossJoin(spark.range(reps).select(col("id").as("r")))
      .select((col("event_id") * reps + col("r")).as("event_id"),
        (col("user_id") * reps + col("r")).as("user_id"), // reps x the key space
        expr("ts div 1000000").as("ts_ms"), col("event_type"), col("value"))
      .repartition(32)
      .cache()
    println(s"SCALE events: ${ev.count()}")
    t("sessionStats (6h gap)") {
      graft.operators.Sessionize.sessionStats(ev, "user_id", "ts_ms", "event_id",
        gapMs = 21600000L, valueCol = "value").count()
    }
    t("asofJoin purchases->views") {
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms").as("ts"), col("value"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_event_id"),
          col("ts_ms").as("view_ts"), col("value").as("view_value"))
      graft.operators.AsOf.asofJoin(purchases, views, Seq("user_id"), "ts", "view_ts",
        "view_event_id").count()
    }
    t("funnel signup->view->purchase (24h gaps)") {
      graft.operators.Funnel.funnel(ev, "user_id", "ts_ms", "event_type",
        Seq("signup", "view", "purchase"), horizonMs = 86400000L).count()
    }
    t("retention cohorts (first-activity day x offset)") {
      graft.operators.Funnel.retention(ev, "user_id", "ts_ms").count()
    }
    t("attributionMulti (7d lookback, U-shaped credit)") {
      graft.operators.Funnel.attributionMulti(ev, "user_id", "ts_ms", "event_id",
        "event_type", convType = "purchase", touchTypes = Seq("click", "view"),
        lookbackMs = 604800000L).count()
    }
    t("zscoreOutliers (exact-decimal moments, broadcast stats)") {
      graft.operators.Anomaly.zscoreOutliers(ev).count()
    }
    t("madOutliers (two rank-picked stats, broadcast back)") {
      graft.operators.Anomaly.madOutliers(ev, threshold = 1.5).count()
    }
    t("heavyHitters + dailyTrend (map-side counts, tiny downstream)") {
      graft.operators.Funnel.heavyHitters(ev, "event_type", "ts_ms", "user_id", k = 3).count()
      graft.operators.Funnel.dailyTrend(ev, "event_type", "ts_ms").count()
    }
    t("pathTransitions (per-user lag window, tiny type x type aggregate)") {
      graft.operators.Funnel.pathTransitions(ev, "user_id", "ts_ms", "event_id",
        "event_type").count()
    }
    t("userPathGini (transition diversity, entity-keyed aggregates)") {
      graft.operators.Funnel.userPathGini(ev, "user_id", "ts_ms", "event_id",
        "event_type").count()
    }
    t("botFlag (per-user inter-arrival stats, one keyed shuffle)") {
      graft.operators.Anomaly.botFlag(
        ev.withColumn("ts_us", col("ts_ms") * 1000L),
        "user_id", "ts_us", "event_id").count()
    }
    // ---- session-4 operators ------------------------------------------
    t("charDiversity (native one-pass histogram, row-wise)") {
      graft.operators.TextAnalysis.charDiversity(docs).count()
    }
    t("pmiBigrams (pair + unigram counts, minCount-bounded joins, top-100)") {
      graft.operators.TextAnalysis.pmiBigrams(docs).count()
    }
    t("groupSplit (row-wise host hash, source fallback)") {
      graft.operators.Curation.groupSplit(
        docs.withColumn("source", (col("doc_id") % 40).cast("string"))).count()
    }
    t("winnow fingerprints (native sliding-min pass)") {
      graft.operators.Dedup.winnow(docs).count()
    }
    // the replica corpus makes every fingerprint a reps-clique — the same
    // deliberate worst case as minhash; the doc-freq cap is the 100TB config
    t(s"winnowPairs capped (maxDocFreq=$mhCap)") {
      graft.operators.Dedup.winnowPairs(docs, maxDocFreq = mhCap).count()
    }
    t("triangles (degree-oriented wedges over the corpus-sized edge list)") {
      val edges = docs.select(
        concat(lit("d"), col("doc_id") % 499).as("src"),
        concat(lit("d"), (col("doc_id") * 13 + 7) % 499).as("dst"))
      graft.operators.Graph.triangles(edges).count()
    }
    t("concurrency (two-level sweep: hour partials + day combine)") {
      graft.operators.Sessionize.concurrency(ev, "user_id", "ts_ms", "event_id",
        gapMs = 3600000L).count()
    }
    t("rpProject (16 sign axes, native fixed-point, row-wise)") {
      graft.operators.Similarity.rpProject(emb).count()
    }
    t("rpKnn (20 queries, 16-dim integer stage + exact re-rank of 20)") {
      graft.operators.Similarity.rpKnn(emb, emb.where(col("vec_id") % (n * embReps / 20) === 0), k = 5).count()
    }
    // ---- session-5 operators ------------------------------------------
    t("linkPredict (wedge join over the corpus-sized edge list, maxDeg=64)") {
      val edges = docs.select(
        concat(lit("d"), col("doc_id") % 499).as("src"),
        concat(lit("d"), (col("doc_id") * 13 + 7) % 499).as("dst"))
      graft.operators.Graph.linkPredict(edges, maxDeg = 64L).count()
    }
    t("slidingCounts (1h window / 15min slide: x4 map-side explode + one agg)") {
      graft.operators.Sessionize.slidingCounts(ev, "event_type", "ts_ms",
        "user_id").count()
    }
    t("downsamplePercentile p95 (bounded per-bucket sorted pick)") {
      val pts = ev.select(col("event_type").as("metric"),
        map(lit("user"), col("user_id").cast("string")).as("tags"),
        col("ts_ms").as("ts"), col("value"))
      graft.operators.TimeSeries.downsamplePercentile(pts, 3600000L, 0.95).count()
    }
    t("thresholdSweep (10 probes over the shared capped scored-pair frame)") {
      graft.operators.Dedup.thresholdSweep(docs, maxDocFreq = 50L).count()
    }
    t("clusterSizes (capped pairs + clusters + histogram)") {
      graft.operators.Dedup.clusterSizes(docs, maxDocFreq = 50L).count()
    }
    t("dedupSavings (exact + capped near keep-list, per derived source)") {
      graft.operators.Curation.dedupSavings(
        docs.withColumn("source", (col("doc_id") % 40).cast("string")),
        maxDocFreq = 50L).count()
    }
    t("reciprocity (reversed-key equi-join over the corpus-sized edge list)") {
      val edges = docs.select(
        concat(lit("d"), col("doc_id") % 499).as("src"),
        concat(lit("d"), (col("doc_id") * 13 + 7) % 499).as("dst"))
      graft.operators.Graph.reciprocity(edges).count()
    }
    t("lexicalDiversity (corpus-sized (doc, word) aggregate + doc rollup)") {
      graft.operators.TextAnalysis.lexicalDiversity(docs).count()
    }
    t("langConfusion (row-wise langid + tiny cell aggregate)") {
      graft.operators.TextAnalysis.langConfusion(
        docs.withColumn("lang", (col("doc_id") % 4).cast("string"))).count()
    }
    t("listBalance (IVF assign + nLists-sized count)") {
      graft.operators.SimilarityIvf.listBalance(emb, nLists = 64).count()
    }
    t("cusumDrift + activityHistogram (map-side counts, tiny downstream)") {
      graft.operators.Anomaly.cusumDrift(ev, "event_type", "ts_ms").count()
      graft.operators.Funnel.activityHistogram(ev).count()
    }
    t("rfm + abReport (user-keyed aggregates, scalar/2-row downstream)") {
      graft.operators.Funnel.rfm(ev).count()
      graft.operators.Funnel.abReport(
        ev.withColumn("variant",
          when(col("user_id") % 2 === 0, "control").otherwise("treat")),
        "variant").count()
    }
    t("topSeries + timeToConvert (sharded top-k; carry-forward touch window)") {
      val pts = ev.select(col("event_type").as("metric"),
        map(lit("user"), (col("user_id") % 99991).cast("string")).as("tags"),
        col("ts_ms").as("ts"), col("value"))
      graft.operators.TimeSeries.topSeries(pts, "sum", k = 5).count()
      graft.operators.Funnel.timeToConvert(ev).count()
    }
    t("khopReach + stickiness (frontier BFS; (user, day) window-end explode)") {
      val edges = docs.select(
        concat(lit("d"), col("doc_id") % 499).as("src"),
        concat(lit("d"), (col("doc_id") * 13 + 7) % 499).as("dst"))
      val seeds = spark.range(4).select(concat(lit("d"), col("id")).as("domain"))
      graft.operators.Graph.khopReach(edges, seeds, maxHops = 3).count()
      graft.operators.Funnel.stickiness(ev).count()
    }
    t("scriptProfile + balancedSample (row-wise regex counts; hash cut)") {
      graft.operators.TextAnalysis.scriptProfile(docs).count()
      graft.operators.Curation.balancedSample(
        docs.withColumn("lang", (col("doc_id") % 4).cast("string"))).count()
    }
    t("mediaDedup + cosineSweep (binary hash groupBy; LSH-candidate probe)") {
      graft.operators.Multimodal.exactDedup(
        docs.select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"),
          lit("image").as("media_type"))).count()
      graft.operators.Similarity.cosineSweep(emb).count()
    }
    t("churn + seasonality + newVsReturning + timeToConvert-family rollups") {
      graft.operators.Funnel.churn(ev).count()
      graft.operators.Funnel.seasonality(ev).count()
      graft.operators.Funnel.newVsReturning(ev).count()
    }
    t("gapReport + packStats (per-series lag window; per-shard pack rollup)") {
      val pts = ev.select(col("event_type").as("metric"),
        concat(lit("user="), col("user_id") % 997).as("series"), col("ts_ms").as("ts"))
      graft.operators.TimeSeries.gapReport(pts, 3600000L).count()
      graft.operators.Curation.packStats(docs, ctxLen = 2048L, nShards = 64).count()
    }
    t("seasonalError (exact-lag self-join on the hourly downsample grid)") {
      val pts = ev.groupBy(col("event_type").as("metric"),
          concat(lit("user="), col("user_id") % 997).as("series"),
          expr("ts_ms div 3600000 * 3600000").as("ts"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("value"))
      graft.operators.TimeSeries.seasonalError(pts, 86400000L).count()
    }
    // ---- session-6 operators ------------------------------------------
    // the replica corpus makes every shingle a reps-clique (same deliberate
    // worst case as jaccard); the doc-freq cap is the 100TB config
    t("containment capped (maxDocFreq=50; doc-in-doc pairs, shingle-blocked)") {
      graft.operators.Dedup.containment(docs, threshold = 0.5, maxDocFreq = 50L).count()
    }
    t("nearDupSourceMatrix (pair-sized joins to doc->source + tiny matrix agg)") {
      val pairs = graft.operators.Dedup.containment(docs, threshold = 0.5, maxDocFreq = 50L)
      graft.operators.Curation.nearDupSourceMatrix(
        docs.withColumn("source", (col("doc_id") % 40).cast("string")), pairs).count()
    }
    t("isotropy (pair-free: one explode + per-dim aggregate + 64-row fold)") {
      graft.operators.Similarity.isotropy(emb).count()
    }
    t("selfKnnDensity (sampled probes vs full corpus via the k-bounded top-k)") {
      graft.operators.Similarity.selfKnnDensity(emb,
        k = 10, probeMod = math.max(1L, n * embReps / 20)).count()
    }
    t("autocorrelation (per-metric bucket series window, lag-exploded agg)") {
      val pts = ev.select(col("event_type").as("metric"),
        col("ts_ms").as("ts"), col("value"))
      graft.operators.TimeSeries.autocorrelation(pts).count()
    }
    t("paretoReport (per-count-value rollup; window over distinct counts only)") {
      graft.operators.Funnel.paretoReport(ev).count()
    }
    t("crossCorrelation (bucket-series join; metrics^2 x lags aggregate)") {
      val pts = ev.select(col("event_type").as("metric"),
        col("ts_ms").as("ts"), col("value"))
      graft.operators.TimeSeries.crossCorrelation(pts).count()
    }
    t("interarrival (per-user gap lag + rank windows, nearest-rank integer picks)") {
      graft.operators.Anomaly.interarrival(
        ev.withColumn("ts_us", col("ts_ms") * 1000L)).count()
    }
    t("qualityCalibration (row-wise scoring + hash-dup join + 12-bucket rollup)") {
      graft.operators.Curation.qualityCalibration(docs).count()
    }
    t("degreeHistogram (edge distinct + two degree aggregates + 64-bucket rollup)") {
      val edges = docs.select(
        concat(lit("d"), col("doc_id") % 499).as("src"),
        concat(lit("d"), (col("doc_id") * 13 + 7) % 499).as("dst"))
      graft.operators.Graph.degreeHistogram(edges).count()
    }
    t("hourEntropy (type x 24 count aggregate; decimal-quantized ln terms)") {
      graft.operators.Funnel.hourEntropy(ev).count()
    }
    t("pcVarianceExplained (shared PC frame + projection aggregate + dim fold)") {
      graft.operators.Similarity.pcVarianceExplained(emb,
        graft.operators.Similarity.topPrincipalComponent(emb)).count()
    }
    // hub cap = the covisit skew contract: a user with k items is k^2/2
    // pairs; derived (user % 9973, doc_id % 499) engagement has bounded
    // degrees, the cap demonstrates the guard
    t("covisitation capped (user-keyed pair join; maxUserDeg=64)") {
      val eng = docs.select((col("doc_id") % 9973).as("user"),
        (col("doc_id") % 499).as("item"))
      graft.operators.Graph.covisitation(eng, maxUserDeg = 64L).count()
    }
    t("hardTriplets (broadcast anchors, one corpus scan, two keyed aggregates)") {
      graft.operators.Similarity.hardTriplets(
        emb.withColumn("label", (col("vec_id") % 7).cast("int")),
        anchorMod = math.max(1L, n * embReps / 20)).count()
    }
    t("phraseHits (positional explode; ONE broadcast-term join + anchor agg)") {
      val q = docs.where(col("doc_id") % (n * reps / 20) === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
      graft.operators.Search.phraseHits(docs, q).count()
    }
    t("trendReport (bucket aggregate + per-metric OLS moments)") {
      val pts = ev.select(col("event_type").as("metric"),
        col("ts_ms").as("ts"), col("value"))
      graft.operators.TimeSeries.trendReport(pts).count()
    }
    t("changepoint (bucket-series window + struct argmax)") {
      val pts = ev.select(col("event_type").as("metric"),
        col("ts_ms").as("ts"), col("value"))
      graft.operators.TimeSeries.changepoint(pts).count()
    }
    t("cohortLtv (first-conversion cohorts; compact cohort x offset window)") {
      graft.operators.Funnel.cohortLtv(
        ev.withColumn("value", col("value"))).count()
    }
    // ---- session-7 operators ------------------------------------------
    t("kmvDistinct (64-shard min-k prune; distinct events per type)") {
      graft.operators.Sketches.kmvDistinct(ev, "event_type", "event_id", k = 64).count()
    }
    t("hllDistinct (256-register build + sorted-fold close)") {
      graft.operators.Sketches.hllDistinct(ev, "event_type", "event_id").count()
    }
    t("cmsTopK (4x1024 counters; TakeOrdered candidates; broadcast probe)") {
      graft.operators.Sketches.cmsTopK(ev, "user_id", depth = 4, width = 1024,
        nCandidates = 20).count()
    }
    // replica-user name corpus: reps x the user space, 9-digit zero-padded —
    // the linkage blocks stay prefix-bounded exactly like customer names
    t("fuzzyPairs (16-char-prefix blocks, levenshtein <= 1, maxBlock cap)") {
      val names = ev.select(col("user_id").as("id")).distinct()
        .select(col("id"), concat(lit("User#"),
          lpad(col("id").cast("string"), 9, "0")).as("name"))
      graft.operators.Linkage.fuzzyPairs(names, "id", "name",
        blockLen = 12, maxDist = 1, maxBlock = 10000L).count()
    }
    t("zipfSlope (one vocab aggregate + TakeOrdered head + 200-row window)") {
      graft.operators.TextAnalysis.zipfSlope(docs, topN = 200).count()
    }
    t("proximityHits (query-filtered positions; pair join on matched rows only)") {
      val ws = split(col("text"), " ")
      val q = docs.where(col("doc_id") % (n * reps / 20) === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", element_at(ws, 1), element_at(ws, 4)).as("qtext"))
      graft.operators.Search.proximityHits(docs, q, window = 6, k = 10).count()
    }
    t("columnProfile (ALL per-column stats in one corpus scan)") {
      graft.operators.Profiling.columnProfile(
        docs.withColumn("lang", (col("doc_id") % 4).cast("string")),
        Seq("doc_id", "text", "lang")).count()
    }
    t("columnProfileApprox (HLL sketches, NO Expand row multiplier)") {
      graft.operators.Profiling.columnProfileApprox(
        docs.withColumn("lang", (col("doc_id") % 4).cast("string")),
        Seq("doc_id", "text", "lang")).count()
    }
    t("truncRecall (8/16/32-dim prefixes vs full-dim top-k, sampled probes)") {
      graft.operators.Similarity.truncRecall(emb, dims = Seq(8, 16, 32), k = 10,
        probeMod = math.max(1L, n * embReps / 20)).count()
    }
    // ---- session-8 operators ------------------------------------------
    val sdocs = docs.withColumn("source",
      concat(lit("src"), (col("doc_id") % 20).cast("string")))
    t("booleanHits (broadcast MUST/NOT pushdown; matched rows only)") {
      val ws = split(col("text"), " ")
      val q = docs.where(col("doc_id") % (n * reps / 20) === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(ws, 1, 4), " ").as("qtext"),
          element_at(ws, 6).as("nottext"))
      graft.operators.Search.booleanHits(docs, q).count()
    }
    t("bestSnippets (matched-position anchors; per-(q,doc) windows)") {
      val q = docs.where(col("doc_id") % (n * reps / 20) === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
      graft.operators.Search.bestSnippets(docs, q, window = 12).count()
    }
    t("postingsMaintain (95% bootstrap vs 5% increment; O(increment) claim)") {
      val idx = java.nio.file.Files.createTempDirectory("graft-postsmoke").toString + "/index"
      val t0 = System.nanoTime()
      graft.tools.Maintenance.postingsMaintain(spark, idx,
        docs.where(col("doc_id") % 20 =!= 0))
      val boot = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val r = graft.tools.Maintenance.postingsMaintain(spark, idx,
        docs.where(col("doc_id") % 20 === 0))
      val incr = (System.nanoTime() - t1) / 1e9
      println(f"SCALE   postings bootstrap $boot%.2f s (95%%), increment $incr%.2f s (5%%), " +
        s"docs ${r.docsAfter}, rows ${r.postingsRows}")
    }
    t("bestSnippets doc-length sweep (per-doc m scaling; m^2-term check)") {
      // every matched term repeats L times per doc — the dense-match shape
      // where the old anchor x member band self-join went quadratic in the
      // per-doc matched-position count m; the two-pointer rewrite must grow
      // ~linearly in L here
      val probe = base.limit(2000).cache()
      probe.count()
      for (l <- Seq(1, 5, 20)) {
        val long = probe.select(col("doc_id"),
          array_join(array_repeat(col("text"), l), " ").as("text")).cache()
        long.count()
        val q = long.where(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("query_id"),
            array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
        val t0 = System.nanoTime()
        graft.operators.Search.bestSnippets(long, q, window = 12).count()
        println(f"SCALE   doclen x$l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        long.unpersist()
      }
      probe.unpersist()
    }
    t("spellSuggest (first-char/length blocked vocab candidates)") {
      val w2 = "element_at(split(text, ' '), 2)"
      val q = docs.where(col("doc_id") % (n * reps / 20) === 0)
        .select(col("doc_id").as("query_id"),
          expr(s"concat(substring($w2, 1, length($w2) - 1), 'z')").as("qterm"))
      graft.operators.Search.spellSuggest(docs, q).count()
    }
    t("pipelineKeep (quality -> dedup -> cap -> budget, composed)") {
      graft.operators.Curation.pipelineKeep(sdocs, minQuality = 0.3,
        capPerSource = 2000, budgetWords = 10000000L).count()
    }
    t("bigramEntropy (char-pair explode -> map-side combined agg)") {
      graft.operators.TextAnalysis.bigramEntropy(docs).count()
    }
    t("vocabDrift (200-word head broadcast; sources x head scoring frame)") {
      graft.operators.TextAnalysis.vocabDrift(sdocs).count()
    }
    t("ocr+license+langMix (row-wise screens over one scan each)") {
      graft.operators.TextAnalysis.ocrArtifacts(docs).count()
      graft.operators.TextAnalysis.licenseScreen(docs).count()
      graft.operators.TextAnalysis.langMix(docs).count()
    }
    t("mahalanobisDiag (posexplode x dims + broadcast dim stats)") {
      graft.operators.Similarity.mahalanobisDiag(emb).count()
    }
    t("amsF2 (x16 sign explode into one partial agg)") {
      graft.operators.Sketches.amsF2(ev, "user_id", r = 16).count()
    }
    t("burstiness (per-user sorted gap folds)") {
      graft.operators.Anomaly.burstiness(
        ev.withColumn("ts_us", col("ts_ms") * 1000L)).count()
    }
    t("seasonalAnomaly+dispersion (bucket aggregates, broadcast cells)") {
      graft.operators.Anomaly.seasonalAnomaly(ev).count()
      graft.operators.Anomaly.dispersionIndex(ev).count()
    }
    t("markovStationary (6 integer power steps over the type-pair frame)") {
      graft.operators.Funnel.markovStationary(ev, "user_id", "ts_ms",
        "event_id", "event_type").count()
    }
    t("pathTrigrams (two lags on the bigram window; types^3 agg)") {
      graft.operators.Funnel.pathTrigrams(ev, "user_id", "ts_ms",
        "event_id", "event_type").count()
    }
    t("srmCheck + downsampleFill (distinct agg; per-series grid explode)") {
      graft.operators.Funnel.srmCheck(ev.withColumn("variant",
        when(col("user_id") % 3 === 0, "treat").otherwise("control"))).count()
      val pts = ev.select(col("event_type").as("metric"), col("ts_ms").as("ts"),
        col("value"), map(lit("user"), col("user_id").cast("string")).as("tags"))
      graft.operators.TimeSeries.downsampleFill(
        pts.where(col("metric") === "purchase"), 3600000L).count()
    }
    // round-10 release-surface / CDC / layout operators: every one is
    // hash-aggregate- or single-key-window-shaped and must scale linearly
    t("scd2 (one key shuffle, both windows on one sort)") {
      graft.operators.Cdc.scd2(ev, "user_id", "event_type",
        col("ts_ms"), "event_id").count()
    }
    t("tCloseness (QI agg + bounded marginal broadcast)") {
      val qi = sdocs.select(col("source"),
        (length(col("text")) % 7L).as("len_bucket"),
        concat(lit("s"), (col("doc_id") % 5).cast("string")).as("sens"))
      graft.operators.Privacy.tCloseness(qi, Seq("source", "len_bucket"), "sens").count()
    }
    t("dpClippedCounts (two hash aggregates, no window)") {
      graft.operators.Privacy.dpClippedCounts(ev, "event_type", "user_id", salt = "smoke",
        cap = 4, epsilon = 0.5).count()
    }
    t("joinSkewProfile (count-of-counts percentiles + 32 md5 shards)") {
      graft.operators.Profiling.joinSkewProfile(ev, "user_id").count()
    }
    t("snapshotDelta+aggDeltaAudit (one pk full outer join)") {
      val v1 = sdocs.where(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("n_chars"))
      val v2 = sdocs.where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), col("source"),
          (length(col("text")).cast("long") + col("doc_id") % 3).as("n_chars"))
      graft.operators.Cdc.aggDeltaAudit(
        graft.operators.Cdc.snapshotDelta(v1, v2, Seq("doc_id"), "n_chars", Seq("source")),
        Seq("source")).count()
    }
    t("zorderProfile + pruneAudit (pure bit-chain aggregates)") {
      val x = expr("user_id % 256"); val y = expr("(ts_ms div 86400000) % 256")
      graft.operators.Layout.zorderProfile(ev, x, y, bits = 8, bucketSize = 64L).count()
      graft.operators.Layout.pruneAudit(ev, x, y, bits = 8, bucketSize = 64L,
        xLo = 32L, xHi = 47L).count()
    }
    t("intervalOverlap (6h sessions x daily windows, band-deduped)") {
      val sess = graft.operators.Sessionize.sessions(ev, "user_id", "ts_ms", "event_id",
        gapMs = 21600000L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts_ms")).as("l_start"), (max(col("ts_ms")) + lit(1L)).as("l_end"))
      val win = ev.select(expr("ts_ms div 86400000").as("day")).distinct()
        .withColumn("r_start", col("day") * lit(86400000L) + lit(21600000L))
        .withColumn("r_end", col("day") * lit(86400000L) + lit(28800000L))
      graft.operators.AsOf.intervalOverlap(sess, win, bandMs = 86400000L).count()
    }
    t("neymanSample (|strata|-row broadcast + stratum rank)") {
      graft.operators.Curation.neymanSample(
        sdocs.withColumn("n_chars", length(col("text")).cast("long")),
        "source", "n_chars", "doc_id", budget = 1000L).count()
    }
    // round-11 maintained-index / maintained-dimension operators:
    // O(delta + open) SCD2 apply and the pure-projection IVF increment
    t("scd2Apply (half-history + delta; closed side never reshuffles)") {
      val base = ev.select(col("user_id"), col("event_type"),
        col("ts_ms").as("ms"), col("event_id"))
      val mm = base.agg(min(col("ms")), max(col("ms"))).head
      val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
      val history = graft.operators.Cdc.scd2(base.where(col("ms") < cut),
        "user_id", "event_type", col("ms"), "event_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      history.count() // the stored dimension: built once, not per pass
      val t0 = System.nanoTime()
      graft.operators.Cdc.scd2Apply(history, base.where(col("ms") >= cut),
        "user_id", "event_type", col("ms"), "event_id").count()
      println(f"SCALE   scd2Apply delta-only portion ${(System.nanoTime() - t0) / 1e9}%.2f s")
      history.unpersist()
    }
    t("assignStream (literal centroids, zero-shuffle projection)") {
      val cents = graft.operators.SimilarityIvf.centroids(emb, 16)
      graft.operators.SimilarityIvf.assignStream(emb, cents).count()
    }
    t("heavyKeysStream on batch (per-key state fold, crossing emission)") {
      graft.operators.Profiling.heavyKeysStream(ev, "user_id", threshold = 50L).count()
    }
    spark.stop()
  }
}
