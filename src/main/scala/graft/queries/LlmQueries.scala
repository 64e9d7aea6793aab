package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Points, Similarity, TextAnalysis}

/**
 * Training-data-pipeline queries (dedup, similarity search, text analysis,
 * multimodal plumbing) over the `documents` / `embeddings` tables, each with a
 * DuckDB oracle that reproduces the md5-derived signatures bit-for-bit.
 */
object LlmQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Points.table(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame = Points.table(s, dir, "embeddings")

  /** The retrieval family's shared probe-query batch: every 97th doc's first
    * four words. */
  private def probeQueries(d: DataFrame): DataFrame =
    d.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))

  /** [[probeQueries]] memoized per (session, dir) and persisted (the
    * repersist guard): a dozen retrieval gates — and several operators,
    * twice each internally — re-derived the probe batch with its own
    * corpus scan; the persisted ~(corpus/97)-row frame turns each of those
    * into an in-memory read. */
  private val probeQMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def probeQueriesFrame(s: SparkSession, dir: String): DataFrame =
    repersist(probeQMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      probeQueries(docs(s, dir))))

  /**
   * One candidate fetch for the whole BM25 family: `search_bm25`,
   * `search_hybrid_rrf` and `search_hard_negatives` all rank the same probe
   * batch over the same corpus, and the fetch carries the family's entire
   * fixed cost (the corpus scan + ~8 codegen compilations, stage-probed to
   * dominate each gate). Memoized per (session, dir) and persisted: the
   * first gate pays the build, the others re-rank the k-bounded persisted
   * rows (15 per query — trivially executor-safe at any corpus size). The
   * top-10 prefix of the k=15 fetch is bit-identical to a direct k=10 fetch:
   * the global rank window orders the same candidate set the same way.
   */
  private val bm25Memo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** The shared probe-term POSTINGS + one-row corpus-stats pair every
    * lexical scorer opens with (`Search.matchedPostings`/`corpusStats`):
    * built and persisted once per (session, dir), then BM25, Dirichlet-QL,
    * tf-idf and the PRF re-rank all compose on it — each gate pays only its
    * own matched-bounded scoring, not a fresh corpus scan. Postings are
    * term-filtered aggregates (≪ corpus tokens) and stats is one row:
    * executor-safe to persist at any corpus size. */
  private val postingsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val statsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def probeTerms(s: SparkSession, dir: String): DataFrame =
    probeQueriesFrame(s, dir)
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
  private def repersist(df: DataFrame): DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df
  }
  private def probePostings(s: SparkSession, dir: String): DataFrame =
    repersist(postingsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir)
      graft.operators.Search.matchedPostings(d, probeTerms(s, dir))
    }))

  /** The shared matched-POSITIONS frame for the positional family
    * (phrase / proximity / boolean / snippets+highlight): one lowercased
    * positional explode per (session, dir) over the probe terms PLUS the
    * boolean gate's NOT terms (a superset is sound — every consumer re-joins
    * its own term frame). */
  private val positionsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def probePositions(s: SparkSession, dir: String): DataFrame =
    repersist(positionsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir)
      val terms = probeQueriesFrame(s, dir)
        .select(explode(split(lower(col("qtext")), " ")).as("w"))
        .unionByName(d.where(col("doc_id") % 97 === 0)
          .select(lower(element_at(split(col("text"), " "), 6)).as("w"))
          .where(col("w").isNotNull))
      graft.operators.Search.matchedPositions(d, terms)
    }))
  private def corpusStatsFrame(s: SparkSession, dir: String): DataFrame =
    repersist(statsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      graft.operators.Search.corpusStats(docs(s, dir))))

  /** The bm25 top-10 oracle, shared verbatim by `search_bm25` and (as a
    * subquery) the `search_coverage` audit so the two cannot drift.
    * `docWhere` filters the SCORED corpus (the probe-query batch always
    * derives from the full table) — the `search_bm25_ageoff` gate scores
    * the post-retention survivors against the same construction. */
  private def bm25Top10OracleSqlOver(docWhere: String): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents $docWhere),
      |q AS (SELECT doc_id AS query_id, array_to_string((string_split(text, ' '))[1:4], ' ') AS qtext
      |      FROM documents WHERE doc_id % 97 = 0),
      |qt AS (SELECT DISTINCT query_id, term
      |       FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q)),
      |dt AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
      |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM dt GROUP BY 1, 2, 3),
      |m AS (SELECT qt.query_id, tf.doc_id, tf.dl, tf.term, tf.tf FROM tf JOIN qt USING (term)),
      |dfq AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT term, doc_id FROM m) GROUP BY 1),
      |st AS (SELECT COUNT(*) AS n_docs, SUM(len(ws)) AS sum_dl FROM w),
      |c AS (SELECT m.query_id, m.doc_id,
      |        CAST((ln(1 + ((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)))
      |              * ((m.tf * (1.2 + 1)) / (m.tf + (1.2 * ((1.0 - 0.75) + ((0.75 * m.dl)
      |                / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))))) AS DECIMAL(28,9)) AS c
      |      FROM m JOIN dfq USING (term) CROSS JOIN st),
      |sc AS (SELECT query_id, doc_id, SUM(c) AS score, COUNT(*) AS n_terms FROM c GROUP BY 1, 2)
      |SELECT query_id, rank, doc_id, CAST(score AS DOUBLE) AS score, n_terms FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      |  FROM sc)
      |WHERE rank <= 10""".stripMargin

  private val Bm25Top10OracleSql = bm25Top10OracleSqlOver("")

  /** The synthetic-image fixture shared by the four PNG-path multimodal
    * gates (`multimodal_decode`, `multimodal_resize`,
    * `multimodal_decode_partitioned`, `multimodal_features`) — the
    * BM25-family memoization pattern: the render + PNG-encode pass over the
    * corpus runs once per (session, dir) and persists, so each gate pays
    * only its OWN decode work, not a fresh fixture build. Payloads are
    * ≤ 80×64 PNGs (~KB/row): executor-safe to persist at any corpus size a
    * fixture would be built at. */
  private val imagesMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def syntheticImagesFrame(s: SparkSession, dir: String): DataFrame =
    repersist(imagesMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      graft.operators.Multimodal.syntheticImages(docs(s, dir))))

  /** The near-dup COMPONENTS frame `clusters(ngramJaccard(corpus, 0.7))`
    * shared by the four cluster-consuming gates (`dedup_clusters`,
    * `dedup_keep_list`, `dedup_keep_best`, `dedup_cluster_sizes`): one
    * jaccard scoring + union-find per (session, dir) instead of four, and
    * the cold shingle-cache build is attributed to its own
    * `shared_build_dup_clusters` line instead of whichever consumer runs
    * first alphabetically. Components are duplicate-bounded rows (≪ corpus):
    * executor-safe to persist. */
  private val dupClustersMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def dupClustersFrame(s: SparkSession, dir: String): DataFrame =
    repersist(dupClustersMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      Dedup.clusters(Dedup.ngramJaccard(docs(s, dir), threshold = 0.7).select("a", "b"))))

  /** The planted full link-graph edge frame `plantedEdges(corpus, full)`
    * shared by the SIXTEEN Graph-family gates: every gate re-derived the
    * edge list from the corpus (2–4 union'd projections of the doc scan),
    * and the non-iterative operators reference their edge input up to ~13
    * times — 52 corpus scans in `graph_assortativity`'s physical plan
    * alone. One persisted build per (session, dir) turns every reference
    * into an in-memory read. Edge rows are ≈ 2.4 x docs short strings:
    * executor-safe to persist wherever the corpus itself is processed. */
  private val edgesMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def plantedEdgesFrame(s: SparkSession, dir: String): DataFrame =
    repersist(edgesMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      plantedEdges(docs(s, dir), full = true)))

  /** The per-doc Kneser-Ney score frame `TextAnalysis.lmScoreKN(corpus)`
    * shared by `text_lm_kn` (the score gate) and `curate_lm_buckets` (the
    * CCNet bucket report) — the BM25-family memoization pattern: the KN
    * scoring pipeline (two corpus explodes: bigram counts + probe) runs once
    * per (session, dir) instead of once per consumer, with the build
    * attributed to `shared_build_kn_scores`. Doc-count-sized narrow rows:
    * executor-safe to persist at any corpus size. */
  private val knScoresMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def knScoresFrame(s: SparkSession, dir: String): DataFrame =
    repersist(knScoresMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      TextAnalysis.lmScoreKN(docs(s, dir))))

  /** The MAINTAINED-STORE fetch family — the store-side mirror of the
    * batch memos above (`probePostings`/`probePositions`/`bm25Hits15`):
    * every lexical `*_store` gate reads the SAME postingsMaintain-written
    * index for the SAME probe-term set, so the bucket-pruned fetch, the
    * one-row stats, the norm sidecar, the positional fetch, the store-read
    * BM25 top-10 and the store-read best-snippet frame each build once per
    * (session, dir) and persist; the gates compose their own scoring on
    * top (bit-identical — tf per (doc, term) and position rows are
    * independent of which consumer reads them, and a top-10's rank ≤ 3
    * prefix IS the top-3). Build costs are attributed to the
    * `shared_build_store_*` bench line items. All frames are term-filtered
    * aggregates / k-bounded rows: executor-safe to persist at any index
    * size. */
  private val storePostingsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def storePostingsFrame(s: SparkSession, dir: String): DataFrame =
    repersist(storePostingsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      graft.tools.Maintenance.postingsFor(s, postingsStoreDir(s, dir),
        probeTerms(s, dir))))
  private val storeStatsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def storeStatsFrame(s: SparkSession, dir: String): DataFrame =
    repersist(storeStatsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      graft.tools.Maintenance.postingsStats(s, postingsStoreDir(s, dir))))
  private val storeNormsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def storeNormsFrame(s: SparkSession, dir: String): DataFrame =
    repersist(storeNormsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      s.read.parquet(postingsStoreDir(s, dir) + "/norms").select("doc_id", "norm2")))
  /** Positional store fetch over the SAME superset word list as the batch
    * `probePositions` (probe words ∪ the boolean gate's NOT terms) — a
    * superset is sound: every positional consumer re-joins its own query
    * terms. */
  private val storePositionsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def storePositionsFrame(s: SparkSession, dir: String): DataFrame =
    repersist(storePositionsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir)
      val terms = probeQueriesFrame(s, dir)
        .select(explode(split(lower(col("qtext")), " ")).as("w"))
        .unionByName(d.where(col("doc_id") % 97 === 0)
          .select(lower(element_at(split(col("text"), " "), 6)).as("w"))
          .where(col("w").isNotNull))
      graft.tools.Maintenance.positionsFor(s, postingsStoreDir(s, dir), terms)
    }))
  /** Store-read BM25 top-10 shared by `search_bm25_store` (whole frame) and
    * `search_prf_store` (the rank ≤ 3 feedback prefix). */
  private val bm25StoreHitsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def bm25StoreHits(s: SparkSession, dir: String): DataFrame =
    repersist(bm25StoreHitsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      graft.operators.Search.bm25TopKFromPostings(
        storePostingsFrame(s, dir), storeStatsFrame(s, dir),
        probeTerms(s, dir), k = 10)))
  /** Store-read best-snippet frame shared by `search_snippets_store` and
    * `search_highlight_store` (the batch twins' snippetsMemo pattern). */
  private val storeSnippetsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def storeSnippetsFrame(s: SparkSession, dir: String): DataFrame =
    repersist(storeSnippetsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      graft.operators.Search.bestSnippetsFromPositions(
        storePositionsFrame(s, dir), probeQueriesFrame(s, dir), window = 12)))

  /** The containment-pairs frame `Dedup.containment(corpus, 0.5)` shared by
    * `dedup_containment` and `curate_near_dup_matrix` (the source-overlap
    * rollup scores exactly these pairs): one pair scoring per
    * (session, dir). Pair-bounded rows: executor-safe to persist. */
  private val containmentMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def containmentFrame(s: SparkSession, dir: String): DataFrame =
    repersist(containmentMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      Dedup.containment(docs(s, dir), threshold = 0.5)))

  /** The top-PC component frame shared by `embed_top_pc` and
    * `embed_pc_project` (the BM25-family memoization pattern): both gates
    * need the identical 8-round power iteration, so it runs once per
    * (session, dir) and the 64-row result persists across the pair. */
  private val topPcMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def topPcFrame(s: SparkSession, dir: String): DataFrame = {
    val pc = topPcMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      graft.operators.Similarity.topPrincipalComponent(emb(s, dir)))
    if (pc.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      pc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pc
  }
  private def bm25Hits15(s: SparkSession, dir: String): DataFrame = {
    val hits = bm25Memo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir)
      graft.operators.Search.bm25TopKFromPostings(
        probePostings(s, dir), corpusStatsFrame(s, dir), probeTerms(s, dir), k = 15)
    })
    // re-persist when evicted (clearCache between bench passes): each pass
    // pays the cache-cold build exactly once, the family reuses it
    repersist(hits)
  }

  /** The scored best-window frame shared by `search_snippets` and
    * `search_highlight` (the BM25-family memoization pattern): the whole
    * snippet chain — qualification join, window-cover count, per-(query,doc)
    * rank — runs once; highlight then only joins the text back and slices.
    * K-bounded rows (one per qualified (query, doc)): executor-safe to
    * persist at any corpus size. */
  private val snippetsMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def bestSnippetsFrame(s: SparkSession, dir: String): DataFrame = {
    val best = snippetsMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir)
      graft.operators.Search.bestSnippetsFromPositions(
        probePositions(s, dir), probeQueriesFrame(s, dir), window = 12)
    })
    if (best.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      best.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    best
  }

  /** The converged 5-step PageRank frame shared by `graph_pagerank` and
    * `graph_pagerank_delta`: the delta audit reuses these ranks and only
    * pays the 4-step comparison run (domains-bounded rows persisted). */
  private val pagerankMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def pageRankFrame(s: SparkSession, dir: String): DataFrame = {
    val pr = pagerankMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ =>
      graft.operators.Graph.pageRank(
        plantedEdgesFrame(s, dir), iters = 5))
    if (pr.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      pr.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pr
  }

  /** Named builders for the memoized shared family frames, in dependency
    * order (postings/stats before the BM25 fetch, positions before the
    * snippet chain). Bench forces these FIRST in each cache-cold pass and
    * times each as its own line item, so a family's one-off build cost is
    * attributed to `shared_build_*` instead of to whichever consumer gate
    * happens to run first alphabetically (the round-10 finding: the
    * `search_bm25`/`search_highlight` driver medians carried the whole
    * postings/positions build). Each builder is idempotent — once built and
    * persisted, re-forcing is a no-op count over the cached frame. */
  /** The postingsMaintain-WRITTEN index directory backing
    * `search_bm25_store` (the maintained-artifact pattern of the scd2/IVF
    * store gates): bootstrap on 2/3 of the corpus, one incremental append
    * pass on the rest — postings are doc-local, so maintained == fresh
    * batch bit-exact, and the gate's pruned-read BM25 hash-checks against
    * the SAME full-corpus oracle as `search_bm25`. */
  private val postingsStoreMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def postingsStoreDir(s: SparkSession, dir: String): String =
    postingsStoreMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir)
      val idx = java.nio.file.Files.createTempDirectory("graft-poststore").toString + "/index"
      // positions=true: the ONE store serves the scored lexical family AND
      // the positional family (phrase/proximity/boolean) — the positional
      // sidecar is bootstrap-time opt-in, increments follow the store shape
      graft.tools.Maintenance.postingsMaintain(s, idx, d.where(col("doc_id") % 3 =!= 0),
        passId = "boot", positions = true)
      graft.tools.Maintenance.postingsMaintain(s, idx, d.where(col("doc_id") % 3 === 0),
        passId = "inc1")
      // lifecycle exercised in the gated path: the census-driven compaction
      // rewrites the increment-accumulated buckets (threshold 1 forces it
      // here), and the gate hash-checks the COMPACTED store end to end
      graft.tools.Maintenance.postingsCompact(s, idx, maxFilesPerBucket = 1)
      idx
    })

  /** The postingsAgeOff-AGED index backing `search_bm25_ageoff` — the
    * retention sibling of `search_bm25_store` (reference analog: the
    * MetricAgeOffIterator/MetaAgeOffIterator pair ages data AND catalog;
    * an index over an age-managed corpus must age with it): bootstrap on
    * the full corpus, then one retention pass dropping every 11th doc.
    * The gate's pruned-read BM25 over the aged index hash-checks against
    * the oracle computed over the SURVIVING corpus — stats (df/dl/n_docs)
    * must match a fresh index over the survivors exactly, or scores drift. */
  private val agedStoreMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def agedPostingsDir(s: SparkSession, dir: String): String =
    agedStoreMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir)
      val idx = java.nio.file.Files.createTempDirectory("graft-postaged").toString + "/index"
      graft.tools.Maintenance.postingsMaintain(s, idx, d, passId = "boot")
      graft.tools.Maintenance.postingsAgeOff(s, idx,
        d.where(col("doc_id") % 11 === 0).select("doc_id"))
      // compact the multi-file bootstrap layout (content-invariant, the
      // production post-retention shape; warm read parity with the main
      // store probe-measured — the two gates' steady-state reads are within
      // noise, the bench delta is per-pass first-gate overhead)
      graft.tools.Maintenance.postingsCompact(s, idx, maxFilesPerBucket = 1)
      idx
    })

  /** The ivfMaintain-WRITTEN index backing `embed_ivf_store`: bootstrap
    * trains on 2/3 of the vectors, one staged-append increment folds the
    * rest in under the stale geometry, then `ivfRetrain` rebuilds
    * centroids-v2 from the full set — whose seeded trainer is
    * deterministic in the vector SET, so the retrained store's geometry
    * (and therefore the maintained probe read) is bit-equal to the batch
    * `ivfKnn` one-shot over the whole corpus: same oracle, whole lifecycle
    * (append protocol + retrain + list_id-partitioned layout) hash-checked
    * end to end. */
  private val ivfStoreMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfStoreDir(s: SparkSession, dir: String): String =
    ivfStoreMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val idx = java.nio.file.Files.createTempDirectory("graft-ivfstore").toString + "/index"
      graft.tools.Maintenance.ivfMaintain(s, idx, e.where(col("vec_id") % 3 =!= 0),
        nLists = 16, passId = "boot")
      graft.tools.Maintenance.ivfMaintain(s, idx, e.where(col("vec_id") % 3 === 0),
        nLists = 16, passId = "inc1")
      graft.tools.Maintenance.ivfRetrain(s, idx, nLists = 16)
      // lifecycle exercised in the gated path: the census-driven rewrite
      // (threshold 1 forces it) — the gate hash-checks the COMPACTED store
      graft.tools.Maintenance.ivfCompact(s, idx, maxFilesPerList = 1)
      idx
    })

  /** The vocabMaintain-written word-count store backing
    * `search_spell_store` (full corpus via bootstrap 2/3 + increment 1/3 —
    * additive counts, so deltas sum to exactly the fresh-corpus vocab)
    * and `search_spell_ageoff` (the same store after a vocabRetire pass
    * appends every 11th doc's counts NEGATED, then merge-compaction
    * reclaims zeroed words — the retention-as-negative-delta shape of the
    * additive-aggregate artifact). */
  private val vocabStoreMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def vocabStoreDir(s: SparkSession, dir: String): String =
    vocabStoreMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val idx = java.nio.file.Files.createTempDirectory("graft-vocabstore").toString + "/index"
      graft.tools.Maintenance.vocabMaintain(s, idx, d.where(col("doc_id") % 3 =!= 0),
        passId = "boot")
      graft.tools.Maintenance.vocabMaintain(s, idx, d.where(col("doc_id") % 3 === 0),
        passId = "inc1")
      idx
    })

  private val agedVocabMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def agedVocabDir(s: SparkSession, dir: String): String =
    agedVocabMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val idx = java.nio.file.Files.createTempDirectory("graft-vocabaged").toString + "/index"
      graft.tools.Maintenance.vocabMaintain(s, idx, d, passId = "boot")
      graft.tools.Maintenance.vocabRetire(s, idx,
        d.where(col("doc_id") % 11 === 0), passId = "ret1")
      // merge-compaction reclaims the zeroed words; the gate reads the
      // MERGED store (threshold 1 forces the rewrite)
      graft.tools.Maintenance.vocabCompact(s, idx, maxFilesPerBucket = 1)
      idx
    })

  /** The lshAgeOff-AGED signature store backing `dedup_lsh_ageoff` — the
    * near-dup screen's retention sibling: full-corpus bootstrap, one
    * retention pass dropping every 11th doc's signatures, then a delta
    * screen (every 7th doc re-keyed as new) against the survivors. A
    * signature left behind after age-off resurfaces as a phantom
    * candidate pair; a lost survivor silently weakens the screen — the
    * oracle recomputes the screen over exactly (survivors ∪ delta). */
  private val agedLshMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def agedLshDir(s: SparkSession, dir: String): String =
    agedLshMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val idx = java.nio.file.Files.createTempDirectory("graft-lshaged").toString + "/index"
      graft.tools.Maintenance.lshMaintain(s, idx, d, passId = "boot")
      graft.tools.Maintenance.lshAgeOff(s, idx,
        d.where(col("doc_id") % 11 === 0).select("doc_id"))
      idx
    })

  /** The ivfAgeOff-AGED index backing `embed_ivf_ageoff` — the ANN
    * retention sibling of `search_bm25_ageoff`: full-corpus bootstrap,
    * then one retention pass dropping every 11th vector (the probe
    * queries excluded so the gate's query batch survives). The pruned
    * probe over the aged store must equal scoring the SURVIVORS under the
    * ORIGINAL geometry — any aged row left behind (or survivor lost)
    * shifts a top-k list. */
  private val agedIvfMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def agedIvfDir(s: SparkSession, dir: String): String =
    agedIvfMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val idx = java.nio.file.Files.createTempDirectory("graft-ivfaged").toString + "/index"
      graft.tools.Maintenance.ivfMaintain(s, idx, e, nLists = 16, passId = "boot")
      graft.tools.Maintenance.ivfAgeOff(s, idx,
        e.where(col("vec_id") % 11 === 0 && col("vec_id") >= 5).select("vec_id"))
      idx
    })

  /** The lshMaintain-written SIGNATURE store backing `dedup_lsh_store` (the
    * fifth maintained artifact): bootstrap signs 2/3 of the corpus, the
    * increment screen pairs the remaining third against the PERSISTED
    * bucket-pruned signatures (never re-signing the base), and the store
    * then folds the increment in. The gate's output is the bootstrap
    * screen ∪ the increment screen, which equals the batch
    * `dedup_minhash_lsh` over the full corpus — same oracle, so the
    * production index path is hash-checked end to end. */
  private val lshStoreMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def lshStoreCandidates(s: SparkSession, dir: String): DataFrame =
    repersist(lshStoreMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val base = d.where(col("doc_id") % 3 =!= 0)
      val inc = d.where(col("doc_id") % 3 === 0)
      val idx = java.nio.file.Files.createTempDirectory("graft-lshstore").toString + "/index"
      graft.tools.Maintenance.lshMaintain(s, idx, base, passId = "boot")
      val cand = Dedup.minhashLsh(base)
        .unionByName(graft.tools.Maintenance.lshCandidates(s, idx, inc))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cand.count() // materialize BEFORE the append mutates the store dir
      graft.tools.Maintenance.lshMaintain(s, idx, inc, passId = "inc1")
      cand
    }))

  val sharedBuilds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "shared_build_postings" ->
      ((s: SparkSession, dir: String) => { probePostings(s, dir).count(); () }),
    "shared_build_corpus_stats" ->
      ((s: SparkSession, dir: String) => { corpusStatsFrame(s, dir).count(); () }),
    "shared_build_positions" ->
      ((s: SparkSession, dir: String) => { probePositions(s, dir).count(); () }),
    "shared_build_bm25_hits" ->
      ((s: SparkSession, dir: String) => { bm25Hits15(s, dir).count(); () }),
    "shared_build_images" ->
      ((s: SparkSession, dir: String) => { syntheticImagesFrame(s, dir).count(); () }),
    "shared_build_dup_clusters" ->
      ((s: SparkSession, dir: String) => { dupClustersFrame(s, dir).count(); () }),
    "shared_build_kn_scores" ->
      ((s: SparkSession, dir: String) => { knScoresFrame(s, dir).count(); () }),
    // forces the cached scored-pair frame (shingles + jaccard scoring) that
    // dedup_ngram_jaccard / dedup_threshold_sweep / the jaccard family ride:
    // the union-find memo above only pays it once per session, so without
    // this line the per-pass cold build lands on whichever jaccard consumer
    // runs first alphabetically
    "shared_build_jaccard_pairs" ->
      ((s: SparkSession, dir: String) =>
        { Dedup.ngramJaccard(docs(s, dir), threshold = 0.8).count(); () }),
    "shared_build_containment" ->
      ((s: SparkSession, dir: String) => { containmentFrame(s, dir).count(); () }),
    "shared_build_snippets" ->
      ((s: SparkSession, dir: String) => { bestSnippetsFrame(s, dir).count(); () }),
    "shared_build_top_pc" ->
      ((s: SparkSession, dir: String) => { topPcFrame(s, dir).count(); () }),
    "shared_build_edges" ->
      ((s: SparkSession, dir: String) => { plantedEdgesFrame(s, dir).count(); () }),
    "shared_build_pagerank" ->
      ((s: SparkSession, dir: String) => { pageRankFrame(s, dir).count(); () }),
    "shared_build_postings_store" ->
      ((s: SparkSession, dir: String) => { postingsStoreDir(s, dir); () }),
    "shared_build_postings_aged" ->
      ((s: SparkSession, dir: String) => { agedPostingsDir(s, dir); () }),
    "shared_build_lsh_store" ->
      ((s: SparkSession, dir: String) => { lshStoreCandidates(s, dir).count(); () }),
    "shared_build_store_fetch" ->
      ((s: SparkSession, dir: String) => {
        storePostingsFrame(s, dir).count(); storeStatsFrame(s, dir).count()
        storeNormsFrame(s, dir).count(); ()
      }),
    "shared_build_store_positions" ->
      ((s: SparkSession, dir: String) => { storePositionsFrame(s, dir).count(); () }),
    "shared_build_bm25_store_hits" ->
      ((s: SparkSession, dir: String) => { bm25StoreHits(s, dir).count(); () }),
    "shared_build_store_snippets" ->
      ((s: SparkSession, dir: String) => { storeSnippetsFrame(s, dir).count(); () }))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> ((s, dir) => TextAnalysis.tokenCounts(docs(s, dir))),
    // token counting under the BPE-ish (GPT-2-style) pre-tokenizer — the
    // count a training-mix token budget actually bills
    "text_tokens_bpe" -> ((s, dir) => TextAnalysis.tokenCountsBpe(docs(s, dir))),
    "text_langid" -> ((s, dir) => TextAnalysis.languageId(docs(s, dir))),
    // langid audited against the labeled lang column: per-(label, guess)
    // confusion cell with within-label rate — the router-trust view
    "text_langid_confusion" -> ((s, dir) => TextAnalysis.langConfusion(docs(s, dir))),
    // Unicode script mix per doc (regex-match counts, code-point safe):
    // the homoglyph/mixed-script screen ahead of tokenizer routing
    "text_script_profile" -> ((s, dir) => TextAnalysis.scriptProfile(docs(s, dir))),
    // per-doc type-token ratio + hapax fraction: template spam (low TTR)
    // vs gibberish (TTR ~1, no reuse) vs natural prose (mid + hapax tail)
    "text_lexical_diversity" -> ((s, dir) => TextAnalysis.lexicalDiversity(docs(s, dir))),
    "text_quality" -> ((s, dir) => TextAnalysis.qualityScore(docs(s, dir))),
    "text_fingerprint" -> ((s, dir) => TextAnalysis.fingerprint(docs(s, dir))),
    // Gopher-style within-doc repetition: duplicate word-3-gram ratio
    "text_repetition" -> ((s, dir) => TextAnalysis.repetition(docs(s, dir))),
    // URL/domain extraction over deterministically planted links (the
    // synthetic corpus has none) — web-curation signals, oracle-pinned
    "text_urls" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" see https://www.site"), (col("doc_id") % 7).cast("string"), lit(".example.org/p/"), col("doc_id").cast("string"),
          lit(" and http://cdn"), (col("doc_id") % 3).cast("string"), lit(".example.net/x?q=1")).as("text"))
      TextAnalysis.urls(planted)
    }),
    // Gopher repetition rules over planted line structure: every doc gets a
    // footer block ("subscribe now" duplicated on even ids, a hot 2-gram run
    // on ids % 4 == 0), so dup-line and top-n-gram flags split the corpus
    "text_gopher_rep" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat_ws("\n",
          col("text"),
          lit("subscribe now"),
          concat(lit("item "), (col("doc_id") % 5).cast("string")),
          when(col("doc_id") % 2 === 0, lit("subscribe now"))
            .otherwise(concat(lit("uniq "), col("doc_id").cast("string"))),
          when(col("doc_id") % 4 === 0, lit("buy now buy now buy now"))).as("text"))
      TextAnalysis.gopherRepetition(planted)
    }),
    // C4-style word-blocklist screen: whole-word hits against a blocklist
    // ("slow" splits the synthetic corpus ~80/20; "skew" never occurs, so the
    // no-hit path is exercised too)
    "text_blocklist" -> ((s, dir) =>
      TextAnalysis.blocklistFilter(docs(s, dir), Seq("slow", "skew"))),
    // domain-denylist screen over deterministically planted links (the
    // synthetic corpus has none): each doc links its own source's domain, so
    // denying two sources drops exactly those sources' docs
    "text_domain_filter" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" see http://"), col("source"), lit(".example/item?id="), col("doc_id").cast("string"),
          lit(" and https://mirror."), col("source"), lit(".example/item")).as("text"))
      TextAnalysis.domainFilter(planted, Seq("src3.example", "src7.example"))
    }),
    // benchmark-contamination screen: probe set = every 10th doc; corpus docs
    // sharing >= 3 distinct 8-grams with a probe are flagged
    "text_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.contamination(d, d.where(col("doc_id") % 10 === 0))
    }),
    // PII scrubbing with deterministic planted PII (the synthetic corpus has
    // none) — the redaction REPLACEMENT path itself is oracle-pinned
    "text_redact" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"),
          lit(" tel +1 555 01"), (col("doc_id") % 90 + 10).cast("string")).as("text"))
      TextAnalysis.redactPii(planted)
        .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
    }),
    // NFC normalization + control-strip + space-collapse with deterministic
    // planted non-ASCII (decomposed sequences, the Angstrom singleton, C0
    // controls, space runs — the synthetic corpus is pure ASCII); parity of
    // the native NfcNormalize expression vs DuckDB nfc_normalize is the gate
    "text_normalize" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" caf"), lit("e\u0301"), // decomposed -> U+00E9
          lit("  A\u030A"), // space run + decomposed -> U+00C5
          when(col("doc_id") % 2 === 0, lit(" \u212B")) // ANGSTROM singleton -> U+00C5
            .otherwise(lit(" \u00C5")), // already composed (isNormalized fast path)
          lit(" n\u0303o"), // decomposed -> U+00F1
          lit("\u0007beep\u0001"), // C0 controls, stripped
          lit("   tail   ")).as("text")) // trim + collapse
      TextAnalysis.normalizeText(planted)
    }),
    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    // curation: deterministic md5 sample (keep 4/16), per-language quality
    // top-k, and the greedy per-language token-budget cut
    "curate_hash_sample" -> ((s, dir) =>
      docs(s, dir).where(graft.operators.Curation.hashSample(4)).select("doc_id")),
    // A-ES weighted sampling: 200 docs drawn ∝ n_chars without replacement
    // — md5-derived uniforms, ln(u)/w keys quantized DECIMAL(28,12), the
    // deterministic token-budget-aware draw (sampling docs ∝ size samples
    // tokens uniformly); two-level sharded top-k, no global sort
    "curate_weighted_sample" -> ((s, dir) =>
      graft.operators.Curation.weightedSample(docs(s, dir), k = 200)),
    // stratified language rebalance: en keeps 4/16, es 8/16, others all
    "curate_stratified" -> ((s, dir) =>
      graft.operators.Curation.stratifiedSample(docs(s, dir), Map("en" -> 4, "es" -> 8))
        .select("doc_id", "lang_guess")),
    "curate_topk_quality" -> ((s, dir) => graft.operators.Curation.topKByLanguage(docs(s, dir), 50)),
    // per-source dup-rate audit over a corpus with planted exact dups (every
    // 5th doc re-appears under a new id; the synthetic corpus itself has none)
    "curate_dup_report" -> ((s, dir) => {
      val d = docs(s, dir)
      val planted = d.unionByName(
        d.where(col("doc_id") % 5 === 0).withColumn("doc_id", col("doc_id") + 100000))
      graft.operators.Curation.dupReport(planted)
    }),
    "curate_token_budget" -> ((s, dir) => graft.operators.Curation.tokenBudget(docs(s, dir), 20000L)),
    // packing-efficiency readout over the curate_pack layout: per-shard
    // fill rate + boundary-straddling doc fraction — the ctxLen trade view
    "curate_pack_stats" -> ((s, dir) =>
      graft.operators.Curation.packStats(docs(s, dir), ctxLen = 256L, nShards = 8)),
    // dedup cost-benefit per source: docs/tokens surviving exact vs
    // near-dup (keep-list) dedup measured INDEPENDENTLY, planted byte-dups
    // (every 5th doc re-sourced) so the exact column has real signal
    "curate_dedup_savings" -> ((s, dir) => {
      val d = docs(s, dir)
      val planted = d.unionByName(
        d.where(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 100000)
          .withColumn("source", lit("mirror")))
      graft.operators.Curation.dedupSavings(planted, threshold = 0.7)
    }),
    // BM25 lexical top-10 per probe query (every 97th doc's first 4 words):
    // broadcast query terms, corpus never shuffles on the term key; per-term
    // contributions in DECIMAL(28,9) so the score sum is exact cross-engine
    "search_bm25" -> ((s, dir) =>
      bm25Hits15(s, dir).where(col("rank") <= 10)),
    // BM25 over the MAINTAINED postings store: bucket-pruned read of the
    // bootstrap+increment index, same scorer, same full-corpus oracle —
    // the driver hash-checks the production index path end to end
    "search_bm25_store" -> ((s, dir) => bm25StoreHits(s, dir)),
    // BM25 over the AGED postings store: bootstrap + one postingsAgeOff
    // retention pass (drop every 11th doc), then the bucket-pruned read —
    // the oracle recomputes BM25 over only the surviving corpus, so the
    // gate proves the age-off restored df/dl/n_docs stats EXACTLY (any
    // drift in the decremented stats shifts every score)
    "search_bm25_ageoff" -> ((s, dir) =>
      graft.tools.Maintenance.bm25Maintained(s, agedPostingsDir(s, dir),
        probeQueriesFrame(s, dir), k = 10)),
    // Dirichlet-QL over the MAINTAINED store: the LM scorer from the same
    // bucket-pruned term fetch, same full-corpus oracle as search_dirichlet_ql
    "search_dirichlet_store" -> ((s, dir) =>
      graft.operators.Search.dirichletTopKFromPostings(
        storePostingsFrame(s, dir), storeStatsFrame(s, dir),
        probeTerms(s, dir), k = 10)),
    // tf-idf over the MAINTAINED store: doc norms come from the index's
    // per-doc norm² sidecar (persisted on the same decimal grid at index
    // time), so NO corpus scan remains in the read path — the lexical
    // family's last query-time scan is gone; same oracle as search_tfidf
    "search_tfidf_store" -> ((s, dir) =>
      graft.operators.Search.tfidfTopKWithNorms(
        storePostingsFrame(s, dir), storeNormsFrame(s, dir),
        storeStatsFrame(s, dir), probeTerms(s, dir), k = 10)),
    // exact phrase over the MAINTAINED store's positional sidecar: the
    // per-(doc, word) position arrays explode back to the anchor-alignment
    // frame after pb-bucket pruning — the phrase family's corpus posexplode
    // disappears from the read path; same oracle as search_phrase
    "search_phrase_store" -> ((s, dir) =>
      graft.operators.Search.phraseHitsFromPositions(
        storePositionsFrame(s, dir), probeQueriesFrame(s, dir))),
    // NEAR/6 proximity over the positional sidecar; same oracle as
    // search_proximity (1+4-word probe terms)
    "search_proximity_store" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val q = docs(s, dir).where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", element_at(ws, 1), element_at(ws, 4)).as("qtext"))
      graft.operators.Search.proximityHitsFromPositions(
        storePositionsFrame(s, dir), q, window = 6, k = 10)
    }),
    // boolean MUST/NOT over the positional sidecar (the distinct doc-word
    // frame is position-independent, so the same fetch serves); same
    // oracle as search_boolean
    "search_boolean_store" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val q = docs(s, dir).where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(ws, 1, 4), " ").as("qtext"),
          element_at(ws, 6).as("nottext"))
      graft.operators.Search.booleanHitsFromPositions(storePositionsFrame(s, dir), q)
    }),
    // best-snippet windows over the positional sidecar: qualification +
    // native two-pointer cover on the pruned fetch; same oracle as
    // search_snippets
    "search_snippets_store" -> ((s, dir) => storeSnippetsFrame(s, dir)),
    // the rendered snippet string with the WINDOW SCORING index-served:
    // best offsets from the positional sidecar, then one index-bounded
    // text fetch for the slice; same oracle as search_highlight
    "search_highlight_store" -> ((s, dir) =>
      graft.operators.Search.snippetTextFrom(
        storeSnippetsFrame(s, dir), docs(s, dir), window = 12)),
    // PRF over the MAINTAINED store: feedback prefix AND the expansion
    // round's new-term fetch are both bucket-pruned store reads — the
    // second corpus pass of classic PRF disappears at 100 TB; same oracle
    // as search_prf
    "search_prf_store" -> ((s, dir) => {
      val d = docs(s, dir)
      // feedback = the shared store-read top-10's rank <= 3 prefix (== a
      // direct top-3 fetch); the expansion round's new-term fetch stays a
      // bucket-pruned store read
      graft.operators.Search.prfExpandFromPostings(d,
        Some((storePostingsFrame(s, dir), storeStatsFrame(s, dir))),
        probeQueriesFrame(s, dir), bm25StoreHits(s, dir).where(col("rank") <= 3),
        r = 3, m = 2, k = 10,
        newTermFetch = Some(nt =>
          graft.tools.Maintenance.postingsFor(s, postingsStoreDir(s, dir), nt)))
    }),
    // retrieval-coverage audit over the SHARED top-10: distinct reachable
    // docs / corpus, and whether each probe's own source doc ranks first
    "search_coverage" -> ((s, dir) => {
      val hits = bm25Hits15(s, dir).where(col("rank") <= 10)
      val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      hits.agg(
          count_distinct(col("doc_id")).as("n_reachable"),
          sum(when(col("rank") === 1 && col("doc_id") === col("query_id"), 1L)
            .otherwise(0L)).as("n_self_top1"),
          count_distinct(col("query_id")).as("n_queries"))
        .crossJoin(broadcast(nDocs))
        .select(col("n_reachable"), col("n_docs"),
          (col("n_reachable").cast("double") / col("n_docs").cast("double")).as("coverage"),
          col("n_self_top1"), col("n_queries"))
    }),
    // Dirichlet query-likelihood top-10 (mu=1000) over the same probes: the
    // LM scorer beside BM25 — absent query terms contribute smoothing mass
    "search_dirichlet_ql" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Search.dirichletTopKFromPostings(
        probePostings(s, dir), corpusStatsFrame(s, dir), probeTerms(s, dir), k = 10)
    }),
    // classic tf-idf cosine (SMART lnc.ltn) top-10 over the same probes:
    // the vector-space scorer beside BM25/Dirichlet; full-vector doc norms
    // computed for MATCHED docs only (semi-join-first second scan)
    "search_tfidf" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Search.tfidfTopKFromPostings(
        d, probePostings(s, dir), corpusStatsFrame(s, dir), probeTerms(s, dir), k = 10)
    }),
    // hybrid retrieval: BM25 top-10 fused with embedding-kNN top-10 by
    // reciprocal-rank fusion (doc and vec ids align in the synthetic corpus)
    "search_hybrid_rrf" -> ((s, dir) => {
      val lex = bm25Hits15(s, dir).where(col("rank") <= 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val e = emb(s, dir)
      val sem = Similarity.bruteForceKnn(e, e.where(col("vec_id") % 97 === 0), k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      graft.operators.Search.rrfFuse(lex, sem, k = 10)
    }),
    // hard-negative mining: the query's own source doc is the known positive;
    // negatives = top-10 of the remaining BM25 candidates (fetch 15, re-rank)
    "search_hard_negatives" -> ((s, dir) => {
      val pos = probeQueriesFrame(s, dir)
        .select(col("query_id"), col("query_id").as("doc_id"))
      graft.operators.Search.bm25HardNegativesFrom(bm25Hits15(s, dir), pos, k = 10)
    }),
    "dedup_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(docs(s, dir), threshold = 0.8)),
    // the 100 TB configuration: ultra-common shingles (boilerplate) capped out
    // of candidate generation (maxDocFreq), scores still from uncapped sizes —
    // the skew guard itself is correctness-pinned by the oracle
    "dedup_ngram_jaccard_capped" -> ((s, dir) =>
      Dedup.ngramJaccard(docs(s, dir), threshold = 0.7, maxDocFreq = 5L)),
    // incremental dedup: incoming batch (every 10th doc) screened against
    // the existing set — pairs only BETWEEN corpora, no self-join quadrant
    "dedup_cross_corpus" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.crossNgramJaccard(
        d.where(col("doc_id") % 10 === 0), d.where(col("doc_id") % 10 =!= 0),
        threshold = 0.5)
    }),
    // asymmetric containment: doc-in-doc partial copies Jaccard misses
    // (|A∩B| / min set size) — same shingle blocking, shared shingle cache
    "dedup_containment" -> ((s, dir) => containmentFrame(s, dir)),
    // quality-score calibration: decile buckets crossed with length and
    // exact-dup rate — the "is the score ranking signal or noise" audit
    // every threshold cut should read first
    "curate_quality_calibration" -> ((s, dir) =>
      graft.operators.Curation.qualityCalibration(docs(s, dir))),
    // which sources rewrap each other's content: the containment pairs
    // rolled up to an unordered source x source matrix (sourceOverlap's
    // exact-hash view can't see rewrapped near-copies)
    "curate_near_dup_matrix" -> ((s, dir) =>
      graft.operators.Curation.nearDupSourceMatrix(docs(s, dir), containmentFrame(s, dir))),
    "dedup_minhash_lsh" -> ((s, dir) => Dedup.minhashLsh(docs(s, dir))),
    // the MAINTAINED signature store's screen: bootstrap pairs (batch LSH on
    // the base 2/3) ∪ the increment screen against the persisted
    // bucket-pruned signatures — together exactly the batch LSH over the
    // full corpus, checked against the same oracle construction
    "dedup_lsh_store" -> ((s, dir) => lshStoreCandidates(s, dir)),
    // LSH RETENTION: delta screen (every 7th doc re-keyed new) against the
    // lshAgeOff-aged store — candidates must cover exactly (survivors ∪
    // delta): no phantom pairs from aged signatures, no lost survivors
    "dedup_lsh_ageoff" -> ((s, dir) => {
      val d = docs(s, dir)
      val delta = d.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      graft.tools.Maintenance.lshCandidates(s, agedLshDir(s, dir), delta)
    }),
    // incremental screen: only the snapshot diff's ADDED docs pair against
    // the (base + added) band index — delta-bounded near-dup work
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      Dedup.minhashLshIncremental(
        d.where(col("doc_id") % 7 =!= 0),
        d.where(col("doc_id") % 7 === 0 && col("doc_id") % 5 =!= 0))
    }),
    // the 100 TB configuration: hot (band, key) buckets capped out of
    // candidate generation — same skew-guard contract as the ngram/simhash
    // caps, pinned by its own oracle
    "dedup_minhash_lsh_capped" -> ((s, dir) => Dedup.minhashLsh(docs(s, dir), maxBucket = 3L)),
    // candidate-quality audit: every LSH candidate pair scored with its
    // EXACT shingle jaccard (candidate-bounded — no all-pairs frame), the
    // precision report numHashes/bandSize get tuned against
    "dedup_minhash_audit" -> ((s, dir) => Dedup.minhashAudit(docs(s, dir), threshold = 0.8)),
    // near-dup CLUSTERING: connected components over the jaccard pairs, each
    // component keyed by its min doc_id (the kept representative)
    "dedup_clusters" -> ((s, dir) => dupClustersFrame(s, dir)),
    // the end product of near-dup dedup: the KEPT corpus — every doc minus
    // non-representative members of jaccard components
    "dedup_keep_list" -> ((s, dir) => {
      val d = docs(s, dir)
      val comps = dupClustersFrame(s, dir)
      d.join(comps.where(col("doc_id") =!= col("cluster_id")), Seq("doc_id"), "left_anti")
        .select("doc_id")
    }),
    // representative selection by quality: same components as the keep-list,
    // but the survivor is the best-quality member (prod rule), not min-id
    "dedup_keep_best" -> ((s, dir) =>
      Dedup.keepBestFrom(docs(s, dir), dupClustersFrame(s, dir))),
    // cluster-size distribution audit: corpus mass per component size
    // (singletons included — fractions partition 1); the post-mortem that
    // tells template blobs from healthy pair-dominated duplication
    "dedup_cluster_sizes" -> ((s, dir) =>
      Dedup.clusterSizesFrom(docs(s, dir), dupClustersFrame(s, dir))),
    // shingle-df log2 profile with exact per-band PAIR MASS: the evidence
    // view behind the maxDocFreq cap (and the auto-cap quantile heuristic)
    "dedup_df_profile" -> ((s, dir) => Dedup.dfProfile(docs(s, dir))),
    // threshold-tuning sweep over the SAME cached scored-pair frame the
    // production jaccard run uses: cumulative pair counts per probe
    // threshold, bucketed row-wise (no per-threshold pass)
    "dedup_threshold_sweep" -> ((s, dir) => Dedup.thresholdSweep(docs(s, dir))),
    "dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir), maxHamming = 6)),
    // the 100 TB configuration: hot (band-pair, key) buckets capped out of
    // candidate generation (the quadratic-blowup guard) — the cap path itself
    // is correctness-pinned by the oracle, like dedup_ngram_jaccard_capped
    "dedup_simhash_capped" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), maxHamming = 6, maxBucket = 3L)),
    // the bounded-representative per-doc near-dup SCREEN (each band-pair
    // bucket keeps its 4 lowest ids as representatives) — the batch twin of
    // the streaming simhash screen, cap behavior oracle-pinned
    "dedup_simhash_screen" -> ((s, dir) =>
      Dedup.simhashScreen(docs(s, dir), maxHamming = 6, maxPerBucket = 4)),
    "embed_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceKnn(e, e.where(col("vec_id") < 5), k = 5)
    }),
    "embed_lsh_pairs" -> ((s, dir) => Similarity.lshBucketedPairs(emb(s, dir), bits = 8, minCosine = 0.3)),
    // blocked-sample pairwise-cosine HISTOGRAM: md5 blocks + a per-block
    // cap bound the pair count regardless of corpus size — the corpus
    // self-similarity profile read before any dedup threshold is chosen
    "embed_pair_hist" -> ((s, dir) => Similarity.pairCosineHistogram(emb(s, dir))),
    // split-half centroid drift per label (even/odd vec_id halves' fixed-
    // point centroids' cosine): the encoder/distribution stability audit
    "embed_drift" -> ((s, dir) => Similarity.centroidDrift(emb(s, dir))),
    // one-row isotropy/anisotropy report: mean pairwise cosine WITHOUT a
    // pair frame (norm-of-sum identity over fixed-point normalized vectors)
    "embed_isotropy" -> ((s, dir) => Similarity.isotropy(emb(s, dir))),
    // kNN-distance OOD audit: mean top-k cosine per sampled probe — sparse-
    // region vectors (encoder failures, off-distribution rows) score lowest
    "embed_density" -> ((s, dir) => Similarity.selfKnnDensity(emb(s, dir))),
    // cosine threshold sweep over the LSH candidates — the embedding twin
    // of dedup_threshold_sweep; the minCosine evidence view
    "embed_cos_sweep" -> ((s, dir) => Similarity.cosineSweep(emb(s, dir))),
    // retrieval-confidence margins: top1 - top2 cosine per probe query —
    // the distribution ANN budgets and auto-accept thresholds are set from
    "embed_knn_margin" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnMargin(e, e.where(col("vec_id") < 5))
    }),
    // embedding-cosine near-dup DEDUP: a keep/drop decision for every vector
    // (LSH-bucketed pairs -> connected components -> min-id representative).
    // 0.3 matches embed_lsh_pairs so both gates pin the same bucket semantics.
    "dedup_embed_cosine" -> ((s, dir) => Dedup.embedCosine(emb(s, dir), minCosine = 0.3)),
    // cross-corpus embedding screen: incoming vectors (every 5th) against
    // the existing set via shared LSH buckets — embedding analog of
    // dedup_cross_corpus
    "dedup_embed_cross" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.crossLshPairs(
        e.where(col("vec_id") % 5 === 0), e.where(col("vec_id") % 5 =!= 0),
        bits = 8, minCosine = 0.3)
    }),
    // IVF coarse-quantizer ANN (scale path), seeded-centroid configuration —
    // fully deterministic, so the whole pipeline (seed pick, assignment,
    // probing, in-list exact cosine) has a SQL oracle below. The k-means
    // refined variant is recall-gated in SimilarityIvfSpec instead.
    "embed_ivf_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.operators.SimilarityIvf.ivfKnn(e, e.where(col("vec_id") < 5), k = 5)
    }),
    // IVF over the MAINTAINED index: list_id-partition-pruned probe read
    // of the bootstrap+increment+retrain store — retrain geometry equals
    // the batch build's, so the same oracle as embed_ivf_knn hash-checks
    // the whole maintained lifecycle
    "embed_ivf_store" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.tools.Maintenance.ivfKnnMaintained(s, ivfStoreDir(s, dir),
        e.where(col("vec_id") < 5), k = 5, nProbe = 4)
    }),
    // IVF RETENTION: bootstrap on the full corpus, one ivfAgeOff pass
    // dropping every 11th vector (probes kept), then the pruned probe —
    // centroid geometry is bootstrap-time (age-off never retrains), so the
    // oracle trains on ALL vectors and scores only survivors
    "embed_ivf_ageoff" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.tools.Maintenance.ivfKnnMaintained(s, agedIvfDir(s, dir),
        e.where(col("vec_id") < 5), k = 5, nProbe = 4)
    }),
    // IVF with int8-quantized inverted lists: float assignment/probing,
    // integer in-list scoring — the compressed 100 TB ANN store shape
    "embed_ivf_knn_int8" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.operators.SimilarityIvf.ivfKnnInt8(e, e.where(col("vec_id") < 5), k = 5)
    }),
    // ANN index-quality audit: recall@5 of the seeded IVF configuration vs
    // brute-force ground truth, per query — the report an ANN deployment
    // tunes nLists/nProbe against
    "embed_recall_report" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 5)
      Similarity.recallReport(
        graft.operators.SimilarityIvf.ivfKnn(e, q, k = 5),
        Similarity.bruteForceKnn(e, q, k = 5))
    }),
    // the nProbe tuning curve: recall@5 vs brute force at nProbe 1/2/4 —
    // the one-frame answer to "how many lists must serving probe"
    "embed_recall_sweep" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 5)
      // one index build + one ground-truth pass for the whole sweep: the
      // per-nProbe ivfKnn convenience re-trained centroids and re-assigned
      // the corpus three times, and bf re-scored per sweep point (18 corpus
      // scans in the gate's plan) — search() over the shared build is the
      // same scoring path ivfKnn delegates to, bit-identical per nProbe
      val bf = repersist(Similarity.bruteForceKnn(e, q, k = 5))
      val ivf = graft.operators.SimilarityIvf
      val cents = ivf.centroids(e, nLists = 16).cache()
      val indexed = repersist(ivf.assign(e, cents))
      Seq(1, 2, 4).map { np =>
        Similarity.recallReport(ivf.search(indexed, cents, q, k = 5, nProbe = np), bf)
          .withColumn("nprobe", lit(np.toLong))
      }.reduce(_ union _)
        .select(col("nprobe"), col("query_id"), col("k_eff"), col("hits"), col("recall"))
    }),
    // Product-quantization codes: the compressed 100 TB ANN store format —
    // seeded per-subspace codebooks (m=4 x ksub=16), encode is a pure
    // projection (argmin over inlined codeword distances, no shuffle)
    "embed_pq_codes" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.operators.SimilarityPq.encode(e, graft.operators.SimilarityPq.codebook(e))
    }),
    // Asymmetric-distance (ADC) PQ kNN: per-query m x ksub distance tables
    // broadcast against the code scan, m table lookups per corpus row,
    // k-bounded map-side rank — the corpus is never decompressed
    "embed_pq_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.operators.SimilarityPq.adcKnn(e, e.where(col("vec_id") < 5), k = 5)
    }),
    // PQ index-quality audit: ADC top-5 vs brute-force ground truth, the
    // compression-loss counterpart of the IVF recall report
    "embed_pq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 5)
      Similarity.recallReport(
        graft.operators.SimilarityPq.adcKnn(e, q, k = 5),
        Similarity.bruteForceKnn(e, q, k = 5))
    }),
    // Binary quantization: 64 hyperplane sign bits in one LONG, Hamming
    // ranking via codegen'd bit_count(xor) — the 32x-compressed scan tier
    "embed_bq_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bqKnn(e, e.where(col("vec_id") < 5), k = 5)
    }),
    // Matryoshka-style two-stage retrieval: rank on the first 16 dims, exact
    // re-rank of the k x 4 candidates only — full vectors stay cold
    // sparse ±1 random projection (JL sketch): exact grid-snapped signed
    // LONG sums per axis, one final division — the 4x-compressed scan tier
    // for embeddings with no trained prefix structure
    "embed_rp_project" -> ((s, dir) => Similarity.rpProject(emb(s, dir))),
    // two-stage kNN through the sketch: integer L2 coarse rank in 16 dims,
    // exact full-vector cosine re-rank of k x 4 candidates
    "embed_rp_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.rpKnn(e, e.where(col("vec_id") < 5), k = 5)
    }),
    "embed_prefix_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.prefixKnn(e, e.where(col("vec_id") < 5), k = 5)
    }),
    // Combined IVF+PQ (FAISS IVFx,PQy shape, rotation-free): coarse lists
    // prune WHICH vectors are scored, PQ codes shrink WHAT a list stores —
    // the layout a 100 TB ANN store actually deploys
    "embed_ivfpq_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.operators.SimilarityPq.ivfAdcKnn(e, e.where(col("vec_id") < 5), k = 5)
    }),
    // URL-canonicalization dedup: same canonical first-URL (scheme/query/
    // fragment/trailing-slash stripped) -> keep the lowest doc_id
    "dedup_url" -> ((s, dir) => Dedup.urlDedup(docs(s, dir))),
    // SemDeDup-style semantic dedup: IVF-cell blocking (same seeded
    // centroids as embed_ivf_knn), in-cell cosine >= 0.3 against any
    // lower-id member -> drop; keep=1 rows are the dedup survivors
    "dedup_semantic" -> ((s, dir) =>
      Dedup.semanticDedup(emb(s, dir), minCosine = 0.3, nLists = 16)),
    // REAL ImageIO decode of real PNG payloads: geometry + exact sample sum
    // from the raster; the oracle predicts both from the generator contract
    "multimodal_decode" -> ((s, dir) =>
      Multimodal.imageDecode(syntheticImagesFrame(s, dir)).toDF()),
    // MIXED-codec decode: every 5th payload is JPEG, the rest PNG — both
    // JDK readers exercised in one pass; the oracle checks the codec sniff
    // plus the geometry facts that survive lossy encoding exactly
    "multimodal_decode_mixed" -> ((s, dir) =>
      Multimodal.imageGeometry(Multimodal.syntheticImagesMixed(docs(s, dir))).toDF()),
    // exact content-byte dedup over the media table with planted re-crawl
    // dups (every 5th item re-ingested under a new id) — keep = min id
    "multimodal_dedup" -> ((s, dir) => {
      val m = Multimodal.asMediaTable(docs(s, dir))
      val planted = m.unionByName(
        m.where(col("media_id") % 5 === 0).withColumn("media_id", col("media_id") + 100000))
      Multimodal.exactDedup(planted)
    }),
    // REAL resize: decode -> nearest-neighbor pixel map -> re-encode PNG,
    // then decode the RESIZED payloads — dims and pixel sums must match the
    // integer-geometry prediction (proves the output is a valid image)
    "multimodal_resize" -> ((s, dir) =>
      Multimodal.imageDecode(
        Multimodal.imageResize(syntheticImagesFrame(s, dir), maxDim = 16)).toDF()),
    // frame sampling for the video rows: every 5th frame index, frame count
    // stub-derived from payload size (video stays the one labeled stub —
    // the JDK ships no demuxer)
    "multimodal_framesample" -> ((s, dir) =>
      Multimodal.frameSample(Multimodal.asMediaTable(docs(s, dir)), everyN = 5)),
    // the same real decode through the repartition-by-id path (decode
    // parallelism decoupled from source file layout)
    "multimodal_decode_partitioned" -> ((s, dir) =>
      Multimodal.imageDecode(syntheticImagesFrame(s, dir),
        repartitionById = true).toDF()),
    // REAL grid features (color-moment descriptor): per (cell, channel) the
    // exact sample sum/mean over the decoded raster
    "multimodal_features" -> ((s, dir) =>
      Multimodal.imageGridFeatures(syntheticImagesFrame(s, dir), grid = 4).toDF()),
    // C4-style passage dedup: 10-word passages appearing in >= 2 docs are
    // boilerplate — dropped from every doc, docs reassembled in order
    "dedup_passages" -> ((s, dir) =>
      Dedup.passageDedup(docs(s, dir), wordsPerChunk = 10, maxDocFreq = 2L)),
    // C4/CCNet line-level boilerplate strip: lines in >= 50 distinct docs
    // removed, docs reassembled in order. Planted lines pin both sides of
    // the threshold (source headers 25 docs, sig 50 = exactly at, tag 38/39
    // just under, a global footer) — the corpus itself has no newlines
    "dedup_boilerplate" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat_ws("\n",
          concat(lit("hdr "), col("source")),
          col("text"),
          concat(lit("sig "), (col("doc_id") % 10).cast("string")),
          concat(lit("tag "), (col("doc_id") % 13).cast("string")),
          lit("copyright example corp"),
          when(col("doc_id") % 3 === 0,
            concat(lit("promo "), (col("doc_id") % 7).cast("string")))).as("text"))
      Dedup.boilerplateStrip(planted, minDocs = 50L)
    }),
    // exact-substring dedup (Lee et al.): maximal >= 10-token spans repeated
    // anywhere in the corpus at ANY offset — catches the cross-boundary
    // duplication the chunk-aligned passage pass misses
    "dedup_substring" -> ((s, dir) =>
      Dedup.substringSpans(docs(s, dir), k = 10, minCount = 2L)),
    // the cleaned corpus from those spans: covered tokens stripped, docs
    // reassembled (drop-all-occurrences variant, like dedup_passages)
    "dedup_substring_strip" -> ((s, dir) =>
      Dedup.stripSubstringSpans(docs(s, dir), k = 10, minCount = 2L)),
    // DSIR-style importance weights: every-10th docs are the target
    // distribution, the rest are raw; top-256 target-word feature space
    "curate_importance" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Curation.importanceWeights(
        d.where(col("doc_id") % 10 =!= 0), d.where(col("doc_id") % 10 === 0))
    }),
    // deterministic hash train/val/test split (205/26/25 of 256)
    "curate_split" -> ((s, dir) =>
      graft.operators.Curation.splitAssign(docs(s, dir)).select("doc_id", "split")),
    // cross-split near-dup leakage audit: the minhash-LSH candidate pairs
    // joined to both endpoints' hash-split assignment — pairs straddling
    // train and val/test are eval contamination the hash split cannot see
    "curate_split_leakage" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Curation.splitLeakage(
        graft.operators.Dedup.minhashLsh(d),
        graft.operators.Curation.splitAssign(d).select("doc_id", "split"))
    }),
    // group-aware (leakage-safe) split: URL-host provenance groups over the
    // planted-URL corpus (every 5th doc unplanted -> source-shard fallback);
    // whole groups land in one split by construction
    "curate_group_split" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"), col("source"),
        when(col("doc_id") % 5 =!= 0,
          concat(col("text"), lit(" via https://www.site"), (col("doc_id") % 7).cast("string"),
            lit(".example.org/p/"), col("doc_id").cast("string")))
          .otherwise(col("text")).as("text"))
      graft.operators.Curation.groupSplit(planted)
    }),
    // concat-and-chunk sequence packing: 256-token packs over 8 shards
    "curate_pack" -> ((s, dir) =>
      graft.operators.Curation.packSequences(docs(s, dir), ctxLen = 256L, nShards = 8)),
    // corpus vocabulary: top-100 tokens by occurrence (deterministic cut)
    "text_vocab" -> ((s, dir) => TextAnalysis.vocab(docs(s, dir), 100)),
    // int8 max-abs quantization stats per embedding (native one-pass expr)
    "embed_quantize" -> ((s, dir) => Similarity.quantizeInt8(emb(s, dir))),
    // temperature (T=2) language rebalance: keep rate sqrt(n_min/n) per lang
    "curate_temperature" -> ((s, dir) =>
      graft.operators.Curation.temperatureSample(docs(s, dir), "lang")
        .select("doc_id", "lang", "rate")),
    // HARD language balance: keep rate n_min/n (the uniform endpoint of the
    // rebalance spectrum), salted-md5 decisions independent of temperature's
    "curate_balanced_sample" -> ((s, dir) =>
      graft.operators.Curation.balancedSample(docs(s, dir), "lang")),
    // analytic LSH S-curve for the configured 4x2 banding — read next to
    // dedup_threshold_sweep's empirical counts when tuning (b, r)
    "dedup_lsh_curve" -> ((s, dir) => Dedup.lshCurve(s)),
    // int8 quantized top-k: integer dot kernel, dequantized scores
    "embed_knn_int8" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceKnnInt8(e, e.where(col("vec_id") < 5), k = 5)
    }),
    // per-label centroid on the 2^-20 fixed-point grid (order-independent)
    "embed_centroid" -> ((s, dir) => Similarity.centroids(emb(s, dir))),
    // pairwise cosine between label centroids — the source-confusion audit;
    // scale-invariance keeps it on the exact integer fixed-point sums
    // (DECIMAL(38,0) products), one pinned double conversion per pair
    "embed_centroid_sim" -> ((s, dir) => Similarity.centroidSimilarity(emb(s, dir))),
    // per-dimension health audit: exact min/max + grid-exact mean/variance
    // (dead dims, scale blowups, encoder bias — the ANN-index monitoring table)
    "embed_dim_stats" -> ((s, dir) => Similarity.dimStats(emb(s, dir))),
    // IVF list-size balance: per-list load factor vs uniform — the
    // index-health audit that predicts probe latency skew
    "embed_ivf_balance" -> ((s, dir) =>
      graft.operators.SimilarityIvf.listBalance(emb(s, dir), nLists = 16)),
    // centroid-based silhouette per list: boundary cells (mean s near 0)
    // predict recall loss at small nProbe — the unlabeled-data clustering
    // audit beside cellPurity's labeled one
    "embed_silhouette" -> ((s, dir) =>
      graft.operators.SimilarityIvf.centroidSilhouette(emb(s, dir), nLists = 16)),
    // per-source document cap (anti-template-farm): top-10 by quality
    "curate_source_cap" -> ((s, dir) =>
      graft.operators.Curation.capPerGroup(docs(s, dir), "source", 10)),
    // 2D quota sample: at most 5 docs per (lang, source) CELL by salted-md5
    // uniform draw — bounds a crawler-heavy domain AND a dominant language
    // at once, where either 1D quota alone fails
    "curate_quota_2d" -> ((s, dir) => {
      val d = Points.table(s, dir, "documents").select("doc_id", "lang", "source")
      graft.operators.Curation.quotaSample2d(d, cap = 5)
    }),
    // training-mix accounting: per (lang, source) doc/token counts + shares
    "curate_mix_report" -> ((s, dir) => graft.operators.Curation.mixReport(docs(s, dir))),
    // epoch-repeat schedule compiling a weighted mix + token budget into
    // per-source epoch factors (integer basis points, capped at 3 epochs)
    "curate_epoch_mix" -> ((s, dir) =>
      graft.operators.Curation.epochMix(docs(s, dir), EpochMixWeights,
        budgetTokens = 200000L, maxEpochBp = 30000L)),
    // per-language quality distribution: exact nearest-rank percentiles via
    // bucket-decomposed rank selection (no corpus-wide language sort)
    "curate_quality_summary" -> ((s, dir) => graft.operators.Curation.qualitySummary(docs(s, dir))),
    // unigram-LM familiarity scoring against the corpus' own top-256 vocab
    "text_lm_score" -> ((s, dir) => TextAnalysis.lmScore(docs(s, dir))),
    // bigram-LM scoring: corpus top-256 bigram vocab; per doc the explained
    // pair mass + the aggregate conditional Σc(w1w2)/Σc(w1) over vocab pairs
    "text_lm_score_bigram" -> ((s, dir) => TextAnalysis.lmScoreBigram(docs(s, dir))),
    // interpolated Kneser-Ney bigram scoring (D=0.75, distinct-context
    // continuation) — the KenLM-perplexity-filter family, exact corpus
    // counts — served from the SHARED memoized score frame
    "text_lm_kn" -> ((s, dir) => knScoresFrame(s, dir)),
    // CCNet-style head/middle/tail familiarity buckets per source (KN score
    // vs mean-relative cutoffs), with the <2-word docs reported as unscored
    // — riding the same shared KN score frame as text_lm_kn
    "curate_lm_buckets" -> ((s, dir) =>
      graft.operators.Curation.lmBucketsFrom(docs(s, dir), knScoresFrame(s, dir))),
    // BPE tokenizer training: the corpus' first 3 merge rules (frequency-
    // weighted pair counts at distinct-word scale, deterministic ties)
    "text_bpe_train" -> ((s, dir) => TextAnalysis.bpeTrain(docs(s, dir), iters = 3)),
    // the apply side: per-doc token counts under the corpus-trained 3-merge
    // tokenizer (word -> final-vocab join, no per-doc merge application)
    // HTML-to-text extraction over an html-wrapped corpus (script/style
    // elements planted with contents, six entity forms, nested tags) — the
    // first pass of a crawl pipeline; plain-regex projection, no shuffle
    "text_html_strip" -> ((s, dir) => {
      val wrapped = docs(s, dir).select(col("doc_id"),
        concat(
          lit("<html><head><style>body { color: red }</style></head>" +
            "<body><h1>Doc &amp; more</h1><p>"),
          col("text"),
          lit("</p><script type=\"text/javascript\">var x = 1 &lt; 2;</script>" +
            "<div class=\"f\">&quot;end&#39;&nbsp;</div></body></html>")).as("text"))
      TextAnalysis.htmlStrip(wrapped)
    }),
    "text_bpe_encode" -> ((s, dir) => TextAnalysis.bpeEncodeCounts(docs(s, dir), iters = 3)),
    // per-language tokenizer fertility (tokens/word, chars/token) of the
    // trained BPE — the budget-equity audit across languages
    "text_bpe_fertility" -> ((s, dir) => TextAnalysis.bpeFertility(docs(s, dir), iters = 3)),
    // RAG-style chunking: 64-word windows every 48 words, with provenance
    "text_chunks" -> ((s, dir) => TextAnalysis.chunk(docs(s, dir))),
    // Gopher-style heuristic rule flags + keep decision (auditable filter)
    "text_gopher" -> ((s, dir) => TextAnalysis.gopherFilter(docs(s, dir))),
    // Fuzzy-exact dedup over a planted-variant corpus: every 10th doc is
    // replaced by a SHOUTY variant of its neighbor (uppercased, doubled
    // spaces, trailing "!!!") — byte-distinct, normalization-identical, so
    // the gate pins that case/punct/spacing variants collapse to one group
    // winnowing fingerprints (MOSS): char-level layout-robust signatures,
    // one native sliding-min pass per doc, ~2/(w+1) selection density
    "dedup_winnow" -> ((s, dir) => Dedup.winnow(docs(s, dir))),
    // winnow-pair candidates over planted copies (every 10th doc carries
    // its neighbor's text under a new prefix — shared substrings survive
    // the prefix shift, which is exactly what winnowing guarantees)
    "dedup_winnow_pairs" -> ((s, dir) => {
      val d = docs(s, dir)
      val nb = d.select((col("doc_id") + 1).as("doc_id"), col("text").as("ntext"))
      val planted = d.join(nb, Seq("doc_id"), "left").select(col("doc_id"),
        when(col("doc_id") % 10 === 0 && col("ntext").isNotNull,
          concat(lit("copy prefix "), col("ntext")))
          .otherwise(col("text")).as("text"))
      Dedup.winnowPairs(planted, minShared = 2L)
    }),
    "dedup_fuzzy_exact" -> ((s, dir) => {
      val d = docs(s, dir)
      val nb = d.select((col("doc_id") + 1).as("doc_id"), col("text").as("ntext"))
      val planted = d.join(nb, Seq("doc_id"), "left").select(col("doc_id"),
        when(col("doc_id") % 10 === 0 && col("ntext").isNotNull,
          concat(upper(regexp_replace(col("ntext"), " ", "  ")), lit(" !!!")))
          .otherwise(col("text")).as("text"))
      Dedup.fuzzyExact(planted)
    }),
    // Bloom screen: every-10th docs probe the rest; every-20th docs carry a
    // PLANTED re-occurrence (the next doc's text) and must be flagged
    "dedup_bloom_screen" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.bloomScreen(bloomIncoming(d), d.where(col("doc_id") % 10 =!= 0))
    }),
    // Bloom FPR audit: a planted known-non-member probe batch (every text
    // salted with a suffix) measures the observed false-positive rate
    // beside the analytic (1-e^{-kn/m})^k — the filter-sizing check
    "dedup_bloom_fpr" -> ((s, dir) => {
      val d = docs(s, dir)
      val probes = d.select(col("doc_id"),
        concat(col("text"), lit(" fprprobe")).as("text"))
      Dedup.bloomFprAudit(d, probes)
    }),
    // capacity path: 16 hash-space shards, each its own bitset, probed via a
    // shard-key join instead of one broadcast filter (same fixture, so the
    // two gates pin the sharding semantics against each other)
    "dedup_bloom_screen_sharded" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.bloomScreenSharded(bloomIncoming(d), d.where(col("doc_id") % 10 =!= 0),
        shardHexDigits = 1)
    }),
    // Domain-level link-graph PageRank over a planted hyperlink structure
    // (site{d%7} -> cdn{d%3}, cdn{d%3} -> site{d%5}, even docs add
    // site{d%7} -> site{(d+3)%7}, every 11th doc links the dangling 'sink')
    // — integer fixed point end to end, so the 5-iteration power method is
    // bit-exact against the unrolled SQL replay
    "graph_pagerank" -> ((s, dir) => pageRankFrame(s, dir)),
    // PageRank convergence audit: exact L1 delta between iterations 4 and
    // 5 — has the fixed power budget actually settled; reuses the
    // memoized converged frame, paying only the 4-step comparison run
    "graph_pagerank_delta" -> ((s, dir) =>
      graft.operators.Graph.pageRankDeltaFrom(pageRankFrame(s, dir),
        plantedEdgesFrame(s, dir), iters = 5)),
    // TrustRank: the same graph with teleport restricted to a two-domain
    // whitelist — trust propagates outward from the vetted core, the
    // curation-native authority variant (Gyöngyi et al.)
    "graph_trustrank" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      graft.operators.Graph.trustRank(
        plantedEdgesFrame(s, dir),
        Seq("site0", "site1").toDF("domain"), iters = 5)
    }),
    // HITS hubs & authorities over the same planted link graph: authorities
    // rank content domains, hubs rank aggregator/directory domains — the
    // pair separates "worth training on" from "worth crawling from". L1
    // integer fixed point, bit-exact vs the unrolled SQL replay
    "graph_hits" -> ((s, dir) =>
      graft.operators.Graph.hits(plantedEdgesFrame(s, dir), iters = 5)),
    // weakly-connected components over a DISCONNECTED planted graph: the
    // even docs' site/cdn web plus a separate isle ring from odd docs — the
    // dedup min-label machinery reused on the link graph, with sizes
    // per-node triangle counts + local clustering coefficient via the
    // degree-ordered orientation (O(E^1.5) wedges regardless of skew) —
    // the link-farm tell PageRank misses
    "graph_triangles" -> ((s, dir) =>
      graft.operators.Graph.triangles(plantedEdgesFrame(s, dir))),
    // k-core backbone of the planted link graph: 6 synchronous peel rounds
    // at k=3 — pure integer set computation, bit-exact vs the unrolled
    // per-round SQL replay; the dense-backbone tell that complements
    // PageRank (endorsement volume) and triangles (local closure)
    "graph_kcore" -> ((s, dir) =>
      graft.operators.Graph.kcore(plantedEdgesFrame(s, dir), k = 3, rounds = 6)),
    // common-neighborhood link prediction: non-adjacent pairs meeting ONLY
    // through a shared neighbor (wedge join, hub centers cappable), scored
    // by exact-integer neighbor-set Jaccard — mirror-candidate surfacing
    "graph_link_predict" -> ((s, dir) =>
      graft.operators.Graph.linkPredict(plantedEdgesFrame(s, dir))),
    // hub-discounting common-neighbor scores (Adamic-Adar + resource
    // allocation) over the same wedge candidates: per-pair 1/ln(deg) and
    // 1/deg sums as sorted folds over the collected center degrees
    "graph_adamic_adar" -> ((s, dir) =>
      graft.operators.Graph.adamicAdar(plantedEdgesFrame(s, dir))),
    // per-node mutual-linking rates over the DIRECTED planted graph — the
    // paid-link-ring tell the undirected family erases
    "graph_reciprocity" -> ((s, dir) =>
      graft.operators.Graph.reciprocity(plantedEdgesFrame(s, dir))),
    // log2 in/out-degree histogram of the simple graph: the shape audit
    // (hub tail, link-farm spike) that sizes the family's degree caps
    "graph_degree_hist" -> ((s, dir) =>
      graft.operators.Graph.degreeHistogram(plantedEdgesFrame(s, dir))),
    // bipartite (user, item-k) co-visitation projection: the related-items
    // graph + exact-integer Jaccard affinity. Uncapped here — the item
    // space bounds the output; the hub-user skew cap is the 100 TB contract
    // (spec- and smoke-exercised, same shape as the dedup caps)
    "graph_covisit" -> ((s, dir) => {
      val ev = Points.table(s, dir, "events").select(col("user_id").as("user"),
        expr("CAST(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS BIGINT)").as("item"))
      graft.operators.Graph.covisitation(ev)
    }),
    // hard triplet mining: per sampled anchor the worst-separated positive
    // and most-confused negative, margin < 0 = active violation
    "embed_triplets" -> ((s, dir) => Similarity.hardTriplets(emb(s, dir))),
    // exact phrase retrieval: positional index + the anchor-alignment
    // count (one join + one aggregate at any phrase length — the in-order
    // adjacency semantics bag-of-words BM25 cannot express)
    "search_phrase" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Search.phraseHitsFromPositions(
        probePositions(s, dir), probeQueriesFrame(s, dir))
    }),
    // 3-hop BFS reachability histogram from the trustrank seed pair:
    // synchronous frontier expansion, min-hop levels — the blast-radius view
    "graph_khop" -> ((s, dir) => {
      val seeds = docs(s, dir).sparkSession.range(2)
        .select(concat(lit("site"), col("id").cast("string")).as("domain"))
      graft.operators.Graph.khopReach(plantedEdgesFrame(s, dir), seeds)
    }),
    // synchronous label-propagation communities (4 rounds, count-desc /
    // label-asc ties): the mesoscale split of the one giant planted
    // component into link neighborhoods — bit-exact vs the unrolled replay
    "graph_lpa" -> ((s, dir) =>
      graft.operators.Graph.labelPropagation(plantedEdgesFrame(s, dir), rounds = 4)),
    // bounded harmonic centrality (3 hops, lcm-60 exact integer scores):
    // the distance-aware importance the random-walk family doesn't measure
    "graph_harmonic" -> ((s, dir) =>
      graft.operators.Graph.harmonicCentrality(plantedEdgesFrame(s, dir))),
    // Newman-Girvan modularity of the LPA partition: are the communities
    // real structure or random chance — the quality number for graph_lpa
    "graph_modularity" -> ((s, dir) =>
      graft.operators.Graph.modularity(plantedEdgesFrame(s, dir), rounds = 4)),
    // Freeman degree centralization: the one-number star-vs-mesh shape test
    // (1 = hub-and-spokes link farm, 0 = every domain equal)
    "graph_centralization" -> ((s, dir) =>
      graft.operators.Graph.degreeCentralization(plantedEdgesFrame(s, dir))),
    // degree assortativity: Pearson over endpoint degrees, both
    // orientations — exact DECIMAL moment sums, one pinned double formula;
    // the one-number structural fingerprint per crawl snapshot
    "graph_assortativity" -> ((s, dir) =>
      graft.operators.Graph.assortativity(plantedEdgesFrame(s, dir))),
    "graph_components" -> ((s, dir) => {
      val d = docs(s, dir)
      val web = d.where(col("doc_id") % 2 === 0).select(
        concat(lit("site"), (col("doc_id") % 7).cast("string")).as("src"),
        concat(lit("cdn"), (col("doc_id") % 3).cast("string")).as("dst"))
      val isle = d.where(col("doc_id") % 2 === 1).select(
        concat(lit("isle"), (col("doc_id") % 4).cast("string")).as("src"),
        concat(lit("isle"), ((col("doc_id") + 1) % 4).cast("string")).as("dst"))
      val comps = graft.operators.Graph.components(web.union(isle))
      val sizes = comps.groupBy("component_id").agg(count(lit(1)).as("n_domains"))
      comps.join(sizes, Seq("component_id"))
        .select(col("domain"), col("component_id"), col("n_domains"))
    }),
    // top principal component of the embedding covariance: exact grid
    // moments -> n²-scaled scatter matrix (no division) -> 8 fixed-point
    // power iterations with sign-split round-toward-zero renorms — the
    // drift-direction audit, bit-exact vs the unrolled SQL replay
    "embed_top_pc" -> ((s, dir) => topPcFrame(s, dir)),
    // variance explained by the top PC: exact fixed-point projection
    // moments over the SHARED memoized component frame + the dimStats
    // total-variance fold — the one-number collapse verdict
    "embed_pc_var" -> ((s, dir) =>
      Similarity.pcVarianceExplained(emb(s, dir), topPcFrame(s, dir))),
    // per-vector coordinate along the top PC — the drift score a monitoring
    // job histograms over time; exact DECIMAL dot with the fixed-point
    // component (the SHARED memoized frame), sign-split floor division
    "embed_pc_project" -> ((s, dir) =>
      Similarity.pcProjectionFrom(emb(s, dir), topPcFrame(s, dir))),
    // int8 reconstruction-error audit: per-vector dequantization MSE and
    // max abs error — the serving-precision twin of the recall audits
    "embed_quantize_error" -> ((s, dir) =>
      Similarity.quantizeError(emb(s, dir))),
    // parametric OOD: diagonal-Mahalanobis distance from the per-dim corpus
    // Gaussian (exact-grid moments), same corruption plant as the norm
    // screen — catches the zeroed vectors the norm screen must infer
    "embed_mahalanobis" -> ((s, dir) => {
      val e = emb(s, dir)
      val planted = e.select(col("vec_id"),
        when(col("vec_id") % 97 === 0,
          transform(col("embedding"), _ => lit(0.0f)))
          .when(col("vec_id") % 50 === 0,
            transform(col("embedding"), v => (v * lit(3.0f)).cast("float")))
          .otherwise(col("embedding")).as("embedding"))
      Similarity.mahalanobisDiag(planted)
    }),
    // row-level embedding health: norm outliers vs the corpus mean squared
    // grid norm, over planted corruption (every 50th vector scaled 3x =
    // exploding norm, every 97th zeroed = dead input)
    "embed_norm_outliers" -> ((s, dir) => {
      val e = emb(s, dir)
      val planted = e.select(col("vec_id"),
        when(col("vec_id") % 97 === 0,
          transform(col("embedding"), _ => lit(0.0f)))
          .when(col("vec_id") % 50 === 0,
            transform(col("embedding"), v => (v * lit(3.0f)).cast("float")))
          .otherwise(col("embedding")).as("embedding"))
      Similarity.normOutliers(planted)
    }),
    // cross-source duplication overlap over a planted-neighbor corpus (every
    // 10th doc carries its predecessor's text, which lives in the adjacent
    // source): distinct shared content hashes per unordered source pair
    "curate_source_overlap" -> ((s, dir) => {
      val d = docs(s, dir)
      val nb = d.select((col("doc_id") + 1).as("doc_id"), col("text").as("ntext"))
      val planted = d.join(nb, Seq("doc_id"), "left").select(col("doc_id"),
        when(col("doc_id") % 10 === 0 && col("ntext").isNotNull, col("ntext"))
          .otherwise(col("text")).as("text"),
        col("source"))
      graft.operators.Curation.sourceOverlap(planted)
    }),
    // IVF clustering-quality audit: per-list member count, distinct labels,
    // majority label and purity — the structural predictor of ANN recall
    "embed_label_purity" -> ((s, dir) =>
      graft.operators.SimilarityIvf.cellPurity(emb(s, dir))),
    // the composed per-doc KEEP DECISION TABLE: every screen's verdict +
    // one conjunction + the failed-screen bitmask (encoding=1, gopher=2,
    // code=4, duplicate=8, contaminated=16) — the auditable drop-reason
    // shape a production pipeline ships
    "curate_keep_reasons" -> ((s, dir) => {
      // the fuzzy-dedup plant (every 10th doc = shouty variant of its
      // predecessor) so the duplicate bit actually fires alongside the
      // gopher/contamination bits
      val d = docs(s, dir)
      val nb = d.select((col("doc_id") + 1).as("doc_id"), col("text").as("ntext"))
      // persisted: the planted frame is a docs self-join and keepReasons'
      // five screens each re-executed it (18 corpus scans in the gate's
      // physical plan; 2 after) — evicted by clearCache like every memo
      val planted = repersist(d.join(nb, Seq("doc_id"), "left").select(col("doc_id"),
        when(col("doc_id") % 20 === 0 && col("ntext").isNotNull,
          concat(upper(regexp_replace(col("ntext"), " ", "  ")), lit(" !!!")))
          .otherwise(col("text")).as("text")))
      graft.operators.Curation.keepReasons(planted,
        planted.where(col("doc_id") % 10 === 0))
    }),
    // the decontamination DROP step over the contamination gate's fixture
    // (probes = every 10th doc): per-doc audit + keep flag
    "curate_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Curation.decontamFilter(d, d.where(col("doc_id") % 10 === 0))
    }),
    // Retrieval-quality eval of the BM25 ranker against prefix-share ground
    // truth (docs opening with the query's exact four words are "relevant"):
    // per-query MRR / nDCG@10 with frozen decimal DCG weights
    "search_eval" -> ((s, dir) => {
      val d = docs(s, dir)
      val prefix = array_join(slice(split(col("text"), " "), 1, 4), " ")
      val qrels = d.select(col("doc_id"), prefix.as("p"))
        .join(broadcast(probeQueriesFrame(s, dir)), col("p") === col("qtext"))
        .select(col("query_id"), col("doc_id"))
      graft.operators.Search.evalReport(
        bm25Hits15(s, dir).where(col("rank") <= 10), qrels, k = 10)
    }),
    // per-source token-length distribution (exact nearest-rank percentiles):
    // the audit behind packing / truncation decisions
    "curate_length_report" -> ((s, dir) =>
      graft.operators.Curation.lengthReport(docs(s, dir))),
    // reproducible global training order: salted-md5 key -> shard + position
    // (same salt = same order on any cluster; new salt = epoch permutation)
    "curate_shuffle_order" -> ((s, dir) =>
      graft.operators.Curation.shuffleOrder(docs(s, dir))),
    // pseudo-relevance-feedback expansion: top-3 feedback docs contribute
    // their 2 strongest new terms, then a full re-rank with the expanded
    // queries — feedback comes from the family's shared candidate fetch
    "search_prf" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Search.prfExpandFromPostings(
        d, Some((probePostings(s, dir), corpusStatsFrame(s, dir))),
        probeQueriesFrame(s, dir), bm25Hits15(s, dir).where(col("rank") <= 3),
        r = 3, m = 2, k = 10)
    }),
    // MMR-diversified top-5 over the shared BM25 candidate fetch: greedy
    // λ·rel − (1−λ)·max-cosine-to-selected against the corpus embeddings
    // (vec_id aligns with doc_id in the synthetic corpus, as in hybrid RRF)
    "search_mmr" -> ((s, dir) =>
      graft.operators.Search.mmrSelect(bm25Hits15(s, dir), emb(s, dir), k = 5)),
    // the composition the Graph family exists for: domain authority (a
    // 3-iteration PageRank over the planted link structure) joined with the
    // per-doc quality score into one curation prior, quality x domain_rank
    "curate_domain_prior" -> ((s, dir) => {
      val d = docs(s, dir)
      val ranks = graft.operators.Graph.pageRank(plantedEdges(d, full = false), iters = 3)
      val quality = TextAnalysis.qualityScore(d).select(col("doc_id"), col("quality"))
      d.select(col("doc_id"),
          concat(lit("site"), (col("doc_id") % 7).cast("string")).as("domain"))
        .join(broadcast(ranks), Seq("domain"))
        .join(quality, Seq("doc_id"))
        .select(col("doc_id"), col("domain"), col("rank_fp"), col("quality"),
          (col("quality") * col("rank")).as("prior"))
    }),
    // document-level template detector: fraction of a doc's distinct
    // 8-grams occurring in NO other doc (the corpus' own dups pull shared
    // grams' df above 1, so novelty discriminates without planting)
    "text_ngram_novelty" -> ((s, dir) => TextAnalysis.ngramNovelty(docs(s, dir))),
    // code-vs-prose routing over planted code blocks: every 9th doc gets a
    // function body (symbols + two indented lines) appended — the flag must
    // fire on both tells, prose stays prose
    "text_code_detect" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 9 === 0,
          concat(col("text"),
            lit("\nfunction f(a) { return a[0]; }\n  indented(a, b);\n\tcall();")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.codeDetect(planted)
    }),
    // encoding-artifact screen over planted corruption: every 7th doc gets
    // a latin1-mojibake word, every 13th a â€™-style curly quote, every
    // 17th a U+FFFD replacement char — the gate pins both detector classes
    // and the keep flag
    "text_mojibake" -> ((s, dir) => {
      val d = docs(s, dir)
      val planted = d.select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          regexp_replace(col("text"), "^([a-z0-9]+) ", "$1 cafÃ© "))
          .when(col("doc_id") % 13 === 0, concat(col("text"), lit(" donâ€™t")))
          .when(col("doc_id") % 17 === 0, concat(col("text"), lit(" bad�byte")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.mojibakeStats(planted)
    }),
    // the COMPOSED pipeline keep table: quality screen -> exact dedup (over
    // the every-10th-doc duplicate plant) -> per-source cap -> global token
    // budget, one auditable flag per stage — pins stage COMPOSITION, not
    // just each separately-gated screen
    "curate_pipeline_keep" -> ((s, dir) => {
      val d = docs(s, dir)
      val nb = d.select((col("doc_id") + 1).as("doc_id"), col("text").as("ntext"))
      // no gate-side persist needed: pipelineKeep's cached base projection
      // is the plant's single reader, so the self-join executes once
      val planted = d.join(nb, Seq("doc_id"), "left").select(col("doc_id"),
        when(col("doc_id") % 10 === 0 && col("ntext").isNotNull, col("ntext"))
          .otherwise(col("text")).as("text"),
        col("source"))
      graft.operators.Curation.pipelineKeep(planted,
        minQuality = 0.3, capPerSource = 15, budgetWords = 8000L)
    }),
    // source-interleaved training order: per-source salted permutation
    // landed on the r*S + idx slot grid — consecutive rows cycle sources
    "curate_interleave" -> ((s, dir) =>
      graft.operators.Curation.interleaveOrder(docs(s, dir))),
    // split-balance QA: per-split doc/token counts and shares — did the
    // hash split actually come out 80/10/10
    "curate_split_report" -> ((s, dir) =>
      graft.operators.Curation.splitReport(docs(s, dir))),
    // casing profile over planted shouting (every 19th doc upper-cased):
    // the headline/spam screen punctuation bands miss
    "text_casing" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 19 === 0, upper(col("text")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.casingProfile(planted)
    }),
    // per-source vocabulary drift (Jensen-Shannon vs the corpus head) over
    // a planted stopword-flooded source — the mix-health monitor
    "text_vocab_drift" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"), col("source"),
        when(col("source") === "src3", concat(col("text"),
          lit(" the the the the the the the the the the")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.vocabDrift(planted)
    }),
    // per-doc language mixture over a planted code-switching corpus (every
    // 11th doc gets a Spanish stopword run): four lexicon counts, primary
    // guess, and the mixed flag the winner-takes-all langid hides
    "text_lang_mix" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"),
          lit(" el la los las y de que no se una por con para")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.langMix(planted)
    }),
    // char-bigram entropy over a planted template loop (every 37th doc
    // becomes "abab…"): sequence-structure gibberish the unigram histogram
    // can't see — quantized-ln exact sums, the hourEntropy idiom
    "text_bigram_entropy" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 37 === 0, lit("ab" * 100))
          .otherwise(col("text")).as("text"))
      TextAnalysis.bigramEntropy(planted)
    }),
    // OCR-artifact screen over planted scan damage: every 23rd doc a
    // hyphenated line-break split, every 29th three digit-confused tokens,
    // every 31st a single-char token spray — each tell fires its own column
    "text_ocr_artifacts" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 23 === 0,
          concat(col("text"), lit("\nhyphen-\nated continuation")))
          .when(col("doc_id") % 29 === 0, concat(col("text"), lit(" w0rd t3xt c0de")))
          .when(col("doc_id") % 31 === 0,
            concat(col("text"), lit(" a b c d e f g h i j k l m n o p q r s t u v w x y z")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.ocrArtifacts(planted)
    }),
    // per-source PII exposure rollup over the redaction audit counters:
    // every 4th doc plants an email, every 6th an IPv4, every 10th a phone
    "curate_pii_report" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0, concat(lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 6 === 0, concat(lit(" from 10.0."),
            (col("doc_id") % 256).cast("string"), lit(".7"))).otherwise(lit("")),
          when(col("doc_id") % 10 === 0, concat(lit(" tel +1 555 01"),
            (col("doc_id") % 90 + 10).cast("string"))).otherwise(lit("")))
          .as("text"))
      graft.operators.Curation.piiReport(planted)
    }),
    // sentence segmentation stats over planted terminal punctuation (a
    // period after every 5-word run): the prose-structure quality signal
    "text_sentences" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        regexp_replace(col("text"),
          "([a-z0-9]+ [a-z0-9]+ [a-z0-9]+ [a-z0-9]+ [a-z0-9]+) ", "$1. ").as("text"))
      TextAnalysis.sentenceStats(planted)
    }),
    // Flesch-style readability over the same planted-punctuation corpus:
    // vowel-group syllable proxy + terminal-punctuation sentences, one
    // pinned-order double formula — the surface-form quality axis
    "text_readability" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        regexp_replace(col("text"),
          "([a-z0-9]+ [a-z0-9]+ [a-z0-9]+ [a-z0-9]+ [a-z0-9]+) ", "$1. ").as("text"))
      TextAnalysis.readability(planted)
    }),
    // TF-IDF top-3 characteristic terms per document: the model-free
    // per-doc topic signal; tf·ln(n_docs/df) quantized DECIMAL(28,9),
    // term tie-break — the BM25 scoring idiom on the whitespace tokens
    "text_keywords" -> ((s, dir) =>
      TextAnalysis.tfidfKeywords(docs(s, dir), k = 3)),
    // char-histogram diversity screen (gibberish / one-char spam / base64
    // tells): exact LONG histogram moments from one native codegen pass,
    // ratios as single IEEE divisions — a char-exploding oracle matches
    "text_char_diversity" -> ((s, dir) =>
      TextAnalysis.charDiversity(docs(s, dir))),
    // corpus collocations ranked by PMI lift c12·N/(c1·c2) (log-free PMI
    // order): exact integer counts, minCount floor before the joins,
    // k-bounded TakeOrdered finish
    "text_pmi_bigrams" -> ((s, dir) =>
      TextAnalysis.pmiBigrams(docs(s, dir), minCount = 5L, topK = 100)),
    // dimension-truncation (Matryoshka) recall audit: truncated-cosine
    // top-k vs full-dim top-k per probe query, exact matched fractions —
    // the "can we serve 8/16/32-dim vectors" decision number
    "embed_trunc_recall" -> ((s, dir) =>
      Similarity.truncRecall(emb(s, dir), dims = Seq(8, 16, 32), k = 10,
        probeMod = 20L)),
    // one-pass column profiler over documents: every stat for every column
    // folds in ONE aggregate over one scan — the schema-drift audit
    "profile_documents" -> ((s, dir) =>
      graft.operators.Profiling.columnProfile(docs(s, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))),
    // the same profiler over the events fact columns (ts excluded: its
    // epoch representation differs by engine, not a profiler concern)
    "profile_events" -> ((s, dir) =>
      graft.operators.Profiling.columnProfile(Points.table(s, dir, "events"),
        Seq("event_id", "user_id", "event_type", "value", "props"))),
    // Zipf-law fit over the top-200 word-frequency head: quantized-ln OLS,
    // the one-number natural-language fingerprint per corpus snapshot
    "text_zipf" -> ((s, dir) => TextAnalysis.zipfSlope(docs(s, dir), topN = 200)),
    // Heaps'-law vocabulary growth per source: two-point beta fit between
    // a deterministic md5 half-sample and the full source — the tokenizer-
    // vocabulary / dedup-cap sizing exponent (beta -> 1 = id-like novelty)
    "text_heaps" -> ((s, dir) => TextAnalysis.heapsLaw(docs(s, dir))),
    // proximity (NEAR/6) retrieval: probe terms 1+4 of every 97th doc,
    // pairwise min-gap <= 6 over the query-filtered positional index —
    // the order-free slop sibling of search_phrase
    "search_proximity" -> ((s, dir) => {
      val d = docs(s, dir)
      val ws = split(col("text"), " ")
      val q = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", element_at(ws, 1), element_at(ws, 4)).as("qtext"))
      // terms are words 1 and 4 — inside the probe 4-word prefix, so the
      // SHARED positional fetch covers them
      graft.operators.Search.proximityHitsFromPositions(
        probePositions(s, dir), q, window = 6, k = 10)
    }),
    // "did you mean" spell suggestion: word 2 of every 97th doc with its
    // last char typo'd to 'z', corrected from the corpus vocabulary via
    // (first-char, length-band) blocked edit-distance-1 candidates ranked
    // by corpus frequency
    "search_spell_suggest" -> ((s, dir) => {
      val d = docs(s, dir)
      val w2 = "element_at(split(text, ' '), 2)"
      val q = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          expr(s"concat(substring($w2, 1, length($w2) - 1), 'z')").as("qterm"))
      graft.operators.Search.spellSuggest(d, q)
    }),
    // spell suggest over the MAINTAINED vocabulary: vb-bucket-pruned read
    // of the additive count store — same full-corpus oracle
    "search_spell_store" -> ((s, dir) => {
      val d = docs(s, dir)
      val w2 = "element_at(split(text, ' '), 2)"
      val q = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          expr(s"concat(substring($w2, 1, length($w2) - 1), 'z')").as("qterm"))
      graft.tools.Maintenance.spellMaintained(s, vocabStoreDir(s, dir), q)
    }),
    // VOCAB RETENTION: retirement = the dropped docs' counts appended
    // NEGATED through the same pass protocol, merge-compaction reclaims —
    // the oracle recomputes the vocab over only the surviving corpus
    "search_spell_ageoff" -> ((s, dir) => {
      val d = docs(s, dir)
      val w2 = "element_at(split(text, ' '), 2)"
      val q = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          expr(s"concat(substring($w2, 1, length($w2) - 1), 'z')").as("qterm"))
      graft.tools.Maintenance.spellMaintained(s, agedVocabDir(s, dir), q)
    }),
    // license/copyright screen over planted boilerplate: every 13th doc a
    // dated copyright + rights line, every 21st a license grant
    "text_license_screen" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"),
          lit(" copyright 2021 example corp. all rights reserved.")))
          .when(col("doc_id") % 21 === 0, concat(col("text"),
            lit(" licensed under the apache license, version 2.0")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.licenseScreen(planted)
    }),
    // boolean (all-MUST + NOT) retrieval: the probe's four words as the
    // conjunction, its own 6th word as the exclusion — so each probe doc
    // excludes ITSELF, the planted tell that the NOT screen actually fires
    "search_boolean" -> ((s, dir) => {
      val d = docs(s, dir)
      val ws = split(col("text"), " ")
      val q = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(ws, 1, 4), " ").as("qtext"),
          element_at(ws, 6).as("nottext"))
      graft.operators.Search.booleanHitsFromPositions(probePositions(s, dir), q)
    }),
    // best-snippet extraction over the probe queries: per qualifying
    // (all-terms) doc the 12-token window covering the most distinct query
    // terms, earliest on ties — the highlighting/RAG-span primitive
    "search_snippets" -> ((s, dir) => bestSnippetsFrame(s, dir)),
    // Spearman rank agreement between the lexical and semantic rankers over
    // their shared top-15 candidates: rho near 1 says hybrid fusion adds
    // nothing, rho near 0 says the systems see different relevance
    "search_rank_corr" -> ((s, dir) => {
      val e = emb(s, dir)
      val sem = Similarity.bruteForceKnn(e, e.where(col("vec_id") % 97 === 0), k = 15)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      graft.operators.Search.rankCorrelation(
        bm25Hits15(s, dir).select(col("query_id"), col("doc_id"), col("rank")), sem)
    }),
    // vocabulary-coverage sizing: distinct words needed to cover 50/90/99%
    // of token mass — the tokenizer-vocab budget curve, exact integers
    "text_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(docs(s, dir))),
    // the rendered snippet STRING: best-window offsets joined back to the
    // case-preserving text and sliced — what a results page actually shows
    "search_highlight" -> ((s, dir) =>
      graft.operators.Search.snippetTextFrom(
        bestSnippetsFrame(s, dir), docs(s, dir), window = 12))
  )

  /** The planted hyperlink structure shared by the Graph-family gates:
    * site{d%7} -> cdn{d%3}, cdn{d%3} -> site{d%5}; the full variant adds
    * site-to-site edges on even ids and a dangling 'sink' on every 11th. */
  private def plantedEdges(d: DataFrame, full: Boolean): DataFrame = {
    def site(c: org.apache.spark.sql.Column) = concat(lit("site"), c.cast("string"))
    def cdn(c: org.apache.spark.sql.Column) = concat(lit("cdn"), c.cast("string"))
    val base = d
      .select(site(col("doc_id") % 7).as("src"), cdn(col("doc_id") % 3).as("dst"))
      .union(d.select(cdn(col("doc_id") % 3).as("src"), site(col("doc_id") % 5).as("dst")))
    if (!full) base
    else base
      .union(d.where(col("doc_id") % 2 === 0)
        .select(site(col("doc_id") % 7).as("src"), site((col("doc_id") + 3) % 7).as("dst")))
      .union(d.where(col("doc_id") % 11 === 0)
        .select(site(col("doc_id") % 7).as("src"), lit("sink").as("dst")))
  }

  /** Incoming side of the bloom gates: every 10th doc, half of them (every
    * 20th) carrying a NEIGHBOR's text — planted true duplicates against the
    * existing (non-10th) corpus. Shared by both bloom gates so their
    * fixtures cannot drift. */
  private def bloomIncoming(d: DataFrame): DataFrame =
    d.where(col("doc_id") % 10 === 0)
      .join(d.select((col("doc_id") - 1).as("doc_id"), col("text").as("btext")), "doc_id")
      .select(col("doc_id"),
        when(col("doc_id") % 20 === 0, col("btext")).otherwise(col("text")).as("text"))

  // ---------------------------------------------------------------------------
  // DuckDB oracles. Shared fragments keep the two engines' expressions aligned.
  // ---------------------------------------------------------------------------

  /** Unrolled DuckDB replay of [[TextAnalysis.bpeTrain]]: one (pair-count,
    * top-1, rewrite) CTE triple per round over the word-frequency table. */
  /** One (pair-count, top-1, rewrite) CTE triple per training round. */
  private def bpeRoundsSql(iters: Int): Seq[String] = (1 to iters).map { i =>
    val prev = s"w${i - 1}"
    s"""p$i AS (SELECT ws[j] || ' ' || ws[j+1] AS p, CAST(SUM(freq) AS BIGINT) AS cnt
       |      FROM (SELECT string_split(sym, ' ') AS ws, freq FROM $prev),
       |           LATERAL (SELECT UNNEST(range(1, len(ws))) AS j) t
       |      GROUP BY 1),
       |t$i AS (SELECT p, cnt FROM p$i ORDER BY cnt DESC, p LIMIT 1),
       |w$i AS (SELECT trim(replace(replace(' ' || replace($prev.sym, ' ', '  ') || ' ',
       |        ' ' || replace(t$i.p, ' ', '  ') || ' ',
       |        ' ' || replace(t$i.p, ' ', '') || ' '), '  ', ' ')) AS sym, freq
       |      FROM $prev, t$i)""".stripMargin
  }

  private def bpeOracleSql(iters: Int): String = {
    val selects = (1 to iters)
      .map(i => s"SELECT CAST($i AS BIGINT) AS iter, p AS pair, cnt FROM t$i")
    s"""WITH ${bpeCtes(bpeRoundsSql(iters))}
       |${selects.mkString("\nUNION ALL ")}""".stripMargin
  }

  /** Shared CTE prefix of the BPE oracles: the word-frequency table plus the
    * unrolled training rounds. */
  private def bpeCtes(rounds: Seq[String]): String =
    s"""w0 AS (
       |  SELECT array_to_string(string_split(word, ''), ' ') || ' </w>' AS sym,
       |         CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY 1),
       |${rounds.mkString(",\n")}""".stripMargin

  /** Encode replay: re-derive the trained vocabulary, recover each word from
    * its symbol string (spaces out, trailing `</w>` off — a bijection), and
    * join the documents' words to their symbol counts. */
  private def bpeEncodeOracleSql(iters: Int): String = {
    val rounds = bpeRoundsSql(iters)
    s"""WITH ${bpeCtes(rounds)},
       |v AS (SELECT substring(replace(sym, ' ', ''), 1, length(replace(sym, ' ', '')) - 4) AS word,
       |             CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sym FROM w$iters),
       |u AS (SELECT doc_id, word FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
       |      WHERE length(word) > 0)
       |SELECT doc_id, CAST(SUM(n_sym) AS BIGINT) AS n_tokens_bpe_trained,
       |       CAST(COUNT(*) AS BIGINT) AS n_words
       |FROM u JOIN v USING (word) GROUP BY 1""".stripMargin
  }

  private val Shingles =
    """SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      |       UNNEST(range(1, len(ws) - 1)) AS t(i)""".stripMargin

  private def hitsSql(lang: String): String = {
    val lst = TextAnalysis.Stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(lower(text), ' '), w -> w IN ($lst)))"
  }

  /** Per-doc (n_words, quality, lang_guess) — the exact text_quality /
    * text_langid expressions, joined; feeds the curation oracles. */
  private def scoredSql: String =
    s"""q AS (
       |  SELECT doc_id,
       |         len(string_split(text, ' ')) AS n_words,
       |         LEAST(1.0, len(string_split(text, ' ')) / 100.0)
       |               * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 1.0 / length(text))
       |               * LEAST(1.0, 4.0 * ${hitsSql("en")} / len(string_split(lower(text), ' ')) + 0.5) AS quality
       |  FROM documents),
       |l AS (
       |  SELECT doc_id,
       |         CASE WHEN h_de >= GREATEST(h_en, h_es, h_fr) THEN 'de'
       |              WHEN h_en >= GREATEST(h_es, h_fr) THEN 'en'
       |              WHEN h_es >= h_fr THEN 'es'
       |              ELSE 'fr' END AS lang_guess
       |  FROM (SELECT doc_id, ${hitsSql("de")} AS h_de, ${hitsSql("en")} AS h_en,
       |               ${hitsSql("es")} AS h_es, ${hitsSql("fr")} AS h_fr FROM documents)),
       |s AS (SELECT q.doc_id, q.n_words, q.quality, l.lang_guess
       |      FROM q JOIN l ON q.doc_id = l.doc_id)""".stripMargin

  /** Gate weight table for curate_epoch_mix: src0..src19 with relative
    * shares cycling 1..4 (x200 bp each), summing to exactly 10000. */
  private val EpochMixWeights: Map[String, Long] =
    (0 until 20).map(n => s"src$n" -> ((n % 4 + 1) * 200L)).toMap

  private val MinhashSql = {
    val mins = (0 until 8).map(k => s"MIN(md5('$k:' || s)) AS mh$k").mkString(", ")
    s"SELECT doc_id, $mins FROM ($Shingles) GROUP BY doc_id"
  }

  /** Batch MinHash-LSH candidate oracle over the full corpus — shared by
    * `dedup_minhash_lsh` and `dedup_lsh_store` (the maintained signature
    * store's bootstrap ∪ increment screens must union to exactly this). */
  private val MinhashLshOracleSql =
    s"""WITH mh AS ($MinhashSql),
       |bands AS (
       |  SELECT doc_id, b, key FROM mh, LATERAL (VALUES
       |    (0, mh0 || mh1), (1, mh2 || mh3), (2, mh4 || mh5), (3, mh6 || mh7)) AS v(b, key)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT cand.a, cand.b,
       |       ((x.mh0 = y.mh0)::INT + (x.mh1 = y.mh1)::INT + (x.mh2 = y.mh2)::INT
       |            + (x.mh3 = y.mh3)::INT + (x.mh4 = y.mh4)::INT + (x.mh5 = y.mh5)::INT
       |            + (x.mh6 = y.mh6)::INT + (x.mh7 = y.mh7)::INT) / 8.0 AS est_jaccard
       |FROM cand JOIN mh x ON cand.a = x.doc_id JOIN mh y ON cand.b = y.doc_id""".stripMargin

  /** tf-idf (SMART lnc.ltn) top-10 oracle — shared by `search_tfidf` and
    * `search_tfidf_store`: the maintained read's norms come from the index
    * sidecar instead of a corpus scan, but norm² is an exact decimal sum of
    * the identical per-(doc,term) squares, so both routes must hash-match
    * this one oracle. */
  private val TfidfLncLtnOracleSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |q AS (SELECT doc_id AS query_id, array_to_string((string_split(text, ' '))[1:4], ' ') AS qtext
      |      FROM documents WHERE doc_id % 97 = 0),
      |qt AS (SELECT DISTINCT query_id, term
      |       FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q)),
      |dt AS (SELECT doc_id, unnest(ws) AS term FROM w),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM dt GROUP BY 1, 2),
      |m AS (SELECT qt.query_id, tf.doc_id, tf.term, tf.tf FROM tf JOIN qt USING (term)),
      |dfq AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT term, doc_id FROM m) GROUP BY 1),
      |st AS (SELECT COUNT(*) AS n_docs FROM w),
      |md AS (SELECT DISTINCT doc_id FROM m),
      |nrm AS (SELECT tf.doc_id,
      |               SUM(CAST(((CAST(1.0 AS DOUBLE) + ln(CAST(tf.tf AS DOUBLE)))
      |                         * (CAST(1.0 AS DOUBLE) + ln(CAST(tf.tf AS DOUBLE)))) AS DECIMAL(28,9))) AS norm2
      |        FROM tf JOIN md USING (doc_id) GROUP BY 1),
      |c AS (SELECT m.query_id, m.doc_id,
      |             CAST(((CAST(1.0 AS DOUBLE) + ln(CAST(m.tf AS DOUBLE)))
      |                   * ln(CAST(st.n_docs AS DOUBLE) / dfq.df)) AS DECIMAL(28,9)) AS c
      |      FROM m JOIN dfq USING (term) CROSS JOIN st),
      |sc AS (SELECT query_id, doc_id, SUM(c) AS num, CAST(COUNT(*) AS BIGINT) AS n_terms
      |       FROM c GROUP BY 1, 2),
      |s2 AS (SELECT sc.query_id, sc.doc_id, sc.n_terms,
      |              CAST(sc.num AS DOUBLE) / sqrt(CAST(n.norm2 AS DOUBLE)) AS score
      |       FROM sc JOIN nrm n USING (doc_id))
      |SELECT query_id, rank, doc_id, score, n_terms FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      |  FROM s2)
      |WHERE rank <= 10""".stripMargin

  /** Exact-phrase (anchor-alignment) oracle — shared by `search_phrase`
    * and `search_phrase_store`: the maintained read explodes the persisted
    * per-(doc, word) position arrays back to the identical positional
    * frame, so both routes must hash-match one oracle. */
  private val PhraseAnchorOracleSql =
    """WITH dw AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      |w AS (SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, UNNEST(ws) AS w FROM dw),
      |qd AS (SELECT doc_id AS query_id,
      |              list_transform(string_split(text, ' ')[1:4], x -> lower(x)) AS qs
      |       FROM documents WHERE doc_id % 97 = 0),
      |q AS (SELECT query_id, generate_subscripts(qs, 1) - 1 AS qpos, UNNEST(qs) AS w FROM qd),
      |qn AS (SELECT query_id, CAST(COUNT(DISTINCT qpos) AS BIGINT) AS n_terms FROM q GROUP BY 1),
      |m AS (SELECT q.query_id, w.doc_id, w.pos - q.qpos AS anchor,
      |             CAST(COUNT(DISTINCT q.qpos) AS BIGINT) AS k
      |      FROM w JOIN q ON w.w = q.w GROUP BY 1, 2, 3)
      |SELECT m.query_id, m.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
      |FROM m JOIN qn ON m.query_id = qn.query_id
      |WHERE m.k = qn.n_terms
      |GROUP BY 1, 2""".stripMargin

  /** NEAR/6 proximity oracle — shared by `search_proximity` and
    * `search_proximity_store`. */
  private val ProximityNearOracleSql =
    """WITH dw AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      |w AS (SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, UNNEST(ws) AS w FROM dw),
      |qd AS (SELECT doc_id AS query_id,
      |              concat_ws(' ', string_split(text, ' ')[1], string_split(text, ' ')[4]) AS qtext
      |       FROM documents WHERE doc_id % 97 = 0),
      |qt AS (SELECT query_id, UNNEST(list_distinct(string_split(lower(qtext), ' '))) AS w
      |       FROM qd),
      |qn AS (SELECT query_id, COUNT(*) AS n_terms FROM qt GROUP BY 1),
      |m AS (SELECT qt.query_id, w.doc_id, w.pos, qt.w FROM w JOIN qt ON w.w = qt.w),
      |g AS (SELECT x.query_id, x.doc_id, x.w AS wa, y.w AS wb,
      |             MIN(abs(x.pos - y.pos)) AS gap
      |      FROM m x JOIN m y
      |        ON x.query_id = y.query_id AND x.doc_id = y.doc_id AND x.w < y.w
      |      GROUP BY 1, 2, 3, 4),
      |pd AS (SELECT query_id, doc_id, COUNT(*) AS n_pairs,
      |              CAST(MAX(gap) AS BIGINT) AS max_gap
      |       FROM g WHERE gap <= 6 GROUP BY 1, 2),
      |r AS (SELECT pd.query_id, pd.doc_id, pd.max_gap,
      |             CAST(ROW_NUMBER() OVER (PARTITION BY pd.query_id
      |                    ORDER BY pd.max_gap ASC, pd.doc_id ASC) AS BIGINT) AS rank
      |      FROM pd JOIN qn ON pd.query_id = qn.query_id
      |      WHERE pd.n_pairs = qn.n_terms * (qn.n_terms - 1) // 2)
      |SELECT query_id, rank, doc_id, max_gap FROM r WHERE rank <= 10""".stripMargin

  /** Best-snippet-window oracle (window=12, coverage-DESC/start-ASC argmax)
    * — shared by `search_snippets` and `search_snippets_store`. */
  private val SnippetsBestWindowOracleSql =
    """WITH dw AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      |w AS (SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, UNNEST(ws) AS w FROM dw),
      |qd AS (SELECT doc_id AS query_id,
      |              list_transform(string_split(text, ' ')[1:4], x -> lower(x)) AS qs
      |       FROM documents WHERE doc_id % 97 = 0),
      |qt AS (SELECT query_id, UNNEST(list_distinct(qs)) AS w FROM qd),
      |qn AS (SELECT query_id, COUNT(*) AS n_terms FROM qt GROUP BY 1),
      |m AS (SELECT qt.query_id, w.doc_id, w.pos, qt.w FROM w JOIN qt ON w.w = qt.w),
      |qual AS (SELECT d.query_id, d.doc_id
      |         FROM (SELECT DISTINCT query_id, doc_id, w FROM m) d
      |         JOIN qn ON d.query_id = qn.query_id
      |         GROUP BY d.query_id, d.doc_id, qn.n_terms
      |         HAVING COUNT(*) = qn.n_terms),
      |mq AS (SELECT m.* FROM m JOIN qual
      |       ON m.query_id = qual.query_id AND m.doc_id = qual.doc_id),
      |cov AS (SELECT a.query_id, a.doc_id, a.pos AS snip_start,
      |               CAST(COUNT(DISTINCT mm.w) AS BIGINT) AS n_covered
      |        FROM mq a JOIN mq mm
      |          ON a.query_id = mm.query_id AND a.doc_id = mm.doc_id
      |         AND mm.pos >= a.pos AND mm.pos < a.pos + 12
      |        GROUP BY 1, 2, 3),
      |r AS (SELECT query_id, doc_id, CAST(snip_start AS BIGINT) AS snip_start, n_covered,
      |             ROW_NUMBER() OVER (PARTITION BY query_id, doc_id
      |                    ORDER BY n_covered DESC, snip_start ASC) AS rn
      |      FROM cov)
      |SELECT query_id, doc_id, snip_start, n_covered FROM r WHERE rn = 1""".stripMargin

  /** Rendered-snippet oracle (best window + 12-token slice of the raw
    * text) — shared by `search_highlight` and `search_highlight_store`:
    * the store route scores windows from the positional sidecar, then the
    * text join is an index-bounded row fetch, not a scan. */
  private val HighlightTextOracleSql =
    """WITH dw AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      |w AS (SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, UNNEST(ws) AS w FROM dw),
      |qd AS (SELECT doc_id AS query_id,
      |              list_transform(string_split(text, ' ')[1:4], x -> lower(x)) AS qs
      |       FROM documents WHERE doc_id % 97 = 0),
      |qt AS (SELECT query_id, UNNEST(list_distinct(qs)) AS w FROM qd),
      |qn AS (SELECT query_id, COUNT(*) AS n_terms FROM qt GROUP BY 1),
      |m AS (SELECT qt.query_id, w.doc_id, w.pos, qt.w FROM w JOIN qt ON w.w = qt.w),
      |qual AS (SELECT d.query_id, d.doc_id
      |         FROM (SELECT DISTINCT query_id, doc_id, w FROM m) d
      |         JOIN qn ON d.query_id = qn.query_id
      |         GROUP BY d.query_id, d.doc_id, qn.n_terms
      |         HAVING COUNT(*) = qn.n_terms),
      |mq AS (SELECT m.* FROM m JOIN qual
      |       ON m.query_id = qual.query_id AND m.doc_id = qual.doc_id),
      |cov AS (SELECT a.query_id, a.doc_id, a.pos AS snip_start,
      |               CAST(COUNT(DISTINCT mm.w) AS BIGINT) AS n_covered
      |        FROM mq a JOIN mq mm
      |          ON a.query_id = mm.query_id AND a.doc_id = mm.doc_id
      |         AND mm.pos >= a.pos AND mm.pos < a.pos + 12
      |        GROUP BY 1, 2, 3),
      |r AS (SELECT query_id, doc_id, CAST(snip_start AS BIGINT) AS snip_start, n_covered,
      |             ROW_NUMBER() OVER (PARTITION BY query_id, doc_id
      |                    ORDER BY n_covered DESC, snip_start ASC) AS rn
      |      FROM cov),
      |best AS (SELECT query_id, doc_id, snip_start, n_covered FROM r WHERE rn = 1)
      |SELECT best.query_id, best.doc_id, best.snip_start, best.n_covered,
      |       array_to_string(string_split(d.text, ' ')
      |         [CAST(best.snip_start + 1 AS INTEGER):CAST(best.snip_start + 12 AS INTEGER)],
      |         ' ') AS snippet
      |FROM best JOIN documents d ON best.doc_id = d.doc_id""".stripMargin

  /** Spell-suggest oracle (maxDist=1, k=3) parameterized by a corpus
    * filter — `search_spell_suggest`/`search_spell_store` use the full
    * corpus, `search_spell_ageoff` the post-retirement survivors. The
    * probe queries always come from the unfiltered table. */
  private def spellOracleSql(corpusWhere: String): String =
    s"""WITH v AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
       |             SELECT UNNEST(string_split(lower(text), ' ')) AS w
       |             FROM documents $corpusWhere)
       |           WHERE w != '' GROUP BY 1),
       |q AS (SELECT doc_id AS query_id,
       |             lower(substr(string_split(text, ' ')[2], 1,
       |                          length(string_split(text, ' ')[2]) - 1) || 'z') AS qterm
       |      FROM documents WHERE doc_id % 97 = 0),
       |c AS (SELECT q.query_id, q.qterm, v.w, v.n,
       |             CAST(levenshtein(q.qterm, v.w) AS BIGINT) AS dist
       |      FROM v JOIN q ON substr(v.w, 1, 1) = substr(q.qterm, 1, 1)
       |                   AND abs(length(v.w) - length(q.qterm)) <= 1
       |      WHERE levenshtein(q.qterm, v.w) <= 1),
       |r AS (SELECT query_id, qterm, w AS suggestion, dist, n,
       |             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |                    ORDER BY dist ASC, n DESC, w ASC) AS BIGINT) AS rank
       |      FROM c)
       |SELECT query_id, qterm, rank, suggestion, dist, n FROM r WHERE rank <= 3""".stripMargin

  /** Boolean MUST/NOT oracle — shared by `search_boolean` and
    * `search_boolean_store`. */
  private val BooleanMustNotOracleSql =
    """WITH qd AS (SELECT doc_id AS query_id,
      |              list_transform(string_split(text, ' ')[1:4], x -> lower(x)) AS qs,
      |              lower(string_split(text, ' ')[6]) AS nw
      |       FROM documents WHERE doc_id % 97 = 0),
      |dw AS (SELECT doc_id, UNNEST(list_distinct(string_split(lower(text), ' '))) AS w
      |       FROM documents),
      |mt AS (SELECT query_id, UNNEST(list_distinct(qs)) AS w FROM qd),
      |nt AS (SELECT query_id, nw AS w FROM qd WHERE nw IS NOT NULL AND length(nw) > 0),
      |qn AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_terms FROM mt GROUP BY 1),
      |mm AS (SELECT mt.query_id, dw.doc_id, COUNT(*) AS n_hit
      |       FROM dw JOIN mt ON dw.w = mt.w GROUP BY 1, 2),
      |ex AS (SELECT DISTINCT nt.query_id, dw.doc_id FROM dw JOIN nt ON dw.w = nt.w)
      |SELECT mm.query_id, mm.doc_id, qn.n_terms
      |FROM mm JOIN qn ON mm.query_id = qn.query_id
      |WHERE mm.n_hit = qn.n_terms
      |  AND NOT EXISTS (SELECT 1 FROM ex
      |                  WHERE ex.query_id = mm.query_id AND ex.doc_id = mm.doc_id)""".stripMargin

  /** Dirichlet-QL top-10 oracle — shared by `search_dirichlet_ql` and
    * `search_dirichlet_store` (the maintained-index read must score
    * bit-identically to the batch decomposed form). */
  private val DirichletQlOracleSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |q AS (SELECT doc_id AS query_id, array_to_string((string_split(text, ' '))[1:4], ' ') AS qtext
        |      FROM documents WHERE doc_id % 97 = 0),
        |qt AS (SELECT DISTINCT query_id, term
        |       FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q)),
        |dt AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
        |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM dt
        |       WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2, 3),
        |cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
        |st AS (SELECT CAST(SUM(len(ws)) AS BIGINT) AS c_tokens FROM w),
        |qc AS (SELECT qt.query_id,
        |         CAST(SUM(CAST(CAST(CAST(ln((CAST(1000.0 AS DOUBLE) * cf.cf) / st.c_tokens)
        |              AS DECIMAL(18,9)) AS DECIMAL(28,9)) * 1000000000 AS BIGINT)) AS BIGINT) AS qc9,
        |         CAST(COUNT(*) AS BIGINT) AS nq
        |       FROM qt JOIN cf ON qt.term = cf.term CROSS JOIN st GROUP BY 1),
        |m AS (SELECT qt.query_id, tf.doc_id, tf.dl, tf.term, tf.tf FROM tf JOIN qt USING (term)),
        |adj AS (SELECT m.query_id, m.doc_id, m.dl,
        |          CAST(SUM(CAST(CAST(CAST(ln(CAST(1.0 AS DOUBLE) +
        |               (CAST(m.tf AS DOUBLE) * st.c_tokens) / (CAST(1000.0 AS DOUBLE) * cf.cf))
        |               AS DECIMAL(18,9)) AS DECIMAL(28,9)) * 1000000000 AS BIGINT)) AS BIGINT) AS adj9,
        |          CAST(COUNT(*) AS BIGINT) AS n_hit
        |        FROM m JOIN cf ON m.term = cf.term CROSS JOIN st GROUP BY 1, 2, 3),
        |sc AS (SELECT adj.query_id, adj.doc_id,
        |         qc.qc9 - qc.nq * CAST(CAST(CAST(ln(adj.dl + CAST(1000.0 AS DOUBLE))
        |              AS DECIMAL(18,9)) AS DECIMAL(28,9)) * 1000000000 AS BIGINT) + adj.adj9 AS score9,
        |         adj.n_hit
        |       FROM adj JOIN qc USING (query_id))
        |SELECT query_id, rank, doc_id,
        |       CAST(score9 AS DOUBLE) / CAST(1000000000 AS DOUBLE) AS score, n_hit FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score9 DESC, doc_id) AS BIGINT) AS rank
        |  FROM sc)
        |WHERE rank <= 10""".stripMargin


  /** Hyperplane-LSH signature CTE over `embeddings` — shared by every
    * LSH-bucketed oracle so all gates pin identical bucket semantics. */
  private val LshSigCte =
    """elems AS (
      |  SELECT vec_id, UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS d FROM embeddings),
      |bits AS (
      |  SELECT vec_id, j,
      |         SUM(CAST(v AS DOUBLE) * (CASE WHEN (strpos('0123456789abcdef',
      |             substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d - 1 AS VARCHAR)), 1 + (d - 1) % 32, 1)) - 1) % 2 = 1
      |           THEN 1.0 ELSE -1.0 END)) AS acc
      |  FROM elems, UNNEST(range(8)) AS t(j)
      |  GROUP BY 1, 2),
      |sig AS (
      |  SELECT vec_id, string_agg(CASE WHEN acc > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS sig
      |  FROM bits GROUP BY vec_id)""".stripMargin

  /** In-bucket exact-cosine SELF-join pairs on top of [[LshSigCte]]. */
  private val LshPairsCte = LshSigCte + """,
      |pairs AS (
      |  SELECT x.vec_id AS a, y.vec_id AS b,
      |         list_dot_product(CAST(ex.embedding AS DOUBLE[]), CAST(ey.embedding AS DOUBLE[]))
      |           / (sqrt(list_dot_product(CAST(ex.embedding AS DOUBLE[]), CAST(ex.embedding AS DOUBLE[])))
      |            * sqrt(list_dot_product(CAST(ey.embedding AS DOUBLE[]), CAST(ey.embedding AS DOUBLE[])))) AS cos_sim
      |  FROM sig x JOIN sig y ON x.sig = y.sig AND x.vec_id < y.vec_id
      |  JOIN embeddings ex ON x.vec_id = ex.vec_id
      |  JOIN embeddings ey ON y.vec_id = ey.vec_id)""".stripMargin

  /** First-5-hex-digits-of-md5 value (0..2^20-1) over a hex-string column
    * `m` — the [[graft.operators.Dedup.bloomPos]] arithmetic in portable SQL
    * (DuckDB has no conv()). */
  private def hex5Sql(m: String): String =
    (1 to 5).map { j =>
      val w = Seq(65536L, 4096L, 256L, 16L, 1L)(j - 1)
      s"(strpos('0123456789abcdef', substr($m, $j, 1)) - 1) * $w"
    }.mkString(" + ")

  private val CosineSql =
    """list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(d.embedding AS DOUBLE[]))
      | / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
      |  * sqrt(list_dot_product(CAST(d.embedding AS DOUBLE[]), CAST(d.embedding AS DOUBLE[]))))""".stripMargin

  /** The embed_ivf_knn oracle as a reusable CTE block (ends with `ivf_top`,
    * the ranked k=5 result) so the recall audit can reference the same IVF
    * result the gate pins. */
  /** The IVF replay CTEs with a parameterized probe count — `rn <= nProbe`
    * in the `probes` CTE is the only knob; the recall sweep unions three
    * instantiations. */
  private def ivfCoreCtes(nProbe: Int): String =
    IvfCoreCtesTemplate.replace("rn <= 4", s"rn <= $nProbe")

  private val IvfCoreCtesTemplate =
    """cents AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS list_id,
      |         embedding AS centroid,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS cnorm
      |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
      |corpus AS (
      |  SELECT vec_id, embedding,
      |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vnorm
      |  FROM embeddings),
      |assigned AS (
      |  SELECT vec_id, embedding, vnorm, list_id FROM (
      |    SELECT c.vec_id, c.embedding, c.vnorm, t.list_id,
      |           ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
      |             list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(t.centroid AS DOUBLE[]))
      |               / (c.vnorm * t.cnorm) DESC, t.list_id) AS rn
      |    FROM corpus c CROSS JOIN cents t)
      |  WHERE rn = 1),
      |probes AS (
      |  SELECT query_id, qe, qnorm, list_id FROM (
      |    SELECT q.vec_id AS query_id, q.embedding AS qe, q.vnorm AS qnorm, t.list_id,
      |           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
      |             list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(t.centroid AS DOUBLE[]))
      |               / (q.vnorm * t.cnorm) DESC, t.list_id) AS rn
      |    FROM corpus q CROSS JOIN cents t WHERE q.vec_id < 5)
      |  WHERE rn <= 4),
      |ivf_scored AS (
      |  SELECT p.query_id, a.vec_id AS neighbor_id,
      |         list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(p.qe AS DOUBLE[]))
      |           / (a.vnorm * p.qnorm) AS sim
      |  FROM assigned a JOIN probes p ON a.list_id = p.list_id AND a.vec_id != p.query_id),
      |ivf_top AS (
      |  SELECT query_id, neighbor_id, sim, rank FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      |    FROM ivf_scored)
      |  WHERE rank <= 5)""".stripMargin

  private val IvfCoreCtes = IvfCoreCtesTemplate

  /** `embed_ivf_ageoff` oracle: centroids stay trained on the FULL corpus
    * (the store's bootstrap-time geometry — age-off never retrains), but
    * the scored lists hold only the survivors. The drop set excludes the
    * probe queries (vec_id < 5) so the probe CTE can share the filtered
    * corpus scan. */
  private val IvfAgedTopCte = "WITH " + IvfCoreCtesTemplate.replace(
    "FROM embeddings),",
    "FROM embeddings WHERE NOT (vec_id % 11 = 0 AND vec_id >= 5)),")

  /** The brute-force-vs-ivf recall close shared by embed_recall_report and
    * the nProbe sweep: assumes `ivf_top` is in scope, emits one row per
    * probe query with its extra leading columns via `prefix`. */
  private def recallCloseSql(prefix: String): String =
    s""",
       |bf_scored AS (
       |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
       |         $CosineSql AS sim
       |  FROM embeddings q JOIN embeddings d ON q.vec_id < 5 AND d.vec_id != q.vec_id),
       |bf_top AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |    FROM bf_scored)
       |  WHERE rank <= 5),
       |base AS (SELECT query_id, COUNT(*) AS k_eff FROM bf_top GROUP BY 1),
       |h AS (SELECT g.query_id, COUNT(*) AS hits
       |      FROM bf_top g JOIN ivf_top a
       |        ON a.query_id = g.query_id AND a.neighbor_id = g.neighbor_id
       |      GROUP BY 1)
       |SELECT ${prefix}b.query_id, b.k_eff, COALESCE(h.hits, 0) AS hits,
       |       CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(b.k_eff AS DOUBLE) AS recall
       |FROM base b LEFT JOIN h ON b.query_id = h.query_id""".stripMargin

  private val IvfTopCte = "WITH " + IvfCoreCtes

  /** Mirrors SimilarityPq (m=4 subspaces x 16 dims, ksub=16): seeded codebook
    * in salted-md5 order, expanded-L2 subspace distances with the SAME fold
    * and operation order, argmin codes with (distance, codeword) tie-break.
    * Ends with a `codes` CTE of (vec_id, code_1..code_4). */
  private val PqCoreCtes =
    """seeds AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY md5('pq:' || CAST(vec_id AS VARCHAR))) AS c,
      |         embedding
      |  FROM embeddings ORDER BY md5('pq:' || CAST(vec_id AS VARCHAR)) LIMIT 16),
      |bookd AS (
      |  SELECT j, c, w, list_dot_product(w, w) AS wss FROM (
      |    SELECT t.j, s.c,
      |           CAST(list_slice(s.embedding, (t.j-1)*16+1, t.j*16) AS DOUBLE[]) AS w
      |    FROM seeds s CROSS JOIN range(1, 5) t(j))),
      |corpd AS (
      |  SELECT vec_id, j, s, list_dot_product(s, s) AS ss FROM (
      |    SELECT e.vec_id, t.j,
      |           CAST(list_slice(e.embedding, (t.j-1)*16+1, t.j*16) AS DOUBLE[]) AS s
      |    FROM embeddings e CROSS JOIN range(1, 5) t(j))),
      |dists AS (
      |  SELECT x.vec_id, x.j, b.c,
      |         (x.ss + b.wss) - 2 * list_dot_product(x.s, b.w) AS d
      |  FROM corpd x JOIN bookd b ON x.j = b.j),
      |codes AS (
      |  SELECT vec_id,
      |         CAST(MAX(CASE WHEN j = 1 THEN c END) AS INTEGER) AS code_1,
      |         CAST(MAX(CASE WHEN j = 2 THEN c END) AS INTEGER) AS code_2,
      |         CAST(MAX(CASE WHEN j = 3 THEN c END) AS INTEGER) AS code_3,
      |         CAST(MAX(CASE WHEN j = 4 THEN c END) AS INTEGER) AS code_4
      |  FROM (SELECT vec_id, j, c,
      |               ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
      |        FROM dists)
      |  WHERE rn = 1
      |  GROUP BY vec_id)""".stripMargin

  private val PqCte = "WITH " + PqCoreCtes

  /** ADC scoring + rank on top of [[PqCoreCtes]] (queries vec_id < 5, m=4):
    * per-query subspace distance tables, fixed-parenthesization 4-term ADC
    * sum, (adist, neighbor_id) rank in `pq_top` — shared by the kNN gate and
    * the PQ recall audit. */
  private val PqAdcTopCtes =
    """,
      |dt AS (
      |  SELECT q.vec_id AS query_id, q.j, b.c,
      |         (q.ss + b.wss) - 2 * list_dot_product(q.s, b.w) AS d
      |  FROM corpd q JOIN bookd b ON q.j = b.j
      |  WHERE q.vec_id < 5),
      |scored AS (
      |  SELECT t1.query_id, x.vec_id AS neighbor_id,
      |         (((t1.d + t2.d) + t3.d) + t4.d) AS adist
      |  FROM codes x
      |  JOIN dt t1 ON t1.j = 1 AND t1.c = x.code_1
      |  JOIN dt t2 ON t2.j = 2 AND t2.c = x.code_2 AND t2.query_id = t1.query_id
      |  JOIN dt t3 ON t3.j = 3 AND t3.c = x.code_3 AND t3.query_id = t1.query_id
      |  JOIN dt t4 ON t4.j = 4 AND t4.c = x.code_4 AND t4.query_id = t1.query_id
      |  WHERE x.vec_id != t1.query_id),
      |pq_top AS (
      |  SELECT query_id, neighbor_id, adist,
      |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
      |  FROM scored)""".stripMargin

  /** Unrolled replay of [[graft.operators.Graph.pageRank]] on the planted
    * domain graph: every step a nonnegative integer floor division (`//`),
    * the per-edge share in HUGEINT — bit-exact vs the Spark fixed-point
    * loop at any iteration count. */
  private def pageRankOracleSql(iters: Int = 5, dampBp: Int = 8500,
      scale: Long = 1000000000000L, seedsSql: Option[String] = None): String = {
    val edges =
      """  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS dst FROM documents
        |  UNION ALL SELECT 'cdn' || CAST(doc_id % 3 AS VARCHAR), 'site' || CAST(doc_id % 5 AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'site' || CAST((doc_id + 3) % 7 AS VARCHAR) FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'sink' FROM documents WHERE doc_id % 11 = 0""".stripMargin
    s"""WITH ${pageRankCtes(edges, iters, dampBp, scale, seedsSql)}
       |SELECT domain, CAST(rank_fp AS BIGINT) AS rank_fp,
       |       CAST(rank_fp AS DOUBLE) / $scale AS rank
       |FROM r$iters""".stripMargin
  }

  /** Unrolled DuckDB replay of [[graft.operators.Similarity
    * .topPrincipalComponent]]: exact grid moments, HUGEINT scatter
    * `n·sij − si·sj`, then `iters` power rounds with the same sign-split
    * round-toward-zero L1 renorm. Every multi-referenced CTE is
    * MATERIALIZED (the iterated-oracle lesson from the HITS replay). */
  private def topPcOracleSql(iters: Int = 8, scale: Long = 1000000L): String =
    s"""WITH ${topPcCtes(iters, scale)}
       |SELECT CAST(dim AS BIGINT) AS dim, CAST(v_fp * sgn AS BIGINT) AS pc_fp,
       |       CAST(v_fp * sgn AS DOUBLE) / $scale AS pc
       |FROM v$iters CROSS JOIN sg""".stripMargin

  /** The topPrincipalComponent replay as reusable CTEs (`el` … `v<iters>`,
    * `sg`) so the projection gate can extend the identical computation. */
  private def topPcCtes(iters: Int, scale: Long): String = {
    val head =
      s"""el AS MATERIALIZED (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         |         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1048576 + 0.5) AS BIGINT) AS fp
         |  FROM embeddings),
         |mo AS MATERIALIZED (
         |  SELECT a.d AS i, b.d AS j, CAST(COUNT(*) AS BIGINT) AS nn,
         |         CAST(SUM(a.fp * b.fp) AS BIGINT) AS sij
         |  FROM el a JOIN el b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |su AS MATERIALIZED (SELECT d, CAST(SUM(fp) AS BIGINT) AS s FROM el GROUP BY 1),
         |sc AS MATERIALIZED (
         |  SELECT mo.i, mo.j, CAST(nn AS HUGEINT) * sij - CAST(si.s AS HUGEINT) * sj.s AS sm
         |  FROM mo JOIN su si ON mo.i = si.d JOIN su sj ON mo.j = sj.d),
         |dims AS MATERIALIZED (SELECT DISTINCT i AS dim FROM sc),
         |ss AS (SELECT CAST(SUM(dim) AS BIGINT) AS ssum FROM dims),
         |v0 AS MATERIALIZED (SELECT dim, dim * $scale // ssum AS v_fp FROM dims CROSS JOIN ss)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (SELECT sc.i AS dim, SUM(sm * v_fp) AS raw
         |      FROM sc JOIN v${k - 1} ON sc.j = v${k - 1}.dim GROUP BY 1),
         |t$k AS (SELECT COALESCE(SUM(abs(raw)), 0) AS tot FROM r$k),
         |v$k AS MATERIALIZED (SELECT dim, CASE WHEN tot = 0 THEN 0
         |        ELSE CAST(CASE WHEN raw < 0 THEN -(abs(raw) * $scale // tot)
         |                       ELSE abs(raw) * $scale // tot END AS BIGINT) END AS v_fp
         |      FROM r$k CROSS JOIN t$k)""".stripMargin
    }
    s"""$head,
       |${rounds.mkString(",\n")},
       |sg AS (SELECT COALESCE(MIN_BY(CASE WHEN v_fp < 0 THEN -1 ELSE 1 END, dim), 1) AS sgn
       |       FROM v$iters WHERE v_fp != 0)""".stripMargin
  }

  /** Unrolled DuckDB replay of [[graft.operators.Graph.hits]]: per iteration
    * an auth half-step (dst-keyed sum of hub·w, L1-renormalized via HUGEINT
    * floor division) then a hub half-step over the fresh authorities —
    * mirroring the Spark DECIMAL(38,0) renorm bit-for-bit. */
  /** DuckDB replay of [[graft.operators.Curation.weightedSample]]: the
    * 32-bit md5 fraction reconstructed by a strpos polynomial (no conv()
    * in DuckDB), then the identical ln(u)/w DECIMAL(28,12) key and global
    * rank — the two-level shard prune is rank-invariant, so the oracle
    * ranks directly. */
  private val WeightedSampleOracleSql: String = {
    val poly = (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
      .mkString("\n               + ")
    s"""WITH hh AS (SELECT doc_id, GREATEST(n_chars, 1) AS w,
       |              substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
       |            FROM documents),
       |m AS (SELECT doc_id, w,
       |             CAST($poly AS BIGINT) AS mm
       |      FROM hh),
       |kk AS (SELECT doc_id, w,
       |              CAST(ln((CAST(mm AS DOUBLE) + 0.5) / 4294967296.0)
       |                   / CAST(w AS DOUBLE) AS DECIMAL(28,12)) AS skey
       |       FROM m)
       |SELECT CAST(rank AS BIGINT) AS rank, doc_id, CAST(w AS BIGINT) AS weight,
       |       CAST(skey AS DOUBLE) AS skey
       |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY skey DESC, doc_id) AS rank FROM kk)
       |WHERE rank <= 200""".stripMargin
  }

  /** The planted link graph (mirrors [[plantedEdges]] with full=true) as a
    * SQL fragment — shared by the round-8 graph oracles. */
  private val PlantedEdgesSql: String =
    """  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS dst FROM documents
      |  UNION ALL SELECT 'cdn' || CAST(doc_id % 3 AS VARCHAR), 'site' || CAST(doc_id % 5 AS VARCHAR) FROM documents
      |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'site' || CAST((doc_id + 3) % 7 AS VARCHAR) FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'sink' FROM documents WHERE doc_id % 11 = 0""".stripMargin

  /** Unrolled DuckDB replay of [[graft.operators.Graph.kcore]] over the
    * planted link graph: one MATERIALIZED survivor CTE per synchronous peel
    * round (each is referenced twice by the next round's two endpoint
    * semi-joins), then the final core-degree count over the last round. */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val chain = (1 to rounds).map { r =>
      s"""s$r AS MATERIALIZED (
         |  SELECT bi.u AS node FROM bi
         |  JOIN s${r - 1} p1 ON bi.u = p1.node JOIN s${r - 1} p2 ON bi.v = p2.node
         |  GROUP BY bi.u HAVING COUNT(*) >= $k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |$PlantedEdgesSql),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |  FROM e WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
       |bi AS MATERIALIZED (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
       |s0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM bi),
       |$chain
       |SELECT bi.u AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
       |FROM bi JOIN s$rounds p1 ON bi.u = p1.node JOIN s$rounds p2 ON bi.v = p2.node
       |GROUP BY bi.u""".stripMargin
  }

  /** Shared WITH-body for the LPA replays: planted simple graph, bi-directed
    * edge list, `rounds` (neighbor-label count, argmax) CTE pairs ending in
    * `l<rounds>` — consumed by graph_lpa and graph_modularity. */
  private def lpaChainSql(rounds: Int): String = {
    val chain = (1 to rounds).map { r =>
      s"""c$r AS (SELECT bi.u, l.lab, COUNT(*) AS cnt
         |      FROM bi JOIN l${r - 1} l ON bi.v = l.node GROUP BY 1, 2),
         |l$r AS MATERIALIZED (
         |  SELECT u AS node, lab FROM (
         |    SELECT u, lab, ROW_NUMBER() OVER (PARTITION BY u
         |           ORDER BY cnt DESC, lab ASC) AS rn FROM c$r) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
       |$PlantedEdgesSql),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |  FROM e WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
       |bi AS MATERIALIZED (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
       |l0 AS (SELECT DISTINCT u AS node, u AS lab FROM bi),
       |$chain""".stripMargin
  }

  /** Unrolled DuckDB replay of [[graft.operators.Graph.labelPropagation]]:
    * one (neighbor-label count, argmax) CTE pair per synchronous round over
    * the bi-directed planted simple graph, (count DESC, label ASC) ties. */
  private def lpaOracleSql(rounds: Int): String =
    s"""WITH ${lpaChainSql(rounds)},
       |sz AS (SELECT lab, CAST(COUNT(*) AS BIGINT) AS community_size
       |       FROM l$rounds GROUP BY 1)
       |SELECT l$rounds.node AS domain, l$rounds.lab AS community, sz.community_size
       |FROM l$rounds JOIN sz ON l$rounds.lab = sz.lab""".stripMargin

  /** DuckDB replay of [[graft.operators.Graph.modularity]] over the same
    * LPA chain: exact L_c / d_c / m integers, pinned per-community term,
    * sorted-fold total. */
  private def modularityOracleSql(rounds: Int): String =
    s"""WITH ${lpaChainSql(rounds)},
       |wc AS (SELECT la.lab AS community, CAST(COUNT(*) AS BIGINT) AS l_c
       |       FROM und JOIN l$rounds la ON und.a = la.node
       |                JOIN l$rounds lb ON und.b = lb.node
       |       WHERE la.lab = lb.lab GROUP BY 1),
       |dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM bi GROUP BY 1),
       |dc AS (SELECT la.lab AS community, CAST(SUM(dg.deg) AS BIGINT) AS d_c
       |       FROM dg JOIN l$rounds la ON dg.u = la.node GROUP BY 1),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
       |t AS (SELECT dc.community,
       |        CAST(COALESCE(wc.l_c, 0) AS DOUBLE) / CAST(mm.m AS DOUBLE)
       |        - (CAST(dc.d_c AS DOUBLE) / (2.0 * CAST(mm.m AS DOUBLE)))
       |          * (CAST(dc.d_c AS DOUBLE) / (2.0 * CAST(mm.m AS DOUBLE))) AS term
       |      FROM dc LEFT JOIN wc ON dc.community = wc.community, mm)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
       |       (SELECT m FROM mm) AS n_edges,
       |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform(list_sort(list(struct_pack(c := community, t := term))),
       |                        q -> q.t)),
       |         (acc, v) -> acc + v) AS modularity
       |FROM t""".stripMargin

  /** DuckDB replay of [[graft.operators.Graph.assortativity]]: exact
    * DECIMAL(38,0) moment sums over both edge orientations, then the same
    * pinned-order double Pearson expression. */
  private val AssortativityOracleSql: String =
    s"""WITH e AS MATERIALIZED (
       |$PlantedEdgesSql),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |  FROM e WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
       |deg AS MATERIALIZED (
       |  SELECT v, COUNT(*) AS deg FROM (
       |    SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
       |j AS MATERIALIZED (
       |  SELECT da.deg AS x, db.deg AS y FROM und
       |  JOIN deg da ON und.a = da.v JOIN deg db ON und.b = db.v),
       |p AS (SELECT x, y FROM j UNION ALL SELECT y, x FROM j),
       |m AS (SELECT COUNT(*) AS n,
       |             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
       |             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
       |             SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
       |             SUM(CAST(y * y AS DECIMAL(38,0))) AS syy,
       |             SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
       |      FROM p),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
       |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und)
       |SELECT n_nodes, n_edges,
       |       CASE WHEN n = 0 OR (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
       |            THEN NULL
       |            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
       |                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       |                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       |       END AS assortativity
       |FROM m CROSS JOIN nn CROSS JOIN ne""".stripMargin

  private def hitsOracleSql(iters: Int = 5, scale: Long = 1000000000000L): String = {
    val edges =
      """  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS dst FROM documents
        |  UNION ALL SELECT 'cdn' || CAST(doc_id % 3 AS VARCHAR), 'site' || CAST(doc_id % 5 AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'site' || CAST((doc_id + 3) % 7 AS VARCHAR) FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'sink' FROM documents WHERE doc_id % 11 = 0""".stripMargin
    // AS MATERIALIZED: the iteration CTEs reference `nodes`/`w` ~2x per
    // round; DuckDB would otherwise inline the 4-scan edges subtree into
    // every reference and exhaust file handles on the parquet re-opens
    val head =
      s"""e AS MATERIALIZED (
         |$edges),
         |w AS MATERIALIZED (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS wt FROM e GROUP BY 1, 2),
         |nodes AS MATERIALIZED (SELECT src AS domain FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
         |h0 AS (SELECT domain, $scale // n AS hub_fp FROM nodes CROSS JOIN nn)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""ar$k AS MATERIALIZED (SELECT nodes.domain, COALESCE(s.v, 0) AS raw
         |      FROM nodes LEFT JOIN (SELECT w.dst AS domain, CAST(SUM(hub_fp * wt) AS BIGINT) AS v
         |                            FROM h${k - 1} JOIN w ON h${k - 1}.domain = w.src GROUP BY 1) s
         |        ON nodes.domain = s.domain),
         |at$k AS MATERIALIZED (SELECT COALESCE(SUM(raw), 0) AS tot FROM ar$k),
         |a$k AS MATERIALIZED (SELECT domain, CASE WHEN tot = 0 THEN 0
         |               ELSE CAST(CAST(raw AS HUGEINT) * $scale // tot AS BIGINT) END AS auth_fp
         |      FROM ar$k CROSS JOIN at$k),
         |hr$k AS MATERIALIZED (SELECT nodes.domain, COALESCE(s.v, 0) AS raw
         |      FROM nodes LEFT JOIN (SELECT w.src AS domain, CAST(SUM(auth_fp * wt) AS BIGINT) AS v
         |                            FROM a$k JOIN w ON a$k.domain = w.dst GROUP BY 1) s
         |        ON nodes.domain = s.domain),
         |ht$k AS MATERIALIZED (SELECT COALESCE(SUM(raw), 0) AS tot FROM hr$k),
         |h$k AS MATERIALIZED (SELECT domain, CASE WHEN tot = 0 THEN 0
         |               ELSE CAST(CAST(raw AS HUGEINT) * $scale // tot AS BIGINT) END AS hub_fp
         |      FROM hr$k CROSS JOIN ht$k)""".stripMargin
    }
    s"""WITH $head,
       |${rounds.mkString(",\n")}
       |SELECT a$iters.domain, auth_fp, hub_fp,
       |       CAST(auth_fp AS DOUBLE) / $scale AS auth,
       |       CAST(hub_fp AS DOUBLE) / $scale AS hub
       |FROM a$iters JOIN h$iters ON a$iters.domain = h$iters.domain""".stripMargin
  }

  /** The PageRank/TrustRank replay as reusable CTEs (`e` .. `r<iters>`) over
    * a caller-supplied edges SELECT — shared by the standalone gates and the
    * domain-prior composition. `seedsSql` (a SELECT of `domain`) restricts
    * the teleport/dangling target set (TrustRank); None = all nodes. */
  private def pageRankCtes(edgesSql: String, iters: Int, dampBp: Int,
      scale: Long, seedsSql: Option[String] = None): String = {
    val tele = scale - scale * dampBp / 10000
    val seedsCte = seedsSql match {
      case Some(sql) =>
        s"seeds AS (SELECT DISTINCT s.domain FROM ($sql) s JOIN nodes ON s.domain = nodes.domain)"
      case None => "seeds AS (SELECT domain FROM nodes)"
    }
    val head =
      s"""e AS (
         |$edgesSql),
         |w AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS wt FROM e GROUP BY 1, 2),
         |ow AS (SELECT src, SUM(wt) AS outw FROM w GROUP BY 1),
         |nodes AS (SELECT src AS domain FROM e UNION SELECT dst FROM e),
         |$seedsCte,
         |mk AS (SELECT nodes.domain, CASE WHEN sd.domain IS NULL THEN 0 ELSE 1 END AS is_seed
         |       FROM nodes LEFT JOIN seeds sd ON nodes.domain = sd.domain),
         |nn AS (SELECT CAST(SUM(is_seed) AS BIGINT) AS ns FROM mk),
         |r0 AS (SELECT domain, is_seed,
         |              CASE WHEN is_seed = 1 THEN $scale // ns ELSE 0 END AS rank_fp
         |       FROM mk CROSS JOIN nn)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""d$k AS (SELECT domain, rank_fp * $dampBp // 10000 AS rd FROM r${k - 1}),
         |g$k AS (SELECT COALESCE(SUM(rd), 0) AS dang FROM d$k LEFT JOIN ow ON d$k.domain = ow.src WHERE ow.src IS NULL),
         |c$k AS (SELECT w.dst AS domain, SUM(CAST(CAST(rd AS HUGEINT) * wt // outw AS BIGINT)) AS lnk
         |      FROM d$k JOIN w ON d$k.domain = w.src JOIN ow ON w.src = ow.src GROUP BY 1),
         |r$k AS (SELECT mk.domain, mk.is_seed,
         |              (CASE WHEN mk.is_seed = 1 THEN $tele // ns + dang // ns ELSE 0 END)
         |                + COALESCE(lnk, 0) AS rank_fp
         |      FROM mk CROSS JOIN nn CROSS JOIN g$k LEFT JOIN c$k ON mk.domain = c$k.domain)""".stripMargin
    }
    s"""$head,
       |${rounds.mkString(",\n")}""".stripMargin
  }

  /** Domain-prior composition oracle: a 3-iteration PageRank over the
    * site→cdn→site link structure, joined with the quality score — the
    * per-doc curation prior `quality · domain_rank`. */
  private def domainPriorOracleSql(iters: Int = 3): String = {
    val edges =
      """  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS dst FROM documents
        |  UNION ALL SELECT 'cdn' || CAST(doc_id % 3 AS VARCHAR), 'site' || CAST(doc_id % 5 AS VARCHAR) FROM documents""".stripMargin
    s"""WITH ${pageRankCtes(edges, iters, 8500, 1000000000000L)},
       |$scoredSql,
       |dd AS (SELECT doc_id, 'site' || CAST(doc_id % 7 AS VARCHAR) AS domain FROM documents)
       |SELECT dd.doc_id, dd.domain,
       |       CAST(r.rank_fp AS BIGINT) AS rank_fp,
       |       s.quality,
       |       s.quality * (CAST(r.rank_fp AS DOUBLE) / 1000000000000) AS prior
       |FROM dd JOIN r$iters r ON dd.domain = r.domain
       |JOIN s ON dd.doc_id = s.doc_id""".stripMargin
  }

  /** PRF oracle: the BM25 core, top-`r` feedback hits, per-query top-`m` NEW
    * terms by summed tf (term tie-break), then the full second scoring pass
    * over the expanded term set — df recomputed on the expanded match. */
  private def searchPrfOracleSql(r: Int = 3, m: Int = 2, k: Int = 10): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |q AS (SELECT doc_id AS query_id, array_to_string((string_split(text, ' '))[1:4], ' ') AS qtext
       |      FROM documents WHERE doc_id % 97 = 0),
       |qt AS (SELECT DISTINCT query_id, term
       |       FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q)),
       |dt AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
       |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM dt GROUP BY 1, 2, 3),
       |m AS (SELECT qt.query_id, tf.doc_id, tf.dl, tf.term, tf.tf FROM tf JOIN qt USING (term)),
       |dfq AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT term, doc_id FROM m) GROUP BY 1),
       |st AS (SELECT COUNT(*) AS n_docs, SUM(len(ws)) AS sum_dl FROM w),
       |c AS (SELECT m.query_id, m.doc_id,
       |        CAST((ln(1 + ((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)))
       |              * ((m.tf * (1.2 + 1)) / (m.tf + (1.2 * ((1.0 - 0.75) + ((0.75 * m.dl)
       |                / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))))) AS DECIMAL(28,9)) AS c
       |      FROM m JOIN dfq USING (term) CROSS JOIN st),
       |sc AS (SELECT query_id, doc_id, SUM(c) AS score FROM c GROUP BY 1, 2),
       |hits AS (SELECT query_id, doc_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |    FROM sc) WHERE rank <= $r),
       |ft AS (SELECT h.query_id, t.term, CAST(COUNT(*) AS BIGINT) AS tfsum
       |       FROM hits h JOIN (SELECT doc_id, unnest(ws) AS term FROM w) t ON t.doc_id = h.doc_id
       |       GROUP BY 1, 2),
       |nw AS (SELECT query_id, term FROM (
       |       SELECT f.query_id, f.term,
       |              ROW_NUMBER() OVER (PARTITION BY f.query_id ORDER BY f.tfsum DESC, f.term) AS rn
       |       FROM ft f LEFT JOIN qt ON qt.query_id = f.query_id AND qt.term = f.term
       |       WHERE qt.term IS NULL) WHERE rn <= $m),
       |qt2 AS (SELECT query_id, term FROM qt UNION SELECT query_id, term FROM nw),
       |m2 AS (SELECT qt2.query_id, tf.doc_id, tf.dl, tf.term, tf.tf FROM tf JOIN qt2 USING (term)),
       |dfq2 AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT term, doc_id FROM m2) GROUP BY 1),
       |c2 AS (SELECT m2.query_id, m2.doc_id,
       |        CAST((ln(1 + ((st.n_docs - dfq2.df + 0.5) / (dfq2.df + 0.5)))
       |              * ((m2.tf * (1.2 + 1)) / (m2.tf + (1.2 * ((1.0 - 0.75) + ((0.75 * m2.dl)
       |                / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))))) AS DECIMAL(28,9)) AS c
       |      FROM m2 JOIN dfq2 USING (term) CROSS JOIN st),
       |sc2 AS (SELECT query_id, doc_id, SUM(c) AS score, COUNT(*) AS n_terms FROM c2 GROUP BY 1, 2)
       |SELECT query_id, rank, doc_id, CAST(score AS DOUBLE) AS score, n_terms FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc2)
       |WHERE rank <= $k""".stripMargin

  /** Retrieval-eval oracle: the search_bm25 CTE core (kept textually in
    * lockstep with that gate's oracle) + prefix-share qrels + the frozen
    * decimal DCG weights shared with [[graft.operators.Search.evalReport]]. */
  private def searchEvalOracleSql(k: Int = 10): String = {
    import graft.operators.Search
    val wCase = (1 to k)
      .map(r => s"WHEN rank = $r THEN CAST(${Search.DcgWeights(r - 1)} AS DECIMAL(12,10))")
      .mkString("CASE ", " ", " END")
    val idcgCase = (1 until k)
      .map(r => s"WHEN n_rel = $r THEN CAST(${Search.dcgCum(r)} AS DECIMAL(14,10))")
      .mkString(s"CASE WHEN n_rel >= $k THEN CAST(${Search.dcgCum(k)} AS DECIMAL(14,10)) ", " ", " END")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |q AS (SELECT doc_id AS query_id, array_to_string((string_split(text, ' '))[1:4], ' ') AS qtext
       |      FROM documents WHERE doc_id % 97 = 0),
       |qt AS (SELECT DISTINCT query_id, term
       |       FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q)),
       |dt AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
       |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM dt GROUP BY 1, 2, 3),
       |m AS (SELECT qt.query_id, tf.doc_id, tf.dl, tf.term, tf.tf FROM tf JOIN qt USING (term)),
       |dfq AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT term, doc_id FROM m) GROUP BY 1),
       |st AS (SELECT COUNT(*) AS n_docs, SUM(len(ws)) AS sum_dl FROM w),
       |c AS (SELECT m.query_id, m.doc_id,
       |        CAST((ln(1 + ((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)))
       |              * ((m.tf * (1.2 + 1)) / (m.tf + (1.2 * ((1.0 - 0.75) + ((0.75 * m.dl)
       |                / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))))) AS DECIMAL(28,9)) AS c
       |      FROM m JOIN dfq USING (term) CROSS JOIN st),
       |sc AS (SELECT query_id, doc_id, SUM(c) AS score FROM c GROUP BY 1, 2),
       |hits AS (SELECT query_id, doc_id, rank FROM (
       |    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |    FROM sc) WHERE rank <= $k),
       |rel AS (SELECT q.query_id, d.doc_id FROM q
       |        JOIN documents d ON array_to_string((string_split(d.text, ' '))[1:4], ' ') = q.qtext),
       |rc AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel GROUP BY 1),
       |rh AS (SELECT h.query_id, h.rank FROM hits h JOIN rel r ON h.query_id = r.query_id AND h.doc_id = r.doc_id),
       |agg AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel_topk,
       |               MIN(rank) AS first_rel_rank, SUM($wCase) AS dcg
       |        FROM rh GROUP BY 1)
       |SELECT rc.query_id, rc.n_rel,
       |       COALESCE(a.n_rel_topk, 0) AS n_rel_topk,
       |       a.first_rel_rank,
       |       CAST(1.0 AS DOUBLE) / a.first_rel_rank AS rr,
       |       COALESCE(CAST(a.dcg AS DOUBLE), 0.0) / CAST($idcgCase AS DOUBLE) AS ndcg
       |FROM rc LEFT JOIN agg a USING (query_id)""".stripMargin
  }

  /** MMR oracle: the search_bm25 CTE core (k=15 candidates), embeddings
    * joined, then the greedy selection unrolled step by step — max cosine to
    * the selected set via NOT EXISTS + join, argmax with doc_id tie-break.
    * λ literals are written so both engines compute the identical doubles. */
  private def searchMmrOracleSql(k: Int = 5, lambdaBp: Int = 7000): String = {
    import graft.operators.Search
    val lam = lambdaBp / 10000.0
    val relCase = (1 to 64)
      .map(r => s"WHEN rank = $r THEN CAST(${Search.relWeight(r)} AS DECIMAL(12,10))")
      .mkString("CASE ", " ", " END")
    val scoreSql = s"(CAST($lam AS DOUBLE) * r.rel - " +
      s"(CAST(1.0 AS DOUBLE) - CAST($lam AS DOUBLE)) * m.maxsim)"
    val steps = (2 to k).map { i =>
      val prev = s"a${i - 1}"
      s"""m$i AS (SELECT r.query_id, r.doc_id,
         |        MAX(list_dot_product(r.emb, s.emb) / (r.nrm * s.nrm)) AS maxsim
         |      FROM ce r JOIN $prev s ON r.query_id = s.query_id
         |      WHERE NOT EXISTS (SELECT 1 FROM $prev x WHERE x.query_id = r.query_id AND x.doc_id = r.doc_id)
         |      GROUP BY 1, 2),
         |p$i AS (SELECT query_id, doc_id, rank, emb, nrm, CAST($i AS BIGINT) AS mmr_rank FROM (
         |        SELECT r.query_id, r.doc_id, r.rank, r.emb, r.nrm,
         |               ROW_NUMBER() OVER (PARTITION BY r.query_id
         |                 ORDER BY $scoreSql DESC, r.doc_id) AS rn
         |        FROM ce r JOIN m$i m ON r.query_id = m.query_id AND r.doc_id = m.doc_id)
         |      WHERE rn = 1),
         |a$i AS (SELECT * FROM $prev UNION ALL SELECT * FROM p$i)""".stripMargin
    }
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |q AS (SELECT doc_id AS query_id, array_to_string((string_split(text, ' '))[1:4], ' ') AS qtext
       |      FROM documents WHERE doc_id % 97 = 0),
       |qt AS (SELECT DISTINCT query_id, term
       |       FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q)),
       |dt AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
       |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM dt GROUP BY 1, 2, 3),
       |m AS (SELECT qt.query_id, tf.doc_id, tf.dl, tf.term, tf.tf FROM tf JOIN qt USING (term)),
       |dfq AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT term, doc_id FROM m) GROUP BY 1),
       |st AS (SELECT COUNT(*) AS n_docs, SUM(len(ws)) AS sum_dl FROM w),
       |c AS (SELECT m.query_id, m.doc_id,
       |        CAST((ln(1 + ((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)))
       |              * ((m.tf * (1.2 + 1)) / (m.tf + (1.2 * ((1.0 - 0.75) + ((0.75 * m.dl)
       |                / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))))) AS DECIMAL(28,9)) AS c
       |      FROM m JOIN dfq USING (term) CROSS JOIN st),
       |sc AS (SELECT query_id, doc_id, SUM(c) AS score FROM c GROUP BY 1, 2),
       |hits AS (SELECT query_id, doc_id, rank FROM (
       |    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |    FROM sc) WHERE rank <= 15),
       |ce AS (SELECT h.query_id, h.doc_id, h.rank,
       |              CAST(e.embedding AS DOUBLE[]) AS emb,
       |              sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) AS nrm,
       |              CAST($relCase AS DOUBLE) AS rel
       |       FROM hits h JOIN embeddings e ON h.doc_id = e.vec_id),
       |a1 AS (SELECT query_id, doc_id, rank, emb, nrm, CAST(1 AS BIGINT) AS mmr_rank FROM ce WHERE rank = 1),
       |${steps.mkString(",\n")}
       |SELECT query_id, mmr_rank, doc_id, rank AS bm25_rank FROM a$k""".stripMargin
  }

  /** DuckDB replay of [[graft.operators.Profiling.columnProfile]]: one
    * aggregate stanza per (column, num|str kind), UNION ALL'd. */
  private def profileSql(table: String, cols: Seq[(String, String)]): String =
    cols.map { case (c, kind) =>
      val isNum = kind == "num"
      val minNum = if (isNum) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val maxNum = if (isNum) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val minStr = if (isNum) "CAST(NULL AS VARCHAR)" else s"MIN($c)"
      val maxStr = if (isNum) "CAST(NULL AS VARCHAR)" else s"MAX($c)"
      val avgLen =
        if (isNum) "CAST(NULL AS DOUBLE)"
        else s"CAST(SUM(length($c)) AS DOUBLE) / CAST(COUNT($c) AS DOUBLE)"
      s"""SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  $minNum AS min_num, $maxNum AS max_num,
         |  $minStr AS min_str, $maxStr AS max_str,
         |  $avgLen AS avg_len
         |FROM $table""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "")

  /** The REAL-image decode oracle, shared by `multimodal_decode` and
    * `multimodal_decode_partitioned` (same output, different physical
    * path): geometry from the [[graft.operators.Multimodal.syntheticImages]]
    * contract; px_sum = Σ_{x<w, y<h, k<c} (x + y + doc_id%50 + 20k) in
    * closed form (each arithmetic series summed exactly; the pixel
    * expression never wraps a byte by construction). */
  private val ImageDecodeOracleSql: String =
    """WITH img AS (SELECT doc_id AS media_id,
      |                    32 + doc_id % 48 AS w, 32 + doc_id % 32 AS h,
      |                    CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS c,
      |                    doc_id % 50 AS b
      |             FROM documents),
      |s AS (SELECT media_id, w, h, c,
      |             c * h * ((w * (w - 1)) // 2) + c * w * ((h * (h - 1)) // 2)
      |               + c * w * h * b + w * h * 20 * ((c * (c - 1)) // 2) AS px_sum
      |      FROM img)
      |SELECT media_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |       CAST(c AS BIGINT) AS channels, CAST(px_sum AS BIGINT) AS px_sum,
      |       CAST(px_sum AS DOUBLE) / CAST(w * h * c AS DOUBLE) AS px_mean
      |FROM s""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS n_words,
        |       len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_alnum_tokens,
        |       length(text) * 1.0 / len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS chars_per_token
        |FROM documents""".stripMargin,
    // same BpePattern string, alternation order preserved (leftmost-first in
    // both engines); the SQL-literal form doubles the leading apostrophe
    "text_tokens_bpe" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +')) AS n_bpe_tokens,
        |       len(string_split(text, ' ')) AS n_words,
        |       len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +')) * 1.0
        |         / len(string_split(text, ' ')) AS tokens_per_word
        |FROM documents""".stripMargin,
    "text_langid" ->
      s"""WITH h AS (
         |  SELECT doc_id, ${hitsSql("de")} AS h_de, ${hitsSql("en")} AS h_en,
         |         ${hitsSql("es")} AS h_es, ${hitsSql("fr")} AS h_fr
         |  FROM documents)
         |SELECT doc_id, h_de, h_en, h_es, h_fr,
         |       CASE WHEN h_de >= GREATEST(h_en, h_es, h_fr) THEN 'de'
         |            WHEN h_en >= GREATEST(h_es, h_fr) THEN 'en'
         |            WHEN h_es >= h_fr THEN 'es'
         |            ELSE 'fr' END AS lang_guess
         |FROM h""".stripMargin,
    // mirrors TextAnalysis.langConfusion: the langid CTE joined to the
    // labeled lang column, per-(label, guess) cells + within-label rate
    "text_langid_confusion" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, ${hitsSql("de")} AS h_de, ${hitsSql("en")} AS h_en,
         |         ${hitsSql("es")} AS h_es, ${hitsSql("fr")} AS h_fr
         |  FROM documents),
         |g AS (
         |  SELECT lang,
         |         CASE WHEN h_de >= GREATEST(h_en, h_es, h_fr) THEN 'de'
         |              WHEN h_en >= GREATEST(h_es, h_fr) THEN 'en'
         |              WHEN h_es >= h_fr THEN 'es'
         |              ELSE 'fr' END AS lang_guess
         |  FROM h),
         |c AS (SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1, 2),
         |t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang FROM c GROUP BY 1)
         |SELECT c.lang, c.lang_guess, c.n, t.n_lang,
         |       CAST(c.n AS DOUBLE) / CAST(t.n_lang AS DOUBLE) AS rate
         |FROM c JOIN t USING (lang)""".stripMargin,
    // mirrors TextAnalysis.scriptProfile (RE2 script classes = Java Is-
    // classes for these four scripts; counts are match counts, not length)
    "text_script_profile" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(COALESCE(text, ''), '\p{Latin}')) AS BIGINT) AS n_latin,
        |    CAST(len(regexp_extract_all(COALESCE(text, ''), '\p{Han}')) AS BIGINT) AS n_han,
        |    CAST(len(regexp_extract_all(COALESCE(text, ''), '\p{Cyrillic}')) AS BIGINT) AS n_cyrillic,
        |    CAST(len(regexp_extract_all(COALESCE(text, ''), '\p{Arabic}')) AS BIGINT) AS n_arabic,
        |    CAST(len(regexp_extract_all(COALESCE(text, ''), '[^\p{Latin}\p{Han}\p{Cyrillic}\p{Arabic}\s]')) AS BIGINT) AS n_other_chars,
        |    CAST(len(regexp_extract_all(COALESCE(text, ''), '\s')) AS BIGINT) AS n_space
        |  FROM documents),
        |t AS (SELECT *, n_latin + n_han + n_cyrillic + n_arabic + n_other_chars AS total,
        |             GREATEST(n_latin, n_han, n_cyrillic, n_arabic) AS top
        |      FROM c)
        |SELECT doc_id, n_latin, n_han, n_cyrillic, n_arabic, n_other_chars, n_space,
        |       CASE WHEN total = 0 THEN NULL
        |            WHEN n_latin = top AND top > 0 THEN 'latin'
        |            WHEN n_han = top AND top > 0 THEN 'han'
        |            WHEN n_cyrillic = top AND top > 0 THEN 'cyrillic'
        |            WHEN n_arabic = top AND top > 0 THEN 'arabic'
        |            ELSE 'other' END AS dominant_script,
        |       CASE WHEN total > 0 THEN CAST(top AS DOUBLE) / CAST(total AS DOUBLE) END AS dominant_frac
        |FROM t""".stripMargin,
    // mirrors TextAnalysis.lexicalDiversity: per-doc word counts ->
    // type/hapax rollup, exact-integer ratios
    "text_lexical_diversity" ->
      """WITH w AS (
        |  SELECT doc_id, UNNEST(string_split(lower(COALESCE(text, '')), ' ')) AS w
        |  FROM documents),
        |c AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
        |             CAST(COUNT(*) AS BIGINT) AS n_types,
        |             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        |      FROM c GROUP BY 1)
        |SELECT doc_id, n_words, n_types, n_hapax,
        |       CAST(n_types AS DOUBLE) / CAST(NULLIF(n_words, 0) AS DOUBLE) AS ttr,
        |       CAST(n_hapax AS DOUBLE) / CAST(NULLIF(n_types, 0) AS DOUBLE) AS hapax_frac
        |FROM a""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |       len(string_split(text, ' ')) AS n_words,
         |       len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 1.0 / length(text) AS punct_ratio,
         |       ${hitsSql("en")} * 1.0 / len(string_split(lower(text), ' ')) AS stopword_ratio,
         |       length(text) * 1.0 / len(string_split(text, ' ')) AS avg_word_len,
         |       LEAST(1.0, len(string_split(text, ' ')) / 100.0)
         |             * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 1.0 / length(text))
         |             * LEAST(1.0, 4.0 * ${hitsSql("en")} / len(string_split(lower(text), ' ')) + 0.5) AS quality
         |FROM documents""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |       (SELECT MIN(md5(substr(text, i, 12))) FROM UNNEST(range(1, length(text) - 10)) AS t(i)) AS fingerprint
        |FROM documents""".stripMargin,
    "text_urls" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         lower(text || ' see https://www.site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org/p/' || CAST(doc_id AS VARCHAR)
        |              || ' and http://cdn' || CAST(doc_id % 3 AS VARCHAR) || '.example.net/x?q=1') AS lt
        |  FROM documents)
        |SELECT doc_id,
        |       len(regexp_extract_all(lt, 'https?://([a-z0-9.-]+)[^ ]*')) AS n_urls,
        |       array_to_string(list_sort(list_distinct(regexp_extract_all(lt, 'https?://([a-z0-9.-]+)[^ ]*', 1))), ',') AS hosts,
        |       nullif(regexp_extract(regexp_extract(lt, 'https?://([a-z0-9.-]+)[^ ]*', 1), '([a-z0-9-]+\.[a-z0-9-]+)$', 1), '') AS first_domain
        |FROM d""".stripMargin,
    "text_gopher_rep" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         text || chr(10) || 'subscribe now'
        |              || chr(10) || 'item ' || CAST(doc_id % 5 AS VARCHAR)
        |              || chr(10) || CASE WHEN doc_id % 2 = 0 THEN 'subscribe now' ELSE 'uniq ' || CAST(doc_id AS VARCHAR) END
        |              || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'buy now buy now buy now' ELSE '' END AS text
        |  FROM documents),
        |l AS (SELECT doc_id, text, list_filter(string_split(text, chr(10)), x -> x != '') AS lines FROM d),
        |lm AS (SELECT doc_id, text, len(lines) AS n_lines,
        |         len(list_filter(lines, x -> len(list_filter(lines, y -> y = x)) >= 2)) AS dup_occ,
        |         COALESCE(list_sum(list_transform(lines, x -> length(x))), 0) AS line_chars,
        |         COALESCE(list_sum(list_transform(list_filter(lines, x -> len(list_filter(lines, y -> y = x)) >= 2), x -> length(x))), 0) AS dup_chars
        |       FROM l),
        |w AS (SELECT doc_id, text, n_lines, dup_occ, line_chars, dup_chars,
        |        list_filter(regexp_split_to_array(text, '[ \t\n\r]+'), x -> x != '') AS ws FROM lm),
        |u2 AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS gram FROM w, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
        |u3 AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS gram FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |u4 AS (SELECT doc_id, array_to_string(ws[i:i+3], ' ') AS gram FROM w, UNNEST(range(1, len(ws) - 2)) AS t(i) WHERE len(ws) >= 4),
        |t2 AS (SELECT doc_id, c AS c2, length(gram) AS h2 FROM (
        |         SELECT doc_id, gram, COUNT(*) AS c, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, gram) AS rn
        |         FROM u2 GROUP BY 1, 2) WHERE rn = 1),
        |t3 AS (SELECT doc_id, c AS c3, length(gram) AS h3 FROM (
        |         SELECT doc_id, gram, COUNT(*) AS c, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, gram) AS rn
        |         FROM u3 GROUP BY 1, 2) WHERE rn = 1),
        |t4 AS (SELECT doc_id, c AS c4, length(gram) AS h4 FROM (
        |         SELECT doc_id, gram, COUNT(*) AS c, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, gram) AS rn
        |         FROM u4 GROUP BY 1, 2) WHERE rn = 1),
        |f AS (
        |  SELECT w.doc_id, w.n_lines,
        |         CAST(dup_occ AS DOUBLE) / nullif(n_lines, 0) AS dup_line_frac,
        |         CAST(dup_chars AS DOUBLE) / nullif(line_chars, 0) AS dup_line_char_frac,
        |         CASE WHEN COALESCE(c2, 0) >= 2 THEN CAST(COALESCE(c2, 0) * COALESCE(h2, 0) AS DOUBLE) / nullif(length(w.text), 0) ELSE 0.0 END AS top2_char_frac,
        |         CASE WHEN COALESCE(c3, 0) >= 2 THEN CAST(COALESCE(c3, 0) * COALESCE(h3, 0) AS DOUBLE) / nullif(length(w.text), 0) ELSE 0.0 END AS top3_char_frac,
        |         CASE WHEN COALESCE(c4, 0) >= 2 THEN CAST(COALESCE(c4, 0) * COALESCE(h4, 0) AS DOUBLE) / nullif(length(w.text), 0) ELSE 0.0 END AS top4_char_frac
        |  FROM w LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id) LEFT JOIN t4 USING (doc_id))
        |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
        |       dup_line_frac, dup_line_char_frac, top2_char_frac, top3_char_frac, top4_char_frac,
        |       CAST(CASE WHEN COALESCE(dup_line_frac <= 0.30, TRUE) THEN 1 ELSE 0 END AS BIGINT) AS ok_dup_line,
        |       CAST(CASE WHEN COALESCE(dup_line_char_frac <= 0.20, TRUE) THEN 1 ELSE 0 END AS BIGINT) AS ok_dup_line_chars,
        |       CAST(CASE WHEN COALESCE(top2_char_frac <= 0.20, TRUE) THEN 1 ELSE 0 END AS BIGINT) AS ok_top2,
        |       CAST(CASE WHEN COALESCE(top3_char_frac <= 0.18, TRUE) THEN 1 ELSE 0 END AS BIGINT) AS ok_top3,
        |       CAST(CASE WHEN COALESCE(top4_char_frac <= 0.16, TRUE) THEN 1 ELSE 0 END AS BIGINT) AS ok_top4,
        |       CAST(CASE WHEN COALESCE(dup_line_frac <= 0.30, TRUE) THEN 1 ELSE 0 END
        |          * CASE WHEN COALESCE(dup_line_char_frac <= 0.20, TRUE) THEN 1 ELSE 0 END
        |          * CASE WHEN COALESCE(top2_char_frac <= 0.20, TRUE) THEN 1 ELSE 0 END
        |          * CASE WHEN COALESCE(top3_char_frac <= 0.18, TRUE) THEN 1 ELSE 0 END
        |          * CASE WHEN COALESCE(top4_char_frac <= 0.16, TRUE) THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM f""".stripMargin,
    "text_blocklist" ->
      """SELECT doc_id,
        |       CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), x -> list_contains(['slow', 'skew'], x))) AS BIGINT) AS n_blocked,
        |       CAST(CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), x -> list_contains(['slow', 'skew'], x))) = 0
        |            THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM documents""".stripMargin,
    "text_domain_filter" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         text || ' see http://' || source || '.example/item?id=' || CAST(doc_id AS VARCHAR)
        |              || ' and https://mirror.' || source || '.example/item' AS text
        |  FROM documents),
        |h AS (SELECT doc_id, list_distinct(regexp_extract_all(lower(text), 'https?://([a-z0-9.-]+)[^ ]*', 1)) AS hosts FROM d),
        |m AS (SELECT doc_id, len(hosts) AS n_hosts,
        |        len(list_intersect(
        |          list_distinct(list_transform(hosts, x -> regexp_extract(x, '([a-z0-9-]+\.[a-z0-9-]+)$', 1))),
        |          ['src3.example', 'src7.example'])) AS nd
        |      FROM h)
        |SELECT doc_id, CAST(n_hosts AS BIGINT) AS n_hosts, CAST(nd AS BIGINT) AS n_denied_domains,
        |       CAST(CASE WHEN nd = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM m""".stripMargin,
    "text_repetition" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         CASE WHEN len(ws) >= 3 THEN [array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws) - 1)]
        |              ELSE [] END AS grams
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents))
        |SELECT doc_id,
        |       len(grams) AS n_grams,
        |       len(list_distinct(grams)) AS n_distinct_grams,
        |       (len(grams) - len(list_distinct(grams))) * 1.0 / nullif(len(grams), 0) AS dup_gram_ratio
        |FROM g""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    // mirrors Dedup.winnow(gramLen=12, window=16): per-position 12-gram md5,
    // min over each 16-gram window (clipped windows only via the guard; short
    // docs keep their single i=1 clipped min), DISTINCT minima
    "dedup_winnow" ->
      """WITH g AS (
        |  SELECT doc_id, i, md5(substr(text, i, 12)) AS h, length(text) - 11 AS n_grams
        |  FROM documents, UNNEST(range(1, length(text) - 10)) AS t(i)
        |  WHERE length(text) >= 12),
        |wm AS (
        |  SELECT doc_id, n_grams, i,
        |         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
        |                      ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
        |  FROM g)
        |SELECT DISTINCT doc_id, fp FROM wm
        |WHERE i + 15 <= n_grams OR (n_grams < 16 AND i = 1)""".stripMargin,
    // winnow-pair candidates over a planted-copy corpus (every 10th doc is
    // its neighbor's text under a new prefix): shared-fingerprint join,
    // n_shared >= 2
    "dedup_winnow_pairs" ->
      """WITH nb AS (SELECT doc_id + 1 AS doc_id, text AS ntext FROM documents),
        |p AS (SELECT d.doc_id,
        |        CASE WHEN d.doc_id % 10 = 0 AND nb.ntext IS NOT NULL
        |             THEN 'copy prefix ' || nb.ntext
        |             ELSE d.text END AS text
        |      FROM documents d LEFT JOIN nb ON d.doc_id = nb.doc_id),
        |g AS (
        |  SELECT doc_id, i, md5(substr(text, i, 12)) AS h, length(text) - 11 AS n_grams
        |  FROM p, UNNEST(range(1, length(text) - 10)) AS t(i)
        |  WHERE length(text) >= 12),
        |wm AS (
        |  SELECT doc_id, n_grams, i,
        |         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
        |                      ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
        |  FROM g),
        |fps AS (
        |  SELECT DISTINCT doc_id, fp FROM wm
        |  WHERE i + 15 <= n_grams OR (n_grams < 16 AND i = 1))
        |SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM fps x JOIN fps y ON x.fp = y.fp AND x.doc_id < y.doc_id
        |GROUP BY 1, 2
        |HAVING COUNT(*) >= 2""".stripMargin,
    "dedup_fuzzy_exact" ->
      """WITH nb AS (SELECT doc_id + 1 AS doc_id, text AS ntext FROM documents),
        |p AS (SELECT d.doc_id,
        |        CASE WHEN d.doc_id % 10 = 0 AND nb.ntext IS NOT NULL
        |             THEN upper(replace(nb.ntext, ' ', '  ')) || ' !!!'
        |             ELSE d.text END AS text
        |      FROM documents d LEFT JOIN nb ON d.doc_id = nb.doc_id)
        |SELECT md5(trim(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9]+', ' ', 'g'))) AS norm_hash,
        |       MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
        |FROM p GROUP BY 1""".stripMargin,
    "text_contamination" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |       UNNEST(range(1, len(ws) - 6)) AS t(i)),
        |probes AS (SELECT doc_id AS probe_id, g FROM g WHERE doc_id % 10 = 0)
        |SELECT d.doc_id, p.probe_id, COUNT(*) AS shared
        |FROM g d JOIN probes p ON d.g = p.g AND d.doc_id != p.probe_id
        |GROUP BY 1, 2
        |HAVING COUNT(*) >= 3""".stripMargin,
    "text_redact" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
        |              || ' tel +1 555 01' || CAST(doc_id % 90 + 10 AS VARCHAR) AS text
        |  FROM documents)
        |, r AS (
        |  SELECT doc_id, text AS t0,
        |         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |  FROM d),
        |r2 AS (
        |  SELECT doc_id, t0, t1,
        |         regexp_replace(t1, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS t2
        |  FROM r)
        |SELECT doc_id,
        |       len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |       len(regexp_extract_all(t1, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
        |       len(regexp_extract_all(t2, '\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,8}')) AS n_phones,
        |       regexp_replace(t2, '\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,8}', '<PHONE>', 'g') AS redacted
        |FROM r2""".stripMargin,
    // mirrors Curation.splitReport(205, 26): the split hash cut plus a
    // 3-row rollup with pinned share divisions
    "curate_split_report" ->
      """WITH a AS (
        |  SELECT CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |              WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
        |              ELSE 'test' END AS split,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |s AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |      FROM a GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t_docs,
        |             CAST(SUM(n_tokens) AS BIGINT) AS t_tokens FROM s)
        |SELECT s.split, s.n_docs, s.n_tokens,
        |       CAST(s.n_docs AS DOUBLE) / CAST(t.t_docs AS DOUBLE) AS doc_share,
        |       CAST(s.n_tokens AS DOUBLE) / CAST(t.t_tokens AS DOUBLE) AS token_share
        |FROM s, t""".stripMargin,
    // mirrors Curation.interleaveOrder: single-window per-source rank (=
    // the two-level sharded rank by okey-prefix order), r*S + idx slots
    "curate_interleave" ->
      """WITH k AS (SELECT doc_id, source,
        |                  md5('interleave:' || CAST(doc_id AS VARCHAR)) AS okey
        |           FROM documents),
        |r AS (SELECT doc_id, source,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY source
        |                    ORDER BY okey, doc_id) AS BIGINT) AS src_rank
        |      FROM k),
        |si AS (SELECT source,
        |              CAST(ROW_NUMBER() OVER (ORDER BY source) - 1 AS BIGINT) AS src_idx
        |       FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM si)
        |SELECT r.doc_id, r.source, r.src_rank,
        |       (r.src_rank - 1) * ns.n + si.src_idx AS interleave_pos
        |FROM r JOIN si ON r.source = si.source, ns""".stripMargin,
    // mirrors TextAnalysis.casingProfile(maxCapsRatio=0.3) over the
    // planted shouting corpus: same RE2 token classes
    "text_casing" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 19 = 0 THEN upper(text) ELSE text END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM d),
        |c AS (SELECT doc_id,
        |             CAST(len(ws) AS BIGINT) AS n_words,
        |             CAST(len(list_filter(ws,
        |                    w -> regexp_matches(w, '^[A-Z]{2,}$'))) AS BIGINT) AS n_allcaps,
        |             CAST(len(list_filter(ws,
        |                    w -> regexp_matches(w, '^[A-Z][a-z]+$'))) AS BIGINT) AS n_capitalized
        |      FROM t)
        |SELECT doc_id, n_words, n_allcaps, n_capitalized,
        |       CAST(n_allcaps AS DOUBLE) / CAST(n_words AS DOUBLE) AS allcaps_ratio,
        |       CAST(CASE WHEN CAST(n_allcaps AS DOUBLE) / CAST(n_words AS DOUBLE) > 0.3
        |                 THEN 1 ELSE 0 END AS BIGINT) AS shouting
        |FROM c""".stripMargin,
    // mirrors TextAnalysis.vocabDrift(topN=200, flagAt=0.1) over the
    // flooded-source plant: total-order head, DECIMAL(28,12) p*ln(p/m)
    // terms, exact per-source sums, one closing /2
    "text_vocab_drift" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         CASE WHEN source = 'src3'
        |              THEN text || ' the the the the the the the the the the'
        |              ELSE text END AS text
        |  FROM documents),
        |w AS (SELECT source, w FROM (
        |        SELECT source, UNNEST(string_split(lower(text), ' ')) AS w FROM d)
        |      WHERE w != ''),
        |hd AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cq FROM w GROUP BY 1
        |       ORDER BY cq DESC, w ASC LIMIT 200),
        |tq AS (SELECT CAST(SUM(cq) AS BIGINT) AS tq FROM hd),
        |sc AS (SELECT w.source, w.w, CAST(COUNT(*) AS BIGINT) AS cp
        |       FROM w JOIN hd ON w.w = hd.w GROUP BY 1, 2),
        |st AS (SELECT source, CAST(SUM(cp) AS BIGINT) AS tp FROM sc GROUP BY 1),
        |g AS (SELECT st.source, st.tp, hd.w, hd.cq, tq.tq,
        |             COALESCE(sc.cp, 0) AS cp
        |      FROM st CROSS JOIN hd CROSS JOIN tq
        |      LEFT JOIN sc ON sc.source = st.source AND sc.w = hd.w),
        |t AS (SELECT source, tp,
        |        CASE WHEN cp = 0 THEN CAST(0.0 AS DECIMAL(28,12))
        |             ELSE CAST((CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE))
        |                  * ln((CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE))
        |                       / ((CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE)
        |                           + CAST(cq AS DOUBLE) / CAST(tq AS DOUBLE)) / 2.0))
        |                  AS DECIMAL(28,12)) END AS term_p,
        |        CAST((CAST(cq AS DOUBLE) / CAST(tq AS DOUBLE))
        |             * ln((CAST(cq AS DOUBLE) / CAST(tq AS DOUBLE))
        |                  / ((CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE)
        |                      + CAST(cq AS DOUBLE) / CAST(tq AS DOUBLE)) / 2.0))
        |             AS DECIMAL(28,12)) AS term_q
        |      FROM g),
        |r AS (SELECT source, tp AS source_head_tokens,
        |             CAST(COUNT(*) AS BIGINT) AS head_words,
        |             CAST(SUM(term_p + term_q) AS DOUBLE) / 2.0 AS jsd_nats
        |      FROM t GROUP BY 1, 2)
        |SELECT source, head_words, source_head_tokens, jsd_nats,
        |       CAST(CASE WHEN jsd_nats > 0.1 THEN 1 ELSE 0 END AS BIGINT) AS drifted
        |FROM r""".stripMargin,
    // mirrors TextAnalysis.langMix(mixedAt=0.15, minPresent=2) over the
    // code-switching plant: the four lexicon counters, langGuess CASE,
    // pinned fraction thresholds
    "text_lang_mix" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 11 = 0
         |              THEN text || ' el la los las y de que no se una por con para'
         |              ELSE text END AS text
         |  FROM documents),
         |h AS (SELECT doc_id,
         |             CAST(${hitsSql("de")} AS BIGINT) AS h_de,
         |             CAST(${hitsSql("en")} AS BIGINT) AS h_en,
         |             CAST(${hitsSql("es")} AS BIGINT) AS h_es,
         |             CAST(${hitsSql("fr")} AS BIGINT) AS h_fr,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
         |      FROM d),
         |f AS (SELECT *,
         |        (CASE WHEN CAST(h_de AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.15
         |              THEN 1 ELSE 0 END
         |       + CASE WHEN CAST(h_en AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.15
         |              THEN 1 ELSE 0 END
         |       + CASE WHEN CAST(h_es AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.15
         |              THEN 1 ELSE 0 END
         |       + CASE WHEN CAST(h_fr AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.15
         |              THEN 1 ELSE 0 END) AS np
         |      FROM h)
         |SELECT doc_id, h_de, h_en, h_es, h_fr, n_words,
         |       CASE WHEN h_de >= GREATEST(h_en, h_es, h_fr) THEN 'de'
         |            WHEN h_en >= GREATEST(h_es, h_fr) THEN 'en'
         |            WHEN h_es >= h_fr THEN 'es'
         |            ELSE 'fr' END AS primary_lang,
         |       CAST(np AS BIGINT) AS n_langs_present,
         |       CAST(CASE WHEN np >= 2 THEN 1 ELSE 0 END AS BIGINT) AS mixed
         |FROM f""".stripMargin,
    // mirrors TextAnalysis.bigramEntropy(flagBelow=2.0) over the template
    // plant: same bigram extraction, quantized-ln exact entropy sums
    "text_bigram_entropy" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 37 = 0 THEN repeat('ab', 100) ELSE text END AS text
        |  FROM documents),
        |lt AS (SELECT doc_id, lower(text) AS lt FROM d WHERE length(text) >= 2),
        |g AS (SELECT doc_id,
        |             UNNEST(list_transform(range(1, length(lt)), i -> substr(lt, i, 2))) AS g
        |      FROM lt),
        |c AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1, 2),
        |t AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |             CAST(COUNT(*) AS BIGINT) AS n_distinct
        |      FROM c GROUP BY 1),
        |en AS (SELECT c.doc_id,
        |             CAST(-SUM(CAST((CAST(c.c AS DOUBLE) / CAST(t.n_bigrams AS DOUBLE))
        |                  * ln(CAST(c.c AS DOUBLE) / CAST(t.n_bigrams AS DOUBLE))
        |                  AS DECIMAL(28,12))) AS DOUBLE) AS entropy_nats
        |      FROM c JOIN t ON c.doc_id = t.doc_id GROUP BY 1)
        |SELECT t.doc_id, t.n_bigrams, t.n_distinct, en.entropy_nats,
        |       CAST(CASE WHEN en.entropy_nats < 2.0 THEN 1 ELSE 0 END AS BIGINT) AS gibberish
        |FROM t JOIN en ON t.doc_id = en.doc_id""".stripMargin,
    // mirrors Curation.pipelineKeep(0.3, 15, 8000) over the duplicate
    // plant: quality CTE, q-survivor min-id dedup, per-source rank <= 15,
    // single-window global budget (= the bucket scheme by reassociation)
    "curate_pipeline_keep" ->
      s"""WITH d0 AS (
         |  SELECT d.doc_id,
         |         CASE WHEN d.doc_id % 10 = 0 AND nb.ntext IS NOT NULL
         |              THEN nb.ntext ELSE d.text END AS text,
         |         d.source
         |  FROM documents d LEFT JOIN
         |       (SELECT doc_id + 1 AS doc_id, text AS ntext FROM documents) nb
         |    ON d.doc_id = nb.doc_id),
         |b AS (
         |  SELECT doc_id, source, md5(text) AS h,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |         LEAST(1.0, len(string_split(text, ' ')) / 100.0)
         |               * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 1.0 / length(text))
         |               * LEAST(1.0, 4.0 * ${hitsSql("en")} / len(string_split(lower(text), ' ')) + 0.5)
         |           AS quality
         |  FROM d0),
         |q AS (SELECT b.*, CASE WHEN quality >= 0.3 THEN 1 ELSE 0 END AS q_keep FROM b),
         |k AS (SELECT h, MIN(doc_id) AS keep_id FROM q WHERE q_keep = 1 GROUP BY 1),
         |dd AS (SELECT q.*, CASE WHEN q.q_keep = 1 AND q.doc_id = k.keep_id
         |                        THEN 1 ELSE 0 END AS dedup_keep
         |       FROM q LEFT JOIN k ON q.h = k.h),
         |cp AS (SELECT doc_id FROM (
         |         SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY source
         |                ORDER BY quality DESC, doc_id) AS rank
         |         FROM dd WHERE dedup_keep = 1) WHERE rank <= 15),
         |cc AS (SELECT dd.*, CASE WHEN cp.doc_id IS NOT NULL THEN 1 ELSE 0 END AS cap_keep
         |       FROM dd LEFT JOIN cp ON dd.doc_id = cp.doc_id),
         |bu AS (SELECT doc_id, cum_words FROM (
         |         SELECT doc_id, CAST(SUM(n_words) OVER (ORDER BY quality DESC, doc_id
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_words
         |         FROM cc WHERE cap_keep = 1) WHERE cum_words <= 8000)
         |SELECT cc.doc_id, cc.source, cc.n_words, cc.quality,
         |       CAST(cc.q_keep AS BIGINT) AS q_keep,
         |       CAST(cc.dedup_keep AS BIGINT) AS dedup_keep,
         |       CAST(cc.cap_keep AS BIGINT) AS cap_keep,
         |       CAST(CASE WHEN bu.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS final_keep,
         |       bu.cum_words
         |FROM cc LEFT JOIN bu ON cc.doc_id = bu.doc_id""".stripMargin,
    // mirrors TextAnalysis.ocrArtifacts(minMixed=2, maxSingleRatio=0.2)
    // over the planted scan damage: same RE2 patterns verbatim
    "text_ocr_artifacts" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 23 = 0
        |                THEN text || chr(10) || 'hyphen-' || chr(10) || 'ated continuation'
        |              WHEN doc_id % 29 = 0 THEN text || ' w0rd t3xt c0de'
        |              WHEN doc_id % 31 = 0
        |                THEN text || ' a b c d e f g h i j k l m n o p q r s t u v w x y z'
        |              ELSE text END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, lower(text) AS lt, string_split(lower(text), ' ') AS ws FROM d),
        |c AS (SELECT doc_id,
        |             CAST(len(regexp_extract_all(lt, '[a-z]-\n[a-z]')) AS BIGINT) AS n_hyphen_breaks,
        |             CAST(len(list_filter(ws,
        |                    w -> regexp_matches(w, '^[a-z]+[0-9]+[a-z]+$'))) AS BIGINT) AS n_mixed_alnum,
        |             CAST(len(list_filter(ws,
        |                    w -> regexp_matches(w, '^[a-z]$'))) AS BIGINT) AS n_single_char,
        |             CAST(len(ws) AS BIGINT) AS n_tokens
        |      FROM t)
        |SELECT doc_id, n_hyphen_breaks, n_mixed_alnum, n_single_char, n_tokens,
        |       CAST(n_single_char AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS single_char_ratio,
        |       CAST(CASE WHEN n_hyphen_breaks >= 1 OR n_mixed_alnum >= 2
        |              OR CAST(n_single_char AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.2
        |            THEN 1 ELSE 0 END AS BIGINT) AS suspect
        |FROM c""".stripMargin,
    // mirrors Curation.piiReport over the modular PII plant: the redaction
    // chain's counting order (emails on t0, ips on t1, phones on t2)
    "curate_pii_report" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         text
        |         || CASE WHEN doc_id % 4 = 0
        |              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |              ELSE '' END
        |         || CASE WHEN doc_id % 6 = 0
        |              THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
        |              ELSE '' END
        |         || CASE WHEN doc_id % 10 = 0
        |              THEN ' tel +1 555 01' || CAST(doc_id % 90 + 10 AS VARCHAR)
        |              ELSE '' END AS text
        |  FROM documents),
        |r AS (SELECT doc_id, source, text AS t0,
        |             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                            '<EMAIL>', 'g') AS t1
        |      FROM d),
        |r2 AS (SELECT doc_id, source, t0, t1,
        |              regexp_replace(t1, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS t2
        |       FROM r),
        |c AS (SELECT source,
        |             CAST(len(regexp_extract_all(t0,
        |                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS e,
        |             CAST(len(regexp_extract_all(t1,
        |                    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS i,
        |             CAST(len(regexp_extract_all(t2,
        |                    '\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,8}')) AS BIGINT) AS p
        |      FROM r2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(e) AS BIGINT) AS n_emails, CAST(SUM(i) AS BIGINT) AS n_ips,
        |       CAST(SUM(p) AS BIGINT) AS n_phones,
        |       CAST(SUM(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
        |       CAST(SUM(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) AS pii_doc_rate
        |FROM c GROUP BY 1""".stripMargin,
    "text_normalize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         text || ' caf' || 'e' || chr(769)
        |              || '  A' || chr(778)
        |              || CASE WHEN doc_id % 2 = 0 THEN ' ' || chr(8491) ELSE ' ' || chr(197) END
        |              || ' n' || chr(771) || 'o'
        |              || chr(7) || 'beep' || chr(1)
        |              || '   tail   ' AS text
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, text,
        |         trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'), '  +', ' ', 'g')) AS text_norm
        |  FROM d)
        |SELECT doc_id, text_norm, length(text) AS n_cp_src, length(text_norm) AS n_cp_norm,
        |       text_norm <> text AS changed
        |FROM n""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH sh AS ($Shingles),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
         |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1)
         |SELECT p.a, p.b, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
         |FROM p JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
         |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8""".stripMargin,
    "dedup_containment" ->
      s"""WITH sh AS ($Shingles),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
         |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1)
         |SELECT p.a, p.b, sa.n AS n_a, sb.n AS n_b,
         |       inter * 1.0 / LEAST(sa.n, sb.n) AS containment
         |FROM p JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
         |WHERE inter * 1.0 / LEAST(sa.n, sb.n) >= 0.5""".stripMargin,
    // mirrors Curation.qualityCalibration: the oracle-pinned quality CTE,
    // floor-decile buckets (NULL -> -1), fixed-point mean, exact dup flags
    "curate_quality_calibration" ->
      s"""WITH $scoredSql,
         |hsh AS (SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents),
         |dc AS (SELECT h, COUNT(*) AS c FROM hsh GROUP BY 1),
         |f AS (SELECT hsh.doc_id,
         |             CAST(CASE WHEN c > 1 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
         |      FROM hsh JOIN dc USING (h)),
         |b AS (SELECT CAST(CASE WHEN quality IS NULL THEN -1
         |                       ELSE LEAST(CAST(floor(quality * 10) AS BIGINT), 9)
         |                  END AS BIGINT) AS q_bucket,
         |             s.n_words, f.is_dup,
         |             CAST(floor(quality * 1000000 + 0.5) AS BIGINT) AS qfp
         |      FROM s JOIN f ON s.doc_id = f.doc_id),
         |g AS (SELECT q_bucket, COUNT(*) AS n_docs,
         |             CAST(SUM(n_words) AS BIGINT) AS n_words,
         |             CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
         |             CAST(SUM(qfp) AS BIGINT) AS qfp_sum
         |      FROM b GROUP BY 1)
         |SELECT q_bucket, n_docs, n_words, n_dup_docs,
         |       CAST(qfp_sum AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1000000.0 AS mean_quality,
         |       CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
         |FROM g""".stripMargin,
    "curate_near_dup_matrix" ->
      s"""WITH sh AS ($Shingles),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
         |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |c AS (SELECT p.a, p.b
         |      FROM p JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
         |      WHERE inter * 1.0 / LEAST(sa.n, sb.n) >= 0.5)
         |SELECT LEAST(da.source, db.source) AS source_a,
         |       GREATEST(da.source, db.source) AS source_b,
         |       COUNT(*) AS n_near_dup_pairs
         |FROM c JOIN documents da ON c.a = da.doc_id
         |       JOIN documents db ON c.b = db.doc_id
         |GROUP BY 1, 2""".stripMargin,
    "dedup_ngram_jaccard_capped" ->
      s"""WITH sh0 AS ($Shingles),
         |freq AS (SELECT s FROM (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY 1) WHERE df <= 5),
         |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN freq USING (s)),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
         |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh0 GROUP BY 1)
         |SELECT p.a, p.b, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
         |FROM p JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
         |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7""".stripMargin,
    "curate_hash_sample" ->
      """SELECT doc_id FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'""".stripMargin,
    "curate_weighted_sample" -> WeightedSampleOracleSql,
    "curate_stratified" ->
      s"""WITH l AS (
         |  SELECT doc_id,
         |         CASE WHEN h_de >= GREATEST(h_en, h_es, h_fr) THEN 'de'
         |              WHEN h_en >= GREATEST(h_es, h_fr) THEN 'en'
         |              WHEN h_es >= h_fr THEN 'es'
         |              ELSE 'fr' END AS lang_guess
         |  FROM (SELECT doc_id, ${hitsSql("de")} AS h_de, ${hitsSql("en")} AS h_en,
         |               ${hitsSql("es")} AS h_es, ${hitsSql("fr")} AS h_fr FROM documents))
         |SELECT doc_id, lang_guess FROM l
         |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <
         |      substr('0123456789abcdefg',
         |             (CASE lang_guess WHEN 'en' THEN 4 WHEN 'es' THEN 8 ELSE 16 END) + 1, 1)""".stripMargin,
    // single-window reference form of Curation.qualitySummary — the bucket
    // decomposition is exact because buckets are order-aligned with quality
    "curate_quality_summary" ->
      s"""WITH $scoredSql,
         |r AS (SELECT lang_guess, quality, doc_id,
         |             ROW_NUMBER() OVER (PARTITION BY lang_guess ORDER BY quality, doc_id) AS rk,
         |             COUNT(*) OVER (PARTITION BY lang_guess) AS n
         |      FROM s WHERE quality IS NOT NULL)
         |SELECT lang_guess,
         |       CAST(MAX(n) AS BIGINT) AS n_docs,
         |       MIN(quality) AS min_q,
         |       MAX(quality) AS max_q,
         |       MAX(CASE WHEN rk = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT) THEN quality END) AS p50,
         |       MAX(CASE WHEN rk = CAST(ceil(CAST(0.9 AS DOUBLE) * n) AS BIGINT) THEN quality END) AS p90,
         |       MAX(CASE WHEN rk = CAST(ceil(CAST(0.99 AS DOUBLE) * n) AS BIGINT) THEN quality END) AS p99
         |FROM r GROUP BY lang_guess""".stripMargin,
    "curate_dup_report" ->
      """WITH d AS (
        |  SELECT source, text FROM documents
        |  UNION ALL
        |  SELECT source, text FROM documents WHERE doc_id % 5 = 0)
        |SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT md5(COALESCE(text, ''))) AS n_distinct,
        |       COUNT(*) - COUNT(DISTINCT md5(COALESCE(text, ''))) AS n_dup_docs,
        |       CAST(COUNT(*) - COUNT(DISTINCT md5(COALESCE(text, ''))) AS DOUBLE) / COUNT(*) AS dup_rate
        |FROM d GROUP BY 1""".stripMargin,
    // mirrors Curation.packStats over the curate_pack layout (ctxLen=256)
    "curate_pack_stats" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, shard, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        |  FROM t),
        |a AS (
        |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |         CAST(SUM(CASE WHEN start % 256 + n_tokens > 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
        |  FROM s GROUP BY 1)
        |SELECT shard, n_docs, n_tokens,
        |       (n_tokens + 255) // 256 AS n_packs,
        |       CAST(n_tokens AS DOUBLE) / CAST(((n_tokens + 255) // 256) * 256 AS DOUBLE) AS fill_rate,
        |       n_split_docs,
        |       CAST(n_split_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS split_frac
        |FROM a""".stripMargin,
    // mirrors Curation.dedupSavings over the mirror-planted corpus: exact
    // survivors = min doc_id per md5; near survivors = jaccard keep-list
    "curate_dedup_savings" ->
      """WITH RECURSIVE d2 AS MATERIALIZED (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text, 'mirror' FROM documents WHERE doc_id % 5 = 0),
        |base AS (SELECT doc_id, source,
        |                CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_tok
        |         FROM d2),
        |ek AS (SELECT MIN(doc_id) AS doc_id FROM d2 GROUP BY md5(COALESCE(text, ''))),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
        |       FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM d2),
        |            UNNEST(range(1, len(ws) - 1)) AS t(i)),
        |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT p.a, p.b FROM p
        |  JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
        |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7),
        |edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY 1),
        |dr AS (SELECT doc_id FROM comp WHERE doc_id != cluster_id),
        |agg AS (
        |  SELECT base.source,
        |         CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |         CAST(COUNT(ek.doc_id) AS BIGINT) AS n_docs_exact,
        |         CAST(SUM(CASE WHEN ek.doc_id IS NOT NULL THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens_exact,
        |         CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_near,
        |         CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens_near
        |  FROM base LEFT JOIN ek ON base.doc_id = ek.doc_id
        |            LEFT JOIN dr ON base.doc_id = dr.doc_id
        |  GROUP BY 1)
        |SELECT source, n_docs, n_tokens, n_docs_exact, n_tokens_exact, n_docs_near, n_tokens_near,
        |       1.0 - CAST(n_tokens_exact AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS exact_savings,
        |       1.0 - CAST(n_tokens_near AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS near_savings
        |FROM agg""".stripMargin,
    "curate_topk_quality" ->
      s"""WITH $scoredSql
         |SELECT lang_guess, rank, doc_id, quality FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang_guess ORDER BY quality DESC, doc_id) AS rank
         |  FROM s)
         |WHERE rank <= 50""".stripMargin,
    "curate_token_budget" ->
      s"""WITH $scoredSql
         |SELECT lang_guess, doc_id, quality, n_words, cum_words FROM (
         |  SELECT *, CAST(SUM(n_words) OVER (PARTITION BY lang_guess ORDER BY quality DESC, doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_words
         |  FROM s)
         |WHERE cum_words <= 20000""".stripMargin,
    "search_hybrid_rrf" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |q AS (SELECT doc_id AS query_id, array_to_string((string_split(text, ' '))[1:4], ' ') AS qtext
        |      FROM documents WHERE doc_id % 97 = 0),
        |qt AS (SELECT DISTINCT query_id, term
        |       FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q)),
        |dt AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
        |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM dt GROUP BY 1, 2, 3),
        |m AS (SELECT qt.query_id, tf.doc_id, tf.dl, tf.term, tf.tf FROM tf JOIN qt USING (term)),
        |dfq AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT term, doc_id FROM m) GROUP BY 1),
        |st AS (SELECT COUNT(*) AS n_docs, SUM(len(ws)) AS sum_dl FROM w),
        |cc AS (SELECT m.query_id, m.doc_id,
        |        CAST((ln(1 + ((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)))
        |              * ((m.tf * (1.2 + 1)) / (m.tf + (1.2 * ((1.0 - 0.75) + ((0.75 * m.dl)
        |                / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))))) AS DECIMAL(28,9)) AS c
        |      FROM m JOIN dfq USING (term) CROSS JOIN st),
        |sc AS (SELECT query_id, doc_id, SUM(c) AS score, COUNT(*) AS n_terms FROM cc GROUP BY 1, 2),
        |lex AS (SELECT query_id, doc_id, rank FROM (
        |          SELECT query_id, doc_id,
        |                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |          FROM sc) WHERE rank <= 10),
        |kc AS (SELECT qv.vec_id AS query_id, d.vec_id AS doc_id,
        |         ${CosineSql.replace("q.embedding", "qv.embedding")} AS sim
        |       FROM embeddings qv JOIN embeddings d ON qv.vec_id % 97 = 0 AND d.vec_id != qv.vec_id),
        |sem AS (SELECT query_id, doc_id, rank FROM (
        |          SELECT query_id, doc_id,
        |                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS BIGINT) AS rank
        |          FROM kc) WHERE rank <= 10),
        |j AS (SELECT COALESCE(l.query_id, s.query_id) AS query_id,
        |             COALESCE(l.doc_id, s.doc_id) AS doc_id,
        |             l.rank AS rank_a, s.rank AS rank_b
        |      FROM lex l FULL OUTER JOIN sem s ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
        |f AS (SELECT *, COALESCE(1.0 / (60 + rank_a), 0.0) + COALESCE(1.0 / (60 + rank_b), 0.0) AS rrf FROM j)
        |SELECT query_id, rank, doc_id, rrf, rank_a, rank_b FROM (
        |  SELECT query_id, doc_id, rrf, rank_a, rank_b,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
        |  FROM f)
        |WHERE rank <= 10""".stripMargin,
    // mirrors Search.rankCorrelation over the k=15 lexical/semantic hit
    // lists (the hybrid oracle's lex/sem CTEs at rank <= 15): exact d^2
    // sums over the intersection, pinned Spearman close, n < 2 -> NULL
    "search_rank_corr" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |q AS (SELECT doc_id AS query_id, array_to_string((string_split(text, ' '))[1:4], ' ') AS qtext
        |      FROM documents WHERE doc_id % 97 = 0),
        |qt AS (SELECT DISTINCT query_id, term
        |       FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q)),
        |dt AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
        |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM dt GROUP BY 1, 2, 3),
        |m AS (SELECT qt.query_id, tf.doc_id, tf.dl, tf.term, tf.tf FROM tf JOIN qt USING (term)),
        |dfq AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT term, doc_id FROM m) GROUP BY 1),
        |st AS (SELECT COUNT(*) AS n_docs, SUM(len(ws)) AS sum_dl FROM w),
        |cc AS (SELECT m.query_id, m.doc_id,
        |        CAST((ln(1 + ((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)))
        |              * ((m.tf * (1.2 + 1)) / (m.tf + (1.2 * ((1.0 - 0.75) + ((0.75 * m.dl)
        |                / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))))) AS DECIMAL(28,9)) AS c
        |      FROM m JOIN dfq USING (term) CROSS JOIN st),
        |sc AS (SELECT query_id, doc_id, SUM(c) AS score FROM cc GROUP BY 1, 2),
        |lex AS (SELECT query_id, doc_id, rank FROM (
        |          SELECT query_id, doc_id,
        |                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |          FROM sc) WHERE rank <= 15),
        |kc AS (SELECT qv.vec_id AS query_id, d.vec_id AS doc_id,
        |         ${CosineSql.replace("q.embedding", "qv.embedding")} AS sim
        |       FROM embeddings qv JOIN embeddings d ON qv.vec_id % 97 = 0 AND d.vec_id != qv.vec_id),
        |sem AS (SELECT query_id, doc_id, rank FROM (
        |          SELECT query_id, doc_id,
        |                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS BIGINT) AS rank
        |          FROM kc) WHERE rank <= 15),
        |j AS (SELECT l.query_id, l.doc_id, l.rank AS ra, s.rank AS rb
        |      FROM lex l JOIN sem s ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
        |rr AS (SELECT query_id,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ra, doc_id) AS BIGINT) AS ca,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rb, doc_id) AS BIGINT) AS cb
        |       FROM j),
        |g AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_common,
        |             CAST(SUM((ca - cb) * (ca - cb)) AS BIGINT) AS sum_d2
        |      FROM rr GROUP BY 1)
        |SELECT query_id, n_common, sum_d2,
        |       CASE WHEN n_common >= 2 THEN
        |         1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
        |           / CAST(n_common * (n_common * n_common - 1) AS DOUBLE)
        |       END AS spearman_rho
        |FROM g""".stripMargin,
    // mirrors TextAnalysis.vocabCoverage(50/90/99): count-value rollup,
    // exclusive desc cum sums, integer boundary interpolation
    "text_vocab_coverage" ->
      """WITH v AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |             SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents)
        |           WHERE w != '' GROUP BY 1),
        |g AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS nw,
        |             CAST(n * COUNT(*) AS BIGINT) AS mass
        |      FROM v GROUP BY 1),
        |c AS (SELECT n, nw, mass,
        |             CAST(COALESCE(SUM(nw) OVER wd, 0) AS BIGINT) AS cum_words,
        |             CAST(COALESCE(SUM(mass) OVER wd, 0) AS BIGINT) AS cum_mass
        |      FROM g WINDOW wd AS (ORDER BY n DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |t AS (SELECT CAST(SUM(mass) AS BIGINT) AS t_mass,
        |             CAST(SUM(nw) AS BIGINT) AS t_vocab FROM g),
        |p AS (SELECT CAST(UNNEST([50, 90, 99]) AS BIGINT) AS pct)
        |SELECT p.pct, CAST((p.pct * t.t_mass + 99) // 100 AS BIGINT) AS target_mass,
        |       CAST(c.cum_words
        |            + ((p.pct * t.t_mass + 99) // 100 - c.cum_mass + c.n - 1) // c.n
        |          AS BIGINT) AS vocab_needed,
        |       c.n AS boundary_count, t.t_vocab AS total_vocab, t.t_mass AS total_tokens
        |FROM c, t, p
        |WHERE c.cum_mass < (p.pct * t.t_mass + 99) // 100
        |  AND c.cum_mass + c.mass >= (p.pct * t.t_mass + 99) // 100""".stripMargin,
    "search_hard_negatives" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |q AS (SELECT doc_id AS query_id, array_to_string((string_split(text, ' '))[1:4], ' ') AS qtext
        |      FROM documents WHERE doc_id % 97 = 0),
        |qt AS (SELECT DISTINCT query_id, term
        |       FROM (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q)),
        |dt AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
        |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM dt GROUP BY 1, 2, 3),
        |m AS (SELECT qt.query_id, tf.doc_id, tf.dl, tf.term, tf.tf FROM tf JOIN qt USING (term)),
        |dfq AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT term, doc_id FROM m) GROUP BY 1),
        |st AS (SELECT COUNT(*) AS n_docs, SUM(len(ws)) AS sum_dl FROM w),
        |c AS (SELECT m.query_id, m.doc_id,
        |        CAST((ln(1 + ((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)))
        |              * ((m.tf * (1.2 + 1)) / (m.tf + (1.2 * ((1.0 - 0.75) + ((0.75 * m.dl)
        |                / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))))))) AS DECIMAL(28,9)) AS c
        |      FROM m JOIN dfq USING (term) CROSS JOIN st),
        |sc AS (SELECT query_id, doc_id, SUM(c) AS score, COUNT(*) AS n_terms FROM c GROUP BY 1, 2),
        |f AS (SELECT query_id, doc_id, CAST(score AS DOUBLE) AS score, n_terms FROM (
        |        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS r0
        |        FROM sc)
        |      WHERE r0 <= 15),
        |n AS (SELECT query_id, doc_id, score, n_terms FROM f WHERE doc_id != query_id)
        |SELECT query_id, rank, doc_id, score, n_terms FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |  FROM n)
        |WHERE rank <= 10""".stripMargin,
    "search_bm25" -> Bm25Top10OracleSql,
    // identical oracle: the maintained index must reproduce the batch
    // full-corpus ranking bit-exactly
    "search_bm25_store" -> Bm25Top10OracleSql,
    // the aged store scores ONLY the surviving corpus: same construction,
    // w/st/df computed over documents minus the dropped 11ths (probe
    // queries still derive from the full table)
    "search_bm25_ageoff" -> bm25Top10OracleSqlOver("WHERE doc_id % 11 != 0"),
    // retrieval-coverage audit over the SAME bm25 top-10: how much of the
    // corpus is reachable from the probe set, and does each probe's own
    // source doc come back rank-1 (the self-retrieval sanity bit)
    "search_coverage" ->
      s"""WITH hits AS (SELECT * FROM ($Bm25Top10OracleSql)),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
         |SELECT CAST(COUNT(DISTINCT hits.doc_id) AS BIGINT) AS n_reachable,
         |       (SELECT n_docs FROM st) AS n_docs,
         |       CAST(COUNT(DISTINCT hits.doc_id) AS DOUBLE)
         |         / CAST((SELECT n_docs FROM st) AS DOUBLE) AS coverage,
         |       CAST(SUM(CASE WHEN hits.rank = 1 AND hits.doc_id = hits.query_id THEN 1 ELSE 0 END) AS BIGINT) AS n_self_top1,
         |       CAST(COUNT(DISTINCT hits.query_id) AS BIGINT) AS n_queries
         |FROM hits""".stripMargin,
    // mirrors Search.tfidfTopK (SMART lnc.ltn): per-term contributions and
    // norm squares quantized to DECIMAL(28,9) before their exact sums, full
    // lnc doc norm over matched docs only, one pinned double score division
    "search_tfidf" -> TfidfLncLtnOracleSql,
    "search_tfidf_store" -> TfidfLncLtnOracleSql,
    // mirrors Search.dirichletTopK(mu=1000) in its DECOMPOSED form: per-query
    // constant + |q|·ln(dl+mu) + matched adjustments, each ln quantized
    // DECIMAL(18,9) and scaled to an exact 1e-9 fixed-point BIGINT — integer
    // arithmetic from there, one pinned double division at export
    "search_dirichlet_ql" -> DirichletQlOracleSql,
    "search_dirichlet_store" -> DirichletQlOracleSql,
    "search_prf_store" -> searchPrfOracleSql(),
    "dedup_keep_list" ->
      s"""WITH RECURSIVE sh AS ($Shingles),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
         |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT p.a, p.b FROM p
         |  JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
         |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7),
         |edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |reps AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY 1)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM reps WHERE doc_id != cluster_id)""".stripMargin,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE sh AS ($Shingles),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
         |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT p.a, p.b FROM p
         |  JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
         |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7),
         |edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY 1),
         |q AS (SELECT doc_id,
         |        LEAST(1.0, len(string_split(text, ' ')) / 100.0)
         |              * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 1.0 / length(text))
         |              * LEAST(1.0, 4.0 * ${hitsSql("en")} / len(string_split(lower(text), ' ')) + 0.5) AS quality
         |      FROM documents),
         |m AS (SELECT q.doc_id, COALESCE(c.cluster_id, q.doc_id) AS cluster_id, q.quality
         |      FROM q LEFT JOIN comp c ON q.doc_id = c.doc_id),
         |w AS (SELECT cluster_id, doc_id AS keep_doc_id FROM (
         |        SELECT cluster_id, doc_id,
         |               ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY COALESCE(quality, -1.0) DESC, doc_id) AS rn
         |        FROM m) WHERE rn = 1)
         |SELECT m.doc_id, m.cluster_id, m.quality, w.keep_doc_id
         |FROM m JOIN w USING (cluster_id)""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE sh AS ($Shingles),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
         |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT p.a, p.b FROM p
         |  JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
         |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7),
         |edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
         |SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY 1""".stripMargin,
    // mirrors Dedup.clusterSizes(threshold=0.7): component-size histogram
    // plus one size-1 row for the unclustered remainder
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE sh AS ($Shingles),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
         |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT p.a, p.b FROM p
         |  JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
         |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7),
         |edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY 1),
         |pc AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1),
         |hist AS (SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM pc GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
         |ncl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clustered FROM comp),
         |sing AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
         |                n_total - n_clustered AS n_clusters
         |         FROM tot, ncl WHERE n_total - n_clustered > 0),
         |allh AS (SELECT cluster_size, CAST(SUM(n_clusters) AS BIGINT) AS n_clusters
         |         FROM (SELECT * FROM hist UNION ALL SELECT * FROM sing) GROUP BY 1)
         |SELECT cluster_size, n_clusters,
         |       CAST(cluster_size * n_clusters AS BIGINT) AS n_docs,
         |       CAST(cluster_size * n_clusters AS DOUBLE) / CAST(n_total AS DOUBLE) AS frac_docs
         |FROM allh, tot""".stripMargin,
    // mirrors Dedup.dfProfile: shingle df aggregate, binary-digit bucket,
    // exact pair mass df*(df-1)/2 in HUGEINT
    "dedup_df_profile" ->
      s"""WITH sh AS ($Shingles),
         |dfq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY 1),
         |b AS (SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS bucket,
         |             CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |             CAST(SUM(df) AS BIGINT) AS n_postings,
         |             SUM(CAST(df AS HUGEINT) * (df - 1) // 2) AS pm
         |      FROM dfq GROUP BY 1),
         |t AS (SELECT SUM(pm) AS t_pm FROM b)
         |SELECT bucket, CAST(2 ** bucket AS BIGINT) AS min_df, n_shingles, n_postings,
         |       CAST(pm AS DOUBLE) AS pair_mass,
         |       CASE WHEN t_pm > 0 THEN CAST(pm AS DOUBLE) / CAST(t_pm AS DOUBLE) END AS pair_mass_share
         |FROM b, t""".stripMargin,
    // mirrors Dedup.thresholdSweep (defaults 0.50..0.95 step 0.05): the
    // threshold-independent scored-pair frame probed cumulatively
    "dedup_threshold_sweep" ->
      s"""WITH sh AS ($Shingles),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
         |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |scored AS (
         |  SELECT inter * 1.0 / (sa.n + sb.n - inter) AS jaccard FROM p
         |  JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
         |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
         |probe AS (SELECT CAST(t / 20.0 AS DOUBLE) AS threshold
         |          FROM UNNEST(range(10, 20)) AS u(t))
         |SELECT probe.threshold, CAST(COUNT(scored.jaccard) AS BIGINT) AS n_pairs
         |FROM probe LEFT JOIN scored ON scored.jaccard >= probe.threshold
         |GROUP BY 1""".stripMargin,
    "dedup_cross_corpus" ->
      s"""WITH shin AS (SELECT * FROM ($Shingles) WHERE doc_id % 10 = 0),
         |shex AS (SELECT * FROM ($Shingles) WHERE doc_id % 10 != 0),
         |p AS (SELECT a.doc_id AS incoming_id, b.doc_id AS existing_id, COUNT(*) AS inter
         |      FROM shin a JOIN shex b ON a.s = b.s GROUP BY 1, 2),
         |szin AS (SELECT doc_id, COUNT(*) AS n FROM shin GROUP BY 1),
         |szex AS (SELECT doc_id, COUNT(*) AS n FROM shex GROUP BY 1)
         |SELECT incoming_id, existing_id, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
         |FROM p JOIN szin sa ON p.incoming_id = sa.doc_id
         |       JOIN szex sb ON p.existing_id = sb.doc_id
         |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5""".stripMargin,
    "dedup_minhash_lsh" -> MinhashLshOracleSql,
    // the maintained-signature-store screen (bootstrap pairs ∪ increment
    // pairs over disjoint 2/3 + 1/3 splits) covers exactly the full-corpus
    // batch LSH candidate set — SAME oracle as dedup_minhash_lsh
    "dedup_lsh_store" -> MinhashLshOracleSql,
    // mirrors minhashLshIncremental: signatures are doc-local, so the
    // oracle filters the full signature frame to the v1+added corpus and
    // pairs only new-side bands against it
    // mirrors lshCandidates over the AGED store: signatures of the
    // surviving corpus (doc_id % 11 != 0) union the re-keyed delta
    // (same text => same signatures, ids shifted), delta-anchored band
    // join, similarity from the union signature table
    "dedup_lsh_ageoff" ->
      s"""WITH mh0 AS ($MinhashSql),
         |mhd AS (SELECT doc_id + 1000000 AS doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7
         |        FROM mh0 WHERE doc_id % 7 = 0),
         |mh AS (SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7
         |       FROM mh0 WHERE doc_id % 11 != 0
         |       UNION ALL
         |       SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7 FROM mhd),
         |bands AS (
         |  SELECT doc_id, b, key FROM mh, LATERAL (VALUES
         |    (0, mh0 || mh1), (1, mh2 || mh3), (2, mh4 || mh5), (3, mh6 || mh7)) AS v(b, key)),
         |newb AS (SELECT * FROM bands WHERE doc_id >= 1000000),
         |cand AS (
         |  SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS a, GREATEST(a.doc_id, b.doc_id) AS b
         |  FROM newb a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id != b.doc_id)
         |SELECT cand.a, cand.b,
         |       ((x.mh0 = y.mh0)::INT + (x.mh1 = y.mh1)::INT + (x.mh2 = y.mh2)::INT
         |            + (x.mh3 = y.mh3)::INT + (x.mh4 = y.mh4)::INT + (x.mh5 = y.mh5)::INT
         |            + (x.mh6 = y.mh6)::INT + (x.mh7 = y.mh7)::INT) / 8.0 AS est_jaccard
         |FROM cand JOIN mh x ON cand.a = x.doc_id JOIN mh y ON cand.b = y.doc_id""".stripMargin,
    "dedup_incremental" ->
      s"""WITH mh0 AS ($MinhashSql),
         |mh AS (SELECT * FROM mh0 WHERE NOT (doc_id % 7 = 0 AND doc_id % 5 = 0)),
         |bands AS (
         |  SELECT doc_id, b, key FROM mh, LATERAL (VALUES
         |    (0, mh0 || mh1), (1, mh2 || mh3), (2, mh4 || mh5), (3, mh6 || mh7)) AS v(b, key)),
         |newb AS (SELECT * FROM bands WHERE doc_id % 7 = 0),
         |cand AS (
         |  SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS a, GREATEST(a.doc_id, b.doc_id) AS b
         |  FROM newb a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id != b.doc_id)
         |SELECT cand.a, cand.b,
         |       ((x.mh0 = y.mh0)::INT + (x.mh1 = y.mh1)::INT + (x.mh2 = y.mh2)::INT
         |            + (x.mh3 = y.mh3)::INT + (x.mh4 = y.mh4)::INT + (x.mh5 = y.mh5)::INT
         |            + (x.mh6 = y.mh6)::INT + (x.mh7 = y.mh7)::INT) / 8.0 AS est_jaccard
         |FROM cand JOIN mh x ON cand.a = x.doc_id JOIN mh y ON cand.b = y.doc_id""".stripMargin,
    // mirrors minhashLsh(maxBucket=3): identical band construction, with
    // over-populated (band, key) buckets removed before the candidate join
    "dedup_minhash_lsh_capped" ->
      s"""WITH mh AS ($MinhashSql),
         |bands AS (
         |  SELECT doc_id, b, key FROM mh, LATERAL (VALUES
         |    (0, mh0 || mh1), (1, mh2 || mh3), (2, mh4 || mh5), (3, mh6 || mh7)) AS v(b, key)),
         |ok AS (SELECT b, key FROM (SELECT b, key, COUNT(*) AS n FROM bands GROUP BY 1, 2) WHERE n <= 3),
         |cb AS (SELECT bands.* FROM bands JOIN ok USING (b, key)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM cb a JOIN cb b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT cand.a, cand.b,
         |       ((x.mh0 = y.mh0)::INT + (x.mh1 = y.mh1)::INT + (x.mh2 = y.mh2)::INT
         |            + (x.mh3 = y.mh3)::INT + (x.mh4 = y.mh4)::INT + (x.mh5 = y.mh5)::INT
         |            + (x.mh6 = y.mh6)::INT + (x.mh7 = y.mh7)::INT) / 8.0 AS est_jaccard
         |FROM cand JOIN mh x ON cand.a = x.doc_id JOIN mh y ON cand.b = y.doc_id""".stripMargin,
    // mirrors Dedup.minhashAudit(threshold=0.8): the dedup_minhash_lsh
    // candidates left-joined to candidate-bounded exact shingle jaccard
    "dedup_minhash_audit" ->
      s"""WITH mh AS ($MinhashSql),
         |bands AS (
         |  SELECT doc_id, b, key FROM mh, LATERAL (VALUES
         |    (0, mh0 || mh1), (1, mh2 || mh3), (2, mh4 || mh5), (3, mh6 || mh7)) AS v(b, key)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT cand.a, cand.b,
         |         ((x.mh0 = y.mh0)::INT + (x.mh1 = y.mh1)::INT + (x.mh2 = y.mh2)::INT
         |              + (x.mh3 = y.mh3)::INT + (x.mh4 = y.mh4)::INT + (x.mh5 = y.mh5)::INT
         |              + (x.mh6 = y.mh6)::INT + (x.mh7 = y.mh7)::INT) / 8.0 AS est_jaccard
         |  FROM cand JOIN mh x ON cand.a = x.doc_id JOIN mh y ON cand.b = y.doc_id),
         |sh AS ($Shingles),
         |cd AS (SELECT a AS doc_id FROM cand UNION SELECT b FROM cand),
         |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN cd ON sh.doc_id = cd.doc_id),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
         |      FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
         |ex AS (SELECT p.a, p.b, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
         |       FROM p JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id)
         |SELECT est.a, est.b, est.est_jaccard,
         |       COALESCE(ex.jaccard, 0.0) AS exact_jaccard,
         |       CAST(COALESCE(ex.jaccard, 0.0) >= 0.8 AS BIGINT) AS true_pos
         |FROM est LEFT JOIN ex ON est.a = ex.a AND est.b = ex.b""".stripMargin,
    "dedup_simhash" ->
      """WITH words AS (
        |  SELECT DISTINCT doc_id, md5(w) AS h
        |  FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM documents)),
        |bits AS (
        |  SELECT doc_id, i,
        |         SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, 1 + i // 4, 1)) - 1) // POWER(2, i % 4)::INT) % 2 = 1
        |                  THEN 1 ELSE -1 END) AS bal
        |  FROM words, UNNEST(range(64)) AS t(i)
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT doc_id, string_agg(CASE WHEN bal > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS simhash
        |  FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, simhash, bd, substr(simhash, CAST(bd * 8 + 1 AS INT), 8) AS key
        |  FROM sh, UNNEST(range(8)) AS t(bd))
        |SELECT DISTINCT a, b, hamming FROM (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |         (SELECT COUNT(*) FROM UNNEST(range(1, 65)) AS u(j)
        |          WHERE substr(x.simhash, j, 1) != substr(y.simhash, j, 1)) AS hamming
        |  FROM bands x JOIN bands y ON x.bd = y.bd AND x.key = y.key AND x.doc_id < y.doc_id)
        |WHERE hamming <= 6""".stripMargin,
    // mirrors simhashPairs(maxBucket=3) exactly: the same 2-of-8 band-pair
    // blocking (string-form keys biject with the packed-LONG ones) and the
    // same per-(band-pair, key) frequency cap before the candidate self-join
    "dedup_simhash_capped" ->
      """WITH words AS (
        |  SELECT DISTINCT doc_id, md5(w) AS h
        |  FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM documents)),
        |bits AS (
        |  SELECT doc_id, i,
        |         SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, 1 + i // 4, 1)) - 1) // POWER(2, i % 4)::INT) % 2 = 1
        |                  THEN 1 ELSE -1 END) AS bal
        |  FROM words, UNNEST(range(64)) AS t(i)
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT doc_id, string_agg(CASE WHEN bal > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS simhash
        |  FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, simhash, i, j,
        |         substr(simhash, CAST(i * 8 + 1 AS INT), 8)
        |           || substr(simhash, CAST(j * 8 + 1 AS INT), 8) AS key
        |  FROM sh, UNNEST(range(8)) AS t1(i), UNNEST(range(8)) AS t2(j)
        |  WHERE i < j),
        |ok AS (
        |  SELECT i, j, key FROM (SELECT i, j, key, COUNT(*) AS n FROM bands GROUP BY 1, 2, 3)
        |  WHERE n <= 3),
        |cand AS (SELECT b.* FROM bands b JOIN ok USING (i, j, key))
        |SELECT DISTINCT a, b, hamming FROM (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |         (SELECT COUNT(*) FROM UNNEST(range(1, 65)) AS u(jj)
        |          WHERE substr(x.simhash, jj, 1) != substr(y.simhash, jj, 1)) AS hamming
        |  FROM cand x JOIN cand y
        |    ON x.i = y.i AND x.j = y.j AND x.key = y.key AND x.doc_id < y.doc_id)
        |WHERE hamming <= 6""".stripMargin,
    // mirrors simhashScreen(maxHamming=6, maxPerBucket=4): band-pair
    // buckets keep the 4 lowest doc_ids as representatives; a doc flags iff
    // a lower-id representative in one of its buckets is within Hamming 6,
    // best match by (hamming, rep_id)
    "dedup_simhash_screen" ->
      """WITH words AS (
        |  SELECT DISTINCT doc_id, md5(w) AS h
        |  FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM documents)),
        |bits AS (
        |  SELECT doc_id, i,
        |         SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, 1 + i // 4, 1)) - 1) // POWER(2, i % 4)::INT) % 2 = 1
        |                  THEN 1 ELSE -1 END) AS bal
        |  FROM words, UNNEST(range(64)) AS t(i)
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT doc_id, string_agg(CASE WHEN bal > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS simhash
        |  FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, simhash, i, j,
        |         substr(simhash, CAST(i * 8 + 1 AS INT), 8)
        |           || substr(simhash, CAST(j * 8 + 1 AS INT), 8) AS key
        |  FROM sh, UNNEST(range(8)) AS t1(i), UNNEST(range(8)) AS t2(j)
        |  WHERE i < j),
        |reps AS (
        |  SELECT i, j, key, doc_id AS rep_id, simhash AS rep_sig,
        |         ROW_NUMBER() OVER (PARTITION BY i, j, key ORDER BY doc_id) AS rn
        |  FROM bands),
        |hits AS (
        |  SELECT b.doc_id, r.rep_id,
        |         (SELECT COUNT(*) FROM UNNEST(range(1, 65)) AS u(jj)
        |          WHERE substr(b.simhash, jj, 1) != substr(r.rep_sig, jj, 1)) AS hamming
        |  FROM bands b JOIN reps r
        |    ON b.i = r.i AND b.j = r.j AND b.key = r.key
        |   AND r.rn <= 4 AND r.rep_id < b.doc_id),
        |f AS (SELECT doc_id, MIN(hamming) AS hamming FROM hits WHERE hamming <= 6 GROUP BY 1),
        |fm AS (SELECT h.doc_id, f.hamming, MIN(h.rep_id) AS match_id
        |       FROM hits h JOIN f ON h.doc_id = f.doc_id AND h.hamming = f.hamming
        |       GROUP BY 1, 2)
        |SELECT s.doc_id,
        |       CAST(CASE WHEN fm.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS near_dup,
        |       fm.match_id, CAST(fm.hamming AS BIGINT) AS hamming
        |FROM sh s LEFT JOIN fm ON s.doc_id = fm.doc_id""".stripMargin,
    // mirrors Similarity.pairCosineHistogram: md5 two-hex-digit blocks,
    // per-block 32-row cap ordered by (md5, id), in-block pairs, cosine via
    // per-side precomputed norms, floor-binned into 20 slices of [-1, 1]
    "embed_pair_hist" ->
      """WITH s0 AS (
        |  SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS h,
        |         ((strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16
        |          + strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1) % 64 AS block
        |  FROM embeddings),
        |s AS (SELECT * FROM (
        |        SELECT s0.*, ROW_NUMBER() OVER (PARTITION BY block ORDER BY h, vec_id) AS rn FROM s0)
        |      WHERE rn <= 32),
        |p AS (SELECT
        |        list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(d.embedding AS DOUBLE[]))
        |        / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
        |         * sqrt(list_dot_product(CAST(d.embedding AS DOUBLE[]), CAST(d.embedding AS DOUBLE[])))) AS cos
        |      FROM s q JOIN s d ON q.block = d.block AND q.vec_id < d.vec_id),
        |binned AS (SELECT LEAST(GREATEST(CAST(FLOOR((cos + CAST(1.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE) * 20) AS BIGINT), 0), 19) AS bin
        |           FROM p)
        |SELECT bin,
        |       CAST(-1.0 AS DOUBLE) + CAST(bin AS DOUBLE) * CAST(0.1 AS DOUBLE) AS lo,
        |       CAST(-1.0 AS DOUBLE) + CAST(bin + 1 AS DOUBLE) * CAST(0.1 AS DOUBLE) AS hi,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM binned GROUP BY 1""".stripMargin,
    // mirrors Similarity.centroidDrift: even/odd vec_id halves, 2^-20-grid
    // fixed-point sums, HUGEINT products, one pinned double cosine per label
    "embed_drift" ->
      """WITH e AS (SELECT label, vec_id % 2 AS split, vec_id,
        |                  UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS d
        |           FROM embeddings),
        |f AS (SELECT label, split, d,
        |             CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT)) AS HUGEINT) AS fp,
        |             CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2, 3),
        |j AS (SELECT ev.label, ev.d, ev.fp AS fe, od.fp AS fo, ev.n AS n_even, od.n AS n_odd
        |      FROM f ev JOIN f od ON ev.label = od.label AND ev.d = od.d
        |                         AND ev.split = 0 AND od.split = 1),
        |g AS (SELECT label, MAX(n_even) AS n_even, MAX(n_odd) AS n_odd,
        |             SUM(fe * fo) AS num, SUM(fe * fe) AS ne, SUM(fo * fo) AS no
        |      FROM j GROUP BY 1)
        |SELECT CAST(label AS BIGINT) AS label, n_even, n_odd,
        |       CAST(num AS DOUBLE) / (sqrt(CAST(ne AS DOUBLE)) * sqrt(CAST(no AS DOUBLE))) AS cosine
        |FROM g WHERE ne != 0 AND no != 0""".stripMargin,
    "embed_knn" ->
      s"""WITH c AS (
         |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         |         $CosineSql AS sim
         |  FROM embeddings q JOIN embeddings d ON q.vec_id < 5 AND d.vec_id != q.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM c)
         |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= 5""".stripMargin,
    // mirrors Similarity.knnMargin: the k=2 knn pivoted per query, margin
    // as the one pinned double subtraction
    "embed_knn_margin" ->
      s"""WITH c AS (
         |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         |         $CosineSql AS sim
         |  FROM embeddings q JOIN embeddings d ON q.vec_id < 5 AND d.vec_id != q.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM c)
         |SELECT query_id,
         |       MAX(CASE WHEN rank = 1 THEN neighbor_id END) AS top1_id,
         |       MAX(CASE WHEN rank = 1 THEN sim END) AS top1_sim,
         |       MAX(CASE WHEN rank = 2 THEN sim END) AS top2_sim,
         |       MAX(CASE WHEN rank = 1 THEN sim END) - MAX(CASE WHEN rank = 2 THEN sim END) AS margin
         |FROM r WHERE rank <= 2 GROUP BY 1""".stripMargin,
    // mirrors SimilarityIvf.ivfKnn(nLists=16, nProbe=4, k=5) step for step:
    // same md5 seed order, same sequential-fold dot products, same tie-breaks
    "embed_ivf_knn" ->
      (IvfTopCte + "\nSELECT query_id, neighbor_id, sim, rank FROM ivf_top"),
    "embed_ivf_store" ->
      (IvfTopCte + "\nSELECT query_id, neighbor_id, sim, rank FROM ivf_top"),
    "embed_ivf_ageoff" ->
      (IvfAgedTopCte + "\nSELECT query_id, neighbor_id, sim, rank FROM ivf_top"),
    // mirrors Similarity.recallReport(ivfKnn, bruteForceKnn): the IVF top-k
    // above vs the exact top-k of embed_knn, per-query hits and one IEEE
    // hits/k_eff division
    "embed_recall_report" -> (IvfTopCte + recallCloseSql("")),
    // the nProbe tuning curve: the same recall audit at nProbe 1/2/4 —
    // the "how many lists must we probe" serving decision in one frame
    "embed_recall_sweep" -> Seq(1, 2, 4).map { np =>
      "SELECT * FROM (WITH " + ivfCoreCtes(np) +
        recallCloseSql(s"CAST($np AS BIGINT) AS nprobe, ") + ")"
    }.mkString("\nUNION ALL\n"),
    // same cents/assigned/probes construction as embed_ivf_knn, with the
    // embed_knn_int8 quantization CTE scoring inside the probed lists
    "embed_ivf_knn_int8" ->
      """WITH cents AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS list_id,
        |         embedding AS centroid,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS cnorm
        |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        |corpus AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vnorm
        |  FROM embeddings),
        |qv AS (
        |  SELECT vec_id, CAST(mx AS DOUBLE) / 127 AS scale,
        |         list_transform(embedding, v -> FLOOR(CAST(v AS DOUBLE)/mx*127 + 0.5)) AS q
        |  FROM (SELECT vec_id, embedding,
        |               list_aggregate(list_transform(embedding, v -> abs(v)), 'max') AS mx
        |        FROM embeddings)
        |  WHERE mx > 0 AND isfinite(mx)),
        |assigned AS (
        |  SELECT vec_id, list_id FROM (
        |    SELECT c.vec_id, t.list_id,
        |           ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
        |             list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(t.centroid AS DOUBLE[]))
        |               / (c.vnorm * t.cnorm) DESC, t.list_id) AS rn
        |    FROM corpus c CROSS JOIN cents t)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, list_id FROM (
        |    SELECT q.vec_id AS query_id, t.list_id,
        |           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |             list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(t.centroid AS DOUBLE[]))
        |               / (q.vnorm * t.cnorm) DESC, t.list_id) AS rn
        |    FROM corpus q CROSS JOIN cents t WHERE q.vec_id < 5)
        |  WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |         list_inner_product(qb.q, qa.q) * (qb.scale * qa.scale) AS score
        |  FROM assigned a JOIN probes p ON a.list_id = p.list_id AND a.vec_id != p.query_id
        |  JOIN qv qa ON a.vec_id = qa.vec_id
        |  JOIN qv qb ON p.query_id = qb.vec_id)
        |SELECT query_id, neighbor_id, score, rank FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    // mirrors SimilarityPq.encode over the seeded codebook — the PQ store
    "embed_pq_codes" ->
      (PqCte + "\nSELECT vec_id, code_1, code_2, code_3, code_4 FROM codes"),
    // mirrors SimilarityPq.adcKnn(k=5): per-query subspace distance tables,
    // fixed-parenthesization 4-term ADC sum, (adist, neighbor_id) rank
    "embed_pq_knn" ->
      (PqCte + PqAdcTopCtes +
        "\nSELECT query_id, neighbor_id, adist, rank FROM pq_top WHERE rank <= 5"),
    // PQ index-quality audit: ADC top-5 vs brute-force ground truth — the
    // compression-loss counterpart of embed_recall_report's IVF audit
    "embed_pq_recall" ->
      (PqCte + PqAdcTopCtes + s""",
        |bf_scored AS (
        |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
        |         $CosineSql AS sim
        |  FROM embeddings q JOIN embeddings d ON q.vec_id < 5 AND d.vec_id != q.vec_id),
        |bf_top AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |    FROM bf_scored)
        |  WHERE rank <= 5),
        |base AS (SELECT query_id, COUNT(*) AS k_eff FROM bf_top GROUP BY 1),
        |h AS (SELECT g.query_id, COUNT(*) AS hits
        |      FROM bf_top g JOIN (SELECT * FROM pq_top WHERE rank <= 5) a
        |        ON a.query_id = g.query_id AND a.neighbor_id = g.neighbor_id
        |      GROUP BY 1)
        |SELECT b.query_id, b.k_eff, COALESCE(h.hits, 0) AS hits,
        |       CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(b.k_eff AS DOUBLE) AS recall
        |FROM base b LEFT JOIN h ON b.query_id = h.query_id""".stripMargin),
    // mirrors Similarity.bqKnn(bits=64): same md5-parity hyperplanes as the
    // 8-bit LSH CTE, sign bits as a string, per-position Hamming count
    "embed_bq_knn" ->
      """WITH elems64 AS (
        |  SELECT vec_id, UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS d FROM embeddings),
        |bits64 AS (
        |  SELECT vec_id, j,
        |         SUM(CAST(v AS DOUBLE) * (CASE WHEN (strpos('0123456789abcdef',
        |             substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d - 1 AS VARCHAR)), 1 + (d - 1) % 32, 1)) - 1) % 2 = 1
        |           THEN 1.0 ELSE -1.0 END)) AS acc
        |  FROM elems64, UNNEST(range(64)) AS t(j)
        |  GROUP BY 1, 2),
        |sig64 AS (
        |  SELECT vec_id, string_agg(CASE WHEN acc > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS sig
        |  FROM bits64 GROUP BY vec_id),
        |q64 AS (SELECT vec_id AS query_id, sig AS qs FROM sig64 WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, s.vec_id AS neighbor_id,
        |         CAST((SELECT COUNT(*) FROM range(1, 65) t(j)
        |               WHERE substr(s.sig, CAST(j AS INTEGER), 1) != substr(q.qs, CAST(j AS INTEGER), 1)) AS BIGINT) AS hamming
        |  FROM sig64 s CROSS JOIN q64 q WHERE s.vec_id != q.query_id)
        |SELECT query_id, neighbor_id, hamming, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    // mirrors Similarity.prefixKnn(prefixDim=16, overfetch=4): prefix-cosine
    // stage keeps 20 candidates, exact full-dim cosine re-ranks to 5
    // mirrors Similarity.rpProject(outDim=16, scaleBits=20): the LshSigCte
    // sign rule under the 'rp:' salt, exact BIGINT sums, one division
    "embed_rp_project" ->
      """WITH elems AS (
        |  SELECT vec_id, UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS d FROM embeddings),
        |pr AS (
        |  SELECT vec_id, j,
        |         CAST(SUM((CASE WHEN (strpos('0123456789abcdef',
        |             substr(md5('rp:' || CAST(j AS VARCHAR) || ':' || CAST(d - 1 AS VARCHAR)), 1 + (d - 1) % 32, 1)) - 1) % 2 = 1
        |           THEN 1 ELSE -1 END) *
        |           CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT)) AS BIGINT) AS proj_fp
        |  FROM elems, UNNEST(range(16)) AS t(j)
        |  GROUP BY 1, 2)
        |SELECT vec_id, CAST(j AS BIGINT) AS rp_dim, proj_fp,
        |       CAST(proj_fp AS DOUBLE) / 1048576 AS proj
        |FROM pr""".stripMargin,
    // mirrors Similarity.rpKnn(k=5, overfetch=4): 2^-14-grid sketch, exact
    // integer L2 stage 1 (ties to the lower neighbor_id), full-cosine
    // re-rank of the 20 candidates
    "embed_rp_knn" ->
      """WITH elems AS (
        |  SELECT vec_id, UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS d FROM embeddings),
        |pr AS (
        |  SELECT vec_id, j,
        |         CAST(SUM((CASE WHEN (strpos('0123456789abcdef',
        |             substr(md5('rp:' || CAST(j AS VARCHAR) || ':' || CAST(d - 1 AS VARCHAR)), 1 + (d - 1) % 32, 1)) - 1) % 2 = 1
        |           THEN 1 ELSE -1 END) *
        |           CAST(FLOOR(CAST(v AS DOUBLE) * 16384 + 0.5) AS BIGINT)) AS BIGINT) AS proj_fp
        |  FROM elems, UNNEST(range(16)) AS t(j)
        |  GROUP BY 1, 2),
        |s1 AS (
        |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
        |         SUM((q.proj_fp - d.proj_fp) * (q.proj_fp - d.proj_fp)) AS dist2
        |  FROM pr q JOIN pr d ON q.j = d.j AND d.vec_id != q.vec_id
        |  WHERE q.vec_id < 5
        |  GROUP BY 1, 2),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist2, neighbor_id) AS rn
        |  FROM s1) WHERE rn <= 20),
        |n AS (SELECT vec_id, embedding,
        |             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nm
        |      FROM embeddings),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |         list_dot_product(CAST(dn.embedding AS DOUBLE[]), CAST(qn.embedding AS DOUBLE[])) / (dn.nm * qn.nm) AS sim
        |  FROM cand c JOIN n dn ON dn.vec_id = c.neighbor_id JOIN n qn ON qn.vec_id = c.query_id)
        |SELECT query_id, neighbor_id, sim, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "embed_prefix_knn" ->
      """WITH pn AS (
        |  SELECT vec_id, embedding, p, sqrt(list_dot_product(p, p)) AS pnm,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS fn
        |  FROM (SELECT vec_id, embedding,
        |               CAST(list_slice(embedding, 1, 16) AS DOUBLE[]) AS p
        |        FROM embeddings)),
        |q AS (SELECT vec_id AS query_id, embedding AS qe, p AS qp, pnm AS qpn, fn AS qn
        |      FROM pn WHERE vec_id < 5),
        |s1 AS (SELECT q.query_id, d.vec_id AS neighbor_id, d.embedding AS de, d.fn AS dn,
        |              q.qe, q.qn,
        |              list_dot_product(d.p, q.qp) / (d.pnm * q.qpn) AS psim
        |       FROM pn d CROSS JOIN q WHERE d.vec_id != q.query_id),
        |cand AS (SELECT query_id, neighbor_id, de, dn, qe, qn FROM (
        |           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY psim DESC, neighbor_id) AS rn
        |           FROM s1) WHERE rn <= 20),
        |scored AS (SELECT query_id, neighbor_id,
        |                  list_dot_product(CAST(de AS DOUBLE[]), CAST(qe AS DOUBLE[])) / (dn * qn) AS sim
        |           FROM cand)
        |SELECT query_id, neighbor_id, sim, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    // mirrors SimilarityPq.ivfAdcKnn(k=5): the IVF assignment/probes CTEs
    // joined to the PQ codes/tables CTEs — ADC scoring inside probed lists
    "embed_ivfpq_knn" ->
      ("WITH " + IvfCoreCtes + ",\n" + PqCoreCtes + """,
        |dt AS (
        |  SELECT q.vec_id AS query_id, q.j, b.c,
        |         (q.ss + b.wss) - 2 * list_dot_product(q.s, b.w) AS d
        |  FROM corpd q JOIN bookd b ON q.j = b.j
        |  WHERE q.vec_id < 5),
        |ivfpq_scored AS (
        |  SELECT t1.query_id, x.vec_id AS neighbor_id,
        |         (((t1.d + t2.d) + t3.d) + t4.d) AS adist
        |  FROM codes x
        |  JOIN assigned aa ON aa.vec_id = x.vec_id
        |  JOIN probes pp ON pp.list_id = aa.list_id
        |  JOIN dt t1 ON t1.query_id = pp.query_id AND t1.j = 1 AND t1.c = x.code_1
        |  JOIN dt t2 ON t2.query_id = pp.query_id AND t2.j = 2 AND t2.c = x.code_2
        |  JOIN dt t3 ON t3.query_id = pp.query_id AND t3.j = 3 AND t3.c = x.code_3
        |  JOIN dt t4 ON t4.query_id = pp.query_id AND t4.j = 4 AND t4.c = x.code_4
        |  WHERE x.vec_id != pp.query_id)
        |SELECT query_id, neighbor_id, adist, rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
        |  FROM ivfpq_scored)
        |WHERE rank <= 5""".stripMargin),
    // mirrors Curation.importanceWeights: target = every-10th docs, raw =
    // rest; same top-256 feature cut, LONG masses, final exact division
    "curate_importance" ->
      """WITH tw AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
        |           FROM documents WHERE doc_id % 10 = 0),
        |rw AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
        |       FROM documents WHERE doc_id % 10 != 0),
        |tc AS (SELECT word, COUNT(*) AS t_count FROM tw GROUP BY 1),
        |rc AS (SELECT word, COUNT(*) AS r_count FROM rw GROUP BY 1),
        |v AS (SELECT b.word, b.t_count, COALESCE(rc.r_count, 0) AS r_count
        |      FROM (SELECT word, t_count FROM tc ORDER BY t_count DESC, word LIMIT 256) b
        |      LEFT JOIN rc USING (word)),
        |tot AS (SELECT CAST((SELECT SUM(t_count) FROM tc) AS BIGINT) AS total_t,
        |               CAST((SELECT COUNT(*) FROM rw) AS BIGINT) AS total_r),
        |d AS (SELECT rw.doc_id, COUNT(*) AS n_words,
        |             CAST(SUM(COALESCE(v.t_count, 0)) AS BIGINT) AS t_mass,
        |             CAST(SUM(COALESCE(v.r_count, 0)) AS BIGINT) AS r_mass
        |      FROM rw LEFT JOIN v USING (word) GROUP BY 1)
        |SELECT doc_id, n_words, t_mass, r_mass,
        |       (CAST(t_mass AS DOUBLE) * total_r)
        |         / (CAST(nullif(r_mass, 0) AS DOUBLE) * total_t) AS importance
        |FROM d, tot""".stripMargin,
    // mirrors TextAnalysis.bpeTrain(iters=3) round for round: same
    // code-point symbolization, frequency-weighted pair counts, (cnt desc, p)
    // tie-break, and the doubled-gap leftmost replace rewrite
    "text_bpe_train" -> bpeOracleSql(3),
    // mirrors TextAnalysis.htmlStrip over the same html wrap: block strip ->
    // tag strip -> entity decode (&amp; last) -> space collapse; RE2 'g'
    "text_html_strip" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         '<html><head><style>body { color: red }</style></head><body><h1>Doc &amp; more</h1><p>'
        |           || text ||
        |         '</p><script type="text/javascript">var x = 1 &lt; 2;</script><div class="f">&quot;end&#39;&nbsp;</div></body></html>' AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id, text,
        |              regexp_replace(regexp_replace(text,
        |                '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |                '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS nb
        |       FROM w),
        |s2 AS (SELECT doc_id, text, regexp_replace(nb, '<[^>]*>', ' ', 'g') AS nt FROM s1),
        |s3 AS (SELECT doc_id, text,
        |              replace(replace(replace(replace(replace(replace(nt,
        |                '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS dec
        |       FROM s2)
        |SELECT doc_id,
        |       trim(regexp_replace(dec, '  +', ' ', 'g')) AS text_clean,
        |       CAST(len(regexp_extract_all(text, '<[^>]*>')) AS BIGINT) AS n_tags,
        |       CAST(len(regexp_extract_all(text, '&(amp|lt|gt|quot|nbsp|#39);')) AS BIGINT) AS n_entities,
        |       CAST(length(trim(regexp_replace(dec, '  +', ' ', 'g'))) AS BIGINT) AS n_cp_clean
        |FROM s3""".stripMargin,
    "text_bpe_encode" -> bpeEncodeOracleSql(3),
    // mirrors TextAnalysis.bpeFertility(iters=3): the encode replay joined
    // to the langid guess; LONG sums, one IEEE division per ratio
    "text_bpe_fertility" -> {
      val rounds = bpeRoundsSql(3)
      s"""WITH ${bpeCtes(rounds)},
         |v AS (SELECT substring(replace(sym, ' ', ''), 1, length(replace(sym, ' ', '')) - 4) AS word,
         |             CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sym FROM w3),
         |u AS (SELECT doc_id, word FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
         |      WHERE length(word) > 0),
         |enc AS (SELECT doc_id, CAST(SUM(n_sym) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS w
         |        FROM u JOIN v USING (word) GROUP BY 1),
         |l AS (
         |  SELECT doc_id,
         |         CASE WHEN h_de >= GREATEST(h_en, h_es, h_fr) THEN 'de'
         |              WHEN h_en >= GREATEST(h_es, h_fr) THEN 'en'
         |              WHEN h_es >= h_fr THEN 'es'
         |              ELSE 'fr' END AS lang_guess
         |  FROM (SELECT doc_id, ${hitsSql("de")} AS h_de, ${hitsSql("en")} AS h_en,
         |               ${hitsSql("es")} AS h_es, ${hitsSql("fr")} AS h_fr FROM documents)),
         |c AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS nc FROM documents)
         |SELECT l.lang_guess AS lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(e.w) AS BIGINT) AS n_words, CAST(SUM(e.t) AS BIGINT) AS n_tokens,
         |       CAST(SUM(c.nc) AS BIGINT) AS n_chars,
         |       CAST(SUM(e.t) AS DOUBLE) / CAST(SUM(e.w) AS DOUBLE) AS fertility,
         |       CAST(SUM(c.nc) AS DOUBLE) / CAST(SUM(e.t) AS DOUBLE) AS chars_per_token
         |FROM enc e JOIN l ON e.doc_id = l.doc_id JOIN c ON e.doc_id = c.doc_id
         |GROUP BY 1""".stripMargin
    },
    // mirrors Dedup.urlDedup: identical regexp chain (RE2-portable patterns)
    "dedup_url" ->
      """WITH k AS (
        |  SELECT doc_id,
        |         nullif(regexp_replace(regexp_extract(regexp_replace(
        |           regexp_extract(lower(text), 'https?://([a-z0-9.-]+)[^ ]*', 0),
        |           '^https?://', ''), '^[^?#]*', 0), '/+$', ''), '') AS url_key
        |  FROM documents),
        |g AS (SELECT url_key, MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
        |      FROM k WHERE url_key IS NOT NULL GROUP BY 1)
        |SELECT k.doc_id, k.url_key,
        |       COALESCE(g.keep_doc_id, k.doc_id) AS keep_doc_id,
        |       COALESCE(g.dup_count, 1) AS dup_count
        |FROM k LEFT JOIN g USING (url_key)""".stripMargin,
    // mirrors Dedup.semanticDedup(minCosine=0.3, nLists=16): same seeded
    // centroid pick and max-cosine assignment as the embed_ivf_knn oracle,
    // then in-cell lower-id cosine counting
    "dedup_semantic" ->
      """WITH cents AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS list_id,
        |         embedding AS centroid,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS cnorm
        |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        |corpus AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vnorm
        |  FROM embeddings),
        |assigned AS (
        |  SELECT vec_id, embedding, vnorm, list_id FROM (
        |    SELECT c.vec_id, c.embedding, c.vnorm, t.list_id,
        |           ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
        |             list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(t.centroid AS DOUBLE[]))
        |               / (c.vnorm * t.cnorm) DESC, t.list_id) AS rn
        |    FROM corpus c CROSS JOIN cents t)
        |  WHERE rn = 1),
        |dups AS (
        |  SELECT y.vec_id, COUNT(*) AS n_dup_lower
        |  FROM assigned x JOIN assigned y
        |    ON x.list_id = y.list_id AND x.vec_id < y.vec_id
        |  WHERE list_dot_product(CAST(x.embedding AS DOUBLE[]), CAST(y.embedding AS DOUBLE[]))
        |          / (x.vnorm * y.vnorm) >= 0.3
        |  GROUP BY 1)
        |SELECT a.vec_id, a.list_id,
        |       COALESCE(d.n_dup_lower, 0) AS n_sem_dups,
        |       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
        |FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id""".stripMargin,
    "embed_lsh_pairs" ->
      s"""WITH $LshPairsCte
         |SELECT a, b, cos_sim FROM pairs WHERE cos_sim >= 0.3""".stripMargin,
    "embed_isotropy" ->
      """WITH nv AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |f AS (
        |  SELECT vec_id, i AS d,
        |         CAST(floor(e[i] / nrm * 16384.0 + 0.5) AS BIGINT) AS fp
        |  FROM nv, UNNEST(range(1, len(e) + 1)) AS t(i)
        |  WHERE nrm > 0),
        |pd AS (SELECT d, COUNT(*) AS cnt, SUM(fp) AS sd, SUM(fp * fp) AS ssq
        |       FROM f GROUP BY 1)
        |SELECT CAST(MAX(cnt) AS BIGINT) AS n_vecs,
        |       (CAST(SUM(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)) AS DOUBLE)
        |          - CAST(SUM(CAST(ssq AS HUGEINT)) AS DOUBLE)) / 268435456.0
        |         / CAST(MAX(cnt) * (MAX(cnt) - 1) AS DOUBLE) AS mean_pair_cosine,
        |       sqrt(CAST(SUM(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)) AS DOUBLE))
        |         / (CAST(MAX(cnt) AS DOUBLE) * 16384.0) AS mean_vector_norm
        |FROM pd""".stripMargin,
    "embed_density" ->
      s"""WITH c AS (
         |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         |         $CosineSql AS sim
         |  FROM embeddings q JOIN embeddings d ON q.vec_id % 20 = 0 AND d.vec_id != q.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM c)
         |SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k_found,
         |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(sim))), (acc, v) -> acc + v)
         |         / COUNT(*) AS mean_topk_sim
         |FROM r WHERE rank <= 10 GROUP BY 1""".stripMargin,
    // mirrors Similarity.cosineSweep (probes 0.30..0.95 step 0.05) over the
    // same LSH candidate frame, cumulative >=-counts
    "embed_cos_sweep" ->
      s"""WITH $LshPairsCte,
         |scored AS (SELECT cos_sim FROM pairs WHERE cos_sim >= 0.3),
         |probe AS (SELECT CAST(t / 20.0 AS DOUBLE) AS threshold
         |          FROM UNNEST(range(6, 20)) AS u(t))
         |SELECT probe.threshold, CAST(COUNT(scored.cos_sim) AS BIGINT) AS n_pairs
         |FROM probe LEFT JOIN scored ON scored.cos_sim >= probe.threshold
         |GROUP BY 1""".stripMargin,
    "dedup_embed_cross" ->
      s"""WITH $LshSigCte
         |SELECT x.vec_id AS incoming_id, y.vec_id AS existing_id,
         |       list_dot_product(CAST(ex.embedding AS DOUBLE[]), CAST(ey.embedding AS DOUBLE[]))
         |         / (sqrt(list_dot_product(CAST(ex.embedding AS DOUBLE[]), CAST(ex.embedding AS DOUBLE[])))
         |          * sqrt(list_dot_product(CAST(ey.embedding AS DOUBLE[]), CAST(ey.embedding AS DOUBLE[])))) AS cos_sim
         |FROM sig x JOIN sig y ON x.sig = y.sig AND x.vec_id % 5 = 0 AND y.vec_id % 5 != 0
         |JOIN embeddings ex ON x.vec_id = ex.vec_id
         |JOIN embeddings ey ON y.vec_id = ey.vec_id
         |WHERE list_dot_product(CAST(ex.embedding AS DOUBLE[]), CAST(ey.embedding AS DOUBLE[]))
         |         / (sqrt(list_dot_product(CAST(ex.embedding AS DOUBLE[]), CAST(ex.embedding AS DOUBLE[])))
         |          * sqrt(list_dot_product(CAST(ey.embedding AS DOUBLE[]), CAST(ey.embedding AS DOUBLE[])))) >= 0.3""".stripMargin,
    // same LSH buckets + pair filter as embed_lsh_pairs, then the same
    // recursive connected components as dedup_clusters, left-joined back so
    // every vector gets a keep decision (itself when it has no near-dup)
    "dedup_embed_cosine" ->
      s"""WITH RECURSIVE $LshPairsCte,
         |np AS (SELECT a, b FROM pairs WHERE cos_sim >= 0.3),
         |edges AS (SELECT a AS src, b AS dst FROM np UNION SELECT b, a FROM np),
         |reach(src, dst) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |reps AS (SELECT src AS vec_id, MIN(dst) AS keep0 FROM reach GROUP BY 1)
         |SELECT e.vec_id, COALESCE(r.keep0, e.vec_id) AS keep_id
         |FROM embeddings e LEFT JOIN reps r ON e.vec_id = r.vec_id""".stripMargin,
    // mirrors the REAL ImageIO decode via the syntheticImages contract:
    // width/height/channels by construction, px_sum in closed form
    // (sum over x<w, y<h, k<c of x + y + doc_id%50 + 20k — no wraparound
    // by design, so PNG returns exactly these samples)
    "multimodal_decode_partitioned" -> ImageDecodeOracleSql,
    // mirrors imageGridFeatures(grid=4): per (cell, channel) the rectangle
    // sample sum in closed form (arithmetic series over the cell bounds)
    "multimodal_features" ->
      """WITH img AS (SELECT doc_id AS media_id,
        |                    32 + doc_id % 48 AS w, 32 + doc_id % 32 AS h,
        |                    CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS c,
        |                    doc_id % 50 AS b
        |             FROM documents),
        |cells AS (SELECT media_id, w, h, c, b, gi.i, gj.j, gk.k,
        |                 (gi.i * w) // 4 AS x0, ((gi.i + 1) * w) // 4 AS x1,
        |                 (gj.j * h) // 4 AS y0, ((gj.j + 1) * h) // 4 AS y1
        |          FROM img
        |          CROSS JOIN generate_series(0, 3) gi(i)
        |          CROSS JOIN generate_series(0, 3) gj(j)
        |          CROSS JOIN generate_series(0, 2) gk(k)
        |          WHERE gk.k < c),
        |s AS (SELECT media_id, i, j, k,
        |             (x1 - x0) * (y1 - y0) AS n_px,
        |             (y1 - y0) * (((x0 + x1 - 1) * (x1 - x0)) // 2)
        |               + (x1 - x0) * (((y0 + y1 - 1) * (y1 - y0)) // 2)
        |               + (x1 - x0) * (y1 - y0) * (b + 20 * k) AS cell_sum
        |      FROM cells)
        |SELECT media_id, CAST(i AS BIGINT) AS cell_x, CAST(j AS BIGINT) AS cell_y,
        |       CAST(k AS BIGINT) AS channel, CAST(n_px AS BIGINT) AS n_px,
        |       CAST(cell_sum AS BIGINT) AS cell_sum,
        |       CAST(cell_sum AS DOUBLE) / CAST(n_px AS DOUBLE) AS cell_mean
        |FROM s""".stripMargin,
    // mirrors Multimodal.exactDedup over the planted media table: md5 of
    // the BINARY payload (= md5 of the utf8 text bytes in the synthetic
    // corpus), min-id keeps
    "multimodal_dedup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |         md5(COALESCE(text, '')) AS content_hash
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1],
        |         md5(COALESCE(text, ''))
        |  FROM documents WHERE doc_id % 5 = 0),
        |g AS (SELECT content_hash, MIN(media_id) AS keep_media_id,
        |             CAST(COUNT(*) AS BIGINT) AS dup_count
        |      FROM m GROUP BY 1)
        |SELECT m.media_id, m.media_type, m.content_hash, g.keep_media_id, g.dup_count,
        |       CAST(CASE WHEN m.media_id = g.keep_media_id THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM m JOIN g USING (content_hash)""".stripMargin,
    "multimodal_decode" -> ImageDecodeOracleSql,
    // mixed-codec geometry: the Spark side REALLY decodes (PNG and JPEG
    // readers both exercised, codec sniffed from magic bytes); the oracle
    // predicts codec + geometry from the generation contract — geometry is
    // exact under lossy JPEG, pixel statistics deliberately are not emitted
    "multimodal_decode_mixed" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 5 = 0 THEN 'jpeg' ELSE 'png' END AS codec,
        |       CAST(32 + doc_id % 48 AS BIGINT) AS width,
        |       CAST(32 + doc_id % 32 AS BIGINT) AS height,
        |       CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS BIGINT) AS channels
        |FROM documents""".stripMargin,
    // mirrors the REAL resize gate (decode of the nearest-neighbor-resized
    // re-encoded PNGs): integer geometry out_w = w*16 // max(w,h,16), source
    // sample (x*w // out_w, y*h // out_h), summed over the output raster
    "multimodal_resize" ->
      """WITH img AS (SELECT doc_id AS media_id,
        |                    32 + doc_id % 48 AS w, 32 + doc_id % 32 AS h,
        |                    CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS c,
        |                    doc_id % 50 AS b
        |             FROM documents),
        |o AS (SELECT media_id, w, h, c, b,
        |             (w * 16) // GREATEST(w, h, 16) AS ow,
        |             (h * 16) // GREATEST(w, h, 16) AS oh
        |      FROM img),
        |px AS (SELECT media_id, ow, oh, c,
        |              ((gx.x * w) // ow) + ((gy.y * h) // oh) + b + 20 * gk.k AS v
        |       FROM o
        |       CROSS JOIN generate_series(0, 15) gx(x)
        |       CROSS JOIN generate_series(0, 15) gy(y)
        |       CROSS JOIN generate_series(0, 2) gk(k)
        |       WHERE gx.x < ow AND gy.y < oh AND gk.k < c),
        |s AS (SELECT media_id, MAX(ow) AS ow, MAX(oh) AS oh, MAX(c) AS c,
        |             SUM(v) AS px_sum
        |      FROM px GROUP BY 1)
        |SELECT media_id, CAST(ow AS BIGINT) AS width, CAST(oh AS BIGINT) AS height,
        |       CAST(c AS BIGINT) AS channels, CAST(px_sum AS BIGINT) AS px_sum,
        |       CAST(px_sum AS DOUBLE) / CAST(ow * oh * c AS DOUBLE) AS px_mean
        |FROM s""".stripMargin,
    // video rows only; frame count = max(1, floor(byte_len/64)); every 5th
    "multimodal_framesample" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |         octet_length(encode(text)) AS byte_len
        |  FROM documents),
        |v AS (SELECT media_id,
        |             GREATEST(1, CAST(FLOOR(byte_len / 64.0) AS INT)) AS n_frames
        |      FROM d WHERE media_type = 'video')
        |SELECT media_id, CAST(UNNEST(range(0, n_frames, 5)) AS INT) AS frame_idx
        |FROM v""".stripMargin,
    "dedup_passages" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |chunks AS (
        |  SELECT doc_id, i AS ci, array_to_string(ws[i*10+1:i*10+10], ' ') AS chunk
        |  FROM words, LATERAL (SELECT UNNEST(range(0, (len(ws)-1)//10 + 1)) AS i) t),
        |freq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY 1)
        |SELECT c.doc_id,
        |       COALESCE(string_agg(c.chunk, ' ' ORDER BY c.ci) FILTER (WHERE f.df < 2), '') AS text,
        |       COUNT(*) FILTER (WHERE f.df >= 2) AS removed_chunks
        |FROM chunks c JOIN freq f USING (chunk)
        |GROUP BY c.doc_id""".stripMargin,
    "dedup_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         concat_ws(chr(10),
        |           'hdr ' || source,
        |           text,
        |           'sig ' || CAST(doc_id % 10 AS VARCHAR),
        |           'tag ' || CAST(doc_id % 13 AS VARCHAR),
        |           'copyright example corp',
        |           CASE WHEN doc_id % 3 = 0 THEN 'promo ' || CAST(doc_id % 7 AS VARCHAR) END) AS text
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, generate_subscripts(ls, 1) AS li, unnest(ls) AS line
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d)),
        |f AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM l GROUP BY 1)
        |SELECT l.doc_id,
        |       COALESCE(string_agg(CASE WHEN l.line = '' OR f.df < 50 THEN l.line END, chr(10) ORDER BY l.li), '') AS text_clean,
        |       COUNT(CASE WHEN l.line = '' OR f.df < 50 THEN 1 END) AS n_lines_kept,
        |       COUNT(CASE WHEN l.line <> '' AND f.df >= 50 THEN 1 END) AS n_lines_dropped
        |FROM l JOIN f USING (line)
        |GROUP BY 1""".stripMargin,
    "dedup_substring" ->
      """WITH w AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS s,
        |         md5(array_to_string(ws[i+1:i+10], ' ')) AS gh
        |  FROM w, LATERAL (SELECT UNNEST(range(0, GREATEST(len(ws) - 9, 0))) AS i) t),
        |dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
        |h AS (SELECT doc_id, s, s + 10 AS e FROM g WHERE gh IN (SELECT gh FROM dup)),
        |m AS (
        |  SELECT doc_id, s, e,
        |         MAX(e) OVER (PARTITION BY doc_id ORDER BY s
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM h),
        |i AS (
        |  SELECT doc_id, s, e,
        |         SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS island
        |  FROM m)
        |SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
        |       MAX(e) - MIN(s) AS span_tokens, CAST(COUNT(*) AS BIGINT) AS n_windows
        |FROM i GROUP BY doc_id, island""".stripMargin,
    "dedup_substring_strip" ->
      """WITH w AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS s,
        |         md5(array_to_string(ws[i+1:i+10], ' ')) AS gh
        |  FROM w, LATERAL (SELECT UNNEST(range(0, GREATEST(len(ws) - 9, 0))) AS i) t),
        |dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
        |h AS (SELECT doc_id, s, s + 10 AS e FROM g WHERE gh IN (SELECT gh FROM dup)),
        |m AS (
        |  SELECT doc_id, s, e,
        |         MAX(e) OVER (PARTITION BY doc_id ORDER BY s
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM h),
        |i AS (
        |  SELECT doc_id, s, e,
        |         SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS island
        |  FROM m),
        |sp AS (SELECT doc_id, MIN(s) AS ss, MAX(e) AS se FROM i GROUP BY doc_id, island),
        |tok AS (
        |  SELECT doc_id, CAST(gs - 1 AS BIGINT) AS idx, ws[gs] AS tok
        |  FROM w, LATERAL (SELECT UNNEST(range(1, len(ws) + 1)) AS gs) t)
        |SELECT d.doc_id,
        |       COALESCE((SELECT string_agg(k.tok, ' ' ORDER BY k.idx) FROM tok k
        |                 WHERE k.doc_id = d.doc_id AND NOT EXISTS
        |                   (SELECT 1 FROM sp WHERE sp.doc_id = k.doc_id
        |                    AND k.idx >= sp.ss AND k.idx < sp.se)), '') AS text,
        |       CAST(COALESCE((SELECT SUM(se - ss) FROM sp WHERE sp.doc_id = d.doc_id), 0) AS BIGINT)
        |         AS removed_tokens
        |FROM documents d""".stripMargin,
    // cut points are hexCut(205)='cd' and hexCut(205+26)='e7'; the hash is
    // salted ("split:") so membership is independent of hashSample's bits
    "curate_split" ->
      """SELECT doc_id,
        |       CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |            WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
        |            ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    // mirrors Curation.groupSplit over the planted-URL corpus: host group
    // key with source-shard fallback, gsplit-salted 256-bucket hex cut
    // mirrors Curation.splitLeakage over the minhash-LSH pairs + hash split:
    // identical band construction, est_jaccard >= 0.5, per unordered split
    // pair the count/max — exact (est_jaccard is a k/8 multiple)
    "curate_split_leakage" ->
      s"""WITH mh AS ($MinhashSql),
         |bands AS (
         |  SELECT doc_id, b, key FROM mh, LATERAL (VALUES
         |    (0, mh0 || mh1), (1, mh2 || mh3), (2, mh4 || mh5), (3, mh6 || mh7)) AS v(b, key)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
         |pr AS (SELECT cand.a, cand.b,
         |       ((x.mh0 = y.mh0)::INT + (x.mh1 = y.mh1)::INT + (x.mh2 = y.mh2)::INT
         |            + (x.mh3 = y.mh3)::INT + (x.mh4 = y.mh4)::INT + (x.mh5 = y.mh5)::INT
         |            + (x.mh6 = y.mh6)::INT + (x.mh7 = y.mh7)::INT) / 8.0 AS est_jaccard
         |       FROM cand JOIN mh x ON cand.a = x.doc_id JOIN mh y ON cand.b = y.doc_id),
         |sp AS (SELECT doc_id,
         |       CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
         |            WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e7' THEN 'val'
         |            ELSE 'test' END AS split
         |       FROM documents)
         |SELECT LEAST(sa.split, sb.split) AS split_lo, GREATEST(sa.split, sb.split) AS split_hi,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs, MAX(est_jaccard) AS max_jaccard,
         |       CAST(CASE WHEN LEAST(sa.split, sb.split) != GREATEST(sa.split, sb.split)
         |                 THEN 1 ELSE 0 END AS BIGINT) AS is_leak
         |FROM pr JOIN sp sa ON pr.a = sa.doc_id JOIN sp sb ON pr.b = sb.doc_id
         |WHERE est_jaccard >= 0.5
         |GROUP BY 1, 2""".stripMargin,
    "curate_group_split" ->
      """WITH p AS (SELECT doc_id, source,
        |        CASE WHEN doc_id % 5 != 0
        |             THEN text || ' via https://www.site' || CAST(doc_id % 7 AS VARCHAR)
        |                       || '.example.org/p/' || CAST(doc_id AS VARCHAR)
        |             ELSE text END AS text
        |      FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN NULLIF(regexp_extract(lower(text), 'https?://([a-z0-9.-]+)[^ ]*', 1), '') IS NOT NULL
        |             THEN regexp_extract(lower(text), 'https?://([a-z0-9.-]+)[^ ]*', 1)
        |             ELSE source || ':' || CAST(doc_id % 50 AS VARCHAR) END AS group_key
        |      FROM p)
        |SELECT doc_id, group_key,
        |       CASE WHEN substr(md5('gsplit:' || group_key), 1, 2) < 'cd' THEN 'train'
        |            WHEN substr(md5('gsplit:' || group_key), 1, 2) < 'e7' THEN 'val'
        |            ELSE 'test' END AS split
        |FROM g""".stripMargin,
    "curate_pack" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, shard, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        |  FROM t)
        |SELECT doc_id, shard, n_tokens,
        |       CAST(start // 256 AS BIGINT) AS pack_id,
        |       CAST(start % 256 AS BIGINT) AS pack_offset
        |FROM s""".stripMargin,
    "text_vocab" ->
      """SELECT word, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word
        |ORDER BY n_occurrences DESC, word
        |LIMIT 100""".stripMargin,
    "embed_quantize" ->
      """SELECT vec_id,
        |       CAST(mx AS DOUBLE) / 127 AS scale,
        |       CAST(list_aggregate(qs, 'sum') AS BIGINT) AS q_sum,
        |       CAST(list_aggregate(list_transform(qs, q -> abs(q)), 'sum') AS BIGINT) AS q_l1,
        |       CAST(list_aggregate(list_transform(qs, q -> abs(q)), 'max') AS BIGINT) AS q_max,
        |       CAST(list_aggregate(list_transform(qs, q -> q*q), 'sum') AS BIGINT) AS q_sq
        |FROM (
        |  SELECT vec_id, mx,
        |         CASE WHEN mx > 0 THEN list_transform(embedding, v -> FLOOR(CAST(v AS DOUBLE)/mx*127 + 0.5))
        |              ELSE list_transform(embedding, v -> 0.0) END AS qs
        |  FROM (SELECT vec_id, embedding,
        |               list_aggregate(list_transform(embedding, v -> abs(v)), 'max') AS mx
        |        FROM embeddings))""".stripMargin,
    "embed_knn_int8" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |         list_aggregate(list_transform(embedding, v -> abs(v)), 'max') AS mx
        |  FROM embeddings),
        |qv AS (
        |  SELECT vec_id, CAST(mx AS DOUBLE) / 127 AS scale,
        |         list_transform(embedding, v -> FLOOR(CAST(v AS DOUBLE)/mx*127 + 0.5)) AS q
        |  FROM e WHERE mx > 0 AND isfinite(mx)),
        |p AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         list_inner_product(a.q, b.q) * (a.scale * b.scale) AS score
        |  FROM qv a JOIN qv b ON b.vec_id != a.vec_id
        |  WHERE a.vec_id < 5)
        |SELECT query_id, neighbor_id, score, rank FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM p)
        |WHERE rank <= 5""".stripMargin,
    // mirrors Similarity.centroids: the same floor(v*2^20 + 0.5) fixed-point
    // snap, exact BIGINT sums, one final long/long division per (label, dim)
    "embed_centroid" ->
      """WITH e AS (
        |  SELECT label, UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS d
        |  FROM embeddings),
        |s AS (
        |  SELECT label, d, COUNT(*) AS n_vecs,
        |         CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT)) AS BIGINT) AS fp_sum
        |  FROM e GROUP BY 1, 2)
        |SELECT label, CAST(d AS BIGINT) AS dim, n_vecs,
        |       fp_sum / (n_vecs * 1048576) AS mean
        |FROM s""".stripMargin,
    "embed_centroid_sim" ->
      """WITH e AS (
        |  SELECT label, UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS d
        |  FROM embeddings),
        |f AS (
        |  SELECT label, d,
        |         CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT)) AS BIGINT) AS fp
        |  FROM e GROUP BY 1, 2),
        |n AS (SELECT label, SUM(CAST(fp AS HUGEINT) * fp) AS nrm FROM f GROUP BY 1),
        |p AS (SELECT x.label AS ga, y.label AS gb, SUM(CAST(x.fp AS HUGEINT) * y.fp) AS num
        |      FROM f x JOIN f y ON x.d = y.d AND x.label < y.label GROUP BY 1, 2)
        |SELECT CAST(ga AS BIGINT) AS label_a, CAST(gb AS BIGINT) AS label_b,
        |       CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN NULL
        |            ELSE CAST(num AS DOUBLE) / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
        |       END AS cosine
        |FROM p JOIN n na ON p.ga = na.label JOIN n nb ON p.gb = nb.label""".stripMargin,
    "embed_dim_stats" ->
      """WITH e AS (
        |  SELECT UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS d
        |  FROM embeddings),
        |s AS (
        |  SELECT d, COUNT(*) AS n_vecs,
        |         MIN(CAST(v AS DOUBLE)) AS min_v, MAX(CAST(v AS DOUBLE)) AS max_v,
        |         CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT)) AS BIGINT) AS fp_sum,
        |         CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT) *
        |                  CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT)) AS BIGINT) AS fp_sumsq
        |  FROM e GROUP BY 1)
        |SELECT CAST(d AS BIGINT) AS dim, n_vecs, min_v, max_v,
        |       fp_sum / (n_vecs * 1048576) AS mean,
        |       fp_sumsq / (n_vecs * 1048576 * 1048576) -
        |         (fp_sum / (n_vecs * 1048576)) * (fp_sum / (n_vecs * 1048576)) AS variance
        |FROM s""".stripMargin,
    // mirrors Curation.quotaSample2d(cap=5): the shard prune keeps a
    // superset of every cell's global top-5, so the plain per-cell rank
    // over (salted md5, doc_id) replays the kept set exactly
    "curate_quota_2d" ->
      """WITH s0 AS (SELECT doc_id, lang, source,
        |                   md5('quota2d:' || CAST(doc_id AS VARCHAR)) AS h
        |            FROM documents)
        |SELECT lang, source, cell_rank, doc_id FROM (
        |  SELECT lang, source, doc_id,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY h, doc_id) AS BIGINT) AS cell_rank
        |  FROM s0)
        |WHERE cell_rank <= 5""".stripMargin,
    "curate_source_cap" ->
      s"""WITH j AS (
         |  SELECT source, doc_id,
         |         LEAST(1.0, len(string_split(text, ' ')) / 100.0)
         |               * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 1.0 / length(text))
         |               * LEAST(1.0, 4.0 * ${hitsSql("en")} / len(string_split(lower(text), ' ')) + 0.5) AS quality
         |  FROM documents)
         |SELECT source, rank, doc_id, quality FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rank
         |  FROM j)
         |WHERE rank <= 10""".stripMargin,
    "curate_mix_report" ->
      """WITH g AS (
        |  SELECT lang, source, COUNT(*) AS n_docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, source, n_docs, n_words,
        |       n_docs / CAST((SELECT SUM(n_docs) FROM g) AS BIGINT) AS docs_share,
        |       n_words / CAST((SELECT SUM(n_words) FROM g) AS BIGINT) AS words_share
        |FROM g""".stripMargin,
    // mirrors Curation.epochMix(budget=200000, maxEpochBp=30000): same
    // weight table, ceil/floor integer divisions round for round
    "curate_epoch_mix" -> {
      val wvals = EpochMixWeights.toSeq.sortBy(_._1)
        .map { case (s, bp) => s"('$s', $bp)" }.mkString(", ")
      s"""WITH wts(source, wbp) AS (VALUES $wvals),
         |av AS (SELECT source, COUNT(*) AS n_docs,
         |              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS available_tokens
         |       FROM documents GROUP BY 1),
         |j AS (SELECT w.source, CAST(w.wbp AS BIGINT) AS weight_bp,
         |             CAST(COALESCE(av.n_docs, 0) AS BIGINT) AS n_docs,
         |             COALESCE(av.available_tokens, 0) AS available_tokens
         |      FROM wts w LEFT JOIN av ON w.source = av.source),
         |t AS (SELECT *, 200000 * weight_bp // 10000 AS target_tokens FROM j),
         |e AS (SELECT *, CASE WHEN available_tokens = 0 THEN 0
         |                    ELSE LEAST(30000, (target_tokens * 10000 + available_tokens - 1) // available_tokens)
         |               END AS epochs_bp FROM t),
         |p AS (SELECT *, LEAST(target_tokens, available_tokens * epochs_bp // 10000) AS planned_tokens FROM e)
         |SELECT source, n_docs, available_tokens, weight_bp, target_tokens, epochs_bp,
         |       planned_tokens, target_tokens - planned_tokens AS deficit_tokens
         |FROM p""".stripMargin
    },
    "text_lm_score" ->
      """WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents),
        |v AS (SELECT word, COUNT(*) AS w_count FROM w GROUP BY 1
        |      ORDER BY w_count DESC, word LIMIT 256),
        |t AS (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words FROM documents),
        |d AS (SELECT w.doc_id,
        |             COUNT(*) AS n_words,
        |             CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |             CAST(SUM(COALESCE(v.w_count, 0)) AS BIGINT) AS w_sum
        |      FROM w LEFT JOIN v ON w.word = v.word GROUP BY 1)
        |SELECT doc_id, n_words, n_oov,
        |       n_oov / n_words AS oov_ratio,
        |       w_sum / (CAST(n_words AS DOUBLE) * CAST(total_words AS DOUBLE)) AS familiarity
        |FROM d, t""".stripMargin,
    // mirrors TextAnalysis.lmScoreBigram(vocabSize=256): adjacent pairs via
    // 1-indexed range(1, len) (i, i+1) windows, vocab joined to its head
    // word's unigram count before probing
    // mirrors Curation.lmBuckets: the text_lm_kn CTE chain, then the exact
    // DECIMAL(18,12)-sum global mean, mirrored 1.25x/0.75x cutoffs, and the
    // per-source bucket report (unscored = docs under two words)
    "curate_lm_buckets" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |            WHERE len(string_split(text, ' ')) >= 2),
        |pr AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |       FROM ws, LATERAL (SELECT UNNEST(range(1, len(ws))) AS i) t),
        |bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM pr GROUP BY 1, 2),
        |h AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS n_follow
        |      FROM bg GROUP BY 1),
        |tl AS (SELECT w2, COUNT(*) AS n_prec FROM bg GROUP BY 1),
        |tt AS (SELECT COUNT(*) AS n_bigrams FROM bg),
        |st AS (SELECT bg.w1, bg.w2,
        |              GREATEST(bg.c12 - 0.75, 0.0) / h.c1 +
        |              (0.75 * h.n_follow / h.c1) * (tl.n_prec / tt.n_bigrams) AS kp
        |       FROM bg JOIN h ON bg.w1 = h.w1
        |               JOIN tl ON bg.w2 = tl.w2
        |               CROSS JOIN tt),
        |sc AS (SELECT pr.doc_id,
        |              list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(kp))),
        |                          (acc, v) -> acc + v) / COUNT(*) AS kn_mean
        |       FROM pr JOIN st ON pr.w1 = st.w1 AND pr.w2 = st.w2
        |       GROUP BY 1),
        |m AS (SELECT CAST(SUM(CAST(kn_mean AS DECIMAL(18,12))) AS DOUBLE) AS kn_total,
        |             COUNT(*) AS n_scored FROM sc),
        |d AS (SELECT doc_id, source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |      FROM documents),
        |bk AS (SELECT d.source,
        |              CASE WHEN sc.kn_mean IS NULL THEN 'unscored'
        |                   WHEN sc.kn_mean > 1.25 * m.kn_total / m.n_scored THEN 'head'
        |                   WHEN sc.kn_mean < 0.75 * m.kn_total / m.n_scored THEN 'tail'
        |                   ELSE 'middle' END AS bucket,
        |              d.n_words
        |       FROM d LEFT JOIN sc USING (doc_id) CROSS JOIN m),
        |ps AS (SELECT source, COUNT(*) AS source_docs FROM bk GROUP BY 1),
        |g AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |             CAST(SUM(n_words) AS BIGINT) AS n_words
        |      FROM bk GROUP BY 1, 2)
        |SELECT g.source, g.bucket, g.n_docs, g.n_words,
        |       CAST(g.n_docs AS DOUBLE) / CAST(ps.source_docs AS DOUBLE) AS doc_share
        |FROM g JOIN ps USING (source)""".stripMargin,
    // mirrors TextAnalysis.lmScoreKN: same KN formula in the same expression
    // order, sorted-fold per-doc sum
    "text_lm_kn" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |            WHERE len(string_split(text, ' ')) >= 2),
        |pr AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |       FROM ws, LATERAL (SELECT UNNEST(range(1, len(ws))) AS i) t),
        |bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM pr GROUP BY 1, 2),
        |h AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS n_follow
        |      FROM bg GROUP BY 1),
        |tl AS (SELECT w2, COUNT(*) AS n_prec FROM bg GROUP BY 1),
        |tt AS (SELECT COUNT(*) AS n_bigrams FROM bg),
        |st AS (SELECT bg.w1, bg.w2,
        |              GREATEST(bg.c12 - 0.75, 0.0) / h.c1 +
        |              (0.75 * h.n_follow / h.c1) * (tl.n_prec / tt.n_bigrams) AS kp
        |       FROM bg JOIN h ON bg.w1 = h.w1
        |               JOIN tl ON bg.w2 = tl.w2
        |               CROSS JOIN tt)
        |SELECT pr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(kp))),
        |                   (acc, v) -> acc + v) AS kn_sum,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(kp))),
        |                   (acc, v) -> acc + v) / COUNT(*) AS kn_mean
        |FROM pr JOIN st ON pr.w1 = st.w1 AND pr.w2 = st.w2
        |GROUP BY 1""".stripMargin,
    "text_lm_score_bigram" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |p AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |      FROM ws, LATERAL (SELECT UNNEST(range(1, len(ws))) AS i) t),
        |u AS (SELECT word, COUNT(*) AS c1
        |      FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents) GROUP BY 1),
        |bc AS (SELECT g, COUNT(*) AS c12 FROM p GROUP BY 1),
        |v AS (SELECT b.g, b.c12, u.c1
        |      FROM (SELECT g, c12 FROM bc ORDER BY c12 DESC, g LIMIT 256) b
        |      JOIN u ON string_split(b.g, ' ')[1] = u.word),
        |t AS (SELECT CAST(SUM(c12) AS BIGINT) AS total_pairs FROM bc),
        |d AS (SELECT p.doc_id, COUNT(*) AS n_pairs,
        |             CAST(SUM(CASE WHEN v.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |             CAST(SUM(COALESCE(v.c12, 0)) AS BIGINT) AS big_sum,
        |             CAST(SUM(CASE WHEN v.g IS NULL THEN 0 ELSE v.c1 END) AS BIGINT) AS first_sum
        |      FROM p LEFT JOIN v ON p.g = v.g GROUP BY 1)
        |SELECT doc_id, n_pairs, n_oov,
        |       n_oov / n_pairs AS oov_ratio,
        |       big_sum / (CAST(n_pairs AS DOUBLE) * CAST(total_pairs AS DOUBLE)) AS familiarity,
        |       big_sum / CAST(nullif(first_sum, 0) AS DOUBLE) AS cond_familiarity
        |FROM d, t""".stripMargin,
    "text_chunks" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id, i AS chunk_id, i * 48 AS chunk_start,
        |       LEAST(64, len(ws) - i * 48) AS n_chunk_words,
        |       array_to_string(ws[i*48+1:i*48+64], ' ') AS chunk_text
        |FROM w, LATERAL (SELECT UNNEST(range(0,
        |  CASE WHEN len(ws) <= 64 THEN 0 ELSE (len(ws) - 64 + 47) // 48 END + 1)) AS i) t""".stripMargin,
    "text_gopher" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |         length(replace(text, ' ', '')) * 1.0 / nullif(len(string_split(text, ' ')), 0) AS avg_word_len,
         |         len(regexp_extract_all(text, '[^\\p{L}\\p{N} ]')) * 1.0 / nullif(length(text), 0) AS punct_ratio,
         |         CAST(GREATEST(${hitsSql("de")}, ${hitsSql("en")}, ${hitsSql("es")}, ${hitsSql("fr")}) AS BIGINT) AS stop_hits
         |  FROM documents),
         |g AS (
         |  SELECT *,
         |         CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS ok_words,
         |         CAST(CASE WHEN avg_word_len >= 3.0 AND avg_word_len <= 10.0 THEN 1 ELSE 0 END AS BIGINT) AS ok_word_len,
         |         CAST(CASE WHEN punct_ratio <= 0.2 THEN 1 ELSE 0 END AS BIGINT) AS ok_punct,
         |         CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS ok_stop
         |  FROM f)
         |SELECT doc_id, n_words, avg_word_len, punct_ratio, stop_hits,
         |       ok_words, ok_word_len, ok_punct, ok_stop,
         |       ok_words * ok_word_len * ok_punct * ok_stop AS keep
         |FROM g""".stripMargin,
    // mirrors Dedup.bloomScreen exactly: bitset membership bijects with the
    // md5 position set, so the Bloom decision (incl. any false positive) is
    // the "all k positions present" predicate below
    "dedup_bloom_screen" ->
      s"""WITH inraw AS (
         |  SELECT a.doc_id,
         |         md5(CASE WHEN a.doc_id % 20 = 0 THEN b.text ELSE a.text END) AS h
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
         |  WHERE a.doc_id % 10 = 0),
         |exraw AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 10 != 0),
         |inpos AS (
         |  SELECT doc_id, h, ${hex5Sql("m")} AS pos
         |  FROM (SELECT doc_id, h, md5(CAST(i AS VARCHAR) || ':' || h) AS m
         |        FROM inraw, UNNEST(range(4)) AS t(i))),
         |expos AS (
         |  SELECT DISTINCT ${hex5Sql("m")} AS pos
         |  FROM (SELECT md5(CAST(i AS VARCHAR) || ':' || h) AS m
         |        FROM exraw, UNNEST(range(4)) AS t(i)))
         |SELECT p.doc_id, p.h
         |FROM inpos p LEFT JOIN expos e ON p.pos = e.pos
         |GROUP BY p.doc_id, p.h
         |HAVING COUNT(e.pos) = 4""".stripMargin,
    // mirrors Dedup.bloomFprAudit: same position-set replay as the screen
    // oracle over a salted non-member probe batch; the analytic rate's one
    // libm expression (exp/pow) quantizes to DECIMAL(18,9) like BM25's ln
    "dedup_bloom_fpr" ->
      s"""WITH ex AS (SELECT DISTINCT md5(text) AS h FROM documents),
         |nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes FROM ex),
         |expos AS (
         |  SELECT DISTINCT ${hex5Sql("m")} AS pos
         |  FROM (SELECT md5(CAST(i AS VARCHAR) || ':' || h) AS m
         |        FROM ex, UNNEST(range(4)) AS t(i))),
         |pr AS (SELECT doc_id, md5(text || ' fprprobe') AS h FROM documents),
         |prpos AS (
         |  SELECT doc_id, h, ${hex5Sql("m")} AS pos
         |  FROM (SELECT doc_id, h, md5(CAST(i AS VARCHAR) || ':' || h) AS m
         |        FROM pr, UNNEST(range(4)) AS t(i))),
         |hits AS (SELECT p.doc_id
         |         FROM prpos p LEFT JOIN expos e ON p.pos = e.pos
         |         GROUP BY p.doc_id, p.h
         |         HAVING COUNT(e.pos) = 4),
         |agg AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pr) AS n_probes,
         |               (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_flagged)
         |SELECT nh.n_hashes, CAST(1048576 AS BIGINT) AS m_bits, agg.n_probes, agg.n_flagged,
         |       CAST(agg.n_flagged AS DOUBLE) / CAST(agg.n_probes AS DOUBLE) AS observed_fpr,
         |       CAST(CAST(power(CAST(1.0 AS DOUBLE)
         |                       - exp(CAST(-4.0 AS DOUBLE) * CAST(nh.n_hashes AS DOUBLE) / CAST(1048576.0 AS DOUBLE)),
         |                     CAST(4.0 AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE) AS expected_fpr
         |FROM nh, agg""".stripMargin,
    "dedup_bloom_screen_sharded" ->
      s"""WITH inraw AS (
         |  SELECT a.doc_id,
         |         md5(CASE WHEN a.doc_id % 20 = 0 THEN b.text ELSE a.text END) AS h
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
         |  WHERE a.doc_id % 10 = 0),
         |exraw AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 10 != 0),
         |inpos AS (
         |  SELECT doc_id, h, substr(md5('shard:' || h), 1, 1) AS shard, ${hex5Sql("m")} AS pos
         |  FROM (SELECT doc_id, h, md5(CAST(i AS VARCHAR) || ':' || h) AS m
         |        FROM inraw, UNNEST(range(4)) AS t(i))),
         |expos AS (
         |  SELECT DISTINCT substr(md5('shard:' || h), 1, 1) AS shard, ${hex5Sql("m")} AS pos
         |  FROM (SELECT h, md5(CAST(i AS VARCHAR) || ':' || h) AS m
         |        FROM exraw, UNNEST(range(4)) AS t(i)))
         |SELECT p.doc_id, p.h
         |FROM inpos p LEFT JOIN expos e ON p.shard = e.shard AND p.pos = e.pos
         |GROUP BY p.doc_id, p.h
         |HAVING COUNT(e.pos) = 4""".stripMargin,
    "curate_temperature" ->
      """WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |r AS (SELECT lang, sqrt(CAST((SELECT MIN(n) FROM counts) AS DOUBLE) / n) AS rate
        |      FROM counts)
        |SELECT d.doc_id, d.lang, r.rate
        |FROM documents d JOIN r USING (lang)
        |WHERE substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 4) <
        |      CASE WHEN r.rate >= 1 THEN 'g'
        |           ELSE printf('%04x', CAST(floor(r.rate * 65536) AS INT)) END""".stripMargin,
    // mirrors Curation.balancedSample: min/n rate, 'bal:'-salted hash cut
    "curate_balanced_sample" ->
      """WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |r AS (SELECT lang, CAST((SELECT MIN(n) FROM counts) AS DOUBLE) / CAST(n AS DOUBLE) AS rate
        |      FROM counts)
        |SELECT d.doc_id, d.lang, r.rate
        |FROM documents d JOIN r USING (lang)
        |WHERE substr(md5('bal:' || CAST(d.doc_id AS VARCHAR)), 1, 4) <
        |      CASE WHEN r.rate >= 1 THEN 'g'
        |           ELSE printf('%04x', CAST(floor(r.rate * 65536) AS INT)) END""".stripMargin,
    // mirrors Dedup.lshCurve(8 hashes / band size 2): powers unrolled to the
    // identical left-associated multiplication chains
    "dedup_lsh_curve" ->
      """WITH probe AS (SELECT CAST(t / 20.0 AS DOUBLE) AS threshold
        |               FROM UNNEST(range(10, 20)) AS u(t)),
        |q AS (SELECT threshold, 1.0 - threshold * threshold AS q FROM probe)
        |SELECT threshold, CAST(4 AS BIGINT) AS n_bands, CAST(2 AS BIGINT) AS band_size,
        |       1.0 - ((q * q) * q) * q AS p_detect
        |FROM q""".stripMargin,
    "graph_pagerank" -> pageRankOracleSql(),
    // mirrors Graph.pageRankDelta(iters=5): one unrolled chain, r4 vs r5
    // joined, exact integer L1/max deltas
    "graph_pagerank_delta" ->
      s"""WITH ${pageRankCtes(PlantedEdgesSql, 5, 8500, 1000000000000L, None)},
         |d AS (SELECT a.domain,
         |             ABS(CAST(a.rank_fp AS BIGINT) - CAST(b.rank_fp AS BIGINT)) AS dfp
         |      FROM r5 a JOIN r4 b ON a.domain = b.domain)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |       CAST(SUM(dfp) AS BIGINT) AS l1_delta_fp,
         |       CAST(MAX(dfp) AS BIGINT) AS max_delta_fp,
         |       CAST(CAST(SUM(dfp) AS BIGINT) AS DOUBLE) / 1000000000000.0 AS l1_delta
         |FROM d""".stripMargin,
    // mirrors Graph.triangles over the planted link graph: undirected
    // distinct edges, (degree, node) orientation, wedge join closed by one
    // oriented-edge probe; lcc in the same pinned expression order
    "graph_triangles" ->
      """WITH raw AS (
        |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS dst FROM documents
        |  UNION ALL SELECT 'cdn' || CAST(doc_id % 3 AS VARCHAR), 'site' || CAST(doc_id % 5 AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'site' || CAST((doc_id + 3) % 7 AS VARCHAR) FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'sink' FROM documents WHERE doc_id % 11 = 0),
        |und AS (
        |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |  FROM raw WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
        |deg AS (
        |  SELECT v, COUNT(*) AS deg FROM (
        |    SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS lo,
        |         CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS hi,
        |         CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS dhi
        |  FROM und
        |  JOIN (SELECT v AS a, deg AS da FROM deg) USING (a)
        |  JOIN (SELECT v AS b, deg AS db FROM deg) USING (b)),
        |tri AS (
        |  SELECT e1.lo AS u, e1.hi AS v, e2.hi AS w
        |  FROM o e1 JOIN o e2 ON e1.lo = e2.lo
        |   AND (e1.dhi < e2.dhi OR (e1.dhi = e2.dhi AND e1.hi < e2.hi))
        |  JOIN o e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
        |cnt AS (
        |  SELECT node, COUNT(*) AS t FROM (
        |    SELECT u AS node FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
        |  GROUP BY 1)
        |SELECT deg.v AS node, CAST(deg.deg AS BIGINT) AS degree,
        |       CAST(COALESCE(cnt.t, 0) AS BIGINT) AS n_triangles,
        |       CASE WHEN deg.deg >= 2
        |            THEN (2.0 * CAST(COALESCE(cnt.t, 0) AS DOUBLE)) /
        |                 (CAST(deg.deg AS DOUBLE) * CAST(deg.deg - 1 AS DOUBLE)) END AS lcc
        |FROM deg LEFT JOIN cnt ON deg.v = cnt.node""".stripMargin,
    // mirrors Graph.reciprocity over the directed planted graph: distinct
    // simple edges, reversed-key self-join, full-outer degree stitch
    "graph_reciprocity" ->
      """WITH raw AS (
        |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS dst FROM documents
        |  UNION ALL SELECT 'cdn' || CAST(doc_id % 3 AS VARCHAR), 'site' || CAST(doc_id % 5 AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'site' || CAST((doc_id + 3) % 7 AS VARCHAR) FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'sink' FROM documents WHERE doc_id % 11 = 0),
        |e AS (SELECT DISTINCT src, dst FROM raw
        |      WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
        |recip AS (SELECT f.src AS node, CAST(COUNT(*) AS BIGINT) AS n_recip
        |          FROM e f JOIN e r ON f.src = r.dst AND f.dst = r.src GROUP BY 1),
        |od AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS out_deg FROM e GROUP BY 1),
        |idg AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS in_deg FROM e GROUP BY 1),
        |n AS (SELECT COALESCE(od.node, idg.node) AS node,
        |             COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg
        |      FROM od FULL OUTER JOIN idg ON od.node = idg.node)
        |SELECT n.node, n.out_deg, n.in_deg, COALESCE(r.n_recip, 0) AS n_recip,
        |       CAST(COALESCE(r.n_recip, 0) AS DOUBLE) /
        |         CAST(NULLIF(n.out_deg, 0) AS DOUBLE) AS recip_rate
        |FROM n LEFT JOIN recip r ON n.node = r.node""".stripMargin,
    // mirrors Graph.covisitation (uncapped gate config) over the
    // (user, props.k) bipartite pairs: distinct engagement, degrees from
    // the full frame, exact-integer Jaccard
    "graph_covisit" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id AS u,
        |         TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item
        |  FROM events
        |  WHERE TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) IS NOT NULL),
        |deg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |co AS (SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS n_both
        |       FROM e a JOIN e b ON a.u = b.u AND a.item < b.item GROUP BY 1, 2)
        |SELECT co.item_a, co.item_b, co.n_both, da.deg AS deg_a, db.deg AS deg_b,
        |       CAST(co.n_both AS DOUBLE) / CAST(da.deg + db.deg - co.n_both AS DOUBLE) AS affinity
        |FROM co JOIN deg da ON co.item_a = da.item
        |        JOIN deg db ON co.item_b = db.item""".stripMargin,
    // mirrors Search.phraseHits over the probe 4-word phrases: positional
    // index, anchor = pos - qpos, full phrase iff all distinct offsets
    // present at one anchor
    "search_phrase" -> PhraseAnchorOracleSql,
    "search_phrase_store" -> PhraseAnchorOracleSql,
    // mirrors Similarity.hardTriplets(anchorMod=40): min-(sim,id) positive,
    // max-(sim,-id) negative via explicit-tie-break rank windows
    "embed_triplets" ->
      s"""WITH c AS (
         |  SELECT q.vec_id AS anchor_id, CAST(q.label AS BIGINT) AS a_label,
         |         d.vec_id AS neighbor_id, d.label AS n_label,
         |         $CosineSql AS sim
         |  FROM embeddings q JOIN embeddings d
         |    ON q.vec_id % 40 = 0 AND d.vec_id != q.vec_id),
         |p AS (SELECT anchor_id, neighbor_id AS pos_id, sim AS pos_sim,
         |             ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY sim ASC, neighbor_id ASC) AS rk
         |      FROM c WHERE n_label = a_label),
         |n AS (SELECT anchor_id, neighbor_id AS neg_id, sim AS neg_sim,
         |             ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY sim DESC, neighbor_id ASC) AS rk
         |      FROM c WHERE n_label != a_label),
         |a AS (SELECT DISTINCT anchor_id, a_label AS label FROM c)
         |SELECT a.anchor_id, a.label, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim,
         |       p.pos_sim - n.neg_sim AS margin
         |FROM a JOIN p ON a.anchor_id = p.anchor_id AND p.rk = 1
         |       JOIN n ON a.anchor_id = n.anchor_id AND n.rk = 1""".stripMargin,
    // mirrors Graph.degreeHistogram over the full planted graph: distinct
    // simple edges, per-direction degree counts, log2 banding
    "graph_degree_hist" ->
      """WITH raw AS (
        |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS dst FROM documents
        |  UNION ALL SELECT 'cdn' || CAST(doc_id % 3 AS VARCHAR), 'site' || CAST(doc_id % 5 AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'site' || CAST((doc_id + 3) % 7 AS VARCHAR) FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'sink' FROM documents WHERE doc_id % 11 = 0),
        |e AS (SELECT DISTINCT src, dst FROM raw
        |      WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
        |od AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
        |idg AS (SELECT dst AS node, COUNT(*) AS deg FROM e GROUP BY 1),
        |ho AS (SELECT 'out' AS direction, CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
        |              CAST(COUNT(*) AS BIGINT) AS n_nodes FROM od GROUP BY 2),
        |hi AS (SELECT 'in' AS direction, CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
        |              CAST(COUNT(*) AS BIGINT) AS n_nodes FROM idg GROUP BY 2)
        |SELECT direction, bucket, CAST(2 ** bucket AS BIGINT) AS min_degree, n_nodes FROM ho
        |UNION ALL
        |SELECT direction, bucket, CAST(2 ** bucket AS BIGINT) AS min_degree, n_nodes FROM hi""".stripMargin,
    // mirrors Graph.khopReach(maxHops=3): distinct-triple recursion bounded
    // at depth 3, min-hop levels
    "graph_khop" ->
      """WITH RECURSIVE raw AS (
        |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS dst FROM documents
        |  UNION ALL SELECT 'cdn' || CAST(doc_id % 3 AS VARCHAR), 'site' || CAST(doc_id % 5 AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'site' || CAST((doc_id + 3) % 7 AS VARCHAR) FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'sink' FROM documents WHERE doc_id % 11 = 0),
        |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw
        |     WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
        |seeds AS (SELECT 'site0' AS domain UNION ALL SELECT 'site1'),
        |walk(seed, node, hops) AS (
        |  SELECT domain, domain, CAST(0 AS BIGINT) FROM seeds
        |  UNION
        |  SELECT w.seed, e.dst, w.hops + 1 FROM walk w JOIN e ON w.node = e.src
        |  WHERE w.hops < 3),
        |d AS (SELECT seed, node, MIN(hops) AS hops FROM walk GROUP BY 1, 2)
        |SELECT seed, hops, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |FROM d GROUP BY 1, 2""".stripMargin,
    "graph_trustrank" -> pageRankOracleSql(seedsSql =
      Some("SELECT 'site0' AS domain UNION ALL SELECT 'site1' AS domain")),
    "graph_hits" -> hitsOracleSql(),
    "graph_kcore" -> kcoreOracleSql(k = 3, rounds = 6),
    "graph_lpa" -> lpaOracleSql(rounds = 4),
    "graph_modularity" -> modularityOracleSql(rounds = 4),
    // mirrors Graph.degreeCentralization: exact n*dmax - sum(deg), one
    // closing division, NULL normalizer below 3 nodes
    "graph_centralization" ->
      s"""WITH e AS MATERIALIZED (
         |$PlantedEdgesSql),
         |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |        FROM e WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
         |dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |         SELECT a AS u FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |             CAST(MAX(deg) AS BIGINT) AS max_degree,
         |             CAST(SUM(deg) AS BIGINT) AS deg_sum
         |      FROM dg),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und)
         |SELECT s.n_nodes, m.n_edges, s.max_degree,
         |       CAST(CAST(s.n_nodes AS HUGEINT) * s.max_degree - s.deg_sum AS BIGINT)
         |         AS sum_diff,
         |       CASE WHEN s.n_nodes >= 3 THEN
         |         CAST(CAST(CAST(s.n_nodes AS HUGEINT) * s.max_degree - s.deg_sum AS BIGINT) AS DOUBLE)
         |           / CAST((s.n_nodes - 1) * (s.n_nodes - 2) AS DOUBLE)
         |       END AS centralization
         |FROM s, m""".stripMargin,
    // mirrors Graph.harmonicCentrality(maxHops=3): per-round frontier
    // expansion with NOT-EXISTS min-hop guards, 60//hop exact scores
    "graph_harmonic" ->
      s"""WITH e AS MATERIALIZED (
         |$PlantedEdgesSql),
         |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |        FROM e WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
         |bi AS MATERIALIZED (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
         |h1 AS MATERIALIZED (SELECT DISTINCT u AS src, v AS dst FROM bi),
         |h2 AS MATERIALIZED (
         |  SELECT DISTINCT r.src, bi.v AS dst FROM h1 r JOIN bi ON r.dst = bi.u
         |  WHERE r.src != bi.v
         |    AND NOT EXISTS (SELECT 1 FROM h1 p WHERE p.src = r.src AND p.dst = bi.v)),
         |h3 AS MATERIALIZED (
         |  SELECT DISTINCT r.src, bi.v AS dst FROM h2 r JOIN bi ON r.dst = bi.u
         |  WHERE r.src != bi.v
         |    AND NOT EXISTS (SELECT 1 FROM h1 p WHERE p.src = r.src AND p.dst = bi.v)
         |    AND NOT EXISTS (SELECT 1 FROM h2 p WHERE p.src = r.src AND p.dst = bi.v)),
         |a AS (SELECT src, 1 AS hop FROM h1
         |      UNION ALL SELECT src, 2 FROM h2
         |      UNION ALL SELECT src, 3 FROM h3)
         |SELECT src AS domain, CAST(COUNT(*) AS BIGINT) AS n_reached,
         |       CAST(SUM(60 // hop) AS BIGINT) AS harmonic_fp60,
         |       CAST(CAST(SUM(60 // hop) AS BIGINT) AS DOUBLE) / 60.0 AS harmonic
         |FROM a GROUP BY 1""".stripMargin,
    // mirrors Graph.linkPredict: wedge-join candidates on the shared
    // neighbor, existing edges anti-joined out, exact-integer Jaccard
    "graph_link_predict" ->
      """WITH raw AS (
        |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS dst FROM documents
        |  UNION ALL SELECT 'cdn' || CAST(doc_id % 3 AS VARCHAR), 'site' || CAST(doc_id % 5 AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'site' || CAST((doc_id + 3) % 7 AS VARCHAR) FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'sink' FROM documents WHERE doc_id % 11 = 0),
        |und AS (
        |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |  FROM raw WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
        |bi AS (SELECT a AS v, b AS n FROM und UNION ALL SELECT b, a FROM und),
        |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM bi GROUP BY 1),
        |cand AS (
        |  SELECT e1.n AS a, e2.n AS b, CAST(COUNT(*) AS BIGINT) AS common_neighbors
        |  FROM bi e1 JOIN bi e2 ON e1.v = e2.v AND e1.n < e2.n
        |  GROUP BY 1, 2),
        |nc AS (SELECT c.* FROM cand c LEFT JOIN und u ON c.a = u.a AND c.b = u.b
        |       WHERE u.a IS NULL)
        |SELECT nc.a, nc.b, nc.common_neighbors, da.deg AS deg_a, db.deg AS deg_b,
        |       CAST(nc.common_neighbors AS DOUBLE) /
        |         CAST(da.deg + db.deg - nc.common_neighbors AS DOUBLE) AS jaccard
        |FROM nc JOIN deg da ON nc.a = da.v JOIN deg db ON nc.b = db.v""".stripMargin,
    // mirrors Graph.adamicAdar: same wedge/anti-join candidates as
    // link_predict, per-pair sorted-fold 1/ln(deg) and 1/deg sums over the
    // collected center degrees (deg >= 2 by wedge construction, ln finite)
    "graph_adamic_adar" ->
      """WITH raw AS (
        |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS dst FROM documents
        |  UNION ALL SELECT 'cdn' || CAST(doc_id % 3 AS VARCHAR), 'site' || CAST(doc_id % 5 AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'site' || CAST((doc_id + 3) % 7 AS VARCHAR) FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'sink' FROM documents WHERE doc_id % 11 = 0),
        |und AS (
        |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |  FROM raw WHERE src != dst AND src IS NOT NULL AND dst IS NOT NULL),
        |bi AS (SELECT a AS v, b AS n FROM und UNION ALL SELECT b, a FROM und),
        |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM bi GROUP BY 1),
        |cand AS (
        |  SELECT e1.n AS a, e2.n AS b, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
        |         list_sort(list(dv.deg)) AS degs
        |  FROM bi e1 JOIN bi e2 ON e1.v = e2.v AND e1.n < e2.n
        |  JOIN deg dv ON e1.v = dv.v
        |  GROUP BY 1, 2),
        |nc AS (SELECT c.* FROM cand c LEFT JOIN und u ON c.a = u.a AND c.b = u.b
        |       WHERE u.a IS NULL)
        |SELECT a, b, common_neighbors,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), degs),
        |         (acc, d) -> acc + 1.0 / ln(CAST(d AS DOUBLE))) AS adamic_adar,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), degs),
        |         (acc, d) -> acc + 1.0 / CAST(d AS DOUBLE)) AS resource_alloc
        |FROM nc""".stripMargin,
    "graph_assortativity" -> AssortativityOracleSql,
    "graph_components" ->
      """WITH RECURSIVE e0 AS MATERIALIZED (
        |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS a, 'cdn' || CAST(doc_id % 3 AS VARCHAR) AS b
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT 'isle' || CAST(doc_id % 4 AS VARCHAR), 'isle' || CAST((doc_id + 1) % 4 AS VARCHAR)
        |  FROM documents WHERE doc_id % 2 = 1),
        |edges AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0 UNION SELECT b, a FROM e0),
        |reach(src, dst) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |c AS (SELECT src AS domain, MIN(dst) AS component_id FROM reach GROUP BY 1),
        |s AS (SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_domains FROM c GROUP BY 1)
        |SELECT c.domain, c.component_id, s.n_domains FROM c JOIN s USING (component_id)""".stripMargin,
    "embed_top_pc" -> topPcOracleSql(),
    // mirrors pcVarianceExplained: the pc_project CTEs, exact projection
    // moments, the dim_stats variance fold, two pinned closing expressions
    "embed_pc_var" ->
      s"""WITH ${topPcCtes(8, 1000000L)},
         |proj AS (
         |  SELECT el.vec_id,
         |         SUM(CAST(el.fp AS HUGEINT) * (v.v_fp * sgn)) AS score
         |  FROM el JOIN v8 v ON el.d = v.dim CROSS JOIN sg GROUP BY 1),
         |pf AS (
         |  SELECT vec_id,
         |         CAST(CASE WHEN score < 0 THEN -(abs(score) // 1048576)
         |                   ELSE score // 1048576 END AS BIGINT) AS proj_fp
         |  FROM proj),
         |pa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |              CAST(SUM(proj_fp) AS BIGINT) AS sp,
         |              SUM(CAST(proj_fp AS HUGEINT) * proj_fp) AS spp
         |       FROM pf),
         |ds AS (SELECT d, COUNT(*) AS nv, CAST(SUM(fp) AS BIGINT) AS fs,
         |              CAST(SUM(fp * fp) AS BIGINT) AS fss
         |       FROM el GROUP BY 1),
         |dvar AS (SELECT fss / (nv * 1048576 * 1048576) -
         |                (fs / (nv * 1048576)) * (fs / (nv * 1048576)) AS variance
         |         FROM ds),
         |tv AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(variance))), (acc, v) -> acc + v) AS total_var FROM dvar),
         |u2 AS (SELECT SUM(CAST(v_fp * sgn AS HUGEINT) * (v_fp * sgn)) AS u2
         |       FROM v8 CROSS JOIN sg),
         |pv AS (SELECT n_vecs,
         |              CASE WHEN u2 > 0 THEN
         |                (CAST(spp AS DOUBLE) / 1000000000000.0 / CAST(n_vecs AS DOUBLE)
         |                  - (CAST(sp AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1000000.0)
         |                    * (CAST(sp AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1000000.0))
         |                  / (CAST(u2 AS DOUBLE) / 1000000000000.0)
         |              END AS pc_var
         |       FROM pa CROSS JOIN u2)
         |SELECT pv.n_vecs, pv.pc_var, tv.total_var,
         |       CASE WHEN tv.total_var > 0.0 THEN pv.pc_var / tv.total_var END AS var_explained
         |FROM pv CROSS JOIN tv""".stripMargin,
    "embed_pc_project" ->
      s"""WITH ${topPcCtes(8, 1000000L)},
         |proj AS (
         |  SELECT el.vec_id,
         |         SUM(CAST(el.fp AS HUGEINT) * (v.v_fp * sgn)) AS score
         |  FROM el JOIN v8 v ON el.d = v.dim CROSS JOIN sg GROUP BY 1),
         |pf AS (
         |  SELECT vec_id,
         |         CAST(CASE WHEN score < 0 THEN -(abs(score) // 1048576)
         |                   ELSE score // 1048576 END AS BIGINT) AS proj_fp
         |  FROM proj)
         |SELECT vec_id, proj_fp, CAST(proj_fp AS DOUBLE) / 1000000 AS proj
         |FROM pf""".stripMargin,
    // mirrors Similarity.quantizeError(flagAt=1e-4): the int8 quantizer's
    // exact math (float max-abs, floor(x/mx*127+0.5), scale mx/127),
    // index-order error folds
    "embed_quantize_error" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |         CAST(list_aggregate(list_transform(embedding, v -> abs(v)), 'max')
        |              AS DOUBLE) AS mxr
        |  FROM embeddings),
        |q2 AS (SELECT vec_id, embedding,
        |              CASE WHEN isfinite(mxr) THEN mxr ELSE 0.0 END AS mxd
        |       FROM q),
        |q3 AS (SELECT vec_id, embedding, mxd / 127.0 AS scale,
        |              list_transform(embedding, v ->
        |                CASE WHEN mxd > 0.0
        |                     THEN FLOOR(CAST(v AS DOUBLE) / mxd * 127.0 + 0.5)
        |                     ELSE 0.0 END) AS qv
        |       FROM q2),
        |e AS (SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims, scale,
        |             list_transform(list_zip(embedding, qv),
        |               s -> CAST(s[1] AS DOUBLE) - s[2] * scale) AS errs
        |      FROM q3)
        |SELECT vec_id, n_dims, scale,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |         list_transform(errs, x -> x * x)), (acc, v) -> acc + v)
        |         / CAST(n_dims AS DOUBLE) AS mse,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |         list_transform(errs, x -> abs(x))), (acc, v) -> GREATEST(acc, v))
        |         AS max_abs_err,
        |       CAST(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |              list_transform(errs, x -> x * x)), (acc, v) -> acc + v)
        |              / CAST(n_dims AS DOUBLE) > 0.0001
        |            THEN 1 ELSE 0 END AS BIGINT) AS lossy_flag
        |FROM e""".stripMargin,
    // mirrors Similarity.mahalanobisDiag(flagAt=4.0) over the corruption
    // plant: dimStats exact-grid moments, per-(vec, dim) pinned term,
    // ascending-dim sorted fold
    "embed_mahalanobis" ->
      """WITH p AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 97 = 0 THEN list_transform(embedding, v -> CAST(0.0 AS FLOAT))
        |         WHEN vec_id % 50 = 0 THEN list_transform(embedding, v -> CAST(v * CAST(3.0 AS FLOAT) AS FLOAT))
        |         ELSE embedding END AS embedding
        |  FROM embeddings),
        |e AS (SELECT vec_id, UNNEST(embedding) AS v,
        |             generate_subscripts(embedding, 1) AS d FROM p),
        |s AS (SELECT d, COUNT(*) AS n_vecs,
        |         CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT)) AS BIGINT) AS fp_sum,
        |         CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT) *
        |                  CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT)) AS BIGINT) AS fp_sumsq
        |      FROM e GROUP BY 1),
        |m AS (SELECT d, fp_sum / (n_vecs * 1048576) AS mean,
        |             fp_sumsq / (n_vecs * 1048576 * 1048576) -
        |               (fp_sum / (n_vecs * 1048576)) * (fp_sum / (n_vecs * 1048576)) AS variance
        |      FROM s),
        |t AS (SELECT e.vec_id, e.d,
        |             CASE WHEN m.variance > 0.0
        |                  THEN (CAST(e.v AS DOUBLE) - m.mean) * (CAST(e.v AS DOUBLE) - m.mean)
        |                       / m.variance
        |                  ELSE 0.0 END AS t
        |      FROM e JOIN m ON e.d = m.d),
        |g AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
        |             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(list_sort(list(struct_pack(d := d, t := t))),
        |                              q -> q.t)),
        |               (acc, v) -> acc + v) AS m2
        |      FROM t GROUP BY 1)
        |SELECT vec_id, n_dims, m2, m2 / CAST(n_dims AS DOUBLE) AS m2_per_dim,
        |       CAST(CASE WHEN m2 / CAST(n_dims AS DOUBLE) > 4.0 THEN 1 ELSE 0 END AS BIGINT)
        |         AS ood_flag
        |FROM g""".stripMargin,
    "embed_norm_outliers" ->
      """WITH p AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 97 = 0 THEN list_transform(embedding, v -> CAST(0.0 AS FLOAT))
        |         WHEN vec_id % 50 = 0 THEN list_transform(embedding, v -> CAST(v * CAST(3.0 AS FLOAT) AS FLOAT))
        |         ELSE embedding END AS embedding
        |  FROM embeddings),
        |e AS (SELECT vec_id, UNNEST(embedding) AS v FROM p),
        |n2 AS (SELECT vec_id,
        |         CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT) *
        |                  CAST(FLOOR(CAST(v AS DOUBLE) * 1048576 + 0.5) AS BIGINT)) AS BIGINT) AS n2_fp
        |       FROM e GROUP BY 1),
        |m AS (SELECT CAST(SUM(n2_fp) // COUNT(*) AS BIGINT) AS mean_n2 FROM n2)
        |SELECT vec_id, n2_fp, mean_n2,
        |       sqrt(CAST(n2_fp AS DOUBLE)) / 1048576 AS norm,
        |       CAST(CASE WHEN n2_fp * 10000 < mean_n2 * 2500 THEN 1
        |                 WHEN n2_fp * 10000 > mean_n2 * 40000 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM n2 CROSS JOIN m""".stripMargin,
    "curate_source_overlap" ->
      """WITH nb AS (SELECT doc_id + 1 AS doc_id, text AS ntext FROM documents),
        |p AS (SELECT d.doc_id,
        |        CASE WHEN d.doc_id % 10 = 0 AND nb.ntext IS NOT NULL THEN nb.ntext
        |             ELSE d.text END AS text,
        |        d.source
        |      FROM documents d LEFT JOIN nb ON d.doc_id = nb.doc_id),
        |h AS (SELECT DISTINCT md5(coalesce(text, '')) AS h, source FROM p)
        |SELECT a.source AS source_a, b.source AS source_b, CAST(COUNT(*) AS BIGINT) AS n_shared_hashes
        |FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    // mirrors SimilarityIvf.listBalance(nLists=16): assignment counts +
    // 1-row totals, load factor in the pinned n_vecs * 16 / n_total order
    "embed_ivf_balance" ->
      s"""$IvfTopCte,
         |sizes AS (SELECT CAST(list_id AS BIGINT) AS list_id,
         |                 CAST(COUNT(*) AS BIGINT) AS n_vecs
         |          FROM assigned GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total,
         |               CAST(COUNT(*) AS BIGINT) AS n_lists_used FROM sizes)
         |SELECT list_id, n_vecs, n_lists_used,
         |       CAST(n_vecs AS DOUBLE) * 16 / CAST(n_total AS DOUBLE) AS load_factor
         |FROM sizes, tot""".stripMargin,
    // mirrors SimilarityIvf.centroidSilhouette(nLists=16): same seeded
    // centroid CTE as the IVF family, top-2 centroid rank per vector,
    // per-row s quantized DECIMAL(18,9) so the list mean is an exact sum
    "embed_silhouette" ->
      """WITH cents AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS list_id,
        |         embedding AS centroid,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS cnorm
        |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        |corpus AS (
        |  SELECT vec_id, embedding,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS vnorm
        |  FROM embeddings),
        |ranked AS (
        |  SELECT c.vec_id, t.list_id,
        |         list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(t.centroid AS DOUBLE[]))
        |           / (c.vnorm * t.cnorm) AS csim,
        |         ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
        |           list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(t.centroid AS DOUBLE[]))
        |             / (c.vnorm * t.cnorm) DESC, t.list_id) AS rn
        |  FROM corpus c CROSS JOIN cents t WHERE c.vnorm > 0),
        |top2 AS (SELECT vec_id,
        |                MAX(CASE WHEN rn = 1 THEN list_id END) AS list_id,
        |                MAX(CASE WHEN rn = 1 THEN csim END) AS sim1,
        |                MAX(CASE WHEN rn = 2 THEN csim END) AS sim2
        |         FROM ranked WHERE rn <= 2 GROUP BY 1),
        |sil AS (SELECT list_id,
        |               CASE WHEN GREATEST(CAST(1.0 AS DOUBLE) - sim1, CAST(1.0 AS DOUBLE) - sim2) = CAST(0.0 AS DOUBLE)
        |                    THEN CAST(0.0 AS DOUBLE)
        |                    ELSE ((CAST(1.0 AS DOUBLE) - sim2) - (CAST(1.0 AS DOUBLE) - sim1))
        |                         / GREATEST(CAST(1.0 AS DOUBLE) - sim1, CAST(1.0 AS DOUBLE) - sim2) END AS s
        |        FROM top2)
        |SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       CAST(SUM(CAST(s AS DECIMAL(18,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_silhouette,
        |       MIN(s) AS min_silhouette, MAX(s) AS max_silhouette
        |FROM sil GROUP BY 1""".stripMargin,
    "embed_label_purity" ->
      s"""$IvfTopCte,
         |lc AS (SELECT a.list_id, e.label, CAST(COUNT(*) AS BIGINT) AS n
         |       FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id GROUP BY 1, 2),
         |maj AS (SELECT list_id, label AS majority_label, n AS n_majority FROM (
         |          SELECT *, ROW_NUMBER() OVER (PARTITION BY list_id ORDER BY n DESC, label) AS rn FROM lc)
         |        WHERE rn = 1),
         |tot AS (SELECT list_id, CAST(SUM(n) AS BIGINT) AS n_vecs,
         |               CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels
         |        FROM lc GROUP BY 1)
         |SELECT CAST(t.list_id AS BIGINT) AS list_id, t.n_vecs, t.n_labels,
         |       m.majority_label, m.n_majority,
         |       CAST(m.n_majority AS DOUBLE) / t.n_vecs AS purity
         |FROM tot t JOIN maj m USING (list_id)""".stripMargin,
    "curate_keep_reasons" ->
      s"""WITH nbkr AS (SELECT doc_id + 1 AS doc_id, text AS ntext FROM documents),
         |p AS MATERIALIZED (
         |  SELECT d.doc_id,
         |         CASE WHEN d.doc_id % 20 = 0 AND nbkr.ntext IS NOT NULL
         |              THEN upper(replace(nbkr.ntext, ' ', '  ')) || ' !!!'
         |              ELSE d.text END AS text
         |  FROM documents d LEFT JOIN nbkr ON d.doc_id = nbkr.doc_id),
         |gf AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |         length(replace(text, ' ', '')) * 1.0 / nullif(len(string_split(text, ' ')), 0) AS avg_word_len,
         |         len(regexp_extract_all(text, '[^\\p{L}\\p{N} ]')) * 1.0 / nullif(length(text), 0) AS punct_ratio,
         |         CAST(GREATEST(${hitsSql("de")}, ${hitsSql("en")}, ${hitsSql("es")}, ${hitsSql("fr")}) AS BIGINT) AS stop_hits
         |  FROM p),
         |gop AS (
         |  SELECT doc_id,
         |         CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END
         |            * CASE WHEN avg_word_len >= 3.0 AND avg_word_len <= 10.0 THEN 1 ELSE 0 END
         |            * CASE WHEN punct_ratio <= 0.2 THEN 1 ELSE 0 END
         |            * CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_gopher
         |  FROM gf),
         |enc AS (
         |  SELECT doc_id,
         |         CAST(CASE WHEN len(regexp_extract_all(coalesce(text, ''), '${graft.operators.TextAnalysis.MojibakePattern}')) = 0
         |                    AND len(regexp_extract_all(coalesce(text, ''), '�')) = 0
         |                   THEN 1 ELSE 0 END AS BIGINT) AS r_encoding
         |  FROM p),
         |cd AS (
         |  SELECT doc_id,
         |         CAST(CASE WHEN (length(coalesce(text, '')) > 0
         |                         AND CAST(len(regexp_extract_all(coalesce(text, ''), '${graft.operators.TextAnalysis.CodeSymbolPattern}')) AS DOUBLE)
         |                             / length(coalesce(text, '')) > 0.03)
         |                     OR len(regexp_extract_all(coalesce(text, ''), '(?m)^(  |\t)')) >= 2
         |                   THEN 0 ELSE 1 END AS BIGINT) AS r_prose
         |  FROM p),
         |ca AS (
         |  SELECT doc_id,
         |         CAST(CASE WHEN doc_id = MIN(doc_id) OVER (
         |             PARTITION BY md5(trim(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9]+', ' ', 'g'))))
         |              THEN 1 ELSE 0 END AS BIGINT) AS r_canonical
         |  FROM p),
         |ng AS (
         |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS g
         |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM p),
         |       UNNEST(range(1, len(ws) - 6)) AS t(i)),
         |pr AS (SELECT doc_id AS probe_id, g FROM ng WHERE doc_id % 10 = 0),
         |ht AS (
         |  SELECT d.doc_id FROM ng d JOIN pr p ON d.g = p.g AND d.doc_id != p.probe_id
         |  GROUP BY d.doc_id, p.probe_id HAVING COUNT(*) >= 3),
         |dc AS (
         |  SELECT d.doc_id,
         |         CAST(CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS r_decontam
         |  FROM p d LEFT JOIN (SELECT DISTINCT doc_id FROM ht) h ON d.doc_id = h.doc_id)
         |SELECT d.doc_id, enc.r_encoding, gop.r_gopher, cd.r_prose, ca.r_canonical, dc.r_decontam,
         |       enc.r_encoding * gop.r_gopher * cd.r_prose * ca.r_canonical * dc.r_decontam AS keep,
         |       (1 - enc.r_encoding) * 1 + (1 - gop.r_gopher) * 2 + (1 - cd.r_prose) * 4 +
         |       (1 - ca.r_canonical) * 8 + (1 - dc.r_decontam) * 16 AS fail_mask
         |FROM p d
         |JOIN enc ON d.doc_id = enc.doc_id JOIN gop ON d.doc_id = gop.doc_id
         |JOIN cd ON d.doc_id = cd.doc_id JOIN ca ON d.doc_id = ca.doc_id
         |JOIN dc ON d.doc_id = dc.doc_id""".stripMargin,
    "curate_decontam" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |       UNNEST(range(1, len(ws) - 6)) AS t(i)),
        |probes AS (SELECT doc_id AS probe_id, g FROM g WHERE doc_id % 10 = 0),
        |hits AS (
        |  SELECT d.doc_id, p.probe_id, COUNT(*) AS shared
        |  FROM g d JOIN probes p ON d.g = p.g AND d.doc_id != p.probe_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |r AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_probes_hit,
        |        CAST(SUM(shared) AS BIGINT) AS n_shared_grams,
        |        CAST(MAX(shared) AS BIGINT) AS max_shared
        |      FROM hits GROUP BY 1)
        |SELECT d.doc_id, COALESCE(r.n_probes_hit, 0) AS n_probes_hit,
        |       COALESCE(r.n_shared_grams, 0) AS n_shared_grams,
        |       COALESCE(r.max_shared, 0) AS max_shared,
        |       CAST(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id""".stripMargin,
    "text_ngram_novelty" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |       UNNEST(range(1, len(ws) - 6)) AS t(i)),
        |df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM g GROUP BY 1),
        |r AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |        CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |      FROM g JOIN df USING (g) GROUP BY 1)
        |SELECT d.doc_id, COALESCE(r.n_grams, 0) AS n_grams, COALESCE(r.n_novel, 0) AS n_novel,
        |       CASE WHEN r.n_grams > 0 THEN CAST(r.n_novel AS DOUBLE) / r.n_grams END AS novelty
        |FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id""".stripMargin,
    "text_code_detect" ->
      s"""WITH p AS (SELECT doc_id,
         |        CASE WHEN doc_id % 9 = 0
         |             THEN text || chr(10) || 'function f(a) { return a[0]; }' || chr(10) || '  indented(a, b);' || chr(10) || chr(9) || 'call();'
         |             ELSE text END AS text
         |      FROM documents),
         |m AS (SELECT doc_id,
         |        CAST(len(regexp_extract_all(coalesce(text, ''), '${graft.operators.TextAnalysis.CodeSymbolPattern}')) AS BIGINT) AS n_symbols,
         |        CAST(len(regexp_extract_all(coalesce(text, ''), '(?m)^(  |\t)')) AS BIGINT) AS n_indented,
         |        CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars
         |      FROM p)
         |SELECT doc_id, n_symbols, n_indented, n_chars,
         |       CASE WHEN n_chars > 0 THEN CAST(n_symbols AS DOUBLE) / n_chars END AS symbol_ratio,
         |       CAST(CASE WHEN (n_chars > 0 AND CAST(n_symbols AS DOUBLE) / n_chars > 0.03)
         |                   OR n_indented >= 2
         |                 THEN 1 ELSE 0 END AS BIGINT) AS is_code
         |FROM m""".stripMargin,
    "text_mojibake" ->
      s"""WITH p AS (SELECT doc_id,
         |        CASE WHEN doc_id % 7 = 0 THEN regexp_replace(text, '^([a-z0-9]+) ', '\\1 cafÃ© ')
         |             WHEN doc_id % 13 = 0 THEN text || ' donâ€™t'
         |             WHEN doc_id % 17 = 0 THEN text || ' bad�byte'
         |             ELSE text END AS text
         |      FROM documents)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(coalesce(text, ''), '${graft.operators.TextAnalysis.MojibakePattern}')) AS BIGINT) AS n_mojibake,
         |       CAST(len(regexp_extract_all(coalesce(text, ''), '�')) AS BIGINT) AS n_replacement,
         |       CAST(CASE WHEN len(regexp_extract_all(coalesce(text, ''), '${graft.operators.TextAnalysis.MojibakePattern}')) = 0
         |                  AND len(regexp_extract_all(coalesce(text, ''), '�')) = 0
         |                 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM p""".stripMargin,
    // mirrors TextAnalysis.charDiversity: per-character counts over substr
    // positions, exact integer moments, the same two final divisions
    "text_char_diversity" ->
      """WITH ch AS (
        |  SELECT doc_id, substr(text, i, 1) AS ch
        |  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)
        |  WHERE length(text) > 0),
        |cc AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
        |st AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS nd,
        |              CAST(MAX(c) AS BIGINT) AS top, CAST(SUM(c * c) AS BIGINT) AS ss
        |       FROM cc GROUP BY 1)
        |SELECT doc_id, n AS n_chars, nd AS n_distinct_chars,
        |       CAST(top AS DOUBLE) / CAST(n AS DOUBLE) AS top_char_frac,
        |       CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS char_simpson
        |FROM st""".stripMargin,
    // mirrors TextAnalysis.pmiBigrams(minCount=5, topK=100): adjacent
    // lowercased pairs, integer counts, lift = (c12·N)/(c1·c2) in the same
    // expression order, ties broken on the gram string
    "text_pmi_bigrams" ->
      """WITH ws AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
        |p AS (SELECT ws[i] AS w1, ws[i+1] AS w2
        |      FROM ws, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM p GROUP BY 1, 2),
        |u AS (SELECT w, COUNT(*) AS c
        |      FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents) GROUP BY 1),
        |t AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_pairs FROM bc),
        |s AS (SELECT b.w1 || ' ' || b.w2 AS gram, CAST(b.c12 AS BIGINT) AS c12,
        |             CAST(u1.c AS BIGINT) AS c1, CAST(u2.c AS BIGINT) AS c2, t.n_pairs,
        |             (CAST(b.c12 AS DOUBLE) * CAST(t.n_pairs AS DOUBLE)) /
        |               (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        |      FROM bc b JOIN u u1 ON b.w1 = u1.w JOIN u u2 ON b.w2 = u2.w CROSS JOIN t
        |      WHERE b.c12 >= 5)
        |SELECT * FROM s ORDER BY lift DESC, gram LIMIT 100""".stripMargin,
    "curate_domain_prior" -> domainPriorOracleSql(),
    "search_eval" -> searchEvalOracleSql(),
    "search_prf" -> searchPrfOracleSql(),
    "curate_length_report" ->
      """WITH t AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words FROM documents),
        |s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS total_words
        |      FROM t GROUP BY 1),
        |r AS (SELECT source, n_words, ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_words) AS rn FROM t),
        |p AS (SELECT r.source,
        |        MAX(CASE WHEN rn = (50 * n_docs + 99) // 100 THEN n_words END) AS p50_words,
        |        MAX(CASE WHEN rn = (90 * n_docs + 99) // 100 THEN n_words END) AS p90_words,
        |        MAX(CASE WHEN rn = (99 * n_docs + 99) // 100 THEN n_words END) AS p99_words
        |      FROM r JOIN s USING (source) GROUP BY 1)
        |SELECT s.source, s.n_docs, s.total_words,
        |       CAST(s.total_words AS DOUBLE) / s.n_docs AS mean_words,
        |       p.p50_words, p.p90_words, p.p99_words
        |FROM s JOIN p USING (source)""".stripMargin,
    "search_mmr" -> searchMmrOracleSql(),
    "curate_shuffle_order" ->
      """WITH k AS (SELECT doc_id, md5('order:' || CAST(doc_id AS VARCHAR)) AS okey FROM documents),
        |s AS (SELECT doc_id, okey,
        |             CAST(((strpos('0123456789abcdef', substr(okey, 1, 1)) - 1) * 16 +
        |                   strpos('0123456789abcdef', substr(okey, 2, 1)) - 1) % 8 AS BIGINT) AS shard
        |      FROM k)
        |SELECT doc_id, shard,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY okey, doc_id) AS BIGINT) AS pos
        |FROM s""".stripMargin,
    "text_sentences" ->
      """WITH d AS (SELECT doc_id,
        |             regexp_replace(text, '([a-z0-9]+ [a-z0-9]+ [a-z0-9]+ [a-z0-9]+ [a-z0-9]+) ', '\1. ', 'g') AS text
        |           FROM documents),
        |l AS (SELECT doc_id, list_filter(string_split_regex(text, '[.!?]+( |$)'), s -> s != '') AS sents FROM d),
        |w AS (SELECT doc_id,
        |             list_transform(sents, s -> CAST(len(string_split(s, ' ')) AS BIGINT)) AS wc,
        |             len(sents) AS n_sentences
        |      FROM l)
        |SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
        |       CAST(COALESCE(list_sum(wc), 0) AS BIGINT) AS n_sentence_words,
        |       list_max(wc) AS max_sentence_words,
        |       CASE WHEN n_sentences > 0 THEN CAST(list_sum(wc) AS DOUBLE) / n_sentences END AS mean_sentence_words
        |FROM w""".stripMargin,
    "text_readability" ->
      """WITH d AS (SELECT doc_id,
        |             regexp_replace(text, '([a-z0-9]+ [a-z0-9]+ [a-z0-9]+ [a-z0-9]+ [a-z0-9]+) ', '\1. ', 'g') AS text
        |           FROM documents),
        |c AS (SELECT doc_id,
        |             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS nw,
        |             len(regexp_extract_all(text, '[.!?]+')) AS ns,
        |             len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS nsy
        |      FROM d)
        |SELECT doc_id, CAST(nw AS BIGINT) AS n_words, CAST(ns AS BIGINT) AS n_sentences,
        |       CAST(nsy AS BIGINT) AS n_syllables,
        |       CASE WHEN nw > 0 THEN
        |         206.835 - 1.015 * (CAST(nw AS DOUBLE) / CAST(GREATEST(ns, 1) AS DOUBLE))
        |                 - 84.6 * (CAST(nsy AS DOUBLE) / CAST(nw AS DOUBLE))
        |       END AS flesch
        |FROM c""".stripMargin,
    "text_keywords" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w WHERE term != '' GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |st AS (SELECT COUNT(*) AS n_docs FROM documents),
        |sc AS (SELECT tf.doc_id, tf.term, tf.tf,
        |              CAST(tf.tf * ln(CAST(st.n_docs AS DOUBLE) / df.df) AS DECIMAL(28,9)) AS score
        |       FROM tf JOIN df USING (term) CROSS JOIN st)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, CAST(score AS DOUBLE) AS score
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        |      FROM sc)
        |WHERE rank <= 3""".stripMargin,
    // mirrors Similarity.truncRecall(dims=8/16/32, k=10, probeMod=20):
    // sliced-prefix cosines, window rank (rank-invariant vs the k-bounded
    // aggregate), left-join match counts, one closing division
    "embed_trunc_recall" -> {
      def sliceCos(d: Int) = {
        def v(side: String) = s"CAST($side.embedding[1:$d] AS DOUBLE[])"
        s"""list_dot_product(${v("q")}, ${v("d")})
           | / (sqrt(list_dot_product(${v("q")}, ${v("q")}))
           |  * sqrt(list_dot_product(${v("d")}, ${v("d")})))""".stripMargin
      }
      def dimBlock(d: Int) =
        s"""t$d AS (
           |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
           |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |           ORDER BY ${sliceCos(d)} DESC, d.vec_id) AS rk
           |  FROM embeddings q JOIN embeddings d
           |    ON q.vec_id % 20 = 0 AND d.vec_id != q.vec_id),
           |m$d AS (
           |  SELECT t.query_id,
           |         SUM(CASE WHEN fk.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS n_match
           |  FROM (SELECT query_id, neighbor_id FROM t$d WHERE rk <= 10) t
           |  LEFT JOIN fk ON t.query_id = fk.query_id AND t.neighbor_id = fk.neighbor_id
           |  GROUP BY 1),
           |a$d AS (SELECT CAST($d AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n_queries,
           |               CAST(SUM(n_match) AS BIGINT) AS n_match_total FROM m$d)""".stripMargin
      s"""WITH f AS (
         |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |           ORDER BY $CosineSql DESC, d.vec_id) AS rk
         |  FROM embeddings q JOIN embeddings d
         |    ON q.vec_id % 20 = 0 AND d.vec_id != q.vec_id),
         |fk AS (SELECT query_id, neighbor_id FROM f WHERE rk <= 10),
         |${Seq(8, 16, 32).map(dimBlock).mkString(",\n")}
         |SELECT dim, n_queries, n_match_total,
         |       CAST(n_match_total AS DOUBLE) / CAST(n_queries * 10 AS DOUBLE) AS recall_at_k
         |FROM (SELECT * FROM a8 UNION ALL SELECT * FROM a16 UNION ALL SELECT * FROM a32)""".stripMargin
    },
    // mirrors Profiling.columnProfile: per-column aggregate stanzas (the
    // Spark side folds them into one scan; UNION ALL is the oracle's
    // scan-per-column equivalent of the same arithmetic)
    "profile_documents" -> profileSql("documents",
      Seq("doc_id" -> "num", "text" -> "str", "lang" -> "str",
        "source" -> "str", "n_chars" -> "num")),
    "profile_events" -> profileSql("events",
      Seq("event_id" -> "num", "user_id" -> "num", "event_type" -> "str",
        "value" -> "num", "props" -> "str")),
    // mirrors TextAnalysis.heapsLaw: md5 half-sample, exact token/distinct
    // counts, pinned ratio divisions with each ln quantized DECIMAL(18,9)
    "text_heaps" ->
      """WITH t AS (SELECT source,
        |        (strpos('0123456789abcdef',
        |           substr(md5('heaps:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 8) AS half,
        |        unnest(string_split(text, ' ')) AS term
        |      FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |             CAST(COUNT(DISTINCT term) AS BIGINT) AS vocab FROM t GROUP BY 1),
        |h AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens_half,
        |             CAST(COUNT(DISTINCT term) AS BIGINT) AS vocab_half
        |      FROM t WHERE half GROUP BY 1)
        |SELECT f.source, n_tokens, vocab, n_tokens_half, vocab_half,
        |       CASE WHEN n_tokens_half > 0 AND n_tokens != n_tokens_half THEN
        |         CAST(CAST(ln(CAST(vocab AS DOUBLE) / CAST(vocab_half AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE)
        |           / CAST(CAST(ln(CAST(n_tokens AS DOUBLE) / CAST(n_tokens_half AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE)
        |       END AS beta
        |FROM f JOIN h USING (source)""".stripMargin,
    // mirrors TextAnalysis.zipfSlope(topN=200): exact head ranks, each ln /
    // product term quantized at DECIMAL(28,10), pinned OLS close
    "text_zipf" ->
      """WITH wr AS (SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents),
        |wc AS (SELECT w, COUNT(*) AS n FROM wr WHERE w <> '' GROUP BY 1),
        |top AS (SELECT w, n FROM wc ORDER BY n DESC, w ASC LIMIT 200),
        |r AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w ASC) AS BIGINT) AS rk, n
        |      FROM top),
        |q AS (SELECT CAST(ln(CAST(rk AS DOUBLE)) AS DECIMAL(28,10)) AS qx,
        |             CAST(ln(CAST(n AS DOUBLE)) AS DECIMAL(28,10)) AS qy,
        |             CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(n AS DOUBLE)) AS DECIMAL(28,10)) AS qxy,
        |             CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE)) AS DECIMAL(28,10)) AS qxx
        |      FROM r),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(qx) AS sx, SUM(qy) AS sy,
        |             SUM(qxy) AS sxy, SUM(qxx) AS sxx FROM q),
        |f AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS dx,
        |             CAST(sy AS DOUBLE) AS dy, CAST(sxy AS DOUBLE) AS dxy,
        |             CAST(sxx AS DOUBLE) AS dxx FROM s),
        |g AS (SELECT n, (nd * dxy - dx * dy) / (nd * dxx - dx * dx) AS slope,
        |             dx, dy, nd FROM f)
        |SELECT n AS n_words, slope, (dy - slope * dx) / nd AS intercept FROM g""".stripMargin,
    // mirrors Search.proximityHits(window=6, k=10) over the 1+4-term probe
    // queries: query-filtered positional index, pairwise min-gap, all-pairs
    // qualification, (max_gap, doc_id) rank
    "search_proximity" -> ProximityNearOracleSql,
    "search_proximity_store" -> ProximityNearOracleSql,
    // mirrors Search.spellSuggest(maxDist=1, k=3) over the typo'd word-2
    // probes: same blocking, levenshtein, (dist, n DESC, w) rank
    "search_spell_suggest" -> spellOracleSql(""),
    // the maintained vocabulary is additive, so bootstrap + increment
    // deltas sum to exactly the full-corpus counts — same oracle
    "search_spell_store" -> spellOracleSql(""),
    // after vocabRetire(every 11th doc), the summed deltas equal the
    // surviving corpus's counts — the oracle recomputes over survivors
    "search_spell_ageoff" -> spellOracleSql("WHERE doc_id % 11 != 0"),
    // mirrors TextAnalysis.licenseScreen over the planted boilerplate:
    // same RE2 marker patterns verbatim, chained CASE plant
    "text_license_screen" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 13 = 0
        |                THEN text || ' copyright 2021 example corp. all rights reserved.'
        |              WHEN doc_id % 21 = 0
        |                THEN text || ' licensed under the apache license, version 2.0'
        |              ELSE text END AS text
        |  FROM documents),
        |c AS (SELECT doc_id, lower(text) AS lt FROM d)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(lt, 'copyright [0-9]{4}|\(c\) [0-9]{4}')) AS BIGINT) AS n_copyright,
        |       CAST(len(regexp_extract_all(lt, 'all rights reserved')) AS BIGINT) AS n_rights,
        |       CAST(len(regexp_extract_all(lt, 'licensed under|creative commons|gnu general public license')) AS BIGINT) AS n_license_terms,
        |       CAST(CASE WHEN len(regexp_extract_all(lt, 'copyright [0-9]{4}|\(c\) [0-9]{4}'))
        |                      + len(regexp_extract_all(lt, 'all rights reserved'))
        |                      + len(regexp_extract_all(lt, 'licensed under|creative commons|gnu general public license')) > 0
        |                 THEN 1 ELSE 0 END AS BIGINT) AS license_flag
        |FROM c""".stripMargin,
    // mirrors Search.booleanHits over the 4-word MUST / 6th-word NOT probes:
    // distinct doc-term set, all-terms count equality, NOT anti-join
    "search_boolean" -> BooleanMustNotOracleSql,
    "search_boolean_store" -> BooleanMustNotOracleSql,
    // mirrors Search.bestSnippets(window=12) over the probe queries:
    // query-filtered positional index, all-terms qualification, matched-
    // position anchors, (coverage DESC, start ASC) argmax per (query, doc)
    "search_snippets" -> SnippetsBestWindowOracleSql,
    "search_snippets_store" -> SnippetsBestWindowOracleSql,
    // mirrors Search.snippetText(window=12): the search_snippets chain plus
    // a join back to the raw text and a 12-token inclusive slice
    "search_highlight" -> HighlightTextOracleSql,
    "search_highlight_store" -> HighlightTextOracleSql
  )
}
