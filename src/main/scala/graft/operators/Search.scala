package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Lexical (keyword) retrieval over a `documents` corpus — the BM25
 * counterpart to the embedding-space searchers in [[Similarity]] /
 * [[SimilarityIvf]]. A training-data pipeline uses this for
 * quality-by-retrieval audits ("which corpus docs answer this probe?"),
 * targeted decontamination, and hard-negative mining where no embedding
 * column exists.
 *
 * Scoring is Okapi BM25 (Robertson et al.; the Lucene-style
 * `ln(1 + (N - df + 0.5)/(df + 0.5))` non-negative idf):
 *
 *   score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
 *
 * Scale design (the query batch is small — that is the operator's contract;
 * corpus-sized "queries" belong to the pairwise dedup family instead):
 *  - the corpus term-frequency table never shuffles on the term key: query
 *    terms BROADCAST to it, so the corpus-side cost is one scan + partial
 *    aggregates, and only matched rows (Σ_t df(t)) move at all;
 *  - df comes from the matched rows themselves (every doc containing a
 *    query term is matched, so the distinct-doc count per term IS the
 *    corpus df) — no second corpus pass;
 *  - corpus stats (N, Σdl) are a one-row aggregate, broadcast;
 *  - ranking is one per-query rank window whose rank-limit pushdown
 *    (WindowGroupLimitExec Partial) prunes every map partition to its own
 *    top-k BEFORE the exchange, so a common term cannot funnel the corpus
 *    into one partition.
 *
 * Cross-engine determinism: `ln` is the one non-IEEE-pinned step (DuckDB's
 * libm and Java's Math.log disagree by 1 ulp on ~0.2% of inputs — measured),
 * so each per-term contribution is cast to DECIMAL(28,9) — absorbing ulp
 * noise — and the per-doc score is an EXACT decimal sum (order-independent,
 * no sorted fold needed). Ranking orders by (decimal score DESC, doc_id),
 * fully tie-broken. All other arithmetic mirrors the oracle's expression
 * tree node for node.
 *
 * @param docs    (doc_id, text, ...)
 * @param queries (query_id, qtext) — a SMALL batch (broadcast)
 * @return (query_id, rank, doc_id, score, n_terms): top `k` docs per query
 *         by BM25; queries whose terms miss the corpus entirely are absent.
 */
object Search {

  /**
   * The MATCHED-POSTINGS frame `(doc_id, dl, term, tf)` for a term set —
   * the corpus scan + token explode + broadcast term filter + tf aggregate
   * that every lexical scorer opens with, factored out so ONE build
   * (memoized/persisted by the caller) serves BM25, Dirichlet-QL, tf-idf
   * and the PRF re-rank. The broadcast term-set filter sits BELOW the tf
   * aggregate, so the one corpus-sized shuffle carries only term-matched
   * occurrences, never the whole exploded corpus; tf per retained
   * (doc, term) is independent of WHICH term set selected it, so scorers
   * composing on this frame are bit-identical to their self-contained
   * forms. dl rides the group-by key (functionally dependent on doc_id) so
   * document length needs no second join.
   */
  def matchedPostings(docs: DataFrame, termsIn: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    docs
      .select(col("doc_id"), size(words).cast("long").as("dl"), explode(words).as("term"))
      .join(broadcast(termsIn.select("term").distinct()), "term")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
  }

  /** One-row corpus stats `(n_docs, sum_dl)` shared by the scorers (BM25's
    * avgdl pivot, Dirichlet's collection size, tf-idf's N). */
  def corpusStats(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(words).cast("long")).as("sum_dl"))
  }

  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = queries
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    bm25TopKFromTerms(docs, qTerms, k, k1, b)
  }

  /** [[bm25TopK]] from an explicit `(query_id, term)` frame — the entry
    * point query-expansion composes on (the expanded term set replaces the
    * qtext split; scoring, df, and ranking are identical). */
  def bm25TopKFromTerms(docs: DataFrame, qTermsIn: DataFrame, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFromPostings(matchedPostings(docs, qTermsIn), corpusStats(docs),
      qTermsIn, k, k1, b)

  /** [[bm25TopK]] over a pre-built [[matchedPostings]] frame + one-row
    * [[corpusStats]] — the shared-fetch entry point: the caller pays the
    * corpus scan once for the whole retrieval family. `postings` must cover
    * every term of `qTermsIn`. */
  def bm25TopKFromPostings(postings: DataFrame, stats: DataFrame,
               qTermsIn: DataFrame, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k >= 1")
    val qTerms = qTermsIn.select(col("query_id"), col("term")).distinct()
    val matched = postings.join(broadcast(qTerms), "term")
    // df(t) = distinct docs containing t — matched already holds every such
    // doc for every query term, so this aggregate is matched-sized, not
    // corpus-sized (and its result is tiny: one row per query term)
    val dfTab = matched.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    val contrib = matched
      .join(broadcast(dfTab), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        (idf * tfNorm).cast(DecimalType(28, 9)).as("c"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum("c").as("score"), count(lit(1)).as("n_terms"))
    // deterministic top-k: one global rank window. A hot query key cannot
    // funnel the corpus into its reduce partition because the rank-limit
    // pushdown (WindowGroupLimitExec, Partial mode) prunes every MAP
    // partition to its own top-k per query BEFORE the exchange — the same
    // bound the old two-level md5-shard scheme enforced by hand, with one
    // fewer Exchange+Sort+Window and no per-row md5 (plan-pinned in
    // PlanAuditSpec; identical output by top-k invariance).
    val global = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(global).cast("long"))
      .where(col("rank") <= k)
      // rank/sum on the exact decimal; EXPORT as double (both engines
      // nearest-round the same 9-dp decimal to the same double)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score").cast("double").as("score"), col("n_terms"))
  }

  /**
   * Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty 2001) —
   * the language-modeling scorer beside [[bm25TopK]]'s probabilistic one;
   * the two disagree exactly where LM smoothing matters (short docs, rare
   * terms), which is why IR suites ship both:
   *
   *   score(q, d) = Σ_{t ∈ q} ln( (tf(t,d) + μ·cf(t)/|C|) / (dl + μ) )
   *
   * Unlike BM25, a query term ABSENT from the doc still contributes its
   * smoothing mass ln(μ·P(t|C)/(dl+μ)). Rather than materialize candidate ×
   * query-term pairs with tf defaulted to 0, the score uses the paper's own
   * rank-equivalent DECOMPOSITION (Zhai & Lafferty 2001, the standard
   * production form):
   *
   *   score(q, d) = Σ_{t∈q} ln(μ·cf(t)/|C|)        — per-QUERY constant
   *               − |q|·ln(dl + μ)                  — per-CANDIDATE term
   *               + Σ_{t∈q∩d} ln(1 + tf·|C|/(μ·cf)) — per-MATCHED-row term
   *
   * so the plan never expands beyond the matched rows: no candidates×terms
   * frame, no 3-key left join back onto matched — ONE matched-bounded
   * aggregate, a broadcast of per-query constants, done. Candidates are
   * docs matching ≥ 1 query term; terms matching nothing corpus-wide
   * (cf = 0, ln(0)) are dropped from |q| and the constant, mirroring the
   * oracle.
   *
   * Scale: identical pushdown shape to [[bm25TopKFromTerms]] — query terms
   * broadcast BELOW the corpus tf aggregate, cf(t) comes from the matched
   * rows themselves (every occurrence of a query term is in the postings,
   * so Σtf IS the collection frequency), and every aggregate is
   * matched-bounded. Ranking is the same map-side-pruned rank window.
   *
   * Determinism: each of the three ln() factors (the only libm ops)
   * quantizes to DECIMAL(18,9) and scales to an exact LONG at 1e-9 —
   * integer arithmetic from there on (sums, the |q|·dlterm product, the
   * final combination), so scores are exact fixed-point and the rank order
   * is integer-total. |score| < 50 per term keeps the scaled sum far below
   * 2⁶³ at any |q|. The exported double is one pinned division.
   *
   * @return (query_id, rank, doc_id, score, n_hit): top `k` per query;
   *         `n_hit` = query terms actually present in the doc
   */
  def dirichletTopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
                    mu: Double = 1000.0): DataFrame = {
    val qTerms = queries
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    dirichletTopKFromPostings(matchedPostings(docs, qTerms), corpusStats(docs),
      qTerms, k, mu)
  }

  /** [[dirichletTopK]] over a pre-built [[matchedPostings]] frame + one-row
    * [[corpusStats]] (the shared-fetch entry point). `postings` must cover
    * every term of `qTermsIn`. */
  def dirichletTopKFromPostings(postings: DataFrame, statsIn: DataFrame,
                    qTermsIn: DataFrame, k: Int = 10,
                    mu: Double = 1000.0): DataFrame = {
    require(k >= 1, "k >= 1")
    val stats = statsIn.select(col("sum_dl").as("c_tokens"))
    val qTerms = qTermsIn.select(col("query_id"), col("term")).distinct()
    // cf(t): matched rows hold every corpus occurrence of each query term
    val cfTab = postings.groupBy("term").agg(sum(col("tf")).as("cf"))
    // ln → DECIMAL(18,9) → exact 1e-9 fixed-point LONG (the one libm step
    // per factor; everything after is integer)
    def ln9(c: Column): Column =
      (c.cast(DecimalType(18, 9)) * lit(1000000000L)).cast("long")
    // per-query constant: Σ_t ln(μ·cf/|C|) over cf-bearing terms, + |q|
    val qconst = qTerms
      .join(broadcast(cfTab), Seq("term")) // drops cf-less terms by inner join
      .crossJoin(broadcast(stats))
      .select(col("query_id"),
        ln9(log(lit(mu) * col("cf") / col("c_tokens"))).as("t9"))
      .groupBy("query_id")
      .agg(sum(col("t9")).as("qc9"), count(lit(1)).as("nq"))
    // per-(query, doc): Σ matched-term adjustments ln(1 + tf·|C|/(μ·cf))
    val matched = postings.join(broadcast(qTerms), "term")
    val adj = matched
      .join(broadcast(cfTab), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy("query_id", "doc_id", "dl")
      .agg(sum(ln9(log(lit(1.0) +
          col("tf").cast("double") * col("c_tokens") / (lit(mu) * col("cf")))))
        .as("adj9"),
        count(lit(1)).as("n_hit"))
    val scored = adj
      .join(broadcast(qconst), Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        (col("qc9") - col("nq") * ln9(log(col("dl") + lit(mu))) + col("adj9"))
          .as("score9"),
        col("n_hit"))
    // single rank window; the WindowGroupLimit partial pushdown bounds every
    // map partition to its top-k per query before the exchange (see
    // [[bm25TopKFromPostings]])
    val global = Window.partitionBy(col("query_id")).orderBy(col("score9").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(global).cast("long"))
      .where(col("rank") <= k)
      // exact fixed-point rank; EXPORT as one pinned double division
      .select(col("query_id"), col("rank"), col("doc_id"),
        (col("score9").cast("double") / lit(1.0e9)).as("score"), col("n_hit"))
  }

  /**
   * Exact PHRASE retrieval over a positional index — the capability BM25's
   * bag-of-words scoring cannot express ("big apple" ≠ {big, apple}):
   * every document position where the query's words appear CONSECUTIVELY
   * and in order counts as one hit. The anchor-alignment formulation keeps
   * it one join + one aggregate at ANY phrase length: a term match at doc
   * position `p` for query offset `q` votes for anchor `p − q`; an anchor
   * with all `n_terms` distinct offsets present is a full phrase
   * occurrence (repeated words in the phrase need every offset matched, so
   * the distinct-offset count is the correct test). No n−1 adjacency
   * self-joins, no regex over the text.
   *
   * Scale shape: the positional explode is scan-local; the ONE shuffle
   * joins corpus word positions against the BROADCAST query-term table
   * (queries are small by construction), so only query-matched positions
   * ever leave the scan — the same pushdown shape as [[bm25TopKFromTerms]].
   * Aggregates are (query, doc, anchor)-keyed, bounded by matched
   * positions.
   *
   * @return (query_id, doc_id, n_hits) for documents containing the full
   *         phrase at least once.
   */
  /**
   * The MATCHED-POSITIONS frame `(doc_id, pos, w)` for a term set — the
   * positional sibling of [[matchedPostings]]: one lowercased positional
   * explode + broadcast term filter that [[phraseHits]], [[proximityHits]],
   * [[booleanHits]] and [[bestSnippets]] all open with, factored out so one
   * build (memoized/persisted by the caller) serves the whole positional
   * family. Filtering by a SUPERSET of a consumer's terms is sound: every
   * consumer re-joins against its own query-term frame, and a position row
   * is independent of which term set selected it.
   */
  def matchedPositions(docs: DataFrame, termsIn: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
      .join(broadcast(termsIn.select(col("w")).distinct()), "w")
      .select(col("doc_id"), col("pos"), col("w"))

  def phraseHits(docs: DataFrame, queries: DataFrame): DataFrame =
    phraseHitsFromPositions(
      matchedPositions(docs,
        queries.select(explode(split(lower(col("qtext")), " ")).as("w"))),
      queries)

  /** [[phraseHits]] over a pre-built [[matchedPositions]] frame (which must
    * cover every query term).
    *
    * The all-positions-matched test per (query, doc, anchor) is a BITSET
    * fold — `bit_count(bit_or(1L << qpos)) == n_terms` — not a
    * countDistinct: one single-phase, map-side-combining hash aggregate
    * over the matched fan-out instead of countDistinct's two-phase
    * (partial-distinct + final) plan. Exact for phrases up to 64 tokens —
    * far past any real phrase query — and guarded loudly beyond (the
    * qpos > 63 overflow would silently alias distinct positions). */
  def phraseHitsFromPositions(positions: DataFrame, queries: DataFrame): DataFrame = {
    val qterms = queries
      .select(col("query_id"),
        posexplode(split(lower(col("qtext")), " ")).as(Seq("qpos", "w")))
      .withColumn("qpos", when(col("qpos") > 63,
        raise_error(lit("phraseHits: phrase longer than 64 tokens"))
          .cast("int")).otherwise(col("qpos")))
    val qn = qterms.groupBy("query_id")
      .agg(countDistinct(col("qpos")).as("n_terms"))
    positions.join(broadcast(qterms), "w")
      .groupBy(col("query_id"), col("doc_id"),
        (col("pos") - col("qpos")).as("anchor"))
      .agg(bit_count(bit_or(expr("shiftleft(1L, qpos)"))).cast("long").as("k"))
      .join(broadcast(qn), "query_id")
      .where(col("k") === col("n_terms"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /**
   * Reciprocal-rank fusion (Cormack et al. 2009) of two ranked candidate
   * lists — the standard hybrid-retrieval combiner (lexical BM25 + embedding
   * kNN): `score(d) = Σ_systems 1/(k0 + rank_s(d))`; a doc missing from one
   * system contributes nothing from it. Both inputs are `(query_id, doc_id,
   * rank)` frames. Deterministic: ranks are exact integers, the two IEEE
   * contributions combine in one fixed expression order, ties break to the
   * lower doc_id — bit-identical in any engine.
   *
   * Scale: both inputs are top-k-bounded per query, so the full-outer join
   * and the re-rank window see <= 2k rows per query — nothing corpus-sized.
   * The source ranks ride along as audit columns.
   */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 10, k0: Int = 60): DataFrame = {
    require(k >= 1 && k0 >= 0, "k >= 1, k0 >= 0")
    val fa = a.select(col("query_id"), col("doc_id"), col("rank").as("rank_a"))
    val fb = b.select(col("query_id"), col("doc_id"), col("rank").as("rank_b"))
    val score = coalesce(lit(1.0) / (lit(k0) + col("rank_a")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(k0) + col("rank_b")), lit(0.0))
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    fa.join(fb, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"),
        col("rank_a"), col("rank_b"))
  }

  /**
   * Hard-negative mining for retrieval training: the top `k` BM25 docs per
   * query EXCLUDING the known positives — the negatives a dual-encoder or
   * reranker trains against (highly-ranked lexical matches that are NOT
   * relevant). Fetches `k + fetchExtra` candidates first so excluding up to
   * `fetchExtra` positives per query still leaves a dense top-k, then
   * re-ranks the survivors (score desc, doc_id — fully tie-broken, on the
   * exported double in both engines).
   *
   * Scale: the candidate fetch is [[bm25TopK]] (corpus never shuffles on the
   * term key); the positives anti-join and the re-rank window run on the
   * k+fetchExtra-bounded candidate rows per query, never anything
   * corpus-sized.
   *
   * @param positives (query_id, doc_id) known-relevant pairs to exclude
   */
  def bm25HardNegatives(docs: DataFrame, queries: DataFrame, positives: DataFrame,
                        k: Int = 10, fetchExtra: Int = 5,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fetchExtra >= 0, "fetchExtra >= 0")
    bm25HardNegativesFrom(bm25TopK(docs, queries, k + fetchExtra, k1, b), positives, k)
  }

  /** Hard-negative selection from an ALREADY-FETCHED candidate frame (a
    * [[bm25TopK]] result with at least `k` + expected-positives rows per
    * query) — the pass-through shape that lets one candidate fetch feed the
    * whole retrieval family (plain top-k, hard negatives, hybrid fusion)
    * instead of each re-planning the corpus-side BM25 core. Candidate-
    * bounded: the anti-join and re-rank window see only the fetched rows. */
  def bm25HardNegativesFrom(hits: DataFrame, positives: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, "k >= 1")
    val neg = hits.join(positives.select("query_id", "doc_id"),
      Seq("query_id", "doc_id"), "left_anti")
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    neg
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"), col("n_terms"))
  }

  /**
   * Pseudo-relevance-feedback query expansion (Rocchio-style PRF): take the
   * top `r` BM25 docs per query as implicit relevance feedback, add their
   * `m` strongest NEW terms (by summed term frequency across the feedback
   * docs, ties to the lexicographically smaller term) to the query's term
   * set, and re-rank the corpus with the expanded query — the classic
   * recall-widening move when 4-word probes under-retrieve.
   *
   * Deterministic end to end: term selection is integer tf sums with a
   * total-order tie-break; the second pass is the standard exact-decimal
   * BM25 ([[bm25TopKFromTerms]]) with df recomputed on the expanded matched
   * set — both engines replay it term for term.
   *
   * Scale: the feedback side explodes ONLY the `r × |queries|` feedback
   * docs (semi-joined before the explode); the per-query term-pick window
   * runs over those docs' terms, bounded by r document lengths. The second
   * corpus pass has the same plan shape as the first (broadcast terms, no
   * term-key shuffle).
   *
   * @param feedbackHits (query_id, doc_id, rank) with rank ≤ r — a
   *                     [[bm25TopK]] prefix (the shared candidate fetch)
   */
  def prfExpandFrom(docs: DataFrame, queries: DataFrame, feedbackHits: DataFrame,
      r: Int = 3, m: Int = 2, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    prfExpandFromPostings(docs, None, queries, feedbackHits, r, m, k, k1, b)

  /** [[prfExpandFrom]] with an optional pre-built probe-term
    * `(postings, stats)` pair: when present, the expanded re-rank reuses it
    * and fetches postings ONLY for the newly picked terms (an incremental
    * term-filtered scan, ≤ m·|queries| terms) instead of re-scanning for the
    * whole expanded set — tf per (doc, term) is term-independent, so the
    * union IS the expanded-set postings frame, bit-identical.
    *
    * `newTermFetch` overrides HOW the incremental fetch happens: the
    * default re-scans the corpus term-filtered ([[matchedPostings]]); a
    * maintained postings index supplies a bucket-pruned store read instead
    * ([[graft.tools.Maintenance.prfMaintained]]) — at 100 TB the expansion
    * round then touches only the new terms' hash buckets, never the corpus.
    * The fetch must return EXACTLY the new terms' rows (term-filtered, like
    * matchedPostings) so the union with the probe-term frame stays
    * duplicate-free. */
  def prfExpandFromPostings(docs: DataFrame,
      shared: Option[(DataFrame, DataFrame)],
      queries: DataFrame, feedbackHits: DataFrame,
      r: Int = 3, m: Int = 2, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      newTermFetch: Option[DataFrame => DataFrame] = None): DataFrame = {
    require(r >= 1 && m >= 1, "r >= 1, m >= 1")
    val qTerms = queries
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    val fb = feedbackHits.where(col("rank") <= r).select("query_id", "doc_id")
    // explode only the feedback docs: semi-join BEFORE the token explode
    val fbDocs = docs.join(broadcast(fb.select("doc_id").distinct()), "doc_id")
    val fbTerms = fbDocs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(fb), "doc_id")
      .groupBy(col("query_id"), col("term")).agg(count(lit(1)).as("tfsum"))
    // cached (the dup-subtree idiom, bounded by m·|queries| rows): picked
    // feeds BOTH the expanded term set and the new-term fetch, and each
    // downstream reference — bm25TopKFromPostings reads its postings and
    // term frames twice (df table + contribution) — re-executed the whole
    // feedback explode (a corpus scan) without the cut
    val picked = Frames.cached(fbTerms
      .join(qTerms, Seq("query_id", "term"), "left_anti")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("tfsum").desc, col("term"))))
      .where(col("rn") <= m)
      .select(col("query_id"), col("term")))
    val expandedTerms = qTerms.unionByName(picked)
    shared match {
      case Some((postings, stats)) =>
        val newTerms = picked.select("term").distinct()
          .join(qTerms.select("term").distinct(), Seq("term"), "left_anti")
        // cached: the expansion round's incremental postings fetch (≤ the
        // new terms' postings rows) — the scorer's two postings references
        // re-ran the term-filtered corpus scan (or store read) per reference
        val extra = Frames.cached(newTermFetch.map(_(newTerms))
          .getOrElse(matchedPostings(docs, newTerms)))
        bm25TopKFromPostings(
          postings.unionByName(extra), stats, expandedTerms, k, k1, b)
      case None =>
        bm25TopKFromTerms(docs, expandedTerms, k, k1, b)
    }
  }

  /** Self-contained PRF: fetch the feedback prefix with a first BM25 pass. */
  def prfExpand(docs: DataFrame, queries: DataFrame, r: Int = 3, m: Int = 2,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    prfExpandFrom(docs, queries, bm25TopK(docs, queries, r, k1, b), r, m, k, k1, b)

  /** rank r → DCG weight 1/log2(r+1), FROZEN to 10 decimal places: both
    * engines then sum identical exact decimals, so the only IEEE steps in
    * the retrieval-eval report are the two final divisions (rr, ndcg). */
  private[graft] val DcgWeights: IndexedSeq[java.math.BigDecimal] =
    (1 to 64).map { r =>
      new java.math.BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
        .setScale(10, java.math.RoundingMode.HALF_UP)
    }

  /** Cumulative DCG weight sum — the ideal DCG when `i` relevant docs fill
    * the top-`i` ranks (exact decimal fold of the frozen weights). */
  private[graft] def dcgCum(i: Int): java.math.BigDecimal =
    DcgWeights.take(i).foldLeft(java.math.BigDecimal.ZERO)(_.add(_))

  /** rank r → relevance weight 1/(60+r), frozen to 10 decimal places (the
    * RRF-style monotone transform of the upstream rank) — both engines
    * read the same exact decimal literals. */
  private[graft] def relWeight(r: Int): java.math.BigDecimal =
    new java.math.BigDecimal(1.0 / (60.0 + r)).setScale(10, java.math.RoundingMode.HALF_UP)

  /**
   * Maximal-marginal-relevance (MMR, Carbonell & Goldstein 1998) selection —
   * the diversified re-rank a pipeline applies when the top-k would
   * otherwise be k near-copies (dedup-aware retrieval, eval-set building,
   * demonstration selection): greedily pick the candidate maximizing
   * `λ·rel − (1−λ)·max_sim_to_selected`, where rel is a frozen decimal
   * transform of the upstream rank ([[relWeight]]) and sim is the exact
   * sequential-fold cosine between candidate embeddings
   * ([[Similarity.dot]]'s contract).
   *
   * Determinism: rel weights are exact decimals cast once to double; the
   * per-step score is one fixed-order double expression `λ·rel − (1−λ)·
   * maxsim` (λ and 1−λ interpolated as identical double literals into the
   * oracle); argmax ties break on doc_id. Bit-identical across engines and
   * parallelism.
   *
   * Scale: everything after the candidate fetch is candidate-bounded — the
   * per-step join touches ≤ |candidates|·step rows per query and the argmax
   * window sees ≤ |candidates| rows per query. Lineage is cut per step
   * (lazy local checkpoint) so the k-step loop keeps constant-size plans.
   * Candidates missing an embedding are dropped by the inner join (both
   * engines alike).
   *
   * @param candidates (query_id, doc_id, rank) — rank dense from 1 per query
   * @param embeddings (vec_id, embedding ARRAY<FLOAT>) keyed by doc id
   * @return (query_id, mmr_rank, doc_id, bm25_rank) — `k` diversified picks
   */
  def mmrSelect(candidates: DataFrame, embeddings: DataFrame, k: Int = 5,
      lambdaBp: Int = 7000, maxRank: Int = 64): DataFrame = {
    require(k >= 1, "k >= 1")
    require(lambdaBp >= 0 && lambdaBp <= 10000, "lambdaBp must be basis points")
    val lam = lambdaBp / 10000.0
    val oneMinusLam = 1.0 - lam
    val relCase = (1 to maxRank)
      .map(r => s"WHEN rank = $r THEN CAST(${relWeight(r)} AS DECIMAL(12,10))")
      .mkString("CASE ", " ", " END")
    val cand = candidates.select(col("query_id"), col("doc_id"), col("rank"))
      .join(embeddings.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("embedding"), Similarity.norm("embedding").as("nrm"),
        expr(relCase).cast("double").as("rel"))
      // a zero-norm vector has no defined cosine: excluded by contract
      // (it would be an ANSI divide-by-zero in the similarity term)
      .where(col("nrm") > 0)
      .localCheckpoint(false)
    var all = cand.where(col("rank") === 1)
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("embedding"), col("nrm"), lit(1L).as("mmr_rank"))
    for (i <- 2 to k) {
      all = all.unionByName(mmrStep(cand, all, i, lam, oneMinusLam))
      // lineage cut every second step (each step references the selected
      // frame three times; the cut bounds the plan tree at ~9x one step
      // while halving checkpoint jobs — the per-step constant)
      if (i % 2 == 0 || i == k) all = all.localCheckpoint(false)
    }
    all.select(col("query_id"), col("mmr_rank"), col("doc_id"),
      col("rank").as("bm25_rank"))
  }

  /** One greedy MMR step: among candidates not yet selected, pick the
    * per-query argmax of `λ·rel − (1−λ)·max sim to selected` (ties to the
    * lower doc_id). Exposed for the plan audit — the step's windows must all
    * be query-partitioned. */
  private[operators] def mmrStep(cand: DataFrame, all: DataFrame, i: Int,
      lam: Double, oneMinusLam: Double): DataFrame = {
    val selectedSlim = all.select(col("query_id"),
      col("embedding").as("se"), col("nrm").as("sn"))
    val rem = cand.join(all.select("query_id", "doc_id"),
      Seq("query_id", "doc_id"), "left_anti")
    val maxsim = rem.join(selectedSlim, Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        (Similarity.dot("embedding", "se") / (col("nrm") * col("sn"))).as("sim"))
      .groupBy(col("query_id"), col("doc_id")).agg(max(col("sim")).as("maxsim"))
    rem.join(maxsim, Seq("query_id", "doc_id"))
      .withColumn("score", lit(lam) * col("rel") - lit(oneMinusLam) * col("maxsim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))))
      .where(col("rn") === 1)
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("embedding"), col("nrm"), lit(i.toLong).as("mmr_rank"))
  }

  /**
   * Retrieval-quality report — the eval loop a pipeline runs after every
   * index/scorer change: per query, how the ranked list `hits` covers the
   * ground-truth `qrels`. Emits n_rel, hits-in-top-k, the first relevant
   * rank, reciprocal rank, and nDCG@k.
   *
   * Determinism: DCG weights are decimal literals ([[DcgWeights]]) summed
   * exactly (order-independent), ideal DCG is a literal CASE over n_rel —
   * the only floating-point operations are the final `1/rank` and
   * `dcg/idcg` divisions, one IEEE op each. Queries with no relevant doc
   * retrieved report ndcg 0 and NULL rank/rr.
   *
   * Scale: `hits` is top-k-bounded per query; qrels joins on
   * (query_id, doc_id) — the one corpus-sized frame (qrels can be large)
   * only aggregates per query. No window over anything corpus-sized.
   */
  def evalReport(hits: DataFrame, qrels: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= DcgWeights.size, s"k must be in [1, ${DcgWeights.size}]")
    val wCase = (1 to k)
      .map(r => s"WHEN rank = $r THEN CAST(${DcgWeights(r - 1)} AS DECIMAL(12,10))")
      .mkString("CASE ", " ", " END")
    val idcgCase = (1 until k)
      .map(r => s"WHEN n_rel = $r THEN CAST(${dcgCum(r)} AS DECIMAL(14,10))")
      .mkString(s"CASE WHEN n_rel >= $k THEN CAST(${dcgCum(k)} AS DECIMAL(14,10)) ", " ", " END")
    // cached: the ideal-DCG counts and the hit join both read the judgment
    // frame, whose construction (typically a corpus prefix-match) would
    // otherwise execute twice
    val rel = Frames.cached(qrels.select(col("query_id"), col("doc_id")))
    val relCounts = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val relHits = hits.where(col("rank") <= k).join(rel, Seq("query_id", "doc_id"))
    val perQ = relHits.groupBy("query_id").agg(
      count(lit(1)).as("n_rel_topk"),
      min(col("rank")).as("first_rel_rank"),
      sum(expr(wCase)).as("dcg"))
    relCounts.join(perQ, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("n_rel_topk"), lit(0L)).as("n_rel_topk"),
        col("first_rel_rank"),
        (lit(1.0) / col("first_rel_rank")).as("rr"),
        (coalesce(col("dcg").cast("double"), lit(0.0)) / expr(idcgCase).cast("double"))
          .as("ndcg"))
  }

  /**
   * PROXIMITY retrieval — the slop generalization of [[phraseHits]]: a doc
   * matches when every pair of distinct query terms co-occurs within
   * `window` token positions (pairwise min-gap, the classic NEAR/n
   * operator), ranked by how tightly the terms cluster (max pairwise gap
   * ascending, doc id tie-break). Order-free where the phrase operator is
   * order-exact: "spark near shuffle" finds both "shuffle ... spark" and
   * "spark ... shuffle".
   *
   * Semantics pinned for determinism: per (query, doc, term-pair) the gap
   * is `min |p_i − p_j|` over all occurrence pairs; a doc qualifies iff
   * ALL C(n,2) distinct-term pairs are present with gap <= window.
   * Single-term queries have no pair to witness proximity and return
   * nothing (use BM25 or [[phraseHits]] for those).
   *
   * Scale shape: corpus positions join the BROADCAST query-term table
   * first, so only query-matched positions leave the scan (the
   * [[phraseHits]] pushdown); the pair self-join runs on THAT bounded
   * frame keyed by (query, doc), and the rank window sees only qualifying
   * docs. No corpus-sized self-join or window exists.
   *
   * @return (query_id, rank, doc_id, max_gap) — top `k` docs per query.
   */
  def proximityHits(docs: DataFrame, queries: DataFrame, window: Int = 6,
      k: Int = 10): DataFrame =
    proximityHitsFromPositions(
      matchedPositions(docs,
        queries.select(explode(split(lower(col("qtext")), " ")).as("w"))),
      queries, window, k)

  /** [[proximityHits]] over a pre-built [[matchedPositions]] frame (which
    * must cover every query term). */
  def proximityHitsFromPositions(positions: DataFrame, queries: DataFrame,
      window: Int = 6, k: Int = 10): DataFrame = {
    require(window >= 1, "window >= 1")
    require(k >= 1, "k >= 1")
    val qt = queries
      .select(col("query_id"),
        explode(array_distinct(split(lower(col("qtext")), " "))).as("w"))
    val qn = qt.groupBy("query_id")
      .agg(count(lit(1)).as("n_terms"))
      .select(col("query_id"), expr("n_terms * (n_terms - 1) div 2").as("n_pairs_req"))
    val m = positions.join(broadcast(qt), "w")
      .select(col("query_id"), col("doc_id"), col("pos"), col("w"))
    val gaps = m.as("x").join(m.as("y"),
        col("x.query_id") === col("y.query_id") &&
          col("x.doc_id") === col("y.doc_id") && col("x.w") < col("y.w"))
      .groupBy(col("x.query_id").as("query_id"), col("x.doc_id").as("doc_id"),
        col("x.w").as("wa"), col("y.w").as("wb"))
      .agg(min(abs(col("x.pos") - col("y.pos"))).as("gap"))
    val perDoc = gaps.where(col("gap") <= window)
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_pairs"), max(col("gap")).cast("long").as("max_gap"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("max_gap").asc, col("doc_id").asc)
    perDoc.join(broadcast(qn), "query_id")
      .where(col("n_pairs") === col("n_pairs_req"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("max_gap"))
  }

  /**
   * BOOLEAN retrieval — conjunctive MUST terms with a NOT exclusion, the
   * classic inverted-index set algebra BM25's soft scoring can't express
   * ("all of these words, none of those"). A doc qualifies iff it contains
   * EVERY distinct word of `qtext` and NO word of `nottext`. Exact integer
   * semantics; the result is a set, so no rank column exists.
   *
   * Scale shape (the [[phraseHits]] pushdown): the corpus word table joins
   * the BROADCAST query-term tables first, so only query-matched
   * (doc, term) rows survive the scan; the all-terms test is a count
   * equality on that bounded frame, and the NOT screen is a left-anti join
   * on (query, doc) keys — no corpus-sized shuffle, no window.
   *
   * @param queries (query_id, qtext, nottext) — a SMALL batch (broadcast);
   *                `nottext` may be empty/NULL (no exclusion).
   * @return (query_id, doc_id, n_terms) — qualifying docs with the distinct
   *         must-term count that qualified them.
   */
  def booleanHits(docs: DataFrame, queries: DataFrame): DataFrame =
    booleanHitsFromPositions(
      matchedPositions(docs,
        queries.select(explode(split(lower(col("qtext")), " ")).as("w"))
          .unionByName(queries.where(col("nottext").isNotNull)
            .select(explode(split(lower(col("nottext")), " ")).as("w")))),
      queries)

  /** [[booleanHits]] over a pre-built [[matchedPositions]] frame — which
    * must cover every MUST **and NOT** term; the distinct (doc, word) frame
    * the MUST/NOT joins run on is position-independent, so the shared
    * positional fetch serves here too. */
  def booleanHitsFromPositions(positions: DataFrame, queries: DataFrame): DataFrame = {
    val dw = positions.select(col("doc_id"), col("w")).distinct()
    val mt = queries.select(col("query_id"),
      explode(array_distinct(split(lower(col("qtext")), " "))).as("w"))
    val nt = queries
      .where(col("nottext").isNotNull && length(col("nottext")) > 0)
      .select(col("query_id"),
        explode(array_distinct(split(lower(col("nottext")), " "))).as("w"))
    val qn = mt.groupBy("query_id").agg(count(lit(1)).as("n_terms"))
    val matched = dw.join(broadcast(mt), "w")
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("n_hit"))
    val excluded = dw.join(broadcast(nt), "w")
      .select("query_id", "doc_id").distinct()
    matched.join(broadcast(qn), "query_id")
      .where(col("n_hit") === col("n_terms"))
      .join(excluded, Seq("query_id", "doc_id"), "left_anti")
      .select(col("query_id"), col("doc_id"), col("n_terms"))
  }

  /**
   * Best-snippet extraction — the highlighting primitive a retrieval UI (or
   * a context-window-bounded RAG assembler) runs over its hits: for each
   * doc containing ALL query terms, the `window`-token span covering the
   * most DISTINCT query terms, earliest such span on ties. Candidate spans
   * anchor at matched-term positions only (an optimal cover always starts
   * at one), so the search is exact without scanning every offset.
   *
   * Scale shape: corpus positions join the BROADCAST query terms first
   * (only matched positions leave the scan — the [[proximityHits]] frame);
   * the anchor×member self-join runs on that bounded per-(query, doc)
   * frame, and the per-doc argmax window partitions by (query, doc) whose
   * row count is the doc's matched-position count — never corpus-sized.
   *
   * @return (query_id, doc_id, snip_start, n_covered) — one row per
   *         qualifying (query, doc): the 0-based token offset of the best
   *         window and the distinct query terms it covers.
   */
  def bestSnippets(docs: DataFrame, queries: DataFrame, window: Int = 12): DataFrame =
    bestSnippetsFromPositions(
      matchedPositions(docs,
        queries.select(explode(split(lower(col("qtext")), " ")).as("w"))),
      queries, window)

  /** [[bestSnippets]] over a pre-built [[matchedPositions]] frame (which
    * must cover every query term). */
  def bestSnippetsFromPositions(positions: DataFrame, queries: DataFrame,
      window: Int = 12): DataFrame = {
    require(window >= 1, "window >= 1")
    val qt = queries.select(col("query_id"),
      explode(array_distinct(split(lower(col("qtext")), " "))).as("w"))
    val qn = qt.groupBy("query_id").agg(count(lit(1)).as("n_terms"))
    val m = positions.join(broadcast(qt), "w")
      .select(col("query_id"), col("doc_id"), col("pos"), col("w"))
    // all-terms qualification FIRST (the boolean MUST semantics), on the
    // distinct-words frame — m collapsed to <= n_terms rows per (query,
    // doc), far smaller than the position rows. Pruning before the pack
    // matters on common-term corpora: a query containing a stopword
    // matches positions in nearly every doc, and packing those
    // never-qualifying docs' positions into arrays (only to filter the
    // arrays afterwards) dominated the 5M-doc smoke tier
    val qualified = m.select("query_id", "doc_id", "w").distinct()
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("n_distinct"))
      .join(broadcast(qn), "query_id")
      .where(col("n_distinct") === col("n_terms"))
      .select("query_id", "doc_id")
    // O(m log m) per qualified (query, doc): pack the matched positions
    // into ONE sorted array and run the native two-pointer coverage sweep
    // ([[graft.functions.BestWindowCover]]) — semantically identical to the
    // anchor×member band self-join + countDistinct + argmax window it
    // replaces (every matched-position anchor evaluated, exact
    // distinct-term coverage, earliest best span on ties), without the
    // O(m²) pair rows that made the snippets build the bench's most
    // expensive stage. The array is bounded by the doc's matched-position
    // count — never corpus-sized — so collect_list is executor-safe.
    m.join(qualified, Seq("query_id", "doc_id"))
      .groupBy("query_id", "doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("pw"))
      .withColumn("bw", graft.functions.TextFunctions.bestWindowCover(col("pw"), window))
      .select(col("query_id"), col("doc_id"),
        col("bw.snip_start").as("snip_start"), col("bw.n_covered").as("n_covered"))
  }

  /**
   * SPELL SUGGESTION — "did you mean": for each query term, the corpus
   * vocabulary words within `maxDist` edits, ranked by corpus frequency
   * (the signal that makes "teh" → "the", not "ten"). The recovery path a
   * search facade runs when BM25 returns nothing.
   *
   * Candidate generation is BLOCKED, not all-pairs (the
   * [[graft.operators.Linkage]] contract): an edit-distance-1 neighbor
   * shares the first character OR the misspelling is in position 1 — this
   * operator blocks on (first char, ±maxDist length band), accepting the
   * classic first-char-typo miss for a candidate set bounded by one
   * letter-block of the vocabulary. The vocabulary itself is the
   * distinct-words frame (bounded far below the corpus); the per-query
   * rank window sees only one block's candidates.
   *
   * Determinism: exact integer distances and counts; rank order
   * (dist ASC, count DESC, word ASC) is total.
   *
   * @param queries (query_id, qterm) — a SMALL batch (broadcast).
   * @return (query_id, qterm, rank, suggestion, dist, n) — top `k`
   *         correction candidates per query term.
   */
  def spellSuggest(docs: DataFrame, queries: DataFrame, maxDist: Int = 1,
                   k: Int = 3): DataFrame =
    spellSuggestFromVocab(
      docs.select(explode(split(lower(col("text")), " ")).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("n")),
      queries, maxDist, k)

  /** [[spellSuggest]] over a pre-built `(w, n)` vocabulary frame — the
    * maintained-store entry point ([[graft.tools.Maintenance]] keeps an
    * additive word-count table; summed per word it equals the query-time
    * corpus explode, so the two routes are bit-identical). The vocabulary
    * must cover at least the queries' first-letter blocks. */
  def spellSuggestFromVocab(vocab: DataFrame, queries: DataFrame,
      maxDist: Int = 1, k: Int = 3): DataFrame = {
    require(maxDist >= 1 && k >= 1, "positive maxDist and k")
    val q = queries.select(col("query_id"), lower(col("qterm")).as("qterm"))
    val cand = vocab.join(broadcast(q),
        substring(col("w"), 1, 1) === substring(col("qterm"), 1, 1) &&
          abs(length(col("w")) - length(col("qterm"))) <= maxDist)
      .where(levenshtein(col("qterm"), col("w")) <= maxDist)
    val rankW = Window.partitionBy("query_id")
      .orderBy(levenshtein(col("qterm"), col("w")).asc, col("n").desc, col("w").asc)
    cand.withColumn("rank", row_number().over(rankW).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("qterm"), col("rank"), col("w").as("suggestion"),
        levenshtein(col("qterm"), col("w")).cast("long").as("dist"), col("n"))
  }

  /**
   * SPEARMAN rank agreement between two rankers over their COMMON
   * candidates per query — the diagnostic behind every hybrid-fusion
   * decision ([[rrfFuse]] helps most when the rankers DISAGREE; ρ ≈ 1
   * means the second system adds nothing): both sides are RE-RANKED within
   * the intersection (row_number over the common set, ordered by each
   * ranker's original position) so the closed form ρ = 1 − 6Σd² / (n(n²−1))
   * sees the complete 1..n permutations it requires — applying it to the
   * original top-k positions can leave [-1,1] (e.g. two common docs at
   * ranks (1,15)/(15,1) would give ρ = −391). Inputs are row_number ranks,
   * so ties cannot occur; doc_id breaks the (impossible) tie
   * deterministically anyway. Exact integer ranks and sums; one pinned
   * close; queries with fewer than 2 common candidates score NULL.
   *
   * Scale: one (query, doc)-keyed join of two k-bounded hit lists — frames
   * are queries×k rows a side, never corpus-sized.
   *
   * @param a,b (query_id, doc_id, rank) hit lists.
   * @return (query_id, n_common, sum_d2, spearman_rho)
   */
  def rankCorrelation(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.select(col("query_id"), col("doc_id"), col("rank").as("ra"))
      .join(b.select(col("query_id"), col("doc_id"), col("rank").as("rb")),
        Seq("query_id", "doc_id"))
    val wa = Window.partitionBy("query_id").orderBy(col("ra").asc, col("doc_id").asc)
    val wb = Window.partitionBy("query_id").orderBy(col("rb").asc, col("doc_id").asc)
    val rr = j.withColumn("ca", row_number().over(wa).cast("long"))
      .withColumn("cb", row_number().over(wb).cast("long"))
    val d2 = (col("ca") - col("cb")) * (col("ca") - col("cb"))
    rr.groupBy("query_id")
      .agg(count(lit(1)).as("n_common"), sum(d2).as("sum_d2"))
      .select(col("query_id"), col("n_common"), col("sum_d2"),
        when(col("n_common") >= 2L,
          lit(1.0) - lit(6.0) * col("sum_d2").cast("double") /
            (col("n_common") * (col("n_common") * col("n_common") - 1L))
              .cast("double"))
          .as("spearman_rho"))
  }

  /**
   * Snippet TEXT extraction — [[bestSnippets]] completed into the string a
   * UI actually renders (or a RAG assembler actually packs): the best
   * window's `window` tokens sliced from the ORIGINAL (case-preserving)
   * text. One extra join against the docs' (id, text) projection; the
   * offset arithmetic stays in [[bestSnippets]].
   *
   * @return (query_id, doc_id, snip_start, n_covered, snippet)
   */
  def snippetText(docs: DataFrame, queries: DataFrame,
                  window: Int = 12): DataFrame =
    snippetTextFrom(bestSnippets(docs, queries, window), docs, window)

  /** [[snippetText]] from an ALREADY-SCORED [[bestSnippets]] frame — the
    * shared-frame entry point (the BM25-trio memoization pattern): when the
    * offsets and the rendered strings are both served, the snippet chain
    * runs once and this join-and-slice is all the second pass pays. */
  def snippetTextFrom(best: DataFrame, docs: DataFrame,
                      window: Int = 12): DataFrame =
    best
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("query_id"), col("doc_id"), col("snip_start"), col("n_covered"),
        array_join(slice(split(col("text"), " "),
          (col("snip_start") + 1).cast("int"), lit(window)), " ").as("snippet"))

  /**
   * Classic tf-idf COSINE retrieval (SMART lnc.ltn: doc weight 1+ln(tf),
   * query weight ln(N/df), doc-length normalization by the doc's FULL
   * lnc norm) — the vector-space scorer beside [[bm25TopK]]'s probabilistic
   * one and [[dirichletTopK]]'s LM one; the three disagree on long docs
   * (tf-idf's cosine norm punishes length harder than BM25's b-mixed
   * pivot), which is why ranking suites carry all of them.
   *
   *   score(q, d) = Σ_{t ∈ q∩d} (1+ln tf)·ln(N/df)  /  ‖d‖_lnc
   *
   * Scale design follows [[bm25TopKFromTerms]]: broadcast query terms below
   * the corpus tf aggregate, df from the matched rows, map-side-pruned
   * rank window. The one EXTRA cost tf-idf carries is the full-vector doc norm
   * (over ALL the doc's terms, not just matched ones) — computed only for
   * MATCHED docs via a semi-join-first second scan, so the norm aggregate
   * is Σ_t df(t) docs, not corpus-sized.
   *
   * Determinism: ln carries the cross-engine 1-ulp risk, so per-term
   * contributions AND per-term norm squares quantize to DECIMAL(28,9)
   * before their exact decimal sums (the [[bm25TopK]] scheme); the final
   * score is one pinned double expression over the two decimal sums.
   *
   * @return (query_id, rank, doc_id, score, n_terms): top `k` per query.
   */
  def tfidfTopK(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val qTerms = queries
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    tfidfTopKFromPostings(docs, matchedPostings(docs, qTerms), corpusStats(docs),
      qTerms, k)
  }

  /** The lnc doc-norm SQUARE on the shared decimal grid: (1+ln tf)^2 as
    * DECIMAL(28,9), per (doc, term) — summed per doc it is the norm² both
    * the query-time scan and the maintained-store sidecar persist, so the
    * two routes are bit-identical by construction. */
  def lncNormSquareTerm(tf: Column): Column =
    ((lit(1.0d) + log(tf.cast("double"))) *
      (lit(1.0d) + log(tf.cast("double"))))
      .cast(DecimalType(28, 9))

  /** [[tfidfTopK]] over a pre-built [[matchedPostings]] frame + one-row
    * [[corpusStats]] (the shared-fetch entry point). `docs` is still needed
    * for the full-vector lnc norm scan (matched docs only); `postings` must
    * cover every term of `qTermsIn`. */
  def tfidfTopKFromPostings(docs: DataFrame, postings: DataFrame,
      statsIn: DataFrame, qTermsIn: DataFrame, k: Int = 10): DataFrame = {
    val words = split(col("text"), " ")
    val qTerms = qTermsIn.select(col("query_id"), col("term")).distinct()
    val matchedDocs = postings.select("doc_id", "term")
      .join(broadcast(qTerms.select("term").distinct()), "term")
      .select("doc_id").distinct()
    // full lnc norm, matched docs only: Σ over ALL the doc's terms of
    // (1+ln tf)^2, each square quantized to the shared decimal grid
    val norms = docs
      .join(matchedDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(words).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), lncNormSquareTerm(col("tf")).as("w2"))
      .groupBy("doc_id").agg(sum(col("w2")).as("norm2"))
    tfidfTopKWithNorms(postings, norms, statsIn, qTermsIn, k)
  }

  /** [[tfidfTopKFromPostings]] with the doc norms² supplied — the
    * maintained-index entry point ([[graft.tools.Maintenance]] persists a
    * per-doc `(doc_id, norm2)` sidecar computed on the same decimal grid
    * at index time, so no corpus scan remains in the read path). `normsIn`
    * must cover at least every matched doc; extra docs are dropped by the
    * inner join. */
  def tfidfTopKWithNorms(postings: DataFrame, normsIn: DataFrame,
      statsIn: DataFrame, qTermsIn: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, "k >= 1")
    val qTerms = qTermsIn.select(col("query_id"), col("term")).distinct()
    val nDocs = statsIn.select(col("n_docs"))
    val matched = postings.select("doc_id", "term", "tf")
      .join(broadcast(qTerms), "term")
    val dfTab = matched.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val norms = normsIn.select(col("doc_id"), col("norm2"))
    val idf = log(col("n_docs").cast("double") / col("df"))
    val contrib = matched
      .join(broadcast(dfTab), "term")
      .crossJoin(broadcast(nDocs))
      .select(col("query_id"), col("doc_id"),
        ((lit(1.0d) + log(col("tf").cast("double"))) * idf)
          .cast(DecimalType(28, 9)).as("c"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum("c").as("num"), count(lit(1)).as("n_terms"))
      .join(norms, "doc_id")
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        (col("num").cast("double") / sqrt(col("norm2").cast("double"))).as("score"))
    // single rank window; the WindowGroupLimit partial pushdown bounds every
    // map partition to its top-k per query before the exchange (see
    // [[bm25TopKFromPostings]])
    val global = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(global).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"), col("n_terms"))
  }
}
