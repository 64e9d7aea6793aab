package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators — the selection stage of a training-data
 * pipeline, composed from the text-analysis operators: deterministic
 * sampling, per-language quality ranking, and greedy token budgeting (how a
 * training mix is actually cut).
 *
 * Scale notes: the hash sample is a pure filter (no shuffle, prunes at the
 * scan). Ranking and budgeting would naively funnel the whole corpus through
 * a handful of language-keyed window tasks, so:
 *  - top-k relies on the rank-limit pushdown (WindowGroupLimitExec Partial):
 *    every MAP partition is pruned to its own top-k per key before the
 *    exchange, so the key-only window ranks ≤ k×n_partitions survivors —
 *    the bound a manual md5-shard pre-window used to enforce, minus one
 *    Exchange+Sort+Window (plan-pinned in PlanAuditSpec);
 *  - the token budget buckets each language by quality range, computes tiny
 *    per-bucket word partials, drops every bucket whose preceding buckets
 *    already exhaust the budget, and runs the sequential running sum only
 *    within surviving (language, bucket) partitions.
 * Every corpus-sized window input is therefore map-side-bounded; the only
 * key-only windows operate on bounded inputs (rank-limit survivors / bucket
 * partials).
 */
object Curation {

  /** Shards for the packing/shuffle-order streams (not top-k, which uses
    * the rank-limit pushdown). */
  val TopKShards = 32

  /** Quality-range buckets per language for the budget cut. Quality is in
    * [0, 1] by construction (each factor is clamped), so `floor(q * buckets)`
    * gives contiguous, order-preserving ranges. */
  val BudgetBuckets = 32

  /** Deterministic hash sample predicate: keep a doc iff the first hex digit
    * of md5(doc_id) is below `sixteenths`/16 — reproducible in any engine,
    * stable across runs, uniform in expectation. A free-standing Column (it
    * binds to whatever frame it filters), so it pushes to the scan. */
  def hashSample(sixteenths: Int): Column = {
    require(sixteenths >= 1 && sixteenths <= 16, "sixteenths in 1..16")
    substring(md5(col("doc_id").cast("string")), 1, 1) < lit("0123456789abcdefg".charAt(sixteenths).toString)
  }

  /**
   * Weighted sampling without replacement (Efraimidis–Spirakis A-ES): keep
   * the `k` docs with the largest key u^(1/w) — equivalently, rank by
   * ln(u)/w descending — where u is an md5-derived uniform and w the doc's
   * weight. Inclusion probability is proportional to weight (the
   * length-weighted default approximates token-budget-aware sampling:
   * sampling docs ∝ size samples TOKENS uniformly), yet the draw is fully
   * deterministic and engine-reproducible: u comes from 32 md5 bits
   * ((m + 0.5)/2^32 — exact power-of-two arithmetic in both engines), the
   * key is quantized to DECIMAL(28,12) before ranking (the BM25 idiom for
   * transcendental parity), and ties break by doc_id.
   *
   * Scale shape: a pure row-wise key computation over the scan, then one
   * rank window whose partial rank-limit prunes each map partition to k
   * rows before the exchange — no global sort of the corpus.
   *
   * @param weightCol positive integer weight column (floored at 1)
   */
  def weightedSample(docs: DataFrame, k: Int, weightCol: String = "n_chars",
                     salt: String = "ws"): DataFrame = {
    require(k >= 1, "k >= 1")
    val m = conv(substring(md5(concat(lit(salt + ":"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    val u = (m.cast("double") + lit(0.5)) / lit(4294967296.0)
    val w = greatest(col(weightCol), lit(1L))
    val key = (log(u) / w.cast("double"))
      .cast(org.apache.spark.sql.types.DecimalType(28, 12))
    // single rank window: the rank-limit pushdown (WindowGroupLimitExec
    // Partial) prunes each MAP partition to its own top-k before the
    // single-partition exchange, so the global window only ever sees
    // k × n_partitions rows — the bound the old md5-shard level enforced
    // by hand, with one fewer Exchange+Sort+Window (plan-pinned in
    // PlanAuditSpec; identical output by top-k invariance)
    val global = Window.orderBy(col("skey").desc, col("doc_id"))
    docs
      .select(col("doc_id"), w.cast("long").as("weight"), key.as("skey"))
      .withColumn("rank", row_number().over(global).cast("long"))
      .where(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("weight"),
        col("skey").cast("double").as("skey"))
  }

  /** Stratified (per-language) deterministic sample: each language keeps
    * `rates(lang)`/16 of its docs (default `defaultSixteenths`/16), decided
    * by the same md5-prefix rule as [[hashSample]] — reproducible in any
    * engine, stable across runs, and a pure row predicate over one scan
    * (language and hash are both row-wise; no shuffle, no per-language
    * pass). This is how a training mix rebalances language proportions
    * without materializing per-language partitions. */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int],
                       defaultSixteenths: Int = 16): DataFrame = {
    require((rates.values ++ Seq(defaultSixteenths)).forall(r => r >= 0 && r <= 16),
      "rates in 0..16 sixteenths")
    // a typo'd key would silently leave that language at the default rate
    val unknown = rates.keySet.diff(TextAnalysis.Stopwords.keySet)
    require(unknown.isEmpty,
      s"unknown language keys $unknown — langGuessCol emits ${TextAnalysis.Stopwords.keySet}")
    val h = (l: String) => TextAnalysis.lexiconHitsFrom(col("_lexhits"), l)
    val lang = TextAnalysis.langGuessCol(h("de"), h("en"), h("es"), h("fr"))
    val sixteenths = rates.foldLeft(lit(defaultSixteenths)) { case (acc, (l, r)) =>
      when(col("lang_guess") === l, lit(r)).otherwise(acc)
    }
    // keep EVERY input column (a rebalance that drops the text would force a
    // corpus-sized re-join); lang_guess rides along for free. The hit array
    // materializes in a lower projection (see [[TextAnalysis.lexiconHitsArray]])
    // so the langGuess when-chain probes one shared array per row.
    docs.withColumn("_lexhits", TextAnalysis.lexiconHitsArray)
      .withColumn("lang_guess", lang)
      .where(substring(md5(col("doc_id").cast("string")), 1, 1) <
        lit("0123456789abcdefg").substr(sixteenths + 1, lit(1)))
      .drop("_lexhits")
  }

  /** Per-doc (n_words, quality, lang_guess) in ONE pass — every feature is a
    * row-wise expression over the same scan, so no self-join of the corpus
    * (the naive qualityScore-join-languageId plan shuffles the corpus twice
    * for values that are functions of the row). The 4-language hit array
    * materializes in a lower projection ([[TextAnalysis.lexiconHitsArray]]):
    * the langGuess when-chain hides its hit refs from codegen subexpression
    * elimination, so inline per-language columns would each redo the
    * lowercase+split. */
  private def scored(docs: DataFrame): DataFrame =
    docs.withColumn("_lexhits", TextAnalysis.lexiconHitsArray).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words"),
      TextAnalysis.qualityColFrom(
        TextAnalysis.lexiconHitsFrom(col("_lexhits"), "en")).as("quality"),
      TextAnalysis.langGuessCol(
        TextAnalysis.lexiconHitsFrom(col("_lexhits"), "de"),
        TextAnalysis.lexiconHitsFrom(col("_lexhits"), "en"),
        TextAnalysis.lexiconHitsFrom(col("_lexhits"), "es"),
        TextAnalysis.lexiconHitsFrom(col("_lexhits"), "fr")).as("lang_guess"))

  /** Top-k per key over a pre-scored frame `(doc_id, keyCol, quality)`:
    * one rank window whose rank-limit pushdown (WindowGroupLimitExec
    * Partial) prunes every map partition to its own top-k per key before
    * the exchange — a hot key's reduce partition receives ≤ k×n_partitions
    * rows, never the corpus. Shared by [[topKByLanguage]] (few hot keys)
    * and [[capPerGroup]] (many keys, some hot) — the bound covers both
    * skew shapes. */
  private def topKPerKey(scoredDocs: DataFrame, keyCol: String, k: Int): DataFrame = {
    val global = Window.partitionBy(keyCol).orderBy(col("quality").desc, col("doc_id"))
    scoredDocs
      .withColumn("rank", row_number().over(global).cast("long"))
      .where(col("rank") <= k)
      .select(col(keyCol), col("rank"), col("doc_id"), col("quality"))
  }

  /** Top-k docs per language by quality (ties broken by doc_id — fully
    * deterministic ranking); see [[topKPerKey]] for the skew bound. */
  def topKByLanguage(docs: DataFrame, k: Int): DataFrame =
    topKPerKey(scored(docs).select("doc_id", "lang_guess", "quality"), "lang_guess", k)

  /** Greedy token budget per language: walk docs best-quality-first and keep
    * them while the running token (word) total stays within `budget` — the
    * standard way a per-language quota of a training mix is filled.
    *
    * The running sum is a prefix property of the (quality desc, doc_id)
    * order, so it shards by ORDERED quality buckets rather than a hash:
    * per-(language, bucket) word partials (a tiny aggregate) locate the
    * boundary bucket, buckets wholly past the budget are dropped before any
    * per-doc work, and the sequential running sum runs only inside the
    * surviving (language, bucket) partitions — each ~1/[[BudgetBuckets]] of a
    * language. `cum_words` = bucket-prefix partial + in-bucket running sum,
    * bit-identical to the single-window form (integer sums reassociate). */
  def tokenBudget(docs: DataFrame, budget: Long): DataFrame = {
    // null quality (empty/degenerate text: 0/0 punctuation ratio) must follow
    // the single-window form's NULLS LAST ordering — a sentinel bucket BELOW
    // every real one. Without the explicit branch, Spark's null-skipping
    // least() would put null-quality docs in the TOP bucket instead.
    val sc = scored(docs).withColumn("qbucket",
      when(col("quality").isNull, lit(-1L))
        .otherwise(least(lit(BudgetBuckets - 1L), floor(col("quality") * BudgetBuckets))))
    // ≤ languages × BudgetBuckets rows: the language-only window is bounded
    val partials = sc.groupBy("lang_guess", "qbucket").agg(sum("n_words").as("bucket_words"))
    val bw = Window.partitionBy("lang_guess").orderBy(col("qbucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = partials
      .withColumn("prefix_words", coalesce(sum(col("bucket_words")).over(bw), lit(0L)))
      // a doc's cum_words is ≥ prefix_words + 1, so buckets whose prefix
      // already reaches the budget can never contribute a kept doc
      .where(col("prefix_words") < budget)
      .select("lang_guess", "qbucket", "prefix_words")
    val within = Window.partitionBy("lang_guess", "qbucket")
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // prefixes is tiny — AQE broadcasts it on its own, no hint needed
    sc.join(prefixes, Seq("lang_guess", "qbucket"))
      .withColumn("cum_words", col("prefix_words") + sum(col("n_words")).over(within))
      .where(col("cum_words") <= budget)
      .select("lang_guess", "doc_id", "quality", "n_words", "cum_words")
  }

  /** 256ths cut point as a 2-hex-digit md5-prefix bound; ">= everything"
    * degenerates to "g" (sorts above every hex digit), the same sentinel
    * trick as [[hashSample]]'s 17-char ruler. */
  private[operators] def hexCut(n256: Int): String =
    if (n256 >= 256) "g" else f"$n256%02x"

  /** Deterministic train/val/test assignment: the first two hex digits of
    * md5("split:" || doc_id) (256 uniform buckets) cut at `train256` and
    * `train256 + val256`. Hash-based, so membership is stable under corpus
    * growth — a doc never migrates between splits when other docs are added
    * or removed (a row_number-based split would reshuffle everything), which
    * is what keeps held-out data held out across pipeline re-runs. A pure
    * row-wise predicate: no shuffle, prunes nothing but adds one column.
    *
    * The hash is SALTED ("split:"), like [[temperatureSample]]'s, and for
    * the same reason: [[hashSample]]/[[stratifiedSample]] compare UNSALTED
    * md5(doc_id) prefix bits, and reusing those bits here correlates
    * sampling with split assignment — e.g. `hashSample(4)` keeps only
    * first-digit 0-3 docs, whose unsalted 2-digit prefix is always below
    * any realistic train cut, so val/test would come back EMPTY from the
    * library's own sampler composed with its own splitter.
    *
    * Comparisons are lexicographic on the 2-char hex prefix — identical to
    * numeric order on the first md5 byte, reproducible in any SQL engine. */
  def splitAssign(docs: DataFrame, train256: Int = 205, val256: Int = 26): DataFrame = {
    require(train256 >= 0 && val256 >= 0 && train256 + val256 <= 256,
      "train256/val256 nonnegative with sum <= 256")
    val h2 = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2)
    docs.withColumn("split",
      when(h2 < lit(hexCut(train256)), "train")
        .when(h2 < lit(hexCut(train256 + val256)), "val")
        .otherwise("test"))
  }

  /**
   * GROUP-aware train/val/test assignment — the leakage guard
   * [[splitAssign]] cannot give: near-duplicate documents cluster by
   * provenance (same site, same template, same crawl), so hashing
   * `doc_id` scatters a page and its near-copy across train and test,
   * inflating eval. Hashing the GROUP key puts every document of a
   * provenance unit in the same split by construction — no pairwise
   * dedup needed to keep held-out data held out.
   *
   * The group key is the first URL host in the text (the provenance unit of
   * web data); documents with no URL fall back to a `source`-scoped shard
   * (`source:doc_id%50`) so an unlinked doc still gets a stable group
   * without gluing all no-URL docs into one mega-group. The split is the
   * [[splitAssign]] 256-bucket hex cut over `md5("gsplit:" || group_key)` —
   * its own salt, for the same cross-operator-correlation reason as
   * "split:"/"temp:".
   *
   * A pure row-wise projection (regexp + md5 + compare): no shuffle, no
   * group table — group cardinality never matters, which is what lets the
   * same expression assign splits at 100 TB.
   */
  def groupSplit(docs: DataFrame, train256: Int = 205, val256: Int = 26): DataFrame = {
    require(train256 >= 0 && val256 >= 0 && train256 + val256 <= 256,
      "train256/val256 nonnegative with sum <= 256")
    val host = regexp_extract(lower(col("text")), TextAnalysis.UrlPattern, 1)
    val group = when(host.isNotNull && host =!= "", host)
      .otherwise(concat(col("source"), lit(":"), (col("doc_id") % 50).cast("string")))
    val h2 = substring(md5(concat(lit("gsplit:"), group)), 1, 2)
    docs.select(col("doc_id"), group.as("group_key"),
      when(h2 < lit(hexCut(train256)), "train")
        .when(h2 < lit(hexCut(train256 + val256)), "val")
        .otherwise("test").as("split"))
  }

  /** Temperature-style source rebalancing (the UnifiedQA / multilingual-mix
    * trick at T=2): group `groupCol`'s keep rate is `sqrt(n_min / n_group)`,
    * so over-represented groups are damped toward the smallest group instead
    * of being cut to it (the smallest group keeps everything). sqrt and
    * division are IEEE-exact, so the rates — and therefore the md5-threshold
    * cut — reproduce bit-for-bit in any engine, unlike a general `pow(n, 1/T)`
    * whose libm rounding differs across platforms.
    *
    * Membership hashes are SALTED (`md5("temp:" || doc_id)`):
    * [[hashSample]] / [[stratifiedSample]] compare unsalted-prefix bits
    * (and [[splitAssign]] its own "split:" salt), and reusing any of those
    * bits here would correlate the sample with sampling or split
    * assignment.
    *
    * Rows with a NULL `groupCol` are excluded from BOTH the group counts
    * and the output: a NULL pseudo-group would poison the global `n_min`
    * (one stray unlabeled row and every real group's keep rate collapses
    * toward zero), and the join below never matches NULL keys anyway —
    * exclusion is made explicit rather than left to join semantics.
    *
    * Scale: one tiny group-count aggregate (group-cardinality rows; the
    * global min runs on THAT frame, not the corpus), an AQE-broadcast join
    * back, and a row-wise threshold filter — the corpus itself never
    * shuffles. */
  def temperatureSample(docs: DataFrame, groupCol: String = "lang"): DataFrame = {
    val counts = docs.where(col(groupCol).isNotNull).groupBy(groupCol).agg(count(lit(1)).as("n"))
    val rates = counts
      .withColumn("rate", sqrt(min(col("n")).over(Window.partitionBy()).cast("double") / col("n")))
      .drop("n")
    val cut = when(col("rate") >= 1.0, lit("g"))
      .otherwise(format_string("%04x", floor(col("rate") * 65536).cast("int")))
    docs.join(rates, groupCol)
      .where(substring(md5(concat(lit("temp:"), col("doc_id").cast("string"))), 1, 4) < cut)
  }

  /**
   * HARD class-balanced sampling — keep rate `min_n / n` per group, so every
   * group lands at (in expectation) the size of the SMALLEST one: the
   * uniform-mixture endpoint of the rebalancing spectrum whose midpoint is
   * [[temperatureSample]]'s sqrt scaling (eval sets, per-language probes,
   * contrastive pair pools all want hard balance, not softened mass).
   * Decisions are the same salted-md5 hash cut as temperature — per-doc
   * deterministic, engine-reproducible, no RNG state — under a DIFFERENT
   * salt, so composing both samplers never correlates their keeps.
   *
   * Scale: one group-count aggregate, a |groups|-row broadcast join, one
   * row-wise hash test. @return kept docs as (doc_id, group, rate).
   */
  def balancedSample(docs: DataFrame, groupCol: String = "lang"): DataFrame = {
    val counts = docs.where(col(groupCol).isNotNull).groupBy(groupCol).agg(count(lit(1)).as("n"))
    val rates = counts
      .withColumn("rate",
        min(col("n")).over(Window.partitionBy()).cast("double") / col("n").cast("double"))
      .drop("n")
    val cut = when(col("rate") >= 1.0, lit("g"))
      .otherwise(format_string("%04x", floor(col("rate") * 65536).cast("int")))
    docs.join(rates, groupCol)
      .where(substring(md5(concat(lit("bal:"), col("doc_id").cast("string"))), 1, 4) < cut)
      .select(col("doc_id"), col(groupCol), col("rate"))
  }

  /** Per-source document cap (the RefinedWeb/C4 trick against template farms
    * and crawler loops): keep at most `cap` docs per `groupCol` value, best
    * quality first (ties broken by doc_id). Unlike [[topKByLanguage]]'s
    * 4-value language key, a source/domain key is high-cardinality at scale —
    * but single hot domains still funnel millions of docs through one window
    * partition, so the same [[topKPerKey]] map-side rank bound applies. */
  def capPerGroup(docs: DataFrame, groupCol: String, cap: Int): DataFrame = {
    require(cap >= 1, "cap must be positive")
    topKPerKey(
      docs.select(col("doc_id"), col(groupCol), TextAnalysis.qualityCol.as("quality")),
      groupCol, cap)
  }

  /**
   * TWO-DIMENSIONAL quota sample: at most `cap` docs per (lang, source)
   * CELL, drawn by salted md5 order — the mix-design screen one dimension
   * can't express: a per-language quota still lets one crawler-heavy
   * domain fill a language's entire allocation, and a per-source cap still
   * lets one language dominate a multilingual domain; the cell quota
   * bounds both at once. Selection is a deterministic UNIFORM draw (salted
   * md5, not quality — [[capPerGroup]] is the quality-ranked variant), so
   * the sample is unbiased within each cell and engine-replayable.
   *
   * Scale: the same map-side rank bound as [[topKPerKey]] — a hot cell
   * (one domain × one language can be millions of docs) never funnels into
   * a single window partition; each map partition forwards ≤ cap rows per
   * cell.
   *
   * @return (lang, source, cell_rank, doc_id) — kept rows only.
   */
  def quotaSample2d(docs: DataFrame, cap: Int): DataFrame = {
    require(cap >= 1, "cap must be positive")
    val h = md5(concat(lit("quota2d:"), col("doc_id").cast("string")))
    val global = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("h"), col("doc_id"))
    docs.select(col("doc_id"), col("lang"), col("source"), h.as("h"))
      .withColumn("cell_rank", row_number().over(global).cast("long"))
      .where(col("cell_rank") <= cap)
      .select(col("lang"), col("source"), col("cell_rank"), col("doc_id"))
  }

  /** Per-language quality distribution summary: count, min, max, and exact
    * NEAREST-RANK percentiles (rank `ceil(p * n)` in (quality, doc_id)
    * order) — the distribution check a mix design runs before cutting
    * thresholds. Null-quality (degenerate) docs are excluded; percentile
    * ranks use the literal `p * n` double product so any engine picks the
    * identical rank.
    *
    * Exact WITHOUT a language-only sort of the corpus (the [[tokenBudget]]
    * decomposition, applied to rank selection): quality buckets are
    * order-aligned with quality, so per-(language, bucket) counts — a tiny
    * aggregate — locate each percentile's boundary bucket and its in-bucket
    * offset (`target - prefix`); only boundary-bucket rows are ranked, in a
    * window partitioned by (language, bucket). Every corpus-sized window is
    * composite-keyed; the language-only windows run on the bucket-count
    * frame. */
  def qualitySummary(docs: DataFrame,
                     percentiles: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p > 0.0 && p <= 1.0),
      "percentiles in (0, 1]")
    // the pNN naming scheme only expresses whole percents — 0.995 would
    // otherwise silently land in a column named p100
    require(percentiles.forall(p => math.abs(p * 100 - math.round(p * 100)) < 1e-9),
      "percentiles must be whole percents (the pNN column naming scheme)")
    val pName = (p: Double) => s"p${math.round(p * 100)}"
    require(percentiles.map(pName).distinct.size == percentiles.size, "duplicate percentiles")
    // CACHED: the scored frame drops the text column, so its rows are ~100x
    // smaller than the corpus — caching it scores the corpus ONCE and lets
    // the two consumers (bucket counts, boundary ranking) read the compact
    // frame. Without it each consumer rescores the text, and the pushed-down
    // isNotNull / join-key constraint filters inline the quality expression a
    // second time per pass (measured 2x the scan cost). At 100 TB the cached
    // frame is ~1/100th of the input and spills to disk if memory-tight.
    // Same idempotence guard as Dedup's shared frames.
    val sc0 = scored(docs).where(col("quality").isNotNull)
      .withColumn("qbucket", least(lit(BudgetBuckets - 1L), floor(col("quality") * BudgetBuckets)))
    val sc =
      if (sc0.storageLevel == org.apache.spark.storage.StorageLevel.NONE) sc0.cache()
      else sc0
    // min/max ride the bucket aggregate so the per-language stats derive
    // from this tiny frame. CACHED (≤ languages × BudgetBuckets rows):
    // targets/bounds/picks/stats all reference it, and without the cache each
    // reference replays the corpus subtree — measured 8 corpus passes (~35 s
    // at 100k docs) vs 2 (~8 s) with it.
    val counts0 = sc.groupBy("lang_guess", "qbucket").agg(count(lit(1)).as("bn"),
      min("quality").as("bmin"), max("quality").as("bmax"))
    val counts =
      if (counts0.storageLevel == org.apache.spark.storage.StorageLevel.NONE) counts0.cache()
      else counts0
    // ≤ languages × BudgetBuckets rows from here to `bounds` — tiny frames
    val wPrefix = Window.partitionBy("lang_guess").orderBy("qbucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = counts
      .withColumn("prefix", coalesce(sum(col("bn")).over(wPrefix), lit(0L)))
      .withColumn("n", sum(col("bn")).over(Window.partitionBy("lang_guess")))
    val targets = pref.select(col("lang_guess"), col("n")).distinct()
      .select(col("lang_guess"), explode(array(percentiles.map(p =>
        struct(lit(pName(p)).as("pname"), ceil(lit(p) * col("n")).cast("long").as("target"))): _*)).as("t"))
      .select(col("lang_guess"), col("t.pname"), col("t.target"))
    val bounds = targets.join(pref, "lang_guess")
      .where(col("prefix") < col("target") && col("target") <= col("prefix") + col("bn"))
      .select(col("lang_guess"), col("qbucket"), col("pname"),
        (col("target") - col("prefix")).as("in_bucket_rank"))
    // only boundary-bucket rows get ranked; the window key is composite
    val wBucket = Window.partitionBy("lang_guess", "qbucket").orderBy(col("quality"), col("doc_id"))
    val picks = sc.join(broadcast(bounds.select("lang_guess", "qbucket").distinct()),
        Seq("lang_guess", "qbucket"))
      .withColumn("rk", row_number().over(wBucket).cast("long"))
      .join(broadcast(bounds), Seq("lang_guess", "qbucket"))
      .where(col("rk") === col("in_bucket_rank"))
      .select(col("lang_guess"), col("pname"), col("quality"))
    val stats = counts.groupBy("lang_guess").agg(
      sum("bn").as("n_docs"), min("bmin").as("min_q"), max("bmax").as("max_q"))
    val pCols = percentiles.map(p =>
      max(when(col("pname") === pName(p), col("quality"))).as(pName(p)))
    val pivoted = picks.groupBy("lang_guess").agg(pCols.head, pCols.tail: _*)
    stats.join(pivoted, "lang_guess")
  }

  /**
   * Epoch-mix schedule: given target mixture weights (basis points summing
   * to 10 000) and a total token budget, how many EPOCHS of each source the
   * training run must take — the repeat-factor plan a data mixture compiles
   * to (cf. the epoch counts published for LLaMA/Gopher-style mixes). Per
   * source: available tokens, the budget share (`budget × weight ÷ 10000`),
   * the epoch factor in basis points (`ceil(target / available)`, capped at
   * `maxEpochBp` — repeating a small source indefinitely degrades quality),
   * the tokens the capped plan actually delivers, and the deficit. ALL
   * integer arithmetic (floor/ceil divisions on LONGs) — no decimal drift,
   * same answers in any engine at any parallelism.
   *
   * Weighted sources are the report's spine (a weighted source absent from
   * the corpus reports available=0, full deficit); unweighted sources are
   * excluded by construction. One source-keyed aggregate over the corpus +
   * a broadcast join against the tiny weight table.
   */
  def epochMix(docs: DataFrame, weightsBp: Map[String, Long], budgetTokens: Long,
               maxEpochBp: Long = 40000L): DataFrame = {
    require(weightsBp.nonEmpty && weightsBp.values.sum == 10000L,
      "weights must be non-empty and sum to 10000 bp")
    require(budgetTokens > 0 && maxEpochBp > 0, "budget and epoch cap must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weightsBp.toSeq.sortBy(_._1).toDF("source", "weight_bp")
    val avail = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("available_tokens"))
    broadcast(w).join(avail, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("available_tokens"), lit(0L)).as("available_tokens"),
        col("weight_bp"))
      .withColumn("target_tokens", expr(s"$budgetTokens * weight_bp div 10000"))
      .withColumn("epochs_bp", expr(
        s"""CASE WHEN available_tokens = 0 THEN 0
           |     ELSE LEAST($maxEpochBp,
           |                (target_tokens * 10000 + available_tokens - 1) div available_tokens)
           |END""".stripMargin))
      .withColumn("planned_tokens",
        expr("LEAST(target_tokens, available_tokens * epochs_bp div 10000)"))
      .withColumn("deficit_tokens", expr("target_tokens - planned_tokens"))
  }

  /** Training-mix report: per (lang, source) cell, document and token counts
    * plus each cell's share of the corpus — the accounting a mix design is
    * checked against before training. One map-side-combined aggregate over
    * the corpus (cells = langs × sources, tiny); the share windows run on
    * THAT frame, never the corpus. Shares are exact-long divisions, so they
    * reproduce bit-for-bit in any engine. */
  def mixReport(docs: DataFrame): DataFrame = {
    val cells = docs.groupBy("lang", "source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_words"))
    val all = Window.partitionBy()
    cells
      .withColumn("docs_share", col("n_docs") / sum(col("n_docs")).over(all))
      .withColumn("words_share", col("n_words") / sum(col("n_words")).over(all))
  }

  /** Per-source duplication report — the audit a curation run does before
    * deciding where dedup effort goes: per source, document count, distinct
    * content-hash count, the duplicate surplus, and the exact dup rate.
    * One aggregate over the corpus (count-distinct on md5(text) expands to
    * the usual two-level plan, both keyed on source — map-side combinable,
    * no window, no join). Degenerate single-doc sources report rate 0. */
  def dupReport(docs: DataFrame): DataFrame =
    // md5 of a NULL is NULL and countDistinct skips NULLs, which would count
    // every NULL-text doc as a duplicate (an all-NULL source would report
    // n_distinct=0, dup_rate=1.0) — coalesce to '' so NULL contributes one
    // distinct value like any other text
    docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(coalesce(col("text"), lit("")))).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        (col("n_docs") - col("n_distinct")).as("n_dup_docs"),
        ((col("n_docs") - col("n_distinct")).cast("double") / col("n_docs")).as("dup_rate"))

  /** Sequence packing (concat-and-chunk): lay every document's tokens end to
    * end in a deterministic pseudo-random order and cut the stream into
    * fixed `ctxLen`-token training sequences. Emits, per doc, which pack its
    * first token lands in (`pack_id`) and at what offset (`pack_offset`) —
    * the writer-side map a packed-pretraining export needs.
    *
    * The global concatenation order is (shard, md5(doc_id), doc_id): md5
    * ordering IS the training-shuffle (deterministic, engine-reproducible,
    * uniform), doc_id breaks ties. A single global running sum would
    * serialize the corpus through one task, so the stream is sharded first
    * and each shard packs independently — one shuffle onto `nShards`
    * partitions, one in-partition sort, integer arithmetic after that.
    * Parallelism (and output file granularity) = `nShards`: size it to the
    * cluster (hundreds+) at real scale, not to the default. Shards are
    * assigned by doc_id mod — balanced for the dense synthetic ids; corpora
    * with clustered ids should shard on a hash instead (same contract).
    *
    * Docs longer than `ctxLen` simply span packs (the standard concat-and-
    * chunk regime: no padding, documents cross pack boundaries). */
  /**
   * DSIR-style importance weighting (Xie et al. 2023, "Data selection for
   * language models via importance resampling"): score each RAW doc by how
   * much more the TARGET distribution explains its word mass than the raw
   * distribution does, restricted to the target's top-`vocabSize` words (the
   * analog of DSIR's hashed feature space — a bounded feature set so the
   * model tables broadcast). Per doc, with exact LONG masses
   * `t_mass` = Σ c_target(w) and `r_mass` = Σ c_raw(w) over in-vocab words:
   *
   *   importance = (t_mass / (n × total_t)) / (r_mass / (n × total_r))
   *              = (t_mass × total_r) / (r_mass × total_t)
   *
   * — the ratio of the two models' average explained probability, one double
   * division of exact integer products (no order-dependent double folds, no
   * logs; same determinism scheme as [[TextAnalysis.lmScore]]). Docs whose
   * in-vocab raw mass is zero get NULL (no evidence under either model).
   * Resampling = rank or threshold on `importance` downstream.
   *
   * Scale: both count tables aggregate distinct-word-sized; the vocab joins
   * its raw counts at vocabSize rows BEFORE broadcasting, so the corpus word
   * stream only ever joins the broadcast feature table — never a shuffle on
   * the (head-word-skewed) word key. Two corpus passes (count, probe).
   */
  def importanceWeights(raw: DataFrame, target: DataFrame, vocabSize: Int = 256): DataFrame = {
    def explodeWords(df: DataFrame) =
      df.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tWords = explodeWords(target)
    val rWords = explodeWords(raw)
    val tc = Frames.cached(tWords.groupBy("word").agg(count(lit(1)).as("t_count")))
    val rCounts = Frames.cached(rWords.groupBy("word").agg(count(lit(1)).as("r_count")))
    val top = tc.orderBy(col("t_count").desc, col("word")).limit(vocabSize)
      .join(rCounts, Seq("word"), "left")
      .select(col("word"), col("t_count"), coalesce(col("r_count"), lit(0L)).as("r_count"))
    // total_r from the distinct-word count table, NOT a second corpus
    // explode — keeps the raw side at exactly two passes (count, probe)
    val totals = tc.agg(sum("t_count").as("total_t"))
      .crossJoin(rCounts.agg(sum("r_count").as("total_r")))
    rWords.join(broadcast(top), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("t_count"), lit(0L))).as("t_mass"),
        sum(coalesce(col("r_count"), lit(0L))).as("r_mass"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_words"), col("t_mass"), col("r_mass"),
        // doubles only in the final division of exact-integer products (the
        // products stay < 2^53 at gate scale; at 100 TB the double rounding
        // is the documented lmScore trade)
        ((col("t_mass").cast("double") * col("total_r").cast("double"))
          / (nullif(col("r_mass"), lit(0L)).cast("double") * col("total_t").cast("double")))
          .as("importance"))
  }

  /**
   * Per-source sequence-length report — the distribution audit a pipeline
   * runs before packing/truncation decisions: how long are this source's
   * docs in (whitespace) tokens? Emits per source: doc count, total tokens,
   * mean, and EXACT nearest-rank p50/p90/p99.
   *
   * Determinism: counts and sums are LONGs; each percentile is the value AT
   * integer rank `(p·n + 99) div 100` (ceil in integer arithmetic) of the
   * per-source sort; the mean is one IEEE division. Same scale design as
   * [[Summarization.summarize]]: a source of any size costs a spillable
   * external sort, never an in-memory aggregation buffer.
   */
  def lengthReport(docs: DataFrame): DataFrame = {
    val words = docs.select(col("source"),
      size(split(col("text"), " ")).cast("long").as("n_words"))
    val stats = words.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_words")).as("total_words"))
    val ranked = words.withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("n_words"))))
      .join(stats.select(col("source"), col("n_docs")), Seq("source"))
    def rank(p: Int): Column = expr(s"($p * n_docs + 99) div 100")
    val atTarget = Seq(50, 90, 99).map(p => col("rn") === rank(p)).reduce(_ || _)
    val pct = ranked.where(atTarget).groupBy(col("source")).agg(
      max(when(col("rn") === rank(50), col("n_words"))).as("p50_words"),
      max(when(col("rn") === rank(90), col("n_words"))).as("p90_words"),
      max(when(col("rn") === rank(99), col("n_words"))).as("p99_words"))
    stats.join(pct, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_words"),
        (col("total_words").cast("double") / col("n_docs")).as("mean_words"),
        col("p50_words"), col("p90_words"), col("p99_words"))
  }

  /**
   * Deterministic training-order assignment — the reproducible "global
   * shuffle" a training run needs: every doc gets a salted-md5 order key,
   * a shard (from the key's first two hex digits, so shard and order are
   * one hash), and its position within the shard. Re-running with the same
   * salt reproduces the exact order; changing the salt is a fresh epoch
   * permutation. Readers stream shard files in (shard, pos) order.
   *
   * Scale: the only corpus-sized work is one spillable sort per shard
   * partition (the [[splitAssign]]/[[packSequences]] window shape) — size
   * `nShards` so corpus/nShards fits a task's disk-backed sort comfortably.
   */
  def shuffleOrder(docs: DataFrame, nShards: Int = 8, salt: String = "order"): DataFrame = {
    require(nShards >= 1 && nShards <= 256, "nShards must be in [1, 256]")
    require(!salt.contains("'"), "salt must not contain quotes")
    val keyed = docs.select(col("doc_id"),
      md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))).as("okey"))
    // first two hex digits -> 0..255, engine-portable digit arithmetic
    // (DuckDB has no conv(); instr/strpos agree on 1-based positions)
    val shard = expr(
      s"""((instr('0123456789abcdef', substr(okey, 1, 1)) - 1) * 16 +
         | instr('0123456789abcdef', substr(okey, 2, 1)) - 1) % $nShards""".stripMargin)
    keyed.withColumn("shard", shard.cast("long"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("okey"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /**
   * SPLIT BALANCE report — the QA read after [[splitAssign]]: per split,
   * doc and token counts with their corpus shares, so "did my 80/10/10
   * actually come out 80/10/10" (hash splits are binomial, not exact — a
   * small corpus can land meaningfully off-design, and a token-heavy
   * outlier doc skews token shares even when doc shares hold). One
   * row-wise assignment pass + a 3-row rollup; exact LONG sums, pinned
   * share divisions.
   *
   * @return one row per split: (split, n_docs, n_tokens, doc_share,
   *         token_share)
   */
  /**
   * Cross-split near-duplicate LEAKAGE audit — the eval-integrity check a
   * pure hash split ([[splitAssign]]) cannot give and [[groupSplit]] exists
   * to prevent: a near-duplicate pair straddling train and val/test leaks
   * training content into evaluation (the classic inflated-benchmark
   * failure). Joins a candidate near-dup pair frame (e.g.
   * [[Dedup.minhashLsh]]'s `(a, b, est_jaccard)`) to the split assignment
   * of BOTH endpoints and aggregates per unordered split pair — the report
   * a pipeline reads before trusting its held-out numbers.
   *
   * Scale shape: two doc_id-keyed equi-joins of the pair frame (LSH-banded,
   * never corpus-quadratic) against the split frame, then a <= C(splits+1,2)
   * -group aggregate. Deterministic: counts are exact; est_jaccard values
   * are k/8 multiples, so max is exact in both engines.
   *
   * @param pairs  (a, b, est_jaccard) candidate near-dup pairs
   * @param splits (doc_id, split) assignment covering both endpoints
   * @return per (split_lo, split_hi): n_pairs, max_jaccard, is_leak
   *         (1 when the pair straddles two splits)
   */
  def splitLeakage(pairs: DataFrame, splits: DataFrame,
                   threshold: Double = 0.5): DataFrame =
    pairs.where(col("est_jaccard") >= threshold)
      .join(splits.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(splits.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      .groupBy(least(col("sa"), col("sb")).as("split_lo"),
        greatest(col("sa"), col("sb")).as("split_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("est_jaccard")).as("max_jaccard"))
      .withColumn("is_leak",
        when(col("split_lo") =!= col("split_hi"), 1L).otherwise(0L))

  def splitReport(docs: DataFrame, train256: Int = 205,
                  val256: Int = 26): DataFrame = {
    val sums = splitAssign(docs, train256, val256)
      .select(col("split"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val tot = sums.agg(sum("n_docs").as("t_docs"), sum("n_tokens").as("t_tokens"))
    sums.crossJoin(broadcast(tot))
      .select(col("split"), col("n_docs"), col("n_tokens"),
        (col("n_docs").cast("double") / col("t_docs").cast("double")).as("doc_share"),
        (col("n_tokens").cast("double") / col("t_tokens").cast("double")).as("token_share"))
  }

  /**
   * SOURCE-INTERLEAVED training order — the curriculum-mixing complement
   * to [[shuffleOrder]]: rank each source's docs by a salted hash (a
   * per-source deterministic permutation), then land rank r of source s
   * at global slot (r−1)·S + idx(s). Consecutive training rows cycle
   * through all S sources, so a data loader streaming this order never
   * feeds a long single-source run (the gradient-staleness failure a
   * plain global shuffle only avoids in expectation).
   *
   * Scale: the per-source dense rank is two-level (the [[shuffleOrder]] /
   * [[tokenBudget]] shape): row_number inside (source, 256-hash-shard)
   * partitions plus the exact shard-prefix offset from per-(source, shard)
   * counts — no per-source single-partition sort. With 256 shards keyed by
   * the okey's first two hex digits, (shard, okey) order IS okey order, so
   * the two-level rank equals the single-window rank the oracle computes.
   *
   * @return (doc_id, source, src_rank, interleave_pos) — positions are a
   *         permutation of 0..N−1 when sources are equal-sized, and
   *         collision-free slots on the r·S + idx grid in general.
   */
  def interleaveOrder(docs: DataFrame, salt: String = "interleave"): DataFrame = {
    require(!salt.contains("'"), "salt must not contain quotes")
    // cached: the shard-count aggregate, the rank join and the source index
    // all read the keyed frame — uncut, each re-scanned the corpus
    val keyed = Frames.cached(docs.select(col("doc_id"), col("source"),
      md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))).as("okey"))
      .withColumn("shard", expr(
        """((instr('0123456789abcdef', substr(okey, 1, 1)) - 1) * 16 +
          | instr('0123456789abcdef', substr(okey, 2, 1)) - 1)""".stripMargin).cast("long")))
    val counts = keyed.groupBy("source", "shard").agg(count(lit(1)).as("cnt"))
    val wPre = Window.partitionBy("source").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1) // <= 256 rows per source
    val offsets = counts
      .withColumn("off", coalesce(sum(col("cnt")).over(wPre), lit(0L)))
      .select("source", "shard", "off")
    val within = Window.partitionBy("source", "shard").orderBy(col("okey"), col("doc_id"))
    // same rows as docs.select("source").distinct(), read from the cache
    val srcIdx = keyed.select("source").distinct()
      .withColumn("src_idx",
        (row_number().over(Window.orderBy("source")) - 1).cast("long"))
    val nSrc = srcIdx.agg(count(lit(1)).as("n_sources"))
    keyed.join(offsets, Seq("source", "shard"))
      .withColumn("src_rank", (col("off") + row_number().over(within)).cast("long"))
      .join(broadcast(srcIdx), "source")
      .crossJoin(broadcast(nSrc))
      .select(col("doc_id"), col("source"), col("src_rank"),
        ((col("src_rank") - 1L) * col("n_sources") + col("src_idx"))
          .as("interleave_pos"))
  }

  def packSequences(docs: DataFrame, ctxLen: Long = 2048L, nShards: Int = 8): DataFrame = {
    require(ctxLen >= 1L && nShards >= 1, "ctxLen and nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"),
        (col("doc_id") % nShards).cast("int").as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"CAST(start div $ctxLen AS BIGINT)").as("pack_id"),
        expr(s"CAST(start % $ctxLen AS BIGINT)").as("pack_offset"))
  }

  /** Bit positions of [[keepReasons]]'s failure mask — one per screen. */
  val ReasonEncoding = 1L
  val ReasonGopher = 2L
  val ReasonCode = 4L
  val ReasonDuplicate = 8L
  val ReasonContaminated = 16L

  /**
   * The composed per-document KEEP DECISION TABLE — what a production
   * curation pipeline actually ships: every screen's verdict as a column,
   * one `keep` conjunction, and a bitmask of the FAILED screens so drop
   * reasons are auditable at corpus scale (the mask aggregates into the
   * drop-reason dashboard; docs dropped for exactly one reason are the
   * screen-threshold tuning set). Screens composed: encoding hygiene
   * ([[TextAnalysis.mojibakeStats]]), Gopher rules ([[TextAnalysis
   * .gopherFilter]]), code routing ([[TextAnalysis.codeDetect]] — code is
   * not DROPPED, it is routed out of the prose mix, but the mask records
   * it), fuzzy-exact representativeness ([[graft.operators.Dedup
   * .fuzzyExact]] — only the canonical copy keeps), and benchmark
   * decontamination ([[decontamFilter]]).
   *
   * Scale: each screen is its own row-wise scan or keyed aggregate; the
   * composition is doc-keyed joins only. No screen sees another's output
   * (independent verdicts, one decision point — the auditable shape).
   */
  def keepReasons(docs: DataFrame, probes: DataFrame): DataFrame = {
    val enc = TextAnalysis.mojibakeStats(docs)
      .select(col("doc_id"), col("keep").as("r_encoding"))
    val gop = TextAnalysis.gopherFilter(docs)
      .select(col("doc_id"), col("keep").as("r_gopher"))
    val code = TextAnalysis.codeDetect(docs)
      .select(col("doc_id"), (lit(1L) - col("is_code")).as("r_prose"))
    val reps = Dedup.fuzzyExact(docs)
      .select(col("norm_hash"), col("keep_doc_id"))
    val canon = docs
      .select(col("doc_id"), Dedup.fuzzyKey(col("text")).as("norm_hash"))
      .join(reps, "norm_hash")
      .select(col("doc_id"),
        when(col("doc_id") === col("keep_doc_id"), 1L).otherwise(0L).as("r_canonical"))
    val dec = decontamFilter(docs, probes)
      .select(col("doc_id"), col("keep").as("r_decontam"))
    docs.select(col("doc_id"))
      .join(enc, "doc_id").join(gop, "doc_id").join(code, "doc_id")
      .join(canon, "doc_id").join(dec, "doc_id")
      .select(col("doc_id"), col("r_encoding"), col("r_gopher"), col("r_prose"),
        col("r_canonical"), col("r_decontam"),
        (col("r_encoding") * col("r_gopher") * col("r_prose") *
          col("r_canonical") * col("r_decontam")).as("keep"),
        ((lit(1L) - col("r_encoding")) * ReasonEncoding +
          (lit(1L) - col("r_gopher")) * ReasonGopher +
          (lit(1L) - col("r_prose")) * ReasonCode +
          (lit(1L) - col("r_canonical")) * ReasonDuplicate +
          (lit(1L) - col("r_decontam")) * ReasonContaminated).as("fail_mask"))
  }

  /**
   * Cross-source NEAR-dup matrix — [[sourceOverlap]]'s exact-hash view
   * upgraded to candidate pairs from any near-dup scorer
   * ([[Dedup.containment]], [[Dedup.ngramJaccard]], [[Dedup.minhashLsh]]):
   * for every unordered source pair, how many near-dup doc pairs link them.
   * Exact-hash overlap catches mirrored dumps; this catches the sources that
   * REWRAP each other's content (syndication, scraped-with-boilerplate,
   * template rewrites) — the overlap that silently re-weights a mix even
   * after exact dedup. Diagonal rows (source_a = source_b) report
   * within-source near-duplication.
   *
   * Scale shape: `pairs` is near-dup-rate-sized (tiny next to the corpus);
   * the two doc→source joins shuffle on the doc key against the corpus-sized
   * mapping; the final aggregate is (sources × sources)-bounded. The
   * unordered pair is canonicalized by source NAME (doc pairs arrive a < b
   * by id, which says nothing about source order).
   */
  def nearDupSourceMatrix(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    pairs.select("a", "b")
      .join(src.as("pa"), col("a") === col("pa.doc_id"))
      .join(src.as("pb"), col("b") === col("pb.doc_id"))
      .select(least(col("pa.source"), col("pb.source")).as("source_a"),
        greatest(col("pa.source"), col("pb.source")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_near_dup_pairs"))
  }

  /**
   * Quality-score CALIBRATION report — does the heuristic quality score
   * actually separate good from bad? Decile buckets of
   * [[TextAnalysis.qualityScore]] crossed with the independent signals a
   * curation pass can check it against: document length and exact-dup rate
   * (a well-calibrated score should show dup rate falling as quality
   * rises — if it doesn't, the threshold a [[topKByLanguage]] /
   * [[tokenBudget]] cut uses is ranking noise). NULL-quality docs (empty
   * text) land in the `-1` sentinel bucket so nothing silently vanishes.
   *
   * Exactness: bucket = floor(quality·10) (clamped; identical double in
   * both engines since the quality formula is oracle-pinned), mean quality
   * via fixed-point integer sums (1e-6 grid — no sorted fold, so buckets
   * can hold billions of docs), dup flags and word counts exact integers;
   * the two closing divisions are the only floating point.
   *
   * Scale shape: one row-wise scoring scan, one hash-keyed dup aggregate +
   * key join, one ≤12-bucket rollup. Nothing corpus-sized after the join.
   */
  def qualityCalibration(docs: DataFrame): DataFrame = {
    val scored = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("n_words"), col("quality"))
    val hashed = docs.select(col("doc_id"),
      md5(coalesce(col("text"), lit(""))).as("h"))
    val dupCounts = hashed.groupBy("h").agg(count(lit(1)).as("c"))
    val flags = hashed.join(dupCounts, "h")
      .select(col("doc_id"), (col("c") > 1).cast("long").as("is_dup"))
    scored.join(flags, "doc_id")
      .select(
        when(col("quality").isNull, lit(-1L))
          .otherwise(least(floor(col("quality") * 10).cast("long"), lit(9L)))
          .as("q_bucket"),
        col("n_words"), col("is_dup"),
        floor(col("quality") * 1000000 + lit(0.5)).cast("long").as("qfp"))
      .groupBy("q_bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("is_dup")).as("n_dup_docs"),
        sum(col("qfp")).as("qfp_sum"))
      .select(col("q_bucket"), col("n_docs"), col("n_words"), col("n_dup_docs"),
        (col("qfp_sum").cast("double") / col("n_docs").cast("double") /
          lit(1000000.0)).as("mean_quality"),
        (col("n_dup_docs").cast("double") / col("n_docs").cast("double"))
          .as("dup_rate"))
  }

  /**
   * Cross-source duplication overlap — the dump-overlap report a crawl
   * pipeline publishes before mixing sources (successive CommonCrawl dumps
   * overlap 30-60%; double-counting them silently re-weights the mix):
   * for every unordered source pair, how many DISTINCT content hashes both
   * sources contain. Upgrade of [[dupReport]] (per-source dup rate) to the
   * pairwise view that drives dedup-order and mixing decisions.
   *
   * Scale shape: distinct (hash, source) — one corpus aggregate — then a
   * hash-keyed self-join whose fan-out per hash is bounded by the SOURCE
   * count (not the duplicate count: distinct collapses a 1M-copy dup to
   * ≤ n_sources rows), then a tiny (source × source) aggregate. NULL text
   * hashes as '' (the [[dupReport]] convention).
   */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    // cached: both self-join sides read the distinct hash frame
    val h = Frames.cached(docs
      .select(md5(coalesce(col("text"), lit(""))).as("h"), col("source"))
      .distinct())
    h.as("a").join(h.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_hashes"))
  }

  /**
   * Benchmark decontamination — the DROP side of [[TextAnalysis
   * .contamination]]'s detection: any training doc sharing `minShared`+
   * distinct word n-grams with ANY probe (eval/benchmark) doc is excluded
   * from the kept corpus, and every doc gets its audit row (how many probes
   * it hit, total and worst overlap). The step every serious pretraining
   * pipeline runs between dedup and packing (GPT-3 appendix C, The Pile,
   * FineWeb all document the n-gram variant).
   *
   * Scale shape: the detection join is n-gram-blocked (shared-gram join, no
   * doc×probe product); the rollup aggregates the bounded hit frame on
   * doc_id; the audit join back to the corpus is a left join on the key.
   * Probes excluded from matching themselves (detection's own rule).
   */
  def decontamFilter(docs: DataFrame, probes: DataFrame, n: Int = 8,
      minShared: Long = 3L): DataFrame = {
    val hits = TextAnalysis.contamination(docs, probes, n, minShared)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_probes_hit"),
        sum("shared").as("n_shared_grams"),
        max("shared").as("max_shared"))
    docs.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_probes_hit"), lit(0L)).as("n_probes_hit"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        coalesce(col("max_shared"), lit(0L)).as("max_shared"),
        when(col("n_probes_hit").isNull, 1L).otherwise(0L).as("keep"))
  }

  /**
   * Packing-efficiency report over [[packSequences]]'s layout — the
   * throughput audit a training run does before committing a context
   * length: per shard, how many packs the token stream fills, the fill
   * rate of the allocated pack space (the tail pack's padding is the only
   * waste in concat-and-chunk), and how many documents straddle a pack
   * boundary (the fraction whose attention span gets cut — the cost side
   * of NOT padding per-document). Both numbers move with `ctxLen`; this
   * report is how the trade gets chosen.
   *
   * Scale: rides [[packSequences]] (per-shard running sum), then ONE
   * shard-keyed aggregate — exact integers, two double divisions.
   *
   * @return (shard, n_docs, n_tokens, n_packs, fill_rate, n_split_docs,
   *         split_frac)
   */
  def packStats(docs: DataFrame, ctxLen: Long = 2048L, nShards: Int = 8): DataFrame =
    packSequences(docs, ctxLen, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        count(when(col("pack_offset") + col("n_tokens") > ctxLen, 1)).as("n_split_docs"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        expr(s"CAST((n_tokens + ${ctxLen - 1}) div $ctxLen AS BIGINT)").as("n_packs"),
        col("n_split_docs"))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_packs"),
        (col("n_tokens").cast("double") / (col("n_packs") * ctxLen).cast("double"))
          .as("fill_rate"),
        col("n_split_docs"),
        (col("n_split_docs").cast("double") / col("n_docs").cast("double")).as("split_frac"))

  /**
   * Dedup SAVINGS report — the cost-benefit view that decides how much
   * dedup effort a source deserves: per source, the corpus size in docs and
   * whitespace tokens, and what survives under (a) global exact dedup
   * (byte-identical text, min-doc_id representative) and (b) near-dup
   * keep-list dedup ([[graft.operators.Dedup.clusters]] over n-gram Jaccard
   * pairs, min-id representative) — measured INDEPENDENTLY, so the two
   * columns answer "what does each technique buy on this source" rather
   * than composing. Token counts use the corpus-standard whitespace split
   * (the `text_quality` n_words definition); a duplicate shared across
   * sources is kept in the min doc's source and counted saved in the
   * others — the global-dedup accounting, documented rather than hidden.
   *
   * Scale: one exact-hash groupBy (map-side combined), the jaccard/cluster
   * machinery (shingle-blocked, capped via `maxDocFreq`), and two
   * source-keyed aggregates; survivors join back on doc_id. No window, no
   * driver state.
   *
   * @return per source: (source, n_docs, n_tokens, n_docs_exact,
   *         n_tokens_exact, n_docs_near, n_tokens_near, exact_savings,
   *         near_savings) — savings are token fractions removed, one
   *         exact-integer division each.
   */
  def dedupSavings(docs: DataFrame, threshold: Double = 0.7,
                   maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tok"))
    // exact survivors: min doc_id per content hash (NULL text hashes as '',
    // the dupReport convention)
    val exactKeep = docs
      .groupBy(md5(coalesce(col("text"), lit(""))).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(1).as("keep_exact"))
    // near-dup survivors: the keep-list rule — drop non-representative
    // members of jaccard components
    val comps = graft.operators.Dedup.clusters(
      graft.operators.Dedup.ngramJaccard(docs, threshold, maxDocFreq).select("a", "b"))
    val nearDrop = comps.where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(1).as("dropped_near"))
    base
      .join(exactKeep, Seq("doc_id"), "left")
      .join(nearDrop, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        count(col("keep_exact")).as("n_docs_exact"),
        sum(when(col("keep_exact").isNotNull, col("n_tok")).otherwise(0L)).as("n_tokens_exact"),
        count(when(col("dropped_near").isNull, 1)).as("n_docs_near"),
        sum(when(col("dropped_near").isNull, col("n_tok")).otherwise(0L)).as("n_tokens_near"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_docs_exact"), col("n_tokens_exact"),
        col("n_docs_near"), col("n_tokens_near"),
        (lit(1.0) - col("n_tokens_exact").cast("double") / col("n_tokens").cast("double"))
          .as("exact_savings"),
        (lit(1.0) - col("n_tokens_near").cast("double") / col("n_tokens").cast("double"))
          .as("near_savings"))
  }

  /**
   * LM-familiarity bucket report (the CCNet head/middle/tail move, Wenzek
   * et al. 2020 §4.3, re-keyed to a scale-invariant cutoff): score every doc
   * with the corpus' own Kneser-Ney bigram LM
   * ([[TextAnalysis.lmScoreKN]]), bucket against the global mean score —
   * `head` > `headFactor`x mean, `tail` < `tailFactor`x mean, `middle`
   * between — and report per (source, bucket) doc/word mass and the
   * within-source share. CCNet cuts at fixed perplexity percentiles, which
   * (like TPC-H Q11's fixed fraction) drift with corpus size; the
   * mean-relative form keeps bucket meaning stable from sf0.001 to 100 TB.
   * Docs with < 2 words have no bigram score and report as `unscored`
   * (explicit, not silently dropped — the [[temperatureSample]] NULL
   * convention).
   *
   * Determinism: kn_mean is bit-exact cross-engine (the `text_lm_kn` gate);
   * the global mean is a ratio of an exact DECIMAL(18,12) sum over an exact
   * count — never an unsorted double sum — and the two cutoff compares
   * multiply in mirrored order. Scale: the scoring passes are
   * [[TextAnalysis.lmScoreKN]]'s; on top sit one 1-row broadcast scalar,
   * a doc-keyed left join, and a (source x 4)-sized group-by.
   *
   * @return (source, bucket, n_docs, n_words, doc_share) — doc_share the
   *         bucket's fraction of its source's docs
   */
  def lmBuckets(docs: DataFrame, headFactor: Double = 1.25,
                tailFactor: Double = 0.75): DataFrame =
    // cached: the mean scalar and the bucketing join both read the scored
    // frame — without the cut the full KN scoring pipeline (two corpus
    // explodes each) re-executed per consumer
    lmBucketsFrom(docs, Frames.cached(TextAnalysis.lmScoreKN(docs)),
      headFactor, tailFactor)

  /** [[lmBuckets]] over a pre-built [[TextAnalysis.lmScoreKN]] frame — the
    * shared-fetch entry point (the Linkage.entitiesFromPairs pattern): one
    * KN scoring pass serves both the per-doc score gate and this report.
    * Callers pass a persisted frame; doc-count-sized, safe at any corpus. */
  def lmBucketsFrom(docs: DataFrame, knScores: DataFrame,
                    headFactor: Double = 1.25,
                    tailFactor: Double = 0.75): DataFrame = {
    require(headFactor > tailFactor && tailFactor > 0,
      "need headFactor > tailFactor > 0")
    val scored = knScores.select("doc_id", "kn_mean")
    val m = scored.agg(
      sum(col("kn_mean").cast("decimal(18,12)")).cast("double").as("kn_total"),
      count(lit(1)).as("n_scored"))
    val bucket = when(col("kn_mean").isNull, "unscored")
      .when(col("kn_mean") > lit(headFactor) * col("kn_total") / col("n_scored"), "head")
      .when(col("kn_mean") < lit(tailFactor) * col("kn_total") / col("n_scored"), "tail")
      .otherwise("middle")
    // NULL-key contract: the pre-window form derived per-source totals with
    // an INNER join on source, dropping NULL-source docs from the report;
    // filter so the window form keeps that semantics
    val bucketed = docs
      .where(col("source").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(m))
      .select(col("source"), bucket.as("bucket"), col("n_words"))
    // per-source doc totals via a window over the (source x bucket) frame:
    // a separate groupBy("source") + join re-executed the corpus-sized
    // bucketing subtree; the bucket counts already sum to the source total
    bucketed.groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"))
      .withColumn("source_docs", sum(col("n_docs")).over(Window.partitionBy("source")))
      .select(col("source"), col("bucket"), col("n_docs"), col("n_words"),
        (col("n_docs").cast("double") / col("source_docs").cast("double"))
          .as("doc_share"))
  }

  /**
   * Per-source PII exposure report — the compliance rollup over
   * [[TextAnalysis.redactPii]]'s per-doc audit counts: total emails / IPv4s
   * / phone-like hits, how many docs carry ANY of them, and the rate. The
   * number a pipeline tracks per crawl source to decide which sources need
   * the redaction pass (and to prove, post-redaction, that it ran).
   *
   * Scale: the redaction counters are row-wise codegen regex passes; the
   * rollup is one hash groupBy on `source` (partial/final, map-side
   * combine). Exact LONG sums; the rate is one pinned double division.
   *
   * @return (source, n_docs, n_emails, n_ips, n_phones, n_docs_with_pii,
   *         pii_doc_rate)
   */
  def piiReport(docs: DataFrame, textCol: String = "text"): DataFrame =
    TextAnalysis.redactPii(docs, textCol)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_ips")).as("n_ips"),
        sum(col("n_phones")).as("n_phones"),
        sum(when(col("n_emails") + col("n_ips") + col("n_phones") > 0L, 1L)
          .otherwise(0L)).as("n_docs_with_pii"))
      .select(col("source"), col("n_docs"), col("n_emails"), col("n_ips"),
        col("n_phones"), col("n_docs_with_pii"),
        (col("n_docs_with_pii").cast("double") / col("n_docs").cast("double"))
          .as("pii_doc_rate"))

  /**
   * The COMPOSED end-to-end curation keep table — the four screens this
   * library ships, chained the way a production pipeline chains them, each
   * stage conditioned on the previous stage's survivors:
   *
   *   1. quality screen  (`quality >= minQuality`)
   *   2. exact dedup     (keep the min-doc_id copy per content hash,
   *                       computed AMONG quality survivors — a dropped
   *                       doc must not shadow a kept duplicate)
   *   3. per-source cap  ([[topKPerKey]] two-level sharded rank ≤
   *                       `capPerSource` among dedup survivors)
   *   4. token budget    (global greedy best-quality-first within
   *                       `budgetWords`, the [[tokenBudget]] ordered-bucket
   *                       scheme with one global key)
   *
   * One row per INPUT doc with a flag per stage plus the final verdict and
   * the budget walk's cumulative word count — the auditable "why did my doc
   * drop" table, and the gate that pins stage COMPOSITION (each screen is
   * separately oracle-gated; this pins that chaining them changes nothing).
   *
   * Scale: stages 1-2 are a row-wise score + one hash groupBy; stage 3 is
   * the sharded top-k (no corpus-sized single-key window); stage 4 reuses
   * the bucket-prefix running-sum shape (the one global window runs only
   * inside surviving 1/[[BudgetBuckets]] quality slices).
   *
   * @return (doc_id, source, n_words, quality, q_keep, dedup_keep,
   *         cap_keep, final_keep, cum_words — NULL unless finally kept)
   */
  def pipelineKeep(docs: DataFrame, minQuality: Double = 0.3,
                   capPerSource: Int = 15, budgetWords: Long = 8000L): DataFrame = {
    require(capPerSource >= 1 && budgetWords >= 1L, "positive cap and budget")
    // hash + word count + quality are all row-wise functions of (doc_id,
    // source, text): ONE projection over the scan, not a docs ⋈ scored(docs)
    // self-join (which cost a second scan plus a doc_id exchange pair —
    // guide §2.4). Expressions identical to [[scored]]'s quality column.
    // base / dd / cc are cached (narrow doc-count rows, text column already
    // dropped): each is read by BOTH its successor stage and the stage-flag
    // join below, and without the cuts the scan + quality scoring subtree
    // re-executed once per downstream reference (20 scans of the corpus in
    // the gate's physical plan; 1 after)
    val base = Frames.cached(docs
      .withColumn("_lexhits", graft.operators.TextAnalysis.lexiconHitsArray)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        graft.operators.TextAnalysis.qualityColFrom(
          graft.operators.TextAnalysis.lexiconHitsFrom(col("_lexhits"), "en"))
          .as("quality"))
      .withColumn("q_keep",
        when(col("quality") >= minQuality, 1L).otherwise(0L)))
    val keepIds = base.where(col("q_keep") === 1L)
      .groupBy("h").agg(min(col("doc_id")).as("keep_id"))
    val dd = Frames.cached(base.join(keepIds, Seq("h"), "left")
      .withColumn("dedup_keep",
        when(col("q_keep") === 1L && col("doc_id") === col("keep_id"), 1L)
          .otherwise(0L)))
    val capped = topKPerKey(
      dd.where(col("dedup_keep") === 1L).select("doc_id", "source", "quality"),
      "source", capPerSource)
    val cc = Frames.cached(dd
      .join(capped.select(col("doc_id"), lit(1L).as("ck")), Seq("doc_id"), "left")
      .withColumn("cap_keep", coalesce(col("ck"), lit(0L))))
    // global token budget over cap survivors: the tokenBudget bucket scheme
    // with a single key (quality slices bound the sequential window)
    val sb = cc.where(col("cap_keep") === 1L)
      .select(col("doc_id"), col("quality"), col("n_words"))
      .withColumn("qbucket",
        when(col("quality").isNull, lit(-1L))
          .otherwise(least(lit(BudgetBuckets - 1L), floor(col("quality") * BudgetBuckets))))
    val partials = sb.groupBy("qbucket").agg(sum("n_words").as("bucket_words"))
    val bw = Window.orderBy(col("qbucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = partials
      .withColumn("prefix_words", coalesce(sum(col("bucket_words")).over(bw), lit(0L)))
      .where(col("prefix_words") < budgetWords)
      .select("qbucket", "prefix_words")
    val within = Window.partitionBy("qbucket")
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = sb.join(prefixes, Seq("qbucket"))
      .withColumn("cum_words", col("prefix_words") + sum(col("n_words")).over(within))
      .where(col("cum_words") <= budgetWords)
      .select(col("doc_id"), col("cum_words"))
    cc.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_words"), col("quality"),
        col("q_keep"), col("dedup_keep"), col("cap_keep"),
        when(col("cum_words").isNotNull, 1L).otherwise(0L).as("final_keep"),
        col("cum_words"))
  }

  /** Neyman-optimal stratified sample allocation: budget n_h proportional
    * to N_h * S_h (stratum size times stratum std-dev of `valueCol`) — the
    * allocation that minimizes the estimator variance of a stratified
    * mean. The identity N_h * S_h = sqrt(N_h * sum(x^2) - sum(x)^2) lets
    * the weight come from ONE exact integer (the population-variance
    * numerator, accumulated in DECIMAL(38,0) so corpus-scale squares
    * cannot overflow): sqrt of an exact integer is correctly rounded in
    * IEEE-754, hence bit-identical across engines, and the allocation
    * itself is pure integer arithmetic over floor(sqrt * 10^6) basis
    * weights — floors of identical doubles, then integer div and a
    * largest-remainder top-up ranked by (remainder, stratum) over the
    * stratum frame (bounded by |strata|).
    *
    * Scale shape: one hash aggregate per stratum, then window ranks over
    * the |strata|-row frame. Nothing data-sized past the first fold. */
  def neymanAllocation(df: DataFrame, strataCol: String, valueCol: String,
                       budget: Long): DataFrame = {
    require(budget >= 1 && budget <= 1000000L, "budget in [1, 1e6]")
    val x = col(valueCol).cast("decimal(38,0)")
    val per = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("stratum_n"),
        sum(x).as("sum_x"),
        sum(x * x).as("sum_x2"))
      .withColumn("var_num",
        (col("stratum_n").cast("decimal(38,0)") * col("sum_x2") -
          col("sum_x") * col("sum_x")).cast("decimal(38,0)"))
      // N_h * S_h = sqrt(var_num); weight in exact micro-units
      .withColumn("w_u", floor(sqrt(col("var_num").cast("double")) * lit(1000000.0)).cast("long"))
    val wAll = Window.partitionBy()
    // the allocation arithmetic runs in DECIMAL(38,0): w_u can reach ~3e15
    // at extreme variance numerators, so w_u * budget and alloc_floor *
    // w_total would silently wrap a long in non-ANSI mode — decimals cannot
    // (they null-overflow loudly at 38 digits, far beyond w_u * 1e6 ~ 1e21).
    // `div` (IntegralDivide) on decimals still returns an exact LONG.
    val ranked = per
      .withColumn("w_total", sum(col("w_u")).over(wAll))
      // an all-zero-variance corpus has no Neyman signal: allocate nothing
      // rather than divide by zero (callers fall back to size-proportional)
      .withColumn("alloc_floor",
        when(col("w_total") === 0L, lit(0L))
          .otherwise(expr(s"(cast(w_u as decimal(38,0)) * $budget) div w_total")))
      .withColumn("rem",
        when(col("w_total") === 0L, lit(0L).cast("decimal(38,0)"))
          .otherwise(col("w_u").cast("decimal(38,0)") * lit(budget) -
            col("alloc_floor").cast("decimal(38,0)") * col("w_total")))
      .withColumn("alloc_sum", sum(col("alloc_floor")).over(wAll))
      .withColumn("rrank",
        row_number().over(Window.orderBy(col("rem").desc, col(strataCol))).cast("long"))
    ranked
      .withColumn("alloc",
        when(col("w_total") === 0L, lit(0L)).otherwise(
          col("alloc_floor") +
            when(col("rrank") <= lit(budget) - col("alloc_sum"), lit(1L)).otherwise(lit(0L))))
      .select(col(strataCol), col("stratum_n"), col("w_u"), col("alloc_floor"), col("alloc"))
  }

  /** Execute a [[neymanAllocation]]: per stratum, keep exactly alloc_h
    * rows, chosen by the salted-md5 deterministic order (the house
    * sampling contract — same rows at any parallelism, on any engine).
    * One broadcast join of the |strata|-row allocation frame and one
    * stratum-partitioned window rank; ties on the hash break by id.
    *
    * At 100 TB the rank window sorts each stratum once — if strata are
    * huge and alloc tiny, screen first with the hash-threshold form
    * ([[hashSample]]) at ~2x the target rate, then rank the survivors. */
  def neymanSample(df: DataFrame, strataCol: String, valueCol: String,
                   idCol: String, budget: Long, salt: String = "neyman"): DataFrame = {
    val alloc = neymanAllocation(df, strataCol, valueCol, budget)
      .select(col(strataCol), col("alloc"))
    val h = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
    df.join(broadcast(alloc), strataCol)
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= col("alloc"))
      .select(col(idCol), col(strataCol), col("rn"))
  }
}
