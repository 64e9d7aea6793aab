package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy RECORD LINKAGE — entity resolution over name-like keys,
 * the classic data-integration step before joining corpora that share no
 * clean id (vendor feeds, scraped catalogs, user tables from merged
 * products): candidate pairs from cheap equality BLOCKS, an edit-distance
 * verify inside each block, then connected components to entity ids.
 *
 * This is the string-key sibling of the [[Dedup]] document family: same
 * block→verify→cluster architecture (and the same [[Dedup.clusters]]
 * min-label machinery for the final entity assignment), with
 * `levenshtein` as the verifier instead of shingle Jaccard — the right
 * tool at name length, where a one-typo difference is a 0.9+ Jaccard but
 * exactly a distance-1 edit.
 *
 * Determinism: levenshtein is exact integer dynamic programming with
 * identical semantics in Spark and DuckDB (unit-cost insert/delete/
 * substitute); blocks are substring equality; pair identity is ordered
 * `id_a < id_b`. No floating point anywhere.
 *
 * Scale: the self-join runs ONLY inside blocks (hash-shuffled on the block
 * key), so cost is Σ block² not corpus² — and `maxBlock` drops
 * pathological blocks (the empty-prefix / default-value hubs every real
 * id corpus has) with the same skew-cap contract as the dedup family's
 * banding caps. Blocking recall is the documented tradeoff: a pair whose
 * edit sits inside the blocking prefix is unseen (run a second pass with
 * a suffix or phonetic block to recover it).
 */
object Linkage {

  /**
   * Near-duplicate name pairs: block on (prefix of `blockLen` chars, name
   * length), verify `levenshtein <= maxDist` inside the block.
   *
   * Blocking on the LENGTH alongside the prefix keeps equal-cost inserts/
   * deletes from crossing blocks anyway (a length-changing edit of a
   * prefix-sharing pair is still caught when |len diff| <= maxDist — kept
   * here only when lengths match exactly with maxDist substitutions; the
   * documented recall contract).
   *
   * @return (id_a, id_b, name_a, name_b, dist) with id_a < id_b.
   */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockLen: Int = 8, maxDist: Int = 1, maxBlock: Long = 10000L): DataFrame = {
    require(blockLen >= 1, "blockLen >= 1")
    require(maxDist >= 1, "maxDist >= 1")
    require(maxBlock >= 2, "maxBlock >= 2: a 1-row block has no pairs")
    val keyed = df
      .where(col(idCol).isNotNull && col(nameCol).isNotNull)
      .select(col(idCol).as("id"), col(nameCol).as("name"),
        substring(col(nameCol), 1, blockLen).as("bk"),
        length(col(nameCol)).as("bl"))
    // skew cap: drop blocks larger than maxBlock entirely (the dedup-family
    // contract — an over-cap block is a degenerate hub, not a near-dup set).
    // Cached (the minhashLsh `mh` idiom): the self-join below reads this
    // subtree once per side, and without the cut the scan + block-count
    // aggregate + semi-join would execute twice.
    val sized = Frames.cached(keyed.join(
      keyed.groupBy("bk", "bl").agg(count(lit(1)).as("bn"))
        .where(col("bn") <= maxBlock)
        .select(col("bk"), col("bl")),
      Seq("bk", "bl"), "left_semi"))
    // NOTE on evaluation count (plan-audited, plans/r13/link_fuzzy_pairs
    // _after.txt): Catalyst pushes the `dist <= maxDist` filter back into
    // the join condition, so levenshtein runs once per CANDIDATE pair there
    // and once per SURVIVOR in this projection — the same cost as the
    // filter-then-reproject form (no cross-operator subexpression
    // elimination either way). The select-then-where shape is kept for
    // readability, not as an optimization; forcing a single evaluation
    // would need a materialization barrier on the candidate-sized frame,
    // which costs more than the survivor-only re-evaluation it saves.
    sized.as("x").join(sized.as("y"),
        col("x.bk") === col("y.bk") && col("x.bl") === col("y.bl") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.name").as("name_a"), col("y.name").as("name_b"),
        levenshtein(col("x.name"), col("y.name")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }

  /**
   * Entity assignment over [[fuzzyPairs]]: connected components via
   * [[Dedup.clusters]] (min-id labels), LEFT-joined back so singletons keep
   * their own id as the entity — every input row gets exactly one entity.
   *
   * @return (id, name, entity_id) for every input row.
   */
  def entities(df: DataFrame, idCol: String, nameCol: String,
      blockLen: Int = 8, maxDist: Int = 1, maxBlock: Long = 10000L): DataFrame =
    entitiesFromPairs(df,
      fuzzyPairs(df, idCol, nameCol, blockLen, maxDist, maxBlock),
      idCol, nameCol)

  /** [[entities]] over a pre-built [[fuzzyPairs]] frame — the shared-fetch
    * entry point: one block-verify join serves both the pair report and the
    * entity assignment (the pairs frame is verify-bounded, safe to persist). */
  def entitiesFromPairs(df: DataFrame, fuzzyPairsDf: DataFrame,
      idCol: String, nameCol: String): DataFrame = {
    val pairs = fuzzyPairsDf.select(col("id_a").as("a"), col("id_b").as("b"))
    val labels = Dedup.clusters(pairs)
      .select(col("doc_id").as("id"), col("cluster_id"))
    df.where(col(idCol).isNotNull && col(nameCol).isNotNull)
      .select(col(idCol).as("id"), col(nameCol).as("name"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), col("name"),
        coalesce(col("cluster_id"), col("id")).as("entity_id"))
  }

  /** Blocking-quality audit — the record-linkage pre-flight: how much of
    * the quadratic pair space does the (prefix, length) blocking scheme
    * actually examine, and what fraction of examined candidates verify?
    * One row: record/block counts, candidate pairs (sum of in-cap block
    * n*(n-1)/2 in exact integers), the full N*(N-1)/2 pair space, the
    * reduction ratio, over-cap blocks dropped, verified matches, and
    * precision — the two dials (reduction vs recall risk) every blocking
    * tune trades between.
    *
    * Scale shape: block stats are one hash aggregate; the verify count
    * reuses the [[fuzzyPairs]] join (candidate-bounded); everything
    * combines as broadcast 1-row frames. */
  def blockingQuality(df: DataFrame, idCol: String, nameCol: String,
      blockLen: Int = 8, maxDist: Int = 1, maxBlock: Long = 10000L): DataFrame =
    blockingQualityFromPairs(df,
      fuzzyPairs(df, idCol, nameCol, blockLen, maxDist, maxBlock),
      idCol, nameCol, blockLen, maxBlock)

  /** [[blockingQuality]] over a pre-verified [[fuzzyPairs]] frame (which
    * callers memoize/persist — the shared-fetch pattern: the verify join
    * is the expensive half and the entity/audit consumers share one). */
  def blockingQualityFromPairs(df: DataFrame, fuzzyPairsDf: DataFrame,
      idCol: String, nameCol: String, blockLen: Int,
      maxBlock: Long): DataFrame = {
    val keyed = df
      .where(col(idCol).isNotNull && col(nameCol).isNotNull)
      .select(substring(col(nameCol), 1, blockLen).as("bk"),
        length(col(nameCol)).as("bl"))
    val blocks = keyed.groupBy("bk", "bl").agg(count(lit(1)).as("bn"))
    val stats = blocks.agg(
      sum(col("bn")).as("n_records"),
      count(lit(1)).as("n_blocks"),
      sum(when(col("bn") > maxBlock, lit(1L)).otherwise(lit(0L))).as("blocks_over_cap"),
      sum(when(col("bn") <= maxBlock, expr("bn * (bn - 1) div 2"))
        .otherwise(lit(0L))).cast("long").as("n_candidates"))
    val verified = fuzzyPairsDf.agg(count(lit(1)).as("n_matches"))
    stats.crossJoin(broadcast(verified))
      .withColumn("n_total_pairs",
        // integer div: the double route loses exactness at corpus-scale counts
        expr("n_records * (n_records - 1) div 2"))
      .withColumn("reduction_ratio",
        lit(1.0) - col("n_candidates").cast("double") / col("n_total_pairs").cast("double"))
      .withColumn("precision",
        col("n_matches").cast("double") / col("n_candidates").cast("double"))
  }
}
