package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Cdc, Curation, Layout, Points, Privacy, Profiling, Sessionize}

/**
 * Release-surface audit queries (round 10): privacy (k-anonymity,
 * l-diversity, seeded-DP counts), numeric-forensics and robust-aggregate
 * audits, and snapshot-diff (CDC) reports — the checks a corpus or its
 * stats pass through before leaving the pipeline.
 *
 * Every gate follows the house determinism rules (exact integer/decimal
 * cores, quantized transcendentals, pinned double divisions) and is paired
 * with a DuckDB oracle below.
 */
object AuditQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Points.table(s, dir, "documents")
  private def events(s: SparkSession, dir: String): DataFrame = Points.table(s, dir, "events")

  /** Quasi-identifier view shared by the k-anonymity gates: language,
    * source, and a 250-char length bucket — the release-table shape where
    * none of the columns alone identifies, but the combination might. */
  private def qiDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("lang"), col("source"),
      expr("n_chars div 250").as("len_bucket"))

  /** DuckDB twin of [[qiDocs]] — integer floor division (n_chars is
    * non-negative so `//` and Spark's cast-after-divide agree). */
  private val QiDocsSql =
    "SELECT lang, source, CAST(n_chars // 250 AS BIGINT) AS len_bucket FROM documents"

  /** The scd2Maintain-WRITTEN dimension directory backing `cdc_scd2_incr`
    * (the production maintained-dimension shape: bootstrap on the first
    * half of the time range, one persisted delta apply on the second, each
    * pass a parquet rewrite + atomic swap). Built once per (session, sfDir)
    * into a temp store — the BM25-family memoization pattern, registered in
    * [[sharedBuilds]] so the bench attributes the two maintenance passes as
    * their own line item. */
  private val scd2DimMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def scd2DimDir(s: SparkSession, dir: String): String =
    scd2DimMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val ev = events(s, dir).select(col("user_id"), col("event_type"),
        expr("ts div 1000000").as("ms"), col("event_id"))
      val mm = ev.agg(min(col("ms")), max(col("ms"))).head
      val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
      val dim = java.nio.file.Files.createTempDirectory("graft-scd2dim").toString + "/dim"
      graft.tools.Maintenance.scd2Maintain(s, dim, ev.where(col("ms") < cut),
        "user_id", "event_type", col("ms"), "event_id")
      graft.tools.Maintenance.scd2Maintain(s, dim, ev.where(col("ms") >= cut),
        "user_id", "event_type", col("ms"), "event_id")
      dim
    })

  /** The [[graft.operators.Privacy.releaseWithLedger]]-written ledger
    * directory backing `priv_dp_ledger`: two release epochs of the
    * event-type DP counts (e1 at eps 0.5, e2 at eps 0.25 — fresh salt
    * each, per the differencing contract), built once per (session, sfDir)
    * into a temp store. Deterministic end to end (seeded draws, no
    * wall-clock in the ledger), so the driver oracle can recompute every
    * ledger column from the events table. */
  private val dpLedgerMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def dpLedgerDir(s: SparkSession, dir: String): String =
    dpLedgerMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val base = java.nio.file.Files.createTempDirectory("graft-dpledger").toString
      val releases = s"$base/releases"
      val ledger = s"$base/ledger"
      Privacy.releaseWithLedger(
        Privacy.dpCounts(events(s, dir), "event_type", epsilon = 0.5, salt = "dp-e1"),
        Seq("event_type"), epoch = "e1", salt = "dp-e1", releases, ledger)
      Privacy.releaseWithLedger(
        Privacy.dpCounts(events(s, dir), "event_type", epsilon = 0.25, salt = "dp-e2"),
        Seq("event_type"), epoch = "e2", salt = "dp-e2", releases, ledger)
      ledger
    })

  /** Named builder for the maintained-dimension directory (see
    * [[LlmQueries.sharedBuilds]] for the mechanism): the two scd2Maintain
    * store passes run once per bench pass and are timed as their own entry,
    * so `cdc_scd2_incr`'s median is the read cost of the production
    * artifact, not the build. (The memo key is (session, dir), so unlike
    * the persisted-frame builds this one survives clearCache — the entry
    * is near-zero after pass 1, which is itself the honest attribution:
    * the directory is a durable store artifact, not an evictable cache.) */
  /** A SECOND scd2Maintain-written dimension, bootstrapped whole and then
    * passed through [[graft.tools.Maintenance.scd2Prune]] at the event-span
    * midpoint — the history-retention pass `cdc_scd2_prune` hash-checks
    * (closed intervals ending before the cutoff trimmed, open state kept).
    * Separate from [[scd2DimDir]] so the retention pass never mutates the
    * directory `cdc_scd2_incr` reads. */
  private val scd2PruneMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def scd2PrunedDir(s: SparkSession, dir: String): String =
    scd2PruneMemo.computeIfAbsent(s"${SessionKeys.key(s)}:$dir", _ => {
      val ev = events(s, dir).select(col("user_id"), col("event_type"),
        expr("ts div 1000000").as("ms"), col("event_id"))
      val mm = ev.agg(min(col("ms")), max(col("ms"))).head
      val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
      val dim = java.nio.file.Files.createTempDirectory("graft-scd2prune").toString + "/dim"
      graft.tools.Maintenance.scd2Maintain(s, dim, ev,
        "user_id", "event_type", col("ms"), "event_id")
      graft.tools.Maintenance.scd2Prune(s, dim, cut)
      dim
    })

  val sharedBuilds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "shared_build_scd2_dim" ->
      ((s: SparkSession, dir: String) => { scd2DimDir(s, dir); () }),
    "shared_build_scd2_pruned" ->
      ((s: SparkSession, dir: String) => { scd2PrunedDir(s, dir); () }),
    "shared_build_dp_ledger" ->
      ((s: SparkSession, dir: String) => { dpLedgerDir(s, dir); () }))

  /** Synthetic snapshot pair for the CDC gates, derived deterministically
    * from `documents`: v1 drops every 7th key, v2 drops every 5th and bumps
    * n_chars on every 3rd — so the diff exercises all four statuses with
    * an integer compare column (no cross-engine collation risk). */
  private def cdcV1(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).where(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
  private def cdcV2(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).where(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 3 === 0, col("n_chars") + lit(1L))
          .otherwise(col("n_chars")).as("n_chars"))

  private val CdcDiffSql =
    """WITH v1 AS (SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 7 != 0),
      |v2 AS (SELECT doc_id, source,
      |              CASE WHEN doc_id % 3 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars
      |       FROM documents WHERE doc_id % 5 != 0),
      |j AS (SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
      |             COALESCE(v1.source, v2.source) AS source,
      |             CASE WHEN v1.doc_id IS NULL THEN 'added'
      |                  WHEN v2.doc_id IS NULL THEN 'removed'
      |                  WHEN v1.n_chars IS DISTINCT FROM v2.n_chars THEN 'changed'
      |                  ELSE 'unchanged' END AS status
      |      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)""".stripMargin

  /** 32-bit md5 fraction as a DuckDB polynomial (no conv() in DuckDB) —
    * the [[graft.operators.Curation.weightedSample]] oracle idiom. */
  private def md5Poly(hexExpr: String): String = {
    val poly = (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substr($hexExpr, $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
      .mkString(" + ")
    s"CAST($poly AS BIGINT)"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // k-anonymity group audit: every (lang, source, len_bucket) cell with
    // its population and the below-k risk flag — one QI-keyed aggregate
    "priv_kanon_groups" -> ((s, dir) =>
      Privacy.kAnonymityGroups(qiDocs(s, dir), Seq("lang", "source", "len_bucket"), k = 5)),
    // one-row release verdict: how much of the corpus is re-identifiable
    // at k=5 under this quasi-identifier set
    "priv_kanon_report" -> ((s, dir) =>
      Privacy.kAnonymityReport(qiDocs(s, dir), Seq("lang", "source", "len_bucket"), k = 5)),
    // l-diversity over the coarser (lang, len_bucket) key with source as
    // the sensitive attribute: k-anonymous cells that still expose source
    "priv_ldiversity" -> ((s, dir) =>
      Privacy.lDiversity(qiDocs(s, dir), Seq("lang", "len_bucket"), "source", l = 3)),
    // seeded-Laplace DP counts per event type (eps = 0.5, sensitivity 1):
    // the reproducible noisy-release shape — exact n rides beside the noise
    "priv_dp_counts" -> ((s, dir) =>
      Privacy.dpCounts(events(s, dir), "event_type", epsilon = 0.5, salt = "dp")),
    // the artifact that actually leaves the pipeline: the releaseView
    // projection of the same DP frame — noisy values + privacy params only,
    // no exact counts and no recoverable noise column
    "priv_dp_release" -> ((s, dir) =>
      Privacy.releaseView(
        Privacy.dpCounts(events(s, dir), "event_type", epsilon = 0.5, salt = "dp"),
        Seq("event_type"))),
    // cumulative-budget ledger audit over the releaseWithLedger-written
    // store (two epochs, fresh salt each): per-epoch spent epsilon with the
    // sequential-composition running total — the accounting that catches
    // budget exhaustion and salt reuse (duplicate salt_hash) after the fact
    "priv_dp_ledger" -> ((s, dir) =>
      Privacy.ledgerReport(s.read.parquet(dpLedgerDir(s, dir)))),
    // Benford first-digit forensics on the value column: per digit the
    // observed count/frequency, the log-law expectation, and the
    // chi-square contribution
    "events_benford" -> ((s, dir) => Profiling.benford(events(s, dir), "value")),
    // robust per-type value means: plain, winsorized at nearest-rank
    // p05/p95, and 5%-trimmed — one window sort per type, exact decimal sums
    "events_robust_means" -> ((s, dir) =>
      Profiling.robustMeans(events(s, dir), "event_type", "value", tieCol = "event_id")),
    // ROLLUP(type, day) traffic cube: per-cell, per-type subtotal, and
    // grand-total rows in one Expand pass (Catalyst's grouping-sets path —
    // no union of re-scans), grouping flags telling the levels apart
    "events_rollup" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("day", expr("(ts div 1000000) div 86400000"))
      ev.rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          ((sum(col("value").cast("decimal(18,6)")) * lit(1000000L))
            .cast("long").cast("double") / lit(1000000.0)).as("sum_value"),
          grouping(col("event_type")).cast("long").as("g_type"),
          grouping(col("day")).cast("long").as("g_day"))
    }),
    // CUBE(type, dow) traffic cube: all four grouping levels in one
    // Expand pass — the other Catalyst grouping-sets shape beside ROLLUP
    "events_cube" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("dow", expr("pmod((ts div 1000000) div 86400000 + 4, 7)"))
      ev.cube(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"),
          ((sum(col("value").cast("decimal(18,6)")) * lit(1000000L))
            .cast("long").cast("double") / lit(1000000.0)).as("sum_value"),
          grouping(col("event_type")).cast("long").as("g_type"),
          grouping(col("dow")).cast("long").as("g_dow"))
    }),
    // Benford SECOND-digit forensics: the harder-to-fake digit law
    // P(d2) = sum over d1 of log10(1 + 1/(10*d1 + d2))
    "events_benford2" -> ((s, dir) =>
      Profiling.benford2(events(s, dir), "value")),
    // per-key snapshot diff between the two synthetic corpus versions:
    // one pk-keyed full outer join, every key classified
    "cdc_row_status" -> ((s, dir) =>
      Cdc.snapshotDiff(cdcV1(s, dir), cdcV2(s, dir),
        pkCols = Seq("doc_id"), cmpCols = Seq("n_chars"), carryCols = Seq("source"))),
    // churn report over the same diff: counts per (source, status)
    "cdc_snapshot_diff" -> ((s, dir) =>
      Cdc.diffReport(
        Cdc.snapshotDiff(cdcV1(s, dir), cdcV2(s, dir),
          pkCols = Seq("doc_id"), cmpCols = Seq("n_chars"), carryCols = Seq("source")),
        sliceCols = Seq("source"))),
    // t-closeness over the coarser QI key: groups whose source DISTRIBUTION
    // diverges from the corpus-wide one (exact-integer total variation)
    "priv_tcloseness" -> ((s, dir) =>
      Privacy.tCloseness(qiDocs(s, dir), Seq("lang", "len_bucket"), "source", tBp = 2000)),
    // user-level DP histogram: each user's contribution to a type capped at
    // 4 (hash-agg clip, no window), Laplace scale = cap/epsilon
    "priv_dp_user_hist" -> ((s, dir) =>
      Privacy.dpClippedCounts(events(s, dir), "event_type", "user_id",
        cap = 4, epsilon = 0.5, salt = "dpu")),
    // SCD type-2 history of each user's event_type runs: validity
    // intervals with version numbers and the open current row
    "cdc_scd2" -> ((s, dir) =>
      Cdc.scd2(events(s, dir), "user_id", "event_type",
        expr("ts div 1000000"), "event_id")),
    // the MAINTAINED-DIMENSION path under the driver's own oracle, end to
    // end: a scd2Maintain-written store directory (bootstrap pass on the
    // first half of the time range, one PERSISTED delta-apply pass on the
    // second — parquet write + atomic swap each pass), then the gate READS
    // the dimension dir. The oracle is the IDENTICAL batch SCD2 SQL, so the
    // driver hash-checks the production path (dimension dir -> scd2Apply
    // delta -> rewrite -> read) == one batch rebuild. The midpoint cut is
    // derived from exact min/max (one 1-row collect); the directory builds
    // once per (session, sfDir) — see [[scd2DimDir]]/[[sharedBuilds]]
    "cdc_scd2_incr" -> ((s, dir) =>
      s.read.parquet(scd2DimDir(s, dir))
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"), col("version"), col("is_current"))),
    // dimension-history RETENTION: the scd2Prune-trimmed store — closed
    // intervals ending before the event-span midpoint dropped, open state
    // kept; the oracle recomputes the full SCD2 view and applies the same
    // cutoff, so the pass's keep predicate is pinned end to end
    "cdc_scd2_prune" -> ((s, dir) =>
      s.read.parquet(scd2PrunedDir(s, dir))
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"), col("version"), col("is_current"))),
    // incremental-aggregate maintenance audit: per-source base+delta vs
    // the independent v2 recompute, with exact match flags
    "cdc_incr_agg" -> ((s, dir) =>
      Cdc.aggDeltaAudit(
        Cdc.snapshotDelta(cdcV1(s, dir), cdcV2(s, dir),
          pkCols = Seq("doc_id"), valueCol = "n_chars", carryCols = Seq("source")),
        sliceCols = Seq("source"))),
    // z-order locality profile: per pseudo-file row count + both-dim
    // min/max envelopes over the (user-bucket x day-bucket) Morton key
    "layout_zorder" -> ((s, dir) =>
      Layout.zorderProfile(events(s, dir),
        expr("user_id % 256"), expr("((ts div 1000000) div 86400000) % 256"),
        bits = 8, bucketSize = 64L)),
    // skip-ratio audit: files touched by a user-cohort slab predicate under
    // z-order vs time-major layout — the data-skipping justification
    "layout_prune_audit" -> ((s, dir) =>
      Layout.pruneAudit(events(s, dir),
        expr("user_id % 256"), expr("((ts div 1000000) div 86400000) % 256"),
        bits = 8, bucketSize = 64L, xLo = 32L, xHi = 47L)),
    // join-key skew pre-flight on events.user_id: per-key extremes,
    // nearest-rank p50/p99, and md5-shard balance
    "events_join_skew" -> ((s, dir) =>
      Profiling.joinSkewProfile(events(s, dir), "user_id")),
    // the batch side of the heavy-key twin pair (heavyKeysStream raises the
    // same set as crossings while the data streams in): keys at/over the
    // integer mean rows-per-key — a data-relative threshold, exact at any
    // SF (total div n_keys in both engines)
    "events_heavy_keys" -> ((s, dir) => {
      val counts = events(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
      val thr = counts.agg(sum(col("n")).as("tot"), count(lit(1)).as("k"))
        .select(expr("tot div k").as("thr"))
      counts.crossJoin(broadcast(thr))
        .where(col("n") >= col("thr"))
        .select(col("user_id"), col("n"), col("thr"))
    }),
    // Neyman-optimal stratified allocation of a 100-doc sample budget
    // across sources, weighted by exact-integer variance numerators
    "curate_neyman_alloc" -> ((s, dir) =>
      Curation.neymanAllocation(docs(s, dir), "source", "n_chars", budget = 100L)),
    // the allocation EXECUTED: exactly alloc_h docs per source, picked by
    // the salted-md5 deterministic order
    "curate_neyman_sample" -> ((s, dir) =>
      Curation.neymanSample(docs(s, dir), "source", "n_chars", "doc_id", budget = 100L)),
    // apply a change set (deletes + versioned upserts, last-wins) to the
    // v1 snapshot: delta-sized pre-fold, ONE pk full outer join
    "cdc_apply" -> ((s, dir) => {
      val d = docs(s, dir)
      val changes =
        d.where(col("doc_id") % 5 === 0)
          .select(col("doc_id"), col("source"), col("n_chars"),
            lit("delete").as("op"), lit(1L).as("version"))
          .unionByName(
            d.where(col("doc_id") % 7 === 0)
              .select(col("doc_id"), col("source"),
                (col("n_chars") + lit(100L)).as("n_chars"),
                lit("upsert").as("op"), lit(2L).as("version")))
      Cdc.applyChanges(cdcV1(s, dir), changes,
        pkCols = Seq("doc_id"), valCols = Seq("source", "n_chars"), orderCol = "version")
    }),
    // hour-level ingestion-completeness audit per (type, day): which days
    // can daily aggregates trust?
    "events_completeness" -> ((s, dir) =>
      Profiling.completeness(
        events(s, dir).withColumn("ts_ms", expr("ts div 1000000")),
        "event_type", "ts_ms")),
    // record-linkage blocking-quality pre-flight: candidate-space
    // reduction vs verified precision under the (prefix, length) scheme —
    // the verify count reuses the link family's memoized pair frame
    "link_block_quality" -> ((s, dir) =>
      graft.operators.Linkage.blockingQualityFromPairs(
        Points.table(s, dir, "customer"), TpchQueries.fuzzyPairsFrame(s, dir),
        "c_custkey", "c_name", blockLen = 16, maxBlock = 10000L)),
    // user-level DP SUM release: per-row clip to [0, 10], per-user total
    // clip to 40, Laplace scale 40/0.5
    "priv_dp_sum" -> ((s, dir) =>
      Privacy.dpClippedSum(events(s, dir), "event_type", "user_id", "value",
        valueCap = 10.0, sumCap = 40.0, epsilon = 0.5, salt = "dps")),
    // referential-integrity load gate over the TPC-H graph: orphan child
    // keys per relationship, one left anti join each
    "audit_referential" -> ((s, dir) => {
      val t = (n: String) => Points.table(s, dir, n)
      Profiling.referentialAudit(t("orders"), t("customer"),
          "o_custkey", "c_custkey", "orders->customer")
        .unionByName(Profiling.referentialAudit(t("lineitem"), t("orders"),
          "l_orderkey", "o_orderkey", "lineitem->orders"))
        .unionByName(Profiling.referentialAudit(t("lineitem"), t("part"),
          "l_partkey", "p_partkey", "lineitem->part"))
    }),
    // column data-contract report: NULL-safe constraint checks with
    // violation counts, one aggregate per check
    "audit_contract" -> ((s, dir) => {
      val d = docs(s, dir)
      val ev = events(s, dir)
      Profiling.contractCheck(d, "documents.n_chars = length(text)",
          col("n_chars") === length(col("text")))
        .unionByName(Profiling.contractCheck(d, "documents.lang in domain",
          col("lang").isin("en", "de", "fr", "es", "it", "pt", "nl", "ja", "zh", "ru")))
        .unionByName(Profiling.contractCheck(d, "documents.text non-empty",
          length(col("text")) > 0))
        .unionByName(Profiling.contractCheck(ev, "events.value is finite",
          !isnan(col("value")) && col("value").isNotNull))
        .unionByName(Profiling.contractCheck(ev, "events.user_id positive",
          col("user_id") > 0))
    }),
    // k-anonymity remediation sweep: residual risk per generalization
    // width of the length quasi-identifier
    "priv_kanon_sweep" -> ((s, dir) =>
      Privacy.kAnonymitySweep(
        docs(s, dir).select(col("lang"), col("source"), col("n_chars")),
        Seq("lang", "source"), "n_chars", widths = Seq(250L, 500L, 1000L, 2000L), k = 5)),
    // banded interval-overlap join: 6h-gap user sessions vs the daily
    // 06:00-08:00 maintenance window, rolled up per day
    "events_overlap_join" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("ts_ms", expr("ts div 1000000"))
      val sess = Sessionize.sessions(ev, "user_id", "ts_ms", "event_id", gapMs = 21600000L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts_ms")).as("l_start"), (max(col("ts_ms")) + lit(1L)).as("l_end"))
      val windows = ev.select(expr("ts_ms div 86400000").as("day")).distinct()
        .withColumn("r_start", col("day") * lit(86400000L) + lit(21600000L))
        .withColumn("r_end", col("day") * lit(86400000L) + lit(28800000L))
      AsOf.intervalOverlap(sess, windows, bandMs = 86400000L)
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("overlap_ms")).as("sum_overlap_ms"))
    })
  )

  val oracles: Map[String, String] = Map(
    "priv_kanon_groups" ->
      s"""WITH qi AS ($QiDocsSql)
         |SELECT lang, source, len_bucket,
         |       CAST(COUNT(*) AS BIGINT) AS group_n,
         |       CAST(CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
         |FROM qi GROUP BY 1, 2, 3""".stripMargin,
    "priv_kanon_report" ->
      s"""WITH qi AS ($QiDocsSql),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS group_n,
         |             CAST(CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
         |      FROM qi GROUP BY lang, source, len_bucket)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         |       CAST(SUM(group_n) AS BIGINT) AS n_rows,
         |       CAST(SUM(at_risk) AS BIGINT) AS groups_below_k,
         |       CAST(SUM(at_risk * group_n) AS BIGINT) AS rows_below_k,
         |       CAST(MIN(group_n) AS BIGINT) AS min_group,
         |       CAST(MAX(group_n) AS BIGINT) AS max_group,
         |       CAST(5 AS BIGINT) AS k,
         |       CAST(SUM(at_risk * group_n) AS DOUBLE) / CAST(SUM(group_n) AS DOUBLE)
         |         AS pct_rows_at_risk
         |FROM g""".stripMargin,
    "priv_ldiversity" ->
      s"""WITH qi AS ($QiDocsSql)
         |SELECT lang, len_bucket,
         |       CAST(COUNT(*) AS BIGINT) AS group_n,
         |       CAST(COUNT(DISTINCT source) AS BIGINT) AS distinct_sensitive,
         |       CAST(CASE WHEN COUNT(DISTINCT source) < 3 THEN 1 ELSE 0 END AS BIGINT) AS below_l
         |FROM qi GROUP BY 1, 2""".stripMargin,
    "priv_dp_counts" ->
      s"""WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
         |h AS (SELECT event_type, n, substr(md5('dp:' || event_type), 1, 8) AS hx FROM g),
         |u AS (SELECT event_type, n,
         |             (CAST(${md5Poly("hx")} AS DOUBLE) + 0.5) / 4294967296.0 AS u
         |      FROM h),
         |z AS (SELECT event_type, n,
         |             CAST(((-1.0 / 0.5) * (CASE WHEN u - 0.5 > 0 THEN CAST(1 AS DOUBLE)
         |                                        WHEN u - 0.5 < 0 THEN CAST(-1 AS DOUBLE)
         |                                        ELSE CAST(0 AS DOUBLE) END))
         |                  * CAST(CAST(ln(1.0 - 2.0 * abs(u - 0.5)) AS DECIMAL(28,12)) AS DOUBLE)
         |                  AS DECIMAL(28,12)) AS noise_d
         |      FROM u)
         |SELECT event_type, n,
         |       CAST(noise_d AS DOUBLE) AS noise,
         |       CAST(n AS DOUBLE) + CAST(noise_d AS DOUBLE) AS noisy_n,
         |       CAST(0.5 AS DOUBLE) AS epsilon
         |FROM z""".stripMargin,
    "priv_dp_release" ->
      s"""WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
         |h AS (SELECT event_type, n, substr(md5('dp:' || event_type), 1, 8) AS hx FROM g),
         |u AS (SELECT event_type, n,
         |             (CAST(${md5Poly("hx")} AS DOUBLE) + 0.5) / 4294967296.0 AS u
         |      FROM h),
         |z AS (SELECT event_type, n,
         |             CAST(((-1.0 / 0.5) * (CASE WHEN u - 0.5 > 0 THEN CAST(1 AS DOUBLE)
         |                                        WHEN u - 0.5 < 0 THEN CAST(-1 AS DOUBLE)
         |                                        ELSE CAST(0 AS DOUBLE) END))
         |                  * CAST(CAST(ln(1.0 - 2.0 * abs(u - 0.5)) AS DECIMAL(28,12)) AS DOUBLE)
         |                  AS DECIMAL(28,12)) AS noise_d
         |      FROM u)
         |SELECT event_type,
         |       CAST(n AS DOUBLE) + CAST(noise_d AS DOUBLE) AS noisy_n,
         |       CAST(0.5 AS DOUBLE) AS epsilon
         |FROM z""".stripMargin,
    // mirrors priv_dp_ledger: the ledger is a pure function of the events
    // table and the gate's fixed (epoch, epsilon, salt) schedule — one
    // release row per event_type, so n_rows = COUNT(DISTINCT event_type);
    // spent_cum is the exact running epsilon sum in epoch order
    "priv_dp_ledger" ->
      """WITH n AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_rows FROM events)
        |SELECT 'e1' AS epoch, md5('dp-e1') AS salt_hash, CAST(0.5 AS DOUBLE) AS epsilon,
        |       n_rows, CAST(0.5 AS DOUBLE) AS spent_cum FROM n
        |UNION ALL
        |SELECT 'e2' AS epoch, md5('dp-e2') AS salt_hash, CAST(0.25 AS DOUBLE) AS epsilon,
        |       n_rows, CAST(0.75 AS DOUBLE) AS spent_cum FROM n""".stripMargin,
    "events_benford" -> {
      // the identical Double.toString literals the Spark side uses — both
      // engines parse them back to the same binary doubles
      val cases = Profiling.benfordExpectedLits
        .map { case (d, s) => s"WHEN $d THEN CAST('$s' AS DOUBLE)" }.mkString(" ")
      s"""WITH f AS (SELECT CAST(FLOOR(value * 1000000.0) AS BIGINT) AS n6
         |           FROM events WHERE value > 0.0),
         |d AS (SELECT CAST(substr(CAST(n6 AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |      FROM f WHERE n6 >= 1),
         |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM c),
         |j AS (SELECT c.digit, c.n_obs, t.n_total,
         |             CASE c.digit $cases END AS p_exp
         |      FROM c, t),
         |e AS (SELECT *, CAST(n_total AS DOUBLE) * p_exp AS e,
         |             CAST(n_obs AS DOUBLE) - (CAST(n_total AS DOUBLE) * p_exp) AS dd
         |      FROM j)
         |SELECT digit, n_obs, n_total,
         |       CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_obs,
         |       p_exp, (dd * dd) / e AS chi2_term
         |FROM e""".stripMargin
    },
    "events_robust_means" ->
      """WITH r AS (SELECT event_type, value,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn,
        |             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |           FROM events),
        |l AS (SELECT *, CAST((n * 5) // 100 AS BIGINT) AS lo FROM r),
        |b AS (SELECT event_type,
        |        MAX(CASE WHEN rn = lo + 1 THEN value END) AS p_lo,
        |        MAX(CASE WHEN rn = n - lo THEN value END) AS p_hi
        |      FROM l GROUP BY 1),
        |a AS (SELECT l.event_type, l.value, l.rn, l.n, l.lo, b.p_lo, b.p_hi
        |      FROM l JOIN b USING (event_type))
        |SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MAX(lo) AS BIGINT) AS n_trimmed_per_side,
        |  MAX(p_lo) AS p_lo, MAX(p_hi) AS p_hi,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0
        |    / CAST(COUNT(*) AS DOUBLE) AS mean,
        |  CAST(CAST(SUM(CAST(LEAST(GREATEST(value, p_lo), p_hi) AS DECIMAL(18,6))) * 1000000
        |       AS BIGINT) AS DOUBLE) / 1000000.0
        |    / CAST(COUNT(*) AS DOUBLE) AS winsor_mean,
        |  CAST(CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo THEN CAST(value AS DECIMAL(18,6)) END)
        |       * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0
        |    / CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo THEN 1 ELSE 0 END) AS DOUBLE) AS trimmed_mean
        |FROM a GROUP BY 1""".stripMargin,
    "events_rollup" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day, value FROM events)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE)
        |         / 1000000.0 AS sum_value,
        |       CAST(GROUPING(event_type) AS BIGINT) AS g_type,
        |       CAST(GROUPING(day) AS BIGINT) AS g_day
        |FROM e GROUP BY ROLLUP(event_type, day)""".stripMargin,
    "cdc_row_status" ->
      s"""$CdcDiffSql
         |SELECT doc_id, source, status FROM j""".stripMargin,
    "cdc_snapshot_diff" ->
      s"""$CdcDiffSql
         |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n
         |FROM j GROUP BY 1, 2""".stripMargin,
    // exact-integer total variation on the common denominator: present
    // terms |n_gs*n - n_s*n_g|, absent mass in closed form n*n_g - sum(n_s*n_g)
    "priv_tcloseness" ->
      s"""WITH qi AS ($QiDocsSql),
         |gs AS (SELECT lang, len_bucket, source, CAST(COUNT(*) AS BIGINT) AS n_gs
         |       FROM qi GROUP BY 1, 2, 3),
         |g AS (SELECT *, CAST(SUM(n_gs) OVER (PARTITION BY lang, len_bucket) AS BIGINT) AS n_g
         |      FROM gs),
         |m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM qi GROUP BY 1),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM qi),
         |j AS (SELECT g.lang, g.len_bucket, g.n_gs, g.n_g, m.n_s, t.n
         |      FROM g JOIN m USING (source), t),
         |a AS (SELECT lang, len_bucket, n_g, n,
         |             CAST(SUM(ABS(n_gs * n - n_s * n_g)) AS BIGINT) AS abs_present,
         |             CAST(SUM(n_s * n_g) AS BIGINT) AS mass_present
         |      FROM j GROUP BY 1, 2, 3, 4)
         |SELECT lang, len_bucket, n_g AS group_n,
         |       CAST(abs_present + (n * n_g - mass_present) AS DOUBLE)
         |         / (2.0 * CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE)) AS tvd,
         |       CAST(CASE WHEN (abs_present + (n * n_g - mass_present)) * 10000
         |                      > 4000 * n_g * n THEN 1 ELSE 0 END AS BIGINT) AS above_t
         |FROM a""".stripMargin,
    "priv_dp_user_hist" ->
      s"""WITH g AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_gu
         |           FROM events GROUP BY 1, 2),
         |c AS (SELECT event_type, CAST(SUM(n_gu) AS BIGINT) AS n_raw,
         |             CAST(SUM(LEAST(n_gu, 4)) AS BIGINT) AS n_clipped
         |      FROM g GROUP BY 1),
         |h AS (SELECT *, substr(md5('dpu:' || event_type), 1, 8) AS hx FROM c),
         |u AS (SELECT event_type, n_raw, n_clipped,
         |             (CAST(${md5Poly("hx")} AS DOUBLE) + 0.5) / 4294967296.0 AS u
         |      FROM h),
         |z AS (SELECT event_type, n_raw, n_clipped,
         |             CAST(((-4.0 / 0.5) * (CASE WHEN u - 0.5 > 0 THEN CAST(1 AS DOUBLE)
         |                                        WHEN u - 0.5 < 0 THEN CAST(-1 AS DOUBLE)
         |                                        ELSE CAST(0 AS DOUBLE) END))
         |                  * CAST(CAST(ln(1.0 - 2.0 * abs(u - 0.5)) AS DECIMAL(28,12)) AS DOUBLE)
         |                  AS DECIMAL(28,12)) AS noise_d
         |      FROM u)
         |SELECT event_type, n_raw, n_clipped,
         |       CAST(noise_d AS DOUBLE) AS noise,
         |       CAST(n_clipped AS DOUBLE) + CAST(noise_d AS DOUBLE) AS noisy_n,
         |       CAST(0.5 AS DOUBLE) AS epsilon,
         |       CAST(4 AS BIGINT) AS sensitivity
         |FROM z""".stripMargin,
    "events_cube" ->
      """WITH e AS (SELECT event_type,
        |             ((epoch_ms(ts) // 86400000 + 4) % 7 + 7) % 7 AS dow, value
        |           FROM events)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE)
        |         / 1000000.0 AS sum_value,
        |       CAST(GROUPING(event_type) AS BIGINT) AS g_type,
        |       CAST(GROUPING(dow) AS BIGINT) AS g_dow
        |FROM e GROUP BY CUBE(event_type, dow)""".stripMargin,
    "events_benford2" -> {
      val cases = Profiling.benford2ExpectedLits
        .map { case (d, s) => s"WHEN $d THEN CAST('$s' AS DOUBLE)" }.mkString(" ")
      s"""WITH f AS (SELECT CAST(FLOOR(value * 1000000.0) AS BIGINT) AS n6
         |           FROM events WHERE value > 0.0),
         |d AS (SELECT CAST(substr(CAST(n6 AS VARCHAR), 2, 1) AS BIGINT) AS digit
         |      FROM f WHERE n6 >= 10),
         |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM c),
         |j AS (SELECT c.digit, c.n_obs, t.n_total,
         |             CASE c.digit $cases END AS p_exp
         |      FROM c, t),
         |e AS (SELECT *, CAST(n_total AS DOUBLE) * p_exp AS e,
         |             CAST(n_obs AS DOUBLE) - (CAST(n_total AS DOUBLE) * p_exp) AS dd
         |      FROM j)
         |SELECT digit, n_obs, n_total,
         |       CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_obs,
         |       p_exp, (dd * dd) / e AS chi2_term
         |FROM e""".stripMargin
    },
    "cdc_scd2" ->
      """WITH b AS (SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events),
        |c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
        |      FROM b),
        |ch AS (SELECT user_id, event_type, ms, event_id FROM c
        |       WHERE prev IS NULL OR event_type IS DISTINCT FROM prev)
        |SELECT user_id, event_type, ms AS valid_from,
        |       lead(ms) OVER w AS valid_to,
        |       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
        |       CAST(CASE WHEN lead(ms) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)""".stripMargin,
    // the batch SCD2 SQL VERBATIM: the incremental gate's whole point is
    // that the delta-applied history hashes equal to the batch rebuild
    "cdc_scd2_incr" ->
      """WITH b AS (SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events),
        |c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
        |      FROM b),
        |ch AS (SELECT user_id, event_type, ms, event_id FROM c
        |       WHERE prev IS NULL OR event_type IS DISTINCT FROM prev)
        |SELECT user_id, event_type, ms AS valid_from,
        |       lead(ms) OVER w AS valid_to,
        |       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
        |       CAST(CASE WHEN lead(ms) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)""".stripMargin,
    // mirrors cdc_scd2_prune: the same SCD2 construction, then the
    // retention keep-predicate — open intervals always survive, closed
    // intervals survive iff they end at/after the event-span midpoint
    "cdc_scd2_prune" ->
      """WITH b AS (SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events),
        |c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
        |      FROM b),
        |ch AS (SELECT user_id, event_type, ms, event_id FROM c
        |       WHERE prev IS NULL OR event_type IS DISTINCT FROM prev),
        |s AS (SELECT user_id, event_type, ms AS valid_from,
        |             lead(ms) OVER w AS valid_to,
        |             CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
        |             CAST(CASE WHEN lead(ms) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |      FROM ch
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |mm AS (SELECT MIN(ms) AS lo, MAX(ms) AS hi FROM b)
        |SELECT user_id, event_type, valid_from, valid_to, version, is_current
        |FROM s, mm
        |WHERE is_current = 1 OR valid_to >= lo + (hi - lo) // 2""".stripMargin,
    "cdc_incr_agg" ->
      """WITH v1 AS (SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 7 != 0),
        |v2 AS (SELECT doc_id, source,
        |              CASE WHEN doc_id % 3 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars
        |       FROM documents WHERE doc_id % 5 != 0),
        |j AS (SELECT COALESCE(v1.source, v2.source) AS source,
        |             v1.n_chars AS o, v2.n_chars AS nn,
        |             CASE WHEN v1.doc_id IS NULL THEN 'added'
        |                  WHEN v2.doc_id IS NULL THEN 'removed'
        |                  WHEN v1.n_chars IS DISTINCT FROM v2.n_chars THEN 'changed'
        |                  ELSE 'unchanged' END AS status
        |      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id),
        |a AS (SELECT source,
        |        CAST(SUM(CASE WHEN o  IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
        |        CAST(SUM(CASE WHEN nn IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v2,
        |        CAST(SUM(CASE WHEN status = 'added'   THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |        CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |        CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |        CAST(COALESCE(SUM(o), 0) AS BIGINT) AS sum_v1,
        |        CAST(COALESCE(SUM(nn), 0) AS BIGINT) AS sum_v2,
        |        CAST(COALESCE(SUM(CASE WHEN status = 'added' THEN nn END), 0)
        |           - COALESCE(SUM(CASE WHEN status = 'removed' THEN o END), 0)
        |           + COALESCE(SUM(CASE WHEN status = 'changed' THEN nn - o END), 0) AS BIGINT)
        |          AS delta_sum
        |      FROM j GROUP BY 1)
        |SELECT *, n_v1 + n_added - n_removed AS incr_n, sum_v1 + delta_sum AS incr_sum,
        |       CAST(CASE WHEN n_v1 + n_added - n_removed = n_v2 THEN 1 ELSE 0 END AS BIGINT)
        |         AS n_matches,
        |       CAST(CASE WHEN sum_v1 + delta_sum = sum_v2 THEN 1 ELSE 0 END AS BIGINT)
        |         AS sum_matches
        |FROM a""".stripMargin,
    "layout_zorder" ->
      s"""WITH e AS (SELECT user_id % 256 AS x, (epoch_ms(ts) // 86400000) % 256 AS y
         |           FROM events),
         |z AS (SELECT x, y, (${Layout.mortonSql("x", "y", 8)}) AS z FROM e)
         |SELECT CAST(z // 64 AS BIGINT) AS zbucket, CAST(COUNT(*) AS BIGINT) AS n,
         |       MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
         |FROM z GROUP BY 1""".stripMargin,
    "layout_prune_audit" ->
      s"""WITH e AS (SELECT user_id % 256 AS x, (epoch_ms(ts) // 86400000) % 256 AS y
         |           FROM events),
         |f AS (SELECT x, y,
         |             CAST((${Layout.mortonSql("x", "y", 8)}) // 64 AS BIGINT) AS zfile,
         |             CAST(((y << 8) | x) // 64 AS BIGINT) AS lfile,
         |             CASE WHEN x >= 32 AND x <= 47 THEN 1 ELSE 0 END AS hit
         |      FROM e),
         |zs AS (SELECT CAST(COUNT(*) AS BIGINT) AS z_total, CAST(SUM(t) AS BIGINT) AS z_touched
         |       FROM (SELECT zfile, MAX(hit) AS t FROM f GROUP BY 1)),
         |ls AS (SELECT CAST(COUNT(*) AS BIGINT) AS lin_total, CAST(SUM(t) AS BIGINT) AS lin_touched
         |       FROM (SELECT lfile, MAX(hit) AS t FROM f GROUP BY 1))
         |SELECT z_total, z_touched, lin_total, lin_touched,
         |       CAST(32 AS BIGINT) AS x_lo, CAST(47 AS BIGINT) AS x_hi,
         |       CAST(z_total - z_touched AS DOUBLE) / CAST(z_total AS DOUBLE) AS z_skip_ratio,
         |       CAST(lin_total - lin_touched AS DOUBLE) / CAST(lin_total AS DOUBLE)
         |         AS lin_skip_ratio
         |FROM zs, ls""".stripMargin,
    "events_heavy_keys" ->
      """WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS thr FROM c)
        |SELECT user_id, n, CAST(thr AS BIGINT) AS thr FROM c, t WHERE n >= thr""".stripMargin,
    "events_join_skew" -> {
      val shardPoly = md5Poly("substr(md5(CAST(user_id AS VARCHAR)), 1, 8)")
      s"""WITH kc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
         |               CAST(MAX(cnt) AS BIGINT) AS max_key_rows FROM kc),
         |coc AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS m FROM kc GROUP BY 1),
         |cum AS (SELECT cnt, CAST(SUM(m) OVER (ORDER BY cnt
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |        FROM coc),
         |picks AS (SELECT
         |    MIN(CASE WHEN cum * 2 >= (SELECT n_keys FROM tot) * 1 THEN cnt END) AS p50_key_rows,
         |    MIN(CASE WHEN cum * 100 >= (SELECT n_keys FROM tot) * 99 THEN cnt END) AS p99_key_rows
         |  FROM cum),
         |sh AS (SELECT $shardPoly % 32 AS shard, CAST(COUNT(*) AS BIGINT) AS sn
         |       FROM events GROUP BY 1),
         |ss AS (SELECT CAST(MAX(sn) AS BIGINT) AS max_shard, CAST(MIN(sn) AS BIGINT) AS min_shard
         |       FROM sh)
         |SELECT tot.n_rows, tot.n_keys, tot.max_key_rows,
         |       picks.p50_key_rows, picks.p99_key_rows, ss.max_shard, ss.min_shard,
         |       CAST(tot.max_key_rows AS DOUBLE) / CAST(tot.n_rows AS DOUBLE) AS top1_share,
         |       CAST(ss.max_shard * 32 AS DOUBLE) / CAST(tot.n_rows AS DOUBLE) AS shard_skew
         |FROM tot, picks, ss""".stripMargin
    },
    "curate_neyman_alloc" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS stratum_n,
        |                    SUM(CAST(n_chars AS HUGEINT)) AS sx,
        |                    SUM(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS sx2
        |             FROM documents GROUP BY 1),
        |v AS (SELECT source, stratum_n,
        |             CAST(FLOOR(SQRT(CAST(CAST(stratum_n AS HUGEINT) * sx2 - sx * sx AS DOUBLE))
        |                        * 1000000.0) AS BIGINT) AS w_u
        |      FROM per),
        |w AS (SELECT *, CAST(SUM(w_u) OVER () AS BIGINT) AS w_total FROM v),
        |a AS (SELECT *, (w_u * 100) // w_total AS alloc_floor,
        |             w_u * 100 - ((w_u * 100) // w_total) * w_total AS rem
        |      FROM w),
        |r AS (SELECT *, CAST(SUM(alloc_floor) OVER () AS BIGINT) AS alloc_sum,
        |             CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rrank
        |      FROM a)
        |SELECT source, stratum_n, w_u, CAST(alloc_floor AS BIGINT) AS alloc_floor,
        |       CAST(alloc_floor + CASE WHEN rrank <= 100 - alloc_sum THEN 1 ELSE 0 END AS BIGINT)
        |         AS alloc
        |FROM r""".stripMargin,
    "curate_neyman_sample" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS stratum_n,
        |                    SUM(CAST(n_chars AS HUGEINT)) AS sx,
        |                    SUM(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS sx2
        |             FROM documents GROUP BY 1),
        |v AS (SELECT source,
        |             CAST(FLOOR(SQRT(CAST(CAST(stratum_n AS HUGEINT) * sx2 - sx * sx AS DOUBLE))
        |                        * 1000000.0) AS BIGINT) AS w_u
        |      FROM per),
        |w AS (SELECT *, CAST(SUM(w_u) OVER () AS BIGINT) AS w_total FROM v),
        |a AS (SELECT *, (w_u * 100) // w_total AS alloc_floor,
        |             w_u * 100 - ((w_u * 100) // w_total) * w_total AS rem
        |      FROM w),
        |r AS (SELECT *, CAST(SUM(alloc_floor) OVER () AS BIGINT) AS alloc_sum,
        |             CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rrank
        |      FROM a),
        |al AS (SELECT source,
        |         CAST(alloc_floor + CASE WHEN rrank <= 100 - alloc_sum THEN 1 ELSE 0 END
        |              AS BIGINT) AS alloc
        |       FROM r),
        |ranked AS (SELECT d.doc_id, d.source, al.alloc,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY d.source
        |               ORDER BY md5('neyman:' || CAST(d.doc_id AS VARCHAR)), d.doc_id)
        |               AS BIGINT) AS rn
        |           FROM documents d JOIN al USING (source))
        |SELECT doc_id, source, rn FROM ranked WHERE rn <= alloc""".stripMargin,
    "cdc_apply" ->
      """WITH v1 AS (SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 7 != 0),
        |ch AS (SELECT doc_id, source, n_chars, 'delete' AS op, 1 AS version
        |       FROM documents WHERE doc_id % 5 = 0
        |       UNION ALL
        |       SELECT doc_id, source, n_chars + 100, 'upsert', 2
        |       FROM documents WHERE doc_id % 7 = 0),
        |last AS (SELECT doc_id, op, source AS new_source, n_chars AS new_n_chars
        |         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |                 ORDER BY version DESC,
        |                          CASE WHEN op = 'delete' THEN 1 ELSE 0 END DESC) AS rn
        |               FROM ch)
        |         WHERE rn = 1),
        |j AS (SELECT COALESCE(v1.doc_id, last.doc_id) AS doc_id,
        |             v1.source, v1.n_chars, last.op, last.new_source, last.new_n_chars
        |      FROM v1 FULL OUTER JOIN last ON v1.doc_id = last.doc_id)
        |SELECT doc_id,
        |       CASE WHEN op IS NOT NULL THEN new_source ELSE source END AS source,
        |       CASE WHEN op IS NOT NULL THEN new_n_chars ELSE n_chars END AS n_chars
        |FROM j WHERE op IS NULL OR op != 'delete'""".stripMargin,
    "events_completeness" ->
      """WITH h AS (SELECT event_type, epoch_ms(ts) // 3600000 AS hour FROM events),
        |d AS (SELECT event_type, hour // 24 AS day, hour FROM h)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT hour) AS BIGINT) AS hours_present,
        |       CAST(24 - COUNT(DISTINCT hour) AS BIGINT) AS hours_missing,
        |       CAST(CASE WHEN COUNT(DISTINCT hour) = 24 THEN 1 ELSE 0 END AS BIGINT)
        |         AS is_complete
        |FROM d GROUP BY 1, 2""".stripMargin,
    "link_block_quality" ->
      """WITH keyed AS (SELECT c_custkey AS id, c_name AS name,
        |                      substr(c_name, 1, 16) AS bk, length(c_name) AS bl
        |               FROM customer WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL),
        |blocks AS (SELECT bk, bl, CAST(COUNT(*) AS BIGINT) AS bn FROM keyed GROUP BY 1, 2),
        |st AS (SELECT CAST(SUM(bn) AS BIGINT) AS n_records,
        |              CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |              CAST(SUM(CASE WHEN bn > 10000 THEN 1 ELSE 0 END) AS BIGINT)
        |                AS blocks_over_cap,
        |              CAST(SUM(CASE WHEN bn <= 10000 THEN bn * (bn - 1) // 2 ELSE 0 END)
        |                   AS BIGINT) AS n_candidates
        |       FROM blocks),
        |ok AS (SELECT bk, bl FROM blocks WHERE bn <= 10000),
        |cands AS (SELECT x.name AS na, y.name AS nb
        |          FROM (SELECT k.* FROM keyed k JOIN ok USING (bk, bl)) x
        |          JOIN (SELECT k.* FROM keyed k JOIN ok USING (bk, bl)) y
        |            ON x.bk = y.bk AND x.bl = y.bl AND x.id < y.id),
        |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_matches
        |      FROM cands WHERE levenshtein(na, nb) <= 1)
        |SELECT st.n_records, st.n_blocks, st.blocks_over_cap, st.n_candidates, v.n_matches,
        |       CAST(st.n_records * (st.n_records - 1) // 2 AS BIGINT) AS n_total_pairs,
        |       1.0 - CAST(st.n_candidates AS DOUBLE)
        |           / CAST(st.n_records * (st.n_records - 1) // 2 AS DOUBLE) AS reduction_ratio,
        |       CAST(v.n_matches AS DOUBLE) / CAST(st.n_candidates AS DOUBLE) AS precision
        |FROM st, v""".stripMargin,
    "priv_dp_sum" ->
      s"""WITH g AS (SELECT event_type, user_id,
         |             SUM(CAST(LEAST(GREATEST(value, 0.0), 10.0) AS DECIMAL(18,6))) AS s_u,
         |             SUM(CAST(value AS DECIMAL(18,6))) AS raw_u
         |           FROM events GROUP BY 1, 2),
         |c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
         |             CAST(CAST(SUM(raw_u) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0
         |               AS raw_sum,
         |             CAST(CAST(SUM(LEAST(s_u, CAST(40.0 AS DECIMAL(18,6)))) * 1000000 AS BIGINT)
         |                  AS DOUBLE) / 1000000.0 AS clipped_sum
         |      FROM g GROUP BY 1),
         |h AS (SELECT *, substr(md5('dps:' || event_type), 1, 8) AS hx FROM c),
         |u AS (SELECT event_type, n_users, raw_sum, clipped_sum,
         |             (CAST(${md5Poly("hx")} AS DOUBLE) + 0.5) / 4294967296.0 AS u
         |      FROM h),
         |z AS (SELECT event_type, n_users, raw_sum, clipped_sum,
         |             CAST(((-80.0) * (CASE WHEN u - 0.5 > 0 THEN CAST(1 AS DOUBLE)
         |                                   WHEN u - 0.5 < 0 THEN CAST(-1 AS DOUBLE)
         |                                   ELSE CAST(0 AS DOUBLE) END))
         |                  * CAST(CAST(ln(1.0 - 2.0 * abs(u - 0.5)) AS DECIMAL(28,12)) AS DOUBLE)
         |                  AS DECIMAL(28,12)) AS noise_d
         |      FROM u)
         |SELECT event_type, n_users, raw_sum, clipped_sum,
         |       CAST(noise_d AS DOUBLE) AS noise,
         |       clipped_sum + CAST(noise_d AS DOUBLE) AS noisy_sum,
         |       CAST(0.5 AS DOUBLE) AS epsilon,
         |       CAST(40.0 AS DOUBLE) AS sensitivity
         |FROM z""".stripMargin,
    // NOT EXISTS, not NOT IN: the Spark side is a left ANTI join, which
    // counts a NULL child key as an orphan (it matches no parent). NOT IN
    // evaluates NULL NOT IN (...) to NULL and silently DROPS the row — and
    // one NULL parent key would make NOT IN return zero orphans overall.
    // TPC-H keys are non-null so both forms agree here, but the oracle must
    // encode the documented null-is-orphan contract, not rely on the data.
    "audit_referential" ->
      """SELECT 'orders->customer' AS relationship,
        |       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child,
        |       CAST(COUNT(*) AS BIGINT) AS n_orphan_rows,
        |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_orphan_keys
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'lineitem->orders',
        |       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
        |       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'lineitem->part',
        |       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
        |       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)""".stripMargin,
    "audit_contract" ->
      """SELECT 'documents.n_chars = length(text)' AS check,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CASE WHEN COALESCE(n_chars = length(text), FALSE) THEN 0 ELSE 1 END)
        |            AS BIGINT) AS n_violations
        |FROM documents
        |UNION ALL
        |SELECT 'documents.lang in domain', CAST(COUNT(*) AS BIGINT),
        |       CAST(SUM(CASE WHEN COALESCE(lang IN ('en','de','fr','es','it','pt','nl','ja','zh','ru'), FALSE)
        |                     THEN 0 ELSE 1 END) AS BIGINT)
        |FROM documents
        |UNION ALL
        |SELECT 'documents.text non-empty', CAST(COUNT(*) AS BIGINT),
        |       CAST(SUM(CASE WHEN COALESCE(length(text) > 0, FALSE) THEN 0 ELSE 1 END) AS BIGINT)
        |FROM documents
        |UNION ALL
        |SELECT 'events.value is finite', CAST(COUNT(*) AS BIGINT),
        |       CAST(SUM(CASE WHEN COALESCE(NOT isnan(value) AND value IS NOT NULL, FALSE)
        |                     THEN 0 ELSE 1 END) AS BIGINT)
        |FROM events
        |UNION ALL
        |SELECT 'events.user_id positive', CAST(COUNT(*) AS BIGINT),
        |       CAST(SUM(CASE WHEN COALESCE(user_id > 0, FALSE) THEN 0 ELSE 1 END) AS BIGINT)
        |FROM events""".stripMargin,
    "priv_kanon_sweep" -> Seq(250L, 500L, 1000L, 2000L).map { w =>
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         |       CAST(SUM(gn) AS BIGINT) AS n_rows,
         |       CAST(SUM(ar) AS BIGINT) AS groups_below_k,
         |       CAST(SUM(ar * gn) AS BIGINT) AS rows_below_k,
         |       CAST(MIN(gn) AS BIGINT) AS min_group,
         |       CAST(MAX(gn) AS BIGINT) AS max_group,
         |       CAST(5 AS BIGINT) AS k,
         |       CAST(SUM(ar * gn) AS DOUBLE) / CAST(SUM(gn) AS DOUBLE) AS pct_rows_at_risk,
         |       CAST($w AS BIGINT) AS bucket_width
         |FROM (SELECT CAST(COUNT(*) AS BIGINT) AS gn,
         |             CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS ar
         |      FROM (SELECT lang, source, n_chars // $w AS g FROM documents)
         |      GROUP BY lang, source, g)""".stripMargin
    }.mkString("", "\nUNION ALL\n", ""),
    // the oracle needs no banding: the lowest-agreeing-band emission makes
    // the Spark side's per-pair output identical to a plain overlap join
    "events_overlap_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL OR ts_ms - lag(ts_ms) OVER w > 21600000
        |                 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |sess AS (
        |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM m),
        |b AS (SELECT user_id, session_seq, MIN(ts_ms) AS l_start, MAX(ts_ms) + 1 AS l_end
        |      FROM sess GROUP BY 1, 2),
        |d AS (SELECT DISTINCT ts_ms // 86400000 AS day FROM e),
        |win AS (SELECT day, day * 86400000 + 21600000 AS r_start,
        |               day * 86400000 + 28800000 AS r_end FROM d),
        |p AS (SELECT win.day, b.user_id,
        |             LEAST(b.l_end, win.r_end) - GREATEST(b.l_start, win.r_start) AS overlap_ms
        |      FROM b JOIN win ON b.l_start < win.r_end AND win.r_start < b.l_end)
        |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(SUM(overlap_ms) AS BIGINT) AS sum_overlap_ms
        |FROM p GROUP BY 1""".stripMargin
  )
}
