package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Points, Privacy, Profiling}

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
      Privacy.dpCounts(events(s, dir), "event_type", epsilon = 0.5)),
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
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
          grouping(col("event_type")).cast("long").as("g_type"),
          grouping(col("day")).cast("long").as("g_day"))
    }),
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
        sliceCols = Seq("source")))
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
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean,
        |  CAST(SUM(CAST(LEAST(GREATEST(value, p_lo), p_hi) AS DECIMAL(18,6))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS winsor_mean,
        |  CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN rn > lo AND rn <= n - lo THEN 1 ELSE 0 END) AS DOUBLE) AS trimmed_mean
        |FROM a GROUP BY 1""".stripMargin,
    "events_rollup" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day, value FROM events)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |       CAST(GROUPING(event_type) AS BIGINT) AS g_type,
        |       CAST(GROUPING(day) AS BIGINT) AS g_day
        |FROM e GROUP BY ROLLUP(event_type, day)""".stripMargin,
    "cdc_row_status" ->
      s"""$CdcDiffSql
         |SELECT doc_id, source, status FROM j""".stripMargin,
    "cdc_snapshot_diff" ->
      s"""$CdcDiffSql
         |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n
         |FROM j GROUP BY 1, 2""".stripMargin
  )
}
