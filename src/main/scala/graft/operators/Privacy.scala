package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Privacy audits for a training-data pipeline: k-anonymity / l-diversity
 * over quasi-identifier columns, and differentially-private release counts
 * with a deterministic (seeded) Laplace mechanism.
 *
 * Why this belongs in the engine: before a corpus (or its per-slice stats)
 * leaves the pipeline, the release surface needs (1) a re-identification
 * audit — how many rows sit in quasi-identifier groups smaller than k —
 * and (2) noisy aggregate publication whose noise is reproducible across
 * reruns of the same release (seeded, not sampled: a release artifact must
 * hash-identically when regenerated, which is also exactly what makes it
 * oracle-checkable here).
 *
 * Scale shape (100 TB): every operator is ONE hash aggregate on the
 * quasi-identifier (or group) key — map-side partials collapse each
 * partition to at most |distinct QI| rows, so the shuffle is bounded by
 * group cardinality, never corpus size. No windows, no joins, no collects.
 *
 * Determinism: group sizes are exact integers; the only transcendental is
 * the Laplace inverse-CDF `ln`, quantized to DECIMAL(28,12) before the
 * scale multiply (the BM25 idiom); the uniform comes from 32 md5 bits
 * ((m + 0.5)/2^32, exact power-of-two arithmetic in both engines), same
 * construction as [[Curation.weightedSample]].
 */
object Privacy {

  /** Per-QI-group size frame: one aggregate, one shuffle on the QI key.
    * `at_risk` marks groups smaller than k (the re-identification surface). */
  def kAnonymityGroups(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, "k >= 2")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk",
        when(col("group_n") < lit(k.toLong), lit(1L)).otherwise(lit(0L)))
  }

  /** One-row k-anonymity report: group/row counts, how much of the corpus
    * sits below k, and the extreme group sizes. The pct is one pinned
    * double division over exact longs. */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame =
    kAnonymityGroups(df, qiCols, k)
      .agg(
        count(lit(1)).as("n_groups"),
        sum(col("group_n")).as("n_rows"),
        sum(col("at_risk")).as("groups_below_k"),
        sum(col("at_risk") * col("group_n")).as("rows_below_k"),
        min(col("group_n")).as("min_group"),
        max(col("group_n")).as("max_group"))
      .withColumn("k", lit(k.toLong))
      .withColumn("pct_rows_at_risk",
        col("rows_below_k").cast("double") / col("n_rows").cast("double"))

  /** l-diversity per QI group: a group can be k-anonymous yet still leak if
    * every row in it shares one sensitive value — `distinct_sensitive`
    * counts the sensitive attribute's support per group, `below_l` flags
    * the leaky ones. Exact distinct (the groups are QI-bounded; for
    * unbounded domains the [[Sketches]] HLL form is the scale path). */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 l: Int): DataFrame = {
    require(l >= 2, "l >= 2")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .withColumn("below_l",
        when(col("distinct_sensitive") < lit(l.toLong), lit(1L)).otherwise(lit(0L)))
  }

  /** Differentially-private group counts (pure epsilon-DP, sensitivity 1):
    * exact count per group plus Laplace(1/epsilon) noise from a SEEDED
    * inverse-CDF draw — u from 32 md5 bits of `salt:group`, then
    * x = -(1/eps) * sign(u - 1/2) * ln(1 - 2|u - 1/2|).
    *
    * Seeding trades the usual fresh-randomness guarantee for release
    * reproducibility: the noise is a fixed function of (salt, group), so
    * REUSING a salt across releases of the same group spends no additional
    * budget (same draw), while a new salt is a new draw. u is never exactly
    * 1/2 ((m+0.5)/2^32 is a non-dyadic odd multiple), so sign is ±1 and the
    * ln argument is strictly positive. */
  def dpCounts(df: DataFrame, groupCol: String, epsilon: Double,
               salt: String = "dp"): DataFrame = {
    require(epsilon > 0, "epsilon > 0")
    val m = conv(substring(md5(concat(lit(salt + ":"), col(groupCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    val u = (m.cast("double") + lit(0.5)) / lit(4294967296.0)
    val centered = u - lit(0.5)
    // quantize the one libm call, then one pinned multiply chain
    val lnQ = log(lit(1.0) - lit(2.0) * abs(centered)).cast(DecimalType(28, 12))
    val noise = ((lit(-1.0 / epsilon) * signum(centered)) * lnQ.cast("double"))
      .cast(DecimalType(28, 12))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("n"),
        noise.cast("double").as("noise"),
        (col("n").cast("double") + noise.cast("double")).as("noisy_n"))
      .withColumn("epsilon", lit(epsilon))
  }
}
