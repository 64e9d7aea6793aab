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
    * SECURITY CONTRACT (applies to every dp* operator here): the noise is a
    * deterministic public function of (salt, group), so the DP guarantee
    * holds ONLY while the salt stays secret — anyone who learns it can
    * recompute the draw and subtract it. The salt is therefore a REQUIRED
    * caller argument (no default: a hard-coded salt is no salt), and it must
    * be high-entropy and treated like key material. Reusing a salt across
    * releases whose underlying data may differ is ALSO a leak even with the
    * salt secret: identical noise cancels in the difference, so
    * noisy_n(v2) - noisy_n(v1) reveals the exact count delta — use a fresh
    * salt per release epoch (each is a fresh draw and spends its own
    * epsilon). What seeding buys in exchange: regenerating the SAME release
    * (same salt, same data) is bit-identical — auditable and oracle-checkable.
    *
    * This frame is the AUDIT view: exact `n` rides beside the noise so the
    * release review can see the clipped/true mass. The artifact that leaves
    * the pipeline must be the [[releaseView]] projection, which carries only
    * the noisy values.
    *
    * u is never exactly 1/2 ((m+0.5)/2^32 is a non-dyadic odd multiple), so
    * sign is ±1 and the ln argument is strictly positive. */
  def dpCounts(df: DataFrame, groupCol: String, epsilon: Double,
               salt: String): DataFrame = {
    require(epsilon > 0, "epsilon > 0")
    require(salt.nonEmpty, "salt is key material: non-empty, caller-supplied")
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

  /** t-closeness per QI group: even an l-diverse group leaks if its
    * sensitive-value DISTRIBUTION diverges from the corpus-wide one (the
    * classic "all the rare disease cases are in this one zip code" shape).
    * Distance is total variation — the categorical EMD with unit ground
    * distance: tvd = 1/2 * sum_s |n_gs/n_g - n_s/n|.
    *
    * Exactness: the sum runs over the common denominator, so every term is
    * the exact integer |n_gs*n - n_s*n_g|; sensitive values ABSENT from the
    * group contribute n_s*n_g each, folded in closed form as
    * n*n_g - sum_present(n_s*n_g) (total sensitive mass is n). The flag
    * compares integers (10000*sum_abs vs 2*t_bp*n_g*n) — no double ever
    * decides; tvd itself is one pinned double division for the report.
    * Magnitudes: terms are <= n*n_g — keep n*max_group < 2^63/10000 (holds
    * to ~10^9-row tables; above that, lift the term sums to DECIMAL(38,0)).
    *
    * Scale shape: one (QI+sensitive) hash aggregate, an unordered
    * whole-partition window for n_g (no sort — frame is the full QI
    * partition), a broadcast join against the sensitive-domain marginals
    * (bounded by |domain|), and a final QI-keyed aggregate. */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 tBp: Int = 2000): DataFrame = {
    require(tBp > 0 && tBp < 10000, "t in basis points, (0, 10000)")
    import org.apache.spark.sql.expressions.Window
    val gs = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("n_gs"))
    val marginals = df.groupBy(col(sensitiveCol)).agg(count(lit(1)).as("n_s"))
    val total = df.agg(count(lit(1)).as("n"))
    val wg = Window.partitionBy(qiCols.map(col): _*)
    gs.withColumn("n_g", sum(col("n_gs")).over(wg))
      .join(broadcast(marginals), sensitiveCol)
      .crossJoin(broadcast(total))
      .groupBy((qiCols.map(col) :+ col("n_g") :+ col("n")): _*)
      .agg(
        sum(abs(col("n_gs") * col("n") - col("n_s") * col("n_g"))).as("abs_present"),
        sum(col("n_s") * col("n_g")).as("mass_present"))
      .select(
        (qiCols.map(col) :+
          col("n_g").as("group_n") :+
          (col("abs_present") + (col("n") * col("n_g") - col("mass_present")))
            .as("sum_abs") :+ col("n")): _*)
      .select(
        (qiCols.map(col) :+ col("group_n") :+
          (col("sum_abs").cast("double") /
            (lit(2.0) * col("group_n").cast("double") * col("n").cast("double")))
            .as("tvd") :+
          when(col("sum_abs") * lit(10000L) >
            lit(2L * tBp) * col("group_n") * col("n"), lit(1L)).otherwise(lit(0L))
            .as("above_t")): _*)
  }

  /** User-level DP SUM release: each row's value clips to [0, valueCap],
    * each user's per-group total clips to sumCap, so one user moves any
    * group sum by at most sumCap — the Laplace scale is sumCap/epsilon.
    * The raw (unclipped) sum rides beside the release so the audit sees
    * the clipped-away mass.
    *
    * Scale shape: two hash aggregates ((group, user) then group), no
    * windows. Determinism: clipping and summation run in DECIMAL(18,6)
    * (the first-level-sum house rule); the noise is [[dpCounts]]'s seeded
    * quantized draw scaled by sumCap/epsilon. */
  def dpClippedSum(df: DataFrame, groupCol: String, userCol: String,
                   valueCol: String, valueCap: Double, sumCap: Double,
                   epsilon: Double, salt: String): DataFrame = {
    require(valueCap > 0 && sumCap > 0, "caps > 0")
    require(epsilon > 0, "epsilon > 0")
    require(salt.nonEmpty, "salt is key material: non-empty, caller-supplied")
    val m = conv(substring(md5(concat(lit(salt + ":"), col(groupCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    val u = (m.cast("double") + lit(0.5)) / lit(4294967296.0)
    val centered = u - lit(0.5)
    val lnQ = log(lit(1.0) - lit(2.0) * abs(centered)).cast(DecimalType(28, 12))
    val noise = ((lit(-sumCap / epsilon) * signum(centered)) * lnQ.cast("double"))
      .cast(DecimalType(28, 12))
    val vq = least(greatest(col(valueCol), lit(0.0)), lit(valueCap))
      .cast(DecimalType(18, 6))
    val rawQ = col(valueCol).cast(DecimalType(18, 6))
    // decimal -> double via the exact unscaled integer + one pinned
    // division (see Profiling.dec6ToDouble for the engine-parity finding)
    import Profiling.dec6ToDouble
    df.groupBy(col(groupCol), col(userCol))
      .agg(sum(vq).as("s_u"), sum(rawQ).as("raw_u"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_users"),
        dec6ToDouble(sum(col("raw_u"))).as("raw_sum"),
        dec6ToDouble(sum(least(col("s_u"), lit(sumCap).cast(DecimalType(18, 6)))))
          .as("clipped_sum"))
      .select(col(groupCol), col("n_users"), col("raw_sum"), col("clipped_sum"),
        noise.cast("double").as("noise"),
        (col("clipped_sum") + noise.cast("double")).as("noisy_sum"))
      .withColumn("epsilon", lit(epsilon))
      .withColumn("sensitivity", lit(sumCap))
  }

  /** k-anonymity generalization sweep — the remediation step after
    * [[kAnonymityReport]] flags a release: coarsen the numeric quasi-
    * identifier through a ladder of bucket widths and report the residual
    * risk at each level, so the release picks the FINEST generalization
    * that clears k. One [[kAnonymityReport]] aggregate per level over the
    * same scan-pruned projection (levels are few; each is one bounded
    * shuffle).
    *
    * `baseCols` are the kept-as-is QI columns; `numCol` is generalized to
    * `numCol div width` per level. */
  def kAnonymitySweep(df: DataFrame, baseCols: Seq[String], numCol: String,
                      widths: Seq[Long], k: Int): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ >= 1), "widths >= 1")
    // cached: every width's report re-scanned the quasi-identifier frame —
    // one materialization serves the whole sweep. Cache OUR OWN narrow
    // projection (QI columns + numCol), never the caller's frame: caching
    // the argument df is a session-global side effect that leaves the
    // caller's plan pinned MEMORY_AND_DISK after the sweep returns, and it
    // can be arbitrarily wide
    val base = Frames.cached(df.select((baseCols :+ numCol).distinct.map(col): _*))
    widths.map { w =>
      kAnonymityReport(
        base.select((baseCols.map(col) :+ expr(s"$numCol div $w").as("_gen")): _*),
        baseCols :+ "_gen", k)
        .withColumn("bucket_width", lit(w))
    }.reduce(_ unionByName _)
  }

  /** User-level DP histogram with contribution clipping: each user counts
    * at most `cap` times per group (min(n_gu, cap) — a hash aggregate, NOT
    * a per-row window sort), so one user's presence changes any count by at
    * most `cap` and the Laplace scale is cap/epsilon. The raw count rides
    * beside the clipped one so the release audit can see how much mass the
    * clip removed. Noise construction is [[dpCounts]]'s seeded draw.
    *
    * Scale shape: two hash aggregates — (group, user) then group — both
    * map-side-combining; no windows, no joins. */
  def dpClippedCounts(df: DataFrame, groupCol: String, userCol: String,
                      cap: Int, epsilon: Double, salt: String): DataFrame = {
    require(cap >= 1, "cap >= 1")
    require(epsilon > 0, "epsilon > 0")
    require(salt.nonEmpty, "salt is key material: non-empty, caller-supplied")
    val m = conv(substring(md5(concat(lit(salt + ":"), col(groupCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    val u = (m.cast("double") + lit(0.5)) / lit(4294967296.0)
    val centered = u - lit(0.5)
    val lnQ = log(lit(1.0) - lit(2.0) * abs(centered)).cast(DecimalType(28, 12))
    val noise = ((lit(-cap.toDouble / epsilon) * signum(centered)) * lnQ.cast("double"))
      .cast(DecimalType(28, 12))
    df.groupBy(col(groupCol), col(userCol))
      .agg(count(lit(1)).as("n_gu"))
      .groupBy(col(groupCol))
      .agg(
        sum(col("n_gu")).as("n_raw"),
        sum(least(col("n_gu"), lit(cap.toLong))).as("n_clipped"))
      .select(col(groupCol), col("n_raw"), col("n_clipped"),
        noise.cast("double").as("noise"),
        (col("n_clipped").cast("double") + noise.cast("double")).as("noisy_n"))
      .withColumn("epsilon", lit(epsilon))
      .withColumn("sensitivity", lit(cap.toLong))
  }

  /** The exact-value/noise columns the dp* audit frames carry that a
    * release must DROP: true/raw/clipped aggregates and the noise draw
    * itself (noisy - noise = exact). */
  private val AuditOnlyColumns =
    Set("n", "n_raw", "n_clipped", "raw_sum", "clipped_sum", "n_users", "noise")

  /** The privacy parameters a release carries alongside the noisy values. */
  private val ParamColumns = Set("epsilon", "sensitivity")

  /** Release projection of a [[dpCounts]] / [[dpClippedCounts]] /
    * [[dpClippedSum]] audit frame: keeps ONLY the caller-declared group
    * column(s), the `noisy_*` aggregates, and the privacy parameters
    * (epsilon, sensitivity) — an ALLOWLIST, not a denylist. The known
    * exact-value/noise columns of the dp* frames are recognized and
    * dropped; any OTHER column (a caller-added count, a renamed aggregate)
    * fails loudly instead of silently flowing into the release artifact,
    * and a group column whose name collides with an audit-only column is
    * rejected rather than silently dropped. The audit frame with the exact
    * columns stays inside the trust boundary; this is the other half of the
    * salt contract documented on [[dpCounts]]. */
  def releaseView(dpFrame: DataFrame, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "declare the group column(s) to release")
    val collisions = groupCols.filter(c => AuditOnlyColumns(c) || ParamColumns(c))
    require(collisions.isEmpty,
      s"group column(s) ${collisions.mkString(", ")} collide with audit-only/" +
        "param names — rename the group column before releasing")
    val present = dpFrame.columns.toSet
    val missing = groupCols.filterNot(present)
    require(missing.isEmpty, s"group column(s) not in frame: ${missing.mkString(", ")}")
    val groupSet = groupCols.toSet
    val unrecognized = dpFrame.columns.filterNot(c =>
      groupSet(c) || AuditOnlyColumns(c) || ParamColumns(c) || c.startsWith("noisy_"))
    require(unrecognized.isEmpty,
      s"unrecognized column(s) in DP audit frame: ${unrecognized.mkString(", ")} — " +
        "refusing to release values the dp* operators did not produce")
    val keep = dpFrame.columns.filter(c =>
      groupSet(c) || ParamColumns(c) || c.startsWith("noisy_"))
    require(keep.exists(_.startsWith("noisy_")),
      "not a DP audit frame: no noisy_* column to release")
    dpFrame.select(keep.map(col).toIndexedSeq: _*)
  }

  /**
   * LEDGERED DP release — the cumulative-budget accounting the per-release
   * salt contract needs: each epoch's [[releaseView]] projection is
   * materialized to `releaseDir/epoch=<epoch>` and ONE ledger row
   * `(epoch, salt_hash, epsilon, n_rows, release_hash)` is appended to
   * `ledgerDir`, so spent epsilon is summable across epochs (sequential
   * composition: total privacy loss is the SUM of per-release epsilons) and
   * every artifact that ever left the pipeline is accounted for by hash.
   *
   * DOUBLE-SPEND REFUSAL: an epoch releases ONCE. Re-invoking with an
   * epoch already in the ledger throws instead of overwriting — a repeated
   * "same" release under a new salt would be a fresh draw (spending more
   * budget than the ledger shows), and under the SAME salt it is already
   * on disk. The ledger row stores md5(salt) — enough to audit that two
   * epochs did NOT reuse a salt (the differencing leak documented on
   * [[dpCounts]]) without persisting the key material itself.
   *
   * Determinism: the release content is the seeded dp* frame (bit-stable
   * by construction); `release_hash` is sha256 over the sorted JSON rows of
   * the written artifact; no wall-clock enters the ledger, so regenerating
   * a whole release history is bit-identical — and oracle-checkable.
   *
   * CRASH ATOMICITY (single-writer): the artifact is staged into
   * `releaseDir/epoch=<e>.tmp`, the ledger row is appended, and only then
   * is the stage swapped into `releaseDir/epoch=<e>`
   * ([[graft.sources.AtomicDir.swap]]). The two crash windows are both
   * recoverable and never leave spent budget off the books:
   *  - crash BEFORE the ledger append: an unledgered `.tmp` stage, no
   *    release — a retry restages (Overwrite) and nothing was spent;
   *  - crash AFTER the append but before the swap: a LEDGERED stage — the
   *    budget is on the books, and the next call for that epoch completes
   *    the swap instead of refusing (the release content is deterministic,
   *    so finishing the publication spends nothing new).
   * A ledger row whose artifact AND stage are both missing is a genuine
   * integrity failure and throws. Concurrent callers are NOT supported:
   * the epoch check is check-then-act by design (the ledger is an
   * append-only parquet directory, not a lock service) — serialize
   * releases through one writer.
   */
  def releaseWithLedger(dpFrame: DataFrame, groupCols: Seq[String], epoch: String,
      salt: String, releaseDir: String, ledgerDir: String): DataFrame = {
    require(epoch.nonEmpty, "epoch key required")
    require(salt.nonEmpty, "salt is key material: non-empty, caller-supplied")
    val spark = dpFrame.sparkSession
    val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = ledgerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new org.apache.hadoop.fs.Path(s"$releaseDir/epoch=$epoch")
    val tmp = new org.apache.hadoop.fs.Path(out.toString + ".tmp")
    val ledgerExists = fs.exists(ledgerPath)
    val priorSeq: Long =
      if (!ledgerExists) -1L
      else {
        val ledger = spark.read.parquet(ledgerDir)
        val prior = ledger.where(col("epoch") === epoch)
        if (!prior.isEmpty) {
          // already on the books. Published artifact -> double-spend refusal;
          // ledgered stage (the post-append crash window) -> finish the swap.
          if (fs.exists(out))
            throw new IllegalArgumentException(
              s"epoch '$epoch' already released — refusing to double-spend the budget " +
                "(re-read the existing artifact instead)")
          require(fs.exists(tmp),
            s"ledger has epoch '$epoch' but neither the release nor its stage exists — " +
              "the accounting and the artifacts have diverged; reconcile by hand")
          graft.sources.AtomicDir.swap(fs, tmp, out)
          return spark.read.parquet(out.toString)
        }
        val m = ledger.agg(max(col("seq"))).head
        if (m.isNullAt(0)) -1L else m.getLong(0)
      }
    // validate + compute the accounting BEFORE anything durable is written:
    // an empty dp frame (or a frame with no epsilon) must fail here, with
    // zero artifacts on disk, not between the release write and the append
    val view = releaseView(dpFrame, groupCols)
    val acct = view.agg(max(col("epsilon")).as("eps"), count(lit(1)).as("n")).head
    require(acct.getLong(1) > 0L, "refusing to release an empty DP frame")
    val eps = acct.getDouble(0)
    // stage (Overwrite: a pre-append crash leaves an orphan stage a retry
    // simply replaces), then append the ledger row, then publish
    view.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp.toString)
    val written = spark.read.parquet(tmp.toString)
    val n = written.count()
    val relHash = written
      .select(to_json(struct(written.columns.map(col).toIndexedSeq: _*)).as("j"))
      .agg(sha2(concat_ws("\n", sort_array(collect_list(col("j")))), 256).as("h"))
      .head.getString(0)
    import spark.implicits._
    Seq((epoch, md5str(salt), eps, n, relHash, priorSeq + 1L))
      .toDF("epoch", "salt_hash", "epsilon", "n_rows", "release_hash", "seq")
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(ledgerDir)
    graft.sources.AtomicDir.swap(fs, tmp, out)
    spark.read.parquet(out.toString)
  }

  /** Spent-budget audit over a [[releaseWithLedger]] ledger directory: one
    * row per release in RELEASE ORDER (the monotonic `seq` the writer
    * stamps, NOT lexicographic epoch order — epoch keys like 'e10' sort
    * before 'e2' as strings) with the running epsilon total — sequential
    * composition's cumulative privacy loss. The [[releaseView]] of budget
    * accounting: exact epsilon sums, salt-reuse visible via duplicate
    * salt_hash values. The unpartitioned window is bounded by the number
    * of releases ever made (one row each), never by data size. */
  def ledgerReport(ledger: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("seq")).rowsBetween(Long.MinValue, 0)
    ledger
      .select(col("epoch"), col("salt_hash"), col("epsilon"), col("n_rows"), col("seq"))
      .withColumn("spent_cum", sum(col("epsilon")).over(w))
      .select("epoch", "salt_hash", "epsilon", "n_rows", "spent_cum")
  }

  private def md5str(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }
}
