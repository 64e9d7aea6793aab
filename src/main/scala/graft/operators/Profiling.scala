package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/**
 * ONE-PASS column profiler — the schema-drift / data-quality audit a
 * pipeline runs on every new source or crawl drop before trusting it:
 * per column, row/null/distinct counts, numeric min/max, string min/max
 * and mean length. "A feed whose `lang` distinct-count doubled or whose
 * `text` mean length halved changed upstream" is the cheapest regression
 * tell there is, and at 100 TB it must come from a single scan, not a
 * per-column loop of jobs.
 *
 * Scale design: ALL statistics for ALL columns fold in ONE aggregate over
 * one scan of the frame (the per-column stats ride as parallel aggregate
 * expressions; Catalyst plans the multi-distinct via Expand — one shuffle,
 * k-way row expansion, still a single pass over storage). The wide 1-row
 * result is then exploded to the per-column layout driver-side — k structs,
 * nothing data-sized.
 *
 * Determinism: counts are exact integers; min/max are order-independent;
 * `avg_len` is the one division, pinned as exact-LONG sum / exact-LONG
 * count. Numeric min/max surface as DOUBLE (int64→double is IEEE
 * round-to-nearest in every engine); strings compare in binary collation
 * (Spark UTF8String == DuckDB default).
 *
 * @return one row per profiled column:
 *         (column, n_rows, n_null, n_distinct, min_num, max_num,
 *          min_str, max_str, avg_len).
 */
object Profiling {

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val nullStr = lit(null).cast("string")
    val nullDbl = lit(null).cast("double")
    val aggs = cols.flatMap { c =>
      val dt = df.schema(c).dataType
      val isNum = dt.isInstanceOf[NumericType]
      val isStr = dt == StringType
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__n_null"),
        countDistinct(col(c)).as(s"${c}__n_distinct"),
        (if (isNum) min(col(c)).cast("double") else min(nullDbl)).as(s"${c}__min_num"),
        (if (isNum) max(col(c)).cast("double") else max(nullDbl)).as(s"${c}__max_num"),
        (if (isStr) min(col(c)) else min(nullStr)).as(s"${c}__min_str"),
        (if (isStr) max(col(c)) else max(nullStr)).as(s"${c}__max_str"),
        (if (isStr)
          sum(length(col(c))).cast("double") / count(col(c)).cast("double")
        else max(nullDbl)).as(s"${c}__avg_len"))
    }
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    val wide = df.agg(allAggs.head, allAggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("column"), col("n_rows"),
        coalesce(col(s"${c}__n_null"), lit(0L)).as("n_null"),
        col(s"${c}__n_distinct").as("n_distinct"),
        col(s"${c}__min_num").as("min_num"), col(s"${c}__max_num").as("max_num"),
        col(s"${c}__min_str").as("min_str"), col(s"${c}__max_str").as("max_str"),
        col(s"${c}__avg_len").as("avg_len"))
    }
    wide.select(explode(array(structs: _*)).as("p")).select(col("p.*"))
  }

  /** The 100 TB-scale variant of [[columnProfile]]: identical layout, but
    * distinct counts come from `approx_count_distinct` (HyperLogLog++, one
    * mergeable sketch per column) instead of exact `countDistinct` — so the
    * single-scan aggregate plans WITHOUT the Expand node that multiplies
    * every scanned row k-fold before the shuffle. The profiler is the one
    * job that must touch the whole corpus; at k profiled columns the exact
    * form shuffles k x corpus rows, the approx form shuffles one fixed-size
    * sketch set per partition. Keep [[columnProfile]] as the audit tier
    * (exact answers, bounded inputs); run this one on the raw drop.
    *
    * `n_distinct` is approximate (rsd ~ relativeSD, default 1.5%); every
    * other statistic is the exact same expression as the exact profiler. */
  def columnProfileApprox(df: DataFrame, cols: Seq[String],
                          relativeSD: Double = 0.015): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val nullStr = lit(null).cast("string")
    val nullDbl = lit(null).cast("double")
    val aggs = cols.flatMap { c =>
      val dt = df.schema(c).dataType
      val isNum = dt.isInstanceOf[NumericType]
      val isStr = dt == StringType
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__n_null"),
        approx_count_distinct(col(c), relativeSD).as(s"${c}__n_distinct"),
        (if (isNum) min(col(c)).cast("double") else min(nullDbl)).as(s"${c}__min_num"),
        (if (isNum) max(col(c)).cast("double") else max(nullDbl)).as(s"${c}__max_num"),
        (if (isStr) min(col(c)) else min(nullStr)).as(s"${c}__min_str"),
        (if (isStr) max(col(c)) else max(nullStr)).as(s"${c}__max_str"),
        (if (isStr)
          sum(length(col(c))).cast("double") / count(col(c)).cast("double")
        else max(nullDbl)).as(s"${c}__avg_len"))
    }
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    val wide = df.agg(allAggs.head, allAggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("column"), col("n_rows"),
        coalesce(col(s"${c}__n_null"), lit(0L)).as("n_null"),
        col(s"${c}__n_distinct").as("n_distinct"),
        col(s"${c}__min_num").as("min_num"), col(s"${c}__max_num").as("max_num"),
        col(s"${c}__min_str").as("min_str"), col(s"${c}__max_str").as("max_str"),
        col(s"${c}__avg_len").as("avg_len"))
    }
    wide.select(explode(array(structs: _*)).as("p")).select(col("p.*"))
  }

  /** Scale-6 decimal -> double via the EXACT unscaled integer and one
    * pinned division — a direct decimal->double cast lands one ulp off
    * between engines at report magnitudes (the [[Privacy.dpClippedSum]]
    * finding: DuckDB effectively multiplies by 1e-6 where the JVM's
    * BigDecimal.doubleValue divides by 1e6). Callers keep the scaled sum
    * below 2^53. */
  private[operators] def dec6ToDouble(c: org.apache.spark.sql.Column)
    : org.apache.spark.sql.Column =
    (c * lit(1000000L)).cast("long").cast("double") / lit(1000000.0)

  /** Benford's-law first-digit expectations log10(1 + 1/d), d = 1..9 —
    * shared verbatim (via [[benfordExpectedLits]]) with the DuckDB oracle
    * so both engines parse the identical double literals. */
  val benfordExpected: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** The literals as shortest-round-trip strings (Double.toString) — both
    * Spark and DuckDB parse these back to the exact same doubles. */
  def benfordExpectedLits: Seq[(Int, String)] =
    benfordExpected.map { case (d, p) => d -> p.toString }

  /** Benford's-law first-significant-digit audit — the numeric-forensics
    * screen for synthetic or tampered value columns (fabricated metrics
    * rarely follow the log-uniform digit law that organic growth data
    * does). Emits, per observed digit: the count, observed frequency,
    * Benford expectation, and the chi-square contribution; the audit
    * verdict is the chi2 sum, kept per-digit here so the report shows
    * WHICH digits deviate.
    *
    * Scale shape: one scan → 9-group hash aggregate → 1-row total joined
    * back by broadcast. Nothing data-sized past the first fold.
    *
    * Determinism: the digit comes from floor(value·10⁶) printed as an
    * integer string (exact in both engines; the IEEE multiply is identical
    * even when inexact), counts are exact, and the only doubles are the
    * final pinned expressions — shared literal expectations, one division,
    * one (d·d)/e chain. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val n6 = floor(col(valueCol) * lit(1000000.0)).cast("long")
    val digit = substring(n6.cast("string"), 1, 1).cast("long")
    val counts = df
      .where(col(valueCol) > lit(0.0))
      .select(n6.as("n6"), digit.as("digit"))
      .where(col("n6") >= lit(1L))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val total = counts.agg(sum(col("n_obs")).as("n_total"))
    val pExp = benfordExpected.tail.foldLeft(
      when(col("digit") === lit(benfordExpected.head._1.toLong), lit(benfordExpected.head._2))) {
      case (acc, (d, p)) => acc.when(col("digit") === lit(d.toLong), lit(p))
    }
    counts.crossJoin(broadcast(total))
      .withColumn("p_exp", pExp)
      .withColumn("p_obs", col("n_obs").cast("double") / col("n_total").cast("double"))
      .withColumn("e", col("n_total").cast("double") * col("p_exp"))
      .withColumn("d", col("n_obs").cast("double") - col("e"))
      .select(col("digit"), col("n_obs"), col("n_total"), col("p_obs"), col("p_exp"),
        ((col("d") * col("d")) / col("e")).as("chi2_term"))
  }

  /** Robust per-group means: plain, winsorized (values clamped to the
    * nearest-rank p05/p95), and 5%-trimmed (boundary ranks dropped) — the
    * outlier-resistant aggregate report for a value column whose tails are
    * suspect. Winsorizing keeps n constant under clamping; trimming drops
    * exactly `lo` rows per side with lo = ⌊n·5/100⌋ in exact integers.
    *
    * Scale shape: ONE window sort per group (rank + per-group count ride
    * the same partition sort — the [[Anomaly]] MAD trade, documented there:
    * rank-picked statistics cost a sort where moment statistics fold), then
    * a single group-keyed aggregate; bounds come from the same ranked rows,
    * so no second scan and no join back.
    *
    * Determinism: rank ties break by the caller's `tieCol`; boundary-value
    * selection is tie-proof anyway (equal values at the cut give the same
    * clamp/trim sums either way); all three sums are exact DECIMAL(18,6)
    * folds with one pinned double division each. */
  def robustMeans(df: DataFrame, groupCol: String, valueCol: String,
                  tieCol: String, trimPct: Int = 5): DataFrame = {
    require(trimPct >= 1 && trimPct <= 25, "trimPct in [1,25]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(tieCol))
    val wAll = Window.partitionBy(col(groupCol))
    val dec = col(valueCol).cast("decimal(18,6)")
    val ranked = df
      .select(col(groupCol), col(valueCol), col(tieCol))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("lo", expr(s"(n * $trimPct) div 100"))
    val bounds = ranked
      .groupBy(col(groupCol))
      .agg(
        max(when(col("rn") === col("lo") + lit(1L), col(valueCol))).as("p_lo"),
        max(when(col("rn") === col("n") - col("lo"), col(valueCol))).as("p_hi"))
    ranked.join(bounds, groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        max(col("lo")).as("n_trimmed_per_side"),
        max(col("p_lo")).as("p_lo"),
        max(col("p_hi")).as("p_hi"),
        sum(dec).as("sum_all"),
        sum(least(greatest(col(valueCol), col("p_lo")), col("p_hi")).cast("decimal(18,6)"))
          .as("sum_winsor"),
        sum(when(col("rn") > col("lo") && col("rn") <= col("n") - col("lo"), dec))
          .as("sum_trim"),
        sum(when(col("rn") > col("lo") && col("rn") <= col("n") - col("lo"), lit(1L))
          .otherwise(lit(0L))).as("n_trim"))
      .select(col(groupCol), col("n"), col("n_trimmed_per_side"), col("p_lo"), col("p_hi"),
        (dec6ToDouble(col("sum_all")) / col("n").cast("double")).as("mean"),
        (dec6ToDouble(col("sum_winsor")) / col("n").cast("double")).as("winsor_mean"),
        (dec6ToDouble(col("sum_trim")) / col("n_trim").cast("double")).as("trimmed_mean"))
  }

  /** Join-key skew profile: the pre-flight audit for any key you are about
    * to shuffle 100 TB on. One row: row/key totals, the max and nearest-
    * rank p50/p99 per-key row counts, the heaviest key's share, and the
    * hash-shard balance (max shard rows over 32 md5 shards vs the even
    * split) — max_shard/avg near 1.0 means the shuffle balances; a heavy
    * head key shows up as both top1_share and shard skew and says "salt
    * this join".
    *
    * Scale shape: per-key counts are one hash aggregate; the percentile
    * picks come from the COUNT-OF-COUNTS frame (bounded by distinct count
    * values, typically a few hundred) with a cumulative window over that
    * tiny frame — never a global rank over the key frame itself. The shard
    * fold is a 32-row aggregate. All counts exact; the three ratios are
    * pinned double divisions.
    *
    * Determinism: nearest-rank = smallest count c with cum_keys(<= c) >=
    * ceil(p * n_keys), computed in exact integers. */
  def joinSkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCounts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    // md5-shard totals: the house engine-portable hash (NOT Spark's
    // internal hash, so the oracle can replicate shard assignment)
    val shard = pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(32L))
    val shardStats = df.select(shard.as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("sn"))
      .agg(max(col("sn")).as("max_shard"), min(col("sn")).as("min_shard"))
    val totals = keyCounts.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_key_rows"))
    // count-of-counts cumulative: bounded frame, explicit total order
    val coc = keyCounts.groupBy(col("cnt")).agg(count(lit(1)).as("m"))
    val wc = Window.orderBy(col("cnt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = coc.withColumn("cum", sum(col("m")).over(wc))
    def rankPick(pNum: Long, pDen: Long): org.apache.spark.sql.Column =
      min(when(col("cum") * lit(pDen) >= col("n_keys") * lit(pNum), col("cnt")))
    val picks = cum.crossJoin(broadcast(totals.select(col("n_keys"))))
      .agg(rankPick(1, 2).as("p50_key_rows"), rankPick(99, 100).as("p99_key_rows"))
    totals.crossJoin(broadcast(picks)).crossJoin(broadcast(shardStats))
      .withColumn("top1_share",
        col("max_key_rows").cast("double") / col("n_rows").cast("double"))
      .withColumn("shard_skew",
        (col("max_shard") * lit(32L)).cast("double") / col("n_rows").cast("double"))
  }

  /** Referential-integrity audit: child-key rows with no parent — the
    * orphan count every warehouse load gate checks. ONE left anti join per
    * relationship (null child keys are orphans by contract — they reference
    * nothing). Emits one row: child rows, orphan rows, distinct orphan
    * keys. */
  def referentialAudit(child: DataFrame, parent: DataFrame, childKey: String,
                       parentKey: String, relationship: String): DataFrame = {
    // one child pass: mark matches with a LEFT join against the distinct
    // parent keys and fold total + orphan counts in one aggregate — the
    // anti-join + separate total scanned the child (the fact table) twice.
    // Exact equivalence: anti-join rows == left-join rows with no match
    // (NULL child keys match nothing either way), and countDistinct skips
    // the NULL the when() emits for matched rows.
    val marked = child.select(col(childKey).as("_k"))
      .join(parent.select(col(parentKey).as("_k"), lit(1).as("_m")).distinct(),
        Seq("_k"), "left")
    marked.agg(count(lit(1)).as("n_child"),
        sum(when(col("_m").isNull, 1L).otherwise(0L)).as("n_orphan_rows"),
        countDistinct(when(col("_m").isNull, col("_k"))).as("n_orphan_keys"))
      .select(lit(relationship).as("relationship"), col("n_child"),
        col("n_orphan_rows"), col("n_orphan_keys"))
  }

  /** Data-contract check: rows violating a boolean constraint, as one
    * (check, n_rows, n_violations) row — compose several with unionByName
    * for the load-gate report. The predicate must be NULL-safe (a NULL
    * verdict counts as a violation: contracts are obligations, not
    * three-valued logic). */
  def contractCheck(df: DataFrame, checkName: String,
                    holds: org.apache.spark.sql.Column): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        sum(when(coalesce(holds, lit(false)), lit(0L)).otherwise(lit(1L)))
          .as("n_violations"))
      .select(lit(checkName).as("check"), col("n_rows"), col("n_violations"))

  /** Hour-level completeness audit: per (type, day), how many of the 24
    * hour slots carry data — the "did ingestion gap?" readout a store
    * maintenance pass reads before trusting daily aggregates. Boundary
    * days of the corpus are naturally partial; interpretation is the
    * caller's (the frame reports, it does not judge). One hash aggregate
    * (exact distinct over a 24-value domain). */
  def completeness(df: DataFrame, typeCol: String, tsMsCol: String): DataFrame =
    df.select(col(typeCol), expr(s"$tsMsCol div 3600000").as("hour"))
      .withColumn("day", expr("hour div 24"))
      .groupBy(col(typeCol), col("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("hour")).as("hours_present"))
      .withColumn("hours_missing", lit(24L) - col("hours_present"))
      .withColumn("is_complete",
        when(col("hours_present") === 24L, lit(1L)).otherwise(lit(0L)))

  /** Streaming twin of [[completeness]]: per type, the OPEN day's 24-hour
    * coverage bitmask + event count carried in `flatMapGroupsWithState`;
    * a row for a later day closes the open day and emits its report
    * (append mode never retracts, so the open day stays in state — the
    * spec-pinned equivalence is batch-minus-last-open-day). State is one
    * (long, int, long) per type. In-batch disorder sorts locally;
    * ACROSS batches each type's days must be non-decreasing (the
    * watermark-ordered ingestion contract, as in [[Cdc.scd2Stream]]) —
    * a day regression throws rather than silently merging history. */
  def completenessStream(df: DataFrame, typeCol: String, tsMsCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(typeCol).cast("string"), col(tsMsCol).cast("long"))
      .as[(String, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[(Long, Int, Long)]) =>
          val batch = rows.map(_._2).toVector.sorted
          var open = state.getOption
          val closed = Vector.newBuilder[(String, Long, Long, Long, Long, Long)]
          def report(day: Long, mask: Int, n: Long) = {
            val present = Integer.bitCount(mask).toLong
            (key, day, n, present, 24L - present, if (present == 24L) 1L else 0L)
          }
          batch.foreach { ts =>
            val hour = Math.floorDiv(ts, 3600000L)
            val day = Math.floorDiv(hour, 24L)
            val bit = 1 << Math.floorMod(hour, 24L).toInt
            open match {
              case Some((d, mask, n)) if day == d => open = Some((d, mask | bit, n + 1))
              case Some((d, mask, n)) if day > d =>
                closed += report(d, mask, n)
                open = Some((day, bit, 1L))
              case Some((d, _, _)) =>
                throw new IllegalStateException(
                  s"day regression for $key: $day after $d (cross-batch order contract)")
              case None => open = Some((day, bit, 1L))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
      .toDF(typeCol, "day", "n_events", "hours_present", "hours_missing", "is_complete")
  }

  /** Streaming arm of the join-skew pre-flight ([[joinSkewProfile]] is the
    * batch report): per-key RUNNING counts in `flatMapGroupsWithState`, one
    * LONG per key, emitting a row the moment a key CROSSES `threshold` —
    * the "salt this join" alarm raised while the data is still arriving,
    * instead of after a 100 TB shuffle has already skewed. Append-safe by
    * construction (a key crosses once; state never retracts); keys that
    * stay light cost one long of state and emit nothing.
    *
    * Spec-pinned equivalence: one-batch-stream == the batch per-key counts
    * restricted to keys with count >= threshold (n_at_cross = the running
    * count at the crossing batch, >= threshold and <= the key's total).
    *
    * Keys are stated by their STRING rendering (the emitted key column is
    * string), so the operator accepts any key type — matching its batch
    * twin [[joinSkewProfile]], which groups raw columns — and a NULL key
    * gets its own state slot (Option-keyed) instead of tripping a numeric
    * encoder with an opaque NPE. */
  def heavyKeysStream(df: DataFrame, keyCol: String, threshold: Long): DataFrame = {
    require(threshold >= 1, "threshold >= 1")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(keyCol).cast("string")).as[String]
    ds.groupByKey(Option(_))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Option[String], rows: Iterator[String], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val now = prev + rows.size
          state.update(now)
          if (prev < threshold && now >= threshold)
            Iterator.single((key.orNull, now, threshold))
          else Iterator.empty
      }
      .toDF(keyCol, "n_at_cross", "threshold")
  }

  /** Second-digit Benford expectations P(d) = sum_{d1=1..9} log10(1 +
    * 1/(10*d1 + d)), d = 0..9 — the harder-to-fake law (fabricators who
    * know the first-digit law rarely match the second). Shared with the
    * oracle as Double.toString literals, like [[benfordExpectedLits]]. */
  val benford2Expected: Seq[(Int, Double)] =
    (0 to 9).map(d => d -> (1 to 9).map(d1 => math.log10(1.0 + 1.0 / (10 * d1 + d))).sum)

  def benford2ExpectedLits: Seq[(Int, String)] =
    benford2Expected.map { case (d, p) => d -> p.toString }

  /** Second-significant-digit audit — same scale shape as [[benford]]
    * (one scan, 10-group aggregate, broadcast total); rows with fewer than
    * two significant digits (n6 < 10) are excluded. */
  def benford2(df: DataFrame, valueCol: String): DataFrame = {
    val n6 = floor(col(valueCol) * lit(1000000.0)).cast("long")
    // digit extraction must be GUARDED, not merely filtered: ANSI mode
    // makes CAST('' AS BIGINT) throw, and expression evaluation order vs
    // the n6 >= 10 filter is the optimizer's choice, not ours
    val digit = when(col("n6") >= lit(10L),
      substring(col("n6").cast("string"), 2, 1).cast("long"))
    val counts = df
      .where(col(valueCol) > lit(0.0))
      .select(n6.as("n6"))
      .where(col("n6") >= lit(10L))
      .withColumn("digit", digit)
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val total = counts.agg(sum(col("n_obs")).as("n_total"))
    val pExp = benford2Expected.tail.foldLeft(
      when(col("digit") === lit(benford2Expected.head._1.toLong), lit(benford2Expected.head._2))) {
      case (acc, (d, p)) => acc.when(col("digit") === lit(d.toLong), lit(p))
    }
    counts.crossJoin(broadcast(total))
      .withColumn("p_exp", pExp)
      .withColumn("p_obs", col("n_obs").cast("double") / col("n_total").cast("double"))
      .withColumn("e", col("n_total").cast("double") * col("p_exp"))
      .withColumn("d", col("n_obs").cast("double") - col("e"))
      .select(col("digit"), col("n_obs"), col("n_total"), col("p_obs"), col("p_exp"),
        ((col("d") * col("d")) / col("e")).as("chi2_term"))
  }
}
