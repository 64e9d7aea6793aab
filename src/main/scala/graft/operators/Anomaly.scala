package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic z-score outlier detection over an event stream — the
 * data-quality screen a pipeline runs before trusting a source's numeric
 * field (a sensor gone wild, a price column suddenly in cents): per group,
 * mean and standard deviation of the value, then every row more than
 * `threshold` deviations out is flagged with its z-score.
 *
 * Determinism design (the reason this is NOT a plain `stddev_samp`): Spark's
 * stddev aggregates doubles in partition order, so the flag set could differ
 * between runs. Here the two first-level sums (Σx, Σx²) are EXACT DECIMALs —
 * order-independent — cast to double once; everything after is fixed-order
 * double arithmetic (`mean = s/n`, `dev = sqrt((ex2 - mean·mean)·n/(n-1))`,
 * the textbook sample-variance identity), shared verbatim with the SQL
 * oracle. Same flags at any parallelism, in any engine.
 *
 * Scale-of-the-scale: values quantize at DECIMAL(18,3) — squares carry
 * scale 6 — so the UNSCALED Σx² stays below 2^53 for group sums up to ~9e9
 * (the engine-parity bound: DuckDB's decimal→double cast goes through the
 * unscaled integer and double-rounds past 2^53, measured as a 1-ulp `dev`
 * drift at scale 12). Inputs are expected at millesimal-or-coarser
 * granularity (telemetry/price-like fields); finer inputs quantize.
 *
 * Scale: one map-side-combined aggregate over the corpus (groups are few),
 * then the tiny stats frame broadcast back against the scan — no window, no
 * second corpus shuffle.
 */
object Anomaly {

  def zscoreOutliers(events: DataFrame, keyCol: String = "event_type",
      valueCol: String = "value", idCol: String = "event_id",
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val dec = col(valueCol).cast("decimal(18,3)")
    val stats = events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(dec).cast("double").as("s"),
        sum(dec * dec).cast("double").as("ss"))
      .where(col("n") >= 2)
      .select(col(keyCol),
        (col("s") / col("n")).as("mean"),
        (col("ss") / col("n")).as("ex2"), col("n"))
    val devd = stats.select(col(keyCol), col("mean"),
      sqrt((col("ex2") - col("mean") * col("mean")) * col("n") / (col("n") - 1)).as("dev"))
    events.join(broadcast(devd), Seq(keyCol))
      .where(col("dev") > 0 &&
        abs(col(valueCol) - col("mean")) > lit(threshold) * col("dev"))
      .select(col(idCol), col(keyCol), col(valueCol), col("mean"), col("dev"),
        ((col(valueCol) - col("mean")) / col("dev")).as("z"))
  }

  /**
   * Streaming z-score flags — [[zscoreOutliers]] for an unbounded stream:
   * per key, running moments carried in `flatMapGroupsWithState`, each
   * micro-batch's rows flagged against the totals INCLUDING the batch (so a
   * one-batch stream reproduces the batch operator's flags exactly — the
   * equivalence the spec pins).
   *
   * State is three LONGs per key: n, Σ(value quantized at decimal scale 3),
   * Σ(square at scale 6) — the identical quantization the batch operator's
   * DECIMAL(18,3) cast applies (BigDecimal.valueOf = the same
   * Double.toString route Spark's cast uses, HALF_UP at scale 3), summed in
   * order-independent integer arithmetic. The 2^53 engine-parity bound on
   * the scaled sums is the batch operator's documented contract; past it the
   * state update throws rather than silently drifting. Mean/dev re-derive
   * from the totals with the batch expression order, so z-scores are
   * bit-identical to the batch path.
   *
   * Scale: state is O(#keys) x 24 bytes; each micro-batch shuffles once on
   * the key. Works in streaming (append mode) and on a batch frame (state
   * starts empty — the spec's equivalence harness).
   */
  def zscoreStreamFlags(events: DataFrame, keyCol: String = "event_type",
      valueCol: String = "value", idCol: String = "event_id",
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .select(col(idCol).cast("long"), col(keyCol).cast("string"),
        col(valueCol).cast("double"))
      .as[(Long, String, Double)]
    ds.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String, Double)],
         state: GroupState[(Long, Long, Long)]) =>
          val batch = rows.toVector
          var (n, s3, ss6) = state.getOption.getOrElse((0L, 0L, 0L))
          batch.foreach { case (_, _, v) =>
            val q = java.math.BigDecimal.valueOf(v)
              .setScale(3, java.math.RoundingMode.HALF_UP)
              .unscaledValue().longValueExact()
            n += 1
            s3 = math.addExact(s3, q)
            ss6 = math.addExact(ss6, math.multiplyExact(q, q))
          }
          state.update((n, s3, ss6))
          if (n < 2) Iterator.empty
          else {
            val s = s3.toDouble / 1000.0
            val ex2 = (ss6.toDouble / 1000000.0) / n
            val mean = s / n
            val dev = math.sqrt((ex2 - mean * mean) * n / (n - 1))
            if (!(dev > 0)) Iterator.empty
            else batch.iterator
              .filter { case (_, _, v) => math.abs(v - mean) > threshold * dev }
              .map { case (id, k, v) => (id, k, v, mean, dev, (v - mean) / dev, n) }
          }
      }
      .toDF(idCol, keyCol, valueCol, "mean", "dev", "z", "n_so_far")
  }

  /**
   * Robust (median/MAD) outlier detection — the screen to reach for when the
   * contamination itself would poison the z-score's mean and deviation: per
   * group, the nearest-rank median and the median absolute deviation, then
   * every row with |x − med| > threshold·MAD flagged with its robust score.
   *
   * Determinism needs NO decimal quantization here (unlike [[zscoreOutliers]]):
   * there is no accumulation at all. The median is the value AT integer rank
   * `(n+1) div 2` of the group's external sort; MAD is the same rank over the
   * per-row |x − med| (one IEEE subtract each); the flag and score are
   * per-row double comparisons shared verbatim with the oracle. Any
   * parallelism, any engine, same flags.
   *
   * Scale: two spillable window sorts partitioned by the group key, then the
   * tiny per-group stats broadcast back against the scan — the
   * [[Summarization]] percentile shape, applied twice.
   */
  def madOutliers(events: DataFrame, keyCol: String = "event_type",
      valueCol: String = "value", idCol: String = "event_id",
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    // cached narrow projection: the two median passes plus the deviation
    // join each re-scanned the raw table (7 scans in the gate's physical
    // plan); one 3-column cache serves all of them
    val e = Frames.cached(events.select(col(keyCol), col(valueCol), col(idCol)))
    val n = e.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .where(col("n") >= 2)
    val medRank = expr("(n + 1) div 2")
    val med = e
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(valueCol))))
      .join(n, Seq(keyCol))
      .where(col("rn") === medRank)
      .select(col(keyCol), col(valueCol).as("med"))
    val withMed = e.join(broadcast(med), Seq(keyCol))
      .withColumn("ad", abs(col(valueCol) - col("med")))
    val mad = withMed
      .withColumn("rd", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("ad"))))
      .join(n, Seq(keyCol))
      .where(col("rd") === medRank)
      .select(col(keyCol), col("ad").as("mad"))
    withMed.join(broadcast(mad), Seq(keyCol))
      .where(col("mad") > 0 && col("ad") > lit(threshold) * col("mad"))
      .select(col(idCol), col(keyCol), col(valueCol), col("med"), col("mad"),
        ((col(valueCol) - col("med")) / col("mad")).as("score"))
  }

  /**
   * Streaming form of [[botFlag]] — the LIVE traffic screen: per-entity
   * running (count, first/last timestamp, min gap) state via
   * `flatMapGroupsWithState`, one updated audit row per entity per
   * micro-batch. Within a batch rows process in (ts, id) order; across
   * batches the min-gap bridges from the retained last timestamp, so a
   * tailing (time-ordered) source reproduces the batch operator's gaps
   * exactly — pinned by the one-batch-equality spec, the
   * [[zscoreStreamFlags]] contract. Out-of-order arrivals fold into
   * span/count correctly (min/max state) but their bridging gap reflects
   * arrival order — the documented tailing assumption.
   */
  def botFlagStream(events: DataFrame, keyCol: String = "user_id",
      tsUsCol: String = "ts_us", idCol: String = "event_id",
      minEvents: Long = 20L, minGapUs: Long = 600000000L,
      meanGapUs: Long = 40000000000L): DataFrame = {
    require(minEvents >= 2, "minEvents >= 2 keeps the mean-gap division defined")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .select(col(keyCol).cast("long"), col(tsUsCol).cast("long"), col(idCol).cast("long"))
      .as[(Long, Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long, Long, Long)]) =>
          val batch = rows.toVector.sortBy(t => (t._2, t._3))
          var (n, tsMin, tsMax, minGap) =
            state.getOption.getOrElse((0L, Long.MaxValue, Long.MinValue, Long.MaxValue))
          var last = if (n == 0) Long.MinValue else tsMax
          batch.foreach { case (_, ts, _) =>
            if (last != Long.MinValue) minGap = math.min(minGap, ts - last)
            last = ts
            tsMin = math.min(tsMin, ts)
            tsMax = math.max(tsMax, ts)
            n += 1
          }
          state.update((n, tsMin, tsMax, minGap))
          if (n == 0) Iterator.empty
          else {
            val span = tsMax - tsMin
            val minG = if (n < 2) None else Some(minGap)
            val meanG = if (n < 2) None else Some(span / (n - 1))
            val bot = n >= minEvents &&
              (minG.exists(_ <= minGapUs) || meanG.exists(_ <= meanGapUs))
            Iterator.single((user, n, span, minG, meanG, if (bot) 1L else 0L))
          }
      }
      .toDF(keyCol, "n_events", "span_us", "min_gap_us", "mean_gap_us", "is_bot")
  }

  /**
   * Crawler/bot screen over a behavioral event stream — the traffic-quality
   * filter a training pipeline runs before trusting interaction logs (bot
   * sessions poison engagement-derived labels and inflate per-user stats):
   * per entity, exact inter-arrival statistics in integer MICROSECONDS, and
   * a thresholded flag. An entity is a bot when it has at least `minEvents`
   * events AND fires either tell: a minimum gap at-or-under `minGapUs`
   * (burst automation) or a mean gap at-or-under `meanGapUs` (sustained
   * machine cadence).
   *
   * Determinism: everything is LONG arithmetic on the caller-supplied
   * epoch-MICROSECONDS column (`tsUsCol`) — min/max/
   * count are order-independent, the mean gap is `span div (n−1)` (the
   * consecutive gaps telescope to the span, so no gap sum is even needed),
   * and ties in the min-gap window order by `idCol`. Floor division stays on
   * nonnegative operands, so Spark `div` == DuckDB `//`. The flag is a
   * nested CASE so the division is never evaluated for single-event
   * entities (ANSI-safe in both engines).
   *
   * Scale: ONE hash shuffle on the entity key shared by the lag window and
   * the aggregate — the [[Sessionize]] shape; no global window, no second
   * corpus pass.
   */
  def botFlag(events: DataFrame, keyCol: String = "user_id", tsUsCol: String = "ts_us",
      idCol: String = "event_id", minEvents: Long = 20L,
      minGapUs: Long = 600000000L, meanGapUs: Long = 40000000000L): DataFrame = {
    require(minEvents >= 2, "minEvents >= 2 keeps the mean-gap division defined")
    val order = Window.partitionBy(col(keyCol)).orderBy(col("tu"), col(idCol))
    val gapped = events
      .select(col(keyCol), col(idCol), col(tsUsCol).cast("long").as("tu"))
      .withColumn("gap", col("tu") - lag(col("tu"), 1).over(order))
    val meanGap = expr("span_us div (n_events - 1)")
    gapped.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tu")) - min(col("tu"))).as("span_us"),
        min(col("gap")).as("min_gap_us"))
      .select(col(keyCol), col("n_events"), col("span_us"), col("min_gap_us"),
        when(col("n_events") > 1, meanGap).as("mean_gap_us"),
        when(col("n_events") >= minEvents,
          when(col("min_gap_us") <= minGapUs || meanGap <= meanGapUs, 1L)
            .otherwise(0L))
          .otherwise(0L).as("is_bot"))
  }

  /**
   * CUSUM drift over daily volumes — the slow-drift detector the point
   * z-score family misses: per `keyCol`, the cumulative deviation of each
   * day's event count from the key's all-period mean. A stuck-at-zero
   * pipeline, a slowly ramping bot farm, or a gradual logging regression
   * never trips a per-day threshold, but its deviations SUM; the classic
   * CUSUM chart (Page 1954, no-reset form) flags when |cumulative
   * deviation| exceeds `threshold` × the mean (a proportional band, so the
   * knob is scale-free across keys of different volumes).
   *
   * Determinism: the running sum is the exact INTEGER prefix sum of counts;
   * the deviation is `cum_n − i·mean` — ONE pinned double expression per
   * row (mean = total/n_days, an exact-integer division) rather than a
   * float accumulation, so no fold-order sensitivity exists anywhere.
   *
   * Scale: one (key, day) count aggregate (map-side combined — the only
   * corpus-sized pass), then a lag-free rank window over the TINY (key,
   * day) frame, partitioned per key. Same shape as [[graft.operators
   * .Funnel.dailyTrend]].
   *
   * @return (key, day, n, day_index, cum_n, mean_n, cum_dev, is_drift)
   */
  def cusumDrift(events: DataFrame, keyCol: String = "event_type",
      tsMsCol: String = "ts_ms", threshold: Double = 3.0): DataFrame = {
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val daily = events.select(col(keyCol), day.as("day"))
      .groupBy(col(keyCol), col("day")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val stats = daily.groupBy(col(keyCol))
      .agg(sum("n").as("n_total"), count(lit(1)).as("n_days"))
    val cumDev = col("cum_n").cast("double") -
      col("day_index").cast("double") * col("mean_n")
    daily
      .withColumn("day_index", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(stats, Seq(keyCol))
      .select(col(keyCol), col("day"), col("n"), col("day_index"), col("cum_n"),
        (col("n_total").cast("double") / col("n_days").cast("double")).as("mean_n"))
      .select(col(keyCol), col("day"), col("n"), col("day_index"), col("cum_n"),
        col("mean_n"), cumDev.as("cum_dev"),
        when(abs(cumDev) > lit(threshold) * col("mean_n"), 1L).otherwise(0L).as("is_drift"))
  }

  /**
   * Per-entity inter-event GAP profile — the distributional view behind
   * [[botFlag]]'s binary tells: bots sit at a machine-regular median with a
   * collapsed p95/median spread, humans at a wide spread; a p95 orders of
   * magnitude above the median is a session-gapped account, not a bot. Min,
   * nearest-rank median and p95, and max of the per-entity gap sequence —
   * ALL exact integers (microsecond diffs; nearest-rank picks, never
   * interpolation), so the report is engine- and parallelism-exact with no
   * floating point at all.
   *
   * Scale shape: both windows partition by the entity key (the lag window
   * for gaps, the rank window for the picks) — per-user sequences, never a
   * corpus-wide sort. Entities with < `minEvents` events (< minEvents-1
   * gaps) are dropped: their percentiles are noise.
   *
   * @return (user_id, n_gaps, min_gap_us, med_gap_us, p95_gap_us, max_gap_us)
   */
  def interarrival(events: DataFrame, keyCol: String = "user_id",
                   tsUsCol: String = "ts_us", idCol: String = "event_id",
                   minEvents: Long = 3L): DataFrame = {
    require(minEvents >= 2, "minEvents >= 2: below that no gap exists")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsUsCol), col(idCol))
    val gaps = events
      .select(col(keyCol), col(tsUsCol), col(idCol))
      .withColumn("gap", col(tsUsCol) - lag(col(tsUsCol), 1).over(w))
      .where(col("gap").isNotNull)
    val wg = Window.partitionBy(keyCol).orderBy(col("gap"), col(idCol))
    // cached narrow projection: the median pick, the p95 pick and the
    // min/max rollup all read the ranked frame — uncut, each re-ran the
    // lag + rank window passes over the corpus
    val ranked = Frames.cached(gaps
      .withColumn("rk", row_number().over(wg).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(keyCol)))
      .where(col("n") >= minEvents - 1)
      .select(col(keyCol), col("gap"), col("rk"), col("n")))
    // nearest-rank: median at ceil(n/2) = (n+1) div 2; p95 at ceil(19n/20)
    val med = ranked.where(col("rk") === expr("(n + 1) div 2"))
      .select(col(keyCol), col("gap").as("med_gap_us"))
    val p95 = ranked.where(col("rk") === expr("(19 * n + 19) div 20"))
      .select(col(keyCol), col("gap").as("p95_gap_us"))
    ranked.groupBy(keyCol)
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap_us"), max(col("gap")).as("max_gap_us"))
      .join(med, keyCol).join(p95, keyCol)
      .select(col(keyCol), col("n_gaps"), col("min_gap_us"),
        col("med_gap_us"), col("p95_gap_us"), col("max_gap_us"))
  }

  /**
   * Goh–Barabási BURSTINESS per entity: B = (σ−μ)/(σ+μ) over the
   * inter-event gap sequence, with CV = σ/μ riding along — the one-number
   * temporal signature [[interarrival]]'s quantiles band-aid around:
   * B → −1 is a metronome (cron, heartbeat), B ≈ 0 is Poisson (organic),
   * B → 1 is bursty (humans, incident storms). A curation pipeline screens
   * event streams for machine traffic on exactly this axis.
   *
   * Determinism: gaps are exact integer µs; both moment sums run as SORTED
   * double folds (the [[TimeSeries]] foldAggregator contract — per-entity
   * gap lists are session-bounded, so the sort is per-key-tiny), and the
   * closing (μ, σ², σ, B, CV) is one pinned IEEE expression chain mirrored
   * verbatim in the oracle. `GREATEST(·, 0)` absorbs the tiny negative
   * variance float cancellation can leave; zero-mean (all-simultaneous)
   * entities score NULL, not NaN.
   *
   * Scale: one per-key lag window (entity-bounded), one groupBy holding a
   * per-key sorted gap array (bounded by the per-entity event count — the
   * same state bound as [[interarrival]]'s rank window), no corpus frame.
   *
   * @return (user_id, n_gaps, mean_gap_us, sd_gap_us, burstiness, cv)
   */
  def burstiness(events: DataFrame, keyCol: String = "user_id",
                 tsUsCol: String = "ts_us", idCol: String = "event_id",
                 minEvents: Long = 5L): DataFrame = {
    require(minEvents >= 3, "minEvents >= 3: variance needs >= 2 gaps")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsUsCol), col(idCol))
    val gaps = events
      .select(col(keyCol), col(tsUsCol), col(idCol))
      .withColumn("gap", col(tsUsCol) - lag(col(tsUsCol), 1).over(w))
      .where(col("gap").isNotNull)
    val folded = gaps.groupBy(keyCol)
      .agg(count(lit(1)).as("n_gaps"),
        sort_array(collect_list(col("gap").cast("double"))).as("gs"))
      .where(col("n_gaps") >= minEvents - 1)
      .withColumn("s1", aggregate(col("gs"), lit(0.0), (acc, v) => acc + v))
      .withColumn("s2", aggregate(col("gs"), lit(0.0), (acc, v) => acc + v * v))
    val nd = col("n_gaps").cast("double")
    val mu = col("s1") / nd
    val varr = greatest(col("s2") / nd - mu * mu, lit(0.0))
    val sd = sqrt(varr)
    folded.select(col(keyCol), col("n_gaps"),
      mu.as("mean_gap_us"), sd.as("sd_gap_us"),
      when(sd + mu === 0.0, lit(null)).otherwise((sd - mu) / (sd + mu)).as("burstiness"),
      when(mu === 0.0, lit(null)).otherwise(sd / mu).as("cv"))
  }

  /**
   * SEASONAL-BASELINE volume anomalies — hourly event counts per type
   * against that type's (day-of-week, hour-of-day) cell mean across the
   * observed weeks: the "is Tuesday 3pm unusually hot FOR a Tuesday 3pm"
   * screen, where [[zscoreOutliers]]' global stats would flag every rush
   * hour. The composition of [[graft.operators.Funnel.seasonality]]'s
   * heatmap with an anomaly rule, as one operator.
   *
   * ALL-INTEGER determinism: a bucket count `c` spikes when
   * `c · n_cell > spikeX · cell_total` and drops when
   * `dropX · c · n_cell < cell_total` — the mean comparisons
   * cross-multiplied so no division (and no float) exists anywhere.
   * Products are DECIMAL(38,0): counts at 100 TB overflow a LONG multiply.
   * The baseline is presence-only (zero-event hours leave no bucket row);
   * cells observed once (n_cell = 1) are their own baseline and never flag.
   *
   * Scale: one (type × bucket) hash aggregate off the scan, one
   * (type × 168)-bounded cell rollup broadcast back — map-side combine
   * does the heavy lifting; no windows. Epoch-day dow convention (day 0 =
   * Thursday), nonnegative timestamps assumed, as in the heatmap.
   *
   * @return (event_type, bucket_ms, n, dow, hour, n_cell, cell_total,
   *         spike, vol_drop)
   */
  def seasonalAnomaly(events: DataFrame, typeCol: String = "event_type",
                      tsMsCol: String = "ts_ms",
                      spikeX: Long = 3L, dropX: Long = 3L): DataFrame = {
    require(spikeX >= 1L && dropX >= 1L, "positive anomaly factors")
    val buckets = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"$tsMsCol div 3600000 * 3600000").as("bucket_ms"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", expr("(bucket_ms div 86400000) % 7"))
      .withColumn("hour", expr("(bucket_ms div 3600000) % 24"))
    val cells = buckets.groupBy("event_type", "dow", "hour")
      .agg(count(lit(1)).as("n_cell"), sum(col("n")).as("cell_total"))
    val cn = col("n").cast("decimal(38,0)") * col("n_cell")
    buckets.join(broadcast(cells), Seq("event_type", "dow", "hour"))
      .select(col("event_type").as(typeCol), col("bucket_ms"), col("n"), col("dow"),
        col("hour"), col("n_cell"), col("cell_total"),
        when(cn > col("cell_total").cast("decimal(38,0)") * spikeX, 1L)
          .otherwise(0L).as("spike"),
        when(cn * dropX < col("cell_total").cast("decimal(38,0)"), 1L)
          .otherwise(0L).as("vol_drop"))
  }

  /**
   * SLO BURN RATE, multiwindow (the Google SRE workbook alert shape): per
   * hour, the error share of all events over the short (1 bucket) and long
   * (rolling `longHours`) windows, each divided by the error BUDGET
   * (1 − SLO, in basis points); the alert fires only when BOTH windows
   * burn past `alertAt` — the fast window for responsiveness, the slow one
   * so a single bad minute can't page. This is the serving-side complement
   * to [[seasonalAnomaly]] (volume anomalies) — correctness anomalies.
   *
   * Determinism: counts are exact integers; the long window is a
   * RANGE frame over `bucket_ms` (true wall-clock hours — a missing hour
   * contributes nothing rather than stretching the window); burns are
   * pinned double chains. The one unpartitioned window orders the
   * hour-bucket frame (period-bounded, the autocorrelation contract).
   *
   * @return (bucket_ms, n_total, n_errors, burn_short, n_total_long,
   *         n_errors_long, burn_long, alert)
   */
  def sloBurnRate(events: DataFrame, errorType: String = "error",
                  typeCol: String = "event_type", tsMsCol: String = "ts_ms",
                  budgetBp: Long = 1000L, longHours: Int = 6,
                  alertAt: Double = 2.0): DataFrame = {
    require(budgetBp >= 1L && budgetBp <= 10000L, "budgetBp in [1, 10000]")
    require(longHours >= 2, "longHours >= 2")
    val hourly = events
      .groupBy(expr(s"$tsMsCol div 3600000 * 3600000").as("bucket_ms"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col(typeCol) === errorType, 1L).otherwise(0L)).as("n_errors"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket_ms")
      .rangeBetween(-(longHours - 1) * 3600000L, 0L)
    val budget = budgetBp.toDouble / 10000.0
    val burnS = col("n_errors").cast("double") / col("n_total").cast("double") /
      lit(budget)
    val burnL = col("n_errors_long").cast("double") /
      col("n_total_long").cast("double") / lit(budget)
    hourly
      .withColumn("n_total_long", sum(col("n_total")).over(w))
      .withColumn("n_errors_long", sum(col("n_errors")).over(w))
      .select(col("bucket_ms"), col("n_total"), col("n_errors"),
        burnS.as("burn_short"), col("n_total_long"), col("n_errors_long"),
        burnL.as("burn_long"),
        when(burnS > alertAt && burnL > alertAt, 1L).otherwise(0L).as("alert"))
  }

  /**
   * POISSON DISPERSION index (variance-to-mean ratio of per-bucket arrival
   * counts) per event type — the arrival-process fingerprint in one
   * number: D ≈ 1 is Poisson (organic, independent arrivals), D ≫ 1 is
   * clustered/bursty (incidents, batch jobs, thundering herds), D < 1 is
   * machine-regular. The per-TYPE complement to [[burstiness]]'s per-user
   * gap view, and the statistical test behind [[seasonalAnomaly]]'s
   * eyeball ("is this type's volume even Poisson enough to threshold").
   *
   * Determinism: bucket counts are exact integers; moment sums run in
   * DECIMAL(38,0) (counts at 100 TB overflow a LONG square), and the
   * closing (μ, σ², D) is one pinned IEEE chain with a `GREATEST(·, 0)`
   * absorbing float cancellation on near-constant series. The baseline is
   * presence-only (zero-count buckets leave no row) — D is conditional on
   * active hours, which is the operational reading.
   *
   * @return (event_type, n_buckets, mean_per_bucket, var_per_bucket,
   *         dispersion)
   */
  def dispersionIndex(events: DataFrame, typeCol: String = "event_type",
                      tsMsCol: String = "ts_ms",
                      periodMs: Long = 3600000L): DataFrame = {
    require(periodMs >= 1L, "periodMs >= 1")
    val sums = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"$tsMsCol div $periodMs").as("b"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n")).as("s1"),
        sum(col("n").cast("decimal(38,0)") * col("n")).as("s2"))
    val nd = col("n_buckets").cast("double")
    val mu = col("s1").cast("double") / nd
    val varr = greatest(col("s2").cast("double") / nd - mu * mu, lit(0.0))
    sums.select(col("event_type"), col("n_buckets"),
      mu.as("mean_per_bucket"), varr.as("var_per_bucket"),
      (varr / mu).as("dispersion"))
  }

  /**
   * Bollinger-style VOLUME BANDS per group — the rolling-window twin of
   * [[zscoreOutliers]]' global moments: each hourly bucket's count is
   * compared against the mean ± `nSigma`·σ of the PREVIOUS `window` full
   * buckets (trailing, excluding self — the band must not absorb the
   * anomaly it is testing). The on-call view for "is this hour's volume
   * abnormal for the recent regime" where the global z-score would smear
   * regime changes across the whole history.
   *
   * Exactness: bucket counts are integers; the trailing window sums count
   * and count² in LONG (exact, order-free), and mean/σ/band-flag are
   * pinned double expressions per row — bit-exact anywhere, no fold
   * needed. The windows partition per group over the (group, bucket)
   * AGGREGATED frame (buckets are time-range-bounded, never corpus-sized).
   *
   * @return (group, bucket, n, mean_n, sd_n, band_flag) for buckets with a
   *         full trailing window.
   */
  def volumeBands(events: DataFrame, typeCol: String = "event_type",
      tsMsCol: String = "ts_ms", bucketMs: Long = 3600000L,
      window: Int = 24, nSigma: Double = 2.0): DataFrame = {
    require(window >= 2, "window >= 2")
    val bucket = expr(
      s"$tsMsCol div $bucketMs - (CASE WHEN $tsMsCol % $bucketMs < 0 THEN 1 ELSE 0 END)")
    val hourly = events.select(col(typeCol).as("grp"), bucket.as("b"))
      .groupBy("grp", "b").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("grp").orderBy("b").rowsBetween(-window, -1)
    val nd = lit(window.toDouble)
    val mean = col("s").cast("double") / nd
    val varr = greatest(col("ss").cast("double") / nd - mean * mean, lit(0.0d))
    hourly
      .withColumn("c", count(lit(1)).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("ss", sum(col("n") * col("n")).over(w))
      .where(col("c") === window)
      .select(col("grp").as(typeCol), col("b").as("bucket"), col("n"),
        mean.as("mean_n"), sqrt(varr).as("sd_n"),
        when(abs(col("n").cast("double") - mean) > lit(nSigma) * sqrt(varr), 1L)
          .otherwise(0L).as("band_flag"))
  }

  /**
   * Anomaly-flag RUN LENGTHS per group — the alert-fatigue metric over
   * [[volumeBands]]' verdicts: consecutive flagged buckets collapse into
   * runs (gaps-and-islands: `bucket − ROW_NUMBER()-within-flagged` is
   * constant inside a run of CONSECUTIVE buckets), so "how long do
   * anomalies persist" and "how many distinct incidents" read off one
   * frame. A single 12-bucket incident should page once, not 12 times;
   * this is the report that tells the operator which.
   *
   * Exactness: the whole computation is integer (bucket ids, row numbers,
   * counts) — exact anywhere. The windows partition per group over the
   * bucket-bounded bands frame.
   *
   * @return (group, run_start, run_len) for every maximal run of
   *         consecutive flagged buckets.
   */
  def flagRuns(events: DataFrame, typeCol: String = "event_type",
      tsMsCol: String = "ts_ms", bucketMs: Long = 3600000L,
      window: Int = 24, nSigma: Double = 2.0): DataFrame = {
    val flagged = volumeBands(events, typeCol, tsMsCol, bucketMs, window, nSigma)
      .where(col("band_flag") === 1L)
      .select(col(typeCol).as("grp"), col("bucket"))
    val w = Window.partitionBy("grp").orderBy("bucket")
    flagged
      .withColumn("island", col("bucket") - row_number().over(w))
      .groupBy(col("grp").as(typeCol), col("island"))
      .agg(min("bucket").as("run_start"), count(lit(1)).as("run_len"))
      .drop("island")
      .select(col(typeCol), col("run_start"), col("run_len"))
  }

  /**
   * STREAMING twin of [[volumeBands]]: per group, a
   * `flatMapGroupsWithState` whose state is the OPEN bucket (id + count)
   * plus a ring of the last `window` CLOSED bucket counts — `window`+2
   * numbers per group, bounded at any volume. When an event arrives for a
   * later bucket, the open bucket closes: if the ring already holds
   * `window` counts, the closing bucket is scored against their mean ±
   * `nSigma`·σ (the IDENTICAL integer-sums-then-pinned-doubles arithmetic
   * as the batch op) and a row emits; the ring then shifts. Late events
   * below the open bucket drop (the tailing assumption of the other
   * twins). One caveat vs batch: the batch op's trailing window is
   * ROWS-based over observed buckets, and so is the ring — gaps skip in
   * both, so a sentinel-flushed one-batch stream reproduces the batch
   * frame exactly (spec-pinned).
   *
   * @return per closing bucket with a full ring:
   *         (group, bucket, n, mean_n, sd_n, band_flag).
   */
  def volumeBandsStream(events: DataFrame, typeCol: String = "event_type",
      tsMsCol: String = "ts_ms", bucketMs: Long = 3600000L,
      window: Int = 24, nSigma: Double = 2.0): DataFrame = {
    require(window >= 2, "window >= 2")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .select(col(typeCol).cast("string"),
        expr(s"$tsMsCol div $bucketMs - (CASE WHEN $tsMsCol % $bucketMs < 0 THEN 1 ELSE 0 END)"))
      .as[(String, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[(String, Long)],
         state: GroupState[(Long, Long, Seq[Long])]) =>
          var (openB, openCnt, ring) =
            state.getOption.getOrElse((Long.MinValue, 0L, Seq.empty[Long]))
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Double, Double, Long)]
          def close(bucket: Long, y: Long): Unit = {
            if (ring.size == window) {
              val s = ring.sum
              val ss = ring.map(v => v * v).sum
              val nd = window.toDouble
              val mean = s.toDouble / nd
              val varr = math.max(ss.toDouble / nd - mean * mean, 0.0)
              val sd = math.sqrt(varr)
              val flag = if (math.abs(y.toDouble - mean) > nSigma * sd) 1L else 0L
              out += ((grp, bucket, y, mean, sd, flag))
              ring = ring.drop(1)
            }
            ring = ring :+ y
          }
          val counts = scala.collection.mutable.TreeMap.empty[Long, Long]
          rows.foreach { case (_, bk) =>
            if (bk >= openB) counts(bk) = counts.getOrElse(bk, 0L) + 1L
          }
          counts.foreach { case (bk, c) =>
            if (bk == openB) openCnt += c
            else {
              if (openB != Long.MinValue) close(openB, openCnt)
              openB = bk; openCnt = c
            }
          }
          state.update((openB, openCnt, ring))
          out.iterator
      }
      .toDF(typeCol, "bucket", "n", "mean_n", "sd_n", "band_flag")
  }

  /**
   * SEASONAL-NAIVE baseline forecast error per group — the accuracy floor
   * every real forecaster (e.g. [[TimeSeries.holtForecast]]) must beat
   * before it earns a pager: predict each hourly bucket's volume with the
   * SAME HOUR YESTERDAY (ŷ_t = y_{t−24h}, the M-competition "snaive"
   * baseline) and report the achieved error. An anomaly stack also reads
   * this directly: groups whose snaive error is tiny are strongly daily-
   * periodic (alert on deviation), groups where it is huge are not
   * (seasonal rules would misfire).
   *
   * Exactness: bucket volumes are integer counts, the lag join is a key
   * join on (group, bucket − 24h) — no window recursion — so errors are
   * exact integers; MAE divides an exact LONG |err| sum once, and WAPE
   * (Σ|err| / Σ actual, the scale-free variant) divides two exact LONGs —
   * one pinned double division each, bit-exact anywhere. One map-side-
   * combined (group, bucket) count is the only corpus-sized work.
   *
   * @return (group, n_scored, mae, wape, max_abs_err) over buckets whose
   *         lag bucket exists.
   */
  def seasonalNaiveError(events: DataFrame, typeCol: String = "event_type",
      tsMsCol: String = "ts_ms", bucketMs: Long = 3600000L,
      seasonBuckets: Int = 24): DataFrame = {
    require(seasonBuckets >= 1, "seasonBuckets >= 1")
    val bucket = expr(
      s"$tsMsCol div $bucketMs - (CASE WHEN $tsMsCol % $bucketMs < 0 THEN 1 ELSE 0 END)")
    val hourly = events.select(col(typeCol).as("grp"), bucket.as("b"))
      .groupBy("grp", "b").agg(count(lit(1)).as("n"))
    val lagged = hourly.select(col("grp"), (col("b") + seasonBuckets).as("b"),
      col("n").as("n_forecast"))
    hourly.join(lagged, Seq("grp", "b"))
      .select(col("grp"), abs(col("n") - col("n_forecast")).as("abs_err"), col("n"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_scored"),
        sum(col("abs_err")).as("sum_abs_err"),
        sum(col("n")).as("sum_actual"),
        max(col("abs_err")).as("max_abs_err"))
      .select(col("grp").as(typeCol), col("n_scored"),
        (col("sum_abs_err").cast("double") / col("n_scored").cast("double")).as("mae"),
        when(col("sum_actual") > 0,
          col("sum_abs_err").cast("double") / col("sum_actual").cast("double")).as("wape"),
        col("max_abs_err"))
  }
}
