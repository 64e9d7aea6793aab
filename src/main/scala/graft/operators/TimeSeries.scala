package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series query operators over the canonical point schema
 * (`metric, ts (epoch ms), value, tags, viz`) — the Spark re-expression of the
 * reference's scan-time iterator stack: rate -> downsample -> cross-series
 * aggregation (server/src/main/java/timely/server/store/DataStore.java:711-745).
 *
 * All operators are declarative DataFrame transformations: partial/final
 * aggregation, spilling, and parallelism come from Catalyst/Tungsten rather
 * than hand-rolled iterators (SURVEY.md §4).
 */
object TimeSeries {

  /** Canonical string form of the tag map — series identity key
    * (reference keys series by full tag set:
    * server/src/main/java/timely/server/sample/iterators/TimeSeriesGroupingIterator.java:93-98).
    * Sorted so logically-equal maps compare equal.
    *
    * Deliberately UNESCAPED `k=v,..` — reference parity: the reference's
    * `escapeDelimiters` (common/src/main/java/timely/accumulo/MetricAdapter.java:55-69)
    * is a no-op (`replaceAll("=", "\\=")`'s replacement string unescapes back
    * to `=`), so tag values containing `=`/`,` collide in its storage keys
    * exactly as they collide here. Where collisions would LOSE data rather
    * than merely co-group (the ingest dedup), use an injective key instead —
    * see [[graft.streaming.PutLineIngest.dedupPoints]]'s JSON form. */
  def seriesKey(tags: Column): Column =
    array_join(
      sort_array(transform(map_entries(tags), e => concat(e.getField("key"), lit("="), e.getField("value")))),
      ",")

  /**
   * Epoch-aligned downsample bucket in ms:
   * `ts - ((ts - start) % period)` with `start` pre-aligned to the period
   * (reference: server/src/main/java/timely/server/sample/Downsample.java:31-43,
   * alignment DataStore.java:693-695). With an aligned start this reduces to
   * `ts - ts % period` for any ts >= 0.
   */
  def bucket(ts: Column, periodMs: Long): Column =
    (ts - (ts % lit(periodMs))).as("bucket_ms")

  /**
   * The `dev` aggregator quirk (root-mean-square, NOT stddev): the reference
   * accumulates sum(x^2) and finishes with sqrt(sum/(n-1)), seeding n==1 with
   * sqrt(sum) (server/src/main/java/timely/server/sample/aggregators/Dev.java:5-19).
   * Replicated exactly for oracle parity — do not substitute stddev_samp.
   */
  def devAgg(value: Column): Column = {
    val ss = sum(value * value)
    val n = count(value)
    when(n === 1, sqrt(ss)).otherwise(sqrt(ss / (n - 1)))
  }

  /** Resolve a reference aggregator name to a Spark aggregate Column
    * (server/src/main/java/timely/server/sample/aggregators/: Avg, Sum, Min,
    * Max, Count, Dev). */
  def aggregator(name: String, value: Column): Column = name match {
    case "avg"   => avg(value)
    case "sum"   => sum(value)
    case "min"   => min(value)
    case "max"   => max(value)
    case "count" => count(value).cast("double")
    case "dev"   => devAgg(value)
    case other   => throw new IllegalArgumentException(s"unknown aggregator: $other")
  }

  /**
   * Order-independent variant for FIRST-LEVEL aggregation over low-scale
   * source measures: floating-point summation depends on partition/merge
   * order (a hazard both across runs with different parallelism and across
   * engines), so sums run in exact DECIMAL(18,6) — associative, exact for
   * values with <= 6 decimal digits — and convert to double once at the end.
   * Do NOT use on derived doubles (e.g. rate outputs): the decimal cast
   * would truncate their full precision.
   */
  def exactAggregator(name: String, value: Column): Column = {
    val dec = value.cast("decimal(18,6)")
    name match {
      case "avg" => sum(dec).cast("double") / count(value)
      case "sum" => sum(dec).cast("double")
      case "dev" =>
        // square of a <=2dp value is <=4dp: cast keeps the scaled integer
        // below 2^53 so the decimal->double conversion is exact either way
        val ss = sum((dec * dec).cast("decimal(18,4)")).cast("double")
        val n = count(value)
        when(n === 1, sqrt(ss)).otherwise(sqrt(ss / (n - 1)))
      case _ => aggregator(name, value)
    }
  }

  /**
   * Downsample: per series (metric + full tag set), aggregate values into
   * epoch-aligned time buckets (reference DownsampleIterator.java:96-105).
   * Map-side partial aggregation + spill are Catalyst built-ins — the
   * reference's DownsampleMemoryEstimator re-batching has no Spark analog to
   * build (SURVEY.md A9).
   */
  def downsample(points: DataFrame, periodMs: Long, agg: String, exact: Boolean = false): DataFrame =
    points
      .groupBy(col("metric"), seriesKey(col("tags")).as("series"), bucket(col("ts"), periodMs))
      .agg((if (exact) exactAggregator(agg, col("value")) else aggregator(agg, col("value"))).as("value"))

  /**
   * Deterministic aggregation over DERIVED double values (per-series
   * downsample results, rates): a left fold over the sorted collected values.
   * Plain sum/avg results depend on partition merge order; sorting first makes
   * the result run- and engine-independent. Groups here are bounded by the
   * number of collapsing series (or points per series-bucket), so the
   * collect_list stays small even at corpus scale.
   */
  def foldAggregator(name: String, valueCol: String = "value"): Column = {
    val sortedFold = expr(s"aggregate(sort_array(collect_list($valueCol)), 0D, (acc, v) -> acc + v)")
    name match {
      case "sum" => sortedFold
      case "avg" => sortedFold / count(col(valueCol))
      case "dev" =>
        val ss = expr(
          s"aggregate(transform(sort_array(collect_list($valueCol)), v -> v * v), 0D, (acc, v) -> acc + v)")
        val n = count(col(valueCol))
        when(n === 1, sqrt(ss)).otherwise(sqrt(ss / (n - 1)))
      case _ => aggregator(name, col(valueCol))
    }
  }

  /**
   * Deterministic shard of a series identity: value of the two leading md5 hex
   * digits, mod `nShards`. Engine-independent (md5 + hex-digit arithmetic), so
   * a SQL oracle reproduces the same shard assignment:
   * `((strpos('0123456789abcdef', substr(md5(s),1,1)) - 1) * 16
   *   + strpos('0123456789abcdef', substr(md5(s),2,1)) - 1) % N`.
   */
  def seriesShard(series: Column, nShards: Int): Column =
    pmod(conv(substring(md5(series), 1, 2), 16, 10).cast("long"), lit(nShards.toLong))

  /** Default shard count for two-level folds: bounds any single aggregation
    * buffer to ~seriesCount/64 values while adding only one extra (cheap,
    * 64-row-per-group) aggregation stage. */
  val CrossSeriesShards = 64

  /**
   * Cross-series aggregation: collapse all series that survived filtering into
   * one series per (metric, bucket, queried-tag subset) — the reference's
   * AggregationIterator (server/src/main/java/timely/server/sample/iterators/AggregationIterator.java:27-128)
   * + queried-tag grouping (DataStore.java:752-762).
   *
   * Scale design: the deterministic fold needs its group's values sorted, so a
   * single-level fold would buffer every collapsing series in one aggregation
   * buffer (the reference plans 50k tag sets per metric — CacheProperties
   * .java:17; a hot metric at 100x would put millions of doubles in one
   * buffer). sum/avg/dev therefore run a TWO-LEVEL deterministic fold: fold
   * within an md5-derived series shard (buffer <= ~series/nShards), then fold
   * the <= nShards partial results sorted. Both levels are engine-independent,
   * so the result is still bit-exact across runs AND engines — just a
   * different (documented, oracle-pinned) summation order than the one-level
   * fold. min/max/count are associative and keep Catalyst's ordinary bounded
   * partial aggregation.
   */
  def crossSeries(
      downsampled: DataFrame,
      agg: String,
      groupCols: Seq[String] = Seq("metric"),
      seriesCol: String = "series",
      nShards: Int = CrossSeriesShards): DataFrame = {
    val gb = (groupCols :+ "bucket_ms").map(col)
    agg match {
      case "sum" | "avg" | "dev" =>
        val partials = shardPartials(agg)
        val lvl1 = downsampled
          .groupBy(gb :+ seriesShard(col(seriesCol), nShards).as("shard"): _*)
          .agg(partials.head, partials.tail: _*)
        lvl1.groupBy(gb: _*).agg(shardFinal(agg).as("value"))
      case _ =>
        downsampled
          .groupBy(gb: _*)
          .agg(foldAggregator(agg).as("value"))
    }
  }

  /** Level-1 (per-shard) aggregates of the two-level fold. */
  def shardPartials(agg: String, valueCol: String = "value"): Seq[Column] = {
    val psum = expr(s"aggregate(sort_array(collect_list($valueCol)), 0D, (acc, v) -> acc + v)").as("psum")
    val pss = expr(
      s"aggregate(transform(sort_array(collect_list($valueCol)), v -> v * v), 0D, (acc, v) -> acc + v)").as("pss")
    val pn = count(col(valueCol)).as("pn")
    agg match {
      case "sum" => Seq(psum)
      case "avg" => Seq(psum, pn)
      case "dev" => Seq(pss, pn)
      case other => throw new IllegalArgumentException(s"not a two-level aggregator: $other")
    }
  }

  /** Level-2 (cross-shard) combiner of the two-level fold. */
  def shardFinal(agg: String): Column = {
    def fold(c: String) = expr(s"aggregate(sort_array(collect_list($c)), 0D, (acc, v) -> acc + v)")
    agg match {
      case "sum" => fold("psum")
      case "avg" => fold("psum") / sum(col("pn"))
      case "dev" =>
        val n = sum(col("pn"))
        when(n === 1, sqrt(fold("pss"))).otherwise(sqrt(fold("pss") / (n - 1)))
      case other => throw new IllegalArgumentException(s"not a two-level aggregator: $other")
    }
  }

  // value as deterministic tie-break for equal-ms timestamps (oracle parity)
  private def seriesWindow =
    Window.partitionBy(col("metric"), col("series")).orderBy(col("ts"), col("value"))

  /**
   * Rate (first difference): per series, `(cur - prev) / (tsCur - tsPrev) * interval`,
   * with counter semantics (reference
   * server/src/main/java/timely/server/sample/iterators/RateIterator.java:64-106):
   *   - counter && cur < prev  => cur += (counterMax > 0 ? counterMax : prev)
   *   - resetValue > 0 && rate > resetValue => 0
   *   - identical timestamps => 0
   * The first point of each series produces no output (needs a predecessor).
   * `intervalMs` defaults to the downsample period (DataStore.java:716-719).
   */
  def rate(
      points: DataFrame,
      intervalMs: Long,
      counter: Boolean = false,
      counterMax: Long = 0L,
      resetValue: Long = 0L): DataFrame = {
    val w = seriesWindow
    val withPrev = points
      .withColumn("series", seriesKey(col("tags")))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .where(col("prev_ts").isNotNull)
    val cur =
      if (!counter) col("value")
      else when(
        col("value") < col("prev_value"),
        col("value") + (if (counterMax > 0) lit(counterMax.toDouble) else col("prev_value"))
      ).otherwise(col("value"))
    val dt = (col("ts") - col("prev_ts")).cast("double")
    val raw = when(dt === 0d, lit(0d))
      .otherwise((cur - col("prev_value")) / dt * lit(intervalMs.toDouble))
    val rated =
      if (resetValue > 0) when(raw > lit(resetValue.toDouble), lit(0d)).otherwise(raw)
      else raw
    withPrev
      .withColumn("rate", rated)
      .drop("prev_value", "prev_ts")
  }

  /**
   * Exponential taps for a truncated EWMA as a [[firFilter]]: the last
   * `span` values weighted (1−α)^age, normalized to sum 1 — the "adjusted"
   * finite-window EWMA every monitoring stack smooths with, expressed as a
   * FIR so it inherits the filter's per-series window shape (partitioned by
   * `(metric, series)`, no global sort) and its engine-exact LAG-chain
   * oracle form. Truncation error vs the infinite EWMA is (1−α)^span of the
   * older mass (≈0.4% at the α=0.5/span=8 default); weights are plan-time
   * Scala constants, so the oracle embeds the IDENTICAL doubles via their
   * shortest round-trip literals.
   */
  def ewmaWeights(alpha: Double, span: Int): Seq[Double] = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    require(span >= 1, "span >= 1")
    val raw = (0 until span).map(j => math.pow(1.0 - alpha, span - 1 - j))
    val tot = raw.foldLeft(0.0)(_ + _)
    raw.map(_ / tot)
  }

  /**
   * FIR filter / moving average: per series, dot-product of the last F values
   * with a weight vector; the first F-1 points of each series are consumed,
   * not emitted (reference TimeSeriesGroupingIterator.java:29-46,138-148; a
   * 5-point moving average uses weights [.2,.2,.2,.2,.2], RateIterator
   * subclasses with [-1, 1]).
   */
  def firFilter(points: DataFrame, weights: Seq[Double]): DataFrame = {
    val f = weights.length
    val w = seriesWindow
    val frame = w.rowsBetween(-(f - 1), 0)
    // weighted sum: zip the collected frame (oldest..newest) with weights
    val vals = collect_list(col("value")).over(frame)
    val weighted = aggregate(
      zip_with(vals, typedlit(weights), (v, wt) => v * wt),
      lit(0.0d),
      (acc, x) => acc + x)
    points
      .withColumn("series", seriesKey(col("tags")))
      .withColumn("rn", row_number().over(w))
      .withColumn("filtered", weighted)
      .where(col("rn") >= f)
      .drop("rn")
  }

  /**
   * Percentile downsample — the tail-latency aggregator the reference's
   * avg/sum/min/max/count/dev set (§2.3) lacks but every latency metric
   * needs: per (metric, series, epoch-aligned bucket), the NEAREST-RANK
   * percentile — the smallest value whose rank ≥ ⌈p·n⌉ in the bucket's
   * sorted sample. Rank-picked, never interpolated: the result is an actual
   * observed sample (p=1 is the max, p→0 the min), and being a pick rather
   * than arithmetic it is bit-exact at any parallelism and in any engine —
   * same determinism class as min/max, unlike avg's fold order.
   *
   * Implementation: one hash aggregate collecting the bucket's values, then
   * a row-wise sorted pick. The collected group is a single series' points
   * within one bucket — bounded by sampling rate × period (the
   * [[foldAggregator]] bound), NOT corpus-sized — so no corpus window sort
   * appears anywhere and the aggregate shuffles on the fine-grained
   * (metric, series, bucket) key exactly like [[downsample]].
   *
   * @param p percentile in (0, 1]; default 0.95
   * @return (metric, series, bucket_ms, value)
   */
  def downsamplePercentile(points: DataFrame, periodMs: Long, p: Double = 0.95): DataFrame = {
    require(p > 0.0 && p <= 1.0, "p must be in (0, 1]")
    points
      .groupBy(col("metric"), seriesKey(col("tags")).as("series"), bucket(col("ts"), periodMs))
      .agg(sort_array(collect_list(col("value"))).as("vs"))
      .select(col("metric"), col("series"), col("bucket_ms"),
        element_at(col("vs"),
          greatest(lit(1), ceil(lit(p) * size(col("vs"))).cast("int"))).as("value"))
  }

  /**
   * Top-N series per metric by an aggregate — the dashboard staple ("top 5
   * hosts by cpu") that naively writes as a rank window over EVERY series
   * of a metric: at 100 TB a hot metric holds millions of series and that
   * window funnels them through few tasks. Two-level instead: a rank
   * window per (metric, md5-shard) keeps only each shard's top k (bounded
   * input per task at any cardinality), then the final rank runs over ≤
   * nShards·k survivors — the [[graft.operators.Curation.topKByLanguage]]
   * shape on the series key. The shard function is engine-reproducible
   * ([[seriesShard]]), so the oracle replays the exact same two levels.
   *
   * @return (metric, rank, series, value) with rank 1..k per metric,
   *         ties broken by series key — a total order.
   */
  def topSeries(points: DataFrame, agg: String, k: Int,
                nShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = points
      .groupBy(col("metric"), seriesKey(col("tags")).as("series"))
      .agg(exactAggregator(agg, col("value")).as("value"))
      .withColumn("shard", seriesShard(col("series"), nShards))
    val wLocal = Window.partitionBy("metric", "shard")
      .orderBy(col("value").desc, col("series"))
    val wGlobal = Window.partitionBy("metric")
      .orderBy(col("value").desc, col("series"))
    per
      .withColumn("rn", row_number().over(wLocal)).where(col("rn") <= k)
      .withColumn("rank", row_number().over(wGlobal).cast("long")).where(col("rank") <= k)
      .select(col("metric"), col("rank"), col("series"), col("value"))
  }

  /**
   * Series GAP report — the TSDB data-quality audit behind every "why did
   * my alert not fire" incident: per series, the observed point count,
   * span, largest inter-arrival gap, and grid coverage at `periodMs`
   * (distinct occupied buckets over the buckets the span should contain).
   * Low coverage or a large max gap marks series whose downsampled views
   * silently interpolate over holes — exactly what retention policies and
   * alert thresholds need to know before trusting a series.
   *
   * Scale: one per-series lag window (partitioned on the fine-grained
   * (metric, series) key — the [[rate]] shape) feeding one aggregate;
   * coverage is exact-integer counts with one double division. Single-point
   * series report NULL max_gap and full coverage of their 1-bucket span.
   *
   * @return (metric, series, n_points, first_ts, last_ts, span_ms,
   *         max_gap_ms, n_buckets, expected_buckets, coverage)
   */
  def gapReport(points: DataFrame, periodMs: Long): DataFrame = {
    require(periodMs > 0, "periodMs must be positive")
    val keyed =
      if (points.columns.contains("series"))
        points.select(col("metric"), col("series"), col("ts"))
      else points.select(col("metric"), seriesKey(col("tags")).as("series"), col("ts"))
    val w = Window.partitionBy("metric", "series").orderBy("ts")
    keyed
      .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
      .groupBy("metric", "series")
      .agg(count(lit(1)).as("n_points"),
        min("ts").as("first_ts"), max("ts").as("last_ts"),
        max("gap").as("max_gap_ms"),
        countDistinct(bucket(col("ts"), periodMs)).as("n_buckets"))
      .select(col("metric"), col("series"), col("n_points"),
        col("first_ts"), col("last_ts"),
        (col("last_ts") - col("first_ts")).as("span_ms"),
        col("max_gap_ms"), col("n_buckets"),
        ((col("last_ts") - col("last_ts") % periodMs
          - (col("first_ts") - col("first_ts") % periodMs)) / periodMs + 1)
          .cast("long").as("expected_buckets"))
      .withColumn("coverage",
        col("n_buckets").cast("double") / col("expected_buckets").cast("double"))
  }

  /**
   * Seasonal-naive forecast error — the baseline every fancier forecaster
   * must beat, turned into a per-series data-quality metric: each point is
   * "predicted" by the point exactly `periodMs` earlier in the same series
   * (the seasonal-naive model), and the series reports its matched-pair
   * count, MAE, and MAPE. High seasonal error marks series that are NOT
   * periodic at this period (alerting thresholds derived from daily
   * seasonality will misfire on them); near-zero error marks strong
   * periodicity worth exploiting in downsampling/retention choices.
   *
   * Exactness: absolute errors accumulate in DECIMAL(18,6) (the
   * [[exactAggregator]] convention — low-scale source values), each
   * division is a single double op. Only points with an exact-lag partner
   * count; series with no partner rows are absent.
   *
   * Scale: ONE equi self-join on (metric, series, ts − period) — the lag
   * lookup needs no window sort at all — then a series-keyed aggregate.
   * Both sides shuffle on the same fine-grained key.
   *
   * @return (metric, series, n_pairs, mae, wmape) — wmape (weighted MAPE:
   *         Σ|err| / Σ|actual|, the per-row-division-free industry form;
   *         exact-decimal numerator AND denominator, one double division)
   *         is NULL when the actuals sum to zero.
   */
  def seasonalError(points: DataFrame, periodMs: Long): DataFrame = {
    require(periodMs > 0, "periodMs must be positive")
    // accepts raw points (tags map -> series key) or an already-keyed frame
    // (e.g. a downsample output with its `series` column and bucket grid —
    // the usual input, since the exact-lag join wants a regular time grid)
    val cur =
      if (points.columns.contains("series"))
        points.select(col("metric"), col("series"), col("ts"), col("value"))
      else points.select(col("metric"), seriesKey(col("tags")).as("series"),
        col("ts"), col("value"))
    val prev = cur.select(col("metric"), col("series"),
      (col("ts") + periodMs).as("ts"), col("value").as("prev_value"))
    val err = (col("value").cast("decimal(18,6)") - col("prev_value").cast("decimal(18,6)"))
    val absErr = abs(err).cast("decimal(18,6)")
    cur.join(prev, Seq("metric", "series", "ts"))
      .groupBy("metric", "series")
      .agg(count(lit(1)).as("n_pairs"),
        sum(absErr).cast("double").as("abs_err_sum"),
        sum(abs(col("value").cast("decimal(18,6)"))).cast("double").as("abs_actual_sum"))
      .select(col("metric"), col("series"), col("n_pairs"),
        (col("abs_err_sum") / col("n_pairs").cast("double")).as("mae"),
        when(col("abs_actual_sum") > 0, col("abs_err_sum") / col("abs_actual_sum"))
          .as("wmape"))
  }

  /** The fixed-point bucket series [[autocorrelation]] and
    * [[crossCorrelation]] share: per-metric `periodMs` cross-series average
    * (exact-DECIMAL first level), snapped to `scale` steps per unit so every
    * downstream sum is an exact integer. */
  private def fpBucketSeries(points: DataFrame, periodMs: Long,
                             scale: Long): DataFrame =
    points
      .groupBy(col("metric"), (col("ts") - col("ts") % periodMs).as("bucket_ms"))
      .agg((sum(col("value").cast("decimal(18,6)")).cast("double") /
        count(col("value"))).as("value"))
      .select(col("metric"), col("bucket_ms"),
        floor(col("value") * scale + lit(0.5)).cast("long").as("fp"))

  /**
   * Sample AUTOCORRELATION of each metric's bucketed series at the given
   * lags — the periodicity detector behind seasonality-aware alerting and
   * the [[seasonalError]] baseline choice: r(24) ≈ 1 on an hourly grid says
   * "daily cycle, use the seasonal-naive baseline"; r(k) ≈ 0 everywhere
   * says the metric is noise and banding thresholds should come from
   * [[graft.operators.Anomaly]]'s robust stats instead. Standard ACF:
   * `r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²` over the per-metric
   * hourly cross-series average.
   *
   * Determinism: the bucket value is an exact-DECIMAL first-level average
   * (bit-identical across engines); it is then snapped to a fixed-point
   * grid (`scale` steps per unit) so every cross/marginal sum is an exact
   * integer — only the FINAL pinned arithmetic (x̄, numerator, denominator,
   * one ratio) is floating point, mirrored verbatim in the oracle. The
   * integer sums must stay below 2^53 for the double casts to be exact:
   * n·(scale·max|x|)² < 2^53 — at the default scale, thousands of buckets
   * at |x| ≤ ~1e3 (shrink `scale` for wilder series).
   *
   * Scale shape: one bucket aggregate (partial+final), then ONE window sort
   * per metric over the BUCKET series (periodMs-bounded: a year of hourly
   * buckets is 8.8k rows per metric regardless of corpus size), then a
   * lag-exploded aggregate back to (metric, lag). No corpus-sized window.
   *
   * @return (metric, lag, n_buckets, n_pairs, acf) — `acf` NULL for a
   *         constant series (zero variance) or when no pair exists.
   */
  def autocorrelation(points: DataFrame, periodMs: Long = 3600000L,
                      lags: Seq[Int] = Seq(1, 2, 24),
                      scale: Long = 1000L): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), "lags must be >= 1")
    require(scale >= 1L, "scale must be positive")
    val b = fpBucketSeries(points, periodMs, scale)
    val w = Window.partitionBy("metric").orderBy("bucket_ms")
    val leads = lags.foldLeft(b)((df, k) =>
      df.withColumn(s"l$k", lead(col("fp"), k).over(w)))
    val exploded = leads.select(col("metric"), col("fp"),
        explode(array(lags.map(k =>
          struct(lit(k.toLong).as("lag"), col(s"l$k").as("lk"))): _*)).as("e"))
      .select(col("metric"), col("fp"), col("e.lag").as("lag"), col("e.lk").as("lk"))
    val perLag = exploded.groupBy("metric", "lag").agg(
      sum(when(col("lk").isNotNull, col("fp") * col("lk"))).as("a"),
      sum(when(col("lk").isNotNull, col("fp"))).as("h"),
      sum(col("lk")).as("t"),
      sum(when(col("lk").isNotNull, 1L)).as("n_pairs"))
    val stats = b.groupBy("metric").agg(
      count(lit(1)).as("n"), sum(col("fp")).as("m"),
      sum(col("fp") * col("fp")).as("s2"))
    val sd = scale.toDouble
    val s2d = sd * sd
    val xbar = col("m").cast("double") / col("n").cast("double") / lit(sd)
    val num = col("a").cast("double") / lit(s2d) -
      xbar * ((col("h") + col("t")).cast("double") / lit(sd)) +
      col("n_pairs").cast("double") * xbar * xbar
    val den = col("s2").cast("double") / lit(s2d) -
      col("n").cast("double") * xbar * xbar
    perLag.join(stats, "metric")
      .select(col("metric"), col("lag"), col("n").as("n_buckets"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("n_pairs").isNotNull && den =!= 0.0, num / den).as("acf"))
  }

  /**
   * Least-squares TREND per metric over the bucket series — the "is this
   * metric drifting and how fast" number dashboards and capacity planning
   * read ([[autocorrelation]] finds periodicity; this finds the secular
   * component): ordinary least squares of the bucket value against the
   * integer bucket index on the REAL time grid (gaps advance the index, so
   * a metric that vanished for a day doesn't fake a steeper slope).
   *
   * Exactness: the index `t = (bucket_ms − min_bucket)/period` and the
   * fixed-point values make Σt, Σy, Σty, Σt², n exact integers; slope and
   * mean are the pinned closing expressions (same 2^53 envelope as the
   * correlation ops — n·Σty is the binding term).
   *
   * @return (metric, n_buckets, mean_value, slope_per_bucket) — slope NULL
   *         for a single-bucket series (zero index variance).
   */
  def trendReport(points: DataFrame, periodMs: Long = 3600000L,
                  scale: Long = 1000L): DataFrame = {
    require(scale >= 1L, "scale must be positive")
    val b = fpBucketSeries(points, periodMs, scale)
    val t0 = b.groupBy(col("metric").as("m0")).agg(min(col("bucket_ms")).as("b0"))
    val agg = b.join(t0, col("metric") === col("m0"))
      .select(col("metric"), col("fp"),
        expr(s"(bucket_ms - b0) div ${periodMs}L").as("t"))
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        sum(col("t")).as("st"), sum(col("fp")).as("sy"),
        sum(col("t") * col("fp")).as("sty"),
        sum(col("t") * col("t")).as("stt"))
    val sd = scale.toDouble
    val den = col("n").cast("double") * col("stt").cast("double") -
      col("st").cast("double") * col("st").cast("double")
    val slope = (col("n").cast("double") * col("sty").cast("double") -
      col("st").cast("double") * col("sy").cast("double")) / den / lit(sd)
    agg.select(col("metric"), col("n").as("n_buckets"),
      (col("sy").cast("double") / col("n").cast("double") / lit(sd)).as("mean_value"),
      when(den =!= 0.0, slope).as("slope_per_bucket"))
  }

  /**
   * Single CHANGEPOINT per metric — the split of the bucket series that
   * maximizes the |mean after − mean before| level shift: "when did this
   * metric step, and by how much" — the breakpoint [[graft.operators
   * .Anomaly.cusumDrift]] accumulates toward, returned as one row per
   * metric with the break time and both side means (binary segmentation's
   * first step; re-run on the halves for more breaks).
   *
   * Exactness: prefix sums over the fixed-point bucket series are exact
   * integers; each candidate split's means/shift are pinned double
   * expressions, and the argmax is ONE lexicographic struct aggregate —
   * (|shift|, −k) max — so ties go to the earliest split identically in
   * both engines (the oracle ranks with the same keys).
   *
   * Scale shape: the window and the argmax run over the BUCKET series
   * (periodMs-bounded per metric), never the raw points.
   *
   * @return (metric, n_buckets, n_before, break_ms, mean_before,
   *         mean_after, shift) — `break_ms` is the first bucket AFTER the
   *         split; single-bucket series drop (no split exists).
   */
  def changepoint(points: DataFrame, periodMs: Long = 3600000L,
                  scale: Long = 1000L): DataFrame = {
    require(scale >= 1L, "scale must be positive")
    val b = fpBucketSeries(points, periodMs, scale)
    val w = Window.partitionBy("metric").orderBy("bucket_ms")
    val rows = b
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("fp")).over(w))
      .withColumn("nxt", lead(col("bucket_ms"), 1).over(w))
    val tot = b.groupBy(col("metric").as("m0"))
      .agg(count(lit(1)).as("n"), sum(col("fp")).as("s"))
    val sd = scale.toDouble
    val meanB = col("cum").cast("double") / col("k").cast("double") / lit(sd)
    val meanA = (col("s") - col("cum")).cast("double") /
      (col("n") - col("k")).cast("double") / lit(sd)
    val shift = meanA - meanB
    rows.join(tot, col("metric") === col("m0"))
      .where(col("k") < col("n")) // a split needs both sides non-empty
      .select(col("metric"), col("n"), col("k"),
        struct(abs(shift).as("a"), (-col("k")).as("nk"),
          col("nxt").as("break_ms"), meanB.as("mb"), meanA.as("ma"),
          shift.as("sh")).as("cand"))
      .groupBy("metric")
      .agg(max(col("n")).as("n_buckets"), max(col("cand")).as("best"))
      .select(col("metric"), col("n_buckets"),
        (-col("best.nk")).as("n_before"), col("best.break_ms"),
        col("best.mb").as("mean_before"), col("best.ma").as("mean_after"),
        col("best.sh").as("shift"))
  }

  /**
   * Lagged CROSS-correlation between every ordered metric pair — the
   * leading-indicator detector ([[autocorrelation]]'s two-series sibling):
   * `xcorr(a, b, k)` is the Pearson correlation of a's bucket value at `t`
   * with b's at `t + k·period`, so a high `(errors, traffic, k=1)` row reads
   * "traffic leads errors by one bucket" — what an alerting pipeline wires
   * into cause ordering, and a mix pipeline uses to spot redundant signals.
   * Lag 0 is plain correlation; the matrix is emitted for ordered pairs
   * (a ≠ b) because lead/lag is directional.
   *
   * Exactness: both series come from [[fpBucketSeries]], so Σx, Σy, Σxy,
   * Σx², Σy² over the MATCHED buckets are exact integers; means/cov/var are
   * the pinned closing arithmetic mirrored in the oracle (same 2^53 bound
   * as [[autocorrelation]]). Pearson over the matched subset — both moments
   * from the same rows — keeps |r| ≤ 1 by construction.
   *
   * Scale shape: the join runs on the BUCKET-series frames (metrics ×
   * buckets rows — KB-sized at any corpus scale), keyed by bucket; the
   * final aggregate is (metrics² × lags)-bounded. Nothing corpus-sized
   * moves after the first bucket aggregate.
   */
  def crossCorrelation(points: DataFrame, periodMs: Long = 3600000L,
                       lags: Seq[Int] = Seq(0, 1, 2),
                       scale: Long = 1000L): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 0), "lags must be >= 0")
    require(scale >= 1L, "scale must be positive")
    val b = fpBucketSeries(points, periodMs, scale)
    val lagged = b.select(col("metric"), col("bucket_ms"), col("fp"),
        explode(array(lags.map(k => lit(k.toLong)): _*)).as("lag"))
      .select(col("metric").as("metric_b"),
        (col("bucket_ms") - col("lag") * periodMs).as("bucket_ms"),
        col("fp").as("fpy"), col("lag"))
    val joined = b.select(col("metric").as("metric_a"), col("bucket_ms"),
        col("fp").as("fpx"))
      .join(lagged, Seq("bucket_ms"))
      .where(col("metric_a") =!= col("metric_b"))
    val agg = joined.groupBy("metric_a", "metric_b", "lag").agg(
      count(lit(1)).as("n"),
      sum(col("fpx")).as("sx"), sum(col("fpy")).as("sy"),
      sum(col("fpx") * col("fpy")).as("sxy"),
      sum(col("fpx") * col("fpx")).as("sxx"),
      sum(col("fpy") * col("fpy")).as("syy"))
    val sd = scale.toDouble
    val s2d = sd * sd
    val xm = col("sx").cast("double") / col("n").cast("double") / lit(sd)
    val ym = col("sy").cast("double") / col("n").cast("double") / lit(sd)
    val cov = col("sxy").cast("double") / lit(s2d) -
      xm * (col("sy").cast("double") / lit(sd)) -
      ym * (col("sx").cast("double") / lit(sd)) +
      col("n").cast("double") * xm * ym
    val varx = col("sxx").cast("double") / lit(s2d) -
      col("n").cast("double") * xm * xm
    val vary = col("syy").cast("double") / lit(s2d) -
      col("n").cast("double") * ym * ym
    agg.select(col("metric_a"), col("metric_b"), col("lag"),
      col("n").as("n_pairs"),
      when(varx * vary > 0.0, cov / sqrt(varx * vary)).as("xcorr"))
  }

  /**
   * Gorilla compression-cost report — the storage-planning analog of the
   * reference's in-memory cache, which holds recent points Gorilla-compressed
   * (timely-server's cache; Pelkonen et al., "Gorilla: A Fast, Scalable,
   * In-Memory Time Series Database", VLDB 2015 §4.1). Per metric, the model
   * bit-cost of its series under Gorilla encoding vs raw (64-bit ts + 64-bit
   * value), for capacity planning: which metrics are cheap to cache hot,
   * which have irregular timestamps / jittery values that compress poorly.
   *
   * Bit model (paper classes, two documented simplifications):
   *  - first point of a series: 64 + 64;
   *  - timestamps: second point stores its delta in 14 bits; from the third,
   *    delta-of-delta classes 0 -> 1 bit, [-63,64] -> 9, [-255,256] -> 12,
   *    [-2047,2048] -> 16, else 36;
   *  - values are XORed as DECIMAL(18,4)-scaled integers (the engine's exact
   *    value codec, not raw IEEE bits — keeps both engines bit-identical);
   *    XOR == 0 -> 1 bit, else control(2) + leading-zeros(5) + length(6) +
   *    significant bits of the XOR (the paper's previous-window reuse is
   *    omitted, so this is a mild upper bound).
   *
   * Scale: one window per (metric, series) — the partition key every series
   * op here uses, never a corpus-wide window — then a partial-aggregated
   * group-by on metric. Integer bit sums are exact; the single IEEE division
   * (ratio) happens once per output row in mirrored order.
   *
   * @return (metric, n_series, n_points, raw_bits, ts_bits, val_bits,
   *         gorilla_bits, compression_ratio) one row per metric
   */
  def gorillaCost(points: DataFrame): DataFrame = {
    val keyed =
      if (points.columns.contains("series"))
        points.select(col("metric"), col("series"), col("ts"), col("value"))
      else points.select(col("metric"), seriesKey(col("tags")).as("series"),
        col("ts"), col("value"))
    val w = Window.partitionBy("metric", "series").orderBy(col("ts"), col("value"))
    val sv = (col("value").cast("decimal(18,4)") * 10000).cast("long")
    val lagged = keyed
      .withColumn("sv", sv)
      .withColumn("pts", lag(col("ts"), 1).over(w))
      .withColumn("ppts", lag(col("ts"), 2).over(w))
      .withColumn("psv", lag(col("sv"), 1).over(w))
    val dod = (col("ts") - col("pts")) - (col("pts") - col("ppts"))
    val tsBits = when(col("pts").isNull, 64L)
      .when(col("ppts").isNull, 14L)
      .when(dod === 0L, 1L)
      .when(dod.between(-63L, 64L), 9L)
      .when(dod.between(-255L, 256L), 12L)
      .when(dod.between(-2047L, 2048L), 16L)
      .otherwise(36L)
    val x = col("sv").bitwiseXOR(col("psv"))
    val sigBits = when(x < 0L, 64L).otherwise(length(bin(x)).cast("long"))
    val valBits = when(col("psv").isNull, 64L)
      .when(x === 0L, 1L)
      .otherwise(lit(13L) + sigBits)
    lagged
      .select(col("metric"), col("series"), tsBits.as("tb"), valBits.as("vb"))
      .groupBy("metric")
      .agg(countDistinct(col("series")).as("n_series"),
        count(lit(1)).as("n_points"),
        sum(col("tb")).as("ts_bits"),
        sum(col("vb")).as("val_bits"))
      .select(col("metric"), col("n_series"), col("n_points"),
        (col("n_points") * 128L).as("raw_bits"),
        col("ts_bits"), col("val_bits"),
        (col("ts_bits") + col("val_bits")).as("gorilla_bits"))
      .withColumn("compression_ratio",
        col("raw_bits").cast("double") / col("gorilla_bits").cast("double"))
  }

  /**
   * Gap-FILLED downsample — the OpenTSDB fill-policy surface
   * ([[downsample]] only emits buckets that have points; a dashboard or a
   * joined cross-metric calculation needs the EMPTY buckets too): per
   * (metric, series), the complete `periodMs` grid from the series' first
   * to last observed bucket, carrying all three classic fill policies at
   * once — `value` (NULL where missing, OpenTSDB "none"), `value_zero`
   * ("zero"), `value_locf` (last observation carried forward) — plus a
   * `filled` audit flag per emitted row.
   *
   * Scale: the grid generation explodes a per-series `sequence(first,
   * last, period)` — bounded by the series' time span over the period, the
   * same bound as the bucket frame itself (a year of hourly buckets is
   * 8.8k rows per series regardless of corpus size); the LOCF window
   * partitions per series. Determinism: the underlying downsample is the
   * exact-DECIMAL average; grid buckets are unique per series, so the
   * window order is total without a tie-break.
   */
  def downsampleFill(points: DataFrame, periodMs: Long): DataFrame = {
    require(periodMs >= 1L, "periodMs >= 1")
    val ds = downsample(points, periodMs, "avg", exact = true)
    val bounds = ds.groupBy("metric", "series")
      .agg(min("bucket_ms").as("b0"), max("bucket_ms").as("b1"))
    val grid = bounds.select(col("metric"), col("series"),
      explode(sequence(col("b0"), col("b1"), lit(periodMs))).as("bucket_ms"))
    val w = Window.partitionBy("metric", "series").orderBy("bucket_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(ds, Seq("metric", "series", "bucket_ms"), "left")
      .select(col("metric"), col("series"), col("bucket_ms"), col("value"),
        coalesce(col("value"), lit(0.0)).as("value_zero"),
        last(col("value"), ignoreNulls = true).over(w).as("value_locf"),
        when(col("value").isNull, 1L).otherwise(0L).as("filled"))
  }

  /**
   * Holt LINEAR (double-exponential) smoothing per metric over the hourly
   * volume series — the trend-aware forecaster the [[firFilter]]-based EWMA
   * (level-only) can't be: a steadily growing metric drives EWMA
   * permanently behind while Holt's trend term tracks it (Holt 1957; the
   * capacity-planning staple).
   *
   *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
   *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},    ŷ_{t+h} = l_t + h·b_t
   *
   * initialized l₁ = y₁, b₁ = y₂ − y₁ and folded over y₃..y_n.
   *
   * Determinism: the recursion is inherently ordered, so each metric's
   * bucket-count series (exact integers) is collected SORTED by bucket —
   * bounded by the time range / `bucketMs`, the [[foldAggregator]] size
   * contract, NOT by volume — and folded sequentially with a 2-element
   * [level, trend] array state; α/β and their complements are plan-time
   * literals chosen exactly representable, every expression mirrored
   * node-for-node by the oracle, so any engine replays the fold
   * bit-for-bit. Corpus-sized work is ONE map-side-combined
   * (metric, bucket) count; the fold runs on ≤ buckets-per-metric values.
   *
   * @return (metric, n_buckets, level, trend, forecast_1h, forecast_24h) —
   *         metrics with ≥ 2 buckets only.
   */
  def holtForecast(points: DataFrame, bucketMs: Long = 3600000L,
      alpha: Double = 0.5, beta: Double = 0.25): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1, "bad smoothing params")
    val a = alpha; val ca = 1.0 - alpha; val b = beta; val cb = 1.0 - beta
    val counts = points
      .groupBy(col("metric"), bucket(col("ts"), bucketMs))
      .agg(count(lit(1)).as("n"))
    counts
      .groupBy("metric")
      .agg(expr("transform(array_sort(collect_list(struct(bucket_ms, n))), x -> x.n)").as("ns"))
      .where(size(col("ns")) >= 2)
      // state = [level, trend]; l' appears twice in the lambda and is
      // recomputed identically both times (same expression -> same double)
      .withColumn("st", expr(
        s"""aggregate(
           |  slice(ns, 3, greatest(size(ns) - 2, 0)),
           |  array(CAST(element_at(ns, 1) AS DOUBLE),
           |        CAST(element_at(ns, 2) AS DOUBLE) - CAST(element_at(ns, 1) AS DOUBLE)),
           |  (acc, y) -> array(
           |    CAST($a AS DOUBLE) * CAST(y AS DOUBLE)
           |      + CAST($ca AS DOUBLE) * (element_at(acc, 1) + element_at(acc, 2)),
           |    CAST($b AS DOUBLE) * ((CAST($a AS DOUBLE) * CAST(y AS DOUBLE)
           |      + CAST($ca AS DOUBLE) * (element_at(acc, 1) + element_at(acc, 2)))
           |        - element_at(acc, 1))
           |      + CAST($cb AS DOUBLE) * element_at(acc, 2)))""".stripMargin))
      .select(col("metric"), size(col("ns")).cast("long").as("n_buckets"),
        element_at(col("st"), 1).as("level"),
        element_at(col("st"), 2).as("trend"),
        (element_at(col("st"), 1) + element_at(col("st"), 2)).as("forecast_1h"),
        (element_at(col("st"), 1) + lit(24.0d) * element_at(col("st"), 2)).as("forecast_24h"))
  }

  /**
   * Holt-Winters ADDITIVE (triple-exponential) smoothing per metric — the
   * seasonal forecaster [[holtForecast]] can't be: hourly traffic with a
   * daily cycle drives Holt's trend term into oscillation, while the
   * seasonal state absorbs the cycle and the trend tracks the true drift
   * (Winters 1960; the capacity-planning forecaster for anything diurnal).
   *
   *   l_t = α·(y_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
   *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
   *   s_t = γ·(y_t − l_t) + (1−γ)·s_{t−m},   ŷ_{t+h} = l_t + h·b_t + s_{t+h−m}
   *
   * initialized from the first season: l_m = mean(y_1..y_m), b_m = 0
   * (β learns the trend from the data), s_i = y_i − l_m, folded over
   * y_{m+1}..y_n.
   *
   * Determinism: the [[holtForecast]] scheme extended to an (m+2)-element
   * [level, trend, s_1..s_m] DOUBLE array state — the seasonal buffer
   * ROTATES each step (slot m steps behind is always element 3, the freshly
   * updated slot appends at the end), so the fold needs no position index
   * and both engines replay it element for element. The init mean is one
   * pinned division over an exact integer season sum; α/β/γ are
   * exactly-representable plan-time literals; l_t is recomputed inline
   * (identical expression → identical double) wherever it appears.
   * Corpus-sized work is ONE map-side-combined (metric, bucket) count; the
   * fold runs on ≤ buckets-per-metric values (the [[foldAggregator]] size
   * contract).
   *
   * @return (metric, n_buckets, level, trend, seasonal_next, forecast_1h,
   *         forecast_24h) — metrics with ≥ period+1 buckets only;
   *         seasonal_next is the slot ŷ_{t+1} adds, forecast_24h uses the
   *         freshest slot (h = m).
   */
  def holtWintersForecast(points: DataFrame, bucketMs: Long = 3600000L,
      alpha: Double = 0.5, beta: Double = 0.25, gamma: Double = 0.25,
      period: Int = 24): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1 &&
      gamma >= 0 && gamma <= 1, "bad smoothing params")
    require(period >= 2 && period <= 8192, "period in [2, 8192]")
    val a = alpha; val ca = 1.0 - alpha; val b = beta; val cb = 1.0 - beta
    val g = gamma; val cg = 1.0 - gamma; val m = period
    // l_t recomputed inline wherever referenced (same expression -> same double)
    val lt = s"""(CAST($a AS DOUBLE) * (CAST(y AS DOUBLE) - element_at(acc, 3))
                |      + CAST($ca AS DOUBLE) * (element_at(acc, 1) + element_at(acc, 2)))""".stripMargin
    val counts = points
      .groupBy(col("metric"), bucket(col("ts"), bucketMs))
      .agg(count(lit(1)).as("n"))
    counts
      .groupBy("metric")
      .agg(expr("transform(array_sort(collect_list(struct(bucket_ms, n))), x -> x.n)").as("ns"))
      .where(size(col("ns")) >= m + 1)
      .withColumn("l0", expr(
        s"CAST(aggregate(slice(ns, 1, $m), 0L, (acc, x) -> acc + x) AS DOUBLE)" +
          s" / CAST($m AS DOUBLE)"))
      .withColumn("st", expr(
        s"""aggregate(
           |  slice(ns, ${m + 1}, greatest(size(ns) - $m, 0)),
           |  concat(array(l0, CAST(0.0 AS DOUBLE)),
           |         transform(slice(ns, 1, $m), x -> CAST(x AS DOUBLE) - l0)),
           |  (acc, y) -> concat(
           |    array(
           |      $lt,
           |      CAST($b AS DOUBLE) * ($lt - element_at(acc, 1))
           |        + CAST($cb AS DOUBLE) * element_at(acc, 2)),
           |    slice(acc, 4, ${m - 1}),
           |    array(CAST($g AS DOUBLE) * (CAST(y AS DOUBLE) - $lt)
           |        + CAST($cg AS DOUBLE) * element_at(acc, 3))))""".stripMargin))
      .select(col("metric"), size(col("ns")).cast("long").as("n_buckets"),
        element_at(col("st"), 1).as("level"),
        element_at(col("st"), 2).as("trend"),
        element_at(col("st"), 3).as("seasonal_next"),
        (element_at(col("st"), 1) + element_at(col("st"), 2)
          + element_at(col("st"), 3)).as("forecast_1h"),
        (element_at(col("st"), 1) + lit(m.toDouble) * element_at(col("st"), 2)
          + element_at(col("st"), m + 2)).as("forecast_24h"))
  }

  /**
   * STREAMING twin of [[holtForecast]]: per metric, a
   * `flatMapGroupsWithState` fold whose state is (closed-bucket count, y₁,
   * level, trend, open bucket, open count) — six numbers, BOUNDED per
   * metric regardless of volume — updating Holt state each time an hourly
   * bucket CLOSES (an event arrives for a later bucket). The open bucket
   * stays pending: its count may still grow, so the emitted state always
   * covers exactly the closed prefix — feed a sentinel event in a later
   * bucket to flush the last real bucket, and the emitted row equals
   * [[holtForecast]] over the closed buckets bit-for-bit (the Scala fold
   * reuses the identical expression tree: l′ = α·y + (1−α)·(l+b),
   * b′ = β·(l′−l) + (1−β)·b with α=0.5, β=0.25). Within a batch, buckets
   * fold in ascending order; events for a bucket BELOW the open one are
   * late beyond the model's memory and are dropped (the documented tailing
   * assumption, as in the z-score/CMS twins).
   *
   * @return per batch and metric with ≥ 2 closed buckets:
   *         (metric, n_buckets, level, trend, forecast_1h).
   */
  def holtStream(events: DataFrame, bucketMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val a = 0.5d; val ca = 0.5d; val b = 0.25d; val cb = 0.75d
    val ds = events
      .select(col("metric").cast("string"), (col("ts") - (col("ts") % lit(bucketMs))).as("b"))
      .as[(String, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (metric: String, rows: Iterator[(String, Long)],
         state: GroupState[(Long, Double, Double, Double, Long, Long)]) =>
          var (nClosed, y1, level, trend, openB, openCnt) =
            state.getOption.getOrElse((0L, 0.0, 0.0, 0.0, Long.MinValue, 0L))
          def close(y: Double): Unit = {
            if (nClosed == 0L) y1 = y
            else if (nClosed == 1L) { level = y1; trend = y - y1 }
            else {
              val lNew = a * y + ca * (level + trend)
              trend = b * (lNew - level) + cb * trend
              level = lNew
            }
            nClosed += 1
          }
          // fold this batch's buckets in ascending event-time order
          val counts = scala.collection.mutable.TreeMap.empty[Long, Long]
          rows.foreach { case (_, bk) =>
            if (bk >= openB) counts(bk) = counts.getOrElse(bk, 0L) + 1L
          } // bk < openB: late beyond memory, dropped
          counts.foreach { case (bk, c) =>
            if (bk == openB) openCnt += c
            else { // a later bucket: close the open one first
              if (openB != Long.MinValue) close(openCnt.toDouble)
              openB = bk; openCnt = c
            }
          }
          state.update((nClosed, y1, level, trend, openB, openCnt))
          if (nClosed < 2L) Iterator.empty
          else Iterator.single((metric, nClosed, level, trend, level + trend))
      }
      .toDF("metric", "n_buckets", "level", "trend", "forecast_1h")
  }

  /**
   * THEIL–SEN robust trend per metric over the hourly volume series: the
   * median of all pairwise slopes (y_j − y_i)/(b_j − b_i), i < j — the
   * estimator that shrugs off the outlier buckets an OLS slope (and
   * [[holtForecast]]'s trend term) chase; breakdown point ~29%
   * (Theil 1950; Sen 1968). The operational "is this metric actually
   * growing" number.
   *
   * Scale contract: the pair join is quadratic in BUCKETS (time range /
   * `bucketMs`), NEVER in events — corpus-sized work is the one map-side
   * (metric, bucket) count; a year of hourly buckets is ~38M pair rows per
   * metric, each a subtraction. The join shuffles on the metric key.
   *
   * Determinism: each slope is one pinned double division of exact LONGs;
   * the median is a nearest-rank PICK (an actual slope value, never an
   * average), so equal-slope ordering cannot change the value. The
   * intercept is the same pick over per-bucket residuals y_i − slope·b_i.
   *
   * @return (metric, n_buckets, n_pairs, slope, intercept) per metric with
   *         ≥ 2 buckets; slope in counts per bucket, b in bucket units.
   */
  def theilSen(points: DataFrame, bucketMs: Long = 3600000L): DataFrame = {
    // cached (the minhashLsh `mh` idiom): three consumers read this frame —
    // both sides of the pair self-join and the residual branch — and without
    // the cut the events-sized count aggregate executes three times per run
    val counts = Frames.cached(points
      .groupBy(col("metric"), (col("ts") - (col("ts") % lit(bucketMs))).as("bms"))
      .agg(count(lit(1)).as("n"))
      .select(col("metric"), (col("bms") / lit(bucketMs)).cast("long").as("b"), col("n")))
    val pairs = counts.as("x")
      .join(counts.as("y"), col("x.metric") === col("y.metric") && col("x.b") < col("y.b"))
      .select(col("x.metric").as("metric"),
        ((col("y.n") - col("x.n")).cast("double") /
          (col("y.b") - col("x.b")).cast("double")).as("slope"))
    val wS = Window.partitionBy("metric").orderBy("slope")
    val slopes = pairs
      .withColumn("rk", row_number().over(wS))
      .withColumn("np", count(lit(1)).over(Window.partitionBy("metric")))
      .where(col("rk") === expr("(np + 1) div 2")) // integer lower-median rank
      .select(col("metric"), col("np").as("n_pairs"), col("slope"))
    val resid = counts.join(slopes, "metric")
      .select(col("metric"), col("n_pairs"), col("slope"),
        (col("n").cast("double") - col("slope") * col("b").cast("double")).as("r"))
    val wR = Window.partitionBy("metric").orderBy("r")
    resid
      .withColumn("rk", row_number().over(wR))
      .withColumn("nb", count(lit(1)).over(Window.partitionBy("metric")))
      .where(col("rk") === expr("(nb + 1) div 2"))
      .select(col("metric"), col("nb").cast("long").as("n_buckets"),
        col("n_pairs").cast("long").as("n_pairs"), col("slope"), col("r").as("intercept"))
  }
}
