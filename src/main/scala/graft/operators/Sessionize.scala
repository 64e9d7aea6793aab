package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: consecutive events of the same key belong to one
 * session while the gap between them stays <= `gapMs`; a larger gap starts a
 * new session. The standard way behavioral event streams are segmented
 * before funnel/engagement analytics (and before per-session training
 * examples are cut from interaction logs).
 *
 * Shape: ONE shuffle (hash on the key) and one in-partition sort shared by
 * both windows — lag() marks session starts, a running sum numbers them.
 * Session identity is (key, session_seq): no global counter, no second
 * shuffle, deterministic under any parallelism (ties ordered by `tieBreak`).
 * Equivalent to Spark's built-in `session_window` semantics (pinned by
 * spec), but works directly on epoch-ms LONGs and yields a stable per-key
 * sequence number instead of a window struct.
 *
 * A pathologically hot key serializes its partition like any per-entity
 * window; per-entity event counts are bounded in practice (split the time
 * range with carried-in boundary state if one is not).
 */
object Sessionize {

  /** Tag each event with its session: `session_seq` (1-based per key, in
    * time order) rides alongside every input column. */
  def sessions(events: DataFrame, key: String, tsCol: String, tieBreak: String,
               gapMs: Long): DataFrame = {
    val clash = events.columns.filter(Set("_prev", "_new", "session_seq").contains)
    require(clash.isEmpty,
      s"column names collide with sessionization internals: ${clash.mkString(", ")}")
    val order = Window.partitionBy(key).orderBy(col(tsCol), col(tieBreak))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev", lag(col(tsCol), 1).over(order))
      .withColumn("_new",
        (col("_prev").isNull || col(tsCol) - col("_prev") > gapMs).cast("long"))
      .withColumn("session_seq", sum(col("_new")).over(running))
      .drop("_prev", "_new")
  }

  /** Streaming session rollup over Spark's `session_window`: works on a
    * streaming frame with an event-time TIMESTAMP column. State is bounded
    * by the watermark — a session closes (and emits, in append mode) once
    * the watermark passes its end, so a key that goes quiet costs nothing.
    * Semantics match [[sessionStats]] membership for gap-1ms (built-in
    * windows merge on STRICTLY-closer-than-gap events; see spec): per
    * (key, session) the same events aggregate, with the session reported as
    * its `session_window` struct instead of a sequence number (a global
    * per-key sequence is not computable incrementally without keeping every
    * closed session in state). */
  def sessionStatsStream(events: DataFrame, key: String, eventTsCol: String,
                         gap: String, watermarkDelay: String, valueCol: String): DataFrame =
    events
      .withWatermark(eventTsCol, watermarkDelay)
      .groupBy(col(key), session_window(col(eventTsCol), gap).as("session"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("sum_value"))

  /** Per-session rollup: bounds, size, and a value total — the frame a
    * funnel/engagement query starts from. Adds one aggregation exchange on
    * (key, session_seq) after the sessionization shuffle. */
  def sessionStats(events: DataFrame, key: String, tsCol: String, tieBreak: String,
                   gapMs: Long, valueCol: String): DataFrame =
    sessions(events, key, tsCol, tieBreak, gapMs)
      .groupBy(col(key), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("sum_value"))

  /**
   * Peak concurrent sessions per day — the capacity/load view (how many
   * sessions were simultaneously open) that per-day event counts can't
   * answer. Classic sweep line: each session interval contributes +1 at its
   * start and −1 just after its end; the running delta sum at any instant
   * IS the concurrency, and its maximum the peak.
   *
   * Scale shape — the naive sweep is a single global ordered prefix sum
   * (one partition, a scale-killer), so this runs it TWO-LEVEL:
   * 1. intervals are split at day boundaries (each day's sweep is then
   *    self-contained: concurrency at day start is 0 by construction, a
   *    midnight-straddling session re-opens at 00:00 via its next segment);
   * 2. within a day, deltas sort only WITHIN THEIR HOUR (24× the
   *    parallelism, each partition 1/24th the data): per (day, hour) the
   *    local prefix max `hour_max_rel` and total `hour_sum`;
   * 3. per day, a ≤24-row window folds hour totals into carry-ins:
   *    `peak = max(carry + hour_max_rel)` — exact, because the level at any
   *    hour boundary is that hour's carry, and `hour_sum ≤ hour_max_rel`
   *    means boundary levels never exceed some hour's candidate.
   * A session ending on the last ms of a day emits no −1 (nothing after it
   * that day to count); its closure is invisible to the day's maxima.
   *
   * All counts are exact LONGs; tie-groups at one (ts, delta) make the
   * group-boundary prefix values — and therefore every max — independent of
   * intra-group order, so the output is deterministic under any parallelism
   * and reproduces in any engine with the same ORDER BY (ts, delta).
   *
   * Output: `(day, n_sessions, active_ms, peak_concurrency)` — segments
   * touching the day, their total inclusive active milliseconds, the peak.
   */
  def concurrency(events: DataFrame, key: String, tsCol: String, tieBreak: String,
                  gapMs: Long): DataFrame = {
    val iv = sessions(events, key, tsCol, tieBreak, gapMs)
      .groupBy(col(key), col("session_seq"))
      .agg(min(col(tsCol)).as("start_ms"), max(col(tsCol)).as("end_ms"))
    // exact integer FLOOR division (matches the oracle's `//` on negative ts)
    // cached (session-segment-bounded narrow rows): the +1/−1 delta sides
    // and the per-day rollup all read it — uncut, each re-ran the whole
    // sessionization window + interval aggregate over the corpus
    val segs = Frames.cached(iv.selectExpr(
        "start_ms", "end_ms",
        "start_ms div 86400000 - (CASE WHEN start_ms % 86400000 < 0 THEN 1 ELSE 0 END) AS day_a",
        "end_ms div 86400000 - (CASE WHEN end_ms % 86400000 < 0 THEN 1 ELSE 0 END) AS day_b")
      .select(col("start_ms"), col("end_ms"),
        explode(sequence(col("day_a"), col("day_b"))).as("day"))
      .select(col("day"),
        greatest(col("start_ms"), col("day") * 86400000L).as("seg_start"),
        least(col("end_ms"), (col("day") + 1) * 86400000L - 1).as("seg_end")))
    val plus = segs.select(col("day"), col("seg_start").as("ts"), lit(1L).as("delta"))
    val minus = segs
      .where(col("seg_end") + 1 <= (col("day") + 1) * 86400000L - 1)
      .select(col("day"), (col("seg_end") + 1).as("ts"), lit(-1L).as("delta"))
    val deltas = plus.union(minus).selectExpr("day", "ts", "delta",
      "ts div 3600000 - (CASE WHEN ts % 3600000 < 0 THEN 1 ELSE 0 END) AS hr")
    val hw = Window.partitionBy("day", "hr").orderBy(col("ts"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hourly = deltas
      .withColumn("run", sum(col("delta")).over(hw))
      .groupBy("day", "hr")
      .agg(max(col("run")).as("hour_max_rel"), sum(col("delta")).as("hour_sum"))
    val carryW = Window.partitionBy("day").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, -1)
    val peaks = hourly
      .withColumn("carry", coalesce(sum(col("hour_sum")).over(carryW), lit(0L)))
      .groupBy("day")
      .agg(max(col("carry") + col("hour_max_rel")).as("peak_concurrency"))
    segs.groupBy("day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("seg_end") - col("seg_start") + 1).as("active_ms"))
      .join(peaks, "day")
      .select(col("day"), col("n_sessions"), col("active_ms"), col("peak_concurrency"))
  }

  /**
   * SLIDING-window event counts — the overlapping-window monitoring view the
   * tumbling family ([[graft.streaming.SummarizationJob]], dailyTrend) can't
   * express: per `keyCol`, event and distinct-`userCol` counts over every
   * `windowMs` interval that starts on a `slideMs` boundary and covers the
   * event. A 1h window sliding by 15min smooths the hour-boundary artifacts
   * a tumbling hourly count suffers (a burst at :59 vs :01 landing in
   * different buckets) — the standard dashboards-and-alerting shape.
   *
   * Scale: each event explodes into exactly `windowMs/slideMs` (window,
   * key) rows map-side (a SMALL integer by construction — enforced), then
   * ONE aggregate keyed by (key, window_start): counts combine partially;
   * the distinct-user count is Spark's standard two-level expand. No
   * window function, no self-join, no driver state. Floor division is
   * explicit (negative-epoch safe, the [[graft.operators.Funnel]] rule).
   *
   * @param windowMs window length; must be a positive multiple of slideMs
   * @return (key, window_start, n_events, n_users) — window_start in ms;
   *         only non-empty windows appear (counts are never 0).
   */
  def slidingCounts(events: DataFrame, keyCol: String, tsMsCol: String, userCol: String,
                    windowMs: Long = 3600000L, slideMs: Long = 900000L): DataFrame = {
    require(slideMs > 0 && windowMs > 0 && windowMs % slideMs == 0,
      "windowMs must be a positive multiple of slideMs")
    val k = windowMs / slideMs
    require(k <= 64, s"explode factor $k too large (windowMs/slideMs <= 64)")
    // last slide boundary at or before ts (floor-div, negative-safe), then
    // the k windows [boundary - i*slide, +window) covering the event
    val boundary = expr(
      s"($tsMsCol div $slideMs - (CASE WHEN $tsMsCol % $slideMs < 0 THEN 1 ELSE 0 END)) * $slideMs")
    events
      .select(col(keyCol).as("key"), col(userCol).as("user"),
        explode(sequence(lit(0L), lit(k - 1))).as("i"), boundary.as("b"))
      .select(col("key"), col("user"), (col("b") - col("i") * slideMs).as("window_start"))
      .groupBy("key", "window_start")
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user")).as("n_users"))
      .select(col("key").as(keyCol), col("window_start"),
        col("n_events"), col("n_users"))
  }

  /**
   * Streaming form of [[slidingCounts]] — Spark's native sliding
   * `window(event_time, windowDuration, slideDuration)` + watermark, append
   * mode: each window finalizes once the watermark passes its end, exactly
   * the [[graft.streaming.SummarizationJob]] late-data contract. Same
   * window grid as the batch explode form (both align to epoch slide
   * boundaries), so stream output == batch output on the same data (pinned
   * by spec).
   *
   * Exact distinct-user counts are deliberately absent: a streaming
   * `countDistinct` would hold unbounded per-window user sets; the batch
   * form reports them, and a streaming approximation belongs to
   * `approx_count_distinct` with its own error contract, not silently
   * different numbers under the same name.
   */
  def slidingCountsStream(events: DataFrame, keyCol: String, tsMsCol: String,
                          windowMs: Long = 3600000L, slideMs: Long = 900000L,
                          watermarkDelay: String = "1 hour"): DataFrame = {
    require(slideMs > 0 && windowMs > 0 && windowMs % slideMs == 0,
      "windowMs must be a positive multiple of slideMs")
    events
      .withColumn("event_time", timestamp_millis(col(tsMsCol)))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(col(keyCol),
        window(col("event_time"), s"$windowMs milliseconds", s"$slideMs milliseconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), unix_millis(col("window.start")).as("window_start"),
        col("n_events"))
  }
}
