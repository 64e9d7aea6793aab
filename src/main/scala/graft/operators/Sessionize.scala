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
}
