package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Strict-order funnel analysis over an event stream — the conversion query
 * behind "signup → view → purchase within a day": for each user, the FIRST
 * occurrence of step 1, then the first step-2 event strictly after it and
 * within `horizonMs` of it, then the first step-3 event after THAT, and so
 * on. Each inter-step gap is bounded by `horizonMs` (gap-bounded, not
 * total-span-bounded — pinned semantics, mirrored by the oracle). Once a
 * user stalls, every later step is NULL.
 *
 * The reference engine has no funnel operator; this is part of the
 * beyond-reference events family ([[Sessionize]], [[AsOf]]).
 *
 * Scale: step i is one filtered equi-join on the user key plus a min
 * aggregate — no event-to-event self-join, no corpus-wide window; every
 * shuffle is on the user key and each intermediate frame holds at most one
 * row per entered user, so a billion-event day costs steps × (filter scan +
 * user-keyed shuffle).
 *
 * @return one row per user who performed step 1: (user, t1..tn, steps_reached)
 */
object Funnel {

  def funnel(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String], horizonMs: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(horizonMs > 0, "horizonMs must be positive")
    var cur = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    for (i <- 2 to steps.size) {
      val ev = events.where(col(typeCol) === steps(i - 1))
        .select(col(userCol).as("_u"), col(tsCol).as("_ts"))
      // left join: a user with no qualifying step-i event keeps the earlier
      // timestamps with t_i NULL; a NULL t_{i-1} nulls the join condition,
      // so stalled users can never "skip" into a later step
      val joined = cur.join(ev,
        cur(userCol) === col("_u") && col("_ts") > cur(s"t${i - 1}") &&
          col("_ts") <= cur(s"t${i - 1}") + horizonMs, "left")
      val carried: Seq[Column] = (1 until i).map(j => first(col(s"t$j")).as(s"t$j"))
      cur = joined.groupBy(cur(userCol))
        .agg(carried.head, carried.tail :+ min(col("_ts")).as(s"t$i"): _*)
    }
    val reached = (2 to steps.size)
      .map(i => col(s"t$i").isNotNull.cast("long"))
      .foldLeft(lit(1L))(_ + _)
    cur.withColumn("steps_reached", reached)
  }

  /**
   * Cohort retention: users grouped by their first-activity day, counted on
   * each later day they return — the (cohort_day, day_offset, n_users) grid
   * a retention curve plots. Days are epoch-day buckets of the ms timestamp
   * (integer division, engine-portable). Offset 0 is the cohort's own size.
   *
   * Scale: one per-user min (cohort assignment), one distinct over
   * (user, day) activity, one count aggregate — three user/day-keyed
   * shuffles, nothing quadratic, no window.
   */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    // exact integer FLOOR division, matching the oracle's `//`: Spark's `div`
    // truncates toward zero, which disagrees with floor on negative
    // (pre-1970) timestamps, so correct the truncation by the remainder sign
    val day = expr(
      s"$tsCol div 86400000 - (CASE WHEN $tsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val activity = events.select(col(userCol), day.as("day")).distinct()
    val cohorts = activity.groupBy(col(userCol)).agg(min("day").as("cohort_day"))
    activity.join(cohorts, userCol)
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
