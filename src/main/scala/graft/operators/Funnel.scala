package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
   * STREAMING twin of [[funnel]]: per user, a `flatMapGroupsWithState`
   * whose state is the n step timestamps — n LONGs per entered user,
   * BOUNDED at any volume — replaying the batch rule event by event in
   * ascending event time: t₁ = first step-1 arrival; tᵢ = first step-i
   * arrival with t_{i−1} set, ts > t_{i−1} and ts ≤ t_{i−1}+horizon.
   * Ascending replay makes "first qualifying" IDENTICAL to the batch op's
   * min-aggregates (every event that could lower an earlier step precedes
   * the events it qualifies), so a one-batch stream reproduces the batch
   * frame exactly (spec-pinned); the strict `>` means equal-timestamp ties
   * cannot change any step either way. Cross-batch, events are assumed to
   * arrive in event-time order per user (the tailing assumption of the
   * other twins) — a user's snapshot re-emits each batch their funnel
   * advances.
   *
   * @return (user STRING, ts_steps ARRAY — element i NULL until step i+1
   *         is reached, steps_reached) per user with t₁ set, one snapshot
   *         per micro-batch that touched the user.
   */
  def funnelStream(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], horizonMs: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(horizonMs > 0, "horizonMs must be positive")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val n = steps.size
    val stepIdx = steps.zipWithIndex.toMap
    val unset = Long.MinValue
    val ds = events
      .select(col(userCol).cast("string"), col(tsCol).cast("long"),
        col(typeCol).cast("string"))
      .as[(String, Long, String)]
      .filter((r: (String, Long, String)) => stepIdx.contains(r._3))
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: String, rows: Iterator[(String, Long, String)],
         state: GroupState[Array[Long]]) =>
          val t = state.getOption.getOrElse(Array.fill(n)(unset))
          rows.toSeq.sortBy(_._2).foreach { case (_, ts, tp) =>
            val i = stepIdx(tp)
            if (i == 0) {
              if (t(0) == unset) t(0) = ts
            } else if (t(i) == unset && t(i - 1) != unset &&
                ts > t(i - 1) && ts <= t(i - 1) + horizonMs) {
              t(i) = ts
            }
          }
          state.update(t)
          if (t(0) == unset) Iterator.empty
          else {
            val reached = 1L + (1 until n).count(j => t(j) != unset)
            Iterator.single((user,
              t.toSeq.map(v => if (v == unset) None else Some(v)), reached))
          }
      }
      .toDF(userCol, "ts_steps", "steps_reached")
  }

  /**
   * Step-conversion REPORT over [[funnel]] — the number the dashboard
   * actually shows: per step, how many users reached it, the conversion
   * from the previous step, and the Wilson lower bound on that conversion
   * (the [[ctrWilson]] correction — a 2-of-3 step is not a trustworthy 67%;
   * threshold the bound, not the ratio). One global aggregate over the
   * funnel frame (users-bounded), then n literal rows — no second scan.
   *
   * Determinism: exact integer threshold counts; the conversion and the
   * Wilson chain are the identical pinned IEEE expressions as
   * [[ctrWilson]]'s, guarded NULL when the previous step has no users
   * (ANSI division) and for step 1 (no previous step).
   *
   * @return (step, step_type, n_reached, conv_from_prev, wilson_low) —
   *         one row per funnel step, step 1 with NULL conversion columns.
   */
  def funnelRates(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], horizonMs: Long,
      z: Double = 1.96): DataFrame = {
    val f = funnel(events, userCol, tsCol, typeCol, steps, horizonMs)
    val nSteps = steps.size
    val aggs = (1 to nSteps).map(i =>
      sum(when(col("steps_reached") >= i, 1L).otherwise(0L)).as(s"n$i"))
    // the 1-row reach aggregate is read once per step row below — cut it so
    // the full per-user funnel doesn't re-execute nSteps times
    val one = f.agg(aggs.head, aggs.tail: _*).localCheckpoint(false)
    val z2 = z * z
    val rows = (1 to nSteps).map { i =>
      val convCols: (Column, Column) =
        if (i == 1) (lit(null).cast("double"), lit(null).cast("double"))
        else {
          val n = col(s"n${i - 1}").cast("double")
          val p = col(s"n$i").cast("double") / n
          val low = (p + lit(z2) / (n * 2.0) -
            lit(z) * sqrt(p * (lit(1.0) - p) / n + lit(z2) / (n * n * 4.0))) /
            (lit(1.0) + lit(z2) / n)
          (when(col(s"n${i - 1}") > 0L, p),
            when(col(s"n${i - 1}") > 0L, low))
        }
      one.select(lit(i.toLong).as("step"), lit(steps(i - 1)).as("step_type"),
        col(s"n$i").as("n_reached"),
        convCols._1.as("conv_from_prev"), convCols._2.as("wilson_low"))
    }
    rows.reduce(_.unionByName(_))
  }

  /**
   * Position-based (U-shaped) multi-touch attribution: every conversion
   * credits the touchpoints that preceded it inside `lookbackMs` — 40% to
   * the first touch, 40% to the last, 20% split across the middles (the
   * standard marketing-attribution weighting; 100%/50-50 for one/two
   * touches). Credit is INTEGER BASIS POINTS: the middle share is
   * `2000 div (n-2)` with the remainder granted to the EARLIEST middles,
   * so every conversion's credits sum to exactly 10 000 and the report is
   * bit-deterministic in any engine — no decimal-division drift.
   *
   * Scale: one user-keyed join (conversion × its own user's touches, bounded
   * by per-user activity in the lookback), then rank/count windows
   * partitioned by CONVERSION id — each partition is one conversion's touch
   * list, never corpus-sized.
   *
   * @return one row per (conversion, touch): ids, types, rank, n_touches,
   *         credit_bp
   */
  def attributionMulti(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, convType: String, touchTypes: Seq[String],
      lookbackMs: Long): DataFrame = {
    require(touchTypes.nonEmpty && lookbackMs > 0, "touch types and a positive lookback required")
    val conv = events.where(col(typeCol) === convType)
      .select(col(idCol).as("conv_event_id"), col(userCol).as("user_id"),
        col(tsCol).as("conv_ts"))
    val touch = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(idCol).as("touch_event_id"), col(userCol).as("_u"),
        col(typeCol).as("touch_type"), col(tsCol).as("touch_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_event_id").orderBy(col("touch_ts"), col("touch_event_id"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("conv_event_id")
    conv.join(touch,
        col("user_id") === col("_u") && col("touch_ts") < col("conv_ts") &&
          col("touch_ts") >= col("conv_ts") - lookbackMs)
      .select(col("conv_event_id"), col("user_id"), col("conv_ts"),
        col("touch_event_id"), col("touch_type"), col("touch_ts"))
      .withColumn("touch_rank", row_number().over(w).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(wn))
      .withColumn("credit_bp", expr(
        """CAST(CASE WHEN n_touches = 1 THEN 10000
          |          WHEN n_touches = 2 THEN 5000
          |          WHEN touch_rank = 1 OR touch_rank = n_touches THEN 4000
          |          ELSE 2000 div (n_touches - 2)
          |               + (CASE WHEN touch_rank - 1 <= 2000 % (n_touches - 2)
          |                       THEN 1 ELSE 0 END)
          |     END AS BIGINT)""".stripMargin))
  }

  /**
   * Top-k heavy hitters per (group, UTC day) — the per-window contributor
   * audit behind abuse/skew detection and hot-key discovery: which ids
   * dominate each group's daily volume?
   *
   * Scale: counts aggregate map-side (partial combine) on the composite
   * (group, day, id) key; ranking rides the k-bounded
   * [[graft.functions.TopKScoreIdAgg]] — each task folds its counts into a
   * k-entry buffer, so no corpus-sized rank window exists anywhere. Count
   * ties break toward the LOWER id (score desc, id asc), fully deterministic.
   */
  def heavyHitters(events: DataFrame, keyCol: String, tsMsCol: String,
      idCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, "k >= 1")
    // exact integer FLOOR division (see retention's negative-ts note)
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val counts = events.select(col(keyCol), day.as("day"), col(idCol))
      .groupBy(col(keyCol), col("day"), col(idCol))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col(keyCol), col("day"))
      .agg(graft.functions.TopKScoreIdAgg
        .topKScoreId(col("n").cast("double"), col(idCol), k).as("tk"))
      .select(col(keyCol), col("day"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col(keyCol), col("day"), col("e.id").as(idCol),
        col("e.score").cast("long").as("n"), (col("pos") + 1).cast("long").as("rank"))
  }

  /**
   * Day-over-day volume trend per group — the monitoring view over an event
   * stream: daily counts with the previous day's count, absolute delta, and
   * percent change (NULL when there is no previous day).
   *
   * Scale: the corpus collapses to one (group, day) count row map-side; the
   * lag window then runs over the tiny aggregated frame (distinct days per
   * group), never the raw events. Deltas are LONG arithmetic; pct_change is
   * one IEEE division per row.
   */
  def dailyTrend(events: DataFrame, keyCol: String, tsMsCol: String): DataFrame = {
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val counts = events.select(col(keyCol), day.as("day"))
      .groupBy(col(keyCol), col("day")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("day"))
    counts
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(col(keyCol), col("day"), col("n"), col("prev_day"), col("prev_n"),
        (col("n") - col("prev_n")).as("delta"),
        when(col("prev_n") > 0,
          (col("n") - col("prev_n")).cast("double") / col("prev_n")).as("pct_change"))
  }

  /**
   * First-order path transitions — the Markov view of a behavioral stream
   * ("after a view, 40% purchase, 35% bounce"): per entity, consecutive
   * event-type pairs in time order; per (from, to) pair, the transition
   * count and probability. Feeds journey analysis, bot fingerprinting
   * (machine paths are low-entropy), and synthetic-session generation.
   *
   * Determinism: the ordering tie-breaks on `idCol`; counts are LONG; the
   * probability is ONE mirrored IEEE division `n / n_from` per output row.
   * Scale: one entity-keyed shuffle for the lag window, then two
   * aggregates over the tiny (type × type) frame.
   */
  def pathTransitions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val steps = events.select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("from_type", lag(col(typeCol), 1).over(order))
      .where(col("from_type").isNotNull)
    val counts = steps.groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum("n").as("n_from"))
    counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from")).as("p"))
  }

  /**
   * Per-entity path diversity via GINI impurity — the second bot tell
   * (complementing [[graft.operators.Anomaly.botFlag]]'s timing tells):
   * machine traffic walks low-diversity paths (one transition repeated),
   * humans wander. Per entity: transition total, distinct (from, to) pair
   * count, `gini = 1 − Σnᵢ²/total²` over its transition distribution, and a
   * low-diversity flag (`total ≥ minTransitions` and `gini ≤ maxGini`).
   *
   * Gini, not Shannon entropy, ON PURPOSE: entropy needs `log`, whose
   * last-ulp rounding differs across engines/libms, while Gini is exact
   * integer sums (Σn² in DECIMAL(38,0) — a 10⁹-event entity would overflow
   * LONG) plus ONE mirrored double expression. Same discriminative use,
   * bit-reproducible.
   *
   * Scale: the [[pathTransitions]] window shuffle, then entity-keyed
   * aggregates only.
   */
  def userPathGini(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, minTransitions: Long = 10L,
      maxGini: Double = 0.2): DataFrame = {
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val steps = events.select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("from_type", lag(col(typeCol), 1).over(order))
      .where(col("from_type").isNotNull)
    val ut = steps.groupBy(col(userCol), col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val gini = expr(
      "CAST(1.0 AS DOUBLE) - CAST(sumsq AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))")
    ut.groupBy(col(userCol))
      .agg(sum(col("n")).as("total"),
        count(lit(1)).as("n_pairs"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("sumsq"))
      .select(col(userCol), col("total"), col("n_pairs"), gini.as("gini"),
        when(col("total") >= minTransitions && gini <= maxGini, 1L)
          .otherwise(0L).as("is_low_diversity"))
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

  /**
   * Weekly CHURN — the retention grid's actionable inverse: per epoch week,
   * how many active users return the NEXT week vs churn. One (user, week)
   * distinct, one self-join on (user, week+1), one week rollup — the same
   * machinery as [[retention]] pointed at the one number growth teams act
   * on. The last observed week has no next-week data; its churn reads 1.0
   * by construction and the `is_last_week` flag marks it unjudgeable.
   *
   * @return (week, n_active, n_retained, n_churned, churn_rate,
   *         is_last_week)
   */
  def churn(events: DataFrame, userCol: String = "user_id",
            tsMsCol: String = "ts_ms"): DataFrame = {
    val week = expr(
      s"($tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)) div 7" +
        s" - (CASE WHEN ($tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)) % 7 < 0 THEN 1 ELSE 0 END)")
    // cached: the shifted self-join side, the max-week scalar and the main
    // branch all read the distinct (user, week) frame
    val activity = Frames.cached(
      events.select(col(userCol).as("user"), week.as("week")).distinct())
    val next = activity.select(col("user"), (col("week") - 1).as("week"), lit(1).as("ret"))
      .groupBy("user", "week").agg(max("ret").as("ret"))
    val maxWeek = broadcast(activity.agg(max("week").as("max_week")))
    activity.join(next, Seq("user", "week"), "left")
      .groupBy("week")
      .agg(count(lit(1)).as("n_active"),
        count(col("ret")).as("n_retained"))
      .crossJoin(maxWeek)
      .select(col("week"), col("n_active"), col("n_retained"),
        (col("n_active") - col("n_retained")).as("n_churned"),
        ((col("n_active") - col("n_retained")).cast("double") /
          col("n_active").cast("double")).as("churn_rate"),
        when(col("week") === col("max_week"), 1L).otherwise(0L).as("is_last_week"))
  }

  /**
   * Hour-of-day × day-of-week SEASONALITY profile — the traffic heatmap
   * alerting baselines come from: per (day-of-week, hour-of-day) cell,
   * event count and share of total. Day-of-week is epoch-day mod 7 with
   * day 0 = Thursday (1970-01-01) — a documented integer convention, not a
   * locale call, so every engine agrees without timezone machinery.
   *
   * Scale: ONE map-side-combined aggregate over row-wise integer keys plus
   * a 1-row broadcast total. @return (dow, hour, n_events, share).
   */
  def seasonality(events: DataFrame, tsMsCol: String = "ts_ms"): DataFrame = {
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val hour = expr(
      s"($tsMsCol div 3600000 - (CASE WHEN $tsMsCol % 3600000 < 0 THEN 1 ELSE 0 END)) % 24")
    // cached (≤168 rows): the share scalar re-ran the corpus aggregate
    val cells = Frames.cached(events
      .select(pmod(day, lit(7L)).as("dow"), pmod(hour, lit(24L)).as("hour"))
      .groupBy("dow", "hour").agg(count(lit(1)).as("n_events")))
    cells.crossJoin(broadcast(cells.agg(sum("n_events").as("total"))))
      .select(col("dow"), col("hour"), col("n_events"),
        (col("n_events").cast("double") / col("total").cast("double")).as("share"))
  }

  /**
   * New-vs-returning daily split — the growth dashboard's first row: per
   * day, users seen for the FIRST time that day vs returning users, and
   * the new-user fraction. Derivative of the [[retention]] cohort
   * machinery (first-activity day per user), rolled to the day level.
   *
   * Scale: one (user, day) distinct, one user-keyed min (both map-side
   * combinable), one day-keyed count — no window, no explode.
   *
   * @return (day, n_new, n_returning, n_active, frac_new)
   */
  def newVsReturning(events: DataFrame, userCol: String = "user_id",
                     tsMsCol: String = "ts_ms"): DataFrame = {
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val activity = events.select(col(userCol).as("user"), day.as("day")).distinct()
    val first = activity.groupBy("user").agg(min("day").as("first_day"))
    activity.join(first, "user")
      .groupBy("day")
      .agg(count(when(col("day") === col("first_day"), 1)).as("n_new"),
        count(when(col("day") =!= col("first_day"), 1)).as("n_returning"),
        count(lit(1)).as("n_active"))
      .select(col("day"), col("n_new"), col("n_returning"), col("n_active"),
        (col("n_new").cast("double") / col("n_active").cast("double")).as("frac_new"))
  }

  /**
   * RFM segmentation base — the classic commerce triple per user: Recency
   * (days between the user's last conversion event and the corpus's last
   * day — data-anchored, so the gate is deterministic at any scale factor),
   * Frequency (conversion count), Monetary (exact-decimal value sum). The
   * raw triple is the input every downstream segmentation (quintile grids,
   * k-means tiers) starts from; quantile cuts are left to the caller
   * because they need a corpus-wide rank pass this operator deliberately
   * avoids.
   *
   * Scale: one filtered user-keyed aggregate (map-side combined) and a
   * 1-row broadcast max-day anchor. No window, no join beyond the scalar.
   *
   * @return (user, last_day, recency_days, frequency, monetary)
   */
  def rfm(events: DataFrame, userCol: String = "user_id", tsMsCol: String = "ts_ms",
          typeCol: String = "event_type", convType: String = "purchase",
          valueCol: String = "value"): DataFrame = {
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val conv = events.where(col(typeCol) === convType)
      .select(col(userCol), day.as("day"), col(valueCol))
    val anchor = broadcast(conv.agg(max("day").as("anchor_day")))
    conv.groupBy(col(userCol))
      .agg(max("day").as("last_day"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("monetary"))
      .crossJoin(anchor)
      .select(col(userCol), col("last_day"),
        (col("anchor_day") - col("last_day")).as("recency_days"),
        col("frequency"), col("monetary"))
  }

  /**
   * Two-variant experiment report — the A/B readout as ONE row: per-variant
   * exposed-user and converted-user counts, conversion rates, absolute and
   * relative lift, and the pooled two-proportion z statistic. The z formula
   * is the standard pooled test, evaluated in ONE pinned double expression
   * order (pooled rate from exact integers, then sqrt) so any engine
   * reproduces it bit-for-bit; significance thresholds are the reader's
   * call (1.96 ≈ 95%), not baked in.
   *
   * Scale: conversion is a per-user flag aggregate (user-keyed, map-side),
   * variants collapse to a 2-row frame, and the report is a self-join of
   * that tiny frame — nothing corpus-sized past the first aggregate.
   *
   * @param variantCol 2-valued column; rows with NULL variant are excluded
   * @return one row: (n_a, conv_a, rate_a, n_b, conv_b, rate_b,
   *         lift_abs, lift_rel, z_stat) where a/b = ascending variant order
   */
  /**
   * CUPED variance-reduced A/B readout (Deng et al. 2013) — the adjustment
   * every mature experimentation platform applies before reading
   * [[abReport]]'s z: a user's PRE-period activity explains much of their
   * post-period variance, so ŷ = y − θ·(x − x̄) with θ = cov(x,y)/var(x)
   * shrinks the noise without biasing the mean (θ is computed pooled, so
   * both variants shift identically in expectation under the null).
   *
   * Here x = the user's event count in the first half of the observed day
   * range, y = the count in the second half; the split day is the integer
   * midpoint of the data's own [min, max] day span (deterministic at any
   * SF). Every user seen in either period enters with missing-period
   * counts as 0 — the standard all-enrolled frame.
   *
   * Determinism: per-user counts are exact integers; the moment sums
   * (Σx, Σy, Σxy, Σx²) accumulate in DECIMAL(38,0) (products overflow LONG
   * at 100 TB — the [[Sketches.amsF2]] convention); θ and the adjusted
   * means are a pinned IEEE chain over the exact sums, mirrored by the
   * oracle. θ is NULL (and the adjusted mean falls back to the raw mean)
   * when var(x) = 0.
   *
   * Scale: one (variant, user) aggregate (map-side combined), one
   * all-users moment row + per-variant sums (broadcast scalars), no
   * window, no join beyond the 1-row attaches.
   *
   * @return one row per variant: (variant, n_users, mean_pre, mean_post,
   *         theta, mean_adjusted)
   */
  def cupedReport(events: DataFrame, variantCol: String,
      userCol: String = "user_id", tsMsCol: String = "ts_ms"): DataFrame = {
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val days = events.agg(min(day).as("d0"), max(day).as("d1"))
      .select(expr("(d0 + d1) div 2").as("mid"))
    // cached (user-count narrow rows): the pooled moments and the per-
    // variant rollup both read it — uncut, each re-ran the events scan
    val perUser = Frames.cached(events.where(col(variantCol).isNotNull)
      .crossJoin(broadcast(days))
      .groupBy(col(variantCol).as("variant"), col(userCol))
      .agg(sum(when(day < col("mid"), 1L).otherwise(0L)).as("x"),
        sum(when(day >= col("mid"), 1L).otherwise(0L)).as("y")))
    // pooled moments in exact DECIMAL(38,0): theta shared by both variants
    val xd = col("x").cast(DecimalType(38, 0))
    val moments = broadcast(perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(xd * col("y")).as("sxy"), sum(xd * col("x")).as("sxx")))
    val perVariant = perUser.groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("vx"), sum(col("y")).as("vy"))
    val nD = col("n").cast("double")
    // theta = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), exact integer num/den
    val num = col("n").cast(DecimalType(38, 0)) * col("sxy") -
      col("sx").cast(DecimalType(38, 0)) * col("sy")
    val den = col("n").cast(DecimalType(38, 0)) * col("sxx") -
      col("sx").cast(DecimalType(38, 0)) * col("sx")
    val theta = when(den =!= lit(0).cast(DecimalType(38, 0)),
      num.cast("double") / den.cast("double"))
    val meanPre = col("vx").cast("double") / col("n_users").cast("double")
    val meanPost = col("vy").cast("double") / col("n_users").cast("double")
    val meanXAll = col("sx").cast("double") / nD
    perVariant.crossJoin(moments)
      .select(col("variant"), col("n_users"),
        meanPre.as("mean_pre"), meanPost.as("mean_post"),
        theta.as("theta"),
        (meanPost - coalesce(theta, lit(0.0)) * (meanPre - meanXAll))
          .as("mean_adjusted"))
  }

  def abReport(events: DataFrame, variantCol: String, userCol: String = "user_id",
               typeCol: String = "event_type", convType: String = "purchase"): DataFrame = {
    val perUser = events.where(col(variantCol).isNotNull)
      .groupBy(col(variantCol).as("variant"), col(userCol))
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L)).as("converted"))
    // cached (variant-count rows): the two limit branches below each
    // re-executed the full per-user conversion aggregate
    val perVariant = Frames.cached(perUser.groupBy("variant")
      .agg(count(lit(1)).as("n_users"), sum("converted").as("n_conv")))
    val a = perVariant.orderBy("variant").limit(1)
      .select(col("n_users").as("n_a"), col("n_conv").as("conv_a"))
    val b = perVariant.orderBy(col("variant").desc).limit(1)
      .select(col("n_users").as("n_b"), col("n_conv").as("conv_b"))
    val rateA = col("conv_a").cast("double") / col("n_a").cast("double")
    val rateB = col("conv_b").cast("double") / col("n_b").cast("double")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    a.crossJoin(b)
      .select(col("n_a"), col("conv_a"), rateA.as("rate_a"),
        col("n_b"), col("conv_b"), rateB.as("rate_b"),
        (rateB - rateA).as("lift_abs"),
        when(rateA > 0, (rateB - rateA) / rateA).as("lift_rel"),
        when(se > 0, (rateB - rateA) / se).as("z_stat"))
  }

  /**
   * Time-to-convert distribution — how long between the last touch and the
   * conversion it preceded, as a log2-banded histogram: the latency view
   * [[attributionMulti]]'s credit split doesn't carry (credits say WHO,
   * this says HOW FAST), and the input every attribution-window choice
   * (the 7-day lookback) should be derived from rather than guessed.
   *
   * Per conversion event, delay = its timestamp minus the same user's most
   * recent PRIOR touch (click/view), computed with a carry-forward max
   * window per user — the [[graft.operators.Sessionize]] shape, one
   * user-keyed sort, no events×events join. Conversions with no prior
   * touch land in the `no_touch` bucket (-1). Log2 banding is the integer
   * digit-count trick ([[activityHistogram]]) — no float log.
   *
   * @return (delay_bucket, min_delay_ms, n_conversions, n_users) — bucket
   *         −1 = never-touched; bucket b covers [2^b, 2^(b+1)) ms, with
   *         delay 0 in bucket 0.
   */
  def timeToConvert(events: DataFrame, userCol: String = "user_id",
                    tsMsCol: String = "ts_ms", idCol: String = "event_id",
                    typeCol: String = "event_type", convType: String = "purchase",
                    touchTypes: Seq[String] = Seq("click", "view")): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsMsCol), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val lastTouch = max(when(col(typeCol).isin(touchTypes: _*), col(tsMsCol))).over(w)
    val conv = events
      .withColumn("last_touch_ms", lastTouch)
      .where(col(typeCol) === convType)
      .select(col(userCol).as("user"),
        (col(tsMsCol) - col("last_touch_ms")).as("delay_ms"))
    // delay 0 (same-ms touch) -> bin("0") has length 1 -> bucket 0, like 1 ms
    val bucket = when(col("delay_ms").isNull, lit(-1L))
      .otherwise((length(bin(greatest(col("delay_ms"), lit(1L)))) - 1).cast("long"))
    conv.groupBy(bucket.as("delay_bucket"))
      .agg(count(lit(1)).as("n_conversions"), countDistinct(col("user")).as("n_users"))
      .select(col("delay_bucket"),
        when(col("delay_bucket") >= 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(delay_bucket AS INT))")).as("min_delay_ms"),
        col("n_conversions"), col("n_users"))
  }

  /**
   * DAU / rolling-MAU stickiness — the engagement ratio product teams watch
   * daily: per day, distinct active users that day (DAU), distinct users
   * active in the trailing `windowDays` window (MAU), and their ratio. The
   * rolling distinct is computed EXACTLY by the [[graft.operators
   * .Sessionize.slidingCounts]] trick: each (user, day) activity row
   * explodes into the `windowDays` window-END days it counts toward, then
   * one distinct aggregate per (end day, user) — no per-day window scan,
   * no approximate sketch silently standing in for the metric. (At extreme
   * scale the explode factor IS the cost — swap in
   * `approx_count_distinct` consciously, with its error contract, not
   * here by default.)
   *
   * Days with no activity of their own don't appear (DAU would be 0);
   * window-end days before the first full window still report their
   * partial window, as every dashboard does.
   *
   * @return (day, dau, mau, stickiness) — stickiness = dau/mau in (0, 1].
   */
  def stickiness(events: DataFrame, userCol: String = "user_id",
                 tsMsCol: String = "ts_ms", windowDays: Int = 28): DataFrame = {
    require(windowDays >= 1 && windowDays <= 92, "windowDays in [1, 92]")
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val activity = events.select(col(userCol).as("user"), day.as("day")).distinct()
    val dau = activity.groupBy("day").agg(count(lit(1)).as("dau"))
    val mau = activity
      .select(col("user"), explode(sequence(lit(0), lit(windowDays - 1))).as("i"),
        col("day"))
      .select(col("user"), (col("day") + col("i")).as("day"))
      .groupBy("day").agg(countDistinct("user").as("mau"))
    dau.join(mau, "day")
      .select(col("day"), col("dau"), col("mau"),
        (col("dau").cast("double") / col("mau").cast("double")).as("stickiness"))
  }

  /**
   * User-activity histogram on LOG2 buckets — the whale-vs-long-tail
   * distribution view ("how concentrated is our event volume?") without the
   * global sort a Lorenz/Gini computation needs: per power-of-two band of
   * per-user event count (bucket b covers [2^b, 2^(b+1))), the number of
   * users, their total events, and both shares. Concentration reads off
   * directly — a healthy product shows event mass spread over mid buckets;
   * a bot-skewed one puts most mass in the top band.
   *
   * Determinism/scale: bucket = floor(log2 n) computed as binary-digit
   * count − 1 (pure integer — no float log at power-of-two boundaries);
   * one user-keyed count (map-side combined), one ≤64-row bucket aggregate,
   * one 1-row broadcast total. No window anywhere — the reason this view
   * scales where a ranked Lorenz curve needs shard tricks.
   *
   * @return (bucket, min_events, n_users, n_events, user_share, event_share)
   */
  def activityHistogram(events: DataFrame, userCol: String = "user_id"): DataFrame = {
    val perUser = events.groupBy(col(userCol)).agg(count(lit(1)).as("n"))
    // cached (≤64 rows): the share scalar re-ran the per-user aggregate
    val buckets = Frames.cached(perUser
      .groupBy((length(bin(col("n"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_users"), sum("n").as("n_events")))
    val totals = broadcast(buckets.agg(
      sum("n_users").as("t_users"), sum("n_events").as("t_events")))
    buckets.crossJoin(totals)
      .select(col("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))").as("min_events"),
        col("n_users"), col("n_events"),
        (col("n_users").cast("double") / col("t_users").cast("double")).as("user_share"),
        (col("n_events").cast("double") / col("t_events").cast("double")).as("event_share"))
  }

  /**
   * Cohort LTV curves — [[retention]]'s revenue sibling: users cohorted by
   * their FIRST conversion day, each later conversion's value attributed to
   * (cohort_day, day_offset), with the running cumulative revenue per
   * cohort — the payback-period view ("day-30 LTV of the March-3 cohort")
   * that growth spend is actually planned against.
   *
   * Exactness: day buckets use the same negative-safe floor division as
   * [[retention]]; revenue sums are exact DECIMAL(18,6) (the source-measure
   * rule), including the cumulative — decimal addition is order-free, so
   * the running sum needs no sorted fold. The cum window runs over the
   * COMPACT (cohort × offset) frame, ordered by the unique offset.
   *
   * @return (cohort_day, day_offset, n_users, revenue, cum_revenue)
   */
  def cohortLtv(events: DataFrame, userCol: String = "user_id",
                tsMsCol: String = "ts_ms", valueCol: String = "value",
                convType: String = "purchase",
                typeCol: String = "event_type"): DataFrame = {
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val conv = events.where(col(typeCol) === convType)
      .select(col(userCol).as("u"), day.as("day"),
        col(valueCol).cast("decimal(18,6)").as("v"))
    val cohort = conv.groupBy("u").agg(min(col("day")).as("cohort_day"))
    val cells = conv.join(cohort, "u")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("u")).as("n_users"), sum(col("v")).as("rev"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort_day").orderBy("day_offset")
    cells
      .withColumn("cum", sum(col("rev")).over(w))
      .select(col("cohort_day"), col("day_offset"), col("n_users"),
        col("rev").cast("double").as("revenue"),
        col("cum").cast("double").as("cum_revenue"))
  }

  /**
   * Hour-of-day ENTROPY per event type — the temporal-concentration audit
   * [[seasonality]]'s raw heatmap rolls up to one number: organic human
   * traffic spreads over waking hours (entropy near ln 24 ≈ 3.18 nats),
   * cron jobs and bot bursts concentrate in one or two cells (entropy → 0,
   * max_share → 1). The number a monitoring rule can threshold where the
   * heatmap needs an eyeball.
   *
   * Determinism: hour shares are exact integer ratios; each `p·ln p` term
   * is quantized to DECIMAL(28,12) (the BM25-family ln idiom) so the ≤24
   * per-type terms sum exactly in any order and any engine. Assumes
   * non-negative epoch timestamps (the hour-of-day modulus).
   *
   * Scale shape: one (type × 24)-bounded count aggregate with map-side
   * combine; everything after it is tiny.
   *
   * @return (event_type, n_events, n_hours, max_share, entropy_nats)
   */
  def hourEntropy(events: DataFrame, typeCol: String = "event_type",
                  tsMsCol: String = "ts_ms"): DataFrame = {
    // NULL-key contract: the pre-window form derived totals with an INNER
    // join on event_type, which drops a NULL type group (NULL != NULL);
    // a partition window would retain it as its own partition. Filter
    // first so the window form keeps the original (and oracle-SQL join
    // form) semantics for corpora with NULL keys.
    val c = events
      .where(col(typeCol).isNotNull)
      .groupBy(col(typeCol).as("event_type"),
        expr(s"($tsMsCol div 3600000) % 24").as("hour"))
      .agg(count(lit(1)).as("c"))
    // per-type totals via a window over the (types x 24)-bounded cell frame
    // (the bigramEntropy rewrite, same arithmetic): the aggregate-and-join-
    // back form re-ran the corpus aggregate for the totals branch
    val wT = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val p = col("c").cast("double") / col("n_events").cast("double")
    c.withColumn("n_events", sum(col("c")).over(wT))
      .withColumn("n_hours", count(lit(1)).over(wT))
      .withColumn("max_c", max(col("c")).over(wT))
      .groupBy(col("event_type"), col("n_events"), col("n_hours"), col("max_c"))
      .agg((-sum((p * log(p)).cast("decimal(28,12)"))).cast("double")
        .as("entropy_nats"))
      .select(col("event_type"), col("n_events"), col("n_hours"),
        (col("max_c").cast("double") / col("n_events").cast("double"))
          .as("max_share"),
        col("entropy_nats"))
  }

  /**
   * Concentration (Lorenz/Pareto) report: what share of all events the most
   * active `pct`% of entities generate — THE skew number for a traffic or
   * training-data mix ("the top 1% of users are 40% of events" decides rate
   * limits; "the top 1% of domains are half the corpus" decides source
   * caps, and pairs with [[activityHistogram]]'s log2 view).
   *
   * Exactness & scale in one move: users with the SAME event count are
   * interchangeable, so the Lorenz curve is fully determined by the
   * per-count-VALUE rollup `(c, n_users, n_events)` — a frame bounded by
   * the number of distinct activity levels (≪ users; ≤ max-activity many).
   * The one unpartitioned window runs over THAT compact frame (never over
   * users or events), and the boundary group contributes a partial
   * `(top_n − cum_users) · c` — exact integers end to end; `share` is the
   * single closing division.
   *
   * @return (pct_users, n_top_users, n_events_top, share) one row per
   *         requested percentile, top_n floored at 1 user.
   */
  def paretoReport(events: DataFrame, userCol: String = "user_id",
                   pcts: Seq[Int] = Seq(1, 5, 10, 25, 50, 100)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100), "pcts in [1,100]")
    val counts = events.groupBy(col(userCol).as("user")).agg(count(lit(1)).as("c"))
    // cached (distinct-count-values rows): the cumulative window and the
    // totals scalar both read it — uncut, each re-ran the per-user aggregate
    val g = Frames.cached(counts.groupBy("c").agg(count(lit(1)).as("nu"))
      .select(col("c"), col("nu"), (col("c") * col("nu")).as("ev")))
    // distinct count values are unique -> the desc order needs no tie-break
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = g
      .withColumn("cum_users", coalesce(sum(col("nu")).over(w), lit(0L)))
      .withColumn("cum_ev", coalesce(sum(col("ev")).over(w), lit(0L)))
    val totals = broadcast(g.agg(
      sum(col("nu")).as("n_users"), sum(col("ev")).as("n_events")))
    cum.crossJoin(totals)
      .select(col("c"), col("nu"), col("ev"), col("cum_users"), col("cum_ev"),
        col("n_users"), col("n_events"),
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct_users"))
      .withColumn("top_n",
        greatest(lit(1L), expr("(pct_users * n_users) div 100")))
      .where(col("cum_users") < col("top_n") &&
        col("cum_users") + col("nu") >= col("top_n"))
      .select(col("pct_users"), col("top_n").as("n_top_users"),
        (col("cum_ev") + (col("top_n") - col("cum_users")) * col("c"))
          .as("n_events_top"),
        col("n_events"))
      .select(col("pct_users"), col("n_top_users"), col("n_events_top"),
        (col("n_events_top").cast("double") / col("n_events").cast("double"))
          .as("share"))
  }

  /**
   * STATIONARY DISTRIBUTION of the event-type Markov chain — where
   * [[pathTransitions]]' one-step matrix settles after many steps: the
   * long-run share of traffic each state absorbs, the "which screen do
   * users actually live on" number one power iteration short of the raw
   * transition counts. States with no outgoing transition get a SELF-LOOP
   * (the absorbing-state convention), so the chain is defined everywhere.
   *
   * Integer fixed point end to end (the [[graft.operators.Graph.pageRank]]
   * contract): mass starts uniform at `scale div n_states`; each iteration
   * moves `π(x)·n(x,y) div out(x)` along every observed edge — per-edge
   * floor, exact DECIMAL product (counts at 100 TB overflow a LONG
   * multiply), LONG state. Floors leak ≤ out-degree units per state per
   * round; no engine float appears until the closing `pi` division.
   *
   * Scale: the one corpus-sized shuffle is [[pathTransitions]]' per-user
   * lag window; every iteration then runs on the (types × types)-bounded
   * edge frame. The one driver action counts STATES (type cardinality —
   * the [[graft.operators.SimilarityIvf]] nLists-style bounded collect).
   *
   * @return (event_type, pi_fp, pi) — fixed-point and double mass per
   *         state after `iters` synchronous steps.
   */
  def markovStationary(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, iters: Int = 6,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 30, "iters in [1, 30]")
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    // the one events-sized pass (per-user lag window + transition count) is
    // cut here: states reads it twice (union sides), dangling and edges once
    // more each — without the cut the window pass re-executes ~4x per run
    val counts = events.select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("from_type", lag(col(typeCol), 1).over(order))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val states = counts.select(col("from_type").as("s"))
      .union(counts.select(col("to_type"))).distinct()
      .localCheckpoint(false)
    val dangling = states
      .join(counts.select(col("from_type").as("s")).distinct(), Seq("s"), "left_anti")
      .select(col("s").as("from_type"), col("s").as("to_type"), lit(1L).as("n"))
    val edges = counts.union(dangling).localCheckpoint(false)
    val outs = edges.groupBy("from_type").agg(sum("n").as("out_n"))
      .localCheckpoint(false)
    val nStates = states.count() // type cardinality — bounded by contract
    if (nStates == 0L) { // no observed transition: empty chain, empty frame
      val s = events.sparkSession
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_type",
            events.schema(typeCol).dataType),
          org.apache.spark.sql.types.StructField("pi_fp",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("pi",
            org.apache.spark.sql.types.DoubleType))))
    } else {
      var pi = states.select(col("s"), lit(scale / nStates).as("pi"))
        .localCheckpoint(false)
      for (_ <- 1 to iters) {
        pi = edges
          .join(pi.withColumnRenamed("s", "from_type"), "from_type")
          .join(outs, "from_type")
          .select(col("to_type").as("s"),
            expr("CAST((CAST(pi AS DECIMAL(38,0)) * n) div out_n AS BIGINT)").as("part"))
          .groupBy("s").agg(sum("part").as("pi"))
          .localCheckpoint(false)
      }
      states.join(pi, Seq("s"), "left")
        .select(col("s").as("event_type"),
          coalesce(col("pi"), lit(0L)).as("pi_fp"),
          (coalesce(col("pi"), lit(0L)).cast("double") / lit(scale.toDouble)).as("pi"))
    }
  }

  /**
   * Frequent 3-step paths — the trigram extension of [[pathTransitions]]:
   * the top `k` (A → B → C) sequences users actually walk, counted over
   * per-user time order. Bigrams say which edges exist; trigrams say which
   * FLOWS exist (search → view → purchase vs search → view → search is the
   * difference a funnel designer acts on).
   *
   * Scale: two per-user lag columns ride the same window shuffle as the
   * bigram operator; counting aggregates to the (types³)-bounded frame with
   * map-side combine, and the rank window orders THAT frame, never events.
   * Total order (n DESC, then the three types) makes the cut exact.
   *
   * @return (rank, t1, t2, t3, n) — top `k` trigrams.
   */
  def pathTrigrams(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, k: Int = 50): DataFrame = {
    require(k >= 1, "k >= 1")
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val tri = events.select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("t2", lag(col(typeCol), 1).over(order))
      .withColumn("t1", lag(col(typeCol), 2).over(order))
      .where(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col(typeCol).as("t3"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
    tri.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("rank"), col("t1"), col("t2"), col("t3"), col("n"))
  }

  /**
   * Hourly CLICK-THROUGH RATE with a Wilson lower bound — the product
   * metric read the raw ratio gets wrong at low volume: a 1-view/1-click
   * hour is NOT a 100%-CTR hour, and the Wilson interval
   * (p + z²/2n − z·√(p(1−p)/n + z²/4n²)) / (1 + z²/n) prices that in
   * (z = 1.96, the 95% bound — the number a ranking/alerting rule should
   * threshold instead of p). The binomial denominator is views; clicks
   * above views (possible in event logs) clamp p to 1.
   *
   * Determinism: exact integer counts; p, the bound, and the clamp are one
   * pinned IEEE chain (sqrt included) mirrored in the oracle. Hours with
   * zero views are absent (no denominator). One hour-bucket aggregate.
   *
   * @return (bucket_ms, n_views, n_clicks, ctr, wilson_low)
   */
  def ctrWilson(events: DataFrame, viewType: String = "view",
                clickType: String = "click", typeCol: String = "event_type",
                tsMsCol: String = "ts_ms", z: Double = 1.96): DataFrame = {
    val hourly = events
      .where(col(typeCol).isin(viewType, clickType))
      .groupBy(expr(s"$tsMsCol div 3600000 * 3600000").as("bucket_ms"))
      .agg(sum(when(col(typeCol) === viewType, 1L).otherwise(0L)).as("n_views"),
        sum(when(col(typeCol) === clickType, 1L).otherwise(0L)).as("n_clicks"))
      .where(col("n_views") > 0L)
    val n = col("n_views").cast("double")
    val p = least(lit(1.0), col("n_clicks").cast("double") / n)
    val z2 = z * z
    val low = (p + lit(z2) / (n * 2.0) -
      lit(z) * sqrt(p * (lit(1.0) - p) / n + lit(z2) / (n * n * 4.0))) /
      (lit(1.0) + lit(z2) / n)
    hourly.select(col("bucket_ms"), col("n_views"), col("n_clicks"),
      p.as("ctr"), low.as("wilson_low"))
  }

  /**
   * SAMPLE-RATIO-MISMATCH check — the assignment-integrity test that must
   * pass BEFORE [[abReport]]'s effect readout means anything: a chi-square
   * of the observed user split against the DESIGNED treat share. A biased
   * logger, a bot filter hitting one arm, or a broken hash bucketing shows
   * up here as chi² past the 95% cut (3.841, df=1) long before anyone
   * notices the metric moved.
   *
   * Determinism: user counts are exact integers; expectations and the two
   * chi² cells are one pinned double chain (`expectedTreatBp` basis points
   * keep the design share exact). Scale: one distinct-user aggregate, then
   * a 2-row rollup.
   *
   * @return one row: (n_users, n_treat, n_control, expected_treat, chi2,
   *         srm_flag)
   */
  def srmCheck(events: DataFrame, variantCol: String = "variant",
               userCol: String = "user_id", treatLabel: String = "treat",
               expectedTreatBp: Long = 5000L): DataFrame = {
    require(expectedTreatBp > 0L && expectedTreatBp < 10000L,
      "expectedTreatBp in (0, 10000)")
    val users = events.select(col(variantCol).as("variant"), col(userCol).as("u"))
      .distinct()
    val counts = users.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("variant") === treatLabel, 1L).otherwise(0L)).as("n_treat"))
      .select(col("n_users"), col("n_treat"),
        (col("n_users") - col("n_treat")).as("n_control"))
    val nD = col("n_users").cast("double")
    val eT = nD * lit(expectedTreatBp.toDouble / 10000.0)
    val eC = nD - eT
    val chi2 = (col("n_treat").cast("double") - eT) *
      (col("n_treat").cast("double") - eT) / eT +
      (col("n_control").cast("double") - eC) *
        (col("n_control").cast("double") - eC) / eC
    counts.select(col("n_users"), col("n_treat"), col("n_control"),
      eT.as("expected_treat"), chi2.as("chi2"),
      when(chi2 > 3.841, 1L).otherwise(0L).as("srm_flag"))
  }

  /**
   * AUDIENCE OVERLAP between event types: per type pair, the distinct-actor
   * intersection and Jaccard — the co-engagement matrix behind funnel
   * design ("do viewers purchase?") and cannibalization checks, the
   * type-level analog of [[graft.operators.Graph.covisitation]]'s
   * item-level affinity. Exact integers end to end (distinct counts, one
   * pinned double division).
   *
   * Scale: the self-join meets on the ACTOR key, so a user contributes at
   * most C(types, 2) pair rows — types is a small enum, never
   * corpus-sized; the pair aggregate map-side combines on the (a, b) key.
   *
   * @return (type_a, type_b, n_a, n_b, n_both, jaccard) for a < b pairs
   *         with at least one shared actor.
   */
  def typeOverlap(events: DataFrame, keyCol: String = "event_type",
      idCol: String = "user_id"): DataFrame = {
    // cached: the size aggregate and both overlap-join sides read the
    // distinct (key, id) frame — uncut, each re-ran the corpus distinct
    val ku = Frames.cached(
      events.select(col(keyCol).as("k"), col(idCol).as("id")).distinct())
    val sizes = ku.groupBy("k").agg(count(lit(1)).as("n"))
    val both = ku.as("x").join(ku.as("y"),
        col("x.id") === col("y.id") && col("x.k") < col("y.k"))
      .groupBy(col("x.k").as("type_a"), col("y.k").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(sizes.select(col("k").as("type_a"), col("n").as("n_a")), "type_a")
      .join(sizes.select(col("k").as("type_b"), col("n").as("n_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        (col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double")).as("jaccard"))
  }

  /**
   * Weekday × hour traffic PROFILE per group — the capacity-planning /
   * bot-forensics heatmap beside [[dailyTrend]] (time series) and
   * hour-entropy (one number): counts and within-group shares for each of
   * the 168 weekly cells. Office-hours products show a 5×8 block, crons a
   * single hot column, global consumer traffic a smooth diurnal band.
   *
   * All integer arithmetic (epoch-day floor division; dow 0 = Monday via
   * the +3 offset from the 1970-01-01 Thursday epoch; one pinned double
   * division for the share) — exact in any engine.
   *
   * @return (group, dow, hour, n, share) for non-empty cells.
   */
  def weekdayProfile(events: DataFrame, keyCol: String, tsMsCol: String): DataFrame = {
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val hour = expr(
      s"$tsMsCol div 3600000 - (CASE WHEN $tsMsCol % 3600000 < 0 THEN 1 ELSE 0 END)")
    // NULL-key contract: match the join-form totals (INNER join on the
    // group key drops a NULL-key group; a partition window would keep it)
    val cells = events
      .where(col(keyCol).isNotNull)
      .select(col(keyCol), pmod(day + 3, lit(7)).as("dow"),
        pmod(hour, lit(24)).as("hour"))
      .groupBy(col(keyCol), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"))
    // group totals via a window over the (groups x 168)-bounded cell frame
    // (the langConfusion rewrite): the aggregate-and-join-back form re-ran
    // the corpus aggregate for the totals branch
    cells
      .withColumn("n_total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keyCol)))
      .select(col(keyCol), col("dow"), col("hour"), col("n"),
        (col("n").cast("double") / col("n_total").cast("double")).as("share"))
  }

  /**
   * ROLLING-WINDOW exact distinct actors per (group, day) — the WAU-style
   * "uniques over the trailing N days" view beside [[dailyTrend]]'s
   * same-day counts; the retention/engagement denominator every growth
   * dashboard reads. COUNT DISTINCT over a sliding window has no window-
   * function form in any engine; the scalable shape is contribution
   * EXPLODE: each distinct (group, day, id) row contributes to the N
   * observation days it stays visible in (`sequence(day, day+N−1)`), then
   * ONE (group, obs_day) distinct-count aggregate — map-side factor N, no
   * self-join, no range join, no per-day rescan. Output days are
   * restricted to days the group actually has events (a window anchored
   * on an empty day is dashboard noise).
   *
   * All arithmetic is integer (day floor-division, exact distinct counts)
   * — engine- and parallelism-exact by construction.
   *
   * @return (group, day, day_uniques, rolling_uniques) with
   *         rolling_uniques = |distinct ids in [day−N+1, day]|.
   */
  def rollingUniques(events: DataFrame, keyCol: String, tsMsCol: String,
      idCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays >= 1")
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val kd = events.select(col(keyCol), day.as("day"), col(idCol).as("id")).distinct()
    val dayU = kd.groupBy(col(keyCol), col("day"))
      .agg(count_distinct(col("id")).as("day_uniques"))
    val rolled = kd
      .select(col(keyCol),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1L))).as("day"),
        col("id"))
      .groupBy(col(keyCol), col("day"))
      .agg(count_distinct(col("id")).as("rolling_uniques"))
    rolled.join(dayU, Seq(keyCol, "day"))
      .select(col(keyCol), col("day"), col("day_uniques"), col("rolling_uniques"))
  }
}
