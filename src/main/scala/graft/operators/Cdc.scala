package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot-diff (CDC-style) operators: given two versions of a keyed table
 * — yesterday's corpus drop and today's — classify every key as
 * added / removed / changed / unchanged and report churn per slice.
 *
 * Why this belongs in the engine: dataset versioning is how a 100 TB
 * training pipeline stays debuggable — "what changed between crawl 41 and
 * crawl 42, and in which sources" is the first question after any metric
 * moves. The diff is also the input to incremental processing: only
 * `added`/`changed` keys need re-tokenizing, re-deduping, re-embedding.
 *
 * Scale shape: ONE full outer join on the primary key — both sides shuffle
 * pk-keyed once (sort-merge at corpus scale; AQE handles skewed keys), and
 * everything downstream of the join is row-local. The report is a second
 * hash aggregate on (slice, status) — bounded by slice cardinality.
 *
 * Determinism: status is exact (null-safe equality on integer/string
 * compare columns); counts are exact longs.
 */
object Cdc {

  /** Per-key status frame: `pkCols` name the key, `cmpCols` define
    * "changed" (any null-safe inequality), `carryCols` are slice labels
    * carried through (coalesced old-then-new, so removed rows keep their
    * old label and added rows their new one). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, pkCols: Seq[String],
                   cmpCols: Seq[String], carryCols: Seq[String] = Seq.empty): DataFrame = {
    require(pkCols.nonEmpty && cmpCols.nonEmpty, "pk and compare columns required")
    val all = (pkCols ++ cmpCols ++ carryCols).distinct
    val o = oldDf.select(all.map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select(all.map(c => col(c).as(s"n_$c")): _*)
    val joinCond = pkCols.map(c => o(s"o_$c") <=> n(s"n_$c")).reduce(_ && _)
    val changed = cmpCols.map(c => !(col(s"o_$c") <=> col(s"n_$c"))).reduce(_ || _)
    val status = when(col(s"o_${pkCols.head}").isNull, lit("added"))
      .when(col(s"n_${pkCols.head}").isNull, lit("removed"))
      .when(changed, lit("changed"))
      .otherwise(lit("unchanged"))
    val outCols =
      (pkCols ++ carryCols).map(c => coalesce(col(s"o_$c"), col(s"n_$c")).as(c)) :+
        status.as("status")
    o.join(n, joinCond, "full_outer").select(outCols: _*)
  }

  /** Churn report: per (carry slice, status) key counts plus the slice's
    * row share of each status — the "which sources moved" readout. */
  def diffReport(statusFrame: DataFrame, sliceCols: Seq[String]): DataFrame = {
    val keys = sliceCols :+ "status"
    statusFrame.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
  }

  /** SCD type-2 history build: compress a keyed event stream into validity
    * intervals of an attribute — one row per (key, attribute run) with
    * [valid_from, valid_to) bounds, a per-key version number, and the
    * open-ended current row. The warehouse dimension-table shape, built
    * directly from the raw event log.
    *
    * Scale shape: one key-partitioned window sort finds change points
    * (lag), a second window over the much smaller change-point frame
    * closes the intervals (lead) — both shuffles are key-partitioned, no
    * joins. Ties on the timestamp break by `tieCol` in BOTH windows, so
    * the history is a total function of the data.
    *
    * `tsExpr` should already be in the output unit (e.g. epoch ms). */
  def scd2(df: DataFrame, keyCol: String, attrCol: String,
           tsExpr: org.apache.spark.sql.Column, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol), col(attrCol), tsExpr.as("ts_u"), col(tieCol).as("tie_u"))
    val w1 = Window.partitionBy(col(keyCol)).orderBy(col("ts_u"), col("tie_u"))
    val changes = base
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w1))
      .where(col("prev_attr").isNull || !(col(attrCol) <=> col("prev_attr")))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col("ts_u"), col("tie_u"))
    changes
      .withColumn("valid_from", col("ts_u"))
      .withColumn("valid_to", lead(col("ts_u"), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .withColumn("is_current",
        when(col("valid_to").isNull, lit(1L)).otherwise(lit(0L)))
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("version"), col("is_current"))
  }

  /** Apply a change set to a snapshot — the other half of the CDC loop
    * ([[snapshotDiff]] builds the delta; this merges one in). Changes carry
    * an `op` column (`upsert` | `delete`); the winning change per key is the
    * MAXIMUM under the total order (`orderCol`, op-rank with delete > upsert,
    * op string, `valCols` left-to-right). The intended contract is "last
    * change wins": give each change a unique `orderCol` per (key, op) —
    * commit LSN, change sequence number — and the value columns never
    * decide. At EQUAL (`orderCol`, op) the struct comparison falls through
    * to the value columns, i.e. "max value wins": deterministic, but almost
    * never what a CDC consumer means, so `orderCol` is REQUIRED non-null
    * (enforced per row — a null would silently sort below everything).
    * A same-order delete beats its own upsert (the tombstone contract).
    * Unchanged snapshot keys pass through.
    *
    * Scale shape: the change set folds to one row per key FIRST (a
    * key-partitioned max_by-style struct aggregate — no window over the
    * snapshot), then ONE pk-keyed full outer join against the snapshot; at
    * 100 TB the join is snapshot-sized but the aggregate is delta-sized.
    *
    * Column contract: `snapshot` and `changes` share `pkCols` ++
    * `valCols`; changes add (`op`, orderCol). */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, pkCols: Seq[String],
                   valCols: Seq[String], orderCol: String): DataFrame = {
    require(pkCols.nonEmpty && valCols.nonEmpty, "pk and value columns required")
    // one struct per key: maximal (order, delete-after-upsert, values).
    // raise_error stays inside codegen — no extra validation pass at scale
    val orderChecked = when(col(orderCol).isNull, raise_error(concat(
      lit(s"applyChanges: null $orderCol for key "),
      concat_ws(",", pkCols.map(c => col(c).cast("string")): _*),
      lit(" — the change order must be total")))).otherwise(col(orderCol))
    val opRank = when(col("op") === "delete", lit(1L)).otherwise(lit(0L))
    val packed = struct((orderChecked.as(orderCol) +: opRank.as("_opr") +: col("op").as("_op") +:
      valCols.map(col)): _*)
    val last = changes.groupBy(pkCols.map(col): _*)
      .agg(max(packed).as("_last"))
      .select((pkCols.map(col) :+ col("_last._op").as("_op")) ++
        valCols.map(c => col(s"_last.$c").as(s"_new_$c")): _*)
    val s = snapshot.select((pkCols ++ valCols).map(col): _*)
    val joined = s.join(last, pkCols, "full_outer")
    // delete drops the key; an upsert (matched or new) takes the new values
    joined
      .where(col("_op").isNull || col("_op") =!= "delete")
      .select((pkCols.map(col) ++ valCols.map(c =>
        when(col("_op").isNotNull, col(s"_new_$c")).otherwise(col(c)).as(c))): _*)
  }

  /** Streaming twin of [[scd2]]: per-key open-interval state (attribute,
    * valid_from, version) carried in `flatMapGroupsWithState`; each
    * micro-batch folds its rows in (ts, tie) order and emits every interval
    * it CLOSES (append mode can never retract, so the open current row
    * stays in state — the batch equivalence the spec pins is
    * scd2(batch).where(is_current = 0) == one-batch-stream output).
    *
    * Contract: per-key event time must be non-decreasing ACROSS batches
    * (in-batch disorder is sorted out locally) — the CDC-ingest shape,
    * where upstream delivers each key's changes in commit order. The
    * contract is ENFORCED, not just documented: a batch whose first event
    * time precedes the open interval's valid_from throws (like
    * [[Profiling.completenessStream]]'s day-regression guard) instead of
    * silently emitting an inverted interval. State is one (string, long,
    * long) per key; a key that stops changing costs nothing more. */
  def scd2Stream(df: DataFrame, keyCol: String, attrCol: String,
                 tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(keyCol).cast("long"), col(attrCol).cast("string"),
      col(tsCol).cast("long"), col(tieCol).cast("long"))
      .as[(Long, String, Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[(String, Long, Long)]) =>
          val batch = rows.toVector.sortBy(r => (r._3, r._4))
          var open = state.getOption
          val closed = Vector.newBuilder[(Long, String, Long, Long, Long, Long)]
          batch.foreach { case (_, attr, ts, _) =>
            open match {
              case Some((a, from, _)) if ts < from =>
                // cross-batch time regression: failing loudly beats silently
                // writing an inverted interval (valid_to < valid_from) into
                // a dimension consumers trust for as-of joins
                throw new IllegalStateException(
                  s"event-time regression for key $key: ts=$ts before open " +
                    s"valid_from=$from (attr=$a) — cross-batch order contract")
              case Some((a, from, v)) if a != attr =>
                closed += ((key, a, from, ts, v, 0L))
                open = Some((attr, ts, v + 1))
              case Some(_) => // same attribute: the run continues
              case None => open = Some((attr, ts, 1L))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
      .toDF(keyCol, attrCol, "valid_from", "valid_to", "version", "is_current")
  }

  /** Incrementally extend an SCD2 history ([[scd2]] output schema) with a
    * new batch of events — the maintained-dimension operation: at 100 TB
    * the history is a store directory and each maintenance pass folds in
    * one delta instead of re-windowing the full event log.
    *
    * Mechanics: closed intervals (`is_current = 0`) pass through UNTOUCHED
    * (they are immutable history); each key's open row re-enters the fold
    * as a pseudo-event at its own `valid_from` (tie = Long.MinValue so it
    * sorts first among equal timestamps), unioned with the new events, and
    * the [[scd2]] window re-runs over that delta-plus-open frame only.
    * Versions are then shifted by the key's already-closed count so the
    * numbering continues seamlessly.
    *
    * Contract (ENFORCED): per key, new event times must make STRICT
    * progress past the open interval's `valid_from` — a violating row
    * (ts <= open valid_from) fails the job via `raise_error` rather than
    * silently rewriting closed history. Equal-ts boundary events are
    * rejected, not just regressions: the open row re-enters the fold with
    * tie = Long.MinValue (its real tie is gone once the history is
    * materialized), so an equal-ts delta event would order AFTER the seed
    * here while a one-batch rebuild orders it by the real tie values —
    * outside the N-batch == one-batch equivalence this operator pins.
    * Ties within a batch use `tieCol` (must cast to long).
    *
    * Scale shape: one key-keyed left join of the delta against the OPEN
    * rows (key-cardinality sized, not history-sized), one key-partitioned
    * window over delta-plus-open rows, and a union with the untouched
    * closed history — the closed side is never shuffled, so a pass costs
    * O(delta + open), not O(history). */
  def scd2Apply(history: DataFrame, events: DataFrame, keyCol: String,
                attrCol: String, tsExpr: org.apache.spark.sql.Column,
                tieCol: String): DataFrame = {
    val closed = history.where(col("is_current") === 0L)
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("version"), col("is_current"))
    val open = history.where(col("is_current") === 1L)
      .select(col(keyCol), col(attrCol).as("_open_attr"),
        col("valid_from").as("_open_from"), (col("version") - lit(1L)).as("_voff"))
    val fresh = events.select(col(keyCol), col(attrCol),
      tsExpr.as("ts_u"), col(tieCol).cast("long").as("tie_u"))
    // regression guard + seed: delta joins the (small) open frame once
    val guarded = fresh.join(open, Seq(keyCol), "left")
      .withColumn("ts_u", when(col("_open_from").isNotNull && col("ts_u") <= col("_open_from"),
        raise_error(concat(lit("scd2Apply: event-time regression for key "),
          col(keyCol).cast("string"), lit(": ts="), col("ts_u").cast("string"),
          lit(" not past open valid_from="), col("_open_from").cast("string"),
          lit(" (strict progress contract)"))))
        .otherwise(col("ts_u")))
      .select(col(keyCol), col(attrCol), col("ts_u"), col("tie_u"))
    val seed = open.select(col(keyCol), col("_open_attr").as(attrCol),
      col("_open_from").as("ts_u"), lit(Long.MinValue).as("tie_u"))
    val refolded = scd2(guarded.unionByName(seed), keyCol, attrCol,
      col("ts_u"), "tie_u")
    refolded.join(open.select(col(keyCol), col("_voff")), Seq(keyCol), "left")
      .withColumn("version", col("version") + coalesce(col("_voff"), lit(0L)))
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("version"), col("is_current"))
      .unionByName(closed)
  }

  /** Snapshot diff that KEEPS the old/new values of one compare column —
    * the input to [[aggDeltaAudit]] (a plain [[snapshotDiff]] drops them). */
  def snapshotDelta(oldDf: DataFrame, newDf: DataFrame, pkCols: Seq[String],
                    valueCol: String, carryCols: Seq[String] = Seq.empty): DataFrame = {
    require(pkCols.nonEmpty, "pk columns required")
    val all = (pkCols ++ Seq(valueCol) ++ carryCols).distinct
    val o = oldDf.select(all.map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select(all.map(c => col(c).as(s"n_$c")): _*)
    val joinCond = pkCols.map(c => o(s"o_$c") <=> n(s"n_$c")).reduce(_ && _)
    val status = when(col(s"o_${pkCols.head}").isNull, lit("added"))
      .when(col(s"n_${pkCols.head}").isNull, lit("removed"))
      .when(!(col(s"o_$valueCol") <=> col(s"n_$valueCol")), lit("changed"))
      .otherwise(lit("unchanged"))
    val outCols =
      (pkCols ++ carryCols).map(c => coalesce(col(s"o_$c"), col(s"n_$c")).as(c)) ++
        Seq(col(s"o_$valueCol").as("old_value"), col(s"n_$valueCol").as("new_value"),
          status.as("status"))
    o.join(n, joinCond, "full_outer").select(outCols: _*)
  }

  /** Incremental-aggregate maintenance audit: from a [[snapshotDelta]]
    * frame, the per-slice (count, sum) DELTAS that upgrade a materialized
    * v1 aggregate to v2 — at 100 TB you apply the delta (diff-sized work)
    * instead of re-aggregating the corpus. The audit emits base, delta,
    * base+delta, the independent v2 recompute, and exact-integer match
    * flags pinning the delta-apply algebra.
    *
    * Scale shape: everything folds from the ONE diff join — slices
    * aggregate the joined frame directly (n_v1 = rows with an old side,
    * sum_v2 = sum of new-side values), so no extra scan of either
    * snapshot. Sums are exact (integer/decimal valueCol contract). */
  def aggDeltaAudit(delta: DataFrame, sliceCols: Seq[String]): DataFrame = {
    val isOld = col("old_value").isNotNull
    val isNew = col("new_value").isNotNull
    delta.groupBy(sliceCols.map(col): _*)
      .agg(
        sum(when(isOld, lit(1L)).otherwise(lit(0L))).as("n_v1"),
        sum(when(isNew, lit(1L)).otherwise(lit(0L))).as("n_v2"),
        sum(when(col("status") === "added", lit(1L)).otherwise(lit(0L))).as("n_added"),
        sum(when(col("status") === "removed", lit(1L)).otherwise(lit(0L))).as("n_removed"),
        sum(when(col("status") === "changed", lit(1L)).otherwise(lit(0L))).as("n_changed"),
        coalesce(sum(when(isOld, col("old_value"))), lit(0L)).as("sum_v1"),
        coalesce(sum(when(isNew, col("new_value"))), lit(0L)).as("sum_v2"),
        (coalesce(sum(when(col("status") === "added", col("new_value"))), lit(0L)) -
          coalesce(sum(when(col("status") === "removed", col("old_value"))), lit(0L)) +
          coalesce(sum(when(col("status") === "changed",
            col("new_value") - col("old_value"))), lit(0L))).as("delta_sum"))
      .withColumn("incr_n", col("n_v1") + col("n_added") - col("n_removed"))
      .withColumn("incr_sum", col("sum_v1") + col("delta_sum"))
      .withColumn("n_matches",
        when(col("incr_n") === col("n_v2"), lit(1L)).otherwise(lit(0L)))
      .withColumn("sum_matches",
        when(col("incr_sum") === col("sum_v2"), lit(1L)).otherwise(lit(0L)))
  }
}
