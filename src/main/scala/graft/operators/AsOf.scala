package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Backward as-of join: for each left row, the single LATEST right row whose
 * time is at or before the left row's time within the same key group — the
 * point-in-time lookup feature pipelines need (attribute an event to the
 * current state when it happened) and Spark has no operator for.
 *
 * The naive formulation — range join `l.ts >= r.ts` then keep the max per
 * left row — explodes to O(|L| x |R|) rows per key before the aggregate
 * prunes them. This is the union-and-sweep form instead: tag both sides,
 * union, sort each key group by (time, side, tieBreak) and carry the last
 * right payload forward with a running `last(ignoreNulls)` window. ONE
 * shuffle (on the key), one in-partition sort, zero row amplification —
 * the shape that survives 100 TB. Right rows sort before left rows at equal
 * time, so a right row exactly at the left row's time matches (inclusive),
 * and `tieBreak` makes equal-time right rows deterministic (largest wins).
 *
 * Each key group is one window partition, so a single pathologically hot key
 * serializes; keys here are entity ids (user, instrument, series) whose
 * per-entity row counts are bounded by construction. If one is not, split
 * its time range and as-of join the splits with carried-in boundary state.
 *
 * @param key      equi-join key columns (present on both sides)
 * @param leftTs   left event-time column name
 * @param rightTs  right event-time column name (same type as leftTs)
 * @param tieBreak right column ordering equal-time right rows; the largest
 *                 value is the match (must be unique within (key, rightTs)
 *                 for full determinism)
 * @return every left row with every non-key right column appended (null when
 *         the key has no right row at or before the left time) — left-join
 *         semantics. Column names must be disjoint.
 */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTs: String, rightTs: String, tieBreak: String): DataFrame = {
    val rPay = right.columns.filterNot(key.contains).toSeq
    val lCols = left.columns.toSeq
    val overlap = lCols.toSet.intersect(rPay.toSet)
    require(overlap.isEmpty, s"rename overlapping right columns before the join: $overlap")
    val reserved = Set("_t", "_side", "_tb", "_l", "_r", "_m")
    val clash = (lCols ++ rPay ++ key).filter(reserved.contains).distinct
    require(clash.isEmpty, s"column names collide with asofJoin internals: ${clash.mkString(", ")}")
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields.filter(f => rPay.contains(f.name)))
    val tbType = right.schema(tieBreak).dataType
    val lU = left.select(
      key.map(col) ++ Seq(
        col(leftTs).as("_t"), lit(1).as("_side"), lit(null).cast(tbType).as("_tb"),
        struct(lCols.map(col): _*).as("_l"), lit(null).cast(rType).as("_r")): _*)
    // SQL equi-join parity: a NULL key never matches (the window would
    // otherwise co-partition NULL keys and "match" them) — right rows with
    // any NULL key carry no state; left rows with NULL keys get nulls.
    // A NULL rightTs never matches either (rightTs <= leftTs is never true
    // on NULL), but nulls-first ordering would sort it before every real
    // row and carry its payload — so it is filtered with the NULL keys.
    val rU = right
      .where((key.map(col(_).isNotNull) :+ col(rightTs).isNotNull).reduce(_ && _))
      .select(
        key.map(col) ++ Seq(
          col(rightTs).as("_t"), lit(0).as("_side"), col(tieBreak).as("_tb"),
          lit(null).cast(lType).as("_l"), struct(rPay.map(col): _*).as("_r")): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(lCols.map(c => col("_l").getField(c).as(c)) ++
        rPay.map(c => col("_m").getField(c).as(c)): _*)
  }

  /**
   * Stream-stream interval join — the streaming attribution primitive: each
   * left event joined (inner) to the right events of the same key whose
   * event time falls in `[leftTs − lookback, leftTs]`. Built directly on
   * Structured Streaming's watermarked stream-stream join: BOTH sides carry
   * a watermark and the join condition is time-bounded in both directions,
   * so Spark provably expires right-side state older than the lower bound
   * and left-side state past the watermark — state is
   * O(keys · lookback-window), not unbounded (the requirement the Spark
   * docs place on append-mode stream-stream joins).
   *
   * Both inputs need TIMESTAMP event-time columns with DISTINCT names;
   * non-key column names must be disjoint. Works identically on batch
   * frames (the spec's equivalence harness).
   *
   * @param lookback SQL interval literal body, e.g. "10 minutes"
   */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, lookback: String,
      watermarkDelay: String): DataFrame = {
    require(leftTs != rightTs, "event-time columns must have distinct names")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    val cond = key.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lookback")
    val rPay = right.columns.filterNot(key.contains).toSeq
    l.join(r, cond, "inner")
      .select(left.columns.map(c => col(s"l.$c")) ++
        rPay.map(c => col(s"r.$c")): _*)
  }

  /** Banded interval-overlap join: pairs of (left, right) intervals that
    * strictly overlap (l_start < r_end AND r_start < l_end), found by
    * banding both sides on `bandMs` time cells — each interval explodes to
    * the cells it spans, the join runs per cell, and every pair is emitted
    * exactly once FROM THE CELL CONTAINING ITS OVERLAP START (the
    * lowest-agreeing-band idiom: no post-join dedup shuffle).
    *
    * Columns: left needs `l_start`/`l_end`, right `r_start`/`r_end`
    * (half-open [start, end) ms); every other column rides through.
    * `overlap_ms` = least(ends) - greatest(starts).
    *
    * Scale shape: the explode factor is interval_span/bandMs (pick bandMs
    * near the typical interval length, so ~1-2 cells each); the join
    * shuffles on the cell key — never a range-join row amplification, and
    * skew is bounded by how many intervals share one cell. */
  def intervalOverlap(left: DataFrame, right: DataFrame, bandMs: Long): DataFrame = {
    require(bandMs >= 1, "bandMs >= 1")
    // degenerate/inverted intervals (end <= start) contribute zero pairs by
    // the half-open [start, end) contract — filter them BEFORE the explode:
    // sequence(a, b) silently steps -1 when b < a, so an inverted bound
    // would otherwise fabricate descending band cells (wasted fan-out, or a
    // sequence-length error for badly inverted bounds)
    val l = left.where(col("l_start") < col("l_end")).withColumn("band",
      explode(sequence(expr(s"l_start div $bandMs"), expr(s"(l_end - 1) div $bandMs"))))
    val r = right.where(col("r_start") < col("r_end")).withColumn("band",
      explode(sequence(expr(s"r_start div $bandMs"), expr(s"(r_end - 1) div $bandMs"))))
    l.join(r, Seq("band"))
      .where(col("l_start") < col("r_end") && col("r_start") < col("l_end"))
      .where(col("band") === expr(s"greatest(l_start, r_start) div $bandMs"))
      .withColumn("overlap_ms",
        least(col("l_end"), col("r_end")) - greatest(col("l_start"), col("r_start")))
      .drop("band")
  }
}
