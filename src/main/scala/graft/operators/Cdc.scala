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
}
