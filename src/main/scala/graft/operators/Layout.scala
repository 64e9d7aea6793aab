package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: z-order (Morton) clustering keys and the pruning
 * audit that justifies them.
 *
 * Why this belongs in the engine: at 100 TB the scan you avoid is worth
 * more than the scan you optimize. Partition layout prunes on ONE dimension
 * (this store's `(metric, dt, hr)` dirs); when queries filter on TWO
 * uncorrelated dimensions (user cohort x time, source x length), sorting
 * files by an interleaved-bit Morton key keeps BOTH dims locally dense, so
 * min/max file statistics (parquet row-group stats, Delta/Iceberg file
 * skipping) can drop most files for either predicate. The operators here
 * compute the key (a pure codegen bit expression — usable as a
 * `repartitionByRange`/`sortWithinPartitions` column at write time) and
 * measure the actual skip ratio against a single-dimension sort, on the
 * data itself rather than by folklore.
 *
 * Determinism: everything is integer bit arithmetic — no doubles anywhere.
 */
object Layout {

  /** Morton interleave of two `bits`-bit non-negative ints: x in the even
    * result bits, y in the odd. Pure shift/and/or chain — whole-stage
    * codegen keeps it register-local. Caller guarantees 0 <= x,y < 2^bits
    * (mask/bucket upstream). */
  def mortonKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** The identical interleave as DuckDB SQL over column expressions —
    * generated from the same loop so Spark and the oracle can never drift. */
  def mortonSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.map(t => s"($t)").mkString(" | ")
  }

  /** Per-z-"file" locality profile: bucket the Morton key into 2^?-row
    * pseudo-files (`z div bucketSize`) and report each bucket's row count
    * and per-dimension min/max envelope — the exact statistics a file-
    * skipping reader would consult. Tight envelopes on BOTH dims are the
    * whole point of the interleave. One hash aggregate on the bucket key. */
  def zorderProfile(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
                    bucketSize: Long): DataFrame = {
    require(bucketSize >= 1, "bucketSize >= 1")
    df.select(xCol.as("x"), yCol.as("y"))
      .withColumn("z", mortonKey(col("x"), col("y"), bits))
      .withColumn("zbucket", expr(s"z div $bucketSize"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  /** Skip-ratio audit: for an x-range predicate, how many pseudo-files
    * must be read under (a) z-order layout vs (b) a y-major sort (the
    * layout you get from sorting by time alone)? A file must be read iff
    * it contains ANY matching row — exactly min/max-envelope skipping on
    * value-bucketed files (`key div bucketSize` in each layout's key
    * space, so both layouts get identical cell treatment). Emits one row
    * with both touched/total counts and the two skip ratios (the only
    * doubles, one pinned division each).
    *
    * Scale shape: two hash aggregates over the projected frame — no
    * windows, no global sort; the per-layout file counts are bounded by
    * 4^bits / bucketSize. */
  def pruneAudit(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
                 bucketSize: Long, xLo: Long, xHi: Long): DataFrame = {
    require(bucketSize >= 1, "bucketSize >= 1")
    val projected = df.select(xCol.as("x"), yCol.as("y"))
      .withColumn("zraw", mortonKey(col("x"), col("y"), bits))
      .withColumn("lraw", shiftleft(col("y"), bits).bitwiseOR(col("x")))
      .withColumn("zfile", expr(s"zraw div $bucketSize"))
      .withColumn("lfile", expr(s"lraw div $bucketSize"))
    val hit = col("x") >= lit(xLo) && col("x") <= lit(xHi)
    val zstats = projected.groupBy(col("zfile"))
      .agg(max(when(hit, lit(1L)).otherwise(lit(0L))).as("touched"))
      .agg(count(lit(1)).as("z_total"), sum(col("touched")).as("z_touched"))
    val lstats = projected.groupBy(col("lfile"))
      .agg(max(when(hit, lit(1L)).otherwise(lit(0L))).as("touched"))
      .agg(count(lit(1)).as("lin_total"), sum(col("touched")).as("lin_touched"))
    zstats.crossJoin(lstats)
      .withColumn("x_lo", lit(xLo)).withColumn("x_hi", lit(xHi))
      .withColumn("z_skip_ratio",
        (col("z_total") - col("z_touched")).cast("double") / col("z_total").cast("double"))
      .withColumn("lin_skip_ratio",
        (col("lin_total") - col("lin_touched")).cast("double") / col("lin_total").cast("double"))
  }

  /** REAL per-file statistics envelopes for a written store: one row per
    * physical parquet file with its row count and min/max of both query
    * dimensions — exactly the file-skipping metadata a Delta/Iceberg-style
    * reader consults (and the envelope the parquet footer's row-group stats
    * roll up to). `input_file_name` attributes rows without a filesystem
    * walk; one hash aggregate on the file name. */
  def fileEnvelopes(df: DataFrame, xCol: Column, yCol: Column): DataFrame =
    df.select(input_file_name().as("file"), xCol.as("x"), yCol.as("y"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))

  /** Measured skip report over [[fileEnvelopes]] for an x-range predicate:
    * a file must be read iff its [x_min, x_max] envelope intersects
    * [xLo, xHi]. One row: total/touched file counts, total/touched rows,
    * and the skip ratio (the one pinned double division). Run it on a
    * [[graft.sources.PointStore.writeZOrdered]] store vs a plain time-sorted
    * write of the same points to see the layout's real effect — on actual
    * files, not the synthetic grid of [[pruneAudit]]. */
  def filePruneReport(envelopes: DataFrame, xLo: Long, xHi: Long): DataFrame = {
    val touched = col("x_max") >= lit(xLo) && col("x_min") <= lit(xHi)
    envelopes.agg(
        count(lit(1)).as("files_total"),
        sum(when(touched, lit(1L)).otherwise(lit(0L))).as("files_touched"),
        sum(col("n")).as("rows_total"),
        sum(when(touched, col("n")).otherwise(lit(0L))).as("rows_in_touched_files"))
      .withColumn("x_lo", lit(xLo)).withColumn("x_hi", lit(xHi))
      .withColumn("file_skip_ratio",
        (col("files_total") - col("files_touched")).cast("double") /
          col("files_total").cast("double"))
  }
}
