package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Histogram summarization — parity with the reference's Flink job, which per
 * (metric, tags) per tumbling event-time window emits count/min/max/sum/avg
 * plus nearest-rank p50/p75/p90/p99 and re-ingests them as `<metric>_summarized`
 * (reference analytics/src/main/java/timely/analytics/flink/SummarizationJob.java:36-105,
 * MetricHistogram.java:55-104 — percentile = sorted[ceil(p*n)], 1-indexed,
 * i.e. the nearest-rank method, MetricHistogram.java:85-92).
 *
 * Batch and Structured Streaming share the same math: the streaming job in
 * [[graft.streaming.SummarizationJob]] applies it to a watermarked stream.
 *
 * Scale design: the batch path computes EXACT nearest-rank percentiles without
 * ever buffering a window's values in one aggregation buffer — values are
 * rank-numbered by a partitioned window sort (Spark's external, spillable
 * sort), and the rows sitting at the 4 target ranks are picked by a filter.
 * A (metric, window) group of any size costs a disk-backed sort, not memory.
 * The streaming job keeps the collect_list form: its state is already bounded
 * by the watermark horizon, and window functions aren't available in streaming
 * aggregations.
 */
object Summarization {

  private val Percentiles = Seq(0.50, 0.75, 0.90, 0.99)

  /** Tumbling-window histogram per metric: one row per (metric, window start).
    * Nearest-rank percentile = value at 1-indexed rank ceil(p*n) of the sorted
    * window (the reference's MetricHistogram indexing). */
  def summarize(points: DataFrame, windowMs: Long): DataFrame = {
    val keyed = points.select(
      col("metric"),
      (col("ts") - (col("ts") % lit(windowMs))).as("window_ms"),
      col("value"))
    // cached ((metric, window)-bounded): the rank pass and the final join
    // both read it — uncut, the second reader re-ran the corpus aggregate
    val stats = Frames.cached(keyed
      .groupBy(col("metric"), col("window_ms"))
      .agg(
        count(col("value")).as("cnt"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"),
        // exact decimal sums: partition-order independent (see
        // TimeSeries.exactAggregator) — plain double sums can flip a
        // round(.,4) boundary between runs/engines
        sum(col("value").cast("decimal(18,6)")).cast("double").as("vsum"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") / count(col("value"))).as("vavg")))

    // distributed nearest-rank: external sort per group, then pick the rows at
    // the 4 target ranks (ties order arbitrarily but the value AT a rank
    // inside a tie run is unique, so the output is deterministic)
    val ranked = keyed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("metric"), col("window_ms")).orderBy(col("value"))))
      .join(stats.select(col("metric"), col("window_ms"), col("cnt")), Seq("metric", "window_ms"))
    def rank(p: Double): Column = ceil(lit(p) * col("cnt")).cast("long")
    val atTargetRank = Percentiles.map(p => col("rn") === rank(p)).reduce(_ || _)
    val pct = ranked
      .where(atTargetRank)
      .groupBy(col("metric"), col("window_ms"))
      .agg(
        max(when(col("rn") === rank(0.50), col("value"))).as("p50"),
        max(when(col("rn") === rank(0.75), col("value"))).as("p75"),
        max(when(col("rn") === rank(0.90), col("value"))).as("p90"),
        max(when(col("rn") === rank(0.99), col("value"))).as("p99"))

    stats
      .join(pct, Seq("metric", "window_ms"))
      .select(
        concat(col("metric"), lit("_summarized")).as("metric"),
        col("window_ms"), col("cnt"), col("vmin"), col("vmax"),
        col("vsum"), col("vavg"), col("p50"), col("p75"), col("p90"), col("p99"))
  }
}
