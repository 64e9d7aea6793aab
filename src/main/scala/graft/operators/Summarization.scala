package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Histogram summarization — parity with the reference's Flink job, which per
 * (metric, tags) per tumbling event-time window emits count/min/max/sum/avg
 * plus nearest-rank p50/p75/p90/p99 and re-ingests them as `<metric>_summarized`
 * (reference analytics/src/main/java/timely/analytics/flink/SummarizationJob.java:36-105,
 * MetricHistogram.java:55-104 — percentile = sorted[ceil(p*n)], 1-indexed,
 * i.e. the nearest-rank method, MetricHistogram.java:85-92).
 *
 * Batch and Structured Streaming share this aggregation: the streaming job in
 * [[graft.streaming.SummarizationJob]] applies it to a watermarked stream.
 *
 * Scale note: `collect_list` per (metric, window) is the exact-percentile cost;
 * at 100 TB you would swap `percentile_approx` (t-digest) for the exact sort —
 * the reference computes exact ranks, so oracle parity keeps the exact form.
 */
object Summarization {

  /** Nearest-rank percentile over a collected window: sorted[ceil(p*n)],
    * 1-indexed (`element_at` is 1-based, matching the reference's indexing). */
  private def nearestRank(p: Double): Column =
    element_at(sort_array(collect_list(col("value"))),
      ceil(lit(p) * count(col("value"))).cast("int"))

  /** Tumbling-window histogram per metric: one row per (metric, window start). */
  def summarize(points: DataFrame, windowMs: Long): DataFrame =
    points
      .groupBy(col("metric"), (col("ts") - (col("ts") % lit(windowMs))).as("window_ms"))
      .agg(
        count(col("value")).as("cnt"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"),
        // exact decimal sums: partition-order independent (see
        // TimeSeries.exactAggregator) — plain double sums can flip a
        // round(.,4) boundary between runs/engines
        sum(col("value").cast("decimal(18,6)")).cast("double").as("vsum"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") / count(col("value"))).as("vavg"),
        nearestRank(0.50).as("p50"),
        nearestRank(0.75).as("p75"),
        nearestRank(0.90).as("p90"),
        nearestRank(0.99).as("p99"))
      .withColumn("metric", concat(col("metric"), lit("_summarized")))
}
