package graft.model

/**
 * Canonical data point of the engine — the Spark-native equivalent of the
 * reference's `Metric(name, tags, Value(ts, measure))` model
 * (reference: common/src/main/java/timely/model/Metric.java:25-31,
 * common/src/main/java/timely/model/Value.java:14-19).
 *
 * One `Dataset[MetricPoint]` stored as time-partitioned parquet is the single
 * source of truth; every query operator is a DataFrame transformation over it.
 *
 * @param metric series name, e.g. "sys.cpu.user"
 * @param ts     epoch milliseconds (the reference normalizes all timestamps to
 *               ms — Value.java:43-45)
 * @param value  the measure (only value type the reference supports)
 * @param tags   dynamic tag map, `viz` excluded
 * @param viz    optional visibility expression (reference stores it as an
 *               Accumulo ColumnVisibility — MetricAdapter.java:152-167)
 */
case class MetricPoint(
    metric: String,
    ts: Long,
    value: Double,
    tags: Map[String, String],
    viz: Option[String])

object MetricPoint {
  /** Reserved tag key carrying the visibility expression
    * (MetricAdapter.java:44). */
  val VisibilityTag = "viz"
}
