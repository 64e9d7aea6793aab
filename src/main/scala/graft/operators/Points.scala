package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loading and normalizing point datasets.
 *
 * The canonical point schema (SURVEY.md §1.5, mirroring the reference model
 * common/src/main/java/timely/model/Metric.java:25-31):
 * `metric STRING, ts LONG (epoch ms), value DOUBLE, tags MAP<STRING,STRING>, viz STRING`.
 *
 * At cluster scale the points table is written `PARTITIONED BY (metric, dt, hr)`
 * — the Spark equivalent of the reference's (metric, hour-bucket) row keys
 * (common/src/main/java/timely/accumulo/MetricAdapter.java:47-53) — so metric
 * equality + time-range predicates become partition pruning, not data reads.
 */
object Points {

  /** Read a driver-generated table from a scale-factor dir.
    * The synthetic `events.ts` is parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects by default — read it as a LONG of epoch nanos instead. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /**
   * Map the synthetic `events` table onto the point model:
   * event_type -> metric, ts -> epoch ms, user_id -> a `user` tag.
   */
  def fromEvents(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val tsMs = events.schema("ts").dataType match {
      case LongType      => expr("ts div 1000000") // epoch ns -> ms (integral div: ns don't fit a double)
      case TimestampType => unix_millis(col("ts"))
      case other         => throw new IllegalArgumentException(s"unexpected ts type: $other")
    }
    events.select(
      col("event_type").as("metric"),
      tsMs.as("ts"),
      col("value"),
      map(lit("user"), col("user_id").cast("string")).as("tags"),
      lit(null).cast("string").as("viz"))
  }

  /** Derived meta catalog — the Spark analog of the reference's meta table
    * rows `m:<metric>` / `t:<metric>` / `v:<metric>`
    * (common/src/main/java/timely/model/Meta.java:55-67). */
  def meta(points: DataFrame): DataFrame =
    points
      .select(col("metric"), explode(col("tags")).as(Seq("tagk", "tagv")))
      .distinct()
}
