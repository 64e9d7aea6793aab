package graft.planner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The small constant/catalog API endpoints of the reference, as library calls:
 * - aggregators list (/api/aggregators — reference
 *   server/src/main/java/timely/api/response/timeseries/AggregatorsResponse.java:21-30)
 * - version (/version — common/src/main/java/timely/api/request/VersionRequest.java:2-14)
 * - suggest / lookup / metrics-report over a meta frame (M1-M3; the query
 *   implementations live in graft.queries.TimelyQueries and Points.meta).
 */
object TimelyApi {

  /** Exactly the reference's set (AggregatorsResponse.java:21-30). */
  val Aggregators: Seq[String] = Seq("avg", "dev", "max", "min", "sum", "count", "none")

  val Version = "graft-0.1.0"

  def aggregatorsJson: String = Aggregators.mkString("[\"", "\",\"", "\"]")

  /** /api/suggest: type in {metrics, tagk, tagv}; substring match for metrics,
    * equality scoping otherwise; limited (default 25 like the reference). */
  def suggest(meta: DataFrame, kind: String, q: String, max: Int = 25): DataFrame = kind match {
    case "metrics" =>
      meta.select("metric").distinct().where(col("metric").contains(q)).orderBy("metric").limit(max)
    case "tagk" =>
      meta.where(col("metric") === q).select("tagk").distinct().orderBy("tagk").limit(max)
    case "tagv" =>
      meta.where(col("tagk") === q).select("tagv").distinct().orderBy("tagv").limit(max)
    case other => throw new IllegalArgumentException(s"unknown suggest type: $other")
  }

  /** /api/search/lookup: tag-value regex lookup for one metric, with total. */
  def lookup(meta: DataFrame, metric: String, tagvPattern: String, limit: Int = 25): (DataFrame, Long) = {
    val matches = meta.where(col("metric") === metric && col("tagv").rlike(tagvPattern))
    (matches.orderBy("metric", "tagk", "tagv").limit(limit), matches.count())
  }
}
