package graft.planner

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.planner.QueryPlanner._

/**
 * JSON codec for the OpenTSDB-compatible API: request parsing mirroring
 * `QueryRequest` (reference common/src/main/java/timely/api/request/
 * timeseries/QueryRequest.java:219-380) and response assembly mirroring
 * `QueryResponse{metric, tags, aggregateTags, dps}` (server/src/main/java/
 * timely/api/response/timeseries/QueryResponse.java:1-40).
 *
 * Uses the json4s shipped with Spark — no extra dependency.
 */
object QueryJson {

  private implicit val formats: Formats = DefaultFormats

  def parseRequest(json: String): TsQueryRequest = {
    val jv = JsonMethods.parse(json)
    def str(j: JValue): Option[String] = j match {
      case JString(s) => Some(s); case _ => None
    }
    def lng(j: JValue): Option[Long] = j match {
      case JInt(i) => Some(i.toLong); case JLong(l) => Some(l)
      case JDouble(d) => Some(d.toLong); case JString(s) => s.toLongOption
      case _ => None
    }
    def bool(j: JValue): Boolean = j match {
      case JBool(b) => b; case JString("true") => true; case _ => false
    }
    val queries = (jv \ "queries") match {
      case JArray(qs) => qs.map { q =>
        val ro = q \ "rateOptions"
        SubQuery(
          aggregator = str(q \ "aggregator").getOrElse("none"),
          metric = str(q \ "metric").getOrElse(throw new IllegalArgumentException("metric required")),
          rate = bool(q \ "rate"),
          rateOptions = RateOptions(
            counter = bool(ro \ "counter"),
            counterMax = lng(ro \ "counterMax").getOrElse(0L),
            resetValue = lng(ro \ "resetValue").getOrElse(0L),
            interval = str(ro \ "interval")),
          downsample = str(q \ "downsample"),
          tags = (q \ "tags") match {
            case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
            case _ => Map.empty[String, String]
          })
      }
      case _ => Nil
    }
    TsQueryRequest(
      start = lng(jv \ "start").getOrElse(throw new IllegalArgumentException("start required")),
      end = lng(jv \ "end").getOrElse(System.currentTimeMillis()),
      msResolution = bool(jv \ "msResolution"),
      queries = queries)
  }

  /**
   * Collect one planned subquery frame into QueryResponse JSON objects:
   * one per (metric, group_tags), dps ordered by timestamp (the reference
   * emits TreeMap order — Aggregation.java:58).
   */
  def toResponses(planned: DataFrame): String = {
    import org.apache.spark.sql.functions._
    val rows = planned
      .select(col("metric"), col("group_tags"), col("aggregated_tags"), col("ts_out"), col("value"))
      .collect()
    val grouped = rows.groupBy(r => (r.getString(0), r.getMap[String, String](1).toMap))
    val objs: List[JValue] = grouped.toList
      .sortBy { case ((m, tags), _) => (m, tags.toSeq.sorted.mkString(",")) }
      .map { case ((metric, tags), rs) =>
        val aggTags = rs.head.getSeq[String](2).toList.sorted
        val dps = rs.sortBy(_.getLong(3)).map { r =>
          JField(r.getLong(3).toString, JDouble(r.getDouble(4)))
        }.toList
        JObject(
          "metric" -> JString(metric),
          "tags" -> JObject(tags.toList.sorted.map { case (k, v) => JField(k, JString(v)) }),
          "aggregateTags" -> JArray(aggTags.map(JString(_))),
          "dps" -> JObject(dps))
      }
    JsonMethods.compact(JsonMethods.render(JArray(objs)))
  }
}
