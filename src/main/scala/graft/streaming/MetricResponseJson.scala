package graft.streaming

import org.apache.spark.sql.Row
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.MetricPoint

/**
 * Subscription delivery wire shape — the exact `MetricResponse` /
 * `MetricResponses` JSON the reference's MetricScanner pushes over WebSocket
 * (reference client/src/main/java/timely/api/response/MetricResponse.java:14
 * field order from @JsonPropertyOrder; batch envelope MetricResponses.java:6-28;
 * completion sentinel MetricScanner.java:270-280).
 *
 * Tags serialize as an array of single-entry objects (`[{"host":"a"},…]`) —
 * the reference's `List<Tag>` with Tag's @JsonAnyGetter — sorted by key for
 * deterministic output. The completion sentinel carries metric +
 * subscriptionId with zeroed timestamp/value, null tags and `complete:true`,
 * exactly like `sendCompletedResponse`.
 */
object MetricResponseJson {

  def response(p: MetricPoint, subscriptionId: String): JObject =
    JObject(
      "metric" -> JString(p.metric),
      "timestamp" -> JLong(p.ts),
      "value" -> JDouble(p.value),
      "tags" -> JArray(p.tags.toList.sorted.map { case (k, v) => JObject(k -> JString(v)) }),
      "subscriptionId" -> JString(subscriptionId),
      "complete" -> JBool(false))

  /** From a canonical point Row (metric, ts, value, tags, viz). */
  def response(row: Row, subscriptionId: String): JObject =
    response(MetricPoint(
      row.getAs[String]("metric"),
      row.getAs[Long]("ts"),
      row.getAs[Double]("value"),
      Option(row.getAs[Map[String, String]]("tags")).getOrElse(Map.empty),
      Option(row.getAs[String]("viz"))), subscriptionId)

  /** The stream-finished sentinel (MetricScanner.sendCompletedResponse). */
  def completed(metric: String, subscriptionId: String): JObject =
    JObject(
      "metric" -> JString(metric),
      "timestamp" -> JLong(0L),
      "value" -> JDouble(0.0),
      "tags" -> JNull,
      "subscriptionId" -> JString(subscriptionId),
      "complete" -> JBool(true))

  /** The `{"responses":[…]}` batch envelope (MetricResponses flush). */
  def envelope(responses: Seq[JValue]): String =
    JsonMethods.compact(JsonMethods.render(JObject("responses" -> JArray(responses.toList))))
}
