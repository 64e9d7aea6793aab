package graft.server

import org.json4s._

import graft.model.MetricPoint

/**
 * The reference's flattened Metric JSON -> [[MetricPoint]]
 * (common/src/main/java/timely/model/Metric.java:19 — shape
 * `{"name":m,"timestamp":ms,"measure":v,"tags":[{"k":"v"},…]}`), shared by
 * the HTTP put body (MetricRequest.parseBody, MetricRequest.java:56-60) and
 * the WebSocket `put` operation (@WebSocket(operation="put"),
 * MetricRequest.java:26; served by WSMetricPutHandler.java:17-19). The `viz`
 * tag moves to the visibility slot like every other ingest path
 * (MetricAdapter.java:44).
 */
private[server] object MetricJson {

  def parse(jv: JValue): MetricPoint = {
    val name = jv \ "name" match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("metric name required")
    }
    val ts = jv \ "timestamp" match {
      case JInt(i) => i.toLong; case JLong(l) => l
      case _ => throw new IllegalArgumentException("timestamp required")
    }
    val measure = jv \ "measure" match {
      case JDouble(d) => d; case JInt(i) => i.toDouble; case JLong(l) => l.toDouble
      case _ => throw new IllegalArgumentException("measure required")
    }
    val tags = jv \ "tags" match {
      case JArray(ts) => ts.flatMap {
        case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }
        case _ => Nil
      }.toMap
      case _ => Map.empty[String, String]
    }
    // line-protocol parity: MetricParser requires >= 1 tag, and a tag-less
    // point would write no meta rows — permanently unqueryable data (every
    // query 400s on "No matching tags"). Reject at the door instead.
    if ((tags - MetricPoint.VisibilityTag).isEmpty)
      throw new IllegalArgumentException("at least one tag required")
    MetricPoint(name, ts, measure,
      tags - MetricPoint.VisibilityTag, tags.get(MetricPoint.VisibilityTag))
  }
}
