package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.planner.QueryPlanner

/**
 * Subscription manager — the Spark re-expression of the reference's WebSocket
 * subscription surface (reference: create/add/remove/close operations,
 * common/src/main/java/timely/api/request/websocket/AddSubscription.java:1-40;
 * per-metric tailing MetricScanner threads,
 * server/src/main/java/timely/server/subscription/MetricScanner.java:45-120).
 *
 * Each (session, metric) subscription becomes a named Structured Streaming
 * query: `readStream -> filter(metric ∧ tags ∧ viz) -> sink`. The reference's
 * `lag` (serve only points older than now-lag) maps onto a watermark, and its
 * replay-from-beginTime maps onto the stream starting position; `delay`
 * becomes the processing trigger interval.
 */
class Subscriptions(
    sink: Row => Unit,
    onComplete: (String, String) => Unit = (_, _) => ()) {

  private val active = new ConcurrentHashMap[String, StreamingQuery]()

  private def key(sessionId: String, metric: String) = s"$sessionId/$metric"

  /** The reference sends a `complete:true` MetricResponse sentinel when a
    * scanner finishes or its subscription is torn down
    * (MetricScanner.java:270-280) — surfaced here as the onComplete callback
    * with (sessionId, metric); pair it with
    * [[MetricResponseJson.completed]] for the wire shape. */
  private def signalComplete(sessionId: String, metric: String): Unit =
    onComplete(sessionId, metric)

  /** `add` operation: start a tailing query for one metric. `pointsStream`
    * is a streaming DataFrame of the canonical point schema. A zero
    * `beginTimeMs` clamps to the retention horizon when `ageOffTtlMs` is
    * configured — the reference starts zero-start subscriptions at the
    * age-off horizon, not the epoch (MetricScanner.java:45-120). */
  def addMetric(
      sessionId: String,
      pointsStream: DataFrame,
      metric: String,
      tags: Map[String, String] = Map.empty,
      auths: Seq[String] = Seq.empty,
      beginTimeMs: Long = 0L,
      lagSeconds: Long = 0L,
      delayMs: Long = 1000L,
      ageOffTtlMs: Option[Long] = None,
      nowMs: () => Long = () => System.currentTimeMillis()): StreamingQuery = {
    val begin =
      if (beginTimeMs == 0L) ageOffTtlMs.map(ttl => nowMs() - ttl).getOrElse(0L)
      else beginTimeMs
    var df = pointsStream
      .where(col("metric") === metric && col("ts") >= begin)
      .where(graft.functions.VizFunctions.vizVisible(col("viz"), lit(auths.mkString(","))))
    tags.foreach { case (k, v) => df = df.where(QueryPlanner.tagPredicate(k, v)) }
    if (lagSeconds > 0) {
      df = df.withColumn("event_time", timestamp_millis(col("ts")))
        .withWatermark("event_time", s"$lagSeconds seconds")
        .drop("event_time")
    }
    val k = key(sessionId, metric)
    Subscriptions.sinks.put(k, sink)
    val q = df.writeStream
      .queryName(k)
      .trigger(Trigger.ProcessingTime(delayMs))
      .foreach(new Subscriptions.SinkRelay(k))
      .start()
    val old = active.put(key(sessionId, metric), q)
    if (old != null) old.stop()
    q
  }

  /** `remove` operation: stop one metric's tail (+ completion sentinel). */
  def removeMetric(sessionId: String, metric: String): Unit = {
    val k = key(sessionId, metric)
    val q = active.remove(k)
    Subscriptions.sinks.remove(k)
    if (q != null) {
      q.stop()
      signalComplete(sessionId, metric)
    }
  }

  /** `close` operation: tear down every query of the session (+ sentinels) —
    * one teardown implementation, shared with [[removeMetric]], so the
    * race-sensitive remove/stop/signal sequence exists exactly once. */
  def close(sessionId: String): Unit = {
    val it = active.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k.startsWith(s"$sessionId/"))
        removeMetric(sessionId, k.substring(sessionId.length + 1))
    }
  }

  def activeQueries: Seq[String] = {
    import scala.jdk.CollectionConverters._
    active.keySet().asScala.toSeq.sorted
  }
}

object Subscriptions {

  /**
   * Driver-side sink registry. The ForeachWriter serializes only the
   * subscription key and resolves the sink at `process` time — avoiding
   * closure-capture of the manager. In local mode (and tests) executor and
   * driver share the JVM, so the lookup hits the live sink; on a real cluster
   * a subscription sink would be an external push channel (Kafka topic,
   * WebSocket gateway), not an in-JVM callback.
   */
  private[streaming] val sinks = new ConcurrentHashMap[String, Row => Unit]()

  private[streaming] class SinkRelay(k: String) extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(row: Row): Unit = {
      val f = sinks.get(k)
      if (f != null) f(row)
    }
    override def close(errorOrNull: Throwable): Unit = ()
  }
}
