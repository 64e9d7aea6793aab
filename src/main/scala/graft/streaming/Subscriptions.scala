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
  // subscription key -> external channel dir, for sentinel delivery on remove
  private val external = new ConcurrentHashMap[String, String]()

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
    * age-off horizon, not the epoch (MetricScanner.java:45-120).
    *
    * A nonzero `endTimeMs` makes the subscription BOUNDED (reference
    * AddSubscription.endTime, AddSubscription.java:14,45-46): points past the
    * end are never delivered, and the `complete:true` sentinel fires
    * automatically — without an explicit remove — as soon as the stream
    * produces evidence it has progressed beyond the range (the first in-
    * metric point with ts > endTimeMs, the micro-batch analog of
    * MetricScanner exhausting its final bounded range and calling
    * sendCompletedResponse, MetricScanner.java:110,270-280). Like the
    * reference scanner — which only finishes once its Accumulo scan moves
    * past endTime — completion requires the stream to reach beyond the bound;
    * a stream that stops exactly at endTime keeps the subscription open until
    * removed. */
  def addMetric(
      sessionId: String,
      pointsStream: DataFrame,
      metric: String,
      tags: Map[String, String] = Map.empty,
      auths: Seq[String] = Seq.empty,
      beginTimeMs: Long = 0L,
      endTimeMs: Long = 0L,
      lagSeconds: Long = 0L,
      delayMs: Long = 1000L,
      ageOffTtlMs: Option[Long] = None,
      nowMs: () => Long = () => System.currentTimeMillis()): StreamingQuery = {
    val df = planFiltered(pointsStream, metric, tags, auths, beginTimeMs, endTimeMs,
      lagSeconds, ageOffTtlMs, nowMs)
    val k = key(sessionId, metric)
    external.remove(k) // replacing an external subscription under the same key
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Subscriptions.sinks.put(k,
      Subscriptions.SubSink(sink, endTimeMs, () => completeBounded(sessionId, metric, fired)))
    // foreachBatch, not a row-wise ForeachWriter: one micro-batch's rows land
    // unordered across partitions, so a past-end row could tear the sink down
    // BEFORE other partitions delivered their in-range rows. Batch-granular
    // delivery sorts by ts (the reference scanner's key order), serves every
    // in-range row, and only then fires the bounded-completion signal.
    val q = df.writeStream
      .queryName(k)
      .trigger(Trigger.ProcessingTime(delayMs))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val s = Subscriptions.sinks.get(k)
        if (s != null) {
          var pastEnd = false
          // BOUNDED replay: the sorted micro-batch streams to the driver one
          // range-partition at a time (toLocalIterator) instead of one
          // collect — a subscription replaying a huge backlog holds at most
          // one partition in driver memory, the micro-batch analog of
          // MetricScanner fetching its scan in bounded ranges
          // (MetricScanner.java:45-130). Global ts order is preserved: sort
          // range-partitions by ts and the iterator walks partitions in
          // order, each internally sorted.
          val it = batch.sort("ts").toLocalIterator()
          while (it.hasNext) {
            val r = it.next()
            if (s.endTimeMs == 0L || r.getAs[Long]("ts") <= s.endTimeMs) s.deliver(r)
            else pastEnd = true
          }
          if (pastEnd) s.onPastEnd()
        }
      }
      .start()
    val old = active.put(key(sessionId, metric), q)
    if (old != null) old.stop()
    q
  }

  /** Automatic completion of a bounded subscription: exactly-once per
    * subscription (the past-end signal can arrive from several partitions of
    * one micro-batch), sentinel first, then an async stop of the query — the
    * signal fires on an executor task thread, and StreamingQuery.stop from
    * inside the batch it is processing would deadlock. */
  private def completeBounded(
      sessionId: String, metric: String,
      fired: java.util.concurrent.atomic.AtomicBoolean): Unit =
    if (fired.compareAndSet(false, true)) {
      val k = key(sessionId, metric)
      val q = active.remove(k)
      Subscriptions.sinks.remove(k)
      signalComplete(sessionId, metric)
      if (q != null) {
        val t = new Thread(() => try q.stop() catch { case _: Throwable => () },
          s"graft-sub-complete-$k")
        t.setDaemon(true)
        t.start()
      }
    }

  /**
   * Cluster-mode subscription delivery (the deployment shape of ST1/ST2):
   * the in-JVM relay of [[addMetric]] only works where driver and executors
   * share a JVM, so here the subscription stream is serialized to
   * [[MetricResponseJson]] envelopes ON THE EXECUTORS and appended to an
   * external channel directory through Spark's transactional streaming file
   * sink — a shared-filesystem path a WebSocket gateway tails (a Kafka topic
   * is this same code with `format("kafka")`; no broker exists in this
   * environment, so the filesystem is the one real external channel).
   * Envelopes batch up to `batchSize` responses, the reference's
   * subscriptionBatchSize flush (MetricScanner.java:61).
   *
   * Completion: remove/close appends the `complete:true` sentinel envelope to
   * the channel from the driver; a bounded (endTimeMs != 0) subscription also
   * emits it from whichever executor task first sees a past-end point —
   * at-least-once, since the reference's `completedResponseSent` flag is
   * per-scanner state with no distributed single-writer analog; channel
   * consumers dedupe on (subscriptionId, complete).
   */
  def addMetricExternal(
      sessionId: String,
      pointsStream: DataFrame,
      metric: String,
      channelDir: String,
      checkpointDir: String,
      tags: Map[String, String] = Map.empty,
      auths: Seq[String] = Seq.empty,
      beginTimeMs: Long = 0L,
      endTimeMs: Long = 0L,
      lagSeconds: Long = 0L,
      delayMs: Long = 1000L,
      batchSize: Int = 100,
      ageOffTtlMs: Option[Long] = None,
      nowMs: () => Long = () => System.currentTimeMillis()): StreamingQuery = {
    val df = planFiltered(pointsStream, metric, tags, auths, beginTimeMs, endTimeMs,
      lagSeconds, ageOffTtlMs, nowMs)
    val sid = sessionId
    val m = metric
    val end = endTimeMs
    val bs = batchSize
    val envelopes = df.mapPartitions { it =>
      it.grouped(bs).flatMap { rows =>
        val (inRange, pastEnd) = rows.partition(r => end == 0L || r.getAs[Long]("ts") <= end)
        val data =
          if (inRange.isEmpty) Nil
          else Seq(MetricResponseJson.envelope(inRange.map(MetricResponseJson.response(_, sid))))
        val sentinel =
          if (pastEnd.isEmpty) Nil
          else Seq(MetricResponseJson.envelope(Seq(MetricResponseJson.completed(m, sid))))
        data ++ sentinel
      }
    }(org.apache.spark.sql.Encoders.STRING)
    val k = key(sessionId, metric)
    Subscriptions.sinks.remove(k) // replacing a relay subscription under the same key
    val q = envelopes.toDF("value").writeStream
      .queryName(k)
      .trigger(Trigger.ProcessingTime(delayMs))
      .format("text")
      .option("path", channelDir)
      .option("checkpointLocation", checkpointDir)
      .start()
    external.put(k, channelDir)
    val old = active.put(k, q)
    if (old != null) old.stop()
    q
  }

  /** Shared subscription plan: metric + time-range + visibility + tag
    * predicates (+ the lag watermark) — one filter implementation for the
    * local relay and the external channel paths. */
  private def planFiltered(
      pointsStream: DataFrame,
      metric: String,
      tags: Map[String, String],
      auths: Seq[String],
      beginTimeMs: Long,
      endTimeMs: Long,
      lagSeconds: Long,
      ageOffTtlMs: Option[Long],
      nowMs: () => Long): DataFrame = {
    val begin =
      if (beginTimeMs == 0L) ageOffTtlMs.map(ttl => nowMs() - ttl).getOrElse(0L)
      else beginTimeMs
    // the ts upper cut is enforced at delivery, not in the plan: the first
    // past-end row is the bounded-subscription completion SIGNAL
    var df = pointsStream
      .where(col("metric") === metric && col("ts") >= begin)
      .where(graft.functions.VizFunctions.vizVisible(col("viz"), lit(auths.mkString(","))))
    tags.foreach { case (k, v) => df = df.where(QueryPlanner.tagPredicate(k, v)) }
    if (lagSeconds > 0) {
      df = df.withColumn("event_time", timestamp_millis(col("ts")))
        .withWatermark("event_time", s"$lagSeconds seconds")
        .drop("event_time")
    }
    df
  }

  /** `remove` operation: stop one metric's tail (+ completion sentinel). */
  def removeMetric(sessionId: String, metric: String): Unit = {
    val k = key(sessionId, metric)
    val q = active.remove(k)
    Subscriptions.sinks.remove(k)
    val channel = external.remove(k)
    if (q != null) {
      q.stop()
      if (channel != null) Subscriptions.writeSentinel(channel, sessionId, metric)
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

  /** Append the complete:true sentinel envelope to an external channel dir as
    * its own file — streaming-file-sink part files are never touched, and a
    * gateway tailing the directory picks it up like any other envelope. */
  private[streaming] def writeSentinel(channelDir: String, sessionId: String, metric: String): Unit = {
    val line = MetricResponseJson.envelope(Seq(MetricResponseJson.completed(metric, sessionId)))
    val path = java.nio.file.Paths.get(channelDir,
      s"complete-$sessionId-$metric-${java.util.UUID.randomUUID()}.txt")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.write(path, java.util.Collections.singletonList(line),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** One registered subscription sink: the delivery callback, the bounded-
    * subscription end (0 = unbounded tail), and the auto-completion hook. */
  private[streaming] case class SubSink(
      deliver: Row => Unit, endTimeMs: Long, onPastEnd: () => Unit)

  /**
   * Driver-side sink registry, resolved per micro-batch inside foreachBatch —
   * keyed lookup instead of closure capture so a replaced subscription under
   * the same key stops delivering immediately. foreachBatch runs on the
   * driver, so this in-JVM push channel works in any deploy mode (the
   * micro-batch is collected to the driver — the right shape for a
   * subscription feed, which funnels to one consumer connection anyway; the
   * reference scanner likewise single-threads each subscription's delivery).
   * Cluster-scale fan-out without a driver hop is [[Subscriptions.addMetricExternal]].
   */
  private[streaming] val sinks = new ConcurrentHashMap[String, SubSink]()
}
