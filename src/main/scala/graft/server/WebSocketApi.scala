package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.planner.{QueryJson, QueryPlanner, TimelyApi}
import graft.sources.PointStore
import graft.streaming.{MetricResponseJson, Subscriptions}

/**
 * Live WebSocket gateway — the serving analog of the reference's WebSocket
 * endpoint (server/src/main/java/timely/server/Server.java:579-585 binds
 * `/websocket`; operation routing via the `@WebSocket(operation=...)`
 * annotations on CreateSubscription/AddSubscription/RemoveSubscription/
 * CloseSubscription, common/src/main/java/timely/api/request/websocket/).
 *
 * Protocol (one JSON text frame per operation, like the reference client
 * WebSocketSubscriptionClient.java:49-86):
 *   {"operation":"create","subscriptionId":id}
 *   {"operation":"add","subscriptionId":id,"metric":m,
 *    "tags":{...},"startTime":ms,"endTime":ms,"delayTime":ms}
 *   {"operation":"remove","subscriptionId":id,"metric":m}
 *   {"operation":"close","subscriptionId":id}
 * plus the timeseries operations the reference also serves over WS
 * (netty/websocket/timeseries/): version, aggregators, metrics, suggest,
 * lookup, query.
 *
 * Delivery: each `add` starts a Structured Streaming tail over the
 * [[PointStore]] directory ([[Subscriptions.addMetric]]); matched points are
 * pushed as `{"responses":[MetricResponse…]}` envelopes. Batching follows
 * MetricScanner: responses accumulate until `subscriptionBatchSize`
 * (MetricScanner.java:212-214) and a fixed-rate flusher drains partial
 * batches every `flushIntervalMs` (MetricScanner.java:180-183); the
 * `complete:true` sentinel flushes immediately (sendCompletedResponse,
 * MetricScanner.java:270-280). All frames of one connection serialize
 * through its write lock.
 *
 * Auth: the upgrade request's TSESSIONID cookie resolves to the session's
 * authorizations via [[AuthSessions]] — the viz filter inside every
 * subscription plan and query then enforces them per-caller. No valid
 * session + anonymous disallowed refuses the upgrade with 401, the WS analog
 * of SecurityProperties.allowAnonymousWsAccess
 * (WebSocketClientIT.testClientAnonymousAccess).
 *
 * TLS: with a [[Tls.Config]] the gateway serves WSS (the reference's WS
 * endpoint rides the same SslHandler as HTTP — Server.java:579); two-way
 * mode requires a client certificate in the handshake and the verified
 * subject DN resolves to the session's authorizations before any cookie is
 * consulted ([[AuthSessions.resolveCert]]).
 */
class WebSocketApi(
    spark: SparkSession,
    dataDir: String,
    metaDir: String,
    sessions: Option[AuthSessions] = None,
    defaultAuths: Seq[String] = Seq.empty,
    subscriptionBatchSize: Int = 100,
    flushIntervalMs: Long = 500L,
    ageOffTtlMs: Option[Long] = None,
    nowMs: () => Long = () => System.currentTimeMillis(),
    tls: Option[Tls.Config] = None) {

  private var server: ServerSocket = _
  @volatile private var running = false
  private var acceptor: Thread = _
  private val flushPool = Executors.newScheduledThreadPool(1, r => {
    val t = new Thread(r, "graft-ws-flusher"); t.setDaemon(true); t
  })
  private val conns = ConcurrentHashMap.newKeySet[Conn]()

  def start(port: Int = 0): Int = synchronized {
    require(server == null, "already started")
    new java.io.File(dataDir).mkdirs() // the streaming tail needs the dir to exist
    server = tls match {
      case None =>
        val s = new ServerSocket()
        s.bind(new InetSocketAddress(port))
        s
      case Some(cfg) =>
        val s = cfg.sslContext().getServerSocketFactory
          .createServerSocket(port).asInstanceOf[javax.net.ssl.SSLServerSocket]
        if (cfg.needClientAuth) s.setNeedClientAuth(true)
        s
    }
    running = true
    acceptor = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          val c = new Conn(s)
          conns.add(c)
          val t = new Thread(() => c.run(), s"graft-ws-conn-${s.getPort}")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: Throwable if !running => () // closed during accept
          case NonFatal(_) => ()
        }
      }
    }, "graft-ws-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = synchronized {
    running = false
    if (server != null) { try server.close() catch { case NonFatal(_) => () }; server = null }
    conns.forEach(_.shutdown())
    conns.clear()
    flushPool.shutdown()
  }

  // ---- frames the operations run against ---------------------------------

  private val pointSchema = org.apache.spark.sql.types.StructType(
    org.apache.spark.sql.Encoders.product[graft.model.MetricPoint].schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("dt", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("hr", org.apache.spark.sql.types.IntegerType)))

  /** The streaming tail every subscription plans over: new parquet files in
    * the store directory become micro-batches (the MetricScanner re-scan
    * loop, minus the hand-rolled ranges — the file source tracks progress). */
  private def pointsStream(): DataFrame =
    spark.readStream.schema(pointSchema).parquet(dataDir)

  private def pointsBatch(): DataFrame =
    if (new java.io.File(dataDir).list() == null ||
        new java.io.File(dataDir).list().isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.Encoders.product[graft.model.MetricPoint].schema)
    else PointStore.read(spark, dataDir)

  /** S4 WS put ingest: same storage append as the HTTP facade — points
    * partitioned for pruning + meta catalog rows; a live subscription's
    * streaming tail picks the new file up on its next trigger (the put ->
    * subscribe round trip WSMetricPutHandler + MetricScanner serve in the
    * reference). */
  private def ingest(batch: Seq[graft.model.MetricPoint]): Unit = if (batch.nonEmpty) {
    val s = spark
    import s.implicits._
    val df = batch.toDF()
    PointStore.write(df, dataDir)
    PointStore.metaProjection(df).write.mode("append").parquet(metaDir)
  }

  private def meta(): DataFrame =
    if (new java.io.File(metaDir).list() == null ||
        new java.io.File(metaDir).list().isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("metric", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("tagk", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("tagv", org.apache.spark.sql.types.StringType))))
    else spark.read.parquet(metaDir)

  // ---- one connection ----------------------------------------------------

  private final class Conn(socket: Socket) {
    private val in = new BufferedInputStream(socket.getInputStream)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private val writeLock = new Object
    // subscriptionId -> its Subscriptions engine (one per created id, so the
    // delivery callback closes over the id the reference threads explicitly)
    private val created = new ConcurrentHashMap[String, Subscriptions]()
    private val pending = new ArrayBuffer[JValue]()
    @volatile private var flusher: ScheduledFuture[_] = _
    @volatile private var closed = false

    def run(): Unit = {
      try {
        val (_, headers) = WebSocketCodec.readHandshake(in)
        val key = headers.get("sec-websocket-key")
        if (key.isEmpty || !headers.get("upgrade").exists(_.equalsIgnoreCase("websocket"))) {
          writeLock.synchronized {
            out.write(WebSocketCodec.refuseResponse(400, "Bad Request")); out.flush()
          }
          return
        }
        // two-way TLS: the handshake-verified client-cert subject, if any
        // (the read above forced the SSL handshake, so the session is live)
        val peerDn: Option[String] = socket match {
          case s: javax.net.ssl.SSLSocket =>
            try Option(s.getSession.getPeerPrincipal).map(_.getName)
            catch { case _: javax.net.ssl.SSLPeerUnverifiedException => None }
          case _ => None
        }
        val auths: Seq[String] = sessions match {
          case None => defaultAuths
          case Some(a) =>
            a.resolveCert(peerDn, AuthSessions.sessionFromCookie(headers.get("cookie"))) match {
              case Some(resolved) => resolved
              case None =>
                writeLock.synchronized {
                  out.write(WebSocketCodec.refuseResponse(401, "Unauthorized")); out.flush()
                }
                return
            }
        }
        writeLock.synchronized {
          out.write(WebSocketCodec.handshakeResponse(key.get)); out.flush()
        }
        flusher = flushPool.scheduleAtFixedRate(() => flush(),
          flushIntervalMs, flushIntervalMs, TimeUnit.MILLISECONDS)
        serve(auths)
      } catch {
        case NonFatal(e) => if (WebSocketApi.debug) e.printStackTrace()
      } finally shutdown()
    }

    private def serve(auths: Seq[String]): Unit = {
      var open = true
      while (open && !closed) {
        val msg = WebSocketCodec.readMessage(in)
        if (WebSocketApi.debug) System.err.println(
          s"WS recv: ${msg.map { case (op, p) => s"op=$op ${new String(p, UTF_8).take(120)}" }}")
        msg match {
          case None => open = false
          case Some((WebSocketCodec.OpClose, _)) =>
            writeLock.synchronized(
              try WebSocketCodec.writeClose(out, 1000, "") catch { case NonFatal(_) => () })
            open = false
          case Some((WebSocketCodec.OpPing, payload)) =>
            writeLock.synchronized(WebSocketCodec.writeFrame(out, WebSocketCodec.OpPong, payload))
          case Some((WebSocketCodec.OpText, payload)) =>
            open =
              try handle(new String(payload, UTF_8), auths)
              catch {
                case NonFatal(e) =>
                  if (WebSocketApi.debug) e.printStackTrace()
                  writeLock.synchronized(
                    try WebSocketCodec.writeClose(out, 1011, "internal error")
                    catch { case NonFatal(_) => () })
                  false
              }
          case Some(_) => () // binary/pong: ignored
        }
      }
    }

    /** Dispatch one operation frame; returns false when the connection must
      * close (the reference closes with a CloseWebSocketFrame on protocol
      * errors — WSAddSubscriptionRequestHandler.java:27,48). */
    private def handle(json: String, auths: Seq[String]): Boolean = {
      val jv =
        try JsonMethods.parse(json)
        catch {
          case NonFatal(_) =>
            writeLock.synchronized(WebSocketCodec.writeClose(out, 1008, "unparseable request"))
            return false
        }
      def str(f: String): Option[String] = jv \ f match {
        case JString(s) => Some(s); case _ => None
      }
      def lng(f: String): Option[Long] = jv \ f match {
        case JInt(i) => Some(i.toLong); case JLong(l) => Some(l); case _ => None
      }
      val op = str("operation").getOrElse("")
      val subId = str("subscriptionId")
      try {
        op match {
          case "create" =>
            val id = subId.getOrElse(throw new IllegalArgumentException("Subscription ID is required."))
            created.computeIfAbsent(id, _ => new Subscriptions(
              row => enqueue(MetricResponseJson.response(row, id), immediate = false),
              (_, m) => enqueue(MetricResponseJson.completed(m, id), immediate = true)))
            true
          case "add" =>
            val id = subId.getOrElse(throw new IllegalArgumentException("Subscription ID is required."))
            val subs = created.get(id)
            if (subs == null) {
              // reference: unknown id -> CloseWebSocketFrame(1003, ...)
              writeLock.synchronized(WebSocketCodec.writeClose(out, 1003,
                "Unknown subscription id, create subscription first"))
              false
            } else str("metric") match {
              case None =>
                writeLock.synchronized(WebSocketCodec.writeClose(out, 1008,
                  "Metric name cannot be null in add subscription"))
                false
              case Some(metric) =>
                val tags = jv \ "tags" match {
                  case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
                  case _ => Map.empty[String, String]
                }
                subs.addMetric(id, pointsStream(), metric, tags, auths,
                  beginTimeMs = lng("startTime").getOrElse(0L),
                  endTimeMs = lng("endTime").getOrElse(0L),
                  delayMs = lng("delayTime").getOrElse(1000L),
                  ageOffTtlMs = ageOffTtlMs, nowMs = nowMs)
                true
            }
          case "remove" =>
            for (id <- subId; m <- str("metric"); s <- Option(created.get(id)))
              s.removeMetric(id, m)
            true
          case "close" =>
            subId.flatMap(id => Option(created.remove(id))).foreach(s => s.close(subId.get))
            true
          // ---- put ingest over WS (@WebSocket(operation="put"),
          // MetricRequest.java:26; WSMetricPutHandler.java:17-19) ----------
          case "put" =>
            ingest(Seq(MetricJson.parse(jv \ "metric")))
            true
          // ---- timeseries operations (netty/websocket/timeseries/) -------
          case "version" =>
            sendText(TimelyApi.Version)
            true
          case "aggregators" =>
            sendText(TimelyApi.aggregatorsJson)
            true
          case "metrics" =>
            sendText(TimelyApi.metricsJson(meta()))
            true
          case "suggest" =>
            sendText(TimelyApi.suggestJson(meta(),
              str("type").getOrElse("metrics"), str("q").orElse(str("m")).getOrElse(""),
              tagKey = str("tagk"),
              max = lng("max").map(_.toInt).getOrElse(25)))
            true
          case "lookup" =>
            val q = str("query").getOrElse(throw new IllegalArgumentException("query required"))
            val brace = q.indexOf('{')
            val (metric, tags) =
              if (brace < 0) (q, Map.empty[String, String])
              else (q.substring(0, brace),
                q.substring(brace + 1, q.length - 1).split(",").filter(_.nonEmpty).map { t =>
                  val i = t.indexOf('='); t.substring(0, i) -> t.substring(i + 1)
                }.toMap)
            sendText(TimelyApi.lookupJson(meta(), metric, tags,
              lng("limit").map(_.toInt).getOrElse(25)))
            true
          case "query" =>
            val req = QueryJson.parseRequest(json)
            val frames = QueryPlanner.plan(pointsBatch(), req, auths)
            val w = new java.io.StringWriter()
            QueryJson.writeResponses(frames, w)
            sendText(w.toString)
            true
          case "cache" =>
            // the reference serves CacheRequest over WS too (CacheRequest.java
            // @WebSocket(operation="cache")) — same CacheResponse shape as the
            // HTTP route, viz-filtered for this session
            val hot = pointsBatch()
              .where(graft.functions.VizFunctions.vizVisible(
                org.apache.spark.sql.functions.col("viz"),
                org.apache.spark.sql.functions.lit(auths.mkString(","))))
            val agg = hot.agg(
              org.apache.spark.sql.functions.min("ts"),
              org.apache.spark.sql.functions.max("ts"),
              org.apache.spark.sql.functions.sort_array(
                org.apache.spark.sql.functions.collect_set(
                  org.apache.spark.sql.functions.col("metric")))).collect().head
            val (oldest, newest, metrics) =
              if (agg.isNullAt(0)) (JNull: JValue, JNull: JValue, JArray(Nil))
              else (JLong(agg.getLong(0)): JValue, JLong(agg.getLong(1)): JValue,
                JArray(agg.getSeq[String](2).map(JString(_)).toList))
            sendText(JsonMethods.compact(JsonMethods.render(JObject(
              "oldestTimestamp" -> oldest, "newestTimestamp" -> newest,
              "metrics" -> metrics))))
            true
          case other =>
            writeLock.synchronized(
              WebSocketCodec.writeClose(out, 1008, s"unknown operation: $other"))
            false
        }
      } catch {
        case e: IllegalArgumentException =>
          writeLock.synchronized(WebSocketCodec.writeClose(out, 1008,
            Option(e.getMessage).getOrElse("bad request")))
          false
      }
    }

    // ---- batched delivery (MetricScanner flush semantics) ----------------

    private def enqueue(r: JValue, immediate: Boolean): Unit = {
      val toSend: Seq[JValue] = pending.synchronized {
        pending += r
        if (immediate || pending.size >= subscriptionBatchSize) {
          val batch = pending.toSeq; pending.clear(); batch
        } else Nil
      }
      if (toSend.nonEmpty) sendEnvelope(toSend)
    }

    private def flush(): Unit = {
      val toSend: Seq[JValue] = pending.synchronized {
        if (pending.isEmpty) Nil
        else { val batch = pending.toSeq; pending.clear(); batch }
      }
      if (toSend.nonEmpty) sendEnvelope(toSend)
    }

    private def sendEnvelope(responses: Seq[JValue]): Unit =
      sendText(MetricResponseJson.envelope(responses))

    private def sendText(text: String): Unit =
      writeLock.synchronized {
        if (!closed) try WebSocketCodec.writeText(out, text)
        catch { case NonFatal(_) => closed = true }
      }

    def shutdown(): Unit = {
      if (!closed) {
        // drain before teardown so sentinels enqueued by close() still flush
        created.forEach((id, s) => s.close(id))
        flush()
        closed = true
      }
      created.clear()
      if (flusher != null) flusher.cancel(false)
      conns.remove(this)
      try socket.close() catch { case NonFatal(_) => () }
    }
  }
}

object WebSocketApi {
  /** Diagnostics for the gateway's connection loop (spec debugging only). */
  @volatile var debug: Boolean = java.lang.Boolean.getBoolean("graft.ws.debug")
}
