package graft.server

import java.io.OutputStreamWriter
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors

import scala.util.control.NonFatal

import com.sun.net.httpserver.{HttpExchange, HttpServer, HttpsConfigurator, HttpsExchange, HttpsParameters, HttpsServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.{MetricParser, MetricPoint}
import graft.planner.{QueryJson, QueryPlanner, TimelyApi}
import graft.sources.{MetaSnapshot, PointStore}

/**
 * Thin HTTP facade over the engine's planner — the serving analog of the
 * reference's Netty HTTP pipeline (Server.java:520-527: aggregators, metrics,
 * query, search/lookup, suggest, version, put). The route handlers' LOGIC and
 * wire JSON all live in oracle-gated library code ([[QueryPlanner.runQuery]],
 * [[TimelyApi]], [[QueryJson]]); this class only binds them to a port, so an
 * OpenTSDB/Grafana-style client can speak to the engine directly.
 *
 * Storage: puts append to a [[PointStore]] parquet directory (+ meta catalog),
 * queries re-read it — the facade is stateless between requests. Bulk ingest
 * at scale should use [[graft.streaming.PutLineIngest]] / [[PointStore]]
 * directly; `/api/put` exists for wire parity and integration tests, accepting
 * both the reference's flattened Metric JSON
 * (`{"name":"m1","timestamp":1,"measure":1.0,"tags":[{"k1":"v1"}]}` —
 * Metric.java:19, HTTP body shape MetricRequest.java:56-60) and newline-
 * separated `put <metric> <ts> <value> k=v...` lines (the TCP wire format,
 * which the reference's own ITs use for seeding — ITBase.java:183-198).
 *
 * Query responses stream through [[QueryJson.writeResponses]] straight onto
 * the response body, so an `aggregator:none` query over a wide range never
 * materializes on the driver (unlike the reference server, which merges the
 * whole response in its JVM — DataStore.java:748-788).
 *
 * HTTP error mapping mirrors the reference: unparseable request → 400
 * (TimelyExceptionHandler), no matching tags → 400 "No matching tags"
 * (HttpQueryRequestHandler.java:36), unknown path → 404, internal error → 500.
 *
 * Auth: with a [[AuthSessions]] store configured, `POST /login` authenticates
 * and sets the `TSESSIONID` cookie (the reference's login handler mints the
 * session UUID and Set-Cookie the same way —
 * TimelyLoginRequestHandler.java:44-58), and every data route resolves the
 * request's cookie to the caller's authorizations, threading them into
 * [[QueryPlanner.plan]] — per-caller visibility enforcement. An absent or
 * expired session falls back to the anonymous principal or is refused with
 * 401 per the store's `allowAnonymous` policy
 * (SecurityProperties.allowAnonymousHttpAccess). Without a store, the
 * constructor `auths` apply process-wide (embedded mode).
 *
 * TLS: with a [[Tls.Config]] the facade serves HTTPS (the reference fronts
 * its HTTP pipeline with an SslHandler — Server.java:490); `needClientAuth`
 * additionally REQUIRES a client certificate (two-way SSL, TwoWaySSLIT) and
 * the verified subject DN becomes the caller's identity via
 * [[AuthSessions.resolveCert]] — no login round trip, like the reference's
 * X509 login path. Over TLS the facade also emits
 * `Strict-Transport-Security` (HTTPStrictTransportSecurityIT) and marks the
 * session cookie `Secure`.
 *
 * Transport parity (Server.java:494-527): responses gzip when the client
 * advertises `Accept-Encoding: gzip` (HttpContentCompressor analog), and
 * cross-origin requests get CORS headers with an OPTIONS preflight handler
 * (the Netty CorsHandler analog; origins reflected, credentials allowed).
 */
class HttpApi(
    spark: SparkSession,
    dataDir: String,
    metaDir: String,
    auths: Seq[String] = Seq.empty,
    internal: Option[graft.streaming.InternalMetrics] = None,
    nowMs: () => Long = () => System.currentTimeMillis(),
    metaRefreshMs: Long = 0L,
    sessions: Option[AuthSessions] = None,
    cacheBoundaryMs: Option[Long] = None,
    tls: Option[Tls.Config] = None,
    staticRoot: Option[String] = None) {

  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  /** Bind and start; `port` 0 picks an ephemeral port. Returns the bound port. */
  def start(port: Int = 0): Int = synchronized {
    require(server == null, "already started")
    server = tls match {
      case None => HttpServer.create(new InetSocketAddress(port), 0)
      case Some(cfg) =>
        val hs = HttpsServer.create(new InetSocketAddress(port), 0)
        val ctx = cfg.sslContext()
        hs.setHttpsConfigurator(new HttpsConfigurator(ctx) {
          override def configure(p: HttpsParameters): Unit = {
            val sp = ctx.getDefaultSSLParameters
            if (cfg.needClientAuth) sp.setNeedClientAuth(true)
            p.setSSLParameters(sp)
          }
        })
        hs
    }
    pool = Executors.newFixedThreadPool(4)
    server.setExecutor(pool)
    server.createContext("/", (ex: HttpExchange) => route(ex))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
    // HttpServer.stop does NOT shut down a user-supplied executor — without
    // this the 4 non-daemon pool threads outlive every server lifecycle
    if (pool != null) { pool.shutdown(); pool = null }
    metaSnap.close()
  }

  // ---- storage ----------------------------------------------------------

  private val pointSchema = org.apache.spark.sql.Encoders.product[MetricPoint].schema

  private def points: DataFrame =
    if (new java.io.File(dataDir).list() == null ||
        new java.io.File(dataDir).list().isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pointSchema)
    else PointStore.read(spark, dataDir)

  private val metaSchema = StructType(Seq(
    StructField("metric", StringType), StructField("tagk", StringType),
    StructField("tagv", StringType)))

  private def metaLoad(): DataFrame =
    if (new java.io.File(metaDir).list() == null ||
        new java.io.File(metaDir).list().isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], metaSchema)
    else spark.read.parquet(metaDir)

  /** Meta-cache analog ([[graft.sources.MetaSnapshot]]): with
    * `metaRefreshMs > 0` the suggest/lookup/metrics routes serve a persisted
    * catalog snapshot instead of rescanning parquet per request; puts mark it
    * dirty so they stay immediately visible (the reference's ingest-side
    * cache add, DataStore.java:483). */
  private val metaSnap = new MetaSnapshot(() => metaLoad(), metaRefreshMs, nowMs)

  private def meta: DataFrame =
    if (metaRefreshMs > 0) metaSnap.frame() else metaLoad()

  /** Append a put batch: points partitioned for pruning + meta catalog rows
    * (the reference writes meta keys alongside every metric mutation —
    * Meta.java:55-67). */
  private def ingest(batch: Seq[MetricPoint]): Unit = if (batch.nonEmpty) {
    import spark.implicits._
    val df = batch.toDF()
    PointStore.write(df, dataDir)
    PointStore.metaProjection(df).write.mode("append").parquet(metaDir)
    metaSnap.markDirty()
    internal.foreach { im =>
      im.incrementMetricsReceived(batch.size.toLong)
    }
  }

  // ---- request parsing --------------------------------------------------

  private def params(ex: HttpExchange): Map[String, Seq[String]] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split("&").toSeq.filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) URLDecoder.decode(kv, UTF_8) -> ""
        else URLDecoder.decode(kv.substring(0, i), UTF_8) ->
          URLDecoder.decode(kv.substring(i + 1), UTF_8)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  /** The reference's flattened Metric JSON (Metric.java:19) -> MetricPoint
    * ([[MetricJson.parse]], shared with the WS `put` operation). */
  private def parseMetricJson(json: String): MetricPoint =
    MetricJson.parse(JsonMethods.parse(json))

  /** `metric{tagk=regex,...}` (the reference's SearchLookupRequest query
    * grammar, DataStore.java:582-600). */
  private def parseLookupQuery(q: String): (String, Map[String, String]) = {
    val brace = q.indexOf('{')
    if (brace < 0) (q, Map.empty)
    else {
      require(q.endsWith("}"), s"bad lookup query: $q")
      val tags = q.substring(brace + 1, q.length - 1).split(",").toSeq
        .filter(_.nonEmpty)
        .map { t =>
          val i = t.indexOf('=')
          require(i > 0, s"bad lookup tag '$t'")
          t.substring(0, i) -> t.substring(i + 1)
        }.toMap
      (q.substring(0, brace), tags)
    }
  }

  // ---- routing ----------------------------------------------------------

  /** The TLS-verified client-certificate subject (two-way SSL), if any. */
  private def peerDn(ex: HttpExchange): Option[String] = ex match {
    case hx: HttpsExchange =>
      try Option(hx.getSSLSession.getPeerPrincipal).map(_.getName)
      catch { case _: javax.net.ssl.SSLPeerUnverifiedException => None }
    case _ => None
  }

  /** Resolve the caller's authorizations: client-cert DN first (two-way
    * TLS), then cookie -> session, with the embedded-mode constructor
    * `auths` when no session store is configured. None = refuse with 401. */
  private def requestAuths(ex: HttpExchange): Option[Seq[String]] = sessions match {
    case None => Some(auths)
    case Some(store) => store.resolveCert(peerDn(ex),
      AuthSessions.sessionFromCookie(Option(ex.getRequestHeaders.getFirst("Cookie"))))
  }

  /** Transport headers on EVERY response: HSTS over TLS
    * (HTTPStrictTransportSecurityIT pins the header on each exchange) and
    * CORS reflection when the request is cross-origin. */
  private def transportHeaders(ex: HttpExchange): Unit = {
    if (tls.isDefined)
      ex.getResponseHeaders.set("Strict-Transport-Security", "max-age=604800")
    Option(ex.getRequestHeaders.getFirst("Origin")).foreach { origin =>
      val h = ex.getResponseHeaders
      h.set("Access-Control-Allow-Origin", origin)
      h.set("Access-Control-Allow-Credentials", "true")
      h.set("Vary", "Origin")
    }
  }

  private def route(ex: HttpExchange): Unit = {
    try {
      transportHeaders(ex)
      (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case ("OPTIONS", _) =>
          // CORS preflight (the Netty CorsHandler short-circuits these the
          // same way — Server.java:518): allowed methods/headers, no body
          val h = ex.getResponseHeaders
          h.set("Access-Control-Allow-Methods", "GET, POST, OPTIONS")
          h.set("Access-Control-Allow-Headers", "Content-Type, Authorization")
          h.set("Access-Control-Max-Age", "86400")
          respond(ex, 204, "")
        case (_, "/version") =>
          respond(ex, 200, TimelyApi.Version + "\n", "text/plain")
        case ("POST", "/login") if sessions.isDefined =>
          val jv = JsonMethods.parse(body(ex))
          val cred = for {
            u <- (jv \ "username") match { case JString(s) => Some(s); case _ => None }
            p <- (jv \ "password") match { case JString(s) => Some(s); case _ => None }
          } yield (u, p)
          cred.flatMap { case (u, p) => sessions.get.login(u, p) } match {
            case Some(sid) =>
              // the reference's session cookie (TimelyLoginRequestHandler.java:52-58);
              // Secure over TLS, like the reference's cookie on its SSL port
              val secure = if (tls.isDefined) "; Secure" else ""
              ex.getResponseHeaders.add("Set-Cookie",
                s"${AuthSessions.CookieName}=$sid; Path=/; HttpOnly$secure")
              respond(ex, 200, "{}")
            case None => respond(ex, 401, "login failure\n", "text/plain")
          }
        case (m, p) if staticRoot.isDefined && !p.startsWith("/api") &&
            p != "/login" && p != "/version" =>
          // static files sit OUTSIDE the authenticated API surface, like the
          // reference's HttpStaticFileServerHandler (it receives whatever the
          // typed-request decoder did not convert, with no auth check —
          // Server.java:516, HttpStaticFileServerHandler.java:124-160)
          // hand the handler the RAW (still-encoded) path: java.net.URI has
          // already percent-decoded getPath once, and sanitizeStaticUri does
          // the one URLDecoder.decode the reference does — decoding twice
          // would 404 filenames containing literal '%' or '+'
          serveStatic(ex, m, ex.getRequestURI.getRawPath)
        case _ => requestAuths(ex) match {
          case None => respond(ex, 401, "unauthorized\n", "text/plain")
          case Some(callerAuths) => routeAuthed(ex, callerAuths)
        }
      }
    } catch {
      case e: TimelyApi.NoMatchingTagsException =>
        respond(ex, 400, e.getMessage + "\n", "text/plain")
      case e: IllegalArgumentException =>
        respond(ex, 400, Option(e.getMessage).getOrElse("bad request") + "\n", "text/plain")
      case NonFatal(e) =>
        respond(ex, 500, e.toString + "\n", "text/plain")
    } finally ex.close()
  }

  private def routeAuthed(ex: HttpExchange, callerAuths: Seq[String]): Unit = {
      (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case (_, "/api/aggregators") =>
          respond(ex, 200, TimelyApi.aggregatorsJson)
        case (_, "/api/metrics") =>
          respond(ex, 200, TimelyApi.metricsJson(meta))
        case (_, "/api/suggest") =>
          val p = params(ex)
          def one(k: String) = p.get(k).flatMap(_.headOption)
          val kind = one("type").getOrElse("metrics")
          respond(ex, 200, TimelyApi.suggestJson(
            meta, kind, one("q").orElse(one("m")).getOrElse(""),
            tagKey = one("tagk"),
            max = one("max").flatMap(_.toIntOption).getOrElse(25)))
        case (_, "/api/search/lookup") =>
          val (q, limit) =
            if (ex.getRequestMethod == "POST") {
              val jv = JsonMethods.parse(body(ex))
              val qs = jv \ "query" match {
                case JString(s) => s
                case _ => throw new IllegalArgumentException("query required")
              }
              val lim = jv \ "limit" match {
                case JInt(i) => i.toInt; case JLong(l) => l.toInt; case _ => 25
              }
              (qs, lim)
            } else {
              val p = params(ex)
              (p.get("q").orElse(p.get("query")).flatMap(_.headOption)
                 .getOrElse(throw new IllegalArgumentException("q required")),
               p.get("limit").flatMap(_.headOption).flatMap(_.toIntOption).getOrElse(25))
            }
          val (metric, tags) = parseLookupQuery(q)
          respond(ex, 200, TimelyApi.lookupJson(meta, metric, tags, limit))
        case ("POST", "/api/put") =>
          val content = body(ex).trim
          val batch =
            if (content.startsWith("put ") || content.startsWith("put\t"))
              content.linesIterator.filter(_.trim.nonEmpty).map { l =>
                MetricParser.parse(l)
                  .getOrElse(throw new IllegalArgumentException(s"unparseable put line: $l"))
              }.toSeq
            else Seq(parseMetricJson(content))
          ingest(batch)
          respond(ex, 200, "", "text/plain")
        case (m, "/api/query") =>
          val req =
            if (m == "POST") QueryJson.parseRequest(body(ex))
            else QueryJson.parseGetQuery(params(ex), nowMs)
          // stream the spliced response straight to the socket: bounded
          // driver memory even for aggregator:none over a wide range
          val pts = points
          req.queries.foreach(q => TimelyApi.requireMatchingTags(meta, q))
          val t0 = System.currentTimeMillis()
          // plan BEFORE the 200 goes out: plan-time validation (bad
          // downsample/aggregator/tag regex) must still 400, and headers
          // cannot be unsent — only execution errors after this line fall
          // through to a truncated chunked body
          val frames = QueryPlanner.plan(pts, req, callerAuths)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          val gz = wantsGzip(ex)
          if (gz) ex.getResponseHeaders.set("Content-Encoding", "gzip")
          ex.sendResponseHeaders(200, 0) // chunked
          val sink =
            if (gz) new java.util.zip.GZIPOutputStream(ex.getResponseBody)
            else ex.getResponseBody
          val w = new OutputStreamWriter(sink, UTF_8)
          val n = QueryJson.writeResponses(frames, w)
          w.flush(); w.close()
          internal.foreach(_.addQueryResponse(n, System.currentTimeMillis() - t0))
        case (_, "/api/cache") =>
          // M6: the reference's CacheResponse shape (CacheResponse.java:7-36,
          // served by HttpCacheRequestHandler) — oldest/newest timestamp and
          // the metric list of the hot (cached) window; the whole store when
          // no hot/cold boundary is configured. Viz-filtered like any read.
          // same range split as HotColdPoints.hotWindow, minus its .cache():
          // a per-request cache() would pin a new block-store entry per call
          val hot = points
            .where(col("ts") >= cacheBoundaryMs.getOrElse(0L))
            .where(graft.functions.VizFunctions.vizVisible(
              col("viz"), lit(callerAuths.mkString(","))))
          val agg = hot.agg(min("ts"), max("ts"),
            sort_array(collect_set(col("metric")))).collect().head
          val (oldest, newest, metrics) =
            if (agg.isNullAt(0)) (JNull, JNull, JArray(Nil))
            else (JLong(agg.getLong(0)), JLong(agg.getLong(1)),
              JArray(agg.getSeq[String](2).map(JString(_)).toList))
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
            "oldestTimestamp" -> oldest, "newestTimestamp" -> newest,
            "metrics" -> metrics))))
        case _ =>
          respond(ex, 404, "not found\n", "text/plain")
      }
  }

  // ---- static files ------------------------------------------------------

  /** `.*[<>&"].*` — the reference's insecure-URI reject list
    * (HttpStaticFileServerHandler.java:230). */
  private val InsecureUri = java.util.regex.Pattern.compile(""".*[<>&"].*""")
  /** Listing entries the reference will render (java:258). */
  private val AllowedFileName = java.util.regex.Pattern.compile("""[A-Za-z0-9][-_A-Za-z0-9\.]*""")
  private val HttpCacheSeconds = 60L // HttpStaticFileServerHandler.java:120

  private def httpDate(epochMs: Long): String =
    java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
      java.time.Instant.ofEpochMilli(epochMs).atZone(java.time.ZoneId.of("GMT")))

  /** Decode + reject traversal/insecure URIs, mapping `/webapp/...` under
    * `staticRoot` (the reference resolves under `user.dir` —
    * HttpStaticFileServerHandler.java:232-256). Returns null to mean 403. */
  private def sanitizeStaticUri(uri: String): java.io.File = {
    val decoded = URLDecoder.decode(uri, UTF_8)
    if (decoded.isEmpty || decoded.charAt(0) != '/' ||
        decoded.contains("/.") || decoded.contains("./") ||
        decoded.last == '.' || InsecureUri.matcher(decoded).matches()) null
    else new java.io.File(staticRoot.get, decoded)
  }

  /** GET-only file serving rooted at `staticRoot/webapp`, mirroring the
    * reference handler end to end: `/favicon.ico` aliases into `/webapp`,
    * anything outside `/webapp` is 403 (StaticFileServerIT.testGetBadPath),
    * traversal/insecure URIs 403, missing/hidden files 404, a directory URI
    * without a trailing slash redirects to one, with the slash renders a
    * listing of allowed names, and files carry the browser-cache header set
    * (Date / Expires / Cache-Control max-age / Last-Modified) with an
    * If-Modified-Since second-granularity 304 short-circuit
    * (HttpStaticFileServerHandler.java:124-228,355-374). */
  private def serveStatic(ex: HttpExchange, method: String, rawPath: String): Unit = {
    if (method != "GET") { respond(ex, 405, "method not allowed\n", "text/plain"); return }
    val uri = if (rawPath.startsWith("/favicon.ico")) rawPath.replaceFirst("/", "/webapp/")
              else rawPath
    if (!uri.startsWith("/webapp")) { respond(ex, 403, "forbidden\n", "text/plain"); return }
    val file = sanitizeStaticUri(uri)
    if (file == null) { respond(ex, 403, "forbidden\n", "text/plain"); return }
    if (file.isHidden || !file.exists()) { respond(ex, 404, "not found\n", "text/plain"); return }
    if (file.isDirectory) {
      if (uri.endsWith("/")) {
        val names = Option(file.list()).getOrElse(Array.empty[String]).sorted
          .filter(AllowedFileName.matcher(_).matches())
        val body = names.map(n => s"""<li><a href="$n">$n</a></li>""")
          .mkString(s"<html><body><h3>Listing of: $uri</h3><ul><li><a href=\"../\">..</a></li>",
            "", "</ul></body></html>")
        respond(ex, 200, body, "text/html; charset=UTF-8")
      } else {
        ex.getResponseHeaders.set("Location", uri + "/")
        respond(ex, 302, "")
      }
      return
    }
    if (!file.isFile) { respond(ex, 403, "forbidden\n", "text/plain"); return }
    val lastModS = file.lastModified() / 1000
    val ifModifiedSince = Option(ex.getRequestHeaders.getFirst("If-Modified-Since"))
      .flatMap(s => scala.util.Try(java.time.ZonedDateTime.parse(
        s, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME).toEpochSecond).toOption)
    if (ifModifiedSince.contains(lastModS)) {
      ex.getResponseHeaders.set("Date", httpDate(nowMs()))
      respond(ex, 304, "")
      return
    }
    val now = nowMs()
    val h = ex.getResponseHeaders
    h.set("Date", httpDate(now))
    h.set("Expires", httpDate(now + HttpCacheSeconds * 1000))
    h.set("Cache-Control", s"private, max-age=$HttpCacheSeconds")
    h.set("Last-Modified", httpDate(file.lastModified()))
    respondBytes(ex, 200, java.nio.file.Files.readAllBytes(file.toPath), contentTypeOf(file.getName))
  }

  /** Extension map the reference gets from `MimetypesFileTypeMap`
    * (HttpStaticFileServerHandler.java:376-379); octet-stream fallback. */
  private def contentTypeOf(name: String): String = {
    val ext = name.lastIndexOf('.') match {
      case -1 => ""
      case i  => name.substring(i + 1).toLowerCase
    }
    ext match {
      case "html" | "htm" => "text/html"
      case "css"          => "text/css"
      case "js"           => "text/javascript"
      case "json"         => "application/json"
      case "txt"          => "text/plain"
      case "png"          => "image/png"
      case "jpg" | "jpeg" => "image/jpeg"
      case "gif"          => "image/gif"
      case "svg"          => "image/svg+xml"
      case "ico"          => "image/x-icon"
      case _              => "application/octet-stream"
    }
  }

  /** Does the request advertise gzip support (HttpContentCompressor analog)? */
  private def wantsGzip(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Accept-Encoding")).exists(
      _.toLowerCase.split(",").exists(_.trim.takeWhile(_ != ';') == "gzip"))

  private def respond(ex: HttpExchange, status: Int, content: String,
      contentType: String = "application/json"): Unit =
    respondBytes(ex, status, content.getBytes(UTF_8), contentType)

  private def respondBytes(ex: HttpExchange, status: Int, raw: Array[Byte],
      contentType: String): Unit = {
    val gz = raw.nonEmpty && wantsGzip(ex)
    val bytes =
      if (!gz) raw
      else {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(raw); g.close()
        bos.toByteArray
      }
    try {
      ex.getResponseHeaders.set("Content-Type", contentType)
      if (gz) ex.getResponseHeaders.set("Content-Encoding", "gzip")
      ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    } catch {
      // headers already sent (an error mid-chunked-stream): nothing more can
      // be signalled in-band — closing the exchange truncates the chunked
      // body, which IS the client-visible error
      case _: IllegalStateException | _: java.io.IOException => ()
    }
  }
}
