package graft.client

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket, URI}
import java.net.http.{HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import scala.util.control.NonFatal

import graft.server.WebSocketCodec

/**
 * Thin client library for the graft serving facades — the engine's analog of
 * the reference's `client/` module (timely.client.http.HttpClient,
 * timely.client.websocket.subscription.WebSocketSubscriptionClient,
 * timely.client.tcp.TcpClient, timely.client.udp.UdpClient): one small class
 * per transport, no dependencies beyond the JDK, usable from any JVM app.
 *
 * Authentication follows the reference's client flows: `login` stores the
 * `TSESSIONID` cookie and replays it on every later request (HTTP) or in the
 * WS upgrade; a TLS deployment passes an [[javax.net.ssl.SSLContext]] (built
 * from the caller's truststore/keystore — [[graft.server.Tls.clientContext]]
 * is the convenience constructor) and two-way SSL needs no login at all.
 */
object GraftClient {

  /** HTTP(S) query/metadata/put client (timely.client.http.HttpClient).
    * Thread-safe for concurrent requests; login state is one volatile
    * cookie. */
  final class Http(baseUrl: String,
                   sslContext: Option[javax.net.ssl.SSLContext] = None) {

    private val client = {
      val b = java.net.http.HttpClient.newBuilder()
      sslContext.foreach(b.sslContext)
      b.build()
    }
    @volatile private var sessionCookie: Option[String] = None

    private def request(path: String, body: Option[String]): HttpRequest = {
      val b = HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
      body match {
        case Some(s) => b.POST(HttpRequest.BodyPublishers.ofString(s, UTF_8))
        case None => b.GET()
      }
      sessionCookie.foreach(c => b.header("Cookie", s"TSESSIONID=$c"))
      b.build()
    }

    private def send(path: String, body: Option[String] = None): HttpResponse[String] =
      client.send(request(path, body), HttpResponse.BodyHandlers.ofString())

    private def expect(r: HttpResponse[String]): String = {
      require(r.statusCode() / 100 == 2,
        s"HTTP ${r.statusCode()}: ${r.body().take(200)}")
      r.body()
    }

    /** POST /login; on success the session cookie rides every later call.
      * False = bad credentials (401). */
    def login(username: String, password: String): Boolean = {
      val r = send("/login",
        Some(s"""{"username":"$username","password":"$password"}"""))
      if (r.statusCode() != 200) false
      else {
        sessionCookie = r.headers().firstValue("Set-Cookie")
          .map[Option[String]](sc => Some(sc.split(";")(0).split("=", 2)(1)))
          .orElse(None)
        sessionCookie.isDefined
      }
    }

    /** The session id, once logged in — for sharing with a WS client. */
    def session: Option[String] = sessionCookie

    def version(): String = expect(send("/version")).trim

    /** Put metric line(s) (`put <metric> <ts> <value> k=v...`) or one
      * flattened Metric JSON body. */
    def put(body: String): Unit = { expect(send("/api/put", Some(body))); () }

    def putLines(lines: Seq[String]): Unit = put(lines.mkString("\n"))

    /** POST /api/query with a request JSON; returns the response JSON. */
    def query(requestJson: String): String =
      expect(send("/api/query", Some(requestJson)))

    def aggregators(): String = expect(send("/api/aggregators"))

    def metrics(): String = expect(send("/api/metrics"))

    def suggest(kind: String, q: String, max: Int = 25): String =
      expect(send(s"/api/suggest?type=$kind&q=${enc(q)}&max=$max"))

    def lookup(query: String, limit: Int = 25): String =
      expect(send(s"/api/search/lookup?q=${enc(query)}&limit=$limit"))

    def cacheStatus(): String = expect(send("/api/cache"))

    private def enc(s: String) = java.net.URLEncoder.encode(s, UTF_8)
  }

  /**
   * WebSocket subscription client (WebSocketSubscriptionClient): connect,
   * run the subscription protocol (create/add/remove/close) and the
   * timeseries operations, and poll received text frames. Single-connection,
   * synchronized writes; `nextText` polls with a deadline.
   */
  final class WebSocket(host: String, port: Int,
                        cookie: Option[String] = None,
                        sslContext: Option[javax.net.ssl.SSLContext] = None,
                        path: String = "/websocket") {

    private val socket: Socket = sslContext match {
      case Some(ctx) => ctx.getSocketFactory.createSocket(host, port)
      case None => new Socket(host, port)
    }
    socket.setSoTimeout(250)
    private val in = new BufferedInputStream(socket.getInputStream)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private val mask = Array[Byte](0x2a, 0x15, 0x7f, 0x03)
    private val writeLock = new Object

    /** Perform the upgrade handshake; returns the HTTP status (101 = open). */
    def connect(): Int = {
      out.write(WebSocketCodec.clientHandshake(path, s"$host:$port",
        java.util.Base64.getEncoder.encodeToString(
          java.util.Arrays.copyOf(s"graft-$host-$port".getBytes(UTF_8), 16)),
        cookie.map(c => s"TSESSIONID=$c")))
      out.flush()
      val sb = new StringBuilder
      var done = false
      while (!done) {
        val cur = in.read()
        if (cur == -1) done = true
        else { sb.append(cur.toChar); if (sb.endsWith("\r\n\r\n")) done = true }
      }
      sb.toString.split(" ")(1).toInt
    }

    def send(json: String): Unit = writeLock.synchronized {
      WebSocketCodec.writeClientFrame(out, WebSocketCodec.OpText, json.getBytes(UTF_8), mask)
    }

    // ---- the subscription protocol (one JSON frame per operation) --------
    def createSubscription(id: String): Unit =
      send(s"""{"operation":"create","subscriptionId":"$id"}""")

    def addSubscription(id: String, metric: String,
                        tags: Map[String, String] = Map.empty,
                        startTime: Long = 0L, endTime: Long = 0L,
                        delayTime: Long = 1000L): Unit = {
      val tagJson =
        if (tags.isEmpty) ""
        else tags.map { case (k, v) => s""""$k":"$v"""" }.mkString(""","tags":{""", ",", "}")
      send(s"""{"operation":"add","subscriptionId":"$id","metric":"$metric"$tagJson,""" +
        s""""startTime":$startTime,"endTime":$endTime,"delayTime":$delayTime}""")
    }

    def removeSubscription(id: String, metric: String): Unit =
      send(s"""{"operation":"remove","subscriptionId":"$id","metric":"$metric"}""")

    def closeSubscription(id: String): Unit =
      send(s"""{"operation":"close","subscriptionId":"$id"}""")

    /** Poll for the next text frame until `deadlineMs`; answers pings
      * transparently. None = nothing arrived in time (or the peer closed). */
    def nextText(deadlineMs: Long = 10000L): Option[String] = {
      val t0 = System.currentTimeMillis()
      while (System.currentTimeMillis() - t0 < deadlineMs) {
        try {
          WebSocketCodec.readMessage(in) match {
            case Some((WebSocketCodec.OpText, p)) => return Some(new String(p, UTF_8))
            case Some((WebSocketCodec.OpPing, p)) => writeLock.synchronized {
              WebSocketCodec.writeClientFrame(out, WebSocketCodec.OpPong, p, mask)
            }
            case Some((WebSocketCodec.OpClose, _)) => return None
            case Some(_) => ()
            case None => return None
          }
        } catch { case _: java.net.SocketTimeoutException => () }
      }
      None
    }

    /** Collect text frames until `pred` matches one (inclusive) or the
      * deadline passes. */
    def collectUntil(pred: String => Boolean, deadlineMs: Long = 30000L): Seq[String] = {
      val acc = scala.collection.mutable.ArrayBuffer[String]()
      val t0 = System.currentTimeMillis()
      var done = false
      while (!done && System.currentTimeMillis() - t0 < deadlineMs) {
        nextText(deadlineMs - (System.currentTimeMillis() - t0)) match {
          case Some(t) => acc += t; if (pred(t)) done = true
          case None => done = true
        }
      }
      acc.toSeq
    }

    def close(): Unit = {
      try writeLock.synchronized {
        WebSocketCodec.writeClientFrame(out, WebSocketCodec.OpClose,
          Array[Byte](0x03, (0xe8 & 0xff).toByte), mask) // 1000 normal closure
      } catch { case NonFatal(_) => () }
      try socket.close() catch { case NonFatal(_) => () }
    }
  }

  /** TCP put client (timely.client.tcp.TcpClient): newline-delimited put
    * lines over one persistent connection; `flush` batches like the
    * reference's buffered writer. */
  final class Tcp(host: String, port: Int) {
    private val socket = new Socket(host, port)
    private val out = new BufferedOutputStream(socket.getOutputStream)

    def putLine(line: String): Unit = {
      out.write(line.getBytes(UTF_8))
      if (!line.endsWith("\n")) out.write('\n')
    }

    def flush(): Unit = out.flush()

    def close(): Unit = {
      try { out.flush(); socket.close() } catch { case NonFatal(_) => () }
    }
  }

  /** UDP put client (timely.client.udp.UdpClient): one datagram per put
    * frame (text put lines, or a binary TMFB batch). */
  final class Udp(host: String, port: Int) {
    private val socket = new DatagramSocket()
    private val addr = InetAddress.getByName(host)

    def send(frame: Array[Byte]): Unit =
      socket.send(new DatagramPacket(frame, frame.length, addr, port))

    def putLine(line: String): Unit = send(line.getBytes(UTF_8))

    def close(): Unit = socket.close()
  }
}
