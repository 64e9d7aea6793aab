package graft.server

import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Whole-server integration: all four transports over ONE store, like the
 * reference's Server.java binds them — a put over TCP and a put over UDP are
 * queryable over HTTP, and a WebSocket subscription on the same server tails
 * the same store (the cross-transport shape the reference's integration
 * suites exercise transport-by-transport).
 */
class GraftServerSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterAll {

  private val T = 1704067200000L
  private lazy val dir = Files.createTempDirectory("graft-server").toFile
  private lazy val server = new GraftServer(spark,
    new java.io.File(dir, "data").getAbsolutePath,
    new java.io.File(dir, "meta").getAbsolutePath)
  private lazy val ports = server.start()
  private lazy val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = { super.beforeAll(); ports }
  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def httpGet(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:${ports.http}$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def httpPost(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${ports.http}$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def awaitStored(n: Long): Unit = {
    val t0 = System.currentTimeMillis()
    def count(): Long =
      try graft.sources.PointStore.read(spark,
        new java.io.File(dir, "data").getAbsolutePath).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    while (count() < n && System.currentTimeMillis() - t0 < 30000L) Thread.sleep(100)
    assert(count() >= n, s"expected >= $n stored points")
  }

  test("TCP and UDP puts are queryable over HTTP (one store behind every transport)") {
    // TCP put
    val s = new Socket("127.0.0.1", ports.tcp)
    s.getOutputStream.write(s"put xport.metric $T 1.0 src=tcp\n".getBytes(UTF_8))
    s.getOutputStream.flush(); s.close()
    // UDP put — datagrams are fire-and-forget, and under a fully loaded CI
    // host the kernel may drop one before the listener drains its socket:
    // resend until the store shows it rather than flaking. Resends can land
    // as duplicate stored points (append store), so the query below uses a
    // duplicate-insensitive aggregator (max), not sum.
    val sock = new DatagramSocket()
    val b = s"put xport.metric ${T + 1000} 2.0 src=udp\n".getBytes(UTF_8)
    def stored(): Long =
      try graft.sources.PointStore.read(spark,
        new java.io.File(dir, "data").getAbsolutePath).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    val t0 = System.currentTimeMillis()
    while (stored() < 2 && System.currentTimeMillis() - t0 < 30000L) {
      sock.send(new DatagramPacket(b, b.length, InetAddress.getByName("127.0.0.1"), ports.udp))
      Thread.sleep(500)
    }
    sock.close()
    awaitStored(2)
    // HTTP query sees both transports' points
    val q = httpPost("/api/query",
      s"""{"start":$T,"end":${T + 6000},"msResolution":true,
         |"queries":[{"aggregator":"max","metric":"xport.metric","tags":{"src":"*"}}]}""".stripMargin)
    assert(q.statusCode() == 200, q.body())
    assert(q.body().contains(s""""$T":1.0"""), q.body())
    assert(q.body().contains(s""""${T + 1000}":2.0"""), q.body())
    // and the meta catalog learned the metric (suggest over HTTP)
    val sug = httpGet("/api/suggest?type=metrics&q=xport")
    assert(sug.body().contains("xport.metric"), sug.body())
  }

  test("WS subscription on the same server tails the store the sockets append to") {
    // subscribe over WS first, then put over TCP — the subscription must
    // deliver the socket-ingested point (reference: MetricScanner tails the
    // store every put handler writes)
    val ws = new Socket("127.0.0.1", ports.ws)
    ws.setSoTimeout(500)
    val out = new java.io.BufferedOutputStream(ws.getOutputStream)
    val in = new java.io.BufferedInputStream(ws.getInputStream)
    out.write(WebSocketCodec.clientHandshake("/websocket", s"127.0.0.1:${ports.ws}",
      "dGhlIHNhbXBsZSBub25jZQ=="))
    out.flush()
    val sb = new StringBuilder
    var done = false
    while (!done) {
      val c = in.read()
      if (c == -1) done = true
      else { sb.append(c.toChar); if (sb.endsWith("\r\n\r\n")) done = true }
    }
    assert(sb.toString.startsWith("HTTP/1.1 101"), sb.toString)
    val mask = Array[Byte](9, 8, 7, 6)
    def send(json: String): Unit =
      WebSocketCodec.writeClientFrame(out, WebSocketCodec.OpText, json.getBytes(UTF_8), mask)
    send("""{"operation":"create","subscriptionId":"xp"}""")
    send("""{"operation":"add","subscriptionId":"xp","metric":"live.metric","delayTime":200}""")
    Thread.sleep(2000) // tail running
    val s = new Socket("127.0.0.1", ports.tcp)
    s.getOutputStream.write(s"put live.metric ${T + 50} 7.5 src=tcp\n".getBytes(UTF_8))
    s.getOutputStream.flush(); s.close()
    // collect frames until the subscription delivers the TCP-put point
    val t0 = System.currentTimeMillis()
    var seen = false
    while (!seen && System.currentTimeMillis() - t0 < 60000L) {
      try {
        WebSocketCodec.readMessage(in) match {
          case Some((WebSocketCodec.OpText, p)) =>
            val frames = JsonMethods.parse(new String(p, UTF_8)) \ "responses" match {
              case JArray(rs) => rs; case _ => Nil
            }
            seen = frames.exists(r => r \ "metric" == JString("live.metric") &&
              r \ "complete" == JBool(false))
          case None => Thread.sleep(100)
          case _ => ()
        }
      } catch { case _: java.net.SocketTimeoutException => () }
    }
    send("""{"operation":"close","subscriptionId":"xp"}""")
    ws.close()
    assert(seen, "WS subscription must deliver the TCP-ingested point")
  }
}
