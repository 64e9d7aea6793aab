package graft.client

import java.nio.file.Files

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.server.{AuthSessions, GraftServer}

/**
 * The client library driving a LIVE GraftServer end to end — the engine's
 * analog of the reference's client-based integration suites (the reference
 * ITs construct timely.client.http.HttpClient /
 * WebSocketSubscriptionClient / TcpClient / UdpClient against a running
 * server; here every wire interaction goes through [[GraftClient]], no raw
 * sockets in the test).
 */
class GraftClientSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterAll {

  private val T = 1704067200000L
  private lazy val dir = Files.createTempDirectory("graft-client").toFile
  private lazy val auth = new AuthSessions(
    Map("alice" -> AuthSessions.User("secret", Seq("A"))),
    allowAnonymous = true)
  private lazy val server = new GraftServer(spark,
    new java.io.File(dir, "data").getAbsolutePath,
    new java.io.File(dir, "meta").getAbsolutePath,
    sessions = Some(auth))
  private lazy val ports = server.start()
  private lazy val http = new GraftClient.Http(s"http://127.0.0.1:${ports.http}")

  override def beforeAll(): Unit = { super.beforeAll(); ports }
  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def storedCount(): Long =
    try graft.sources.PointStore.read(spark,
      new java.io.File(dir, "data").getAbsolutePath).count()
    catch { case _: org.apache.spark.sql.AnalysisException => 0L }

  test("HTTP client: login, put, query, catalog — the full request surface") {
    assert(!new GraftClient.Http(s"http://127.0.0.1:${ports.http}")
      .login("alice", "wrong"), "bad credentials refused")
    assert(http.login("alice", "secret"))
    assert(http.session.isDefined)
    assert(http.version().nonEmpty)

    http.putLines(Seq(
      s"put client.metric $T 1.0 src=http",
      s"put client.metric ${T + 1000} 2.0 src=http viz=A"))
    val q = http.query(
      s"""{"start":$T,"end":${T + 6000},"msResolution":true,
         |"queries":[{"aggregator":"max","metric":"client.metric",
         |"tags":{"src":"http"}}]}""".stripMargin)
    // alice's auths [A]: both points visible through the logged-in client
    assert(q.contains(s""""$T":1.0""") && q.contains(s""""${T + 1000}":2.0"""), q)
    // an anonymous client on the same server sees only the unlabeled point
    val anon = new GraftClient.Http(s"http://127.0.0.1:${ports.http}")
    val qa = anon.query(
      s"""{"start":$T,"end":${T + 6000},"msResolution":true,
         |"queries":[{"aggregator":"max","metric":"client.metric",
         |"tags":{"src":"http"}}]}""".stripMargin)
    assert(qa.contains(s""""$T":1.0""") && !qa.contains(s""""${T + 1000}""""), qa)

    assert(http.aggregators().contains("\"avg\""))
    assert(http.suggest("metrics", "client").contains("client.metric"))
    assert(http.lookup("client.metric{src=.*}").contains(""""totalResults""""))
    assert(http.metrics().contains(""""metric":"client.metric""""))
    assert(http.cacheStatus().contains(""""metrics""""))
  }

  test("TCP and UDP clients: socket puts are queryable through the HTTP client") {
    val before = storedCount()
    val tcp = new GraftClient.Tcp("127.0.0.1", ports.tcp)
    tcp.putLine(s"put client.sock $T 3.0 src=tcp")
    tcp.flush(); tcp.close()
    // UDP datagrams can drop under load: resend until stored (duplicates are
    // fine — the query below uses max)
    val udp = new GraftClient.Udp("127.0.0.1", ports.udp)
    val t0 = System.currentTimeMillis()
    while (storedCount() < before + 2 && System.currentTimeMillis() - t0 < 30000L) {
      udp.putLine(s"put client.sock ${T + 1000} 4.0 src=udp\n")
      Thread.sleep(500)
    }
    udp.close()
    assert(storedCount() >= before + 2)
    val q = http.query(
      s"""{"start":$T,"end":${T + 6000},"msResolution":true,
         |"queries":[{"aggregator":"max","metric":"client.sock","tags":{"src":"*"}}]}""".stripMargin)
    assert(q.contains(s""""$T":3.0""") && q.contains(s""""${T + 1000}":4.0"""), q)
  }

  test("WS client: subscription protocol delivers puts and the close sentinel") {
    assert(http.login("alice", "secret"))
    val ws = new GraftClient.WebSocket("127.0.0.1", ports.ws, cookie = http.session)
    assert(ws.connect() == 101)
    // timeseries op round trip through the client
    ws.send("""{"operation":"version"}""")
    assert(ws.nextText().exists(_.nonEmpty))
    ws.createSubscription("csub")
    ws.addSubscription("csub", "client.live", delayTime = 200L)
    Thread.sleep(2000) // tail running
    http.put(s"put client.live ${T + 50} 7.5 src=ws")
    val frames = ws.collectUntil(_.contains(""""metric":"client.live""""), deadlineMs = 60000L)
    assert(frames.exists { f =>
      (JsonMethods.parse(f) \ "responses") match {
        case JArray(rs) => rs.exists(r => r \ "metric" == JString("client.live") &&
          r \ "complete" == JBool(false))
        case _ => false
      }
    }, s"subscription must deliver the put point; got ${frames.mkString(" | ")}")
    ws.closeSubscription("csub")
    // teardown sentinel arrives as complete:true
    val sentinel = ws.collectUntil(_.contains(""""complete":true"""), deadlineMs = 15000L)
    assert(sentinel.exists(_.contains(""""complete":true""")))
    ws.close()
  }
}
