package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Per-request authentication on the HTTP facade — the engine's analog of the
 * reference's AuthenticationServiceIT + the authenticated-access HTTP suites:
 * login mints the TSESSIONID cookie (TimelyLoginRequestHandler.java:44-58),
 * each request's cookie resolves to the caller's authorizations, and the same
 * live server answers the same query differently per identity (visibility
 * enforcement per caller, not per process). Anonymous access follows
 * SecurityProperties.allowAnonymousHttpAccess: allowed -> unlabeled points
 * only; disallowed -> 401. Also covers the /api/cache route
 * (HttpCacheRequestHandler / CacheResponse.java:7-36).
 */
class HttpAuthSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterAll {

  private val T = 1704067200000L
  private lazy val dir = Files.createTempDirectory("graft-httpauth").toFile

  private lazy val auth = new AuthSessions(
    Map("alice" -> AuthSessions.User("secret", Seq("A")),
        "bob"   -> AuthSessions.User("hunter2", Seq("B"))),
    allowAnonymous = true)

  private lazy val api = new HttpApi(spark,
    new java.io.File(dir, "data").getAbsolutePath,
    new java.io.File(dir, "meta").getAbsolutePath,
    sessions = Some(auth))
  private lazy val port = api.start()
  // no cookie handler: a CookieManager would replay the login tests'
  // Set-Cookie on later requests and the "anonymous" cases would carry a
  // session — cookies are passed explicitly per request instead
  private lazy val client = HttpClient.newHttpClient()

  private def post(path: String, body: String, cookie: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
    cookie.foreach(c => b.header("Cookie", s"${AuthSessions.CookieName}=$c"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def get(path: String, cookie: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET()
    cookie.foreach(c => b.header("Cookie", s"${AuthSessions.CookieName}=$c"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    // unlabeled + viz=A + viz=B points on one metric (viz rides the put line
    // as the reference's special `viz` tag)
    val put = post("/api/put", Seq(
      s"put sys.cpu.user $T 1.0 rack=r1",
      s"put sys.cpu.user ${T + 1000} 2.0 rack=r1 viz=A",
      s"put sys.cpu.user ${T + 2000} 4.0 rack=r1 viz=B").mkString("\n"))
    assert(put.statusCode() == 200, put.body())
  }

  override def afterAll(): Unit = {
    api.stop()
    super.afterAll()
  }

  private def queryBody =
    s"""{"start":$T,"end":${T + 6000},"msResolution":true,
       |"queries":[{"aggregator":"sum","metric":"sys.cpu.user",
       |"tags":{"rack":"r1"}}]}""".stripMargin

  /** The dps timestamps visible in a query response. */
  private def dpsKeys(body: String): Set[Long] =
    """"(\d{13})":""".r.findAllMatchIn(body).map(_.group(1).toLong).toSet

  test("login mints the TSESSIONID cookie; bad credentials 401") {
    val ok = post("/login", """{"username":"alice","password":"secret"}""")
    assert(ok.statusCode() == 200)
    val setCookie = ok.headers().firstValue("Set-Cookie")
    assert(setCookie.isPresent && setCookie.get.startsWith(s"${AuthSessions.CookieName}="),
      s"Set-Cookie must carry the session id, got $setCookie")
    assert(post("/login", """{"username":"alice","password":"wrong"}""").statusCode() == 401)
    assert(post("/login", """{"username":"nobody","password":"x"}""").statusCode() == 401)
  }

  private def loginCookie(user: String, pass: String): String = {
    val r = post("/login", s"""{"username":"$user","password":"$pass"}""")
    assert(r.statusCode() == 200)
    r.headers().firstValue("Set-Cookie").get.split(";")(0).split("=", 2)(1)
  }

  test("same live server, different identities, different viz-filtered results") {
    // anonymous: only the unlabeled point
    val anon = post("/api/query", queryBody)
    assert(anon.statusCode() == 200, anon.body())
    assert(dpsKeys(anon.body()) == Set(T), s"anonymous sees only unlabeled: ${anon.body()}")
    // alice (auths=[A]): unlabeled + viz=A
    val alice = post("/api/query", queryBody, cookie = Some(loginCookie("alice", "secret")))
    assert(dpsKeys(alice.body()) == Set(T, T + 1000), s"alice: ${alice.body()}")
    // bob (auths=[B]): unlabeled + viz=B
    val bob = post("/api/query", queryBody, cookie = Some(loginCookie("bob", "hunter2")))
    assert(dpsKeys(bob.body()) == Set(T, T + 2000), s"bob: ${bob.body()}")
  }

  test("unknown session falls back to anonymous when allowed") {
    val r = post("/api/query", queryBody, cookie = Some("not-a-session"))
    assert(r.statusCode() == 200)
    assert(dpsKeys(r.body()) == Set(T))
  }

  test("/api/cache serves the CacheResponse shape, viz-filtered per caller") {
    val anon = get("/api/cache")
    assert(anon.statusCode() == 200)
    assert(anon.body().contains(s""""oldestTimestamp":$T"""), anon.body())
    assert(anon.body().contains(s""""newestTimestamp":$T"""), anon.body()) // only unlabeled visible
    assert(anon.body().contains(""""metrics":["sys.cpu.user"]"""), anon.body())
    val alice = get("/api/cache", cookie = Some(loginCookie("alice", "secret")))
    assert(alice.body().contains(s""""newestTimestamp":${T + 1000}"""), alice.body())
  }

  test("anonymous disallowed: 401 without a live session, 200 with one") {
    val strictAuth = new AuthSessions(
      Map("alice" -> AuthSessions.User("secret", Seq("A"))), allowAnonymous = false)
    val strict = new HttpApi(spark,
      new java.io.File(dir, "data").getAbsolutePath,
      new java.io.File(dir, "meta").getAbsolutePath,
      sessions = Some(strictAuth))
    val p = strict.start()
    try {
      def go(path: String, cookie: Option[String]) = {
        val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p$path")).GET()
        cookie.foreach(c => b.header("Cookie", s"${AuthSessions.CookieName}=$c"))
        client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      }
      assert(go("/api/metrics", None).statusCode() == 401)
      assert(go("/version", None).statusCode() == 200) // version stays public
      val login = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p/login"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"username":"alice","password":"secret"}""", UTF_8)).build(),
        HttpResponse.BodyHandlers.ofString())
      val sid = login.headers().firstValue("Set-Cookie").get.split(";")(0).split("=", 2)(1)
      assert(go("/api/metrics", Some(sid)).statusCode() == 200)
    } finally strict.stop()
  }

  test("expired session resolves like an absent one") {
    var now = 0L
    val clockAuth = new AuthSessions(
      Map("u" -> AuthSessions.User("p", Seq("A"))),
      allowAnonymous = false, sessionMaxAgeMs = 1000L, nowMs = () => now)
    val sid = clockAuth.login("u", "p").get
    assert(clockAuth.resolve(Some(sid)) == Some(Seq("A")))
    now = 2000L
    assert(clockAuth.resolve(Some(sid)) == None)
  }
}
