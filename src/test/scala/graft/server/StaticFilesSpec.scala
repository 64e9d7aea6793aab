package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Static-file serving on the HTTP facade, mirroring the reference's
 * HttpStaticFileServerHandler + StaticFileServerIT:
 *   - `/favicon.ico` aliases into `/webapp` and 404s when absent
 *     (StaticFileServerIT.testGetFavIconRequest),
 *   - any path outside `/webapp` is 403 (testGetBadPath),
 *   - a missing `/webapp` file is 404 (testGetGoodPath),
 * plus the handler behaviors the IT's webapp-less profile can't reach:
 * content + Content-Type + browser-cache headers on a real file, the
 * If-Modified-Since 304 short-circuit, traversal/insecure-URI 403s, the
 * directory redirect + listing, and GET-only 405
 * (HttpStaticFileServerHandler.java:124-260,355-374).
 */
class StaticFilesSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterAll {

  private lazy val dir = Files.createTempDirectory("graft-static").toFile
  private lazy val webapp = {
    val w = new java.io.File(dir, "webapp")
    assert(w.mkdirs())
    Files.writeString(new java.io.File(w, "test.html").toPath,
      "<html><body>graft</body></html>")
    Files.writeString(new java.io.File(w, "secret.txt").toPath, "top")
    val sub = new java.io.File(w, "js"); assert(sub.mkdirs())
    Files.writeString(new java.io.File(sub, "app.js").toPath, "console.log(1)")
    w
  }
  private lazy val api = {
    webapp // force fixture creation before the server roots at dir
    new HttpApi(spark,
      new java.io.File(dir, "data").getAbsolutePath,
      new java.io.File(dir, "meta").getAbsolutePath,
      staticRoot = Some(dir.getAbsolutePath))
  }
  private lazy val port = api.start()
  private lazy val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NEVER).build()

  private def get(path: String, headers: (String, String)*): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  override def afterAll(): Unit = {
    api.stop()
    super.afterAll()
  }

  test("the three StaticFileServerIT contracts: favicon 404, bad path 403, missing file 404") {
    assert(get("/favicon.ico").statusCode() == 404)    // aliases to /webapp/favicon.ico, absent
    assert(get("/index.html").statusCode() == 403)     // outside /webapp
    assert(get("/webapp/missing.html").statusCode() == 404)
  }

  test("a real /webapp file serves with content-type and browser-cache headers") {
    val r = get("/webapp/test.html")
    assert(r.statusCode() == 200)
    assert(r.body() == "<html><body>graft</body></html>")
    assert(r.headers().firstValue("Content-Type").get.startsWith("text/html"))
    assert(r.headers().firstValue("Cache-Control").get == "private, max-age=60")
    assert(r.headers().firstValue("Last-Modified").isPresent)
    assert(r.headers().firstValue("Expires").isPresent)
    val js = get("/webapp/js/app.js")
    assert(js.statusCode() == 200 && js.headers().firstValue("Content-Type").get == "text/javascript")
  }

  test("If-Modified-Since at second granularity returns 304 with no body") {
    val first = get("/webapp/test.html")
    val lastMod = first.headers().firstValue("Last-Modified").get
    val r = get("/webapp/test.html", "If-Modified-Since" -> lastMod)
    assert(r.statusCode() == 304)
    assert(r.body().isEmpty)
    // a stale validator still gets the full 200
    val stale = get("/webapp/test.html",
      "If-Modified-Since" -> "Wed, 01 Jan 2020 00:00:00 GMT")
    assert(stale.statusCode() == 200 && stale.body().nonEmpty)
  }

  test("traversal and insecure URIs are 403 (sanitizeUri reject list)") {
    // raw-socket request: HttpClient normalizes ../ away, the server must not rely on that
    def raw(path: String): Int = {
      val s = new java.net.Socket("127.0.0.1", port)
      try {
        s.getOutputStream.write(s"GET $path HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n".getBytes(UTF_8))
        val line = new java.io.BufferedReader(
          new java.io.InputStreamReader(s.getInputStream, UTF_8)).readLine()
        line.split(" ")(1).toInt
      } finally s.close()
    }
    assert(raw("/webapp/../secret.txt") == 403)
    assert(raw("/webapp/%2e%2e/secret.txt") == 403)
    assert(raw("/webapp/a%22b.html") == 403) // embedded quote
  }

  test("directory without trailing slash redirects; with slash lists allowed names") {
    val redir = get("/webapp/js")
    assert(redir.statusCode() == 302)
    assert(redir.headers().firstValue("Location").get == "/webapp/js/")
    val listing = get("/webapp/js/")
    assert(listing.statusCode() == 200)
    assert(listing.body().contains("app.js"))
    assert(listing.headers().firstValue("Content-Type").get.startsWith("text/html"))
  }

  test("non-GET methods on static paths are 405; API routes still work alongside") {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/webapp/test.html"))
        .POST(HttpRequest.BodyPublishers.ofString("x", UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 405)
    assert(get("/version").statusCode() == 200)
    assert(get("/api/aggregators").statusCode() == 200)
  }
}
