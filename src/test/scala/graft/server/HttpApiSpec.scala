package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Live-port integration test of [[HttpApi]], mirroring the reference's
 * HttpApiIT put -> query round trip (HttpApiIT.java:229-312: the standard
 * 4-line fixture, then /api/query with msResolution on and off) plus the
 * catalog endpoints (suggest / lookup / metrics / aggregators / version) and
 * the reference's 400 contracts (no matching tags —
 * HttpQueryRequestHandler.java:36 — and unparseable requests).
 */
class HttpApiSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterAll {

  private val T = 1704067200000L
  private lazy val dir = Files.createTempDirectory("graft-http").toFile
  private lazy val api = new HttpApi(spark,
    new java.io.File(dir, "data").getAbsolutePath,
    new java.io.File(dir, "meta").getAbsolutePath)
  private lazy val port = api.start()
  private lazy val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())

  override def afterAll(): Unit = {
    api.stop()
    super.afterAll()
  }

  test("put lines -> query round trip (HttpApiIT fixture), with and without msResolution") {
    // the reference IT's exact 4-line seed (HttpApiIT.java:231-236)
    val put = post("/api/put", Seq(
      s"put sys.cpu.user $T 1.0 tag1=value1 tag2=value2",
      s"put sys.cpu.user ${T + 1} 1.0 tag3=value3",
      s"put sys.cpu.idle ${T + 2} 1.0 tag3=value3 tag4=value4",
      s"put sys.cpu.idle ${T + 1000} 3.0 tag3=value3 tag4=value4").mkString("\n"))
    assert(put.statusCode() == 200)

    // msResolution=false: SECOND-resolution dps keys (testQueryWithoutMsResolution)
    val q = post("/api/query",
      s"""{"start":$T,"end":${T + 6000},"msResolution":false,
         |"queries":[{"aggregator":"sum","metric":"sys.cpu.idle",
         |"downsample":"1s-max","tags":{"tag3":"value3"}}]}""".stripMargin)
    assert(q.statusCode() == 200)
    assert(q.body() ==
      s"""[{"metric":"sys.cpu.idle","tags":{"tag3":"value3"},"aggregatedTags":["tag4"],""" +
      s""""dps":{"${T / 1000}":1.0,"${T / 1000 + 1}":3.0}}]""")

    // msResolution=true: millisecond keys, 1s-aligned (testQueryWithMsResolution)
    val qMs = post("/api/query",
      s"""{"start":$T,"end":${T + 6000},"msResolution":true,
         |"queries":[{"aggregator":"sum","metric":"sys.cpu.idle",
         |"downsample":"1s-max","tags":{"tag3":"value3"}}]}""".stripMargin)
    assert(qMs.statusCode() == 200)
    assert(qMs.body().contains(s""""dps":{"$T":1.0,"${T + 1000}":3.0}"""))
  }

  test("GET-form query (m= grammar)") {
    val r = get(s"/api/query?start=$T&end=${T + 6000}" +
      "&m=sum:1s-max:sys.cpu.idle%7Btag3%3Dvalue3%7D%7Btag3%3Dvalue3%7D")
    assert(r.statusCode() == 200)
    assert(r.body().contains(s""""${T / 1000}":1.0"""))
  }

  test("query with no matching tags is the reference's 400") {
    val r = post("/api/query",
      s"""{"start":$T,"end":${T + 6000},
         |"queries":[{"aggregator":"sum","metric":"sys.cpu.idle",
         |"tags":{"tag3":"nosuchvalue"}}]}""".stripMargin)
    assert(r.statusCode() == 400)
    assert(r.body().contains("No matching tags"))
  }

  test("unparseable query body is a 400") {
    assert(post("/api/query", """{"end":5}""").statusCode() == 400)
  }

  test("metric JSON put (reference Metric.java:19 flattened shape)") {
    val r = post("/api/put",
      s"""{"name":"sys.mem.free","timestamp":${T + 5},"measure":42.0,"tags":[{"host":"h1"}]}""")
    assert(r.statusCode() == 200)
    val q = post("/api/query",
      s"""{"start":$T,"end":${T + 6000},
         |"queries":[{"aggregator":"none","metric":"sys.mem.free"}]}""".stripMargin)
    assert(q.statusCode() == 200)
    assert(q.body().contains(""""metric":"sys.mem.free""""))
    assert(q.body().contains("42.0"))
  }

  test("suggest / lookup / metrics catalog endpoints") {
    val sg = get("/api/suggest?type=metrics&q=sys.cpu&max=10")
    assert(sg.statusCode() == 200)
    assert(sg.body() == """["sys.cpu.idle","sys.cpu.user"]""")

    // lookup grammar metric{tagk=regex} (testSearchLookup's fixture family)
    val lk = get("/api/search/lookup?q=sys.cpu.idle%7Btag3%3D.*%7D&limit=10")
    assert(lk.statusCode() == 200)
    assert(lk.body().contains(""""results":[{"tags":{"tag3":"value3"}"""))
    assert(lk.body().contains(""""totalResults":1"""))

    val mt = get("/api/metrics")
    assert(mt.statusCode() == 200)
    assert(mt.body().contains(""""metric":"sys.cpu.idle""""))
    assert(mt.body().contains("""{"key":"tag3","value":"value3"}"""))
  }

  test("aggregators and version") {
    val ag = get("/api/aggregators")
    assert(ag.statusCode() == 200)
    assert(ag.body() == """["avg","dev","max","min","sum","count","none"]""")
    val v = get("/version")
    assert(v.statusCode() == 200 && v.body().trim.nonEmpty)
    assert(get("/nope").statusCode() == 404)
  }

  test("plan-time validation errors still 400 (headers not sent before planning)") {
    val r = post("/api/query",
      s"""{"start":$T,"end":${T + 6000},
         |"queries":[{"aggregator":"sum","metric":"sys.cpu.idle",
         |"downsample":"garbage","tags":{"tag3":"value3"}}]}""".stripMargin)
    assert(r.statusCode() == 400, s"got ${r.statusCode()}: ${r.body()}")
  }

  test("JSON put without tags is rejected (line-protocol parity, no orphan points)") {
    val r = post("/api/put", """{"name":"orphan.metric","timestamp":1,"measure":1.0,"tags":[]}""")
    assert(r.statusCode() == 400, s"got ${r.statusCode()}: ${r.body()}")
    // viz alone doesn't count: it's stripped into the visibility slot
    val r2 = post("/api/put",
      """{"name":"orphan.metric","timestamp":1,"measure":1.0,"tags":[{"viz":"A"}]}""")
    assert(r2.statusCode() == 400)
    assert(get("/api/suggest?type=metrics&q=orphan&max=10").body() == "[]")
  }

  test("gzip response compression when the client advertises it (HttpContentCompressor parity)") {
    // fixed-length route
    val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/api/aggregators"))
      .header("Accept-Encoding", "gzip").GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Encoding").orElse("") == "gzip")
    val un = new String(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(r.body())).readAllBytes(), UTF_8)
    assert(un == """["avg","dev","max","min","sum","count","none"]""")
    // chunked streaming query route
    val q = client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/query"))
      .header("Accept-Encoding", "gzip")
      .POST(HttpRequest.BodyPublishers.ofString(
        s"""{"start":$T,"end":${T + 6000},
           |"queries":[{"aggregator":"none","metric":"sys.cpu.idle"}]}""".stripMargin, UTF_8))
      .build(), HttpResponse.BodyHandlers.ofByteArray())
    assert(q.statusCode() == 200)
    assert(q.headers().firstValue("Content-Encoding").orElse("") == "gzip")
    val qb = new String(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(q.body())).readAllBytes(), UTF_8)
    assert(qb.contains(""""metric":"sys.cpu.idle""""), qb)
    // no Accept-Encoding -> identity (and clients that don't ask never see gzip)
    val plain = get("/api/aggregators")
    assert(plain.headers().firstValue("Content-Encoding").isEmpty)
  }

  test("CORS: preflight answered, origins reflected with credentials (CorsHandler parity)") {
    val pre = client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/query"))
      .header("Origin", "https://grafana.example")
      .header("Access-Control-Request-Method", "POST")
      .method("OPTIONS", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(pre.statusCode() == 204, s"${pre.statusCode()} ${pre.body()}")
    assert(pre.headers().firstValue("Access-Control-Allow-Origin").orElse("")
      == "https://grafana.example")
    assert(pre.headers().firstValue("Access-Control-Allow-Methods").orElse("").contains("POST"))
    assert(pre.headers().firstValue("Access-Control-Allow-Credentials").orElse("") == "true")
    // actual cross-origin request: origin reflected on the response too
    val r = client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/version"))
      .header("Origin", "https://grafana.example").GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Access-Control-Allow-Origin").orElse("")
      == "https://grafana.example")
    // same-origin requests stay untouched
    assert(get("/version").headers().firstValue("Access-Control-Allow-Origin").isEmpty)
    // plain HTTP: no HSTS (it is a TLS-only header)
    assert(get("/version").headers().firstValue("Strict-Transport-Security").isEmpty)
  }

  test("meta-cache mode: suggest serves the snapshot and puts stay visible") {
    // a second server on the same storage with the snapshot ON; a put must
    // show up in the very next suggest (markDirty = the reference's
    // ingest-side cache add, DataStore.java:483)
    val cached = new HttpApi(spark,
      new java.io.File(dir, "data").getAbsolutePath,
      new java.io.File(dir, "meta").getAbsolutePath,
      metaRefreshMs = 3600000L)
    val p2 = cached.start()
    def get2(path: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p2$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      assert(get2("/api/suggest?type=metrics&q=sys.cpu&max=10").body()
        == """["sys.cpu.idle","sys.cpu.user"]""")
      // cached: same answer again without a rescan (unit contract pinned in
      // MetaSnapshotSpec; here we pin the wiring end to end)
      assert(get2("/api/suggest?type=metrics&q=sys.cpu&max=10").statusCode() == 200)
      val put = client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p2/api/put"))
          .POST(HttpRequest.BodyPublishers.ofString(s"put sys.cpu.wait $T 1.0 tag1=value1", UTF_8)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(put.statusCode() == 200)
      assert(get2("/api/suggest?type=metrics&q=sys.cpu&max=10").body()
        == """["sys.cpu.idle","sys.cpu.user","sys.cpu.wait"]""")
    } finally cached.stop()
  }
}
