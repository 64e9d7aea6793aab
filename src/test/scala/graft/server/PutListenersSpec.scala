package graft.server

import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.{MetricPoint, MetricsFlatBuffer}
import graft.planner.{QueryJson, QueryPlanner}
import graft.sources.PointStore

/**
 * Live-socket put round trips — the engine's analog of the reference's
 * TimelyTcpIT / TimelyUdpIT (server/src/test/java/timely/server/integration/):
 * send put lines (and a FlatBuffers batch, TimelyTcpIT.testPutMultipleBinary)
 * over REAL sockets, require them parsed/stored, then query them back through
 * the planner.
 */
class PutListenersSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterAll {

  private val T = 1704067200000L

  /** Collecting sink (the TestCaptureRequestHandler role in the reference ITs). */
  private final class Capture {
    val points = new ArrayBuffer[MetricPoint]()
    def sink(batch: Seq[MetricPoint]): Unit = points.synchronized { points ++= batch }
    def await(n: Int, timeoutMs: Long = 15000L): Seq[MetricPoint] = {
      val t0 = System.currentTimeMillis()
      while (points.synchronized(points.size) < n &&
             System.currentTimeMillis() - t0 < timeoutMs) Thread.sleep(20)
      points.synchronized(points.toSeq)
    }
  }

  test("TCP put lines round trip (TimelyTcpIT.testPutMultiple)") {
    val cap = new Capture
    val tcp = new PutListeners.Tcp(cap.sink)
    val port = tcp.start()
    try {
      val s = new Socket("127.0.0.1", port)
      val out = s.getOutputStream
      out.write((s"put sys.cpu.user $T 1.0 tag1=value1 tag2=value2\n" +
        s"put sys.cpu.idle ${T + 1} 1.0 tag3=value3 tag4=value4\n").getBytes(UTF_8))
      out.flush()
      s.close()
      val got = cap.await(2)
      assert(got.map(_.metric).toSet == Set("sys.cpu.user", "sys.cpu.idle"))
      assert(got.forall(_.value == 1.0))
      assert(got.find(_.metric == "sys.cpu.user").get.tags ==
        Map("tag1" -> "value1", "tag2" -> "value2"))
    } finally tcp.stop()
  }

  test("TCP linger flush delivers without closing the connection") {
    val cap = new Capture
    val tcp = new PutListeners.Tcp(cap.sink, lingerMs = 50)
    val port = tcp.start()
    try {
      val s = new Socket("127.0.0.1", port)
      val out = s.getOutputStream
      out.write(s"put sys.cpu.user $T 2.0 tag1=value1\n".getBytes(UTF_8))
      out.flush()
      // connection stays open (interactive telnet shape): the linger flush
      // must deliver the line anyway
      val got = cap.await(1)
      assert(got.nonEmpty && got.head.value == 2.0)
      s.close()
    } finally tcp.stop()
  }

  test("TCP version operation answers the version string (TcpVersionHandler)") {
    val cap = new Capture
    val tcp = new PutListeners.Tcp(cap.sink)
    val port = tcp.start()
    try {
      val s = new Socket("127.0.0.1", port)
      s.getOutputStream.write(s"version\nput sys.cpu.user $T 1.0 tag1=value1\n".getBytes(UTF_8))
      s.getOutputStream.flush()
      val r = new java.io.BufferedReader(new java.io.InputStreamReader(s.getInputStream, UTF_8))
      assert(r.readLine() == graft.planner.TimelyApi.Version)
      s.close()
      // the put line on the same connection still ingests
      assert(cap.await(1).map(_.metric) == Seq("sys.cpu.user"))
    } finally tcp.stop()
  }

  test("TCP FlatBuffers batch (TimelyTcpIT.testPutMultipleBinary)") {
    val pts = Seq(
      MetricPoint("sys.cpu.user", T, 1.0, Map("tag1" -> "value1"), None),
      MetricPoint("sys.cpu.idle", T + 2, 3.0, Map("tag3" -> "value3"), Some("A")))
    val cap = new Capture
    val tcp = new PutListeners.Tcp(cap.sink)
    val port = tcp.start()
    try {
      val s = new Socket("127.0.0.1", port)
      s.getOutputStream.write(MetricsFlatBuffer.encode(pts))
      s.getOutputStream.flush()
      s.close()
      val got = cap.await(2)
      assert(got.toSet == pts.toSet)
    } finally tcp.stop()
  }

  test("UDP put datagrams round trip (TimelyUdpIT.testPutMultiple)") {
    val cap = new Capture
    val udp = new PutListeners.Udp(cap.sink)
    val port = udp.start()
    try {
      val sock = new DatagramSocket()
      def send(payload: String): Unit = {
        val b = payload.getBytes(UTF_8)
        sock.send(new DatagramPacket(b, b.length, InetAddress.getByName("127.0.0.1"), port))
      }
      // one multi-line datagram + one single-line datagram + one malformed
      send(s"put sys.cpu.user $T 1.0 tag1=value1\nput sys.cpu.user ${T + 1} 2.0 tag1=value1\n")
      send(s"put sys.cpu.idle ${T + 2} 1.0 tag3=value3\n")
      send("put bad\n") // dropped like the reference drops unparseable messages
      sock.close()
      val got = cap.await(3)
      assert(got.size == 3, s"got $got")
      assert(got.map(_.metric).toSet == Set("sys.cpu.user", "sys.cpu.idle"))
    } finally udp.stop()
  }

  test("UDP FlatBuffers datagram decodes as a batch") {
    val pts = Seq(MetricPoint("sys.cpu.user", T, 7.0, Map("rack" -> "r1"), None))
    val cap = new Capture
    val udp = new PutListeners.Udp(cap.sink)
    val port = udp.start()
    try {
      val sock = new DatagramSocket()
      val b = MetricsFlatBuffer.encode(pts)
      sock.send(new DatagramPacket(b, b.length, InetAddress.getByName("127.0.0.1"), port))
      sock.close()
      assert(cap.await(1) == pts)
    } finally udp.stop()
  }

  test("TCP put -> store -> query round trip (the full TimelyTcpIT workflow)") {
    val dir = Files.createTempDirectory("graft-tcp-rt").toFile
    val dataDir = new java.io.File(dir, "data").getAbsolutePath
    import spark.implicits._
    // storage sink: every delivered batch lands in the point store
    val tcp = new PutListeners.Tcp(batch =>
      PointStore.write(batch.toDF(), dataDir))
    val port = tcp.start()
    try {
      val s = new Socket("127.0.0.1", port)
      s.getOutputStream.write((s"put sys.cpu.user $T 1.0 tag1=value1\n" +
        s"put sys.cpu.user ${T + 1000} 3.0 tag1=value1\n").getBytes(UTF_8))
      s.getOutputStream.flush()
      s.close()
      // wait for the async write to land
      val t0 = System.currentTimeMillis()
      def stored(): Long =
        // the dir may exist but hold no readable parquet yet (write in flight)
        try PointStore.read(spark, dataDir).count()
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      while (stored() < 2 && System.currentTimeMillis() - t0 < 30000L) Thread.sleep(100)
      assert(stored() == 2L)
      val req = QueryJson.parseRequest(
        s"""{"start":$T,"end":${T + 6000},"msResolution":true,
           |"queries":[{"aggregator":"sum","metric":"sys.cpu.user",
           |"tags":{"tag1":"value1"}}]}""".stripMargin)
      val frames = QueryPlanner.plan(PointStore.read(spark, dataDir), req, Seq.empty)
      val w = new java.io.StringWriter()
      QueryJson.writeResponses(frames, w)
      assert(w.toString.contains(s""""$T":1.0"""), w.toString)
      assert(w.toString.contains(s""""${T + 1000}":3.0"""), w.toString)
    } finally tcp.stop()
  }
}
