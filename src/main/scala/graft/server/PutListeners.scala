package graft.server

import java.io.{BufferedInputStream, EOFException, PushbackInputStream}
import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket, Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import graft.model.{MetricPoint, MetricsFlatBuffer}
import graft.streaming.PutLineIngest

/**
 * Live TCP/UDP put listeners — the dev-parity acceptors of the reference's
 * socket ingest (server/src/main/java/timely/server/netty/tcp/
 * TcpPutHandler.java, udp/UdpPutHandler.java, exercised by
 * TimelyTcpIT/TimelyUdpIT put round trips). All parsing and policy live in
 * the oracle-gated ingest path ([[PutLineIngest.decodeFrame]] /
 * [[graft.model.MetricParser]]); these classes only move bytes from a socket
 * into it and hand decoded batches to the supplied sink.
 *
 * Frame auto-detection mirrors the reference's MetricsBufferDecoder
 * (common/src/main/java/timely/netty/tcp/MetricsBufferDecoder.java:28-52):
 * a TCP connection opening with the FlatBuffers "TMFB" identifier is read to
 * EOF and decoded as one Metrics batch; anything else streams as newline-
 * delimited put lines. A UDP datagram is one frame either way.
 *
 * Text lines batch toward the sink: a batch flushes at `batchSize` lines or
 * when the connection pauses for `lingerMs` (so an interactive `telnet put`
 * still lands promptly) — the socket-side analog of the ingest pipeline's
 * micro-batching. Malformed lines are dropped exactly like the reference
 * drops unparseable messages.
 */
object PutListeners {

  /** Decode a batch of text put lines through the shared ingest parser. */
  private def parseLines(lines: Seq[String]): Seq[MetricPoint] =
    lines.flatMap(l => graft.model.MetricParser.parse(l))

  final class Tcp(sink: Seq[MetricPoint] => Unit,
                  batchSize: Int = 1000, lingerMs: Int = 100) {
    private var server: ServerSocket = _
    @volatile private var running = false

    def start(port: Int = 0): Int = synchronized {
      require(server == null, "already started")
      server = new ServerSocket()
      server.bind(new InetSocketAddress(port))
      running = true
      val acceptor = new Thread(() => {
        while (running) {
          try {
            val s = server.accept()
            val t = new Thread(() => serve(s), s"graft-tcp-put-${s.getPort}")
            t.setDaemon(true)
            t.start()
          } catch {
            case _: Throwable if !running => ()
            case NonFatal(_) => ()
          }
        }
      }, "graft-tcp-put-accept")
      acceptor.setDaemon(true)
      acceptor.start()
      server.getLocalPort
    }

    def stop(): Unit = synchronized {
      running = false
      if (server != null) { try server.close() catch { case NonFatal(_) => () }; server = null }
    }

    private def serve(socket: Socket): Unit = {
      try {
        val in = new PushbackInputStream(new BufferedInputStream(socket.getInputStream), 8)
        val head = new Array[Byte](8)
        val n = readUpTo(in, head, 8)
        in.unread(head, 0, n)
        if (n == 8 && MetricsFlatBuffer.hasIdentifier(head)) {
          // binary batch: one frame per connection, read to EOF
          // (MetricsBufferDecoder's TMFB branch)
          val frame = in.readAllBytes()
          val pts = PutLineIngest.decodeFrame(frame)
          if (pts.nonEmpty) sink(pts)
        } else serveText(socket, in)
      } catch { case NonFatal(_) => () }
      finally { try socket.close() catch { case NonFatal(_) => () } }
    }

    private def serveText(socket: Socket, in: PushbackInputStream): Unit = {
      socket.setSoTimeout(lingerMs)
      val batch = new ArrayBuffer[String]()
      def flush(): Unit = if (batch.nonEmpty) {
        val pts = parseLines(batch.toSeq)
        batch.clear()
        if (pts.nonEmpty) sink(pts)
      }
      val line = new java.io.ByteArrayOutputStream()
      var open = true
      while (open) {
        try {
          val b = in.read()
          if (b < 0) { // EOF
            if (line.size > 0) { batch += new String(line.toByteArray, UTF_8); line.reset() }
            open = false
          } else if (b == '\n') {
            val l = new String(line.toByteArray, UTF_8)
            line.reset()
            if (l.trim.equalsIgnoreCase("version")) {
              // the TCP `version` operation (@Tcp(operation="version"),
              // TcpVersionHandler.java:13-17 writes the version string back)
              val out = socket.getOutputStream
              out.write((graft.planner.TimelyApi.Version + "\n").getBytes(UTF_8))
              out.flush()
            } else {
              batch += l
              if (batch.size >= batchSize) flush()
            }
          } else if (b != '\r') line.write(b)
        } catch {
          case _: SocketTimeoutException => flush() // connection paused: linger flush
        }
      }
      flush()
    }

    private def readUpTo(in: java.io.InputStream, buf: Array[Byte], n: Int): Int = {
      var off = 0
      try {
        while (off < n) {
          val r = in.read(buf, off, n - off)
          if (r < 0) return off
          off += r
        }
      } catch { case _: EOFException => () }
      off
    }
  }

  final class Udp(sink: Seq[MetricPoint] => Unit, maxPacket: Int = 65535) {
    private var socket: DatagramSocket = _
    @volatile private var running = false

    def start(port: Int = 0): Int = synchronized {
      require(socket == null, "already started")
      socket = new DatagramSocket(new InetSocketAddress(port))
      running = true
      val rx = new Thread(() => {
        val buf = new Array[Byte](maxPacket)
        val packet = new DatagramPacket(buf, buf.length)
        while (running) {
          try {
            socket.receive(packet)
            // one datagram = one frame (text lines or a TMFB batch), exactly
            // the reference's UDP pipeline shape
            val frame = java.util.Arrays.copyOfRange(
              packet.getData, packet.getOffset, packet.getOffset + packet.getLength)
            if (frame.nonEmpty) {
              val pts = PutLineIngest.decodeFrame(frame)
              if (pts.nonEmpty) sink(pts)
            }
          } catch {
            case _: Throwable if !running => ()
            case NonFatal(_) => ()
          }
        }
      }, "graft-udp-put-rx")
      rx.setDaemon(true)
      rx.start()
      socket.getLocalPort
    }

    def stop(): Unit = synchronized {
      running = false
      if (socket != null) { socket.close(); socket = null }
    }
  }
}
