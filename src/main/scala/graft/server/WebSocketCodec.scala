package graft.server

import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

/**
 * Minimal RFC 6455 WebSocket codec — handshake + frame wire format — for the
 * live subscription gateway ([[WebSocketApi]]). The reference serves
 * WebSocket through Netty's WebSocketServerProtocolHandler
 * (server/src/main/java/timely/server/Server.java:579-585); this engine's
 * facade keeps to the JDK, so the ~100 lines of wire format live here:
 * the Sec-WebSocket-Accept digest, client-masked frame decode (16/64-bit
 * extended lengths), unmasked server frame encode, and the control opcodes
 * (ping/pong/close) the protocol requires a server to answer.
 *
 * Scope: server side only, no extensions/compression, text + control frames
 * (the subscription protocol is all JSON text). Fragmented messages
 * (FIN=0 continuation) are reassembled.
 */
object WebSocketCodec {

  val OpText = 0x1
  val OpBinary = 0x2
  val OpClose = 0x8
  val OpPing = 0x9
  val OpPong = 0xA

  private val Guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** RFC 6455 §4.2.2: accept = base64(sha1(key + GUID)). */
  def acceptKey(secWebSocketKey: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest((secWebSocketKey + Guid).getBytes(UTF_8)))

  /** Read the HTTP upgrade request (request line + headers, up to the blank
    * line); returns (path, lower-cased header map). */
  def readHandshake(in: InputStream): (String, Map[String, String]) = {
    val sb = new StringBuilder
    // headers end at CRLFCRLF (tolerate bare LFLF); stop exactly there — one
    // read past the terminator would block on a client awaiting the response
    var done = false
    while (!done) {
      val cur = in.read()
      if (cur == -1) done = true
      else {
        sb.append(cur.toChar)
        if (sb.endsWith("\r\n\r\n") || sb.endsWith("\n\n")) done = true
      }
    }
    val lines = sb.toString.split("\r?\n").filter(_.nonEmpty)
    require(lines.nonEmpty, "empty handshake")
    val path = lines.head.split(" ") match {
      case Array(_, p, _*) => p
      case _ => throw new IllegalArgumentException(s"bad request line: ${lines.head}")
    }
    val headers = lines.tail.flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    (path, headers)
  }

  /** The 101 Switching Protocols response. */
  def handshakeResponse(secWebSocketKey: String): Array[Byte] =
    ("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\n" +
      "Connection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${acceptKey(secWebSocketKey)}\r\n\r\n").getBytes(UTF_8)

  /** A non-upgradable request (failed auth) is refused before the switch. */
  def refuseResponse(status: Int, reason: String): Array[Byte] =
    (s"HTTP/1.1 $status $reason\r\n" +
      "Connection: close\r\nContent-Length: 0\r\n\r\n").getBytes(UTF_8)

  /** Write one unmasked server frame (RFC 6455 §5.2; servers MUST NOT mask). */
  def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte]): Unit = {
    out.write(0x80 | (opcode & 0x0F)) // FIN + opcode
    val n = payload.length
    if (n <= 125) out.write(n)
    else if (n <= 0xFFFF) {
      out.write(126); out.write((n >>> 8) & 0xFF); out.write(n & 0xFF)
    } else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >>> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    out.write(payload)
    out.flush()
  }

  def writeText(out: OutputStream, text: String): Unit =
    writeFrame(out, OpText, text.getBytes(UTF_8))

  /** Close frame with RFC status code + reason — the shape the reference's
    * handlers send on protocol errors (CloseWebSocketFrame(1003/1008, msg),
    * WSAddSubscriptionRequestHandler.java:27,48). */
  def writeClose(out: OutputStream, code: Int, reason: String): Unit = {
    val r = reason.getBytes(UTF_8)
    val p = new Array[Byte](2 + r.length)
    p(0) = ((code >>> 8) & 0xFF).toByte
    p(1) = (code & 0xFF).toByte
    System.arraycopy(r, 0, p, 2, r.length)
    writeFrame(out, OpClose, p)
  }

  /** One complete message: control frames pass through as-is; data frames
    * reassemble FIN=0 fragments. Returns None on clean EOF. */
  def readMessage(in: InputStream): Option[(Int, Array[Byte])] = {
    var opcode = -1
    val buf = new java.io.ByteArrayOutputStream()
    var fin = false
    while (!fin) {
      readRawFrame(in) match {
        case None => return None
        case Some((f, op, payload)) =>
          if (op >= OpClose) return Some((op, payload)) // control frames never fragment
          if (opcode < 0) opcode = op // continuation frames carry opcode 0
          buf.write(payload)
          fin = f
      }
    }
    Some((opcode, buf.toByteArray))
  }

  /** One raw frame: (fin, opcode, unmasked payload). None on EOF. */
  private def readRawFrame(in: InputStream): Option[(Boolean, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val b1 = in.read()
    if (b1 < 0) return None
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0F
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7F
    if (len == 126) len = (read8(in).toLong << 8) | read8(in)
    else if (len == 127) {
      len = 0
      var i = 0
      while (i < 8) { len = (len << 8) | read8(in); i += 1 }
    }
    require(len <= Int.MaxValue, s"frame too large: $len")
    val mask = if (masked) Array.fill(4)(read8(in).toByte) else null
    val payload = in.readNBytes(len.toInt)
    if (payload.length < len) return None // truncated stream
    if (masked) {
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ mask(i & 3)).toByte
        i += 1
      }
    }
    Some((fin, opcode, payload))
  }

  private def read8(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new java.io.EOFException("mid-frame EOF")
    b
  }

  // ---- client side (for integration tests) --------------------------------

  /** Client handshake request bytes (tests play the reference's
    * WebSocketSubscriptionClient role). */
  def clientHandshake(path: String, host: String, key: String,
      cookie: Option[String] = None): Array[Byte] = {
    val cookieLine = cookie.map(c => s"Cookie: $c\r\n").getOrElse("")
    (s"GET $path HTTP/1.1\r\nHost: $host\r\nUpgrade: websocket\r\n" +
      "Connection: Upgrade\r\nSec-WebSocket-Version: 13\r\n" +
      s"Sec-WebSocket-Key: $key\r\n" + cookieLine + "\r\n").getBytes(UTF_8)
  }

  /** Write one MASKED client frame (clients MUST mask; the mask is caller-
    * supplied so tests stay deterministic). */
  def writeClientFrame(out: OutputStream, opcode: Int, payload: Array[Byte],
      mask: Array[Byte]): Unit = {
    require(mask.length == 4, "mask must be 4 bytes")
    out.write(0x80 | (opcode & 0x0F))
    val n = payload.length
    if (n <= 125) out.write(0x80 | n)
    else if (n <= 0xFFFF) {
      out.write(0x80 | 126); out.write((n >>> 8) & 0xFF); out.write(n & 0xFF)
    } else {
      out.write(0x80 | 127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >>> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    out.write(mask) // masking key precedes the payload (RFC 6455 §5.2)
    val m = payload.clone()
    var i = 0
    while (i < m.length) { m(i) = (m(i) ^ mask(i & 3)).toByte; i += 1 }
    out.write(m)
    out.flush()
  }
}
