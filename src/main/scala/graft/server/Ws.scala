package graft.server

import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

/** Minimal RFC 6455 websocket framing over blocking JDK streams — the
  * server side of the Engine.IO websocket transport. Implemented from the
  * public RFC (handshake §4, framing §5): no external deps, no JDK
  * internals.
  *
  * The reference serves websocket via socketioxide
  * (/root/reference/leaf-server/src/http.rs:32-45); this from-scratch layer
  * gives the shipped socket.io client its default transport instead of
  * forced long-polling.
  */
object Ws {

  /** RFC 6455 §4.2.2: accept token = base64(SHA-1(key + fixed GUID)). */
  def acceptKey(secWebSocketKey: String): String =
    Base64.getEncoder.encodeToString(MessageDigest.getInstance("SHA-1")
      .digest((secWebSocketKey + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
        .getBytes(UTF_8)))

  /** One complete message after continuation reassembly. `text` carries
    * opcode 1 payloads decoded as UTF-8; `binary` opcode 2 raw bytes. */
  sealed trait Message
  case class Text(s: String) extends Message
  case class Binary(b: Array[Byte]) extends Message
  case class Close(code: Int) extends Message

  /** Cap a single reassembled message — an engine.io packet is bounded by
    * maxPayload (1MB advertised); 16MB leaves headroom without letting one
    * client balloon server memory. */
  private val MaxMessageBytes = 16 * 1024 * 1024

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new java.io.EOFException("websocket stream closed mid-frame")
      off += r
    }
    buf
  }

  /** Read one message (handling fragmentation and answering nothing —
    * control frames PING/PONG are surfaced via the callbacks so the caller
    * owns all writes on its single writer lock). Returns Close on a close
    * frame or EOF. */
  def readMessage(in: InputStream, onPing: Array[Byte] => Unit): Message = {
    var assembling: Option[(Int, java.io.ByteArrayOutputStream)] = None
    while (true) {
      val b0 = in.read()
      if (b0 < 0) return Close(1006)
      val fin = (b0 & 0x80) != 0
      val opcode = b0 & 0x0f
      val b1 = in.read()
      if (b1 < 0) return Close(1006)
      val masked = (b1 & 0x80) != 0
      var len: Long = b1 & 0x7f
      if (len == 126) {
        val ext = readFully(in, 2)
        len = ((ext(0) & 0xff) << 8) | (ext(1) & 0xff)
      } else if (len == 127) {
        val ext = readFully(in, 8)
        len = ext.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xff))
      }
      // RFC 6455 §5.1: client-to-server frames MUST be masked
      if (!masked) return Close(1002)
      if (len > MaxMessageBytes) return Close(1009)
      val mask = readFully(in, 4)
      val payload = readFully(in, len.toInt)
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ mask(i % 4)).toByte
        i += 1
      }
      opcode match {
        case 0x8 => // close
          val code = if (payload.length >= 2)
            ((payload(0) & 0xff) << 8) | (payload(1) & 0xff) else 1005
          return Close(code)
        case 0x9 => onPing(payload) // ping — caller writes the pong
        case 0xa => // pong — liveness only
        case 0x1 | 0x2 => // data frame
          if (fin && assembling.isEmpty) {
            return if (opcode == 0x1) Text(new String(payload, UTF_8))
            else Binary(payload)
          }
          if (assembling.nonEmpty) return Close(1002) // new data mid-fragment
          val bos = new java.io.ByteArrayOutputStream()
          bos.write(payload)
          assembling = Some((opcode, bos))
        case 0x0 => // continuation
          assembling match {
            case Some((op, bos)) =>
              if (bos.size().toLong + payload.length > MaxMessageBytes)
                return Close(1009)
              bos.write(payload)
              if (fin) {
                val whole = bos.toByteArray
                return if (op == 0x1) Text(new String(whole, UTF_8))
                else Binary(whole)
              }
            case None => return Close(1002) // continuation with nothing open
          }
        case _ => return Close(1002) // reserved opcode
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte]): Unit = {
    val n = payload.length
    out.write(0x80 | opcode) // FIN + opcode; server frames are unmasked
    if (n < 126) out.write(n)
    else if (n < 0x10000) {
      out.write(126); out.write(n >> 8); out.write(n & 0xff)
    } else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >> (i * 8)) & 0xff).toInt); i -= 1 }
    }
    out.write(payload)
    out.flush()
  }

  def writeText(out: OutputStream, s: String): Unit =
    writeFrame(out, 0x1, s.getBytes(UTF_8))

  def writeBinary(out: OutputStream, b: Array[Byte]): Unit =
    writeFrame(out, 0x2, b)

  def writePong(out: OutputStream, payload: Array[Byte]): Unit =
    writeFrame(out, 0xa, payload)

  def writeClose(out: OutputStream, code: Int): Unit =
    writeFrame(out, 0x8, Array(((code >> 8) & 0xff).toByte, (code & 0xff).toByte))
}
