package graft.server

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** MessagePack codec, implemented from the public format specification
  * (msgpack.org). This is the wire encoding the reference's socket.io layer
  * speaks: the server installs socketioxide's msgpack parser
  * (/root/reference/leaf-server/src/http.rs:33) and the shipped TypeScript
  * client connects with `socket.io-msgpack-parser`
  * (clients/typescript/src/index.ts:2,104) — every Socket.IO packet is one
  * msgpack-encoded map instead of the default JSON framing.
  *
  * Model mapping (same dynamic shapes `Json`/`Drisl` use):
  *   null ↔ nil · Boolean ↔ bool · Long ↔ int family · Double ↔ float64
  *   String ↔ str family · Array[Byte] ↔ bin family
  *   Vector[Any] ↔ array family · Map[String, Any] ↔ map family
  * Decode widens every integer to Long and float32 to Double; ext types are
  * rejected (the socket.io msgpack parsers never emit them).
  */
object Msgpack {

  def encode(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    write(out, v)
    out.toByteArray
  }

  private def writeBE(out: ByteArrayOutputStream, value: Long, bytes: Int): Unit = {
    var shift = (bytes - 1) * 8
    while (shift >= 0) { out.write(((value >> shift) & 0xff).toInt); shift -= 8 }
  }

  private def write(out: ByteArrayOutputStream, v: Any): Unit = v match {
    case null => out.write(0xc0)
    case b: Boolean => out.write(if (b) 0xc3 else 0xc2)
    case i: Int => write(out, i.toLong)
    case i: Short => write(out, i.toLong)
    case i: Byte => write(out, i.toLong)
    case i: Long =>
      if (i >= 0) {
        if (i < 0x80) out.write(i.toInt)
        else if (i < 0x100) { out.write(0xcc); out.write(i.toInt) }
        else if (i < 0x10000) { out.write(0xcd); writeBE(out, i, 2) }
        else if (i < 0x100000000L) { out.write(0xce); writeBE(out, i, 4) }
        else { out.write(0xcf); writeBE(out, i, 8) }
      } else {
        if (i >= -32) out.write((i & 0xff).toInt)
        else if (i >= -0x80) { out.write(0xd0); out.write((i & 0xff).toInt) }
        else if (i >= -0x8000) { out.write(0xd1); writeBE(out, i, 2) }
        else if (i >= -0x80000000L) { out.write(0xd2); writeBE(out, i, 4) }
        else { out.write(0xd3); writeBE(out, i, 8) }
      }
    case f: Float => write(out, f.toDouble)
    case d: Double =>
      out.write(0xcb); writeBE(out, java.lang.Double.doubleToLongBits(d), 8)
    case s: String =>
      val b = s.getBytes(UTF_8)
      if (b.length < 32) out.write(0xa0 | b.length)
      else if (b.length < 0x100) { out.write(0xd9); out.write(b.length) }
      else if (b.length < 0x10000) { out.write(0xda); writeBE(out, b.length.toLong, 2) }
      else { out.write(0xdb); writeBE(out, b.length.toLong, 4) }
      out.write(b)
    case b: Array[Byte] =>
      if (b.length < 0x100) { out.write(0xc4); out.write(b.length) }
      else if (b.length < 0x10000) { out.write(0xc5); writeBE(out, b.length.toLong, 2) }
      else { out.write(0xc6); writeBE(out, b.length.toLong, 4) }
      out.write(b)
    case a: Seq[_] =>
      if (a.length < 16) out.write(0x90 | a.length)
      else if (a.length < 0x10000) { out.write(0xdc); writeBE(out, a.length.toLong, 2) }
      else { out.write(0xdd); writeBE(out, a.length.toLong, 4) }
      a.foreach(write(out, _))
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      if (mm.size < 16) out.write(0x80 | mm.size)
      else if (mm.size < 0x10000) { out.write(0xde); writeBE(out, mm.size.toLong, 2) }
      else { out.write(0xdf); writeBE(out, mm.size.toLong, 4) }
      mm.foreach { case (k, x) => write(out, k); write(out, x) }
    case other =>
      throw new IllegalArgumentException(s"msgpack cannot encode: ${other.getClass}")
  }

  def decode(bytes: Array[Byte]): Any = {
    val r = new Reader(bytes)
    val v = r.read()
    if (r.pos != bytes.length)
      throw new IllegalArgumentException(
        s"msgpack trailing bytes: ${bytes.length - r.pos}")
    v
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    // nesting cap: each container level recurses read(), so a packet of
    // repeated array/map headers drives stack depth linearly with input
    // size — a StackOverflowError is an Error, not an Exception, and
    // would escape the handler's recovery. 128 matches the de-facto
    // limit of mainstream decoders (serde, msgpack-java).
    private var depth = 0
    private def descend[A](body: => A): A = {
      depth += 1
      if (depth > 128)
        throw new IllegalArgumentException("msgpack nesting deeper than 128")
      try body finally depth -= 1
    }

    /** Every length claimed by the wire is validated against the bytes
      * actually present BEFORE any allocation sized by it — a 6-byte
      * packet claiming a 2 GB bin must fail as "truncated", not allocate. */
    private def need(n: Int): Int = {
      if (n < 0 || n > bytes.length - pos)
        throw new IllegalArgumentException(
          s"msgpack truncated: need $n bytes, have ${bytes.length - pos}")
      n
    }

    private def u8(): Int = { need(1); val b = bytes(pos) & 0xff; pos += 1; b }

    private def be(n: Int): Long = {
      need(n)
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (bytes(pos + i) & 0xffL); i += 1 }
      pos += n
      v
    }

    private def str(len: Int): String = {
      need(len)
      val s = new String(bytes, pos, len, UTF_8); pos += len; s
    }

    private def bin(len: Int): Array[Byte] = {
      need(len)
      val b = java.util.Arrays.copyOfRange(bytes, pos, pos + len); pos += len; b
    }

    private def arr(len: Int): Vector[Any] = descend {
      // each element is at least one byte, so a count beyond the remaining
      // bytes is provably corrupt — reject before Vector.fill allocates
      need(len)
      Vector.fill(len)(read())
    }

    private def map(len: Int): Map[String, Any] = descend {
      if (len > 0) need(len) // ≥1 byte per key alone
      val b = Map.newBuilder[String, Any]
      var i = 0
      while (i < len) {
        val k = read() match {
          case s: String => s
          case other => other.toString // non-string keys: stringify, like Json
        }
        b += k -> read()
        i += 1
      }
      b.result()
    }

    def read(): Any = {
      val t = u8()
      if (t < 0x80) t.toLong // positive fixint
      else if (t >= 0xe0) (t - 0x100).toLong // negative fixint
      else if ((t & 0xf0) == 0x80) map(t & 0x0f)
      else if ((t & 0xf0) == 0x90) arr(t & 0x0f)
      else if ((t & 0xe0) == 0xa0) str(t & 0x1f)
      else t match {
        case 0xc0 => null
        case 0xc2 => false
        case 0xc3 => true
        case 0xc4 => bin(u8())
        case 0xc5 => bin(be(2).toInt)
        case 0xc6 => bin(be(4).toInt)
        case 0xca => java.lang.Float.intBitsToFloat(be(4).toInt).toDouble
        case 0xcb => java.lang.Double.longBitsToDouble(be(8))
        case 0xcc => be(1)
        case 0xcd => be(2)
        case 0xce => be(4)
        case 0xcf => be(8) // uint64 > Long.MaxValue wraps; JS cannot emit those
        case 0xd0 => u8().toByte.toLong
        case 0xd1 => be(2).toShort.toLong
        case 0xd2 => be(4).toInt.toLong
        case 0xd3 => be(8)
        case 0xd9 => str(u8())
        case 0xda => str(be(2).toInt)
        case 0xdb => str(be(4).toInt)
        case 0xdc => arr(be(2).toInt)
        case 0xdd => arr(be(4).toInt)
        case 0xde => map(be(2).toInt)
        case 0xdf => map(be(4).toInt)
        case other =>
          throw new IllegalArgumentException(
            f"msgpack unsupported type byte 0x$other%02x")
      }
    }
  }
}
