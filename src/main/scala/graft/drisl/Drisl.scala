package graft.drisl

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** DRISL value model + deterministic CBOR codec.
  *
  * DRISL is the deterministic CBOR profile used for event payloads and
  * module encoding in the reference engine (dep: /root/reference/Cargo.toml:18;
  * value space enumerated at
  * /root/reference/leaf-stream/src/drisl_extract.rs:17-30). It is dag-cbor
  * shaped: RFC 8949 deterministic encoding (shortest-form heads, bytewise
  * sorted map keys, definite lengths, 64-bit floats) plus tag 42 for CIDs
  * (a byte string with a 0x00 multibase prefix).
  *
  * This is a from-scratch Scala implementation — only the *value space* and
  * canonical-form rules are taken from the public dag-cbor / DASL specs.
  */
sealed trait DValue
object DValue {
  case class DInt(v: Long) extends DValue
  case class DFloat(v: Double) extends DValue
  case class DText(v: String) extends DValue
  case class DBytes(v: Array[Byte]) extends DValue
  case class DBool(v: Boolean) extends DValue
  case object DNull extends DValue
  case class DCid(bytes: Array[Byte]) extends DValue
  case class DArray(v: Vector[DValue]) extends DValue
  case class DMap(v: Map[String, DValue]) extends DValue

  def obj(kvs: (String, DValue)*): DMap = DMap(kvs.toMap)
  def arr(vs: DValue*): DArray = DArray(vs.toVector)
  def int(v: Long): DInt = DInt(v)
  def text(v: String): DText = DText(v)
}

object Drisl {
  import DValue._

  // ---------------- encode ----------------

  def encode(v: DValue): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(new DataOutputStream(out), v)
    out.toByteArray
  }

  private def writeHead(o: DataOutputStream, major: Int, arg: Long): Unit = {
    val m = major << 5
    if (arg < 24) o.writeByte(m | arg.toInt)
    else if (arg < 0x100) { o.writeByte(m | 24); o.writeByte(arg.toInt) }
    else if (arg < 0x10000) { o.writeByte(m | 25); o.writeShort(arg.toInt) }
    else if (arg < 0x100000000L) { o.writeByte(m | 26); o.writeInt(arg.toInt) }
    else { o.writeByte(m | 27); o.writeLong(arg) }
  }

  private def write(o: DataOutputStream, v: DValue): Unit = v match {
    case DInt(i) =>
      if (i >= 0) writeHead(o, 0, i) else writeHead(o, 1, -1L - i)
    case DFloat(f) => o.writeByte(0xfb); o.writeLong(java.lang.Double.doubleToLongBits(f))
    case DText(s) =>
      val b = s.getBytes(UTF_8); writeHead(o, 3, b.length.toLong); o.write(b)
    case DBytes(b) => writeHead(o, 2, b.length.toLong); o.write(b)
    case DBool(b) => o.writeByte(if (b) 0xf5 else 0xf4)
    case DNull => o.writeByte(0xf6)
    case DCid(bytes) =>
      writeHead(o, 6, 42) // tag 42; content = bytes with 0x00 multibase prefix
      writeHead(o, 2, bytes.length + 1L); o.writeByte(0); o.write(bytes)
    case DArray(vs) =>
      writeHead(o, 4, vs.length.toLong); vs.foreach(write(o, _))
    case DMap(m) =>
      // RFC 8949 deterministic: sort by bytewise-lexicographic encoded key.
      // For definite-length text keys this equals (length, utf8-bytes) order.
      val sorted = m.toVector.sortBy { case (k, _) =>
        val b = k.getBytes(UTF_8); (b.length, b.map(x => (x & 0xff).toChar).mkString)
      }
      writeHead(o, 5, sorted.length.toLong)
      sorted.foreach { case (k, vv) => write(o, DText(k)); write(o, vv) }
  }

  // ---------------- decode ----------------

  def decode(bytes: Array[Byte]): DValue = {
    val d = new Decoder(bytes)
    val v = d.readValue()
    v
  }

  private final class Decoder(bytes: Array[Byte]) {
    private var pos = 0
    // container recursion cap — prevents a stack overflow (an Error, not
    // an Exception) from a packet of nested array/map heads
    private var depth = 0
    private def u8(): Int = {
      if (pos >= bytes.length)
        throw new IllegalArgumentException("CBOR truncated")
      val b = bytes(pos) & 0xff; pos += 1; b
    }
    /** Validated length: must fit in the REMAINING bytes before any
      * allocation. Arrays.copyOfRange would otherwise zero-PAD past the
      * end — a truncated buffer must fail, not decode fabricated bytes —
      * and a forged multi-GB length must not allocate. */
    private def len(v: Long): Int = {
      if (v < 0 || v > bytes.length - pos)
        throw new IllegalArgumentException(
          s"CBOR length $v exceeds remaining ${bytes.length - pos} bytes")
      v.toInt
    }
    private def take(n: Int): Array[Byte] = {
      val r = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; r
    }
    private def descend[A](body: => A): A = {
      depth += 1
      if (depth > 128)
        throw new IllegalArgumentException("CBOR nesting deeper than 128")
      try body finally depth -= 1
    }
    private def readArg(info: Int): Long = info match {
      case n if n < 24 => n.toLong
      case 24 => u8().toLong
      case 25 => (u8() << 8 | u8()).toLong
      case 26 => ((u8().toLong << 24) | (u8() << 16) | (u8() << 8) | u8())
      case 27 =>
        var r = 0L; var i = 0
        while (i < 8) { r = (r << 8) | u8(); i += 1 }; r
      case other => throw new IllegalArgumentException(s"indefinite/invalid CBOR head info $other")
    }

    def readValue(): DValue = {
      val head = u8()
      val major = head >> 5
      val info = head & 0x1f
      major match {
        case 0 => DInt(readArg(info))
        case 1 => DInt(-1L - readArg(info))
        case 2 => DBytes(take(len(readArg(info))))
        case 3 => DText(new String(take(len(readArg(info))), UTF_8))
        case 4 =>
          val n = len(readArg(info)) // ≥1 byte per element
          descend(DArray(Vector.fill(n)(readValue())))
        case 5 => descend {
          val n = len(readArg(info)) // ≥1 byte per key alone
          val b = Vector.newBuilder[(String, DValue)]
          var i = 0
          while (i < n) {
            val k = readValue() match {
              case DText(s) => s
              case other => throw new IllegalArgumentException(s"non-text map key: $other")
            }
            b += (k -> readValue()); i += 1
          }
          DMap(b.result().toMap)
        }
        case 6 => descend {
          val tag = readArg(info)
          if (tag != 42) throw new IllegalArgumentException(s"unsupported CBOR tag $tag")
          readValue() match {
            case DBytes(b) if b.nonEmpty && b(0) == 0 => DCid(b.drop(1))
            case other => throw new IllegalArgumentException(s"bad CID content: $other")
          }
        }
        case 7 => info match {
          case 20 => DBool(false)
          case 21 => DBool(true)
          case 22 => DNull
          case 27 =>
            var r = 0L; var i = 0
            while (i < 8) { r = (r << 8) | u8(); i += 1 }
            DFloat(java.lang.Double.longBitsToDouble(r))
          case 26 => // accept float32 on decode (encoder never emits it)
            var r = 0; var i = 0
            while (i < 4) { r = (r << 8) | u8(); i += 1 }
            DFloat(java.lang.Float.intBitsToFloat(r).toDouble)
          case other => throw new IllegalArgumentException(s"unsupported simple value $other")
        }
        case other => throw new IllegalArgumentException(s"bad major type $other")
      }
    }
  }

  // ---------------- incremental decode (archive import) ----------------

  /** Incremental CBOR reader over an InputStream. The archive-import path
    * uses this to walk a `{"events": [...]}` object of unbounded length
    * without materializing it: the caller reads the container heads, then
    * pulls one element at a time and flushes batches. Unlike the array
    * decoder above there is no "remaining bytes" to validate lengths
    * against, so every single-value allocation (text/bytes) is capped at
    * `maxValueBytes` instead — a forged multi-GB length fails before
    * allocating, and a truncated stream fails with "CBOR truncated", never
    * zero-padded data. Container element counts are NOT pre-allocated
    * (each element costs ≥1 input byte, so memory tracks actual input,
    * which the caller bounds with a counting wrapper on the raw stream). */
  final class StreamDecoder(in: java.io.InputStream,
      maxValueBytes: Int = 64 << 20) {
    private var depth = 0
    private def u8(): Int = {
      val b = in.read()
      if (b < 0) throw new IllegalArgumentException("CBOR truncated")
      b
    }
    private def take(n: Int): Array[Byte] = {
      val r = in.readNBytes(n)
      if (r.length != n) throw new IllegalArgumentException("CBOR truncated")
      r
    }
    private def len(v: Long): Int = {
      if (v < 0 || v > maxValueBytes)
        throw new IllegalArgumentException(
          s"CBOR value length $v exceeds the $maxValueBytes-byte cap")
      v.toInt
    }
    private def descend[A](body: => A): A = {
      depth += 1
      if (depth > 128)
        throw new IllegalArgumentException("CBOR nesting deeper than 128")
      try body finally depth -= 1
    }
    private def readArg(info: Int): Long = info match {
      case n if n < 24 => n.toLong
      case 24 => u8().toLong
      case 25 => (u8() << 8 | u8()).toLong
      case 26 => ((u8().toLong << 24) | (u8() << 16) | (u8() << 8) | u8())
      case 27 =>
        var r = 0L; var i = 0
        while (i < 8) { r = (r << 8) | u8(); i += 1 }; r
      case other => throw new IllegalArgumentException(
        s"indefinite/invalid CBOR head info $other")
    }

    /** Expect a map head; returns its entry count. */
    def readMapHead(): Int = {
      val head = u8()
      require(head >> 5 == 5, s"expected CBOR map, got major type ${head >> 5}")
      val n = readArg(head & 0x1f)
      if (n < 0 || n > Int.MaxValue)
        throw new IllegalArgumentException(s"CBOR map claims $n entries")
      n.toInt
    }

    /** Expect an array head; returns its claimed element count (read that
      * many values — a lie fails at truncation, not with an allocation). */
    def readArrayHead(): Long = {
      val head = u8()
      require(head >> 5 == 4, s"expected CBOR array, got major type ${head >> 5}")
      val n = readArg(head & 0x1f)
      if (n < 0) throw new IllegalArgumentException(s"CBOR array claims $n elements")
      n
    }

    /** Expect a text value (a map key). */
    def readTextKey(): String = readValue() match {
      case DText(s) => s
      case other => throw new IllegalArgumentException(s"non-text map key: $other")
    }

    def readValue(): DValue = {
      val head = u8()
      val major = head >> 5
      val info = head & 0x1f
      major match {
        case 0 => DInt(readArg(info))
        case 1 => DInt(-1L - readArg(info))
        case 2 => DBytes(take(len(readArg(info))))
        case 3 => DText(new String(take(len(readArg(info))), UTF_8))
        case 4 => descend {
          val n = readArg(info)
          if (n < 0) throw new IllegalArgumentException(s"CBOR array claims $n elements")
          val b = Vector.newBuilder[DValue]
          var i = 0L
          while (i < n) { b += readValue(); i += 1 }
          DArray(b.result())
        }
        case 5 => descend {
          val n = readArg(info)
          if (n < 0) throw new IllegalArgumentException(s"CBOR map claims $n entries")
          val b = Vector.newBuilder[(String, DValue)]
          var i = 0L
          while (i < n) { b += (readTextKey() -> readValue()); i += 1 }
          DMap(b.result().toMap)
        }
        case 6 => descend {
          val tag = readArg(info)
          if (tag != 42) throw new IllegalArgumentException(s"unsupported CBOR tag $tag")
          readValue() match {
            case DBytes(b) if b.nonEmpty && b(0) == 0 => DCid(b.drop(1))
            case other => throw new IllegalArgumentException(s"bad CID content: $other")
          }
        }
        case 7 => info match {
          case 20 => DBool(false)
          case 21 => DBool(true)
          case 22 => DNull
          case 27 =>
            var r = 0L; var i = 0
            while (i < 8) { r = (r << 8) | u8(); i += 1 }
            DFloat(java.lang.Double.longBitsToDouble(r))
          case 26 =>
            var r = 0; var i = 0
            while (i < 4) { r = (r << 8) | u8(); i += 1 }
            DFloat(java.lang.Float.intBitsToFloat(r).toDouble)
          case other => throw new IllegalArgumentException(s"unsupported simple value $other")
        }
        case other => throw new IllegalArgumentException(s"bad major type $other")
      }
    }
  }

  // ---------------- JSON rendering (for Map/Array → SQL text) ----------------

  /** Render a DValue as JSON text — the reference converts Map/Array extract
    * results to JSON strings (drisl_extract.rs:26-28, via serde_json). */
  def toJson(v: DValue): String = v match {
    case DInt(i) => i.toString
    case DFloat(f) =>
      if (f == f.floor && !f.isInfinite && math.abs(f) < 1e15) f.toLong.toString + ".0"
      else f.toString
    case DText(s) => jsonQuote(s)
    case DBool(b) => b.toString
    case DNull => "null"
    case DBytes(b) => jsonQuote(java.util.Base64.getEncoder.encodeToString(b))
    case DCid(b) => jsonQuote("cid:" + b.map("%02x".format(_)).mkString)
    case DArray(vs) => vs.map(toJson).mkString("[", ",", "]")
    case DMap(m) =>
      // deterministic key order for stable comparisons
      m.toVector.sortBy(_._1).map { case (k, vv) => jsonQuote(k) + ":" + toJson(vv) }
        .mkString("{", ",", "}")
  }

  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
