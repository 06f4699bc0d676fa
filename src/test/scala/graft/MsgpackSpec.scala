package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.server.Msgpack

/** MessagePack codec against golden byte vectors from the public spec
  * (msgpack.org format description) plus round-trips of the socket.io
  * packet shapes the wire transport exchanges. */
class MsgpackSpec extends AnyFunSuite {

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString

  test("golden vectors: scalars") {
    assert(hex(Msgpack.encode(null)) == "c0")
    assert(hex(Msgpack.encode(true)) == "c3")
    assert(hex(Msgpack.encode(false)) == "c2")
    assert(hex(Msgpack.encode(7L)) == "07")
    assert(hex(Msgpack.encode(-1L)) == "ff")
    assert(hex(Msgpack.encode(-32L)) == "e0")
    assert(hex(Msgpack.encode(128L)) == "cc80")
    assert(hex(Msgpack.encode(65535L)) == "cdffff")
    assert(hex(Msgpack.encode(65536L)) == "ce00010000")
    assert(hex(Msgpack.encode(-33L)) == "d0df")
    assert(hex(Msgpack.encode(-129L)) == "d1ff7f")
    assert(hex(Msgpack.encode(1.5)) == "cb3ff8000000000000")
    assert(hex(Msgpack.encode("abc")) == "a3616263")
    assert(hex(Msgpack.encode(Array[Byte](1, 2))) == "c4020102")
    assert(hex(Msgpack.encode(Vector(1L, 2L, 3L))) == "93010203")
  }

  test("golden vector: the msgpack.org homepage example") {
    // {"compact":true,"schema":0} — 18 bytes; map order is ours, so build
    // the expected bytes for the same insertion order
    val enc = Msgpack.encode(
      scala.collection.immutable.ListMap("compact" -> true, "schema" -> 0L))
    assert(hex(enc) == "82a7636f6d70616374c3a6736368656d6100")
  }

  test("round-trip: nested socket.io-shaped packets") {
    val pkt: Map[String, Any] = Map(
      "type" -> 2L,
      "nsp" -> "/",
      "id" -> 41L,
      "data" -> Vector("stream/event_batch", Array[Byte](1, 2, 3, -1)))
    val decoded = Msgpack.decode(Msgpack.encode(pkt)).asInstanceOf[Map[String, Any]]
    assert(decoded("type") == 2L && decoded("nsp") == "/" && decoded("id") == 41L)
    val data = decoded("data").asInstanceOf[Vector[Any]]
    assert(data(0) == "stream/event_batch")
    assert(data(1).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3, -1))
  }

  test("round-trip: integer width boundaries and negative family") {
    val vals = Vector(0L, 127L, 128L, 255L, 256L, 65535L, 65536L, 4294967295L,
      4294967296L, Long.MaxValue, -1L, -32L, -33L, -128L, -129L, -32768L,
      -32769L, -2147483648L, -2147483649L, Long.MinValue)
    vals.foreach { v =>
      assert(Msgpack.decode(Msgpack.encode(v)) == v, s"round-trip of $v")
    }
  }

  test("round-trip: long strings, big arrays, wide maps, floats") {
    val s300 = "x" * 300
    assert(Msgpack.decode(Msgpack.encode(s300)) == s300)
    val s70k = "y" * 70000
    assert(Msgpack.decode(Msgpack.encode(s70k)) == s70k)
    val arr20 = Vector.tabulate(20)(_.toLong)
    assert(Msgpack.decode(Msgpack.encode(arr20)) == arr20)
    val wide = (1 to 20).map(i => s"k$i" -> i.toLong).toMap
    assert(Msgpack.decode(Msgpack.encode(wide)) == wide)
    assert(Msgpack.decode(Msgpack.encode(3.25)) == 3.25)
    val bin70k = Array.fill[Byte](70000)(7)
    assert(Msgpack.decode(Msgpack.encode(bin70k))
      .asInstanceOf[Array[Byte]].length == 70000)
  }

  test("float32 decodes to double; trailing garbage rejected") {
    // ca 3fc00000 = 1.5f
    val f32 = Array[Byte](0xca.toByte, 0x3f, 0xc0.toByte, 0, 0)
    assert(Msgpack.decode(f32) == 1.5)
    intercept[IllegalArgumentException] {
      Msgpack.decode(Array[Byte](0x01, 0x02))
    }
    intercept[IllegalArgumentException] { // ext type: never valid here
      Msgpack.decode(Array[Byte](0xd4.toByte, 0x01, 0x00))
    }
  }

  test("nesting cap: 1000 nested arrays fail cleanly, shallow ones pass") {
    // 0x91 = fixarray(1): a packet of repeated heads would otherwise
    // recurse once per byte and overflow the stack (an Error, which the
    // transport's Exception recovery cannot catch)
    intercept[IllegalArgumentException] {
      Msgpack.decode(Array.fill[Byte](1000)(0x91.toByte) :+ 0x01.toByte)
    }
    assert(Msgpack.decode(Array[Byte](0x91.toByte, 0x05)) == Vector(5L))
  }
}
