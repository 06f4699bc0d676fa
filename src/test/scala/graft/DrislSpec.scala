package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl._
import graft.drisl.DValue._

/** DRISL codec + path-extraction spec.
  *
  * The extraction cases mirror the reference's only substantive test module
  * (/root/reference/leaf-stream/src/drisl_extract.rs:131-243), which doubles
  * as the spec for path semantics: Rust serde encodes unit enum variants as
  * bare text, newtype variants as 1-key maps, Ok(None) as {"Ok": null}.
  */
class DrislSpec extends AnyFunSuite {

  private def rt(v: DValue): DValue = Drisl.decode(Drisl.encode(v))

  test("codec round-trips scalars") {
    for (v <- Seq[DValue](DInt(0), DInt(23), DInt(24), DInt(255), DInt(256),
        DInt(65536), DInt(4294967296L), DInt(Long.MaxValue), DInt(-1),
        DInt(-24), DInt(-25), DInt(-4294967297L), DFloat(3.25), DFloat(-0.0),
        DText(""), DText("héllo ☃"), DBool(true), DBool(false), DNull,
        DBytes(Array[Byte](1, 2, 3)), DCid(Array.fill[Byte](36)(7))))
      assert(stripEq(rt(v), v), s"round trip failed for $v")
  }

  test("codec round-trips nested structures") {
    val v = obj(
      "name" -> text("John"),
      "items" -> arr(int(1), int(2), int(3)),
      "meta" -> obj("ok" -> DBool(true), "score" -> DFloat(1.5), "n" -> DNull))
    assert(stripEq(rt(v), v))
  }

  test("map keys encode in deterministic order (same bytes for any insertion order)") {
    val a = DMap(Map("b" -> int(1), "a" -> int(2), "longer" -> int(3)))
    val b = DMap(Map("longer" -> int(3), "a" -> int(2), "b" -> int(1)))
    assert(Drisl.encode(a).sameElements(Drisl.encode(b)))
  }

  test("integers use shortest-form heads") {
    assert(Drisl.encode(DInt(0)).length == 1)
    assert(Drisl.encode(DInt(23)).length == 1)
    assert(Drisl.encode(DInt(24)).length == 2)
    assert(Drisl.encode(DInt(255)).length == 2)
    assert(Drisl.encode(DInt(256)).length == 3)
    assert(Drisl.encode(DInt(65536)).length == 5)
    assert(Drisl.encode(DInt(4294967296L)).length == 9)
  }

  test("seeded fuzz: encode/decode round-trip") {
    val rnd = new scala.util.Random(42)
    def gen(depth: Int): DValue = rnd.nextInt(if (depth > 0) 9 else 7) match {
      case 0 => DInt(rnd.nextLong())
      case 1 => DFloat(rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10))
      case 2 => DText(rnd.alphanumeric.take(rnd.nextInt(20)).mkString)
      case 3 => val b = new Array[Byte](rnd.nextInt(16)); rnd.nextBytes(b); DBytes(b)
      case 4 => DBool(rnd.nextBoolean())
      case 5 => DNull
      case 6 => DInt(rnd.nextInt(100) - 50)
      case 7 => DArray(Vector.fill(rnd.nextInt(4))(gen(depth - 1)))
      case 8 => DMap(Seq.fill(rnd.nextInt(4))(
        rnd.alphanumeric.take(rnd.nextInt(8) + 1).mkString -> gen(depth - 1)).toMap)
    }
    (1 to 500).foreach { _ =>
      val v = gen(3)
      assert(stripEq(rt(v), v), s"round trip failed for $v")
    }
  }

  /** structural equality treating byte arrays by content and NaN==NaN */
  private def stripEq(a: DValue, b: DValue): Boolean = (a, b) match {
    case (DBytes(x), DBytes(y)) => x.sameElements(y)
    case (DCid(x), DCid(y)) => x.sameElements(y)
    case (DFloat(x), DFloat(y)) => x == y || (x.isNaN && y.isNaN)
    case (DArray(x), DArray(y)) =>
      x.length == y.length && x.zip(y).forall((stripEq _).tupled)
    case (DMap(x), DMap(y)) =>
      x.keySet == y.keySet && x.forall { case (k, v) => stripEq(v, y(k)) }
    case _ => a == b
  }

  // ------------- path extraction: the reference's own cases -------------

  // Example { name, "name.with.special#?chars", age, result: Result<Option<u16>, String> }
  private def example(result: DValue) = obj(
    "name" -> text("John"),
    "name.with.special#?chars" -> text("Jane"),
    "age" -> int(32),
    "result" -> result)

  private def fstruct(e: DValue, items: Seq[Long]) = obj(
    "name" -> text("test"),
    "e" -> e,
    "items" -> DArray(items.map(int(_)).toVector))

  private val a = example(obj("Ok" -> int(7)))       // Ok(Some(7))
  private val b = example(obj("Ok" -> DNull))        // Ok(None)
  private val c = example(obj("Err" -> text("error")))
  private val d = fstruct(text("Hello"), Seq(1, 2, 3))          // unit variant
  private val e = fstruct(obj("N" -> int(77)), Seq(4, 5, 6))    // newtype variant
  private val f = fstruct(obj("World" -> text("mary")), Seq(7, 8, 9))
  private val g = obj("inner.value" -> obj("sub.value" -> text("data")))

  private def ext(v: DValue, p: String): Option[DValue] = DrislPath.extract(v, p)

  test("extraction matches reference cases (drisl_extract.rs:179-242)") {
    assert(ext(a, ".name") == Some(DText("John")))
    assert(ext(a, ".\"name.with.special#?chars\"") == Some(DText("Jane")))
    assert(ext(g, ".\"inner.value\".\"sub.value\"") == Some(DText("data")))
    assert(ext(a, ".age") == Some(DInt(32)))
    assert(ext(a, ".result.Ok") == Some(DInt(7)))
    assert(ext(b, ".result.Ok") == Some(DNull))      // present-but-null
    assert(ext(a, ".result.Err") == None)            // absent
    assert(ext(b, ".result.Err") == None)
    assert(ext(c, ".result.Err") == Some(DText("error")))
    assert(ext(d, ".e") == Some(DText("Hello")))
    assert(ext(d, ".e.?discriminant") == Some(DText("Hello")))
    assert(ext(e, ".e.?discriminant") == Some(DText("N")))
    assert(ext(e, ".e.N") == Some(DInt(77)))
    assert(ext(f, ".e.World") == Some(DText("mary")))
    assert(ext(f, ".e.N") == None)
    assert(ext(f, ".items.1") == Some(DInt(8)))
  }

  test("escaped-dot idents and misc path forms") {
    val v = obj("a.b" -> int(1), "$x" -> int(2), "arr" -> arr(int(9)))
    assert(DrislPath.extract(v, ".a\\.b") == Some(DInt(1)))
    assert(DrislPath.extract(v, ".$x") == Some(DInt(2)))
    assert(DrislPath.extract(v, ".arr.0") == Some(DInt(9)))
    assert(DrislPath.extract(v, ".arr.5") == None)
    assert(DrislPath.extract(v, ".") == Some(v)) // identity
    assertThrows[IllegalArgumentException](DrislPath.parse("name"))
    assertThrows[IllegalArgumentException](DrislPath.parse(".a."))
    assertThrows[IllegalArgumentException](DrislPath.parse(".\"unterminated"))
  }

  test("discriminant on multi-key map is absent") {
    val v = obj("e" -> obj("A" -> int(1), "B" -> int(2)))
    assert(DrislPath.extract(v, ".e.?discriminant") == None)
  }

  test("cid computation is deterministic and multibase-rendered") {
    val c1 = Cid.render(Cid.ofValue(obj("x" -> int(1))))
    val c2 = Cid.render(Cid.ofValue(obj("x" -> int(1))))
    val c3 = Cid.render(Cid.ofValue(obj("x" -> int(2))))
    assert(c1 == c2); assert(c1 != c3); assert(c1.startsWith("b"))
    assert(c1.length == 59) // b + ceil(36*8/5)
  }

  test("decoder rejects hostile input: truncation, forged lengths, deep nesting") {
    def bad(bytes: Array[Byte]): Unit = {
      val e = intercept[IllegalArgumentException](Drisl.decode(bytes))
      assert(e.getMessage != null)
    }
    // truncated byte string: 5 claimed, 2 present — must FAIL, not decode
    // with fabricated zero padding (Arrays.copyOfRange pads past the end)
    bad(Array[Byte](0x45, 1, 2))
    // forged 2 GB length in a 6-byte buffer — must fail before allocating
    bad(Array[Byte](0x5a.toByte, 0x7f, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0))
    // array claiming 2^31-ish elements with no payload
    bad(Array[Byte](0x9a.toByte, 0x7f, 0xff.toByte, 0xff.toByte, 0xff.toByte))
    // 1000 nested single-element arrays: depth cap, not a StackOverflowError
    bad(Array.fill[Byte](1000)(0x81.toByte) :+ 0x01.toByte)
    // the valid shallow form still decodes
    assert(Drisl.decode(Array[Byte](0x81.toByte, 0x01)) ==
      DArray(Vector(DInt(1))))
  }
}
