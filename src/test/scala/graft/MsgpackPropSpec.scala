package graft

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.server.Msgpack

/** Property fuzz: every value in the codec's model round-trips through
  * msgpack bit-faithfully — arbitrary nesting, full integer range,
  * binary blobs, unicode strings. (Array[Byte] lacks structural equality,
  * so values are compared through a normalizing view.) */
class MsgpackPropSpec extends AnyFunSuite {

  private val scalar: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Arbitrary.arbitrary[Boolean].map(b => b: Any),
    Arbitrary.arbitrary[Long].map(l => l: Any),
    Arbitrary.arbitrary[Double].suchThat(d => !d.isNaN).map(d => d: Any),
    Arbitrary.arbitrary[String].map(s => s: Any),
    Gen.containerOf[Array, Byte](Arbitrary.arbitrary[Byte]).map(b => b: Any))

  private def valueGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalar
    else Gen.frequency(
      6 -> scalar,
      2 -> Gen.listOfN(3, valueGen(depth - 1)).map(_.toVector: Any),
      2 -> Gen.mapOfN(3, Gen.zip(Gen.asciiPrintableStr, valueGen(depth - 1)))
        .map(m => m: Any))

  private def samples(n: Int): Seq[Any] =
    (1 to n).map(i => valueGen(3).pureApply(Gen.Parameters.default, Seed(i.toLong)))

  /** Structural view that makes Array[Byte] comparable. */
  private def norm(v: Any): Any = v match {
    case b: Array[Byte] => ("bytes", b.toSeq)
    case s: Seq[_] => s.map(norm)
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].map { case (k, x) => k -> norm(x) }
    case other => other
  }

  test("arbitrary nested values round-trip") {
    samples(500).foreach { v =>
      assert(norm(Msgpack.decode(Msgpack.encode(v))) == norm(v), s"value: $v")
    }
  }

  test("doubles round-trip bit-exactly (including -0.0 and infinities)") {
    val specials = Seq(-0.0, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, Double.MaxValue, 1e308, -1e-308)
    val rnd = (1 to 200).map(i =>
      Arbitrary.arbitrary[Double].suchThat(!_.isNaN)
        .pureApply(Gen.Parameters.default, Seed(i.toLong)))
    (specials ++ rnd).foreach { d =>
      assert(java.lang.Double.doubleToRawLongBits(
        Msgpack.decode(Msgpack.encode(d)).asInstanceOf[Double]) ==
        java.lang.Double.doubleToRawLongBits(d), s"double: $d")
    }
  }

  test("hostile length prefixes are rejected before any allocation") {
    // a tiny packet claiming a ~2GB payload must fail as truncated input,
    // not allocate (bin32/str32/array32/map32, plus a negative length)
    val bombs = Seq(
      Array(0xc6, 0x7f, 0xff, 0xff, 0xff), // bin32, 2^31-1
      Array(0xc6, 0xff, 0xff, 0xff, 0x00), // bin32, negative as Int
      Array(0xdb, 0x7f, 0xff, 0xff, 0xff), // str32
      Array(0xdd, 0x7f, 0xff, 0xff, 0xff), // array32
      Array(0xde, 0x7f, 0xff),             // map16
      Array(0xc5, 0xff, 0xff),             // bin16 beyond input
      Array(0xc4, 0x10))                   // bin8 beyond input
    bombs.foreach { b =>
      val ex = intercept[IllegalArgumentException](
        Msgpack.decode(b.map(_.toByte)))
      assert(ex.getMessage.contains("truncated"), s"$ex for ${b.toSeq}")
    }
  }
}
