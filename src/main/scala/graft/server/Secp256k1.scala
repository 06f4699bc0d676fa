package graft.server

import java.math.BigInteger

/** ECDSA signature verification over secp256k1, from the public SEC 2
  * curve parameters — pure JVM BigInteger arithmetic, no provider needed.
  *
  * Why this exists: ATProto service JWTs are signed with secp256k1
  * (ES256K) keys (behavioral spec: /root/reference/leaf-server/src/
  * http.rs:165-242, which delegates to atproto_oauth's k256 verifier), but
  * the stock JDK ships P-256 and not this curve, so `Signature.getInstance`
  * cannot verify them. Verification needs only point arithmetic — a few
  * hundred modular operations per token, microseconds on a modern JVM —
  * so implementing it directly is simpler than requiring a native
  * provider. Verification only: the server never signs with user keys.
  *
  * Curve: y² = x³ + 7 over F_p,
  *   p  = 2²⁵⁶ − 2³² − 977
  *   n  = group order, G = base point (SEC 2 §2.4.1).
  */
object Secp256k1 {

  private val p = new BigInteger(
    "fffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2f", 16)
  val n: BigInteger = new BigInteger(
    "fffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141", 16)
  private val gx = new BigInteger(
    "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798", 16)
  private val gy = new BigInteger(
    "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8", 16)
  private val seven = BigInteger.valueOf(7)

  /** Affine point; None = point at infinity. */
  final case class Point(x: BigInteger, y: BigInteger)
  val G: Point = Point(gx, gy)

  /** A secp256k1 public key (affine coordinates, validated on curve).
    * Coordinates must be REDUCED field elements: the group law compares
    * affine x/y directly (P + (−P), doubling), so an unreduced x ≥ p
    * aliasing a valid point would corrupt those equality checks. */
  final case class PubKey(x: BigInteger, y: BigInteger) {
    require(x.signum >= 0 && x.compareTo(p) < 0 &&
      y.signum >= 0 && y.compareTo(p) < 0, "coordinate out of field range")
    require(onCurve(Point(x, y)), "point is not on secp256k1")
  }

  private def onCurve(pt: Point): Boolean =
    pt.y.modPow(BigInteger.TWO, p) ==
      pt.x.modPow(BigInteger.valueOf(3), p).add(seven).mod(p)

  private def add(a: Option[Point], b: Option[Point]): Option[Point] = (a, b) match {
    case (None, r) => r
    case (l, None) => l
    case (Some(l), Some(r)) =>
      if (l.x == r.x && l.y != r.y) None // P + (−P) = ∞
      else {
        val lam =
          if (l == r) {
            if (l.y.signum == 0) return None
            // λ = 3x² / 2y  (a = 0 on this curve)
            l.x.pow(2).multiply(BigInteger.valueOf(3))
              .multiply(l.y.shiftLeft(1).modInverse(p)).mod(p)
          } else
            r.y.subtract(l.y)
              .multiply(r.x.subtract(l.x).mod(p).modInverse(p)).mod(p)
        val x3 = lam.pow(2).subtract(l.x).subtract(r.x).mod(p)
        val y3 = lam.multiply(l.x.subtract(x3)).subtract(l.y).mod(p)
        Some(Point(x3, y3))
      }
  }

  /** Double-and-add scalar multiplication (verification is public-input
    * only, so constant-time hardening is not required here). */
  private def mul(k: BigInteger, pt: Point): Option[Point] = {
    var acc: Option[Point] = None
    var addend: Option[Point] = Some(pt)
    var scalar = k.mod(n)
    while (scalar.signum > 0) {
      if (scalar.testBit(0)) acc = add(acc, addend)
      addend = add(addend, addend)
      scalar = scalar.shiftRight(1)
    }
    acc
  }

  /** Standard ECDSA verification: with w = s⁻¹, the point
    * u₁G + u₂Q (u₁ = zw, u₂ = rw) must land on x ≡ r (mod n). */
  def verify(key: PubKey, msgHash: Array[Byte], r: BigInteger, s: BigInteger): Boolean = {
    if (r.signum <= 0 || r.compareTo(n) >= 0) return false
    if (s.signum <= 0 || s.compareTo(n) >= 0) return false
    val z = new BigInteger(1, msgHash)
    val w = s.modInverse(n)
    val u1 = z.multiply(w).mod(n)
    val u2 = r.multiply(w).mod(n)
    add(mul(u1, G), mul(u2, Point(key.x, key.y))) match {
      case Some(pt) => pt.x.mod(n) == r
      case None => false
    }
  }

  // ---------------- signing (for locally-minted stream DIDs) ----------------

  /** Public key for a private scalar d: Q = dG. */
  def publicKey(d: BigInteger): PubKey = {
    val pt = mul(d.mod(n), G).getOrElse(
      throw new IllegalArgumentException("private scalar is 0 mod n"))
    PubKey(pt.x, pt.y)
  }

  /** SEC1 compressed encoding (02/03 ‖ x) — the form did:key uses. */
  def compress(key: PubKey): Array[Byte] = {
    val x = key.x.toByteArray.dropWhile(_ == 0)
    (if (key.y.testBit(0)) Array[Byte](0x03) else Array[Byte](0x02)) ++
      (Array.fill[Byte](32 - x.length)(0) ++ x)
  }

  private def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  private def int32(v: BigInteger): Array[Byte] = {
    val raw = v.toByteArray.dropWhile(_ == 0)
    Array.fill[Byte](32 - raw.length)(0) ++ raw
  }

  /** Deterministic nonce per RFC 6979 §3.2 (HMAC-SHA256): signing must
    * never depend on an RNG — a repeated or biased k leaks the key. */
  private def rfc6979K(d: BigInteger, hash: Array[Byte]): BigInteger = {
    val h1 = int32(new BigInteger(1, hash).mod(n)) // bits2octets for 256-bit curve
    var v = Array.fill[Byte](32)(0x01)
    var k = Array.fill[Byte](32)(0x00)
    k = hmacSha256(k, v ++ Array[Byte](0x00) ++ int32(d) ++ h1)
    v = hmacSha256(k, v)
    k = hmacSha256(k, v ++ Array[Byte](0x01) ++ int32(d) ++ h1)
    v = hmacSha256(k, v)
    while (true) {
      v = hmacSha256(k, v)
      val cand = new BigInteger(1, v)
      if (cand.signum > 0 && cand.compareTo(n) < 0) return cand
      k = hmacSha256(k, v ++ Array[Byte](0x00))
      v = hmacSha256(k, v)
    }
    throw new IllegalStateException("unreachable")
  }

  /** ECDSA sign with deterministic k; s is canonicalized low (s ≤ n/2),
    * the form ATProto requires and every verifier accepts. */
  def sign(d: BigInteger, msgHash: Array[Byte]): (BigInteger, BigInteger) = {
    val z = new BigInteger(1, msgHash)
    var k = rfc6979K(d, msgHash)
    while (true) {
      val rp = mul(k, G).getOrElse(throw new IllegalStateException("k*G = infinity"))
      val r = rp.x.mod(n)
      if (r.signum != 0) {
        var s = k.modInverse(n).multiply(z.add(r.multiply(d))).mod(n)
        if (s.signum != 0) {
          if (s.compareTo(n.shiftRight(1)) > 0) s = n.subtract(s)
          return (r, s)
        }
      }
      // vanishing r/s: derive the next candidate nonce (never in practice)
      k = rfc6979K(d, hmacSha256(int32(k), msgHash))
    }
    throw new IllegalStateException("unreachable")
  }

  /** Raw 64-byte r ‖ s form (JOSE / PLC signature encoding). */
  def signRaw(d: BigInteger, msgHash: Array[Byte]): Array[Byte] = {
    val (r, s) = sign(d, msgHash)
    int32(r) ++ int32(s)
  }

  /** Decode a SEC1 public key: 33-byte compressed (02/03 ‖ x, the form
    * ATProto did:key uses) or 65-byte uncompressed (04 ‖ x ‖ y).
    * Compressed keys recover y via y = (x³+7)^((p+1)/4) — valid because
    * p ≡ 3 (mod 4). */
  def decodePoint(sec1: Array[Byte]): PubKey = sec1.length match {
    case 65 if sec1(0) == 0x04 =>
      PubKey(new BigInteger(1, sec1.slice(1, 33)), new BigInteger(1, sec1.slice(33, 65)))
    case 33 if sec1(0) == 0x02 || sec1(0) == 0x03 =>
      val x = new BigInteger(1, sec1.tail)
      val alpha = x.modPow(BigInteger.valueOf(3), p).add(seven).mod(p)
      val beta = alpha.modPow(p.add(BigInteger.ONE).shiftRight(2), p)
      val y = if (beta.testBit(0) == (sec1(0) == 0x03)) beta else p.subtract(beta)
      PubKey(x, y)
    case l => throw new IllegalArgumentException(s"bad SEC1 key length $l")
  }
}
