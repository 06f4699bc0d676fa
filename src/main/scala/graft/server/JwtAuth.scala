package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{PublicKey, Signature}
import java.util.Base64

/** ATProto-shaped service-JWT verification (behavioral spec:
  * /root/reference/leaf-server/src/http.rs:160-242).
  *
  * The reference accepts a JWT whose `aud` matches the server DID, whose
  * `lxm` claim (when present) is `town.muni.leaf.authenticate`, whose `iss`
  * names the caller DID, and whose signature verifies against the key in
  * the issuer's PLC-resolved DID document. This implementation performs the
  * same claim checks and signature verification; key resolution is a
  * pluggable function (`resolveKey`) so a PLC directory client can slot in
  * where this offline build registers keys directly. Two JOSE algorithms
  * are supported, both raw r||s signatures over SHA-256:
  *   - ES256  (P-256, via the JDK provider)
  *   - ES256K (secp256k1 — the curve ATProto signing keys actually use,
  *     verified by the pure-JVM `Secp256k1` since the JDK lacks it)
  */
object JwtAuth {
  /** A resolvable verification key, tagged by curve. */
  sealed trait Key
  /** P-256 (JDK `EC` provider key) for ES256 tokens. */
  final case class P256(key: PublicKey) extends Key
  /** secp256k1 for ES256K tokens (SEC1 bytes via `Secp256k1.decodePoint`). */
  final case class K256(key: Secp256k1.PubKey) extends Key
}

class JwtAuth(serverDid: String, resolveKey: String => Option[JwtAuth.Key]) {

  private def b64url(s: String): Array[Byte] = Base64.getUrlDecoder.decode(s)

  private def jsonStr(m: Map[String, Any], k: String): Option[String] =
    m.get(k).collect { case s: String => s }

  /** DER-encode a JOSE raw (r || s) ECDSA signature for java.security. */
  private def joseToDer(sig: Array[Byte]): Array[Byte] = {
    require(sig.length % 2 == 0, "bad raw signature length")
    def int(bytes: Array[Byte]): Array[Byte] = {
      val stripped = bytes.dropWhile(_ == 0) match {
        case Array() => Array[Byte](0)
        case b => b
      }
      val padded = if ((stripped(0) & 0x80) != 0) Array[Byte](0) ++ stripped else stripped
      Array[Byte](2, padded.length.toByte) ++ padded
    }
    val (r, s) = sig.splitAt(sig.length / 2)
    val body = int(r) ++ int(s)
    Array[Byte](0x30, body.length.toByte) ++ body
  }

  /** Verify a token; Right(caller DID) or Left(reason). */
  def verify(token: String): Either[String, String] = {
    val parts = token.split('.')
    if (parts.length != 3) return Left("Invalid format for JWT auth token")
    val (headB, claimB, sigB) =
      try (b64url(parts(0)), b64url(parts(1)), b64url(parts(2)))
      catch { case _: Exception => return Left("Invalid base64url in JWT") }
    val header =
      try Json.parse(new String(headB, UTF_8)).asInstanceOf[Map[String, Any]]
      catch { case _: Exception => return Left("Invalid JWT header") }
    val alg = jsonStr(header, "alg").getOrElse("")
    if (alg != "ES256" && alg != "ES256K")
      return Left(s"Unsupported JWT alg: ${header.get("alg")}")
    val claims =
      try Json.parse(new String(claimB, UTF_8)).asInstanceOf[Map[String, Any]]
      catch { case _: Exception => return Left("Invalid JWT claims") }

    // audience must match our server DID when present (http.rs:189-200)
    jsonStr(claims, "aud") match {
      case Some(aud) if aud != serverDid =>
        return Left(s"Invalid JWT audience: expected $serverDid but got $aud")
      case _ =>
    }
    // lxm claim must name the authenticate method when present (http.rs:203-211)
    jsonStr(claims, "lxm") match {
      case Some(lxm) if lxm != "town.muni.leaf.authenticate" =>
        return Left(s"Invalid lxm in JWT: `$lxm`")
      case _ =>
    }
    // NumericDate may arrive as integer or float
    def numericDate(k: String): Option[Long] = claims.get(k).collect {
      case l: Long => l
      case d: Double => d.toLong
    }
    val now = System.currentTimeMillis() / 1000
    val skew = 60L // clock-skew allowance for nbf/iat, the usual JOSE grace
    // exp is REQUIRED: a token that never expires is a stolen-credential
    // forever-key (the reference's jsonwebtoken validation requires exp by
    // default — a missing claim fails verification there too)
    numericDate("exp") match {
      case None => return Left("JWT missing exp claim")
      case Some(exp) if exp < now => return Left("JWT expired")
      case _ =>
    }
    numericDate("nbf").foreach(nbf =>
      if (nbf > now + skew) return Left("JWT not yet valid (nbf in the future)"))
    numericDate("iat").foreach(iat =>
      if (iat > now + skew) return Left("JWT issued in the future"))
    val did = jsonStr(claims, "iss").getOrElse(
      return Left("JWT token issuer is missing"))

    val key = resolveKey(did).getOrElse(
      return Left(s"Could not find signing key for DID: $did"))
    val signingInput = s"${parts(0)}.${parts(1)}".getBytes(UTF_8)
    val valid = (alg, key) match {
      case ("ES256", JwtAuth.P256(k)) =>
        val verifier = Signature.getInstance("SHA256withECDSA")
        verifier.initVerify(k)
        verifier.update(signingInput)
        try verifier.verify(joseToDer(sigB))
        catch { case _: Exception => false }
      case ("ES256K", JwtAuth.K256(k)) =>
        sigB.length == 64 && {
          val hash = java.security.MessageDigest.getInstance("SHA-256")
            .digest(signingInput)
          Secp256k1.verify(k, hash,
            new java.math.BigInteger(1, sigB.take(32)),
            new java.math.BigInteger(1, sigB.drop(32)))
        }
      case _ =>
        return Left(s"JWT alg $alg does not match the issuer's key type")
    }
    if (valid) Right(did) else Left("JWT signature verification failed")
  }
}
