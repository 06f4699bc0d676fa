package graft.drisl

import java.security.MessageDigest

/** Content identifiers for modules.
  *
  * The reference content-addresses module definitions by CID = sha2-256 over
  * the DRISL encoding (/root/reference/leaf-stream-types/src/lib.rs:45-52).
  * We produce a CIDv1 with the dag-cbor codec (0x71) and sha2-256 multihash:
  *   0x01 | 0x71 | 0x12 | 0x20 | digest[32]
  * rendered in lowercase base32 (multibase prefix 'b') for display.
  */
object Cid {
  def of(drislBytes: Array[Byte]): Array[Byte] = {
    val digest = MessageDigest.getInstance("SHA-256").digest(drislBytes)
    Array[Byte](0x01, 0x71, 0x12, 0x20) ++ digest
  }

  def ofValue(v: DValue): Array[Byte] = of(Drisl.encode(v))

  private val B32 = "abcdefghijklmnopqrstuvwxyz234567"

  /** Multibase base32-lower rendering ("b" prefix), RFC 4648 no padding. */
  def render(cid: Array[Byte]): String = {
    val sb = new StringBuilder("b")
    var buf = 0L
    var bits = 0
    cid.foreach { b =>
      buf = (buf << 8) | (b & 0xff)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(B32(((buf >> bits) & 0x1f).toInt))
      }
    }
    if (bits > 0) sb.append(B32(((buf << (5 - bits)) & 0x1f).toInt))
    sb.toString
  }

  /** Inverse of `render`: multibase base32-lower string → CID bytes. */
  def parse(s: String): Array[Byte] = {
    require(s.nonEmpty && s(0) == 'b', s"not a base32-lower multibase CID: $s")
    val out = Array.newBuilder[Byte]
    var buf = 0L
    var bits = 0
    s.drop(1).foreach { c =>
      val v = B32.indexOf(c)
      require(v >= 0, s"bad base32 character '$c' in CID")
      buf = (buf << 5) | v
      bits += 5
      if (bits >= 8) {
        bits -= 8
        out += ((buf >> bits) & 0xff).toByte
      }
    }
    out.result()
  }
}
