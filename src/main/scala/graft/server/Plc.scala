package graft.server

import java.math.BigInteger
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64

import scala.collection.mutable

import graft.drisl.{Cid, Drisl, DValue}

/** did:plc identity operations, implemented from the public PLC
  * specification (plc.directory: the DID Placeholder method used by
  * ATProto).
  *
  * The reference mints a did:plc for every stream by generating a
  * secp256k1 signing key, building a signed genesis operation naming a
  * `leaf_server` verification method + service endpoint, and POSTing it to
  * a PLC directory; `set_handle` then appends an update operation that
  * rewrites the `leaf://` alias in `alsoKnownAs`
  * (/root/reference/leaf-server/src/did.rs:11-147). This container has no
  * egress, so `LocalPlcDirectory` plays the directory role with the same
  * validation rules: a genesis op must self-verify against its own
  * rotation keys and hash to its DID; an update must name the latest op's
  * CID as `prev` and be signed by one of that op's rotation keys.
  *
  * Wire shapes follow the PLC spec exactly, so these operations are
  * byte-compatible with what a real directory expects:
  *   op    = {type: "plc_operation", rotationKeys: [did:key…],
  *            verificationMethods: {name: did:key…}, alsoKnownAs: […],
  *            services: {name: {type, endpoint}}, prev: cid|null,
  *            sig: base64url(r‖s)}
  *   did   = "did:plc:" + base32-lower(sha256(dag-cbor(signed genesis)))[0,24)
  *   key   = "did:key:z" + base58btc(varint(0xe7) ‖ compressed pubkey)
  */
object Plc {
  import DValue._

  /** A secp256k1 signing key (the curve PLC/ATProto identities use). */
  final case class SigningKey(d: BigInteger) {
    lazy val pub: Secp256k1.PubKey = Secp256k1.publicKey(d)
    lazy val didKey: String = Plc.didKey(pub)
    def sign(hash: Array[Byte]): Array[Byte] = Secp256k1.signRaw(d, hash)
  }

  object SigningKey {
    private val rnd = new SecureRandom()
    def generate(): SigningKey = {
      var d = BigInteger.ZERO
      while (d.signum == 0 || d.compareTo(Secp256k1.n) >= 0)
        d = new BigInteger(256, rnd)
      SigningKey(d)
    }
  }

  // ---------------- did:key (multicodec secp256k1-pub = 0xe7) ----------------

  private val B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  def base58Encode(bytes: Array[Byte]): String = {
    val zeros = bytes.takeWhile(_ == 0).length
    var num = new BigInteger(1, bytes)
    val sb = new StringBuilder
    val fiftyEight = BigInteger.valueOf(58)
    while (num.signum > 0) {
      val Array(q, r) = num.divideAndRemainder(fiftyEight)
      sb.append(B58(r.intValue)); num = q
    }
    ("1" * zeros) + sb.reverseInPlace().toString
  }

  def base58Decode(s: String): Array[Byte] = {
    val zeros = s.takeWhile(_ == '1').length
    var num = BigInteger.ZERO
    val fiftyEight = BigInteger.valueOf(58)
    s.foreach { c =>
      val v = B58.indexOf(c)
      require(v >= 0, s"bad base58 character '$c'")
      num = num.multiply(fiftyEight).add(BigInteger.valueOf(v))
    }
    Array.fill[Byte](zeros)(0) ++ num.toByteArray.dropWhile(_ == 0)
  }

  /** did:key of a secp256k1 public key: z-multibase over
    * varint(0xe7) ‖ SEC1-compressed point. */
  def didKey(pub: Secp256k1.PubKey): String =
    "did:key:z" + base58Encode(
      Array[Byte](0xe7.toByte, 0x01) ++ Secp256k1.compress(pub))

  /** Parse a secp256k1 did:key (or bare z-multibase) back to the point. */
  def keyFromDidKey(s: String): Secp256k1.PubKey = {
    val multibase = s.stripPrefix("did:key:")
    require(multibase.startsWith("z"), s"not a base58btc multibase key: $s")
    val bytes = base58Decode(multibase.tail)
    require(bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0xe7 && bytes(1) == 0x01,
      "not a secp256k1-pub multicodec key")
    Secp256k1.decodePoint(bytes.drop(2))
  }

  // ---------------- operations ----------------

  private def b64url(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** Unsigned genesis operation for a leaf-server stream DID
    * (did.rs:17-28: one key as both rotation key and `leaf_server`
    * verification method, one `LeafServer` service endpoint). */
  def genesisOp(key: SigningKey, endpoint: String): DValue.DMap = obj(
    "type" -> text("plc_operation"),
    "rotationKeys" -> arr(text(key.didKey)),
    "verificationMethods" -> obj("leaf_server" -> text(key.didKey)),
    "alsoKnownAs" -> arr(),
    "services" -> obj("leaf_server" -> obj(
      "type" -> text("LeafServer"),
      "endpoint" -> text(endpoint))),
    "prev" -> DNull)

  /** Sign: sha256 over the dag-cbor of the op without `sig`, ECDSA
    * low-S, base64url r‖s appended as `sig`. */
  def signOp(unsigned: DValue.DMap, key: SigningKey): DValue.DMap =
    DMap(unsigned.v + ("sig" -> text(b64url(
      key.sign(sha256(Drisl.encode(DMap(unsigned.v - "sig"))))))))

  /** Verify an op's signature against a set of did:key rotation keys. */
  def verifyOp(op: DValue.DMap, allowedDidKeys: Seq[String]): Boolean = {
    val sig = op.v.get("sig") match {
      case Some(DText(s)) => try Base64.getUrlDecoder.decode(s)
        catch { case _: Exception => return false }
      case _ => return false
    }
    if (sig.length != 64) return false
    val hash = sha256(Drisl.encode(DMap(op.v - "sig")))
    val r = new BigInteger(1, sig.take(32))
    val s = new BigInteger(1, sig.drop(32))
    allowedDidKeys.exists { dk =>
      try Secp256k1.verify(keyFromDidKey(dk), hash, r, s)
      catch { case _: Exception => false }
    }
  }

  private val B32 = "abcdefghijklmnopqrstuvwxyz234567"

  /** did:plc derivation: base32-lower sha256 of the signed genesis op,
    * truncated to 24 characters. */
  def didForOp(signedGenesis: DValue.DMap): String = {
    val digest = sha256(Drisl.encode(signedGenesis))
    val sb = new StringBuilder
    var buf = 0L
    var bits = 0
    digest.foreach { b =>
      buf = (buf << 8) | (b & 0xff); bits += 8
      while (bits >= 5 && sb.length < 24) {
        bits -= 5; sb.append(B32(((buf >> bits) & 0x1f).toInt))
      }
    }
    "did:plc:" + sb.toString
  }

  /** CID naming an operation in the audit log (`prev` references). */
  def opCid(op: DValue.DMap): String = Cid.render(Cid.ofValue(op))

  private def strings(v: Option[DValue]): Vector[String] = v match {
    case Some(DArray(a)) => a.collect { case DText(s) => s }
    case _ => Vector.empty
  }

  /** Update operation rewriting the `leaf://` handle alias, carrying
    * everything else forward from the latest op (did.rs:62-124). */
  def updateHandleOp(latest: DValue.DMap, latestCid: String,
      handle: Option[String]): DValue.DMap = {
    val kept = strings(latest.v.get("alsoKnownAs")).filterNot(_.startsWith("leaf://"))
    val aka = kept ++ handle.map(h => s"leaf://$h").toVector
    DMap(latest.v - "sig" ++ Map(
      "alsoKnownAs" -> DArray(aka.map(text)),
      "prev" -> text(latestCid)))
  }

  /** PLC operations cross the directory's HTTP boundary as JSON (the
    * reference POSTs serde-JSON, did.rs:32-36). Ops are maps/arrays/
    * strings/null only, so the conversion is structural — and CID-safe,
    * because Drisl's dag-cbor encoding sorts map keys canonically, so a
    * JSON round-trip cannot perturb an operation's CID. */
  def opToJson(v: DValue): Any = v match {
    case DNull => null
    case DText(s) => s
    case DMap(m) => m.map { case (k, x) => k -> opToJson(x) }
    case DArray(a) => a.map(opToJson)
    case other =>
      throw new IllegalArgumentException(s"non-PLC value in operation: $other")
  }

  def opFromJson(v: Any): DValue = v match {
    case null => DNull
    case s: String => DText(s)
    case m: Map[_, _] => DMap(m.map { case (k, x) =>
      k.toString -> opFromJson(x) })
    case a: Vector[_] => DArray(a.map(opFromJson))
    case other =>
      throw new IllegalArgumentException(s"non-PLC value in operation: $other")
  }
}

/** An in-process PLC directory with the real directory's validation rules
  * (genesis self-verifies and hashes to its DID; updates chain by `prev`
  * CID and are signed by the latest op's rotation keys), plus the signing
  * key custody the reference keeps in server storage
  * (storage.rs get_did_signing_key / did.rs:44). Zero-egress stand-in for
  * plc.directory — the operations it accepts are exactly what the real
  * directory would accept. */
/** The directory role behind stream DID custody (did.rs:11-147): mint a
  * genesis operation per stream, chain signed updates, resolve
  * verification keys. Two implementations: [[LocalPlcDirectory]] plays
  * the directory in-process (the zero-egress default) and
  * [[HttpPlcDirectory]] is the reference's actual deployment shape — the
  * real plc.directory wire protocol over HTTP. Signing keys are
  * CUSTODIED LOCALLY in both (the reference keeps them in its own
  * storage, storage.rs; a directory only ever sees signed operations). */
trait PlcDirectory {
  protected val keys = mutable.Map.empty[String, Plc.SigningKey]

  /** Mint a stream DID: generate a key, sign + submit a genesis op,
    * custody the key (did.rs create_did). Returns the did. */
  def createDid(endpoint: String): String
  /** Submit an externally-built operation (the directory's POST /{did}). */
  def submit(did: String, op: DValue.DMap): Either[String, Unit]
  /** Sign-and-submit a handle update with the custodied key
    * (did.rs update_did_handle). */
  def updateHandle(did: String, handle: Option[String]): Either[String, Unit]
  /** The DID's operation log, oldest first. */
  def auditLog(did: String): Vector[DValue.DMap]
  /** The latest op's alsoKnownAs aliases. */
  def alsoKnownAs(did: String): Vector[String]
  /** DID-document key resolution for `JwtAuth`: the first verification
    * method, as the reference resolves Multikey verification methods
    * (http.rs:222-236). */
  def resolveKey(did: String): Option[JwtAuth.Key]

  /** The custodied signing-key scalar as 32 big-endian bytes (the shape a
    * reference bucket's `did_key: {"K256": ...}` carries) — only for the
    * opt-in key-bearing backup export. */
  final def custodiedSecret(did: String): Option[Array[Byte]] = synchronized {
    keys.get(did).map { k =>
      val raw = k.d.toByteArray.dropWhile(_ == 0)
      require(raw.length <= 32, "secp256k1 scalar wider than 32 bytes")
      val out = new Array[Byte](32)
      System.arraycopy(raw, 0, out, 32 - raw.length, raw.length)
      out
    }
  }

  /** Reinstate custody of an imported key (the reference's
    * create_did-on-restore, storage.rs:933-935). The DID's op log, if it
    * exists elsewhere, is not rewritten — this only restores the ability
    * to sign with the key. */
  final def installKey(did: String, secret: Array[Byte]): Unit = synchronized {
    require(secret.length == 32, s"expected a 32-byte scalar, got ${secret.length}")
    val d = new BigInteger(1, secret)
    require(d.signum > 0 && d.compareTo(Secp256k1.n) < 0,
      "imported key scalar out of curve order")
    keys(did) = Plc.SigningKey(d)
  }
}

class LocalPlcDirectory extends PlcDirectory {
  import DValue._

  private val logs = mutable.LinkedHashMap.empty[String, Vector[DMap]]

  /** Mint a stream DID: generate a key, sign a genesis op, record both
    * (did.rs create_did). Returns the did. */
  def createDid(endpoint: String): String = synchronized {
    val key = Plc.SigningKey.generate()
    val signed = Plc.signOp(Plc.genesisOp(key, endpoint), key)
    val did = Plc.didForOp(signed)
    require(Plc.verifyOp(signed, rotationKeys(signed)), "genesis must self-verify")
    logs(did) = Vector(signed)
    keys(did) = key
    did
  }

  /** Submit an externally-built operation (the directory's POST /{did}).
    * Genesis ops create; updates must chain and verify. */
  def submit(did: String, op: DMap): Either[String, Unit] = synchronized {
    logs.get(did) match {
      case None =>
        if (!op.v.get("prev").contains(DNull))
          Left("unknown DID: first operation must be a genesis (prev = null)")
        else if (Plc.didForOp(op) != did) Left("operation does not hash to the DID")
        else if (!Plc.verifyOp(op, rotationKeys(op))) Left("invalid genesis signature")
        else { logs(did) = Vector(op); Right(()) }
      case Some(log) =>
        val latest = log.last
        val expectedPrev = Plc.opCid(latest)
        op.v.get("prev") match {
          case Some(DText(p)) if p == expectedPrev =>
            if (!Plc.verifyOp(op, rotationKeys(latest)))
              Left("operation not signed by a rotation key")
            else { logs(did) = log :+ op; Right(()) }
          case other => Left(s"prev mismatch: expected $expectedPrev, got $other")
        }
    }
  }

  /** Sign-and-submit a handle update with the custodied key
    * (did.rs update_did_handle). */
  def updateHandle(did: String, handle: Option[String]): Either[String, Unit] =
    synchronized {
      (logs.get(did), keys.get(did)) match {
        case (Some(log), Some(key)) =>
          val latest = log.last
          val unsigned = Plc.updateHandleOp(latest, Plc.opCid(latest), handle)
          submit(did, Plc.signOp(unsigned, key))
        case _ => Left(s"No signing key found for DID: cannot update handle")
      }
    }

  def auditLog(did: String): Vector[DMap] = synchronized(logs.getOrElse(did, Vector.empty))

  def alsoKnownAs(did: String): Vector[String] = synchronized {
    logs.get(did).map(_.last).toVector.flatMap(op => op.v.get("alsoKnownAs") match {
      case Some(DArray(a)) => a.collect { case DText(s) => s }
      case _ => Vector.empty
    })
  }

  /** DID-document key resolution for `JwtAuth`: the first verification
    * method, as the reference resolves Multikey verification methods
    * (http.rs:222-236). */
  def resolveKey(did: String): Option[JwtAuth.Key] = synchronized {
    logs.get(did).map(_.last).flatMap(op => op.v.get("verificationMethods") match {
      case Some(DMap(m)) => m.values.collectFirst { case DText(dk) =>
        JwtAuth.K256(Plc.keyFromDidKey(dk))
      }
      case _ => None
    })
  }

  private def rotationKeys(op: DMap): Vector[String] = op.v.get("rotationKeys") match {
    case Some(DArray(a)) => a.collect { case DText(s) => s }
    case _ => Vector.empty
  }
}

/** plc.directory over HTTP — the reference's actual directory client
  * (leaf-server/src/did.rs:11-147, `--plc-directory`): genesis and update
  * operations POST as JSON to `{directory}/{did}`, the previous operation
  * for an update comes from `GET /{did}/log/audit` (the latest
  * non-nullified entry, did.rs:58-66), and resolution reads the current
  * state at `GET /{did}/data`. Signing keys stay in LOCAL custody exactly
  * as the reference keeps them in server storage — the directory only
  * ever sees signed operations. The zero-egress sandbox points this at a
  * loopback stub in tests; a deployment points it at the real
  * https://plc.directory (the reference defaults to localhost:3001,
  * cli.rs:23). */
class HttpPlcDirectory(baseUrl: String) extends PlcDirectory {
  import java.net.URI
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}
  import DValue._

  private val base = baseUrl.stripSuffix("/")
  // bounded: a hung directory must fail a mint/update loudly, never hang
  // the stream/create RPC that called it
  private val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  private val reqTimeout = java.time.Duration.ofSeconds(30)

  private def post(did: String, op: DMap): Either[String, Unit] = {
    val req = HttpRequest.newBuilder(URI.create(s"$base/$did"))
      .header("Content-Type", "application/json")
      .timeout(reqTimeout)
      .POST(HttpRequest.BodyPublishers.ofString(
        Json.render(Plc.opToJson(op))))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 == 2) Right(())
    // the reference surfaces the directory's status + body verbatim
    // (did.rs:38-42) — so do we
    else Left(s"PLC directory error: ${resp.statusCode()}: ${resp.body()}")
  }

  private def get(path: String): Option[Any] = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"$base$path"))
        .timeout(reqTimeout).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 == 2) Some(Json.parse(resp.body())) else None
  }

  // NOTE: the monitor guards only the keys map — never an HTTP round-trip
  // (holding it across client.send would serialize every concurrent
  // stream/create at up to the 40s timeout budget and stall the backup
  // sweep's custodiedSecret behind in-flight directory calls)
  def createDid(endpoint: String): String = {
    val key = Plc.SigningKey.generate()
    val signed = Plc.signOp(Plc.genesisOp(key, endpoint), key)
    val did = Plc.didForOp(signed)
    // self-verify before submitting, as the reference does (did.rs:30)
    val rot = signed.v.get("rotationKeys") match {
      case Some(DArray(a)) => a.collect { case DText(s) => s }
      case _ => Vector.empty
    }
    require(Plc.verifyOp(signed, rot), "genesis must self-verify")
    post(did, signed) match {
      case Right(()) => synchronized { keys(did) = key }; did
      case Left(err) => throw new IllegalStateException(err)
    }
  }

  def submit(did: String, op: DMap): Either[String, Unit] = post(did, op)

  // updates to ONE did must serialize across threads: two concurrent
  // read-latest → sign → POST sequences would chain the same prev and
  // the directory rejects the loser. A per-DID monitor keeps that
  // serialization without reintroducing the instance-wide HTTP lock
  // (updates to different DIDs, createDid, and custodiedSecret all
  // proceed concurrently).
  private val didLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def updateHandle(did: String, handle: Option[String]): Either[String, Unit] =
    didLocks.computeIfAbsent(did, _ => new Object).synchronized {
      synchronized(keys.get(did)) match {
        case None => Left("No signing key found for DID: cannot update handle")
        case Some(key) => latestEntry(did) match {
          case None => Left(s"no operation log for $did at the directory")
          case Some((latest, cid)) =>
            post(did, Plc.signOp(Plc.updateHandleOp(latest, cid, handle), key))
        }
      }
    }

  /** Latest non-nullified audit entry as (operation, cid) — did.rs:58-66:
    * the update chains off the directory's view of the log, not a local
    * mirror, so a rotation made elsewhere is honoured. */
  private def latestEntry(did: String): Option[(DMap, String)] =
    get(s"/$did/log/audit") match {
      case Some(a: Vector[Any] @unchecked) =>
        a.reverseIterator.collectFirst {
          case e: Map[String, Any] @unchecked
              if !e.get("nullified").contains(true) =>
            (Plc.opFromJson(e("operation")).asInstanceOf[DMap],
              e("cid").toString)
        }
      case _ => None
    }

  def auditLog(did: String): Vector[DMap] =
    get(s"/$did/log/audit") match {
      case Some(a: Vector[Any] @unchecked) => a.collect {
        case e: Map[String, Any] @unchecked =>
          Plc.opFromJson(e("operation")).asInstanceOf[DMap]
      }
      case _ => Vector.empty
    }

  private def data(did: String): Option[Map[String, Any]] =
    get(s"/$did/data").collect { case m: Map[String, Any] @unchecked => m }

  def alsoKnownAs(did: String): Vector[String] =
    data(did).flatMap(_.get("alsoKnownAs")).toVector.flatMap {
      case a: Vector[Any] @unchecked => a.collect { case s: String => s }
      case _ => Vector.empty
    }

  def resolveKey(did: String): Option[JwtAuth.Key] =
    data(did).flatMap(_.get("verificationMethods")).flatMap {
      case m: Map[String, Any] @unchecked => m.values.collectFirst {
        case dk: String => JwtAuth.K256(Plc.keyFromDidKey(dk))
      }
      case _ => None
    }
}
