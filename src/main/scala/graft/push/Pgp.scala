package graft.push

import java.io.ByteArrayOutputStream
import java.math.BigInteger
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Minimal RFC 4880 (OpenPGP) message construction in pure JDK crypto —
  * the real implementation of the reference's external functions
  * `GPG_PARAMS` / `GPG_FILE_WRAPPER` / `GPG_ENCRYPT` /
  * `GPG_PACKAGE_MESSAGE`
  * (`/root/reference/macros/apps/operations/marketing_cloud_data_extension_upload.sql:88-99`).
  *
  * Produces messages GnuPG decrypts (interop-tested in GpgRoundTripSpec):
  *
  *  - PKESK (tag 1, v3): session key encrypted to an RSA key with
  *    EME-PKCS1-v1_5 (`RSA/ECB/PKCS1Padding` — exactly RFC 4880 §13.1).
  *  - Literal data packet (tag 11), format 'b'.
  *  - SEIPD (tag 18, v1): AES-256 in OpenPGP CFB (zero IV, 18-byte
  *    quick-check prefix) with the SHA-1 MDC trailer (§5.13).
  *  - New-format packet framing with STREAMING partial body lengths
  *    (§4.2.2.4) — the encryptor emits fixed 8 KiB chunks and never
  *    buffers the payload, so a message of any size encrypts in O(chunk)
  *    memory: the property that matters when one model's push is
  *    gigabytes.
  *  - ASCII armor with CRC24 (§6), also streaming.
  *
  * Decrypt (the reverse path) is implemented for round-trip proof; the
  * push pipeline itself only encrypts, like the reference.
  */
object Pgp {

  // ---- armor ----------------------------------------------------------------

  /** CRC24 per RFC 4880 §6.1. */
  def crc24(init: Int, data: Array[Byte], off: Int, len: Int): Int = {
    var crc = init
    var k = off
    while (k < off + len) {
      crc ^= (data(k) & 0xFF) << 16
      var i = 0
      while (i < 8) {
        crc <<= 1
        if ((crc & 0x1000000) != 0) crc ^= 0x1864CFB
        i += 1
      }
      k += 1
    }
    crc & 0xFFFFFF
  }

  /** Streaming ASCII armor: 64-char base64 lines + running CRC24. */
  final class ArmorStream(title: String = "PGP MESSAGE") {
    private var crc = 0xB704CE
    private var pending = Array.emptyByteArray
    private val enc = java.util.Base64.getEncoder

    def begin: Seq[String] = Seq(s"-----BEGIN $title-----", "")

    def push(data: Array[Byte]): Seq[String] = {
      crc = crc24(crc, data, 0, data.length)
      pending = pending ++ data
      val lines = Seq.newBuilder[String]
      var off = 0
      while (pending.length - off >= 48) { // 48 bytes -> 64 b64 chars
        lines += enc.encodeToString(java.util.Arrays.copyOfRange(pending, off, off + 48))
        off += 48
      }
      pending = java.util.Arrays.copyOfRange(pending, off, pending.length)
      lines.result()
    }

    def finish(): Seq[String] = {
      val last = if (pending.nonEmpty) Seq(enc.encodeToString(pending)) else Seq.empty
      pending = Array.emptyByteArray
      val crcB64 = enc.encodeToString(Array(
        ((crc >> 16) & 0xFF).toByte, ((crc >> 8) & 0xFF).toByte, (crc & 0xFF).toByte))
      last ++ Seq("=" + crcB64, s"-----END $title-----")
    }
  }

  def dearmor(text: String): Array[Byte] = {
    val lines = text.linesIterator.map(_.trim).toVector
    val begin = lines.indexWhere(_.startsWith("-----BEGIN PGP"))
    val end = lines.indexWhere(_.startsWith("-----END PGP"))
    require(begin >= 0 && end > begin, "not an ASCII-armored PGP block")
    val body = lines.slice(begin + 1, end)
      .dropWhile(l => l.contains(": ")) // armor headers
      .filterNot(l => l.isEmpty || l.startsWith("="))
    java.util.Base64.getDecoder.decode(body.mkString)
  }

  // ---- packet grammar --------------------------------------------------------

  final case class Packet(tag: Int, body: Array[Byte])

  /** Parse a packet sequence — old- and new-format headers, including
    * partial body lengths (reassembled).
    */
  def packets(data: Array[Byte]): Vector[Packet] = {
    val out = Vector.newBuilder[Packet]
    var i = 0
    while (i < data.length) {
      val hdr = data(i) & 0xFF
      require((hdr & 0x80) != 0, s"bad packet header byte 0x${hdr.toHexString} at $i")
      if ((hdr & 0x40) == 0) { // old format
        val tag = (hdr >> 2) & 0x0F
        val (len, hl) = (hdr & 0x03) match {
          case 0 => ((data(i + 1) & 0xFF).toLong, 2)
          case 1 => ((((data(i + 1) & 0xFF) << 8) | (data(i + 2) & 0xFF)).toLong, 3)
          case 2 => ((((data(i + 1) & 0xFFL) << 24) | ((data(i + 2) & 0xFFL) << 16) |
            ((data(i + 3) & 0xFFL) << 8) | (data(i + 4) & 0xFFL)), 5)
          case _ => ((data.length - i - 1).toLong, 1) // indeterminate: to EOF
        }
        out += Packet(tag, java.util.Arrays.copyOfRange(data, i + hl, i + hl + len.toInt))
        i += hl + len.toInt
      } else { // new format, possibly partial lengths
        val tag = hdr & 0x3F
        i += 1
        val body = new ByteArrayOutputStream()
        var done = false
        while (!done) {
          val o1 = data(i) & 0xFF
          if (o1 < 192) { body.write(data, i + 1, o1); i += 1 + o1; done = true }
          else if (o1 < 224) {
            val l = ((o1 - 192) << 8) + (data(i + 1) & 0xFF) + 192
            body.write(data, i + 2, l); i += 2 + l; done = true
          } else if (o1 == 255) {
            val l = ((data(i + 1) & 0xFF) << 24) | ((data(i + 2) & 0xFF) << 16) |
              ((data(i + 3) & 0xFF) << 8) | (data(i + 4) & 0xFF)
            body.write(data, i + 5, l); i += 5 + l; done = true
          } else { // partial: 2^(o1 & 0x1F), more chunks follow
            val l = 1 << (o1 & 0x1F)
            body.write(data, i + 1, l); i += 1 + l
          }
        }
        out += Packet(tag, body.toByteArray)
      }
    }
    out.result()
  }

  private def defLen(out: ByteArrayOutputStream, len: Int): Unit =
    if (len < 192) out.write(len)
    else if (len < 8384) { val l = len - 192; out.write((l >> 8) + 192); out.write(l & 0xFF) }
    else {
      out.write(255)
      out.write((len >> 24) & 0xFF); out.write((len >> 16) & 0xFF)
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    }

  /** New-format packet with a definite length (whole body known). */
  def packet(tag: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0xC0 | tag)
    defLen(out, body.length)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Streaming new-format framer: emits 2^chunkLog2-byte partial-length
    * chunks as bytes accumulate, then one definite-length final chunk —
    * §4.2.2.4. Memory is O(chunk) regardless of packet size.
    */
  final class PacketStream(tag: Int, chunkLog2: Int = 13) {
    require(chunkLog2 >= 9 && chunkLog2 <= 30, "first partial length must be >= 512")
    private val chunkSize = 1 << chunkLog2
    private var pending = Array.emptyByteArray
    private var first = true
    private def tagByte(out: ByteArrayOutputStream): Unit =
      if (first) { first = false; out.write(0xC0 | tag) }

    def push(data: Array[Byte]): Array[Byte] = {
      pending = pending ++ data
      if (pending.length < chunkSize) Array.emptyByteArray
      else {
        val out = new ByteArrayOutputStream()
        var off = 0
        while (pending.length - off >= chunkSize) {
          tagByte(out)
          out.write(224 + chunkLog2) // partial-length octet
          out.write(pending, off, chunkSize)
          off += chunkSize
        }
        pending = java.util.Arrays.copyOfRange(pending, off, pending.length)
        out.toByteArray
      }
    }

    def finish(): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      tagByte(out)
      defLen(out, pending.length)
      out.write(pending, 0, pending.length)
      pending = Array.emptyByteArray
      out.toByteArray
    }
  }

  // ---- MPI / keys ------------------------------------------------------------

  private def writeMpi(out: ByteArrayOutputStream, v: BigInteger): Unit = {
    val bits = v.bitLength()
    out.write((bits >> 8) & 0xFF); out.write(bits & 0xFF)
    val raw = v.toByteArray
    val b = if (raw.length > 1 && raw(0) == 0) java.util.Arrays.copyOfRange(raw, 1, raw.length) else raw
    out.write(b, 0, b.length)
  }

  private def readMpi(b: Array[Byte], off: Int): (BigInteger, Int) = {
    val bits = ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
    val len = (bits + 7) / 8
    (new BigInteger(1, java.util.Arrays.copyOfRange(b, off + 2, off + 2 + len)), off + 2 + len)
  }

  /** An RSA encryption key lifted from a public-key block. */
  final case class RsaPub(n: BigInteger, e: BigInteger, keyId: Array[Byte]) {
    def keyIdHex: String = keyId.map("%02x".format(_)).mkString
    def modBytes: Int = (n.bitLength() + 7) / 8
  }

  private def isRsaKeyBody(body: Array[Byte]): Boolean =
    body.length > 6 && (body(0) & 0xFF) == 4 && Set(1, 2, 3)(body(5) & 0xFF)

  private def rsaFromKeyBody(body: Array[Byte]): RsaPub = {
    require(isRsaKeyBody(body), "only v4 RSA keys supported")
    val (n, o1) = readMpi(body, 6)
    val (e, _) = readMpi(body, o1)
    // v4 fingerprint: SHA1(0x99, len16, body); key id = low 8 bytes (§12.2)
    val md = MessageDigest.getInstance("SHA-1")
    md.update(0x99.toByte)
    md.update(((body.length >> 8) & 0xFF).toByte)
    md.update((body.length & 0xFF).toByte)
    md.update(body)
    RsaPub(n, e, md.digest().takeRight(8))
  }

  /** Key-flags octet (subpacket 27, §5.2.3.21) from a v4 signature's
    * hashed area; None when absent or not a v4 signature. Only hashed
    * subpackets count — unhashed ones are attacker-writable.
    */
  private def keyFlags(sig: Array[Byte]): Option[Int] = {
    if (sig.length < 6 || (sig(0) & 0xFF) != 4) return None
    val hashedLen = ((sig(4) & 0xFF) << 8) | (sig(5) & 0xFF)
    var i = 6
    val end = math.min(6 + hashedLen, sig.length)
    while (i < end) {
      val o1 = sig(i) & 0xFF
      // a truncated signature can end mid-length-octets: bail to None
      // (caller falls back to its no-flags heuristic) instead of reading
      // past the array
      val lo0 = if (o1 < 192) 1 else if (o1 < 255) 2 else 5
      if (i + lo0 > sig.length) return None
      val (len, lo) =
        if (o1 < 192) (o1, 1)
        else if (o1 < 255) (((o1 - 192) << 8) + (sig(i + 1) & 0xFF) + 192, 2)
        else (((sig(i + 1) & 0xFF) << 24) | ((sig(i + 2) & 0xFF) << 16) |
          ((sig(i + 3) & 0xFF) << 8) | (sig(i + 4) & 0xFF), 5)
      // len <= 0 (empty subpacket, or a hostile 5-octet length that
      // overflowed Int negative) would stall or rewind the cursor
      if (len <= 0) return None
      if (i + lo + len <= sig.length) {
        val tpe = sig(i + lo) & 0x7F
        if (tpe == 27 && len >= 2) return Some(sig(i + lo + 1) & 0xFF)
      }
      i += lo + len
    }
    None
  }

  /** The key to encrypt to. Preference order (§5.2.3.21 key flags 0x04 =
    * encrypt communications, 0x08 = encrypt storage, read from each
    * subkey's binding signature sig-type 0x18):
    * 1. the last RSA subkey (tag 14) whose binding signature carries an
    *    encrypt flag — skips signing-only subkeys that GnuPG would
    *    refuse to address a PKESK to;
    * 2. the last RSA subkey carrying NO key-flags subpacket at all
    *    (e.g. our own minimal [[armorPublicKey]] blocks) — a subkey
    *    whose flags are present but encrypt-free is signing-only and
    *    is skipped in favor of the primary;
    * 3. the primary key (tag 6).
    * Expiry/revocation are NOT checked — callers hold keys they control.
    */
  def parsePublicKey(armored: String): RsaPub = {
    val ps = packets(dearmor(armored))
    // pair each subkey with the key-flags of the binding sig that follows it
    val subkeys = Seq.newBuilder[(Packet, Option[Int])]
    var i = 0
    while (i < ps.length) {
      val p = ps(i)
      if (p.tag == 14 && isRsaKeyBody(p.body)) {
        val flags = ps.drop(i + 1).takeWhile(q => q.tag == 2)
          .filter(q => q.body.length > 1 && (q.body(1) & 0xFF) == 0x18)
          .flatMap(q => keyFlags(q.body)).headOption
        subkeys += ((p, flags))
      }
      i += 1
    }
    val sks = subkeys.result()
    sks.filter(_._2.exists(f => (f & 0x0C) != 0)).lastOption.map(_._1)
      .orElse(sks.filter(_._2.isEmpty).lastOption.map(_._1))
      .orElse(ps.find(p => p.tag == 6 && isRsaKeyBody(p.body)))
      .map(p => rsaFromKeyBody(p.body))
      .getOrElse(throw new IllegalArgumentException("no RSA public key packet in block"))
  }

  /** Armor a bare JDK RSA public key as a one-packet OpenPGP key block
    * (enough for [[parsePublicKey]]; carries no signatures/user ids).
    */
  def armorPublicKey(pub: java.security.interfaces.RSAPublicKey, ts: Int = 0): String = {
    val body = new ByteArrayOutputStream()
    body.write(4)
    body.write((ts >> 24) & 0xFF); body.write((ts >> 16) & 0xFF)
    body.write((ts >> 8) & 0xFF); body.write(ts & 0xFF)
    body.write(1) // RSA (encrypt or sign)
    writeMpi(body, pub.getModulus)
    writeMpi(body, pub.getPublicExponent)
    val pkt = packet(6, body.toByteArray)
    val a = new ArmorStream("PGP PUBLIC KEY BLOCK")
    (a.begin ++ a.push(pkt) ++ a.finish()).mkString("\n")
  }

  // ---- message packets -------------------------------------------------------

  /** Symmetric algo 9 = AES-256 (§9.2). */
  val SymAlgoAes256 = 9

  /** PKESK (tag 1, v3): [3, keyid(8), 1=RSA, MPI(RSA-PKCS1(algo || sk ||
    * checksum16))] — §5.1. The reference's GPG_PREFIX value is exactly
    * this packet's old-format header + version ("85010c03" for a
    * 2048-bit key), see [[pkeskHeaderHex]].
    */
  def pkesk(pub: RsaPub, sessionKey: Array[Byte], symAlgo: Int = SymAlgoAes256): Array[Byte] = {
    val m = new Array[Byte](sessionKey.length + 3)
    m(0) = symAlgo.toByte
    System.arraycopy(sessionKey, 0, m, 1, sessionKey.length)
    val ck = sessionKey.foldLeft(0)((a, b) => (a + (b & 0xFF)) & 0xFFFF)
    m(m.length - 2) = ((ck >> 8) & 0xFF).toByte
    m(m.length - 1) = (ck & 0xFF).toByte
    val kf = java.security.KeyFactory.getInstance("RSA")
    val key = kf.generatePublic(new java.security.spec.RSAPublicKeySpec(pub.n, pub.e))
    val c = Cipher.getInstance("RSA/ECB/PKCS1Padding")
    c.init(Cipher.ENCRYPT_MODE, key)
    val ct = c.doFinal(m)
    val body = new ByteArrayOutputStream()
    body.write(3)
    body.write(pub.keyId, 0, 8)
    body.write(1) // RSA
    writeMpi(body, new BigInteger(1, ct))
    packet(1, body.toByteArray)
  }

  /** Old-format PKESK header + version hex, the reference's GPG_PREFIX
    * shape: 0x85, 2-octet length (10 + 2 + modulus bytes), 0x03.
    */
  def pkeskHeaderHex(pub: RsaPub): String = {
    val len = 10 + 2 + pub.modBytes
    f"85$len%04x03"
  }

  /** Streaming literal-data packet (tag 11, format 'b') — §5.9. */
  final class LiteralStream(filename: String, ts: Int = 0, chunkLog2: Int = 13) {
    private val ps = new PacketStream(11, chunkLog2)
    private var started = false
    private def header: Array[Byte] = {
      val fn = filename.getBytes("UTF-8")
      require(fn.length < 256, "filename too long")
      val b = new ByteArrayOutputStream()
      b.write('b'); b.write(fn.length); b.write(fn, 0, fn.length)
      b.write((ts >> 24) & 0xFF); b.write((ts >> 16) & 0xFF)
      b.write((ts >> 8) & 0xFF); b.write(ts & 0xFF)
      b.toByteArray
    }
    def push(data: Array[Byte]): Array[Byte] =
      if (!started) { started = true; ps.push(header ++ data) } else ps.push(data)
    def finish(): Array[Byte] =
      if (!started) { started = true; ps.push(header); ps.finish() } else ps.finish()
  }

  /** 16 random prefix bytes (GnuPG's choice). */
  def randomPrefix(rand: java.security.SecureRandom): Array[Byte] = {
    val p = new Array[Byte](16); rand.nextBytes(p); p
  }

  /** Deterministic prefix derived from the (fresh, secret) session key.
    * The SEIPD prefix only needs uniqueness per key — a fresh random
    * session key per message makes a key-derived prefix sound, and it
    * buys a fully deterministic message for a given params row:
    * re-runs and re-partitionings produce byte-identical output
    * (GpgPipelineSpec pins this).
    */
  def derivedPrefix(sessionKey: Array[Byte]): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(sessionKey)
    md.update("graft-seipd-prefix".getBytes("UTF-8"))
    md.digest().take(16)
  }

  /** Streaming SEIPD (tag 18, v1) — §5.13: AES-CFB over
    * [prefix(16)+repeat(2) || plaintext || 0xD3 0x14 || SHA1(all prior)],
    * zero IV, with the trailing SHA-1 MDC.
    */
  final class SeipdStream(sessionKey: Array[Byte], prefix16: Array[Byte],
                          chunkLog2: Int = 13) {
    require(prefix16.length == 16, "prefix must be one AES block")
    private val bs = 16
    private val cipher = {
      val c = Cipher.getInstance("AES/CFB/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(sessionKey, "AES"),
        new IvParameterSpec(new Array[Byte](bs)))
      c
    }
    private val mdc = MessageDigest.getInstance("SHA-1")
    private val ps = new PacketStream(18, chunkLog2)
    private var started = false

    private def start(): Array[Byte] = {
      started = true
      val pre = new Array[Byte](bs + 2)
      System.arraycopy(prefix16, 0, pre, 0, bs)
      pre(bs) = pre(bs - 2); pre(bs + 1) = pre(bs - 1) // quick-check repeat
      mdc.update(pre)
      ps.push(Array(1.toByte) ++ cipher.update(pre)) // version byte, then ciphertext
    }

    def push(plain: Array[Byte]): Array[Byte] = {
      val head = if (!started) start() else Array.emptyByteArray
      if (plain.isEmpty) head
      else {
        mdc.update(plain)
        val ct = cipher.update(plain)
        if (ct == null || ct.isEmpty) head else head ++ ps.push(ct)
      }
    }

    def finish(): Array[Byte] = {
      val head = if (!started) start() else Array.emptyByteArray
      val mdcHdr = Array(0xD3.toByte, 0x14.toByte)
      mdc.update(mdcHdr)
      val tail = cipher.doFinal(mdcHdr ++ mdc.digest())
      head ++ ps.push(tail) ++ ps.finish()
    }
  }

  // ---- decrypt (round-trip proof) -------------------------------------------

  /** Decrypt an armored message produced by the pipeline (or by GnuPG
    * with compression off): PKESK → session key, SEIPD → MDC-verified
    * plaintext, literal packet → payload bytes.
    */
  def decrypt(priv: java.security.interfaces.RSAPrivateKey, armoredMessage: String): Array[Byte] = {
    val ps = packets(dearmor(armoredMessage))
    val pk = ps.find(_.tag == 1).getOrElse(sys.error("no PKESK packet"))
    require((pk.body(0) & 0xFF) == 3 && (pk.body(9) & 0xFF) == 1, "unsupported PKESK")
    val (mEnc, _) = readMpi(pk.body, 10)
    // left-pad the MPI to modulus size — PKCS1 decrypt needs full blocks
    val modBytes = (priv.getModulus.bitLength() + 7) / 8
    val raw = mEnc.toByteArray.dropWhile(_ == 0)
    val ct = new Array[Byte](modBytes)
    System.arraycopy(raw, 0, ct, modBytes - raw.length, raw.length)
    val c = Cipher.getInstance("RSA/ECB/PKCS1Padding")
    c.init(Cipher.DECRYPT_MODE, priv)
    val m = c.doFinal(ct)
    require((m(0) & 0xFF) == SymAlgoAes256, s"unexpected sym algo ${m(0)}")
    val sk = java.util.Arrays.copyOfRange(m, 1, m.length - 2)
    val ck = sk.foldLeft(0)((a, b) => (a + (b & 0xFF)) & 0xFFFF)
    require(ck == (((m(m.length - 2) & 0xFF) << 8) | (m(m.length - 1) & 0xFF)),
      "session key checksum mismatch")

    val se = ps.find(_.tag == 18).getOrElse(sys.error("no SEIPD packet"))
    require((se.body(0) & 0xFF) == 1, "unsupported SEIPD version")
    val d = Cipher.getInstance("AES/CFB/NoPadding")
    d.init(Cipher.DECRYPT_MODE, new SecretKeySpec(sk, "AES"),
      new IvParameterSpec(new Array[Byte](16)))
    val plain = d.doFinal(se.body, 1, se.body.length - 1)
    require(plain(14) == plain(16) && plain(15) == plain(17), "quick-check bytes mismatch")
    val mdcAt = plain.length - 22
    require((plain(mdcAt) & 0xFF) == 0xD3 && (plain(mdcAt + 1) & 0xFF) == 0x14, "no MDC trailer")
    val sha = MessageDigest.getInstance("SHA-1")
    sha.update(plain, 0, mdcAt + 2)
    require(java.util.Arrays.equals(sha.digest(),
      java.util.Arrays.copyOfRange(plain, mdcAt + 2, plain.length)), "MDC mismatch")

    val content = java.util.Arrays.copyOfRange(plain, 18, mdcAt)
    val lit = packets(content).find(_.tag == 11).getOrElse(sys.error("no literal packet"))
    val fnLen = lit.body(1) & 0xFF
    java.util.Arrays.copyOfRange(lit.body, 2 + fnLen + 4, lit.body.length)
  }

  def hexToBytes(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  def bytesToHex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
}
