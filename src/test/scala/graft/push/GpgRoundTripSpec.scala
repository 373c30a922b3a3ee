package graft.push

import graft.SparkTestBase
import scala.sys.process._

/** Round-trip proof for the real RFC 4880 path (U-G1..U-G5):
  *
  *  1. JDK-only: generate an RSA keypair, armor the public half via
  *     [[Pgp.armorPublicKey]], run the full Spark pipeline
  *     (jsonToCsv → fileWrapEncryptPackage), decrypt with
  *     [[Pgp.decrypt]] — payload must come back byte-identical.
  *  2. GnuPG interop: generate a key with the system `gpg`, export its
  *     armored public key, encrypt with OUR code, decrypt with `gpg`.
  *     This pins the packet grammar to the ecosystem implementation,
  *     not to our own parser.
  */
class GpgRoundTripSpec extends SparkTestBase {
  import spark.implicits._

  private def numbered = Seq(
    (1L, """{"Name":"Alice","City":"Wonder, Land"}"""),
    (2L, """{"Name":"Bo\"b","City":"X"}"""),
    (3L, """{"Name":"Cara","City":"Y"}""")
  ).toDF("rn", "record")

  private val expectedCsv =
    "Name,City\nAlice,\"Wonder, Land\"\n\"Bo\"\"b\",X\nCara,Y\n"

  private def runPipeline(pubArmored: String): (GpgPipeline.GpgParams, String) = {
    val params = GpgPipeline.gpgParams(pubArmored)
    assert(params.isReal, "armored key must select the real crypto path")
    val asc = GpgPipeline.fileWrapEncryptPackage(
        spark, GpgPipeline.jsonToCsv(spark, numbered), params)
      .orderBy("rn").as[(Long, String)].collect().map(_._2).mkString("\n") + "\n"
    (params, asc)
  }

  test("JDK keypair: pipeline encrypts, Pgp.decrypt round-trips byte-identically") {
    val kpg = java.security.KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    val kp = kpg.generateKeyPair()
    val pubArmored = Pgp.armorPublicKey(
      kp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey])
    val (params, asc) = runPipeline(pubArmored)
    assert(asc.startsWith("-----BEGIN PGP MESSAGE-----"))
    assert(params.keyId.length === 16 && params.sessionKey.length === 64)
    val plain = Pgp.decrypt(
      kp.getPrivate.asInstanceOf[java.security.interfaces.RSAPrivateKey], asc)
    assert(new String(plain, "UTF-8") === expectedCsv)
  }

  test("real params are per-run random session keys, stable key id") {
    val kpg = java.security.KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    val pubArmored = Pgp.armorPublicKey(
      kpg.generateKeyPair().getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey])
    val a = GpgPipeline.gpgParams(pubArmored)
    val b = GpgPipeline.gpgParams(pubArmored)
    assert(a.keyId === b.keyId) // key id is a key property
    assert(a.sessionKey !== b.sessionKey) // session keys must never repeat
    assert(a.gpgPrefix === "85010c03") // 2048-bit RSA PKESK header, ref's exact value
  }

  test("chunked path: independent messages, concatenated decrypts equal the single file") {
    val kpg = java.security.KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    val kp = kpg.generateKeyPair()
    val pubArmored = Pgp.armorPublicKey(
      kp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey])
    val priv = kp.getPrivate.asInstanceOf[java.security.interfaces.RSAPrivateKey]
    val csv = GpgPipeline.jsonToCsv(spark, numbered) // rn 0..3
    val out = GpgPipeline.fileWrapEncryptPackageChunkedReal(spark, csv, pubArmored, rowsPerChunk = 2)
      .orderBy("chunk", "rn").as[(Long, Long, String)].collect()
    val chunks = out.groupBy(_._1).toSeq.sortBy(_._1)
    assert(chunks.map(_._1) === Seq(0L, 1L)) // rn 0,1 | rn 2,3
    val plains = chunks.map { case (_, rows) =>
      val asc = rows.sortBy(_._2).map(_._3).mkString("\n") + "\n"
      assert(asc.startsWith("-----BEGIN PGP MESSAGE-----"))
      new String(Pgp.decrypt(priv, asc), "UTF-8") // each chunk decrypts ALONE
    }
    assert(plains.mkString === expectedCsv)
    // chunk plaintexts are proper shards: header rides in chunk 0 only
    assert(plains.head.startsWith("Name,City\n"))
    assert(!plains(1).contains("Name,City"))
  }

  test("GnuPG interop: gpg-generated key, our encrypt, gpg decrypt") {
    if (Seq("sh", "-c", "command -v gpg").! != 0) cancel("gpg binary not available")
    val home = tmpDir("gpghome")
    new java.io.File(home).setReadable(false, false)
    Seq("chmod", "700", home).!
    val batch = s"$home/keyspec"
    java.nio.file.Files.write(java.nio.file.Paths.get(batch),
      """%no-protection
        |Key-Type: RSA
        |Key-Length: 2048
        |Key-Usage: sign
        |Subkey-Type: RSA
        |Subkey-Length: 2048
        |Subkey-Usage: encrypt
        |Name-Real: Graft Test
        |Name-Email: graft@test.invalid
        |Expire-Date: 0
        |%commit
        |""".stripMargin.getBytes("UTF-8"))
    val gpgBase = Seq("gpg", "--homedir", home, "--batch", "--yes")
    assert((gpgBase ++ Seq("--gen-key", batch)).! === 0, "gpg key generation failed")
    val pubArmored = (gpgBase ++ Seq("--armor", "--export", "graft@test.invalid")).!!
    assert(pubArmored.contains("BEGIN PGP PUBLIC KEY BLOCK"))

    val (params, asc) = runPipeline(pubArmored)
    // our key id must be the encryption SUBKEY gpg generated
    val colons = (gpgBase ++ Seq("--list-keys", "--with-colons")).!!
    val subFprs = colons.linesIterator.toSeq
      .dropWhile(!_.startsWith("sub:")).filter(_.startsWith("fpr:")).map(_.split(":")(9))
    assert(subFprs.exists(_.toLowerCase.endsWith(params.keyId)),
      s"PKESK key id ${params.keyId} is not gpg's encryption subkey")

    val ascPath = s"$home/msg.asc"
    java.nio.file.Files.write(java.nio.file.Paths.get(ascPath), asc.getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    val rc = ((gpgBase ++ Seq("--decrypt", ascPath)) #> out).!
    assert(rc === 0, s"gpg --decrypt failed (rc=$rc)")
    assert(new String(out.toByteArray, "UTF-8") === expectedCsv)
  }
}
