package graft.push

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The encrypted-upload stages of the SFMC path
  * (`marketing_cloud_data_extension_upload.sql:86-104`): ordered,
  * whole-relation table functions applied `over (partition by null order
  * by row_number)` — U-G2..U-G5 in SURVEY §2.8.
  *
  * Spark mapping (W3): every per-row stage runs PARALLEL on whatever
  * partitioning the input has — JSON→CSV rendering (the CPU-heavy step)
  * broadcasts the header and maps rows in place, and the stub "encrypt"
  * is stateless per row. Only the real cipher pass funnels
  * (`repartition(1).sortWithinPartitions(rn)` + `mapPartitions`):
  * AES-CFB chaining makes one GPG message inherently serial — the
  * reference has the identical serialization point (`over (partition by
  * null order by rn)`). The scale path for huge pushes is
  * [[fileWrapEncryptPackageChunkedReal]]: shard the payload into
  * independent armored messages (parallelism ∝ chunks), not
  * parallelizing CFB.
  *
  * Crypto: REAL RFC 4880 OpenPGP ([[Pgp]] — PKESK + literal + SEIPD/MDC,
  * pure JDK, GnuPG-interop-tested) whenever the configured key is an
  * actual armored public key block. The deterministic XOR stand-in is
  * kept ONLY for non-key strings — it backs the DuckDB oracle query
  * (`push_gpg_message`), which must be re-derivable in SQL; AES-CFB is
  * not. The reference's own integration tests mock all four GPG external
  * functions with canned payloads (`integration_tests/dbt_project.yml`),
  * so the stub matches reference-test fidelity while the real path
  * exceeds it.
  */
object GpgPipeline {

  /** U-G1 `GPG_PARAMS(public_key)` — 1-row params table. Real keys get a
    * fresh random AES-256 session key, the encryption subkey's key id,
    * and the PKESK header as gpg_prefix (the reference's exact field
    * set); non-key strings fall back to deterministic pseudo-params for
    * the oracle path.
    */
  final case class GpgParams(gpgPrefix: String, keyId: String, sessionKey: String, publicKey: String) {
    /** True when [[publicKey]] is a real armored key → real crypto path. */
    def isReal: Boolean = publicKey.contains("BEGIN PGP PUBLIC KEY")
    /** sessionKey is live key material on the real path: never show()/log
      * /persist a params row. toString redacts it so accidental logging
      * (or Spark task-failure messages capturing the closure) cannot
      * leak the key.
      */
    override def toString: String =
      s"GpgParams($gpgPrefix,$keyId,<redacted>,${publicKey.take(24)}...)"
  }

  def gpgParams(publicKey: String): GpgParams =
    if (publicKey.contains("BEGIN PGP PUBLIC KEY")) {
      val pub = Pgp.parsePublicKey(publicKey)
      val sk = new Array[Byte](32)
      new java.security.SecureRandom().nextBytes(sk)
      GpgParams(gpgPrefix = Pgp.pkeskHeaderHex(pub), keyId = pub.keyIdHex,
        sessionKey = Pgp.bytesToHex(sk), publicKey = publicKey)
    } else {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(publicKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
      GpgParams(gpgPrefix = "85010c03", keyId = h.take(16), sessionKey = h.takeRight(16),
        publicKey = publicKey)
    }

  /** U-G2 `JSON_TO_CSV(rn, record)` — per-row JSON object → CSV line;
    * rn 0 carries the header row derived from the rn-1 record's keys.
    * Real implementation (no stub): key order is first-seen field order.
    *
    * Parallel: the header is a one-row driver lookup broadcast to every
    * task; each line then renders independently on whatever partition it
    * lives on — no funnel, no sort. (The old single-partition pass made
    * JSON parsing, the CPU-heavy step of the encrypted path, serial.)
    */
  def jsonToCsv(spark: SparkSession, numbered: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("rn", LongType, nullable = false),
      StructField("csv_line", StringType)))
    val esc: String => String = s =>
      if (s.contains(",") || s.contains("\"") || s.contains("\n"))
        "\"" + s.replace("\"", "\"\"") + "\"" else s
    // min-rn row, NOT filter(rn === 1): a filtered subset or 0-based
    // numbering must still yield a header (TakeOrdered — one bounded job)
    val firstRec = numbered.orderBy(col("rn")).select(col("record")).head(1)
    if (firstRec.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val header: Seq[String] = {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(firstRec(0).getString(0))
      val b = Seq.newBuilder[String]
      val fit = node.fieldNames(); while (fit.hasNext) b += fit.next()
      b.result()
    }
    val headerB = spark.sparkContext.broadcast(header)
    val body = numbered.select(col("rn"), col("record"))
      .queryExecution.toRdd.mapPartitions { it =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val hdr = headerB.value
        it.map { ir =>
          val node = mapper.readTree(ir.getUTF8String(1).toString)
          val line = hdr.map { f =>
            val v = node.get(f); if (v == null || v.isNull) "" else esc(v.asText())
          }.mkString(",")
          Row(ir.getLong(0), line)
        }
      }
    val headerRow = spark.sparkContext.parallelize(
      Seq(Row(0L, header.map(esc).mkString(","))), 1)
    spark.createDataFrame(headerRow.union(body), schema)
  }

  /** U-G3..U-G5 — ordered stateful stages over one partition, the
    * reference's windowed UDTF chain (`:95-99`). Dispatches on the key:
    * a real armored public key runs real OpenPGP
    * ([[fileWrapEncryptPackageReal]]); anything else runs the
    * deterministic XOR stand-in that backs the DuckDB oracle.
    */
  def fileWrapEncryptPackage(spark: SparkSession, csv: DataFrame, params: GpgParams): DataFrame =
    if (params.isReal) fileWrapEncryptPackageReal(spark, csv, params)
    else fileWrapEncryptPackageStub(spark, csv, params)

  /** Real RFC 4880 pipeline: CSV rows stream through a literal-data
    * packet (GPG_FILE_WRAPPER), AES-256-CFB SEIPD with MDC
    * (GPG_ENCRYPT), and PKESK + armor framing (GPG_PACKAGE_MESSAGE) —
    * one ordered pass, O(8 KiB) state, emitting armor lines as rows.
    * Joining message_part in rn order with newlines yields a `.asc`
    * file GnuPG decrypts (GpgRoundTripSpec proves both directions).
    */
  def fileWrapEncryptPackageReal(spark: SparkSession, csv: DataFrame, params: GpgParams): DataFrame = {
    val schema = StructType(Seq(
      StructField("rn", LongType, nullable = false),
      StructField("message_part", StringType)))
    val pubKeyText = params.publicKey
    val skHex = params.sessionKey
    val rows = csv.repartition(1).sortWithinPartitions("rn")
      .queryExecution.toRdd.mapPartitions { it =>
        val pub = Pgp.parsePublicKey(pubKeyText)
        val sk = Pgp.hexToBytes(skHex)
        val lit = new Pgp.LiteralStream("file")
        val seipd = new Pgp.SeipdStream(sk, Pgp.derivedPrefix(sk))
        val armor = new Pgp.ArmorStream()
        var rn = -1L
        def emit(lines: Seq[String]): Seq[Row] = lines.map { l => rn += 1; Row(rn, l) }
        val head = emit(armor.begin ++ armor.push(Pgp.pkesk(pub, sk)))
        val body = it.flatMap { ir =>
          val line = (ir.getUTF8String(1).toString + "\n").getBytes("UTF-8")
          emit(armor.push(seipd.push(lit.push(line))))
        }
        val tail = () => emit(armor.push(seipd.push(lit.finish()) ++ seipd.finish()) ++ armor.finish())
        head.iterator ++ body ++ new Iterator[Row] {
          private var rest: Iterator[Row] = null
          def hasNext: Boolean = { if (rest == null) rest = tail().iterator; rest.hasNext }
          def next(): Row = { hasNext; rest.next() }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** The SCALE path for encrypted pushes: shard the CSV stream into
    * `rowsPerChunk`-row chunks in rn order and emit ONE INDEPENDENT
    * OpenPGP MESSAGE PER CHUNK — each with its own random session key,
    * PKESK, SEIPD, and armor, each decryptable by GnuPG on its own.
    * Decrypting the messages in chunk order and concatenating the
    * plaintexts reproduces the single-message file byte-for-byte
    * (header row rn 0 lives in chunk 0; GpgRoundTripSpec proves it).
    *
    * Why: one RFC 4880 SEIPD message is a CFB chain — inherently serial,
    * one core per message no matter the cluster ([[
    * fileWrapEncryptPackageReal]] is that reference-faithful shape, one
    * file per push). Chunking regains parallelism ∝ |chunks|: each chunk
    * encrypts on whatever executor holds it after a hash shuffle on the
    * chunk id, O(chunk) memory. This also matches the SFMC upload's own
    * batching upstream (the /100 row batches), which already concedes
    * the push is shardable. Pick `rowsPerChunk` so a chunk is a few MB.
    *
    * Output: (chunk, rn, message_part) — rn orders lines *within* a
    * chunk; (chunk, rn) orders the whole relation.
    */
  def fileWrapEncryptPackageChunkedReal(spark: SparkSession, csv: DataFrame,
      publicKey: String, rowsPerChunk: Long): DataFrame = {
    require(rowsPerChunk > 0, s"rowsPerChunk must be positive, got $rowsPerChunk")
    val schema = StructType(Seq(
      StructField("chunk", LongType, nullable = false),
      StructField("rn", LongType, nullable = false),
      StructField("message_part", StringType)))
    val withChunk = csv.select(
      expr(s"rn div ${rowsPerChunk}L").as("chunk"), col("rn"), col("csv_line"))
    val rows = withChunk.repartition(col("chunk"))
      .sortWithinPartitions("chunk", "rn")
      .queryExecution.toRdd.mapPartitions { it =>
        val pub = Pgp.parsePublicKey(publicKey)
        val rnd = new java.security.SecureRandom()
        val rowsIt = it.map(ir => (ir.getLong(0), ir.getUTF8String(2).toString)).buffered
        new Iterator[Seq[Row]] {
          def hasNext: Boolean = rowsIt.hasNext
          def next(): Seq[Row] = {
            val chunk = rowsIt.head._1
            val sk = new Array[Byte](32); rnd.nextBytes(sk)
            val lit = new Pgp.LiteralStream("file")
            val seipd = new Pgp.SeipdStream(sk, Pgp.derivedPrefix(sk))
            val armor = new Pgp.ArmorStream()
            val out = Seq.newBuilder[String]
            out ++= armor.begin
            out ++= armor.push(Pgp.pkesk(pub, sk))
            while (rowsIt.hasNext && rowsIt.head._1 == chunk)
              out ++= armor.push(seipd.push(lit.push(
                (rowsIt.next()._2 + "\n").getBytes("UTF-8"))))
            out ++= armor.push(seipd.push(lit.finish()) ++ seipd.finish())
            out ++= armor.finish()
            out.result().zipWithIndex.map { case (l, i) => Row(chunk, i.toLong, l) }
          }
        }.flatten
      }
    spark.createDataFrame(rows, schema)
  }

  /** STUB crypto (oracle path only): "wrap" prefixes a literal-data
    * header, "encrypt" is base64 of the session-key XOR (deterministic,
    * NOT cryptography), "package" frames the stream with begin/end armor
    * rows. Dataflow and ordering match the real path.
    *
    * Parallel: the per-row XOR is stateless, so body rows render on
    * whatever partition they live on, keyed by their csv rn (+1 — the
    * armor BEGIN row takes 0; requires the dense 0..N numbering
    * [[jsonToCsv]] produces). Byte-identical to the old serial pass at
    * any input partitioning (GpgPipelineSpec pins this).
    */
  def fileWrapEncryptPackageStub(spark: SparkSession, csv: DataFrame, params: GpgParams): DataFrame = {
    val schema = StructType(Seq(
      StructField("rn", LongType, nullable = false),
      StructField("message_part", StringType)))
    val key = params.sessionKey.getBytes("UTF-8")
    val prefix = params.gpgPrefix
    val keyId = params.keyId
    val body = csv.select(col("rn"), col("csv_line"))
      .queryExecution.toRdd.mapPartitions { it =>
        val enc = java.util.Base64.getEncoder
        it.map { ir =>
          val line = ir.getUTF8String(1).toString
          // STUB "encryption": XOR with session key bytes, base64 — NOT secure,
          // placeholder for an OpenPGP SEIP packet stream.
          val xored = line.getBytes("UTF-8").zipWithIndex
            .map { case (b, j) => (b ^ key(j % key.length)).toByte }
          Row(ir.getLong(0) + 1L, enc.encodeToString(xored))
        }
      }
    val frame = spark.sparkContext.parallelize(Seq(
      Row(0L, s"-----BEGIN PGP MESSAGE-----|$prefix|$keyId"),
      Row(Long.MaxValue, "-----END PGP MESSAGE-----")), 1)
    spark.createDataFrame(frame.union(body), schema)
  }
}
