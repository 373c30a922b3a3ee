package graft.push

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The encrypted-upload stages of the SFMC path
  * (`marketing_cloud_data_extension_upload.sql:86-104`): ordered,
  * whole-relation table functions applied `over (partition by null order
  * by row_number)` — U-G2..U-G5 in SURVEY §2.8.
  *
  * Spark mapping (W3): `repartition(1).sortWithinPartitions(rn)` +
  * `mapPartitions` — a stateful, order-sensitive transform. The single
  * partition is inherent to the semantics (one GPG message stream); the
  * reference has the identical serialization point. Upstream batching
  * stays parallel; only the final file assembly funnels.
  *
  * Crypto STUB: real OpenPGP (session keys, packet framing) needs a crypto
  * lib not present in this container. `FakeGpg` below is a deterministic
  * stand-in (clearly marked) with the same dataflow: params row → ordered
  * file wrap → ordered "encrypt" → ordered message packaging. The
  * Spark-side plumbing (ordering, single-stream statefulness, schema) is
  * real and tested (GpgPipelineSpec).
  */
object GpgPipeline {

  /** U-G1 `GPG_PARAMS(public_key)` — 1-row params table. STUB: derives
    * deterministic pseudo-params from the key text instead of real RNG.
    */
  final case class GpgParams(gpgPrefix: String, keyId: String, sessionKey: String, publicKey: String)

  def gpgParams(publicKey: String): GpgParams = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(publicKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
    GpgParams(gpgPrefix = "85010c03", keyId = h.take(16), sessionKey = h.takeRight(16),
      publicKey = publicKey)
  }

  /** U-G2 `JSON_TO_CSV(rn, record)` — per-row JSON object → CSV line;
    * rn 1 also emits the header row derived from the first record's keys.
    * Real implementation (no stub): key order is first-seen field order.
    */
  def jsonToCsv(spark: SparkSession, numbered: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("rn", LongType, nullable = false),
      StructField("csv_line", StringType)))
    val rows = numbered.select(col("rn"), col("record"))
      .repartition(1).sortWithinPartitions("rn")
      .queryExecution.toRdd.mapPartitions { it =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        var header: Seq[String] = null
        it.flatMap { ir =>
          val rn = ir.getLong(0)
          val rec = ir.getUTF8String(1).toString
          val node = mapper.readTree(rec)
          val names = {
            val b = Seq.newBuilder[String]
            val fit = node.fieldNames(); while (fit.hasNext) b += fit.next()
            b.result()
          }
          if (header == null) header = names
          def esc(s: String): String =
            if (s.contains(",") || s.contains("\"") || s.contains("\n"))
              "\"" + s.replace("\"", "\"\"") + "\"" else s
          val line = header.map { f =>
            val v = node.get(f); if (v == null || v.isNull) "" else esc(v.asText())
          }.mkString(",")
          val out = if (rn == 1L) Seq((0L, header.map(esc).mkString(",")), (rn, line))
          else Seq((rn, line))
          out.map { case (n, l) => Row(n, l) }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** U-G3..U-G5 — ordered stateful stages over one partition. STUB crypto:
    * "wrap" prefixes a literal-data header, "encrypt" is base64 of the
    * session-key XOR (deterministic, NOT cryptography), "package" frames
    * the stream with begin/end armor rows. Dataflow and ordering match the
    * reference's windowed UDTF chain (`:95-99`).
    */
  def fileWrapEncryptPackage(spark: SparkSession, csv: DataFrame, params: GpgParams): DataFrame = {
    val schema = StructType(Seq(
      StructField("rn", LongType, nullable = false),
      StructField("message_part", StringType)))
    val key = params.sessionKey.getBytes("UTF-8")
    val prefix = params.gpgPrefix
    val keyId = params.keyId
    val rows = csv.repartition(1).sortWithinPartitions("rn")
      .queryExecution.toRdd.mapPartitions { it =>
        val enc = java.util.Base64.getEncoder
        var i = -1L
        val body = it.map { ir =>
          i += 1
          val line = ir.getUTF8String(1).toString
          // STUB "encryption": XOR with session key bytes, base64 — NOT secure,
          // placeholder for an OpenPGP SEIP packet stream.
          val xored = line.getBytes("UTF-8").zipWithIndex
            .map { case (b, j) => (b ^ key(j % key.length)).toByte }
          Row(i + 1, enc.encodeToString(xored))
        }
        Iterator(Row(0L, s"-----BEGIN PGP MESSAGE-----|$prefix|$keyId")) ++ body ++
          Iterator(Row(Long.MaxValue, "-----END PGP MESSAGE-----"))
      }
    spark.createDataFrame(rows, schema)
  }
}
