package graft.push

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GpgPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def numbered = Seq(
    (1L, """{"Name":"Alice","City":"Wonder, Land"}"""),
    (2L, """{"Name":"Bo\"b","City":"X"}"""),
    (3L, """{"Name":"Cara","City":"Y"}""")
  ).toDF("rn", "record")

  test("jsonToCsv emits a header at rn 0 and escaped lines in order (U-G2)") {
    val out = GpgPipeline.jsonToCsv(spark, numbered).orderBy("rn").as[(Long, String)].collect()
    assert(out(0) === (0L, "Name,City"))
    assert(out(1) === (1L, "Alice,\"Wonder, Land\""))
    assert(out(2) === (2L, "\"Bo\"\"b\",X"))
    assert(out(3) === (3L, "Cara,Y"))
  }

  test("fileWrapEncryptPackage frames the ordered stream (U-G3..G5, STUB crypto)") {
    val params = GpgPipeline.gpgParams("FAKE PUBLIC KEY")
    val csv = GpgPipeline.jsonToCsv(spark, numbered)
    val out = GpgPipeline.fileWrapEncryptPackage(spark, csv, params)
      .orderBy("rn").as[(Long, String)].collect()
    assert(out.head._2.startsWith("-----BEGIN PGP MESSAGE-----"))
    assert(out.last._2 === "-----END PGP MESSAGE-----")
    assert(out.length === 4 + 2) // header + 3 lines + begin/end
    // deterministic: same inputs -> same packets
    val again = GpgPipeline.fileWrapEncryptPackage(spark, GpgPipeline.jsonToCsv(spark, numbered), params)
      .orderBy("rn").as[(Long, String)].collect()
    assert(out.toSeq === again.toSeq)
  }

  test("gpgParams derives stable pseudo-params from the key text (U-G1 STUB)") {
    val a = GpgPipeline.gpgParams("KEY A")
    assert(a === GpgPipeline.gpgParams("KEY A"))
    assert(a.keyId !== GpgPipeline.gpgParams("KEY B").keyId)
  }
}
