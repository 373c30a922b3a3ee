package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.ArrayExprs

/** Training-data augmentation transforms — the write-side counterparts
  * to the sampling family in [[TextAnalysis]]:
  *
  *  - UPSAMPLING (epoch replication): temperature mixing has two
  *    halves. `mixtureSample` DOWN-samples over-represented groups;
  *    this operator UP-samples under-represented ones by emitting
  *    ⌈epochs⌉ copies per document (integer part + a hash-draw
  *    fractional epoch), the standard low-resource-language recipe.
  *  - FIM (fill-in-the-middle, Bavarian et al. 2022 — public): rewrite
  *    a deterministic subset of documents into
  *    `<PRE>prefix<SUF>suffix<MID>middle` order so an autoregressive
  *    model learns infilling. Split points are hash-derived from
  *    doc_id — no RNG state, reproducible epoch to epoch.
  *
  * Both are pure scan work over a broadcast rate table / literal
  * arithmetic: zero data shuffles before the presentation sort, so
  * they run at parquet-scan speed on any corpus size. All arithmetic
  * is integer or correctly-rounded IEEE (sqrt, division) identical in
  * Spark and DuckDB, so both oracle rows hash-match.
  */
object Augment {

  /** `text_mixture_upsample`: epochs_ppm = ⌊10⁶·√(n_max/n_lang)⌋ per
    * language (α = 0.5 temperature, the mixtureSample convention);
    * every doc emits ⌊ppm/10⁶⌋ copies plus one more iff its salted
    * md5 draw lands under the fractional part. The dominant language
    * gets exactly 1 copy; a 9× smaller one gets 3.
    */
  def mixtureUpsample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog(spark, dir).ref("documents").select(col("doc_id"), col("lang"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val nmax = counts.agg(max(col("n")).as("nmax"))
    val rates = counts.crossJoin(broadcast(nmax))
      .withColumn("ppm",
        floor(lit(1000000.0) * sqrt(col("nmax").cast("double"))
          / sqrt(col("n").cast("double"))).cast("long"))
      .select(col("lang"), col("ppm"))
    docs.join(broadcast(rates), Seq("lang"))
      .withColumn("n_copies",
        expr("ppm div 1000000") +
          when(ArrayExprs.md5Mod(
            concat(lit("up:"), col("doc_id").cast("string")), 1000000L)
            < col("ppm") % 1000000, 1L).otherwise(0L))
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
      .orderBy(col("doc_id"), col("copy_idx"))
  }

  val mixtureUpsampleSql: String =
    """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      |mx AS (SELECT max(n) AS nmax FROM counts),
      |rates AS (
      |  SELECT lang,
      |         CAST(floor(1000000.0 * sqrt(CAST(nmax AS DOUBLE))
      |                    / sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS ppm
      |  FROM counts, mx),
      |withc AS (
      |  SELECT d.doc_id, d.lang,
      |         (r.ppm // 1000000)
      |         + CASE WHEN md5_number_lower('up:' || CAST(d.doc_id AS VARCHAR)) % 1000000
      |                     < r.ppm % 1000000 THEN 1 ELSE 0 END AS n_copies
      |  FROM documents d JOIN rates r USING (lang))
      |SELECT w.doc_id, w.lang, u.i AS copy_idx
      |FROM withc w, LATERAL (SELECT unnest(range(1, w.n_copies + 1)) AS i) u
      |ORDER BY w.doc_id, copy_idx""".stripMargin

  /** `text_fim_transform`: half the corpus (salted hash draw) rewritten
    * to PSM order. Split points: 1 ≤ c1 < c2 ≤ L over codepoints, both
    * md5-derived; documents shorter than 3 codepoints are left out of
    * the draw entirely (no degenerate empty middles).
    */
  def fimTransform(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog(spark, dir).ref("documents").select(col("doc_id"), col("text"))
    docs
      .withColumn("len", length(col("text")))
      .filter(col("len") >= 3)
      .filter(ArrayExprs.md5Mod(
        concat(lit("fim:"), col("doc_id").cast("string")), 100L) < 50)
      .withColumn("c1",
        lit(1L) + ArrayExprs.md5Mod(
          concat(lit("fim1:"), col("doc_id").cast("string")), 1000003L)
          % (col("len") - 1))
      .withColumn("c2",
        col("c1") + lit(1L) + ArrayExprs.md5Mod(
          concat(lit("fim2:"), col("doc_id").cast("string")), 1000003L)
          % (col("len") - col("c1")))
      .select(col("doc_id"),
        concat(lit("<PRE>"), expr("substr(text, 1, CAST(c1 AS INT))"),
          lit("<SUF>"), expr("substr(text, CAST(c2 AS INT) + 1)"),
          lit("<MID>"), expr("substr(text, CAST(c1 AS INT) + 1, CAST(c2 - c1 AS INT))"))
          .as("fim_text"))
      .orderBy(col("doc_id"))
  }

  val fimTransformSql: String =
    """WITH base AS (
      |  SELECT doc_id, text, length(text) AS len
      |  FROM documents WHERE length(text) >= 3
      |    AND md5_number_lower('fim:' || CAST(doc_id AS VARCHAR)) % 100 < 50),
      |cuts AS (
      |  SELECT doc_id, text, len,
      |         1 + md5_number_lower('fim1:' || CAST(doc_id AS VARCHAR)) % 1000003 % (len - 1) AS c1
      |  FROM base),
      |cuts2 AS (
      |  SELECT doc_id, text, len, c1,
      |         c1 + 1 + md5_number_lower('fim2:' || CAST(doc_id AS VARCHAR)) % 1000003 % (len - c1) AS c2
      |  FROM cuts)
      |SELECT doc_id,
      |       '<PRE>' || substr(text, 1, CAST(c1 AS INT))
      |       || '<SUF>' || substr(text, CAST(c2 AS INT) + 1)
      |       || '<MID>' || substr(text, CAST(c1 AS INT) + 1, CAST(c2 - c1 AS INT)) AS fim_text
      |FROM cuts2 ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_mixture_upsample" -> (mixtureUpsample _),
    "text_fim_transform" -> (fimTransform _))

  val oracles: Map[String, String] = Map(
    "text_mixture_upsample" -> mixtureUpsampleSql,
    "text_fim_transform" -> fimTransformSql)
}
