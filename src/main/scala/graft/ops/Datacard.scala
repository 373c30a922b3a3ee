package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Per-source corpus datacard — the one-page report a dataset owner
  * publishes alongside a release (the "Datasheets for Datasets"
  * practice, Gebru et al. 2021 — public): volume, length distribution,
  * language mix, duplication, and a length-band quality pass rate, per
  * source, from ONE scan.
  *
  * Plan shape: a single documents scan projects (source, lang,
  * fingerprint, n_tokens, n_chars); every card column is then one
  * grouped aggregate over that projection — count, sum, distinct
  * fingerprints, conditional counts, and exact linear-interpolated
  * medians (`percentile` ≡ DuckDB `quantile_cont`, the g12 parity) —
  * so the whole report costs one corpus pass plus a |sources|-row
  * shuffle. Ratios are ppm integers (exact `div` of exact counts), the
  * cross-engine-stable encoding used across the engine.
  *
  * The count-distinct of 16-byte fingerprints is the one card column
  * with real shuffle weight at 100 TB (distinct is a shuffle); swap in
  * [[Sketches.hllDistinct]]'s register aggregate when a ±2% dup-rate
  * estimate is acceptable — the documented o7_profile trade.
  */
object Datacard {

  def datacard(spark: SparkSession, dir: String): DataFrame = {
    val base = Catalog(spark, dir).ref("documents")
      .select(col("source"), col("lang"),
        md5(col("text")).as("fp"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
    base.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens_total"),
        expr("percentile(n_chars, 0.5)").as("p50_chars"),
        expr("percentile(n_tokens, 0.95)").as("p95_tokens"),
        count_distinct(col("fp")).as("n_distinct"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(when(col("n_tokens").between(20, 10000), 1L).otherwise(0L)).as("n_len_pass"))
      .select(col("source"), col("n_docs"), col("n_tokens_total"),
        col("p50_chars"), col("p95_tokens"),
        expr("(n_docs - n_distinct) * 1000000 div n_docs").as("dup_ppm"),
        expr("n_en * 1000000 div n_docs").as("en_ppm"),
        expr("n_len_pass * 1000000 div n_docs").as("len_pass_ppm"))
      .orderBy("source")
  }

  val datacardSql: String =
    """WITH base AS (
      |  SELECT source, lang, md5(text) AS fp,
      |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |         CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents),
      |agg AS (
      |  SELECT source,
      |         count(*) AS n_docs,
      |         CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
      |         quantile_cont(n_chars, 0.5) AS p50_chars,
      |         quantile_cont(n_tokens, 0.95) AS p95_tokens,
      |         count(DISTINCT fp) AS n_distinct,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
      |         CAST(sum(CASE WHEN n_tokens BETWEEN 20 AND 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_len_pass
      |  FROM base GROUP BY source)
      |SELECT source, n_docs, n_tokens_total, p50_chars, p95_tokens,
      |       (n_docs - n_distinct) * 1000000 // n_docs AS dup_ppm,
      |       n_en * 1000000 // n_docs AS en_ppm,
      |       n_len_pass * 1000000 // n_docs AS len_pass_ppm
      |FROM agg ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_datacard" -> (datacard _))

  val oracles: Map[String, String] = Map(
    "text_datacard" -> datacardSql)
}
