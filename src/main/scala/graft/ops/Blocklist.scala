package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.MultiMatch

/** Blocklist screening over the `documents` table — the curation step
  * that flags/filters documents containing any of a phrase blocklist
  * (benchmark contamination strings, disallowed phrases, PII trigger
  * phrases). One Aho–Corasick pass per document regardless of blocklist
  * size ([[graft.functions.MultiMatch]]); the automaton ships with the
  * plan, so the operator is pure scan work — zero shuffles, zero joins,
  * trivially linear at 100 TB where the per-pattern `contains` plan
  * would re-scan the corpus P times.
  *
  * Reference scope: the reference package has no text ops; this extends
  * the engine for LLM-training-data curation per the build brief
  * (screening family: contamination, PII scrub, blocklist).
  */
object Blocklist {

  /** The registered query's fixed demo blocklist: multi-word phrases
    * over the testdata vocabulary, a pattern ("agg") that is a strict
    * prefix of another ("agg table") to exercise the output links, and
    * an absent phrase that must never match.
    */
  val DemoPatterns: Seq[String] = Seq(
    "agg table", "table table", "fast join", "slow scan", "agg",
    "zzzz never")

  /** Per-document screen: how many distinct blocklist phrases occur,
    * where the earliest one starts (1-based codepoint position), and
    * which phrase it is ('' / 0 when clean).
    */
  def screenAt(spark: SparkSession, dir: String, patterns: Seq[String]): DataFrame =
    Catalog(spark, dir).ref("documents")
      .select(col("doc_id"),
        MultiMatch.multiMatch(col("text"), patterns).as("mm"))
      .select(col("doc_id"), col("mm.n_hit").as("n_hit"),
        col("mm.first_pos").as("first_pos"), col("mm.first_pat").as("first_pat"))
      .orderBy(col("doc_id"))

  def screen(spark: SparkSession, dir: String): DataFrame =
    screenAt(spark, dir, DemoPatterns)

  /** DuckDB twin: per-pattern `strpos` (codepoint-based, like the
    * expression's positions), distinct-presence count, earliest start
    * with ties to the lowest pattern index.
    */
  val screenSql: String = {
    val pats = DemoPatterns.zipWithIndex
      .map { case (p, i) => s"($i, '${p.replace("'", "''")}')" }
      .mkString(", ")
    s"""WITH pats(pid, pat) AS (VALUES $pats),
       |hits AS (
       |  SELECT d.doc_id, p.pid, p.pat, strpos(d.text, p.pat) AS pos
       |  FROM documents d CROSS JOIN pats p
       |  WHERE strpos(d.text, p.pat) > 0),
       |firsts AS (
       |  SELECT doc_id, pat, pos,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY pos, pid) AS rk,
       |         count(*) OVER (PARTITION BY doc_id) AS n_hit
       |  FROM hits)
       |SELECT d.doc_id,
       |       COALESCE(f.n_hit, 0) AS n_hit,
       |       COALESCE(f.pos, 0) AS first_pos,
       |       COALESCE(f.pat, '') AS first_pat
       |FROM documents d
       |LEFT JOIN (SELECT * FROM firsts WHERE rk = 1) f ON f.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_blocklist" -> (screen _))

  val oracles: Map[String, String] = Map(
    "text_blocklist" -> screenSql)
}
