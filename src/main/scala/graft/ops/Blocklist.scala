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

  // ---- scrub (mask in place) ------------------------------------------------

  val Mask = "[MASKED]"

  /** Per-document scrub: every blocklist phrase masked in one
    * Aho–Corasick pass with leftmost-longest selection
    * ([[graft.functions.MultiReplace]]). Only changed documents are
    * returned — the delta a scrub materialization would write back.
    */
  def scrubAt(spark: SparkSession, dir: String, patterns: Seq[String]): DataFrame =
    Catalog(spark, dir).ref("documents")
      .select(col("doc_id"),
        graft.functions.MultiReplace.multiReplace(col("text"), patterns, Mask).as("mr"))
      .select(col("doc_id"), col("mr.text_scrubbed").as("text_scrubbed"),
        col("mr.n_masked").as("n_masked"))
      .filter(col("n_masked") > 0)
      .orderBy(col("doc_id"))

  def scrub(spark: SparkSession, dir: String): DataFrame =
    scrubAt(spark, dir, DemoPatterns)

  /** DuckDB twin: the length-desc literal alternation under
    * `regexp_replace(…, 'g')` IS leftmost-longest non-overlapping
    * masking (see MultiReplace scaladoc), so the oracle is one regex
    * call — and doubles as an independent proof that the automaton
    * matches regex semantics on the whole corpus.
    */
  val scrubSql: String = {
    val re = graft.functions.MultiReplace.alternationRegex(DemoPatterns)
      .replace("'", "''")
    s"""SELECT doc_id,
       |       regexp_replace(text, '$re', '$Mask', 'g') AS text_scrubbed,
       |       len(regexp_extract_all(text, '$re')) AS n_masked
       |FROM documents
       |WHERE len(regexp_extract_all(text, '$re')) > 0
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_blocklist" -> (screen _),
    "text_blocklist_scrub" -> (scrub _))

  val oracles: Map[String, String] = Map(
    "text_blocklist" -> screenSql,
    "text_blocklist_scrub" -> scrubSql)
}
