package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.ArrayExprs.md5Mod

/** Web-corpus cleaning operators from the public training-data
  * literature: C4's line/document rules (Raffel et al. 2020, §2.2 of
  * "Exploring the Limits of Transfer Learning") and PII scrubbing with
  * per-type counts (the e-mail / IP / long-number masking pass every
  * public corpus pipeline — C4, The Pile, Dolma — runs before release).
  *
  * The synthetic `documents` corpus has no newlines, punctuation or
  * digits, so both operators run on a deterministically DERIVED fixture
  * (md5-draw planted lines / PII, the repo's adversarial-row pattern):
  * the derivation is replayed verbatim in the DuckDB twin, and the rule
  * application itself — the thing under test — is the honest regex /
  * line-filter logic a real corpus would hit.
  *
  * Scale shape: both are pure per-row scan work (higher-order functions
  * over the line array, regexp_replace chains) — zero shuffles, zero
  * corpus-sized state; at 100 TB they run at parquet-scan speed with
  * only (doc_id, text) read.
  */
object Cleaning {

  // ---- C4 line + document rules -------------------------------------------

  /** Lines are 8-token chunks of the document; the planted md5 draw
    * gives each line its C4-relevant features (terminal punctuation or
    * not, a "javascript" token, a "lorem ipsum" phrase, a stray "{").
    */
  private val LineTokens = 8

  private def lineHash(docId: Column, i: Column): Column =
    md5Mod(concat(lit("c4:"), docId.cast("string"), lit(":"), i.cast("string")), 100L)

  /** C4 cleaning rules (Raffel et al. 2020): keep only lines that end in
    * terminal punctuation, have ≥5 words, and don't mention javascript;
    * drop whole documents containing "lorem ipsum" or "{", or with fewer
    * than 3 surviving lines. Returns kept docs with line stats and the
    * cleaned text.
    */
  def c4Rules(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val withLines = c.ref("documents")
      .select(col("doc_id"), tokens(col("text")).as("words"))
      .withColumn("nl", greatest(lit(1L),
        expr(s"(size(words) + ${LineTokens - 1}) div $LineTokens")))
      .withColumn("lines", transform(sequence(lit(0L), col("nl") - 1), i => {
        val h = lineHash(col("doc_id"), i)
        concat(
          array_join(slice(col("words"), (i * LineTokens + 1).cast("int"), lit(LineTokens)), " "),
          when(h === 17, lit(" javascript"))
            .when(h === 23, lit(" lorem ipsum"))
            .when(h === 29, lit(" {")).otherwise(lit("")),
          when(h % 4 =!= 0, lit(".")).otherwise(lit("")))
      }))
      .withColumn("kept", filter(col("lines"), l =>
        l.rlike("[.!?\"]$") && size(split(l, " ")) >= 5 && !l.contains("javascript")))
    withLines
      .filter(!array_join(col("lines"), "\n").contains("lorem ipsum") &&
        !array_join(col("lines"), "\n").contains("{") &&
        size(col("kept")) >= 3)
      .select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), "\n").as("text_clean"))
      .orderBy("doc_id")
  }

  /** Integer `/` on longs is floor division in Spark; DuckDB `//`
    * matches. The line derivation below is the Spark fixture verbatim.
    */
  val c4RulesSql: String =
    """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
      |  FROM documents),
      |l AS (
      |  SELECT doc_id, list_transform(
      |    range(greatest(1, (len(words) + 7) // 8)), i ->
      |      array_to_string(words[i*8+1:i*8+8], ' ') ||
      |      CASE md5_number_lower('c4:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)) % 100
      |        WHEN 17 THEN ' javascript'
      |        WHEN 23 THEN ' lorem ipsum'
      |        WHEN 29 THEN ' {' ELSE '' END ||
      |      CASE WHEN (md5_number_lower('c4:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)) % 100) % 4 <> 0
      |        THEN '.' ELSE '' END) AS lines
      |  FROM w),
      |k AS (
      |  SELECT doc_id, lines,
      |         list_filter(lines, x ->
      |           regexp_matches(x, '[.!?"]$')
      |           AND len(string_split(x, ' ')) >= 5
      |           AND NOT contains(x, 'javascript')) AS kept
      |  FROM l)
      |SELECT doc_id,
      |       CAST(len(lines) AS BIGINT) AS n_lines,
      |       CAST(len(kept) AS BIGINT) AS n_kept,
      |       array_to_string(kept, chr(10)) AS text_clean
      |FROM k
      |WHERE NOT contains(array_to_string(lines, chr(10)), 'lorem ipsum')
      |  AND NOT contains(array_to_string(lines, chr(10)), '{')
      |  AND len(kept) >= 3
      |ORDER BY doc_id""".stripMargin

  // ---- PII scrubbing -------------------------------------------------------

  /** Patterns restricted to the Java-regex ∩ RE2 common subset (ASCII
    * `\d`, `\b`, bounded counted repetition — no backrefs, no
    * lookaround) so Spark and DuckDB match identical spans.
    */
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpPat = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  private val NumPat = "\\b\\d{8,}\\b"

  /** PII scrub with per-type counts: mask e-mails, IPv4 addresses and
    * ≥8-digit runs (account/card numbers) with typed placeholders.
    * Replacement order matters and is part of the contract: e-mails
    * first (their domains contain dots), then IPs, then bare digit runs
    * (IP octets are ≤3 digits so the passes can't double-count).
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    def draw(salt: String, m: Long): Column =
      md5Mod(concat(lit(salt + ":"), col("doc_id").cast("string")), m)
    val planted = c.ref("documents")
      .select(col("doc_id"), concat(col("text"),
        when(draw("pii_e", 3L) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(draw("pii_i", 4L) === 0,
          concat(lit(" host 10."), draw("pii_i2", 256L).cast("string"),
            lit(".0."), draw("pii_i3", 256L).cast("string"), lit(" up")))
          .otherwise(lit("")),
        when(draw("pii_n", 5L) === 0,
          concat(lit(" acct 4"),
            lpad(draw("pii_n2", 1000000000000L).cast("string"), 15, "0")))
          .otherwise(lit(""))).as("raw"))
    planted
      .select(col("doc_id"),
        regexp_count(col("raw"), lit(EmailPat)).cast("long").as("n_emails"),
        regexp_count(col("raw"), lit(IpPat)).cast("long").as("n_ips"),
        regexp_count(col("raw"), lit(NumPat)).cast("long").as("n_nums"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("raw"), EmailPat, "<EMAIL>"),
            IpPat, "<IP>"),
          NumPat, "<NUM>").as("scrubbed"))
      .orderBy("doc_id")
  }

  val piiScrubSql: String =
    """WITH planted AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN md5_number_lower('pii_e:' || CAST(doc_id AS VARCHAR)) % 3 = 0
      |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
      |    CASE WHEN md5_number_lower('pii_i:' || CAST(doc_id AS VARCHAR)) % 4 = 0
      |      THEN ' host 10.' || CAST(md5_number_lower('pii_i2:' || CAST(doc_id AS VARCHAR)) % 256 AS VARCHAR)
      |           || '.0.' || CAST(md5_number_lower('pii_i3:' || CAST(doc_id AS VARCHAR)) % 256 AS VARCHAR) || ' up'
      |      ELSE '' END ||
      |    CASE WHEN md5_number_lower('pii_n:' || CAST(doc_id AS VARCHAR)) % 5 = 0
      |      THEN ' acct 4' || lpad(CAST(md5_number_lower('pii_n2:' || CAST(doc_id AS VARCHAR)) % 1000000000000 AS VARCHAR), 15, '0')
      |      ELSE '' END AS raw
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |       CAST(len(regexp_extract_all(raw, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
      |       CAST(len(regexp_extract_all(raw, '\b\d{8,}\b')) AS BIGINT) AS n_nums,
      |       regexp_replace(
      |         regexp_replace(
      |           regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |           '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
      |         '\b\d{8,}\b', '<NUM>', 'g') AS scrubbed
      |FROM planted ORDER BY doc_id""".stripMargin

  // ---- Unicode normalization ----------------------------------------------

  /** Invisible characters every public pipeline strips before hashing:
    * C0 controls (except \t which the whitespace collapse owns and \n
    * which is document structure), DEL, soft hyphen, the zero-width /
    * directional-mark block, word joiner, and the BOM. An EXPLICIT
    * class — not `\p{Cf}`/`\p{Cc}` — so Java regex (Spark) and RE2
    * (DuckDB) match byte-identical spans regardless of property-table
    * skew between the engines. `\x{…}` escape syntax is the Java ∩ RE2
    * common subset.
    */
  private val InvisiblePat =
    "[\\x{0000}-\\x{0008}\\x{000B}-\\x{001F}\\x{007F}\\x{00AD}\\x{200B}-\\x{200F}\\x{2060}\\x{FEFF}]"

  /** Spaces/tabs collapse to one space (newlines survive — they are
    * line structure, not padding). `\\t` stays an ESCAPE in the pattern
    * string so the Spark and DuckDB pattern texts are identical.
    */
  private val SpaceRunPat = "[ \\t]+"

  /** Canonical text normalization — the pass that runs BEFORE any
    * hash-based operator (exact dedup, MinHash, fingerprints,
    * contamination n-grams), because without it composed U+00E9 and
    * decomposed `e`+U+0301 are different bytes and equal-looking
    * documents silently miss each other. Steps, in contract order:
    * NFC-compose ([[graft.functions.NfcNormalizeExpr]], ASCII fast
    * path) → strip invisibles ([[InvisiblePat]]) → collapse space runs
    * ([[SpaceRunPat]]) → trim.
    *
    * The synthetic corpus is pure ASCII, so the interesting cases ride
    * a planted md5-draw suffix (the repo's adversarial-fixture
    * pattern, replayed verbatim in the DuckDB twin): decomposed
    * accents that NFC must compose, ZWSP/BOM/soft-hyphen/control
    * bytes that stripping must remove, doubled spaces and tabs that
    * the collapse must fold; draw 3 plants nothing, pinning the
    * `changed = false` identity path.
    *
    * Scale shape: pure per-row scan work — one native expression plus
    * two codegen'd regexp_replaces, zero shuffles, zero state; at
    * 100 TB it runs at parquet-scan speed reading only (doc_id, text).
    */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val h = md5Mod(concat(lit("norm:"), col("doc_id").cast("string")), 4L)
    val planted = c.ref("documents")
      .select(col("doc_id"), concat(col("text"),
        when(h === 0, lit(" Cafe\u0301  resume\u0301"))
          .when(h === 1, lit(" na\u200Bive\uFEFF"))
          .when(h === 2, lit(" x\u0007y\tz\u00AD"))
          .otherwise(lit(""))).as("raw"))
    planted
      .withColumn("text_norm",
        trim(regexp_replace(
          regexp_replace(graft.functions.NfcNormalizeExpr(col("raw")), InvisiblePat, ""),
          SpaceRunPat, " ")))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("n_raw"),
        length(col("text_norm")).cast("long").as("n_norm"),
        (col("raw") =!= col("text_norm")).as("changed"),
        col("text_norm"))
      .orderBy("doc_id")
  }

  /** chr() code points = the Scala literals above: 769 = U+0301
    * combining acute, 8203 = U+200B ZWSP, 65279 = U+FEFF BOM, 7 = BEL,
    * 9 = TAB, 173 = U+00AD soft hyphen.
    */
  val normalizeTextSql: String =
    s"""WITH planted AS (
       |  SELECT doc_id, text ||
       |    CASE md5_number_lower('norm:' || CAST(doc_id AS VARCHAR)) % 4
       |      WHEN 0 THEN ' Cafe' || chr(769) || '  resume' || chr(769)
       |      WHEN 1 THEN ' na' || chr(8203) || 'ive' || chr(65279)
       |      WHEN 2 THEN ' x' || chr(7) || 'y' || chr(9) || 'z' || chr(173)
       |      ELSE '' END AS raw
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, raw,
       |    trim(regexp_replace(regexp_replace(nfc_normalize(raw),
       |      '$InvisiblePat', '', 'g'), '$SpaceRunPat', ' ', 'g')) AS text_norm
       |  FROM planted)
       |SELECT doc_id,
       |       CAST(length(raw) AS BIGINT) AS n_raw,
       |       CAST(length(text_norm) AS BIGINT) AS n_norm,
       |       raw <> text_norm AS changed,
       |       text_norm
       |FROM n ORDER BY doc_id""".stripMargin

  private def tokens(text: Column): Column = TextAnalysis.tokens(text)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_c4_rules" -> (c4Rules _),
    "text_pii_scrub" -> (piiScrub _),
    "text_normalize" -> (normalizeText _))

  val oracles: Map[String, String] = Map(
    "text_c4_rules" -> c4RulesSql,
    "text_pii_scrub" -> piiScrubSql,
    "text_normalize" -> normalizeTextSql)
}
