package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents` table: token counting, quality scoring, language ID,
  * document fingerprinting.
  *
  * All are narrow per-row transformations — no shuffle, fully
  * codegen-friendly (`functions._` only, no UDFs), so at 100 TB they run
  * at parquet-scan speed with column pruning (only `doc_id`/`text` read).
  */
object TextAnalysis {

  /** Whitespace tokenization shared by all text ops. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  // ---- token counting -----------------------------------------------------
  /** Whitespace token count + a BPE-ish subword estimate (word-piece regex:
    * runs of letters, digits, or single punctuation — a public
    * approximation of byte-pair tokenizer granularity, ~chars/4 heuristic
    * cross-checked by the regex count).
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.ref("documents")
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"),
        size(split(col("text"), "[a-z]+[0-9]*|[0-9]+|[^a-z0-9\\s]")).cast("long").minus(1).as("n_bpe_pieces_est"),
        (length(col("text")).cast("double") / 4.0).as("n_tokens_char_est"))
      .orderBy("doc_id")
  }

  val tokenCountsSql: String =
    """SELECT doc_id,
      |       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
      |       CAST(len(regexp_split_to_array(text, '[a-z]+[0-9]*|[0-9]+|[^a-z0-9\s]')) AS BIGINT) - 1 AS n_bpe_pieces_est,
      |       CAST(length(text) AS DOUBLE) / 4.0 AS n_tokens_char_est
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- real BPE token counting ----------------------------------------------
  /** Per-document REAL BPE token budget ([[graft.functions.Bpe]]): the
    * whitespace count beside the deterministic character-level BPE count
    * over lowercased tokens. This is the column the packing/quota/mixture
    * budgets accept via their tokenCount parameter — the r7 "BPE-ish
    * regex estimate" ([[tokenCounts]]) stays for comparison.
    *
    * Scale: scan-shaped, zero shuffles before the presentation sort; the
    * expression memoizes repeated words thread-locally.
    */
  def tokenCountsBpe(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.ref("documents")
      .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        graft.functions.BpeCountSum.bpeCountSum(col("toks")).as("n_tokens_bpe"))
      .orderBy("doc_id")
  }

  /** The twin applies the IDENTICAL fixed merge table with a recursive
    * CTE over the DISTINCT word set (each step: lowest-rank adjacent
    * pair present, merged at every non-overlapping occurrence via a
    * left fold), then joins counts back to documents. chr(2) separates
    * the pair key, chr(1) the fold's token list — neither occurs in the
    * corpus tokens.
    */
  /** Shared CTE block: distinct-word BPE application (st walks the merge
    * loop; wc is the terminal word → count relation). Spliced into both
    * BPE twins so they can never disagree on the tokenizer.
    */
  private def bpeWordCountCtesWith(pairRank: String, rankPair: String,
      extraFrom: String): String =
    s"""tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |        FROM documents),
       |words AS (SELECT DISTINCT word FROM tok WHERE word <> ''),
       |st(word, toks, n) AS (
       |  SELECT word, list_transform(range(1, len(word)+1), i -> word[i:i]), 0
       |  FROM words
       |  UNION ALL
       |  SELECT word,
       |    string_split(
       |      list_reduce(toks, (acc, t) ->
       |        CASE WHEN string_split(acc, chr(1))[-1] = string_split(lr, chr(2))[1]
       |              AND t = string_split(lr, chr(2))[2]
       |        THEN acc[1:len(acc) - len(string_split(lr, chr(2))[1])]
       |             || string_split(lr, chr(2))[1] || string_split(lr, chr(2))[2]
       |        ELSE acc || chr(1) || t END),
       |      chr(1)),
       |    n + 1
       |  FROM (
       |    SELECT word, toks, n,
       |      ($rankPair[
       |        list_min(list_filter(
       |          list_transform(
       |            list_transform(range(1, len(toks)), i -> toks[i] || chr(2) || toks[i+1]),
       |            p -> ($pairRank[p])[1]),
       |          x -> x IS NOT NULL))])[1] AS lr
       |    FROM st$extraFrom) s
       |  WHERE lr IS NOT NULL),
       |wc AS (
       |  SELECT word, len(toks) AS n_bpe FROM st
       |  QUALIFY row_number() OVER (PARTITION BY word ORDER BY n DESC) = 1)""".stripMargin

  private val bpeWordCountCtes: String = {
    val ms = graft.functions.Bpe.merges
    val pairRank = ms.zipWithIndex
      .map { case ((l, r), i) => s"'$l' || chr(2) || '$r': ${i + 1}" }
      .mkString("MAP {", ", ", "}")
    val rankPair = ms.zipWithIndex
      .map { case ((l, r), i) => s"${i + 1}: '$l' || chr(2) || '$r'" }
      .mkString("MAP {", ", ", "}")
    bpeWordCountCtesWith(pairRank, rankPair, "")
  }

  // NOTE: concatenation, not interpolation-into-stripMargin — the CTE
  // block contains lines whose first non-blank char is `|` (the `||`
  // operator), which a second stripMargin would eat.
  val tokenCountsBpeSql: String =
    "WITH RECURSIVE\n" + bpeWordCountCtes + "\n" +
      """SELECT t.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(coalesce(wc.n_bpe, 0)) AS BIGINT) AS n_tokens_bpe
        |FROM tok t LEFT JOIN wc USING (word)
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // ---- quality scoring ------------------------------------------------------
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Heuristic document quality: length, punctuation density, stopword
    * ratio, mean word length — the standard public web-corpus filters
    * (C4/Gopher-style rules).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // Tokens materialized once per row (projection boundary): Spark has
    // no CSE inside lambdas, so inlining the split into each ratio would
    // re-split the text 4×.
    val stopArr = array(stopwords.map(lit): _*)
    val nTok = size(col("toks")).cast("double")
    val nStop = size(filter(col("toks"), t => array_contains(stopArr, t))).cast("double")
    val nPunct = length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("double")
    val nChars = length(col("text")).cast("double")
    c.ref("documents")
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        (nStop / nTok).as("stopword_ratio"),
        (nPunct / nChars).as("punct_ratio"),
        ((nChars - (nTok - 1.0)) / nTok).as("mean_word_len"))
      .orderBy("doc_id")
  }

  val qualityScoreSql: String =
    """SELECT doc_id,
      |       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
      |       CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                 t -> list_contains(['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
      |         / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS stopword_ratio,
      |       CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
      |         / CAST(length(text) AS DOUBLE) AS punct_ratio,
      |       (CAST(length(text) AS DOUBLE)
      |         - (CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) - 1.0))
      |         / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS mean_word_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- Gopher-style rule filter ---------------------------------------------
  /** Rule-based document filter in the style of the Gopher/MassiveText
    * quality rules (Rae et al. 2021, table A1) adapted to what the
    * corpus can exercise: token-count band, mean-word-length band,
    * minimum stopword evidence, a repetition cap (most-frequent token
    * ≤ 1/8 of the doc) and a type-token-ratio floor (≥ 0.3). Every rule
    * is integer arithmetic or an exact int/int division, so the flags
    * hash across engines; `pass` is the conjunction a curation pipeline
    * filters on.
    *
    * Deviation from the cited rule: stopword matching is CASE-SENSITIVE
    * (`tokens()` does not lowercase), so sentence-initial "The"/"It"
    * do not count toward `stop_hits` — the DuckDB twin is identically
    * case-sensitive, so the oracle pins this exact semantics.
    *
    * Scale: entirely scan-shaped — the repetition/TTR stats come from
    * one O(n) hash-counting pass over the per-row token array
    * ([[graft.functions.ArrayExprs.TokenStats]], zero shuffles), not an
    * explode+groupBy; the only shuffle is the presentation sort.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    gopherFlagsOn(c.ref("documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"),
        length(col("text")).as("tlen")))
      .orderBy("doc_id")
  }

  /** The rule flags over a PRE-TOKENIZED relation `(doc_id, toks, tlen)`
    * — the entry point the composed curation pipeline
    * ([[graft.ops.Curation]]) uses so its shared one-pass tokenization
    * feeds the same expressions [[gopherRules]] hash-checks standalone.
    * `tlen` = `length(text)` (only the raw character count survives the
    * projection; the text itself is not needed).
    */
  private[ops] def gopherFlagsOn(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    // One-pass native token stats (ArrayExprs.TokenStats): the previous
    // array-HOF repetition/TTR stats were O(distinct·n) PER ROW and
    // dominated the curation pipeline's scan cost. Identical integers
    // and null semantics; the DuckDB twin is unchanged. `carry` columns
    // ride through untouched (the curation pipeline keeps `lang` so its
    // membership needs no join back to the corpus).
    val carried = carry.map(col)
    docs
      .select(Seq(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        graft.functions.ArrayExprs.tokenStats(col("toks"), stopwords).as("st"),
        col("tlen")) ++ carried: _*)
      .select(Seq(col("doc_id"), col("n_tokens"),
        col("st.stop_hits").as("stop_hits"),
        col("st.top_tok").as("top_tok"),
        col("st.n_distinct").as("n_distinct"),
        ((col("tlen").cast("double") - (col("n_tokens").cast("double") - 1.0)) /
          col("n_tokens").cast("double")).as("mean_word_len")) ++ carried: _*)
      .withColumn("r_len", col("n_tokens").between(50, 1000))
      .withColumn("r_wordlen",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("r_stop", col("stop_hits") >= 2)
      .withColumn("r_rep", col("top_tok") * 8 <= col("n_tokens"))
      .withColumn("r_ttr", col("n_distinct") * 10 >= col("n_tokens") * 3)
      .withColumn("pass",
        col("r_len") && col("r_wordlen") && col("r_stop") && col("r_rep") && col("r_ttr"))
  }

  val gopherRulesSql: String =
    """WITH t AS (
      |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS ts
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         CAST(len(ts) AS BIGINT) AS n_tokens,
      |         CAST(len(list_filter(ts,
      |             x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS BIGINT) AS stop_hits,
      |         CAST(list_max(list_transform(list_distinct(ts),
      |             t2 -> len(list_filter(ts, x -> x = t2)))) AS BIGINT) AS top_tok,
      |         CAST(len(list_distinct(ts)) AS BIGINT) AS n_distinct,
      |         (CAST(length(text) AS DOUBLE) - (CAST(len(ts) AS DOUBLE) - 1.0))
      |           / CAST(len(ts) AS DOUBLE) AS mean_word_len
      |  FROM t)
      |SELECT doc_id, n_tokens, stop_hits, top_tok, n_distinct, mean_word_len,
      |       n_tokens BETWEEN 50 AND 1000 AS r_len,
      |       mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS r_wordlen,
      |       stop_hits >= 2 AS r_stop,
      |       top_tok * 8 <= n_tokens AS r_rep,
      |       n_distinct * 10 >= n_tokens * 3 AS r_ttr,
      |       (n_tokens BETWEEN 50 AND 1000) AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
      |         AND stop_hits >= 2 AND top_tok * 8 <= n_tokens
      |         AND n_distinct * 10 >= n_tokens * 3 AS pass
      |FROM s ORDER BY doc_id""".stripMargin

  // ---- language ID ----------------------------------------------------------
  /** Statistical language ID — Cavnar–Trenkle rank-order classification
    * ([[graft.functions.LangProfiles]]): the document's top-K character
    * n-gram rank profile is compared to each trained language profile by
    * out-of-place distance (missing gram = K penalty); minimum distance
    * wins, ties break lexicographically, token-less docs → 'und'.
    * Integer-exact end to end, so the twin replays it bit-for-bit.
    * (Replaces the r7 marker-word heuristic.)
    *
    * Confidence: `margin` = runner-up distance − best distance. A
    * sub-threshold margin (less than 1/25 of the ng·K distance ceiling —
    * [[graft.functions.LangProfiles.MarginDenom]]) predicts 'und': an
    * uncovered script distances every profile identically (margin 0),
    * and a genuine inter-language tie is also margin 0 — both are
    * exactly the "don't know" cases.
    *
    * Scale shape: the WHOLE document side is one scan-local native
    * expression ([[graft.functions.CtDistances]]): gram extraction,
    * counting, top-K ranking and all 8 profile distances happen per
    * row, so classification is shuffle-free at any corpus size (the r9
    * gram-explode + (doc, gram) shuffle + per-doc window formulation
    * measured 4.3 s at sf0.1; this is sub-second). The relational
    * DuckDB twin is unchanged — in-row counting is still the arithmetic
    * the oracle hash-checks.
    */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdCore(spark, dir).orderBy("doc_id")

  private[ops] def langIdCore(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.LangProfiles.{K, MarginDenom, langs}
    val c = Catalog(spark, dir)
    val d = c.ref("documents")
      .select(col("doc_id"),
        graft.functions.CtDistances.ctDistances(tokens(lower(col("text")))).as("d"))
    val withDist = langs.zipWithIndex.foldLeft(d) { case (df, (l, i)) =>
      df.withColumn(s"dist_$l", element_at(col("d.dists"), i + 1))
    }
      .withColumn("ng", col("d.ng"))
      .withColumn("margin", {
        val arr = sort_array(array(langs.map(l => col(s"dist_$l")): _*))
        element_at(arr, 2) - element_at(arr, 1)
      })
    val m = least(langs.map(l => col(s"dist_$l")): _*)
    val predicted = langs.foldLeft(
      when(col("ng").isNull, "und")
        .when(col("margin") * MarginDenom < col("ng") * K, "und"))(
      (w, l) => w.when(col(s"dist_$l") === m, l))
    withDist
      .select(col("doc_id") +:
        langs.map(l => coalesce(col(s"dist_$l"), lit(0L)).as(s"dist_$l")) :+
        coalesce(col("margin"), lit(0L)).as("margin") :+
        predicted.as("predicted_lang"): _*)
  }

  /** The classifier as reusable CTEs ending in
    * `lid(doc_id, dist_*, margin, predicted_lang)` — spliced into both
    * the langid oracle and the classifier-routed mixture oracle.
    */
  private val langIdCtes: String = {
    import graft.functions.LangProfiles.{K, MarginDenom, langs, profiles}
    val profValues = langs.flatMap(l => profiles(l).toSeq.sorted.map {
      case (g, r) => s"('$l', '$g', $r)"
    }).mkString(", ")
    val sums = langs.map(l =>
      s"sum(CASE WHEN lang = '$l' THEN abs(rd - rl) ELSE 0 END) AS s_$l").mkString(",\n    ")
    val cnts = langs.map(l =>
      s"count(CASE WHEN lang = '$l' THEN 1 END) AS c_$l").mkString(",\n    ")
    val distCols = langs.map(l =>
      s"CAST(s_$l + (ng - c_$l) * $K AS BIGINT) AS dist_$l").mkString(",\n    ")
    val outDist = langs.map(l =>
      s"coalesce(dist_$l, 0) AS dist_$l").mkString(",\n  ")
    val whens = langs.map(l =>
      s"WHEN dist_$l = least(${langs.map(x => s"dist_$x").mkString(", ")}) THEN '$l'")
      .mkString("\n       ")
    val distList = langs.map(l => s"dist_$l").mkString("[", ", ", "]")
    s"""prof(lang, gram, rl) AS (VALUES $profValues),
       |tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
       |        FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |         unnest(flatten(list_transform([1, 2, 3], n ->
       |           list_transform(range(1, len(p) - n + 2), i -> substring(p, CAST(i AS INT), n))))) AS gram
       |  FROM (SELECT doc_id, '_' || w || '_' AS p FROM tok WHERE w <> '')),
       |ranked AS (
       |  SELECT doc_id, gram,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, gram) AS rd
       |  FROM grams GROUP BY doc_id, gram
       |  QUALIFY rd <= $K),
       |d AS (
       |  SELECT doc_id, count(DISTINCT gram) AS ng,
       |    $sums,
       |    $cnts
       |  FROM ranked LEFT JOIN prof USING (gram)
       |  GROUP BY doc_id),
       |dist AS (
       |  SELECT doc_id, ng,
       |    $distCols
       |  FROM d),
       |dm AS (
       |  SELECT *, CAST(list_sort($distList)[2] - list_sort($distList)[1] AS BIGINT) AS margin
       |  FROM dist),
       |lid AS (
       |  SELECT doc.doc_id,
       |    $outDist,
       |    coalesce(margin, 0) AS margin,
       |    CASE WHEN ng IS NULL THEN 'und'
       |         WHEN margin * $MarginDenom < ng * $K THEN 'und'
       |         $whens
       |         END AS predicted_lang
       |  FROM documents doc LEFT JOIN dm USING (doc_id))""".stripMargin
  }

  val langIdSql: String =
    "WITH " + langIdCtes + "\nSELECT * FROM lid ORDER BY doc_id"

  // ---- document fingerprinting ------------------------------------------------
  /** Content fingerprints: md5 of whitespace-normalized text (exact-dup
    * key) and md5 of the sorted distinct token bag (order-insensitive
    * near-dup key). md5 is bit-identical across engines, so this is
    * oracle-checkable; xxhash64 variants (faster, 8-byte) live in
    * Dedup.minhash for the scale path.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.ref("documents")
      .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
      .select(
        col("doc_id"),
        md5(concat_ws(" ", col("toks"))).as("exact_fp"),
        md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))).as("bag_fp"))
      .orderBy("doc_id")
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |       md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ')) AS exact_fp,
      |       md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS bag_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- PII redaction -----------------------------------------------------
  /** Training-corpus scrubbing: mask email-like and long-digit-run
    * (phone/ID) spans. Patterns stick to RE2-compatible constructs
    * (character classes, bounded repeats) so Java regex (Spark) and RE2
    * (DuckDB) agree byte-for-byte.
    */
  def redact(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val digits = "[0-9]{7,}"
    c.ref("documents")
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
          digits, "<NUM>").as("redacted"),
        (length(col("text")) -
          length(regexp_replace(col("text"), email, ""))).as("email_chars_removed"))
      .orderBy("doc_id")
  }

  val redactSql: String =
    """SELECT doc_id,
      |       regexp_replace(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |                      '[0-9]{7,}', '<NUM>', 'g') AS redacted,
      |       length(text) - length(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '', 'g')) AS email_chars_removed
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- stopword filtering --------------------------------------------------
  /** Stopword-stripped text (the tokenize → filter → rejoin shape every
    * text pipeline runs before shingling/embedding).
    */
  def stopwordFilter(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val stopArr = array(stopwords.map(lit): _*)
    c.ref("documents")
      .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"),
        concat_ws(" ", filter(col("toks"),
          t => !array_contains(stopArr, t))).as("filtered"),
        size(col("toks")).as("n_before"),
        size(filter(col("toks"), t => !array_contains(stopArr, t))).as("n_after"))
      .orderBy("doc_id")
  }

  val stopwordFilterSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents)
      |SELECT doc_id,
      |       array_to_string(list_filter(toks,
      |         x -> NOT list_contains(['the','a','of','and','to','in','is','it'], x)), ' ') AS filtered,
      |       len(toks) AS n_before,
      |       len(list_filter(toks,
      |         x -> NOT list_contains(['the','a','of','and','to','in','is','it'], x))) AS n_after
      |FROM t ORDER BY doc_id""".stripMargin

  // ---- repetition signals (Gopher/C4-style) --------------------------------
  /** Repetition quality signals: distinct-token ratio and the fraction of
    * all bigrams taken by the single most frequent bigram (high values →
    * boilerplate/spam). Relational form (explode → two-level aggregate)
    * so the shuffle partitions by (doc, bigram) at any corpus size.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val toksDf = c.ref("documents")
      .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
    // NB: sequence(1, 0) yields a DESCENDING [1,0] in Spark, so short
    // docs must be guarded explicitly rather than via greatest(.., 0).
    val bigrams = toksDf.select(col("doc_id"),
      explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))))
        .otherwise(array())).as("bigram"))
    val perBigram = bigrams.groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("n"))
    val byDoc = perBigram.groupBy(col("doc_id"))
      .agg((max(col("n")).cast("double") / sum(col("n")).cast("double"))
        .as("top_bigram_frac"))
    val tokStats = toksDf.select(col("doc_id"),
      (size(array_distinct(col("toks"))).cast("double") /
        size(col("toks")).cast("double")).as("distinct_token_ratio"))
    tokStats.join(byDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("distinct_token_ratio"), col("top_bigram_frac"))
      .orderBy("doc_id")
  }

  val repetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents),
      |bi AS (
      |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks), 1)),
      |    i -> toks[i] || ' ' || toks[i+1])) AS bigram
      |  FROM t),
      |pb AS (SELECT doc_id, bigram, count(*) AS n FROM bi GROUP BY 1, 2),
      |bd AS (SELECT doc_id, CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS top_bigram_frac
      |       FROM pb GROUP BY 1)
      |SELECT t.doc_id,
      |       CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS distinct_token_ratio,
      |       bd.top_bigram_frac
      |FROM t LEFT JOIN bd ON t.doc_id = bd.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ---- sequence packing ------------------------------------------------------
  /** Token-budget sequence packing — assigning documents to fixed-size
    * training chunks (the "pack short docs into one context window" step
    * of an LLM data pipeline). Deterministic order-preserving fill: per
    * lang, docs in doc_id order fill chunks of `budget` tokens; a doc
    * starts a new chunk when its start offset crosses the budget
    * boundary (chunk_id = start_offset div budget — oversized docs span
    * chunks and just take the chunk at their start).
    *
    * Scale shape: the running sum uses [[Windows.groupedRunningSum]] —
    * range-partitioned local sums plus broadcast per-(lang, partition)
    * offsets — NOT `Window.partitionBy(lang)`, which would run a
    * 90%-English corpus in a single task. A dominant language spans as
    * many partitions as its row share demands; identical output.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packSequencesAt(spark, dir, 512)

  def packSequencesAt(spark: SparkSession, dir: String, budget: Int): DataFrame = {
    val c = Catalog(spark, dir)
    val base = c.ref("documents")
      .select(col("lang"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    Windows.groupedRunningSum(base, "__rsum", col("lang"), col("n_tokens"), col("doc_id"))
      .withColumn("start_offset", col("__rsum") - col("n_tokens")).drop("__rsum")
      .withColumn("chunk_id", expr(s"start_offset div $budget"))
      .select("lang", "doc_id", "n_tokens", "start_offset", "chunk_id")
      .orderBy("lang", "doc_id")
  }

  val packSequencesSql: String =
    """WITH t AS (
      |  SELECT lang, doc_id,
      |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |runs AS (
      |  SELECT lang, doc_id, n_tokens,
      |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |              AS BIGINT) AS start_offset
      |  FROM t)
      |SELECT lang, doc_id, n_tokens, start_offset,
      |       start_offset // 512 AS chunk_id
      |FROM runs ORDER BY lang, doc_id""".stripMargin

  /** [[packSequences]] with the REAL BPE budget: chunks are filled by
    * the per-doc BPE count instead of the whitespace word count — what
    * an actual context-window packer consumes. The merge table is
    * TRAINED ON THE CORPUS being packed ([[BpeTrain.trainedMerges]]),
    * so the budget prices the corpus's own vocabulary rather than a
    * fixed English table. Same de-skewed running-sum shape; training
    * adds one distributed word-count aggregate up front (memoized per
    * corpus per session).
    */
  def packSequencesBpe(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val trained = BpeTrain.trainedMerges(spark, dir).map { case (l, r, _) => (l, r) }
    val base = c.ref("documents")
      .select(col("lang"), col("doc_id"), tokens(lower(col("text"))).as("toks"))
      .select(col("lang"), col("doc_id"),
        graft.functions.BpeCountSum.bpeCountSum(col("toks"), trained).as("n_tokens_bpe"))
    Windows.groupedRunningSum(base, "__rsum", col("lang"), col("n_tokens_bpe"), col("doc_id"))
      .withColumn("start_offset", col("__rsum") - col("n_tokens_bpe")).drop("__rsum")
      .withColumn("chunk_id", expr("start_offset div 512"))
      .select("lang", "doc_id", "n_tokens_bpe", "start_offset", "chunk_id")
      .orderBy("lang", "doc_id")
  }

  /** Twin: re-derives the trained table ([[BpeTrain.bpeTrainCtes]]),
    * folds it into pair↔rank maps, and applies it with the SAME
    * word-count recursion the fixed-table twin uses — training and
    * application can never disagree on the tokenizer.
    */
  val packSequencesBpeSql: String =
    "WITH RECURSIVE\n" + BpeTrain.bpeTrainCtes(BpeTrain.DefaultMerges) + ",\n" +
      """btm AS (SELECT iter, l, r FROM bst WHERE iter >= 1),
       |bmaps AS (SELECT
       |  map(coalesce(list(l || chr(2) || r ORDER BY iter), CAST([] AS VARCHAR[])),
       |      coalesce(list(CAST(iter AS INT) ORDER BY iter), CAST([] AS INT[]))) AS pr,
       |  map(coalesce(list(CAST(iter AS INT) ORDER BY iter), CAST([] AS INT[])),
       |      coalesce(list(l || chr(2) || r ORDER BY iter), CAST([] AS VARCHAR[]))) AS rp
       |  FROM btm),
       |""".stripMargin +
      bpeWordCountCtesWith("bm.pr", "bm.rp", ", bmaps bm") + ",\n" +
      """bc AS (
       |  SELECT t.doc_id, CAST(sum(coalesce(wc.n_bpe, 0)) AS BIGINT) AS n_tokens_bpe
       |  FROM tok t LEFT JOIN wc USING (word) GROUP BY t.doc_id),
       |runs AS (
       |  SELECT d.lang, d.doc_id, bc.n_tokens_bpe,
       |         CAST(sum(bc.n_tokens_bpe) OVER (PARTITION BY d.lang ORDER BY d.doc_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bc.n_tokens_bpe
       |              AS BIGINT) AS start_offset
       |  FROM documents d JOIN bc ON d.doc_id = bc.doc_id)
       |SELECT lang, doc_id, n_tokens_bpe, start_offset,
       |       start_offset // 512 AS chunk_id
       |FROM runs ORDER BY lang, doc_id""".stripMargin

  // ---- end-to-end training-data prep ----------------------------------------
  /** The canonical LLM data-prep flow as ONE composed, oracle-checked
    * query: quality filter (token-count band) → exact dedup (keep the
    * lowest doc_id per normalized fingerprint) → token-budget packing →
    * per-chunk rollup. Every stage is the same shape the standalone
    * operators use; composing them costs two narrow shuffles (the dedup
    * window keyed by fingerprint, the packing range-repartition) — text
    * never flows past the stage that needs it, and packing de-skews via
    * [[Windows.groupedRunningSum]] instead of a one-task-per-language
    * window.
    */
  def prepPipeline(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val budget = 512
    // ONE tokenization serves both outputs: lowercasing never changes
    // whitespace structure, so size(split(trim(lower(text)))) ==
    // size(split(trim(text))) — the oracle's n_tokens — while the same
    // array feeds the normalized fingerprint. The projection boundary
    // makes toks a bound attribute (Spark does no CSE inside one
    // expression tree), halving the regex-split work per row.
    val scored = c.ref("documents")
      .select(col("doc_id"), col("lang"),
        split(trim(lower(col("text"))), "\\s+").as("toks"))
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_tokens"),
        // fp is INTERNAL (grouping only, never output): the 16-byte
        // binary digest halves the shuffle/sort key vs the hex string;
        // the DuckDB twin's md5 hex groups identically.
        unhex(md5(concat_ws(" ", col("toks")))).as("fp"))
      .filter(col("n_tokens").between(10, 1000))
    // Exact dedup as a hash aggregate, NOT a row_number window: min_by
    // partial-aggregates map-side, so duplicate fingerprints collapse
    // BEFORE the shuffle (a window ships every row and sorts it).
    // The checkpoint pins ONE evaluation of the scan→tokenize→fp-shuffle
    // subtree. bucketedRunningSum's local-sum and offset branches are
    // canonically identical up to the (lang, bucket) exchange, but AQE
    // does NOT reuse that stage at runtime here (measured: the unpinned
    // plan re-runs the scan + fp shuffle in the offsets branch, 0.72 s vs
    // 0.34 s warm at sf0.1). The pinned relation is per-doc METADATA —
    // (doc_id, lang, n_tokens), ~24 B/doc — so the materialization is
    // cheap at any scale.
    val kept = scored
      .groupBy(col("fp"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("n_tokens")), col("doc_id")).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.lang").as("lang"),
        col("k.n_tokens").as("n_tokens"))
      .localCheckpoint()
    // Packing via bucketedRunningSum: doc_ids are dense 0..N-1, so
    // doc_id*P div N is a computed monotone bucket — the de-skewed
    // two-pass running sum with NO range-partitioner sampling job and NO
    // partition-id checkpoint pin; the one (lang, bucket) hash exchange
    // is shared by the local-sum and offset subtrees (ReusedExchange).
    // N is a memoized table statistic (what a metastore serves free).
    val n = math.max(1L, Catalog.cachedRowCount(spark, dir, "documents"))
    val bucket = expr(s"(doc_id * 32) div $n")
    Windows.bucketedRunningSum(kept, "__rsum", col("lang"), col("n_tokens"),
        col("doc_id"), bucket)
      .withColumn("start_offset", col("__rsum") - col("n_tokens"))
      .withColumn("chunk_id", expr(s"start_offset div $budget"))
      .groupBy(col("lang"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("chunk_tokens"))
      .orderBy("lang", "chunk_id")
  }

  val prepPipelineSql: String =
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |         md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ')) AS fp
      |  FROM documents),
      |filtered AS (SELECT * FROM scored WHERE n_tokens BETWEEN 10 AND 1000),
      |kept AS (
      |  SELECT doc_id, lang, n_tokens FROM (
      |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
      |    FROM filtered) WHERE rk = 1),
      |packed AS (
      |  SELECT lang, n_tokens,
      |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |              AS BIGINT) // 512 AS chunk_id
      |  FROM kept)
      |SELECT lang, chunk_id, count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
      |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- deterministic stratified sampling ----------------------------------
  /** Reproducible corpus subsampling — keep ~10% of each source's
    * documents, membership decided by an engine-portable hash draw on
    * (source, doc_id), NOT by position or RNG: the sample is identical
    * across runs, engines, partitionings and cluster sizes, and any
    * executor decides membership locally (pure scan work, zero
    * coordination, zero shuffle — at 100 TB this is a predicate the
    * parquet scan evaluates, never a global sort or sample() pass whose
    * result depends on split planning).
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSampleAt(spark, dir, permille = 100)

  def stratifiedSampleAt(spark: SparkSession, dir: String, permille: Int): DataFrame = {
    val c = Catalog(spark, dir)
    c.ref("documents")
      .filter(graft.functions.ArrayExprs.md5Mod(
        concat_ws(":", col("source"), col("doc_id").cast("string")), 1000L) < permille)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  val stratifiedSampleSql: String =
    """SELECT doc_id, source, n_chars
      |FROM documents
      |WHERE md5_number_lower(source || ':' || CAST(doc_id AS VARCHAR)) % 1000 < 100
      |ORDER BY doc_id""".stripMargin

  // ---- weighted sampling without replacement (A-ES) -----------------------
  /** Efraimidis–Spirakis weighted reservoir sampling, deterministic and
    * engine-exact: each document draws u = h/2^62 from the portable md5
    * hash and ranks by u^(1/w) — equivalently by log2(u)/w. The usual
    * implementation needs libm (pow or log), which is not cross-engine
    * reproducible; here log2(u) = L(h) − 62·2^16 comes from the
    * pure-integer [[graft.functions.FixLog2]] fold, and the ranking key
    * is the NON-NEGATIVE integer ((62·2^16 − L(h)) · 2^20) div w, whose
    * truncating division equals DuckDB's floor `//` because every
    * operand is non-negative. Lowest key = largest u^(1/w), so the
    * sample is the bottom-k — planned as a distributed TakeOrdered,
    * never a global sort; the draw itself is pure scan work.
    *
    * Heavier documents win proportionally more often (the A-ES
    * guarantee, asserted statistically in TextAnalysisSpec); ties break
    * by doc_id. Zero-weight rows are excluded on both sides.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSampleAt(spark, dir, k = 100)

  def weightedSampleAt(spark: SparkSession, dir: String, k: Int): DataFrame =
    weightedSampleOn(Catalog(spark, dir).ref("documents"), k)

  /** The scan-side A-ES key relation shared by the global and grouped
    * samplers: (doc_id, source, w, key).
    */
  private def aesKeyed(docs: DataFrame): DataFrame = {
    val twoPow62 = 4611686018427387904L
    docs
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("w"))
      .filter(col("w") >= 1)
      .withColumn("h", graft.functions.ArrayExprs.md5Mod(
        concat(lit("ws:"), col("doc_id").cast("string")), twoPow62) + lit(1L))
      .withColumn("l2f", graft.functions.FixLog2.log2Fix16Col(col("h")))
      .withColumn("key", expr(s"((${62L * 65536L} - l2f) * 1048576) div w"))
  }

  private[ops] def weightedSampleOn(docs: DataFrame, k: Int): DataFrame =
    aesKeyed(docs)
      .orderBy(col("key"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("w"), col("key"))

  /** Per-GROUP weighted sampling — k docs per source by the same A-ES
    * key, i.e. a stratified sample whose within-stratum draw is
    * weighted. The per-group bottom-k is a rank window that Spark plans
    * with WindowGroupLimit (plan-pinned): each map partition keeps at
    * most k rows per group BEFORE the shuffle, so the exchange carries
    * ~k·|groups| rows, not the corpus — the grouped analogue of the
    * global sampler's TakeOrdered.
    */
  def weightedSampleGrouped(spark: SparkSession, dir: String): DataFrame =
    weightedSampleGroupedAt(spark, dir, kPerGroup = 5)

  def weightedSampleGroupedAt(spark: SparkSession, dir: String,
      kPerGroup: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("key"), col("doc_id"))
    aesKeyed(Catalog(spark, dir).ref("documents"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kPerGroup)
      .select(col("source"), col("rank"), col("doc_id"), col("w"), col("key"))
      .orderBy("source", "rank")
  }

  val weightedSampleGroupedSql: String = {
    val l = graft.functions.FixLog2.sqlL("h")
    s"""WITH d AS (
       |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
       |         md5_number_lower('ws:' || CAST(doc_id AS VARCHAR))
       |           % 4611686018427387904 + 1 AS h
       |  FROM documents WHERE n_chars >= 1),
       |keyed AS (
       |  SELECT doc_id, source, w,
       |         CAST(((${62L * 65536L} - $l) * 1048576) // w AS BIGINT) AS key
       |  FROM d),
       |ranked AS (
       |  SELECT source, doc_id, w, key,
       |         row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rank
       |  FROM keyed)
       |SELECT source, rank, doc_id, w, key FROM ranked
       |WHERE rank <= 5 ORDER BY source, rank""".stripMargin
  }

  val weightedSampleSql: String = {
    val l = graft.functions.FixLog2.sqlL("h")
    s"""WITH d AS (
       |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
       |         md5_number_lower('ws:' || CAST(doc_id AS VARCHAR))
       |           % 4611686018427387904 + 1 AS h
       |  FROM documents WHERE n_chars >= 1),
       |keyed AS (
       |  SELECT doc_id, w,
       |         CAST(((${62L * 65536L} - $l) * 1048576) // w AS BIGINT) AS key
       |  FROM d)
       |SELECT doc_id, w, key FROM keyed
       |ORDER BY key, doc_id LIMIT 100""".stripMargin
  }

  // ---- per-source vocabulary --------------------------------------------------
  /** Top-5 bigrams per source by frequency — the corpus-reporting /
    * vocabulary-drift check of a data pipeline. Bigram counts shuffle
    * once keyed by (source, bigram) with map-side combine; the per-group
    * top-k is a window over the (tiny) per-source aggregate, not the
    * corpus. Ties break lexicographically so the result is total-ordered.
    */
  def vocabTopK(spark: SparkSession, dir: String): DataFrame =
    vocabTopKAt(spark, dir, k = 5)

  def vocabTopKAt(spark: SparkSession, dir: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Catalog(spark, dir)
    val toksDf = c.ref("documents")
      .select(col("source"), tokens(lower(col("text"))).as("toks"))
    val bigrams = toksDf.select(col("source"),
      explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))))
        .otherwise(array())).as("bigram"))
    val counts = bigrams.groupBy(col("source"), col("bigram"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("source")).orderBy(col("n").desc, col("bigram"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("bigram"), col("n"))
      .orderBy("source", "rank")
  }

  val vocabTopKSql: String =
    """WITH tok AS (
      |  SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |  FROM documents),
      |bg AS (
      |  SELECT source, unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bigram
      |  FROM tok WHERE len(ts) >= 2),
      |counts AS (
      |  SELECT source, bigram, count(*) AS n FROM bg GROUP BY 1, 2),
      |ranked AS (
      |  SELECT source, bigram, n,
      |         row_number() OVER (PARTITION BY source ORDER BY n DESC, bigram) AS rank
      |  FROM counts)
      |SELECT source, rank, bigram, n FROM ranked WHERE rank <= 5
      |ORDER BY source, rank""".stripMargin

  // ---- deterministic train/val/test split ---------------------------------
  /** Split assignment for training corpora: every document lands in
    * train/val/test by the portable hash draw (98/1/1 permille bands),
    * so the split is a pure scan-side expression — stable across runs,
    * engines and repartitioning, and leak-free by construction (a doc's
    * split is a function of its identity, never of file order or
    * sampling state). At 100 TB this predicate costs nothing: it rides
    * the parquet scan, and writing `partitionBy("split")` turns the
    * three sets into prunable directories.
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val h = graft.functions.ArrayExprs.md5Mod(
      concat_ws(":", lit("split"), col("doc_id").cast("string")), 1000L)
    c.ref("documents")
      .select(col("doc_id"), col("source"),
        when(h < 980, "train").when(h < 990, "val").otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  val splitAssignSql: String =
    """SELECT doc_id, source,
      |       CASE WHEN md5_number_lower('split:' || CAST(doc_id AS VARCHAR)) % 1000 < 980 THEN 'train'
      |            WHEN md5_number_lower('split:' || CAST(doc_id AS VARCHAR)) % 1000 < 990 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- per-source quota (data-mixture control) ----------------------------
  /** Cap each source's contribution at `quota` documents, chosen by the
    * deterministic hash order (NOT file order — reproducible across
    * partitionings). The standard mixture-weighting primitive: the
    * shuffle is one window keyed by source over (hash, doc_id) pairs —
    * 24 bytes/row regardless of document size; text never moves until
    * the final semi-join-shaped filter.
    */
  def sourceQuota(spark: SparkSession, dir: String): DataFrame =
    sourceQuotaAt(spark, dir, quota = 50)

  def sourceQuotaAt(spark: SparkSession, dir: String, quota: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Catalog(spark, dir)
    val h = graft.functions.ArrayExprs.md5Mod(
      concat_ws(":", lit("quota"), col("doc_id").cast("string")), 1000003L)
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    c.ref("documents")
      .select(col("doc_id"), col("source"), h.as("h"))
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= quota)
      .select(col("doc_id"), col("source"), col("pick"))
      .orderBy("doc_id")
  }

  val sourceQuotaSql: String =
    """WITH h AS (
      |  SELECT doc_id, source,
      |         md5_number_lower('quota:' || CAST(doc_id AS VARCHAR)) % 1000003 AS h
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id, source,
      |         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS pick
      |  FROM h)
      |SELECT doc_id, source, pick FROM ranked WHERE pick <= 50
      |ORDER BY doc_id""".stripMargin

  // ---- temperature-based mixture sampling ------------------------------------
  /** Multi-group mixture resampling at temperature α = 0.5 — the
    * "flatten the language/domain distribution" step of multilingual
    * training-data assembly (target share ∝ √n instead of n, so
    * dominant groups are downsampled and small groups kept whole; the
    * smallest group binds the total, nothing is upsampled).
    *
    * Every step is INTEGER arithmetic so the keep decision is bit-exact
    * across engines and runs: w_g = ⌊√n_g⌋ (IEEE sqrt is correctly
    * rounded, so ⌊√int⌋ is engine-portable), W = Σw_g,
    * T = min_g ⌊n_g·W/w_g⌋ (the achievable total), per-group keep
    * count k_g = ⌊w_g·T/W⌋, rate ppm_g = ⌊k_g·10⁶/n_g⌋, and a doc
    * survives iff its salted md5 draw mod 10⁶ < ppm_g. No RNG, no
    * floating-point boundary, no dependence on row order.
    *
    * Scale shape: group rates derive from a |groups|-row aggregate
    * (metadata); the keep decision is a broadcast join + scan-side
    * predicate — zero data shuffles at any corpus size. (Group counts
    * up to ~10¹² and |groups| up to ~10⁶ stay inside long arithmetic:
    * n·W ≤ 10¹²·10⁹ overflows only past 9·10¹⁸ — document corpora sit
    * orders below that.)
    */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    // The mixture groups by the CLASSIFIER's language, not the metadata
    // column — the end-to-end path a real pipeline runs (upstream lang
    // labels are absent or untrusted at ingest). 'und' predictions form
    // their own group and get balanced like any other. The pinned
    // relation is per-doc metadata (doc_id, lang); the rate derivation
    // and the sampling draw both read it, so the corpus-wide gram
    // classification evaluates exactly once.
    val lid = langIdCore(spark, dir)
      .select(col("doc_id"), col("predicted_lang").as("lang"))
      .localCheckpoint()
    val counts = lid.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val withW = counts.withColumn("w", floor(sqrt(col("n"))).cast("long"))
    val wTot = withW.crossJoin(broadcast(withW.agg(sum(col("w")).as("bigw"))))
    val rates = wTot
      .crossJoin(broadcast(wTot.agg(min(expr("n * bigw div w")).as("t"))))
      .withColumn("k", expr("w * t div bigw"))
      .withColumn("ppm", expr("k * 1000000 div n"))
      .select(col("lang"), col("ppm"))
    lid.join(broadcast(rates), Seq("lang"))
      .filter(graft.functions.ArrayExprs.md5Mod(
        concat_ws(":", lit("mix"), col("doc_id").cast("string")), 1000000L) < col("ppm"))
      .select(col("doc_id"), col("lang"), col("ppm"))
      .orderBy("doc_id")
  }

  val mixtureSampleSql: String =
    "WITH " + langIdCtes + ",\n" +
      """lp AS (SELECT doc_id, predicted_lang AS lang FROM lid),
      |counts AS (SELECT lang, count(*) AS n FROM lp GROUP BY 1),
      |w AS (SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM counts),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS bigw FROM w),
      |t AS (SELECT min((n * bigw) // w) AS t FROM w, tot),
      |rates AS (
      |  SELECT lang, ((((w * t) // bigw)) * 1000000) // n AS ppm
      |  FROM w, tot, t)
      |SELECT d.doc_id, d.lang, r.ppm
      |FROM lp d JOIN rates r USING (lang)
      |WHERE md5_number_lower('mix:' || CAST(d.doc_id AS VARCHAR)) % 1000000 < r.ppm
      |ORDER BY d.doc_id""".stripMargin

  // ---- bigram LM familiarity scoring -----------------------------------------
  /** Bigram language-model scoring (the CCNet-style "does this text look
    * like the corpus" quality dial): train bigram counts over the whole
    * corpus, prune singletons (count ≥ 2 — the deterministic equivalent
    * of a top-K model cap: the singleton tail is most of a web corpus's
    * bigram table and carries no signal), then score each document by
    * model coverage (known bigrams / bigrams) and mean known-bigram
    * frequency. Scores are ratios of corpus-derived INTEGERS — a single
    * int/int division is exactly rounded, so the result hash-matches
    * across engines, where a log-space perplexity would drift in the
    * last ulp (ln is not correctly rounded; turning these counts into
    * -Σ log p is a trivial client-side map).
    *
    * Scale shape: model = one (bigram, count) aggregate with map-side
    * combine and the count≥2 prune BEFORE any join; scoring = one
    * shuffle join keyed by bigram (AQE picks broadcast when the pruned
    * model fits) + a per-doc rollup keyed by doc_id. Text itself never
    * joins — only 8-byte-hashable bigram strings.
    */
  def bigramLm(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val toksDf = c.ref("documents")
      .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
    val bg = toksDf.select(col("doc_id"),
      explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))))
        .otherwise(array())).as("bigram"))
    val model = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
    val scored = bg.join(model, Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), count(col("n")).as("n_known"),
        coalesce(sum(col("n")), lit(0L)).as("known_mass"))
    c.ref("documents").select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        when(col("n_bigrams") > 0,
          col("n_known").cast("double") / col("n_bigrams").cast("double"))
          .as("coverage"),
        when(col("n_bigrams") > 0,
          col("known_mass").cast("double") / col("n_bigrams").cast("double"))
          .as("mean_bigram_freq"))
      .orderBy("doc_id")
  }

  val bigramLmSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bigram
      |  FROM tok WHERE len(ts) >= 2),
      |model AS (
      |  SELECT bigram, count(*) AS n FROM bg GROUP BY 1 HAVING count(*) >= 2),
      |scored AS (
      |  SELECT b.doc_id, count(*) AS n_bigrams, count(m.n) AS n_known,
      |         COALESCE(sum(m.n), 0) AS known_mass
      |  FROM bg b LEFT JOIN model m USING (bigram) GROUP BY 1)
      |SELECT d.doc_id,
      |       COALESCE(s.n_bigrams, 0) AS n_bigrams,
      |       COALESCE(s.n_known, 0) AS n_known,
      |       CASE WHEN s.n_bigrams > 0
      |            THEN CAST(s.n_known AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE) END AS coverage,
      |       CASE WHEN s.n_bigrams > 0
      |            THEN CAST(s.known_mass AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE) END AS mean_bigram_freq
      |FROM documents d LEFT JOIN scored s USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---- deterministic corpus shuffle -----------------------------------------
  /** Training-order shuffle: a reproducible global permutation of the
    * corpus, keyed by an md5 draw on doc_id (salted so re-shuffles with
    * a different salt are independent permutations). The permutation
    * index comes from the distributed two-pass global row number
    * (range-partition by hash → per-partition numbering + broadcast
    * offsets — `Windows.globalRowNumber`), so no single-partition
    * window exists anywhere: at 100 TB this is a range shuffle plus a
    * |partitions|-row driver pass. Downstream writers consume
    * `shuffle_pos` as the sort key to lay training shards on disk in
    * shuffled order.
    */
  def globalShuffle(spark: SparkSession, dir: String): DataFrame =
    globalShuffleAt(spark, dir, salt = "epoch0")

  def globalShuffleAt(spark: SparkSession, dir: String, salt: String): DataFrame = {
    val c = Catalog(spark, dir)
    val hashed = c.ref("documents")
      .select(col("doc_id"), col("source"),
        graft.functions.ArrayExprs.md5Mod(
          concat_ws(":", lit(salt), col("doc_id").cast("string")), 1000003L).as("h"))
    Windows.globalRowNumber(hashed, "shuffle_pos", col("h"), col("doc_id"))
      .select(col("doc_id"), col("source"), col("shuffle_pos"))
      .orderBy("shuffle_pos")
  }

  val globalShuffleSql: String =
    """WITH h AS (
      |  SELECT doc_id, source,
      |         md5_number_lower('epoch0:' || CAST(doc_id AS VARCHAR)) % 1000003 AS h
      |  FROM documents)
      |SELECT doc_id, source,
      |       CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS shuffle_pos
      |FROM h ORDER BY shuffle_pos""".stripMargin

  // ---- corpus-statistics rarity scoring ---------------------------------------
  /** Unigram-LM-flavored quality signal with exact arithmetic: per doc,
    * how many of its tokens are corpus-rare (frequency below half the
    * mean vocabulary frequency — a relative threshold, so it means the
    * same thing at any corpus size), plus the mean corpus frequency of
    * its tokens. This is the hash-portable stand-in for mean token
    * surprisal: true -log p needs libm, whose last-ulp behavior differs
    * across engines, while integer counts and single divisions of exact
    * integers are bit-identical everywhere.
    *
    * Plan: token explode → vocabulary count (one combine-side shuffle,
    * keyed by token) → broadcast the vocabulary and its 1-row totals
    * back onto the token stream → per-doc aggregate (shuffle keyed by
    * doc_id). Vocabulary is orders of magnitude smaller than the corpus
    * (Heaps' law), so it broadcasts — but the hint is left to AQE, which
    * sees the aggregate's actual runtime size: a vocabulary that outgrows
    * the broadcast threshold degrades to a shuffle join instead of
    * OOMing on a forced broadcast. The 1-row totals keep an explicit
    * hint (its size is known statically).
    */
  def rarityScore(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val tokens = c.ref("documents")
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val vocab = tokens.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val totals = vocab.agg(sum("cnt").cast("long").as("total"),
      count(lit(1)).as("vocab"))
    tokens.join(vocab, "tok")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("cnt") * col("vocab") * 2 < col("total"), 1L).otherwise(0L)).as("n_rare"),
        sum(col("cnt")).cast("long").as("sum_cnt"))
      .select(col("doc_id"), col("n_tokens"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_tokens")).as("rare_ratio"),
        (col("sum_cnt").cast("double") / col("n_tokens")).as("mean_tok_count"))
      .orderBy("doc_id")
  }

  val rarityScoreSql: String =
    """WITH t AS (SELECT doc_id,
      |                  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      |           FROM documents),
      |v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
      |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS vocab FROM v)
      |SELECT t.doc_id, count(*) AS n_tokens,
      |       CAST(sum(CASE WHEN v.cnt * s.vocab * 2 < s.total THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
      |       CAST(sum(CASE WHEN v.cnt * s.vocab * 2 < s.total THEN 1 ELSE 0 END) AS DOUBLE)
      |         / count(*) AS rare_ratio,
      |       CAST(sum(v.cnt) AS DOUBLE) / count(*) AS mean_tok_count
      |FROM t JOIN v USING (tok) CROSS JOIN s
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_rarity" -> (rarityScore _),
    "text_global_shuffle" -> (globalShuffle _),
    "text_split_assign" -> (splitAssign _),
    "text_source_quota" -> (sourceQuota _),
    "text_sample_stratified" -> (stratifiedSample _),
    "text_weighted_sample" -> (weightedSample _),
    "text_weighted_sample_grouped" -> (weightedSampleGrouped _),
    "text_mixture_sample" -> (mixtureSample _),
    "text_bigram_lm" -> (bigramLm _),
    "text_vocab_topk" -> (vocabTopK _),
    "text_prep_pipeline" -> (prepPipeline _),
    "text_pack_sequences" -> (packSequences _),
    "text_repetition" -> (repetition _),
    "text_token_counts" -> (tokenCounts _),
    "text_token_bpe" -> (tokenCountsBpe _),
    "text_pack_bpe" -> (packSequencesBpe _),
    "text_quality" -> (qualityScore _),
    "text_gopher_rules" -> (gopherRules _),
    "text_langid" -> (langId _),
    "text_fingerprint" -> (fingerprint _),
    "text_redact" -> (redact _),
    "text_stopword_filter" -> (stopwordFilter _))

  val oracles: Map[String, String] = Map(
    "text_rarity" -> rarityScoreSql,
    "text_global_shuffle" -> globalShuffleSql,
    "text_split_assign" -> splitAssignSql,
    "text_source_quota" -> sourceQuotaSql,
    "text_sample_stratified" -> stratifiedSampleSql,
    "text_weighted_sample" -> weightedSampleSql,
    "text_weighted_sample_grouped" -> weightedSampleGroupedSql,
    "text_mixture_sample" -> mixtureSampleSql,
    "text_bigram_lm" -> bigramLmSql,
    "text_vocab_topk" -> vocabTopKSql,
    "text_prep_pipeline" -> prepPipelineSql,
    "text_pack_sequences" -> packSequencesSql,
    "text_repetition" -> repetitionSql,
    "text_token_counts" -> tokenCountsSql,
    "text_token_bpe" -> tokenCountsBpeSql,
    "text_pack_bpe" -> packSequencesBpeSql,
    "text_quality" -> qualityScoreSql,
    "text_gopher_rules" -> gopherRulesSql,
    "text_langid" -> langIdSql,
    "text_fingerprint" -> fingerprintSql,
    "text_redact" -> redactSql,
    "text_stopword_filter" -> stopwordFilterSql)
}
