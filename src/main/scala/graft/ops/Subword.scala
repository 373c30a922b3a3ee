package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.Wordpiece

/** WordPiece-style subword pipeline — the greedy-longest-match
  * counterpart to the BPE family ([[BpeTrain]]): build a piece
  * inventory from corpus substring frequencies, then segment every
  * token by consuming the longest matching piece at each position
  * (Wu et al. 2016 apply semantics). The fertility statistic
  * (pieces per word, per source) is the number a tokenizer owner
  * actually watches: it is the token-budget multiplier a corpus will
  * cost at training time.
  *
  * Spark-first shape:
  *  - TRAIN: one tokenize scan → distinct-word counts (the only
  *    corpus-keyed shuffle, ≤ |vocab| rows out), then the substring
  *    explode runs over DISTINCT WORDS — bounded by vocabulary, not
  *    corpus (8× replicas change frequencies, not the word set, the
  *    [[BpeTrain]] argument). Top-V pieces + the full corpus alphabet
  *    collect as bounded driver metadata.
  *  - APPLY: scan-local — the piece trie rides the plan
  *    ([[graft.functions.GreedyPieceCount]]), each token segments in
  *    place, and one map-side-combined rollup emits |sources| rows.
  *
  * No-OOV by construction: every corpus codepoint is a single-char
  * piece, so greedy consumption always progresses; the expression's -1
  * sentinel (impossible under this contract) would break the oracle
  * row count loudly rather than drift silently.
  *
  * Determinism/oracle: piece ranking is (freq desc, piece asc); the
  * DuckDB twin rebuilds the same inventory and replays the greedy scan
  * as a recursive CTE over distinct words ("consume the longest
  * matching piece" = the NOT EXISTS longer-match guard), then joins
  * token instances back for the per-source rollup. All-integer until
  * the final fertility division of two exact counts.
  */
object Subword {

  val TopV = 200
  val MaxPieceLen = 6

  /** Piece inventory: top-V substrings (length 2..maxLen) of distinct
    * words by summed word frequency, plus every corpus codepoint.
    * Bounded driver metadata (V + alphabet).
    */
  def trainVocab(spark: SparkSession, dir: String, topV: Int, maxLen: Int): Seq[String] = {
    val dw = distinctWords(spark, dir)
    val subs = dw
      .withColumn("i", explode(sequence(lit(1), length(col("word")))))
      .withColumn("j", explode(sequence(lit(2), lit(maxLen))))
      .filter(col("i") + col("j") - lit(1) <= length(col("word")))
      .select(expr("substr(word, i, j)").as("piece"), col("wfreq"))
      .groupBy("piece").agg(sum("wfreq").as("freq"))
    val top = subs.orderBy(col("freq").desc, col("piece"))
      .limit(topV).select("piece").collect().map(_.getString(0))
    val chars = dw
      .withColumn("i", explode(sequence(lit(1), length(col("word")))))
      .select(expr("substr(word, i, 1)").as("piece"))
      .distinct().collect().map(_.getString(0))
    (top ++ chars).distinct.toSeq
  }

  private def tokenInstances(spark: SparkSession, dir: String): DataFrame =
    Catalog(spark, dir).ref("documents")
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")

  private def distinctWords(spark: SparkSession, dir: String): DataFrame =
    tokenInstances(spark, dir).groupBy("word")
      .agg(count(lit(1)).as("wfreq"))

  /** Registered `text_wordpiece` query: per-source word/piece counts
    * and fertility under the corpus-trained inventory.
    */
  def wordpieceStats(spark: SparkSession, dir: String): DataFrame =
    wordpieceStatsAt(spark, dir, TopV, MaxPieceLen)

  def wordpieceStatsAt(spark: SparkSession, dir: String, topV: Int,
      maxLen: Int): DataFrame = {
    val vocab = trainVocab(spark, dir, topV, maxLen)
    tokenInstances(spark, dir)
      .select(col("source"),
        Wordpiece.greedyPieceCount(col("word"), vocab).as("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"), sum(col("n").cast("long")).as("n_pieces"))
      .withColumn("fertility", col("n_pieces").cast("double") / col("n_words"))
      .orderBy("source")
  }

  val wordpieceStatsSql: String =
    s"""WITH tok AS (
       |  SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |  FROM documents),
       |tokf AS (SELECT source, word FROM tok WHERE word <> ''),
       |dw AS (SELECT word, count(*) AS wfreq FROM tokf GROUP BY word),
       |subs AS (
       |  SELECT substr(dw.word, s.i, l.j) AS piece, sum(dw.wfreq) AS freq
       |  FROM dw,
       |  LATERAL (SELECT unnest(range(1, length(dw.word) + 1)) AS i) s
       |  CROSS JOIN (SELECT unnest(range(2, ${MaxPieceLen + 1})) AS j) l
       |  WHERE s.i + l.j - 1 <= length(dw.word)
       |  GROUP BY 1),
       |topv AS (SELECT piece FROM subs ORDER BY freq DESC, piece LIMIT $TopV),
       |chars AS (
       |  SELECT DISTINCT substr(dw.word, s.i, 1) AS piece
       |  FROM dw,
       |  LATERAL (SELECT unnest(range(1, length(dw.word) + 1)) AS i) s),
       |vocab AS (
       |  SELECT DISTINCT piece FROM (
       |    SELECT piece FROM topv UNION ALL SELECT piece FROM chars)),
       |seg AS (
       |  WITH RECURSIVE r AS (
       |    SELECT word, 0 AS pos, 0 AS n FROM dw
       |    UNION ALL
       |    SELECT r.word, r.pos + length(v.piece), r.n + 1
       |    FROM r JOIN vocab v
       |      ON r.pos < length(r.word)
       |     AND substr(r.word, r.pos + 1, length(v.piece)) = v.piece
       |    WHERE NOT EXISTS (
       |      SELECT 1 FROM vocab v2
       |      WHERE length(v2.piece) > length(v.piece)
       |        AND substr(r.word, r.pos + 1, length(v2.piece)) = v2.piece))
       |  SELECT word, n FROM r WHERE pos = length(word))
       |SELECT t.source,
       |       count(*) AS n_words,
       |       CAST(sum(seg.n) AS BIGINT) AS n_pieces,
       |       CAST(sum(seg.n) AS DOUBLE) / count(*) AS fertility
       |FROM tokf t JOIN seg ON seg.word = t.word
       |GROUP BY t.source
       |ORDER BY t.source""".stripMargin

  // ---- unigram Viterbi segmentation -----------------------------------------

  /** Unrolled DP depth in the oracle twin = the engine's segmentation
    * window ([[graft.functions.Viterbi.WindowCp]]): the twin pre-splits
    * every word into ≤ this many codepoints per window (the SAME split
    * the engine applies to ≥ 64-cp words) and replays the windowed DP
    * exactly, so arbitrarily long words (URLs, base64 runs) verify
    * instead of silently leaving the oracle's domain. A word whose
    * window is UNREACHABLE (vocab contract violation) is dropped by the
    * twin while the engine counts it with the -1 sentinel — a loud
    * row-count mismatch, as before.
    */
  val ViterbiUnroll: Int = graft.functions.Viterbi.WindowCp

  /** Scored piece inventory for the unigram model: substrings of length
    * 1..maxLen over distinct words, freq = occurrence-weighted word
    * frequency; vocab = top-V by (freq desc, piece asc) ∪ every
    * single-codepoint piece; score = the [[graft.functions.FixLog2]]
    * fixed-point log2 of freq — pure-integer, hash-checkable.
    */
  def trainScoredVocab(spark: SparkSession, dir: String, topV: Int,
      maxLen: Int): Map[String, Long] = {
    val subs = distinctWords(spark, dir)
      .withColumn("i", explode(sequence(lit(1), length(col("word")))))
      .withColumn("j", explode(sequence(lit(1), lit(maxLen))))
      .filter(col("i") + col("j") - lit(1) <= length(col("word")))
      .select(expr("substr(word, i, j)").as("piece"), col("wfreq"))
      .groupBy("piece").agg(sum("wfreq").as("freq"))
      .localCheckpoint(eager = false)
    val top = subs.orderBy(col("freq").desc, col("piece"))
      .limit(topV).collect().map(r => (r.getString(0), r.getLong(1)))
    val chars = subs.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    (top ++ chars).toMap.map { case (p, f) =>
      p -> graft.functions.FixLog2.log2Fix16(f)
    }
  }

  /** Registered `text_unigram_viterbi` query: per-source word/piece
    * counts and total fixed-point log-score under OPTIMAL unigram
    * segmentation ([[graft.functions.ViterbiPieces]]) — the Viterbi
    * counterpart to [[wordpieceStats]]' greedy pass, completing the
    * tokenizer family (BPE train/apply, greedy WordPiece, unigram
    * Viterbi). Same scale shape: vocabulary-bound training, scan-local
    * apply, one rollup shuffle.
    */
  def unigramViterbi(spark: SparkSession, dir: String): DataFrame = {
    val vocab = trainScoredVocab(spark, dir, TopV, MaxPieceLen)
    tokenInstances(spark, dir)
      .select(col("source"),
        graft.functions.Viterbi.viterbiPieces(col("word"), vocab).as("v"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("v.n_pieces").cast("long")).as("n_pieces"),
        sum(col("v.sum_score")).as("sum_score"))
      .orderBy("source")
  }

  /** DuckDB twin: words pre-split into ≤ [[ViterbiUnroll]]-codepoint
    * windows (the engine's long-word split, identity for short words),
    * then the DP unrolled position by position over DISTINCT window
    * texts — `b_i` holds every window's best packed state ending at
    * codepoint i, each step a max over the ≤ maxLen piece lengths that
    * can end there (the [[Kmeans]] unrolled-CTE precedent, applied to a
    * DP instead of Lloyd iterations). Per-word totals are the integer
    * sums of the per-window unpacked (n_pieces, sum_score), exactly the
    * engine's accumulation.
    */
  val unigramViterbiSql: String = {
    val L = graft.functions.FixLog2.sqlL("freq")
    val W = ViterbiUnroll
    val steps = (1 to ViterbiUnroll).map { i =>
      val branches = (1 to math.min(MaxPieceLen, i)).map { j =>
        s"""    SELECT m.wtext, b.packed + m.score * 64 - 1 AS packed
           |    FROM b${i - j} b JOIN m ON m.wtext = b.wtext AND m.start = ${i - j + 1} AND m.len = $j"""
          .stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""b$i AS MATERIALIZED (
         |  SELECT wtext, max(packed) AS packed FROM (
         |$branches) GROUP BY wtext)"""
        .stripMargin
    }.mkString(",\n")
    val resUnion = (1 to ViterbiUnroll)
      .map(i => s"  SELECT wtext, packed, $i AS wl FROM b$i")
      .mkString("\n  UNION ALL\n")
    s"""WITH tok AS (
       |  SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |  FROM documents),
       |tokf AS MATERIALIZED (SELECT source, word FROM tok WHERE word <> ''),
       |dw AS MATERIALIZED (SELECT word, count(*) AS wfreq FROM tokf GROUP BY word),
       |subs AS MATERIALIZED (
       |  SELECT substr(dw.word, s.i, l.j) AS piece, sum(dw.wfreq) AS freq
       |  FROM dw,
       |  LATERAL (SELECT unnest(range(1, length(dw.word) + 1)) AS i) s
       |  CROSS JOIN (SELECT unnest(range(1, ${MaxPieceLen + 1})) AS j) l
       |  WHERE s.i + l.j - 1 <= length(dw.word)
       |  GROUP BY 1),
       |topv AS (SELECT piece, freq FROM subs ORDER BY freq DESC, piece LIMIT $TopV),
       |vocabf AS (
       |  SELECT piece, max(freq) AS freq FROM (
       |    SELECT piece, freq FROM topv
       |    UNION ALL SELECT piece, freq FROM subs WHERE length(piece) = 1)
       |  GROUP BY piece),
       |v AS MATERIALIZED (SELECT piece, CAST($L AS BIGINT) AS score FROM vocabf),
       |win AS MATERIALIZED (
       |  SELECT dw.word, substr(dw.word, w.k * $W + 1, $W) AS wtext
       |  FROM dw,
       |  LATERAL (SELECT unnest(range(0, (length(dw.word) + ${W - 1}) // $W)) AS k) w),
       |dwin AS MATERIALIZED (SELECT DISTINCT wtext FROM win),
       |m AS MATERIALIZED (
       |  SELECT dwin.wtext, s.i AS start, length(v.piece) AS len, v.score
       |  FROM dwin,
       |  LATERAL (SELECT unnest(range(1, length(dwin.wtext) + 1)) AS i) s
       |  JOIN v ON v.piece = substr(dwin.wtext, s.i, length(v.piece))),
       |b0 AS MATERIALIZED (SELECT wtext, CAST(0 AS BIGINT) AS packed FROM dwin),
       |$steps,
       |res AS (
       |$resUnion),
       |segw AS (
       |  SELECT r.wtext, r.packed FROM res r
       |  JOIN dwin d ON d.wtext = r.wtext AND length(d.wtext) = r.wl),
       |pww AS MATERIALIZED (
       |  SELECT wtext,
       |         (64 - ((packed % 64) + 64) % 64) % 64 AS n_pieces,
       |         (packed + (64 - ((packed % 64) + 64) % 64) % 64) // 64 AS sum_score
       |  FROM segw),
       |pw AS (
       |  SELECT win.word,
       |         sum(pww.n_pieces) AS n_pieces,
       |         sum(pww.sum_score) AS sum_score
       |  FROM win JOIN pww ON pww.wtext = win.wtext
       |  GROUP BY win.word
       |  HAVING count(*) = (length(win.word) + ${W - 1}) // $W)
       |SELECT t.source, count(*) AS n_words,
       |       CAST(sum(pw.n_pieces) AS BIGINT) AS n_pieces,
       |       CAST(sum(pw.sum_score) AS BIGINT) AS sum_score
       |FROM tokf t JOIN pw ON pw.word = t.word
       |GROUP BY t.source ORDER BY t.source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_wordpiece" -> (wordpieceStats _),
    "text_unigram_viterbi" -> (unigramViterbi _))

  val oracles: Map[String, String] = Map(
    "text_wordpiece" -> wordpieceStatsSql,
    "text_unigram_viterbi" -> unigramViterbiSql)
}
