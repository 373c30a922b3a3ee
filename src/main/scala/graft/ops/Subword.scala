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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_wordpiece" -> (wordpieceStats _))

  val oracles: Map[String, String] = Map(
    "text_wordpiece" -> wordpieceStatsSql)
}
