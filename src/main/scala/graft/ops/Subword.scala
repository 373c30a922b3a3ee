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

  /** Planted long-word document UNIONed into the two unigram queries'
    * corpus, engine and twin alike (the [[Dedup.adversarialDocs]]
    * fixture pattern): the shared corpus's longest word is 8 codepoints,
    * so without it CORRECTNESS never drives the ≥[[ViterbiUnroll]]-cp
    * window machinery through the driver's oracle — the windowed DP was
    * spec-covered but oracle-idle. The 130-cp word splits 63+63+4, the
    * 72-cp word 63+9; both now hash-check end to end in
    * `text_unigram_viterbi` and `text_unigram_em`.
    */
  private[ops] val LongWordText: String =
    ("abcdefghij" * 13) + " " + ("tokenization" * 6)
  private[ops] val LongWordSource = "zz_planted_longword"

  private def unigramDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Catalog(spark, dir).ref("documents").select(col("source"), col("text"))
      .unionByName(Seq((LongWordSource, LongWordText)).toDF("source", "text"))
  }

  private def unigramTokenInstances(spark: SparkSession, dir: String): DataFrame =
    unigramDocs(spark, dir)
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")

  private def unigramDistinctWords(spark: SparkSession, dir: String): DataFrame =
    unigramTokenInstances(spark, dir).groupBy("word")
      .agg(count(lit(1)).as("wfreq"))

  /** The union CTE prefix both unigram twins read `tok` from. */
  private def unigramDocsSql: String =
    s"""docs_u AS (
       |  SELECT source, text FROM documents
       |  UNION ALL SELECT '$LongWordSource' AS source, '$LongWordText' AS text)"""
      .stripMargin

  /** Scored piece inventory for the unigram model: substrings of length
    * 1..maxLen over distinct words, freq = occurrence-weighted word
    * frequency; vocab = top-V by (freq desc, piece asc) ∪ every
    * single-codepoint piece; score = the [[graft.functions.FixLog2]]
    * fixed-point log2 of freq — pure-integer, hash-checkable.
    */
  def trainScoredVocab(spark: SparkSession, dir: String, topV: Int,
      maxLen: Int): Map[String, Long] =
    trainScoredVocabOn(distinctWords(spark, dir), topV, maxLen)

  private def trainScoredVocabOn(dw: DataFrame, topV: Int,
      maxLen: Int): Map[String, Long] = {
    val subs = dw
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
    val vocab = trainScoredVocabOn(unigramDistinctWords(spark, dir), TopV, MaxPieceLen)
    unigramTokenInstances(spark, dir)
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
    s"""WITH $unigramDocsSql,
       |tok AS (
       |  SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |  FROM docs_u),
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

  // ---- unigram-LM EM training ----------------------------------------------

  /** EM rounds the registered `text_unigram_em` query trains for. */
  val EmRounds = 2

  /** SentencePiece-style Viterbi-EM unigram training (Kudo 2018,
    * arXiv:1804.10959 §3.2, hard-assignment variant): starting from the
    * substring-frequency seed vocabulary ([[trainScoredVocab]]),
    * each round re-segments every DISTINCT word under the current model
    * (E-step: [[graft.functions.ViterbiSegmentPieces]] exploded +
    * wfreq-weighted piece counts — a distributed aggregate bounded by
    * |vocab| output rows) and re-scores pieces from their counts
    * (M-step: score = L(max(count,1)) − L(Σcounts) in [[graft
    * .functions.FixLog2]] fixed point — the integer log-probability —
    * with unused multi-codepoint pieces PRUNED and every
    * single-codepoint piece kept at the count-1 floor so segmentation
    * stays total). Returns the seed plus one vocab per round.
    *
    * Scale shape: per round, one distinct-word scan (pieces ride the
    * expression, no join) into a ≤|vocab|-row aggregate; the model is
    * bounded driver metadata throughout — corpus size only changes the
    * scan, exactly the [[BpeTrain]] argument.
    */
  def emVocabs(spark: SparkSession, dir: String, rounds: Int): Seq[Map[String, Long]] = {
    import graft.functions.FixLog2
    val dw = unigramDistinctWords(spark, dir).localCheckpoint()
    val seed = trainScoredVocabOn(dw, TopV, MaxPieceLen)
    val singles = seed.keySet.filter(p => p.codePointCount(0, p.length) == 1)
    val out = scala.collection.mutable.ArrayBuffer(seed)
    var vocab = seed
    (1 to rounds).foreach { _ =>
      val counts = dw
        .select(col("wfreq"),
          explode(graft.functions.Viterbi.viterbiSegmentPieces(col("word"), vocab)).as("piece"))
        .groupBy("piece").agg(sum(col("wfreq")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val lt = FixLog2.log2Fix16(counts.values.sum)
      vocab = (counts.keySet ++ singles).iterator.map { p =>
        p -> (FixLog2.log2Fix16(math.max(counts.getOrElse(p, 0L), 1L)) - lt)
      }.toMap
      out += vocab
    }
    out.toSeq
  }

  /** Registered `text_unigram_em` query: the [[unigramViterbi]] rollup
    * under the EM-trained model — per-source word/piece counts and
    * total fixed-point log-probability after [[EmRounds]] rounds.
    */
  def unigramEm(spark: SparkSession, dir: String): DataFrame = {
    val vocab = emVocabs(spark, dir, EmRounds).last
    unigramTokenInstances(spark, dir)
      .select(col("source"),
        graft.functions.Viterbi.viterbiPieces(col("word"), vocab).as("v"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("v.n_pieces").cast("long")).as("n_pieces"),
        sum(col("v.sum_score")).as("sum_score"))
      .orderBy("source")
  }

  // -- oracle twin assembly helpers (per-round DP forward + backwalk) --------

  /** Forward DP step CTEs `<p>1..<p>63` over window texts, reading
    * matches from `<mName>` (same shape as the stats twin's steps).
    */
  private def dpStepsSql(p: String, mName: String): String =
    (1 to ViterbiUnroll).map { i =>
      val branches = (1 to math.min(MaxPieceLen, i)).map { j =>
        s"""    SELECT m.wtext, b.packed + m.score * 64 - 1 AS packed
           |    FROM $p${i - j} b JOIN $mName m ON m.wtext = b.wtext AND m.start = ${i - j + 1} AND m.len = $j"""
          .stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""$p$i AS MATERIALIZED (
         |  SELECT wtext, max(packed) AS packed FROM (
         |$branches) GROUP BY wtext)"""
        .stripMargin
    }.mkString(",\n")

  /** One EM round as CTE text: matches `<mName>` against vocab CTE
    * `<vIn>`, forward DP (prefix `<p>`), shortest-piece backwalk, piece
    * counts, and the re-scored vocab CTE `<vOut>`. The backwalk is the
    * SQL mirror of [[graft.functions.ViterbiSegmentPieces]]: `pick` =
    * min piece length attaining each position's optimal packed value,
    * `walk` the recursive descent from each window's end.
    */
  private def emRoundSql(r: Int, vIn: String, vOut: String): String = {
    val p = s"x${r}_"
    val L = graft.functions.FixLog2
    val W = ViterbiUnroll
    s"""m$r AS MATERIALIZED (
       |  SELECT dwin.wtext, s.i AS start, length($vIn.piece) AS len, $vIn.score
       |  FROM dwin,
       |  LATERAL (SELECT unnest(range(1, length(dwin.wtext) + 1)) AS i) s
       |  JOIN $vIn ON $vIn.piece = substr(dwin.wtext, s.i, length($vIn.piece))),
       |${p}0 AS MATERIALIZED (SELECT wtext, CAST(0 AS BIGINT) AS packed FROM dwin),
       |${dpStepsSql(p, s"m$r")},
       |allb$r AS MATERIALIZED (
       |  SELECT wtext, 0 AS pos, CAST(0 AS BIGINT) AS packed FROM dwin
       |  UNION ALL
       |${(1 to ViterbiUnroll).map(i => s"  SELECT wtext, $i AS pos, packed FROM $p$i").mkString("\n  UNION ALL\n")}),
       |pick$r AS MATERIALIZED (
       |  SELECT cur.wtext, cur.pos, min(m.len) AS len
       |  FROM allb$r cur
       |  JOIN m$r m ON m.wtext = cur.wtext AND m.start = cur.pos - m.len + 1
       |  JOIN allb$r prev ON prev.wtext = cur.wtext AND prev.pos = cur.pos - m.len
       |  WHERE cur.pos > 0 AND prev.packed + m.score * 64 - 1 = cur.packed
       |  GROUP BY 1, 2),
       |walk$r AS MATERIALIZED (
       |  WITH RECURSIVE w AS (
       |    SELECT wtext, length(wtext) AS pos FROM dwin
       |    UNION ALL
       |    SELECT w.wtext, w.pos - p.len
       |    FROM w JOIN pick$r p ON p.wtext = w.wtext AND p.pos = w.pos
       |    WHERE w.pos > 0)
       |  SELECT * FROM w),
       |eseg$r AS (
       |  SELECT w.wtext, substr(w.wtext, w.pos - p.len + 1, p.len) AS piece
       |  FROM walk$r w JOIN pick$r p ON p.wtext = w.wtext AND p.pos = w.pos
       |  WHERE w.pos > 0),
       |wok$r AS MATERIALIZED (
       |  -- words with EVERY window reachable under this round's vocab:
       |  -- the engine's ViterbiSegmentPieces returns null for the WHOLE
       |  -- word when any window is unreachable (vocab-contract
       |  -- violation), so a word missing one window must contribute
       |  -- zero counts here too, not its reachable windows' pieces
       |  SELECT win.word
       |  FROM win JOIN allb$r b
       |    ON b.wtext = win.wtext AND b.pos = length(win.wtext)
       |  GROUP BY win.word
       |  HAVING count(*) = (length(win.word) + ${W - 1}) // $W),
       |ecnt$r AS MATERIALIZED (
       |  SELECT s.piece, CAST(sum(dw.wfreq) AS BIGINT) AS cnt
       |  FROM win JOIN eseg$r s ON s.wtext = win.wtext
       |  JOIN dw ON dw.word = win.word
       |  JOIN wok$r ON wok$r.word = win.word
       |  GROUP BY 1),
       |tot$r AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM ecnt$r),
       |vc$r AS (
       |  SELECT piece, cnt FROM ecnt$r
       |  UNION ALL
       |  SELECT c.piece, CAST(0 AS BIGINT) AS cnt FROM chars c
       |  WHERE NOT EXISTS (SELECT 1 FROM ecnt$r e WHERE e.piece = c.piece)),
       |$vOut AS MATERIALIZED (
       |  SELECT piece,
       |         CAST(${L.sqlL("greatest(cnt, 1)")} AS BIGINT)
       |           - CAST(${L.sqlL("t")} AS BIGINT) AS score
       |  FROM vc$r CROSS JOIN tot$r)""".stripMargin
  }

  /** DuckDB twin of [[unigramEm]]: the seed-vocab CTEs of the stats
    * twin, then [[EmRounds]] E/M rounds CTE-for-CTE (forward DP +
    * shortest-piece backwalk + FixLog2 re-scoring), then the stats DP
    * under the final vocab — every step integer/fixed-point, so the
    * whole trained pipeline hash-checks across engines.
    */
  val unigramEmSql: String = {
    val L = graft.functions.FixLog2.sqlL("freq")
    val W = ViterbiUnroll
    val rounds = (1 to EmRounds)
      .map(r => emRoundSql(r, s"v${r - 1}", s"v$r")).mkString(",\n")
    val fp = "f_"
    s"""WITH $unigramDocsSql,
       |tok AS (
       |  SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |  FROM docs_u),
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
       |chars AS MATERIALIZED (SELECT piece FROM vocabf WHERE length(piece) = 1),
       |v0 AS MATERIALIZED (SELECT piece, CAST($L AS BIGINT) AS score FROM vocabf),
       |win AS MATERIALIZED (
       |  SELECT dw.word, substr(dw.word, w.k * $W + 1, $W) AS wtext
       |  FROM dw,
       |  LATERAL (SELECT unnest(range(0, (length(dw.word) + ${W - 1}) // $W)) AS k) w),
       |dwin AS MATERIALIZED (SELECT DISTINCT wtext FROM win),
       |$rounds,
       |mf AS MATERIALIZED (
       |  SELECT dwin.wtext, s.i AS start, length(v$EmRounds.piece) AS len, v$EmRounds.score
       |  FROM dwin,
       |  LATERAL (SELECT unnest(range(1, length(dwin.wtext) + 1)) AS i) s
       |  JOIN v$EmRounds ON v$EmRounds.piece = substr(dwin.wtext, s.i, length(v$EmRounds.piece))),
       |${fp}0 AS MATERIALIZED (SELECT wtext, CAST(0 AS BIGINT) AS packed FROM dwin),
       |${dpStepsSql(fp, "mf")},
       |resf AS (
       |${(1 to ViterbiUnroll).map(i => s"  SELECT wtext, packed, $i AS wl FROM $fp$i").mkString("\n  UNION ALL\n")}),
       |segwf AS (
       |  SELECT r.wtext, r.packed FROM resf r
       |  JOIN dwin d ON d.wtext = r.wtext AND length(d.wtext) = r.wl),
       |pwwf AS MATERIALIZED (
       |  SELECT wtext,
       |         (64 - ((packed % 64) + 64) % 64) % 64 AS n_pieces,
       |         (packed + (64 - ((packed % 64) + 64) % 64) % 64) // 64 AS sum_score
       |  FROM segwf),
       |pwf AS (
       |  SELECT win.word,
       |         sum(pwwf.n_pieces) AS n_pieces,
       |         sum(pwwf.sum_score) AS sum_score
       |  FROM win JOIN pwwf ON pwwf.wtext = win.wtext
       |  GROUP BY win.word
       |  HAVING count(*) = (length(win.word) + ${W - 1}) // $W)
       |SELECT t.source, count(*) AS n_words,
       |       CAST(sum(pwf.n_pieces) AS BIGINT) AS n_pieces,
       |       CAST(sum(pwf.sum_score) AS BIGINT) AS sum_score
       |FROM tokf t JOIN pwf ON pwf.word = t.word
       |GROUP BY t.source ORDER BY t.source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_wordpiece" -> (wordpieceStats _),
    "text_unigram_viterbi" -> (unigramViterbi _),
    "text_unigram_em" -> (unigramEm _))

  val oracles: Map[String, String] = Map(
    "text_wordpiece" -> wordpieceStatsSql,
    "text_unigram_viterbi" -> unigramViterbiSql,
    "text_unigram_em" -> unigramEmSql)
}
