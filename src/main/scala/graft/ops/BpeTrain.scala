package graft.ops

import scala.collection.concurrent.TrieMap
import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.Bpe

/** Corpus-trained BPE merge tables — the public iterative
  * pair-frequency algorithm (Sennrich et al. 2016, arXiv:1508.07909,
  * "learn_bpe"): start from per-word codepoint sequences weighted by
  * corpus frequency; N times, count adjacent symbol pairs and merge the
  * most frequent one everywhere (ties broken by the lexicographically
  * smallest (left, right) pair, bytewise). Replaces the shipped fixed
  * table ([[graft.functions.Bpe.merges]]) with merges learned from the
  * corpus being priced, so token budgets stop mispricing non-English
  * and code-heavy sources.
  *
  * Scale shape (hybrid, the [[Dedup.duplicateClustersAt]] pattern): the
  * corpus-sized work is ONE distributed word-count aggregate (map-side
  * combined) — everything after operates on the DISTINCT-WORD
  * vocabulary, orders of magnitude smaller than the corpus. When the
  * vocabulary fits the driver (`driverThreshold` words — the only
  * data-sized collect, bounded like the cluster probe) the N-round
  * refinement runs locally in microseconds; past the threshold the
  * distributed loop takes over: each round one pair-count aggregate
  * (map-side combined) + a 1-row argmax collect + a broadcast rewrite
  * of the winning merge, localCheckpoint-pinned per round. Both paths
  * produce identical merges (BpeTrainSpec asserts it).
  */
object BpeTrain {

  val DefaultMerges = 64

  /** (word, freq) over the same tokenizer the BPE counters price:
    * `\s+` on trim(lower(text)), empty words dropped.
    */
  private def vocabDf(spark: SparkSession, dir: String): DataFrame =
    Catalog(spark, dir).ref("documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  private val cache = TrieMap.empty[(String, Int, Long), Seq[(String, String, Long)]]

  /** The learned table: (left, right, pairFreq) in rank order. Memoized
    * per (dir, n, driverThreshold) — training is deterministic, so one
    * derivation per corpus per session serves every consumer; the
    * threshold is part of the key so a caller that forces the
    * distributed path (ScaleProbe's driverThreshold = 0 timing probe)
    * can never be served a cached driver-path result.
    */
  def trainedMerges(spark: SparkSession, dir: String, n: Int = DefaultMerges,
      driverThreshold: Long = 1L << 20): Seq[(String, String, Long)] =
    cache.getOrElseUpdate((dir, n, driverThreshold), {
      val vocab = vocabDf(spark, dir)
      val probe = vocab.limit(driverThreshold.toInt + 1).collect()
      if (probe.length <= driverThreshold)
        trainDriver(probe.map(r => (r.getString(0), r.getLong(1))), n)
      else trainDistributed(vocab, n)
    })

  /** Bytewise (UTF-8) string order — what both Spark (UTF8String) and
    * DuckDB (binary collation) sort VARCHAR by, so the driver path
    * breaks ties identically to the engines.
    */
  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  private[ops] def trainDriver(vocab0: Array[(String, Long)],
      n: Int): Seq[(String, String, Long)] = {
    var vocab: Array[(List[String], Long)] =
      vocab0.map { case (w, f) => (Bpe.codepoints(w), f) }
        .filter(_._1.lengthCompare(1) > 0)
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < n && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + f)
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), f) = counts.reduce { (a, b) =>
          if (a._2 != b._2) { if (a._2 > b._2) a else b }
          else if (a._1._1 != b._1._1) { if (utf8Lt(a._1._1, b._1._1)) a else b }
          else if (utf8Lt(a._1._2, b._1._2)) a else b
        }
        out += ((l, r, f))
        vocab = vocab.map { case (syms, fq) => (Bpe.mergeOnce(syms, l, r), fq) }
          .filter(_._1.lengthCompare(1) > 0)
        k += 1
      }
    }
    out.result()
  }

  /** One left-to-right non-overlapping merge pass as a Catalyst fold —
    * the exact [[Bpe.mergeOnce]] semantics (a merged token can never
    * re-merge as a left side within the pass because l+r is strictly
    * longer than l).
    */
  private def mergeFold(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  private[ops] def trainDistributed(vocab0: DataFrame,
      n: Int): Seq[(String, String, Long)] = {
    // single-symbol words can never pair again — drop them as they arise
    var vocab = vocab0
      .select(col("freq"), expr(
        "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))").as("syms"))
      .filter(size(col("syms")) > 1)
      .localCheckpoint()
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < n && !exhausted) {
      val best = vocab
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((l, r, f))
        vocab = vocab
          .withColumn("syms", mergeFold(col("syms"), l, r))
          .filter(size(col("syms")) > 1)
          .localCheckpoint()
        k += 1
      }
    }
    out.result()
  }

  /** The oracle row: the learned table itself, (rank, l, r, freq). */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, dir).zipWithIndex
      .map { case ((l, r, f), i) => ((i + 1).toLong, l, r, f) }
      .toDF("rank", "l", "r", "freq")
  }

  /** The training recursion as DuckDB CTEs (expects a `WITH RECURSIVE`
    * prefix): bst carries the WHOLE vocabulary as one state row per
    * iteration — pair counting unnests it relationally (a real GROUP
    * BY, not a quadratic list scan) and the rewrite replays the
    * [[Bpe.mergeOnce]] fold via list_reduce with a chr(1)-joined
    * accumulator (the [[TextAnalysis]] BPE-application pattern).
    */
  def bpeTrainCtes(n: Int): String =
    s"""btok AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |         FROM documents),
       |bv0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM btok
       |        WHERE word <> '' GROUP BY word),
       |bst(iter, vocab, l, r, f) AS (
       |  SELECT 0,
       |         (SELECT list({syms: list_transform(range(1, len(word)+1), i -> word[i:i]),
       |                       freq: freq}) FROM bv0),
       |         NULL::VARCHAR, NULL::VARCHAR, NULL::BIGINT
       |  UNION ALL
       |  SELECT iter + 1,
       |         list_transform(vocab, w -> {syms:
       |           string_split(
       |             list_reduce(w.syms, (acc, t) ->
       |               CASE WHEN string_split(acc, chr(1))[-1] = best.bl AND t = best.br
       |               THEN acc[1:len(acc) - len(best.bl)] || best.bl || best.br
       |               ELSE acc || chr(1) || t END),
       |             chr(1)), freq: w.freq}),
       |         best.bl, best.br, best.bf
       |  FROM (
       |    SELECT iter, vocab,
       |      (SELECT {bl: pl, br: pr2, bf: pf} FROM (
       |          SELECT pe.p[1] AS pl, pe.p[2] AS pr2, CAST(sum(pe.f) AS BIGINT) AS pf
       |          FROM (SELECT unnest(flatten(list_transform(vocab, w ->
       |                   list_transform(range(1, len(w.syms)),
       |                     i -> {p: [w.syms[i], w.syms[i+1]], f: w.freq})))) AS pe)
       |          GROUP BY 1, 2
       |          ORDER BY pf DESC, pl, pr2 LIMIT 1)) AS best
       |    FROM bst WHERE iter < $n) s
       |  WHERE s.best.bl IS NOT NULL)""".stripMargin

  val bpeTrainSql: String =
    "WITH RECURSIVE\n" + bpeTrainCtes(DefaultMerges) + "\n" +
      "SELECT CAST(iter AS BIGINT) AS rank, l, r, f AS freq FROM bst WHERE iter >= 1 ORDER BY rank"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_train" -> (bpeTrain _))

  val oracles: Map[String, String] = Map(
    "text_bpe_train" -> bpeTrainSql)
}
