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

  private val cache = TrieMap.empty[(String, Long, Int, Long), Seq[(String, String, Long)]]

  /** Cheap corpus fingerprint — total length + last-modified of the
    * documents table's files — so the training memo can never serve
    * stale merges after a harness rewrites the corpus in place
    * (ScaleProbe regenerates datasets within one JVM).
    */
  private[ops] def corpusFingerprint(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir, "documents.parquet")
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .foldLeft(0L) { (h, p) =>
            31L * (31L * h + java.nio.file.Files.size(p)) +
              java.nio.file.Files.getLastModifiedTime(p).toMillis
          }
      } finally s.close()
    }
  }

  /** The learned table: (left, right, pairFreq) in rank order. Memoized
    * per (dir, corpus fingerprint, n, driverThreshold) — training is
    * deterministic, so one derivation per corpus per session serves
    * every consumer; the fingerprint invalidates the memo if the data
    * at dir is rewritten, and the threshold is part of the key so a
    * caller that forces the distributed path (ScaleProbe's
    * driverThreshold = 0 timing probe) can never be served a cached
    * driver-path result.
    */
  def trainedMerges(spark: SparkSession, dir: String, n: Int = DefaultMerges,
      driverThreshold: Long = 1L << 20): Seq[(String, String, Long)] =
    cache.getOrElseUpdate((dir, corpusFingerprint(dir), n, driverThreshold), {
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

  // ---------------------------------------------------------------- batched

  /** Snapshot-batched training parameters: up to [[DefaultBatch]]
    * symbol-disjoint merges accepted per pass from the top
    * [[DefaultCandidates]] pair candidates of the PASS-START frequency
    * snapshot. Batching cuts the sequential driver round-trips from one
    * per merge to one per pass (O(N/B) Spark jobs for an N-merge
    * vocabulary) — the known remedy for the one-job-per-merge scale
    * ceiling of [[trainDistributed]]. The batched sequence is its own
    * deterministic, engine-replayable semantics (greedy-skip over the
    * snapshot); with B = 1 it reduces exactly to the sequential
    * algorithm (BpeTrainSpec proves it).
    */
  val DefaultBatch = 8
  val DefaultCandidates = 32
  val DefaultBatchedMerges = 256

  /** One pass' greedy selection — scan candidates in (freq DESC, l, r)
    * order, accept a pair iff neither symbol appears in an
    * already-accepted pair (disjointness makes simultaneous application
    * ≡ sequential application: no two rules' matches can overlap, so
    * one left-to-right fold applying "any accepted rule" equals
    * applying each rule's own fold in acceptance order), stop at cap.
    */
  private[ops] def greedyAccept(cands: Seq[(String, String, Long)],
      cap: Int): Seq[(String, String, Long)] = {
    val accepted = Seq.newBuilder[(String, String, Long)]
    val used = mutable.HashSet.empty[String]
    var taken = 0
    val it = cands.iterator
    while (taken < cap && it.hasNext) {
      val c @ (l, r, _) = it.next()
      if (!used(l) && !used(r)) {
        accepted += c; used += l; used += r; taken += 1
      }
    }
    accepted.result()
  }

  private def sortCandidates(counts: collection.Map[(String, String), Long],
      k: Int): Seq[(String, String, Long)] =
    counts.toSeq.map { case ((l, r), f) => (l, r, f) }
      .sortWith { (a, b) =>
        if (a._3 != b._3) a._3 > b._3
        else if (a._1 != b._1) utf8Lt(a._1, b._1)
        else utf8Lt(a._2, b._2)
      }.take(k)

  /** Batched driver path: (pass, l, r, freq) in acceptance order. */
  private[ops] def trainDriverBatched(vocab0: Array[(String, Long)], n: Int,
      b: Int = DefaultBatch, k: Int = DefaultCandidates): Seq[(Int, String, String, Long)] = {
    require(b >= 1 && k >= b, s"need 1 <= B <= K, got B=$b K=$k")
    var vocab: Array[(List[String], Long)] =
      vocab0.map { case (w, f) => (Bpe.codepoints(w), f) }
        .filter(_._1.lengthCompare(1) > 0)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var total = 0
    var pass = 0
    var exhausted = false
    while (total < n && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + f)
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val accepted = greedyAccept(sortCandidates(counts, k), math.min(b, n - total))
        pass += 1
        val rules = accepted.map { case (l, r, _) => (l, r) -> (l + r) }.toMap
        vocab = vocab.map { case (syms, fq) =>
          val res = mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (res.nonEmpty && rules.contains((res.last, x)))
              res(res.length - 1) = rules((res.last, x))
            else res += x
          }
          (res.toList, fq)
        }.filter(_._1.lengthCompare(1) > 0)
        accepted.foreach { case (l, r, f) => out += ((pass, l, r, f)) }
        total += accepted.size
      }
    }
    out.result()
  }

  /** Batched distributed path — per PASS: one map-side-combined
    * pair-count aggregate, one bounded top-K collect (K rows of driver
    * metadata, the argmax pattern widened), the greedy selection on the
    * driver, and ONE fold pass applying every accepted rule (the rules
    * chain inside a single aggregate lambda, so each word is rewritten
    * once per pass regardless of B).
    */
  private[ops] def trainDistributedBatched(vocab0: DataFrame, n: Int,
      b: Int = DefaultBatch, k: Int = DefaultCandidates): Seq[(Int, String, String, Long)] = {
    require(b >= 1 && k >= b, s"need 1 <= B <= K, got B=$b K=$k")
    var vocab = vocab0
      .select(col("freq"), expr(
        "transform(sequence(1, char_length(word)), i -> substring(word, i, 1))").as("syms"))
      .filter(size(col("syms")) > 1)
      .localCheckpoint()
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var total = 0
    var pass = 0
    var exhausted = false
    while (total < n && !exhausted) {
      val cands = vocab
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("l").asc, col("r").asc)
        .limit(k).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      if (cands.isEmpty) exhausted = true
      else {
        val accepted = greedyAccept(cands, math.min(b, n - total))
        pass += 1
        vocab = vocab
          .withColumn("syms", mergeFoldMulti(col("syms"),
            accepted.map { case (l, r, _) => (l, r) }))
          .filter(size(col("syms")) > 1)
          .localCheckpoint()
        accepted.foreach { case (l, r, f) => out += ((pass, l, r, f)) }
        total += accepted.size
      }
    }
    out.result()
  }

  /** One left-to-right pass applying EVERY rule in `rules` — sound
    * because accepted rules are symbol-disjoint (see [[greedyAccept]]).
    */
  private def mergeFoldMulti(syms: Column, rules: Seq[(String, String)]): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => {
        val append = concat(acc, array(x))
        rules.foldRight(append) { case ((l, r), els) =>
          when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(els)
        }
      })

  private val batchedCache =
    TrieMap.empty[(String, Long, Int, Int, Int, Long), Seq[(Int, String, String, Long)]]

  /** Batched twin of [[trainedMerges]], memoized with the same
    * stale-corpus protection.
    */
  def trainedMergesBatched(spark: SparkSession, dir: String,
      n: Int = DefaultBatchedMerges, b: Int = DefaultBatch, k: Int = DefaultCandidates,
      driverThreshold: Long = 1L << 20): Seq[(Int, String, String, Long)] =
    batchedCache.getOrElseUpdate((dir, corpusFingerprint(dir), n, b, k, driverThreshold), {
      val vocab = vocabDf(spark, dir)
      val probe = vocab.limit(driverThreshold.toInt + 1).collect()
      if (probe.length <= driverThreshold)
        trainDriverBatched(probe.map(r => (r.getString(0), r.getLong(1))), n, b, k)
      else trainDistributedBatched(vocab, n, b, k)
    })

  /** The batched oracle row: (rank, pass, l, r, freq) — the pass column
    * makes the oracle prove the BATCH structure, not just the merges.
    */
  def bpeTrainBatched(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainedMergesBatched(spark, dir).zipWithIndex
      .map { case ((p, l, r, f), i) => ((i + 1).toLong, p.toLong, l, r, f) }
      .toDF("rank", "pass", "l", "r", "freq")
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

  /** The BATCHED recursion as a DuckDB query replaying identical
    * iterations: per step, pair counts of the pass-start snapshot →
    * top-K candidates (sorted (f DESC, l, r)) → the [[greedyAccept]]
    * scan as a list_reduce (string-serialized accumulator — chr(1)
    * joins fields, chr(2) joins entries — because DuckDB 1.0's
    * list_reduce corrupts struct-list accumulators past a few elements)
    * → ONE [[Bpe.mergeOnce]]-style fold applying every accepted rule.
    * Within a pass acceptance order IS candidate order, so the final
    * rank is row_number over (pass, f DESC, l, r).
    */
  def bpeTrainBatchedSql(n: Int, b: Int, k: Int): String =
    s"""WITH RECURSIVE
       |btok AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |         FROM documents),
       |bv0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM btok
       |        WHERE word <> '' GROUP BY word),
       |bst(iter, tot, vocab, accepted) AS (
       |  SELECT 0, 0,
       |         (SELECT list({syms: list_transform(range(1, len(word)+1), i -> word[i:i]),
       |                       freq: freq}) FROM bv0 WHERE len(word) > 1),
       |         CAST(NULL AS STRUCT(l VARCHAR, r VARCHAR, f BIGINT)[])
       |  UNION ALL
       |  SELECT iter + 1, tot + len(acc2),
       |         list_filter(
       |           list_transform(vocab, w -> {syms:
       |             string_split(
       |               list_reduce(w.syms, (acc, t) ->
       |                 CASE WHEN list_contains(
       |                        list_transform(acc2, p -> p.l || chr(1) || p.r),
       |                        string_split(acc, chr(1))[-1] || chr(1) || t)
       |                 THEN acc[1:len(acc) - len(string_split(acc, chr(1))[-1])]
       |                        || string_split(acc, chr(1))[-1] || t
       |                 ELSE acc || chr(1) || t END),
       |               chr(1)), freq: w.freq}),
       |           w2 -> len(w2.syms) > 1),
       |         acc2
       |  FROM (
       |    SELECT iter, tot, vocab,
       |      list_transform(
       |        string_split(
       |          list_reduce(
       |            list_transform(cands, c2 -> c2.l || chr(1) || c2.r || chr(1) || CAST(c2.f AS VARCHAR)),
       |            (acc, x) ->
       |              CASE WHEN len(string_split(acc, chr(2))) >= least($b, $n - tot) THEN acc
       |                   WHEN list_has_any(
       |                          flatten(list_transform(string_split(acc, chr(2)),
       |                                                 e -> string_split(e, chr(1))[1:2])),
       |                          string_split(x, chr(1))[1:2]) THEN acc
       |                   ELSE acc || chr(2) || x END),
       |          chr(2)),
       |        e -> {l: string_split(e, chr(1))[1], r: string_split(e, chr(1))[2],
       |              f: CAST(string_split(e, chr(1))[3] AS BIGINT)}) AS acc2
       |    FROM (
       |      SELECT iter, tot, vocab,
       |        (SELECT list({l: pl, r: pr2, f: pf} ORDER BY pf DESC, pl, pr2) FROM (
       |            SELECT pe.p[1] AS pl, pe.p[2] AS pr2, CAST(sum(pe.f) AS BIGINT) AS pf
       |            FROM (SELECT unnest(flatten(list_transform(vocab, w ->
       |                     list_transform(range(1, len(w.syms)),
       |                       i -> {p: [w.syms[i], w.syms[i+1]], f: w.freq})))) AS pe)
       |            GROUP BY 1, 2
       |            ORDER BY pf DESC, pl, pr2 LIMIT $k)) AS cands
       |      FROM bst WHERE tot < $n) c0
       |    WHERE len(cands) > 0) s)
       |SELECT CAST(row_number() OVER (ORDER BY iter, a.f DESC, a.l, a.r) AS BIGINT) AS rank,
       |       CAST(iter AS BIGINT) AS pass, a.l, a.r, a.f AS freq
       |FROM (SELECT iter, unnest(accepted) AS a FROM bst WHERE iter >= 1)
       |ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_train" -> (bpeTrain _),
    "text_bpe_train_batched" -> (bpeTrainBatched _))

  val oracles: Map[String, String] = Map(
    "text_bpe_train" -> bpeTrainSql,
    "text_bpe_train_batched" ->
      bpeTrainBatchedSql(DefaultBatchedMerges, DefaultBatch, DefaultCandidates))
}
