package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Corpus keyword search — BM25 top-k over the `documents` table. The
  * retrieval side of a training-data pipeline: decontamination lookups,
  * quality-probe queries, "find me the docs about X" curation passes all
  * reduce to scoring a small query set against a huge corpus.
  *
  * Scale shape: the corpus-sized work is one tokenize+explode scan
  * filtered to the query vocabulary IMMEDIATELY (an `isin` on a literal
  * set — Catalyst folds it to a hash-set probe, so non-matching tokens
  * die in the scan stage and never shuffle), plus one (count, Σdl)
  * stats pass over the same scan — a corpus CONSTANT a production
  * deployment computes once and reuses across every query, not a
  * per-query cost (the code recomputes it per call because the harness
  * has no cross-query cache). Everything after is
  * per-(term, doc) aggregates of the surviving rows — at 100 TB the
  * shuffle is proportional to the posting lists of the queried terms,
  * not the corpus. The final per-query top-k is a rank window that
  * Spark's `WindowGroupLimit` rewrites to per-partition partial top-k
  * before the shuffle (pinned in PlanQualitySpec): a hot term with a
  * billion-doc posting list moves only k rows per map partition.
  *
  * Engine parity: classic BM25 idf is `ln((N-df+0.5)/(df+0.5))` — but
  * `ln` is libm, whose last-ulp behavior differs between the JVM and
  * DuckDB's C runtime (the repo-wide rule: no libm in oracle queries,
  * see TextAnalysis bigram-LM note). The oracle query therefore uses the
  * RATIONAL idf `(N-df+0.5)/(df+0.5)` (the log's argument — same
  * division, no transcendental): per-term ranking is identical (the
  * transform is monotone), cross-term weighting skews toward rare terms,
  * which for curation probes is the desired bias anyway. The true log
  * variant is [[bm25Log]], spec-checked against a plain-Scala reference
  * instead of DuckDB. k1 = 1.25 and b = 0.75 are exactly-representable
  * doubles, and the per-(query,doc) term sum is a sorted left fold over
  * ≤|query| doubles (see ops.Graph for why decimal accumulation is not
  * cross-engine-exact at full precision), so every score is
  * bit-identical to the twin's.
  */
object Search {

  val K1 = 1.25
  val B = 0.75

  /** The fixture query set: three multi-term queries over the testdata
    * vocabulary with deliberately spread document frequencies (stopword
    * 'the' vs mid-frequency 'spark'/'stream') so idf weighting is
    * exercised, not just tf.
    */
  val fixtureQueries: Seq[(String, String)] = Seq(
    "q1" -> "spark", "q1" -> "merge",
    "q2" -> "window", "q2" -> "hash", "q2" -> "stream",
    "q3" -> "the", "q3" -> "fast", "q3" -> "table")

  /** [[fixtureQueries]] plus the one query whose term dfs are actually
    * SKEWED in the synthetic corpus: 'dup' hits ~5% of docs while every
    * other vocabulary term hits ~77% (the generator has no Zipf tail),
    * so q4 is the query where MaxScore term bounds genuinely engage —
    * 'dup' seeds a high θ and the two common terms classify
    * non-essential. The uniform-df q1–q3 ride along to pin the
    * no-skew-no-pruning degrade under the same oracle.
    */
  val prunedFixtureQueries: Seq[(String, String)] = fixtureQueries ++ Seq(
    "q4" -> "dup", "q4" -> "the", "q4" -> "spark")

  /** (query_id, doc_id, tf, df, dl, n_docs, sum_dl) — the integer
    * sufficient statistics of BM25, shared by both scoring variants.
    */
  private def termStats(spark: SparkSession, dir: String,
      qs: Seq[(String, String)]): DataFrame =
    termStatsOver(
      Catalog(spark, dir).ref("documents")
        .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("t")),
      qs)

  /** Same statistics over any (doc_id, t: array<string>) unit relation —
    * documents for [[textBm25]], token-sliced chunks for [[chunkBm25]].
    */
  private def termStatsOver(docs: DataFrame,
      qs: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val totals = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(col("t")).cast("long")).as("sum_dl"))
    val terms = qs.map(_._2).distinct
    val tf = docs
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .join(broadcast(qs.toDF("query_id", "term")), Seq("term"))
      .crossJoin(broadcast(totals))
  }

  /** Per-term BM25 with a caller-supplied idf column (rational for the
    * oracle, ln for [[bm25Log]]); top-k per query by decimal-summed
    * score, ties broken by doc_id.
    */
  private[ops] def topK(stats: DataFrame, idf: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scores(stats, idf)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rnk"), col("score"))
      .orderBy("query_id", "rnk")
  }

  /** [[topK]] minus the page: the per-(query, doc) decimal-summed BM25
    * score — for compositions that rank by the score UNDER another gate
    * (relevance-fused phrase retrieval) rather than paging directly.
    * The sorted-list fold keeps the double sum order-deterministic, so
    * every consumer hashes identically against the twin's list_sort
    * reduce.
    */
  private[ops] def scores(stats: DataFrame,
      idf: org.apache.spark.sql.Column): DataFrame = {
    val tfn = (col("tf") * (K1 + 1)) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * (col("dl") / (col("sum_dl") / col("n_docs")))))
    stats
      .select(col("query_id"), col("doc_id"), (idf * tfn).as("s"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(array_sort(collect_list(col("s"))),
        lit(0.0), (acc, x) => acc + x).as("score"))
  }

  private[ops] val rationalIdf =
    (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)

  /** Oracle query: rational-idf BM25, top-5 per fixture query. */
  def textBm25(spark: SparkSession, dir: String): DataFrame =
    topK(termStats(spark, dir, fixtureQueries), rationalIdf, 5)

  /** True log-idf BM25 — production scoring; spec-checked against a
    * plain-Scala fold (SearchSpec), not the DuckDB oracle (libm).
    */
  def bm25Log(spark: SparkSession, dir: String,
      qs: Seq[(String, String)] = fixtureQueries, k: Int = 5): DataFrame =
    topK(termStats(spark, dir, qs),
      log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)), k)

  val textBm25Sql: String = textBm25SqlOver("documents")

  /** The same twin over a restricted corpus — what a takedown's oracle
    * needs: BM25 after a delete must equal this twin with the deleted
    * docs excluded AT THE SOURCE (stats, df, and ranks all shift).
    */
  def textBm25SqlWhere(pred: String): String =
    textBm25SqlOver(s"(SELECT * FROM documents WHERE $pred)")

  /** The twin over an arbitrary (doc_id, text) relation — an upsert's
    * oracle substitutes the effective post-upsert corpus.
    */
  def textBm25SqlOverRel(rel: String): String = textBm25SqlOver(rel)

  /** The twin with a metadata gate at the RANKING stage — the
    * [[LexIndex.bm25FilteredTopK]] contract: stats and df stay GLOBAL
    * (an allowed doc's score is identical to its unfiltered score),
    * only the rank window is restricted to docs passing `pred`
    * (referencing the documents row as `d`). Contrast
    * [[textBm25SqlWhere]], which removes docs AT THE SOURCE and shifts
    * every statistic — that is a takedown's oracle, not a filter's.
    */
  def textBm25SqlFilteredRank(pred: String): String = {
    val vals = fixtureQueries.map { case (q, t) => s"('$q', '$t')" }.mkString(", ")
    val terms = fixtureQueries.map(_._2).distinct.map(t => s"'$t'").mkString(", ")
    s"""WITH q(query_id, term) AS (VALUES $vals),
       |tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |        FROM documents),
       |${bm25ScoreCtes("q", terms)},
       |rk AS (SELECT sc.query_id, sc.doc_id, sc.score,
       |              row_number() OVER (PARTITION BY sc.query_id
       |                                 ORDER BY sc.score DESC, sc.doc_id) AS rnk
       |       FROM sc JOIN documents d ON d.doc_id = sc.doc_id
       |       WHERE $pred)
       |SELECT query_id, doc_id, rnk, score FROM rk
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  /** The BM25 scoring CTE family — the ONE copy of the twin-side
    * constants (K1=1.25/B=0.75 as 2.25/1.25/0.25/0.75) and the
    * sorted-sum determinism trick, parameterized by the (query_id,
    * term) relation to score for. Assumes a `tok(doc_id, t)` CTE is
    * already in scope; emits `stats/tl/tf/dfx/st/sc` with
    * `sc = (query_id, doc_id, score)`. Embedded by text_bm25's twin
    * and both relevance-fused positional twins, so a constant tune
    * cannot desynchronize one Spark/SQL pair.
    */
  private[ops] def bm25ScoreCtes(qRel: String, terms: String): String =
    s"""stats AS (SELECT count(*) AS n_docs, sum(len(t)) AS sum_dl FROM tok),
       |tl AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM tok),
       |tf AS (SELECT doc_id, term, dl, count(*) AS tf FROM tl
       |       WHERE term IN ($terms) GROUP BY 1, 2, 3),
       |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |st AS (
       |  SELECT $qRel.query_id, tf.doc_id,
       |         ((stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5)) *
       |         ((tf.tf * 2.25) /
       |          (tf.tf + 1.25 * (0.25 + 0.75 * (tf.dl / (stats.sum_dl / stats.n_docs))))) AS s
       |  FROM tf JOIN dfx USING (term) JOIN $qRel USING (term) CROSS JOIN stats),
       |sc AS (SELECT query_id, doc_id,
       |              list_reduce(list_sort(list(s)), (p, q) -> p + q) AS score
       |       FROM st GROUP BY 1, 2)""".stripMargin

  /** The twin over `documents` for an EXPLICIT query set — the pruned
    * row's oracle extends the fixture set with the skewed q4.
    */
  def textBm25SqlFor(qs: Seq[(String, String)]): String =
    textBm25SqlOver("documents", qs)

  private def textBm25SqlOver(rel: String,
      qs: Seq[(String, String)] = fixtureQueries): String = {
    val vals = qs.map { case (q, t) => s"('$q', '$t')" }.mkString(", ")
    val terms = qs.map(_._2).distinct.map(t => s"'$t'").mkString(", ")
    s"""WITH q(query_id, term) AS (VALUES $vals),
       |tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |        FROM $rel),
       |${bm25ScoreCtes("q", terms)},
       |rk AS (SELECT query_id, doc_id, score,
       |              row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY score DESC, doc_id) AS rnk
       |       FROM sc)
       |SELECT query_id, doc_id, rnk, score FROM rk
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  /** Per-document keyword extraction — top-3 TF-IDF terms per doc, the
    * inverse of [[textBm25]]'s per-query ranking: here EVERY document is
    * a window partition, so the rank filter's `WindowGroupLimit` rewrite
    * is doing real work (3 rows per doc survive each map partition
    * instead of the full vocabulary posting). Score = (tf/dl) · the
    * rational idf — two exact-rounded divisions and one multiply, no
    * term sum at all, so no fold is even needed for engine parity.
    *
    * Scale shape: tf and df are both map-side-combinable aggregates of
    * the one tokenize scan (plus the same amortizable corpus-stats pass
    * as [[textBm25]] for n_docs); the tf⋈df join keys on term and AQE
    * broadcasts the df side when the vocabulary is small (it shuffles
    * when it isn't — a million-term vocab is not broadcastable, and
    * nothing here assumes it is).
    */
  def textKeywords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Catalog(spark, dir).ref("documents")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("t"))
    val totals = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term")).crossJoin(broadcast(totals))
      .withColumn("score", (col("tf") / col("dl")) *
        ((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("term"), col("rnk"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  val textKeywordsSql: String =
    """WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |             FROM documents),
      |totals AS (SELECT count(*) AS n_docs FROM tok),
      |tl AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM tok),
      |tf AS (SELECT doc_id, term, dl, count(*) AS tf FROM tl GROUP BY 1, 2, 3),
      |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |sc AS (
      |  SELECT tf.doc_id, tf.term,
      |         (tf.tf / tf.dl) * ((totals.n_docs - dfx.df + 0.5) / (dfx.df + 0.5)) AS score
      |  FROM tf JOIN dfx USING (term) CROSS JOIN totals),
      |rk AS (SELECT doc_id, term, score,
      |              row_number() OVER (PARTITION BY doc_id
      |                                 ORDER BY score DESC, term) AS rnk
      |       FROM sc)
      |SELECT doc_id, term, rnk, score FROM rk
      |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // ---- chunk-level retrieval (RAG indexing) ---------------------------------

  /** Chunk-key packing radix: chunk_key = doc_id·radix + chunk_idx.
    * [[chunkBm25]] raises rather than emitting a colliding key for a
    * document with ≥radix chunks (≈4.8M tokens at the default geometry).
    */
  val ChunkKeyRadix = 100000L

  /** `search_chunk_bm25`: BM25 over the CHUNKED corpus — the retrieval
    * unit becomes the [[Batching.chunkOverlap]] sliding window instead
    * of the whole document, the standard RAG indexing shape (rank
    * passages, not books). Chunk keys encode (doc_id, chunk_idx) as
    * doc_id·10⁵ + idx so the whole BM25 pipeline ([[termStatsOver]] +
    * the WindowGroupLimit top-k) applies unchanged; df becomes chunk
    * frequency, dl the chunk length — which is the point: a hit inside
    * a 10⁶-token document scores like the passage it is, not like the
    * document around it. Same scale shape as text_bm25 (query-vocab
    * prefilter at the scan, posting-list-proportional shuffles); the
    * chunk explode multiplies rows before the filter kills non-matches,
    * never materializing chunk text.
    */
  def chunkBm25(spark: SparkSession, dir: String): DataFrame = {
    val cl = Batching.ChunkLen
    val step = cl - Batching.ChunkOverlap
    val chunks = Catalog(spark, dir).ref("documents")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("t0"))
      .withColumn("n_tokens", size(col("t0")).cast("long"))
      .withColumn("n_chunks", when(col("n_tokens") <= cl, lit(1L))
        .otherwise(lit(1L) + expr(s"(n_tokens - $cl + $step - 1) div $step")))
      // chunk_key = doc_id·ChunkKeyRadix + idx collides past the radix
      // (a ≥$ChunkKeyRadix-chunk document ≈ 4.8M tokens): fail loudly
      // instead of silently merging two chunks' postings.
      .withColumn("n_chunks",
        when(col("n_chunks") > ChunkKeyRadix, raise_error(concat(
          lit("chunkBm25: doc_id "), col("doc_id"),
          lit(s" has more than $ChunkKeyRadix chunks; chunk_key would collide")))
          .cast("long"))
        .otherwise(col("n_chunks")))
      .select(col("doc_id"), col("t0"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select((col("doc_id") * ChunkKeyRadix + col("chunk_idx")).as("doc_id"),
        expr(s"slice(t0, CAST(chunk_idx * $step + 1 AS INT), $cl)").as("t"))
    topK(termStatsOver(chunks, fixtureQueries), rationalIdf, 5)
      .withColumnRenamed("doc_id", "chunk_key")
  }

  val chunkBm25Sql: String = {
    val vals = fixtureQueries.map { case (q, t) => s"('$q', '$t')" }.mkString(", ")
    val terms = fixtureQueries.map(_._2).distinct.map(t => s"'$t'").mkString(", ")
    val cl = Batching.ChunkLen
    val step = cl - Batching.ChunkOverlap
    s"""WITH q(query_id, term) AS (VALUES $vals),
       |tok0 AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t0
       |         FROM documents),
       |geom AS (SELECT doc_id, t0,
       |                CASE WHEN len(t0) <= $cl THEN 1
       |                     ELSE 1 + (len(t0) - $cl + $step - 1) // $step END AS n_chunks
       |         FROM tok0),
       |tok AS (SELECT g.doc_id * 100000 + u.i AS chunk_key,
       |               t0[(u.i * $step + 1):(u.i * $step + $cl)] AS t
       |        FROM geom g, LATERAL (SELECT unnest(range(0, g.n_chunks)) AS i) u),
       |stats AS (SELECT count(*) AS n_docs, sum(len(t)) AS sum_dl FROM tok),
       |tl AS (SELECT chunk_key, len(t) AS dl, unnest(t) AS term FROM tok),
       |tf AS (SELECT chunk_key, term, dl, count(*) AS tf FROM tl
       |       WHERE term IN ($terms) GROUP BY 1, 2, 3),
       |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |st AS (
       |  SELECT q.query_id, tf.chunk_key,
       |         ((stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5)) *
       |         ((tf.tf * 2.25) /
       |          (tf.tf + 1.25 * (0.25 + 0.75 * (tf.dl / (stats.sum_dl / stats.n_docs))))) AS s
       |  FROM tf JOIN dfx USING (term) JOIN q USING (term) CROSS JOIN stats),
       |sc AS (SELECT query_id, chunk_key,
       |              list_reduce(list_sort(list(s)), (p, q) -> p + q) AS score
       |       FROM st GROUP BY 1, 2),
       |rk AS (SELECT query_id, chunk_key, score,
       |              row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY score DESC, chunk_key) AS rnk
       |       FROM sc)
       |SELECT query_id, chunk_key, rnk, score FROM rk
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25" -> (textBm25 _),
    "text_keywords" -> (textKeywords _),
    "search_chunk_bm25" -> (chunkBm25 _))

  val oracles: Map[String, String] = Map(
    "text_bm25" -> textBm25Sql,
    "text_keywords" -> textKeywordsSql,
    "search_chunk_bm25" -> chunkBm25Sql)
}
