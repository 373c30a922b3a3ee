package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.catalog.Catalog
import graft.functions.ArrayExprs

/** The composed curation pipeline — the PRODUCT the individual operators
  * exist for, as ONE oracle-checked plan:
  *
  *   gopher rules → paragraph dedup → leak-free split (train)
  *     → mixture sample → deterministic shard write + manifest
  *
  * Each stage is the standalone operator's exact shape (same expressions,
  * same hash draws), so the composition can never drift from the pieces
  * the driver already hash-checks individually. The mixture rates are
  * recomputed over the SURVIVING train subset — a real pipeline balances
  * what it ships, not the raw corpus.
  *
  * Scale shape: the corpus is SCANNED AND TOKENIZED EXACTLY ONCE — one
  * projection computes both tokenizations the stages need (`\s+` gopher
  * tokens and the space-split paragraph words; the shingle tokens are
  * `lower` over the gopher tokens, which is identical to
  * `split(trim(lower(text)), '\s+')` because lowercasing never maps a
  * character into or out of whitespace) and is persisted
  * MEMORY_AND_DISK for the duration of the run, then unpersisted after
  * the shard write. At 100 TB the cached token working set trades
  * executor storage for the THREE full tokenization passes the naive
  * composition would burn — the same economics as any multi-consumer
  * working set; spill-to-disk keeps it safe when memory is short. From
  * the shared base the stages chain shuffles that each move digests,
  * labels, or (doc_id, lang) rows; document text crosses a shuffle
  * exactly twice — once keyed by unique doc_id to rebuild text_clean
  * (paragraph dedup step 4), once in the final shard repartition — and
  * is NEVER a shuffle key (CurationSpec pins this, the exchange count,
  * and the single-scan property). The shard write is one task per shard
  * with the manifest derived from the written files.
  */
object Curation {

  val DocsPerShard = 64L

  /** The shared tokenized base + the pre-write relation. Internal: the
    * caller that runs an action ([[pipelineCurationE2e]]) unpersists the
    * base when done; plan audits go through [[curationPositioned]] /
    * [[curationSampled]].
    */
  private def curationStages(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = curationBase(spark, dir)
    val sampled = curationSampledFrom(base)
    // 5. Deterministic global shuffle order → fixed-size shards.
    val hashed = sampled.withColumn("h", ArrayExprs.md5Mod(
      concat_ws(":", lit("cshuf"), col("doc_id").cast("string")), 1000003L))
    val positioned = Windows.globalRowNumber(hashed, "pos", col("h"), col("doc_id"))
      .withColumn("shard_id", expr(s"(pos - 1) div ${DocsPerShard}L"))
      .drop("h")
    (base, positioned)
  }

  /** The ONE corpus scan: both tokenizations and the text length in a
    * single projection, persisted so every stage reads the tokenized
    * cache instead of re-scanning the parquet. Raw text is dropped —
    * nothing downstream needs it.
    *
    * Memoized per (session, dir): the plan-audit entry points
    * ([[curationPositioned]], [[curationSampled]]) cannot unpersist the
    * base they return lazily, so without the memo every audit call
    * would pin a NEW corpus-sized cache — the memo bounds the leak to
    * one cache per corpus, and [[pipelineCurationE2e]] releases it
    * (memo entry included) in a finally.
    */
  private val baseCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  private def curationBase(spark: SparkSession, dir: String): DataFrame =
    baseCache.getOrElseUpdate((System.identityHashCode(spark), dir),
      Catalog(spark, dir).ref("documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokens(col("text")).as("toks"),
          split(col("text"), " ").as("w"),
          length(col("text")).as("tlen"))
        .persist(StorageLevel.MEMORY_AND_DISK))

  private def releaseBase(spark: SparkSession, dir: String): Unit =
    baseCache.remove((System.identityHashCode(spark), dir))
      .foreach(_.unpersist(blocking = false))

  /** Stages 1–4 from the shared base — the fully-visible (no shard
    * positioning) plan the single-scan spec audits.
    */
  private def curationSampledFrom(base: DataFrame): DataFrame = {
    // 1. Gopher quality rules — keep passers (the gopherRules flags over
    //    the shared tokens), with `lang` carried through the flag
    //    projection so membership never joins back to the corpus for it.
    val passed = TextAnalysis.gopherFlagsOn(
      base.select(col("doc_id"), col("toks"), col("tlen"), col("lang")),
      carry = Seq("lang"))
      .filter(col("pass")).select(col("doc_id"), col("lang"))
    // 3. Leak-free split: the cluster graph's shingles derive from the
    //    shared tokens (lower ∘ tokens = the dedup family's tokenizer).
    val shingled = base.select(col("doc_id"),
      ArrayExprs.shingleHashes(transform(col("toks"), t => lower(t)), 3).as("shs"))
    // Duplication verdict for the pair plan's collapse dial, probed on
    // the PERSISTED token cache (identical texts ⟺ identical token
    // arrays — the mass-duplication signal the collapse exists for)
    // instead of Dedup's internal shingle-checkpoint probe: one cheap
    // cached-column aggregate that doubles as the cache's first
    // materialization, and on the common low-duplication corpus the
    // pair plan stays fully lazy (no checkpoint sync point).
    // hashed over the LOWERED tokens — the same normalization the
    // shingles apply — so casing-only duplicate families count as
    // duplication here exactly as the collapse would see them
    val st = graft.util.Blocks.labeled(base.sparkSession,
      "curation: duplication probe")(
      base.agg(count(lit(1)),
        approx_count_distinct(xxhash64(transform(col("toks"), t => lower(t))))).head())
    val dupHeavy = st.getLong(1) < 0.9 * st.getLong(0)
    // No PairBudget here BY CHOICE: the registered standalone dedup
    // paths guard with it, but this call already probed the duplication
    // ratio above and passed the collapse verdict down — the budget's
    // extra posting-list checkpoint + aggregate would re-introduce the
    // sync point the caller-decided collapse exists to avoid, on the
    // pipeline whose end-to-end latency is the benchmark target. A
    // duplication-heavy corpus takes the collapse branch, which bounds
    // the same quadratic at the signature level.
    val reps = Dedup.clustersOf(spark = base.sparkSession,
      pairs = Dedup.ngramPairsFromShingles(shingled, 0.5, collapse = Some(dupHeavy)),
      driverThreshold = 1L << 20)
    // Membership is METADATA — (doc_id, lang) of the gopher-passed,
    // train-split docs (paragraph dedup rewrites text but never drops a
    // doc, so it cannot change membership). The split draw is
    // leakFreeSplitFrom's exact hash (md5 'lfsplit:' over the coalesced
    // cluster rep — CurationSpec cross-checks membership against the
    // standalone operator), inlined against the near-dup reps relation
    // (one row per CLUSTERED doc, tiny; AQE broadcasts it unhinted)
    // instead of materializing the corpus-wide split relation just to
    // filter it back down. Pinned ONCE: the rate derivation and the
    // final sampling draw both read this checkpoint, so the gopher
    // flags and the split join evaluate exactly once and the mixture
    // stage never drags the text path.
    val membersTrain = graft.util.Blocks.labeled(base.sparkSession,
      "curation: members pin (gopher+split)")(passed
      .join(reps.withColumnRenamed("doc_id", "rep_key"),
        col("doc_id") === col("rep_key"), "left")
      .filter(Dedup.splitDraw(coalesce(col("cluster_rep"), col("doc_id")))
        < Dedup.TrainBuckets)
      .select(col("doc_id"), col("lang"))
      .localCheckpoint())
    // 4. Mixture sampling over the train subset: sqrt-weighted water-fill
    //    rates (the mixtureSample derivation verbatim) over the pinned
    //    members. The per-language counts are |langs|-row METADATA, so
    //    the water-fill arithmetic runs on the driver (the same
    //    bounded-collect rule as k centroids / BPE candidates) instead
    //    of chaining two broadcast-crossJoin aggregate stages — integer
    //    arithmetic unchanged (floor∘sqrt, truncating div — the twin
    //    replays it bit-for-bit), three fewer jobs per run.
    val spark = base.sparkSession
    val counts = graft.util.Blocks.labeled(base.sparkSession,
      "curation: mixture counts")(
      membersTrain.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .collect()).map(r => (r.getString(0), r.getLong(1)))
    val ws = counts.map { case (l, n) => (l, n, math.floor(math.sqrt(n.toDouble)).toLong) }
    val ratesSeq =
      if (ws.isEmpty) Seq.empty[(String, Long)]
      else {
        val bigw = ws.map(_._3).sum
        val t = ws.map { case (_, n, w) => n * bigw / w }.min
        ws.map { case (l, n, w) => (l, (w * t / bigw) * 1000000L / n) }.toSeq
      }
    val rates = spark.createDataFrame(ratesSeq).toDF("lang", "ppm")
    val keep = membersTrain.join(broadcast(rates), Seq("lang"))
      .filter(ArrayExprs.md5Mod(
        concat_ws(":", lit("curation"), col("doc_id").cast("string")), 1000000L)
        < col("ppm"))
      .select(col("doc_id"), col("lang"))
    // 2. Paragraph-level dedup: keep DECISIONS over the whole corpus
    //    (first-occurrence semantics need every doc's chunks), but the
    //    text REBUILD runs only for the sampled membership. The `keep`
    //    joins are plain doc_id equi-joins, NOT broadcast hints: the
    //    sampled membership is corpus-PROPORTIONAL (the water-fill keeps
    //    ~everything on a balanced corpus), so forcing a broadcast would
    //    collect O(N) rows onto the driver at scale — AQE still
    //    broadcasts it when it is actually small.
    val keepSet = Dedup.paragraphKeepSetOnW(base.select(col("doc_id"), col("w")), 10)
    val sampledW = base.select(col("doc_id"), col("w"))
      .join(keep.select(col("doc_id")), Seq("doc_id"))
    Dedup.paragraphRebuildOnW(sampledW, keepSet, 10)
      .join(keep, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("text_clean"))
  }

  /** The pre-write relation: every pipeline stage composed, ending in
    * (doc_id, lang, text_clean, pos, shard_id). Exposed so the plan can
    * be audited without the side-effecting write.
    */
  def curationPositioned(spark: SparkSession, dir: String): DataFrame =
    curationStages(spark, dir)._2

  /** Stages 1–4 standalone — the spec uses this to pin the single-scan
    * property (zero direct documents scans; one scan inside the shared
    * cached base).
    */
  private[ops] def curationSampled(spark: SparkSession, dir: String): DataFrame =
    curationSampledFrom(curationBase(spark, dir))

  /** Runs the pipeline, writes the shards (one directory per shard_id,
    * rows in shuffle order — a real training-shard layout), and returns
    * the per-shard manifest COMPUTED FROM THE WRITTEN FILES, so the
    * oracle row also proves the write round-trips.
    */
  def pipelineCurationE2e(spark: SparkSession, dir: String): DataFrame = {
    val outDir = graft.util.Fs.sessionTempDir("curation_shards", dir)
    val (_, positioned) = curationStages(spark, dir)
    // No repartition before the write: positioned leaves globalRowNumber
    // range-partitioned with pos CONTIGUOUS per partition and ascending
    // across them, and shard_id is monotone in pos — so a direct
    // partitioned write already lands each shard's rows in order, in at
    // most TWO files (a shard straddling one partition boundary), with
    // zero extra text shuffle. The boundary split is a file-layout
    // detail the manifest aggregation is insensitive to.
    try graft.util.Blocks.labeled(spark, "curation: shard write")(positioned
      .sortWithinPartitions(col("shard_id"), col("pos"))
      .write.mode("overwrite").partitionBy("shard_id")
      // v2 commit: task outputs move to the destination at task commit
      // instead of a second sequential driver-side rename pass at job
      // commit — halves the per-file metadata ops the shard-per-dir
      // layout pays (a public Hadoop committer knob, not a semantics
      // change; overwrite-into-fresh-dir needs no v1 rollback safety).
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .parquet(outDir))
    finally releaseBase(spark, dir) // also drops the memo entry
    // Explicit schema: the manifest read is |shards| small files, and
    // schema inference would re-open footers on the driver before the
    // aggregate even starts.
    val writtenSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text_clean", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("shard_id", org.apache.spark.sql.types.LongType)))
    spark.read.schema(writtenSchema).parquet(outDir)
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text_clean"), " ")).cast("long")).as("n_tokens"),
        min(col("pos")).as("first_pos"),
        max(col("pos")).as("last_pos"))
      .orderBy("shard_id")
  }

  /** Twin: the five stages re-derived relationally (paragraph dedup,
    * gopher flags, the shared cluster-walk CTEs, the mixture water-fill,
    * the shard positions) — one recursive query, same hash draws.
    */
  val pipelineCurationE2eSql: String =
    "WITH RECURSIVE\n" +
      // gopher (gopherRulesSql's s-CTE, renamed g*)
      """gt AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS ts
        |  FROM documents),
        |gs AS (
        |  SELECT doc_id,
        |         CAST(len(ts) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(ts,
        |             x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS BIGINT) AS stop_hits,
        |         CAST(list_max(list_transform(list_distinct(ts),
        |             t2 -> len(list_filter(ts, x -> x = t2)))) AS BIGINT) AS top_tok,
        |         CAST(len(list_distinct(ts)) AS BIGINT) AS n_distinct,
        |         (CAST(length(text) AS DOUBLE) - (CAST(len(ts) AS DOUBLE) - 1.0))
        |           / CAST(len(ts) AS DOUBLE) AS mean_word_len
        |  FROM gt),
        |passed AS (
        |  SELECT doc_id FROM gs
        |  WHERE (n_tokens BETWEEN 50 AND 1000) AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        |    AND stop_hits >= 2 AND top_tok * 8 <= n_tokens
        |    AND n_distinct * 10 >= n_tokens * 3),
        |""".stripMargin +
      // paragraph dedup (paragraphDedupSql, renamed p*)
      """pd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pr AS (SELECT doc_id, w,
        |              unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS i
        |       FROM pd),
        |pch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |               array_to_string(w[CAST(i*10+1 AS INT):CAST(i*10+10 AS INT)], ' ') AS chunk
        |        FROM pr),
        |pk AS (SELECT doc_id, chunk_idx, chunk,
        |              row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) = 1 AS keep
        |       FROM pch),
        |cleaned0 AS (
        |  SELECT doc_id,
        |         COALESCE(array_to_string(list(chunk ORDER BY chunk_idx) FILTER (WHERE keep), ' '), '') AS text_clean
        |  FROM pk GROUP BY doc_id),
        |cleaned AS (SELECT c0.doc_id, c0.text_clean FROM cleaned0 c0 JOIN passed USING (doc_id)),
        |""".stripMargin +
      // the shared cluster walk (tok, ds, sizes, inter, edges, sym, nodes, walk)
      Dedup.clusterWalkCtesSql + ",\n" +
      """reps AS (SELECT id AS doc_id, min(label) AS cluster_rep FROM walk GROUP BY id),
        |sp AS (
        |  SELECT d2.doc_id,
        |         CASE WHEN md5_number_lower('lfsplit:' || CAST(COALESCE(r.cluster_rep, d2.doc_id) AS VARCHAR)) % 10 < 8 THEN 'train'
        |              WHEN md5_number_lower('lfsplit:' || CAST(COALESCE(r.cluster_rep, d2.doc_id) AS VARCHAR)) % 10 = 8 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents d2 LEFT JOIN reps r ON d2.doc_id = r.doc_id),
        |train AS (
        |  SELECT c.doc_id, doc.lang, c.text_clean
        |  FROM cleaned c
        |  JOIN sp ON sp.doc_id = c.doc_id
        |  JOIN documents doc ON doc.doc_id = c.doc_id
        |  WHERE sp.split = 'train'),
        |mc AS (SELECT lang, count(*) AS n FROM train GROUP BY 1),
        |mw AS (SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM mc),
        |mtot AS (SELECT CAST(sum(w) AS BIGINT) AS bigw FROM mw),
        |mt AS (SELECT min((n * bigw) // w) AS t FROM mw, mtot),
        |rates AS (
        |  SELECT lang, ((((w * t) // bigw)) * 1000000) // n AS ppm
        |  FROM mw, mtot, mt),
        |sampled AS (
        |  SELECT train.doc_id, train.text_clean
        |  FROM train JOIN rates USING (lang)
        |  WHERE md5_number_lower('curation:' || CAST(doc_id AS VARCHAR)) % 1000000 < ppm),
        |spos AS (
        |  SELECT doc_id, text_clean,
        |         row_number() OVER (ORDER BY
        |           md5_number_lower('cshuf:' || CAST(doc_id AS VARCHAR)) % 1000003, doc_id) AS pos
        |  FROM sampled),
        |sh AS (SELECT *, (pos - 1) // 64 AS shard_id FROM spos)
        |SELECT CAST(shard_id AS BIGINT) AS shard_id,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(string_split(text_clean, ' '))) AS BIGINT) AS n_tokens,
        |       CAST(min(pos) AS BIGINT) AS first_pos,
        |       CAST(max(pos) AS BIGINT) AS last_pos
        |FROM sh GROUP BY shard_id ORDER BY shard_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curation_e2e" -> (pipelineCurationE2e _))

  val oracles: Map[String, String] = Map(
    "pipeline_curation_e2e" -> pipelineCurationE2eSql)
}
