package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.ArrayExprs
import graft.util.Fs

/** File-skipping point-lookup index — per-file zone maps (min/max key)
  * plus a per-file Bloom filter over the key column, the lakehouse
  * "data skipping" pattern (Delta/Iceberg file stats + bloom indexes).
  *
  * The 100 TB problem it solves: "fetch these K doc_ids" (a takedown
  * request, an audit sample, a training-example traceback) against a
  * corpus of ~10⁶ parquet files. A plain filter scans everything; with
  * this index the scan is restricted to the files whose zone map AND
  * Bloom filter admit one of the keys — for range-clustered layouts
  * that is K files, for random layouts it is K·(1+FP·nFiles) ≪ nFiles.
  *
  * Spark-first shape:
  *  - BUILD is one corpus scan projecting (key, input_file_name), a
  *    narrow (file, pos) distinct shuffle (positions, never keys or
  *    rows), and a (file, word) bit-OR rollup — the index is m/8 bytes
  *    per file, stored as sparse (file, widx, word) rows so empty words
  *    cost nothing.
  *  - LOOKUP never collects index rows proportional to the corpus: the
  *    K·k query positions broadcast onto the index scan, the per-(file,
  *    key) hit count and zone check reduce to a candidate FILE LIST
  *    (bounded driver metadata, like probed IVF cells), and the corpus
  *    read plans only those files with the key predicate pushed to
  *    parquet (row-group pruning inside each file stacks on top).
  *
  * No false negatives by construction (a key's k positions are always
  * set in its home file's filter and min/max always covers it); false
  * positives cost only extra candidate files, never wrong rows, because
  * the final scan re-applies the exact predicate. Bloom positions are
  * the md5-derived family the contamination screen uses
  * (`Sketches.bloomContaminationAt`) — deterministic, no RNG state.
  *
  * Reference scope: the reference package has no storage-maintenance
  * ops; this extends the engine per the build brief (lakehouse
  * layout family: Compaction, Layout, SkipIndex).
  */
object SkipIndex {

  /** Hash functions per key — n·k/m sized so the default build sits
    * near the 16-bits-per-key sweet spot.
    */
  val K = 4

  /** Build the skip index for the parquet table at `corpusPath`:
    * `indexPath/stats`  = (file, n_keys, min_key, max_key),
    * `indexPath/bits`   = (file, widx, word) sparse Bloom bitsets.
    * `mBits` is the per-file filter width (power of two not required —
    * positions are md5 mod mBits); size it ≥ ~16 × keys-per-file.
    */
  def build(spark: SparkSession, corpusPath: String, keyCol: String,
      indexPath: String, mBits: Long): Unit = {
    val rows = spark.read.parquet(corpusPath)
      .select(col(keyCol).as("k"), input_file_name().as("file"))
    writeIndexRows(rows, indexPath, mBits, mode = "overwrite")
  }

  /** Shared index-row kernel for [[build]] (overwrite) and [[update]]
    * (append): one pinned scan of (k, file) feeds the per-file stats
    * rollup and the distinct-position bitset rollup.
    */
  private def writeIndexRows(rows: DataFrame, indexPath: String,
      mBits: Long, mode: String): Unit = {
    val pinned = rows.localCheckpoint(eager = true)
    pinned.groupBy(col("file"))
      .agg(count(lit(1)).as("n_keys"), min(col("k")).as("min_key"),
        max(col("k")).as("max_key"))
      .write.mode(mode).parquet(s"$indexPath/stats")
    pinned
      .select(col("file"),
        explode(sequence(lit(0), lit(K - 1))).as("j"), col("k"))
      .select(col("file"),
        ArrayExprs.md5Mod(
          concat(lit("skip:"), col("j").cast("string"), lit(":"),
            col("k").cast("string")), mBits).as("pos"))
      .distinct()
      .select(col("file"), (col("pos") / 64).cast("long").as("widx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy(col("file"), col("widx"))
      .agg(expr("bit_or(bit)").as("word"))
      .write.mode(mode).parquet(s"$indexPath/bits")
  }

  /** Incremental maintenance: index ONLY files that appeared since the
    * last build/update, append their stats/bitset rows, and leave every
    * existing index row untouched. Returns the number of newly indexed
    * files (0 = the index was already current — nothing is written).
    *
    * O(Δ) by construction: the corpus side is a driver METADATA listing
    * (`inputFiles` — no data read), the diff against the indexed file
    * set is driver work over file names, and only the fresh files are
    * scanned. The append keeps old parquet parts as-is, so a daily
    * ingest indexes the day's files, never the corpus — the same delta
    * contract as [[Dedup.incrementalDedup]] and [[Ivf.screenBatch]].
    */
  def update(spark: SparkSession, corpusPath: String, keyCol: String,
      indexPath: String, mBits: Long): Int = {
    def norm(p: String): String =
      try new java.net.URI(p).getPath catch { case _: Exception => p }
    val all = spark.read.parquet(corpusPath).inputFiles
    val known = spark.read.parquet(s"$indexPath/stats")
      .select(col("file")).collect().map(r => norm(r.getString(0))).toSet
    val fresh = all.filter(f => !known.contains(norm(f)))
    if (fresh.isEmpty) return 0
    val rows = spark.read.parquet(fresh.toIndexedSeq: _*)
      .select(col(keyCol).as("k"), input_file_name().as("file"))
    writeIndexRows(rows, indexPath, mBits, mode = "append")
    fresh.length
  }

  /** Files that may contain any of `keys`: Bloom-pass (all K positions
    * set) AND zone-map-pass (key within [min_key, max_key]). Returns
    * bounded driver metadata — the candidate file list.
    */
  def candidateFiles(spark: SparkSession, indexPath: String,
      keys: Seq[Long], mBits: Long): Seq[String] = {
    if (keys.isEmpty) return Seq.empty
    import spark.implicits._
    val qpos = keys.toDF("k")
      .select(col("k"), explode(sequence(lit(0), lit(K - 1))).as("j"))
      .select(col("k"), col("j"),
        ArrayExprs.md5Mod(
          concat(lit("skip:"), col("j").cast("string"), lit(":"),
            col("k").cast("string")), mBits).as("pos"))
      .select(col("k"), col("j"), (col("pos") / 64).cast("long").as("widx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
    val bloomPass = spark.read.parquet(s"$indexPath/bits")
      .join(broadcast(qpos), Seq("widx"))
      .filter((col("word").bitwiseAND(col("bit"))) =!= 0)
      .groupBy(col("file"), col("k"))
      .agg(count_distinct(col("j")).as("n_hit"))
      .filter(col("n_hit") === K)
    bloomPass
      .join(spark.read.parquet(s"$indexPath/stats"), Seq("file"))
      .filter(col("k").between(col("min_key"), col("max_key")))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Point lookup through the index: read ONLY candidate files, exact
    * predicate re-applied (and pushed to parquet row groups).
    */
  def lookup(spark: SparkSession, corpusPath: String, indexPath: String,
      keyCol: String, keys: Seq[Long], mBits: Long): DataFrame = {
    val cand = candidateFiles(spark, indexPath, keys, mBits)
    val base =
      if (cand.isEmpty)
        spark.read.parquet(corpusPath).limit(0) // schema-only: no keys can match
      else spark.read.parquet(cand: _*)
    base.filter(col(keyCol).isin(keys: _*))
  }

  /** Registered `layout_bloom_skip` query: range-cluster the documents
    * table into an 8-file corpus, index it, and run a 5-key lookup (one
    * key absent — a false positive there would surface as an extra row
    * and fail the oracle hash). Pruning itself cannot change results
    * (no false negatives), so the oracle is the plain IN-filter; the
    * files-actually-read proof lives in SkipIndexSpec.
    */
  /** Session memo for the registered row's corpus + index build — the
    * [[graft.ops.Ivf.buildIndexCached]] rationale: the derivation is a
    * deterministic pure function of the source table, so one build
    * serves every bench pass; the fingerprint key invalidates on an
    * in-place source rewrite. The memo is only a FAST PATH: the skip
    * decision is proven by the `_built.txt` manifest committed into the
    * index directory after the build completes (the
    * [[graft.util.IndexMaint.writeBuildKey]] idea) — a memo miss whose
    * manifest matches the source fingerprint + build shape reopens the
    * committed index instead of rebuilding, and a crash anywhere before
    * the manifest write leaves no (or a stale) manifest and rebuilds.
    */
  private val builtMemo =
    new graft.util.BoundedCache[(String, String), Unit](max = 8)

  private[graft] def resetBuildMemoForTest(): Unit =
    builtMemo.evict(_ => true)

  def bloomSkipLookup(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Fs.sessionTempDir("skipidx_corpus", dir)
    val idx = Fs.sessionTempDir("skipidx_index", dir)
    val mBits = 8192L
    val buildKey =
      s"fp=${Fs.dirFingerprint(s"$dir/documents.parquet")}|mBits=$mBits|files=8"
    val manifest = java.nio.file.Paths.get(idx, "_built.txt")
    val memoKey = (corpus, buildKey)
    builtMemo.memoized(memoKey, builtMemo)(
      k => k._1 == corpus && k != memoKey) {
      val committed = java.nio.file.Files.exists(manifest) &&
        scala.util.Try(new String(java.nio.file.Files.readAllBytes(manifest),
          java.nio.charset.StandardCharsets.UTF_8).trim).toOption
          .contains(buildKey)
      if (!committed) {
        Catalog(spark, dir).ref("documents")
          .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
          .repartitionByRange(8, col("doc_id"))
          .write.mode("overwrite").parquet(corpus)
        build(spark, corpus, "doc_id", idx, mBits)
        // durable proof LAST (tmp + atomic rename): the manifest only
        // ever describes a fully committed corpus + index pair
        val tmp = java.nio.file.Paths.get(idx, "_built.txt.tmp")
        java.nio.file.Files.write(tmp,
          (buildKey + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, manifest,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    lookup(spark, corpus, idx, "doc_id",
      Seq(7L, 123L, 250L, 444L, 999999L), mBits)
      .orderBy(col("doc_id"))
  }

  val bloomSkipLookupSql: String =
    """SELECT doc_id, source, lang, n_chars FROM documents
      |WHERE doc_id IN (7, 123, 250, 444, 999999)
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_bloom_skip" -> (bloomSkipLookup _))

  val oracles: Map[String, String] = Map(
    "layout_bloom_skip" -> bloomSkipLookupSql)
}
