package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard writer — the OUTPUT end of the data pipeline: lay the
  * corpus on disk as deterministic, size-targeted shards in shuffled
  * order, the layout a training loader streams sequentially.
  *
  * Guarantees:
  *  - order: within and across shards, rows follow the salted-md5 global
  *    permutation of [[TextAnalysis.globalShuffle]] — reshuffling with a
  *    new salt is a new epoch order, independent of the old one;
  *  - determinism: shard membership and in-shard order are functions of
  *    (salt, doc_id) only — two writes of the same corpus produce
  *    byte-identical shard contents regardless of partitioning, file
  *    order, or cluster size;
  *  - sizing: every shard holds exactly `docsPerShard` docs (the last
  *    one holds the remainder), so loader-side work is balanced.
  *
  * Scale shape: the permutation is the two-pass global row number (range
  * shuffle + broadcast offsets — no single-partition window), shard
  * assignment is arithmetic on the position, and the write runs one task
  * per shard (`repartition(shard)` + in-task sort), each streaming its
  * rows once. Driver-side state is the |shards|-row manifest. At 100 TB
  * with ~1 GB shards that is ~100k tasks/manifest rows — scheduler-sized,
  * not data-sized.
  *
  * Reference frame: the reference's batched staging writes
  * (`marketing_cloud_data_extension_upload.sql:57` — `row_number/100`
  * batches) are the same pattern at SaaS-API scale; this is the
  * training-corpus version.
  */
object ShardWriter {

  /** Write `outDir/shard=K/` parquet shards; returns the manifest
    * (shard_id, n_docs, min_pos, max_pos) — also written to
    * `outDir/_manifest` so loaders can plan without listing files.
    */
  def writeShards(spark: SparkSession, dir: String, outDir: String,
      docsPerShard: Long, salt: String = "epoch0"): DataFrame = {
    require(docsPerShard > 0, "docsPerShard must be positive")
    val shuffled = TextAnalysis.globalShuffleAt(spark, dir, salt)
      .withColumn("shard_id", expr(s"(shuffle_pos - 1) div ${docsPerShard}L"))
    shuffled
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("shuffle_pos"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)
    // partition-dir inference reads shard_id back as Int — pin the
    // manifest schema to long so readers get one stable type
    val manifest = spark.read.parquet(outDir)
      .withColumn("shard_id", col("shard_id").cast("long"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("shuffle_pos")).as("min_pos"), max(col("shuffle_pos")).as("max_pos"))
      .orderBy("shard_id")
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/_manifest")
    spark.read.parquet(s"$outDir/_manifest").orderBy("shard_id")
  }

  /** JSONL variant — the wire format training loaders actually consume
    * (one JSON document per line, `outDir/shard_id=K/` text files, same
    * deterministic salted permutation and manifest contract as
    * [[writeShards]]).
    *
    * Scale shape: the permutation is the two-pass global row number
    * over (hash, doc_id) METADATA; document text crosses a shuffle
    * exactly twice — once keyed by unique doc_id to attach it to its
    * position, once in the shard repartition — and the JSON encoding
    * (`to_json`, field order fixed by the struct) is scan-local. The
    * manifest pass re-reads the written lines (prunes to shard_id +
    * one parsed field, but a text source must still scan whole lines —
    * the price of auditing a text format; the parquet variant's audit
    * reads 3 columns). `_manifest` is underscore-hidden, so line
    * readers never see it.
    */
  def writeShardsJsonl(spark: SparkSession, dir: String, outDir: String,
      docsPerShard: Long, salt: String = "epoch0"): DataFrame = {
    require(docsPerShard > 0, "docsPerShard must be positive")
    import graft.catalog.Catalog
    val shuffled = TextAnalysis.globalShuffleAt(spark, dir, salt)
      .withColumn("shard_id", expr(s"(shuffle_pos - 1) div ${docsPerShard}L"))
    val withText = shuffled.join(
      Catalog(spark, dir).ref("documents").select(col("doc_id"), col("lang"), col("text")),
      Seq("doc_id"))
    withText
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("shuffle_pos"))
      .select(col("shard_id"), to_json(struct(col("shuffle_pos"), col("doc_id"),
        col("source"), col("lang"), col("text"))).as("value"))
      .write.mode("overwrite").partitionBy("shard_id").text(outDir)
    val manifest = spark.read.text(outDir)
      .select(col("shard_id").cast("long"),
        get_json_object(col("value"), "$.shuffle_pos").cast("long").as("pos"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"))
      .orderBy("shard_id")
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/_manifest")
    spark.read.parquet(s"$outDir/_manifest").orderBy("shard_id")
  }

  /** Token-ID shards — the LAST mile of the pretrain export: documents
    * BPE-encoded to id sequences (corpus-trained merges,
    * [[graft.functions.BpeEncodeIds]]) and concatenated into the same
    * per-lang 512-token chunks [[TextAnalysis.packSequencesBpe]] plans
    * (identical tokenizer ⇒ identical counts ⇒ identical running sums
    * ⇒ identical chunk boundaries), written `outDir/lang=K/` parquet.
    * Returns the per-lang manifest (n_chunks, n_tokens).
    *
    * Scale shape: the vocab is driver-BOUNDED metadata (corpus
    * alphabet + merge outputs — a few KB riding the expression as a
    * literal); encoding is scan-local; the chunk assembly shuffles each
    * id array exactly once (the range partition of the running sum is
    * metadata-only — groupedRunningSum checkpoints (lang, doc_id,
    * count) — and the groupBy moves the ids keyed by (lang, chunk));
    * in-chunk doc order is pinned by array_sort on (doc_id, ids)
    * structs, so the written bytes are partition-count-independent.
    */
  def writeTokenShards(spark: SparkSession, dir: String, outDir: String,
      seqLen: Int = 512): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val c = graft.catalog.Catalog(spark, dir)
    val table = BpeTrain.trainedMerges(spark, dir).map { case (l, r, _) => (l, r) }
    val words = c.ref("documents")
      .select(col("lang"), col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
    // the corpus ALPHABET: a bounded driver collect (distinct codepoints)
    val alphabet = words.select(explode(col("toks")).as("w"))
      .select(explode(split(col("w"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .distinct().collect().map(_.getString(0)).toSeq
    val vocab = graft.functions.BpeEncodeIds.buildVocab(alphabet, table)
    // ONE encode pass: both the metadata branch (running-sum chunk
    // planning) and the chunk-assembly join read this checkpoint — the
    // encoded corpus is the export's working set either way.
    val base = words.select(col("lang"), col("doc_id"),
        graft.functions.BpeEncodeIds.bpeEncodeIds(col("toks"), table, vocab).as("ids"))
      .withColumn("n_tokens_bpe", size(col("ids")).cast("long"))
      .localCheckpoint(eager = false)
    val assigned = Windows.groupedRunningSum(
        base.select(col("lang"), col("doc_id"), col("n_tokens_bpe")),
        "__rsum", col("lang"), col("n_tokens_bpe"), col("doc_id"))
      .withColumn("chunk_id", expr(s"(__rsum - n_tokens_bpe) div ${seqLen}L"))
      .select(col("lang").as("alang"), col("doc_id").as("adoc"), col("chunk_id"))
    val chunks = base
      .join(assigned, col("lang") === col("alang") && col("doc_id") === col("adoc"))
      .groupBy(col("lang"), col("chunk_id"))
      .agg(flatten(transform(
          array_sort(collect_list(struct(col("doc_id"), col("ids")))),
          x => x.getField("ids"))).as("token_ids"),
        count(lit(1)).as("n_docs"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
    chunks
      .repartition(col("lang"))
      .sortWithinPartitions(col("lang"), col("chunk_id"))
      .write.mode("overwrite").partitionBy("lang").parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("lang")
  }
}
