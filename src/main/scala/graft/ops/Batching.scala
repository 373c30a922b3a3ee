package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Batch/chunk planning for the training loader — the step between a
  * curated corpus and the GPU: group documents into fixed-size batches
  * by similar token length (padding waste is paid per batch at the
  * batch's max length), and split over-long documents into overlapping
  * context-window chunks.
  *
  * Both are arithmetic over (doc_id, n_tokens) — text itself never
  * moves. Length batching needs one global order; that runs through
  * [[Windows.globalRowNumber]]'s two-pass range-partitioned numbering
  * (no single-partition WindowExec at any corpus size). Chunking is
  * pure scan work: a per-row sequence explode of chunk indices.
  */
object Batching {

  val BatchSize = 32
  val ChunkLen = 64
  val ChunkOverlap = 16

  /** `text_length_batching`: batch documents by descending token count
    * (ties → doc_id), `BatchSize` docs per batch, and report each
    * batch's padding economics: a batch pads every member to its max
    * length, so waste = n_docs·max − Σ tokens. Length-sorted batching
    * is the standard fix for the ~40% padding waste of random batching
    * at LLM fine-tuning time.
    */
  def lengthBatching(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog(spark, dir).ref("documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    Windows.globalRowNumber(docs, "rn", col("n_tokens").desc, col("doc_id"))
      .withColumn("batch_id", expr(s"(rn - 1) div $BatchSize"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padding_waste",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
      .orderBy("batch_id")
  }

  val lengthBatchingSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |ranked AS (
       |  SELECT doc_id, n_tokens,
       |         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
       |  FROM toks),
       |batched AS (
       |  SELECT doc_id, n_tokens, (rn - 1) // $BatchSize AS batch_id FROM ranked)
       |SELECT batch_id, count(*) AS n_docs, max(n_tokens) AS max_tokens,
       |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |       count(*) * max(n_tokens) - CAST(sum(n_tokens) AS BIGINT) AS padding_waste
       |FROM batched GROUP BY batch_id ORDER BY batch_id""".stripMargin

  /** `text_chunk_overlap`: split every document into `ChunkLen`-token
    * windows advancing by `ChunkLen − ChunkOverlap`, the retrieval /
    * long-context preprocessing shape. Emits chunk geometry (index,
    * token span) — the loader slices the stored token arrays by these
    * offsets, so the planning query never ships text.
    */
  def chunkOverlap(spark: SparkSession, dir: String): DataFrame = {
    val step = ChunkLen - ChunkOverlap
    Catalog(spark, dir).ref("documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("n_chunks",
        when(col("n_tokens") <= ChunkLen, lit(1L))
          .otherwise(lit(1L) + expr(s"(n_tokens - $ChunkLen + $step - 1) div $step")))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("tok_start", col("chunk_idx") * step)
      .withColumn("tok_len", least(lit(ChunkLen.toLong), col("n_tokens") - col("tok_start")))
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"), col("tok_len"))
      .orderBy("doc_id", "chunk_idx")
  }

  val chunkOverlapSql: String = {
    val step = ChunkLen - ChunkOverlap
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |planned AS (
       |  SELECT doc_id, n_tokens,
       |         CASE WHEN n_tokens <= $ChunkLen THEN 1
       |              ELSE 1 + (n_tokens - $ChunkLen + $step - 1) // $step END AS n_chunks
       |  FROM toks)
       |SELECT p.doc_id, u.i AS chunk_idx, u.i * $step AS tok_start,
       |       least($ChunkLen, p.n_tokens - u.i * $step) AS tok_len
       |FROM planned p, LATERAL (SELECT unnest(range(0, p.n_chunks)) AS i) u
       |ORDER BY p.doc_id, chunk_idx""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_length_batching" -> (lengthBatching _),
    "text_chunk_overlap" -> (chunkOverlap _))

  val oracles: Map[String, String] = Map(
    "text_length_batching" -> lengthBatchingSql,
    "text_chunk_overlap" -> chunkOverlapSql)
}
