package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ShardWriterSpec extends SparkTestBase {

  test("writeShards: exact sizing, contiguous positions, in-file shuffle order") {
    val out = tmpDir("shards")
    val manifest = ShardWriter.writeShards(spark, sf, out, docsPerShard = 64).collect()
    val total = graft.catalog.Catalog(spark, sf).ref("documents").count()
    assert(manifest.map(_.getLong(1)).sum === total, "shards must partition the corpus")
    manifest.dropRight(1).foreach { r =>
      assert(r.getLong(1) === 64L, s"shard ${r.getLong(0)} must hold exactly 64 docs")
    }
    manifest.foreach { r =>
      val (shard, n, minPos, maxPos) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(minPos === shard * 64 + 1, s"shard $shard must start at its range")
      assert(maxPos === minPos + n - 1, s"shard $shard positions must be contiguous")
    }
    // one file per shard, rows laid down in shuffle order
    val shard0 = spark.read.parquet(s"$out/shard_id=0")
    assert(shard0.inputFiles.length === 1, "a shard must be one file")
    val pos = shard0.collect().map(_.getAs[Long]("shuffle_pos"))
    assert(pos.toSeq === pos.sorted.toSeq, "in-file order must follow the permutation")
  }

  test("writeShardsJsonl: valid lines, manifest-consistent, same permutation as parquet shards") {
    val (outJ, outP) = (tmpDir("jsonl_shards"), tmpDir("pq_shards"))
    val manifest = ShardWriter.writeShardsJsonl(spark, sf, outJ, docsPerShard = 64).collect()
    val total = graft.catalog.Catalog(spark, sf).ref("documents").count()
    assert(manifest.map(_.getLong(1)).sum === total, "shards must partition the corpus")
    manifest.foreach { r =>
      assert(r.getLong(2) === r.getLong(0) * 64 + 1, "shard must start at its range")
      assert(r.getLong(3) === r.getLong(2) + r.getLong(1) - 1, "positions must be contiguous")
    }
    // every line parses with the full schema, no nulls
    val schema = "shuffle_pos LONG, doc_id LONG, source STRING, lang STRING, text STRING"
    val parsed = spark.read.text(outJ)
      .select(col("shard_id").cast("long").as("shard_id"),
        from_json(col("value"), org.apache.spark.sql.types.StructType.fromDDL(schema)).as("j"))
    assert(parsed.filter(col("j").isNull || col("j.doc_id").isNull ||
      col("j.text").isNull).count() === 0, "every line must round-trip")
    // identical permutation to the parquet variant under the same salt
    ShardWriter.writeShards(spark, sf, outP, docsPerShard = 64)
    val orderJ = parsed.select(col("j.shuffle_pos").as("pos"), col("j.doc_id").as("doc_id"))
      .orderBy("pos").collect().map(_.getLong(1)).toSeq
    val orderP = spark.read.parquet(outP).orderBy("shuffle_pos")
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(orderJ === orderP, "jsonl and parquet shards must share the epoch permutation")
    // deterministic bytes: a rewrite produces the identical line sequence
    val linesA = spark.read.text(outJ).orderBy("shard_id", "value")
      .collect().map(_.getString(0)).toSeq
    ShardWriter.writeShardsJsonl(spark, sf, outJ, docsPerShard = 64)
    val linesB = spark.read.text(outJ).orderBy("shard_id", "value")
      .collect().map(_.getString(0)).toSeq
    assert(linesA === linesB, "rewrites must be byte-identical")
  }

  test("writeTokenShards: ids decode, chunks match the pack plan, totals conserve") {
    val out = tmpDir("token_shards")
    val manifest = ShardWriter.writeTokenShards(spark, sf, out).collect()
    assert(manifest.nonEmpty)
    // token totals conserve: Σ chunk tokens == Σ per-doc BPE counts
    val trained = BpeTrain.trainedMerges(spark, sf).map { case (l, r, _) => (l, r) }
    val c = graft.catalog.Catalog(spark, sf)
    val expected = c.ref("documents")
      .select(graft.functions.BpeCountSum.bpeCountSum(
        TextAnalysis.tokens(lower(col("text"))), trained).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum === expected)
    // chunk membership equals packSequencesBpe's plan (same tokenizer,
    // same running sum): chunk counts per (lang, chunk_id) must agree
    val packed = TextAnalysis.packSequencesBpe(spark, sf)
      .groupBy("lang", "chunk_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val written = spark.read.parquet(out)
      .select(col("lang"), col("chunk_id"), col("n_docs")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(written === packed, "chunk membership must match the planned packing")
    // every id is in-vocab and the first chunk's prefix decodes to the
    // min-doc's own tokenization
    val chunk0 = spark.read.parquet(out)
      .filter(col("chunk_id") === 0).orderBy("lang").head()
    val ids0 = chunk0.getSeq[Int](chunk0.fieldIndex("token_ids")).toList
    assert(ids0.forall(_ >= 0))
    val lang0 = chunk0.getAs[String]("lang")
    val firstDoc = c.ref("documents").filter(col("lang") === lang0)
      .orderBy("doc_id").select(lower(col("text"))).head().getString(0)
    val ranks = trained.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    val firstWordToks = graft.functions.Bpe.tokenize(
      firstDoc.trim.split("\\s+").head, trained.toIndexedSeq, ranks)
    // rebuild the vocab the writer's contract defines and decode exactly
    val alphabet = c.ref("documents")
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
      .select(explode(split(col("w"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .distinct().collect().map(_.getString(0)).toSeq
    val vocab = graft.functions.BpeEncodeIds.buildVocab(alphabet, trained)
    assert(ids0.take(firstWordToks.length) === firstWordToks.map(vocab),
      "chunk-0 prefix must be the min-doc's first word, id-for-id")
    assert(ids0.forall(_ < vocab.size + trained.size))
  }

  test("writeShards: deterministic across writes; a new salt is a new epoch order") {
    val (a, b, c) = (tmpDir("shards_a"), tmpDir("shards_b"), tmpDir("shards_c"))
    ShardWriter.writeShards(spark, sf, a, docsPerShard = 64)
    ShardWriter.writeShards(spark, sf, b, docsPerShard = 64)
    def order(dir: String): Seq[Long] =
      spark.read.parquet(dir).orderBy("shuffle_pos").collect()
        .map(_.getAs[Long]("doc_id")).toSeq
    assert(order(a) === order(b), "same salt must produce byte-identical layout")
    ShardWriter.writeShards(spark, sf, c, docsPerShard = 64, salt = "epoch1")
    assert(order(a) !== order(c), "a new salt must produce a new permutation")
    assert(order(a).toSet === order(c).toSet, "every doc appears in every epoch")
  }
}
