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
