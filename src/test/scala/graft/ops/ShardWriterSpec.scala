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
