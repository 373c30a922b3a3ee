package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkTestBase {

  test("compactDir: small files repack to the planned count, rows preserved exactly") {
    val dir = tmpDir("compact") + "/t"
    spark.range(20000)
      .select(col("id"), (col("id") % 7).as("k"),
        concat(lit("pad"), col("id")).as("pad"))
      .repartition(64).write.parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    val (b, a, bytes) = Compaction.compactDir(spark, dir, targetBytes = Long.MaxValue)
    assert(b === 64, s"fixture should start at 64 files, got $b")
    assert(a === 1, s"unbounded target must compact to one file, got $a")
    assert(bytes > 0)
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(after === before, "compaction must preserve content exactly")
  }

  test("compactDir: output count follows ceil(bytes/target); tiny dirs are skipped") {
    val dir = tmpDir("compact2") + "/t"
    spark.range(20000).select(col("id")).repartition(32).write.parquet(dir)
    val bytes = Compaction.compactDir(spark, dir, Long.MaxValue)._3
    // recompact the single file: below minFiles -> untouched
    val (b1, a1, _) = Compaction.compactDir(spark, dir, targetBytes = 1L)
    assert(b1 === 1 && a1 === 1, "minFiles gate must skip an already-compact dir")
    // re-fragment and target a third of the bytes -> ~3 files
    spark.read.parquet(dir).repartition(32).write.mode("overwrite").parquet(dir + "2")
    val target = math.max(1L, bytes / 3)
    val (_, a2, bytes2) = Compaction.compactDir(spark, dir + "2", target)
    val expect = math.max(1, math.ceil(bytes2.toDouble / target).toInt)
    assert(a2 === expect, s"planned $expect files from $bytes2 bytes at $target, got $a2")
  }

  test("compactTable: per-partition compaction keeps hive layout and content") {
    val dir = tmpDir("compact3") + "/t"
    spark.range(9000)
      .select(col("id"), (col("id") % 3).as("part"))
      .repartition(16).write.partitionBy("part").parquet(dir)
    // partition-dir inference types `part` as Int on both reads
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val results = Compaction.compactTable(spark, dir, targetBytes = Long.MaxValue)
    assert(results.length === 3)
    results.foreach { case (p, b, a) =>
      assert(b > 1 && a === 1, s"partition $p: $b -> $a")
    }
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(after === before)
  }
}
