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

  test("compactDir zorder: repack restores 2-D file pruning, content preserved") {
    import graft.catalog.Catalog
    // Streaming-ingest pathology: the corpus arrives hash-scattered over
    // 16 fragments, so every source and every length band touches ~every
    // file. A z-ordered repack must fix BOTH footprints in the same
    // single read+write pass a plain repack already pays.
    val docs = Catalog(spark, sf).ref("documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val dir = tmpDir("compactz") + "/t"
    docs.repartition(16).write.parquet(dir)
    def meanFiles(df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column): Double = {
      val per = df.groupBy(key).agg(countDistinct(col("file")).as("nf"))
        .collect().map(_.getAs[Long]("nf"))
      per.sum.toDouble / per.length
    }
    def qb(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("cq", (col("n_chars") / 128).cast("int"))
    val before = spark.read.parquet(dir).withColumn("file", input_file_name())
    val preRows = before.drop("file").collect().map(_.toString).sorted.toSeq
    val srcPre = meanFiles(before, col("source"))
    val chPre = meanFiles(qb(before), col("cq"))
    assert(srcPre > 12 && chPre > 12,
      s"fixture must start scattered: src=$srcPre chars=$chPre of 16")
    // same fragments, two repacks at the same ~8-file target: plain
    // (hash) freezes the scatter into the compacted files; z-ordered
    // restores pruning on BOTH dimensions
    val dirPlain = tmpDir("compactp") + "/t"
    docs.repartition(16).write.parquet(dirPlain)
    val bytes = Compaction.compactDir(spark, dir, Long.MaxValue, minFiles = 999)._3
    val target = math.max(1L, bytes / 8)
    val (bp, ap, _) = Compaction.compactDir(spark, dirPlain, target)
    val (b, a, _) = Compaction.compactDir(spark, dir, target,
      zorderBy = Seq("source", "n_chars"))
    assert(b === 16 && bp === 16 && a >= 6 && ap >= 6,
      s"expected multi-file repacks, got z $b -> $a, plain $bp -> $ap")
    val after = spark.read.parquet(dir).withColumn("file", input_file_name())
    assert(after.drop("file").collect().map(_.toString).sorted.toSeq === preRows,
      "z-ordered compaction must preserve content exactly")
    val plain = spark.read.parquet(dirPlain).withColumn("file", input_file_name())
    val srcPost = meanFiles(after, col("source"))
    val chPost = meanFiles(qb(after), col("cq"))
    val srcPlain = meanFiles(plain, col("source"))
    val chPlain = meanFiles(qb(plain), col("cq"))
    // plain repack scatters ~every output file on both dimensions
    assert(srcPlain > ap * 0.8 && chPlain > ap * 0.8,
      s"plain repack should stay scattered: src=$srcPlain chars=$chPlain of $ap")
    // the z-order claim: BOTH footprints strictly better than both the
    // scattered input and the plain repack at the same file count
    assert(srcPost < srcPre / 2 && srcPost < srcPlain / 2,
      s"source footprint $srcPost vs pre=$srcPre plain=$srcPlain")
    assert(chPost < chPre / 2 && chPost < chPlain,
      s"n_chars footprint $chPost vs pre=$chPre plain=$chPlain")
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

  test("compactTable: multi-level hive layout descends to leaf partitions") {
    val dir = tmpDir("compact4") + "/t"
    spark.range(8000)
      .select(col("id"), (col("id") % 2).as("a"), (col("id") % 3).as("b"))
      .repartition(8).write.partitionBy("a", "b").parquet(dir)
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val results = Compaction.compactTable(spark, dir, targetBytes = Long.MaxValue)
    assert(results.length === 6, s"2x3 leaves expected, got $results")
    results.foreach { case (p, b, a) =>
      assert(p.contains("a=") && p.contains("b="), s"leaf path expected, got $p")
      assert(b > 1 && a === 1, s"leaf $p: $b -> $a")
    }
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(after === before)
  }

  test("compactDir: a crash-stranded swap backup is restored, not silently skipped") {
    val base = tmpDir("compact5")
    val dir = base + "/t"
    spark.range(5000).select(col("id")).repartition(8).write.parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted.toSeq
    // simulate a crash between the swap's two renames: live dir gone,
    // data sitting in the dot-prefixed backup sibling
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir), java.nio.file.Paths.get(base + "/.t.swap_old"))
    val (b, a, _) = Compaction.compactDir(spark, dir, targetBytes = Long.MaxValue)
    assert(b === 8 && a === 1, s"recovered dir must then compact: $b -> $a")
    val after = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted.toSeq
    assert(after === before, "recovery must restore the stranded data exactly")
  }
}
