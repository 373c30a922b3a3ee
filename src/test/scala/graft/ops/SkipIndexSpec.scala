package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkipIndexSpec extends SparkTestBase {
  import spark.implicits._

  /** 16-file corpus, range-clustered on doc_id (0..1599, 100 per file). */
  private lazy val corpus: String = {
    val d = tmpDir("skipidx") + "/corpus"
    (0L until 1600L).map(i => (i, s"doc body $i", (i % 7).toString))
      .toDF("doc_id", "text", "source")
      .repartitionByRange(16, col("doc_id"))
      .write.parquet(d)
    d
  }

  private val M = 4096L

  private lazy val index: String = {
    val idx = tmpDir("skipidx_ix")
    SkipIndex.build(spark, corpus, "doc_id", idx, M)
    idx
  }

  test("lookup returns exactly the naive-filter rows (no false positives in OUTPUT)") {
    val keys = Seq(3L, 777L, 1234L, 1599L, 99999L)
    val got = SkipIndex.lookup(spark, corpus, index, "doc_id", keys, M)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = spark.read.parquet(corpus).filter(col("doc_id").isin(keys: _*))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === want.toSeq)
    assert(got.length === 4) // 99999 absent
  }

  test("candidate list prunes: few files read out of 16, never missing a home file") {
    val allFiles = spark.read.parquet(corpus).inputFiles.toSet
    assert(allFiles.size === 16)
    val keys = Seq(3L, 777L, 1234L)
    val cand = SkipIndex.candidateFiles(spark, index, keys, M).toSet
    // no false negatives: each key's true home file must be a candidate
    val homes = spark.read.parquet(corpus)
      .select(col("doc_id"), input_file_name().as("f"))
      .filter(col("doc_id").isin(keys: _*))
      .select("f").collect().map(_.getString(0)).toSet
    assert(homes.subsetOf(cand), s"missing home files: ${homes -- cand}")
    // zone maps alone pin each key to one file on this range-clustered
    // layout; Bloom FPs could add a couple more, never most of the corpus
    assert(cand.size <= 6, s"expected strong pruning, got ${cand.size} of 16 files")
    // and the planned scan reads only the candidates
    val df = SkipIndex.lookup(spark, corpus, index, "doc_id", keys, M)
    assert(df.inputFiles.toSet.subsetOf(cand))
    assert(df.inputFiles.length < allFiles.size)
  }

  test("absent keys: zero candidates outside zone range, empty result with corpus schema") {
    val df = SkipIndex.lookup(spark, corpus, index, "doc_id", Seq(5000L, -3L), M)
    assert(df.count() === 0)
    assert(df.columns.toSeq === Seq("doc_id", "text", "source"))
    val df2 = SkipIndex.lookup(spark, corpus, index, "doc_id", Seq.empty, M)
    assert(df2.count() === 0)
  }

  test("exact key predicate is pushed to the pruned parquet scan") {
    val df = SkipIndex.lookup(spark, corpus, index, "doc_id", Seq(777L, 778L), M)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("In(doc_id"),
      s"IN predicate must reach parquet:\n$scan")
    // a single key folds to EqualTo and still pushes
    val one = SkipIndex.lookup(spark, corpus, index, "doc_id", Seq(777L), M)
      .queryExecution.executedPlan.toString
    assert(one.contains("PushedFilters") && one.contains("EqualTo(doc_id,777)"),
      s"single-key predicate must reach parquet:\n$one")
  }

  test("index is sparse and small: words carry set bits only") {
    val bits = spark.read.parquet(s"$index/bits")
    assert(bits.columns.toSeq.sorted === Seq("file", "widx", "word"))
    assert(bits.filter(col("word") === 0).count() === 0)
    // 100 keys/file * K=4 positions <= 400 set bits -> <= 400 words/file
    val perFile = bits.groupBy("file").count().agg(max("count")).head.getLong(0)
    assert(perFile <= 400, s"bitset rows per file: $perFile")
    val stats = spark.read.parquet(s"$index/stats")
    assert(stats.count() === 16)
    val r = stats.agg(sum("n_keys"), min("min_key"), max("max_key")).head
    assert(r.getLong(0) === 1600L && r.getLong(1) === 0L && r.getLong(2) === 1599L)
  }

  test("registered query on driver testdata matches the plain filter") {
    val got = SkipIndex.bloomSkipLookup(spark, sf).collect().map(_.getLong(0)).toSeq
    val want = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id").isin(7L, 123L, 250L, 444L, 999999L))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === want)
  }

  test("registered-row build is proven by the on-disk manifest, not the memo: memo cleared -> reopen; stale manifest -> rebuild") {
    import graft.util.Fs
    val r1 = SkipIndex.bloomSkipLookup(spark, sf).collect().map(_.getLong(0)).toSeq
    val corpusDir = Fs.sessionTempDir("skipidx_corpus", sf)
    val idxDir = Fs.sessionTempDir("skipidx_index", sf)
    val fpBefore = Fs.dirFingerprint(corpusDir)
    // the fresh-JVM contract without a second JVM: with the memo gone,
    // the committed manifest alone must carry the skip — the corpus
    // must NOT be rewritten (part-file names/mtimes would change)
    SkipIndex.resetBuildMemoForTest()
    val r2 = SkipIndex.bloomSkipLookup(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(Fs.dirFingerprint(corpusDir) === fpBefore,
      "a committed build must be reopened from the manifest, not rebuilt")
    assert(r2 === r1)
    // a stale manifest (crash after a source rewrite, before the index
    // rebuild) cannot prove the build — it must rebuild, then recommit
    java.nio.file.Files.write(java.nio.file.Paths.get(idxDir, "_built.txt"),
      "fp=0|stale".getBytes("UTF-8"))
    SkipIndex.resetBuildMemoForTest()
    val r3 = SkipIndex.bloomSkipLookup(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(Fs.dirFingerprint(corpusDir) !== fpBefore,
      "a stale manifest must force a rebuild")
    assert(r3 === r1)
  }

  test("incremental update indexes only new files; lookup spans old and new") {
    val d = tmpDir("skipidx_inc")
    val corp = s"$d/corpus"
    (0L until 800L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartitionByRange(8, col("doc_id")).write.parquet(corp)
    val idx = s"$d/idx"
    SkipIndex.build(spark, corp, "doc_id", idx, M)
    assert(spark.read.parquet(s"$idx/stats").count() === 8)
    // day 2: 800 more docs arrive as appended part files
    (800L until 1600L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartitionByRange(8, col("doc_id")).write.mode("append").parquet(corp)
    val indexed = SkipIndex.update(spark, corp, "doc_id", idx, M)
    assert(indexed === 8, s"expected the 8 new files, got $indexed")
    assert(spark.read.parquet(s"$idx/stats").count() === 16)
    // a second update is a no-op
    assert(SkipIndex.update(spark, corp, "doc_id", idx, M) === 0)
    // lookup finds keys living in the original AND the appended files
    val got = SkipIndex.lookup(spark, corp, idx, "doc_id", Seq(5L, 1500L), M)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(5L, 1500L))
    val cand = SkipIndex.candidateFiles(spark, idx, Seq(5L, 1500L), M)
    assert(cand.size <= 4, s"pruning must survive the append: ${cand.size} of 16")
  }
  test("a key present in several files yields ALL its home files as candidates") {
    val d = tmpDir("skipidx_dup")
    val corp = s"$d/corpus"
    // key 42 appears in every one of 4 files
    (0 until 4).foreach { part =>
      Seq((42L, s"copy $part"), (100L + part, s"unique $part"))
        .toDF("doc_id", "text")
        .repartition(1).write.mode("append").parquet(corp)
    }
    val idx = s"$d/idx"
    SkipIndex.build(spark, corp, "doc_id", idx, M)
    val homes = spark.read.parquet(corp)
      .select(col("doc_id"), input_file_name().as("f"))
      .filter(col("doc_id") === 42L)
      .select("f").collect().map(_.getString(0)).toSet
    assert(homes.size === 4)
    val cand = SkipIndex.candidateFiles(spark, idx, Seq(42L), M).toSet
    assert(homes.subsetOf(cand), s"missing duplicate-key homes: ${homes -- cand}")
    val got = SkipIndex.lookup(spark, corp, idx, "doc_id", Seq(42L), M).count()
    assert(got === 4L, "every copy of the key must surface")
  }
}
