package graft.ops

import graft.SparkTestBase
import graft.util.IndexMaint
import java.nio.file.{Files, Paths}

/** Snapshot export (round 19): [[graft.util.IndexMaint.exportSnapshot]]
  * materializes a pinned manifest view as a brand-new STANDALONE index
  * root — the "ship the frozen eval corpus" verb. Live reads of the
  * export must be bit-identical to the as-of readers against the pin,
  * survive later source mutations and the source unpinning, stay
  * fsck-green, keep the pin-time replay-token set (an included batch
  * still no-ops, a post-pin batch applies), and move data by hard link.
  */
class ExportSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(ids: Range): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(29)
    ids.map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("lexical: exported root serves the pin-time page through LIVE reads, after source mutations + unpin + reap; tokens and hard links carry") {
    val base = tmpDir("exp_lex")
    val path = s"$base/src"
    val docs = (0 until 80)
      .map(i => (i.toLong, s"alpha beta w$i" + (if (i % 7 == 0) " gamma" else "")))
      .toDF("doc_id", "text")
    LexIndex.buildIndex(docs, path)
    // a pre-pin append (its token must carry into the export) and a
    // pre-pin takedown (the removed-stats adjustment must be non-zero,
    // so the fixup has something real to re-land)
    LexIndex.appendDocsIdempotent(path,
      (100 until 120).map(i => (i.toLong, s"alpha epsilon w$i"))
        .toDF("doc_id", "text"), "exp:pre")
    LexIndex.deleteDocs(spark, path, Seq(3L, 10L, 101L))
    val qs = Seq("q1" -> "gamma", "q1" -> "beta", "q2" -> "epsilon")
    LexIndex.pinIndex(spark, path, "rel")
    val want = LexIndex.bm25TopK(spark, path, qs, 5)
      .collect().map(_.toString).sorted.toSeq
    // the source moves on: post-pin append + takedown
    LexIndex.appendDocsIdempotent(path,
      (200 until 230).map(i => (i.toLong, s"alpha delta w$i"))
        .toDF("doc_id", "text"), "exp:post")
    LexIndex.deleteDocs(spark, path, Seq(5L, 6L))
    val dest = s"$base/export"
    LexIndex.exportIndexSnapshot(path, "rel", dest)
    val got = LexIndex.bm25TopK(spark, dest, qs, 5)
      .collect().map(_.toString).sorted.toSeq
    assert(got === want, "live reads of the export must equal the pinned page")
    assert(LexIndex.bm25TopKAsOf(spark, path, "rel", qs, 5)
      .collect().map(_.toString).sorted.toSeq === want)
    // data moved by hard link: a parquet file in the export shares its
    // inode with the same file in the source's pinned generation
    locally {
      val srcGen = Paths.get(IndexMaint.snapshotGenDir(path,
        IndexMaint.readSnapshot(path, "rel").get))
      val expGen = Paths.get(IndexMaint.liveGen(dest))
      val w = Files.walk(expGen)
      val rel =
        try {
          import scala.jdk.CollectionConverters._
          w.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet"))
            .map(expGen.relativize).get
        } finally w.close()
      assert(Files.getAttribute(expGen.resolve(rel), "unix:ino") ===
        Files.getAttribute(srcGen.resolve(rel), "unix:ino"),
        s"$rel should be a hard link into the pinned generation")
    }
    // the export is its own lineage: it outlives the source's pin and
    // the reap that follows
    IndexMaint.unpin(path, "rel")
    LexIndex.compactIndex(spark, path)
    assert(LexIndex.bm25TopK(spark, dest, qs, 5)
      .collect().map(_.toString).sorted.toSeq === want)
    val (bad, _) = LexIndex.fsckIndex(spark, dest)
    assert(bad.isEmpty, bad.mkString("; "))
    // token semantics: a batch INSIDE the pinned view still no-ops; the
    // post-pin batch was never in the manifest, so it applies
    assert(!LexIndex.appendDocsIdempotent(dest,
      Seq((100L, "alpha epsilon w100")).toDF("doc_id", "text"), "exp:pre"),
      "a batch already inside the pinned view must replay as a no-op")
    assert(LexIndex.appendDocsIdempotent(dest,
      (200 until 230).map(i => (i.toLong, s"alpha delta w$i"))
        .toDF("doc_id", "text"), "exp:post"),
      "a post-pin batch is NOT in the export and must apply")
  }

  test("IVF: exported root's live screen equals screenBatchAsOf; refusals: unknown label, occupied destination") {
    val base = tmpDir("exp_ivf")
    val path = s"$base/src"
    val index = Ivf.buildIndex(vecs(0 until 120), path, kCells = 4, iters = 2)
    Ivf.appendBatchIdempotent(index, vecs(200 until 220), "exp:pre")
    Ivf.pinIndex(path, "rel")
    val delta = vecs(500 until 505)
    val want = Ivf.screenBatchAsOf(spark, path, "rel", delta, k = 3, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    Ivf.upsertBatchIdempotent(index, vecs(5 until 9), "exp:u")
    Ivf.deleteIds(index, Seq(20L, 21L))
    val dest = s"$base/export"
    Ivf.exportIndexSnapshot(path, "rel", dest)
    val got = Ivf.screenBatch(spark, Ivf.loadIndex(dest), delta, 3, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(got === want,
      "the export's LIVE screen must equal the as-of screen against the pin")
    assert(Ivf.fsckIndex(spark, dest)._1.isEmpty)
    // refusals, both loud: a label that does not exist, and a
    // destination that is already an index root
    intercept[IllegalArgumentException](
      Ivf.exportIndexSnapshot(path, "nope", s"$base/x"))
    intercept[IllegalArgumentException](
      Ivf.exportIndexSnapshot(path, "rel", dest))
    // and a destination that exists with foreign content
    val foreign = s"$base/foreign"
    Files.createDirectories(Paths.get(foreign))
    Files.write(Paths.get(foreign, "data.txt"), "x".getBytes("UTF-8"))
    intercept[IllegalArgumentException](
      Ivf.exportIndexSnapshot(path, "rel", foreign))
    // a crashed earlier export — generation dir moved but the live
    // pointer never flipped — is unreadable debris by construction:
    // the retry reclaims it and succeeds
    val crashed = s"$base/crashed"
    Files.createDirectories(Paths.get(crashed, "gen-000000000"))
    Files.write(Paths.get(crashed, "gen-000000000", "part-junk.parquet"),
      Array[Byte](1, 2, 3))
    Ivf.exportIndexSnapshot(path, "rel", crashed)
    assert(Ivf.screenBatch(spark, Ivf.loadIndex(crashed), delta, 3, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq === want)
  }

  test("PQ flat: exported codes + codebooks serve the pin-time ADC page live") {
    val base = tmpDir("exp_pq")
    val path = s"$base/src"
    val emb = vecs(0 until 160)
    val index = Pq.buildIndex(emb, path, m = 4, kSub = 8, iters = 2)
    Pq.pinIndex(path, "rel")
    val queries = (0 until 3).map { i =>
      (i.toLong, Array.fill(8)(new scala.util.Random(100 + i).nextGaussian()))
    }
    val want = Pq.adcTopKAsOf(spark, path, "rel", queries, k = 4)
      .collect().map(_.toString).sorted.toSeq
    Pq.deleteIds(index, Seq(7L, 9L))
    val dest = s"$base/export"
    Pq.exportIndexSnapshot(path, "rel", dest)
    val got = Pq.adcTopK(spark, Pq.loadIndex(dest), queries, k = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(got === want)
  }

  test("residual IVF-PQ: exported coarse quantizer + codebooks + codes serve the pin-time screen live") {
    val base = tmpDir("exp_rpq")
    val path = s"$base/src"
    val index = Pq.buildIndexResidual(vecs(0 until 160), path,
      kCells = 4, m = 4, kSub = 8, iters = 2)
    Pq.appendBatchIdempotentResidual(index, vecs(300 until 320), "exp:pre")
    Pq.pinIndex(path, "rel")
    val queries = (0 until 3).map { i =>
      (i.toLong, Array.fill(8)(new scala.util.Random(200 + i).nextGaussian()))
    }
    val want = Pq.screenTopKResidualAsOf(spark, path, "rel", queries,
      k = 4, nprobe = 3).collect().map(_.toString).sorted.toSeq
    Pq.deleteIdsResidual(index, Seq(11L, 12L))
    Pq.upsertBatchIdempotentResidual(index, vecs(30 until 34), "exp:u")
    val dest = s"$base/export"
    Pq.exportIndexSnapshot(path, "rel", dest)
    val got = Pq.screenTopKResidual(spark, Pq.loadIndexResidual(dest),
      queries, k = 4, nprobe = 3).collect().map(_.toString).sorted.toSeq
    assert(got === want)
  }
}
