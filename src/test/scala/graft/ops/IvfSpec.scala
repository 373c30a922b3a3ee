package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  /** Clustered synthetic embeddings: 8 well-separated Gaussian centers,
    * 40 members each, plus a planted near-copy of each query vector.
    */
  private lazy val dir: String = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(32)(rnd.nextGaussian().toFloat * 5f))
    val base = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.5f), i % 8)
    }
    val planted = (0 until 5).map { i =>
      ((320 + i).toLong, base(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat), i % 8)
    }
    val d = tmpDir("ivf")
    (base ++ planted).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("kmeans centroids converge toward the true cluster centers") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = Ivf.kmeansCentroids(emb, k = 8, iters = 4)
    assert(cents.size === 8)
    // every vector should be much closer (cosine) to its own cell centroid
    // than to a random one — proxy: assignment is stable across two runs
    val c2 = Ivf.kmeansCentroids(emb, k = 8, iters = 4)
    cents.zip(c2).foreach { case (a, b) => assert(a.toSeq === b.toSeq) } // deterministic
  }

  test("ivfAnn finds planted near-identical neighbors with few probes") {
    val close = Similarity.bruteForceTopKAt(spark, dir, nQueries = 5, k = 10)
      .filter(col("score") >= 0.95)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(close.size >= 5, s"expected planted close pairs, got ${close.size}")
    val approx = Ivf.ivfAnnAt(spark, dir, nQueries = 5, k = 10,
      kCells = 8, nprobe = 2, iters = 3)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = close.count(approx.contains).toDouble / close.size
    assert(recall >= 0.8, s"IVF recall on planted pairs: $recall over ${close.size}")
    // the registered query's sample-init quantizer (iters=0, oracle-
    // checked) must hold the same recall bar
    val approx0 = Ivf.ivfAnnAt(spark, dir, nQueries = 5, k = 10,
      kCells = 8, nprobe = 2, iters = 0)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall0 = close.count(approx0.contains).toDouble / close.size
    assert(recall0 >= 0.8, s"sample-init IVF recall on planted pairs: $recall0")
  }

  test("kmeans with more cells than vectors shrinks gracefully") {
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = Ivf.kmeansCentroids(tiny, k = 10, iters = 2)
    assert(cents.size === 3)
  }

  test("ivfAnn on driver testdata returns k ranked rows per query") {
    val out = Ivf.ivfAnn(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size === 5)
    byQ.values.foreach { rows =>
      assert(rows.length === 10)
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("recall dial: probed cells scale with nprobe; recall non-decreasing, exact at full probe") {
    // The evidence an ANN user turns nprobe with. On the clustered
    // fixture: each nprobe step widens the probe list cell-for-cell,
    // recall@10 never decreases, and probing ALL cells makes IVF score
    // the full corpus with the exact ranking — recall exactly 1.0.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_dial")
    val index = Ivf.buildIndex(emb, idxPath, kCells = 8, iters = 2)
    val batch = emb.filter(col("vec_id") < 3)
    val probedCounts = Seq(1, 2, 4).map { np =>
      Ivf.screenBatchProbed(spark, index, batch, k = 3, nprobe = np)._2.size
    }
    assert(probedCounts.zip(probedCounts.tail).forall { case (a, b) => a <= b },
      s"probed-cell count must not shrink as nprobe grows: $probedCounts")
    assert(probedCounts.last > probedCounts.head,
      s"wider probes must actually touch more cells: $probedCounts")
    val recalls = Seq(1, 2, 4, 8).map(np =>
      Ivf.recallAtK(spark, dir, nQueries = 5, k = 10, kCells = 8, nprobe = np, iters = 2))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b + 1e-12 },
      s"recall must be non-decreasing in nprobe: $recalls")
    assert(recalls.last === 1.0,
      s"nprobe = kCells probes every cell => exact ranking: $recalls")
    assert(recalls.head > 0.0, s"even one probed cell must find something: $recalls")
  }

  test("ivfIncremental: batch screened against the persisted index, O(delta) shape") {
    val df = Ivf.ivfIncremental(spark, sf)
    val out = df.collect()
    // only delta vectors (vec_id % 10 == 0) appear as queries; only base
    // vectors appear as neighbors — the batch never matches itself
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) % 10 == 0), "queries must be the new batch")
    assert(out.forall(_.getLong(2) % 10 != 0), "neighbors must come from the base index")
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // the index scan is PARTITION-PRUNED to the probed cells: the probe
    // list (bounded by kCells) reaches the parquet scan as a partition
    // filter, so un-probed index partitions are never read — the O(delta)
    // property at 100 TB
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid#") ||
      plan.matches("(?s).*PartitionFilters: \\[.*cid.*IN.*"),
      s"index scan must carry a cid partition filter:\n${plan.take(2000)}")
  }

  test("index reuse: a later batch screens an EXISTING index, reading only probed-cell partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: expand(a.executedPlan)
      case q: QueryStageExec => p +: expand(q.plan)
      case _ => p +: p.children.flatMap(expand)
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_reuse")
    // base corpus lands once -> index built once
    Ivf.buildIndex(emb.filter(col("vec_id") % 10 =!= 0), idxPath, kCells = 8, iters = 2)
    // ... a later session reopens it (sidecar roundtrip, NO retraining) ...
    val reopened = Ivf.loadIndex(idxPath)
    // ... and screens a small new batch
    val batch = emb.filter(col("vec_id").isin(0L, 10L, 20L))
    val (res, probed) = Ivf.screenBatchProbed(spark, reopened, batch, k = 3, nprobe = 2)
    val out = res.collect()
    assert(out.nonEmpty)
    assert(probed.nonEmpty && probed.size < 8,
      s"3 queries x 2 probes must not touch all 8 cells: $probed")
    // the executed index scan reads EXACTLY the probed partitions
    val scans = expand(res.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("ivf_reuse")) => s
    }
    assert(scans.nonEmpty, "index scan missing from plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "probed cids must prune as partition filters")
    assert(scan.metrics("numPartitions").value === probed.size.toLong,
      s"partitions read must equal probed cells ${probed.size}")
    // appending a batch against the frozen quantizer leaves screening valid
    Ivf.appendBatch(reopened, emb.filter(col("vec_id") === 30L))
    val again = Ivf.screenBatch(spark, Ivf.loadIndex(idxPath), batch, k = 3, nprobe = 2)
    assert(again.count() >= out.length.toLong,
      "appended vectors can only add candidates")
  }
  test("appendBatchIdempotent: a replayed batch no-ops, even across a rebalance swap") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_idem")
    val index = Ivf.buildIndex(emb.filter(col("vec_id") % 10 =!= 0), idxPath,
      kCells = 8, iters = 1)
    val n0 = Ivf.indexData(spark, idxPath).count()
    val batch = emb.filter(col("vec_id").isin(0L, 10L, 20L)).localCheckpoint()
    // first application folds the batch in
    assert(Ivf.appendBatchIdempotent(index, batch, token = "ingest:7"))
    val n1 = Ivf.indexData(spark, idxPath).count()
    assert(n1 === n0 + 3)
    // at-least-once replay of the SAME batchId: no-op, no duplicates
    assert(!Ivf.appendBatchIdempotent(index, batch, token = "ingest:7"))
    assert(Ivf.indexData(spark, idxPath).count() === n1)
    // a rebalance re-encodes current contents into a new generation;
    // the applied-token sidecar must survive the swap so a post-swap
    // replay STILL no-ops (the batch is already inside the rebuilt index)
    val rebuilt = Ivf.rebalance(spark, index, iters = 1)
    assert(!Ivf.appendBatchIdempotent(rebuilt, batch, token = "ingest:7"))
    assert(Ivf.indexData(spark, idxPath).count() === n1)
    // a genuinely new batch still lands
    val batch2 = emb.filter(col("vec_id") === 30L).localCheckpoint()
    assert(Ivf.appendBatchIdempotent(rebuilt, batch2, token = "ingest:8"))
    assert(Ivf.indexData(spark, idxPath).count() === n1 + 1)
  }

  test("crash injection: a mutation that dies before its commit rename leaves the live generation intact; the replay applies exactly once") {
    import graft.util.IndexMaint
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_crash")
    val index = Ivf.buildIndex(emb.filter(col("vec_id") % 10 =!= 0), idxPath,
      kCells = 8, iters = 1)
    val n0 = Ivf.indexData(spark, idxPath).count()
    val batch = emb.filter(col("vec_id").isin(0L, 10L, 20L)).localCheckpoint()
    // simulate the crash: the append's stage is fully written (data AND
    // token file) but the process dies before the single commit rename
    val stage = IndexMaint.newStageDir(idxPath, "append")
    batch.write.mode("overwrite").parquet(stage)
    java.nio.file.Files.write(java.nio.file.Paths.get(stage, "_token.txt"),
      "ingest:9\n".getBytes())
    // readers are unaffected: the stage is invisible, the live
    // generation serves the pre-crash contents, the token is NOT applied
    assert(Ivf.indexData(spark, idxPath).count() === n0)
    assert(!Ivf.appliedTokens(Ivf.loadIndex(idxPath)).contains("ingest:9"),
      "an uncommitted stage must not count as applied")
    // the at-least-once replay re-runs the batch: applies exactly once,
    // and the crashed stage is reaped
    assert(Ivf.appendBatchIdempotent(index, batch, token = "ingest:9"))
    assert(Ivf.indexData(spark, idxPath).count() === n0 + 3)
    val stale = new java.io.File(idxPath).listFiles()
      .filter(_.getName.startsWith(".stage-"))
    assert(stale.isEmpty, s"crashed stages must be reaped: ${stale.mkString(",")}")
    // a second replay of the same token no-ops — no duplicate vectors
    assert(!Ivf.appendBatchIdempotent(index, batch, token = "ingest:9"))
    assert(Ivf.indexData(spark, idxPath).count() === n0 + 3)
  }

  test("generation commits: one predecessor is kept for in-flight readers, older generations are reaped") {
    import graft.util.IndexMaint
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_gens")
    var index = Ivf.buildIndex(emb.filter(col("vec_id") % 10 =!= 0), idxPath,
      kCells = 4, iters = 1)
    def gens(): Seq[String] = new java.io.File(idxPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName).sorted.toSeq
    assert(gens() === Seq("gen-000000000"))
    // a reader resolves the CURRENT generation before the next commit…
    val preSwap = Ivf.indexData(spark, idxPath).localCheckpoint(eager = false)
    index = Ivf.rebalance(spark, index, iters = 1)
    assert(gens() === Seq("gen-000000000", "gen-000000001"),
      "the predecessor generation must survive one commit")
    // …and still materializes after that commit (its files were kept)
    assert(preSwap.count() > 0)
    index = Ivf.rebalance(spark, index, iters = 1)
    assert(gens() === Seq("gen-000000001", "gen-000000002"),
      "generations older than the predecessor must be reaped")
    assert(IndexMaint.liveGen(idxPath).endsWith("gen-000000002"))
  }

  test("cross-process lease: a held lease makes a concurrent mutation wait, then fail loudly naming the holder") {
    import graft.util.IndexMaint
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_lease")
    val index = Ivf.buildIndex(emb.filter(col("vec_id") % 10 =!= 0), idxPath,
      kCells = 4, iters = 1)
    val batch = emb.filter(col("vec_id") === 0L).localCheckpoint()
    val old = IndexMaint.defaultLeaseTimeoutMs
    IndexMaint.defaultLeaseTimeoutMs = 500L
    try {
      val started = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() =>
        IndexMaint.withLease(idxPath, timeoutMs = 5000L, op = "spec-holder") {
          started.countDown(); release.await()
        })
      holder.start(); started.await()
      val e = intercept[IllegalStateException] {
        Ivf.appendBatchIdempotent(index, batch, token = "ingest:z")
      }
      assert(e.getMessage.contains("lease"), e.getMessage)
      assert(e.getMessage.contains("spec-holder"),
        s"the failure must name the holder: ${e.getMessage}")
      release.countDown(); holder.join()
      // after the holder releases, the same mutation goes through
      assert(Ivf.appendBatchIdempotent(index, batch, token = "ingest:z"))
    } finally IndexMaint.defaultLeaseTimeoutMs = old
  }

  test("buildIndexCached: session memo serves repeats; source rewrite invalidates") {
    import spark.implicits._
    val d = tmpDir("ivf_memo_src")
    val rnd = new scala.util.Random(83)
    (0L until 100L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val idxPath = tmpDir("ivf_memo_idx")
    val a = Ivf.buildIndexCached(emb, s"$d/embeddings.parquet", idxPath, 4, 1)
    val b = Ivf.buildIndexCached(emb, s"$d/embeddings.parquet", idxPath, 4, 1)
    assert(a eq b, "second call must hit the memo")
    // new data lands in the source dir -> fingerprint changes -> rebuild
    Thread.sleep(10)
    (100L until 120L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
      .write.mode("append").parquet(s"$d/embeddings.parquet")
    val emb2 = spark.read.parquet(s"$d/embeddings.parquet")
    val c = Ivf.buildIndexCached(emb2, s"$d/embeddings.parquet", idxPath, 4, 1)
    assert(!(c eq a), "rewritten source must invalidate the memo")
    // the stale fingerprint's entry for the SAME path must be evicted,
    // not accumulate: exactly one cache key may reference idxPath now
    assert(Ivf.indexCacheSnapshot.count(_._1 == idxPath) === 1,
      "stale same-path entry must be dropped on rebuild")
  }
  test("drift + rebalance: shifted appends flag drift and drop recall; rebalance restores both") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val dim = 32
    def around(c: Array[Float]): Array[Float] =
      c.map(x => x + rnd.nextGaussian().toFloat * 0.3f)
    // base distribution: 8 tight clusters
    val cBase = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat * 5f))
    val base = (0 until 320).map(i => (i.toLong, around(cBase(i % 8))))
    val d = tmpDir("ivf_drift_src")
    base.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    val idxPath = tmpDir("ivf_drift_idx")
    var index = Ivf.buildIndex(
      spark.read.parquet(s"$d/embeddings.parquet"), idxPath, kCells = 8, iters = 3)
    val fresh = Ivf.driftStats(spark, index)
    assert(fresh.build.nonEmpty && !fresh.drifted(),
      s"a just-built index must not report drift: $fresh")

    // distribution shift: 4 NEW clusters, each the midpoint direction of
    // two old centers rotated 45° OUT of the parents' plane (toward a
    // random orthogonal direction): still equally angled to both parent
    // centroids — so per-member noise splits each cluster across the two
    // frozen cells (the recall cliff) — while the cosine to EVERY frozen
    // centroid shrinks by cos 45° (the fit drop the drift dial sees)
    val cNew = (0 until 4).map { j =>
      val a = cBase(2 * j); val b = cBase(2 * j + 1)
      val an = math.sqrt(a.map(x => x.toDouble * x).sum)
      val bn = math.sqrt(b.map(x => x.toDouble * x).sum)
      // exact cosine bisector of the two parents...
      val mid = Array.tabulate(dim)(i => a(i) / an + b(i) / bn)
      val u = Array.fill(dim)(rnd.nextGaussian())
      Seq(a, b).foreach { w =>
        val d = (0 until dim).map(i => u(i) * w(i)).sum
        val n2 = w.map(x => x.toDouble * x).sum
        (0 until dim).foreach(i => u(i) -= d / n2 * w(i))
      }
      val un = math.sqrt(u.map(x => x * x).sum)
      val mn = math.sqrt(mid.map(x => x * x).sum)
      // ...rotated 45° toward an orthogonal direction, at parent scale
      Array.tabulate(dim)(i =>
        ((mid(i) / mn + u(i) / un) / math.sqrt(2.0) * (an + bn) / 2.0).toFloat)
    }
    // wider per-member noise than the quantizer's centroid-estimate
    // error, so membership genuinely flips between the two parent cells
    val shifted = (0 until 400).map { i =>
      ((1000 + i).toLong,
        cNew(i % 4).map(x => x + rnd.nextGaussian().toFloat * 0.8f))
    }
    Ivf.appendBatch(index, shifted.toDF("vec_id", "embedding"))
    val drifted = Ivf.driftStats(spark, index)
    assert(drifted.meanCosNow < drifted.meanCosBuild,
      s"shifted appends must lower quantizer fit: $drifted")
    assert(drifted.drifted(),
      s"drift dial must fire after shifted appends: cos ${drifted.meanCosBuild} -> " +
        s"${drifted.meanCosNow}, skew ${drifted.skewBuild} -> ${drifted.skewNow}")

    // recall@10 at nprobe=1 for queries from the SHIFTED distribution,
    // truth = exact cosine over the index contents
    val queries = (0 until 20).map { q =>
      ((5000 + q).toLong, cNew(q % 4).map(x => x + rnd.nextGaussian().toFloat * 0.8f))
    }.toDF("vec_id", "embedding").localCheckpoint()
    def recall(ix: Ivf.IvfIndex): Double = {
      val corpus = Ivf.indexData(spark, ix.path)
        .select(col("vec_id"), col("embedding"), col("nrm"))
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        Similarity.l2norm(col("embedding")).as("qnrm"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
      val truth = corpus.crossJoin(broadcast(q))
        .select(col("query_id"), col("vec_id"),
          (Similarity.dot(col("embedding"), col("qvec")) / (col("nrm") * col("qnrm"))).as("score"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
        .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Ivf.screenBatch(spark, ix, queries, k = 10, nprobe = 1)
        .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.count(got.contains).toDouble / truth.size
    }
    val before = recall(index)
    index = Ivf.rebalance(spark, index, iters = 3)
    val after = recall(index)
    assert(after > before + 0.1,
      s"rebalance must restore boundary-split recall: before=$before after=$after")
    assert(after >= 0.9, s"post-rebalance recall@10 too low: $after")
    val healed = Ivf.driftStats(spark, index)
    assert(!healed.drifted(), s"a rebalanced index must not report drift: $healed")
    // the swap kept the same path and the sidecars follow the new data
    val reopened = Ivf.loadIndex(idxPath)
    assert(reopened.centroids.length === 8)
    assert(Ivf.indexData(spark, idxPath).count() === 720)
  }

  test("buildIndexCached: cache is LRU-bounded; concurrent same-path builds share one instance") {
    import spark.implicits._
    val d = tmpDir("ivf_bound_src")
    val rnd = new scala.util.Random(97)
    (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    // eviction proven on the REAL index cache: IndexCacheBound + 2
    // distinct paths (a miss now reopens rather than rebuilds, so the
    // bound caps handle memory only — but it must still evict). Builds
    // are tiny (60 rows, kCells=2, iters=0); the assertions read the
    // JVM-global cache, which is safe because forked sbt tests run
    // suites sequentially (keep it that way or isolate this test)
    val paths = (0 until Ivf.IndexCacheBound + 2)
      .map(i => tmpDir(s"ivf_bound_$i"))
    paths.foreach(p => Ivf.buildIndexCached(emb, s"$d/embeddings.parquet", p, 2, 0))
    val held = Ivf.indexCacheSnapshot.map(_._1).toSet
    assert(held.size === Ivf.IndexCacheBound,
      s"index cache must evict down to its bound: ${held.size}")
    assert(!held.contains(paths.head) && !held.contains(paths(1)),
      "the two oldest entries must be the ones aged out")
    assert(held.contains(paths.last), "the newest entry must be held")
    // two threads miss the same (path, fingerprint) at once: the
    // per-path lock serializes the overwrite build and both callers
    // land on the one winning instance
    val racePath = tmpDir("ivf_race_idx")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[AnyRef]()
    val threads = (0 until 2).map { _ =>
      new Thread(() => results.add(
        Ivf.buildIndexCached(emb, s"$d/embeddings.parquet", racePath, 2, 0)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val got = results.toArray
    assert(got.length === 2)
    assert(got(0) eq got(1), "racing builders must resolve to one shared index")
  }

  test("filtered ANN: every neighbor satisfies the predicate; full probe equals the exact filtered ranking") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val labels = rows.map(e => e._1 -> e._3).toMap
    val vecs = rows.map(e => e._1 -> e._2.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    // full probe: the filter composes under an exhaustive cell scan, so
    // the result IS the exact label-restricted ranking
    val got = Ivf.ivfAnnFilteredAt(spark, dir, nQueries = 5, k = 10,
      kCells = 8, nprobe = 8, iters = 2, label = 3).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(labels(r.getLong(2)) === 3,
      s"neighbor ${r.getLong(2)} violates the label predicate"))
    (0L until 5L).foreach { q =>
      val expect = rows.filter(e => e._3 == 3 && e._1 != q)
        .map(e => (cos(vecs(q), vecs(e._1)), e._1))
        .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
      val gotQ = got.filter(_.getLong(0) == q).map(_.getLong(2)).toSet
      assert(gotQ === expect, s"query $q: filtered top-10 must match the exact filtered ranking")
    }
    // query 3's planted near-copy (vec 323) carries label 3 and must win
    // rank 1 even under a narrow probe — its cell is the first probed
    val narrow = Ivf.ivfAnnFilteredAt(spark, dir, nQueries = 5, k = 10,
      kCells = 8, nprobe = 2, iters = 2, label = 3).collect()
    val q3 = narrow.filter(_.getLong(0) == 3L).minBy(_.getInt(1))
    assert(q3.getLong(2) === 323L, "the label-matching planted copy must rank first")
    // query 0's planted copy (vec 320, label 0) is filtered out everywhere
    assert(!got.exists(r => r.getLong(0) == 0L && r.getLong(2) == 320L))
  }

  test("compactIndex: segment files collapse; tokens, drift baseline and screens are byte-identical") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_cmp")
    val index = Ivf.buildIndex(emb.filter(col("vec_id") < 280), idxPath,
      kCells = 8, iters = 1)
    (0 until 4).foreach { b =>
      assert(Ivf.appendBatchIdempotent(index,
        emb.filter(col("vec_id") >= 280 + b * 10 && col("vec_id") < 290 + b * 10),
        s"seg:$b"))
    }
    val delta = emb.filter(col("vec_id") >= 320).localCheckpoint()
    def dataFiles(): Seq[String] = {
      val live = java.nio.file.Paths.get(graft.util.IndexMaint.liveGen(idxPath))
      val walk = java.nio.file.Files.walk(live)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.map(_.toString)
          .filter(f => f.endsWith(".parquet") && !f.contains("_token"))
          .toSeq
      } finally walk.close()
    }
    def screen(): Seq[String] =
      Ivf.screenBatch(spark, Ivf.loadIndex(idxPath), delta, k = 5, nprobe = 8)
        .collect().map(_.toString).sorted.toSeq
    val filesBefore = dataFiles().size
    val screenBefore = screen()
    val driftBefore = Ivf.driftStats(spark, Ivf.loadIndex(idxPath))
    val compacted = Ivf.compactIndex(spark, Ivf.loadIndex(idxPath))
    // 1 build + 4 append segments x per-cell files collapse to <= one
    // file per cell
    assert(dataFiles().size < filesBefore,
      s"compaction must reduce files ($filesBefore -> ${dataFiles().size})")
    assert(dataFiles().size <= 8, s"expected <= one file per cell, got ${dataFiles().size}")
    assert(Ivf.indexData(spark, idxPath).count() === 320)
    assert(screen() === screenBefore, "screens must be byte-identical across compaction")
    // replay of an applied batch still no-ops: tokens survived the rewrite
    assert(!Ivf.appendBatchIdempotent(compacted,
      emb.filter(col("vec_id") >= 280 && col("vec_id") < 290), "seg:0"))
    assert(Ivf.indexData(spark, idxPath).count() === 320)
    // the build-time drift baseline is carried, not recomputed — and the
    // contents' CURRENT stats are unchanged too (same rows, same cells)
    val driftAfter = Ivf.driftStats(spark, compacted)
    assert(driftAfter.build === driftBefore.build, "compaction must not reset the drift baseline")
    // current stats recompute over re-laid-out files: occupancies are
    // exact, mean cosines equal up to summation-order ulps
    assert(driftAfter.now.map(c => (c.cid, c.n)) === driftBefore.now.map(c => (c.cid, c.n)))
    driftAfter.now.zip(driftBefore.now).foreach { case (a, b) =>
      assert(math.abs(a.meanCos - b.meanCos) < 1e-9) }
    // a genuinely new batch still lands on the compacted generation
    assert(Ivf.appendBatchIdempotent(compacted, delta, "seg:new"))
    assert(Ivf.indexData(spark, idxPath).count() === 325)
  }

  test("deleteIds: deleted ids vanish from every screen immediately; compaction reclaims them physically and recomputes the baseline") {
    import graft.util.IndexMaint
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_del")
    val index = Ivf.buildIndex(emb, idxPath, kCells = 8, iters = 2)
    // queries 0..4 have planted near-copies 320..324 at rank 1
    val queries = emb.filter(col("vec_id") < 5).localCheckpoint()
    // k = 15 head, so the survivor-filtered prefix still covers a full
    // post-delete top-10 per query
    val before = Ivf.screenBatch(spark, index, queries, k = 15, nprobe = 8).collect()
    assert(before.exists(r => r.getLong(0) == 0L && r.getLong(2) == 320L && r.getInt(1) <= 2),
      "precondition: planted copy 320 sits at the head for query 0 (behind self)")
    // the takedown: all five planted copies
    val doomed = Seq(320L, 321L, 322L, 323L, 324L)
    assert(Ivf.deleteIds(index, doomed) === 5)
    assert(Ivf.indexData(spark, idxPath).count() === 320)
    val after = Ivf.screenBatch(spark, index, queries, k = 10, nprobe = 8).collect()
    assert(!after.exists(r => doomed.contains(r.getLong(2))),
      "deleted ids must be invisible to screens")
    // not a post-rank page filter: every query still gets a FULL top-10
    // over the survivors
    assert(after.groupBy(_.getLong(0)).values.forall(_.length == 10))
    // screens equal the same screen over an index that never held the
    // deleted rows in its DATA (same quantizer: deletion never retrains)
    val droppedSet = doomed.toSet
    val expect = before // full-probe exact: survivors keep relative order
      .filter(r => !droppedSet.contains(r.getLong(2)))
      .groupBy(_.getLong(0)).values.flatMap(_.sortBy(_.getInt(1)).take(10).zipWithIndex
        .map { case (r, i) => (r.getLong(0), i + 1, r.getLong(2)) }).toSet
    assert(after.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet === expect,
      "post-delete ranking must equal the survivor-filtered pre-delete ranking (full probe)")
    // drift health reflects live contents only
    val drifted = Ivf.driftStats(spark, index)
    assert(drifted.now.map(_.n).sum === 320L, "tombstoned rows must not count toward drift stats")
    // physical reclamation at compaction: raw files lose the rows, the
    // sidecar clears, the baseline recomputes over survivors
    val compacted = Ivf.compactIndex(spark, index)
    val liveGen = IndexMaint.liveGen(idxPath)
    assert(IndexMaint.readTombstones(liveGen).isEmpty,
      "compaction must clear the tombstone sidecar")
    assert(spark.read.parquet(liveGen).count() === 320,
      "compaction must drop tombstoned rows from the data files")
    val healedBaseline = Ivf.driftStats(spark, compacted)
    assert(healedBaseline.build.map(_.n).sum === 320L,
      "post-delete compaction must recompute the baseline over survivors")
    assert(Ivf.screenBatch(spark, compacted, queries, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet === expect,
      "screens must be identical before and after physical reclamation")
  }

  test("a concentrated takedown shifts occupancy skew in driftStats immediately — the rebalance dial is neither masked nor deferred by pending deletes") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_drift_del")
    val index = Ivf.buildIndex(emb, idxPath, kCells = 8, iters = 2)
    val fresh = Ivf.driftStats(spark, index)
    assert(math.abs(fresh.skewNow - fresh.skewBuild) < 1e-12,
      "a fresh index reads its own baseline")
    // hollow out ONE cell: tombstone 30 of cluster 0's ~41 members — a
    // ~30% single-cell takedown wave, still far below the rewrite bar
    val doomed = emb.filter(col("vec_id") % 8 === 0)
      .select("vec_id").collect().map(_.getLong(0)).sorted.take(30).toSeq
    Ivf.deleteIds(index, doomed)
    val d = Ivf.driftStats(spark, index)
    assert(d.now.map(_.n).sum === fresh.now.map(_.n).sum - 30,
      "tombstoned rows must leave the occupancy scan before any compaction")
    assert(d.skewNow > fresh.skewNow + 0.05,
      s"the hollowed cell must shift skew NOW (${fresh.skewNow} -> ${d.skewNow})")
    assert(d.skewBuild === fresh.skewBuild,
      "the build baseline is untouched by a logical delete")
  }

  test("delete then append-same-id: later insert wins (the delete-then-insert upsert contract)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_del_readd")
    val index = Ivf.buildIndex(emb.filter(col("vec_id") < 320), idxPath,
      kCells = 8, iters = 1)
    Ivf.deleteIds(index, Seq(30L, 31L))
    assert(Ivf.indexData(spark, idxPath).filter(col("vec_id") === 30L).count() === 0)
    // a NEW append re-adds id 30 (not a replay — fresh token): it must
    // come back, while 31 stays deleted
    assert(Ivf.appendBatchIdempotent(index,
      emb.filter(col("vec_id") === 30L), token = "readd:1"))
    assert(Ivf.indexData(spark, idxPath).filter(col("vec_id") === 30L).count() === 1)
    assert(Ivf.indexData(spark, idxPath).filter(col("vec_id") === 31L).count() === 0)
    assert(graft.util.IndexMaint.tombstonedIds(
      graft.util.IndexMaint.liveGen(idxPath)).toSeq === Seq(30L, 31L),
      "re-adding does not rewrite the tombstone set — the new segment is simply newer")
  }

  test("delete x replay token: a replayed append cannot resurrect a deleted id") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_del_replay")
    val index = Ivf.buildIndex(emb.filter(col("vec_id") < 300), idxPath,
      kCells = 8, iters = 1)
    val batch = emb.filter(col("vec_id").isin(300L, 301L, 302L)).localCheckpoint()
    assert(Ivf.appendBatchIdempotent(index, batch, token = "ingest:42"))
    Ivf.deleteIds(index, Seq(301L))
    assert(Ivf.indexData(spark, idxPath).filter(col("vec_id") === 301L).count() === 0)
    // the at-least-once replay of the ALREADY-APPLIED batch no-ops: the
    // token detects it, so the delete survives — only a genuinely new
    // insert (new token) may resurrect
    assert(!Ivf.appendBatchIdempotent(index, batch, token = "ingest:42"))
    assert(Ivf.indexData(spark, idxPath).filter(col("vec_id") === 301L).count() === 0)
    // deletes survive a rebalance (rows physically gone from the new
    // generation) AND the replay still no-ops across it
    val rebuilt = Ivf.rebalance(spark, index, iters = 1)
    assert(Ivf.indexData(spark, idxPath).filter(col("vec_id") === 301L).count() === 0)
    assert(spark.read.parquet(graft.util.IndexMaint.liveGen(idxPath))
      .filter(col("vec_id") === 301L).count() === 0,
      "rebalance must reclaim tombstoned rows physically")
    assert(!Ivf.appendBatchIdempotent(rebuilt, batch, token = "ingest:42"))
    assert(Ivf.indexData(spark, idxPath).filter(col("vec_id") === 301L).count() === 0)
  }

  test("upsertBatchIdempotent: one leased delete-then-insert == deleteIds + append composed; replay no-ops; compaction reclaims the hidden copies") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 320).localCheckpoint()
    // re-embed ids 10..12 with the planted-copy vectors of queries 0..2
    // — real table values, the registered query's donor-join shape
    val batch = emb.filter(col("vec_id").isin(320L, 321L, 322L))
      .select((col("vec_id") - 310L).as("vec_id"), col("embedding"))
      .localCheckpoint()
    val pUp = tmpDir("ivf_ups")
    val a = Ivf.buildIndex(base, pUp, kCells = 8, iters = 2)
    val b = Ivf.buildIndex(base, tmpDir("ivf_ups_cmp"), kCells = 8, iters = 2)
    assert(Ivf.upsertBatchIdempotent(a, batch, "ups:1"))
    // the composed form on an identical (deterministic) build
    Ivf.deleteIds(b, Seq(10L, 11L, 12L))
    assert(Ivf.appendBatchIdempotent(b, batch, "ups:1"))
    val queries = emb.filter(col("vec_id") < 5).localCheckpoint()
    val sa = Ivf.screenBatch(spark, a, queries, k = 10, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq
    val sb = Ivf.screenBatch(spark, b, queries, k = 10, nprobe = 8).collect()
    assert(sa === sb.map(_.toString).sorted.toSeq,
      "upsert must equal deleteIds + appendBatchIdempotent composed")
    // the re-embedding is effective: id 10 (now query 0's planted copy)
    // screens at the head, right behind self
    assert(sb.exists(r => r.getLong(0) == 0L && r.getLong(2) == 10L && r.getInt(1) <= 2),
      "the new vector must win the ranking for its donor's query")
    // exactly one live copy per upserted id; corpus size preserved
    assert(Ivf.indexData(spark, pUp)
      .filter(col("vec_id").isin(10L, 11L, 12L)).count() === 3)
    assert(Ivf.indexData(spark, pUp).count() === 320)
    // a replayed upsert no-ops entirely (no new tombstones, no segment)
    assert(!Ivf.upsertBatchIdempotent(a, batch, "ups:1"))
    assert(Ivf.indexData(spark, pUp).count() === 320)
    assert(graft.util.IndexMaint.tombstonedIds(
      graft.util.IndexMaint.liveGen(pUp)).toSeq === Seq(10L, 11L, 12L))
    // compaction drops the three hidden old copies physically
    val compacted = Ivf.compactIndex(spark, a)
    assert(spark.read.parquet(graft.util.IndexMaint.liveGen(pUp)).count() === 320,
      "the hidden pre-upsert copies must be reclaimed")
    assert(Ivf.screenBatch(spark, compacted, queries, k = 10, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq === sa)
  }

  test("applyCdcIdempotent: unknown op fails loudly before any mutation; a pure-delete batch commits a durable token; a mixed batch applies atomically") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 320).localCheckpoint()
    val idx = Ivf.buildIndex(base, tmpDir("ivf_cdc"), kCells = 8, iters = 2)
    // unknown verb: loud failure, nothing tombstoned, nothing committed
    val bad = emb.filter(col("vec_id") === 5L)
      .select(col("vec_id"), col("embedding"), lit("merge").as("op"))
    val e = intercept[IllegalArgumentException] {
      Ivf.applyCdcIdempotent(idx, bad, "cdc:bad")
    }
    assert(e.getMessage.contains("merge"))
    assert(!Ivf.appliedTokens(idx).contains("cdc:bad"))
    assert(graft.util.IndexMaint.tombstonedIds(
      graft.util.IndexMaint.liveGen(idx.path)).isEmpty)
    // pure-delete batch: ids leave every read NOW, and the token is
    // durable (zero-row segment) so the replay no-ops
    val del = base.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"), lit("delete").as("op"))
    assert(Ivf.applyCdcIdempotent(idx, del, "cdc:d1"))
    assert(Ivf.appliedTokens(idx).contains("cdc:d1"))
    assert(Ivf.indexData(spark, idx.path).filter(col("vec_id") < 3).count() === 0)
    assert(!Ivf.applyCdcIdempotent(idx, del, "cdc:d1"))
    // mixed batch: insert a new id and upsert an existing one, one commit
    val mixed = emb.filter(col("vec_id") === 320L)
      .select(lit(900L).as("vec_id"), col("embedding"), lit("insert").as("op"))
      .unionByName(emb.filter(col("vec_id") === 321L)
        .select(lit(7L).as("vec_id"), col("embedding"), lit("upsert").as("op")))
    assert(Ivf.applyCdcIdempotent(idx, mixed, "cdc:m1"))
    val data = Ivf.indexData(spark, idx.path)
    assert(data.filter(col("vec_id") === 900L).count() === 1)
    assert(data.filter(col("vec_id") === 7L).count() === 1,
      "an upserted id must have exactly one live copy")
    assert(data.count() === 320 - 3 + 1)
    // a producer violating the insert contract (insert for an EXISTING
    // id) creates a duplicate that compaction detects and refuses,
    // naming the upsert remedy — never silently re-lands
    val badInsert = emb.filter(col("vec_id") === 322L)
      .select(lit(7L).as("vec_id"), col("embedding"), lit("insert").as("op"))
    assert(Ivf.applyCdcIdempotent(idx, badInsert, "cdc:dup"))
    val dup = intercept[IllegalArgumentException] {
      Ivf.compactIndex(spark, idx)
    }
    assert(dup.getMessage.contains("upsert"))
  }

  test("deleteWhere: a filtered compaction equals deleteIds + compact composed; all-matching predicate refused; tombstones subsumed") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 320).localCheckpoint()
    val a = Ivf.buildIndex(base, tmpDir("ivf_dw_a"), kCells = 8, iters = 2)
    val b = Ivf.buildIndex(base, tmpDir("ivf_dw_b"), kCells = 8, iters = 2)
    // a: one bulk rewrite; b: the bounded-takedown path then compaction
    // — plus a pre-existing tombstone on a that the rewrite subsumes
    Ivf.deleteIds(a, Seq(300L))
    val a2 = Ivf.deleteWhere(spark, a, col("vec_id") % 4 === 1 || col("vec_id") === 300L)
    Ivf.deleteIds(b, (0L until 320L).filter(i => i % 4 == 1 || i == 300L))
    val b2 = Ivf.compactIndex(spark, b)
    val queries = emb.filter(col("vec_id") < 5).localCheckpoint()
    def page(ix: Ivf.IvfIndex): Seq[String] =
      Ivf.screenBatch(spark, ix, queries, k = 10, nprobe = 8)
        .collect().map(_.toString).sorted.toSeq
    assert(page(a2) === page(b2),
      "the rewrite and the tombstone path must serve identical screens")
    // no tombstone sidecar remains: the rewrite IS the reclamation
    val gen = graft.util.IndexMaint.liveGen(a2.path)
    assert(graft.util.IndexMaint.readTombstones(gen).isEmpty)
    assert(spark.read.parquet(gen).filter(col("vec_id") % 4 === 1).count() === 0)
    // a predicate matching everything is refused loudly
    val e = intercept[IllegalArgumentException] {
      Ivf.deleteWhere(spark, a2, col("vec_id") >= 0L)
    }
    assert(e.getMessage.contains("drop the index"))
  }

  test("deletes under two writers: concurrent disjoint takedowns serialize under the lease; the union lands") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idxPath = tmpDir("ivf_del_race")
    val index = Ivf.buildIndex(emb, idxPath, kCells = 4, iters = 1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(3L, 4L, 100L)).map { ids =>
      new Thread(() => try { Ivf.deleteIds(index, ids); () }
        catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent deletes must serialize, got ${errs.toArray.mkString(";")}")
    val tombs = graft.util.IndexMaint.tombstonedIds(
      graft.util.IndexMaint.liveGen(idxPath)).toSet
    assert(tombs === Set(1L, 2L, 3L, 4L, 5L, 6L, 100L),
      s"the union of racing deletes must land atomically: $tombs")
    assert(Ivf.indexData(spark, idxPath).count() === 325 - 7)
  }

  test("screenBatchDouble: a derived double query (the PRF-centroid shape) ranks exactly at full probe; low nprobe plans only its cells") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val path = tmpDir("ivf_dq") + "/index"
    val index = Ivf.buildIndex(emb, path, kCells = 8, iters = 2)
    // a DERIVED double query: the coordinate mean of two same-cluster
    // vectors, computed in double and never round-tripped through float
    val q = emb.filter(col("vec_id").isin(0L, 8L))
      .select(posexplode(col("embedding")))
      .groupBy(col("pos")).agg(avg(col("col").cast("double")).as("v"))
      .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
      .select(lit(77L).as("vec_id"), expr("transform(pv, x -> x.v)").as("embedding"))
      .localCheckpoint()
    val (got, probed) = Ivf.screenBatchProbed(spark, index, q, k = 10,
      nprobe = 8, queryIsDouble = true)
    assert(probed.size === 8)
    // exact at full probe: the brute-force double ranking over the
    // corpus (dot/|candidate| — the screen's documented score, computed
    // without the per-query |q| division so strict orders can't
    // collapse under IEEE rounding)
    val want = emb.crossJoin(broadcast(q.select(col("embedding").as("qvec"))))
      .withColumn("score",
        expr("""aggregate(zip_with(qvec, embedding, (x, y) -> x * CAST(y AS DOUBLE)),
          |CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
          / Similarity.l2norm(col("embedding")))
      .orderBy(col("score").desc, col("vec_id")).limit(10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(got.select("vec_id").collect().map(_.getLong(0)).toSeq === want,
      "full probe must reproduce the brute-force double ranking exactly")
    // production dial: one query at nprobe=2 plans exactly two cells —
    // the partition pruning the hybrid serving path inherits
    val (got2, probed2) = Ivf.screenBatchProbed(spark, index, q, k = 10,
      nprobe = 2, queryIsDouble = true)
    assert(probed2.size === 2, s"one query at nprobe=2 must plan two cells: $probed2")
    assert(got2.count() === 10)
  }

  test("deleteWhereCached: an opaque (UDF) predicate is refused without an explicit key — expression text is not injective") {
    import spark.implicits._
    val d = tmpDir("ivf_delw_key")
    val rnd = new scala.util.Random(91)
    (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val oddUdf = udf((id: Long) => id % 2 == 1)
    val e = intercept[IllegalArgumentException] {
      Ivf.deleteWhereCached(emb, s"$d/embeddings.parquet",
        tmpDir("ivf_delw_idx"), kCells = 2, iters = 0, oddUdf(col("vec_id")))
    }
    assert(e.getMessage.contains("predicateKey"),
      s"the refusal must point at the explicit-key escape hatch: ${e.getMessage}")
    // the expr("...") route is opaque too: the parsed text can call a
    // session-registered name whose lambda changes between calls
    val e2 = intercept[IllegalArgumentException] {
      Ivf.deleteWhereCached(emb, s"$d/embeddings.parquet",
        tmpDir("ivf_delw_idx_sql"), kCells = 2, iters = 0,
        org.apache.spark.sql.functions.expr("vec_id % 2 = 1"))
    }
    assert(e2.getMessage.contains("predicateKey"), e2.getMessage)
    // with the caller naming the stratum, the same predicate memoizes fine
    val idxPath = tmpDir("ivf_delw_idx2")
    val after = Ivf.deleteWhereCached(emb, s"$d/embeddings.parquet", idxPath,
      kCells = 2, iters = 0, oddUdf(col("vec_id")), Some("odd-ids"))
    val survivors = Ivf.indexData(spark, after.path).select("vec_id")
      .as[Long].collect().toSet
    assert(survivors.nonEmpty && survivors.forall(_ % 2 == 0),
      s"only the even stratum may survive: ${survivors.take(5)}")
  }

  test("pinned snapshot: as-of screening is bit-identical through delete, upsert, append and a compaction rewrite") {
    val rnd = new scala.util.Random(23)
    def v(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0 until 240).map(i => (i.toLong, v())).toDF("vec_id", "embedding")
    val queries = (1000 until 1004).map(i => (i.toLong, v())).toDF("vec_id", "embedding")
    val path = tmpDir("ivf_pin") + "/index"
    val index = Ivf.buildIndex(base, path, kCells = 8, iters = 2)
    val atPin = Ivf.screenBatch(spark, index, queries, k = 5, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq
    Ivf.pinIndex(path, "pre")
    Ivf.deleteIds(index, (0 until 240 by 5).map(_.toLong))
    assert(Ivf.upsertBatchIdempotent(Ivf.loadIndex(path),
      (1 until 240 by 7).map(i => (i.toLong, v())).toDF("vec_id", "embedding"),
      "pin:ups"))
    assert(Ivf.appendBatchIdempotent(Ivf.loadIndex(path),
      (300 until 330).map(i => (i.toLong, v())).toDF("vec_id", "embedding"),
      "pin:app"))
    val live = Ivf.screenBatch(spark, Ivf.loadIndex(path), queries, k = 5, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(live !== atPin, "the mutation wave must move the live screen")
    assert(Ivf.screenBatchAsOf(spark, path, "pre", queries, k = 5, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq === atPin,
      "the snapshot must hide later segments, tombstones and re-embeds")
    Ivf.compactIndex(spark, Ivf.loadIndex(path))
    assert(Ivf.screenBatchAsOf(spark, path, "pre", queries, k = 5, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq === atPin,
      "the pinned generation must survive the rewrite's reap")
    assert(graft.util.IndexMaint.unpin(path, "pre"))
    Ivf.compactIndex(spark, Ivf.loadIndex(path))
    Ivf.compactIndex(spark, Ivf.loadIndex(path))
    intercept[IllegalArgumentException] {
      Ivf.screenBatchAsOf(spark, path, "pre", queries, k = 5, nprobe = 8)
    }
  }
}
