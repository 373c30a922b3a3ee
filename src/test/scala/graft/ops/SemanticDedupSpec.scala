package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** 120 random vectors + a near-copy of each of the first 6 — the
    * planted copies must collapse onto their originals.
    */
  private def plantedDir(): String = {
    val rnd = new scala.util.Random(23)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 120).map(i => (i.toLong, vec(), i % 10))
    val planted = (0 until 6).map { i =>
      val v = base(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      ((120 + i).toLong, v, i % 10)
    }
    val dir = tmpDir("semdedup")
    (base ++ planted).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted near-copies are marked duplicates of their originals") {
    val dir = plantedDir()
    val out = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getLong(3))).toMap
    // a near-copy dedups onto its original iff they land in the same
    // cell; with a copy this close (cosine ~0.9999) they always do
    (0 until 6).foreach { i =>
      val (isDup, dupOf) = out(120L + i)
      assert(isDup, s"planted copy ${120 + i} not marked duplicate")
      assert(dupOf === i.toLong, s"copy ${120 + i} deduped onto $dupOf, not $i")
    }
    // originals are keepers: nothing earlier can be >= tau-similar
    (0 until 6).foreach(i => assert(!out(i.toLong)._1, s"original $i marked dup"))
  }

  test("every row is returned with a cell id; non-dups carry the -1 sentinel") {
    val dir = plantedDir()
    val out = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95, iters = 2)
    assert(out.count() === 126)
    assert(out.filter(!col("is_dup") && col("dup_of") =!= -1L).count() === 0)
    assert(out.filter(col("is_dup") && col("dup_of") === -1L).count() === 0)
    assert(out.filter(col("cid") < 0 || col("cid") >= 8).count() === 0)
  }

  test("duplicates always point at an EARLIER keeper in the same cell") {
    val out = Similarity.semanticDedup(spark, sf).cache()
    val dups = out.filter(col("is_dup"))
    assert(dups.filter(col("dup_of") >= col("vec_id")).count() === 0)
    // dup_of is a member of the same cell
    val cells = out.select(col("vec_id").as("dup_of"), col("cid").as("rep_cid"))
    assert(dups.join(cells, "dup_of")
      .filter(col("cid") =!= col("rep_cid")).count() === 0)
  }

  test("int8 pair step: planted copies still collapse; decisions track the float variant") {
    val dir = plantedDir()
    val f = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getLong(3))).toMap
    val q = Similarity.semanticDedupInt8At(spark, dir, kCells = 8, tau = 0.95, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getLong(3))).toMap
    // near-identical copies (cosine ~0.9999) survive the <=1% similarity
    // perturbation of int8 codes
    (0 until 6).foreach { i =>
      val (isDup, dupOf) = q(120L + i)
      assert(isDup, s"planted copy ${120 + i} must survive quantization")
      assert(dupOf === i.toLong)
      assert(!q(i.toLong)._1, s"original $i must stay the keeper")
    }
    // the two variants agree except near the tau boundary: allow a few
    // flips on random pairs, never on the planted ones checked above
    val flips = f.keys.count(k => f(k)._1 != q(k)._1)
    assert(flips <= f.size / 20, s"int8 flipped $flips of ${f.size} decisions")
  }

  test("cell-boundary near-dup pair: single-probe provably misses, nprobeAssign=2 catches") {
    // three tight clusters on orthogonal axes + a near-dup pair planted
    // ACROSS the A/B boundary: vA leans to cluster A, vB to cluster B
    // (cosine(vA, vB) ≈ 0.9965 ≥ τ) — their PRIMARY cells differ, so
    // single-cell SemDeDup cannot see the pair; with 2 probe cells they
    // co-probe and the pair is caught. k = 3 > p = 2: multi-probe is
    // not probe-everything.
    val rnd = new scala.util.Random(41)
    val dim = 64
    def clusterVec(axis: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat * 0.3f)
      v(axis) += 5f
      v
    }
    val base = (0 until 90).map(i => (i.toLong, clusterVec(i % 3)))
    val vA = Array.tabulate(dim)(j => if (j == 0) 1.0f else if (j == 1) 0.92f else 0f)
    val vB = Array.tabulate(dim)(j => if (j == 0) 0.92f else if (j == 1) 1.0f else 0f)
    val dir = tmpDir("semdedup_boundary")
    (base :+ (90L, vA) :+ (91L, vB)).toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")

    val single = Similarity.semanticDedupAt(spark, dir, kCells = 3, tau = 0.95,
        iters = 3, nprobeAssign = 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2), r.getLong(3))).toMap
    assert(single(90L)._1 !== single(91L)._1,
      "planted pair must straddle two cells for this test to bite")
    assert(!single(91L)._2, "single-probe must miss the cross-boundary pair")

    val multi = Similarity.semanticDedupAt(spark, dir, kCells = 3, tau = 0.95,
        iters = 3, nprobeAssign = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2), r.getLong(3))).toMap
    assert(multi(91L)._2 && multi(91L)._3 === 90L,
      s"2-probe must catch the boundary pair, got ${multi(91L)}")
    assert(!multi(90L)._2, "the earlier member stays the keeper")
    // primary cell ids are unchanged by the probe dial
    single.foreach { case (id, (cid, _, _)) => assert(multi(id)._1 === cid) }
  }

  test("saltBlocks: the blocked pair join emits identical verdicts — the skew dial is invisible") {
    val dir = plantedDir()
    val plain = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95, iters = 2)
      .collect().map(_.toString).toSeq
    val salted = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95,
        iters = 2, saltBlocks = 4)
      .collect().map(_.toString).toSeq
    assert(salted === plain, "salting must not change any verdict")
    // and it composes with the boundary dial
    val plain2 = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95,
        iters = 2, nprobeAssign = 2)
      .collect().map(_.toString).toSeq
    val salted2 = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95,
        iters = 2, nprobeAssign = 2, saltBlocks = 4)
      .collect().map(_.toString).toSeq
    assert(salted2 === plain2, "salting must compose with nprobeAssign unchanged")
  }

  test("auto-salt: the default derives g from occupancy; a tiny target forces g>1 with identical verdicts") {
    // derivation math: g = ceil(maxOcc / sqrt(2*target))
    assert(Similarity.autoSaltBlocks(0L, 4000000L) === 1)
    assert(Similarity.autoSaltBlocks(2828L, 4000000L) === 1) // just under sqrt(8M)
    assert(Similarity.autoSaltBlocks(28284L, 4000000L) === 10)
    val dir = plantedDir()
    // target 50 pairs/task: every cell overflows it, so auto must salt —
    // and the result must still equal the unsalted run exactly
    val auto = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95,
        iters = 2, saltTargetPairs = 50L)
      .collect().map(_.toString).toSeq
    val plain = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95,
        iters = 2, saltBlocks = 1)
      .collect().map(_.toString).toSeq
    assert(auto === plain, "auto-salted verdicts must equal the unsalted run")
  }

  test("int8 x multi-probe compose: the straddling pair is caught under int8 scoring") {
    // same boundary fixture as the float test: the dials must COMPOSE —
    // int8 single-probe still misses the cross-cell pair (the boundary
    // blind spot is orthogonal to the scoring), int8 2-probe catches it
    val rnd = new scala.util.Random(41)
    val dim = 64
    def clusterVec(axis: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat * 0.3f)
      v(axis) += 5f
      v
    }
    val base = (0 until 90).map(i => (i.toLong, clusterVec(i % 3)))
    val vA = Array.tabulate(dim)(j => if (j == 0) 1.0f else if (j == 1) 0.92f else 0f)
    val vB = Array.tabulate(dim)(j => if (j == 0) 0.92f else if (j == 1) 1.0f else 0f)
    val dir = tmpDir("semdedup_int8_boundary")
    (base :+ (90L, vA) :+ (91L, vB)).toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")

    val single = Similarity.semanticDedupInt8At(spark, dir, kCells = 3, tau = 0.95,
        iters = 3, nprobeAssign = 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2), r.getLong(3))).toMap
    assert(single(90L)._1 !== single(91L)._1,
      "planted pair must straddle two cells for this test to bite")
    assert(!single(91L)._2, "int8 single-probe must miss the cross-boundary pair")

    val multi = Similarity.semanticDedupInt8At(spark, dir, kCells = 3, tau = 0.95,
        iters = 3, nprobeAssign = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2), r.getLong(3))).toMap
    assert(multi(91L)._2 && multi(91L)._3 === 90L,
      s"int8 2-probe must catch the boundary pair, got ${multi(91L)}")
    assert(!multi(90L)._2, "the earlier member stays the keeper")
    // primary cell ids are unchanged by the probe dial
    single.foreach { case (id, (cid, _, _)) => assert(multi(id)._1 === cid) }
  }

  test("tau = 1.0 keeps everything except exact copies; tau tightens monotonically") {
    val dir = plantedDir()
    def nDups(tau: Double): Long =
      Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = tau, iters = 2)
        .filter(col("is_dup")).count()
    val loose = nDups(0.8)
    val tight = nDups(0.99)
    assert(loose >= tight, s"tau=0.8 dropped $loose < tau=0.99 dropped $tight")
    assert(tight >= 6) // the planted copies sit near cosine 1.0
  }

  test("incremental screen: base-wins verdicts on planted fixtures; base scan reads only probed partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def expand(pl: SparkPlan): Seq[SparkPlan] = pl match {
      case a: AdaptiveSparkPlanExec => pl +: expand(a.executedPlan)
      case q: QueryStageExec => pl +: expand(q.plan)
      case _ => pl +: pl.children.flatMap(expand)
    }
    val rnd = new scala.util.Random(41)
    val dim = 64
    // 8 well-separated clusters; base = 240 members over all clusters
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat * 5f))
    def around(c: Array[Float]) = c.map(x => x + rnd.nextGaussian().toFloat * 0.05f)
    val baseRows = (0 until 240).map(i => (i.toLong, around(centers(i % 8))))
    val idxDir = tmpDir("semdedup_incr_idx")
    val srcDir = tmpDir("semdedup_incr_src")
    baseRows.toDF("vec_id", "embedding")
      .write.parquet(s"$srcDir/embeddings.parquet")
    val index = Ivf.buildIndex(
      spark.read.parquet(s"$srcDir/embeddings.parquet"), idxDir,
      kCells = 8, iters = 3)
    // delta: a near-copy of base member 5 (dup_of_base, even though its
    // id is HIGHER — base wins), twin in-batch near-copies (first keeps
    // as new, second dup_in_delta), and one genuinely new vector
    val novel = Array.fill(dim)(rnd.nextGaussian().toFloat * 5f)
    val inBatch = around(centers(3).map(-_))
    val delta = Seq(
      (1000L, baseRows(5)._2.map(x => x + 0.001f * rnd.nextGaussian().toFloat)),
      (1001L, inBatch),
      (1002L, inBatch.map(x => x + 0.001f * rnd.nextGaussian().toFloat)),
      (1003L, novel)
    ).toDF("vec_id", "embedding").localCheckpoint()
    val res = Similarity.semanticDedupScreenDelta(spark, index, delta,
      tau = 0.95, nprobeAssign = 2)
    val rows = res.collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(rows(1000L) === ("dup_of_base", 5L),
      s"near-copy of a base member must dedup onto it: ${rows(1000L)}")
    assert(rows(1001L)._1 === "new", s"first in-batch member keeps: ${rows(1001L)}")
    assert(rows(1002L) === ("dup_in_delta", 1001L),
      s"second in-batch member defers to the first: ${rows(1002L)}")
    assert(rows(1003L)._1 === "new" && rows(1003L)._2 === -1L)
    // O(delta) read: the base index scan touches only probed partitions
    val scans = expand(res.queryExecution.executedPlan).collect {
      case sc: FileSourceScanExec
          if sc.relation.location.rootPaths.exists(_.toString.contains("semdedup_incr_idx")) => sc
    }
    assert(scans.nonEmpty, "base index scan missing from plan")
    scans.foreach(sc => assert(sc.partitionFilters.nonEmpty,
      "probed cids must prune the base scan as partition filters"))
    val readPartitions = scans.map(_.metrics("numPartitions").value).max
    assert(readPartitions < 8,
      s"4 delta vectors x 2 probes must not read all 8 cells: $readPartitions")
    // salting dial: a forced g > 1 emits identical verdicts
    val salted = Similarity.semanticDedupScreenDelta(spark, index, delta,
      tau = 0.95, nprobeAssign = 2, saltBlocks = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(salted === rows, "the skew dial must be invisible in verdicts")
  }

  test("incremental screen: a base near-dup straddling a cell boundary is caught from the delta side at nprobeAssign=2") {
    // the proven straddling geometry from the batch boundary test:
    // three tight axis clusters, vA leans to cluster A (in the BASE),
    // its near-copy vB leans to cluster B (in the DELTA) — cosine
    // ~0.9965 >= tau but their primary cells differ
    val rnd = new scala.util.Random(41)
    val dim = 64
    def clusterVec(axis: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat * 0.3f)
      v(axis) += 5f
      v
    }
    val vA = Array.tabulate(dim)(j => if (j == 0) 1.0f else if (j == 1) 0.92f else 0f)
    val vB = Array.tabulate(dim)(j => if (j == 0) 0.92f else if (j == 1) 1.0f else 0f)
    val baseRows = (0 until 90).map(i => (i.toLong, clusterVec(i % 3))) :+ (90L -> vA)
    val srcDir = tmpDir("semdedup_incr_bnd_src")
    val idxDir = tmpDir("semdedup_incr_bnd_idx")
    baseRows.toDF("vec_id", "embedding")
      .write.parquet(s"$srcDir/embeddings.parquet")
    val index = Ivf.buildIndex(
      spark.read.parquet(s"$srcDir/embeddings.parquet"), idxDir,
      kCells = 3, iters = 3)
    val delta = Seq((1000L, vB)).toDF("vec_id", "embedding").localCheckpoint()
    val at1 = Similarity.semanticDedupScreenDelta(spark, index, delta,
      tau = 0.95, nprobeAssign = 1).collect().head
    val at2 = Similarity.semanticDedupScreenDelta(spark, index, delta,
      tau = 0.95, nprobeAssign = 2).collect().head
    // the pair is only meaningful if the two sides landed in different
    // primary cells — assert the fixture bites, then the dial
    val baseCid = Ivf.indexData(spark, idxDir)
      .filter(col("vec_id") === 90L).select("cid").head().getInt(0)
    assert(at1.getInt(1) !== baseCid,
      "fixture: the copy's primary cell must differ from the base member's")
    assert(at1.getString(2) === "new",
      s"single-probe must miss the cross-boundary base dup: $at1")
    assert(at2.getString(2) === "dup_of_base" && at2.getLong(3) === 90L,
      s"2-probe must catch the cross-boundary base dup: $at2")
  }
}
