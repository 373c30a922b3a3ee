package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  test("exact: one group per distinct normalized text, ids partition the corpus") {
    val out = Dedup.exact(spark, sf).cache()
    val c = graft.catalog.Catalog(spark, sf)
    val distinctTexts = c.ref("documents")
      .select(concat_ws(" ", split(trim(lower(col("text"))), "\\s+")))
      .distinct().count()
    assert(out.count() === distinctTexts)
    assert(out.agg(sum("n_dups")).head().getLong(0) === c.ref("documents").count())
    out.unpersist()
  }

  test("ngramJaccard: pairs are ordered, thresholded, and symmetric-free") {
    val out = Dedup.ngramJaccard(spark, sf).cache()
    assert(out.filter(col("id1") >= col("id2")).count() === 0)
    assert(out.filter(col("jaccard") < 0.5).count() === 0)
    assert(out.count() > 0, "testdata plants near-duplicates; none found")
    out.unpersist()
  }

  test("ngram exact: collapsed and direct branches of the adaptive gate emit identical pairs") {
    val shingled = Dedup.docShingleHashesOn(
      graft.catalog.Catalog(spark, sf).ref("documents"))
    def rows(gate: Double) =
      Dedup.ngramPairsExactCount(shingled, 0.5, collapseGate = gate)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          math.round(r.getDouble(3) * 1e9))).toSet
    val direct = rows(0.0)    // distinct >= 0 * total always: never collapse
    val collapsed = rows(1.1) // distinct >= 1.1 * total never: always collapse
    assert(direct.nonEmpty)
    assert(direct === collapsed)
  }

  test("minhashLsh finds the exact-Jaccard pairs (high recall, estimates close)") {
    val exact = Dedup.ngramJaccardAt(spark, sf, 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.minhashLsh(spark, sf)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.8, s"minhash recall $recall over ${exact.size} true pairs")
  }

  test("duplicateClusters: every near-dup pair lands in one cluster, rep = min id") {
    val pairs = Dedup.ngramJaccard(spark, sf)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.duplicateClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.foreach { case (id, rep) => assert(rep <= id) }
    // exactly one keeper per cluster
    val keepers = Dedup.duplicateClusters(spark, sf)
      .filter(col("keep")).select("cluster_rep").collect().map(_.getLong(0))
    assert(keepers.toSet.size === keepers.length)
    assert(keepers.toSet === clusters.values.toSet)
  }

  test("auto-capped shingle join reproduces the exact result at test scale") {
    val exact = Dedup.ngramJaccardAt(spark, sf, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Dedup.ngramJaccardAutoCapped(spark, sf, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto === exact)
  }

  test("df-capped shingle join reproduces the exact result at a sane cap") {
    val exact = Dedup.ngramJaccardAt(spark, sf, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val capped = Dedup.ngramJaccardCappedAt(spark, sf, 0.5, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped === exact)
    // an aggressive cap only ever drops pairs, never invents them
    val tiny = Dedup.ngramJaccardCappedAt(spark, sf, 0.5, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiny.subsetOf(exact.map(t => (t._1, t._2))))
  }

  test("byte-budget cap: generous budget reproduces exact; starved budget bends to the floor, still a subset with exact scores") {
    val exact = Dedup.ngramJaccardAt(spark, sf, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // a generous budget derives a cap above the corpus's max df — exact
    val wide = Dedup.ngramJaccardByteBudgeted(spark, sf, 0.5,
      shuffleBudgetBytes = 1L << 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(wide === exact)
    val (_, capWide, estWide, _) = Dedup.lastByteCap.get
    assert(estWide >= 0L)
    // a starved budget bends the cap to its floor (64) — never below —
    // and the survivors keep EXACT verified scores (tuple-level subset)
    val starved = Dedup.ngramJaccardByteBudgeted(spark, sf, 0.5,
      shuffleBudgetBytes = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (_, capStarved, _, _) = Dedup.lastByteCap.get
    assert(capStarved === 64, s"starved budget must land on the floor, got $capStarved")
    assert(capWide >= capStarved)
    assert(starved.subsetOf(exact), "byte-capping must drop, never invent or corrupt")
    // containment variant: same contract over the excerpt corpus
    val cExact = Dedup.containmentAt(spark, sf, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cWide = Dedup.containmentByteBudgeted(spark, sf, 0.9,
      shuffleBudgetBytes = 1L << 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cWide === cExact)
    val cStarved = Dedup.containmentByteBudgeted(spark, sf, 0.9,
      shuffleBudgetBytes = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cStarved.subsetOf(cExact))
  }

  test("cross-family output budget: many mid-size near-dup families of exact copies fail loudly pre-expansion") {
    import spark.implicits._
    // 60 families x 12 exact copies; consecutive families are near-dups
    // of each other (one token changed), so rep pairs qualify and the
    // cross expansion would emit ~families x 12 x 12 rows. Rep-level
    // candidates and within-family output both pass a 5k budget; only
    // the cross-volume check can catch it.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // 12 families x 12 exact copies, each family distinguished by one
    // trailing token: families share 8 of 9 shingles pairwise (J = 0.8,
    // all 66 rep pairs qualify). Budget 5000: rep-level candidates
    // (8*C(12,2) = 528) and within-family output (12*C(12,2) = 792)
    // both pass; the cross volume (66 * 12 * 12 = 9504) must not.
    val docs = (0 until 12).flatMap { f =>
      (0 until 12).map(c => (f * 100L + c, s"$base u$f"))
    }.toDF("doc_id", "text")
    val shingled = Dedup.docShingleHashesOn(docs)
    val err = intercept[IllegalStateException] {
      Dedup.ngramPairsExactCount(shingled, 0.5, collapse = Some(true),
        budget = Some(Dedup.PairBudget(maxPairs = Some(5000L)))).count()
    }
    assert(err.getMessage.contains("budget exceeded"))
    val (op, est, _) = Dedup.lastBudgetCheck.get
    assert(op.contains("cross-family"), s"the CROSS check must fire, got $op")
    assert(est === 66L * 144L, s"estimate must be the family product sum, got $est")
    // and with the budget sized for the output, the same corpus emits
    // every cross pair — the guard gates, it does not truncate
    val n = Dedup.ngramPairsExactCount(shingled, 0.5, collapse = Some(true),
      budget = Some(Dedup.PairBudget(maxPairs = Some(20000L)))).count()
    assert(n === (66L * 144L) + 12L * 66L)
  }

  test("duplicateClusters: driver union-find and distributed propagation agree") {
    val viaDriver = Dedup.duplicateClustersAt(spark, sf, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // threshold 8 < |edges| forces the distributed min-label path on the
    // same fixture the default (driver union-find) path resolves locally
    val viaDistributed = Dedup.duplicateClustersAt(spark, sf, 0.5, driverThreshold = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDriver === viaDistributed)
    assert(viaDriver.nonEmpty)
  }

  test("cluster propagation: hot-label star graph triggers salting, result unchanged") {
    import spark.implicits._
    // a mega-family hub: node 0 near-dup to 4000 others, plus a few
    // disjoint pairs — sym degree on id1 is extreme power-law, so
    // detectSkew must engage the salted propagation join; components
    // must come out identical to the driver union-find
    val star = (1L to 4000L).map(i => (0L, i)) ++
      Seq((5001L, 5002L), (6001L, 6002L), (6002L, 6003L))
    val edges = star.toDF("id1", "id2")
    // parallelism-relative detection: pin a production-like partition
    // count (see SourcesSpec's detectSkew test)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      val sym = edges.unionByName(edges.select(col("id2").as("id1"), col("id1").as("id2")))
      assert(graft.sources.Skew.detectSkew(sym, "id1"),
        "the star hub must register as a hot label")
      val dist = Dedup.clustersDistributed(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val driver = Dedup.clustersOf(spark, edges, driverThreshold = 1L << 20)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(dist === driver)
      assert(dist.count(_._2 == 0L) === 4001, "the star is one component labeled by the hub")
      assert(dist((6003L, 6001L)), "chained pair components keep min-label semantics")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("MinHashMerge sketch equals the signature of the unioned shingle set") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{ArrayExprs, MinHashMerge}
    val c = graft.catalog.Catalog(spark, sf)
    val k = 32
    // the aggregate under test: one merged sketch for src0
    val sketch = c.ref("documents").filter(col("source") === "src0")
      .select(split(trim(lower(col("text"))), "\\s+").as("toks"))
      .select(ArrayExprs.minHashSig(ArrayExprs.shingleHashes(col("toks"), 3), k).as("sig"))
      .agg(MinHashMerge.minHashMerge(col("sig"), k).as("sketch"))
      .head().getSeq[Long](0)
    // independent reference: union src0's window hashes, elementwise min
    // over the same XXH64 chain ShingleHashes/MinHashSig use
    val windowHashes = c.ref("documents").filter(col("source") === "src0")
      .select(col("text")).collect().map(_.getString(0)).flatMap { t =>
        val toks = t.trim.toLowerCase.split("\\s+")
        if (toks.length < 3) Seq.empty[Long]
        else {
          val th = toks.map(x => XXH64.hashUTF8String(UTF8String.fromString(x), 42L))
          th.sliding(3).map(_.foldLeft(42L)((acc, h) => XXH64.hashLong(h, acc))).toSeq
        }
      }.distinct
    val expected = (0 until k).map(i =>
      windowHashes.map(h => XXH64.hashLong(h, i.toLong)).min)
    assert(sketch.toSeq === expected)
  }

  test("simhash: hamming-0 groups contain >1 doc and cover planted dups") {
    val out = Dedup.simhash(spark, sf).cache()
    assert(out.filter(col("n_docs") < 2).count() === 0)
    assert(out.count() > 0)
    out.unpersist()
  }

  test("containment df cap: sane cap reproduces exact; aggressive cap only drops pairs") {
    val exact = Dedup.containmentAt(spark, sf, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.containmentCappedAt(spark, sf, 0.9, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === exact, "df cap 64 must be inert on the testdata corpus")
    val tiny = Dedup.containmentCappedAt(spark, sf, 0.9, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiny.subsetOf(exact), "capping must underestimate, never invent pairs")
  }

  test("incrementalDedup: base wins, one keeper per batch-only fingerprint, all verdicts appear") {
    val rows = Dedup.incrementalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty)
    val verdicts = rows.map(_._2).toSet
    assert(verdicts.subsetOf(Set("dup_of_base", "dup_in_delta", "new")))
    assert(verdicts === Set("dup_of_base", "dup_in_delta", "new"),
      s"the fixture must exercise all three verdicts, got $verdicts")
    // recompute the fingerprints independently to check the invariants
    val c = graft.catalog.Catalog(spark, sf)
    val docs = c.ref("documents").select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def text(id: Long): String = {
      val h = docs(id - id % 5)
      if (id % 7 == 0) "" else if (id % 13 == 5) "  \t "
      else if (id % 11 == 3) h.replace(" ", "\u00A0") else h
    }
    // mirror the ENGINE's normalization exactly: Spark trim strips only
    // spaces (not tabs) and Spark split keeps trailing empties (limit -1)
    // — Scala's String.trim/split would collapse whitespace-only and
    // empty docs into one fingerprint the engine keeps distinct
    def fp(id: Long): String = {
      val t = text(id).toLowerCase
        .dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      t.split("\\s+", -1).mkString(" ")
    }
    val deltaIds = docs.keys.filter(id => (id / 5) % 3 == 0).toSeq.sorted
    val baseFps = docs.keys.filterNot(id => (id / 5) % 3 == 0).map(fp).toSet
    val byId = rows.toMap
    deltaIds.groupBy(fp).foreach { case (f, ids) =>
      if (baseFps(f))
        ids.foreach(id => assert(byId(id) === "dup_of_base", s"doc $id: base must win"))
      else {
        assert(byId(ids.min) === "new", s"doc ${ids.min}: first in batch must keep")
        ids.filter(_ != ids.min).foreach(id =>
          assert(byId(id) === "dup_in_delta", s"doc $id must defer to ${ids.min}"))
      }
    }
  }

  test("sourcePriorityDedup: winner is argmin (priority, doc_id); priority overrides id order") {
    val rows = Dedup.sourcePriorityDedup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // independent recomputation of the winners
    val c = graft.catalog.Catalog(spark, sf)
    val srcOf = c.ref("documents").select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val docs = c.ref("documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def text(id: Long): String = {
      val h = docs(id - id % 5)
      if (id % 7 == 0) "" else if (id % 13 == 5) "  \t "
      else if (id % 11 == 3) h.replace(" ", " ") else h
    }
    def fp(id: Long): String = {
      val t = text(id).toLowerCase.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      t.split("\\s+", -1).mkString(" ")
    }
    def pri(id: Long): Int = srcOf(id).drop(3).toInt % 3
    val expected = docs.keys.groupBy(fp).map { case (_, ids) =>
      val w = ids.minBy(id => (pri(id), id))
      (w, ids.size.toLong)
    }.toMap
    assert(rows.length === expected.size)
    rows.foreach { case (_, wid, wsrc, n) =>
      assert(expected.contains(wid), s"unexpected winner $wid")
      assert(expected(wid) === n)
      assert(wsrc === srcOf(wid))
    }
    // the operator must differ from blind min-id on this fixture,
    // otherwise priority is vacuous
    val minIdWinners = docs.keys.groupBy(fp).map(_._2.min).toSet
    assert(rows.exists(r => !minIdWinners.contains(r._2)),
      "fixture must contain a group where priority overrides min doc_id")
  }

  test("leakFreeSplit: every near-dup pair lands in ONE split; all docs assigned") {
    val split = Dedup.leakFreeSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val n = graft.catalog.Catalog(spark, sf).ref("documents").count()
    assert(split.size === n, "every document must receive a split")
    assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
    // the property the operator exists for: a J >= 0.5 near-dup pair can
    // never straddle a split boundary
    val pairs = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture needs near-dup pairs for the property to bite")
    pairs.foreach { case (a, b) =>
      assert(split(a) === split(b), s"near-dups $a/$b split across ${split(a)}/${split(b)}")
    }
  }

  test("containment: planted excerpts pair with their parent; Jaccard misses most of them") {
    val pairs = Dedup.containmentAt(spark, sf, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (_, _, c) => assert(c >= 0.9 && c <= 1.0 + 1e-12) }
    // every planted excerpt (doc_id+1000000000, from docs long enough to
    // shingle) must surface with its own parent as a pair partner
    val excerptPairs = pairs.filter(_._2 >= 1000000000L)
    assert(excerptPairs.nonEmpty, "planted excerpts must produce containment pairs")
    val parentHits = excerptPairs.count { case (id1, id2, _) => id2 - 1000000000L == id1 }
    assert(parentHits > 0, "excerpts must pair with their parents")
    // the point of the operator: most planted-excerpt pairs are invisible
    // to symmetric Jaccard at tau = 0.5 (a 30% excerpt has J ~ 0.3)
    val jaccardPairs = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missedByJaccard = excerptPairs.count { case (a, b, _) => !jaccardPairs((a, b)) }
    assert(missedByJaccard > excerptPairs.length / 2,
      s"containment must catch what Jaccard misses: $missedByJaccard of ${excerptPairs.length}")
  }

  test("pair budget: explosion fails loudly on all three guarded paths; default budget is inert") {
    // a 1-pair absolute budget forces the guard to fire on any corpus
    val tiny = Dedup.PairBudget(maxPairs = Some(1L))
    def msgOf(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString("; ")
    Seq[(String, () => Unit)](
      "minhashLsh" -> (() =>
        Dedup.minhashLshAt(spark, sf, 64, 16, 0.5, budget = Some(tiny)).count()),
      "ngramJaccard(capped)" -> (() =>
        Dedup.ngramJaccardCappedAt(spark, sf, 0.5, 64, budget = Some(tiny)).count()),
      "containment" -> (() =>
        Dedup.containmentCappedAt(spark, sf, 0.9, Int.MaxValue, Some(tiny)).count())
    ).foreach { case (op, run) =>
      val ex = intercept[Throwable](run())
      val msg = msgOf(ex)
      assert(msg.contains("candidate-pair budget exceeded"),
        s"$op must fail loudly, got: $msg")
      assert(msg.contains("ngramJaccardCappedAt"),
        s"$op error must point at the capped remedy")
      // telemetry recorded the estimate and the enforced limit
      val (tOp, est, lim) = Dedup.lastBudgetCheck.get
      assert(est > lim, s"$tOp telemetry: est=$est lim=$lim")
    }
    // the DEFAULT corpus-relative budget does not bite on the shared
    // corpus: the guarded registered paths emit the same pairs as an
    // unguarded run
    val guarded = Dedup.ngramJaccard(spark, sf).collect().map(_.toString).toSeq
    val open = Dedup.ngramJaccardCappedAt(spark, sf, 0.5, Int.MaxValue, budget = None)
      .collect().map(_.toString).toSeq
    assert(guarded === open)
    val (opN, estN, limN) = Dedup.lastBudgetCheck.get
    assert(estN <= limN, s"default budget must be inert at test scale: $opN $estN/$limN")
  }
}
