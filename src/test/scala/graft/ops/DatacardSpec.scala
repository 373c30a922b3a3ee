package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DatacardSpec extends SparkTestBase {

  test("card invariants: ppm ratios bounded, totals consistent with the raw table") {
    val rows = Datacard.datacard(spark, sf).collect()
    val raw = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_.getLong(1)).sum === raw.count())
    rows.foreach { r =>
      val (nDocs, dupPpm, enPpm, lenPpm) =
        (r.getLong(1), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(nDocs > 0)
      Seq(dupPpm, enPpm, lenPpm).foreach(p => assert(p >= 0 && p <= 1000000))
      assert(r.getLong(2) > 0) // tokens
      assert(r.getDouble(3) > 0 && r.getDouble(4) > 0) // medians
    }
    // spot-check one source against direct computation
    val src = rows.head.getString(0)
    val direct = raw.filter(col("source") === src)
      .agg(count(lit(1)), count_distinct(md5(col("text")))).head
    val expectDup = (direct.getLong(0) - direct.getLong(1)) * 1000000L / direct.getLong(0)
    assert(rows.head.getLong(5) === expectDup)
  }

  test("one corpus scan, distinct planned without Expand") {
    val plan = Datacard.datacard(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"distinct must not Expand the scan:\n$plan")
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"the card must cost one corpus scan:\n$plan")
  }

  test("incremental state: any update split renders the same card as one full init") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def render(splits: Seq[org.apache.spark.sql.DataFrame]): Seq[String] = {
      val stateDir = tmpDir("dc_state")
      Datacard.datacardInit(spark, splits.head, stateDir)
      splits.tail.foreach(d => Datacard.datacardUpdate(spark, d, stateDir))
      Datacard.datacardRender(spark, stateDir).collect().map(_.toString).toSeq
    }
    val full = render(Seq(docs))
    // one delta, and a three-way split with different boundaries — the
    // canonical-set state makes every merge shape collapse to the same card
    val two = render(Seq(docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0)))
    val three = render(Seq(docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2)))
    assert(two === full, "init+update must equal one full init")
    assert(three === full, "three-way incremental build must equal one full init")
  }

  test("incremental update is O(delta): update scans only delta + state; render only state") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val deltaPath = tmpDir("dc_delta")
    docs.filter(col("doc_id") % 10 === 0).write.parquet(s"$deltaPath/documents.parquet")
    val stateDir = tmpDir("dc_state_o1")
    Datacard.datacardInit(spark, docs.filter(col("doc_id") % 10 =!= 0), stateDir)
    // state is bounded: <= cap kll rows per (source, metric); 256
    // registers per source
    val st0 = spark.read.parquet(s"$stateDir/v0/state")
    val v0 = st0.filter(col("rel") === "kllrows")
      .groupBy("source", "metric").count().collect()
    v0.foreach(r => assert(r.getLong(2) <= 1024, s"kll state over cap: $r"))
    val regs = st0.filter(col("rel") === "hll")
      .groupBy("source").count().collect()
    regs.foreach(r => assert(r.getLong(1) <= 256))
    // the update plan's file inputs: ONLY the delta file and state dir
    val delta = spark.read.parquet(s"$deltaPath/documents.parquet")
    Datacard.datacardUpdate(spark, delta, stateDir)
    // render reads state only — pin via the plan's input files
    val rendered = Datacard.datacardRender(spark, stateDir)
    val inputs = rendered.inputFiles
    assert(inputs.nonEmpty)
    inputs.foreach(f => assert(f.contains(stateDir.split("/").last),
      s"render must read state only, got $f"))
    // and the rendered card equals the registered query's shape
    assert(rendered.collect().length > 0)
  }

  test("many-fold churn: generations pruned to <= 2, state bounded, prior-version reader survives one update") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val stateDir = tmpDir("dc_churn")
    val folds = 12
    (0 until folds).foreach { i =>
      Datacard.datacardFold(spark, docs.filter(col("doc_id") % folds === i), stateDir)
    }
    // old-version pruning under churn: exactly the live generation and
    // ONE predecessor remain (the reader-grace generation), not 12 dirs
    val vdirs = new java.io.File(stateDir).listFiles
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName).sortBy(_.drop(1).toInt)
    assert(vdirs.toSeq === Seq(s"v${folds - 2}", s"v${folds - 1}"),
      s"churn must prune stale generations, got ${vdirs.mkString(",")}")
    // state stays bounded after 12 folds: the KLL sample is still under
    // its cap and the HLL register set is still <= 256 per source
    val stChurn = spark.read.parquet(s"$stateDir/v${folds - 1}/state")
    stChurn.filter(col("rel") === "kllrows")
      .groupBy("source", "metric").count().collect()
      .foreach(r => assert(r.getLong(2) <= 1024, s"kll state over cap after churn: $r"))
    stChurn.filter(col("rel") === "hll")
      .groupBy("source").count().collect()
      .foreach(r => assert(r.getLong(1) <= 256))
    // a lazy render taken against the current version survives ONE
    // subsequent fold (its files are the kept predecessor generation)
    val before = Datacard.datacardRender(spark, stateDir)
    Datacard.datacardFold(spark, docs.filter(col("doc_id") === 1L), stateDir)
    assert(before.collect().nonEmpty,
      "a pre-update render must still materialize after one fold")
    // and the churned card equals a one-shot full build (order-insensitive
    // monoid folds): doc_id===1 was folded twice, so compare against the
    // matching duplicate-aware corpus
    val full = docs.unionByName(docs.filter(col("doc_id") === 1L))
    val oneShotDir = tmpDir("dc_churn_full")
    Datacard.datacardInit(spark, full, oneShotDir)
    val a = Datacard.datacardRender(spark, stateDir).collect().map(_.toString).toSeq
    val b = Datacard.datacardRender(spark, oneShotDir).collect().map(_.toString).toSeq
    assert(a === b, "churned incremental card must equal the one-shot build")
  }

  test("state clone: branch-then-update equals init-then-update bit-exactly, no corpus scan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val sA = tmpDir("dc_clone_a")
    Datacard.datacardInit(spark, base, sA)
    // clone is a pure state copy — no Spark job, so no corpus scan by
    // construction; prove the branch is a real independent state
    val sB = tmpDir("dc_clone_b")
    Datacard.datacardClone(sA, sB)
    Datacard.datacardUpdate(spark, delta, sB)
    val sRef = tmpDir("dc_clone_ref")
    Datacard.datacardInit(spark, base, sRef)
    Datacard.datacardUpdate(spark, delta, sRef)
    val branched = Datacard.datacardRender(spark, sB).collect().map(_.toString).toSeq
    val rebuilt = Datacard.datacardRender(spark, sRef).collect().map(_.toString).toSeq
    assert(branched === rebuilt, "clone-then-update must equal init-then-update")
    // the source state is untouched by the branch's update
    val aCard = Datacard.datacardRender(spark, sA).collect().map(_.toString).toSeq
    val aRef = tmpDir("dc_clone_aref")
    Datacard.datacardInit(spark, base, aRef)
    assert(aCard === Datacard.datacardRender(spark, aRef).collect().map(_.toString).toSeq,
      "branch update must not leak into the source state")
    // cloning into a dir with history lands as the NEXT generation
    Datacard.datacardClone(sA, sB)
    val cur = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(sB, "_current"))).trim.toInt
    assert(cur === 2, s"clone into live state must advance the generation, got v$cur")
    assert(Datacard.datacardRender(spark, sB).collect().map(_.toString).toSeq === aCard,
      "re-clone must restore the source card")
  }

  test("release gate: a planted distribution shift fires exactly the drifted source's flags") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val srcs = docs.select("source").distinct().orderBy("source")
      .collect().map(_.getString(0))
    val shifted = srcs.head
    // the release: one source gains a wave of short, non-en, exact-dup
    // docs equal to its own size — en_ppm, len_pass, dup and volume all
    // move on that source; other sources receive nothing
    val wave = docs.filter(col("source") === shifted)
      .withColumn("doc_id", col("doc_id") + 10000000L)
      .withColumn("lang", lit("zz"))
      .withColumn("text", lit("tiny dup"))
    val sOld = tmpDir("dc_gate_old")
    val sNew = tmpDir("dc_gate_new")
    Datacard.datacardInit(spark, docs, sOld)
    Datacard.datacardClone(sOld, sNew)
    Datacard.datacardUpdate(spark, wave, sNew)
    val diff = Datacard.datacardDiff(spark, sOld, sNew).collect()
    assert(diff.map(_.getString(0)).toSeq === srcs.toSeq, "one diff row per source")
    val bySrc = diff.map(r => r.getString(0) -> r).toMap
    val hot = bySrc(shifted)
    def flag(r: org.apache.spark.sql.Row, name: String): Boolean =
      r.getBoolean(r.fieldIndex(name))
    assert(flag(hot, "flag_volume"), "doubled source must trip the volume flag")
    assert(flag(hot, "flag_en"), "en share halved must trip flag_en")
    assert(flag(hot, "flag_len_pass"), "short docs must trip flag_len_pass")
    assert(flag(hot, "flag_dup"), "exact-dup wave must trip flag_dup")
    assert(!flag(hot, "flag_source_change"))
    (srcs.tail).foreach { s =>
      val r = bySrc(s)
      Seq("flag_volume", "flag_en", "flag_len_pass", "flag_dup",
        "flag_p50_chars", "flag_p95_tokens", "flag_source_change")
        .foreach(f => assert(!flag(r, f), s"untouched source $s fired $f"))
      assert(r.getLong(r.fieldIndex("n_docs_delta")) === 0L)
    }
    // a dropped source surfaces as flag_source_change with null deltas
    val sDrop = tmpDir("dc_gate_drop")
    Datacard.datacardInit(spark, docs.filter(col("source") =!= shifted), sDrop)
    val dropDiff = Datacard.datacardDiff(spark, sOld, sDrop).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(flag(dropDiff(shifted), "flag_source_change"))
    assert(dropDiff(shifted).isNullAt(dropDiff(shifted).fieldIndex("n_docs_delta")))
  }
}
