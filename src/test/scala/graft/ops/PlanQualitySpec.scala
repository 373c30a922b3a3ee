package graft.ops

import graft.SparkTestBase

/** Machine-checked plan-shape assertions for the headline operators —
  * the properties that decide whether a plan survives a 100× scale-up:
  * filters reaching the parquet scan, column pruning, broadcast joins on
  * dims, top-k without a global sort, map-side partial aggregation, and
  * no accidental single-partition funnels.
  */
class PlanQualitySpec extends SparkTestBase {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the physical plan
    df.queryExecution.executedPlan.toString
  }

  test("p4_filter: predicates are pushed to the parquet scan, columns pruned") {
    val plan = executed(Relational.p4Filter(spark, sf))
    assert(plan.contains("PushedFilters: ["), s"no pushdown:\n$plan")
    assert(plan.contains("IsNotNull(o_orderstatus)") || plan.contains("EqualTo(o_orderstatus"),
      s"status filter not pushed:\n$plan")
    // pruned read schema: only the 4 referenced columns, not all 9
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_orderdate"),
      s"scan reads unreferenced columns:\n$readSchema")
  }

  test("o3_topk: limit+sort plans as TakeOrderedAndProject (no global sort)") {
    val plan = executed(Relational.o3TopK(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k fell back to a full sort:\n$plan")
  }

  test("g6_rollup: dimension joins broadcast (no shuffle of the fact side)") {
    val plan = executed(Relational.g6Rollup(spark, sf))
    // AQE's toString repeats the plan (initial + final), so count >= 2
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"nation/region must both broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact side must not shuffle for dims:\n$plan")
  }

  test("dedup exact: aggregation is partial+final (map-side combine)") {
    val plan = executed(Dedup.exact(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final HashAggregate pair:\n$plan")
  }

  test("w1w2 global row numbering never funnels to one partition") {
    val plan = executed(Relational.queries("w1w2_row_number_batch")(spark, sf))
    assert(!plan.contains("Exchange SinglePartition"),
      s"global row_number must stay distributed:\n$plan")
  }

  test("j4_asof: one key shuffle per side, no range-join explosion") {
    val plan = executed(AsOf.asofLastSignup(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a quadratic join:\n$plan")
  }

  test("sim_bruteforce: the query side broadcasts; the corpus never shuffles for scoring") {
    val plan = executed(Similarity.queries("sim_bruteforce_topk")(spark, sf))
    assert(plan.contains("BroadcastExchange"), s"queries must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"scoring must be a broadcast product, not a cartesian shuffle:\n$plan")
  }

  test("p1_projection: scan reads only the projected columns") {
    val plan = executed(Relational.queries("p1_projection")(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("c_comment") && !readSchema.contains("c_address"),
      s"projection must prune the scan:\n$readSchema")
  }

  test("m5_cdc_apply: no single-partition funnel in the merge") {
    val plan = executed(Relational.queries("m5_cdc_apply")(spark, sf))
    assert(!plan.contains("Exchange SinglePartition"),
      s"CDC merge must stay distributed:\n$plan")
  }

  test("ngram jaccard (uncapped): one shingle pass off the checkpoint, distinct-set collapse") {
    // AQE prints Final and Initial plans; count only the executed one.
    val plan = executed(Dedup.ngramJaccard(spark, sf)).split("== Initial Plan ==")(0)
    // Exact shape (both sides of the adaptive collapse gate satisfy
    // these): shingle hashing happened when the keyed checkpoint
    // materialized, so the executed plan reads `Scan ExistingRDD` and
    // never re-derives shingles; intersection counts come from the
    // pair-count aggregate; any joins present are the
    // output-proportional expansion equi-joins — verification joins
    // are gone on either branch.
    assert(plan.contains("Scan ExistingRDD"),
      s"pair work must read the checkpointed set relation:\n$plan")
    assert(!plan.toLowerCase.contains("shinglehashes"),
      s"shingle hashing re-evaluated in the executed plan:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"pair aggregation must stay distributed:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"no quadratic join shapes:\n$plan")
  }

  test("ngram jaccard (capped): prefix-gated candidates verify against checkpointed sets") {
    // The 100 TB dial keeps the PPJoin shape: with a df cap, dropped
    // buckets would corrupt bucket counts, so survivors verify exactly
    // against the CHECKPOINTED sorted-sets relation (shingle hashing
    // ran once, when the checkpoint materialized).
    val plan = executed(Dedup.ngramJaccardCappedAt(spark, sf, 0.5, 64))
      .split("== Initial Plan ==")(0)
    assert(plan.contains("Scan ExistingRDD"),
      s"verify must join the checkpointed sets, not re-derive shingles:\n$plan")
    assert(!plan.contains("shinglehashes"),
      s"shingle hashing re-evaluated in the verify plan:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"pair aggregation must stay distributed:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"verify joins must stay equi-joins:\n$plan")
  }

  test("source similarity: the signature expression is evaluated once per row") {
    // a sig.isNotNull filter AFTER the projection gets pushed through it
    // and doubles the md5+permutation pass; the plan must carry exactly
    // one minhashsigmd5 call (the guard is size(toks) >= 3 pre-projection)
    val plan = executed(Dedup.sourceSimilarity(spark, sf)).split("== Initial Plan ==")(0)
    val calls = "minhashsigmd5".r.findAllIn(plan.toLowerCase).size
    assert(calls == 1, s"signature evaluated $calls times in the plan:\n$plan")
  }

  test("e1 funnel: chained min-aggs stay key-partitioned, no quadratic join") {
    val plan = executed(Relational.queries("e1_funnel")(spark, sf)).split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel stages must be equi-joins:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"funnel must stay distributed:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      s"each funnel stage should aggregate partial+final:\n$plan")
  }

  test("minhash lsh: signature scan shuffles narrow band rows, never re-shingles") {
    val plan = executed(Dedup.minhashLsh(spark, sf))
    // The 512-byte signatures come from the checkpointed scan; the
    // candidate join must not contain a cartesian/nested-loop fallback.
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"band collision join must be an equi-join:\n$plan")
  }

  test("j6 range join: banding turns the interval predicate into an equi-join") {
    val plan = executed(RangeJoin.j6RangeJoin(spark, sf)).split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not plan a quadratic join:\n$plan")
    assert(plan.contains("__band"), s"equi-key must be the band id:\n$plan")
  }

  test("paragraph dedup: hash-only shuffles — chunk text never crosses the wire as a key") {
    val plan = executed(Dedup.paragraphDedup(spark, sf)).split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange SinglePartition"),
      s"dedup must stay distributed:\n$plan")
    // No shuffle may be KEYED by the chunk/text string: every
    // hashpartitioning/rangepartitioning expression must reference only
    // doc_id / digest / chunk_idx, never chunk or text.
    val partitionings = "(?:hash|range)partitioning\\([^)]*\\)".r.findAllIn(plan).toList
    assert(partitionings.nonEmpty, s"expected shuffles in the plan:\n$plan")
    partitionings.foreach { p =>
      assert(!p.contains("chunk#") && !p.contains("text#"),
        s"a shuffle is keyed by the raw text: $p\n$plan")
    }
    // The keep-decision window shuffles digests only; text rides through
    // at most one exchange (the doc_id-keyed join-back, which bucketed
    // storage eliminates at scale).
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    val textCarrying = exchanges.count(_.contains("text#"))
    assert(textCarrying <= 1,
      s"text must cross the wire at most once (saw $textCarrying):\n$plan")
  }

  test("text rarity: vocabulary and totals broadcast; tokens never shuffle for the join") {
    val plan = executed(TextAnalysis.rarityScore(spark, sf)).split("== Initial Plan ==")(0)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1,
      s"vocab join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the token stream must not shuffle to meet the vocabulary:\n$plan")
  }

  test("mixture sample: rates broadcast into the scan; data rows never hash-shuffle") {
    val plan = executed(TextAnalysis.mixtureSample(spark, sf)).split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"group rates must broadcast-join into the corpus scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must never shuffle to meet a |groups|-row rate table:\n$plan")
    // the only hash exchanges allowed are the metadata-sized rate
    // aggregation (|groups| rows); the kept data path is scan + filter
    val dataExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .filterNot(_.contains("lang")).toList
    assert(dataExchanges.isEmpty,
      s"data rows must not hash-shuffle:\n${dataExchanges.mkString("\n")}")
  }

  test("bigram lm: model prunes before the join; per-doc rollup partial-aggregates") {
    val plan = executed(TextAnalysis.bigramLm(spark, sf)).split("== Initial Plan ==")(0)
    // the count>=2 prune must run INSIDE the model aggregation subtree
    // (on aggregated counts), never as a post-join filter on doc rows
    assert(plan.contains("partial_count"),
      s"model counts must map-side combine:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"no single-partition funnel in LM scoring:\n$plan")
  }

  test("o7 profile: no Expand; one base scan plus one pruned scan per distinct") {
    val plan = executed(Relational.o7Profile(spark, sf)).split("== Initial Plan ==")(0)
    // A combined multi-DISTINCT aggregate would plan an Expand (x|cols|
    // row multiplication); the profiler must not.
    assert(!plan.contains("Expand"), s"profile must not multiply the scan:\n$plan")
    // a global aggregate necessarily ends in a SinglePartition exchange —
    // the invariant is that only PARTIAL aggregate rows cross it (map-side
    // combine ran per-partition first), never raw scan rows
    assert(plan.contains("partial_count"),
      s"profile must partial-aggregate before the global exchange:\n$plan")
    // base scan + one pruned scan per distinct, at most; scan reuse or a
    // future Spark optimization may merge some, which is fine (<=, not ==)
    assert("Scan parquet".r.findAllIn(plan).size <= 6,
      s"expected at most base scan + 5 distinct scans:\n$plan")
  }

  test("o7 profile approx (HLL): ONE scan, zero extra aggregates, error < 5%") {
    val df = Relational.o7ProfileAt(spark, sf, approx = true)
    val plan = executed(df).split("== Initial Plan ==")(0)
    // the HLL sketches fold into the single first-pass aggregate: one
    // parquet scan total, no per-column distinct plans, no cross joins
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      s"approx profile must be one scan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"approx profile must not cross-join 1-row distinct plans:\n$plan")
    assert(plan.contains("partial_approx_count_distinct"),
      s"HLL must partial-aggregate map-side:\n$plan")
    // accuracy: within 5% of the exact distincts on every column
    val exact = Relational.o7Profile(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    df.collect().foreach { r =>
      val (cn, approx) = (r.getString(0), r.getLong(3))
      val e = exact(cn)
      assert(math.abs(approx - e).toDouble / e < 0.05,
        s"$cn: approx $approx vs exact $e")
    }
  }

  test("pagerank: per-iteration lineage is CUT — the final plan reads checkpointed ranks, not 5 nested joins") {
    val df = Graph.graphPagerank(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // without the localCheckpoint per iteration the plan would contain
    // the full 5-iteration join pyramid (and double per round); with it,
    // the final iteration's plan joins ONE checkpointed RDD scan
    assert(plan.contains("Scan ExistingRDD"),
      s"ranks must come from the checkpointed RDD:\n$plan")
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r.findAllIn(plan).size <= 4,
      s"iteration pyramid leaked into one plan:\n$plan")
  }

  test("j8 salted skew join: replicated dim broadcasts; no shuffle of the fact side for the join") {
    val plan = executed(Relational.j8SaltedSkewJoin(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the 2-row x 16-salt dim must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"salting must stay an equi-join:\n$plan")
  }

  test("c4 rules / pii scrub / normalize: pure scan work — no joins, no hash shuffle (only the output sort)") {
    Seq(Cleaning.c4Rules(spark, sf), Cleaning.piiScrub(spark, sf),
        Cleaning.normalizeText(spark, sf)).foreach { df =>
      val plan = executed(df)
      assert(!plan.contains("Join"), s"cleaning must not join:\n$plan")
      assert(!plan.contains("hashpartitioning"),
        s"cleaning must not hash-shuffle data rows:\n$plan")
    }
  }

  test("nb quality scoring: model rides as a literal — no join, no hash shuffle in the scoring plan") {
    val plan = executed(Dsir.nbQuality(spark, sf))
    assert(!plan.contains("Join"),
      s"scoring must fold the broadcast model scan-locally, not join it:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"scoring must not hash-shuffle data rows:\n$plan")
  }

  test("dsir resample: top-quartile selection is a distributed TakeOrdered, not a global sort") {
    val df = Dsir.dsirResample(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection must plan as TakeOrdered:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"selection must not hash-shuffle data rows:\n$plan")
  }

  test("cms heavy: counter lookup broadcasts; aggregates stay distributed") {
    val plan = executed(Sketches.cmsHeavy(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"estimate pass must broadcast the counter table:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian in the sketch plan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"exact top-N must be a distributed TakeOrdered:\n$plan")
  }

  test("hll distinct: register build is a combine-side aggregate, no corpus join") {
    val plan = executed(Sketches.hllDistinct(spark, sf))
    // the only join is the 20-source exact×estimate zip — never SMJ over
    // corpus-sized relations
    assert(!plan.contains("SortMergeJoin"),
      s"HLL must not sort-merge anything:\n$plan")
    assert(plan.contains("partial_max"),
      s"register max must partial-aggregate map-side:\n$plan")
  }

  test("bloom screen: membership join broadcasts the bit set, never the corpus") {
    val plan = executed(Sketches.bloomContamination(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"bit-set membership must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian in the screen plan:\n$plan")
  }

  test("weighted sample: scan-side keys into a TakeOrdered, no shuffle, no join") {
    val plan = executed(TextAnalysis.weightedSample(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"bottom-k must be a distributed TakeOrdered:\n$plan")
    assert(!plan.contains("Join"), s"the draw must not join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the draw must stay scan work:\n$plan")
  }

  test("grouped weighted sample: per-group k is a WindowGroupLimit, pre-shuffle") {
    val plan = executed(TextAnalysis.weightedSampleGrouped(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"the rank filter must push a per-group limit below the exchange:\n$plan")
    assert(!plan.contains("Join"), s"the grouped draw must not join:\n$plan")
  }

  test("unigram EM apply: trained model rides the plan — no join, one rollup exchange") {
    val plan = executed(Subword.unigramEm(spark, sf))
    assert(!plan.contains("Join"), s"the EM apply must not join:\n$plan")
    // AQE's toString repeats the plan under "== Initial Plan =="; count
    // exchanges in the final section only
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"apply side must shuffle only the rollup:\n$plan")
  }

  test("semantic dedup multi-probe: pair step keys on probe cells, no cartesian") {
    val plan = executed(Similarity.semanticDedupProbe2(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"multi-probe pairs must stay cell-keyed:\n$plan")
    assert(plan.contains("Generate explode"),
      s"probe fan-out must be a scan-side explode:\n$plan")
  }

  test("residual IVF-PQ: probe rows broadcast onto the code relation; corpus scanned once") {
    val df = Pq.ivfPqResidual(spark, sf)
    val plan = executed(df)
    // the (query, probed cell, LUT) side must broadcast — candidate
    // generation is a broadcast hash join on cid, never a shuffle of
    // the encoded corpus
    assert(plan.contains("BroadcastHashJoin"),
      s"probe side must broadcast on cid:\n$plan")
    // the embeddings table is read exactly once by the scan that
    // assigns cell + residual + codes (the quantizer sample collect and
    // the query collect are separate bounded actions, not part of THIS
    // plan); count in the AQE final section only — the toString repeats
    // the plan under "== Initial Plan =="
    val scans = plan.split("== Initial Plan ==").head.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("embeddings"))
    assert(scans === 1, s"residual encode must be one corpus scan, saw $scans:\n$plan")
  }

  test("persisted-PQ screen: delta broadcasts; only the rank exchange shuffles the scored rows") {
    val df = Pq.pqIncremental(spark, sf)
    val plan = executed(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the bounded query side must broadcast:\n$plan")
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning"))
    assert(exchanges <= 2,
      s"ADC screening should shuffle only the rank + presentation sort:\n$plan")
  }
}
