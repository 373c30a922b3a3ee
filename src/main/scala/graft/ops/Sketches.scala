package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.ArrayExprs.md5Mod

/** Frequency sketches over the token stream — the approximate-counting
  * primitives a 100 TB pipeline uses where exact per-item aggregation is
  * the bottleneck (hot n-gram detection, boilerplate screens, stopword
  * discovery on unbounded vocabularies).
  *
  * Count-Min (Cormode & Muthukrishnan 2005), Spark-first: the d×w
  * counter table IS the sketch, built as one map-side-combinable
  * count aggregate over (row, bucket) keys — "merging sketches" is
  * exactly what the combine already does, so no custom aggregation
  * buffer is needed and the shuffle carries at most d·w rows per map
  * partition regardless of corpus size. Estimation for a query token
  * set is a broadcast join against the ≤ d·w-row counter relation: no
  * corpus rescan, which is the point — build once, query many.
  *
  * Hashes are the engine-portable md5 buckets
  * ([[graft.functions.ArrayExprs.md5Mod]], row-salted), so the DuckDB
  * twin rebuilds the identical counter table and estimates — the
  * `text_cms_heavy` row is a full hash-match, not a tolerance check.
  *
  * The sketched stream is the 3-gram SHINGLE stream (16k+ distinct at
  * sf0.01 vs 1024 buckets — real collisions, so the row demonstrates
  * genuine overestimates, not a trivially exact table): hot-shingle
  * estimates are exactly what sizes [[Dedup.ngramJaccardCappedAt]]'s df
  * cap at scale without paying an exact full-vocabulary aggregate.
  */
object Sketches {

  private val D = 4      // counter rows (independent hash functions)
  private val W = 1024L  // buckets per row

  def cmsHeavy(spark: SparkSession, dir: String): DataFrame =
    cmsHeavyAt(spark, dir, topN = 50)

  /** Top-`topN` shingles by EXACT count (deterministic (n desc, token)
    * tie-break, a distributed TakeOrdered) alongside their Count-Min
    * estimate — the demonstration row for estimate quality: the CMS
    * overestimate invariant (`n_est ≥ n_exact`, sketches never
    * undercount) is asserted in SketchesSpec on every shingle, not just
    * the heavy ones.
    */
  /** One row per 3-gram shingle occurrence, keeping `keep` columns.
    * explode_outer, NOT explode: for a plain explode Spark's
    * InferFiltersFromGenerate pushes a `size(e) > 0 AND isnotnull(e)`
    * filter below the Generate and re-evaluates the whole shingle
    * transform per row in the scan stage (the Dedup.scala lesson); the
    * outer variant infers nothing, and the cheap null filter on the
    * GENERATED column replaces it. Callers that consume the stream more
    * than once pin it with localCheckpoint so the tokenize+shingle pass
    * runs once, not once per consumer.
    */
  private def shingleStream(docs: DataFrame, keep: Seq[String]): DataFrame = {
    val kept = keep.map(col)
    docs.select(kept :+ TextAnalysis.tokens(lower(col("text"))).as("ts"): _*)
      .select(kept :+ explode_outer(when(size(col("ts")) >= 3,
        transform(sequence(lit(1), size(col("ts")) - 2),
          i => concat_ws(" ", element_at(col("ts"), i),
            element_at(col("ts"), i + 1), element_at(col("ts"), i + 2)))))
        .as("w"): _*)
      .filter(col("w").isNotNull)
  }

  def cmsHeavyAt(spark: SparkSession, dir: String, topN: Int): DataFrame = {
    val c = Catalog(spark, dir)
    // two consumers (counter build + exact counts) — pin the stream
    val occ = shingleStream(c.ref("documents"), Nil)
      .localCheckpoint(eager = false)
    val counters = cmsCounters(occ)
    val heavy = occ.groupBy("w").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("w"))
      .limit(topN)
    cmsEstimate(heavy, counters)
      .select(col("w").as("token"), col("n_exact"), col("n_est"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** The d×w counter relation from a token-occurrence relation `occ`
    * (one row per occurrence, column `w`). ≤ d·w groups — the count
    * aggregate map-side combines, so each map partition emits at most
    * d·w partial rows however large its slice of the corpus.
    */
  private[ops] def cmsCounters(occ: DataFrame): DataFrame =
    occ.select(col("w"), explode(sequence(lit(0), lit(D - 1))).as("j"))
      .select(col("j"),
        md5Mod(concat(lit("cms:"), col("j").cast("string"), lit(":"), col("w")), W)
          .as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("cnt"))

  /** Point estimates for the tokens of `q` (column `w`, other columns
    * carried through): est(w) = min over j of counter[j][h_j(w)]. The
    * counter relation broadcasts (≤ d·w rows); the query set never
    * touches the corpus. LEFT join + coalesce(0): a query token absent
    * from the sketched stream can probe empty buckets, and the true CMS
    * answer there is the zero counter — an inner join would silently
    * drop the token (all buckets empty) or over-estimate it (min over
    * only the collision-populated buckets).
    */
  private[ops] def cmsEstimate(q: DataFrame, counters: DataFrame): DataFrame = {
    val probes = q.select(q.columns.map(col).toIndexedSeq: _*)
      .withColumn("j", explode(sequence(lit(0), lit(D - 1))))
      .withColumn("b",
        md5Mod(concat(lit("cms:"), col("j").cast("string"), lit(":"), col("w")), W))
    probes.join(broadcast(counters), Seq("j", "b"), "left")
      .groupBy(q.columns.map(col).toIndexedSeq: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  val cmsHeavySql: String =
    s"""WITH tok AS (
       |  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
       |  FROM documents),
       |occ AS (
       |  SELECT unnest(list_transform(range(1, len(ts) - 1),
       |           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS w
       |  FROM tok WHERE len(ts) >= 3),
       |counters AS (
       |  SELECT j, md5_number_lower('cms:' || CAST(j AS VARCHAR) || ':' || w) % $W AS b,
       |         count(*) AS cnt
       |  FROM occ CROSS JOIN range($D) r(j)
       |  GROUP BY 1, 2),
       |heavy AS (
       |  SELECT w, count(*) AS n_exact FROM occ GROUP BY 1
       |  ORDER BY n_exact DESC, w LIMIT 50),
       |est AS (
       |  SELECT h.w, h.n_exact, min(c.cnt) AS n_est
       |  FROM heavy h CROSS JOIN range($D) r(j)
       |  JOIN counters c
       |    ON c.j = r.j
       |   AND c.b = md5_number_lower('cms:' || CAST(r.j AS VARCHAR) || ':' || h.w) % $W
       |  GROUP BY 1, 2)
       |SELECT w AS token, n_exact, n_est FROM est
       |ORDER BY n_exact DESC, token""".stripMargin

  // ---- HyperLogLog distinct counting -----------------------------------------
  // m = 256 registers: standard error 1.04/sqrt(256) ≈ 6.5%, and every
  // per-source cardinality in the testdata sits above the 5/2·m
  // small-range-correction threshold, so the RAW Flajolet estimate is
  // the honest regime and no `ln` ever runs — important because libm
  // rounding is not cross-engine-reproducible (see the PageRank /
  // centroid notes), while everything the raw estimate touches is:
  // the rank ladder is integer compares, 2^-rank is an exact double,
  // and a sum of exact powers of two spanning < 53 bits of exponent
  // never rounds, so it is order-free and bit-identical in any engine.
  private[ops] val HllM = 256

  /** The rank ladder 1..25 over the 24-bit suffix, emitted once for
    * Spark (nested `when`) and once for DuckDB (CASE ladder) from the
    * same thresholds so the two engines cannot drift.
    */
  private def hllRankSpark(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (24 to 1 by -1).foldLeft(lit(25): org.apache.spark.sql.Column) { (acc, r) =>
      when(w >= lit(1L << (24 - r)), lit(r)).otherwise(acc)
    }

  private[ops] def hllRankSqlCase: String =
    (1 to 24).map(r => s"WHEN w >= ${1L << (24 - r)} THEN $r")
      .mkString("CASE ", " ", " ELSE 25 END")

  /** Register table (source, j, m_j) from an occurrence relation with
    * columns (source, sh): the 32-bit portable hash splits into an
    * 8-bit register index and a 24-bit rank suffix, and the groupBy-max
    * is both the sketch BUILD and the sketch UNION — merging two
    * corpora's registers is the same max the map-side combine already
    * runs (SketchesSpec pins split-and-merge ≡ union).
    */
  private[ops] def hllRegisters(occ: DataFrame): DataFrame =
    occ.select(col("source"), md5Mod(col("sh"), 4294967296L).as("h32"))
      .select(col("source"),
        (col("h32").bitwiseAND(lit(255L))).as("j"),
        shiftright(col("h32"), 8).as("w"))
      .select(col("source"), col("j"), hllRankSpark(col("w")).as("rho"))
      .groupBy("source", "j").agg(max("rho").as("m_j"))

  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    // two consumers (registers + the exact comparison column) — pin
    val occ = shingleStream(c.ref("documents"), Seq("source"))
      .withColumnRenamed("w", "sh")
      .localCheckpoint(eager = false)
    val regs = hllRegisters(occ)
    val per = regs.groupBy("source").agg(
      sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), m_j) AS DOUBLE)"))
        .as("sp"),
      count(lit(1)).as("v"))
    val exact = occ.groupBy("source")
      .agg(countDistinct(col("sh")).as("n_exact"))
    val alphaM2 = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0)
    exact.join(per, Seq("source"))
      .select(col("source"), col("n_exact"),
        (alphaM2 / (col("sp") + (lit(HllM) - col("v")).cast("double")))
          .as("hll_est"))
      .orderBy("source")
  }

  val hllDistinctSql: String =
    s"""WITH tok AS (
       |  SELECT source, regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
       |  FROM documents),
       |occ AS (
       |  SELECT source, unnest(list_transform(range(1, len(ts) - 1),
       |           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
       |  FROM tok WHERE len(ts) >= 3),
       |h AS (
       |  SELECT source, md5_number_lower(sh) % 4294967296 AS h32 FROM occ),
       |b AS (
       |  SELECT source, h32 % 256 AS j, h32 // 256 AS w FROM h),
       |r AS (
       |  SELECT source, j, max($hllRankSqlCase) AS m_j FROM b GROUP BY 1, 2),
       |s AS (
       |  -- literals pinned to DOUBLE: DuckDB parses bare 1.0 as DECIMAL
       |  -- and decimal division is not IEEE double division
       |  SELECT source,
       |         sum(CAST(1.0 AS DOUBLE) / CAST(1 << m_j AS DOUBLE)) AS sp,
       |         count(*) AS v
       |  FROM r GROUP BY 1),
       |ex AS (
       |  SELECT source, count(DISTINCT sh) AS n_exact FROM occ GROUP BY 1)
       |SELECT ex.source, ex.n_exact,
       |       (CAST(0.7213 AS DOUBLE)
       |          / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE))
       |          * CAST(65536.0 AS DOUBLE))
       |         / (s.sp + CAST($HllM - s.v AS DOUBLE)) AS hll_est
       |FROM ex JOIN s USING (source)
       |ORDER BY ex.source""".stripMargin

  // ---- Bloom-filter contamination screen -------------------------------------
  // The scale story for benchmark-leak screening: the exact screen
  // ([[Dedup.contamination]]) shuffles a distinct train-shingle set into
  // a join — fine until the train side is the 100 TB corpus. The Bloom
  // filter compresses train membership into ≤ m set-bit positions
  // (built as one distinct over (pos) — merging filters IS that
  // distinct/bit-OR), small enough to BROADCAST, so the eval side is
  // screened scan-side with zero shuffle of train data. No false
  // negatives ever (a leaked shingle always probes 4 set bits), false
  // positives at a deterministic, hash-replayable rate — m = 2^17 and
  // k = 4 give ~2-3% FP at the testdata's ~16k distinct train shingles
  // (n·k/m ≈ 0.5), visible in the oracle row as n_bloom > n_exact.
  private val BloomM = 131072L // 2^17 bits
  private val BloomK = 4

  def bloomContamination(spark: SparkSession, dir: String): DataFrame =
    bloomContaminationAt(spark, dir, "src0")

  def bloomContaminationAt(spark: SparkSession, dir: String,
      evalSource: String): DataFrame = {
    val c = Catalog(spark, dir)
    // Three consumers (bit set, exact train set, eval probes) — but NOT
    // checkpointed: each branch's source predicate pushes below the
    // distinct to the parquet scan, so the train branches never touch
    // eval rows and vice versa. A checkpoint here was measured 3× SLOWER
    // at 8× (it materializes the corpus-wide distinct, shuffling every
    // shingle string once, and then all three branches pay the read),
    // where the "redundant" branches are filtered scans plus distincts
    // over disjoint slices.
    val ds = shingleStream(c.ref("documents"), Seq("doc_id", "source"))
      .withColumnRenamed("w", "sh")
      .distinct()
    def pos(j: org.apache.spark.sql.Column) = md5Mod(
      concat(lit("bloom:"), j.cast("string"), lit(":"), col("sh")), BloomM)
    // the filter: distinct set-bit positions of every train shingle —
    // ≤ m rows however large the train corpus, and build distributes as
    // the distinct's map-side combine
    val bits = ds.filter(col("source") =!= evalSource)
      .select(explode(sequence(lit(0), lit(BloomK - 1))).as("j"), col("sh"))
      .select(pos(col("j")).as("pos")).distinct()
    // exact membership for the comparison column (the thing the Bloom
    // screen replaces at scale)
    val trainSh = ds.filter(col("source") =!= evalSource)
      .select(col("sh")).distinct().withColumn("__hit", lit(1))
    val evalProbes = ds.filter(col("source") === evalSource)
      .select(col("doc_id"), col("sh"),
        explode(sequence(lit(0), lit(BloomK - 1))).as("j"))
      .select(col("doc_id"), col("sh"), pos(col("j")).as("pos"))
    val perShingle = evalProbes
      .join(broadcast(bits.withColumn("__set", lit(1))), Seq("pos"), "left")
      .groupBy(col("doc_id"), col("sh"))
      .agg((count(col("__set")) === BloomK).as("bloom_hit"))
    perShingle
      .join(trainSh, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom"),
        count(col("__hit")).as("n_exact"))
      .orderBy("doc_id")
  }

  val bloomContaminationSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source, regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
       |  FROM documents),
       |ds AS (
       |  SELECT DISTINCT doc_id, source, sh
       |  FROM (SELECT doc_id, source,
       |               unnest(list_transform(range(1, len(ts) - 1),
       |                 i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
       |        FROM tok WHERE len(ts) >= 3)),
       |bits AS (
       |  SELECT DISTINCT
       |         md5_number_lower('bloom:' || CAST(j AS VARCHAR) || ':' || sh) % $BloomM AS pos
       |  FROM ds CROSS JOIN range($BloomK) r(j)
       |  WHERE source <> 'src0'),
       |train AS (SELECT DISTINCT sh FROM ds WHERE source <> 'src0'),
       |probes AS (
       |  SELECT e.doc_id, e.sh,
       |         count(b.pos) = $BloomK AS bloom_hit
       |  FROM (SELECT doc_id, sh FROM ds WHERE source = 'src0') e
       |  CROSS JOIN range($BloomK) r(j)
       |  LEFT JOIN bits b
       |    ON b.pos = md5_number_lower('bloom:' || CAST(r.j AS VARCHAR) || ':' || e.sh) % $BloomM
       |  GROUP BY 1, 2)
       |SELECT p.doc_id,
       |       count(*) AS n_shingles,
       |       CAST(sum(CASE WHEN p.bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom,
       |       count(t.sh) AS n_exact
       |FROM probes p LEFT JOIN train t ON t.sh = p.sh
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- Mergeable quantile sketch ---------------------------------------------
  // The missing member of the family: per-group latency/size percentiles
  // where the exact per-group percentile (g12) is the bottleneck — exact
  // percentile materializes every group's full value multiset in one
  // aggregation buffer (unbounded memory, effectively a per-group sort),
  // while the sketch holds ≤ QsCap rows per group per map partition and
  // combines map-side like any algebraic aggregate. Design and the
  // KLL-vs-hash-derandomization trade-off:
  // [[graft.functions.QuantileSketch]].
  private[ops] val QsCap = 1024
  private[ops] val QsMod = 1L << 62 // keep md5's low 62 bits: tz unaffected

  /** Trailing zeros of the row's portable id-hash — the per-row "coin"
    * that decides how many compaction levels the row survives. Shared
    * between the Spark aggregate and the closed-form twin: DuckDB
    * computes `least(bit_count((h - 1) & ~h), 62)` over the identical
    * md5 value, so survivorship is bit-equal cross-engine.
    */
  private[ops] def qsTz(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = md5Mod(concat(lit("qs:"), id.cast("string")), QsMod)
    least(bit_count((h - lit(1L)).bitwiseAND(bitwise_not(h))), lit(62)).cast("int")
  }

  def quantileSketch(spark: SparkSession, dir: String): DataFrame =
    quantileSketchAt(spark, dir, QsCap)

  def quantileSketchAt(spark: SparkSession, dir: String, cap: Int): DataFrame =
    quantileSketchOf(Catalog(spark, dir).ref("events"), cap)

  /** Per-event-type p50/p95/p99 estimates from the one-pass sketch,
    * plus the sketch's own (level, n, m) so the oracle hash-checks the
    * compaction structure itself, not just the picked values.
    *
    * Quantile selection is integer-exact: target rank t_p = ⌈n·p/100⌉;
    * the sample's i-th order statistic estimates global rank i·2^level,
    * so pick i = clamp(⌈t_p / 2^level⌉, 1, m). Estimates are actual
    * data values — never interpolated — hence cross-engine exact.
    */
  private[ops] def quantileSketchOf(events: DataFrame, cap: Int): DataFrame = {
    val rows = events.select(col("event_type"), col("value"),
      qsTz(col("event_id")).as("tz"))
    val sk = rows.groupBy("event_type")
      .agg(graft.functions.QuantileSketch.hashLevelKll(col("value"), col("tz"), cap).as("sk"))
      .select(col("event_type"),
        col("sk.level").cast("long").as("level"),
        col("sk.n").as("n"),
        size(col("sk.sample")).cast("long").as("m"),
        col("sk.sample").as("sample"))
    // m = 0 (an all-null group, or a degenerate id-hash draw in a
    // > cap-row group) must yield NULL estimates, not an element_at(0)
    // runtime error that kills the whole query.
    def pick(p: Int) = expr(
      s"""IF(m = 0, NULL, element_at(sample, cast(least(greatest(
         |  ((n * $p + 99) div 100 + shiftleft(cast(1 as bigint), cast(level as int)) - 1)
         |    div shiftleft(cast(1 as bigint), cast(level as int)), 1), m) as int)))""".stripMargin)
    sk.withColumn("p50_est", pick(50))
      .withColumn("p95_est", pick(95))
      .withColumn("p99_est", pick(99))
      .drop("sample")
      .orderBy("event_type")
  }

  /** Closed-form twin: the canonical-set-function property means the
    * sketch is recomputable without replaying any merge order — level =
    * min l with ≤ cap qualified rows, sample = the qualified rows, same
    * integer rank picks.
    */
  val quantileSketchSql: String =
    s"""WITH r AS (
       |  SELECT event_type, value, least(bit_count((h - 1) & ~h), 62) AS tz
       |  FROM (SELECT event_type, value,
       |               CAST(md5_number_lower('qs:' || CAST(event_id AS VARCHAR))
       |                    % 4611686018427387904 AS BIGINT) AS h
       |        FROM events)),
       |lv AS (
       |  SELECT event_type, min(l) AS level FROM (
       |    SELECT r.event_type, ls.l, count(*) FILTER (WHERE r.tz >= ls.l) AS cnt
       |    FROM r CROSS JOIN range(0, 64) ls(l)
       |    GROUP BY 1, 2)
       |  WHERE cnt <= $QsCap GROUP BY 1),
       |stats AS (SELECT event_type, count(*) AS n FROM r GROUP BY 1),
       |samp AS (
       |  SELECT r.event_type, r.value,
       |         row_number() OVER (PARTITION BY r.event_type ORDER BY r.value) AS i
       |  FROM r JOIN lv USING (event_type) WHERE r.tz >= lv.level),
       |sm AS (SELECT event_type, count(*) AS m FROM samp GROUP BY 1),
       |sel AS (
       |  SELECT st.event_type, lv.level, st.n, sm.m,
       |         least(greatest(((st.n * 50 + 99) // 100 + (CAST(1 AS BIGINT) << lv.level) - 1)
       |             // (CAST(1 AS BIGINT) << lv.level), 1), sm.m) AS i50,
       |         least(greatest(((st.n * 95 + 99) // 100 + (CAST(1 AS BIGINT) << lv.level) - 1)
       |             // (CAST(1 AS BIGINT) << lv.level), 1), sm.m) AS i95,
       |         least(greatest(((st.n * 99 + 99) // 100 + (CAST(1 AS BIGINT) << lv.level) - 1)
       |             // (CAST(1 AS BIGINT) << lv.level), 1), sm.m) AS i99
       |  FROM stats st JOIN lv USING (event_type) JOIN sm USING (event_type))
       |SELECT s.event_type, s.level, s.n, s.m,
       |       max(CASE WHEN sa.i = s.i50 THEN sa.value END) AS p50_est,
       |       max(CASE WHEN sa.i = s.i95 THEN sa.value END) AS p95_est,
       |       max(CASE WHEN sa.i = s.i99 THEN sa.value END) AS p99_est
       |FROM sel s JOIN samp sa USING (event_type)
       |GROUP BY 1, 2, 3, 4
       |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_cms_heavy" -> (cmsHeavy _),
    "text_hll_distinct" -> (hllDistinct _),
    "text_bloom_contamination" -> (bloomContamination _),
    "text_quantile_sketch" -> (quantileSketch _))

  val oracles: Map[String, String] = Map(
    "text_cms_heavy" -> cmsHeavySql,
    "text_hll_distinct" -> hllDistinctSql,
    "text_bloom_contamination" -> bloomContaminationSql,
    "text_quantile_sketch" -> quantileSketchSql)
}
