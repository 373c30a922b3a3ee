package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.catalog.Catalog
import graft.functions.ArrayExprs

/** Similarity search over the `embeddings` table (`embedding:
  * Array[Float]`, 64-dim).
  *
  *  - bruteForceTopK: exact cosine top-k — the correctness baseline.
  *    Cross join (|Q| × N) with a codegen'd zip_with dot product; fine
  *    when |Q| is small or N fits a broadcast.
  *  - lshAnn: random-hyperplane LSH buckets — the scale path. Hyperplanes
  *    are hash-derived (deterministic, no RNG state to ship); candidate
  *    set = same-bucket vectors under any of `tables` sign-patterns, so
  *    search cost is ~N/2^bits per table instead of N.
  *  - embeddingNearDup: all pairs with cosine ≥ τ via bucket blocking.
  *
  * Float→double widening is exact and both engines fold sums
  * left-to-right over the array, so cosine scores are bit-identical to
  * the DuckDB oracle (validated; no rounding games needed).
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double,
    * left-to-right (matches DuckDB's list_sum fold order bit-for-bit).
    * Native expression — the `aggregate(zip_with(...))` HOF form is
    * interpreted per-element and ~10× slower in pair joins.
    */
  def dot(a: Column, b: Column): Column = ArrayExprs.dotF(a, b)

  /** L2 norm of a float-array column (same fold shape/order as `dot`). */
  def l2norm(a: Column): Column = ArrayExprs.l2normF(a)

  /** Cosine similarity of two float-array columns, computed in double.
    * Prefer the precomputed-norm form in joins (`dot(a,b)/(na*nb)`) —
    * this per-pair form recomputes both norms for every pair.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  // ---- brute-force top-k -----------------------------------------------------
  /** Exact top-10 cosine neighbors for query vectors vec_id < 5.
    * The query side is a `broadcast` (tiny) so the "cross join" is a
    * zero-shuffle map over the embeddings scan; ranking shuffles only
    * (qid, vec_id, score).
    */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame =
    bruteForceTopKAt(spark, dir, nQueries = 5, k = 10)

  def bruteForceTopKAt(spark: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    val c = Catalog(spark, dir)
    // Norms are computed once per vector (projection boundary), not once
    // per (query, vector) pair — at N vectors × Q queries that saves
    // 2·N·Q of the three array folds per pair.
    val emb = c.ref("embeddings")
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("nrm").as("qnrm"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("qvec"), col("embedding")) / (col("qnrm") * col("nrm"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  val bruteForceTopKSql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
      |  FROM embeddings WHERE vec_id < 5),
      |e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |         list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * vec[i]))
      |           / (sqrt(list_sum(list_transform(qvec, x -> x * x)))
      |              * sqrt(list_sum(list_transform(vec, x -> x * x)))) AS score
      |  FROM e, q WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id, score FROM ranked
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---- LSH-bucketed ANN --------------------------------------------------------

  /** ANN via multi-table LSH: candidates = vectors sharing a bucket with
    * the query in ANY table, then exact cosine rank within candidates.
    * Recall vs bruteForceTopK is asserted in SimilaritySpec. The
    * hyperplanes are md5-derived (ArrayExprs.LshBuckets), so the DuckDB
    * oracle re-derives the identical planes, buckets, candidates and
    * scores → full hash-match check.
    */
  def lshAnn(spark: SparkSession, dir: String): DataFrame =
    lshAnnAt(spark, dir, nQueries = 5, k = 10, tables = 8, bits = 8)

  /** Oracle twin of lshAnn: planes from md5_number_lower("plane:t:b:j")
    * read as signed int64 / Long.MaxValue; projections and scores as
    * ordered list folds (= the native expressions' accumulation order);
    * bucket = Σ 2^b over non-negative projections.
    */
  val lshAnnSql: String =
    """WITH planes AS (
      |  SELECT t, b, j,
      |         CAST(CAST(u AS HUGEINT)
      |              - CASE WHEN u >= 9223372036854775808 THEN 18446744073709551616 ELSE 0 END
      |              AS DOUBLE) / 9223372036854775807 AS comp
      |  FROM (SELECT t.t AS t, b.b AS b, j.j AS j,
      |               md5_number_lower('plane:' || t.t || ':' || b.b || ':' || j.j) AS u
      |        FROM range(8) t(t), range(8) b(b), range(64) j(j))),
      |plist AS (SELECT t, b, list(comp ORDER BY j) AS pl FROM planes GROUP BY t, b),
      |en AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings),
      |proj AS (
      |  SELECT en.vec_id, p.t, p.b,
      |         list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * pl[i])) AS pr
      |  FROM en CROSS JOIN plist p),
      |buckets AS (
      |  SELECT vec_id, t, sum(CASE WHEN pr >= 0 THEN 1 << b ELSE 0 END) AS bucket
      |  FROM proj GROUP BY vec_id, t),
      |q AS (SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm FROM en WHERE vec_id < 5),
      |qb AS (SELECT vec_id AS query_id, t, bucket FROM buckets WHERE vec_id < 5),
      |cand AS (
      |  SELECT DISTINCT qb.query_id, bk.vec_id
      |  FROM buckets bk JOIN qb ON bk.t = qb.t AND bk.bucket = qb.bucket
      |  WHERE bk.vec_id <> qb.query_id),
      |scored AS (
      |  SELECT c.query_id, c.vec_id,
      |         list_sum(list_transform(range(1, len(q.qvec) + 1), i -> q.qvec[i] * en.vec[i]))
      |           / (q.qnrm * en.nrm) AS score
      |  FROM cand c JOIN q ON q.query_id = c.query_id JOIN en ON en.vec_id = c.vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  def lshAnnAt(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      tables: Int, bits: Int): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings")
    // Bucket table materialized once: the query side and the candidate
    // side would otherwise each recompute tables×bits hyperplane
    // projections for every vector.
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("nrm"),
      ArrayExprs.lshBuckets(col("embedding"), tables, bits).as("buckets"))
      .localCheckpoint()
    val exploded = bucketed.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(col("buckets"))).withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val qs = exploded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("nrm").as("qnrm"), col("table"), col("bucket"))
    val candidates = exploded.join(broadcast(qs), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qvec"), col("qnrm"),
        col("vec_id"), col("embedding"), col("nrm"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    candidates
      .withColumn("score", dot(col("qvec"), col("embedding")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  // ---- embedding near-dup ---------------------------------------------------------
  /** All vector pairs with cosine ≥ τ. Exact form for the oracle uses label
    * blocking (pairs within the same label — the table's natural cluster
    * key) to stay sub-quadratic while remaining SQL-expressible; the
    * unblocked LSH form is `lshAnn` generalized (SimilaritySpec covers it).
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDupAt(spark, dir, 0.95)

  def embeddingNearDupAt(spark: SparkSession, dir: String, tau: Double): DataFrame = {
    val c = Catalog(spark, dir)
    pairsAbove(c.ref("embeddings").select(col("vec_id"), col("label"), col("embedding")), tau)
  }

  /** Same-label pairs of `emb` (vec_id, label, embedding) with cosine ≥ τ. */
  private def pairsAbove(embIn: DataFrame, tau: Double): DataFrame = {
    val emb = embIn.withColumn("nrm", l2norm(col("embedding")))
    val a = emb.as("a")
    val b = emb.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"),
        col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("score"))
      .filter(col("score") >= tau)
      .orderBy("id1", "id2")
  }

  /** The REGISTERED near-dup query: the raw corpus has no same-label
    * cosine-0.95 pairs at driver SFs, so the plain query passes with 0
    * rows — a vacuous check (both engines returning nothing is
    * indistinguishable from both being dead). This variant plants one
    * perturbed copy of every 20th vector — first component zeroed,
    * vec_id + 1,000,000, same label — giving cosine just under 1.0 by
    * construction, so the expected output is non-empty at every SF and
    * the threshold, pair predicate, and score arithmetic all have teeth.
    * The perturbation reuses the original float components unchanged
    * (zero + slice), so both engines see bit-identical inputs.
    */
  def embeddingNearDupPlanted(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDupPlantedAt(spark, dir, 0.95)

  def embeddingNearDupPlantedAt(spark: SparkSession, dir: String, tau: Double): DataFrame = {
    val c = Catalog(spark, dir)
    val base = c.ref("embeddings").select(col("vec_id"), col("label"), col("embedding"))
    val planted = base.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
        concat(array(lit(0.0f)), expr("slice(embedding, 2, size(embedding))")).as("embedding"))
    pairsAbove(base.union(planted), tau)
  }

  val embeddingNearDupSql: String =
    """WITH planted AS (
      |  SELECT vec_id + 1000000 AS vec_id, label,
      |         list_concat([CAST(0 AS FLOAT)], embedding[2:]) AS embedding
      |  FROM embeddings WHERE vec_id % 20 = 0),
      |all_vecs AS (
      |  SELECT vec_id, label, embedding FROM embeddings
      |  UNION ALL SELECT vec_id, label, embedding FROM planted),
      |e AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM all_vecs)
      |SELECT a.label AS label, a.vec_id AS id1, b.vec_id AS id2,
      |       list_sum(list_transform(range(1, len(a.vec) + 1), i -> a.vec[i] * b.vec[i]))
      |         / (sqrt(list_sum(list_transform(a.vec, x -> x * x)))
      |            * sqrt(list_sum(list_transform(b.vec, x -> x * x)))) AS score
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(range(1, len(a.vec) + 1), i -> a.vec[i] * b.vec[i]))
      |         / (sqrt(list_sum(list_transform(a.vec, x -> x * x)))
      |            * sqrt(list_sum(list_transform(b.vec, x -> x * x)))) >= 0.95
      |ORDER BY id1, id2""".stripMargin

  // ---- semantic dedup -------------------------------------------------------
  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the IVF coarse
    * quantizer, then — only WITHIN each cluster — mark every vector
    * whose cosine similarity to an earlier (lower vec_id) cluster member
    * is ≥ τ as a duplicate of the earliest such member. Near-identical
    * meaning collapses to one representative even when the text differs
    * (paraphrases, translations, templated rewrites — what MinHash
    * misses).
    *
    * Scale shape: the quadratic pair step runs per-cell, so total work
    * is Σ|cell|² ≈ N²/k — pick k ∝ N to hold cell size (and per-task
    * memory) constant; the cell id is a shuffle key, never a
    * materialized table. Cross-cluster near-dups are invisible by
    * design — that is SemDeDup's recall/cost trade, not a bug here.
    *
    * The registered query runs iters = 0 (cells = the md5-ordered
    * sample verbatim) so the full pipeline — sample, assignment,
    * in-cell pairs, tie-broken representative choice — re-derives in
    * DuckDB and hash-checks end-to-end; Lloyd refinement is covered by
    * IvfSpec/SimilaritySpec recall tests.
    */
  /** g = ceil(maxOcc / √(2·targetPairs)): the smallest block count that
    * holds every (blockA, blockB) task under ~targetPairs scored pairs.
    * A derivation past 1024 FAILS LOUDLY (the [[Dedup.PairBudget]]
    * philosophy — never silently stop honoring the documented per-task
    * cap): replication cost is g× per join input, so a four-digit g
    * says the cell/target combination needs a different remedy (more
    * cells so occupancy drops, or a bigger target), not a thousand-way
    * explode. targetPairs must be positive (√0 would overflow the ceil
    * into a negative g).
    */
  private[ops] def autoSaltBlocks(maxOcc: Long, targetPairs: Long): Int = {
    require(targetPairs > 0, s"saltTargetPairs must be positive, got $targetPairs")
    val g = math.max(1L, math.ceil(maxOcc / math.sqrt(2.0 * targetPairs)).toLong)
    if (g > 1024L)
      throw new IllegalStateException(
        s"semantic dedup cell skew beyond the salting dial: max cell occupancy $maxOcc " +
          s"needs $g blocks to hold ~$targetPairs pairs/task (cap 1024). Increase kCells " +
          "so occupancy drops, or raise saltTargetPairs.")
    g.toInt
  }

  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    semanticDedupAt(spark, dir, kCells = 16, tau = 0.95, iters = 0)

  /** `sim_semantic_dedup_probe2`: the same pipeline with the
    * `nprobeAssign = 2` boundary dial engaged — oracle-checked end to
    * end like the single-probe row.
    */
  def semanticDedupProbe2(spark: SparkSession, dir: String): DataFrame =
    semanticDedupAt(spark, dir, kCells = 16, tau = 0.95, iters = 0, nprobeAssign = 2)

  /** `nprobeAssign` is the CELL-BOUNDARY dial: each vector is assigned
    * to its top-`nprobeAssign` cells (primary = nearest, reported as
    * `cid`), and the quadratic pair step runs over every SHARED probe
    * cell — a near-dup pair straddling a cell boundary, invisible to
    * single-cell SemDeDup by construction, meets in the neighbor cell
    * it co-probes. Cost scales ≤ nprobeAssign² per pair-step (still
    * Σ|cell|²-shaped, never all-pairs); a pair sharing several probe
    * cells is scored once per shared cell, which the `min` rollup
    * absorbs — cheaper than a distinct-pair shuffle at small nprobe.
    * [[graft.ScaleProbe]] measures the planted cross-boundary miss rate
    * of 1-probe vs 2-probe at two scales.
    */
  /** `saltBlocks` is the CELL-SKEW dial: the in-cell pair step keys the
    * self-join on the cell id, so one over-occupied cell (boilerplate
    * embeddings, a templated document family) lands its whole |cell|²
    * pair work on ONE reducer — the SemDeDup mirror of the hot-label
    * star problem. With g = saltBlocks > 1, members hash into g blocks
    * and the join keys on (cell, blockA, blockB): pair (x, y) meets in
    * exactly the (b(x), b(y)) block task, so the emitted pair set — and
    * every dedup verdict — is IDENTICAL, while per-task pair work drops
    * to (|cell|/g)² across g² tasks. Replication cost is g× on each
    * join input (rows, not pairs) — cheap against a quadratic hot task.
    * ScaleProbe measures the spread on a skewed-cell fixture.
    *
    * `saltBlocks = 0` (the DEFAULT, and the registered rows' setting)
    * derives g AUTOMATICALLY from the measured max cell occupancy — one
    * k-row aggregate off the checkpointed assignment — so a skewed
    * corpus is bounded without anyone remembering to set the dial (the
    * same probe-then-bound principle as [[Dedup.PairBudget]]): g =
    * ceil(maxOcc / √(2·saltTargetPairs)), which caps any task at about
    * `saltTargetPairs` scored pairs. On a balanced corpus (every cell ≤
    * ~2.8k members at the 4M default) the derivation returns g = 1 and
    * the plan is exactly the unsalted one.
    */
  def semanticDedupAt(spark: SparkSession, dir: String, kCells: Int,
      tau: Double, iters: Int, nprobeAssign: Int = 1,
      saltBlocks: Int = 0, saltTargetPairs: Long = 4000000L): DataFrame = {
    require(saltBlocks >= 0, s"saltBlocks must be >= 0 (0 = auto), got $saltBlocks")
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings")
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
    val centroids = Ivf.kmeansCentroids(emb, kCells, iters)
    val p = math.min(nprobeAssign, centroids.size)
    val assigned = emb
      .withColumn("probes", ArrayExprs.nearestCentroids(col("embedding"), centroids, p))
      .withColumn("cid", col("probes").getItem(0))
      .localCheckpoint()
    val probed = assigned
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(col("probes")).as("pcid"))
    val g0 =
      if (saltBlocks >= 1) saltBlocks
      else {
        val r = probed.groupBy(col("pcid")).count().agg(max(col("count"))).head()
        val maxOcc = if (r.isNullAt(0)) 0L else r.getLong(0)
        autoSaltBlocks(maxOcc, saltTargetPairs)
      }
    val dups = (if (g0 == 1) {
      probed.as("a")
        .join(probed.as("b"),
          col("a.pcid") === col("b.pcid") && col("b.vec_id") < col("a.vec_id"))
    } else {
      val g = g0
      val blk = pmod(xxhash64(col("vec_id")), lit(g.toLong)).cast("int")
      // left row x lives in block row pb = b(x) and visits every ob;
      // right row y lives in ob = b(y) and visits every pb — pair (x, y)
      // meets exactly once, in the (b(x), b(y)) task
      val leftS = probed.withColumn("pb", blk)
        .withColumn("ob", explode(sequence(lit(0), lit(g - 1))))
      val rightS = probed.withColumn("ob", blk)
        .withColumn("pb", explode(sequence(lit(0), lit(g - 1))))
      leftS.as("a")
        .join(rightS.as("b"),
          col("a.pcid") === col("b.pcid") && col("a.pb") === col("b.pb") &&
            col("a.ob") === col("b.ob") && col("b.vec_id") < col("a.vec_id"))
    })
      .withColumn("score",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("score") >= tau)
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(min(col("b.vec_id")).as("dup_of0"))
    assigned.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").cast("int").as("cid"),
        col("dup_of0").isNotNull.as("is_dup"),
        // -1 sentinel instead of NULL: a nullable int column degrades to
        // float64+NaN in the driver's pandas compare
        coalesce(col("dup_of0"), lit(-1L)).as("dup_of"))
      .orderBy("vec_id")
  }

  /** `sim_semantic_dedup_int8`: SemDeDup with the quadratic pair step
    * on INT8 CODES — the bandwidth dial for the in-cell O(|cell|²)
    * work. Each vector quantizes once at the scan (symmetric max-abs,
    * the [[int8Quantize]] contract: q = floor(x·127/scale + 0.5)), and
    * pair similarity is the cosine of the CODE vectors:
    * dot(qa, qb) / (√Σqa²·√Σqb²) — the per-vector scales cancel, so the
    * score is derived entirely from exact integer sums and IEEE sqrt/
    * division, hash-checkable cross-engine with no float-fold contract.
    * The pair step reads 8-byte code entries instead of float arrays —
    * at production width (int8 storage) 4× less bandwidth through the
    * hot quadratic loop, for a ≤~1% similarity perturbation (the
    * documented quantization trade; planted near-copies still collapse,
    * SemanticDedupSpec).
    */
  def semanticDedupInt8(spark: SparkSession, dir: String): DataFrame =
    semanticDedupInt8At(spark, dir, kCells = 16, tau = 0.95, iters = 0)

  /** `sim_semantic_dedup_int8_probe2`: BOTH dials composed — the int8
    * bandwidth dial through the quadratic loop AND the `nprobeAssign=2`
    * boundary dial, since at scale you want cheap pair work and
    * boundary recall at the same time. The explode/shared-probe-cell
    * join is orthogonal to what the pair step scores, so the
    * composition is exactly [[semanticDedupAt]]'s probe machinery over
    * [[semanticDedupInt8At]]'s code vectors.
    */
  def semanticDedupInt8Probe2(spark: SparkSession, dir: String): DataFrame =
    semanticDedupInt8At(spark, dir, kCells = 16, tau = 0.95, iters = 0, nprobeAssign = 2)

  /** Same dials as [[semanticDedupAt]]: `nprobeAssign` (boundary),
    * `saltBlocks` (cell skew, 0 = auto-derive from occupancy) — all
    * three compose because they touch orthogonal parts of the plan
    * (what's scored / which cells pair / how the pair join is keyed).
    */
  def semanticDedupInt8At(spark: SparkSession, dir: String, kCells: Int,
      tau: Double, iters: Int, nprobeAssign: Int = 1,
      saltBlocks: Int = 0, saltTargetPairs: Long = 4000000L): DataFrame = {
    require(saltBlocks >= 0, s"saltBlocks must be >= 0 (0 = auto), got $saltBlocks")
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings").select(col("vec_id"), col("embedding"))
    val centroids = Ivf.kmeansCentroids(
      emb.withColumn("nrm", l2norm(col("embedding"))), kCells, iters)
    val p = math.min(nprobeAssign, centroids.size)
    val q = emb
      .withColumn("probes", ArrayExprs.nearestCentroids(col("embedding"), centroids, p))
      .withColumn("cid", col("probes").getItem(0))
      .withColumn("scale",
        expr("aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
      .withColumn("codes", expr(
        """transform(embedding, x ->
          |  IF(scale = CAST(0 AS DOUBLE), CAST(0 AS BIGINT),
          |     CAST(floor(CAST(x AS DOUBLE) * 127.0 / scale + 0.5) AS BIGINT)))""".stripMargin))
      .withColumn("qn2",
        expr("aggregate(codes, CAST(0 AS BIGINT), (acc, v) -> acc + v * v)"))
      .select("vec_id", "cid", "probes", "codes", "qn2")
      .localCheckpoint()
    // a pair sharing both probe cells is scored once per shared cell;
    // the min rollup absorbs the duplicate, same as semanticDedupAt
    val probed = q.select(col("vec_id"), col("codes"), col("qn2"),
      explode(col("probes")).as("pcid"))
    val g0 =
      if (saltBlocks >= 1) saltBlocks
      else {
        val r = probed.groupBy(col("pcid")).count().agg(max(col("count"))).head()
        val maxOcc = if (r.isNullAt(0)) 0L else r.getLong(0)
        autoSaltBlocks(maxOcc, saltTargetPairs)
      }
    val left = probed.select(col("vec_id").as("a_id"), col("pcid"),
      col("codes").as("qa"), col("qn2").as("an2"))
    val right = probed.select(col("vec_id").as("b_id"), col("pcid"),
      col("codes").as("qb"), col("qn2").as("bn2"))
    val dups = (if (g0 == 1) {
      left.join(right,
        left("pcid") === right("pcid") && col("b_id") < col("a_id"))
    } else {
      val g = g0
      val leftS = left
        .withColumn("pb", pmod(xxhash64(col("a_id")), lit(g.toLong)).cast("int"))
        .withColumn("ob", explode(sequence(lit(0), lit(g - 1))))
      val rightS = right
        .withColumn("ob", pmod(xxhash64(col("b_id")), lit(g.toLong)).cast("int"))
        .withColumn("pb", explode(sequence(lit(0), lit(g - 1))))
      leftS.join(rightS,
        leftS("pcid") === rightS("pcid") && leftS("pb") === rightS("pb") &&
          leftS("ob") === rightS("ob") && col("b_id") < col("a_id"))
    })
      .filter(col("an2") > 0L && col("bn2") > 0L)
      .withColumn("dotq", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .withColumn("score", col("dotq").cast("double")
        / (sqrt(col("an2").cast("double")) * sqrt(col("bn2").cast("double"))))
      .filter(col("score") >= tau)
      .groupBy(col("a_id").as("vec_id"))
      .agg(min(col("b_id")).as("dup_of0"))
    q.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").cast("int").as("cid"),
        col("dup_of0").isNotNull.as("is_dup"),
        coalesce(col("dup_of0"), lit(-1L)).as("dup_of"))
      .orderBy("vec_id")
  }

  /** Oracle twin of [[semanticDedupInt8]]: the single-probe assignment
    * CTEs plus the quantization and the integer-dot pair filter.
    */
  val semanticDedupInt8Sql: String =
    """WITH ho AS (
      |  SELECT vec_id, embedding,
      |         md5_number_lower(CAST(vec_id AS VARCHAR)) % 1000003 AS hord
      |  FROM embeddings),
      |samp AS (
      |  SELECT vec_id, embedding, row_number() OVER (ORDER BY hord, vec_id) AS sr
      |  FROM ho ORDER BY hord, vec_id LIMIT 1024),
      |cnorm AS (
      |  SELECT sr - 1 AS cid,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS cn
      |  FROM samp WHERE sr <= 16),
      |en AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings),
      |assigned AS MATERIALIZED (
      |  SELECT vec_id, cid FROM (
      |    SELECT en.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS r
      |    FROM en CROSS JOIN cnorm c) WHERE r = 1),
      |qv AS MATERIALIZED (
      |  SELECT vec_id,
      |         CASE WHEN scale = 0 THEN list_transform(vec, x -> CAST(0 AS BIGINT))
      |              ELSE list_transform(vec, x -> CAST(floor(x * 127.0 / scale + 0.5) AS BIGINT))
      |         END AS q
      |  FROM (SELECT vec_id, vec,
      |               list_max(list_transform(vec, x -> abs(x))) AS scale
      |        FROM en)),
      |qn AS MATERIALIZED (
      |  SELECT vec_id, q,
      |         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
      |  FROM qv),
      |dups AS (
      |  SELECT a.vec_id AS vec_id, min(b.vec_id) AS dup_of
      |  FROM assigned a
      |  JOIN assigned b ON a.cid = b.cid AND b.vec_id < a.vec_id
      |  JOIN qn qa ON qa.vec_id = a.vec_id
      |  JOIN qn qb ON qb.vec_id = b.vec_id
      |  WHERE qa.n2 > 0 AND qb.n2 > 0
      |    AND CAST(list_sum(list_transform(range(1, len(qa.q) + 1),
      |              i -> qa.q[i] * qb.q[i])) AS DOUBLE)
      |          / (sqrt(CAST(qa.n2 AS DOUBLE)) * sqrt(CAST(qb.n2 AS DOUBLE))) >= 0.95
      |  GROUP BY 1)
      |SELECT a.vec_id, CAST(a.cid AS INT) AS cid,
      |       d.dup_of IS NOT NULL AS is_dup,
      |       COALESCE(d.dup_of, -1) AS dup_of
      |FROM assigned a LEFT JOIN dups d ON d.vec_id = a.vec_id
      |ORDER BY a.vec_id""".stripMargin

  /** Oracle twin of [[semanticDedupInt8Probe2]]: the probe2 twin's
    * r ≤ 2 probe CTE composed with the int8 twin's quantization CTEs —
    * the pair join runs over shared probe cells and scores CODE
    * vectors; the reported cid stays r = 1.
    */
  val semanticDedupInt8Probe2Sql: String =
    """WITH ho AS (
      |  SELECT vec_id, embedding,
      |         md5_number_lower(CAST(vec_id AS VARCHAR)) % 1000003 AS hord
      |  FROM embeddings),
      |samp AS (
      |  SELECT vec_id, embedding, row_number() OVER (ORDER BY hord, vec_id) AS sr
      |  FROM ho ORDER BY hord, vec_id LIMIT 1024),
      |cnorm AS (
      |  SELECT sr - 1 AS cid,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS cn
      |  FROM samp WHERE sr <= 16),
      |en AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings),
      |probes AS MATERIALIZED (
      |  SELECT vec_id, cid, r FROM (
      |    SELECT en.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS r
      |    FROM en CROSS JOIN cnorm c) WHERE r <= 2),
      |qv AS MATERIALIZED (
      |  SELECT vec_id,
      |         CASE WHEN scale = 0 THEN list_transform(vec, x -> CAST(0 AS BIGINT))
      |              ELSE list_transform(vec, x -> CAST(floor(x * 127.0 / scale + 0.5) AS BIGINT))
      |         END AS q
      |  FROM (SELECT vec_id, vec,
      |               list_max(list_transform(vec, x -> abs(x))) AS scale
      |        FROM en)),
      |qn AS MATERIALIZED (
      |  SELECT vec_id, q,
      |         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
      |  FROM qv),
      |dups AS (
      |  SELECT a.vec_id AS vec_id, min(b.vec_id) AS dup_of
      |  FROM probes a
      |  JOIN probes b ON a.cid = b.cid AND b.vec_id < a.vec_id
      |  JOIN qn qa ON qa.vec_id = a.vec_id
      |  JOIN qn qb ON qb.vec_id = b.vec_id
      |  WHERE qa.n2 > 0 AND qb.n2 > 0
      |    AND CAST(list_sum(list_transform(range(1, len(qa.q) + 1),
      |              i -> qa.q[i] * qb.q[i])) AS DOUBLE)
      |          / (sqrt(CAST(qa.n2 AS DOUBLE)) * sqrt(CAST(qb.n2 AS DOUBLE))) >= 0.95
      |  GROUP BY 1)
      |SELECT p.vec_id, CAST(p.cid AS INT) AS cid,
      |       d.dup_of IS NOT NULL AS is_dup,
      |       COALESCE(d.dup_of, -1) AS dup_of
      |FROM probes p LEFT JOIN dups d ON d.vec_id = p.vec_id
      |WHERE p.r = 1
      |ORDER BY p.vec_id""".stripMargin

  /** Oracle twin: same sample/assignment CTEs as Ivf.ivfAnnSql, then the
    * in-cell pair filter and earliest-representative choice in SQL.
    */
  val semanticDedupSql: String =
    """WITH ho AS (
      |  SELECT vec_id, embedding,
      |         md5_number_lower(CAST(vec_id AS VARCHAR)) % 1000003 AS hord
      |  FROM embeddings),
      |samp AS (
      |  SELECT vec_id, embedding, row_number() OVER (ORDER BY hord, vec_id) AS sr
      |  FROM ho ORDER BY hord, vec_id LIMIT 1024),
      |cnorm AS (
      |  SELECT sr - 1 AS cid,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS cn
      |  FROM samp WHERE sr <= 16),
      |en AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings),
      |assigned AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT en.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS r
      |    FROM en CROSS JOIN cnorm c) WHERE r = 1),
      |dups AS (
      |  SELECT a.vec_id AS vec_id, min(b.vec_id) AS dup_of
      |  FROM assigned a
      |  JOIN assigned b ON a.cid = b.cid AND b.vec_id < a.vec_id
      |  JOIN en ea ON ea.vec_id = a.vec_id
      |  JOIN en eb ON eb.vec_id = b.vec_id
      |  WHERE list_sum(list_transform(range(1, len(ea.vec) + 1), i -> ea.vec[i] * eb.vec[i]))
      |          / (ea.nrm * eb.nrm) >= 0.95
      |  GROUP BY 1)
      |SELECT a.vec_id, CAST(a.cid AS INT) AS cid,
      |       d.dup_of IS NOT NULL AS is_dup,
      |       COALESCE(d.dup_of, -1) AS dup_of
      |FROM assigned a LEFT JOIN dups d ON d.vec_id = a.vec_id
      |ORDER BY a.vec_id""".stripMargin

  /** Oracle twin of [[semanticDedupProbe2]]: identical CTEs except the
    * assignment window keeps r ≤ 2 (the probe list) and the pair join
    * runs over shared PROBE cells; the reported cid stays r = 1.
    */
  val semanticDedupProbe2Sql: String =
    """WITH ho AS (
      |  SELECT vec_id, embedding,
      |         md5_number_lower(CAST(vec_id AS VARCHAR)) % 1000003 AS hord
      |  FROM embeddings),
      |samp AS (
      |  SELECT vec_id, embedding, row_number() OVER (ORDER BY hord, vec_id) AS sr
      |  FROM ho ORDER BY hord, vec_id LIMIT 1024),
      |cnorm AS (
      |  SELECT sr - 1 AS cid,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS cn
      |  FROM samp WHERE sr <= 16),
      |en AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings),
      |probes AS MATERIALIZED (
      |  SELECT vec_id, cid, r FROM (
      |    SELECT en.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS r
      |    FROM en CROSS JOIN cnorm c) WHERE r <= 2),
      |dups AS (
      |  SELECT a.vec_id AS vec_id, min(b.vec_id) AS dup_of
      |  FROM probes a
      |  JOIN probes b ON a.cid = b.cid AND b.vec_id < a.vec_id
      |  JOIN en ea ON ea.vec_id = a.vec_id
      |  JOIN en eb ON eb.vec_id = b.vec_id
      |  WHERE list_sum(list_transform(range(1, len(ea.vec) + 1), i -> ea.vec[i] * eb.vec[i]))
      |          / (ea.nrm * eb.nrm) >= 0.95
      |  GROUP BY 1)
      |SELECT p.vec_id, CAST(p.cid AS INT) AS cid,
      |       d.dup_of IS NOT NULL AS is_dup,
      |       COALESCE(d.dup_of, -1) AS dup_of
      |FROM probes p LEFT JOIN dups d ON d.vec_id = p.vec_id
      |WHERE p.r = 1
      |ORDER BY p.vec_id""".stripMargin

  /** Per-label centroids — class prototypes over the embedding corpus
    * (nearest-class-mean classification, cluster drift monitoring, the
    * coarse quantizer a production IVF trains against real labels).
    * Per-(label, dim) mean of the float column, summed as a SORTED LEFT
    * FOLD of the doubles (see ops.Graph for why decimal accumulation is
    * not cross-engine-exact): bit-identical to the DuckDB twin, which
    * zips `unnest(range(...))` with `unnest(embedding)` for the same
    * (dim, value) pairs.
    *
    * Scale: one posexplode scan (|V|·dims rows of 20 bytes) into one
    * aggregation keyed by (label, dim) — the classic map-side-combinable
    * shape except the fold, which needs the group's values together; at
    * web scale swap the fold for a mergeable compensated sum and accept
    * last-ulp oracle drift (harness constraint, same note as PageRank).
    */
  // ---- incremental semantic dedup (delta vs the persisted base index) -------
  //
  // The O(Δ) production form of SemDeDup: the already-curated corpus is
  // a PERSISTED IVF index ([[Ivf.buildIndex]] — frozen quantizer,
  // cell-partitioned vectors), and each arriving batch is screened
  // against it without ever re-deduping the base. Per-batch work:
  //   - delta assignment + probe list: scan work over the batch only;
  //   - the base is read through STATIC partition pruning on the
  //     bounded probed-cid list — ~nprobe/kCells of the index's bytes,
  //     and with kCells grown ∝ base size (the standard IVF sizing)
  //     the probed bytes per delta vector stay CONSTANT as the base
  //     grows (ScaleProbe measures 1× vs 8× base at the same delta);
  //   - both pair joins carry the auto-salting skew dial.
  // Verdicts follow the [[Dedup.incrementalDedup]] contract with
  // BASE-WINS precedence: `dup_of_base` (a base member within a probed
  // cell at cos ≥ τ — base wins regardless of id order), `dup_in_delta`
  // (an earlier in-batch member in a shared probe cell), else `new`.
  // Boundary recall matches [[semanticDedupAt]]'s nprobeAssign dial
  // from the DELTA side: a straddling pair meets in any base cell the
  // delta vector co-probes.

  def semanticDedupIncremental(spark: SparkSession, dir: String): DataFrame =
    semanticDedupIncrementalAt(spark, dir, kCells = 16, tau = 0.95,
      nprobeAssign = 2)

  /** The registered row: base = vec_id % 10 ≠ 0 lands ONCE as the
    * persisted index, the delta screens against it. Rebuild-per-
    * invocation keeps the row hash-closed; production holds the
    * [[Ivf.IvfIndex]] handle and calls [[semanticDedupScreenDelta]] per
    * batch.
    */
  def semanticDedupIncrementalAt(spark: SparkSession, dir: String,
      kCells: Int, tau: Double, nprobeAssign: Int = 2, saltBlocks: Int = 0,
      saltTargetPairs: Long = 4000000L): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings").select(col("vec_id"), col("embedding"))
    val index = Ivf.buildIndexCached(emb.filter(col("vec_id") % 10 =!= 0),
      s"$dir/embeddings.parquet",
      graft.util.Fs.sessionTempDir("semdedup_ivf_index", dir), kCells, iters = 0)
    semanticDedupScreenDelta(spark, index,
      emb.filter(col("vec_id") % 10 === 0), tau, nprobeAssign,
      saltBlocks, saltTargetPairs)
  }

  /** Screen a `(vec_id, embedding)` delta batch against an EXISTING
    * persisted base index — the entry a pipeline calls per landing
    * batch. All [[semanticDedupAt]] dials compose: `nprobeAssign`
    * (boundary, from the delta side), `saltBlocks` (0 = auto-derive
    * from the measured max probed-cell occupancy across both join
    * sides).
    */
  def semanticDedupScreenDelta(spark: SparkSession, index: Ivf.IvfIndex,
      delta: DataFrame, tau: Double, nprobeAssign: Int = 2,
      saltBlocks: Int = 0, saltTargetPairs: Long = 4000000L): DataFrame = {
    require(saltBlocks >= 0, s"saltBlocks must be >= 0 (0 = auto), got $saltBlocks")
    val p = math.min(nprobeAssign, index.centroids.size)
    val d = delta
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
      .withColumn("probes",
        ArrayExprs.nearestCentroids(col("embedding"), index.centroids, p))
      .withColumn("cid", col("probes").getItem(0))
      .localCheckpoint()
    val dprobed = d.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(col("probes")).as("pcid"))
      .localCheckpoint(eager = false)
    // bounded driver list (≤ kCells ints) → static partition pruning
    val probedCids = dprobed.select(col("pcid")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // NOT checkpointed: the auto-salt occupancy aggregate below touches
    // only the cid partition column (parquet footer row counts, no data
    // pages), so the one real base read is the pair join — which keeps
    // the probed-cid partition pruning visible in the executed plan
    val baseProbed = Ivf.indexData(spark, index.path)
      .filter(col("cid").isin(probedCids: _*))
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("nrm").as("b_nrm"), col("cid").cast("int").as("pcid"))
    val g0 =
      if (saltBlocks >= 1) saltBlocks
      else {
        val r = dprobed.groupBy(col("pcid")).count()
          .unionByName(baseProbed.groupBy(col("pcid")).count())
          .groupBy(col("pcid")).agg(sum(col("count")).as("occ"))
          .agg(max(col("occ"))).head()
        val maxOcc = if (r.isNullAt(0)) 0L else r.getLong(0)
        autoSaltBlocks(maxOcc, saltTargetPairs)
      }
    // delta × base within shared probe cells (base wins, any id order)
    val baseJoined = (if (g0 == 1) {
      dprobed.join(baseProbed, Seq("pcid"))
    } else {
      val g = g0
      val leftS = dprobed
        .withColumn("pb", pmod(xxhash64(col("vec_id")), lit(g.toLong)).cast("int"))
        .withColumn("ob", explode(sequence(lit(0), lit(g - 1))))
      val rightS = baseProbed
        .withColumn("ob", pmod(xxhash64(col("b_id")), lit(g.toLong)).cast("int"))
        .withColumn("pb", explode(sequence(lit(0), lit(g - 1))))
      leftS.join(rightS, Seq("pcid", "pb", "ob"))
    })
    val baseHits = baseJoined
      .withColumn("score",
        dot(col("embedding"), col("b_emb")) / (col("nrm") * col("b_nrm")))
      .filter(col("score") >= tau)
      .groupBy(col("vec_id"))
      .agg(min(col("b_id")).as("base_rep"))
    // delta × earlier delta within shared probe cells (in-batch dedup)
    val deltaJoined = (if (g0 == 1) {
      dprobed.as("a")
        .join(dprobed.as("b"),
          col("a.pcid") === col("b.pcid") && col("b.vec_id") < col("a.vec_id"))
    } else {
      val g = g0
      val blk = pmod(xxhash64(col("vec_id")), lit(g.toLong)).cast("int")
      val leftS = dprobed.withColumn("pb", blk)
        .withColumn("ob", explode(sequence(lit(0), lit(g - 1))))
      val rightS = dprobed.withColumn("ob", blk)
        .withColumn("pb", explode(sequence(lit(0), lit(g - 1))))
      leftS.as("a")
        .join(rightS.as("b"),
          col("a.pcid") === col("b.pcid") && col("a.pb") === col("b.pb") &&
            col("a.ob") === col("b.ob") && col("b.vec_id") < col("a.vec_id"))
    })
    val deltaHits = deltaJoined
      .withColumn("score",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("score") >= tau)
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(min(col("b.vec_id")).as("delta_rep"))
    d.join(baseHits, Seq("vec_id"), "left")
      .join(deltaHits, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").cast("int").as("cid"),
        when(col("base_rep").isNotNull, lit("dup_of_base"))
          .when(col("delta_rep").isNotNull, lit("dup_in_delta"))
          .otherwise(lit("new")).as("verdict"),
        coalesce(col("base_rep"), col("delta_rep"), lit(-1L)).as("dup_of"))
      .orderBy("vec_id")
  }

  /** Twin of [[semanticDedupIncremental]]: base-sample cells (the
    * frozen persisted quantizer), top-1 base assignment, top-2 delta
    * probes, cosine in double, base-wins precedence — the closed-form
    * union semantics the O(Δ) screen must reproduce.
    */
  val semanticDedupIncrementalSql: String =
    """WITH ho AS (
      |  SELECT vec_id, embedding,
      |         md5_number_lower(CAST(vec_id AS VARCHAR)) % 1000003 AS hord
      |  FROM embeddings WHERE vec_id % 10 <> 0),
      |samp AS (
      |  SELECT vec_id, embedding, row_number() OVER (ORDER BY hord, vec_id) AS sr
      |  FROM ho ORDER BY hord, vec_id LIMIT 1024),
      |cnorm AS (
      |  SELECT sr - 1 AS cid,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS cn
      |  FROM samp WHERE sr <= 16),
      |en AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings),
      |baseassign AS MATERIALIZED (
      |  SELECT vec_id, cid FROM (
      |    SELECT en.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * c.cvec[i])) / c.cn
      |             DESC, c.cid) AS r
      |    FROM en CROSS JOIN cnorm c WHERE en.vec_id % 10 <> 0) WHERE r = 1),
      |dprobe AS MATERIALIZED (
      |  SELECT vec_id, cid, prank FROM (
      |    SELECT en.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * c.cvec[i])) / c.cn
      |             DESC, c.cid) AS prank
      |    FROM en CROSS JOIN cnorm c WHERE en.vec_id % 10 = 0) WHERE prank <= 2),
      |basehit AS (
      |  SELECT dp.vec_id, min(ba.vec_id) AS dup_of
      |  FROM dprobe dp
      |  JOIN baseassign ba ON ba.cid = dp.cid
      |  JOIN en a ON a.vec_id = dp.vec_id
      |  JOIN en b ON b.vec_id = ba.vec_id
      |  WHERE list_sum(list_transform(range(1, len(a.vec) + 1), i -> a.vec[i] * b.vec[i]))
      |          / (a.nrm * b.nrm) >= 0.95
      |  GROUP BY 1),
      |deltahit AS (
      |  SELECT pa.vec_id, min(pb.vec_id) AS dup_of
      |  FROM dprobe pa
      |  JOIN dprobe pb ON pb.cid = pa.cid AND pb.vec_id < pa.vec_id
      |  JOIN en a ON a.vec_id = pa.vec_id
      |  JOIN en b ON b.vec_id = pb.vec_id
      |  WHERE list_sum(list_transform(range(1, len(a.vec) + 1), i -> a.vec[i] * b.vec[i]))
      |          / (a.nrm * b.nrm) >= 0.95
      |  GROUP BY 1)
      |SELECT p.vec_id, p.cid,
      |       CASE WHEN bh.dup_of IS NOT NULL THEN 'dup_of_base'
      |            WHEN dh.dup_of IS NOT NULL THEN 'dup_in_delta'
      |            ELSE 'new' END AS verdict,
      |       coalesce(bh.dup_of, dh.dup_of, -1) AS dup_of
      |FROM (SELECT vec_id, cid FROM dprobe WHERE prank = 1) p
      |LEFT JOIN basehit bh ON bh.vec_id = p.vec_id
      |LEFT JOIN deltahit dh ON dh.vec_id = p.vec_id
      |ORDER BY p.vec_id""".stripMargin

  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.ref("embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), (col("dim") + 1).cast("long").as("dim"))
      .agg(aggregate(array_sort(collect_list(col("v").cast("double"))),
        lit(0.0), (acc, x) => acc + x).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"), (col("s") / col("n")).as("centroid"), col("n"))
      .orderBy("label", "dim")
  }

  val labelCentroidsSql: String =
    """WITH x AS (
      |  SELECT label, unnest(range(1, len(embedding) + 1)) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings)
      |SELECT label, dim,
      |       list_reduce(list_sort(list(v)), (p, q) -> p + q) / count(*) AS centroid,
      |       count(*) AS n
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- Johnson–Lindenstrauss random projection ------------------------------

  /** `sim_rp_project`: hash-signed JL projection of the first 50
    * vectors to 16 dims, emitted in LONG FORM (vec_id, j, pval) — the
    * oracle-friendly shape (no array output columns). The projection
    * itself ([[graft.functions.RpProject]]) is scan-local with no
    * matrix state; at scale it runs over the full corpus as a prelude
    * to LSH/IVF/PQ indexing, shrinking index bytes 2–4× with JL-bounded
    * distance distortion (SimilaritySpec asserts the bound).
    */
  def rpProject(spark: SparkSession, dir: String): DataFrame =
    Catalog(spark, dir).ref("embeddings")
      .filter(col("vec_id") < 50)
      .select(col("vec_id"),
        posexplode(graft.functions.RandomProjection.rpProject(col("embedding"), 16)))
      .select(col("vec_id"), col("pos").as("j"), col("col").as("pval"))
      .orderBy("vec_id", "j")

  val rpProjectSql: String =
    """WITH en AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings WHERE vec_id < 50),
      |js AS (SELECT unnest(range(16)) AS j),
      |proj AS (
      |  SELECT vec_id, j,
      |         list_sum(list_transform(range(1, len(vec) + 1),
      |           i -> CASE WHEN md5_number_lower(
      |                  'rp:' || CAST(j AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)) % 2 = 0
      |                THEN vec[i] ELSE -vec[i] END))
      |           / sqrt(CAST(16 AS DOUBLE)) AS pval
      |  FROM en CROSS JOIN js)
      |SELECT vec_id, j, pval FROM proj ORDER BY vec_id, j""".stripMargin

  // ---- int8 scalar quantization ---------------------------------------------

  /** `sim_int8_quantize`: symmetric per-vector max-abs int8 quantization
    * — the 4× storage shrink (float32 → int8 + one scale) that
    * a vector index applies before/instead of PQ. Emitted long-form
    * (vec_id, j, q, scale) for the first 30 vectors; scan-local
    * arithmetic, zero shuffles before the presentation sort.
    *
    * Rounding is pinned to `floor(x + 0.5)` explicitly — ROUND()'s
    * half-away/half-even conventions differ across engines, floor does
    * not. Zero vectors quantize to all-zero codes (scale-0 guard on
    * both sides). Reconstruction error ≤ scale/254 per coordinate by
    * construction (SimilaritySpec asserts it on real embeddings).
    */
  def int8Quantize(spark: SparkSession, dir: String): DataFrame =
    Catalog(spark, dir).ref("embeddings")
      .filter(col("vec_id") < 30)
      .withColumn("scale",
        expr("aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
      .select(col("vec_id"), col("scale"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("j"),
        when(col("scale") === 0.0, lit(0L)).otherwise(
          floor(col("col").cast("double") * 127.0 / col("scale") + 0.5).cast("long"))
          .as("q"),
        col("scale"))
      .orderBy("vec_id", "j")

  val int8QuantizeSql: String =
    """WITH en AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
      |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
      |  FROM embeddings WHERE vec_id < 30)
      |SELECT vec_id, i - 1 AS j,
      |       CASE WHEN scale = 0 THEN 0
      |            ELSE CAST(floor(vec[i] * 127.0 / scale + 0.5) AS BIGINT) END AS q,
      |       scale
      |FROM en, LATERAL (SELECT unnest(range(1, len(vec) + 1)) AS i)
      |ORDER BY vec_id, j""".stripMargin

  // ---- reciprocal-rank fusion -----------------------------------------------

  /** `sim_rrf_fusion`: fuse the exact cosine ranking with the LSH-ANN
    * ranking by reciprocal-rank fusion (Cormack, Clarke & Büttcher,
    * SIGIR 2009 — public): score = Σ 1/(60 + rank) over the lists an
    * item appears in, the standard score-free way to ensemble retrieval
    * systems with incomparable scores (BM25 + vectors, two ANN indexes,
    * …). Plan: the two ranked lists full-outer join on (query, item) —
    * tiny relations, |Q|·k rows each, regardless of corpus size; all
    * corpus-scale work lives in the base rankings. RRF terms are exact
    * double divisions summed in list order, so the DuckDB twin (the two
    * base oracle queries composed as CTEs) hash-matches.
    */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val bf = bruteForceTopK(spark, dir)
      .select(col("query_id"), col("vec_id"), col("rank").as("r1"))
    val lsh = lshAnn(spark, dir)
      .select(col("query_id"), col("vec_id"), col("rank").as("r2"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    bf.join(lsh, Seq("query_id", "vec_id"), "full_outer")
      .select(col("query_id"), col("vec_id"),
        (coalesce(lit(1.0) / (lit(60) + col("r1")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("r2")), lit(0.0))).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("score"))
      .orderBy("query_id", "rnk")
  }

  lazy val rrfFusionSql: String =
    s"""WITH bf AS (SELECT query_id, vec_id, rank FROM ($bruteForceTopKSql)),
       |lshr AS (SELECT query_id, vec_id, rank FROM ($lshAnnSql)),
       |u AS (
       |  SELECT COALESCE(bf.query_id, lshr.query_id) AS query_id,
       |         COALESCE(bf.vec_id, lshr.vec_id) AS vec_id,
       |         COALESCE(1.0 / (60 + bf.rank), 0) + COALESCE(1.0 / (60 + lshr.rank), 0) AS score
       |  FROM bf FULL OUTER JOIN lshr
       |    ON bf.query_id = lshr.query_id AND bf.vec_id = lshr.vec_id),
       |rk AS (
       |  SELECT query_id, vec_id, score,
       |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
       |  FROM u)
       |SELECT query_id, rnk, vec_id, score FROM rk WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_rrf_fusion" -> (rrfFusion _),
    "sim_int8_quantize" -> (int8Quantize _),
    "sim_rp_project" -> (rpProject _),
    "sim_label_centroids" -> (labelCentroids _),
    "sim_semantic_dedup" -> (semanticDedup _),
    "sim_semantic_dedup_probe2" -> (semanticDedupProbe2 _),
    "sim_semantic_dedup_int8" -> (semanticDedupInt8 _),
    "sim_semantic_dedup_int8_probe2" -> (semanticDedupInt8Probe2 _),
    "sim_semantic_dedup_incremental" -> (semanticDedupIncremental _),
    "sim_bruteforce_topk" -> (bruteForceTopK _),
    "sim_lsh_ann" -> (lshAnn _),
    "sim_ivf_ann" -> (Ivf.ivfAnn _),
    "sim_ivf_filtered" -> (Ivf.ivfAnnFiltered _),
    "sim_ivf_incremental" -> (Ivf.ivfIncremental _),
    "sim_ivf_compacted" -> (Ivf.ivfCompacted _),
    "sim_ivf_deleted" -> (Ivf.ivfDeleted _),
    "sim_ivf_retention" -> (Ivf.ivfRetention _),
    "sim_ivf_upserted" -> (Ivf.ivfUpserted _),
    "sim_ivf_filtered_persisted" -> (Ivf.ivfFilteredPersisted _),
    "sim_ivf_asof" -> (Ivf.ivfAsOf _),
    "sim_embedding_neardup" -> (embeddingNearDupPlanted _))

  val oracles: Map[String, String] = Map(
    "sim_rrf_fusion" -> rrfFusionSql,
    "sim_int8_quantize" -> int8QuantizeSql,
    "sim_rp_project" -> rpProjectSql,
    "sim_label_centroids" -> labelCentroidsSql,
    "sim_semantic_dedup" -> semanticDedupSql,
    "sim_semantic_dedup_probe2" -> semanticDedupProbe2Sql,
    "sim_semantic_dedup_int8" -> semanticDedupInt8Sql,
    "sim_semantic_dedup_int8_probe2" -> semanticDedupInt8Probe2Sql,
    "sim_semantic_dedup_incremental" -> semanticDedupIncrementalSql,
    "sim_bruteforce_topk" -> bruteForceTopKSql,
    "sim_lsh_ann" -> lshAnnSql,
    "sim_ivf_ann" -> Ivf.ivfAnnSql,
    "sim_ivf_filtered" -> Ivf.ivfAnnFilteredSql,
    "sim_ivf_incremental" -> Ivf.ivfIncrementalSql,
    "sim_ivf_compacted" -> Ivf.ivfCompactedSql,
    "sim_ivf_deleted" -> Ivf.ivfDeletedSql,
    "sim_ivf_retention" -> Ivf.ivfRetentionSql,
    "sim_ivf_upserted" -> Ivf.ivfUpsertedSql,
    "sim_ivf_filtered_persisted" -> Ivf.ivfFilteredPersistedSql,
    // the pinned snapshot screens the ORIGINAL base — the incremental
    // closed form, through a takedown + upsert wave + compaction
    "sim_ivf_asof" -> Ivf.ivfIncrementalSql,
    "sim_embedding_neardup" -> embeddingNearDupSql)
}
