package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.ArrayExprs

/** IVF (inverted-file) approximate nearest neighbor — the other standard
  * scale path next to LSH (Similarity.lshAnn):
  *
  *  1. a coarse quantizer (k-means, few Lloyd iterations, deterministic
  *     init) partitions the vector space into k cells;
  *  2. every vector is assigned to its nearest cell — pure scan work via
  *     the NearestCentroid expression (the k×dim centroid matrix rides
  *     with the plan; no join, no shuffle);
  *  3. a query probes only its `nprobe` nearest cells, so search reads
  *     ~N·nprobe/k vectors instead of N.
  *
  * At 100 TB the assignment column becomes the table's physical
  * partition key (write-time clustering), and step 3 turns into
  * partition pruning on the parquet scan — the engine shape below is the
  * same, only the storage layout changes. Centroid updates shuffle
  * (cid, pos) partial sums — k·dim rows — regardless of corpus size.
  */
object Ivf extends IndexFamily {

  // ---- IndexFamily hooks: the shared verb choreography parameterized
  // by the IVF encode (cell assignment against the LIVE generation's
  // quantizer) and the cell-partitioned layout -------------------------------
  override protected def cdcContext(token: String): String = s"applyCdc($token)"
  override protected def compactLabel(path: String): String = s"compactIndex($path)"

  override protected def encodeToStage(gen: String, batch: DataFrame,
      stage: String): Unit = {
    val path = java.nio.file.Paths.get(gen).getParent.toString
    encodeBatch(IvfIndex(path, readCentroids(gen)), batch)
      .write.mode("overwrite").partitionBy("cid").parquet(stage)
  }

  override protected def compactSurvivors(spark: SparkSession,
      path: String): DataFrame = indexData(spark, path)

  override protected def writeSurvivorStage(spark: SparkSession,
      survivors: DataFrame, segBase: String): Unit =
    survivors.repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(segBase)

  override protected def writeGenSidecars(spark: SparkSession, stage: String,
      gen: String, hadDeletes: Boolean): Unit = {
    val centroids = readCentroids(gen)
    writeCentroids(stage, centroids)
    // Without deletes the contents are identical, so the drift BASELINE
    // is carried — compaction must not mask quantizer rot. Deletion is
    // the one case where it must NOT be carried: the old baseline
    // weights cells by occupancies that include the dropped rows, so it
    // is recomputed over the survivors.
    if (hadDeletes)
      writeCellStats(stage, cellStatsOf(spark, s"$stage/seg=base", centroids))
    else writeCellStats(stage, readCellStats(gen))
  }

  override protected def afterCommit(path: String): Unit =
    indexCache.evict(_._1 == path)

  /** Lloyd k-means for the coarse quantizer, trained driver-side on a
    * bounded deterministic sample — the standard IVF shape (FAISS trains
    * its quantizer on a sample too): at 100 TB a full-corpus Lloyd pass
    * per iteration buys nothing for a 16..4096-cell quantizer, while a
    * 64·k-vector sample fits any driver and iterates in microseconds.
    * The full corpus is touched exactly once afterwards, by the
    * distributed assignment scan.
    *
    * Deterministic AND engine-portable: sample = top `64·k` vec_ids by
    * (md5_number_lower(vec_id) mod 1000003) order (a seeded
    * pseudo-random draw the DuckDB oracle can reproduce, planned as
    * TakeOrderedAndProject — no sort shuffle), init = first k sample
    * vectors, fixed iteration count, no RNG.
    */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): Seq[Array[Float]] = {
    val sampleSize = math.max(64 * k, 1024)
    val sample: Array[Array[Float]] = emb
      .orderBy(ArrayExprs.md5Mod(col("vec_id").cast("string"), 1000003L), col("vec_id"))
      .limit(sampleSize)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    // If the table has fewer vectors than requested cells, the effective
    // k shrinks to the available count (every vector its own cell).
    // Array end to end: Seq.tabulate would build a List and turn both
    // the Lloyd loop's and NearestCentroid's centroid indexing into
    // O(cid) walks (the Pq.trainCodebooks lesson)
    var centroids: Array[Array[Float]] = sample.take(k)
    val dim = centroids.head.length
    val kEff = centroids.length
    for (_ <- 0 until iters) {
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      sample.foreach { v =>
        val cid = nearestLocal(v, centroids)
        val s = sums(cid)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(cid) += 1
      }
      centroids = Array.tabulate(kEff) { cid =>
        if (counts(cid) == 0) centroids(cid) // keep empty cells
        else {
          val c = new Array[Float](dim)
          var i = 0
          while (i < dim) { c(i) = (sums(cid)(i) / counts(cid)).toFloat; i += 1 }
          c
        }
      }
    }
    centroids.toIndexedSeq
  }

  /** Same ranking as ArrayExprs.NearestCentroid: argmax of dot/|c|.
    * private[ops]: Pq's residual encoder assigns its driver-side sample
    * with the identical ranking.
    */
  private[ops] def nearestLocal(v: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0
    var bestScore = Double.NegativeInfinity
    var cid = 0
    while (cid < cs.length) {
      val c = cs(cid)
      var dot = 0.0
      var nrm = 0.0
      var i = 0
      while (i < c.length) { dot += v(i).toDouble * c(i); nrm += c(i).toDouble * c(i); i += 1 }
      val score = if (nrm == 0) Double.NegativeInfinity else dot / math.sqrt(nrm)
      if (score > bestScore) { bestScore = score; best = cid }
      cid += 1
    }
    best
  }

  /** The registered `sim_ivf_ann` query runs the quantizer with
    * `iters = 0` — cells are the first 16 sample vectors verbatim. That
    * keeps every arithmetic step (sample order, cell assignment, probe
    * ranking, candidate scoring) expressible in DuckDB SQL, so the
    * driver hash-checks the IVF OPERATOR end-to-end; Lloyd refinement
    * (`iters > 0`) only changes quantizer quality, is covered by
    * IvfSpec's recall assertions, and remains the recommended setting
    * for a real corpus.
    */
  def ivfAnn(spark: SparkSession, dir: String): DataFrame =
    ivfAnnAt(spark, dir, nQueries = 5, k = 10, kCells = 16, nprobe = 4, iters = 0)

  def ivfAnnAt(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      kCells: Int, nprobe: Int, iters: Int): DataFrame =
    ivfAnnCore(spark, dir, nQueries, k, kCells, nprobe, iters, labelEq = None)

  /** Filtered vector search — the production composition every vector
    * store exposes (Qdrant/Vespa/Milvus "pre-filtered search"): top-k
    * among the vectors satisfying a METADATA predicate (here the
    * index-resident `label` column — tenant, class, language). The
    * predicate applies to the CANDIDATE side inside the probed cells,
    * before ranking: on the persisted cell-partitioned index this is a
    * data filter UNDER the cid partition filter, i.e. it reaches the
    * parquet scan and prunes candidate bytes, never a post-rank
    * re-filter (which would return < k silently whenever the filter
    * and the top-k overlap poorly). Queries are NOT filtered — a query
    * from any tenant may search label-L space.
    *
    * The registered query widens `nprobe` 4 → 8: with a ~10%-selective
    * predicate each probed cell yields ~10× fewer candidates, so a
    * filtered search probes more cells to keep the candidate pool at
    * the unfiltered query's size — the dial a store turns with
    * predicate selectivity.
    */
  def ivfAnnFiltered(spark: SparkSession, dir: String): DataFrame =
    ivfAnnFilteredAt(spark, dir, nQueries = 5, k = 10, kCells = 16,
      nprobe = 8, iters = 0, label = 3)

  def ivfAnnFilteredAt(spark: SparkSession, dir: String, nQueries: Int,
      k: Int, kCells: Int, nprobe: Int, iters: Int, label: Int): DataFrame =
    ivfAnnCore(spark, dir, nQueries, k, kCells, nprobe, iters, Some(label))

  private def ivfAnnCore(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      kCells: Int, nprobe: Int, iters: Int, labelEq: Option[Int]): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings")
      .select(col("vec_id") +: col("embedding") +:
        Similarity.l2norm(col("embedding")).as("nrm") +:
        labelEq.map(_ => col("label")).toSeq: _*)
    val centroids = kmeansCentroids(emb, kCells, iters)

    // One scan assigns every vector to its cell (zero shuffle).
    val assigned = emb
      .withColumn("cid", ArrayExprs.nearestCentroid(col("embedding"), centroids))
      .localCheckpoint() // stands in for the cell-partitioned table at scale

    // Probe list: nprobe nearest cells per query (queries × k rows — tiny).
    import spark.implicits._
    val centDf = centroids.zipWithIndex.map { case (v, i) => (i, v) }.toDF("cid", "cent")
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"), col("nrm").as("qnrm"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cscore").desc, col("cid"))
    val probes = queries.crossJoin(broadcast(centDf))
      // same ranking as NearestCentroid: dot / |centroid| (query norm is
      // constant within a query and cannot change the argsort)
      .withColumn("cscore",
        Similarity.dot(col("qvec"), col("cent")) / Similarity.l2norm(col("cent")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("qnrm"), col("cid"))

    // Search only the probed cells; exact cosine rank within candidates.
    // The metadata predicate (if any) lands on the candidate relation
    // BEFORE the probe join — on the persisted index this is the scan's
    // data filter under the cid partition filter.
    val cands = labelEq match {
      case Some(l) => assigned.filter(col("label") === l)
      case None => assigned
    }
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    cands.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        Similarity.dot(col("qvec"), col("embedding")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** Measured recall@k of the IVF probe against the exact brute-force
    * top-k over the same queries — the evidence an ANN user sets
    * `nprobe` with. Recall is |IVF∩exact| / |exact| over all (query,
    * neighbor) rows. Properties a correct probe must show (IvfSpec pins
    * them; the 8× ScaleProbe records the dial table in SCALE.md):
    * recall is non-decreasing in nprobe, and at nprobe = kCells the
    * probe covers every cell, so IVF scores the full corpus with the
    * exact ranking — recall is exactly 1.0, not approximately.
    */
  def recallAtK(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      kCells: Int, nprobe: Int, iters: Int): Double = {
    val truth = Similarity.bruteForceTopKAt(spark, dir, nQueries, k)
      .select(col("query_id"), col("vec_id")).localCheckpoint()
    val got = ivfAnnAt(spark, dir, nQueries, k, kCells, nprobe, iters)
      .select(col("query_id"), col("vec_id"))
    val denom = truth.count()
    val hit = truth.join(got, Seq("query_id", "vec_id")).count()
    if (denom == 0) 1.0 else hit.toDouble / denom.toDouble
  }

  /** Incremental ANN screening — the `dedup_incremental` shape for
    * vectors: the ALREADY-INDEXED base corpus is persisted ONCE as a
    * cell-partitioned parquet table (centroids + assignments — the IVF
    * index as a real table), and a NEW embedding batch (every 10th
    * vec_id — "the batch that just landed") is screened against it
    * WITHOUT rescanning the base:
    *
    *   - per-batch work is O(Δ): the delta's cell assignment and probe
    *     ranking are scan work over the batch only;
    *   - the base is read through its partition layout: the probed cell
    *     ids (≤ kCells, a bounded driver list) become a PartitionFilters
    *     predicate on the index scan, so only ~nprobe/kCells of the
    *     index's bytes are touched — at 100 TB this is literally
    *     partition pruning on the index table, no shuffle of the base.
    *
    * Output: top-k base neighbors per batch vector, exact cosine within
    * probed cells — the candidate set a dedup/link step consumes.
    */
  // ---- persisted-index API ----------------------------------------------------
  /** Handle to a persisted IVF index: the index ROOT (a directory of
    * generations behind an atomically-replaced live pointer — the
    * [[graft.util.IndexMaint]] commit protocol) plus its quantizer
    * centroids. Centroids live in an underscore-prefixed sidecar inside
    * the generation (parquet discovery ignores it), so a later session —
    * or a later batch — screens against the index via [[loadIndex]]
    * without retraining or rescanning the base corpus.
    */
  final case class IvfIndex(path: String, centroids: Seq[Array[Float]])

  private val CentroidSidecar = "_ivf_centroids.txt"

  /** private[ops]: the residual IVF-PQ index ([[Pq.IvfPqIndex]]) persists
    * its coarse quantizer with the same sidecar.
    */
  private[ops] def writeCentroids(genDir: String, cs: Seq[Array[Float]]): Unit = {
    val body = cs.map(_.mkString(",")).mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(genDir, CentroidSidecar),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private[ops] def readCentroids(genDir: String): Seq[Array[Float]] = {
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(genDir, CentroidSidecar)),
      java.nio.charset.StandardCharsets.UTF_8)
    body.split("\n").toSeq.map(_.split(",").map(_.toFloat))
  }

  /** The index's live data as a DataFrame — resolves the live
    * generation once and reads it, MINUS its tombstoned ids (every
    * screen honors deletes through this one read; the filter folds to a
    * hash-set probe inside the scan stage while the set is bounded).
    * Reader contract: the resolved generation survives ONE subsequent
    * rebalance (the commit keeps the predecessor generation), so an
    * in-flight query never observes a half-swapped directory; only a
    * handle held across TWO rebalances loses its files. Carries
    * partition columns `seg` (commit unit) and `cid` (cell) — filters
    * on `cid` still prune partitions.
    */
  def indexData(spark: SparkSession, path: String): DataFrame = {
    val gen = graft.util.IndexMaint.liveGen(path)
    graft.util.IndexMaint.minusTombstones(spark.read.parquet(gen), gen)
  }

  /** Build the persisted index for a `(vec_id, embedding, …metadata)`
    * base relation: train the quantizer, assign every vector in one
    * scan, stage cell-partitioned parquet + sidecars as a complete
    * generation, commit with one atomic pointer flip (any previously
    * committed generations — and their applied tokens — are
    * superseded: a rebuild from source by definition re-lands
    * everything). Columns beyond (vec_id, embedding) ride into the
    * index verbatim — the metadata a FILTERED search predicates on
    * (tenant, label, language) lives next to the vectors, so the
    * filter reaches the index scan under the cid partition filter.
    * Appends should carry the same metadata columns (a missing column
    * reads as null on the unioned generations). The production
    * pipeline calls this ONCE when the base corpus lands.
    */
  def buildIndex(base: DataFrame, path: String, kCells: Int, iters: Int,
      buildKey: Option[String] = None): IvfIndex =
    graft.util.IndexMaint.withMutation(path, op = "build") {
      val centroids = kmeansCentroids(base, kCells, iters)
      val stage = graft.util.IndexMaint.newStageDir(path, "build")
      encodeBatch(IvfIndex(path, centroids), base)
        .write.mode("overwrite").partitionBy("cid").parquet(s"$stage/seg=base")
      writeCentroids(stage, centroids)
      // Build-time per-cell stats ride a second sidecar: the reference
      // frame [[driftStats]] later compares drifted contents against.
      writeCellStats(stage,
        cellStatsOf(base.sparkSession, s"$stage/seg=base", centroids))
      // provenance sidecar ([[buildIndexCached]] supplies it): lets a
      // later cached-build miss reopen this generation instead of
      // retraining and rewriting it
      buildKey.foreach(graft.util.IndexMaint.writeBuildKey(stage, _))
      graft.util.IndexMaint.commitGeneration(path, stage)
      IvfIndex(path, centroids)
    }

  /** Reopen an existing index without touching its data files. No
    * recovery dance: generation commits are a single atomic pointer
    * flip, so the live generation is always complete — a crash
    * mid-build/rebalance leaves the previous generation live and only
    * invisible stage garbage (reaped by the next mutation).
    */
  def loadIndex(path: String): IvfIndex =
    graft.util.IndexMaint.lockFor(path).synchronized {
      IvfIndex(path, readCentroids(graft.util.IndexMaint.liveGen(path)))
    }

  /** Pin the live vector state under `label`
    * ([[graft.util.IndexMaint.pinLive]]): generation + segment set +
    * tombstone pairs. The quantizer needs no manifest entry — centroids
    * are a generation sidecar, and nothing retrains in place (a
    * drift-triggered rebalance commits a NEW generation, which the pin
    * protects the old one from reaping through). An existing label
    * refuses loudly ([[graft.util.IndexMaint.pinLive]]);
    * [[pinIndexIfAbsent]] is the replay-safe first-pin-wins form.
    */
  def pinIndex(path: String, label: String): Unit = {
    graft.util.IndexMaint.pinLive(path, label)
    ()
  }

  /** First-pin-wins [[pinIndex]] — replayed pipelines keep their first
    * snapshot ([[graft.util.IndexMaint.pinLiveIfAbsent]]).
    */
  def pinIndexIfAbsent(path: String, label: String): Unit = {
    graft.util.IndexMaint.pinLiveIfAbsent(path, label)
    ()
  }

  /** Materialize the snapshot pinned as `label` into `destRoot` as a
    * STANDALONE IVF index ([[graft.util.IndexMaint.exportSnapshot]]):
    * live [[screenBatch]] reads of the export ≡ [[screenBatchAsOf]]
    * against the pin. No fixup needed — every IVF root sidecar
    * (centroids, drift baseline, derivation keys) is immutable within
    * a generation, so the carried copies ARE the pin-time values.
    */
  def exportIndexSnapshot(path: String, label: String, destRoot: String): String =
    graft.util.IndexMaint.exportSnapshot(path, label, destRoot)

  /** [[screenBatch]] against the snapshot pinned as `label` —
    * bit-identical to a screen at pin time, whatever appends, upserts,
    * deletes, compactions or rebalances have happened since: probes run
    * against the PINNED centroids, candidates come from the manifest's
    * segment set minus its tombstone-pair copy, and the probed-cid
    * partition pruning applies unchanged (cells are partition dirs of
    * the pinned generation).
    */
  def screenBatchAsOf(spark: SparkSession, path: String, label: String,
      delta: DataFrame, k: Int, nprobe: Int,
      queryIsDouble: Boolean = false): DataFrame = {
    val snap = graft.util.IndexMaint.readSnapshot(path, label).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot pinned as '$label' under $path"))
    val genDir = graft.util.IndexMaint.snapshotGenDir(path, snap)
    screenBatchSnapshot(spark, genDir, snap, delta, k, nprobe,
      queryIsDouble)
  }

  /** The snapshot screen against an ALREADY-RESOLVED (genDir, manifest)
    * pair — what a composition that also reads the manifest itself
    * (the as-of hybrid page) calls, so the label resolves ONCE and
    * every stage observes the same outcome.
    */
  private[ops] def screenBatchSnapshot(spark: SparkSession, genDir: String,
      snap: graft.util.IndexMaint.Snapshot, delta: DataFrame, k: Int,
      nprobe: Int, queryIsDouble: Boolean): DataFrame =
    screenBatchProbedOver(spark, readCentroids(genDir),
      cids => snapshotData(spark, genDir, snap)
        .filter(col("cid").isin(cids: _*)),
      delta, k, nprobe, candFilter = None, queryIsDouble = queryIsDouble)._1

  /** [[screenBatchDouble]] against the pinned snapshot — the hybrid
    * stack's PRF-centroid screen served as-of.
    */
  def screenBatchDoubleAsOf(spark: SparkSession, path: String,
      label: String, delta: DataFrame, k: Int, nprobe: Int): DataFrame =
    screenBatchAsOf(spark, path, label, delta, k, nprobe,
      queryIsDouble = true)

  /** The manifest's view of a pinned generation: its segment set minus
    * its tombstone-pair copy — the snapshot analog of [[indexData]].
    */
  private[ops] def snapshotData(spark: SparkSession, genDir: String,
      snap: graft.util.IndexMaint.Snapshot): DataFrame =
    graft.util.IndexMaint.snapshotView(spark, genDir, snap, idCol = "vec_id")

  /** Registered `sim_ivf_asof`: snapshot-isolated vector serving — pin
    * the freshly-built index, hit it with a takedown, a donor-embedding
    * upsert wave and a compaction rewrite, then screen AS OF the pin.
    * The oracle is [[ivfIncrementalSql]] — the closed form over the
    * ORIGINAL base corpus — so hash equality proves the manifest hides
    * every later mutation and the pinned generation survived the
    * rewrite's reap. Replays no-op on the tombstone union, the upsert
    * token and the idempotent pin.
    */
  def ivfAsOf(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings").select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val path = graft.util.Fs.sessionTempDir("ivf_index_asof", dir)
    val index = buildIndexCached(base, s"$dir/embeddings.parquet", path,
      kCells = 16, iters = 0)
    pinIndexIfAbsent(path, "pre")
    // the whole post-pin wave is one-shot per (path, source): the
    // mutations are already replay-idempotent (set-union tombstones,
    // the upsert token), but a bench replay used to re-pay the doomed
    // collect AND a full compaction rewrite of identical survivors —
    // sweepOnce (the deleteWhereCached rationale) skips to the
    // steady-state serve once the keyed compaction is durable
    graft.util.IndexMaint.sweepOnce(path, s"$dir/embeddings.parquet",
      "wave|asofq") {
      val doomed = base.filter(col("vec_id") % 7 === 3)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
      deleteIds(index, doomed)
      val donor = emb.select(col("vec_id").as("did"), col("embedding").as("demb"))
      val wave = base.filter(col("vec_id") % 9 === 4)
        .join(donor, col("did") === col("vec_id") + 1)
        .select(col("vec_id"), col("demb").as("embedding"))
      upsertBatchIdempotent(loadIndex(path), wave, "asofq:ups")
      compactIndex(spark, loadIndex(path), Some("wave|asofq"))
      ()
    }
    screenBatchAsOf(spark, path, "pre",
      emb.filter(col("vec_id") % 10 === 0), k = 5, nprobe = 4)
  }

  // ---- idempotent append (streaming at-least-once replay) -------------------

  /** Tokens of batches already folded into the index (bounded: one
    * committed segment or consolidated line per applied batch).
    */
  def appliedTokens(index: IvfIndex): Set[String] =
    graft.util.IndexMaint.appliedTokens(graft.util.IndexMaint.liveGen(index.path))

  /** [[appendBatch]] guarded by a per-batch token so an at-least-once
    * replay (streaming checkpoint replays the last uncommitted batch on
    * restart) does NOT re-append the same vectors: if `token` is
    * already applied the call is a no-op and returns false. The encoded
    * batch and its token are staged together and committed by ONE
    * atomic segment rename ([[graft.util.IndexMaint.commitSegment]]) —
    * a crash at any point leaves either an invisible stage (the replay
    * re-runs and commits once) or the fully-committed segment with its
    * token (the replay is detected); there is no applied-but-unrecorded
    * state. [[rebalance]] carries applied tokens into the new
    * generation, so batches already re-encoded stay deduplicated across
    * generations.
    */
  def appendBatchIdempotent(index: IvfIndex, batch: DataFrame, token: String): Boolean =
    appendSegment(index.path, batch, token)

  /** Delete ids from the index — the takedown/GDPR path every 100 TB
    * corpus index needs and the engine's tracking-table delete-matching-
    * keys analog (reference tracking_table_materialization.sql:34).
    * LOGICAL delete now (ids land in the generation's tombstone sidecar
    * under the mutation lease, atomically replaced — bounded metadata),
    * PHYSICAL reclamation at the next [[compactIndex]]/[[rebalance]].
    * Every read honors the set immediately ([[indexData]]); replaying a
    * delete is structurally idempotent (set union); appending a deleted
    * id afterwards re-inserts it (later insert wins). Returns the
    * tombstone-set size after the union — the dial a maintenance job
    * compacts on.
    */
  def deleteIds(index: IvfIndex, ids: Seq[Long]): Int =
    deleteIdsCore(org.apache.spark.sql.SparkSession.active, index.path, ids)

  /** Delete-then-insert in ONE leased mutation — the reference's
    * tracking-table upsert semantics (`incremental_upsert`: delete
    * matching keys, insert the batch) on the vector index, for the most
    * common production mutation: re-embedded documents. The batch's ids
    * are tombstoned across the segments present NOW, then the batch
    * commits as a new segment that postdates the delete — so the new
    * vectors win structurally. Token-guarded end to end: a replayed
    * upsert no-ops entirely (the tombstones it would re-add are already
    * set-union no-ops, and the segment's token is detected first).
    *
    * Crash ordering matters and is deliberate: tombstones land BEFORE
    * the segment commit. The only torn state — ids hidden, new rows not
    * yet visible — is exactly what the at-least-once retry heals,
    * because the token only becomes visible with the segment commit, so
    * the retry re-runs both halves. The reverse order would record the
    * token first and leave permanent duplicates. The id list is driver
    * metadata (one upsert batch's keys — the tombstone contract).
    */
  def upsertBatchIdempotent(index: IvfIndex, batch: DataFrame, token: String): Boolean =
    upsertSegment(index.path, batch, token)

  /** The CDC verbs [[applyCdcIdempotent]] accepts — see
    * [[graft.util.IndexMaint.CdcOps]] (shared by every family).
    */
  val CdcOps: Set[String] = graft.util.IndexMaint.CdcOps

  /** Apply one CDC micro-batch — rows tagged by an `op` column with a
    * [[CdcOps]] verb — as ONE leased, token-guarded mutation: the
    * delete+upsert ids are tombstoned across the segments present now,
    * then the insert+upsert rows commit as one new segment carrying
    * the token ([[upsertBatchIdempotent]]'s crash ordering: tombstones
    * BEFORE the segment commit, so the at-least-once retry heals the
    * only torn state). `insert` rows skip the tombstone write — the
    * producer is asserting the id is new, so the delete probe would be
    * wasted metadata churn at takedown-sidecar scale. A producer that
    * violates that contract (insert for an existing id) creates a
    * duplicate that [[compactIndex]] detects and fails loudly on
    * ([[graft.util.IndexMaint.requireUniqueIds]], remedy: `upsert`).
    *
    * A PURE-DELETE batch still commits a (zero-row) segment: the token
    * must become durable, because a replayed delete re-tombstones
    * against the segments present AT REPLAY TIME — which may include a
    * later batch's legitimate re-insert of the same id. Token-first
    * detection makes the replay a structural no-op instead.
    */
  def applyCdcIdempotent(index: IvfIndex, batch: DataFrame, token: String): Boolean =
    cdcSegment(index.path, batch, token)

  /** [[buildIndex]] memoized per (path, source fingerprint, kCells,
    * iters) for the session — the [[BpeTrain.trainedMerges]] pattern:
    * the build is deterministic, so one derivation serves every
    * consumer in the JVM (repeated bench passes, the batch and
    * streaming screens), and the filesystem fingerprint of the source
    * directory invalidates the memo if the data is rewritten in place.
    * Production holds the [[IvfIndex]] handle (or [[loadIndex]]s it);
    * this keeps the harness's rebuild-per-invocation contract honest
    * without paying the build on every call.
    *
    * A memo MISS must never mutate a durable index: the build key is
    * persisted as a generation sidecar, so a miss whose key matches the
    * LIVE generation's (same source fingerprint, same shape — the index
    * on disk IS the one this call would build, plus whatever
    * token-guarded mutations its owner applied since, exactly what a
    * memo HIT would serve) REOPENS it for the cost of two sidecar
    * reads. Rebuild happens ONLY on true staleness — a rewritten
    * source, a different shape, or a pre-sidecar generation that cannot
    * prove reuse. Caller contract (unchanged from the memo alone):
    * `base` must be a pure function of the data under `srcDir`, since
    * both the memo and the sidecar key identify the build by
    * (fingerprint, shape), never by the frame.
    */
  def buildIndexCached(base: DataFrame, srcDir: String, path: String,
      kCells: Int, iters: Int): IvfIndex = {
    val fp = graft.util.Fs.dirFingerprint(srcDir)
    val key = (path, fp, kCells, iters)
    val diskKey = s"ivf|src=$fp|kCells=$kCells|iters=$iters"
    indexCache.memoized(key, graft.util.IndexMaint.lockFor(path))(
      k => k._1 == path && k != key) {
      if (graft.util.IndexMaint.liveGenOpt(path)
        .exists(g => graft.util.IndexMaint.readBuildKey(g).contains(diskKey)))
        loadIndex(path)
      else buildIndex(base, path, kCells, iters, Some(diskKey))
    }
  }

  private[ops] def indexCacheSnapshot: Seq[(String, Long, Int, Int)] =
    indexCache.keys

  /** Test hook: force the next [[buildIndexCached]] call for `path` to
    * take the miss path (what LRU pressure or a session restart does).
    */
  private[ops] def dropBuildMemo(path: String): Unit =
    indexCache.evict(_._1 == path)

  /** Session handle-cache bound, sized to the serving working set (the
    * registered-query suite alone touches 12 distinct IVF paths; 8 made
    * every access a miss). With the build-key sidecar a miss is a cheap
    * read-only reopen either way — the bound only trades sidecar reads,
    * never rebuilds.
    */
  private[ops] val IndexCacheBound = 32

  private val indexCache =
    new graft.util.BoundedCache[(String, Long, Int, Int), IvfIndex](IndexCacheBound)
  /** One-scan encode: (vec_id, embedding, nrm, …metadata, cid). Extra
    * input columns pass through — the filtered-search metadata contract.
    */
  private def encodeBatch(index: IvfIndex, batch: DataFrame): DataFrame = {
    val extras = batch.columns.toIndexedSeq
      .filter(c => c != "vec_id" && c != "embedding").map(col)
    batch
      .select(col("vec_id") +: col("embedding") +:
        Similarity.l2norm(col("embedding")).as("nrm") +: extras: _*)
      .withColumn("cid", ArrayExprs.nearestCentroid(col("embedding"), index.centroids))
  }

  /** Fold a new `(vec_id, embedding)` batch INTO the index: assign
    * against the frozen quantizer (pure scan work over the batch) and
    * commit an anonymous segment into the live generation — O(Δ) end to
    * end, existing data files are never rewritten. No replay token:
    * callers that can be replayed use [[appendBatchIdempotent]].
    */
  def appendBatch(index: IvfIndex, batch: DataFrame): Unit =
    appendAnonSegment(index.path, batch)

  /** Compact the live generation WITHOUT retraining: the O(N)-rewrite /
    * O(1)-semantics maintenance op between rebalances. The append-only
    * path accrues one file set per committed batch per cell, so after B
    * appends a probed cell costs B file opens (and B footer reads) —
    * at 100 TB with minute-level streaming batches that is thousands of
    * small files per cell within a day, and open-cost starts to rival
    * scan cost. Compaction re-lands the SAME rows (same quantizer, same
    * assignments — `cid` is carried, never recomputed) as ONE
    * cell-partitioned segment with one file per cell (`repartition` on
    * cid; a skewed mega-cell would use the (cid, salt) split the
    * SemDeDup path derives), carries the centroid + cell-stat sidecars
    * and every applied token verbatim, and commits atomically — so
    * replay detection, drift baselines and screen results are all
    * byte-identical before and after (IvfSpec + the `sim_ivf_compacted`
    * oracle row prove it; ScaleProbe records the file-count collapse).
    */
  def compactIndex(spark: SparkSession, index: IvfIndex,
      sweepKey: Option[String] = None): IvfIndex =
    compactCore(spark, index, doomed = None, sweepKey)

  /** One size-tiered merge step ([[IndexFamily.mergeSmallSegments]]):
    * coalesce same-tier small append segments, hard-link the rest —
    * bytes rewritten per stream batch stay O(log batches) amortized,
    * vs the (B/c)·|index| a [[compactIndex]]-every-c-batches cadence
    * pays. The handle stays valid: quantizer and drift baseline carry
    * verbatim (live content is unchanged).
    */
  def mergeSegments(spark: SparkSession, index: IvfIndex,
      policy: MergePolicy = MergePolicy()): Option[MergeReport] =
    mergeSmallSegments(spark, index.path, policy)

  /** Bulk delete by predicate — the retention/TTL path. A mass removal
    * (drop a source, an age stratum, a whole month) would blow the
    * bounded-metadata tombstone contract — millions of (seg, id) pairs
    * in a driver-side sidecar slowing every screen's anti-join — so it
    * is instead ONE filtered compaction: survivors rewritten as a
    * fresh generation with the predicate applied scan-side, the drift
    * baseline recomputed over survivors, any prior tombstones subsumed
    * by the rewrite, applied tokens carried. The complement of
    * [[deleteIds]]: tombstones for bounded takedown lists, a rewrite
    * for corpus-scale strata — both end in the same generation
    * protocol, so readers never see a half-applied delete.
    */
  def deleteWhere(spark: SparkSession, index: IvfIndex,
      doomed: org.apache.spark.sql.Column,
      sweepKey: Option[String] = None): IvfIndex =
    compactCore(spark, index, Some(doomed), sweepKey)

  private def compactCore(spark: SparkSession, index: IvfIndex,
      doomed: Option[org.apache.spark.sql.Column],
      sweepKey: Option[String] = None): IvfIndex = {
    // the shared skeleton: indexData subtracts the tombstone set, so
    // compaction IS the physical reclamation — deleted rows are dropped
    // from the rewrite and the new generation carries no tombstone
    // sidecar; metadata columns (filtered search) ride through the star
    // projection
    val committed = compactGeneration(spark, index.path, doomed, sweepKey)
    IvfIndex(index.path, readCentroids(committed))
  }

  // ---- index maintenance: drift detection + rebalance -----------------------

  /** Per-cell occupancy and mean cosine-to-own-centroid — the bounded
    * (k rows) health summary of an index's contents.
    */
  final case class CellStats(cid: Int, n: Long, meanCos: Double)

  /** Build-time vs current cell stats. The two dials a maintenance job
    * alerts on:
    *  - `skew` (max/mean cell occupancy): read amplification — a probed
    *    hot cell costs its occupancy in bytes, so a quantizer whose
    *    cells ballooned is an index degenerating toward a full scan;
    *  - `meanCos` (occupancy-weighted mean cosine of vectors to their
    *    own centroid): quantizer fit — appended batches from a shifted
    *    distribution sit far from every frozen centroid, splitting true
    *    neighbor sets across cell boundaries (the recall cliff
    *    ScaleProbe measures).
    */
  final case class DriftReport(build: Seq[CellStats], now: Seq[CellStats]) {
    private def skewOf(s: Seq[CellStats]): Double =
      if (s.isEmpty) Double.NaN
      else s.map(_.n).max.toDouble * s.length / math.max(1L, s.map(_.n).sum)
    private def meanOf(s: Seq[CellStats]): Double =
      if (s.isEmpty) Double.NaN
      else s.map(c => c.meanCos * c.n).sum / math.max(1L, s.map(_.n).sum)
    def skewBuild: Double = skewOf(build)
    def skewNow: Double = skewOf(now)
    def meanCosBuild: Double = meanOf(build)
    def meanCosNow: Double = meanOf(now)
    /** Rebalance trigger: quantizer fit dropped or occupancy skew grew. */
    def drifted(cosDrop: Double = 0.05, skewGrowth: Double = 2.0): Boolean =
      meanCosNow < meanCosBuild - cosDrop || skewNow > skewBuild * skewGrowth
  }

  private val CellStatsSidecar = "_ivf_cellstats.txt"

  private def writeCellStats(genDir: String, stats: Seq[CellStats]): Unit = {
    val body = stats.map(s => s"${s.cid},${s.n},${s.meanCos}").mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(genDir, CellStatsSidecar),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def readCellStats(genDir: String): Seq[CellStats] = {
    val p = java.nio.file.Paths.get(genDir, CellStatsSidecar)
    if (!java.nio.file.Files.exists(p)) return Nil
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty).map { line =>
        val f = line.split(",")
        CellStats(f(0).toInt, f(1).toLong, f(2).toDouble)
      }
  }

  /** Current per-cell stats over `dataDir` (a generation or a staged
    * one): ONE scan into a k-row aggregate (the centroid matrix
    * broadcast-joins by cid; no data shuffle beyond the k-row rollup).
    */
  private def cellStatsOf(spark: SparkSession, dataDir: String,
      centroids: Seq[Array[Float]]): Seq[CellStats] =
    cellStatsOver(spark, spark.read.parquet(dataDir), centroids)

  private def cellStatsOver(spark: SparkSession, data: DataFrame,
      centroids: Seq[Array[Float]]): Seq[CellStats] = {
    import spark.implicits._
    val centDf = centroids.zipWithIndex.map { case (v, i) =>
      var s = 0.0; var j = 0
      while (j < v.length) { s += v(j).toDouble * v(j).toDouble; j += 1 }
      (i, v, math.sqrt(s))
    }.toDF("cid", "cent", "cnrm")
    data
      .join(broadcast(centDf), Seq("cid"))
      .select(col("cid"),
        when(col("cnrm") === 0.0 || col("nrm") === 0.0, lit(0.0))
          .otherwise(Similarity.dot(col("embedding"), col("cent"))
            / (col("nrm") * col("cnrm"))).as("cos"))
      .groupBy("cid").agg(count(lit(1)).as("n"), avg("cos").as("mc"))
      .collect().map(r => CellStats(r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_.cid).toSeq
  }

  /** Invocation counter for [[driftStats]] — the instrumentation the
    * ingest-loop amortization spec counts index scans with.
    */
  private[graft] val driftScans = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Measure drift: the index's CURRENT per-cell stats against the
    * build-time sidecar. O(index scan) work, k rows of metadata out.
    * Run it per append WAVE, not per micro-batch: the scan is O(index),
    * so an ingest loop amortizes it (see IvfIngest's `checkEvery`).
    * Reader-safe against a concurrent rebalance: the generation is
    * resolved once and survives one subsequent commit (the
    * [[indexData]] contract).
    */
  def driftStats(spark: SparkSession, index: IvfIndex): DriftReport = {
    driftScans.incrementAndGet()
    val gen = graft.util.IndexMaint.liveGen(index.path)
    // live contents only: tombstoned rows are no longer served, so they
    // must not count toward occupancy skew or fit either
    DriftReport(build = readCellStats(gen),
      now = cellStatsOver(spark, indexData(spark, index.path), index.centroids))
  }

  /** Retrain the quantizer from a fresh bounded sample of the index's
    * CURRENT contents (same cell count), remap every vector in one
    * scan into a STAGED new generation (data + sidecars + carried
    * applied tokens), then commit with one atomic pointer flip — the
    * periodic O(N) maintenance op that restores the recall and
    * occupancy the append-only path erodes. The previous generation is
    * kept until the NEXT commit, so concurrent readers survive this
    * one. Readers holding the old handle must [[loadIndex]] again —
    * the session memo for this path is invalidated.
    */
  def rebalance(spark: SparkSession, index: IvfIndex, iters: Int = 2): IvfIndex =
    // same per-path monitor as buildIndexCached: a concurrent cached
    // build must not interleave with the generation commit
    graft.util.IndexMaint.withMutation(index.path, op = "rebalance") {
      rebalanceLocked(spark, index, iters)
    }

  private def rebalanceLocked(spark: SparkSession, index: IvfIndex, iters: Int): IvfIndex = {
    val gen = graft.util.IndexMaint.liveGen(index.path)
    // survivors only: a rebalance re-lands everything, so it is the
    // other physical reclamation point for tombstoned rows (the new
    // generation carries no tombstone sidecar); metadata columns ride
    // through the re-encode
    val data = indexData(spark, index.path).drop("seg", "nrm", "cid")
    val centroids = kmeansCentroids(data, index.centroids.size, iters)
    val stage = graft.util.IndexMaint.newStageDir(index.path, "rebalance")
    encodeBatch(IvfIndex(index.path, centroids), data)
      .write.mode("overwrite").partitionBy("cid").parquet(s"$stage/seg=base")
    writeCentroids(stage, centroids)
    writeCellStats(stage, cellStatsOf(spark, s"$stage/seg=base", centroids))
    graft.util.IndexMaint.writeConsolidatedTokens(stage,
      graft.util.IndexMaint.appliedTokens(gen))
    // carried: the rebalanced index still derives from the same
    // (source, shape) build — a later cached-build miss reopens the
    // REPAIRED quantizer (read from the live sidecars) rather than
    // undoing the drift repair with a from-source rebuild
    graft.util.IndexMaint.carryDerivationKeys(gen, stage)
    graft.util.IndexMaint.commitGeneration(index.path, stage)
    indexCache.evict(_._1 == index.path)
    IvfIndex(index.path, centroids)
  }

  /** Screen a `(vec_id, embedding)` delta batch against an existing
    * index: top-k base neighbors per batch vector, exact cosine within
    * the probed cells. Per-batch work is O(Δ); the index is read through
    * STATIC partition pruning on the bounded probed-cell list.
    */
  def screenBatch(spark: SparkSession, index: IvfIndex, delta: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    screenBatchProbed(spark, index, delta, k, nprobe)._1

  /** FILTERED screen on the persisted index — the production
    * vector-store query (filter × partition prune × exact rank in one
    * plan): `candFilter` is a predicate over the index's metadata
    * columns ([[buildIndex]] pass-through), applied to the candidate
    * relation UNDER the probed-cid partition filter, so it reaches the
    * index scan as a data filter (PushedFilters) and prunes candidate
    * BYTES before ranking — never a post-rank re-filter. Widen `nprobe`
    * with predicate selectivity (the [[ivfAnnFiltered]] dial): a
    * ~10%-selective filter needs ~2× the probes for the same candidate
    * pool.
    */
  def screenBatchFiltered(spark: SparkSession, index: IvfIndex,
      delta: DataFrame, k: Int, nprobe: Int,
      candFilter: org.apache.spark.sql.Column): DataFrame =
    screenBatchProbed(spark, index, delta, k, nprobe, Some(candFilter))._1

  /** [[screenBatch]] for a DOUBLE-typed query batch — the derived-query
    * serving path (a PRF centroid, a cluster mean, any query vector
    * COMPUTED in double rather than read from a float column): the
    * query-side folds run in double with the oracle-established
    * `zip_with`/`aggregate` shape, so a derived vector never round-trips
    * through float32 (a cast could flip near-tie ranks against a
    * double-computed closed form). Scores are `dot(q, v)/|v|` — rank ≡
    * cosine (|q| is a per-query constant), computed WITHOUT the |q|
    * division so the ordering is bit-identical to the closed form's
    * fold. The index side is untouched: same partition pruning,
    * tombstone subtraction and filter pushdown as every other screen.
    */
  def screenBatchDouble(spark: SparkSession, index: IvfIndex,
      delta: DataFrame, k: Int, nprobe: Int,
      candFilter: Option[org.apache.spark.sql.Column] = None): DataFrame =
    screenBatchProbed(spark, index, delta, k, nprobe, candFilter,
      queryIsDouble = true)._1

  /** [[screenBatch]] + the probed cell ids (IvfSpec asserts the index
    * scan reads exactly these partitions and no others).
    */
  private[ops] def screenBatchProbed(spark: SparkSession, index: IvfIndex,
      delta: DataFrame, k: Int, nprobe: Int,
      candFilter: Option[org.apache.spark.sql.Column] = None,
      queryIsDouble: Boolean = false): (DataFrame, Seq[Int]) =
    screenBatchProbedOver(spark, index.centroids,
      cids => indexData(spark, index.path).filter(col("cid").isin(cids: _*)),
      delta, k, nprobe, candFilter, queryIsDouble)

  /** [[screenBatchProbed]] over an EXPLICIT quantizer + candidate
    * provider — the live path passes the handle's centroids and the
    * live tombstone-subtracted read; a pinned snapshot passes the
    * manifest's view. `prunedData` receives the probed cid list so the
    * provider applies it as a PARTITION filter on its own scan.
    */
  private[ops] def screenBatchProbedOver(spark: SparkSession,
      centroids: Seq[Array[Float]], prunedData: Seq[Int] => DataFrame,
      delta: DataFrame, k: Int, nprobe: Int,
      candFilter: Option[org.apache.spark.sql.Column] = None,
      queryIsDouble: Boolean = false): (DataFrame, Seq[Int]) = {
    import spark.implicits._
    // query-side folds: the float-array kernel for float queries, the
    // oracle's double zip_with/aggregate fold for double queries (same
    // left-to-right accumulation, no float round-trip)
    val qdot: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      if (queryIsDouble)
        (q, v) => aggregate(zip_with(q, v, (x, y) => x * y.cast("double")),
          lit(0.0), (acc, p) => acc + p)
      else Similarity.dot
    // double-query scores are dot/|candidate| — NOT divided by |q|: the
    // quotient is rank-equivalent mathematically (|q| is a per-query
    // constant) but not under IEEE rounding, where dividing two
    // near-tie doubles by the same constant can collapse a strict order
    // to equality and flip the vec_id tie-break against a closed form
    // computed without the division
    val qnorm: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (queryIsDouble) _ => lit(1.0)
      else Similarity.l2norm
    val centDf = centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cid", "cent")
    // Probe list per batch vector: O(Δ) scan work.
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cscore").desc, col("cid"))
    val probes = delta
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        qnorm(col("embedding")).as("qnrm"))
      .crossJoin(broadcast(centDf))
      .withColumn("cscore",
        qdot(col("qvec"), col("cent")) / Similarity.l2norm(col("cent")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("qnrm"), col("cid"))
      .localCheckpoint() // pinned: probed-cid collect + candidate join

    // Bounded driver list (≤ kCells ints) → STATIC partition pruning on
    // the index scan; the join then restricts per-query.
    val probedCids = probes.select(col("cid")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    val pruned = prunedData(probedCids)
    // metadata predicate under the partition filter: a scan-side data
    // filter, so filtered search prunes bytes, not ranks
    val cands = candFilter.map(pruned.filter).getOrElse(pruned)
    val result = cands
      .join(broadcast(probes), Seq("cid"))
      .withColumn("score",
        qdot(col("qvec"), col("embedding")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
    (result, probedCids)
  }

  /** The oracle row: [[buildIndex]] + [[screenBatch]] composed over the
    * base/delta vec_id split. The rebuild-per-invocation keeps the row
    * hash-closed; a production pipeline holds the [[IvfIndex]] handle
    * (or [[loadIndex]]s it) and calls [[screenBatch]]/[[appendBatch]]
    * per landing batch — IvfSpec proves that path touches only
    * probed-cell partitions.
    */
  def ivfIncremental(spark: SparkSession, dir: String): DataFrame =
    ivfIncrementalAt(spark, dir, k = 5, kCells = 16, nprobe = 4)

  def ivfIncrementalAt(spark: SparkSession, dir: String, k: Int,
      kCells: Int, nprobe: Int): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings").select(col("vec_id"), col("embedding"))
    val index = buildIndexCached(emb.filter(col("vec_id") % 10 =!= 0),
      s"$dir/embeddings.parquet",
      graft.util.Fs.sessionTempDir("ivf_index", dir), kCells, iters = 0)
    screenBatch(spark, index, emb.filter(col("vec_id") % 10 === 0), k, nprobe)
  }

  /** Registered `sim_ivf_compacted`: the full append-lifecycle
    * composition under the oracle — build the persisted index on a base
    * (vec_id % 10 ∉ {0, 9}), fold in TWO idempotent append batches (the
    * 9-and-19 mod-20 halves of the remaining tenth), [[compactIndex]]
    * the accrued segments, then [[screenBatch]] the %10 == 0 delta. The
    * DuckDB twin knows nothing of segments or compaction: it assigns
    * all non-delta vectors against the base-sample quantizer and
    * screens — hash equality proves append + compact + screen ≡ one
    * logical index. Repeated runs in one session exercise token replay
    * across compaction: the appends no-op (tokens carried through the
    * compacted generation) and re-compacting is idempotent.
    */
  def ivfCompacted(spark: SparkSession, dir: String): DataFrame =
    ivfCompactedAt(spark, dir, k = 5, kCells = 16, nprobe = 4)

  def ivfCompactedAt(spark: SparkSession, dir: String, k: Int,
      kCells: Int, nprobe: Int): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings").select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 10 =!= 0 && col("vec_id") % 10 =!= 9)
    val path = graft.util.Fs.sessionTempDir("ivf_index_compact", dir)
    val index = buildIndexCached(base, s"$dir/embeddings.parquet", path, kCells, iters = 0)
    appendBatchIdempotent(index, emb.filter(col("vec_id") % 20 === 9), "compactq:a")
    appendBatchIdempotent(index, emb.filter(col("vec_id") % 20 === 19), "compactq:b")
    // one-shot compaction (sweepOnce): re-compacting on a bench replay
    // is an idempotent full rewrite of identical survivors — skip to
    // the steady-state screen once the keyed compaction is durable
    graft.util.IndexMaint.sweepOnce(path, s"$dir/embeddings.parquet",
      "compact|compactq") {
      compactIndex(spark, index, Some("compact|compactq"))
      ()
    }
    screenBatch(spark, loadIndex(path), emb.filter(col("vec_id") % 10 === 0), k, nprobe)
  }

  /** Registered `sim_ivf_deleted`: the takedown lifecycle under the
    * oracle — build the persisted index on the base corpus
    * (vec_id % 10 ≠ 0), [[deleteIds]] the % 7 == 3 stratum (a ~14%
    * takedown wave), then [[screenBatch]] the % 10 == 0 delta. The
    * DuckDB twin knows nothing of tombstones: it simply excludes the
    * deleted ids from the candidate relation — hash equality proves a
    * logically-deleted id is invisible to every rank and score, not
    * merely filtered from the final page. (The quantizer keeps its
    * full-base sample: deletion does not retrain, exactly like FAISS
    * `remove_ids`.) Physical reclamation is [[compactIndex]]'s job and
    * is spec-checked (screen before ≡ after reclamation).
    */
  def ivfDeleted(spark: SparkSession, dir: String): DataFrame =
    ivfDeletedAt(spark, dir, k = 5, kCells = 16, nprobe = 4)

  def ivfDeletedAt(spark: SparkSession, dir: String, k: Int,
      kCells: Int, nprobe: Int): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings").select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val index = buildIndexCached(base, s"$dir/embeddings.parquet",
      graft.util.Fs.sessionTempDir("ivf_index_del", dir), kCells, iters = 0)
    val doomed = base.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    deleteIds(index, doomed)
    screenBatch(spark, index, emb.filter(col("vec_id") % 10 === 0), k, nprobe)
  }

  /** Registered `sim_ivf_retention`: the CORPUS-SCALE delete — a whole
    * stratum (% 5 == 1 of the base, ~18%) leaves via [[deleteWhere]]'s
    * one filtered compaction instead of a tombstone list, and the
    * post-rewrite screen must equal the closed form over survivors —
    * same claim as `sim_ivf_deleted` but through the rewrite path the
    * tombstone contract hands off to at retention scale. Idempotent
    * across bench replays: re-filtering an already-filtered index
    * rewrites identical rows.
    */
  private val retentionMemo =
    new graft.util.BoundedCache[(String, Long, String), IvfIndex](max = 8)

  /** Cached build composed with [[deleteWhere]], memoized per (path,
    * source fingerprint) as the POST-REWRITE handle — the ONE safe memo
    * shape for a build-then-delete composition: deleteWhere's
    * generation commit evicts the build memo (stale-handle safety), so
    * memoizing the build and the sweep SEPARATELY is the
    * replay-resurrection bug — a replay rebuilds the full corpus
    * (deleted stratum included) while the sweep memo skips the
    * re-delete. Double-checked under the path monitor so two concurrent
    * first calls cannot double-build. Shared by the retention row and
    * the hybrid takedown serving path.
    *
    * One-shot semantics ([[graft.util.IndexMaint.writeSweepKeys]]
    * contract): the composition is "build THIS source, delete THIS
    * stratum once" — rows appended to the index afterwards are outside
    * it even if they match the predicate (true of the memo-hit path
    * since r16; the disk key only extends that across sessions). A
    * standing retention policy re-runs [[deleteWhere]] under a fresh
    * per-epoch key.
    */
  def deleteWhereCached(base: => DataFrame, srcDir: String, path: String,
      kCells: Int, iters: Int,
      doomed: org.apache.spark.sql.Column,
      predicateKey: Option[String] = None): IvfIndex = {
    // the build SHAPE and the delete PREDICATE are part of the key: a
    // second caller sharing the path/source but deleting a different
    // stratum must rebuild, not silently receive the first caller's
    // post-delete handle. Column.toString is injective only for
    // literal-built predicates (two different UDFs both print
    // `UDF(vec_id)`) — so an opaque predicate REQUIRES the caller to
    // name its own key instead of silently risking a handle swap
    val predKey = predicateKey.getOrElse {
      require(!org.apache.spark.sql.graft.bridge.containsUdf(doomed),
        s"deleteWhereCached on $path: predicate '$doomed' contains a UDF, " +
          "a name-resolved function call, or a SQL snippet — its text is " +
          "not a reliable memo key (an anonymous lambda prints UDF(...); a " +
          "registered name can be re-bound between calls) — pass " +
          "predicateKey to identify the delete stratum explicitly")
      doomed.toString
    }
    val fp = graft.util.Fs.dirFingerprint(srcDir)
    val key = (path, fp, s"$kCells|$iters|$predKey")
    val diskBuildKey = s"ivf|src=$fp|kCells=$kCells|iters=$iters"
    val diskSweepKey = s"deleteWhere|$predKey"
    retentionMemo.memoized(key, graft.util.IndexMaint.lockFor(path))(
      k => k._1 == path && k != key) {
      // a miss must not re-run the rewrite when the live generation can
      // prove BOTH halves of the composition already happened — same
      // build (key), sweep applied (recorded by the keyed deleteWhere)
      val proven = graft.util.IndexMaint.liveGenOpt(path).exists { g =>
        graft.util.IndexMaint.readBuildKey(g).contains(diskBuildKey) &&
          graft.util.IndexMaint.readSweepKeys(g).contains(diskSweepKey)
      }
      if (proven) loadIndex(path)
      else {
        val pinned = base
        buildIndexCached(pinned, srcDir, path, kCells, iters)
        deleteWhere(pinned.sparkSession, loadIndex(path), doomed,
          Some(diskSweepKey))
      }
    }
  }

  private[ops] def dropRetentionMemo(path: String): Unit =
    retentionMemo.evict(_._1 == path)

  def ivfRetention(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings").select(col("vec_id"), col("embedding"))
    val after = deleteWhereCached(emb.filter(col("vec_id") % 10 =!= 0),
      s"$dir/embeddings.parquet",
      graft.util.Fs.sessionTempDir("ivf_index_ret", dir),
      kCells = 16, iters = 0, doomed = col("vec_id") % 5 === 1)
    screenBatch(spark, after, emb.filter(col("vec_id") % 10 === 0), k = 5, nprobe = 4)
  }

  /** Registered `sim_ivf_upserted`: the delete-then-insert lifecycle
    * under the oracle — build on the base (vec_id % 10 ≠ 0), then
    * [[upsertBatchIdempotent]] a "re-embedded" wave: every % 9 == 4 id
    * whose successor exists takes its successor's embedding (a donor
    * join, so the new vectors are real table values — no float
    * arithmetic to drift cross-engine). The DuckDB twin knows nothing
    * of tombstones or segments: it screens the post-upsert corpus with
    * each id's EFFECTIVE embedding, assignment recomputed against the
    * frozen build-time quantizer — hash equality proves old copies are
    * invisible to every rank and score while the replacements landed in
    * their new cells. Replays no-op on the token.
    */
  def ivfUpserted(spark: SparkSession, dir: String): DataFrame =
    ivfUpsertedAt(spark, dir, k = 5, kCells = 16, nprobe = 4)

  def ivfUpsertedAt(spark: SparkSession, dir: String, k: Int,
      kCells: Int, nprobe: Int): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings").select(col("vec_id"), col("embedding"))
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val index = buildIndexCached(base, s"$dir/embeddings.parquet",
      graft.util.Fs.sessionTempDir("ivf_index_ups", dir), kCells, iters = 0)
    val donor = emb.select(col("vec_id").as("did"), col("embedding").as("demb"))
    val batch = base.filter(col("vec_id") % 9 === 4)
      .join(donor, col("did") === col("vec_id") + 1)
      .select(col("vec_id"), col("demb").as("embedding"))
    upsertBatchIdempotent(index, batch, "upsq:1")
    screenBatch(spark, index, emb.filter(col("vec_id") % 10 === 0), k, nprobe)
  }

  /** Registered `sim_ivf_filtered_persisted`: filtered search on the
    * PERSISTED index — the metadata (`label`) rides the index files
    * ([[buildIndex]] pass-through), the predicate lands on the scan
    * under the probed-cid partition filter ([[screenBatchFiltered]]),
    * and the probe list is widened 4 → 8 for the ~10%-selective
    * predicate (the [[ivfAnnFiltered]] dial, now against durable
    * segments). Filter × partition prune × exact rank — all three in
    * one plan, which is the composition VERDICT r15 called missing.
    */
  def ivfFilteredPersisted(spark: SparkSession, dir: String): DataFrame =
    ivfFilteredPersistedAt(spark, dir, k = 5, kCells = 16, nprobe = 8, label = 3)

  def ivfFilteredPersistedAt(spark: SparkSession, dir: String, k: Int,
      kCells: Int, nprobe: Int, label: Int): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings").select(col("vec_id"), col("embedding"), col("label"))
    val index = buildIndexCached(emb.filter(col("vec_id") % 10 =!= 0),
      s"$dir/embeddings.parquet",
      graft.util.Fs.sessionTempDir("ivf_index_lbl", dir), kCells, iters = 0)
    screenBatchFiltered(spark, index,
      emb.filter(col("vec_id") % 10 === 0).select(col("vec_id"), col("embedding")),
      k, nprobe, candFilter = col("label") === label)
  }

  /** Twin of [[ivfIncremental]]: same base/delta split, same iters = 0
    * quantizer from the BASE sample, same probe ranking and candidate
    * scoring — persistence is an engine-side layout detail invisible to
    * the result.
    */
  val ivfIncrementalSql: String =
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
      |    FROM en CROSS JOIN cnorm c WHERE en.vec_id % 10 <> 0) WHERE r = 1),
      |queries AS (
      |  SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm FROM en WHERE vec_id % 10 = 0),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid,
      |           row_number() OVER (PARTITION BY q.query_id ORDER BY
      |             list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS prank
      |    FROM queries q CROSS JOIN cnorm c) WHERE prank <= 4),
      |cand AS (
      |  SELECT q.query_id, en.vec_id,
      |         list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * en.vec[i]))
      |           / (q.qnrm * en.nrm) AS score
      |  FROM probes p
      |  JOIN assigned a ON a.cid = p.cid
      |  JOIN queries q ON q.query_id = p.query_id
      |  JOIN en ON en.vec_id = a.vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Twin of [[ivfUpserted]]: [[ivfIncrementalSql]] with the candidate
    * relation swapped for the EFFECTIVE post-upsert corpus (the donor
    * join inlined as a CASE), assignment recomputed for every candidate
    * against the frozen build-time quantizer sample — which matches the
    * engine because unchanged rows keep their build cells and upserted
    * rows are re-encoded by the same centroids at commit.
    */
  val ivfUpsertedSql: String =
    """WITH eff AS (
      |  SELECT e.vec_id,
      |         CASE WHEN e.vec_id % 10 <> 0 AND e.vec_id % 9 = 4 AND n.vec_id IS NOT NULL
      |              THEN n.embedding ELSE e.embedding END AS embedding
      |  FROM embeddings e LEFT JOIN embeddings n ON n.vec_id = e.vec_id + 1),
      |ho AS (
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
      |en AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM eff),
      |assigned AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT en.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS r
      |    FROM en CROSS JOIN cnorm c WHERE en.vec_id % 10 <> 0) WHERE r = 1),
      |queries AS (
      |  SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm FROM en WHERE vec_id % 10 = 0),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid,
      |           row_number() OVER (PARTITION BY q.query_id ORDER BY
      |             list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS prank
      |    FROM queries q CROSS JOIN cnorm c) WHERE prank <= 4),
      |cand AS (
      |  SELECT q.query_id, en.vec_id,
      |         list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * en.vec[i]))
      |           / (q.qnrm * en.nrm) AS score
      |  FROM probes p
      |  JOIN assigned a ON a.cid = p.cid
      |  JOIN queries q ON q.query_id = p.query_id
      |  JOIN en ON en.vec_id = a.vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Twin of `stream_ivf_cdc`
    * ([[graft.streaming.StreamingQueries.streamIvfCdc]]): the
    * [[ivfUpsertedSql]] shape with the candidate relation swapped for
    * the post-CDC EFFECTIVE corpus — deletes excluded at the source,
    * upserted ids carrying their donor embedding, inserted ids
    * (re-keyed +1000000 copies) unioned in — all assigned against the
    * frozen build-time quantizer sample, exactly what the engine's
    * frozen-centroid encoders do at each CDC commit. The three op sets
    * are id-disjoint by construction, so the effective corpus (and the
    * hash) is independent of how the stream happened to batch.
    */
  val ivfCdcSql: String =
    """WITH eff AS (
      |  SELECT e.vec_id,
      |         CASE WHEN e.vec_id % 9 = 4 AND n.vec_id IS NOT NULL
      |              THEN n.embedding ELSE e.embedding END AS embedding
      |  FROM embeddings e LEFT JOIN embeddings n ON n.vec_id = e.vec_id + 1
      |  WHERE e.vec_id % 10 <> 0
      |    AND NOT (e.vec_id % 7 = 2 AND e.vec_id % 9 <> 4)
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id, embedding
      |  FROM embeddings WHERE vec_id % 10 = 0),
      |ho AS (
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
      |en AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM eff),
      |queries AS (
      |  SELECT vec_id AS query_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS qnrm
      |  FROM embeddings WHERE vec_id % 10 = 0),
      |assigned AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT en.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS r
      |    FROM en CROSS JOIN cnorm c) WHERE r = 1),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid,
      |           row_number() OVER (PARTITION BY q.query_id ORDER BY
      |             list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS prank
      |    FROM queries q CROSS JOIN cnorm c) WHERE prank <= 4),
      |cand AS (
      |  SELECT q.query_id, en.vec_id,
      |         list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * en.vec[i]))
      |           / (q.qnrm * en.nrm) AS score
      |  FROM probes p
      |  JOIN assigned a ON a.cid = p.cid
      |  JOIN queries q ON q.query_id = p.query_id
      |  JOIN en ON en.vec_id = a.vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Twin of [[ivfDeleted]]: [[ivfIncrementalSql]] with the deleted
    * stratum excluded from the CANDIDATE relation only — the quantizer
    * sample and cell assignment replay over the full base, because
    * deletion neither retrains nor re-encodes.
    */
  val ivfDeletedSql: String = ivfScreenMinusSql("a.vec_id % 7 <> 3")

  /** Twin of [[ivfRetention]]: the same survivors-only closed form with
    * the retention stratum — the tombstone path and the filtered-
    * compaction rewrite are indistinguishable to a reader, which is
    * exactly the claim.
    */
  val ivfRetentionSql: String = ivfScreenMinusSql("a.vec_id % 5 <> 1")

  private def ivfScreenMinusSql(candPred: String): String =
    s"""WITH ho AS (
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
      |    FROM en CROSS JOIN cnorm c WHERE en.vec_id % 10 <> 0) WHERE r = 1),
      |queries AS (
      |  SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm FROM en WHERE vec_id % 10 = 0),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid,
      |           row_number() OVER (PARTITION BY q.query_id ORDER BY
      |             list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS prank
      |    FROM queries q CROSS JOIN cnorm c) WHERE prank <= 4),
      |cand AS (
      |  SELECT q.query_id, en.vec_id,
      |         list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * en.vec[i]))
      |           / (q.qnrm * en.nrm) AS score
      |  FROM probes p
      |  JOIN assigned a ON a.cid = p.cid
      |  JOIN queries q ON q.query_id = p.query_id
      |  JOIN en ON en.vec_id = a.vec_id
      |  WHERE $candPred),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Twin of [[ivfFilteredPersisted]]: [[ivfIncrementalSql]] with the
    * label predicate on the candidate relation and the widened
    * prank ≤ 8 probe list — index persistence and the scan-side filter
    * placement have no SQL shadow, which is exactly the claim.
    */
  val ivfFilteredPersistedSql: String =
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
      |en AS (
      |  SELECT vec_id, label AS lbl,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings),
      |assigned AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT en.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS r
      |    FROM en CROSS JOIN cnorm c WHERE en.vec_id % 10 <> 0) WHERE r = 1),
      |queries AS (
      |  SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm FROM en WHERE vec_id % 10 = 0),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid,
      |           row_number() OVER (PARTITION BY q.query_id ORDER BY
      |             list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS prank
      |    FROM queries q CROSS JOIN cnorm c) WHERE prank <= 8),
      |cand AS (
      |  SELECT q.query_id, en.vec_id,
      |         list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * en.vec[i]))
      |           / (q.qnrm * en.nrm) AS score
      |  FROM probes p
      |  JOIN assigned a ON a.cid = p.cid
      |  JOIN queries q ON q.query_id = p.query_id
      |  JOIN en ON en.vec_id = a.vec_id
      |  WHERE en.lbl = 3),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Oracle twin of ivfAnn (iters = 0): the portable md5 sample order
    * picks the same 16 sample vectors as cells; assignment/probing/
    * scoring re-derive the identical doubles (left-fold list_sum =
    * DotProductF's accumulation order), and argmax ties break on the
    * lowest cid exactly like NearestCentroid's strict-greater scan.
    */
  val ivfAnnSql: String =
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
      |queries AS (
      |  SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm FROM en WHERE vec_id < 5),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid,
      |           row_number() OVER (PARTITION BY q.query_id ORDER BY
      |             list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS prank
      |    FROM queries q CROSS JOIN cnorm c) WHERE prank <= 4),
      |cand AS (
      |  SELECT q.query_id, en.vec_id,
      |         list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * en.vec[i]))
      |           / (q.qnrm * en.nrm) AS score
      |  FROM probes p
      |  JOIN assigned a ON a.cid = p.cid
      |  JOIN queries q ON q.query_id = p.query_id
      |  JOIN en ON en.vec_id = a.vec_id
      |  WHERE en.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Twin of [[ivfAnnFiltered]]: [[ivfAnnSql]] with the label predicate
    * on the candidate relation (and the widened prank ≤ 8 probe list) —
    * the filter composes under the probe exactly like the engine's
    * scan-side filter, so survivors and ranks replay bit-identically.
    */
  val ivfAnnFilteredSql: String =
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
      |  SELECT vec_id, label AS lbl,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
      |         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings),
      |assigned AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT en.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY en.vec_id ORDER BY
      |             list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS r
      |    FROM en CROSS JOIN cnorm c) WHERE r = 1),
      |queries AS (
      |  SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm FROM en WHERE vec_id < 5),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid,
      |           row_number() OVER (PARTITION BY q.query_id ORDER BY
      |             list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS prank
      |    FROM queries q CROSS JOIN cnorm c) WHERE prank <= 8),
      |cand AS (
      |  SELECT q.query_id, en.vec_id,
      |         list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * en.vec[i]))
      |           / (q.qnrm * en.nrm) AS score
      |  FROM probes p
      |  JOIN assigned a ON a.cid = p.cid
      |  JOIN queries q ON q.query_id = p.query_id
      |  JOIN en ON en.vec_id = a.vec_id
      |  WHERE en.lbl = 3 AND en.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Twin of [[ivfCompacted]]: [[ivfIncrementalSql]] with the sample
    * drawn from the append-lifecycle BASE (% 10 ∉ {0, 9}) and the
    * candidate relation spanning base ∪ appends (% 10 ≠ 0) — segments
    * and compaction have no SQL shadow, which is exactly the claim.
    */
  val ivfCompactedSql: String =
    """WITH ho AS (
      |  SELECT vec_id, embedding,
      |         md5_number_lower(CAST(vec_id AS VARCHAR)) % 1000003 AS hord
      |  FROM embeddings WHERE vec_id % 10 NOT IN (0, 9)),
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
      |    FROM en CROSS JOIN cnorm c WHERE en.vec_id % 10 <> 0) WHERE r = 1),
      |queries AS (
      |  SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm FROM en WHERE vec_id % 10 = 0),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid,
      |           row_number() OVER (PARTITION BY q.query_id ORDER BY
      |             list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * cvec[i])) / cn
      |             DESC, c.cid) AS prank
      |    FROM queries q CROSS JOIN cnorm c) WHERE prank <= 4),
      |cand AS (
      |  SELECT q.query_id, en.vec_id,
      |         list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * en.vec[i]))
      |           / (q.qnrm * en.nrm) AS score
      |  FROM probes p
      |  JOIN assigned a ON a.cid = p.cid
      |  JOIN queries q ON q.query_id = p.query_id
      |  JOIN en ON en.vec_id = a.vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id, score,
      |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      |  FROM cand)
      |SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin
}
