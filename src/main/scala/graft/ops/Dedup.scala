package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Deduplication operators over `documents` — the core of a training-data
  * pipeline at 100 TB:
  *
  *  - exact:      hash-groupBy on a normalized fingerprint. One shuffle of
  *                (16-byte digest, doc_id); partial agg collapses it.
  *  - ngram Jaccard: 3-word shingle inverted index self-join. Shingles are
  *                selective (unlike raw words), so the candidate-pair
  *                blow-up stays near-linear; exact because any pair with
  *                Jaccard ≥ τ > 0 shares ≥1 shingle.
  *  - MinHash+LSH: the sub-quadratic scale path — k hash signature, banded
  *                into buckets; only bucket-colliding pairs are verified.
  *  - SimHash:    64-bit fingerprint; hamming-0 grouping here, hamming ≤ k
  *                via band rotation at scale.
  *  - embedding near-dup: see Similarity.embeddingNearDup (cosine ≥ τ).
  */
object Dedup {

  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** 3-word shingles of a token array (positional n-grams). */
  private def shingles3(tokens: Column): Column =
    transform(
      sequence(lit(1), greatest(size(tokens) - 2, lit(0))),
      i => concat_ws(" ", element_at(tokens, i), element_at(tokens, i + 1),
        element_at(tokens, i + 2)))

  // ---- exact dedup -----------------------------------------------------------
  /** Exact duplicate groups: md5 over whitespace-normalized lowercase text;
    * representative = min doc_id. Only groups with >1 member are returned.
    */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.ref("documents")
      .select(col("doc_id"), md5(concat_ws(" ", toks(col("text")))).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("representative_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)
      .orderBy("representative_id")
  }

  val exactSql: String =
    """SELECT md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ')) AS fp,
      |       min(doc_id) AS representative_id, count(*) AS n_dups
      |FROM documents
      |GROUP BY 1 HAVING count(*) > 1
      |ORDER BY representative_id""".stripMargin

  // ---- n-gram Jaccard dedup ---------------------------------------------------
  /** Near-dup pairs by exact Jaccard over distinct 3-word shingles.
    * Inverted-index plan: (doc, shingle) distinct → self-join on shingle →
    * pair intersection counts → |A∪B| via per-doc sizes. Exact for τ > 0.
    * At 100 TB the shingle join is the shuffle to watch: it partitions by
    * shingle (no skew — shingles are near-unique) and the pair aggregation
    * partitions by (id1, id2).
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardAt(spark, dir, 0.5)

  def ngramJaccardAt(spark: SparkSession, dir: String, tau: Double): DataFrame = {
    val c = Catalog(spark, dir)
    val docShingle = c.ref("documents")
      .select(col("doc_id"), explode(array_distinct(shingles3(toks(col("text"))))).as("shingle"))
    val sizes = docShingle.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val a = docShingle.as("a")
    val b = docShingle.as("b")
    val inter = a.join(b, col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("n_shingles", "n1"), "id1")
      .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("n_shingles", "n2"), "id2")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n1") + col("n2") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("id1"), col("id2"), col("n_inter"), col("jaccard"))
      .orderBy("id1", "id2")
  }

  val ngramJaccardSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |  FROM documents),
      |ds AS (
      |  SELECT DISTINCT doc_id, shingle
      |  FROM (SELECT doc_id,
      |               unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
      |                 i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
      |        FROM tok)),
      |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM ds GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
      |  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id1, id2, n_inter,
      |       CAST(n_inter AS DOUBLE) / CAST(s1.n_shingles + s2.n_shingles - n_inter AS DOUBLE) AS jaccard
      |FROM inter
      |JOIN sizes s1 ON s1.doc_id = id1
      |JOIN sizes s2 ON s2.doc_id = id2
      |WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n_shingles + s2.n_shingles - n_inter AS DOUBLE) >= 0.5
      |ORDER BY id1, id2""".stripMargin

  // ---- MinHash + LSH ------------------------------------------------------------
  /** MinHash signatures (k=64 via xxhash64(shingle, seed)) banded into 16
    * bands of 4 — the sub-quadratic near-dup path. Candidate pairs =
    * same-band-bucket collisions; each candidate verified with exact
    * Jaccard estimate (signature agreement). Spark-only (xxhash64 has no
    * DuckDB twin) → rows-only driver check; exactness vs ngramJaccard is
    * asserted in DedupSpec.
    *
    * Scale: signatures are one narrow shuffle (doc_id → 64 longs = 512 B);
    * band buckets partition by (band, bucket-hash); no quadratic stage.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshAt(spark, dir, numHashes = 64, bands = 16, tau = 0.5)

  def minhashLshAt(spark: SparkSession, dir: String, numHashes: Int,
      bands: Int, tau: Double): DataFrame = {
    val rowsPerBand = numHashes / bands
    val c = Catalog(spark, dir)
    val docShingle = c.ref("documents")
      .select(col("doc_id"), explode(array_distinct(shingles3(toks(col("text"))))).as("shingle"))
    // k min-hashes in one pass: min over xxhash64(seed, shingle) per seed.
    val sigCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    val sig = docShingle
      .groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
    val sigArr = sig.select(col("doc_id"),
      array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
    // Band keys: hash of each contiguous slice of the signature.
    val banded = sigArr.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit("band"), b,
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.as("a")
    val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.sig").as("sig1"), col("b.sig").as("sig2"))
      .dropDuplicates("id1", "id2")
    candidates
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y), b => b))
          .cast("double") / numHashes.toDouble)
      .filter(col("est_jaccard") >= tau)
      .select(col("id1"), col("id2"), col("est_jaccard"))
      .orderBy("id1", "id2")
  }

  // ---- SimHash ---------------------------------------------------------------------
  /** 64-bit SimHash: per-token xxhash64, each bit votes ±1, fingerprint =
    * sign vector. Hamming-0 duplicate groups returned; hamming ≤ k at
    * scale = repeat grouping over rotated band halves. Spark-only.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val tokenHash = c.ref("documents")
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    // 64 bit-vote sums in one aggregate pass (codegen'd, map-side partial).
    val voteCols = (0 until 64).map(bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$bit"))
    val votes = tokenHash.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val fp = votes.select(col("doc_id"),
      (0 until 64).map(bit =>
        when(col(s"b$bit") > 0, lit(1L).cast("long") * lit(1L << bit)).otherwise(0L))
        .reduce(_ bitwiseOR _).as("simhash"))
    fp.groupBy("simhash")
      .agg(min("doc_id").as("representative_id"), count(lit(1)).as("n_docs"),
        sort_array(collect_list("doc_id")).as("doc_ids"))
      .filter(col("n_docs") > 1)
      .orderBy("representative_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (exact _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_simhash" -> (simhash _))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> exactSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql)
}
