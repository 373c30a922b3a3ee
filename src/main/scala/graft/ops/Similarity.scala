package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.catalog.Catalog

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

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

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
    val emb = c.ref("embeddings")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qvec"), col("embedding")).as("score"))
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
  /** Hash-derived random hyperplane: component j of plane (table t, bit b)
    * = a deterministic pseudo-uniform double in [-1, 1) from xxhash64.
    */
  private def planeComponent(t: Int, b: Int, j: Column): Column =
    (xxhash64(lit("plane"), lit(t), lit(b), j).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-pattern bucket id of a vector under `bits` hyperplanes of table t. */
  def lshBucket(vec: Column, t: Int, bits: Int): Column =
    (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") * planeComponent(t, b, j)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via multi-table LSH: candidates = vectors sharing a bucket with
    * the query in ANY table, then exact cosine rank within candidates.
    * Recall vs bruteForceTopK is asserted in SimilaritySpec. Spark-only
    * (driver records rows-only) — the oracle twin is the brute-force query.
    */
  def lshAnn(spark: SparkSession, dir: String): DataFrame =
    lshAnnAt(spark, dir, nQueries = 5, k = 10, tables = 8, bits = 8)

  def lshAnnAt(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      tables: Int, bits: Int): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings")
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      array((0 until tables).map(t => lshBucket(col("embedding"), t, bits)): _*).as("buckets"))
    val exploded = bucketed.select(col("vec_id"), col("embedding"),
      posexplode(col("buckets"))).withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val qs = exploded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("table"), col("bucket"))
    val candidates = exploded.join(broadcast(qs), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qvec"), col("vec_id"), col("embedding"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    candidates
      .withColumn("score", cosine(col("qvec"), col("embedding")))
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
    val emb = c.ref("embeddings").select(col("vec_id"), col("label"), col("embedding"))
    val a = emb.as("a")
    val b = emb.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"),
        col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        cosine(col("a.embedding"), col("b.embedding")).as("score"))
      .filter(col("score") >= tau)
      .orderBy("id1", "id2")
  }

  val embeddingNearDupSql: String =
    """WITH e AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |  FROM embeddings)
      |SELECT a.label AS label, a.vec_id AS id1, b.vec_id AS id2,
      |       list_sum(list_transform(range(1, len(a.vec) + 1), i -> a.vec[i] * b.vec[i]))
      |         / (sqrt(list_sum(list_transform(a.vec, x -> x * x)))
      |            * sqrt(list_sum(list_transform(b.vec, x -> x * x)))) AS score
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(range(1, len(a.vec) + 1), i -> a.vec[i] * b.vec[i]))
      |         / (sqrt(list_sum(list_transform(a.vec, x -> x * x)))
      |            * sqrt(list_sum(list_transform(b.vec, x -> x * x)))) >= 0.95
      |ORDER BY id1, id2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_bruteforce_topk" -> (bruteForceTopK _),
    "sim_lsh_ann" -> (lshAnn _),
    "sim_embedding_neardup" -> (embeddingNearDup _))

  val oracles: Map[String, String] = Map(
    "sim_bruteforce_topk" -> bruteForceTopKSql,
    "sim_embedding_neardup" -> embeddingNearDupSql)
}
