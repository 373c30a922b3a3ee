package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.{ArrayExprs, ExactDoubleSum}

/** Distributed k-means (Lloyd) over the `embeddings` table — the
  * clustering primitive a curation pipeline reaches for when balancing
  * domains or bounding SemDeDup's in-cell quadratic with data-driven
  * cells. Complements [[Ivf.kmeansCentroids]]: for a 16..4096-cell
  * quantizer the driver-sample trainer is the right tool (its scaladoc
  * argues why); this operator is for when k itself is large — say 10⁵
  * cells over billions of vectors, where a 64·k sample no longer fits a
  * driver — or when the clusters ARE the product, not just an index.
  *
  * Spark-first shape, per iteration:
  *  - ASSIGNMENT is pure scan work: the k×D centroid matrix rides into
  *    [[graft.functions.ArrayExprs.NearestCentroidSq]] as expression
  *    state (broadcast with the task closure), so no join and no shuffle
  *    touches the corpus — the same "model as literal" pattern as
  *    language-ID profiles and the Naive Bayes scorer.
  *  - UPDATE is one narrow shuffle: posexplode to (cid, dim, v) rows
  *    (20 B each) aggregated by (cid, dim), then a ≤ k·D-row collect —
  *    bounded driver-side metadata, exactly like the IVF quantizer's
  *    bounded sample (`Ivf.scala`). The corpus itself never moves.
  *
  * Determinism/oracle contract (the `sim_kmeans` row): init = the k
  * lowest-vec_id vectors; assignment ties break to the lowest cid; the
  * per-(cid, dim) mean is a SORTED LEFT FOLD of the doubles divided by
  * the member count (the [[Similarity.labelCentroids]] parity pattern —
  * decimal accumulation is not cross-engine-replayable, a sorted double
  * fold is), so every iteration's centroids — and therefore every
  * assignment and distance — are bit-identical to the DuckDB twin's
  * unrolled-CTE replay. Empty clusters keep their previous centroid on
  * both sides.
  *
  * Scale path: `mergeable = true` swaps the fold for
  * [[graft.functions.ExactDoubleSum]] — an order-free exact-decimal
  * accumulator that map-side combines (the fold must instead collect
  * each (cid, dim) group's values into one task). Assignments agree with
  * the fold path except when a vector sits within ~1 ulp of two
  * centroids (KmeansSpec pins agreement on the testdata); use it for
  * real training runs, the fold only where a cross-engine replay is the
  * requirement.
  */
object Kmeans {

  def kmeans(spark: SparkSession, dir: String): DataFrame =
    kmeansAt(spark, dir, k = 8, iters = 3, mergeable = false)

  def kmeansAt(spark: SparkSession, dir: String, k: Int, iters: Int,
      mergeable: Boolean): DataFrame = {
    val c = Catalog(spark, dir)
    // scanned iters+1 times (one assignment per iteration + the final
    // labeling) — pin the scan result instead of re-reading parquet
    val emb = c.ref("embeddings").select(col("vec_id"), col("embedding"))
      .localCheckpoint(eager = false)
    // init: the k lowest-vec_id vectors, float→double widening (exact)
    // corpus may hold fewer than k vectors — the effective k is then
    // centroids.length and every vector seeds its own cell
    var centroids: Array[Array[Double]] = emb.orderBy("vec_id").limit(k)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

    def assigned(cents: Array[Array[Double]]): DataFrame =
      emb.select(col("vec_id"), col("embedding"),
        ArrayExprs.nearestCentroidSq(col("embedding"),
          cents.toIndexedSeq).as("best"))

    var it = 0
    while (it < iters) {
      val exploded = assigned(centroids)
        .select(col("best.cid").as("cid"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("cid"), col("dim"), col("v").cast("double").as("v"))
      val sums =
        if (mergeable)
          exploded.groupBy("cid", "dim")
            .agg(ExactDoubleSum.exactSum(col("v")).as("s"),
              count(lit(1)).as("n"))
        else
          exploded.groupBy("cid", "dim")
            .agg(aggregate(array_sort(collect_list(col("v"))), lit(0.0),
              (acc, x) => acc + x).as("s"), count(lit(1)).as("n"))
      // ≤ centroids.length·D rows of (int, int, double, long) — bounded
      val next = centroids.map(_.clone()) // empty clusters keep position
      sums.collect().foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      centroids = next
      it += 1
    }
    assigned(centroids)
      .select(col("vec_id"), col("best.cid").cast("int").as("cluster_id"),
        col("best.dist2").as("dist2"))
      .orderBy("vec_id")
  }

  /** The twin replays the identical iterations as unrolled CTEs: a_i =
    * assignment against c_{i-1} (row_number over (d2, cid)), m_i =
    * per-(cid, dim) sorted-fold means, c_i = m_i left-joined onto
    * c_{i-1} so empty clusters keep their centroid. The final SELECT is
    * one more assignment pass against c_iters — the same extra pass the
    * Spark loop makes.
    */
  private[ops] def kmeansSql(k: Int, iters: Int): String = {
    val init =
      s"""e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |  FROM embeddings),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         |         vec AS cvec
         |  FROM (SELECT vec_id, vec FROM e ORDER BY vec_id LIMIT $k))""".stripMargin
    def assign(i: Int): String =
      s"""a$i AS (
         |  SELECT vec_id, vec, cid, d2 FROM (
         |    SELECT vec_id, vec, cid, d2,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM (SELECT e.vec_id, e.vec, c.cid,
         |                 list_sum(list_transform(range(1, len(e.vec) + 1),
         |                   i -> (e.vec[i] - c.cvec[i]) * (e.vec[i] - c.cvec[i]))) AS d2
         |          FROM e CROSS JOIN c${i - 1} c))
         |  WHERE rn = 1)""".stripMargin
    def update(i: Int): String =
      s"""m$i AS (
         |  SELECT cid, list(mu ORDER BY dim) AS cvec FROM (
         |    SELECT cid, dim,
         |           list_reduce(list_sort(list(v)), (p, q) -> p + q) / count(*) AS mu
         |    FROM (SELECT cid, unnest(range(1, len(vec) + 1)) AS dim,
         |                 unnest(vec) AS v
         |          FROM a$i)
         |    GROUP BY cid, dim)
         |  GROUP BY cid),
         |c$i AS (
         |  SELECT p.cid, COALESCE(m.cvec, p.cvec) AS cvec
         |  FROM c${i - 1} p LEFT JOIN m$i m ON m.cid = p.cid)""".stripMargin
    val body = (1 to iters).map(i => assign(i) + ",\n" + update(i)).mkString(",\n")
    val last = assign(iters + 1)
    s"""WITH $init,
       |$body,
       |$last
       |SELECT vec_id, cid AS cluster_id, d2 AS dist2
       |FROM a${iters + 1}
       |ORDER BY vec_id""".stripMargin
  }

  val kmeansOracleSql: String = kmeansSql(k = 8, iters = 3)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_kmeans" -> (kmeans _))

  val oracles: Map[String, String] = Map(
    "sim_kmeans" -> kmeansOracleSql)
}
