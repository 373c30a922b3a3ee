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
object Ivf {

  /** Lloyd k-means over the `embedding` column. Deterministic: init from
    * the k lowest vec_ids (the testdata's ids are dense), fixed
    * iteration count, no RNG.
    */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): Seq[Array[Float]] = {
    // If the table has fewer vectors than requested cells, the effective
    // k shrinks to the available count (every vector its own cell).
    // orderBy+limit plans as TakeOrderedAndProject (per-partition top-k +
    // driver merge, no sort shuffle); dim comes from the same collect.
    var centroids: Seq[Array[Float]] = emb
      .orderBy("vec_id").limit(k)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray).toSeq
    val dim = centroids.head.length
    val kEff = centroids.size
    for (_ <- 0 until iters) {
      val assigned = emb.select(
        ArrayExprs.nearestCentroid(col("embedding"), centroids).as("cid"),
        posexplode(col("embedding")))
      // Partial-aggregated (cid, pos) sums: k·dim result rows no matter
      // how large the corpus is.
      val sums = assigned.groupBy(col("cid"), col("pos"))
        .agg(sum(col("col").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(kEff)(i => centroids(i).clone()) // keep empty cells
      sums.groupBy(_.getInt(0)).foreach { case (cid, rows) =>
        val c = new Array[Float](dim)
        rows.foreach(r => c(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat)
        next(cid) = c
      }
      centroids = next.toSeq
    }
    centroids
  }

  def ivfAnn(spark: SparkSession, dir: String): DataFrame =
    ivfAnnAt(spark, dir, nQueries = 5, k = 10, kCells = 16, nprobe = 4, iters = 3)

  def ivfAnnAt(spark: SparkSession, dir: String, nQueries: Int, k: Int,
      kCells: Int, nprobe: Int, iters: Int): DataFrame = {
    val c = Catalog(spark, dir)
    val emb = c.ref("embeddings")
      .select(col("vec_id"), col("embedding"), Similarity.l2norm(col("embedding")).as("nrm"))
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
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        Similarity.dot(col("qvec"), col("embedding")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }
}
