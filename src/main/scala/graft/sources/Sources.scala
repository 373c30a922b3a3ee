package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-side utilities (SURVEY §2.1).
  *
  *  - Seeds: the dbt `seed` CSV → table path (S1). The reference's seeds
  *    are headered CSVs with UPPERCASE column names
  *    (`integration_tests/data/accounts.csv:1`).
  *  - Bucketed: write-side layout for co-located joins — two tables
  *    bucketed by the same key join WITHOUT a shuffle (the 100 TB answer
  *    to the reference's repeated log-table anti-joins: bucket both the
  *    model output and its tracking log by the record key).
  */
object Seeds {

  /** S1 — CSV seed scan: header + schema inference + uppercased column
    * names (dbt normalizes seed headers; `accounts.csv` → NAME, ACCOUNT_ID).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
    df.toDF(df.columns.map(_.toUpperCase).toIndexedSeq: _*)
  }
}

object Bucketed {

  /** Persist `df` bucketed+sorted by `key` into the session catalog.
    * Joins between tables written with the same (key, buckets) plan with
    * NO Exchange on either side — verified in BucketedSpec by asserting
    * the physical plan is shuffle-free.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Shuffle-free equi-join of two same-bucketing tables. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}

/** Skew mitigation: salted equi-join (SURVEY optimization list — "salting
  * for skew"). The hot-key side is split across `salts` sub-keys; the
  * other side is replicated `salts`× so every sub-key still meets every
  * matching row. For inner/left joins the result is row-identical to the
  * plain join; the shuffle spreads a hot key over `salts` reducers
  * instead of one.
  *
  * Only `inner`/`left`(`left_outer`) join types are supported: the right
  * side is replicated, so a right/full outer join would emit every
  * unmatched right row `salts` times instead of once.
  *
  * Use when AQE's skew-join split isn't available (e.g., the skew is in
  * an aggregation feeding the join) — otherwise prefer AQE.
  */
object Skew {

  private val supportedJoinTypes = Set("inner", "left", "leftouter")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(supportedJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only (right side is replicated ${salts}x); got '$joinType'")
    val l = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** The documented skew-detection heuristic: would one reducer of a
    * `key`-hashed shuffle of `df` carry more than `factor ×` the mean
    * reducer load? Estimated from a deterministic 1/`sampleMod` ROW
    * sample (rows whose full-row xxhash64 lands on 0 mod `sampleMod` —
    * duplicate rows sample together, an acceptable bias for a load
    * estimate), so the probe scans a fraction of the data and both the
    * hottest-key count and the total scale by the same factor: the
    * RATIO is unbiased, and the answer is reproducible run to run.
    * Cost: one column-pruned filtered aggregate; use it once per static
    * relation, not per iteration.
    *
    * `factor` is the tolerance AQE's skew-join uses by analogy
    * (spark.sql.adaptive.skewJoin.skewedPartitionFactor defaults to 5):
    * below it, hashing already balances well enough that salting's
    * `salts ×` replication of the other side costs more than it saves.
    */
  def detectSkew(df: DataFrame, key: String, factor: Double = 5.0,
      sampleMod: Long = 16L): Boolean =
    hotKeys(df, key, factor, sampleMod).nonEmpty

  /** The hot keys themselves (same sampled estimate as [[detectSkew]]):
    * every key whose estimated reducer load exceeds `factor ×` the
    * mean, heaviest first, capped at `maxKeys`. The cap is principled,
    * not a truncation: a key needs > factor·total/parallelism sampled
    * rows to qualify, so at most parallelism/factor keys can EXIST —
    * the list is bounded driver metadata by construction. Callers
    * ISOLATE these keys (broadcast their matching rows on the thin
    * side) and shuffle only the balanced remainder — cheaper than
    * whole-relation salting, whose `salts ×` replication of the other
    * side costs more than the hot reducer saves whenever the thin side
    * is itself large.
    */
  def hotKeys(df: DataFrame, key: String, factor: Double = 5.0,
      sampleMod: Long = 16L, maxKeys: Int = 64): Seq[Any] = {
    val cols = df.columns.map(col)
    val sampled = df.filter(pmod(xxhash64(cols.toIndexedSeq: _*), lit(sampleMod)) === 0)
      .groupBy(col(key)).agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val tot = sampled.agg(sum(col("c"))).head()
    if (tot.isNullAt(0)) Seq.empty
    else {
      val parallelism = df.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "200").toDouble
      val threshold = factor * math.max(1.0, tot.getLong(0) / parallelism)
      sampled.filter(col("c") > threshold)
        .orderBy(col("c").desc).limit(maxKeys)
        .collect().map(_.get(0)).toSeq
    }
  }

  /** [[saltedJoin]] gated by [[detectSkew]] on the LEFT (hot) side —
    * the reusable fallback for joins whose skew AQE cannot see (e.g.
    * an iterative join inside a convergence loop, where the skewed
    * relation is a checkpointed intermediate). Plain join when balanced.
    */
  def saltedJoinIfSkewed(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner", factor: Double = 5.0): DataFrame =
    if (detectSkew(left, key, factor)) saltedJoin(left, right, key, salts, joinType)
    else left.join(right, Seq(key), joinType)
}
