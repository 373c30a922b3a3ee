package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.functions.ArrayExprs.md5Mod

/** Corpus version management: the diff report a large-scale pipeline
  * runs between two releases of the same corpus (daily crawl refresh,
  * re-filtered snapshot) before shipping — how many documents were
  * added, removed, changed, unchanged, broken down by source. The
  * reference's incremental anti-join (`accounts_load.sql:23-28` —
  * "what have I not pushed yet") is the one-sided version of the same
  * question; this is the two-sided audit.
  *
  * Scale shape: each side reduces to (doc_id, source, 16-byte md5)
  * AT THE SCAN — document text never crosses a shuffle. The diff is
  * one doc_id equi-join (sort-merge over co-partitioned ids at 100 TB;
  * both versions of a corpus are naturally stored partitioned the same
  * way, so the exchange is reusable) followed by a map-side partial
  * aggregation down to |sources| rows. No corpus-sized state, no
  * driver collects.
  *
  * The second version is DERIVED deterministically from `documents`
  * (the repo's fixture pattern, replayed verbatim in the DuckDB twin):
  * 1-in-20 docs dropped, 1-in-10 texts revised, 1-in-25 spawn a new
  * doc at doc_id + 10^7 — so every diff class is exercised.
  */
object Versioning {

  private val AddedIdOffset = 10000000L

  private def draw(salt: String, m: Long): Column =
    md5Mod(concat(lit(salt + ":"), col("doc_id").cast("string")), m)

  /** The derived second version's fingerprint relation (the fixture
    * pattern shared by both diff paths and the DuckDB twin).
    */
  private def v2Fingerprints(docs: DataFrame): DataFrame = {
    val v2base = docs.filter(draw("vdrop", 20L) =!= 0)
      .select(col("doc_id"), col("source").as("s2"),
        md5(when(draw("vmod", 10L) === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("h2"))
    val v2added = docs.filter(draw("vadd", 25L) === 0)
      .select((col("doc_id") + lit(AddedIdOffset)).as("doc_id"),
        col("source").as("s2"), md5(concat(col("text"), lit(" new"))).as("h2"))
    v2base.unionByName(v2added)
  }

  /** Diff rollup over two (doc_id, source, hash) relations. */
  private def diffOf(v1: DataFrame, v2: DataFrame): DataFrame =
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(coalesce(col("s1"), col("s2")).as("source"),
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") === col("h2"), lit("unchanged"))
          .otherwise(lit("changed")).as("st"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("st") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("st") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("st") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("st") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
      .orderBy("source")

  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog(spark, dir).ref("documents")
      .select(col("doc_id"), col("source"), col("text"))
    val v1 = docs.select(col("doc_id"), col("source").as("s1"),
      md5(col("text")).as("h1"))
    diffOf(v1, v2Fingerprints(docs))
  }

  // ---- manifest-based (incremental) diff ------------------------------------

  /** Persist a release MANIFEST: the (doc_id, source, md5) scan
    * reduction, ~40 bytes/doc. Every future diff against this version
    * reads the manifest instead of re-scanning and re-hashing the old
    * corpus — at 100 TB that is the difference between diffing two
    * corpora and diffing one corpus against a table 1000× smaller.
    * Write it once per release, at release time (the text is already
    * streaming through the shard writer then — the hash is free).
    */
  def writeManifest(docs: DataFrame, path: String): Unit =
    docs.select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      .write.mode("overwrite").parquet(path)

  /** Diff a new corpus against a persisted manifest: the old side costs
    * a manifest read (no text, no hashing), the new side one
    * fingerprint scan — then the same doc_id equi-join + |sources|-row
    * rollup as [[corpusDiff]].
    */
  def diffAgainstManifest(spark: SparkSession, manifestPath: String,
      newFps: DataFrame): DataFrame = {
    val v1 = spark.read.parquet(manifestPath)
      .select(col("doc_id"), col("source").as("s1"), col("h").as("h1"))
    diffOf(v1, newFps)
  }

  /** Registered `corpus_diff_incremental`: write the v1 manifest, then
    * diff the derived v2 against it WITHOUT touching v1's text again —
    * result identical to [[corpusDiff]] (the oracle reuses its SQL), so
    * the hash match proves manifest-based ≡ rescan-based.
    */
  def corpusDiffIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog(spark, dir).ref("documents")
      .select(col("doc_id"), col("source"), col("text"))
    val manifest = java.nio.file.Files.createTempDirectory("corpus_manifest").toString
    try {
      writeManifest(docs, s"$manifest/v1")
      diffAgainstManifest(spark, s"$manifest/v1", v2Fingerprints(docs))
        .localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(manifest)
  }

  val corpusDiffSql: String =
    s"""WITH d AS (SELECT doc_id, source, text FROM documents),
       |v1 AS (SELECT doc_id, source AS s1, md5(text) AS h1 FROM d),
       |v2 AS (
       |  SELECT doc_id, source AS s2,
       |         md5(CASE WHEN md5_number_lower('vmod:' || CAST(doc_id AS VARCHAR)) % 10 = 0
       |               THEN text || ' rev2' ELSE text END) AS h2
       |  FROM d
       |  WHERE md5_number_lower('vdrop:' || CAST(doc_id AS VARCHAR)) % 20 <> 0
       |  UNION ALL
       |  SELECT doc_id + $AddedIdOffset, source, md5(text || ' new')
       |  FROM d
       |  WHERE md5_number_lower('vadd:' || CAST(doc_id AS VARCHAR)) % 25 = 0),
       |j AS (
       |  SELECT COALESCE(s1, s2) AS source,
       |         CASE WHEN h1 IS NULL THEN 'added'
       |              WHEN h2 IS NULL THEN 'removed'
       |              WHEN h1 = h2 THEN 'unchanged'
       |              ELSE 'changed' END AS st
       |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
       |SELECT source,
       |       CAST(sum(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       |       CAST(sum(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |       CAST(sum(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       |       CAST(sum(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
       |FROM j GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_diff" -> (corpusDiff _),
    "corpus_diff_incremental" -> (corpusDiffIncremental _))

  val oracles: Map[String, String] = Map(
    "corpus_diff" -> corpusDiffSql,
    "corpus_diff_incremental" -> corpusDiffSql)
}
