package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for the slow bench queries (not part of the
  * driver contract; run with `sbt "runMain graft.Profile"`).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    import org.apache.spark.sql.functions._
    import graft.catalog.Catalog
    val c = Catalog(spark, sfDir)

    val toksC = split(trim(lower(col("text"))), "\\s+")
    val dsArr = c.ref("documents")
      .select(col("doc_id"), toksC.as("toks"))
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), greatest(size(col("toks")) - 2, lit(0))),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))).as("shingles"))
    time("docShingles-arr")(dsArr.count())

    val numHashes = 64; val bands = 16; val rowsPerBand = 4
    val sig = dsArr.select(col("doc_id"),
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(col("shingles"), s => xxhash64(i, s)))).as("sig"))
    time("sig")(sig.count())
    val sigC = sig.localCheckpoint()
    time("sig-checkpointed-count")(sigC.count())

    val banded = sigC.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit("band"), b,
          slice(col("sig"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("banded")(banded.count())

    val a = banded.as("a"); val b = banded.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
    time("cand-raw")(cand.count())
    val candD = cand.dropDuplicates("id1", "id2")
    time("cand-dedup")(candD.count())

    val s1 = sigC.select(col("doc_id").as("id1"), col("sig").as("sig1"))
    val s2 = sigC.select(col("doc_id").as("id2"), col("sig").as("sig2"))
    val est = candD.join(s1, "id1").join(s2, "id2")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y), v => v))
          .cast("double") / numHashes.toDouble)
      .filter(col("est_jaccard") >= 0.5)
    time("est-filter")(est.count())
    time("full-minhash")(ops.Dedup.minhashLsh(spark, sfDir).count())
    time("full-ngram")(ops.Dedup.ngramJaccard(spark, sfDir).count())
    time("full-neardup")(ops.Similarity.embeddingNearDup(spark, sfDir).count())
    time("full-simhash")(ops.Dedup.simhash(spark, sfDir).count())

    spark.stop()
  }
}
