package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ParagraphDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("dedup over the corpus: kept+dropped = total chunks, output sorted") {
    val out = Dedup.paragraphDedup(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() === docs) // every doc survives (possibly emptied)
    assert(out.filter(col("n_dropped") > 0).count() > 0) // teeth
    // chunk conservation: sum(kept + dropped) == total chunk count
    val total = out.agg(sum(col("n_kept") + col("n_dropped"))).head.getLong(0)
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select(ceil(size(split(col("text"), " ")) / 10.0).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(total === expected)
  }

  test("first occurrence wins; later copies lose the shared chunk") {
    // build a tiny corpus in a temp dir shaped like documents.parquet
    val dir = tmpDir("paradedup")
    val shared = (1 to 10).map(i => s"w$i").mkString(" ") // exactly one chunk
    val docs = Seq(
      (0L, s"$shared unique zero tail", "en", "s", 1L),
      (1L, s"$shared unique one tail", "en", "s", 1L),
      (2L, "totally different words here", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Dedup.paragraphDedup(spark, dir)
      .select("doc_id", "text_clean", "n_kept", "n_dropped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) === ((0L, s"$shared unique zero tail", 2L, 0L)))
    assert(out(1) === ((1L, "unique one tail", 1L, 1L))) // shared chunk dropped
    assert(out(2) === ((2L, "totally different words here", 1L, 0L)))
  }

  test("a fully duplicated document is emptied, not deleted") {
    val dir = tmpDir("paradedup")
    val text = (1 to 20).map(i => s"t$i").mkString(" ") // exactly two chunks
    Seq((5L, text, "en", "s", 1L), (9L, text, "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Dedup.paragraphDedup(spark, dir)
      .select("doc_id", "text_clean", "n_kept", "n_dropped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) === ((5L, text, 2L, 0L)))
    assert(out(1) === ((9L, "", 0L, 2L)))
  }

  test("chunk boundaries: a document shorter than one window is one chunk") {
    val dir = tmpDir("paradedup")
    Seq((1L, "just three words", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Dedup.paragraphDedup(spark, dir).head()
    assert(out.getAs[String]("text_clean") === "just three words")
    assert(out.getAs[Long]("n_kept") === 1L)
  }
}
