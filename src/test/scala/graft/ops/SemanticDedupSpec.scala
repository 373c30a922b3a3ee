package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** 120 random vectors + a near-copy of each of the first 6 — the
    * planted copies must collapse onto their originals.
    */
  private def plantedDir(): String = {
    val rnd = new scala.util.Random(23)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 120).map(i => (i.toLong, vec(), i % 10))
    val planted = (0 until 6).map { i =>
      val v = base(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      ((120 + i).toLong, v, i % 10)
    }
    val dir = tmpDir("semdedup")
    (base ++ planted).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted near-copies are marked duplicates of their originals") {
    val dir = plantedDir()
    val out = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getLong(3))).toMap
    // a near-copy dedups onto its original iff they land in the same
    // cell; with a copy this close (cosine ~0.9999) they always do
    (0 until 6).foreach { i =>
      val (isDup, dupOf) = out(120L + i)
      assert(isDup, s"planted copy ${120 + i} not marked duplicate")
      assert(dupOf === i.toLong, s"copy ${120 + i} deduped onto $dupOf, not $i")
    }
    // originals are keepers: nothing earlier can be >= tau-similar
    (0 until 6).foreach(i => assert(!out(i.toLong)._1, s"original $i marked dup"))
  }

  test("every row is returned with a cell id; non-dups carry the -1 sentinel") {
    val dir = plantedDir()
    val out = Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = 0.95, iters = 2)
    assert(out.count() === 126)
    assert(out.filter(!col("is_dup") && col("dup_of") =!= -1L).count() === 0)
    assert(out.filter(col("is_dup") && col("dup_of") === -1L).count() === 0)
    assert(out.filter(col("cid") < 0 || col("cid") >= 8).count() === 0)
  }

  test("duplicates always point at an EARLIER keeper in the same cell") {
    val out = Similarity.semanticDedup(spark, sf).cache()
    val dups = out.filter(col("is_dup"))
    assert(dups.filter(col("dup_of") >= col("vec_id")).count() === 0)
    // dup_of is a member of the same cell
    val cells = out.select(col("vec_id").as("dup_of"), col("cid").as("rep_cid"))
    assert(dups.join(cells, "dup_of")
      .filter(col("cid") =!= col("rep_cid")).count() === 0)
  }

  test("tau = 1.0 keeps everything except exact copies; tau tightens monotonically") {
    val dir = plantedDir()
    def nDups(tau: Double): Long =
      Similarity.semanticDedupAt(spark, dir, kCells = 8, tau = tau, iters = 2)
        .filter(col("is_dup")).count()
    val loose = nDups(0.8)
    val tight = nDups(0.99)
    assert(loose >= tight, s"tau=0.8 dropped $loose < tau=0.99 dropped $tight")
    assert(tight >= 6) // the planted copies sit near cosine 1.0
  }
}
