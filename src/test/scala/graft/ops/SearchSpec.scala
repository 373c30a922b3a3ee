package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SearchSpec extends SparkTestBase {

  /** Plain-Scala BM25 with the engine's float contract (same op order,
    * sorted left fold over term scores) — the reference for the log-idf
    * variant the DuckDB oracle can't check (libm).
    */
  private def reference(idf: (Long, Long) => Double, k: Int)
      : Seq[(String, Long, Long, Double)] = {
    val docs = graft.catalog.Catalog(spark, sf).ref("documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)
        .toLowerCase.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        .split("\\s+", -1)))
    val nDocs = docs.length.toLong
    val sumDl = docs.map(_._2.length.toLong).sum
    val avgdl = sumDl.toDouble / nDocs
    val terms = Search.fixtureQueries.map(_._2).distinct
    val tf = docs.flatMap { case (id, ts) =>
      val dl = ts.length.toLong
      ts.filter(terms.contains).groupBy(identity).map {
        case (t, hits) => (t, id, dl, hits.length.toLong)
      }
    }
    val df = tf.groupBy(_._1).map { case (t, xs) => (t, xs.length.toLong) }
    Search.fixtureQueries
      .flatMap { case (q, t) =>
        tf.filter(_._1 == t).map { case (_, id, dl, f) =>
          val tfn = (f * (Search.K1 + 1)) /
            (f + Search.K1 * ((1 - Search.B) + Search.B * (dl / avgdl)))
          ((q, id), idf(nDocs, df(t)) * tfn)
        }
      }
      .groupBy(_._1).toSeq
      .map { case ((q, id), xs) =>
        (q, id, xs.map(_._2).sorted.foldLeft(0.0)(_ + _))
      }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
          .map { case ((q, id, s), i) => (q, id, (i + 1).toLong, s) }
      }
      .sortBy(r => (r._1, r._3))
  }

  test("bm25Log matches a plain-Scala reference bit-for-bit") {
    val engine = Search.bm25Log(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = reference((n, df) => math.log((n - df + 0.5) / (df + 0.5)), 5)
    assert(engine.toSeq === expect)
  }

  test("rational-idf oracle variant ranks identically per single term and bit-matches its own reference") {
    val engine = Search.textBm25(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = reference((n, df) => (n - df + 0.5) / (df + 0.5), 5)
    assert(engine.toSeq === expect)
  }

  test("top-k window plans as WindowGroupLimit (partial top-k before the shuffle)") {
    val df = Search.textBm25(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must push a group limit below the window shuffle:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no quadratic joins:\n$plan")
  }

  test("textKeywords: 3 ranked keywords per doc, scores monotone, WindowGroupLimit fires") {
    val df = Search.textKeywords(spark, sf)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc top-3 must partial-limit before the window shuffle:\n$plan")
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, ks) =>
      assert(ks.length <= 3 && ks.map(_._3).sorted.sameElements(1L to ks.length),
        s"doc $id ranks: ${ks.toSeq}")
      val ordered = ks.sortBy(_._3).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        s"doc $id scores not monotone: ${ordered.toSeq}")
    }
    // idf must matter: the universal filler token never tops a doc that
    // also contains rarer terms (df('a') is corpus-wide)
    val tops = rows.filter(_._3 == 1L).map(_._2)
    assert(tops.count(t => t == "a" || t == "the") < tops.length / 2,
      "high-df fillers must not dominate rank-1 keywords")
  }
  test("chunk BM25: keys decode to real (doc, chunk) pairs and hits contain a query term") {
    val out = Search.chunkBm25(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.col("text")).as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val step = Batching.ChunkLen - Batching.ChunkOverlap
    val queryTerms = Search.fixtureQueries.groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val (qid, key) = (r.getString(0), r.getLong(1))
      val (docId, chunkIdx) = (key / 100000L, key % 100000L)
      assert(docs.contains(docId), s"decoded doc $docId missing")
      val toks = docs(docId).trim.split("\\s+")
      val start = (chunkIdx * step).toInt
      assert(start < toks.length, s"chunk start $start beyond doc ${toks.length}")
      val chunk = toks.slice(start, start + Batching.ChunkLen)
      assert(chunk.exists(queryTerms(qid).contains),
        s"ranked chunk ($docId, $chunkIdx) holds no term of $qid")
    }
  }
  test("chunk BM25: a document exceeding the chunk-key radix raises instead of colliding") {
    import spark.implicits._
    val step = Batching.ChunkLen - Batching.ChunkOverlap
    // n_chunks > ChunkKeyRadix needs > ChunkLen + (radix-1)*step tokens
    val nTokens = Batching.ChunkLen + Search.ChunkKeyRadix.toInt * step + 1
    val sb = new StringBuilder(nTokens * 2)
    var i = 0
    while (i < nTokens) { sb.append("a "); i += 1 }
    val d = tmpDir("chunk_radix")
    Seq((1L, sb.toString)).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val ex = intercept[Throwable] { Search.chunkBm25(spark, d).collect() }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("chunk_key would collide"), s"unexpected failure: $msgs")
  }
}
