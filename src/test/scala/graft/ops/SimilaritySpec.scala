package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {

  test("bruteForceTopK: k rows per query, scores descending, in [-1,1]") {
    val out = Similarity.bruteForceTopK(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size === 5)
    byQ.values.foreach { rows =>
      assert(rows.length === 10)
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("lshAnn recovers planted near-identical neighbors (cosine >= 0.95)") {
    // Random-hyperplane LSH has low recall on mid-cosine neighbors by
    // design (that's the point — few candidates); the guarantee worth
    // testing is on truly close vectors. The driver's sf0.001 embeddings
    // have no pairs above cosine 0.48, so plant our own: 200 random
    // vectors, plus a near-copy of each of the 5 query vectors.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 200).map(i => (i.toLong, vec(), i % 10))
    val planted = (0 until 5).map { i =>
      val v = base(i)._2.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
      ((200 + i).toLong, v, i % 10)
    }
    val dir = tmpDir("lsh")
    (base ++ planted).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val close = Similarity.bruteForceTopKAt(spark, dir, nQueries = 5, k = 10)
      .filter(col("score") >= 0.95)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(close.size >= 5, s"expected >=5 planted close pairs, got ${close.size}")
    val approx = Similarity.lshAnnAt(spark, dir, nQueries = 5, k = 10, tables = 8, bits = 8)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = close.count(approx.contains).toDouble / close.size
    assert(recall >= 0.8, s"LSH recall on planted pairs: $recall over ${close.size}")
  }

  test("embeddingNearDup: thresholded and consistent with direct cosine") {
    val out = Similarity.embeddingNearDupAt(spark, sf, 0.9).cache()
    assert(out.filter(col("score") < 0.9).count() === 0)
    assert(out.filter(col("id1") >= col("id2")).count() === 0)
    out.unpersist()
  }

  test("labelCentroids: bit-identical to a plain-Scala sorted fold; full (label, dim) grid") {
    val vecs = graft.catalog.Catalog(spark, sf).ref("embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val engine = Similarity.labelCentroids(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getDouble(2), r.getLong(3)))).toMap
    val dims = vecs.head._2.length
    val byLabel = vecs.groupBy(_._1)
    assert(engine.size === byLabel.size * dims)
    byLabel.foreach { case (label, vs) =>
      (0 until dims).foreach { d =>
        val sorted = vs.map(_._2(d).toDouble).sorted
        val expect = sorted.foldLeft(0.0)(_ + _) / vs.length
        val (got, n) = engine((label, d + 1L))
        assert(n === vs.length.toLong)
        assert(got === expect, s"label $label dim ${d + 1}: $got vs $expect")
      }
    }
  }
  test("rpProject: JL distortion bound holds on real embeddings; deterministic across plans") {
    import graft.functions.RandomProjection.rpProject
    // pairwise squared distances of the first 40 vectors, original vs
    // dOut=32 projection: JL at d=32 gives eps ~ sqrt(8 ln N / d) ~ 0.96
    // worst-case (observed max on this corpus: 0.92); the MEAN sits far
    // inside it -- assert mean < 0.25 and max within the lemma's eps.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 40).orderBy("vec_id")
      .select(col("vec_id"), col("embedding"), rpProject(col("embedding"), 32).as("p"))
      .collect()
      .map(r => (r.getSeq[Float](1).map(_.toDouble).toArray, r.getSeq[Double](2).toArray))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val errs = for {
      i <- emb.indices; jj <- (i + 1) until emb.length
    } yield {
      val orig = d2(emb(i)._1, emb(jj)._1)
      val proj = d2(emb(i)._2, emb(jj)._2)
      math.abs(proj - orig) / orig
    }
    val mean = errs.sum / errs.size
    assert(mean < 0.25, s"mean JL distortion too high: $mean")
    assert(errs.max < 0.96, s"max JL distortion above the lemma bound: ${errs.max}")
    // determinism: a second plan reproduces identical projections
    val again = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 40).orderBy("vec_id")
      .select(rpProject(col("embedding"), 32)).collect()
      .map(_.getSeq[Double](0).toArray)
    emb.map(_._2).zip(again).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }
  test("rpProject: mixed input dimensions throw instead of silently re-deriving signs") {
    import graft.functions.RandomProjection.rpProject
    import spark.implicits._
    val mixed = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(1.0f, 2.0f))) // corrupt: different dimension
      .toDF("vec_id", "embedding")
      .coalesce(1) // one task => one expression instance sees both rows
    val ex = intercept[Throwable] {
      mixed.select(rpProject(col("embedding"), 4)).collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("mixes vector dimensions"), s"unexpected failure: $msgs")
  }
  test("rpProject: evals correctly after a Java-serialization round-trip (executor task binary)") {
    // On a real cluster the expression reaches executors via Java
    // serialization, which nulls the @transient sign-matrix cache and
    // zeroes @transient Ints. The lazy-init sentinel must therefore be
    // `signs == null`, not a cachedDim magic value — this spec freezes
    // that by round-tripping the expression BEFORE first eval.
    import graft.functions.RpProject
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val expr = RpProject(
      BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = false), 4)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(expr); oos.close()
    val thawed = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject().asInstanceOf[RpProject]
    val row = InternalRow(ArrayData.toArrayData(Array(1.0f, -2.0f, 0.5f)))
    val direct = expr.eval(row).asInstanceOf[ArrayData].toDoubleArray()
    val after = thawed.eval(row).asInstanceOf[ArrayData].toDoubleArray()
    assert(after.toSeq === direct.toSeq)
    // and the corrupt-data guard still fires on the thawed copy
    val ex = intercept[IllegalStateException] {
      thawed.eval(InternalRow(ArrayData.toArrayData(Array(1.0f, 2.0f))))
    }
    assert(ex.getMessage.contains("mixes vector dimensions"))
  }
  test("int8 quantization: codes in range, reconstruction within scale/254 per coordinate") {
    val rows = Similarity.int8Quantize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val orig = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 30).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { case (id, j, q, scale) =>
      assert(q >= -127 && q <= 127, s"code out of range: $q")
      val x = orig(id)(j).toDouble
      assert(math.abs(x) <= scale + 1e-12)
      val rec = q * scale / 127.0
      assert(math.abs(x - rec) <= scale / 254.0 + 1e-9,
        s"vec $id dim $j: x=$x rec=$rec scale=$scale")
    }
  }
  test("RRF fusion: consensus outranks single-list items; scores bounded; exact top-1 retained") {
    val fused = Similarity.rrfFusion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fused.groupBy(_._1).size === 5)
    fused.foreach { case (_, _, _, score) =>
      assert(score > 0.0 && score <= 2.0 / 61.0 + 1e-12)
    }
    val bf = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1))).toMap
    val lsh = Similarity.lshAnn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1))).toMap
    // any item on BOTH lists beats any item on one list with the same best rank
    fused.groupBy(_._1).foreach { case (qid, rows) =>
      val both = rows.filter { case (q, _, v, _) => bf.contains((q, v)) && lsh.contains((q, v)) }
      val single = rows.filter { case (q, _, v, _) =>
        bf.contains((q, v)) ^ lsh.contains((q, v)) }
      for {
        (q1, _, v1, s1) <- both
        (q2, _, v2, s2) <- single
        r1 = math.min(bf.getOrElse((q1, v1), 99), lsh.getOrElse((q1, v1), 99))
        r2 = math.min(bf.getOrElse((q2, v2), 99), lsh.getOrElse((q2, v2), 99))
        if r1 <= r2
      } assert(s1 > s2, s"consensus ($qid, $v1) must outrank single-list ($qid, $v2)")
      // the exact ranking's #1 must survive fusion into the top-10
      val exactTop = bf.collect { case ((q, v), 1) if q == qid => v }
      exactTop.foreach(v => assert(rows.exists(_._3 == v),
        s"exact top-1 $v of query $qid lost by fusion"))
    }
  }
}
