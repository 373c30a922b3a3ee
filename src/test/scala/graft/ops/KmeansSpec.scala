package graft.ops

import graft.SparkTestBase

class KmeansSpec extends SparkTestBase {

  test("every vector is assigned exactly once to a cluster in [0, k)") {
    val out = Kmeans.kmeansAt(spark, sf, k = 8, iters = 2, mergeable = false)
      .collect()
    assert(out.length === 500)
    assert(out.map(_.getLong(0)).distinct.length === 500)
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 8))
    assert(out.forall(_.getDouble(2) >= 0.0))
  }

  test("Lloyd monotonicity: inertia is non-increasing in iteration count") {
    // Each iteration's assignment and update both weakly decrease the
    // objective, so total within-cluster squared distance after i+1
    // iterations can never exceed the total after i.
    val inertias = (0 to 3).map { i =>
      Kmeans.kmeansAt(spark, sf, k = 8, iters = i, mergeable = false)
        .collect().map(_.getDouble(2)).sum
    }
    inertias.zip(inertias.tail).foreach { case (a, b) =>
      assert(b <= a + 1e-9, s"inertia rose across an iteration: $inertias")
    }
    // and the iterations actually move: 3 iterations beat pure init
    assert(inertias.last < inertias.head)
  }

  test("mergeable ExactDoubleSum path agrees with the oracle fold path") {
    // The two centroid accumulations differ only in last-ulp rounding;
    // assignments flip only if a vector is ulp-close to two centroids,
    // which the testdata corpus does not contain.
    val fold = Kmeans.kmeansAt(spark, sf, k = 8, iters = 3, mergeable = false)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val merg = Kmeans.kmeansAt(spark, sf, k = 8, iters = 3, mergeable = true)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(fold === merg)
  }

  test("k exceeding the corpus degrades to one cluster per vector") {
    // sf0.001 has 500 vectors; ask for more centroids than the LIMIT can
    // seed and the effective k is the corpus size — every vector then
    // sits on its own centroid with dist2 = 0 after one update.
    val out = Kmeans.kmeansAt(spark, sf, k = 600, iters = 1, mergeable = false)
      .collect()
    assert(out.length === 500)
    assert(out.forall(_.getDouble(2) === 0.0))
    assert(out.map(_.getInt(1)).distinct.length === 500)
  }

  test("assignment is scan-local: the final plan has no join and no hash shuffle") {
    val df = Kmeans.kmeansAt(spark, sf, k = 8, iters = 1, mergeable = false)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    assert(!"Exchange hashpartitioning".r.findAllIn(plan).hasNext,
      s"assignment must be scan work (only the output sort may exchange):\n$plan")
  }
}
