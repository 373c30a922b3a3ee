package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {

  test("linkGraph: no self-loops, every node has out- and in-edges") {
    val e = Graph.linkGraph(spark, sf).cache()
    assert(e.filter(col("src") === col("dst")).count() === 0)
    val srcs = e.select("src").distinct().count()
    val dsts = e.select("dst").distinct().count()
    val n = graft.catalog.Catalog(spark, sf).ref("documents").count()
    assert(srcs === n, "every node must keep >=1 out-edge (no dangling)")
    assert(dsts === n, "the 7i+3 bijection must give every node an in-edge")
    e.unpersist()
  }

  test("pageRank: mass conserved, ranks differentiate, matches a Scala fold") {
    val edges = Graph.linkGraph(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = Graph.graphPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // no dangling nodes -> total rank mass is exactly the teleport fixed
    // point: sum r = (1-d) + d * sum r = 1
    val mass = out.values.sum
    assert(math.abs(mass - 1.0) < 1e-9, s"rank mass drifted: $mass")
    assert(out.values.toSet.size > 10, "irregular graph must separate ranks")
    // plain-Scala power iteration with the engine's exact float contract
    // (sorted left fold of contributions) must be bit-identical
    val n = out.size
    val outDeg = edges.groupBy(_._1).map { case (s, es) => (s, es.length) }
    val inEdges = edges.groupBy(_._2)
    var r = out.keys.map(k => (k, 1.0 / n)).toMap
    for (_ <- 1 to 5) {
      r = r.keys.map { v =>
        val contribs = inEdges.getOrElse(v, Array.empty[(Long, Long)])
          .map { case (u, _) => r(u) / outDeg(u) }.sorted
        (v, (1 - 0.85) / n + 0.85 * contribs.foldLeft(0.0)(_ + _))
      }.toMap
    }
    out.foreach { case (node, rank) =>
      assert(rank === r(node), s"node $node: engine $rank vs reference ${r(node)}")
    }
  }

  test("pageRank: dangling nodes leak mass per the documented contract, never crash") {
    import spark.implicits._
    // 0->1, 0->2, 1->0; node 2 is dangling (in-edges only)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 10, damping = 0.85).collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(r.size === 3)
    assert(r.values.forall(_ > 0.0), s"ranks must stay positive: $r")
    val mass = r.values.sum
    assert(mass < 1.0 && mass > 0.3,
      s"dangling node leaks mass (documented), within teleport bounds: $mass")
    assert(r(0L) > r(2L), "the recirculating node must outrank the sink")
  }

  test("pageRank: rank order follows in-degree structure") {
    // nodes hit by many quadratic-residue sources must outrank the
    // odd-only-starved ones on average; check the extremes correlate
    val ranks = Graph.graphPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val inDeg = Graph.linkGraph(spark, sf).groupBy("dst")
      .agg(count(lit(1)).as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val byRank = ranks.sortBy(-_._2)
    val topDeg = byRank.take(20).map(x => inDeg.getOrElse(x._1, 0L)).sum
    val botDeg = byRank.takeRight(20).map(x => inDeg.getOrElse(x._1, 0L)).sum
    assert(topDeg > botDeg, s"top-ranked nodes must be better-linked: $topDeg vs $botDeg")
  }
}
