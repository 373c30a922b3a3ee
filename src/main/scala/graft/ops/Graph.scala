package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Link-graph analytics for corpus curation. A 100 TB web-scale corpus
  * carries a link graph, and graph centrality is a standard quality
  * signal for training-data selection (harvest pages whose PageRank is
  * high, down-weight link farms). The reference has no graph operator —
  * this is extension scope like the dedup/similarity families.
  *
  * Engine-parity design: one PageRank iteration is
  * `r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/outdeg(u)`; the Σ is the only
  * order-sensitive float op. The repo's usual decimal-accumulation
  * pattern is NOT enough here: Spark casts double→decimal via exact
  * BigDecimal expansion while DuckDB rounds through a double multiply,
  * and at scale 18 the two differ in the last ulp (measured). Instead
  * the Σ is a SORTED LEFT FOLD over the group's doubles —
  * `aggregate(array_sort(collect_list(x)), 0.0, +)` in Spark,
  * `list_reduce(list_sort(list(x)), +)` in DuckDB — identical addition
  * order, identical IEEE ops, bit-identical ranks. Caveat the fold
  * inherits from collect_list: a group must fit in memory, i.e.
  * per-node IN-degree is bounded. That is true for every fixture but
  * NOT for a web graph, where a hub with 10^7 in-links would
  * materialize a 10^7-element array in one aggregation buffer — so
  * `hubSafe = true` swaps the fold for [[graft.functions.ExactDoubleSum]],
  * a mergeable O(1)-buffer exact-decimal accumulator (map-side partial
  * aggregation; the hub's adds spread across its input partitions).
  * The exact sum is order-independent and correctly rounded — at least
  * as accurate as the fold, equal to it within float tolerance (a
  * GraphSpec case pins this on the fixture); the fold stays the
  * default only because the cross-engine oracle hash pins ITS exact
  * rounding sequence.
  *
  * Scale shape (power iteration on a 1000-executor cluster):
  *  - edges are joined by `src` and re-aggregated by `dst` every
  *    iteration — two shuffles per iteration, the canonical PageRank
  *    cost. The edge relation (with its outdeg) is computed ONCE and
  *    pinned; only the |V|-row rank table moves between iterations.
  *  - rank lineage is cut per iteration with a lazy `localCheckpoint`
  *    (the dedup_clusters pattern): without it the plan doubles per
  *    round and the optimizer re-derives the whole prefix.
  *  - no driver-side state beyond the scalar |V|; ranks never collect.
  */
object Graph {

  /** General power-iteration PageRank over an `(src: long, dst: long)`
    * edge list. Nodes are the union of endpoints; nodes without
    * in-edges receive the teleport mass `(1-d)/N` (the left join +
    * coalesce).
    *
    * `hubSafe = true` replaces the per-dst sorted fold (whole in-edge
    * contribution list in one aggregation buffer — OOM on a web-scale
    * hub) with the mergeable exact-decimal accumulator; see the object
    * scaladoc for the parity contract.
    *
    * `danglingSink = true` conserves mass: each iteration the total
    * rank held by dangling nodes (no out-edges) is redistributed
    * uniformly — `r'(v) = (1-d)/N + d·(Σ contribs + DM/N)` with
    * `DM = Σ_{u dangling} r(u)`, the standard sink convention. DM is a
    * 1-row aggregate broadcast into the update (one extra |dangling|-row
    * agg per iteration, zero cost when the flag is off). Default off:
    * the fixture graph has no dangling nodes and the oracle pins the
    * leak-by-contract semantics.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      damping: Double,
      hubSafe: Boolean = false,
      danglingSink: Boolean = false): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = false)
    val n = nodes.count()
    val msum: Column => Column =
      if (hubSafe) graft.functions.ExactDoubleSum.exactSum
      else c => aggregate(array_sort(collect_list(c)), lit(0.0), (acc, x) => acc + x)
    // (src, dst, outdeg) — pinned: referenced once per iteration
    val ed = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), Seq("src"))
      .localCheckpoint(eager = false)
    // dangling = nodes with no out-edges; empty unless the caller's
    // graph has sinks, pinned once like the edge relation
    val dangling =
      if (danglingSink)
        nodes.join(edges.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti").localCheckpoint(eager = false)
      else null
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val sums = ed.join(ranks, ed("src") === ranks("node"))
        .select(ed("dst").as("node"), (col("rank") / col("outdeg")).as("contrib"))
        .groupBy("node")
        .agg(msum(col("contrib")).as("msum"))
      var joined = nodes.join(sums, Seq("node"), "left")
      var contribTotal = coalesce(col("msum"), lit(0.0))
      if (danglingSink) {
        // 1-row (null when no dangling nodes) mass scalar, broadcast in
        val dm = ranks.join(dangling, Seq("node"), "left_semi")
          .agg(msum(col("rank")).as("dm"))
        joined = joined.crossJoin(broadcast(dm))
        contribTotal = contribTotal + coalesce(col("dm"), lit(0.0)) / lit(n.toDouble)
      }
      ranks = joined
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * contribTotal).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** The deterministic pseudo-web over `documents`: node i links to
    * `(i²+1) % N` (quadratic — irregular in-degree, residues hit
    * multiple times), `(2i+1) % N` (odd targets only — even nodes get
    * no mass from this family), and `(7i+3) % N` (a bijection for the
    * testdata Ns, so every node keeps ≥1 in-edge). Self-loops dropped,
    * duplicate targets collapsed (UNION semantics in the twin). The
    * `7i+3` family never self-loops (6i ≡ -3 has no solution mod an
    * even N), so no node is dangling.
    */
  def linkGraph(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog(spark, dir).ref("documents").select(col("doc_id"))
    // row count of an immutable base table — the memoized metastore
    // statistic (one job per session, not one per pagerank row per pass)
    val n = Catalog.cachedRowCount(spark, dir, "documents")
    def e(dst: Column) = docs.select(col("doc_id").as("src"), (dst % n).as("dst"))
    e(col("doc_id") * col("doc_id") + 1)
      .union(e(col("doc_id") * 2 + 1))
      .union(e(col("doc_id") * 7 + 3))
      .distinct()
      .filter(col("src") =!= col("dst"))
  }

  /** Oracle query: 5 damping-0.85 iterations over [[linkGraph]], every
    * node's rank. 5 is past the interesting transient (ranks separate
    * by in-degree structure) while keeping the DuckDB twin's unrolled
    * CTE chain readable.
    */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame =
    pageRank(linkGraph(spark, dir), iters = 5, damping = 0.85)
      .orderBy("node")

  /** The twin unrolls the 5 iterations as r0..r5 CTEs; each stage is
    * the same left-join-coalesce expression tree as the engine's, with
    * the identical decimal(38,18) accumulation.
    */
  val graphPagerankSql: String = {
    def iter(k: Int): String =
      s"""r$k AS (
         |  SELECT nodes.node,
         |         (1 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nc)
         |           + CAST(0.85 AS DOUBLE) * COALESCE(s.msum, 0.0) AS rank
         |  FROM nodes LEFT JOIN (
         |    SELECT ed.dst AS node,
         |           list_reduce(list_sort(list(r.rank / ed.outdeg)), (p, q) -> p + q) AS msum
         |    FROM ed JOIN r${k - 1} r ON ed.src = r.node
         |    GROUP BY 1) s ON nodes.node = s.node)""".stripMargin
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       |e0 AS (
       |  SELECT doc_id AS src, (doc_id * doc_id + 1) % (SELECT n FROM nn) AS dst FROM documents
       |  UNION
       |  SELECT doc_id, (doc_id * 2 + 1) % (SELECT n FROM nn) FROM documents
       |  UNION
       |  SELECT doc_id, (doc_id * 7 + 3) % (SELECT n FROM nn) FROM documents),
       |e AS (SELECT src, dst FROM e0 WHERE src <> dst),
       |ed AS (SELECT e.src, e.dst, d.outdeg
       |       FROM e JOIN (SELECT src, count(*) AS outdeg FROM e GROUP BY 1) d USING (src)),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nc AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nc) AS rank FROM nodes),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT node, rank FROM r5 ORDER BY node""".stripMargin
  }

  /** [[linkGraph]] with PLANTED SINKS: every node with doc_id % 17 == 0
    * loses all its out-edges (they keep their in-edges through the
    * other families, so they hold rank but forward none) — the dangling
    * case a real web graph always has and the base fixture deliberately
    * lacks. Node set = endpoints of the FILTERED edges, identically in
    * both engines.
    */
  def linkGraphSink(spark: SparkSession, dir: String): DataFrame =
    linkGraph(spark, dir).filter(col("src") % 17 =!= 0)

  /** Oracle row for the dangling-mass convention: 5 iterations over the
    * planted-sink graph with `danglingSink = true` — each iteration
    * redistributes the sink-held mass uniformly
    * (`r' = (1-d)/N + d·(Σ contribs + DM/N)`), so total rank stays 1
    * instead of leaking d·DM per round. GraphSpec asserts the
    * conservation on both this row's engine output and (via the hash
    * match) the twin.
    */
  def graphPagerankSink(spark: SparkSession, dir: String): DataFrame =
    pageRank(linkGraphSink(spark, dir), iters = 5, damping = 0.85,
      danglingSink = true)
      .orderBy("node")

  /** Twin of [[graphPagerankSink]]: the unrolled chain with the DM/N
    * term — DM is the same sorted fold over the previous round's
    * dangling ranks the engine computes, added before the damping
    * multiply in the identical expression order.
    */
  val graphPagerankSinkSql: String = {
    def iter(k: Int): String =
      s"""rs$k AS (
         |  SELECT nodes.node,
         |         (1 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nc)
         |           + CAST(0.85 AS DOUBLE)
         |             * (COALESCE(s.msum, 0.0)
         |                + COALESCE(dm$k.dm, 0.0) / (SELECT n FROM nc)) AS rank
         |  FROM nodes
         |  LEFT JOIN (
         |    SELECT ed.dst AS node,
         |           list_reduce(list_sort(list(r.rank / ed.outdeg)), (p, q) -> p + q) AS msum
         |    FROM ed JOIN rs${k - 1} r ON ed.src = r.node
         |    GROUP BY 1) s ON nodes.node = s.node
         |  CROSS JOIN (
         |    SELECT list_reduce(list_sort(list(r.rank)), (p, q) -> p + q) AS dm
         |    FROM rs${k - 1} r JOIN dangling d ON r.node = d.node) dm$k)""".stripMargin
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       |e0 AS (
       |  SELECT doc_id AS src, (doc_id * doc_id + 1) % (SELECT n FROM nn) AS dst FROM documents
       |  UNION
       |  SELECT doc_id, (doc_id * 2 + 1) % (SELECT n FROM nn) FROM documents
       |  UNION
       |  SELECT doc_id, (doc_id * 7 + 3) % (SELECT n FROM nn) FROM documents),
       |e1 AS (SELECT src, dst FROM e0 WHERE src <> dst),
       |e AS (SELECT src, dst FROM e1 WHERE src % 17 <> 0),
       |ed AS (SELECT e.src, e.dst, d.outdeg
       |       FROM e JOIN (SELECT src, count(*) AS outdeg FROM e GROUP BY 1) d USING (src)),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |dangling AS (SELECT node FROM nodes EXCEPT SELECT DISTINCT src FROM e),
       |nc AS (SELECT count(*) AS n FROM nodes),
       |rs0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nc) AS rank FROM nodes),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT node, rank FROM rs5 ORDER BY node""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _),
    "graph_pagerank_sink" -> (graphPagerankSink _))

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> graphPagerankSql,
    "graph_pagerank_sink" -> graphPagerankSinkSql)
}
