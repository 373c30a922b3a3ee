package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Range (interval) join — the second time-domain operator Spark lacks
  * natively, next to [[AsOf]]: match every point `p` to every interval
  * `[start, end)` that contains it.
  *
  * The naive plan `p >= start AND p < end` has no equi-key, so Catalyst
  * can only produce a broadcast-nested-loop (or cartesian) join —
  * O(|points|·|intervals|) comparisons, a non-starter at scale. This is
  * the classic *banding* rewrite (the same decomposition Databricks'
  * range-join optimization and PostGIS grid indexes use, expressed with
  * stock operators): pick a band width `w`, replicate each interval onto
  * every band `floor(t/w)` it overlaps, map each point to the single
  * band containing it, equi-join on the band id, and re-check the exact
  * predicate. Each (interval, point) pair meets in exactly one band (the
  * point's), so no dedup pass is needed.
  *
  * Scale shape: one shuffle per side on the band id — a plain
  * distributed hash join. Interval replication factor is
  * `len/w + 1` bands per interval, so pick `w` near the typical interval
  * length: replication stays O(1) while each band pairs only co-located
  * rows. Bands inherit time-skew (a hot day lands in one band); AQE's
  * skew-join split applies since this IS an equi-join — exactly the
  * property the rewrite buys.
  *
  * Domain is integral (epoch days/seconds/millis as `long`). Band ids
  * use exact floor division (pmod-based, negative-safe), computed in
  * double space — exact for |t| < 2^52, far beyond any epoch encoding.
  *
  * The reference has no range join (SURVEY §2.3 "not present"); this is
  * part of the training-data extension surface (event attribution,
  * interval containment).
  *
  * The same rewrite also exists as a Catalyst optimizer rule
  * ([[graft.plans.RangeJoinBandingRule]], injected by
  * `GraftExtensions` / `spark.experimental.extraOptimizations`) that
  * catches the `p >= s AND p < e` shape in arbitrary SQL and applies
  * this banding automatically — use the helper when composing
  * DataFrames, the rule when queries arrive as text.
  */
object RangeJoin {

  /** Exact floor division as a Column (negative-safe; `a - pmod(a,w)` is
    * an exact multiple of `w`, so the double division is error-free for
    * |a| < 2^52).
    */
  private def floorDiv(a: Column, w: Long): Column =
    ((a - pmod(a, lit(w))) / lit(w)).cast("long")

  /** Join `points` to every row of `intervals` whose `[startCol, endCol)`
    * half-open range contains `points(pointCol)`. Empty intervals
    * (end <= start) match nothing. All columns of both inputs are
    * carried (names must not collide).
    *
    * @param bandWidth band size in domain units; choose ~ the typical
    *                  interval length (replication = len/bandWidth + 1).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    // end is exclusive → last covered band is floor((end-1)/w); guarding
    // end > start keeps sequence() ascending (Spark's sequence(a,b) with
    // b < a silently counts DOWN — it must never see that shape).
    val ivl = intervals.filter(col(endCol) > col(startCol))
      .withColumn("__band",
        explode(sequence(floorDiv(col(startCol), bandWidth),
          floorDiv(col(endCol) - 1, bandWidth))))
    val pts = points.withColumn("__band", floorDiv(col(pointCol), bandWidth))
    pts.join(ivl, Seq("__band"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__band")
  }

  /** Oracle-checked query (J6): for each order, how many of the probe
    * line items (a 1/199 sample of `lineitem`, any order) shipped inside
    * the order's first week `[o_orderdate, o_orderdate + 7 days)`.
    * Dates are banded as epoch days with `bandWidth = 7` = the interval
    * length, so every interval lands on at most 2 bands.
    */
  def j6RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val epoch = lit("1970-01-01").cast("date")
    val intervals = c.ref("orders").select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), epoch).cast("long").as("s"))
      .withColumn("e", col("s") + 7)
    val points = c.ref("lineitem")
      .filter(col("l_orderkey") % 199 === 0)
      .select(datediff(col("l_shipdate").cast("date"), epoch).cast("long").as("d"))
    pointInInterval(points, intervals, "d", "s", "e", bandWidth = 7)
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_shipped"))
      .orderBy("o_orderkey")
  }

  val j6RangeJoinSql: String =
    """WITH o AS (SELECT o_orderkey,
      |                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s
      |           FROM orders),
      |p AS (SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
      |      FROM lineitem WHERE l_orderkey % 199 = 0)
      |SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped
      |FROM o JOIN p ON p.d >= o.s AND p.d < o.s + 7
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Oracle-checked query (J6 sentinel variant): same order-week
    * attribution, but every 50th order's interval is OPEN-ENDED — its
    * end is the epoch-day sentinel for 9999-12-31 (2932896), the shape
    * that makes naive banding explode `sequence()` into ~400k band rows
    * per interval. Runs through `spark.sql` TEXT with
    * [[graft.plans.RangeJoinBandingRule]] injected and
    * `maxBandsPerInterval = 4` set, so the oversized intervals take the
    * rule's sentinel-bucket path while the 7-day ones band normally.
    * The DuckDB oracle recomputes the join exactly — this is the
    * correctness proof of the cap path the rule spec alone can't give.
    *
    * The rule injection and confs are scoped to this query: the result
    * is eagerly pinned with `localCheckpoint` under the confs, which are
    * then restored so sibling Verify queries never see band rewriting.
    * Throws if the optimized plan lacks the cap path's probe marker
    * (`__band_pf`) — a silently-not-firing rule must fail the row
    * rather than pass vacuously through the nested-loop plan.
    */
  def j6RangeJoinSentinel(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val epoch = lit("1970-01-01").cast("date")
    c.ref("orders").select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), epoch).cast("long").as("s"))
      .withColumn("e", when(col("o_orderkey") % 50 === 0, lit(2932896L))
        .otherwise(col("s") + 7))
      .createOrReplaceTempView("__rj_intervals")
    c.ref("lineitem").filter(col("l_orderkey") % 199 === 0)
      .select(datediff(col("l_shipdate").cast("date"), epoch).cast("long").as("d"))
      .createOrReplaceTempView("__rj_points")
    val rule = graft.plans.RangeJoinBandingRule(spark)
    val hadRule = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[graft.plans.RangeJoinBandingRule])
    if (!hadRule)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    val prevW = spark.conf.getOption("spark.graft.rangeJoin.bandWidth")
    val prevCap = spark.conf.getOption("spark.graft.rangeJoin.maxBandsPerInterval")
    try {
      spark.conf.set("spark.graft.rangeJoin.bandWidth", "7")
      spark.conf.set("spark.graft.rangeJoin.maxBandsPerInterval", "4")
      val df = spark.sql(
        """SELECT o.o_orderkey, COUNT(*) AS n_shipped
          |FROM __rj_intervals o JOIN __rj_points p
          |  ON p.d >= o.s AND p.d < o.e
          |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin)
      val usedCap = df.queryExecution.optimizedPlan.exists(
        _.output.exists(_.name == "__band_pf"))
      require(usedCap,
        "RangeJoinBandingRule cap path did not fire for j6_range_join_sentinel")
      df.localCheckpoint() // eager: executes under the banding confs
    } finally {
      spark.catalog.dropTempView("__rj_intervals")
      spark.catalog.dropTempView("__rj_points")
      prevW.fold(spark.conf.unset("spark.graft.rangeJoin.bandWidth"))(
        spark.conf.set("spark.graft.rangeJoin.bandWidth", _))
      prevCap.fold(spark.conf.unset("spark.graft.rangeJoin.maxBandsPerInterval"))(
        spark.conf.set("spark.graft.rangeJoin.maxBandsPerInterval", _))
      if (!hadRule)
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  val j6RangeJoinSentinelSql: String =
    """WITH o AS (SELECT o_orderkey,
      |                  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s
      |           FROM orders),
      |oi AS (SELECT o_orderkey, s,
      |              CASE WHEN o_orderkey % 50 = 0 THEN 2932896 ELSE s + 7 END AS e
      |       FROM o),
      |p AS (SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
      |      FROM lineitem WHERE l_orderkey % 199 = 0)
      |SELECT oi.o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped
      |FROM oi JOIN p ON p.d >= oi.s AND p.d < oi.e
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j6_range_join" -> (j6RangeJoin _),
    "j6_range_join_sentinel" -> (j6RangeJoinSentinel _))

  val oracles: Map[String, String] = Map(
    "j6_range_join" -> j6RangeJoinSql,
    "j6_range_join_sentinel" -> j6RangeJoinSentinelSql)
}
