package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkTestBase {
  import spark.implicits._

  private val ConfKey = "spark.graft.rangeJoin.bandWidth"

  /** Run `f` with the rule installed and the band width set. */
  private def withRule[A](w: Long)(f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinBandingRule(spark)
    spark.conf.set(ConfKey, w.toString)
    try f finally {
      spark.conf.unset(ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[RangeJoinBandingRule])
    }
  }

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def intervals = Seq((1L, 0L, 30L), (2L, 25L, 40L), (3L, 100L, 100L))
    .toDF("iid", "s", "e")
  private def points = Seq((10L, 5L), (11L, 29L), (12L, 35L), (13L, 100L))
    .toDF("pid", "d")

  private val expected = Seq((10L, 1L), (11L, 1L), (11L, 2L), (12L, 2L)).sorted

  test("SQL inequality join rewrites to a banded equi-join with identical results") {
    intervals.createOrReplaceTempView("ivl")
    points.createOrReplaceTempView("pts")
    val sql = "SELECT pid, iid FROM pts JOIN ivl ON d >= s AND d < e"
    val baseline = spark.sql(sql) // rule off: nested-loop join
    assert(plan(baseline).contains("BroadcastNestedLoopJoin"))
    assert(baseline.as[(Long, Long)].collect().toSeq.sorted === expected)
    withRule(16) {
      val rewritten = spark.sql(sql)
      val p = plan(rewritten)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rule did not rewrite:\n$p")
      assert(p.contains("__band"), s"band key missing:\n$p")
      assert(rewritten.as[(Long, Long)].collect().toSeq.sorted === expected)
    }
  }

  test("operand orientation variants all rewrite (s <= d, e > d)") {
    intervals.createOrReplaceTempView("ivl")
    points.createOrReplaceTempView("pts")
    withRule(16) {
      val rewritten = spark.sql(
        "SELECT pid, iid FROM pts JOIN ivl ON s <= d AND e > d")
      assert(!plan(rewritten).contains("BroadcastNestedLoopJoin"))
      assert(rewritten.as[(Long, Long)].collect().toSeq.sorted === expected)
    }
  }

  test("random data: rewritten join matches the nested-loop result exactly") {
    val rnd = new scala.util.Random(59)
    val ivl = Seq.tabulate(80) { i =>
      val s = rnd.nextInt(1000).toLong - 500
      (i.toLong, s, s + rnd.nextInt(50).toLong)
    }
    val pts = Seq.tabulate(300)(i => (1000L + i, rnd.nextInt(1200).toLong - 600))
    val naive = (for {
      (pid, d) <- pts; (iid, s, e) <- ivl if d >= s && d < e
    } yield (pid, iid)).sorted
    ivl.toDF("iid", "s", "e").createOrReplaceTempView("ivl_r")
    pts.toDF("pid", "d").createOrReplaceTempView("pts_r")
    withRule(13) {
      val got = spark.sql("SELECT pid, iid FROM pts_r JOIN ivl_r ON d >= s AND d < e")
      assert(!plan(got).contains("BroadcastNestedLoopJoin"))
      assert(got.as[(Long, Long)].collect().toSeq.sorted === naive)
    }
  }

  test("joins that already have an equi-key are left untouched") {
    withRule(16) {
      val l = Seq((1L, 5L)).toDF("k", "d")
      val r = Seq((1L, 0L, 10L)).toDF("k2", "s", "e")
      val joined = l.join(r, col("k") === col("k2") &&
        col("d") >= col("s") && col("d") < col("e"))
      assert(!plan(joined).contains("__band"), "equi-join must not be rewritten")
      assert(joined.count() === 1)
    }
  }

  test("rule is inert without the band-width conf") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinBandingRule(spark)
    try {
      intervals.createOrReplaceTempView("ivl")
      points.createOrReplaceTempView("pts")
      val df = spark.sql("SELECT pid, iid FROM pts JOIN ivl ON d >= s AND d < e")
      assert(plan(df).contains("BroadcastNestedLoopJoin"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[RangeJoinBandingRule])
    }
  }

  test("an unrelated long inequality before the range predicates does not shadow the pair") {
    intervals.createOrReplaceTempView("ivl")
    points.createOrReplaceTempView("pts")
    withRule(16) {
      // `pid > 10` is a long-typed inequality conjunct written FIRST: a
      // collectFirst binding would grab it as the upper bound and skip
      // the rewrite; the all-pairs search must still find (d, s, e).
      val df = spark.sql(
        "SELECT pid, iid FROM pts JOIN ivl ON pid > 10 AND d >= s AND d < e")
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"rule did not rewrite:\n$p")
      assert(df.as[(Long, Long)].collect().toSeq.sorted ===
        expected.filter(_._1 > 10))
    }
  }

  test("maxBandsPerInterval collapses open-ended intervals to a sentinel band") {
    // one open-ended interval that would explode into ~6M band rows at
    // w=16; with the cap it emits a single sentinel row instead
    val ivl = (Seq((1L, 0L, 30L), (2L, 25L, 40L), (3L, 0L, 100000000L)))
      .toDF("iid", "s", "e")
    ivl.createOrReplaceTempView("ivl_cap")
    points.createOrReplaceTempView("pts")
    val naive = Seq((10L, 1L), (10L, 3L), (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 2L), (12L, 3L), (13L, 3L)).sorted
    withRule(16) {
      spark.conf.set("spark.graft.rangeJoin.maxBandsPerInterval", "64")
      try {
        val df = spark.sql("SELECT pid, iid FROM pts JOIN ivl_cap ON d >= s AND d < e")
        val p = plan(df)
        assert(!p.contains("BroadcastNestedLoopJoin"), s"rule did not rewrite:\n$p")
        assert(p.contains("__band_big"), s"sentinel key missing:\n$p")
        assert(df.as[(Long, Long)].collect().toSeq.sorted === naive)
      } finally spark.conf.unset("spark.graft.rangeJoin.maxBandsPerInterval")
    }
  }

  test("capped rewrite matches nested-loop results on random data with huge intervals") {
    val rnd = new scala.util.Random(73)
    val ivl = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(1000).toLong - 500
      val len = if (i % 10 == 0) 50000000L else rnd.nextInt(50).toLong
      (i.toLong, s, s + len)
    }
    val pts = Seq.tabulate(200)(i => (1000L + i, rnd.nextInt(1200).toLong - 600))
    val naive = (for {
      (pid, d) <- pts; (iid, s, e) <- ivl if d >= s && d < e
    } yield (pid, iid)).sorted
    ivl.toDF("iid", "s", "e").createOrReplaceTempView("ivl_c2")
    pts.toDF("pid", "d").createOrReplaceTempView("pts_c2")
    withRule(13) {
      spark.conf.set("spark.graft.rangeJoin.maxBandsPerInterval", "32")
      try {
        val got = spark.sql("SELECT pid, iid FROM pts_c2 JOIN ivl_c2 ON d >= s AND d < e")
        assert(!plan(got).contains("BroadcastNestedLoopJoin"))
        assert(got.as[(Long, Long)].collect().toSeq.sorted === naive)
      } finally spark.conf.unset("spark.graft.rangeJoin.maxBandsPerInterval")
    }
  }

  test("extra non-equi conjuncts ride along in the rewritten condition") {
    intervals.createOrReplaceTempView("ivl")
    points.createOrReplaceTempView("pts")
    withRule(16) {
      val df = spark.sql(
        "SELECT pid, iid FROM pts JOIN ivl ON d >= s AND d < e AND pid + iid > 11")
      assert(!plan(df).contains("BroadcastNestedLoopJoin"))
      assert(df.as[(Long, Long)].collect().toSeq.sorted ===
        expected.filter { case (p, i) => p + i > 11 })
    }
  }
}
