package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("asofJoin picks the greatest right time <= left time per key") {
    val left = Seq((1L, 10L, "l10"), (1L, 25L, "l25"), (2L, 5L, "l5"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 8L, "r8"), (1L, 20L, "r20"), (1L, 30L, "r30"), (2L, 9L, "r9"))
      .toDF("k", "t", "rv")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("rv"))
      .orderBy("k", "t").as[(Long, Long, String, String)].collect().toSeq
    assert(out === Seq(
      (1L, 10L, "l10", "r8"),   // 8 <= 10 < 20
      (1L, 25L, "l25", "r20"),  // 20 <= 25 < 30
      (2L, 5L, "l5", null)))    // no right row at or before t=5
  }

  test("asofJoin ties: a right row at exactly the left time matches (<=)") {
    val left = Seq((1L, 10L, "l")).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "r10")).toDF("k", "t", "rv")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("rv")).head()
    assert(out.getAs[String]("rv") === "r10")
  }

  test("asofJoin matches a naive per-row reference on random data") {
    val rnd = new scala.util.Random(13)
    val left = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, s"l$k-$t") }
    val right = Seq.fill(120)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, s"r$k-$t") }
    val expected = left.map { case (k, t, lv) =>
      val m = right.filter(r => r._1 == k && r._2 <= t)
      (k, t, lv, if (m.isEmpty) null else m.maxBy(_._2)._3)
    }.sortBy(x => (x._1, x._2))
    val got = AsOf.asofJoin(
        left.toDF("k", "t", "lv"), right.toDF("k", "t", "rv"), "k", "t", Seq("rv"))
      .orderBy("k", "t").as[(Long, Long, String, String)].collect().toSeq
    assert(got === expected)
  }

  test("asofJoin carries the matched right row atomically (NULL fields survive)") {
    // The matched right row (t=20) has rv2 = NULL; a per-column fill would
    // back-fill rv2 from the older row (t=8), mixing fields of two rows.
    val left = Seq((1L, 25L, "l25")).toDF("k", "t", "lv")
    val right = Seq((1L, 8L, Option("a8"), Option("b8")),
        (1L, 20L, Option("a20"), Option.empty[String]))
      .toDF("k", "t", "rv1", "rv2")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("rv1", "rv2")).head()
    assert(out.getAs[String]("rv1") === "a20")
    assert(out.getAs[String]("rv2") === null)
  }

  test("asofLastSignup: every matched signup is at-or-before the event") {
    val out = AsOf.asofLastSignup(spark, sf).cache()
    assert(out.filter(col("signup_ts") > col("ts")).count() === 0)
    // signup events always match themselves
    assert(out.filter(col("event_type") === "signup" && col("signup_event_id").isNull)
      .count() === 0)
    out.unpersist()
  }

  test("asofJoinForward picks the smallest right time >= left time; ties match") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l10"), (1L, 20L, "l20"), (2L, 5L, "l5"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 30L, "r30"))
      .toDF("k", "t", "rv")
    val got = AsOf.asofJoinForward(left, right, "k", "t", Seq("rv"))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getAs[String]("rv"))))
    assert(got.toSeq === Seq(
      (1L, 10L, Some("r10")), // tie: right row AT the left time matches (>=)
      (1L, 20L, Some("r30")),
      (2L, 5L, None)))        // no right rows for the key -> NULL carry
  }

  test("asofJoinForward matches a naive per-row reference on random data") {
    val rnd = new scala.util.Random(29)
    val left = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, s"l$k-$t") }
    val right = Seq.fill(120)((rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, s"r$k-$t") }
    val expected = left.map { case (k, t, lv) =>
      val m = right.filter(r => r._1 == k && r._2 >= t)
      (k, t, lv, if (m.isEmpty) null else m.minBy(_._2)._3)
    }.sortBy(x => (x._1, x._2))
    val got = AsOf.asofJoinForward(
        left.toDF("k", "t", "lv"), right.toDF("k", "t", "rv"), "k", "t", Seq("rv"))
      .orderBy("k", "t").as[(Long, Long, String, String)].collect().toSeq
    assert(got === expected)
  }

  test("asofNextPurchase: every matched purchase is at-or-after the view") {
    val out = AsOf.asofNextPurchase(spark, sf).cache()
    assert(out.filter(col("purchase_ts") < col("ts")).count() === 0)
    assert(out.count() > 0)
    out.unpersist()
  }
}
