package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("pointInInterval matches a naive cross-join reference on random data") {
    val rnd = new scala.util.Random(41)
    val intervals = Seq.tabulate(150) { i =>
      val s = rnd.nextInt(2000).toLong - 1000 // negative starts too
      (i.toLong, s, s + rnd.nextInt(40).toLong) // includes empty (len 0)
    }
    val points = Seq.tabulate(400)(i => (1000L + i, rnd.nextInt(2200).toLong - 1100))
    val expected = (for {
      (pid, d) <- points
      (iid, s, e) <- intervals if d >= s && d < e
    } yield (pid, iid)).sorted
    val got = RangeJoin.pointInInterval(
        points.toDF("pid", "d"), intervals.toDF("iid", "s", "e"),
        "d", "s", "e", bandWidth = 16)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    assert(got === expected)
  }

  test("each matching (point, interval) pair is emitted exactly once") {
    // one interval spanning many bands; the point lies in exactly one band
    val intervals = Seq((1L, 0L, 1000L)).toDF("iid", "s", "e")
    val points = Seq((1L, 500L), (2L, 999L), (3L, 1000L)).toDF("pid", "d")
    val got = RangeJoin.pointInInterval(points, intervals, "d", "s", "e", 7)
      .select("pid").as[Long].collect().toSeq.sorted
    assert(got === Seq(1L, 2L)) // end is exclusive: 1000 does not match
  }

  test("empty and inverted intervals match nothing") {
    val intervals = Seq((1L, 5L, 5L), (2L, 9L, 3L)).toDF("iid", "s", "e")
    val points = Seq((1L, 5L), (2L, 4L)).toDF("pid", "d")
    assert(RangeJoin.pointInInterval(points, intervals, "d", "s", "e", 4).isEmpty)
  }

  test("the physical plan is an equi-join on the band, not a nested loop") {
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val points = Seq((1L, 5L)).toDF("pid", "d")
    val plan = RangeJoin.pointInInterval(points, intervals, "d", "s", "e", 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested-loop join in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in plan:\n$plan")
    assert(plan.contains("__band"), s"band key missing from join plan:\n$plan")
  }

  test("j6 oracle query: every count reflects points inside the week") {
    val out = RangeJoin.j6RangeJoin(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_shipped") > 0))
  }
}
