package graft.push

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  test("M4: first run writes all, later runs append only rows past the watermark") {
    val path = tmpDir("incr") + "/rollup"
    val t = new IncrementalTable(spark, path, "d")
    def mk(upTo: Int) = (1 to upTo).map(i => (i, s"row$i")).toDF("d", "v")

    t.run(mk(5))
    assert(t.read().count() === 5)

    // Second run sees 8 rows; only d in (6,7,8) pass the watermark filter.
    t.run(mk(8))
    assert(t.read().count() === 8)
    assert(t.read().select("d").distinct().count() === 8) // no dup appends

    // A run with nothing new appends nothing.
    t.run(mk(8))
    assert(t.read().count() === 8)

    t.fullRefresh(mk(3))
    assert(t.read().count() === 3)
  }
}
