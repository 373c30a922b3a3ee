package graft.util

import graft.SparkTestBase

/** Pins the harness block-hygiene contract: a consumed query's
  * localCheckpoint pins are released immediately by [[Blocks.releaseAll]]
  * instead of waiting for a driver GC, and the telemetry readers return
  * sane values on this platform.
  */
class BlocksSpec extends SparkTestBase {
  import spark.implicits._

  test("releaseAll drops accrued checkpoint blocks; new work re-pins cleanly") {
    Blocks.releaseAll(spark) // start from a clean slate (shared session)
    val before = spark.sparkContext.getPersistentRDDs.size
    val pinned = (1 to 3).map(i =>
      (0 until 100).toDF("v").filter($"v" % i === 0).localCheckpoint())
    pinned.foreach(df => assert(df.count() > 0))
    assert(spark.sparkContext.getPersistentRDDs.size >= before + 3,
      "each localCheckpoint must register a persistent RDD")
    Blocks.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releaseAll must leave no persistent blocks registered")
    // the session keeps working: a fresh derivation pins and serves
    val again = (0 until 10).toDF("v").localCheckpoint()
    assert(again.count() === 10)
    Blocks.releaseAll(spark)
  }

  test("telemetry readers: RSS and GC time are positive on Linux") {
    assert(Blocks.rssMb() > 0, "VmRSS must parse on this platform")
    assert(Blocks.gcSec() >= 0.0)
  }
}
