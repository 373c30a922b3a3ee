package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DatacardSpec extends SparkTestBase {

  test("card invariants: ppm ratios bounded, totals consistent with the raw table") {
    val rows = Datacard.datacard(spark, sf).collect()
    val raw = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_.getLong(1)).sum === raw.count())
    rows.foreach { r =>
      val (nDocs, dupPpm, enPpm, lenPpm) =
        (r.getLong(1), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(nDocs > 0)
      Seq(dupPpm, enPpm, lenPpm).foreach(p => assert(p >= 0 && p <= 1000000))
      assert(r.getLong(2) > 0) // tokens
      assert(r.getDouble(3) > 0 && r.getDouble(4) > 0) // medians
    }
    // spot-check one source against direct computation
    val src = rows.head.getString(0)
    val direct = raw.filter(col("source") === src)
      .agg(count(lit(1)), count_distinct(md5(col("text")))).head
    val expectDup = (direct.getLong(0) - direct.getLong(1)) * 1000000L / direct.getLong(0)
    assert(rows.head.getLong(5) === expectDup)
  }

  test("one corpus scan, distinct planned without Expand") {
    val plan = Datacard.datacard(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"distinct must not Expand the scan:\n$plan")
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"the card must cost one corpus scan:\n$plan")
  }
}
