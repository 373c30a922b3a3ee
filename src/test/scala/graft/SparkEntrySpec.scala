package graft

import org.apache.spark.sql.functions._

/** Driver-contract conformance: every declared query runs, every oracle
  * has a query, and results carry no array-typed output columns (the
  * driver's pandas compare cannot sort those).
  */
class SparkEntrySpec extends SparkTestBase {

  test("entry: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; queries without oracles are known") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    val rowsOnly = q.diff(o)
    assert(rowsOnly === Set.empty[String],
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("all queries execute on sf0.001 and return no array-typed columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.fields.forall(f =>
        !f.dataType.typeName.startsWith("array")),
        s"$name exposes an array column (breaks the driver compare)")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("former rows-only queries produce rows at sf0.001 (non-vacuous results)") {
    Seq("sim_lsh_ann", "sim_ivf_ann", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_source_sim").foreach { n =>
      assert(SparkEntry.queries(n)(spark, sf).count() > 0, s"$n returned 0 rows")
    }
  }
}
