package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics checks for the SURVEY §2 relational operators, independent of
  * the DuckDB oracle (which checks engine-vs-engine equivalence; these
  * check the *intended* semantics).
  */
class RelationalSpec extends SparkTestBase {
  import graft.catalog.Catalog

  test("j1NotInAnti excludes exactly the pushed orderkeys") {
    val c = Catalog(spark, sf)
    val li = c.ref("lineitem")
    val pushed = c.ref("orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
      .select(col("o_orderkey")).distinct()
    val expected = li.join(pushed, li("l_orderkey") === pushed("o_orderkey"), "left_semi").count()
    val kept = Relational.j1NotInAnti(spark, sf)
      .agg(sum(col("n_rows"))).head().getLong(0)
    assert(kept === li.count() - expected)
  }

  test("p6Watermark returns only rows strictly above the watermark") {
    val c = Catalog(spark, sf)
    // java8 datetime API: TIMESTAMP_NTZ comes back as LocalDateTime
    val wm = c.ref("orders").filter(col("o_orderstatus") === "F")
      .agg(max(col("o_orderdate"))).head().get(0)
    val out = Relational.p6Watermark(spark, sf)
    assert(out.filter(col("o_orderdate") <= lit(wm)).count() === 0)
    val expected = c.ref("orders").filter(col("o_orderdate") > lit(wm)).count()
    assert(out.count() === expected)
  }

  test("m2Upsert result has unique keys and incoming rows win") {
    val out = Relational.m2Upsert(spark, sf).cache()
    assert(out.count() === out.select("o_orderkey").distinct().count())
    // every even key must carry the +1.0 incoming price
    val c = Catalog(spark, sf)
    val orig = c.ref("orders").filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice").as("p0"))
    val n = out.filter(col("o_orderkey") % 2 === 0)
      .join(orig, "o_orderkey")
      .filter(abs(col("o_totalprice") - (col("p0") + 1.0)) > 1e-9).count()
    assert(n === 0)
    out.unpersist()
  }

  test("w1w2 rn is a 1..N permutation consistent with the key order") {
    val out = Relational.w1w2RowNumberBatch(spark, sf)
      .orderBy("o_orderkey").collect()
    assert(out.map(_.getLong(1)).toSeq === (1L to out.length).toSeq)
  }

  test("g3BatchAgg batches are 100 rows (first 99, remainder last)") {
    val rows = Relational.g3BatchAgg(spark, sf).collect()
    val sizes = rows.map(r => r.getLong(rows.head.fieldIndex("batch_size")))
    assert(sizes.sum === 150) // sf0.001 customer count
    assert(sizes.init.forall(s => s == 99 || s == 100))
  }

  test("NOT IN null semantics: SQL NOT IN goes empty on a NULL subquery row; left_anti keeps rows (SURVEY §7 hard part 1)") {
    import spark.implicits._
    val src = Seq(1L, 2L, 3L).toDF("k")
    val sub = Seq(Some(1L), None).toDF("k")
    src.createOrReplaceTempView("notin_src")
    sub.createOrReplaceTempView("notin_sub")
    // Snowflake/ANSI: k NOT IN (1, NULL) is never TRUE -> empty result.
    val sqlNotIn = spark.sql(
      "SELECT k FROM notin_src WHERE k NOT IN (SELECT k FROM notin_sub)").count()
    assert(sqlNotIn === 0, "Spark's null-aware anti join must honor ANSI NOT IN")
    // left_anti is the null-UNaware variant the engine uses where the key
    // is known non-null (the reference's log keys are) -> 2 survivors.
    val anti = src.join(sub, Seq("k"), "left_anti").count()
    assert(anti === 2)
  }

  test("approx_count_distinct (HLL++) stays within 5% of the exact distinct count") {
    val c = Catalog(spark, sf)
    val exact = c.ref("orders").select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = c.ref("orders")
      .select(approx_count_distinct(col("o_custkey"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL estimate $approx vs exact $exact")
  }

  test("g1Rollup conserves the total amount") {
    val c = Catalog(spark, sf)
    val total = c.ref("orders")
      .agg(sum(col("o_totalprice").cast("decimal(30,6)"))).head().getDecimal(0)
    val rolled = Relational.g1Rollup(spark, sf)
      .agg(sum(col("total_amount").cast("decimal(30,6)"))).head().getDecimal(0)
    assert((total.doubleValue() - rolled.doubleValue()).abs < 1e-3)
  }
}
