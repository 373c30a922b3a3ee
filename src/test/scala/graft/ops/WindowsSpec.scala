package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkTestBase {
  import spark.implicits._

  test("globalRowNumber equals the single-partition window row_number") {
    val df = spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey")
      .repartition(7) // deliberately scrambled input layout
    val viaWindow = df.withColumn("rn_w",
      row_number().over(Window.orderBy(col("o_orderkey"))).cast("long"))
    val viaTwoPass = Windows.globalRowNumber(df, "rn", col("o_orderkey"))
    val mismatches = viaTwoPass.join(viaWindow, "o_orderkey")
      .filter(col("rn") =!= col("rn_w")).count()
    assert(mismatches === 0)
    assert(viaTwoPass.count() === df.count())
  }

  test("globalRowNumber on a tiny frame (fewer rows than partitions)") {
    val df = Seq(30L, 10L, 20L).toDF("k")
    val out = Windows.globalRowNumber(df, "rn", col("k"))
      .orderBy("k").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((10L, 1L), (20L, 2L), (30L, 3L)))
  }

  test("groupedRunningSum equals the per-group window sum on a 95%-skewed corpus") {
    // 10k rows, 95% in group 'en' — the shape where partitionBy(group)
    // single-threads. Values vary so a wrong offset cannot cancel out.
    val df = spark.range(10000L)
      .select(when(col("id") % 20 < 19, lit("en")).otherwise(lit("de")).as("g"),
        col("id").as("k"), (col("id") % 37 + 1).as("v"))
      .repartition(7).localCheckpoint()
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = df.withColumn("rs_w", sum(col("v")).over(w))
    val viaTwoPass = Windows.groupedRunningSum(df, "rs", col("g"), col("v"), col("k"))
    val mismatches = viaTwoPass.join(viaWindow, Seq("g", "k"))
      .filter(col("rs") =!= col("rs_w")).count()
    assert(mismatches === 0)
    assert(viaTwoPass.count() === df.count())
  }

  test("groupedRunningSum spreads the dominant group over >1 task") {
    val df = spark.range(10000L)
      .select(when(col("id") % 20 < 19, lit("en")).otherwise(lit("de")).as("g"),
        col("id").as("k"), lit(1L).as("v"))
    // The helper's pass-1 layout: range partitions on (g, k). The
    // dominant group must span multiple partitions — that IS the
    // de-skew property (partitionBy(g) would pin it to exactly one).
    // AQE's small-partition coalescing collapses this 10k-row fixture
    // to one partition (fine at test scale, impossible at 100 TB), so
    // pin it off to observe the range layout itself.
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val spanned = df.repartitionByRange(col("g"), col("k"))
        .withColumn("p", spark_partition_id())
        .filter(col("g") === "en").select("p").distinct().count()
      assert(spanned > 1, s"dominant group landed on $spanned partition(s)")
    } finally spark.conf.set(key, prev)
  }

  test("bucketedRunningSum equals the per-group window sum on a 95%-skewed corpus") {
    // same fixture as groupedRunningSum's twin test, but with the
    // computed monotone bucket (dense ids 0..N-1 -> id*P div N) instead
    // of the sampled range partitioner
    val n = 10000L
    val df = spark.range(n)
      .select(when(col("id") % 20 < 19, lit("en")).otherwise(lit("de")).as("g"),
        col("id").as("k"), (col("id") % 37 + 1).as("v"))
      .repartition(7).localCheckpoint()
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = df.withColumn("rs_w", sum(col("v")).over(w))
    val viaBucketed = Windows.bucketedRunningSum(df, "rs", col("g"), col("v"),
      col("k"), expr(s"(k * 8) div $n"))
    val mismatches = viaBucketed.join(viaWindow, Seq("g", "k"))
      .filter(col("rs") =!= col("rs_w")).count()
    assert(mismatches === 0)
    assert(viaBucketed.count() === df.count())
    // dominant group spans multiple buckets by construction
    val spanned = df.select(col("g"), expr(s"(k * 8) div $n").as("b"))
      .filter(col("g") === "en").select("b").distinct().count()
    assert(spanned === 8L, s"dominant group must span all 8 buckets: $spanned")
  }

  test("bucketedRunningSum shares one upstream evaluation (ReusedExchange in plan)") {
    val n = 10000L
    val df = spark.range(n)
      .select((col("id") % 5).cast("string").as("g"), col("id").as("k"),
        lit(1L).as("v"))
    val out = Windows.bucketedRunningSum(df, "rs", col("g"), col("v"),
      col("k"), expr(s"(k * 8) div $n"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      "offset subtree must reuse the local-sum exchange, not re-run the input")
  }
}
