package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("Seeds.readCsv: header, inferred schema, uppercased columns (S1)") {
    val dir = tmpDir("seed")
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$dir/accounts.csv"),
      "name,account_id\nLopez and Jordan,lopez-and-jordan\nAcme,acme\n")
    val df = Seeds.readCsv(spark, s"$dir/accounts.csv")
    assert(df.columns.toSeq === Seq("NAME", "ACCOUNT_ID"))
    assert(df.count() === 2)
    assert(df.filter(col("ACCOUNT_ID") === "acme").count() === 1)
  }

  test("bucketed tables join without a shuffle") {
    val facts = (1 to 1000).map(i => (i.toLong, s"f$i")).toDF("k", "fact")
    val dims = (1 to 100).map(i => (i.toLong, s"d$i")).toDF("k", "dim")
    Bucketed.writeBucketed(facts, "bspec_facts", "k", 4)
    Bucketed.writeBucketed(dims, "bspec_dims", "k", 4)
    // disable broadcast so the bucket layout (not a broadcast) must avoid the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.bucketedJoin(spark, "bspec_facts", "bspec_dims", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin is row-identical to the plain join") {
    val left = (1 to 500).map(i => (i % 7L, s"l$i")).toDF("k", "lv")
    val right = (1 to 20).map(i => (i % 7L, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .orderBy("k", "lv", "rv").collect().toSeq
    val salted = Skew.saltedJoin(left, right, "k", salts = 4).select("k", "lv", "rv")
      .orderBy("k", "lv", "rv").collect().toSeq
    assert(salted === plain)
  }

  test("detectSkew: flags a planted hot key, passes a uniform one") {
    // The heuristic is PARALLELISM-relative (hot = one reducer carries
    // > factor x the mean load), so pin a production-like partition
    // count: at the test harness's 4 partitions a half-the-rows key is
    // legitimately only 2x the mean.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      // one key owns half the rows: its reducer would carry 0.5*N vs a
      // mean of N/64 — far past any sane factor
      val hot = spark.range(40000L)
        .select(when(col("id") % 2 === 0, lit(0L)).otherwise(pmod(col("id"), lit(512L))).as("k"),
          col("id").as("v"))
      assert(Skew.detectSkew(hot, "k"), "half-the-rows key must register as skew")
      assert(Skew.hotKeys(hot, "k") === Seq(0L),
        "the planted hot key — and only it — must be identified")
      // ~uniform keys: hottest ~ mean, below the factor
      val uniform = spark.range(40000L)
        .select(pmod(col("id"), lit(512L)).as("k"), col("id").as("v"))
      assert(!Skew.detectSkew(uniform, "k"), "uniform keys must not trigger salting")
      assert(Skew.hotKeys(uniform, "k").isEmpty)
      // empty relation: nothing to shuffle, nothing to salt
      assert(!Skew.detectSkew(uniform.filter(col("k") < 0), "k"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("saltedJoinIfSkewed: row-identical to plain in BOTH detection branches") {
    val right = (0 until 8).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "rv").orderBy("k", "v", "rv").collect().toSeq
    val hot = spark.range(20000L)
      .select(when(col("id") % 2 === 0, lit(0L)).otherwise(pmod(col("id"), lit(8L))).as("k"),
        col("id").as("v"))
    assert(rowsOf(Skew.saltedJoinIfSkewed(hot, right, "k", 4)) ===
      rowsOf(hot.join(right, Seq("k"))))
    val uniform = spark.range(2000L)
      .select(pmod(col("id"), lit(8L)).as("k"), col("id").as("v"))
    assert(rowsOf(Skew.saltedJoinIfSkewed(uniform, right, "k", 4)) ===
      rowsOf(uniform.join(right, Seq("k"))))
  }

  test("saltedJoin rejects right/full outer joins (right side is replicated)") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df.select(col("k"), col("v").as("rv")), "k", 4, "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df.select(col("k"), col("v").as("rv")), "k", 4, "full_outer")
    }
  }
}
