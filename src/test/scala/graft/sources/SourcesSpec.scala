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
