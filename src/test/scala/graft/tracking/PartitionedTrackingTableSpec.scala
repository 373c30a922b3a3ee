package graft.tracking

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.File

class PartitionedTrackingTableSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType),
    StructField("v", IntegerType),
    StructField("task", StringType)))

  private def table() = new PartitionedTrackingTable(
    spark, tmpDir("ptt") + "/logs", schema, "k", "task")

  private def partFiles(base: String, part: String): Map[String, Long] = {
    val d = new File(s"$base/task=$part")
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("upsert touches only the partitions present in the incoming batch") {
    val t = table()
    t.upsert(Seq(("a1", 1, "taskA"), ("b1", 1, "taskB")).toDF("k", "v", "task"))
    val before = partFiles(t.path, "taskA")
    assert(before.nonEmpty)
    Thread.sleep(20)

    // second upsert only touches taskB
    t.upsert(Seq(("b1", 99, "taskB"), ("b2", 2, "taskB")).toDF("k", "v", "task"))

    // taskA's files are byte-for-byte untouched (same names + mtimes)
    assert(partFiles(t.path, "taskA") === before)
    val out = t.read().orderBy("k").as[(String, Int, String)].collect().toSeq
    assert(out === Seq(("a1", 1, "taskA"), ("b1", 99, "taskB"), ("b2", 2, "taskB")))
  }

  test("read of one partition prunes the scan (PartitionFilters)") {
    val t = table()
    t.upsert(Seq(("a1", 1, "taskA"), ("b1", 1, "taskB")).toDF("k", "v", "task"))
    val plan = t.read().filter(col("task") === "taskA")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(task"),
      s"expected partition pruning in:\n$plan")
  }

  test("append extends only the touched partition") {
    val t = table()
    t.upsert(Seq(("a1", 1, "taskA")).toDF("k", "v", "task"))
    t.append(Seq(("a2", 2, "taskA")).toDF("k", "v", "task"))
    assert(t.read().count() === 2)
  }

  test("compact merges fragmented partitions, leaves compact ones untouched") {
    val t = table()
    // taskA fragments across three appends; taskB stays single-file
    (1 to 3).foreach(i => t.append(Seq((s"a$i", i, "taskA")).toDF("k", "v", "task")))
    t.append(Seq(("b1", 1, "taskB")).toDF("k", "v", "task"))
    assert(partFiles(t.path, "taskA").size >= 3)
    val bBefore = partFiles(t.path, "taskB")
    Thread.sleep(20)

    t.compact()
    assert(partFiles(t.path, "taskA").size === 1, "taskA must merge to one file")
    assert(partFiles(t.path, "taskB") === bBefore, "taskB must be byte-for-byte untouched")
    val out = t.read().orderBy("k").as[(String, Int, String)].collect().toSeq
    assert(out === Seq(("a1", 1, "taskA"), ("a2", 2, "taskA"),
      ("a3", 3, "taskA"), ("b1", 1, "taskB")))

    // idempotent: nothing fragmented -> second compact rewrites nothing
    val aAfter = partFiles(t.path, "taskA")
    Thread.sleep(20)
    t.compact()
    assert(partFiles(t.path, "taskA") === aAfter)
  }
}
