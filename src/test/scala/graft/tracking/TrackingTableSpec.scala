package graft.tracking

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TrackingTableSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType),
    StructField("v", IntegerType),
    StructField("note", StringType)))

  private def table() = new TrackingTable(spark, tmpDir("tt"), schema, "k")

  test("createIfMissing yields an empty relation with the declared schema") {
    val t = table()
    val df = t.read()
    assert(df.count() === 0)
    assert(df.schema.fieldNames.toSeq === Seq("k", "v", "note"))
  }

  test("upsert inserts new keys and replaces matching keys (ref :28-34)") {
    val t = table()
    t.upsert(Seq(("a", 1, "x"), ("b", 2, "y")).toDF("k", "v", "note"))
    t.upsert(Seq(("b", 20, "y2"), ("c", 3, "z")).toDF("k", "v", "note"))
    val out = t.read().orderBy("k").as[(String, Int, String)].collect().toSeq
    assert(out === Seq(("a", 1, "x"), ("b", 20, "y2"), ("c", 3, "z")))
  }

  test("append keeps duplicates and never rewrites existing files (the log-table insert path)") {
    val t = table()
    t.append(Seq(("a", 1, "x")).toDF("k", "v", "note"))
    val dataDir = new java.io.File(t.path, "data")
    val before = dataDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    Thread.sleep(20)
    t.append(Seq(("a", 2, "x2")).toDF("k", "v", "note"))
    assert(t.read().count() === 2)
    val after = dataDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    // fast path: old files byte-identical, new files added
    assert(before.forall { case (name, m) => after.get(name).contains(m) },
      "append must not rewrite existing log files")
    assert(after.size > before.size)
  }

  test("append falls back to rewrite when the incoming batch widens a column") {
    val t = table()
    t.append(Seq(("a", 1, "x")).toDF("k", "v", "note"))
    t.append(Seq(("b", 5000000000L, "y")).toDF("k", "v", "note"))
    val out = t.read()
    assert(out.schema("v").dataType === LongType)
    assert(out.count() === 2)
  }

  test("upsert widens int -> long like expand_target_column_types (ref :31-33)") {
    val t = table()
    t.upsert(Seq(("a", 1, "x")).toDF("k", "v", "note"))
    val wide = Seq(("b", 5000000000L, "big")).toDF("k", "v", "note")
    t.upsert(wide)
    val out = t.read()
    assert(out.schema("v").dataType === LongType)
    assert(out.filter(col("k") === "b").head().getLong(1) === 5000000000L)
    assert(out.filter(col("k") === "a").head().getLong(1) === 1L)
  }

  test("updateJoin stamps matched rows and preserves the rest (A6)") {
    val t = table()
    t.upsert(Seq(("a", 1, null), ("b", 2, null)).toDF("k", "v", "note"))
    t.updateJoin(Seq(("a", "closed")).toDF("k", "note"), Seq("note"))
    val out = t.read().orderBy("k").collect()
    assert(out(0).getString(2) === "closed")
    assert(out(1).isNullAt(2))
  }

  test("fullRefresh drops all rows (drop-omnata-task-tables var, ref :19-27)") {
    val t = table()
    t.upsert(Seq(("a", 1, "x")).toDF("k", "v", "note"))
    t.fullRefresh()
    assert(t.read().count() === 0)
  }

  test("compact merges accumulated append files, data identical") {
    val t = table()
    (1 to 5).foreach(i => t.append(Seq((s"k$i", i, "x")).toDF("k", "v", "note")))
    val dataDir = new java.io.File(t.path, "data")
    def nFiles = dataDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 5)
    t.compact()
    assert(nFiles === 1, "small table must compact to one file")
    assert(t.read().orderBy("k").as[(String, Int, String)].collect().toSeq ===
      (1 to 5).map(i => (s"k$i", i, "x")))
  }
}
