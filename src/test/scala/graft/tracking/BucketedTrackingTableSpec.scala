package graft.tracking

import graft.SparkTestBase
import graft.connector.{MockSalesforceBulkApi, MockSfmcApi}
import graft.model.{PushModel, SalesforceConfig}
import graft.push.{PushMaterializer, Schemas}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class BucketedTrackingTableSpec extends SparkTestBase {
  import spark.implicits._

  private var n = 0
  private def freshTable(): String = { n += 1; s"bspec_logs_$n" }

  private def logRows(ids: Range, task: String = "t") =
    ids.map(i => (s"job-1", s"entry-$i", task, "Account", "insert",
        "AccountID__c", s"""{"AccountID__c":"$i"}""", """{"success":true}"""))
      .toDF("job_id", "job_log_entry_id", "load_task_name", "object_name",
        "operation", "external_id_field", "record", "result")

  test("append/read round-trip and key-replacing upsert") {
    val t = new BucketedTrackingTable(spark, freshTable(),
      Schemas.sfdcLoadTaskLogs, "job_log_entry_id", "record", 4)
    t.append(logRows(0 until 10))
    assert(t.read().count() === 10)
    t.append(logRows(10 until 15))
    assert(t.read().count() === 15)
    // upsert replaces rows with matching unique keys, keeps the rest
    val updated = logRows(0 until 5).withColumn("result", lit("""{"success":false}"""))
    t.upsert(updated)
    val r = t.read()
    assert(r.count() === 15)
    assert(r.filter(col("result").contains("false")).count() === 5)
    t.fullRefresh()
    assert(t.read().count() === 0)
  }

  test("anti-join on record: log side is exchange-free (bucket layout)") {
    val t = new BucketedTrackingTable(spark, freshTable(),
      Schemas.sfdcLoadTaskLogs, "job_log_entry_id", "record", 4)
    t.append(logRows(0 until 1000))
    val incoming = (0 until 1200)
      .map(i => s"""{"AccountID__c":"$i"}""").toDF("record")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val unsynced = incoming.join(t.read().select(col("record")), Seq("record"), "left_anti")
      val plan = unsynced.queryExecution.executedPlan.toString
      // exactly one exchange: the incoming side; the bucketed log scan
      // is already partitioned on the join key
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1, s"expected 1 exchange (incoming side only):\n$plan")
      assert(plan.contains("Bucketed: true"), s"log scan must use buckets:\n$plan")
      assert(unsynced.count() === 200)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact: file count drops to <= buckets, rows and layout preserved") {
    val name = freshTable()
    val t = new BucketedTrackingTable(spark, name,
      Schemas.sfdcLoadTaskLogs, "job_log_entry_id", "record", 4)
    (0 until 3).foreach(i => t.append(logRows(i * 10 until (i + 1) * 10)))
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $name")
      .filter(col("col_name") === "Location").head().getString(1)
    def nFiles = new java.io.File(new java.net.URI(loc))
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles > 4, "three appends must fragment past one file per bucket")
    t.compact()
    assert(nFiles <= 4, s"compacted table must have <= buckets files, got $nFiles")
    assert(t.read().count() === 30)
    // still bucketed: the anti-join stays exchange-free on the log side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = (0 until 40).map(i => s"""{"AccountID__c":"$i"}""").toDF("record")
        .join(t.read().select(col("record")), Seq("record"), "left_anti")
      val plan = probe.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
      assert(probe.count() === 10)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("PushMaterializer(bucketedLogs): push, then idempotent rerun via unsyncedRecords") {
    val base = tmpDir("pushb")
    val mat = new PushMaterializer(spark, base,
      new MockSalesforceBulkApi(), new MockSfmcApi(), bucketedLogs = true, logBuckets = 4)
    def model(mat: PushMaterializer) = PushModel("accounts_load",
      SalesforceConfig("Account", "insert"),
      (s: SparkSession) => {
        val recs = s.read.parquet(s"$sf/customer.parquet")
          .select(to_json(struct(
            col("c_name").as("Name"),
            col("c_custkey").cast("string").as("AccountID__c"))).as("record"))
        mat.unsyncedRecords(recs, mat.sfdcLogs, "accounts_load")
      })
    val first = mat.run(model(mat))
    assert(first.recordsPushed === 150)
    // every record logged successfully -> second run pushes nothing
    val second = mat.run(model(mat))
    assert(second.skippedEmpty)
    assert(second.recordsPushed === 0)
    assert(mat.sfdcLogs.read().count() === 150)
  }
}
