package graft.push

import org.apache.spark.sql.types._

/** Declared tracking-table schemas — the reference declares these with
  * `null::type ... where 0=1` templates (`models/sfdc/sfdc_load_tasks.sql:7-17`,
  * `sfdc_load_task_logs.sql:7-17`, the two `models/sfmc` files; FIXTURES.md §2).
  * Snowflake VARIANT columns are JSON strings in v1 (oracle-comparable);
  * varchar(n) bounds collapse to unbounded StringType.
  */
object Schemas {
  val sfdcLoadTasks: StructType = StructType(Seq(
    StructField("job_id", StringType),
    StructField("load_task_name", StringType),
    StructField("object_name", StringType),
    StructField("operation", StringType),
    StructField("external_id_field", StringType),
    StructField("creation_time", TimestampType),
    StructField("creation_metadata", StringType), // variant
    StructField("close_metadata", StringType)))   // variant

  val sfdcLoadTaskLogs: StructType = StructType(Seq(
    StructField("job_id", StringType),
    StructField("job_log_entry_id", StringType),
    StructField("load_task_name", StringType),
    StructField("object_name", StringType),
    StructField("operation", StringType),
    StructField("external_id_field", StringType),
    StructField("record", StringType),  // variant
    StructField("result", StringType))) // variant

  val sfmcLoadTasks: StructType = StructType(Seq(
    StructField("job_id", StringType),
    StructField("load_task_name", StringType),
    StructField("object_name", StringType),
    StructField("operation", StringType),
    StructField("creation_time", TimestampType),
    StructField("creation_metadata", StringType)))

  val sfmcLoadTaskLogs: StructType = StructType(Seq(
    StructField("job_id", StringType),
    StructField("job_log_entry_id", StringType),
    StructField("load_task_name", StringType),
    StructField("object_name", StringType),
    StructField("operation", StringType),
    StructField("record", StringType),
    StructField("result", StringType)))
}
