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
}
