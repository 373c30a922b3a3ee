package graft

import org.apache.spark.sql.SparkSession

/** Round-20 optimization evidence: dump `.explain("formatted")` for the
  * named queries into one file each — the judge's before/after plan
  * record under `plans/r20/`.
  * Usage: `runMain graft.PlanDumpR20 <sfDir> <outDir> <suffix> <query>...`
  */
object PlanDumpR20 {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args.drop(3)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(outDir, s"${name}_$suffix.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      graft.util.Blocks.releaseAll(spark)
      println(s"dumped $name")
    }
    spark.stop()
  }
}
