package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm measurement: run the whole suite once (JIT, codegen caches,
    // file index, broadcast paths), then time TWO passes and report the
    // per-query minimum. Otherwise whichever query sorts first absorbs
    // several seconds of one-time session cost, and co-tenant load on
    // the machine (observed: identical code, 24.8s vs 32.5s an hour
    // apart) pollutes single-pass numbers. Min-of-2 is recorded in the
    // JSON ("passes"/"agg") so the methodology is explicit.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    def pass(): Seq[(String, Double)] = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (p1, p2) = (pass(), pass())
    val results = p1.zip(p2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":2,"agg":"min"}""")
    spark.stop()
  }
}
