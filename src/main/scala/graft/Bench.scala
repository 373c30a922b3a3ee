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
    // ERROR, not WARN: releaseAll's unpersist of truncated-lineage
    // checkpoint blocks logs one WARN per block, and an async WARN
    // landing after the JSON line would push it out of the ~2000-byte
    // stdout tail the driver parses
    spark.sparkContext.setLogLevel("ERROR")
    // Warm measurement: run the whole suite once (JIT, codegen caches,
    // file index, broadcast paths), then time TWO passes and report the
    // per-query minimum. Otherwise whichever query sorts first absorbs
    // several seconds of one-time session cost, and co-tenant load on
    // the machine (observed: identical code, 24.8s vs 32.5s an hour
    // apart) pollutes single-pass numbers. Min-of-2 is recorded in the
    // JSON ("passes"/"agg") so the methodology is explicit.
    // Optional args = query-name filter (local iteration only; the driver
    // invokes with no args and gets the full suite).
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val ordered = if (args.nonEmpty) all.filter(q => args.contains(q._1)) else all
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      // a query's checkpoint pins are per-invocation: release them once
      // the result is consumed instead of letting dead blocks wait for
      // a driver GC — session RSS stays flat across the 185x2 passes
      graft.util.Blocks.releaseAll(spark)
    }
    // Failed queries are still caught (one broken query must not kill
    // the whole JSON line), but they are now COUNTED and named on
    // stderr instead of silently recording elapsed-until-crash as a
    // legitimate time — a query that starts failing mid-round would
    // otherwise read as a speedup (measurement bug found in the r20
    // optimization round: a crash at sf0.1 hid behind this catch while
    // the small-SF correctness checks stayed green).
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def pass(): Seq[(String, Double)] = ordered.map { case (name, fn) =>
      // label every job with the registered row it serves (guide §1.5)
      // so listener-based attribution (ProfQ) and any UI/event-log
      // reading names the operator instead of a call site — additive:
      // no timing or output change
      spark.sparkContext.setJobDescription(s"graft:$name")
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        -1L
      }
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      graft.util.Blocks.releaseAll(spark) // outside the timed region
      name -> t
    }
    // per-pass session telemetry (next to loadavg): cumulative GC time
    // and RSS after each pass separate session drag from machine noise
    val gc0 = graft.util.Blocks.gcSec()
    val p1 = pass()
    val (gc1, rss1) = (graft.util.Blocks.gcSec(), graft.util.Blocks.rssMb())
    val p2 = pass()
    val (gc2, rss2) = (graft.util.Blocks.gcSec(), graft.util.Blocks.rssMb())
    val results = p1.zip(p2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    val total = results.map(_._2).sum
    // Machine-load context: co-tenant load moved identical-code totals
    // ±40% across rounds and cost a judging cycle to disprove a fake
    // regression — record the 1-min loadavg so cross-round comparisons
    // can separate code from contention.
    val load =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
      catch { case _: Throwable => -1.0 }
    // Locale.ROOT: f"" uses the JVM default locale, and a comma-decimal
    // locale (de_DE) would emit invalid JSON the driver can't parse.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def line(qs: Seq[(String, Double)], omitted: Int, omittedSec: Double): String = {
      val qjson = qs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      val om = if (omitted > 0) s""","omitted":$omitted,"omitted_sec":${fmt(omittedSec)}""" else ""
      // q_failed names the failing queries (additive, like q_errors and
      // absent on green runs) so downstream speedup math can EXCLUDE
      // them — a failed query's recorded time is elapsed-until-crash,
      // which would otherwise read as a speedup.
      val qe = if (failed.nonEmpty)
        s""","q_errors":${failed.size},"q_failed":[${
          failed.map("\"" + _ + "\"").mkString(",")}]"""
      else ""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qjson$om$qe,"sf":"$sfDir","passes":2,"agg":"min","load":${fmt(load)},"gc_sec":[${fmt(gc1 - gc0)},${fmt(gc2 - gc1)}],"rss_mb":[$rss1,$rss2]}"""
    }
    // The driver captures only the last ~2000 bytes of output and parses
    // this JSON line out of that tail; sbt appends a ~75-char "[success]"
    // line after us. With 80+ queries the full map overflows the window
    // and the whole line is lost (rounds 1 and 3). So: full per-query map
    // goes to BENCH_FULL.json; stdout gets the total plus the slowest
    // queries that fit a 1600-char budget.
    val full = line(results, 0, 0.0)
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    val out =
      if (full.length <= 1600) full
      else {
        val bySlow = results.sortBy(-_._2)
        var keep = bySlow.length
        while (keep > 1 && line(bySlow.take(keep).sortBy(_._1),
            bySlow.length - keep, bySlow.drop(keep).map(_._2).sum).length > 1600)
          keep -= 1
        line(bySlow.take(keep).sortBy(_._1),
          bySlow.length - keep, bySlow.drop(keep).map(_._2).sum)
      }
    println(out)
    spark.stop()
  }
}
