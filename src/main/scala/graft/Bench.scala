package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given SF dir and
  * prints ONE JSON line. Failures are recorded as -1 with the name listed
  * under "failed" (never silently folded into the total). Every query runs
  * once UNTIMED first (at sf0.001) — whole-stage-codegen compilation of
  * the heavier plans costs whole seconds and belongs to the JVM, not the
  * query — then the timed pass measures steady state at the target SF. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Bench runs every query 4x in one JVM; without periodic GC the
      // ContextCleaner can't keep up on big heaps (see GraftSession).
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warmup pass: compile every plan's codegen at the smallest SF.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    // Median of `runs` timed passes per query: single-run machine noise
    // (±4 s observed between rounds) can otherwise mask or fake a real
    // regression. `queries` stays name→seconds (the median) for the
    // driver; min/max land in `spread`. Every pass starts from an EMPTY
    // cache: query fns persist intermediates, and without clearCache
    // passes 2-3 read the cache pass 1 populated, so the median measured
    // warm state — cold cost is the number that maps to a 100 TB run
    // (round-6 lesson: quality_gate median 0.12 s vs 0.33 s cold).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            None
        }
      }
      (name, times) // chronological; sorted views derived below
    }
    def f(v: Double): String = "%.3f".format(v)
    def median(ts: Seq[Double]): Double = { val s = ts.sorted; s(s.size / 2) }
    val qs = results
      .map { case (k, ts) =>
        "\"" + k + "\":" + (if (ts.nonEmpty) f(median(ts)) else "-1") }
      .mkString("{", ",", "}")
    val spread = results.collect { case (k, ts) if ts.nonEmpty =>
      "\"" + k + "\":[" + f(ts.min) + "," + f(ts.max) + "]" }
      .mkString("{", ",", "}")
    // run-1 time per query, kept alongside the median as direct evidence
    // that the medians are cold-state (they should now agree within noise)
    val cold = results.collect { case (k, ts) if ts.nonEmpty =>
      "\"" + k + "\":" + f(ts.head) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, ts) if ts.isEmpty => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, ts) if ts.nonEmpty => median(ts) }.sum
    // stdout gets the COMPACT line (medians only): the driver tail-captures
    // stdout with a small window, and the full line with per-query spreads
    // overflowed it in rounds 3 and 4 (front-truncated JSON, "parsed": null).
    // The full record, spreads included, goes to the file below.
    val line = s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"runs":$runs,"failed":$failed,"sf":"$sfDir"}"""
    val full = s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"runs":$runs,"spread":$spread,"cold":$cold,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
      if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, full + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
