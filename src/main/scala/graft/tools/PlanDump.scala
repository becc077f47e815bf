package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only: write each named query's `.explain("formatted")` output to a
  * file, for the optimization-round plan archive (`plans/r14/`). The query
  * fn runs end-to-end first (many fns execute internal stages eagerly), so
  * the dumped plan is the final frame's executed-plan shape under the same
  * session confs the bench uses.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <query> [query ...]
  *   e.g. runMain graft.tools.PlanDump plans/r14 before dedup_containment
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query> [query ...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val unknown = names.filterNot(qs.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { n =>
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(s"plandump: $n")
      val df = qs(n)(spark, sfDir)
      df.count() // execute so AQE finalizes and internal stages run
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote ${outDir.resolve(s"${n}_$suffix.txt")}")
    }
    spark.stop()
  }
}
