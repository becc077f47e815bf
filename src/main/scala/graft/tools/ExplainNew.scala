package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump executed plans of the round-5 queries for audit. */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
