package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (SparkContext is a JVM
  * singleton). Managed tables land in a throwaway warehouse dir. */
object TestSpark {
  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    GraftSession.tune(
      GraftSession.builder(master = "local[4]", shufflePartitions = 4)
        .config("spark.sql.warehouse.dir", wh)
        .getOrCreate())
  }
  def sf(name: String): String = s"/root/testdata/$name"
}
