package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet test-table loaders for the driver harness.
  *
  * The reference reads its inputs from Hive/JDBC (`select * from db.tbl`,
  * /root/reference/hive_exporter_spark2.py:48-49); the harness stand-ins are
  * deterministic parquet tables under /root/testdata/sf&#42;/ (TESTDATA.md). Same
  * reader abstraction either way: a named table resolved to a DataFrame.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))
}
