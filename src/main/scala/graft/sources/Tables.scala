package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}

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

  /** Event time of `events.ts` as epoch MICROSECONDS.
    *
    * The fixture stores `ts` as parquet `timestamp[us]`, which Spark reads
    * as TIMESTAMP_NTZ; the session time zone is UTC (GraftSession), so the
    * NTZ→TIMESTAMP cast is the identity mapping and `unix_micros` yields
    * exactly DuckDB's `epoch_us(ts)` — the value the oracles compare
    * against. All event-time arithmetic goes through these helpers so a
    * future fixture type change is a one-file fix (plus the
    * FixtureSchemaSpec tripwire). Pure scan-side expression: stays inside
    * whole-stage codegen, no timezone re-binding per row. */
  def eventUs: Column = unix_micros(col("ts").cast("timestamp"))

  /** Event time bucketed to whole minutes (epoch-minute number). */
  def eventMinute: Column = expr("unix_micros(cast(ts AS timestamp)) DIV 60000000")

  /** Event time bucketed to whole hours (epoch-hour number). */
  def eventHour: Column = expr("unix_micros(cast(ts AS timestamp)) DIV 3600000000")

  /** Event time bucketed to whole days (epoch-day number). */
  def eventDay: Column = expr("unix_micros(cast(ts AS timestamp)) DIV 86400000000")
}
