package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.Tables

/** One harness query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle run by the driver at sf0.01.
  *
  * Determinism rules for hash-matchable oracles (SURVEY.md §7):
  *  - identical ORDER BY on both sides, always ending in a unique key;
  *  - double aggregations go through exact DECIMAL arithmetic and are cast
  *    back to DOUBLE, so accumulation order can't perturb low bits;
  *  - identical column aliases (driver sorts columns by name before hashing).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object QueryDef {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact sum of a 2-decimal double column: DECIMAL(28,4) accumulate, then
    * one deterministic cast to double. Mirrors the DuckDB pattern
    * `CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Deterministic mean: exact decimal sum / count. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / count(c)

  val DSUM = "CAST(sum(CAST(%s AS DECIMAL(18,4))) AS DOUBLE)"
}
