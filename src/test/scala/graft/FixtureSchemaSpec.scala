package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Tripwire for silent fixture regeneration.
  *
  * Round 5 lost 14 queries and 29 tests to a fixture type drift
  * (`events.ts` parquet timestamp[ns] → timestamp[us]) that surfaced only
  * as scattered analysis errors deep inside query plans. This spec pins the
  * Spark-visible schema of every `/root/testdata` table (FIXTURES.md §2) so
  * the NEXT regeneration fails here first, with a one-line readable diff
  * naming the table and both schemas.
  *
  * The expectation is the Spark read schema (post parquet→Catalyst type
  * mapping), not the raw parquet logical type: that is the contract every
  * query in the registry actually programs against — e.g. `timestamp[us]`
  * with isAdjustedToUTC=false arrives as TIMESTAMP_NTZ.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val expected = Map(
    "region" -> "r_regionkey INT,r_name STRING",
    "nation" -> "n_nationkey INT,n_name STRING,n_regionkey INT",
    "customer" ->
      "c_custkey BIGINT,c_name STRING,c_nationkey INT,c_acctbal DOUBLE,c_mktsegment STRING",
    "supplier" -> "s_suppkey BIGINT,s_name STRING,s_nationkey INT,s_acctbal DOUBLE",
    "part" ->
      "p_partkey BIGINT,p_name STRING,p_brand STRING,p_type STRING,p_size INT,p_retailprice DOUBLE",
    "orders" ->
      "o_orderkey BIGINT,o_custkey BIGINT,o_orderstatus STRING,o_totalprice DOUBLE,o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING",
    "lineitem" ->
      "l_orderkey BIGINT,l_partkey BIGINT,l_suppkey BIGINT,l_linenumber INT,l_quantity DOUBLE,l_extendedprice DOUBLE,l_discount DOUBLE,l_tax DOUBLE,l_returnflag STRING,l_linestatus STRING,l_shipdate TIMESTAMP_NTZ",
    "events" ->
      "event_id BIGINT,ts TIMESTAMP_NTZ,user_id BIGINT,event_type STRING,value DOUBLE,props STRING",
    "documents" ->
      "doc_id BIGINT,text STRING,lang STRING,source STRING,n_chars BIGINT",
    "embeddings" -> "vec_id BIGINT,embedding ARRAY<FLOAT>,label INT")

  private def ddl(name: String): String =
    Tables.load(spark, TestSpark.sf("sf0.001"), name).schema.fields
      .map(f => s"${f.name} ${f.dataType.sql}").mkString(",")

  test("every fixture table matches its pinned Spark schema") {
    val diffs = Tables.all.flatMap { name =>
      val actual = ddl(name)
      // .get so a table added to Tables.all without a pinned schema shows
      // up in the same readable diff instead of a bare NoSuchElementException
      expected.get(name) match {
        case Some(want) if actual == want => None
        case Some(want) => Some(s"$name:\n  expected: $want\n  actual:   $actual")
        case None => Some(s"$name: no pinned schema (actual: $actual)")
      }
    }
    assert(diffs.isEmpty,
      "fixture schema drift (update FIXTURES.md + Tables helpers + this spec " +
        "together):\n" + diffs.mkString("\n"))
  }

  test("expectation map covers exactly the Tables.all inventory") {
    assert(expected.keySet == Tables.all.toSet)
  }

  test("eventUs equals DuckDB's epoch_us semantics on the UTC session") {
    // unix_micros(cast(ntz as timestamp)) under UTC must be the plain
    // epoch value of the stored microsecond instant: pin it on one row so
    // a future timezone/conf change breaks loudly here.
    val r = Tables.load(spark, TestSpark.sf("sf0.001"), "events")
      .select(Tables.eventUs.as("us"), org.apache.spark.sql.functions.col("ts"))
      .orderBy("us").limit(1).head
    val ldt = r.getAs[java.time.LocalDateTime]("ts")
    val want = ldt.toInstant(java.time.ZoneOffset.UTC)
    val wantUs = want.getEpochSecond * 1000000L + want.getNano / 1000L
    assert(r.getAs[Long]("us") == wantUs)
  }
}
