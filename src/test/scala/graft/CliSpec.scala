package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.cli._
import graft.operators.Catalog

/** Drives every CLI main end-to-end: the reference's live-infrastructure
  * test scenarios (/root/reference/tests/test_incremental_append.py,
  * test_incremental_merge.py, test_full_ingest.sh) replayed through
  * `graft.cli.*` over an embedded Derby source and managed tables. */
class CliSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dbPath =
    Files.createTempDirectory("graft-cli-derby").resolve("clidb").toString
  private val url = s"jdbc:derby:$dbPath;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(sqls: String*): Unit = withConn { c =>
    val st = c.createStatement()
    try sqls.foreach(st.execute) finally st.close()
  }

  override def beforeAll(): Unit = {
    // reference fixture: tests/test_incremental_append.py:77-86
    exec("""create table data_append (
      id int, value varchar(30), created timestamp, date_col varchar(10))""")
    (0 until 10).foreach(i => exec(
      s"insert into data_append values ($i, 'v$i', timestamp('2024-01-01 10:00:00'), '2024-01-01')"))
    // reference fixture: tests/test_incremental_merge.py:88-91
    exec("""create table data_merge (
      id int, value varchar(30), last_modified timestamp,
      created timestamp, date_col varchar(10), deleted int)""")
    (0 until 10).foreach(i => exec(
      s"""insert into data_merge values ($i, 'v$i',
         timestamp('2024-01-01 10:00:00'), timestamp('2024-01-01 10:00:00'),
         '2024-01-01', null)"""))
  }

  override def afterAll(): Unit = {
    Seq("cli_full", "cli_append", "cli_merge", "cli_exp")
      .foreach(db => spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE"))
  }

  test("full loader CLI: load, report, idempotent re-run (test_full_ingest.sh)") {
    val argv = Seq("-u", url, "-t", "data_append", "-H", "cli_full.people",
      "-p", "id", "-m", "2")
    val r1 = JdbcLoader.run(spark, argv, tag = "20240101T000000")
    assert(r1.sourceRows == 10 && r1.ingestedRows == 10 && r1.destinationRows == 10)
    // full refresh: re-run overwrites, never duplicates
    val r2 = JdbcLoader.run(spark, argv, tag = "20240102T000000")
    assert(r2.destinationRows == 10)
    assert(spark.table("cli_full.people").columns.contains("dl_ingest_date"))
  }

  test("append loader CLI: 10 -> 20 across two runs (test_incremental_append.py)") {
    val argv = Seq("-u", url, "-t", "data_append", "-H", "cli_append.data",
      "-p", "id", "-m", "2", "-y", "date_col", "-r", "id")
    assert(JdbcLoaderIncrementalAppend.run(spark, argv, tag = "20240101T000000")
      .destinationRows == 10)
    (10 until 20).foreach(i => exec(
      s"insert into data_append values ($i, 'v$i', timestamp('2024-01-02 10:00:00'), '2024-01-02')"))
    val r2 = JdbcLoaderIncrementalAppend.run(spark, argv, tag = "20240102T000000")
    assert(r2.sourceRows == 20 && r2.ingestedRows == 10 && r2.destinationRows == 20)
  }

  test("merge loader CLI: upsert + null-last_modified insert (test_incremental_merge.py)") {
    val argv = Seq("-u", url, "-t", "data_merge", "-H", "cli_merge.data",
      "-k", "id", "-l", "last_modified", "-r", "id", "-d", "deleted")
    assert(JdbcLoaderIncrementalMerge.run(spark, argv, tag = "20240101T000000")
      .destinationRows == 10)

    // insert id=10 with NULL last_modified: caught by incremental column
    exec("""insert into data_merge values (10, 'v10', null,
      timestamp('2024-01-02 10:00:00'), '2024-01-02', null)""")
    assert(JdbcLoaderIncrementalMerge.run(spark, argv, tag = "20240102T000000")
      .destinationRows == 11)

    // update id=3 in place: count stable, value updated
    exec("""update data_merge set value = 'K',
      last_modified = timestamp('2024-01-03 10:00:00') where id = 3""")
    val r3 = JdbcLoaderIncrementalMerge.run(spark, argv, tag = "20240103T000000")
    assert(r3.destinationRows == 11)
    assert(spark.table("cli_merge.data").where($"id" === 3)
      .select("value").as[String].head() == "K")
  }

  test("exporter/importer CLI round-trip with list file (C5/C6)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS cli_exp")
    spark.range(5).toDF("id").write.mode("overwrite").saveAsTable("cli_exp.t5")
    val out = Files.createTempDirectory("graft-cli-export").toString
    val list = Files.createTempFile("graft-export-list", ".txt")
    Files.writeString(list, "cli_exp.t5\n\n")

    assert(HiveExporter.run(spark,
      Seq("-l", list.toString, "-o", out)) == Seq("cli_exp.t5"))
    assert(Files.isDirectory(java.nio.file.Paths.get(s"$out/cli_exp.t5")))

    spark.sql("DROP TABLE cli_exp.t5")
    assert(HiveImporter.run(spark, Seq("-i", out)) == Seq("cli_exp.t5"))
    assert(spark.table("cli_exp.t5").count() == 5)
  }

  test("exporter CLI rejects a malformed list line (C5 strict)") {
    val list = Files.createTempFile("graft-bad-list", ".txt")
    Files.writeString(list, "cli_exp.t5\nnodot\n")
    val e = intercept[CliError](
      HiveExporter.run(spark, Seq("-l", list.toString)))
    assert(e.getMessage.contains("nodot"))
  }

  test("C6 relative output dirs anchor at the working directory") {
    assert(HiveExporter.resolveOutputDir("/abs/x") == "file:///abs/x")
    assert(HiveExporter.resolveOutputDir("rel") ==
      s"file://${sys.props("user.dir")}/rel")
  }

  test("metadata exporter CLI writes a reopenable Derby file") {
    spark.sql("CREATE DATABASE IF NOT EXISTS cli_exp")
    spark.range(2).toDF("id").write.mode("overwrite").saveAsTable("cli_exp.m1")
    val f = Files.createTempDirectory("graft-cli-meta").resolve("meta.sav")
    val storedUrl = HiveMetadataExporter.run(spark,
      Seq("-e", f.toString, "-b", "cli_exp"), extractTs = 42L)
    val back = Catalog.MetadataStore.load(spark, storedUrl)
    assert(back.where($"tbl_name" === "m1").count() == 1)
    assert(back.select("extract_ts").as[Long].head() == 42L)
  }

  test("C2 validation failures surface as CliError with the reference wording") {
    def parse(extra: String*) =
      CommonArgs.parse(Seq("-u", url) ++ extra)
    assert(intercept[CliError](parse()).getMessage.contains("must be specified"))
    assert(intercept[CliError](parse("-t", "a", "-q", "select 1"))
      .getMessage.contains("but not both"))
    assert(intercept[CliError](parse("-q", "select 1"))
      .getMessage.contains("hive-table"))
    assert(intercept[CliError](parse("-t", "a", "-m", "4"))
      .getMessage.contains("specified together"))
    assert(intercept[CliError](parse("-t", "a", "-U", "u"))
      .getMessage.contains("specified together"))
    assert(intercept[CliError](Cli.parse(Seq("--nope"), CommonArgs.flags))
      .getMessage.contains("unknown argument"))
  }

  test("C7 destination derives from hive-table or dbtable") {
    assert(CommonArgs.parse(Seq("-u", url, "-t", "db1.tbl1")).destination ==
      ("db1", "tbl1"))
    assert(CommonArgs.parse(
      Seq("-u", url, "-t", "src_tbl", "-H", "db2.t2")).destination ==
      ("db2", "t2"))
  }
}
