package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Row of the metadata-export table
  * (/root/reference/hive_metadata_exporter.py:46-57). */
final case class ExportedTable(
    db_name: String, tbl_name: String, createstmt: String, extract_ts: Long)

/** Catalog-facing operators: table export/import round-trip and metadata
  * export — the reference's `hive_exporter_spark2.py`,
  * `hive_importer_spark2.py` and `hive_metadata_exporter.py` re-derived on
  * `spark.catalog` (no side JDBC connection to HiveServer2 needed).
  */
object Catalog {

  /** Export-list parser: one `db.tbl` per line, blanks skipped, must contain
    * a dot (/root/reference/hive_exporter_spark2.py:32-41). */
  def parseExportList(content: String): Seq[String] =
    content.linesIterator.map(_.trim).filter(_.nonEmpty)
      .filter(_.matches(".*\\..*")).toSeq

  /** Export each listed table to `<outDir>/<db.tbl>` in `format`
    * (hive_exporter_spark2.py:48-51). */
  def exportTables(
      spark: SparkSession,
      tables: Seq[String],
      outDir: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Unit =
    tables.foreach { t =>
      spark.table(t).write.format(format).options(options)
        .mode(SaveMode.Overwrite)
        .save(s"$outDir/$t")
    }

  /** Import every `<db.tbl>/` dataset under `inDir` back into the catalog via
    * CTAS (hive_importer_spark2.py:25-35). Returns imported table names. */
  def importTables(
      spark: SparkSession,
      inDir: String,
      inputFormat: String = "parquet",
      overwrite: Boolean = false,
      storageFormat: String = "parquet"): Seq[String] = {
    val dirs = Files.list(Paths.get(inDir)).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filter(_.matches(".*\\..*"))
      .toSeq.sorted
    dirs.map { name =>
      val Array(db, tbl) = name.split("\\.", 2)
      val df = spark.read.format(inputFormat).load(s"$inDir/$name")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
      if (overwrite) spark.sql(s"DROP TABLE IF EXISTS `$db`.`$tbl`")
      df.write.format(storageFormat)
        .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
        .saveAsTable(s"`$db`.`$tbl`")
      s"$db.$tbl"
    }
  }

  /** `SHOW CREATE TABLE` for every table of every (or the given) database,
    * as a typed Dataset — the reference's SQLite dump re-derived
    * (hive_metadata_exporter.py:61-88). `extractTs` injectable for
    * deterministic tests. */
  def exportMetadata(
      spark: SparkSession,
      databases: Option[Seq[String]],
      extractTs: Long): Dataset[ExportedTable] = {
    import spark.implicits._
    val dbs = databases.getOrElse(
      spark.catalog.listDatabases().collect().map(_.name).toSeq)
    val rows = for {
      db <- dbs
      t <- spark.catalog.listTables(db).collect()
      if t.tableType != "VIEW" && t.tableType != "TEMPORARY"
    } yield ExportedTable(
      db, t.name,
      spark.sql(s"SHOW CREATE TABLE `$db`.`${t.name}`").head().getString(0),
      extractTs)
    rows.toDS()
  }

  /** Full-refresh keyed upsert of the metadata table, the reference's
    * delete+insert/update semantics (hive_metadata_exporter.py:66-88)
    * expressed as reconcile-latest over a union. */
  def upsertMetadata(
      spark: SparkSession,
      existing: DataFrame,
      fresh: Dataset[ExportedTable]): DataFrame =
    Reconcile.latestPerKey(
      existing.unionByName(fresh.toDF()),
      keys = Seq("db_name", "tbl_name"),
      orderBy = Seq(col("extract_ts").desc))

  /** Durable metadata store: the reference's SQLite file
    * (hive_metadata_exporter.py:46-57) re-derived as an embedded-JDBC
    * database file. A save is the reference's full refresh —
    * create-if-absent, `delete where 1=1`, insert the fresh rows
    * (hive_metadata_exporter.py:56-71) — so re-running the export upserts
    * every table's create statement and drops vanished tables. */
  object MetadataStore {
    val Table = "exported_tables"

    private def withConn[A](url: String)(f: java.sql.Connection => A): A = {
      val conn = java.sql.DriverManager.getConnection(url)
      try f(conn) finally conn.close()
    }

    /** Full-refresh save of a metadata snapshot into the Derby file at
      * `url` (e.g. `jdbc:derby:/path/to/meta.db;create=true`). */
    def save(ds: Dataset[ExportedTable], url: String): Unit = {
      withConn(url) { conn =>
        val exists = {
          val rs = conn.getMetaData.getTables(null, null, Table.toUpperCase, null)
          try rs.next() finally rs.close()
        }
        val st = conn.createStatement()
        try {
          if (!exists)
            st.execute(s"""create table $Table (
              db_name varchar(256) not null,
              tbl_name varchar(256) not null,
              createstmt clob,
              extract_ts bigint)""")
          else st.execute(s"delete from $Table where 1=1")
        } finally st.close()
      }
      ds.toDF().write.format("jdbc")
        .option("url", url).option("dbtable", Table)
        .mode(SaveMode.Append).save()
    }

    /** Read the stored metadata back (column names lowercased — Derby
      * uppercases identifiers). */
    def load(spark: SparkSession, url: String): DataFrame = {
      val raw = spark.read.format("jdbc")
        .option("url", url).option("dbtable", Table).load()
      raw.select(raw.columns.map(c => col(c).as(c.toLowerCase)).toIndexedSeq: _*)
    }
  }
}
