package graft.cli

import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.operators.{Catalog, Ingest, IngestReport}
import graft.sources.Connections

/** The reference's seven executables re-derived as `main`s over the graft
  * library (SURVEY §2 C1-C9). Each CLI has a testable `run(spark, argv)`
  * body; `main` wraps it with a session, error handling, and the C9 report
  * log. Sessions come from `SparkSession.builder().getOrCreate()` so
  * `spark-submit --class graft.cli.X` works and tests can pre-install a
  * local session.
  */
private[cli] object Sessions {
  def get(name: String): SparkSession =
    GraftSession.tune(
      SparkSession.builder().appName(name)
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .getOrCreate())

  /** C9 report triple (/root/reference/jdbc_loader_spark2.py:45-47). */
  def logReport(r: IngestReport): Unit = {
    println(s"Source rows = ${r.sourceRows}")
    println(s"Ingested rows = ${r.ingestedRows}")
    println(s"Destination rows = ${r.destinationRows}")
  }
}

/** Export listed tables to files — `hive_exporter_spark2.py`.
  * Flags: -l export list (required), -o output dir (default `export`),
  * -O output format (default parquet). */
object HiveExporter {
  import Cli.Flag
  val flags = Seq(
    Flag("l", "exportlist", required = true),
    Flag("o", "outputdir", default = Some("export")),
    Flag("O", "outputformat", default = Some("parquet")))

  /** C6: absolute path → `file://<path>`; relative → `file://<cwd>/<path>`
    * (hive_exporter_spark2.py:43-46; the reference anchors at the script
    * dir — a JVM has no script dir, so the working dir is the anchor). */
  def resolveOutputDir(out: String): String =
    if (out.startsWith("/")) s"file://$out"
    else s"file://${sys.props("user.dir")}/$out"

  /** C5 strict form: the reference *raises* on a non-matching, non-blank
    * line (hive_exporter_spark2.py:38-41). */
  def parseExportListStrict(content: String): Seq[String] =
    content.linesIterator.map(_.trim).filter(_.nonEmpty).map { tbl =>
      if (!tbl.matches("^.*\\..*$"))
        throw CliError(
          s"""Invalid table name "$tbl", expected db_name.table_name pattern""")
      tbl
    }.toSeq

  def run(spark: SparkSession, argv: Seq[String]): Seq[String] = {
    val a = Cli.parse(argv, flags)
    val tables = parseExportListStrict(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(a("exportlist")))))
    Catalog.exportTables(spark, tables, resolveOutputDir(a("outputdir")),
      a("outputformat"))
    tables
  }

  def main(argv: Array[String]): Unit =
    Cli.main0(run(Sessions.get("hive-exporter"), argv.toSeq))
}

/** Import exported datasets back into the catalog — `hive_importer_spark2.py`.
  * Flags: -i import dir (required), -I input format, -f storage format,
  * -o overwrite. */
object HiveImporter {
  import Cli.Flag
  val flags = Seq(
    Flag("i", "importdir", required = true),
    Flag("I", "inputformat", default = Some("parquet")),
    Flag("f", "storageformat", default = Some("parquet")),
    Flag("o", "overwrite", takesValue = false))

  def run(spark: SparkSession, argv: Seq[String]): Seq[String] = {
    val a = Cli.parse(argv, flags)
    Catalog.importTables(spark, a("importdir"), a("inputformat"),
      overwrite = a.get("overwrite").contains("true"),
      storageFormat = a("storageformat"))
  }

  def main(argv: Array[String]): Unit =
    Cli.main0(run(Sessions.get("hive-importer"), argv.toSeq))
}

/** Full-refresh JDBC→catalog load — `jdbc_loader_spark2.py`. */
object JdbcLoader {
  def run(spark: SparkSession, argv: Seq[String],
      tag: String = Ingest.tagValue(Instant.now())): IngestReport = {
    val a = CommonArgs.parse(argv)
    a.applyLogLevel(spark)
    val (db, tbl) = a.destination
    val source = Connections.load(spark, a.connOpts)
    val sourceRows = Connections.pushdownCount(spark, a.connOpts)
    Ingest.fullIngestion(spark, source, db, tbl, tag,
      tagColumn = a.tagColumn, overwriteTable = a.overwrite,
      format = a.storageFormat, knownSourceRows = Some(sourceRows))
  }

  def main(argv: Array[String]): Unit = Cli.main0 {
    Sessions.logReport(run(Sessions.get("jdbc-loader"), argv.toSeq))
  }
}

/** Incremental append loader — `jdbc_loader_incremental_append_spark2.py`.
  * Extra flags (C3): -r incremental column (required), -R last value;
  * engine extension: -E/--evolve-schema opts into schema-drift handling
  * ([[Ingest.evolveSink]]) — absent from the reference, which errors on
  * drifted sources. */
object JdbcLoaderIncrementalAppend {
  import Cli.Flag
  val extraFlags = Seq(
    Flag("r", "incremental-column", required = true),
    Flag("R", "last-value"),
    Flag("E", "evolve-schema", takesValue = false))

  def run(spark: SparkSession, argv: Seq[String],
      tag: String = Ingest.tagValue(Instant.now())): IngestReport = {
    val a = CommonArgs.parse(argv, extraFlags)
    a.applyLogLevel(spark)
    val (db, tbl) = a.destination
    val source = Connections.load(spark, a.connOpts)
    val sourceRows = Connections.pushdownCount(spark, a.connOpts)
    Ingest.incrementalAppend(spark, source, db, tbl,
      incrementalColumn = a("incremental-column"), tag = tag,
      tagColumn = a.tagColumn, lastValueOverride = a.get("last-value"),
      outputPartitions = a.outputPartitions, format = a.storageFormat,
      knownSourceRows = Some(sourceRows),
      evolveSchema = a.bool("evolve-schema"))
  }

  def main(argv: Array[String]): Unit = Cli.main0 {
    Sessions.logReport(run(Sessions.get("jdbc-loader-incremental-append"), argv.toSeq))
  }
}

/** Incremental merge loader — `jdbc_loader_incremental_merge_spark2.py`.
  * Extra flags (C4): -k keys csv (required), -l last-modified column
  * (required), -L override, -r incremental column (required), -R override,
  * -d deleted column, -S scratch db. */
object JdbcLoaderIncrementalMerge {
  import Cli.Flag
  val extraFlags = Seq(
    Flag("k", "key-columns", required = true),
    Flag("l", "last-modified-column", required = true),
    Flag("L", "last-modified"),
    Flag("r", "incremental-column", required = true),
    Flag("R", "last-value"),
    Flag("d", "deleted-column"),
    Flag("S", "scratch-db", default = Some("spark_scratch")))

  def run(spark: SparkSession, argv: Seq[String],
      tag: String = Ingest.tagValue(Instant.now())): IngestReport = {
    val a = CommonArgs.parse(argv, extraFlags)
    a.applyLogLevel(spark)
    val (db, tbl) = a.destination
    val source = Connections.load(spark, a.connOpts)
    val sourceRows = Connections.pushdownCount(spark, a.connOpts)
    Ingest.incrementalMerge(spark, source, db, tbl,
      keyColumns = a("key-columns").split(",").toSeq,
      lastModifiedColumn = a("last-modified-column"),
      incrementalColumn = a("incremental-column"),
      tag = tag, tagColumn = a.tagColumn,
      deletedColumn = a.get("deleted-column"),
      scratchDb = a("scratch-db"),
      lastModifiedOverride = a.get("last-modified"),
      lastIncrementalOverride = a.get("last-value"),
      outputPartitions = a.outputPartitions, format = a.storageFormat,
      knownSourceRows = Some(sourceRows))
  }

  def main(argv: Array[String]): Unit = Cli.main0 {
    Sessions.logReport(run(Sessions.get("jdbc-loader-incremental-merge"), argv.toSeq))
  }
}

/** Metadata exporter — `hive_metadata_exporter.py`. The reference dials
  * HiveServer2 over JDBC and writes SQLite; in-process the session catalog
  * IS the metastore, and the durable file is embedded Derby
  * ([[Catalog.MetadataStore]]). Flags: -e export file (default
  * `hive-metadata-export.sav`), -b databases csv filter (all when absent). */
object HiveMetadataExporter {
  import Cli.Flag
  val flags = Seq(
    Flag("e", "exportfile", default = Some("hive-metadata-export.sav")),
    Flag("b", "databases"))

  def run(spark: SparkSession, argv: Seq[String],
      extractTs: Long = Instant.now().getEpochSecond): String = {
    val a = Cli.parse(argv, flags)
    val dbs = a.get("databases").map(_.split(",").toSeq)
    val url = "jdbc:derby:" +
      java.nio.file.Paths.get(a("exportfile")).toAbsolutePath + ";create=true"
    Catalog.MetadataStore.save(
      Catalog.exportMetadata(spark, dbs, extractTs), url)
    url
  }

  def main(argv: Array[String]): Unit =
    Cli.main0(run(Sessions.get("hive-metadata-exporter"), argv.toSeq))
}
