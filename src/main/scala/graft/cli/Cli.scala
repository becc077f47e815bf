package graft.cli

import org.apache.spark.sql.SparkSession

import graft.sources.ConnOpts

/** CLI argument error — mains print the message and exit 1; tests catch. */
final case class CliError(message: String) extends RuntimeException(message)

/** Minimal dependency-free flag parser: short (`-u v`), long (`--jdbc v`),
  * and boolean flags. Mirrors the reference's argparse surface
  * (/root/reference/spark_loaders.py:15-33). */
object Cli {
  final case class Flag(
      short: String, long: String, takesValue: Boolean = true,
      default: Option[String] = None, required: Boolean = false)

  /** Parse `args` against `flags`; returns values keyed by long name.
    * Boolean flags map to "true" when present. */
  def parse(args: Seq[String], flags: Seq[Flag]): Map[String, String] = {
    val byName = flags.flatMap(f => Seq(s"-${f.short}" -> f, s"--${f.long}" -> f)).toMap
    val out = Map.newBuilder[String, String]
    var rest = args.toList
    while (rest.nonEmpty) {
      val arg = rest.head
      byName.get(arg) match {
        case None => throw CliError(s"unknown argument: $arg")
        case Some(f) if !f.takesValue =>
          out += (f.long -> "true"); rest = rest.tail
        case Some(f) =>
          rest.tail match {
            case v :: tl => out += (f.long -> v); rest = tl
            case Nil     => throw CliError(s"missing value for $arg")
          }
      }
    }
    val parsed = out.result()
    flags.filter(_.required).foreach { f =>
      if (!parsed.contains(f.long))
        throw CliError(s"-${f.short}/--${f.long} is required")
    }
    flags.foldLeft(parsed) { (m, f) =>
      f.default.fold(m)(d => if (m.contains(f.long)) m else m.updated(f.long, d))
    }
  }

  def main0(body: => Unit): Unit =
    try body
    catch {
      case CliError(msg) => System.err.println(msg); sys.exit(1)
    }
}

/** The shared loader argument set — SURVEY §2 C1
  * (/root/reference/spark_loaders.py:15-33). */
final case class CommonArgs(values: Map[String, String]) {
  def get(k: String): Option[String] = values.get(k)
  def apply(k: String): String = values(k)
  def bool(k: String): Boolean = values.get(k).contains("true")

  def jdbc: String = values("jdbc")
  def dbtable: Option[String] = get("dbtable")
  def query: Option[String] = get("query")
  def hiveTable: Option[String] = get("hive-table")
  def tagColumn: String = values("ingestion-tag-column")
  def storageFormat: String = values("storageformat")
  def overwrite: Boolean = bool("overwrite")
  def verbose: Boolean = bool("verbose")
  def outputPartitions: Seq[String] =
    get("output-partition-columns").map(_.split(",").toSeq).getOrElse(Nil)

  /** C7: hive table name = `(hive_table or dbtable).split('.')`
    * (/root/reference/jdbc_loader_spark2.py:31). */
  def destination: (String, String) = {
    val full = hiveTable.orElse(dbtable).getOrElse(
      throw CliError("-H/--hive-table or -t/--dbtable required to name the destination"))
    full.split("\\.", 2) match {
      case Array(db, tbl) => (db, tbl)
      case _ => throw CliError(s"expected db_name.table_name, got '$full'")
    }
  }

  def connOpts: ConnOpts = ConnOpts(
    url = jdbc,
    driver = get("driver").getOrElse(""),
    dbtable = dbtable,
    query = query,
    user = get("username"),
    password = get("password"),
    partitionColumn = get("partition-column"),
    numPartitions = get("num-partitions").map(_.toInt),
    queryTimeout = get("query-timeout").map(_.toInt),
    fetchSize = get("fetch-size").map(_.toInt),
    sessionInitStatement = get("init"))

  /** C2 validation (/root/reference/spark_loaders.py:35-56). */
  def validated: CommonArgs = {
    if (dbtable.nonEmpty && query.nonEmpty)
      throw CliError("Either -t/--dbtable or -q/--query shall be specified, but not both")
    if (dbtable.isEmpty && query.isEmpty)
      throw CliError("Either -t/--dbtable or -q/--query must be specified")
    if (dbtable.isEmpty && hiveTable.isEmpty)
      throw CliError("-H/--hive-table is required when using with -q/--query")
    if (get("num-partitions").isEmpty != get("partition-column").isEmpty)
      throw CliError("-m/--num-partitions and -p/--partition-column must be specified together")
    if (get("username").isEmpty != get("password").isEmpty)
      throw CliError("-U/--username and -P/--password must be specified together")
    this
  }

  /** C8: log-level switch (/root/reference/spark_loaders.py:75-78). */
  def applyLogLevel(spark: SparkSession): Unit =
    spark.sparkContext.setLogLevel(if (verbose) "INFO" else "WARN")
}

object CommonArgs {
  import Cli.Flag

  val flags: Seq[Flag] = Seq(
    Flag("u", "jdbc", required = true),
    Flag("D", "driver"),
    Flag("U", "username"),
    Flag("P", "password"),
    Flag("t", "dbtable"),
    Flag("H", "hive-table"),
    Flag("q", "query"),
    Flag("p", "partition-column"),
    Flag("y", "output-partition-columns"),
    Flag("m", "num-partitions"),
    Flag("T", "query-timeout"),
    Flag("F", "fetch-size"),
    Flag("I", "init"),
    Flag("i", "ingestion-tag-column", default = Some("dl_ingest_date")),
    Flag("s", "storageformat", default = Some("parquet")),
    Flag("O", "overwrite", takesValue = false),
    Flag("v", "verbose", takesValue = false))

  def parse(args: Seq[String], extra: Seq[Flag] = Nil): CommonArgs =
    CommonArgs(Cli.parse(args, flags ++ extra)).validated
}
