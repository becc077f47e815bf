package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** JDBC source options mirroring the reference CLI's shared argument set
  * (/root/reference/spark_loaders.py:15-33):
  * url/driver/user/password, dbtable XOR query, Sqoop-style range
  * partitioning, fetch tuning, session-init statement.
  */
final case class ConnOpts(
    url: String,
    driver: String,
    dbtable: Option[String] = None,
    query: Option[String] = None,
    user: Option[String] = None,
    password: Option[String] = None,
    partitionColumn: Option[String] = None,
    numPartitions: Option[Int] = None,
    queryTimeout: Option[Int] = None,
    fetchSize: Option[Int] = None,
    sessionInitStatement: Option[String] = None) {

  /** dbtable XOR query; partitioning and credentials come in pairs
    * (spark_loaders.py:35-56). */
  def validate(): Either[String, ConnOpts] =
    if (dbtable.isEmpty == query.isEmpty)
      Left("exactly one of dbtable or query is required")
    else if (partitionColumn.isEmpty != numPartitions.isEmpty)
      Left("partitionColumn and numPartitions must be set together")
    else if (user.isEmpty != password.isEmpty)
      Left("user and password must be set together")
    else Right(this)
}

/** Builds Spark JDBC readers with the reference's connection semantics
  * (/root/reference/spark_loaders.py:58-109): option passthrough, parallel
  * range-partitioned scans with a min/max bounds probe, Oracle DATE shim.
  *
  * Scale: the bounds probe is one single-row round-trip; the partitioned scan
  * opens `numPartitions` source connections, one per executor task — the
  * Sqoop pattern. Aggregate pushdown (`pushDownAggregate`) keeps count()
  * source-side.
  */
object Connections {

  /** One-row min/max probe on a side connection (spark_loaders.py:90-96).
    *
    * The bounds pass through as STRINGS, exactly like the reference
    * (`str(lower_bound)`, spark_loaders.py:101-102): Spark's JDBC source
    * parses `lowerBound`/`upperBound` according to the partition column's
    * type, so numeric columns get numeric strings and DATE / TIMESTAMP
    * columns get their JDBC text forms ("2024-01-03",
    * "2024-01-03 10:15:30.0") — both shapes Spark accepts natively. A
    * previous revision coerced `.toString.toLong`, which threw
    * NumberFormatException on the reference README's own partitioned-load
    * example (`--partition-column created_date`, README.rst:80-84). */
  def bounds(spark: SparkSession, opts: ConnOpts): (Option[String], Option[String]) = {
    val c = opts.partitionColumn.getOrElse(
      throw new IllegalArgumentException("bounds probe needs partitionColumn"))
    val rel = opts.dbtable.map(t => s"$t").getOrElse(s"(${opts.query.get})")
    val probeSql =
      s"select min($c) as lower_bound, max($c) as upper_bound from $rel t"
    val row = base(spark, opts.copy(dbtable = None, query = Some(probeSql),
      partitionColumn = None, numPartitions = None)).load().head()
    (Option(row.get(0)).map(_.toString), Option(row.get(1)).map(_.toString))
  }

  /** The JDBC option map for a connection — pure and testable. Includes the
    * Oracle DATE shim (spark_loaders.py:104-107): keep DATE as DATE and pin
    * the timestamp format for the session. */
  def optionMap(opts: ConnOpts): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    m += ("url" -> opts.url)
    if (opts.driver.nonEmpty) m += ("driver" -> opts.driver)
    opts.dbtable.foreach(v => m += ("dbtable" -> v))
    opts.query.foreach(v => m += ("query" -> v))
    opts.user.foreach(v => m += ("user" -> v))
    opts.password.foreach(v => m += ("password" -> v))
    opts.queryTimeout.foreach(v => m += ("queryTimeout" -> v.toString))
    opts.fetchSize.foreach(v => m += ("fetchsize" -> v.toString))
    opts.sessionInitStatement.foreach(v => m += ("sessionInitStatement" -> v))
    if (opts.url.startsWith("jdbc:oracle")) {
      m += ("oracle.jdbc.mapDateToTimestamp" -> "false")
      if (opts.sessionInitStatement.isEmpty)
        m += ("sessionInitStatement" ->
          "ALTER SESSION SET NLS_TIMESTAMP_FORMAT = 'YYYY-MM-DD HH24:MI:SS.FF'")
    }
    m.result()
  }

  private def base(spark: SparkSession, opts: ConnOpts): DataFrameReader =
    spark.read.format("jdbc").options(optionMap(opts))

  /** Reader with Sqoop-style parallel range partitioning when requested
    * (spark_loaders.py:89-102). */
  def reader(spark: SparkSession, opts: ConnOpts): DataFrameReader =
    (opts.partitionColumn, opts.numPartitions) match {
      case (Some(c), Some(n)) =>
        bounds(spark, opts) match {
          case (Some(lo), Some(hi)) =>
            base(spark, opts)
              .option("partitionColumn", c)
              .option("numPartitions", n)
              .option("lowerBound", lo)
              .option("upperBound", hi)
          case _ =>
            // NULL min/max = the source relation is empty (or the column
            // all-NULL): no stride bounds exist in ANY type, so fall back
            // to a single-partition scan of the empty relation. The
            // reference crashes here (str(None) -> "None" never parses);
            // an empty load is the honest result.
            base(spark, opts)
        }
      case _ => base(spark, opts)
    }

  def load(spark: SparkSession, opts: ConnOpts): DataFrame =
    reader(spark, opts).load()

  /** Source-side row count (/root/reference/jdbc_loader_spark2.py:33-35).
    * The reference sets `pushDownAggregate`, but Spark's `format("jdbc")`
    * reader is DataSource V1, where that option is a silent no-op — the
    * "pushed-down" count actually streams every row. The guaranteed form
    * on ANY database is a `select count(*)` shipped through the `query`
    * option: one row crosses the wire. */
  def pushdownCount(spark: SparkSession, opts: ConnOpts): Long = {
    val rel = opts.dbtable.getOrElse(s"(${opts.query.get})")
    val countSql = s"select count(*) as cnt from $rel t"
    base(spark, opts.copy(dbtable = None, query = Some(countSql),
      partitionColumn = None, numPartitions = None))
      .load().head().get(0).asInstanceOf[Number].longValue()
  }
}
