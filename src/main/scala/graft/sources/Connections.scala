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

  /** One-row min/max probe on a side connection (spark_loaders.py:90-96). */
  def bounds(spark: SparkSession, opts: ConnOpts): (Option[Long], Option[Long]) = {
    val c = opts.partitionColumn.getOrElse(
      throw new IllegalArgumentException("bounds probe needs partitionColumn"))
    val rel = opts.dbtable.map(t => s"$t").getOrElse(s"(${opts.query.get})")
    val probeSql =
      s"select min($c) as lower_bound, max($c) as upper_bound from $rel t"
    val row = base(spark, opts.copy(dbtable = None, query = Some(probeSql),
      partitionColumn = None, numPartitions = None)).load().head()
    (Option(row.get(0)).map(_.toString.toLong), Option(row.get(1)).map(_.toString.toLong))
  }

  private def base(spark: SparkSession, opts: ConnOpts): DataFrameReader = {
    var r = spark.read.format("jdbc")
      .option("url", opts.url)
      .option("driver", opts.driver)
    opts.dbtable.foreach(v => r = r.option("dbtable", v))
    opts.query.foreach(v => r = r.option("query", v))
    opts.user.foreach(v => r = r.option("user", v))
    opts.password.foreach(v => r = r.option("password", v))
    opts.queryTimeout.foreach(v => r = r.option("queryTimeout", v))
    opts.fetchSize.foreach(v => r = r.option("fetchsize", v))
    opts.sessionInitStatement.foreach(v => r = r.option("sessionInitStatement", v))
    // Oracle DATE shim (spark_loaders.py:104-107): keep DATE as DATE and pin
    // the timestamp format for the session.
    if (opts.url.startsWith("jdbc:oracle")) {
      r = r.option("oracle.jdbc.mapDateToTimestamp", "false")
      if (opts.sessionInitStatement.isEmpty)
        r = r.option("sessionInitStatement",
          "ALTER SESSION SET NLS_TIMESTAMP_FORMAT = 'YYYY-MM-DD HH24:MI:SS.FF'")
    }
    r
  }

  /** Reader with Sqoop-style parallel range partitioning when requested
    * (spark_loaders.py:89-102). */
  def reader(spark: SparkSession, opts: ConnOpts): DataFrameReader =
    (opts.partitionColumn, opts.numPartitions) match {
      case (Some(c), Some(n)) =>
        val (lo, hi) = bounds(spark, opts)
        base(spark, opts)
          .option("partitionColumn", c)
          .option("numPartitions", n)
          .option("lowerBound", lo.getOrElse(0L))
          .option("upperBound", hi.getOrElse(1L))
      case _ => base(spark, opts)
    }

  def load(spark: SparkSession, opts: ConnOpts): DataFrame =
    reader(spark, opts).load()

  /** Source-side row count via DS V2 aggregate pushdown
    * (/root/reference/jdbc_loader_spark2.py:33-35). */
  def pushdownCount(spark: SparkSession, opts: ConnOpts): Long =
    base(spark, opts.copy(partitionColumn = None, numPartitions = None))
      .option("pushDownAggregate", "true").load().count()
}
