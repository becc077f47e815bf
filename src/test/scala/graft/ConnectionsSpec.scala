package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ConnOpts, Connections}

/** Executes the whole JDBC surface (SURVEY §2 S2-S7, A2, A4, C2) against an
  * embedded Derby database — the offline stand-in for the reference's
  * MySQL/Oracle sources (/root/reference/spark_loaders.py:58-109,35-56).
  * Derby runs in-JVM, so local[n] executor threads each open their own
  * connection exactly like executors on a real cluster would.
  */
class ConnectionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark

  private val dbPath =
    Files.createTempDirectory("graft-derby").resolve("srcdb").toString
  private val url = s"jdbc:derby:$dbPath;create=true"
  private val DerbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private def opts: ConnOpts =
    ConnOpts(url = url, driver = DerbyDriver, dbtable = Some("people"))

  override def beforeAll(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "create table people (id int not null, name varchar(30), score double)")
      val ps = conn.prepareStatement("insert into people values (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"name_$i"); ps.setDouble(3, i * 0.5)
        ps.addBatch()
      }
      ps.executeBatch()
      // 90 rows over 90 consecutive days: the DATE-partitioned-scan cases
      // stride Jan 1 .. Mar 30 2024 across 4 partitions.
      st.execute(
        "create table signups (id int not null, created_date date not null)")
      val ps2 = conn.prepareStatement("insert into signups values (?, ?)")
      (0 until 90).foreach { i =>
        ps2.setInt(1, i)
        ps2.setDate(2, java.sql.Date.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)))
        ps2.addBatch()
      }
      ps2.executeBatch()
      st.close(); ps.close(); ps2.close()
    } finally conn.close()
  }

  // --- S2: plain table scan ---------------------------------------------
  test("S2 jdbc table scan round-trips all rows and columns") {
    val df = Connections.load(spark, opts)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "score"))
    assert(df.count() == 100)
    assert(df.where("id = 7").head().getString(1) == "name_7")
  }

  // --- S3: arbitrary-query scan (pushdown of whole SQL) -----------------
  test("S3 jdbc query scan runs the user SQL source-side") {
    val q = "select id, name from people where id <= 10"
    val df = Connections.load(spark, opts.copy(dbtable = None, query = Some(q)))
    assert(df.columns.length == 2)
    assert(df.count() == 10)
  }

  // --- S5/A4: bounds probe ----------------------------------------------
  test("S5/A4 bounds probe returns min/max of the partition column") {
    val (lo, hi) = Connections.bounds(spark, opts.copy(
      partitionColumn = Some("id"), numPartitions = Some(4)))
    assert(lo.contains("1") && hi.contains("100"))
  }

  test("S5 bounds probe works over a query relation too") {
    val (lo, hi) = Connections.bounds(spark, opts.copy(
      dbtable = None, query = Some("select * from people where id <= 50"),
      partitionColumn = Some("id"), numPartitions = Some(2)))
    assert(lo.contains("1") && hi.contains("50"))
  }

  // --- S5/S4: DATE partition column (the reference README's own example:
  // `-m 10 --partition-column created_date`, README.rst:80-84; its probe
  // passes bounds through as strings, spark_loaders.py:101-102). Bounds
  // must flow as JDBC text, never via a numeric coercion. ----------------
  test("S5 bounds probe passes DATE bounds through as strings") {
    val (lo, hi) = Connections.bounds(spark, ConnOpts(
      url = url, driver = DerbyDriver, dbtable = Some("signups"),
      partitionColumn = Some("created_date"), numPartitions = Some(4)))
    assert(lo.contains("2024-01-01") && hi.contains("2024-03-30"))
  }

  test("S4 partitioned scan over a DATE column yields full, exact data") {
    val df = Connections.load(spark, ConnOpts(
      url = url, driver = DerbyDriver, dbtable = Some("signups"),
      partitionColumn = Some("created_date"), numPartitions = Some(4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 90)
    // no stride drops rows and none double-reads
    assert(df.select("id").distinct().count() == 90)
    assert(df.where("created_date = DATE'2024-01-01'").count() == 1)
  }

  test("S4 partitioned scan over an EMPTY relation degrades to one clean partition") {
    val df = Connections.load(spark, ConnOpts(
      url = url, driver = DerbyDriver, dbtable = None,
      query = Some("select * from signups where id < 0"),
      partitionColumn = Some("created_date"), numPartitions = Some(4)))
    assert(df.count() == 0)
  }

  // --- S4: partitioned parallel scan ------------------------------------
  test("S4 partitioned jdbc scan yields numPartitions tasks and full data") {
    val df = Connections.load(spark, opts.copy(
      partitionColumn = Some("id"), numPartitions = Some(4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    // no partition drops rows and none double-reads
    assert(df.select("id").distinct().count() == 100)
  }

  // --- S6: tuning options pass through and the scan still works ---------
  test("S6 queryTimeout/fetchsize/sessionInitStatement are honored") {
    val tuned = opts.copy(queryTimeout = Some(30), fetchSize = Some(17),
      sessionInitStatement = Some("values 1"))
    assert(Connections.optionMap(tuned)("fetchsize") == "17")
    assert(Connections.optionMap(tuned)("queryTimeout") == "30")
    assert(Connections.load(spark, tuned).count() == 100)
  }

  // --- S7: Oracle dialect shim ------------------------------------------
  test("S7 oracle urls get the DATE shim and a default NLS session init") {
    val m = Connections.optionMap(ConnOpts(
      url = "jdbc:oracle:thin:@db:1521/svc", driver = "oracle.jdbc.OracleDriver",
      dbtable = Some("t")))
    assert(m("oracle.jdbc.mapDateToTimestamp") == "false")
    assert(m("sessionInitStatement").startsWith("ALTER SESSION SET NLS_TIMESTAMP_FORMAT"))
    // a user-supplied init statement is never overridden
    val m2 = Connections.optionMap(ConnOpts(
      url = "jdbc:oracle:thin:@db:1521/svc", driver = "oracle.jdbc.OracleDriver",
      dbtable = Some("t"), sessionInitStatement = Some("ALTER SESSION SET X = 1")))
    assert(m2("sessionInitStatement") == "ALTER SESSION SET X = 1")
    // non-oracle urls get no shim
    assert(!Connections.optionMap(opts).contains("oracle.jdbc.mapDateToTimestamp"))
  }

  // --- A2: pushed-down count --------------------------------------------
  test("A2 pushdownCount matches the source row count") {
    assert(Connections.pushdownCount(spark, opts) == 100)
    // and over a filtered query relation
    assert(Connections.pushdownCount(spark, opts.copy(
      dbtable = None, query = Some("select * from people where id > 90"))) == 10)
  }

  // --- filter pushdown reaches the source (scale posture) ---------------
  test("watermark-style filter is pushed into the JDBC scan") {
    val df = Connections.load(spark, opts).where("id > 95")
    val physical = df.queryExecution.executedPlan.toString
    // Derby uppercases identifiers; the predicate must appear inside the
    // scan's PushedFilters, not as a separate Filter node.
    assert(physical.contains("GreaterThan(ID,95)"),
      s"filter did not reach the JDBC source:\n$physical")
    assert(df.count() == 5)
  }

  // --- C2: every validation arm -----------------------------------------
  test("C2 validate: dbtable XOR query") {
    assert(opts.validate().isRight)
    assert(opts.copy(dbtable = None, query = Some("select 1")).validate().isRight)
    assert(opts.copy(dbtable = None, query = None).validate().isLeft)
    assert(opts.copy(query = Some("select 1")).validate().isLeft)
  }

  test("C2 validate: partitionColumn and numPartitions are paired") {
    assert(opts.copy(partitionColumn = Some("id"), numPartitions = Some(2))
      .validate().isRight)
    assert(opts.copy(partitionColumn = Some("id")).validate().isLeft)
    assert(opts.copy(numPartitions = Some(2)).validate().isLeft)
  }

  test("C2 validate: user and password are paired") {
    assert(opts.copy(user = Some("u"), password = Some("p")).validate().isRight)
    assert(opts.copy(user = Some("u")).validate().isLeft)
    assert(opts.copy(password = Some("p")).validate().isLeft)
  }

  // --- JDBC sink round-trip (basis for the durable metadata sink) -------
  test("jdbc write then read round-trips through Derby") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    df.write.format("jdbc")
      .options(Connections.optionMap(opts.copy(dbtable = Some("kv"))))
      .mode("overwrite").save()
    val back = Connections.load(spark, opts.copy(dbtable = Some("kv")))
    assert(back.orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      == Seq((1, "a"), (2, "b")))
  }
}
