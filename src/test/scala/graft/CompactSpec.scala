package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compact

/** Small-files compaction: file-count math, in-place rewrite, row
  * preservation. */
class CompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("planFileCount: ceiling division, never zero") {
    assert(Compact.planFileCount(0L, 128) == 1)
    assert(Compact.planFileCount(1L, 128) == 1)
    assert(Compact.planFileCount(128L, 128) == 1)
    assert(Compact.planFileCount(129L, 128) == 2)
    assert(Compact.planFileCount(1280L, 128) == 10)
  }

  test("compacting a partitioned table coalesces within partitions") {
    GraftSession.tune(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS compact_db")
    spark.sql("DROP TABLE IF EXISTS compact_db.part_frag")
    val events = spark.read
      .parquet(TestSpark.sf("sf0.001") + "/events.parquet")
      .withColumn("bucket", (col("event_id") % 3).cast("string"))
    // 10 files per partition value
    events.repartition(10)
      .write.partitionBy("bucket").format("parquet")
      .saveAsTable("compact_db.part_frag")
    val (files0, _) = Compact.fileStats(spark, "compact_db.part_frag")
    assert(files0 >= 20, s"fixture not fragmented: $files0 files")

    val report = Compact.compact(
      spark, "compact_db", "part_frag", targetBytes = 1L << 30)
    // one file per partition value, not one per (task x partition)
    assert(report.filesAfter <= 3, s"still fragmented: ${report.filesAfter}")
    assert(report.rows == events.count())
    val after = spark.table("compact_db.part_frag")
    assert(after.select("event_id").exceptAll(events.select("event_id")).isEmpty)
    spark.sql("DROP DATABASE compact_db CASCADE")
  }

  test("compact rewrites a fragmented table into few files, same rows") {
    GraftSession.tune(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS compact_db")
    spark.sql("DROP TABLE IF EXISTS compact_db.frag")
    // fragment: 40 tiny files from one small dataset
    val events = spark.read
      .parquet(TestSpark.sf("sf0.001") + "/events.parquet")
    events.repartition(40)
      .write.format("parquet").saveAsTable("compact_db.frag")
    val (files0, bytes0) = Compact.fileStats(spark, "compact_db.frag")
    assert(files0 == 40, s"fixture not fragmented: $files0 files")

    val report = Compact.compact(
      spark, "compact_db", "frag", targetBytes = bytes0) // one target file
    assert(report.filesBefore == 40)
    assert(report.filesAfter < 5, s"still fragmented: ${report.filesAfter}")
    assert(report.rows == events.count())
    // content identical (order-insensitive)
    val after = spark.table("compact_db.frag")
    assert(after.exceptAll(events).isEmpty && events.exceptAll(after).isEmpty)
    spark.sql("DROP DATABASE compact_db CASCADE")
  }

  test("expireTags drops only partitions below the retention watermark") {
    import spark.implicits._
    import graft.operators.Ingest
    spark.sql("CREATE DATABASE IF NOT EXISTS expire_db")
    spark.sql("DROP TABLE IF EXISTS expire_db.tagged")
    def batch(ids: Range, tag: String) =
      Ingest.incrementalAppend(spark,
        ids.map(i => (i, s"v$i")).toDF("id", "value"),
        "expire_db", "tagged", incrementalColumn = "id", tag = tag)
    batch(0 until 10, "20240101T000000")
    batch(10 until 20, "20240102T000000")
    batch(20 until 30, "20240103T000000")
    val dropped = Compact.expireTags(
      spark, "expire_db", "tagged", keepFrom = "20240102T000000")
    assert(dropped == Seq("20240101T000000"))
    val left = spark.table("expire_db.tagged")
    assert(left.count() == 20)
    assert(left.select("dl_ingest_date").distinct().as[String].collect().sorted
      .toSeq == Seq("20240102T000000", "20240103T000000"))
    // idempotent: nothing else below the watermark remains
    assert(Compact.expireTags(
      spark, "expire_db", "tagged", keepFrom = "20240102T000000").isEmpty)
    // a non-tag-partitioned table is refused, not silently mangled
    spark.sql("DROP TABLE IF EXISTS expire_db.bypart")
    (0 until 5).map(i => (i, s"p$i")).toDF("id", "p")
      .write.partitionBy("p").saveAsTable("expire_db.bypart")
    assertThrows[IllegalArgumentException] {
      Compact.expireTags(spark, "expire_db", "bypart", keepFrom = "x")
    }
    spark.sql("DROP DATABASE expire_db CASCADE")
  }

  test("rollbackToTag undoes every batch after the kept tag") {
    import spark.implicits._
    import graft.operators.Ingest
    spark.sql("CREATE DATABASE IF NOT EXISTS rollback_db")
    spark.sql("DROP TABLE IF EXISTS rollback_db.tagged")
    def batch(ids: Range, tag: String) =
      Ingest.incrementalAppend(spark,
        ids.map(i => (i, s"v$i")).toDF("id", "value"),
        "rollback_db", "tagged", incrementalColumn = "id", tag = tag)
    batch(0 until 10, "20240101T000000")
    batch(10 until 20, "20240102T000000")
    batch(20 until 30, "20240103T000000")
    val dropped = Compact.rollbackToTag(
      spark, "rollback_db", "tagged", keepThrough = "20240101T000000")
    assert(dropped == Seq("20240102T000000", "20240103T000000"))
    val left = spark.table("rollback_db.tagged")
    assert(left.count() == 10)
    assert(left.select("dl_ingest_date").distinct().as[String].collect()
      .toSeq == Seq("20240101T000000"))
    // idempotent: a second rollback to the same point drops nothing
    assert(Compact.rollbackToTag(
      spark, "rollback_db", "tagged", keepThrough = "20240101T000000").isEmpty)
    // a fresh append after the rollback lands cleanly
    batch(30 until 35, "20240104T000000")
    assert(spark.table("rollback_db.tagged").count() == 15)
    spark.sql("DROP DATABASE rollback_db CASCADE")
  }
}
