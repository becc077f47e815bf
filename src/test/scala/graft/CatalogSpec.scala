package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Catalog

/** Export → import round-trip + metadata export
  * (reference: hive_exporter_spark2.py / hive_importer_spark2.py /
  * hive_metadata_exporter.py). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("export list parser skips blanks and non-qualified names") {
    val content = "db1.t1\n\n  db2.t2  \nnodot\ndb3.t3\n"
    assert(Catalog.parseExportList(content) == Seq("db1.t1", "db2.t2", "db3.t3"))
  }

  test("export -> import round-trip preserves data") {
    val out = Files.createTempDirectory("graft-export").toString
    spark.sql("CREATE DATABASE IF NOT EXISTS exp_src")
    spark.read.parquet(TestSpark.sf("sf0.001") + "/nation.parquet")
      .write.mode("overwrite").saveAsTable("exp_src.nation")
    Catalog.exportTables(spark, Seq("exp_src.nation"), out)

    spark.sql("DROP TABLE exp_src.nation")
    val imported = Catalog.importTables(spark, out)
    assert(imported == Seq("exp_src.nation"))
    assert(spark.table("exp_src.nation").count() == 25)
    spark.sql("DROP DATABASE exp_src CASCADE")
  }

  test("non-parquet storage format: orc export -> import round-trip") {
    // the reference's -s/-f storage-format flags accept any Spark format;
    // exercise a non-default one end-to-end
    val out = Files.createTempDirectory("graft-export-orc").toString
    spark.sql("CREATE DATABASE IF NOT EXISTS exp_orc")
    spark.read.parquet(TestSpark.sf("sf0.001") + "/region.parquet")
      .write.mode("overwrite").saveAsTable("exp_orc.region")
    Catalog.exportTables(spark, Seq("exp_orc.region"), out, format = "orc")
    // files on disk really are ORC
    assert(spark.read.orc(s"$out/exp_orc.region").count() == 5)

    spark.sql("DROP TABLE exp_orc.region")
    val imported = Catalog.importTables(spark, out,
      inputFormat = "orc", storageFormat = "orc")
    assert(imported == Seq("exp_orc.region"))
    val dest = spark.table("exp_orc.region")
    assert(dest.count() == 5)
    assert(spark.sql("SHOW CREATE TABLE exp_orc.region").head().getString(0)
      .toLowerCase.contains("orc"))
    spark.sql("DROP DATABASE exp_orc CASCADE")
  }

  test("text storage formats: json export round-trip, csv export readable") {
    // json preserves nested types self-describingly; csv is the
    // lowest-common-denominator interchange (flat schemas only) — both
    // are reference -s/-f values a user could pass
    val out = Files.createTempDirectory("graft-export-text").toString
    spark.sql("CREATE DATABASE IF NOT EXISTS exp_txt")
    spark.read.parquet(TestSpark.sf("sf0.001") + "/region.parquet")
      .write.mode("overwrite").saveAsTable("exp_txt.region")
    Catalog.exportTables(spark, Seq("exp_txt.region"), out, format = "json")
    val asJson = spark.read.json(s"$out/exp_txt.region")
    assert(asJson.count() == 5)

    spark.sql("DROP TABLE exp_txt.region")
    val imported = Catalog.importTables(spark, out,
      inputFormat = "json", storageFormat = "json")
    assert(imported == Seq("exp_txt.region"))
    val dest = spark.table("exp_txt.region")
    assert(dest.count() == 5)
    // json loses no rows or key values (column order/types may relax)
    assert(dest.select("r_regionkey").collect().map(_.getLong(0)).sorted
      .sameElements(Array(0L, 1L, 2L, 3L, 4L)))

    // csv: export with header and read back by it
    spark.read.parquet(TestSpark.sf("sf0.001") + "/region.parquet")
      .write.mode("overwrite").saveAsTable("exp_txt.region_csv")
    Catalog.exportTables(spark, Seq("exp_txt.region_csv"), out, format = "csv",
      options = Map("header" -> "true"))
    val asCsv = spark.read.option("header", "true")
      .csv(s"$out/exp_txt.region_csv")
    assert(asCsv.count() == 5 && asCsv.columns.contains("r_name"))
    spark.sql("DROP DATABASE exp_txt CASCADE")
  }

  test("metadata export emits SHOW CREATE TABLE per table, upsert keeps latest") {
    spark.sql("CREATE DATABASE IF NOT EXISTS meta_src")
    spark.range(3).toDF("id").write.mode("overwrite").saveAsTable("meta_src.m1")
    val v1 = Catalog.exportMetadata(spark, Some(Seq("meta_src")), extractTs = 100L)
    assert(v1.count() == 1)
    val row = v1.head()
    assert(row.db_name == "meta_src" && row.tbl_name == "m1")
    assert(row.createstmt.toUpperCase.contains("CREATE TABLE"))

    val v2 = Catalog.exportMetadata(spark, Some(Seq("meta_src")), extractTs = 200L)
    val merged = Catalog.upsertMetadata(spark, v1.toDF(), v2)
    assert(merged.count() == 1)
    assert(merged.select("extract_ts").as[Long].head() == 200L)
    spark.sql("DROP DATABASE meta_src CASCADE")
  }

  test("K8 durable metadata store persists, reopens, and full-refreshes") {
    val url = "jdbc:derby:" +
      Files.createTempDirectory("graft-meta").resolve("meta.db") + ";create=true"
    spark.sql("CREATE DATABASE IF NOT EXISTS meta_d")
    spark.range(3).toDF("id").write.mode("overwrite").saveAsTable("meta_d.t1")
    spark.range(3).toDF("id").write.mode("overwrite").saveAsTable("meta_d.gone")

    Catalog.MetadataStore.save(
      Catalog.exportMetadata(spark, Some(Seq("meta_d")), extractTs = 100L), url)
    val first = Catalog.MetadataStore.load(spark, url)
    assert(first.count() == 2)
    assert(first.columns.toSeq ==
      Seq("db_name", "tbl_name", "createstmt", "extract_ts"))

    // second run: one table dropped, one schema changed — the full refresh
    // upserts the create statement and drops the vanished table
    spark.sql("DROP TABLE meta_d.gone")
    spark.sql("DROP TABLE meta_d.t1")
    spark.range(3).selectExpr("id", "id * 2 AS extra")
      .write.saveAsTable("meta_d.t1")
    Catalog.MetadataStore.save(
      Catalog.exportMetadata(spark, Some(Seq("meta_d")), extractTs = 200L), url)

    val second = Catalog.MetadataStore.load(spark, url)
    assert(second.count() == 1)
    val r = second.head()
    assert(r.getAs[String]("tbl_name") == "t1")
    assert(r.getAs[Long]("extract_ts") == 200L)
    assert(r.getAs[String]("createstmt").contains("extra"))
    spark.sql("DROP DATABASE meta_d CASCADE")
  }
}
