package graft.operators

import java.net.URI

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the table-maintenance operator a 100 TB lake
  * cannot live without: incremental ingestion (one file set per batch,
  * [[Ingest.incrementalAppend]]) and streaming sinks accrete thousands of
  * small files per table, and scan cost degrades with file COUNT (driver
  * listing, task scheduling, row-group overhead), not just bytes.
  *
  * `compact` rewrites a managed table into `ceil(totalBytes/targetBytes)`
  * round-robin partitions — uniform output sizes by construction — through
  * the same scratch-materialization dance the ingestion strategies use
  * (never overwrite a table that may feed a concurrent read of itself),
  * and verifies the row count survived before reporting.
  *
  * Deliberately NOT in the harness query set: compaction is a side-effecting
  * maintenance action (CompactSpec covers it), not a query.
  */
object Compact {

  final case class CompactReport(
      filesBefore: Int, bytesBefore: Long, filesAfter: Int, rows: Long)

  /** File count + total bytes behind a table, from the filesystem. */
  def fileStats(spark: SparkSession, table: String): (Int, Long) = {
    val files = spark.table(table).inputFiles
    val conf = spark.sessionState.newHadoopConf()
    val sizes = files.map { f =>
      val p = new Path(new URI(f))
      p.getFileSystem(conf).getFileStatus(p).getLen
    }
    (files.length, sizes.sum)
  }

  /** Output file count for a compaction: enough files to keep each near
    * `targetBytes`, never zero. Parquet re-encoding usually shrinks the
    * bytes further; the pre-compaction size is the conservative bound. */
  def planFileCount(totalBytes: Long, targetBytes: Long): Int =
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt

  /** Compact `db`.`table` in place to ~`targetBytes` files. */
  def compact(
      spark: SparkSession, db: String, table: String,
      targetBytes: Long = 128L * 1024 * 1024,
      format: String = "parquet",
      scratchDb: String = "spark_scratch"): CompactReport = {
    val full = s"`$db`.`$table`"
    val (files0, bytes0) = fileStats(spark, full)
    val rows0 = spark.table(full).count()
    val nFiles = planFileCount(bytes0, targetBytes)

    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$scratchDb`")
    val scratch = s"`$scratchDb`.`graft_${table}_compact`"
    // Unpartitioned: round-robin repartition gives uniform file sizes
    // regardless of input skew. Partitioned: repartition BY the partition
    // columns, or every output task would hold rows of every partition
    // and write files into each partition dir — multiplying file count
    // instead of reducing it.
    val partCols = spark.catalog.listColumns(s"$db.$table")
      .collect().filter(_.isPartition).map(_.name).toSeq
    val src = spark.table(full)
    val arranged =
      if (partCols.isEmpty) src.repartition(nFiles)
      else src.repartition(nFiles, partCols.map(org.apache.spark.sql.functions.col): _*)
    val writer =
      if (partCols.isEmpty) arranged.write
      else arranged.write.partitionBy(partCols: _*)
    writer.format(format).mode("overwrite").saveAsTable(scratch)
    val staged = spark.table(scratch)
    staged.write.mode("overwrite").insertInto(full)
    spark.sql(s"DROP TABLE IF EXISTS $scratch")
    spark.catalog.refreshTable(full)

    val rows1 = spark.table(full).count()
    if (rows1 != rows0)
      throw new IllegalStateException(
        s"compaction changed row count for $full: $rows0 -> $rows1")
    CompactReport(files0, bytes0, spark.table(full).inputFiles.length, rows1)
  }

  /** Tag-retention maintenance: drop every ingest-tag partition strictly
    * below `keepFrom` (tags are zero-padded timestamps, so string order is
    * time order). Bounds the otherwise-unbounded growth of tag-partitioned
    * sinks — append destinations, the `_incremental` merge history, the
    * streaming sinks' index tables. Returns the dropped tags.
    *
    * Partition drops are metadata + file deletes on exactly the expired
    * partitions — no scan, no rewrite of surviving data. For a MERGE
    * history, only expire tags at or below a reconciled snapshot you have
    * already materialized: a key whose latest version lives in an expired
    * tag would otherwise silently revert to an older version on the next
    * full reconcile. */
  def expireTags(
      spark: SparkSession, db: String, table: String,
      keepFrom: String, tagColumn: String = "dl_ingest_date"): Seq[String] = {
    val full = s"`$db`.`$table`"
    val prefix = s"$tagColumn="
    val expired = spark.sql(s"SHOW PARTITIONS $full")
      .collect().map(_.getString(0))
      // tag must be the FIRST partition level; dropping by it removes all
      // sub-partitions of that tag in one statement
      .map(_.split("/", 2)(0))
      .distinct.toSeq
      .flatMap { p =>
        require(p.startsWith(prefix),
          s"$full is not tag-first partitioned (found level '$p')")
        Some(p.stripPrefix(prefix)).filter(_ < keepFrom)
      }
    expired.foreach { t =>
      spark.sql(s"ALTER TABLE $full DROP IF EXISTS PARTITION ($tagColumn='$t')")
    }
    spark.catalog.refreshTable(full)
    expired.sorted
  }

  /** Point-in-time rollback: drop every tag partition STRICTLY AFTER
    * `keepThrough` — the undo for a bad ingest batch (or a run of them)
    * in the tag-partitioned model, where each batch owns its partition
    * and rolling back is metadata + file deletes, no rewrite of surviving
    * data. Returns the dropped tags. Works on the data table and its
    * standing index tables alike (fps / sigs / phash share the tag
    * layout), so a sink's whole state rolls back consistently by calling
    * this once per table with the same `keepThrough`. */
  def rollbackToTag(
      spark: SparkSession, db: String, table: String,
      keepThrough: String, tagColumn: String = "dl_ingest_date"): Seq[String] = {
    val full = s"`$db`.`$table`"
    val prefix = s"$tagColumn="
    val dropped = spark.sql(s"SHOW PARTITIONS $full")
      .collect().map(_.getString(0))
      .map(_.split("/", 2)(0))
      .distinct.toSeq
      .flatMap { p =>
        require(p.startsWith(prefix),
          s"$full is not tag-first partitioned (found level '$p')")
        Some(p.stripPrefix(prefix)).filter(_ > keepThrough)
      }
    dropped.foreach { t =>
      spark.sql(s"ALTER TABLE $full DROP IF EXISTS PARTITION ($tagColumn='$t')")
    }
    spark.catalog.refreshTable(full)
    dropped.sorted
  }
}
