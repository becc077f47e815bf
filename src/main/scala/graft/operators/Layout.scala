package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: write a table clustered by a Z-order
  * (Morton) key so parquet footer min/max statistics prune predicates on
  * EITHER clustered dimension — the layout optimization behind
  * "OPTIMIZE ... ZORDER BY" in lakehouse engines, built here from public
  * Spark primitives: compute the interleaved key, range-partition by it
  * (contiguous key ranges per output file), sort within partitions, drop
  * the key on write.
  *
  * Why it matters at 100 TB: a table sorted by one column prunes scans on
  * that column only; a Z-ordered table gives every clustered dimension
  * locality proportional to its bit share, so a `user BETWEEN ... AND ts
  * BETWEEN ...` box query skips the vast majority of files on BOTH axes.
  * Range partitioning samples the key distribution, so skewed dimensions
  * still yield balanced files.
  */
object Layout {
  /** Morton interleave of the low 16 bits of two long columns: 64
    * shift-mask terms, all codegen'd integer ops (the same formula
    * `layout_zorder` checks against the oracle). */
  def zorderKey(x: Column, y: Column): Column = {
    val xm = x.bitwiseAND(lit(65535L))
    val ym = y.bitwiseAND(lit(65535L))
    (0 until 16).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Cluster `df` by the Z-order of (`xCol`, `yCol`) into `numFiles`
    * parquet files at `path`. The key exists only during the write. */
  def zorderWrite(
      df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int): Unit = {
    df.withColumn("__z", zorderKey(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
