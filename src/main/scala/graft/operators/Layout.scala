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

  /** N-dimensional Morton interleave: each of the `cols` contributes its
    * low `63 / cols.length` bits, round-robin across bit positions, so
    * every clustered dimension gets locality proportional to its bit
    * share (3 cols → 21 bits each). Same pure shift-mask codegen as the
    * 2-D form; the key stays a positive BIGINT. */
  def zorderKeyN(cols: Seq[Column]): Column = {
    require(cols.size >= 2, s"z-order needs >=2 columns, got ${cols.size}")
    val n = cols.size
    val bits = 63 / n
    val masked = cols.map(_.bitwiseAND(lit((1L << bits) - 1)))
    (for (i <- 0 until bits; (c, d) <- masked.zipWithIndex) yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + d)
    ).reduce(_ + _)
  }

  /** Cluster by the N-dim Z-order into `numFiles` files at `path`. */
  def zorderWriteN(
      df: DataFrame, zCols: Seq[String], path: String, numFiles: Int): Unit = {
    df.withColumn("__z", zorderKeyN(zCols.map(col)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
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

  /** Cluster `df` by the HILBERT order of (`xCol`, `yCol`) into
    * `numFiles` parquet files — [[zorderWrite]] with the locality-
    * superior curve (consecutive Hilbert cells are grid-adjacent; the
    * Z-curve jumps across half the grid at quadrant seams, widening
    * per-file min/max boxes). Key via the native
    * [[graft.functions.HilbertXY]] kernel, 16 bits per dimension. */
  def hilbertWrite(
      df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int): Unit = {
    // via the function registry (GraftSession.tune registers it) — the
    // VectorOps.dot / winnow convention for native-kernel Columns
    df.withColumn("__h",
        expr(s"hilbert_xy(CAST($xCol AS BIGINT), CAST($yCol AS BIGINT), 16)"))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** Deterministic training-order shuffle key: shard and within-shard
    * position from an md5 coin over the row key — the reproducible global
    * permutation SGD training wants (sequential reads see an unbiased
    * sample; no RNG state, stable under task retry).
    *
    * Scale shape: the shard is a pure hash (scan-side, uniform by md5),
    * and positions are per-shard `row_number`s — one shuffle partitioned
    * by shard, each window sized corpus/shards, NEVER a global
    * single-partition sort. A trainer reading shard files in position
    * order replays the identical permutation on any cluster size. */
  def shuffleOrder(df: DataFrame, keyCol: String, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(keyCol).cast("string"))
    val shard = pmod(
      conv(substring(h, 1, 8), 16, 10).cast("long"), lit(shards.toLong))
    val w = Window.partitionBy(col("__shard")).orderBy(h, col(keyCol))
    df.withColumn("__shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumnRenamed("__shard", "shard")
  }

  /** Materialize the shuffled order: one sorted parquet file per shard.
    * Trainers stream shard files in parallel; concatenating them in
    * (shard, pos) order replays the exact permutation. */
  def shuffledWrite(df: DataFrame, keyCol: String, path: String, shards: Int): Unit =
    shuffleOrder(df, keyCol, shards)
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Write `df` into the session catalog bucketed AND sorted by `key`:
    * the layout that makes every later equi-join or aggregation on `key`
    * Exchange-free — each bucket pairs 1:1 with the other side's
    * equal-count buckets, so a SortMergeJoin reads both scans in place
    * with no shuffle and no sort. The 100 TB contract: pay the
    * distribution cost ONCE at write time, never again per query — the
    * same trade the reference's partitioned Hive tables make for
    * partition pruning, applied to join/agg distribution instead.
    * BucketJoinSpec pins the Exchange-free plan shape. */
  def bucketedWrite(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two catalog tables on `key`. Planned with zero Exchange
    * and zero Sort when both sides were written by [[bucketedWrite]]
    * with the SAME bucket count — Spark matches the bucket spec to the
    * join's required distribution. */
  def bucketedJoin(
      spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
