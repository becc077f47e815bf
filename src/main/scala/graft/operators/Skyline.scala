package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto-dominance) operator — an operator Spark SQL lacks
  * (pattern from the public literature on skyline integration into Spark,
  * e.g. EDBT'23 "Integration of Skyline Queries into Spark SQL").
  *
  * A point dominates another when it is <= in the minimized dimension,
  * >= in the maximized one, and strictly better in at least one. The
  * skyline is the set of non-dominated distinct points.
  *
  * Scale shape (the standard distributed-skyline recipe): compute a LOCAL
  * skyline inside every partition with the O(n log n) sorted scan —
  * dominated points never leave their partition, and for realistic data
  * the surviving candidate set is orders of magnitude smaller than the
  * input — then run the same scan once over the gathered candidates on a
  * single partition. No all-pairs comparison at any stage, and the wide
  * stage ships only local-skyline survivors.
  */
object Skyline {

  /** Sorted-scan skyline of one iterator: rows must arrive sorted by
    * (minDim asc, maxDim desc); a row survives iff its maxDim strictly
    * exceeds every earlier row's. */
  private def scan(rows: Iterator[Row], minIdx: Int, maxIdx: Int): Iterator[Row] = {
    var best = Double.NegativeInfinity
    rows.flatMap { r =>
      val v = r.getDouble(maxIdx)
      if (v > best) { best = v; Some(r) } else None
    }
  }

  /** Skyline of `df` minimizing `minCol` and maximizing `maxCol`; returns
    * the distinct Pareto-front points as (minCol, maxCol). */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val pts = df.select(col(minCol).cast("double").as("mn"),
      col(maxCol).cast("double").as("mx")).distinct()
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(pts.schema)
    val localSky = pts
      .sortWithinPartitions(col("mn").asc, col("mx").desc)
      .mapPartitions(it => scan(it, 0, 1))
    val globalSky = localSky
      .repartition(1)
      .sortWithinPartitions(col("mn").asc, col("mx").desc)
      .mapPartitions(it => scan(it, 0, 1))
    globalSky.select(col("mn").as(minCol), col("mx").as(maxCol))
  }
}
