package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — the second classic operator Spark
  * SQL lacks a scalable plan for: `point.time BETWEEN interval.start AND
  * interval.end` on a shared key. A naive inequality join plans a nested
  * loop; the scalable shape bucketizes time, equi-joins on
  * (key, bucket) — each interval exploded to the buckets it covers, each
  * point to the one bucket it falls in — and applies the exact
  * containment predicate after the hash join. Cost is
  * O(points + Σ interval_spans/bucketWidth + matches); bucket width
  * trades explode factor against join selectivity and should be near the
  * typical interval length.
  */
object RangeJoin {

  /** Inner containment join: rows of `points` paired with every row of
    * `intervals` of the same `key` whose [start, end] contains `time`.
    * All time columns are integral (e.g. epoch-micros). Output carries
    * all point columns plus the interval's columns. */
  def intervalJoin(
      points: DataFrame, intervals: DataFrame,
      key: String, time: String, start: String, end: String,
      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__bucket", expr(s"$time DIV $bucketWidth"))
    val iv = intervals.withColumn("__bucket",
      explode(expr(s"sequence($start DIV $bucketWidth, $end DIV $bucketWidth)")))
    p.join(iv, Seq(key, "__bucket"))
      .where(col(time) >= col(start) && col(time) <= col(end))
      .drop("__bucket")
  }
}
