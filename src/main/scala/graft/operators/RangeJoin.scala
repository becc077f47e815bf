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

  /** Interval-OVERLAP join — the interval×interval sibling of the
    * containment join: rows of `a` paired with every same-`key` row of
    * `b` whose [bStart, bEnd] intersects [aStart, aEnd]. Same bucket-grid
    * shape (both sides explode to covered buckets, equi-join on
    * (key, bucket), exact predicate after the hash join), plus the
    * report-once rule from the spatial-join literature: a pair meeting in
    * several buckets is emitted ONLY in the bucket containing the
    * overlap's start (`greatest(aStart, bStart) DIV width`), so no
    * DISTINCT — duplicate elimination costs a scan-side comparison
    * instead of a shuffle. */
  def overlapJoin(
      a: DataFrame, b: DataFrame, key: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketWidth: Long): DataFrame = {
    val av = a.withColumn("__bucket",
      explode(expr(s"sequence($aStart DIV $bucketWidth, $aEnd DIV $bucketWidth)")))
    val bv = b.withColumn("__bucket",
      explode(expr(s"sequence($bStart DIV $bucketWidth, $bEnd DIV $bucketWidth)")))
    av.join(bv, Seq(key, "__bucket"))
      .where(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__bucket") === expr(s"greatest($aStart, $bStart) DIV $bucketWidth"))
      .drop("__bucket")
  }

  /** As above, with the bucket width DERIVED from the intervals' own span
    * statistics instead of caller-guessed — a wrong constant is the scale
    * hazard here: too narrow and a long interval explodes into thousands
    * of buckets, too wide and every join bucket is unselective. */
  def intervalJoin(
      points: DataFrame, intervals: DataFrame,
      key: String, time: String, start: String, end: String): DataFrame =
    intervalJoin(points, intervals, key, time, start, end,
      derivedBucketWidth(intervals, start, end))

  /** Derived width = max(median span, mean span / 8) — one tiny agg job
    * over the intervals side (the smaller relation by construction).
    *
    * Two competing failure modes, each guarded by one term:
    *  - too-narrow (the real blow-up): interval i explodes to span_i/w + 1
    *    bucket rows. The mean/8 floor bounds TOTAL explode rows at
    *    8·n + n by construction — even when the median is tiny or zero
    *    (point intervals), where a median-only width degenerates to
    *    per-microsecond buckets and billions of rows.
    *  - too-wide (a selectivity loss, not a blow-up): the median term
    *    keeps buckets near the typical span, so a long-tail outlier can't
    *    drag the width up the way a mean-only rule would — it just pays
    *    its own bounded span/w buckets. */
  def derivedBucketWidth(intervals: DataFrame, start: String, end: String): Long = {
    val row = intervals
      .agg(expr(s"approx_percentile($end - $start, 0.5)"),
        expr(s"avg($end - $start)"))
      .head()
    if (row.isNullAt(0)) 1L
    else math.max(1L, math.max(row.getLong(0), math.ceil(row.getDouble(1) / 8.0).toLong))
  }
}
