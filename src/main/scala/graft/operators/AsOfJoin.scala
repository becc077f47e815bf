package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — another operator Spark SQL lacks natively: each left row
  * matches the right row with the greatest time <= its own, per key
  * (market-data / event-attribution semantics; DuckDB ships it as
  * `ASOF JOIN`, which is exactly what the oracle uses).
  *
  * Spark-first shape: instead of an inequality join (which Spark would
  * plan as a nested loop), tag and UNION both sides, sort within each
  * key partition by (time, side) with right rows first on ties, and
  * carry the right payload forward with `last(..., ignoreNulls)` over
  * rows-unbounded-preceding — ONE hash shuffle by key plus a
  * per-partition sort, the same cost class as the reconcile window.
  * Rows with no preceding right row keep NULLs (left-outer semantics).
  *
  * Right rows are first deduped to one per (key, time) — keeping the
  * max of the payload ordering column — so tie resolution is
  * deterministic and engine-independent.
  */
object AsOfJoin {

  /** Left-outer as-of join: every `left` row + the payload columns of the
    * newest `right` row with `right.time <= left.time` on the same key.
    * `payload` columns are emitted with an `asof_` prefix. */
  def asOf(
      left: DataFrame, right: DataFrame,
      key: String, time: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // deterministic ties: one right row per (key, time), max payload tuple
    val r1 = right
      .groupBy(col(key), col(time))
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(col(key) +: col(time) +:
        payload.map(p => col(s"__p.$p").as(s"asof_$p")): _*)

    val l = left
      .withColumn("__side", lit(1))
      .select(leftCols.map(col) ++ Seq(col("__side")) ++
        payload.map(p => lit(null).cast(r1.schema(s"asof_$p").dataType).as(s"asof_$p")): _*)
    val r = r1.withColumn("__side", lit(0))
      .select(leftCols.map(c =>
        if (c == key || c == time) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__side")) ++ payload.map(p => col(s"asof_$p")): _*)

    // right rows sort BEFORE left rows at equal time: <= semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (leftCols.map(col) :+ col("__side")) ++
          payload.map(p => last(col(s"asof_$p"), ignoreNulls = true).over(w).as(s"asof_$p")): _*)
    carried.where(col("__side") === 1).drop("__side")
  }

  /** [[asOf]] with a match-freshness bound — the production form (a
    * 3-day-old quote is not "the" quote): the backward match is kept only
    * when `left.time − right.time <= tolerance`, otherwise the row keeps
    * NULL payloads, exactly as if no right row preceded it. Emits the
    * `asof_<p>` payloads plus `gap_<time>` (the match's age; NULL when no
    * match or stale). Same ONE-shuffle union-and-carry as [[asOf]] with
    * the matched right TIME carried alongside the payloads so the
    * freshness test is a scan-side projection, never a second join. */
  def asOfTolerance(
      left: DataFrame, right: DataFrame,
      key: String, time: String, payload: Seq[String],
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    val leftCols = left.columns.toSeq
    val r1 = right
      .groupBy(col(key), col(time))
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(col(key) +: col(time) +: col(time).as("__rt") +:
        payload.map(p => col(s"__p.$p").as(s"asof_$p")): _*)

    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast(left.schema(time).dataType))
      .select(leftCols.map(col) ++ Seq(col("__side"), col("__rt")) ++
        payload.map(p =>
          lit(null).cast(r1.schema(s"asof_$p").dataType).as(s"asof_$p")): _*)
    val r = r1.withColumn("__side", lit(0))
      .select(leftCols.map(c =>
        if (c == key || c == time) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__side"), col("__rt")) ++
        payload.map(p => col(s"asof_$p")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (leftCols.map(col) :+ col("__side") :+
          last(col("__rt"), ignoreNulls = true).over(w).as("__bt")) ++
          payload.map(p =>
            last(col(s"asof_$p"), ignoreNulls = true).over(w).as(s"asof_$p")): _*)
      .where(col("__side") === 1)
    val fresh = col("__bt").isNotNull &&
      (col(time) - col("__bt")) <= lit(tolerance)
    carried.select(
      (leftCols.map(col) :+
        when(fresh, col(time) - col("__bt")).as(s"gap_$time")) ++
        payload.map(p => when(fresh, col(s"asof_$p")).as(s"asof_$p")): _*)
  }

  /** NEAREST-event join: every `left` row + the payload of the right row
    * whose time is CLOSEST in either direction on the same key (sensor
    * alignment / nearest-quote semantics; ties at equal distance go to
    * the BACKWARD match, the causal side). Emits `nearest_<p>` payloads
    * plus `direction` ('backward'/'forward', NULL when the key has no
    * right rows) and `gap_<time>` (the absolute distance).
    *
    * Shape: the same tag-union as [[asOf]], then BOTH carries inside ONE
    * key-partition — backward = last-non-null over (time asc, right rows
    * first on ties), forward = last-non-null over (time desc, right rows
    * first) — i.e. one hash Exchange and two per-partition sorts; no
    * second shuffle and no join of two as-of results. */
  def nearest(
      left: DataFrame, right: DataFrame,
      key: String, time: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val r1 = right
      .groupBy(col(key), col(time))
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(col(key) +: col(time) +: col(time).as("__rt") +:
        payload.map(p => col(s"__p.$p").as(s"asof_$p")): _*)

    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast(left.schema(time).dataType))
      .select(leftCols.map(col) ++ Seq(col("__side"), col("__rt")) ++
        payload.map(p => lit(null).cast(r1.schema(s"asof_$p").dataType).as(s"asof_$p")): _*)
    val r = r1.withColumn("__side", lit(0))
      .select(leftCols.map(c =>
        if (c == key || c == time) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__side"), col("__rt")) ++ payload.map(p => col(s"asof_$p")): _*)

    val wb = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key))
      .orderBy(col(time).desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (leftCols.map(col) :+ col("__side") :+
          last(col("__rt"), ignoreNulls = true).over(wb).as("__bt") :+
          last(col("__rt"), ignoreNulls = true).over(wf).as("__ft")) ++
          payload.flatMap(p => Seq(
            last(col(s"asof_$p"), ignoreNulls = true).over(wb).as(s"__b_$p"),
            last(col(s"asof_$p"), ignoreNulls = true).over(wf).as(s"__f_$p"))): _*)
      .where(col("__side") === 1)
    val pickB = col("__bt").isNotNull &&
      (col("__ft").isNull || (col(time) - col("__bt")) <= (col("__ft") - col(time)))
    carried.select(
      (leftCols.map(col) :+
        when(col("__bt").isNull && col("__ft").isNull, lit(null).cast("string"))
          .when(pickB, lit("backward")).otherwise(lit("forward")).as("direction") :+
        when(pickB, col(time) - col("__bt"))
          .otherwise(col("__ft") - col(time)).as(s"gap_$time")) ++
        payload.map(p =>
          when(pickB, col(s"__b_$p")).otherwise(col(s"__f_$p")).as(s"nearest_$p")): _*)
  }

  /** FORWARD as-of join: every `left` row + the payload of the EARLIEST
    * `right` row with `right.time >= left.time` on the same key — the
    * next-event attribution direction (time-to-next-touch, next-quote
    * semantics; DuckDB's `ASOF JOIN ... ON l.t <= r.t`). Same
    * union-and-carry shape as [[asOf]] with the partition sort reversed:
    * ONE hash shuffle by key plus a per-partition sort, right rows first
    * on time ties so an equal-time right row matches (>= is inclusive).
    * Ties among right rows at one (key, time) dedup to the max payload
    * tuple, as in [[asOf]]. */
  def asOfForward(
      left: DataFrame, right: DataFrame,
      key: String, time: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val r1 = right
      .groupBy(col(key), col(time))
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(col(key) +: col(time) +:
        payload.map(p => col(s"__p.$p").as(s"asof_$p")): _*)

    val l = left
      .withColumn("__side", lit(1))
      .select(leftCols.map(col) ++ Seq(col("__side")) ++
        payload.map(p => lit(null).cast(r1.schema(s"asof_$p").dataType).as(s"asof_$p")): _*)
    val r = r1.withColumn("__side", lit(0))
      .select(leftCols.map(c =>
        if (c == key || c == time) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__side")) ++ payload.map(p => col(s"asof_$p")): _*)

    // DESCENDING time: carrying "last non-null" backward in time = the
    // nearest FUTURE right row; right rows still sort before left rows
    // at equal time, so >= stays inclusive.
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (leftCols.map(col) :+ col("__side")) ++
          payload.map(p => last(col(s"asof_$p"), ignoreNulls = true).over(w).as(s"asof_$p")): _*)
    carried.where(col("__side") === 1).drop("__side")
  }
}
