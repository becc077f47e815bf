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
