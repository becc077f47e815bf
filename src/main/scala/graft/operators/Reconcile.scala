package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record-per-key reconciliation — the reference's core operator.
  *
  * Semantics from /root/reference/spark_loaders.py:228-239: over an
  * append-only history table, keep the newest version of each key
  * (`row_number() OVER (PARTITION BY keys ORDER BY last_modified DESC) = 1`),
  * then optionally drop keys whose newest version carries a soft-delete
  * marker (filter applied AFTER the dedup — a deleted-latest key vanishes).
  *
  * Differences from the reference (deliberate):
  *  - Deterministic tie-break: the reference's ordering is ambiguous when two
  *    versions share `last_modified` (SURVEY.md §2 W1). Callers pass a total
  *    order (`orderBy`); helpers below append unique columns.
  *
  * Scale: one hash-partition shuffle on the key columns + per-partition sort.
  * This is the minimal plan for this semantic; Spark's window exec spills.
  * At 100 TB the win is bucketing the history table by the key columns so
  * repeated reconciles reuse the layout and skip the exchange entirely
  * (see Ingest.incrementalMerge).
  */
object Reconcile {

  /** Keep the newest row per key under a caller-supplied total order. */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val rn = "__graft_rn" // fixed name; input columns are user data so pick an unlikely prefix
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) === lit(1))
      .drop(rn)
  }

  /** Reference-shaped reconcile: newest by `lastModified` desc (tie-broken by
    * `tieBreak` desc), then soft-delete filter if a marker column is given. */
  def reconcile(
      history: DataFrame,
      keys: Seq[String],
      lastModified: String,
      tieBreak: Seq[String] = Nil,
      softDeleteCol: Option[String] = None): DataFrame = {
    val order = col(lastModified).desc +: tieBreak.map(col(_).desc)
    val latest = latestPerKey(history, keys, order)
    softDeleteCol.fold(latest)(d => latest.where(col(d).isNull))
  }
}
