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

  /** MERGE-shaped CDC data card: classify a delta batch against the standing
    * state and report what a MERGE INTO would have done — the per-batch
    * audit row an ingestion pipeline logs next to each merge
    * (inserts/updates/soft-deletes, plus no-op deletes for keys that never
    * existed). Each delta key is judged by its LATEST row in the batch
    * (same total order as [[reconcile]]); `n_keys` <= `n_rows` whenever the
    * batch carries superseded intra-batch versions.
    *
    * Scale: one window shuffle over the DELTA (batch-sized), one distinct
    * over the history's key columns — which plans exchange-free when the
    * history is key-bucketed (Ingest.DefaultHistoryBuckets, the default
    * incremental-merge layout) — and one key join AQE sizes at runtime
    * (batch side broadcasts when small). The history's payload columns are
    * never read: only its keys. Output is a single row of BIGINT counts.
    */
  def cdcCounts(
      history: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      lastModified: String,
      tieBreak: Seq[String] = Nil,
      softDeleteCol: Option[String] = None): DataFrame = {
    val order = col(lastModified).desc +: tieBreak.map(col(_).desc)
    val nRows = delta.count()
    val latest = latestPerKey(delta, keys, order)
    val inHist = "__graft_in_hist"
    val histKeys = history.select(keys.map(col): _*).distinct()
      .withColumn(inHist, lit(1))
    val del = softDeleteCol.fold(lit(null).cast("int"))(col(_).cast("int"))
    def n(cond: Column): Column =
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))
    latest.join(histKeys, keys, "left")
      .agg(
        count(lit(1)).as("n_keys"),
        n(del.isNull && col(inHist).isNull).as("n_insert"),
        n(del.isNull && col(inHist).isNotNull).as("n_update"),
        n(del.isNotNull && col(inHist).isNotNull).as("n_soft_delete"),
        n(del.isNotNull && col(inHist).isNull).as("n_delete_noop"))
      .select(lit(nRows).as("n_rows"), col("n_keys"), col("n_insert"),
        col("n_update"), col("n_soft_delete"), col("n_delete_noop"))
  }
}
