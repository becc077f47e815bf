package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Reconcile

/** Harness projections of the reference's three ingestion strategies
  * (SURVEY.md §2: P1-P7, W1, A3, K6 shapes) as pure queries over the test
  * parquet: same plan shapes the Ingest operators produce, minus the catalog
  * writes (those are exercised in ScalaTest suites against managed tables).
  */
object IngestQueries {
  import QueryDef._

  val defs: Map[String, QueryDef] = Map(

    // P1 + A1 — full ingest: constant string tag, driver-computed once
    // (spark_loaders.py:121). Projection pruned to 4 columns: the scan must
    // show a 4-column ReadSchema, not the full table.
    "ingest_full_tag" -> QueryDef(
      fn = (s, d) =>
        t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .withColumn("dl_ingest_date", lit("20240101T000000"))
          .orderBy("l_orderkey", "l_linenumber"),
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
               '20240101T000000' AS dl_ingest_date
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // P2 + A3 — append watermark: sink-derived scalar, strict `>` filter
    // (spark_loaders.py:153-158). Watermark here is max/2 so the delta is
    // non-trivial; the filter must reach the parquet scan (PushedFilters).
    "ingest_append_delta" -> QueryDef(
      fn = (s, d) => {
        val ev = t(s, d, "events")
        val lastValue = ev.agg(max(col("event_id"))).head().getLong(0) / 2
        ev.where(col("event_id") > lit(lastValue))
          .select("event_id", "user_id", "event_type", "value")
          .withColumn("dl_ingest_date", lit("20240102T000000"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT event_id, user_id, event_type, value,
               '20240102T000000' AS dl_ingest_date
        FROM events
        WHERE event_id > (SELECT max(event_id) // 2 FROM events)
        ORDER BY event_id""")),

    // W1 + P5-P7 — THE core operator: latest-record-per-key window dedup
    // (spark_loaders.py:228-237) with a deterministic tie-break.
    "merge_reconcile" -> QueryDef(
      fn = (s, d) =>
        Reconcile.latestPerKey(
          t(s, d, "orders"),
          keys = Seq("o_custkey"),
          orderBy = Seq(col("o_orderdate").desc, col("o_orderkey").desc))
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate").cast("date").as("o_odate"))
          .orderBy("o_custkey"),
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
               CAST(o_orderdate AS DATE) AS o_odate
        FROM (SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1 ORDER BY o_custkey"""),
      bench = true),

    // P4 — soft-delete AFTER dedup (spark_loaders.py:238-239): a key whose
    // *latest* version is marked deleted disappears entirely.
    "merge_soft_delete" -> QueryDef(
      fn = (s, d) => {
        val hist = t(s, d, "orders")
          .withColumn("deleted", when(col("o_orderstatus") === "F", lit(1)))
        Reconcile.reconcile(hist,
          keys = Seq("o_custkey"), lastModified = "o_orderdate",
          tieBreak = Seq("o_orderkey"), softDeleteCol = Some("deleted"))
          .select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_custkey")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice
        FROM (SELECT *, CASE WHEN o_orderstatus = 'F' THEN 1 END AS deleted,
                     row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1 AND deleted IS NULL ORDER BY o_custkey""")),

    // Extension of W1: slowly-changing-dimension type-2 merge — instead of
    // keeping only the latest version per key (the reference's reconcile),
    // keep EVERY version as a validity interval: valid_from = its own
    // last_modified, valid_to = the next version's (null while current).
    // One window per key — the same single-shuffle cost class as the
    // latest-per-key reconcile, and at 100 TB it runs over the same
    // key-bucketed history layout.
    "merge_scd2" -> QueryDef(
      fn = (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("o_orderdate"))
          .withColumn("version", row_number().over(w).cast("long"))
          .withColumn("valid_to",
            lead(col("o_orderdate"), 1).over(w).cast("date"))
          .withColumn("is_current",
            when(col("valid_to").isNull, 1L).otherwise(0L))
          .withColumn("valid_from", col("o_orderdate").cast("date"))
          .drop("o_orderdate")
          .orderBy("o_custkey", "version")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(o_orderdate AS DATE) AS valid_from,
               CAST(row_number() OVER w AS BIGINT) AS version,
               CAST(lead(o_orderdate) OVER w AS DATE) AS valid_to,
               CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL
                         THEN 1 ELSE 0 END AS BIGINT) AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, version""")),

    // K6 + W1 — the full merge shape: UNION ALL over time (two tagged
    // batches into the `_incremental` history), then reconcile. Late batch
    // wins ties via the tag (SURVEY.md §2 W1 tie-break note).
    "merge_two_batch" -> QueryDef(
      fn = (s, d) => {
        val ev = t(s, d, "events")
          .select("event_id", "user_id", "event_type", "value")
        val mid = ev.agg(max(col("event_id"))).head().getLong(0) / 2
        val b1 = ev.where(col("event_id") <= lit(mid))
          .withColumn("dl_ingest_date", lit("20240101T000000"))
        val b2 = ev.where(col("event_id") > lit(mid))
          .withColumn("dl_ingest_date", lit("20240102T000000"))
        Reconcile.latestPerKey(
          b1.unionByName(b2),
          keys = Seq("user_id"),
          orderBy = Seq(col("event_id").desc, col("dl_ingest_date").desc))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH hist AS (
          SELECT event_id, user_id, event_type, value,
                 '20240101T000000' AS dl_ingest_date
          FROM events
          WHERE event_id <= (SELECT max(event_id) // 2 FROM events)
          UNION ALL
          SELECT event_id, user_id, event_type, value,
                 '20240102T000000' AS dl_ingest_date
          FROM events
          WHERE event_id > (SELECT max(event_id) // 2 FROM events))
        SELECT event_id, user_id, event_type, value, dl_ingest_date
        FROM (SELECT *, row_number() OVER (
                PARTITION BY user_id
                ORDER BY event_id DESC, dl_ingest_date DESC) AS rn
              FROM hist)
        WHERE rn = 1 ORDER BY user_id"""),
      bench = true),

    // CDC data card over the same two-batch split: what a MERGE INTO of
    // the late batch against the early batch's state would have done —
    // per-batch insert/update/soft-delete counts (deletes modeled as the
    // latest delta version being a 'purchase'), plus no-op deletes for
    // never-seen keys and the intra-batch supersede gap (n_rows vs
    // n_keys). The audit row ingestion pipelines log next to each merge;
    // history contributes only its KEY column (never payload), and the
    // delta window is batch-sized.
    "merge_cdc_card" -> QueryDef(
      fn = (s, d) => {
        val ev = t(s, d, "events")
          .select("event_id", "user_id", "event_type", "value")
        val mid = ev.agg(max(col("event_id"))).head().getLong(0) / 2
        val hist = ev.where(col("event_id") <= lit(mid))
        val delta = ev.where(col("event_id") > lit(mid))
          .withColumn("deleted",
            when(col("event_type") === "purchase", lit(1)))
        Reconcile.cdcCounts(hist, delta,
          keys = Seq("user_id"), lastModified = "event_id",
          softDeleteCol = Some("deleted"))
      },
      oracle = Some("""
        WITH mid AS (SELECT max(event_id) // 2 AS m FROM events),
        delta AS (
          SELECT user_id, event_id,
                 CASE WHEN event_type = 'purchase' THEN 1 END AS deleted
          FROM events WHERE event_id > (SELECT m FROM mid)),
        latest AS (
          SELECT user_id, deleted FROM (
            SELECT *, row_number() OVER (
              PARTITION BY user_id ORDER BY event_id DESC) AS rn
            FROM delta)
          WHERE rn = 1),
        hk AS (
          SELECT DISTINCT user_id FROM events
          WHERE event_id <= (SELECT m FROM mid))
        SELECT CAST((SELECT count(*) FROM delta) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN l.deleted IS NULL AND hk.user_id IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
               CAST(sum(CASE WHEN l.deleted IS NULL AND hk.user_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
               CAST(sum(CASE WHEN l.deleted IS NOT NULL AND hk.user_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_soft_delete,
               CAST(sum(CASE WHEN l.deleted IS NOT NULL AND hk.user_id IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_delete_noop
        FROM latest l LEFT JOIN hk USING (user_id)"""))
  )
}
