package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming analog of the reference's polling incremental
  * ingestion (SURVEY.md §2 Streaming / §7 item 6).
  *
  * The reference's "incremental" is repeated batch with a sink-derived
  * watermark and strict-`>` filter that silently drops late rows
  * (/root/reference/spark_loaders.py:153-158). The streaming re-derivation
  * makes both halves first-class:
  *  - the watermark is engine-managed (`withWatermark`) instead of a
  *    max() probe against the sink;
  *  - lateness is an explicit, bounded policy instead of silent loss.
  *
  * Works on the events schema with `ts` as epoch-nano BIGINT (see
  * GraftSession): event time is exposed as a real timestamp via
  * `timestamp_micros(ts DIV 1000)`.
  */
object StreamingIngest {

  /** File-source stream of tagged events — the streaming form of
    * incremental append: every new file under `dir` is a delta batch; the
    * ingest tag is the batch's processing marker. */
  def appendStream(
      spark: SparkSession, dir: String, schema: StructType, tag: String,
      tagColumn: String = "dl_ingest_date"): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withColumn(tagColumn, lit(tag))

  /** Event-time tumbling-window counts with bounded lateness. */
  def windowedCounts(
      events: DataFrame, windowLen: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming exact dedup on the key columns alone with bounded state:
    * the streaming form of the reference's reconcile — duplicates of a key
    * are dropped even when they carry different event times, and state for
    * a key ages out once the watermark passes it instead of accumulating
    * forever. `dropDuplicatesWithinWatermark` is the precise API for this:
    * plain `dropDuplicates(keys)` would keep key state unbounded, and
    * `dropDuplicates(keys :+ eventTime)` would let same-key/different-time
    * duplicates through. */
  def dedupStream(
      events: DataFrame, keyCols: Seq[String],
      lateness: String = "30 minutes"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Gap-based session aggregation via the engine's native
    * `session_window` — the streaming form of the batch lag+cumsum
    * sessionization (`events_sessionize`): sessions merge as events
    * arrive, state is bounded by the watermark, and the session
    * definition (events closer than `gap` belong together) is identical
    * to the batch formulation. */
  def sessionCounts(
      events: DataFrame, gap: String = "30 minutes",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", lateness)
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Streaming latest-per-key reconcile — the merge strategy's window
    * dedup ([[graft.operators.Reconcile]]) as continuously-maintained
    * state via `flatMapGroupsWithState`: state holds each key's current
    * newest row (by a numeric version column, e.g. epoch nanos); every
    * micro-batch emits the keys whose newest row changed. Update output
    * mode; state is one row per live key (the reconciled table itself),
    * which is the minimum any engine must hold for this semantic.
    *
    * Version ties go to the LATER arrival (`>=` wins): a later micro-batch
    * overwrites state on an equal version, matching the batch reconcile's
    * tie-break where the later ingest tag wins (`tag DESC`,
    * [[graft.operators.Reconcile]] ordering in the merge strategy). */
  def mergeStream(
      events: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    val spark = events.sparkSession
    implicit val rowEnc: Encoder[Row] = Encoders.row(events.schema)
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val keyIdx = keyCols.map(events.schema.fieldIndex)
    val verIdx = events.schema.fieldIndex(versionCol)
    def version(r: Row): Long = if (r.isNullAt(verIdx)) Long.MinValue else r.getLong(verIdx)
    // Collision-free composite key: each part is length-prefixed ("N" for
    // SQL NULL, which stays distinct from the 4-char string "null"); the
    // length prefix makes part boundaries unambiguous even for values that
    // contain the separator, so ("ab","c") / ("a","bc") / null-vs-"null"
    // all land in distinct state slots.
    def encodedKey(r: Row): String =
      keyIdx.map { i =>
        if (r.isNullAt(i)) "N"
        else { val v = String.valueOf(r.get(i)); s"${v.length}:$v" }
      }.mkString("|")
    events
      .groupByKey(encodedKey _)
      .flatMapGroupsWithState[Row, Row](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Row], state: GroupState[Row]) =>
          // within one micro-batch the later arrival also wins ties
          val incoming = rows.reduceOption((a, b) => if (version(b) >= version(a)) b else a)
          (incoming, state.getOption) match {
            case (Some(in), Some(cur)) if version(in) >= version(cur) =>
              state.update(in); Iterator.single(in)
            case (Some(in), None) =>
              state.update(in); Iterator.single(in)
            case _ => Iterator.empty
          }
      }
  }

  /** Write a stream into a managed table through the batch ingestion
    * path: each micro-batch runs [[graft.operators.Ingest.incrementalAppend]]
    * via `foreachBatch`, so the destination accumulates exactly like the
    * reference's polling loader — same tag column, same partitioning, same
    * watermark-filter semantics — but with the engine driving the batches.
    * The batch id becomes part of the ingest tag (reproducible, no
    * driver-side now()); the stream's own exactly-once bookkeeping comes
    * from checkpointing + the append watermark. */
  def toIngestSink(
      df: DataFrame, db: String, table: String, incrementalColumn: String,
      tagPrefix: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Ingest.incrementalAppend(
            batch.sparkSession, batch, db, table, incrementalColumn,
            tag = f"$tagPrefix%s_b$batchId%05d")
          ()
        }
    }

  /** Memory-sink writer used by tests to drive a stream synchronously. */
  def toMemorySink(df: DataFrame, name: String, outputMode: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode)
}
