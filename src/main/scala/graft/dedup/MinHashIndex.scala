package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Build-once/query-many lifecycle for the MinHash near-dup state — the
  * dedup twin of [[graft.sim.IndexStore]]: the harness queries re-derive
  * signatures inline every run so the DuckDB oracle can replay them, but a
  * production ingest pipeline signs the corpus ONCE and then dedups every
  * incoming batch against standing tables:
  *
  *  - `<name>_minhash_sigs`: one row per doc (doc_id + k signature longs),
  *    BUCKETED BY doc_id — the verification joins key on doc ids, so the
  *    stored side needs no exchange there.
  *  - `<name>_minhash_bands`: the banded LSH keys (doc_id, band, band_key),
  *    BUCKETED BY (band, band_key) — the delta-vs-history candidate join
  *    keys on exactly those columns, so the standing side (the corpus-sized
  *    relation) joins EXCHANGE-FREE: only the batch-sized delta bands
  *    shuffle. At 100 TB this is the difference between re-shuffling the
  *    corpus index per batch and touching only matched buckets.
  *
  * Query-many goes through [[Dedup.minHashLshPairsIncremental]] with the
  * standing tables plugged in as `historySigs`/`historyBands` — the corpus
  * text is never re-hashed; it is only consulted (id-scoped) to exactly
  * verify the band-collision survivors. Rebuilds are deterministic: the
  * signature kernel is seed-fixed, so `build` on the same corpus rewrites
  * identical tables.
  */
object MinHashIndex {
  val DefaultBuckets = 32

  def sigsTable(db: String, name: String): String = s"$db.${name}_minhash_sigs"
  def bandsTable(db: String, name: String): String = s"$db.${name}_minhash_bands"

  /** Sign the corpus once and materialize the standing index tables. */
  def build(spark: SparkSession, docs: DataFrame, db: String, name: String,
      buckets: Int = DefaultBuckets): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val sigs = Dedup.minHashSignatures(docs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    sigs.write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(sigsTable(db, name))
    Dedup.bandKeys(sigs).write.mode("overwrite")
      .bucketBy(buckets, "band", "band_key")
      .saveAsTable(bandsTable(db, name))
    sigs.unpersist(false)
  }

  /** Near-dup pairs of a delta batch against the indexed corpus: exactly
    * the pairs the full pipeline would emit that touch a delta doc, with
    * history signatures/bands read from the standing tables instead of
    * recomputed. `corpus` is the indexed document relation (text needed
    * only for id-scoped verification of candidate pairs). */
  def queryPairs(spark: SparkSession, corpus: DataFrame, delta: DataFrame,
      db: String, name: String, threshold: Double = 0.8): DataFrame =
    Dedup.minHashLshPairsIncremental(
      history = corpus, delta = delta, threshold = threshold,
      historySigs = Some(spark.table(sigsTable(db, name))),
      historyBands = Some(spark.table(bandsTable(db, name))))
}
