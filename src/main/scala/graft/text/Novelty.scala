package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Per-doc n-gram novelty: the fraction of a doc's distinct word n-grams
  * whose FIRST corpus occurrence (min doc_id — ingestion order) is this
  * doc. The memorization/contribution signal data curation ranks by: a
  * doc whose grams all appeared earlier adds no new n-gram mass.
  *
  * Scale shape: one shuffle keyed by gram for the global first-seen
  * aggregate, one groupBy back to docs — both with map-side partials, no
  * window over the corpus, no self-join. The incremental form scores a
  * delta batch against the STANDING gram→first-doc table in O(delta grams
  * + matched standing rows) and equals the full pipeline filtered to the
  * delta because min is associative: min over (history ∪ delta) =
  * least(min history, min delta).
  */
object Novelty {
  val GramSize = 3

  /** The standing state: gram → first doc_id over a corpus. Maintained by
    * an ingest path as a table; unioning `least`-merged snapshots is
    * lossless for the same reason the incremental form is exact. */
  def firstSeen(docs: DataFrame): DataFrame =
    Dedup.wordShingles(docs, n = GramSize, dedup = true)
      .groupBy("shingle").agg(min(col("doc_id")).as("hist_first"))

  /** Full-corpus novelty: (doc_id, n_grams, n_novel, novelty) for every
    * doc; docs too short to carry a gram score 1.0 (all-new). */
  def score(docs: DataFrame): DataFrame = {
    val grams = Dedup.wordShingles(docs, n = GramSize, dedup = true)
    val first = grams.groupBy("shingle")
      .agg(min(col("doc_id")).as("first_doc"))
    perDoc(docs, grams, first)
  }

  /** Delta-vs-standing novelty: exactly `score(history ∪ delta)` rows for
    * the delta docs, without touching the history corpus — only its
    * narrow standing gram table. */
  def scoreIncremental(delta: DataFrame, standing: DataFrame): DataFrame = {
    val deltaGrams = Dedup.wordShingles(delta, n = GramSize, dedup = true)
    val first = deltaGrams.groupBy("shingle")
      .agg(min(col("doc_id")).as("delta_first"))
      .join(standing, Seq("shingle"), "left")
      .select(col("shingle"),
        least(coalesce(col("hist_first"), col("delta_first")),
          col("delta_first")).as("first_doc"))
    perDoc(delta, deltaGrams, first)
  }

  private def perDoc(
      docs: DataFrame, grams: DataFrame, first: DataFrame): DataFrame = {
    val agg = grams.join(first, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    docs.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(1.0))
          .otherwise(round(col("n_novel").cast("double") /
            col("n_grams").cast("double"), 6)).as("novelty"))
      .orderBy("doc_id")
  }
}
