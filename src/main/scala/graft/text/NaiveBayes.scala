package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over md5-HASHED token buckets (McCallum &
  * Nigam AAAI'98 workshop; hashing trick per Weinberger et al. ICML'09 —
  * public methodology). Training is a PURE AGGREGATION: class-conditional
  * bucket counts, then Laplace-smoothed log-likelihoods — no gradient
  * rounds, no driver iteration, which is what makes it the classifier a
  * 100 TB pipeline fits in one pass and maintains CONTINUOUSLY (counts
  * are additive, so streaming micro-batches fold into a standing counter
  * table — see StreamingIngest.toNbCountsSink).
  *
  * Shared by the batch registry queries (quality_nb_train/score/kappa)
  * and the streaming readout so the two surfaces cannot drift.
  * Determinism: counts are exact integers; ln rounds to 6dp (the repo's
  * transcendental discipline).
  */
object NaiveBayes {
  /** Hashed feature width — bounded model size by construction. */
  val Width = 16

  /** md5-derived feature bucket for one token (replays exactly in the
    * DuckDB oracle as `CAST('0x' || substr(md5(w),1,12) AS BIGINT) % W`). */
  def bucket(w: Column): Column =
    conv(substring(md5(w), 1, 12), 16, 10).cast("long") % Width

  /** Class-conditional token-bucket counts (bucket, c0, c1) over a
    * documents relation; label y = (lang = 'en'). One tokenize explode +
    * one bucket-bounded groupBy — map-side combinable, additive across
    * batches. */
  def countsFromDocs(docs: DataFrame): DataFrame =
    docs
      .select(when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        explode(expr("filter(split(lower(text), '\\\\s+'), x -> x != '')"))
          .as("w"))
      .select(col("y"), bucket(col("w")).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("y") === 0L, 1L).otherwise(0L)).as("c0"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("c1"))

  /** The learned model from a (bucket, c0, c1) counts relation: class
    * totals by a window over the Width-bounded bucket rows (never a
    * second corpus pass), then Laplace-smoothed log-likelihoods
    * log((c_y,b + 1)/(c_y + Width)) rounded to 6dp. */
  def modelFromCounts(counts: DataFrame): DataFrame =
    counts
      .select(col("bucket"), col("c0"), col("c1"),
        sum(col("c0")).over(Window.partitionBy()).as("t0"),
        sum(col("c1")).over(Window.partitionBy()).as("t1"))
      .select(col("bucket"), col("c0"), col("c1"),
        round(log((col("c0") + 1).cast("double")
          / (col("t0") + Width).cast("double")), 6).as("logp0"),
        round(log((col("c1") + 1).cast("double")
          / (col("t1") + Width).cast("double")), 6).as("logp1"))
}
