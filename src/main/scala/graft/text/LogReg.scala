package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-round logistic-regression training INSIDE the engine — the
  * quality-classifier workhorse of LLM data curation (GPT-3-style corpus
  * filtering trains exactly this shape: a linear model over cheap text
  * features, scored across the whole crawl). Public methodology:
  * batch gradient descent on the log-loss (any ML textbook).
  *
  * 100 TB posture: each round is ONE scan-side aggregate over the
  * persisted feature relation (the gradient is k scalars); weights live on
  * the driver like every other trainer here (k doubles). Rounds are FIXED
  * so a SQL oracle replays training exactly.
  *
  * Determinism (the repo's trainer contract): per-row gradient terms are
  * rounded to 6dp and accumulated in DECIMAL(18,6) — exact,
  * order-independent — and the weights are re-quantized to 6dp every
  * round, so the learned model is bit-identical across partitionings and
  * engines. The only transcendental is exp() in the sigmoid; its inputs
  * are IEEE-identical on both engines and the output is rounded to 6dp
  * per row before summation, so a last-ulp libm divergence cannot reach
  * the hash (same argument as the ln() uses repo-wide).
  */
object LogReg {
  val Scale = 6
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(Scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Feature relation for the English-quality classifier: label y = 1.0
    * when the doc's lang tag is 'en'; features are the quality-score
    * components (length saturation, English stopword ratio) plus an
    * implicit bias. */
  def features(docs: DataFrame): DataFrame =
    docs.select(
      when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"),
      least(TextAnalysis.tokenCount(col("text")).cast("double") / lit(100.0),
        lit(1.0)).as("x2"),
      TextAnalysis.stopwordRatio(col("text")).as("x3"))

  private def z(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("x2") + lit(w(2)) * col("x3")

  /** `iters` rounds of batch gradient descent (lr = 1) from w = 0 over a
    * (y, x2, x3) feature relation; returns the quantized weights
    * [bias, w_len, w_stop]. Caller persists `f` (it is scanned once per
    * round plus once for n). */
  def trainOnFeatures(f: DataFrame, iters: Int = 5): Array[Double] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val dec = DecimalType(18, Scale)
    val n = f.count()
    var w = Array(0.0, 0.0, 0.0)
    for (_ <- 0 until iters) {
      val err = col("y") - lit(1.0) / (lit(1.0) + exp(-z(w)))
      val g = f.agg(
        sum(round(err * lit(1.0), Scale).cast(dec)),
        sum(round(err * col("x2"), Scale).cast(dec)),
        sum(round(err * col("x3"), Scale).cast(dec))).head()
      w = Array(
        round6(w(0) + g.getDecimal(0).doubleValue() / n),
        round6(w(1) + g.getDecimal(1).doubleValue() / n),
        round6(w(2) + g.getDecimal(2).doubleValue() / n))
    }
    w
  }

  /** Training accuracy of weights `w` over the feature relation: the
    * decision boundary is z > 0 (σ(z) > 0.5 without evaluating σ —
    * integer-safe, no transcendental in the verdict). */
  def accuracyAgg(f: DataFrame, w: Array[Double]): DataFrame =
    f.agg(count(lit(1)).as("n_docs"),
      sum(when((z(w) > 0) === (col("y") === 1.0), 1L).otherwise(0L))
        .as("n_correct"))
}
