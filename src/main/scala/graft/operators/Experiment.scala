package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Shared experiment-analysis pieces: deterministic cohort assignment and
  * the pooled two-proportion z readout. One implementation serves both the
  * batch query (`events_ab_test`) and the streaming counter sink
  * (`StreamingIngest.toAbTestSink` → `abTestReadout`), so the two surfaces
  * cannot drift — the same no-drift principle as the generated oracle SQL.
  *
  * Cohorts are md5-parity buckets (the split_assign machinery): no RNG, so
  * every readout is reproducible and hash-checkable. The z formula guards
  * every degenerate case (empty cohort, 0%/100% pooled rate) with NULL
  * instead of tripping ANSI divide-by-zero.
  */
object Experiment {

  /** Deterministic 0/1 cohort from a user id column (md5-parity). */
  def cohort(userId: Column): Column =
    conv(substring(md5(userId.cast("string")), 1, 12), 16, 10)
      .cast("long") % 2

  /** Collapse per-user (cv: 0/1 converted, grp: 0/1 cohort) rows into the
    * one-row cohort counts relation (n_a, conv_a, n_b, conv_b). */
  def cohortCounts(users: DataFrame): DataFrame =
    users.agg(
      sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("grp") === 0, col("cv")).otherwise(0L)).as("conv_a"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("grp") === 1, col("cv")).otherwise(0L)).as("conv_b"))

  /** Wald SPRT constants (Wald, "Sequential Tests of Statistical
    * Hypotheses", Ann. Math. Stat. 1945): H0 p = 0.3 vs H1 p = 0.4 at
    * α = β = 0.05 over per-(day, user) conversion Bernoullis. All three
    * ln constants are rounded HALF_UP to 6dp ON THE DRIVER and enter both
    * the Spark plan and the generated oracle as decimal literals, so the
    * whole cumulative-LLR curve is exact integer×decimal arithmetic with
    * zero cross-engine transcendentals. */
  private def bd6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  val SprtC1: BigDecimal = bd6(math.log(4.0 / 3.0)) // ln(p1/p0)
  val SprtC2: BigDecimal = bd6(math.log(6.0 / 7.0)) // ln((1-p1)/(1-p0))
  val SprtA: BigDecimal = bd6(math.log(19.0))       // ln((1-β)/α)

  /** The SPRT decision curve over a per-(day, user) trial ledger
    * (day, sc ∈ {0, 1}): daily trial/success totals, the cumulative
    * log-likelihood ratio cs·C1 + (cn−cs)·C2, and the ±ln(19) decision
    * per day. ONE implementation serves the batch query
    * (`events_sequential_sprt`) and the streaming counter sink
    * ([[graft.streaming.StreamingIngest.sprtReadout]]) — the same
    * no-drift rule as [[zReadout]]. The cumulative window is bounded by
    * ≤ #days rows. */
  def sprtCurve(trials: DataFrame): DataFrame = {
    val daily = trials.groupBy("day")
      .agg(count(lit(1)).as("n"), sum(col("sc")).as("s"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily.select(col("day"),
      sum(col("n")).over(w).as("cn"), sum(col("s")).over(w).as("cs"))
    val llr = col("cs").cast(DecimalType(20, 0)) * lit(SprtC1.bigDecimal) +
      (col("cn") - col("cs")).cast(DecimalType(20, 0)) * lit(SprtC2.bigDecimal)
    cum.select(col("day"), col("cn").as("n_trials"),
        col("cs").as("n_success"),
        round(llr, 6).cast("double").as("llr"),
        when(llr >= lit(SprtA.bigDecimal), lit("accept_h1"))
          .when(llr <= lit(SprtA.bigDecimal.negate), lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
      .orderBy("day")
  }

  /** Pooled-variance two-proportion z-test readout over a (n_a, conv_a,
    * n_b, conv_b) relation: per-cohort rates plus the z statistic, all in
    * one projection of IEEE arithmetic. */
  def zReadout(c: DataFrame): DataFrame = {
    val tot = col("conv_a") + col("conv_b")
    val n = col("n_a") + col("n_b")
    val degenerate = col("n_a") === 0 || col("n_b") === 0 ||
      tot === 0 || tot === n
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pp = tot.cast("double") / n
    c.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      // per-rate guards: an EMPTY cohort must read NULL, not 0/0 = NaN
      // (reachable via abTestReadout on a one-cohort stream prefix)
      when(col("n_a") > 0, round(pa, 6)).as("rate_a"),
      when(col("n_b") > 0, round(pb, 6)).as("rate_b"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round((pa - pb) /
          sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6))
        .as("z"))
  }
}
