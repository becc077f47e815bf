package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
