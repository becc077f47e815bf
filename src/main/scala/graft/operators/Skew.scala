package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations: two-phase salted groupBy.
  *
  * A plain `groupBy(k).agg(...)` hash-partitions ALL rows of a hot key
  * into one reducer; at 100 TB a single pathological key stalls the stage.
  * Salting splits each key into `salts` sub-groups for the first (partial)
  * aggregation, so the wide shuffle is uniform; the second aggregation
  * merges the per-salt partials — `salts × |keys|` rows, trivially small.
  *
  * The salt is `hash(all non-key columns) mod salts` — deterministic
  * (safe under task retry, unlike rand()) and spreading whenever values
  * vary. Supported merges are the algebraic aggregates whose partial and
  * final forms compose: count/sum/min/max.
  *
  * (For JOIN skew, AQE's skew-join splitting — on by default in
  * GraftSession — already re-plans hot partitions at runtime; this helper
  * covers the aggregation side, which AQE does not salt.)
  */
object Skew {

  sealed trait AggSpec { def col: String; def as: String }
  final case class CountRows(as: String) extends AggSpec { val col = "*" }
  final case class Sum(col: String, as: String) extends AggSpec
  final case class Min(col: String, as: String) extends AggSpec
  final case class Max(col: String, as: String) extends AggSpec

  /** Salted two-phase aggregation; result equals
    * `df.groupBy(keys).agg(...)` with a uniform first shuffle. */
  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Seq[AggSpec],
      salts: Int = 64): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate")
    val valueCols = df.columns.filterNot(keys.contains).map(col).toIndexedSeq
    // Key-only frames have nothing value-like to hash; the partition id is
    // still deterministic for a given file layout and spreads hot keys.
    val saltExpr =
      if (valueCols.nonEmpty) pmod(hash(valueCols: _*), lit(salts))
      else pmod(spark_partition_id(), lit(salts))
    val salted = df.withColumn("__salt", saltExpr)

    val partial: Seq[Column] = aggs.map {
      case CountRows(as) => count(lit(1)).as(s"__p_$as")
      case Sum(c, as)    => sum(col(c)).as(s"__p_$as")
      case Min(c, as)    => min(col(c)).as(s"__p_$as")
      case Max(c, as)    => max(col(c)).as(s"__p_$as")
    }
    val merged: Seq[Column] = aggs.map {
      case CountRows(as) => sum(col(s"__p_$as")).as(as)
      case Sum(_, as)    => sum(col(s"__p_$as")).as(as)
      case Min(_, as)    => min(col(s"__p_$as")).as(as)
      case Max(_, as)    => max(col(s"__p_$as")).as(as)
    }
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }

  /** Salted equi-join for PRE-KNOWN hot keys: the big side gets a
    * deterministic salt from its non-key values, the small side is
    * replicated once per salt, and the join key becomes (keys, salt) —
    * so a key that hashed to one reducer now spreads over `salts` of
    * them. The result is EXACTLY the plain equi-join (every big-side row
    * meets every matching small-side row exactly once, at its own salt).
    *
    * Relationship to AQE: AQE's skew-join split re-plans hot PARTITIONS
    * at runtime and is the right default. Explicit salting is the static
    * cure left for the case AQE's granularity cannot fix: tiny key
    * cardinality (a 5-language corpus joined to per-language stats) where
    * EVERY partition of the plain shuffle is a hot key, and for
    * broadcast-ineligible small sides. Cost: `salts ×` replication of
    * the small side — keep `small` genuinely small. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int = 16): DataFrame = {
    val valueCols = big.columns.filterNot(keys.contains).map(col).toIndexedSeq
    val saltExpr =
      if (valueCols.nonEmpty) pmod(hash(valueCols: _*), lit(salts))
      else pmod(spark_partition_id(), lit(salts))
    val b = big.withColumn("__salt", saltExpr)
    val sm = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(sm, keys :+ "__salt").drop("__salt")
  }
}
