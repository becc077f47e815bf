package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.dedup.Dedup
import graft.sources.Tables

/** Dev-only A/B: minHashLshPairsIncremental as shipped (persist pins, full
  * lineage) vs a lineage-TRUNCATED variant that localCheckpoints the tiny
  * candidate/shingle intermediates, so the verify tail's plan is a few
  * leaf-backed joins instead of a tree that re-inlines the whole pipeline
  * on every reference (guide §3.3: planning time as bottleneck). Three
  * cold passes each (clearCache between), bench methodology.
  */
object ProfileIncrTrunc {
  private def passes(label: String, spark: SparkSession)(f: => Long): Unit = {
    val ts = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, n)
    }
    println(f"[ab] $label%-34s min=${ts.map(_._1).min}%6.2f s  " +
      f"passes=${ts.map(t => f"${t._1}%.2f").mkString(",")}  rows=${ts.head._2}")
  }

  private def truncated(history: DataFrame, delta: DataFrame,
      threshold: Double): DataFrame = {
    val sigsH = Dedup.minHashSignatures(history).localCheckpoint(true)
    val sigsD = Dedup.minHashSignatures(delta).localCheckpoint(true)
    val bandsH = Dedup.bandKeys(sigsH)
    val bandsD = Dedup.bandKeys(sigsD).localCheckpoint(true)
    val dh = bandsD.as("a").join(bandsH.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    val dd = bandsD.as("a").join(bandsD.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cand0 = dh.union(dd).distinct()
    val sigs = sigsH.unionByName(sigsD)
    val agree = (0 until Dedup.NumHashes)
      .map(i => when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    val cand = cand0
      .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .where(agree >= lit(Dedup.minAgree(Dedup.NumHashes, threshold)))
      .select("doc_a", "doc_b")
      .localCheckpoint(true)
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val sh = Dedup.shingles(history.unionByName(delta)
        .join(candDocs, Seq("doc_id"), "left_semi"))
      .localCheckpoint(true)
    Dedup.jaccard(cand, sh)
      .where(col("jaccard") >= lit(threshold))
      .orderBy("doc_a", "doc_b")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val history = docs.where(col("doc_id") % 2 === 0)
    val delta = docs.where(col("doc_id") % 2 === 1)

    // warmup both shapes at sf0.001
    {
      val w = Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
      val h = w.where(col("doc_id") % 2 === 0)
      val d = w.where(col("doc_id") % 2 === 1)
      Dedup.minHashLshPairsIncremental(h, d, 0.8).count()
      truncated(h, d, 0.8).count()
      spark.catalog.clearCache()
    }

    // result equality check once at sf0.1
    val a = Dedup.minHashLshPairsIncremental(history, delta, 0.8)
      .collect().map(_.toString).toSeq.sorted
    val b = truncated(history, delta, 0.8).collect().map(_.toString).toSeq.sorted
    require(a == b, s"MISMATCH: current=${a.size} truncated=${b.size}")
    println(s"[ab] results identical: ${a.size} pairs")
    spark.catalog.clearCache()

    passes("current (persist pins)", spark) {
      Dedup.minHashLshPairsIncremental(history, delta, 0.8).count()
    }
    passes("truncated (localCheckpoint)", spark) {
      truncated(history, delta, 0.8).count()
    }
    // repeat in reverse order to control for drift
    passes("truncated (2nd)", spark) {
      truncated(history, delta, 0.8).count()
    }
    passes("current (2nd)", spark) {
      Dedup.minHashLshPairsIncremental(history, delta, 0.8).count()
    }
    spark.stop()
  }
}
