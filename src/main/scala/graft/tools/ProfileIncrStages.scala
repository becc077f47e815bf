package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.dedup.Dedup
import graft.sources.Tables

/** Dev-only stage profile of dedup_minhash_incr at the BENCH scale (sf0.1,
  * derived mode — no standing index), to locate where its ~5 s goes: the
  * signature scans, the band joins, the agreement verify, or the shingle
  * verify. Each stage is timed with the upstream pins already hot, exactly
  * like the operator's own internal ordering.
  */
object ProfileIncrStages {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
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

    // codegen warmup at sf0.001
    {
      val w = Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
      Dedup.minHashLshPairsIncremental(
        w.where(col("doc_id") % 2 === 0), w.where(col("doc_id") % 2 === 1)).count()
      spark.catalog.clearCache()
    }

    time("END-TO-END minHashLshPairsIncremental") {
      Dedup.minHashLshPairsIncremental(history, delta, 0.8).count()
    }
    spark.catalog.clearCache()

    // stage-by-stage replay of the operator's own internals
    val sigsH = time("sigsH persist+count") {
      val s = Dedup.minHashSignatures(history).persist(StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val sigsD = time("sigsD persist+count") {
      val s = Dedup.minHashSignatures(delta).persist(StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val bandsH = Dedup.bandKeys(sigsH)
    val bandsD = time("bandsD persist+count") {
      val b = Dedup.bandKeys(sigsD).persist(StorageLevel.MEMORY_AND_DISK)
      b.count(); b
    }
    val dh = bandsD.as("a").join(bandsH.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    val dd = bandsD.as("a").join(bandsD.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cand0 = time("cand0 (dh ∪ dd distinct) count") {
      val c = dh.union(dd).distinct(); println("  rows=" + c.count()); c
    }
    val sigs = time("union sigs persist+count") {
      val s = sigsH.unionByName(sigsD).persist(StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val agree = (0 until Dedup.NumHashes)
      .map(i => when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    val cand = time("agreement pre-filter persist+count") {
      val c = cand0
        .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id"))
        .where(agree >= lit(Dedup.minAgree(Dedup.NumHashes, 0.8)))
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
      println("  rows=" + c.count()); c
    }
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val sh = time("shingles persist+count") {
      val s = Dedup.shingles(history.unionByName(delta)
        .join(candDocs, Seq("doc_id"), "left_semi"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println("  rows=" + s.count()); s
    }
    time("jaccard verify + orderBy count") {
      println("  rows=" + Dedup.jaccard(cand, sh)
        .where(col("jaccard") >= lit(0.8)).orderBy("doc_a", "doc_b").count())
    }
    spark.stop()
  }
}
