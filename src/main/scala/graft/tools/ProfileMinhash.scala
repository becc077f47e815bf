package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.dedup.Dedup
import graft.sources.Tables

/** Dev-only A/B profiler for the MinHash-LSH pipeline: times the round-3
  * shape (raw candidates straight to exact verify) against the current
  * two-stage shape (signature-agreement pre-filter first), with per-stage
  * breakdown. Not part of the driver contract. */
object ProfileMinhash {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)

    val docs = Tables.load(spark, sfDir, "documents")
    time("docs.count")(docs.count())

    // warm codegen at the smallest SF like Bench does
    val warm = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    time("warmup (new, sf0.001)")(Dedup.minHashLshPairs(warm).count())

    (1 to 3).foreach { i =>
      time(s"NEW minHashLshPairs #$i")(Dedup.minHashLshPairs(docs).count())
    }

    // round-3 shape, reconstructed from the same public pieces
    def oldPipeline(): Long = {
      val bands = Dedup.bandKeys(Dedup.minHashSignatures(docs))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val cand = Dedup.candidatePairs(bands).persist(StorageLevel.MEMORY_AND_DISK)
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val sh = Dedup.shingles(docs.join(broadcast(candDocs), Seq("doc_id"), "left_semi"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val result = Dedup.jaccard(cand, sh)
        .where(col("jaccard") >= lit(0.8))
        .orderBy("doc_a", "doc_b")
      val n = result.count()
      bands.unpersist(false); cand.unpersist(false); sh.unpersist(false)
      n
    }
    (1 to 3).foreach { i =>
      time(s"OLD shape #$i")(oldPipeline())
    }

    // stage breakdown of the new shape
    val sigs = Dedup.minHashSignatures(docs).persist(StorageLevel.MEMORY_AND_DISK)
    time("stage: sigs persist")(sigs.count())
    val bands = Dedup.bandKeys(sigs).persist(StorageLevel.MEMORY_AND_DISK)
    time("stage: bands persist")(bands.count())
    val cand0 = Dedup.candidatePairs(bands)
    time("stage: raw candidates")(println("  raw=" + cand0.count()))
    val agree = (0 until Dedup.NumHashes)
      .map(i => when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    val cand = cand0
      .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .where(agree >= lit(Dedup.minAgree(Dedup.NumHashes, 0.8)))
      .select("doc_a", "doc_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("stage: prefiltered candidates")(println("  kept=" + cand.count()))
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    time("stage: candDocs")(println("  docs=" + candDocs.count()))
    val sh = Dedup.shingles(docs.join(candDocs, Seq("doc_id"), "left_semi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("stage: shingles persist")(println("  sh=" + sh.count()))
    val result = Dedup.jaccard(cand, sh)
      .where(col("jaccard") >= lit(0.8))
      .orderBy("doc_a", "doc_b")
    time("stage: exact verify")(println("  pairs=" + result.count()))
    spark.stop()
  }
}
