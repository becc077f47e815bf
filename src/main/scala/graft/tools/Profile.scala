package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.dedup.Dedup
import graft.sources.Tables

/** Dev-only stage profiler (not part of the driver contract): times the
  * pieces of the dedup pipelines so regressions can be localized without
  * the UI. */
object Profile {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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

    // char-gram MinHash pipeline (native scan-side signatures)
    val bands = Dedup.bandKeys(Dedup.minHashSignatures(docs))
    bands.persist()
    time("char bands persist")(bands.count())
    val cand = Dedup.candidatePairs(bands)
    cand.persist()
    time("char candidates")(println("  rows=" + cand.count()))
    time("char full pipeline")(Dedup.minHashLshPairs(docs).count())
    bands.unpersist(); cand.unpersist()

    // word-ngram pipeline (native scan-side signatures)
    val wbands = Dedup.bandKeys(Dedup.wordMinHashSignatures(docs))
    wbands.persist()
    time("word bands persist")(wbands.count())
    time("word candidates")(println("  rows=" + Dedup.candidatePairs(wbands).count()))
    time("word full pipeline")(Dedup.ngramJaccardPairs(docs).count())
    wbands.unpersist()

    time("simhash pairs")(Dedup.simHashPairs(docs).count())

    spark.stop()
  }
}
