package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession
import graft.dedup.Dedup
import graft.sources.Tables

/** Dev-only stage profiler (not part of the driver contract): times the
  * pieces of a pipeline so regressions can be localized without the UI. */
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

    val sh = Dedup.shingles(docs)
    time("shingles distinct count")(println("  rows=" + sh.count()))
    sh.persist()
    time("shingles persist")(sh.count())

    val sigs = Dedup.minHashSignatures(sh)
    time("signatures")(println("  rows=" + sigs.count()))

    val bands = Dedup.bandKeys(sigs)
    bands.persist()
    time("bands persist")(bands.count())

    val cand = Dedup.candidatePairs(bands)
    time("candidates")(println("  rows=" + cand.count()))

    val jac = Dedup.jaccard(cand, sh)
    time("jaccard verify")(println("  rows=" + jac.count()))

    spark.stop()
  }
}
