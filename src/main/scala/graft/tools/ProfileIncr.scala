package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.dedup.Dedup
import graft.sources.Tables

/** Dev-only stage profile of the banded incremental dedup shape
  * (delta×history + delta×delta band joins) against the full-corpus
  * self-join — added after ScaleSmoke's containment-incr section showed
  * the incremental path LOSING to the full recompute. */
object ProfileIncr {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)

    val docs1 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-profincr").toString
    val n = 10000000L
    (0 until copies).map { c =>
      val prefix = concat_ws(" ",
        transform(sequence(lit(1), lit(60)),
          i => concat(lit("s"), pmod(hash(col("doc_id"), lit(c), i), lit(99999)))))
      docs1.select((col("doc_id") + lit(c * n)).as("doc_id"),
        concat(prefix, lit(" "), col("text")).as("text"))
    }.reduce(_ unionAll _).write.mode("overwrite").parquet(s"$tmp/docs")
    val history = spark.read.parquet(s"$tmp/docs")
    val delta = docs1.select((col("doc_id") + 910000000L).as("doc_id"), col("text"))
    Dedup.wordMinHashSignatures(history).write.mode("overwrite")
      .parquet(s"$tmp/sigs")
    val index = spark.read.parquet(s"$tmp/sigs")

    // warmup
    Dedup.ngramContainmentPairs(delta.limit(300)).unpersist()

    time("full pipeline")(Dedup.ngramContainmentPairs(
      history.unionByName(delta)).unpersist())
    time("incr pipeline")(Dedup.ngramContainmentPairsIncremental(
      history, delta, historySigs = Some(index)).unpersist())

    // stage breakdown of incr
    val bandsH = Dedup.bandKeys(index).persist(StorageLevel.MEMORY_AND_DISK)
    time("stage bandsH (from stored sigs)")(println("  rows=" + bandsH.count()))
    val bandsD = Dedup.bandKeys(Dedup.wordMinHashSignatures(delta))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("stage bandsD")(println("  rows=" + bandsD.count()))
    val dh = bandsD.as("a").join(bandsH.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    time("stage dh join")(println("  rows=" + dh.count()))
    val dd = bandsD.as("a").join(bandsD.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("stage dd join")(println("  rows=" + dd.count()))
    val cand = dh.union(dd).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    time("stage cand distinct")(println("  rows=" + cand.count()))
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    time("stage candDocs")(println("  rows=" + candDocs.count()))
    val candSh = Dedup.wordShingles(
      history.unionByName(delta).join(candDocs, Seq("doc_id"), "left_semi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("stage candSh")(println("  rows=" + candSh.count()))
    val result = Dedup.containment(cand, candSh).where(col("containment") >= 0.6)
    time("stage verify")(println("  rows=" + result.count()))
    spark.stop()
  }
}
