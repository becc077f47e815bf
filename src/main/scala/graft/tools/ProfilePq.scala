package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sim.{Ivf, IvfPq, Pq}
import graft.sources.Tables

/** Dev-only stage profiler for the PQ / IVF-PQ paths. */
object ProfilePq {
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

    val emb = Tables.load(spark, sfDir, "embeddings")
    time("emb.count")(emb.count())

    // decompose one Lloyd round of codebook training
    {
      val v = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")).persist()
      v.count()
      val seeds = v.where(pmod(col("id"), lit(v.count() / 8)) === 0)
        .orderBy("id").limit(8)
        .select("v").collect().map(_.getSeq[Double](0).toArray)
      val books = Array.tabulate(Pq.NumSubspaces)(m =>
        seeds.map(_.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)))
      val cells = array((0 until Pq.NumSubspaces).map(m =>
        Ivf.cellCol(Pq.subVector(col("v"), m), books(m))): _*)
      val assigned = v.select(cells.as("cells"), posexplode(col("v")).as(Seq("pos", "x")))
        .select(expr(s"CAST(pos DIV ${Pq.SubDim} AS INT)").as("m"),
          expr(s"CAST(pos % ${Pq.SubDim} AS INT)").as("subpos"),
          col("cells"), col("x"))
        .withColumn("cell", element_at(col("cells"), (col("m") + 1).cast("int")))
        .groupBy("m", "cell", "subpos")
        .agg(round(avg("x"), 6).as("mean"))
      time("round: plan only")(assigned.queryExecution.executedPlan)
      println(assigned.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(160)).mkString("\n"))
      time("round: collect")(assigned.collect())
      time("round: collect again")(assigned.collect())
      val justCells = v.select(cells.as("cells"))
      time("cells only count")(justCells.where(element_at(col("cells"), 1) >= 0).count())
      v.unpersist()
    }

    val centroids = time("ivf train (5 iters)")(Ivf.trainCentroids(emb, 16, 5))
    val books = time("pq train (2 iters)")(Pq.trainCodebooks(emb))
    val books2 = time("pq train again")(Pq.trainCodebooks(emb))
    time("pq encode count")(
      Pq.encode(emb, books).agg(sum(element_at(col("codes"), 1))).head())
    time("pq adc rank")(
      Pq.topKApprox(emb, emb.where(col("vec_id") < 10), 3, books).count())
    time("ivf index")(Ivf.index(emb, centroids).agg(sum("cell")).head())
    time("ivfpq full")(
      IvfPq.topKApprox(emb, emb.where(col("vec_id") < 10), 3).count())
    spark.stop()
  }
}
