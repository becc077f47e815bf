package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index lifecycle for the ANN family: build ONCE, query MANY — the way
  * the composed IVF-PQ index actually operates at 100 TB. The harness
  * queries retrain inline every run so the DuckDB oracle can replay
  * training end-to-end; production separates the phases:
  *
  *  - [[buildIvfPq]] trains the coarse quantizer and the codebooks, then
  *    materializes three tables: the centroids (cells × dim doubles), the
  *    codebooks (M × k codewords), and the CODES table — one row per
  *    corpus vector, PARTITIONED BY CELL, so a probe touches only its
  *    cells' partitions and the float vectors are never read at query
  *    time. Training cost is paid exactly once; the codes table is ~8
  *    small ints per vector.
  *  - [[queryIvfPq]] loads the (tiny) centroid/codebook tables to the
  *    driver, routes the query batch to its probe cells, and ADC-ranks
  *    against the stored codes — identical math to
  *    [[IvfPq.topKApprox]], so IndexStoreSpec pins result equality
  *    between the stored-index path and the inline path.
  */
object IndexStore {

  private def centroidsTable(db: String, name: String) = s"$db.${name}_centroids"
  private def codebooksTable(db: String, name: String) = s"$db.${name}_codebooks"
  private def codesTable(db: String, name: String) = s"$db.${name}_codes"

  /** Train and materialize the index tables. Deterministic: rebuilding
    * from the same corpus yields identical tables. */
  def buildIvfPq(
      spark: SparkSession, corpus: DataFrame, db: String, name: String,
      numCells: Int = 16, coarseIters: Int = 5): Unit = {
    import spark.implicits._
    val centroids = Ivf.trainCentroids(corpus, numCells, coarseIters)
    val books = Pq.trainCodebooks(corpus)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .write.mode("overwrite").saveAsTable(centroidsTable(db, name))
    books.zipWithIndex
      .flatMap { case (b, m) => b.zipWithIndex.map { case (cw, cell) => (m, cell, cw.toSeq) } }
      .toSeq.toDF("m", "cell", "codeword")
      .write.mode("overwrite").saveAsTable(codebooksTable(db, name))
    val v = col("embedding").cast("array<double>")
    corpus.select(col("vec_id").as("c_id"),
        array((0 until Pq.NumSubspaces).map(m =>
          Ivf.cellCol(Pq.subVector(v, m), books(m))): _*).as("codes"),
        Ivf.cellCol(v, centroids).as("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .saveAsTable(codesTable(db, name))
  }

  /** Load the driver-side parameter tables (cells × dim and M × k × subdim
    * doubles — small by construction, the only data that leaves the
    * cluster). */
  private def loadParams(
      spark: SparkSession, db: String, name: String): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val centroids = spark.table(centroidsTable(db, name))
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    val bookRows = spark.table(codebooksTable(db, name))
      .orderBy("m", "cell").collect()
    val books = bookRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray).toArray)
      .toArray
    (centroids, books)
  }

  /** ADC top-k against the stored index: probe routing against the saved
    * centroids, equi-join into the cell-partitioned codes table, ADC sum
    * against the saved codebooks. Result-identical to the inline
    * [[IvfPq.topKApprox]] on the same corpus. */
  def queryIvfPq(
      spark: SparkSession, queries: DataFrame, db: String, name: String,
      k: Int, nprobe: Int = 4): DataFrame = {
    val (centroids, books) = loadParams(spark, db, name)
    val codes = spark.table(codesTable(db, name))
    val q = Ivf.probeCells(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      centroids, nprobe)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_score").desc, col("c_id"))
    codes.join(q, col("cell") === col("probe") && col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        round(Pq.adcScore(col("q_emb"), col("codes"), books), 6).as("approx_score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "approx_score")
      .orderBy("q_id", "rnk")
  }
}
