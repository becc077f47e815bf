package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

/** Pins the round-13 pinned-pairs release (r12 advice): the pair-building
  * admission sinks call builders whose results come back internally
  * persist+count'ed, and a long-running stream must not accrete one
  * cached pair relation per micro-batch. Each sink family runs three
  * micro-batches; after every batch at most the batch's own eager
  * localCheckpoint block may linger (the ContextCleaner retires it when
  * the next batch replaces the reference) — a leak reads as a strictly
  * growing persistent-RDD count, which this spec forbids.
  */
class StreamingCacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Persistent RDD ids beyond the pre-test baseline. */
  private def runBatches(db: String, tables: Seq[String])(
      batch: Int => Unit): Unit = {
    spark.catalog.clearCache()
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $db.$t"))
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    try {
      (1 to 3).foreach { i =>
        batch(i)
        // the strong claim: the CacheManager holds NO cached plan after a
        // batch — the builders' internally-persisted pair relations must
        // all have been released by the sink (localCheckpoint blocks live
        // in the RDD map, not the CacheManager, so this is exact)
        assert(org.apache.spark.sql.CacheStateProbe.cacheIsEmpty(spark),
          s"$db batch $i left cached plans behind — pair cache leak")
        val extra = spark.sparkContext.getPersistentRDDs.keySet -- baseline
        // one lingering localCheckpoint block is legal; a per-batch cached
        // pair relation (the leak) would make this grow by >=2 per batch
        assert(extra.size <= 2,
          s"$db batch $i left ${extra.size} persistent RDDs — pair cache leak")
      }
    } finally spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("minhash admission releases its pair cache every micro-batch") {
    import spark.implicits._
    runBatches("hygiene_minhash", Seq("docs", "docs_minhash_sigs")) { i =>
      val b = Seq(
        (i * 10L + 1, s"unique topic $i alpha beta gamma delta epsilon", "en"),
        (i * 10L + 2, s"another document for batch $i zeta eta theta", "en"))
        .toDF("doc_id", "text", "lang")
      StreamingIngest.admitBatch(b, "hygiene_minhash", "docs", 0.8,
        tag = f"t_b$i%05d")
    }
  }

  test("containment admission releases its pair cache every micro-batch") {
    import spark.implicits._
    runBatches("hygiene_contain", Seq("docs", "docs_wordminhash_sigs")) { i =>
      val b = Seq(
        (i * 10L + 1, s"containment batch $i words one two three four five six", "en"),
        (i * 10L + 2, s"other text in batch $i seven eight nine ten eleven", "en"))
        .toDF("doc_id", "text", "lang")
      StreamingIngest.admitContainmentBatch(b, "hygiene_contain", "docs", 0.8,
        tag = f"t_b$i%05d")
    }
  }

  test("embedding admission releases its pair cache every micro-batch") {
    import spark.implicits._
    def vec(hot: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(hot % 64) = 1.0f; a
    }
    runBatches("hygiene_emb", Seq("vecs", "vecs_emb_buckets")) { i =>
      val b = Seq((i * 10L + 1, vec(2 * i)), (i * 10L + 2, vec(2 * i + 1)))
        .toDF("vec_id", "embedding")
      StreamingIngest.admitEmbeddingBatch(b, "hygiene_emb", "vecs", 0.9,
        bits = 16, tag = f"t_b$i%05d")
    }
  }

  test("curation admission releases its pair cache every micro-batch") {
    import spark.implicits._
    runBatches("hygiene_cur", Seq("docs", "docs_fps", "docs_minhash_sigs")) { i =>
      val b = Seq(
        (i * 10L + 1,
          s"long enough quality text for batch $i with many plain words " +
            "that pass the gate because they look like real sentences " * 2),
        (i * 10L + 2,
          s"a second acceptable document in batch $i that also reads " +
            "like genuine prose with ordinary words and punctuation " * 2))
        .toDF("doc_id", "text")
      StreamingIngest.admitCurationBatch(b, "hygiene_cur", "docs",
        minQuality = 0.2, threshold = 0.8, tag = f"t_b$i%05d")
    }
  }
}
