package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Span-level benchmark decontamination: crafted corpus/benchmark pairs
  * with known overlap geometry (the harness queries hash-check the full
  * pipelines against DuckDB; these pin the span semantics directly). */
class DecontamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")

  private def stats(corpus: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    Dedup.contaminatedSpanStats(corpus.toDF("doc_id", "text"), bench)
      .select(col("doc_id"), col("n_tokens"), col("n_spans"), col("contam_tokens"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("verbatim benchmark sentence inside a corpus doc is excised exactly") {
    // 5-gram windows over the 9 shared tokens merge into one 9-token span
    val corpus = Seq(
      (1L, "intro words here the quick brown fox jumps over the lazy dog and more trailing text"),
      (2L, "totally unrelated content with no overlap at all whatsoever"))
    assert(stats(corpus) == Map(
      1L -> ((16L, 1L, 9L)),
      2L -> ((9L, 0L, 0L))))
    val cleaned = Dedup.removeContaminatedSpans(corpus.toDF("doc_id", "text"), bench)
      .select(col("doc_id"), col("kept_tokens"), col("clean_md5"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1 keeps exactly the non-benchmark tokens, in order
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("intro words here and more trailing text".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(cleaned(1L) == ((7L, expectMd5)))
    // untouched doc keeps everything
    assert(cleaned(2L)._1 == 9L)
  }

  test("two separated hits produce two spans; overlapping windows merge") {
    val corpus = Seq(
      (3L, "the quick brown fox jumps over filler one two three four five " +
        "jumps over the lazy dog tail"))
    // hit 1: windows @1 ("the quick brown fox jumps") and @2 ("quick brown
    // fox jumps over") overlap -> one merged span over tokens 1-6;
    // hit 2: window @13 ("jumps over the lazy dog") -> tokens 13-17
    assert(stats(corpus) == Map(3L -> ((18L, 2L, 11L))))
  }

  test("sub-width overlap is not a hit") {
    // only 4 shared tokens — below the 5-gram width
    val corpus = Seq((4L, "the quick brown fox went somewhere else entirely today"))
    assert(stats(corpus) == Map(4L -> ((9L, 0L, 0L))))
  }

  test("fully-contaminated doc survives as the empty document") {
    val corpus = Seq((5L, "the quick brown fox jumps over the lazy dog"))
    val cleaned = Dedup.removeContaminatedSpans(corpus.toDF("doc_id", "text"), bench)
      .select(col("doc_id"), col("kept_tokens"), col("clean_md5"))
      .as[(Long, Long, String)].collect()
    assert(cleaned.toSeq == Seq((5L, 0L,
      "d41d8cd98f00b204e9800998ecf8427e"))) // md5("")
  }

  test("cross-snapshot containment: carried spans only, same-batch repetition invisible") {
    def cross(prev: Seq[(Long, String)], curr: Seq[(Long, String)]) =
      Dedup.crossSnapshotSpanStats(
          prev.toDF("doc_id", "text"), curr.toDF("doc_id", "text"), w = 3)
        .select(col("doc_id"), col("n_tokens"), col("n_spans"), col("carried_tokens"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val prev = Seq((1L, "alpha beta gamma delta epsilon"))
    // doc 10 carries prev's 3-gram content (tokens 3-7 cover two overlapping
    // prev 3-grams -> one merged 5-token span); doc 11 shares nothing
    val curr = Seq(
      (10L, "fresh words alpha beta gamma delta epsilon trailing"),
      (11L, "entirely new material with no earlier text"))
    assert(cross(prev, curr) == Map(
      10L -> ((8L, 1L, 5L)),
      11L -> ((7L, 0L, 0L))))
    // SAME-batch duplication is invisible: two current docs sharing a
    // 3-gram with each other but not with prev carry nothing
    val currDup = Seq(
      (20L, "one two three four shared run here"),
      (21L, "shared run here appears again today"))
    assert(cross(prev, currDup).values.forall(v => v._2 == 0L && v._3 == 0L))
    // empty previous snapshot: nothing can be carried, rows still emitted
    val empty = Seq.empty[(Long, String)]
    assert(cross(empty, curr) == Map(
      10L -> ((8L, 0L, 0L)),
      11L -> ((7L, 0L, 0L))))
  }
}
