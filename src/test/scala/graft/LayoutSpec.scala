package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.sources.Tables

/** Z-order layout: the clustered write preserves the data exactly, and
  * its per-file min/max boxes prune a box predicate on the axis a
  * single-column sort cannot prune. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val numFiles = 8

  // events with hour normalized to 0 so the 16-bit Morton window holds
  // regardless of the fixture's absolute epoch range
  private lazy val ev = {
    val raw = Tables.load(spark, TestSpark.sf("sf0.001"), "events")
      .select(col("event_id"), col("user_id"),
        Tables.eventHour.as("hr_abs"))
    val h0 = raw.agg(min("hr_abs")).head.getLong(0)
    raw.select(col("event_id"), col("user_id"),
      (col("hr_abs") - h0).as("hr"))
  }

  private def fileBoxes(path: String) =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("hr").as("hlo"), max("hr").as("hhi"))
      .collect()

  test("z-ordered write round-trips the rows exactly") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    Layout.zorderWrite(ev, "user_id", "hr", s"$dir/z", numFiles)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == ev.count())
    assert(back.except(ev).count() == 0 && ev.except(back).count() == 0)
  }

  test("z-order prunes the time axis where a user-sorted layout cannot") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    Layout.zorderWrite(ev, "user_id", "hr", s"$dir/z", numFiles)
    // baseline: the same data clustered by user only
    ev.repartitionByRange(numFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(s"$dir/u")

    // a narrow hr box (1/8 of the span) — the axis user-sort ignores
    val r = ev.agg(min("hr"), max("hr")).head
    val (hlo, hhi) = (r.getLong(0), r.getLong(1))
    val qlo = hlo + (hhi - hlo) * 3 / 8
    val qhi = hlo + (hhi - hlo) * 4 / 8
    def touched(path: String): Int =
      fileBoxes(path).count(b =>
        b.getAs[Long]("hlo") <= qhi && b.getAs[Long]("hhi") >= qlo)

    val zTouched = touched(s"$dir/z")
    val uTouched = touched(s"$dir/u")
    // user-sorted files each span ~the whole hr range: no pruning at all
    assert(uTouched == numFiles,
      s"user-sorted layout unexpectedly prunes hr ($uTouched/$numFiles)")
    // the z-ordered layout must skip at least a third of the files
    assert(zTouched <= numFiles * 2 / 3,
      s"z-order gives no hr pruning: $zTouched of $numFiles files touch a 1/8 box")
  }

  test("3-dim z-order prunes the third axis a 2-dim layout ignores") {
    val ev3 = ev.withColumn("v", pmod(hash(col("event_id")), lit(1024L)))
    val dir = Files.createTempDirectory("graft_zorder3").toString
    Layout.zorderWriteN(ev3, Seq("user_id", "hr", "v"), s"$dir/z3", numFiles)
    // baseline: 2-dim z-order over (user_id, hr) — no v locality at all
    Layout.zorderWrite(ev3, "user_id", "hr", s"$dir/z2", numFiles)
    def touched(path: String): Int =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("v").as("vlo"), max("v").as("vhi"))
        .collect()
        .count(b => b.getAs[Long]("vlo") <= 192L && b.getAs[Long]("vhi") >= 64L)
    // a v box spanning 1/8 of the 1024 domain
    val t2 = touched(s"$dir/z2")
    val t3 = touched(s"$dir/z3")
    assert(t2 == numFiles,
      s"2-dim layout unexpectedly prunes v ($t2/$numFiles)")
    assert(t3 <= numFiles * 2 / 3,
      s"3-dim z-order gives no v pruning: $t3 of $numFiles files touch a 1/8 box")
    // round-trip intact
    val back = spark.read.parquet(s"$dir/z3")
    assert(back.except(ev3).count() == 0 && ev3.except(back).count() == 0)
  }

  test("hilbert write round-trips and prunes both axes of a box query") {
    GraftSession.tune(spark)
    val dir = Files.createTempDirectory("graft_hilbert").toString
    Layout.hilbertWrite(ev, "user_id", "hr", s"$dir/h", numFiles)
    val back = spark.read.parquet(s"$dir/h")
    assert(back.count() == ev.count())
    assert(back.except(ev).count() == 0 && ev.except(back).count() == 0)

    // baseline: user-only sort — no hr locality at all
    ev.repartitionByRange(numFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(s"$dir/u")
    val r = ev.agg(min("hr"), max("hr")).head
    val (hlo, hhi) = (r.getLong(0), r.getLong(1))
    val qlo = hlo + (hhi - hlo) * 3 / 8
    val qhi = hlo + (hhi - hlo) * 4 / 8
    def touched(path: String): Int =
      fileBoxes(path).count(b =>
        b.getAs[Long]("hlo") <= qhi && b.getAs[Long]("hhi") >= qlo)
    assert(touched(s"$dir/u") == numFiles,
      "user-sorted layout unexpectedly prunes hr")
    assert(touched(s"$dir/h") <= numFiles * 2 / 3,
      s"hilbert layout gives no hr pruning: ${touched(s"$dir/h")}/$numFiles")
  }

  test("shuffled write: balanced shards, a permutation, and decorrelated order") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf("sf0.001"), "documents")
      .select("doc_id", "lang")
    val dir = Files.createTempDirectory("graft_shuffle").toString
    Layout.shuffledWrite(docs, "doc_id", s"$dir/s", shards = 8)
    val back = spark.read.parquet(s"$dir/s")
    // every row exactly once, (shard, pos) a dense unique order
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    assert(back.select("shard", "pos").distinct().count() == docs.count())
    val sizes = back.groupBy("shard").count().select("count").as[Long].collect()
    assert(sizes.length == 8)
    assert(sizes.max <= sizes.min * 2, s"shard skew: ${sizes.toSeq.sorted}")
    // decorrelated: the first shard-0 positions must not replay doc_id order
    val firstIds = back.where($"shard" === 0).orderBy("pos").limit(20)
      .select("doc_id").as[Long].collect().toSeq
    assert(firstIds != firstIds.sorted, "shuffle order correlates with key order")
    // deterministic: a rewrite reproduces the identical permutation
    Layout.shuffledWrite(docs, "doc_id", s"$dir/s2", shards = 8)
    val again = spark.read.parquet(s"$dir/s2")
    assert(back.except(again).count() == 0 && again.except(back).count() == 0)
  }
}
