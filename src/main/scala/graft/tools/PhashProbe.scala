package graft.tools

import graft.mm.ImagePhash._

/** Manual probe: hamming-distance distribution of the planted PNG corpus
  * (same-family renditions vs cross-family), through the REAL
  * encode→decode→DCT-pHash path. Used to pick the registry queries'
  * maxHamming budget; run with `sbt "runMain graft.tools.PhashProbe"`. */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500
    val hashes = (0L until n.toLong)
      .map(id => id -> phash(decodeGray(encodePng(pixelGrid(id))))).toMap
    (0L until math.min(20L, n.toLong)).foreach { id =>
      assert(decodeGray(encodePng(pixelGrid(id))).sameElements(pixelGrid(id)),
        s"PNG roundtrip not lossless for id $id")
      assert(phash(pixelGrid(id)) == hashes(id))
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val within = for {
      a <- 0L until n.toLong; b <- a + 1 until n.toLong
      if a % Groups == b % Groups
    } yield ham(hashes(a), hashes(b))
    val across = for {
      a <- 0L until n.toLong; b <- a + 1 until n.toLong
      if a % Groups != b % Groups
    } yield ham(hashes(a), hashes(b))
    def hist(xs: Seq[Int], name: String): Unit = {
      val s = xs.sorted
      println(s"$name n=${xs.size} min=${s.head} p10=${s(xs.size / 10)} " +
        s"med=${s(xs.size / 2)} p90=${s(xs.size * 9 / 10)} max=${s.last}")
      println("  counts<=12: " + (0 to 12).map(k => s"$k:${xs.count(_ == k)}").mkString(" "))
    }
    hist(within, "within-group")
    hist(across, "across-group")
  }
}
