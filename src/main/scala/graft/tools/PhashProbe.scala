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
    ProbeReport.report(hashes, n.toLong, Groups)
  }
}
