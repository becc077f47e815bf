package graft.tools

import graft.mm.VideoFingerprint._

/** Manual probe: hamming-distance distribution of the planted GIF corpus
  * (same-family renditions vs cross-family), through the REAL
  * encode→decode→fingerprint path, plus the losslessness check the oracle
  * scheme rests on. Run with `sbt "runMain graft.tools.VideoProbe"`. */
object VideoProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500
    val fps = (0L until n.toLong)
      .map(id => id -> fingerprintGif(encodeGif(clip(id)))).toMap
    (0L until math.min(20L, n.toLong)).foreach { id =>
      val c = clip(id)
      val back = decodeFrames(encodeGif(c))
      assert(back.length == Frames, s"frame count lost for id $id")
      assert(c.zip(back).forall { case (a, b) => a.sameElements(b) },
        s"GIF roundtrip not lossless for id $id")
      assert(fingerprint(c) == fps(id))
      assert(fps(id) >= 0L)
    }
    val gif = encodeGif(clip(0L))
    println(s"gif bytes=${gif.length} magic=${new String(gif.take(6))}")
    ProbeReport.report(fps, n.toLong, Groups)
  }
}
