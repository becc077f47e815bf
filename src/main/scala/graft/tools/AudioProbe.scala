package graft.tools

import graft.mm.AudioFingerprint._

/** Manual probe: hamming-distance distribution of the planted WAV corpus
  * (same-family renditions vs cross-family), through the REAL
  * encode→decode→fingerprint path. Used to pick the registry queries'
  * maxHamming budget; run with `sbt "runMain graft.tools.AudioProbe"`. */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500
    val fps = (0L until n.toLong)
      .map(id => id -> fingerprintWav(encodeWav(pcm(id)))).toMap
    (0L until math.min(20L, n.toLong)).foreach { id =>
      assert(decodePcm(encodeWav(pcm(id))).sameElements(pcm(id)),
        s"WAV roundtrip not lossless for id $id")
      assert(fingerprint(pcm(id)) == fps(id))
      assert(fps(id) >= 0L, s"fingerprint not a positive BIGINT for id $id")
    }
    val wav = encodeWav(pcm(0L))
    println(s"wav bytes=${wav.length} magic=${new String(wav.take(4))}/" +
      new String(wav.slice(8, 12)))
    ProbeReport.report(fps, n.toLong, Groups)
  }
}
