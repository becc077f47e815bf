package graft.tools

import graft.mm.VideoFingerprint._

/** Manual probe: per-clip wall cost of the GIF encode and decode kernels
  * in isolation (single-threaded), to attribute the video queries' cost
  * between the codec and the Spark plan. Run with
  * `sbt "runMain graft.tools.VideoPerfProbe [n]"`. */
object VideoPerfProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    // warmup
    (0L until 200L).foreach(id => fingerprintGif(encodeGif(clip(id))))
    val clips = (0L until n.toLong).map(clip).toArray
    var t0 = System.nanoTime()
    val gifs = clips.map(encodeGif)
    val tEnc = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val grids = gifs.map(decodeFrames)
    val tDec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val fps = grids.map(fingerprint)
    val tFp = (System.nanoTime() - t0) / 1e9
    println(f"n=$n encode=${tEnc}%.2f s (${tEnc / n * 1e6}%.0f us/clip) " +
      f"decode=${tDec}%.2f s (${tDec / n * 1e6}%.0f us/clip) " +
      f"fingerprint=${tFp}%.3f s; checksum=${fps.sum}")
  }
}
