package graft.tools

/** Shared scaffolding for the media fingerprint probes (PhashProbe /
  * AudioProbe / VideoProbe): pair enumeration split by planted family and
  * the distribution report. One copy instead of one per modality — the
  * probes differ only in their codec roundtrip asserts. */
object ProbeReport {
  def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Hamming distances of all (a < b) id pairs, split into same-family
    * (a % groups == b % groups) vs cross-family. */
  def familyPairs(
      fps: Map[Long, Long], n: Long, groups: Int): (Seq[Int], Seq[Int]) = {
    val within = for {
      a <- 0L until n; b <- a + 1 until n
      if a % groups == b % groups
    } yield ham(fps(a), fps(b))
    val across = for {
      a <- 0L until n; b <- a + 1 until n
      if a % groups != b % groups
    } yield ham(fps(a), fps(b))
    (within, across)
  }

  /** Distribution line: min/p10/med/p90/max + low-hamming counts. Safe on
    * an empty input (tiny n can leave one side with no pairs). */
  def hist(xs: Seq[Int], name: String): Unit = {
    if (xs.isEmpty) { println(s"$name n=0 (no pairs)"); return }
    val s = xs.sorted
    println(s"$name n=${xs.size} min=${s.head} p10=${s(xs.size / 10)} " +
      s"med=${s(xs.size / 2)} p90=${s(xs.size * 9 / 10)} max=${s.last}")
    println("  counts<=12: " +
      (0 to 12).map(k => s"$k:${xs.count(_ == k)}").mkString(" "))
  }

  /** Run the family-split distribution report. */
  def report(fps: Map[Long, Long], n: Long, groups: Int): Unit = {
    val (within, across) = familyPairs(fps, n, groups)
    hist(within, "within-group")
    hist(across, "across-group")
  }
}
