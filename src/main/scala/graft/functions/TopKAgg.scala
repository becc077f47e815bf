package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One input row for the top-k aggregate: an ordering value and a unique
  * tiebreaker that doubles as the payload key. */
final case class TopKIn(ord: Double, tie: Long)

/** Bounded aggregation buffer: the current top rows, kept sorted by
  * (ord DESC, tie ASC), never more than k entries. Parallel primitive
  * sequences so the buffer encodes as two packed arrays. */
final case class TopKBuf(ords: Seq[Double], ties: Seq[Long])

/** Partial top-k per group as a typed [[Aggregator]] — the scale path the
  * sort-based window form (`row_number() <= k`) can't take: a window must
  * shuffle and sort EVERY row of every group, while this aggregate keeps a
  * bounded k-row buffer per group on the map side, so the shuffle carries
  * at most k rows per group per input partition. At 100 TB with millions
  * of rows per hot group, that is the difference between a sort of the
  * fact table and a merge of k-row buffers.
  *
  * The result is deterministic regardless of partitioning: top-k under the
  * total order (ord DESC, tie ASC) is selection, and merge is associative
  * and commutative. Register with `functions.udaf(new TopKAgg(k))`.
  */
final class TopKAgg(k: Int) extends Aggregator[TopKIn, TopKBuf, TopKBuf] {
  require(k > 0, s"k must be positive: $k")

  override def zero: TopKBuf = TopKBuf(Vector.empty, Vector.empty)

  /** true iff (o1, t1) orders strictly before (o2, t2). */
  private def before(o1: Double, t1: Long, o2: Double, t2: Long): Boolean =
    o1 > o2 || (o1 == o2 && t1 < t2)

  override def reduce(b: TopKBuf, in: TopKIn): TopKBuf = {
    val n = b.ords.length
    if (n == k && !before(in.ord, in.tie, b.ords(n - 1), b.ties(n - 1))) b
    else {
      // insertion into a <=k-element sorted buffer: k is small by design
      var i = 0
      while (i < n && before(b.ords(i), b.ties(i), in.ord, in.tie)) i += 1
      TopKBuf(
        (b.ords.take(i) :+ in.ord) ++ b.ords.drop(i).take(k - i - 1),
        (b.ties.take(i) :+ in.tie) ++ b.ties.drop(i).take(k - i - 1))
    }
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    // two sorted buffers -> merged top-k (classic two-pointer merge)
    val ords = Array.newBuilder[Double]; val ties = Array.newBuilder[Long]
    var i = 0; var j = 0; var out = 0
    while (out < k && (i < a.ords.length || j < b.ords.length)) {
      val takeA = j >= b.ords.length || (i < a.ords.length &&
        before(a.ords(i), a.ties(i), b.ords(j), b.ties(j)))
      if (takeA) { ords += a.ords(i); ties += a.ties(i); i += 1 }
      else { ords += b.ords(j); ties += b.ties(j); j += 1 }
      out += 1
    }
    TopKBuf(ords.result().toIndexedSeq, ties.result().toIndexedSeq)
  }

  override def finish(r: TopKBuf): TopKBuf = r
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
