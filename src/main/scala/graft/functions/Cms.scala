package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Count-Min sketch hashing shared by the batch query
  * (`agg_cms_estimate`) and the streaming counter sink
  * ([[graft.streaming.StreamingIngest.toCmsSink]]): a d×w counter grid
  * keyed by md5-derived buckets (Cormode & Muthukrishnan, J. Algorithms
  * 2005). Counters are sums — commutative and mergeable — so partition
  * partials combine map-side and per-batch grids merge by addition; the
  * estimate min-over-rows is ≥ the true count always (one-sided error).
  * Everything is deterministic, which is what lets the DuckDB oracle
  * replay estimates bit-for-bit.
  */
object Cms {
  val Depth = 4
  val Width = 256

  /** Row-j bucket of a key: 48-bit md5 prefix of "j:key", mod the grid
    * width. The row index is baked into the hashed string, giving the d
    * pairwise-independent-enough hash functions the sketch needs. */
  def bucket(key: Column, j: Int): Column =
    conv(substring(md5(concat_ws(":", lit(j).cast("string"),
      key.cast("string"))), 1, 12), 16, 10).cast("long") % Width
}
