package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the standard way to cut a 100 TB shuffle
  * join down to the rows that can possibly match: build a compact bit-set
  * over the (filtered) dimension side's join keys, pre-filter the fact
  * side AT THE SCAN with it, and only shuffle the survivors. Broadcast
  * joins make this redundant (their hash table already filters map-side);
  * the Bloom filter is for the regime where the dimension side is too big
  * to broadcast as rows but its keyset fits in a few megabytes of bits —
  * e.g. 10M filtered orders = 12 MB at 10 bits/key, vs a multi-GB row
  * broadcast. Spark's own runtime row-filter rule plans the same shape
  * when statistics allow; this operator is the explicit, deterministic
  * form the engine can apply unconditionally.
  *
  * The filter is BUILT distributed (per-row seeded-xxhash64 bit positions,
  * OR-aggregated into 64-bit words — a tiny fixed-size aggregate) and only
  * the finished word table is collected and re-broadcast as a literal, so
  * probing fuses into whole-stage codegen on the fact scan: k hash-mask
  * tests per row, no join, no UDF.
  *
  * Bloom filters have no false negatives, so the pruned join's RESULT is
  * identical to the unpruned join — which is what lets the DuckDB oracle
  * for [[graft.queries]] `join_bloom_pruned` be the plain join SQL.
  */
object BloomJoin {
  /** Default bits-per-key ≈ 10 → ~1% false-positive rate at k=3. */
  def sizeFor(nKeys: Long): Int = {
    val bits = math.max(nKeys * 10L, 64L)
    // next power of two, capped at 2^26 bits = 8 MB of words
    math.min(java.lang.Long.highestOneBit(bits - 1) << 1, 1L << 26).toInt
  }

  private def bitPos(key: Column, seed: Int, numBits: Int): Column =
    pmod(xxhash64(key, lit(seed)), lit(numBits.toLong))

  /** Distributed build: k seeded positions per key, one tiny groupBy over
    * word index OR-ing the masks, word table to the driver (numBits/64
    * longs — the only driver-side data, by construction small). */
  def buildBits(
      keys: DataFrame, keyCol: String, numBits: Int, numHashes: Int = 3): Array[Long] = {
    require(numBits % 64 == 0 && numBits > 0, s"numBits must be a positive multiple of 64")
    val positions = keys.select(explode(array((0 until numHashes).map(i =>
      bitPos(col(keyCol), i, numBits)): _*)).as("pos"))
    val words = positions
      .groupBy((col("pos") / 64).cast("long").as("w"))
      .agg(expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").as("bits"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Codegen'd membership probe against the literal word table: k
    * hash-mask tests AND'ed. No false negatives. */
  def mightContain(key: Column, words: Array[Long], numHashes: Int = 3): Column = {
    val numBits = words.length * 64
    val tbl = lit(words)
    (0 until numHashes).map { i =>
      val pos = bitPos(key, i, numBits)
      element_at(tbl, (pos / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0
    }.reduce(_ && _)
  }

  /** Fact-side scan filter for an equi-join against `dim`: builds the
    * filter from the dimension keys and returns the pruned fact. The
    * caller then joins as usual — results are identical to the unpruned
    * join, only the shuffled volume changes. */
  def pruneFact(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, numHashes: Int = 3): DataFrame = {
    val n = dim.select(dimKey).count()
    val bits = buildBits(dim.select(dimKey), dimKey, sizeFor(n), numHashes)
    fact.where(mightContain(col(factKey), bits, numHashes))
  }
}
