package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines: exact hash dedup,
  * MinHash+LSH, SimHash, and exact shingle-Jaccard verification.
  *
  * Design for 100 TB:
  *  - Never compare all pairs. Candidates come from LSH band buckets
  *    (MinHash) or band-equal hash chunks (SimHash); exact Jaccard runs
  *    only on candidates. Cost is O(corpus) + O(collisions), not O(n²).
  *  - The hash is content-derived (md5 + seed suffix), not JVM-dependent,
  *    so results are reproducible across engines/runs — and expressible in
  *    the DuckDB oracle.
  *  - Everything is built-in expressions (codegen'd); the shuffles are the
  *    two groupBys (per-doc signatures) and the band self-join, all keyed
  *    well for AQE.
  */
object Dedup {
  /** Char n-gram shingle size; 8 is enough to make random collisions rare
    * even over a small vocabulary. */
  val ShingleSize = 8
  /** MinHash signature length and LSH banding (16 = 4 bands x 4 rows:
    * P(candidate | j=0.8) ≈ 1-(1-0.8^4)^4 ≈ 0.93, near zero for j<0.4). */
  val NumHashes = 16
  val NumBands = 4

  /** Deterministic 60-bit hash portable to the oracle:
    * first 15 hex chars of md5, seed appended to the input. */
  def hash60(c: Column, seed: Column): Column =
    conv(substring(md5(concat(c, lit("|"), seed.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Distinct (doc_id, shingle) pairs: sliding char n-grams via a
    * higher-order transform — no UDF, no explode of precomputed arrays. */
  def shingles(docs: DataFrame, textCol: String = "text", n: Int = ShingleSize): DataFrame =
    docs
      .where(length(col(textCol)) >= n)
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, length($textCol) - ${n - 1}), i -> substring($textCol, i, $n))"))
          .as("shingle"))
      .distinct()

  /** MinHash signatures: one row per (doc_id, seed) with the min hash. */
  def minHashSignatures(sh: DataFrame, k: Int = NumHashes): DataFrame =
    sh.withColumn("s", explode(expr(s"sequence(0, ${k - 1})")))
      .groupBy(col("doc_id"), col("s"))
      .agg(min(hash60(col("shingle"), col("s"))).as("m"))

  /** LSH band keys: signature rows grouped into `bands` contiguous bands;
    * the band key is the joined signature slice. */
  def bandKeys(sig: DataFrame, k: Int = NumHashes, bands: Int = NumBands): DataFrame = {
    val r = k / bands
    val slots = (0 until r).map(p =>
      max(when(pmod(col("s"), lit(r)) === p, col("m"))).cast("string"))
    sig.groupBy(col("doc_id"), (col("s") / lit(r)).cast("int").as("band"))
      .agg(concat_ws("-", slots: _*).as("band_key"))
  }

  /** Candidate pairs: docs sharing any LSH band bucket (a < b). */
  def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard for given candidate pairs over the shingle sets. */
  def jaccard(cand: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val s1 = sh.as("s1")
    val s2 = sh.as("s2")
    val inter = cand.as("c")
      .join(s1, col("c.doc_a") === col("s1.doc_id"))
      .join(s2, col("c.doc_b") === col("s2.doc_id") && col("s2.shingle") === col("s1.shingle"))
      .groupBy(col("c.doc_a"), col("c.doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("i") / (col("na.n") + col("nb.n") - col("i")), 6).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate
    * → exact-verify, keeping pairs with Jaccard >= threshold. */
  def minHashLshPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val sh = shingles(docs)
    val cand = candidatePairs(bandKeys(minHashSignatures(sh)))
    jaccard(cand, sh)
      .where(col("jaccard") >= lit(threshold))
      .orderBy("doc_a", "doc_b")
  }

  /** 48-bit SimHash per doc over distinct lowercase tokens. 48 bits keeps
    * the value positive in a BIGINT on both engines. */
  def simHash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = docs
      .select(col("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .distinct()
      .withColumn("h", conv(substring(md5(col("w")), 1, 12), 16, 10).cast("long"))
    val votes = words
      .withColumn("b", explode(expr("sequence(0, 47)")))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(when(expr("shiftright(h, b) & 1") === 1L, 1).otherwise(-1)).as("v"))
    votes.groupBy(col("doc_id"))
      .agg(sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L))
        .as("simhash"))
  }

  /** SimHash near-dup pairs: candidates share one of 4 12-bit bands, then
    * Hamming distance (bit_count of xor) <= maxHamming. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simHash(docs)
    val banded = sh.withColumn("band", explode(expr("sequence(0, 3)")))
      .withColumn("band_val", expr("shiftright(simhash, band * 12) & 4095"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("h_a"), col("b.simhash").as("h_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .where(col("hamming") <= lit(maxHamming))
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
      .orderBy("doc_a", "doc_b")
  }
}
