package graft.queries

import org.apache.spark.sql.functions._

import graft.mm.Multimodal
import graft.sim.Ann

/** Rows-only / mixed queries: LSH-ANN (no SQL oracle — random-projection
  * index), multimodal binary plumbing, sketch aggregates, and the native
  * rolling-hash fingerprint. Oracle provided where DuckDB can express the
  * same computation. */
object MiscQueries {
  import QueryDef._

  val defs: Map[String, QueryDef] = Map(

    // ANN via sign-random-projection LSH + multiprobe: the scale path for
    // sim_knn_join. Rows-only here; AnnSpec checks recall vs brute force.
    "sim_ann_lsh" -> QueryDef(
      fn = (s, d) => {
        val emb = t(s, d, "embeddings")
        Ann.topKApprox(emb, emb.where(col("vec_id") < 20), k = 3)
      },
      oracle = None,
      bench = true),

    // ANN via IVF (k-means coarse quantizer + nprobe): the second scale
    // path. Rows-only (iterative training has no SQL analog); IvfSpec
    // checks exactness of scores and recall vs brute force.
    "sim_ann_ivf" -> QueryDef(
      fn = (s, d) => {
        val emb = t(s, d, "embeddings")
        graft.sim.Ivf.topKApprox(emb, emb.where(col("vec_id") < 20), k = 3)
      },
      oracle = None,
      bench = true),

    // Multimodal metadata pass: binary payload size + content hash; the
    // bytes themselves never leave the scan for this query shape.
    "mm_bytes" -> QueryDef(
      fn = (s, d) =>
        Multimodal.mediaTable(t(s, d, "documents"))
          .select(col("media_id"), col("format"), col("n_bytes"),
            md5(col("media").cast("string")).as("content_hash"))
          .orderBy("media_id"),
      oracle = Some("""
        SELECT doc_id AS media_id, 'fake/' || lang AS format,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS content_hash
        FROM documents ORDER BY media_id""")),

    // Frame sampling over binary payloads. Oracle mirrors the slice
    // arithmetic: the frame byte-length is substring clamping written out
    // (DuckDB can't substring a BLOB), trunc() because DuckDB rounds on
    // CAST(double AS BIGINT) where Spark truncates.
    "mm_frame_sample" -> QueryDef(
      fn = (s, d) =>
        Multimodal.sampleFrames(
          Multimodal.mediaTable(t(s, d, "documents")), n = 4, frameBytes = 16)
          .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
            col("offset"), octet_length(col("frame")).cast("long").as("frame_bytes"))
          .orderBy("media_id", "frame_no"),
      oracle = Some("""
        WITH media AS (
          SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
          FROM documents),
        frames AS (
          SELECT media_id, n_bytes, f.frame_no,
                 CAST(trunc(f.frame_no * greatest(n_bytes - 16, 1) / 3.0)
                      AS BIGINT) + 1 AS "offset"
          FROM media, (SELECT unnest(generate_series(0, 3)) AS frame_no) f)
        SELECT media_id, frame_no, "offset",
               greatest(0, least(16, n_bytes - "offset" + 1)) AS frame_bytes
        FROM frames ORDER BY media_id, frame_no""")),

    // Feature extraction through the mapPartitions decode stage. The stub
    // "decoder" is a 16-bin byte histogram normalized in float32; the bin
    // COUNTS are recovered exactly by round(f * n_bytes) (count <= 577,
    // so the float32 relative error can never reach 0.5), which makes the
    // whole decode path integer-exact and oracle-checkable: DuckDB
    // recomputes the histogram from unicode codepoints (ASCII corpus).
    "mm_features" -> QueryDef(
      fn = (s, d) => {
        val feats = Multimodal.extractFeatures(
          s, Multimodal.mediaTable(t(s, d, "documents"))).toDF()
        feats
          .select(col("media_id"),
            posexplode(expr("transform(features, f -> CAST(round(f * n_bytes) AS BIGINT))"))
              .as(Seq("bin", "cnt")))
          .select(col("media_id"), col("bin").cast("long").as("bin"), col("cnt"))
          .orderBy("media_id", "bin")
      },
      oracle = Some("""
        WITH chars AS (
          SELECT doc_id AS media_id,
                 unicode(substr(text, CAST(i AS INT), 1)) % 16 AS bin
          FROM documents, range(1, 2000) r(i)
          WHERE i <= length(text)),
        bins AS (SELECT unnest(generate_series(0, 15)) AS bin),
        ids AS (SELECT DISTINCT media_id FROM chars)
        SELECT ids.media_id AS media_id, bins.bin AS bin,
               coalesce(c.cnt, 0) AS cnt
        FROM ids CROSS JOIN bins
        LEFT JOIN (SELECT media_id, bin, count(*) AS cnt
                   FROM chars GROUP BY 1, 2) c
          ON c.media_id = ids.media_id AND c.bin = bins.bin
        ORDER BY ids.media_id, bins.bin""")),

    // HLL sketch distinct (no oracle: sketch internals differ per engine;
    // SketchSpec bounds the error against exact counts).
    "agg_approx_distinct" -> QueryDef(
      fn = (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      oracle = None),

    // Native codegen'd rolling-hash fingerprint (RollingHashMin expression):
    // O(len) winnowing fingerprint, the scale path for shingle hashing.
    "text_rolling_fp" -> QueryDef(
      fn = (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"), expr("rolling_hash_min(text, 8)").as("rfp"))
          .orderBy("doc_id"),
      oracle = None)
  )
}
