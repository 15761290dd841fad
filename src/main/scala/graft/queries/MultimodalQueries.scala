package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.Multimodal

/** Multimodal-column queries over the `documents`-derived media table
  * ([[Multimodal.fromDocuments]]: text bytes as the opaque payload, typed
  * metadata derived deterministically). The fixture text is pure ASCII
  * (verified), so byte-level operations on the BLOB equal char-level
  * operations on the text — which is what lets DuckDB (whose md5/substr
  * are VARCHAR-only) oracle binary-column pipelines exactly.
  */
object MultimodalQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Typed metadata extraction over the opaque binary column.
    "media_metadata" -> ((s, dir) => {
      Multimodal.fromDocuments(Tables(s, dir, "documents"))
        .select(
          col("media_id"), col("mime"),
          length(col("bytes")).cast("long").as("n_bytes"),
          md5(col("bytes")).as("digest"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))
    }),

    // 1 video → N frames generator; per-frame digest of the byte slice.
    "media_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
          Multimodal.fromDocuments(Tables(s, dir, "documents")))
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          md5(col("frame_bytes")).as("frame_digest"))
    }),

    // Exact content dedup on the opaque binary column — the first pass a
    // multimodal corpus runs (identical bytes = identical asset, no
    // decode needed). One shuffle on the 128-bit digest, never on the
    // payload: at 100 TB the exchange carries (digest, id), not bytes.
    "media_dedup_exact" -> ((s, dir) => {
      Multimodal.fromDocuments(Tables(s, dir, "documents"))
        .select(col("media_id"), md5(col("bytes")).as("digest"))
        .groupBy("digest")
        .agg(min(col("media_id")).as("survivor"),
          count(lit(1)).as("n_copies"))
    }),

    // Column-expression form of the stub feature extractor (the oracle
    // anchor; the mapPartitions form is asserted equal in MultimodalSuite).
    "media_features" -> ((s, dir) => {
      val hex = md5(col("bytes"))
      val feat = (0 until Multimodal.StubCodec.FeatureDim).map { i =>
        (conv(substring(hex, 2 * i + 1, 2), 16, 10).cast("double") / 255d)
          .as(s"f$i")
      }
      Multimodal.fromDocuments(Tables(s, dir, "documents"))
        .select((Seq(col("media_id"),
          length(col("bytes")).cast("long").as("n_bytes")) ++ feat): _*)
    })
  )

  def oracles: Map[String, String] = Map(
    "media_dedup_exact" ->
      """SELECT md5(text) AS digest, MIN(doc_id) AS survivor,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "media_metadata" ->
      """SELECT doc_id AS media_id,
        |  (['image/png', 'audio/wav', 'video/mp4'])[doc_id % 3 + 1] AS mime,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS digest,
        |  n_chars % 640 + 1 AS width,
        |  n_chars % 480 + 1 AS height,
        |  n_chars % 7 + 1 AS n_frames
        |FROM documents""".stripMargin,

    "media_frame_sample" ->
      """WITH vids AS (
        |  SELECT doc_id AS media_id, text, n_chars % 7 + 1 AS n_frames
        |  FROM documents
        |  WHERE (['image/png', 'audio/wav', 'video/mp4'])[doc_id % 3 + 1]
        |        LIKE 'video/%')
        |SELECT media_id, f.frame_idx,
        |  md5(substr(text, CAST(f.frame_idx * 64 + 1 AS INT), 64)) AS frame_digest
        |FROM vids, LATERAL (
        |  SELECT unnest(range(0, n_frames)) AS frame_idx) f""".stripMargin,

    "media_features" ->
      s"""SELECT doc_id AS media_id,
         |  octet_length(encode(text)) AS n_bytes,
         |  ${(0 until Multimodal.StubCodec.FeatureDim).map(i =>
             s"CAST('0x' || substr(md5(text), ${2 * i + 1}, 2) AS BIGINT) / 255.0 AS f$i")
             .mkString(",\n  ")}
         |FROM documents""".stripMargin
  )
}
