package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus the decode / feature-extract
  * / frame-sample plumbing a training-data pipeline needs.
  *
  * The Spark-side machinery here is REAL — schemas, the 1-row→N-rows frame
  * generator, and the partition-wise batch decode (iterator in, iterator
  * out, decoder state initialized once per partition — the shape that
  * amortizes loading a native decoder per executor core at 100 TB). The
  * byte-level DECODE itself is a clearly-marked deterministic STUB
  * ([[StubCodec]]): this container has no image/audio libraries, so the
  * stub hashes bytes instead of running libjpeg/ffmpeg. Swapping in a real
  * codec changes only [[StubCodec]] — no plan shape, schema, or
  * partitioning changes.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      mime: String,
      bytes: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      feature: Array[Float])

  /** ==== STUB ==== deterministic fake codec. A real deployment replaces
    * the bodies with libjpeg/ffmpeg/etc; signatures and call sites stay.
    */
  object StubCodec {
    val FeatureDim = 8

    /** Fake "decoded feature": FeatureDim floats derived from the md5 of
      * the payload — deterministic, portable, and cheap. Stands in for
      * model-based embedding of decoded pixels/samples.
      */
    def feature(bytes: Array[Byte]): Array[Float] = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      (0 until FeatureDim).map(i => (d(i) & 0xff).toFloat / 255f).toArray
    }

    /** Fake "resize": keeps the first `w*h` bytes (padding with zeros) —
      * stands in for a pixel-space resample, preserves determinism.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, w * h)
  }

  /** Fixture adapter: `documents` → a media table. Payload is the
    * document text's UTF-8 bytes (the opaque-binary stand-in); mime and
    * frame count derive deterministically from doc_id/n_chars so every
    * engine derives the same table.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        typedLit(Seq("image/png", "audio/wav", "video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("mime"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"),
      (col("n_chars") % 7 + 1).cast("int").as("n_frames"))

  /** Partition-wise batch decode: Dataset[MediaRecord] →
    * Dataset[MediaFeatures]. The decoder is initialized once per
    * PARTITION (not per row) — the pattern that makes per-executor native
    * codec state affordable; rows stream through as an iterator, so
    * memory is O(1) in partition size.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init goes here (native lib handle, model…)
      val dim = StubCodec.FeatureDim
      require(dim > 0)
      it.map { m =>
        MediaFeatures(m.media_id, m.mime, m.bytes.length.toLong,
          StubCodec.feature(m.bytes))
      }
    }
  }

  /** Frame sampling: one video row → n_frames frame rows (1→N generator,
    * Spark's `posexplode` over a `sequence` — no UDTF needed). Frame
    * payload is a deterministic byte slice (STUB for a real frame grab).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64): DataFrame =
    media
      .filter(col("mime").startsWith("video/"))
      .select(col("media_id"), col("n_frames"), col("bytes"),
        posexplode(sequence(lit(0), col("n_frames") - 1))
          .as(Seq("frame_idx", "_f")))
      .select(
        col("media_id"), col("frame_idx"),
        col("bytes").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
}
