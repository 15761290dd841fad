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
  * amortizes loading a native decoder per executor core at 100 TB). IMAGE
  * decode is real as of round 5 ([[ImageCodec]] on the JDK's
  * `javax.imageio` readers: BMP/PNG/GIF/JPEG) and AUDIO decode is real
  * as of round 6 ([[AudioCodec]] on `javax.sound.sampled`: WAV/PCM) —
  * both ship with the JRE, no native dependency. [[decodeFeatures]]
  * tries them in order and falls back to the deterministic [[StubCodec]]
  * only for payloads no installed reader accepts — now video PIXELS
  * only, for which this container has no codec: the video CONTAINER
  * layer (ISO-BMFF box parsing, track metadata, sample-table demux) is
  * real as of round 9, see [[VideoContainer]]. Swapping in libavcodec
  * changes only that pixel fallback — no plan shape, schema, or
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

  /** REAL image codec on the JDK's `javax.imageio` (BMP/PNG readers ship
    * with the JRE — no native dependency). This retires the decode stub
    * for images: [[decodeFeatures]] attempts a real decode first and
    * only falls back to [[StubCodec]] for payloads no installed reader
    * recognizes (audio/video — the JDK has no codec for those).
    *
    * `ImageIO` instances are NOT thread-safe to share, but the static
    * `read`/`write` entry points construct per-call reader state — safe
    * under Spark's task threads; the per-partition init seam in
    * [[decodeFeatures]] remains where a pooled native decoder would go.
    */
  object ImageCodec {

    // ImageIO's default stream cache is DISK-backed: with it on, every
    // per-row read/write creates and deletes a temp file under
    // java.io.tmpdir — filesystem I/O dwarfing the in-memory BMP work
    // and contending across task threads. Byte-array payloads want the
    // in-memory stream path. One-time JVM-wide switch, applied on
    // first use of this object (classload is thread-safe).
    javax.imageio.ImageIO.setUseCache(false)

    /** Exact integer pixel statistics of the gray (= red) channel. */
    case class PixelStats(
        width: Int, height: Int, sumGray: Long, minGray: Int, maxGray: Int)

    /** Deterministic synthetic image: gray gradient v(x,y) = (x+y+offset)
      * mod 256, BMP-encoded through the real `ImageIO` writer. The
      * pixel law is trivially mirrored in SQL (`(x + y + offset) % 256`
      * over a generate_series grid), which is what lets a real
      * encode→decode round-trip be ORACLE-CHECKED cross-engine.
      */
    def encodeGradientBmp(width: Int, height: Int, offset: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val v = ((x + y + offset) % 256).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }

    /** Real decode: `ImageIO.read` parses the container (BMP/PNG/GIF/
      * JPEG per the JDK's registry) and the stats walk the decoded
      * raster. None ⇔ no installed reader accepts the payload — the
      * deterministic "not an image" signal the fallback keys on.
      */
    def decodeStats(bytes: Array[Byte]): Option[PixelStats] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          var sum = 0L
          var mn = 255
          var mx = 0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val v = (img.getRGB(x, y) >> 16) & 0xff
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              x += 1
            }
            y += 1
          }
          Some(PixelStats(img.getWidth, img.getHeight, sum, mn, mx))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** 16-bin gray-channel histogram (bucket = v >> 4) from a real
      * decode — the pixel-distribution feature quality filters
      * threshold on (flat ⇒ noise, single-spike ⇒ blank/synthetic).
      * Same walk as [[decodeStats]]; None ⇔ not an image.
      */
    def histogram16(bytes: Array[Byte]): Option[Array[Long]] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val h = new Array[Long](16)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              h(((img.getRGB(x, y) >> 16) & 0xff) >> 4) += 1L
              x += 1
            }
            y += 1
          }
          Some(h)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Real decoded feature (FeatureDim floats, same arity as the stub):
      * dimensions, pixel count, and gray-channel stats — the stand-in
      * for a model embedding, but computed from ACTUAL decoded pixels.
      */
    def feature(bytes: Array[Byte]): Option[Array[Float]] =
      decodeStats(bytes).map { s =>
        val n = s.width.toLong * s.height
        Array(
          s.width.toFloat, s.height.toFloat, n.toFloat, s.sumGray.toFloat,
          (s.sumGray.toDouble / n).toFloat, s.minGray.toFloat,
          s.maxGray.toFloat, 1f)
      }
  }

  /** Real AUDIO decode on `javax.sound.sampled` (WAV/PCM ships with the
    * JRE — no native dependency), the audio analog of [[ImageCodec]]:
    * encode synthesizes a 16-bit mono PCM WAV whose samples follow a
    * pure-integer law (mirrorable in SQL), decode parses the RIFF
    * container through the REAL `AudioSystem` reader and walks the
    * frames. This narrows the stub seam to video only.
    */
  object AudioCodec {

    /** Exact integer sample statistics of a decoded 16-bit mono stream.
      * `sumSq` rides along for energy readouts (RMS): |s| ≤ 2^15, so
      * s² ≤ 2^30 and the sum stays inside int64 for any stream under
      * ~2^33 samples — far past any WAV this engine decodes.
      */
    case class AudioStats(
        nSamples: Long, sumAbs: Long, minS: Int, maxS: Int,
        zeroCross: Long, sumSq: Long)

    /** Deterministic synthetic audio: s(i) = ((i·37 + offset·11) mod
      * 4096) − 2048, 16-bit little-endian mono PCM at 8 kHz in a
      * standard 44-byte RIFF/WAVE header. Integer law ⇒ SQL mirror.
      */
    def encodePcmWav(nSamples: Int, offset: Long): Array[Byte] = {
      val dataLen = nSamples * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataLen)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
      buf.putShort(1); buf.putShort(1) // PCM, mono
      buf.putInt(8000); buf.putInt(8000 * 2); buf.putShort(2); buf.putShort(16)
      buf.put("data".getBytes("US-ASCII")); buf.putInt(dataLen)
      var i = 0
      while (i < nSamples) {
        buf.putShort((((i.toLong * 37 + offset * 11) % 4096) - 2048).toShort)
        i += 1
      }
      buf.array()
    }

    /** Real decode: `AudioSystem.getAudioInputStream` parses the
      * container and the stats walk the decoded 16-bit LE frames.
      * None ⇔ not audio any installed provider accepts — the fallback
      * signal, exactly like [[ImageCodec.decodeStats]].
      */
    def decodeStats(bytes: Array[Byte]): Option[AudioStats] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        // the stats walk assumes 16-bit signed little-endian PCM; the
        // JRE providers also accept 8-bit PCM, big-endian AIFF/AU,
        // μ-law, … — misreading those as 16-bit LE would emit
        // Some(garbage) tagged as real decoded audio, breaking the
        // None ⇔ not-decodable routing contract. Reject anything the
        // walk cannot represent faithfully.
        val fmt = ais.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else decode16leStats(ais.readAllBytes())
      } catch { case scala.util.control.NonFatal(_) => None }

    private def decode16leStats(data: Array[Byte]): Option[AudioStats] = {
        val bb = java.nio.ByteBuffer.wrap(data)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var n = 0L; var sumAbs = 0L; var sumSq = 0L
        var mn = Int.MaxValue; var mx = Int.MinValue
        var zc = 0L; var prev = 0; var first = true
        while (bb.remaining() >= 2) {
          val s = bb.getShort.toInt
          n += 1; sumAbs += math.abs(s); sumSq += s.toLong * s
          if (s < mn) mn = s
          if (s > mx) mx = s
          if (!first && ((prev < 0 && s >= 0) || (prev >= 0 && s < 0))) zc += 1
          prev = s; first = false
        }
        if (n == 0) None else Some(AudioStats(n, sumAbs, mn, mx, zc, sumSq))
    }

    /** Silence-run statistics of a decoded 16-bit mono stream:
      * (n_silent_samples, n_runs, max_run) where "silent" is
      * |s| < threshold — the trim/VAD-precursor readout audio
      * curation thresholds on. Same decode+reject discipline as
      * [[decodeStats]]; None ⇔ not 16-bit-LE PCM audio.
      */
    def silenceStats(
        bytes: Array[Byte], threshold: Int): Option[(Long, Long, Long)] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          val bb = java.nio.ByteBuffer.wrap(ais.readAllBytes())
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var n = 0L; var silent = 0L; var runs = 0L
          var maxRun = 0L; var cur = 0L
          while (bb.remaining() >= 2) {
            val s = bb.getShort.toInt
            n += 1
            if (math.abs(s) < threshold) {
              silent += 1; cur += 1
              if (cur == 1L) runs += 1
              if (cur > maxRun) maxRun = cur
            } else cur = 0L
          }
          if (n == 0) None else Some((silent, runs, maxRun))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Real decoded feature (FeatureDim floats, same arity as the stub
      * and [[ImageCodec.feature]]): sample count, amplitude stats, and
      * zero-crossing rate — the classic cheap audio descriptors,
      * computed from ACTUAL decoded frames. The trailing 2f tags the
      * modality (1f = image, 2f = audio) so downstream feature
      * consumers can tell decoded-real from stub without a schema
      * change.
      */
    def feature(bytes: Array[Byte]): Option[Array[Float]] =
      decodeStats(bytes).map { s =>
        Array(
          s.nSamples.toFloat, s.sumAbs.toFloat,
          (s.sumAbs.toDouble / s.nSamples).toFloat,
          s.minS.toFloat, s.maxS.toFloat, s.zeroCross.toFloat,
          (s.zeroCross.toDouble / s.nSamples).toFloat, 2f)
      }
  }

  /** ==== TEST DOUBLE ==== deterministic fake codec — the fallback for
    * payloads the JDK cannot decode (now video only: images decode via
    * [[ImageCodec]], WAV audio via [[AudioCodec]]) and the fixture
    * anchor for text-byte payloads. A real deployment replaces the
    * bodies with libavcodec/etc; signatures and call sites stay.
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
        // real decode first — ImageIO (BMP/PNG/GIF/JPEG) then
        // javax.sound.sampled (WAV/PCM); the stub only catches
        // payloads no installed reader accepts (video)
        val feat = ImageCodec.feature(m.bytes)
          .orElse(AudioCodec.feature(m.bytes))
          .getOrElse(StubCodec.feature(m.bytes))
        MediaFeatures(m.media_id, m.mime, m.bytes.length.toLong, feat)
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
