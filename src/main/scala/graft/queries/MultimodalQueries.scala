package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.{Multimodal, VideoContainer}

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

    // REAL MP4 container round-trip (round-9: the video DEMUX layer,
    // retiring half the "video is stubbed" gap — only pixel decode
    // remains codec-blocked): encode a valid ISO-BMFF file under the
    // integer law, then PARSE it back with the recursive box walker
    // (ftyp/mvhd/tkhd/stsd/stts/stsz/stco) and emit what the container
    // declares. Same contract as media_decode_wav/imageio: the real
    // parser's output is oracle-checked against the law's arithmetic.
    "media_video_meta" -> ((s, dir) => {
      import s.implicits._
      Multimodal.fromDocuments(Tables(s, dir, "documents"))
        .filter(col("mime") === "video/mp4")
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames"))
        .as[(Long, Int, Int, Int)]
        .mapPartitions { it =>
          it.map { case (id, w, h, nf) =>
            val bytes = VideoContainer.encodeMp4(id, nf, w, h)
            val m = VideoContainer.parse(bytes).getOrElse(
              throw new IllegalStateException(
                s"box walker rejected its own MP4 for media $id"))
            (id, m.brand, m.duration, m.width.toLong, m.height.toLong,
              m.codec, m.nSamples.toLong,
              m.sampleSizes.map(_.toLong).sum)
          }
        }
        .toDF("media_id", "brand", "duration_ms", "width", "height",
          "codec", "n_samples", "data_bytes")
    }),

    // REAL MP4 demux: resolve every sample's byte range from the
    // parsed stsz+stco tables, slice the ACTUAL container bytes, and
    // emit per-frame size + payload byte sum — proving the offsets
    // point at the true sample data, not just echoing the tables. This
    // is the Spark-side work of a video pipeline at 100 TB: demux
    // locates frames, a decoder fleet (env-blocked here) consumes the
    // ranges.
    "media_video_demux" -> ((s, dir) => {
      import s.implicits._
      Multimodal.fromDocuments(Tables(s, dir, "documents"))
        .filter(col("mime") === "video/mp4")
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames"))
        .as[(Long, Int, Int, Int)]
        .flatMap { case (id, w, h, nf) =>
          val bytes = VideoContainer.encodeMp4(id, nf, w, h)
          val m = VideoContainer.parse(bytes).getOrElse(
            throw new IllegalStateException(
              s"box walker rejected its own MP4 for media $id"))
          VideoContainer.demuxSamples(m).map { case (i, off, sz) =>
            var sum = 0L
            var j = 0
            while (j < sz) { sum += bytes(off.toInt + j) & 0xff; j += 1 }
            (id, i.toLong, sz.toLong, sum)
          }
        }
        .toDF("media_id", "frame_idx", "n_bytes", "sum_bytes")
    }),

    // The END-TO-END video pixel path, fully offline: BMP frames under
    // the gradient pixel law (v = (x+y+media+13·frame) % 256) packed
    // as REAL MP4 samples (the Motion-JPEG shape — every sample a
    // complete still image), then parse → demux → slice → ImageIO
    // decode → per-frame exact pixel stats. This closes the carried
    // "video decode" gap for the one codec family the JDK ships:
    // container real, frame extraction real, pixel decode real; only
    // inter-frame codecs (H.264 et al.) remain env-blocked, and at
    // 100 TB they'd consume the same demuxed ranges on a decoder
    // fleet. The law mirror bounds the oracle grid: doc_id % 15 media
    // subset, ≤23×15 px, 2–6 frames.
    "media_video_frames" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter(col("doc_id") % 15 === 2)
        .select(col("doc_id"),
          (col("n_chars") % 16 + 8).cast("int").as("w"),
          (col("n_chars") % 8 + 8).cast("int").as("h"),
          (col("n_chars") % 5 + 2).cast("int").as("nf"))
        .as[(Long, Int, Int, Int)]
        .flatMap { case (id, w, h, nf) =>
          val frames = (0 until nf).map(f =>
            Multimodal.ImageCodec.encodeGradientBmp(w, h, id + 13L * f))
          val bytes = VideoContainer.encodeSamples(frames, w, h)
          val m = VideoContainer.parse(bytes).getOrElse(
            throw new IllegalStateException(
              s"box walker rejected its own BMP-MP4 for media $id"))
          VideoContainer.demuxSamples(m).map { case (i, off, sz) =>
            val st = Multimodal.ImageCodec.decodeStats(
              java.util.Arrays.copyOfRange(
                bytes, off.toInt, off.toInt + sz))
              .getOrElse(throw new IllegalStateException(
                s"ImageIO rejected demuxed BMP frame $i of media $id"))
            (id, i.toLong, st.width.toLong, st.height.toLong,
              st.sumGray, st.minGray.toLong, st.maxGray.toLong)
          }
        }
        .toDF("media_id", "frame_idx", "width", "height",
          "sum_gray", "min_gray", "max_gray")
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
    }),

    // REAL image decode (round-5): deterministic gray-gradient BMPs are
    // encoded through the JDK's ImageIO writer and decoded back through
    // its reader ([[Multimodal.ImageCodec]]) inside one mapPartitions
    // pass; the emitted pixel stats come from the ACTUAL decoded raster.
    // Oracle-checkable because the pixel law v(x,y)=(x+y+doc_id)%256 is
    // mirrored as SQL over a generate_series grid — so a codec bug on
    // either end of the round-trip breaks the hash. Scale shape: pure
    // scan-side projection (encode+decode fuse into the partition pass,
    // no shuffle, no payload exchange).
    "media_decode_imageio" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, nc) =>
            val w = (8 + nc % 32).toInt
            val h = (8 + nc % 16).toInt
            val bytes = Multimodal.ImageCodec.encodeGradientBmp(w, h, id)
            val st = Multimodal.ImageCodec.decodeStats(bytes).getOrElse(
              throw new IllegalStateException(
                s"ImageIO failed to decode its own BMP for doc $id"))
            (id, st.width.toLong, st.height.toLong, st.sumGray,
              st.minGray.toLong, st.maxGray.toLong)
          }
        }
        .toDF("media_id", "width", "height", "sum_gray", "min_gray",
          "max_gray")
        .withColumn("mean_gray", col("sum_gray").cast("double") /
          (col("width") * col("height")).cast("double"))
    }),

    // Per-image 16-bin gray histogram (round-11): the pixel-
    // distribution feature quality filters threshold on (flat ⇒
    // noise, single-spike ⇒ blank/synthetic) — same REAL
    // encode→ImageIO-decode round-trip as media_decode_imageio, with
    // the decoded raster bucketed v >> 4 and exploded to
    // (media_id, bucket, cnt) rows; empty buckets are genuinely
    // absent (no zero-fill on either engine). The mirror replays the
    // (x + y + doc_id) % 256 pixel law over the same grid. Scale:
    // per-payload map, no shuffle until the 16-row-per-image explode.
    "media_pixel_hist" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .mapPartitions { it =>
          it.flatMap { case (id, nc) =>
            val w = (8 + nc % 32).toInt
            val h = (8 + nc % 16).toInt
            val bytes = Multimodal.ImageCodec.encodeGradientBmp(w, h, id)
            val hist = Multimodal.ImageCodec.histogram16(bytes).getOrElse(
              throw new IllegalStateException(
                s"ImageIO failed to decode its own BMP for doc $id"))
            hist.iterator.zipWithIndex.collect {
              case (cnt, b) if cnt > 0L => (id, b.toLong, cnt)
            }
          }
        }
        .toDF("media_id", "bucket", "cnt")
    }),

    // Silence-run profile (round-11): |s| < 64 runs over the decoded
    // stream — n_silent samples, run count, longest run — the
    // trim/VAD-precursor readout audio curation thresholds on
    // (leading/trailing silence, dead segments). Same REAL
    // encode→javax.sound decode as the RMS/ZCR rows, one extra
    // single-pass walk ([[graft.ops.Multimodal.AudioCodec
    // .silenceStats]]); payloads with no silent sample are genuinely
    // absent on both engines. The mirror replays the sample law and
    // finds runs with the ts_streaks island trick (i − row_number
    // per doc over silent samples).
    "media_audio_silence" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .mapPartitions { it =>
          it.flatMap { case (id, nc) =>
            val n = (64 + nc % 128).toInt
            val bytes = Multimodal.AudioCodec.encodePcmWav(n, id)
            val (silent, runs, maxRun) =
              Multimodal.AudioCodec.silenceStats(bytes, 64).getOrElse(
                throw new IllegalStateException(
                  s"AudioSystem failed to decode its own WAV for doc $id"))
            if (runs > 0L) Iterator.single((id, silent, runs, maxRun))
            else Iterator.empty
          }
        }
        .toDF("media_id", "n_silent", "n_runs", "max_run")
    }),

    // Real WAV round-trip (the audio analog of media_decode_imageio):
    // synthesize 16-bit mono PCM audio under a pure-integer sample law,
    // encode through a standard RIFF/WAVE container, decode through the
    // REAL javax.sound.sampled reader, and report exact frame
    // statistics incl. zero crossings — against a DuckDB mirror of the
    // sample law. Any header/endianness/frame-walk bug on either end
    // breaks the hash. Scan-side only; the stub seam is now video-only.
    "media_decode_wav" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, nc) =>
            val n = (64 + nc % 128).toInt
            val bytes = Multimodal.AudioCodec.encodePcmWav(n, id)
            val st = Multimodal.AudioCodec.decodeStats(bytes).getOrElse(
              throw new IllegalStateException(
                s"AudioSystem failed to decode its own WAV for doc $id"))
            (id, st.nSamples, st.sumAbs, st.minS, st.maxS, st.zeroCross)
          }
        }
        .toDF("media_id", "n_samples", "sum_abs", "min_s", "max_s",
          "zero_cross")
    }),

    // RMS energy per decoded WAV — the loudness/energy descriptor an
    // audio-curation pipeline thresholds on (silence/clipping
    // filters). Same real javax.sound round-trip as media_decode_wav;
    // Σs² is exact int64 (|s| ≤ 2^15 ⇒ s² ≤ 2^30), and rms =
    // sqrt(Σs²/n) is two IEEE ops on identical exact-integer operands,
    // deterministic cross-engine (both engines' sqrt is the IEEE-754
    // correctly-rounded one).
    "media_audio_rms" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, nc) =>
            val n = (64 + nc % 128).toInt
            val bytes = Multimodal.AudioCodec.encodePcmWav(n, id)
            val st = Multimodal.AudioCodec.decodeStats(bytes).getOrElse(
              throw new IllegalStateException(
                s"AudioSystem failed to decode its own WAV for doc $id"))
            (id, st.nSamples, st.sumSq)
          }
        }
        .toDF("media_id", "n_samples", "sum_sq")
        .withColumn("rms", sqrt(col("sum_sq").cast("double") /
          col("n_samples").cast("double")))
    }),

    // Zero-crossing rate + peak amplitude (round-11): the remaining
    // two classic cheap audio descriptors next to media_audio_rms's
    // energy — ZCR is the standard noisiness/voicing proxy a corpus
    // filter thresholds on, peak the clipping check. Same REAL
    // round-trip as the RMS row: encode the deterministic PCM law
    // through a real RIFF/WAVE writer, decode through
    // javax.sound.sampled, and walk actual frames —
    // [[graft.ops.Multimodal.AudioCodec.AudioStats]] already carries
    // zeroCross/minS/maxS from the same single pass (no second
    // decode). The mirror replays the integer sample law with a lag
    // window: a crossing is a sign-CLASS change ((prev<0) ≠ (v<0)),
    // exactly the decoder's branch. Scale: embarrassingly parallel
    // per-payload map, no shuffle until the final projection.
    "media_audio_zcr" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, nc) =>
            val n = (64 + nc % 128).toInt
            val bytes = Multimodal.AudioCodec.encodePcmWav(n, id)
            val st = Multimodal.AudioCodec.decodeStats(bytes).getOrElse(
              throw new IllegalStateException(
                s"AudioSystem failed to decode its own WAV for doc $id"))
            (id, st.nSamples, st.zeroCross,
              math.max(math.abs(st.minS.toLong), math.abs(st.maxS.toLong)),
              st.sumAbs)
          }
        }
        .toDF("media_id", "n_samples", "zero_cross", "peak_abs", "sum_abs")
        .withColumn("zcr", col("zero_cross").cast("double") /
          col("n_samples").cast("double"))
    }),

    // Perceptual-hash near-dup — the pHash pipeline shape (decode →
    // feature panel → sign-of-deviation bits → banded hamming join),
    // with the decode behind the same stub seam as media_features:
    // the stub's 16-byte digest stream plays the 16-tap DCT panel a
    // real pHash reduces to (the 8-dim feature vector is its prefix).
    // Bit i of the 16-bit hash is "tap i above the panel mean",
    // evaluated as the EXACT integer comparison 16·kᵢ > Σk (no double
    // mean, no rounding boundary). Candidates must share one of four
    // 4-bit bands — by pigeonhole that catches every pair within
    // hamming ≤ 3 — and the verify filter is one bit_count(xor). The
    // payload never joins: bands and hashes travel as ints.
    "media_phash_neardup" -> ((s, dir) => {
      val hex = md5(col("bytes"))
      val ks = (0 until PhashDim).map { i =>
        conv(substring(hex, 2 * i + 1, 2), 16, 10).cast("long").as(s"k$i")
      }
      val hashed = Multimodal.fromDocuments(Tables(s, dir, "documents"))
        .select((col("media_id") +: ks): _*)
        .withColumn("ksum", expr(PhashSumSql))
        .withColumn("phash", expr(PhashBitsSql))
        .select("media_id", "phash")
      // both sides of the band self-join consume this frame — unpinned,
      // the md5 digest + 16-tap panel + bit-pack pipeline ran once per
      // side (round-16; the dedup_incremental parity-split lesson).
      // ~4 int rows per doc, so the checkpoint is tiny.
      val bands = hashed.select(col("media_id"), col("phash"),
        posexplode(array((0 until 4).map(j =>
          expr(s"(phash DIV ${1 << (4 * j)}) % 16")): _*)))
        .toDF("media_id", "phash", "band", "bv")
        .localCheckpoint()
      val cand = bands
        .join(bands.toDF("media_b", "phash_b", "band", "bv"),
          Seq("band", "bv"))
        .filter(col("media_id") < col("media_b"))
        .select(col("media_id").as("media_a"), col("phash"),
          col("media_b"), col("phash_b"))
        .distinct()
      cand.withColumn("hamming",
          expr("CAST(bit_count(phash ^ phash_b) AS BIGINT)"))
        .filter(col("hamming") <= 3)
        .select("media_a", "media_b", "hamming")
    })
  )

  /** pHash panel width: all 16 digest bytes (the stub's stand-in for
    * a 16-tap DCT panel; [[Multimodal.StubCodec.FeatureDim]] = 8 is
    * its prefix).
    */
  private val PhashDim = 16

  /** Σk over the 16 panel taps (shared token stream). */
  private val PhashSumSql =
    (0 until PhashDim).map(i => s"k$i").mkString(" + ")

  /** Sign-of-deviation bits packed little-endian: bit i set iff
    * PhashDim·kᵢ > Σk — the all-integer form of "tap above mean".
    */
  private val PhashBitsSql =
    (0 until PhashDim).map { i =>
      s"CASE WHEN $PhashDim * k$i > ksum THEN ${1 << i} ELSE 0 END"
    }.mkString(" + ")

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

    // the container-law mirror of the real MP4 box-walker round-trip:
    // what the parser extracts from mvhd/tkhd/stsd/stts/stsz must equal
    // the law's arithmetic (40 ms frames, the stsz size law summed)
    "media_video_meta" ->
      """SELECT doc_id AS media_id, 'isom' AS brand,
        |  40 * (n_chars % 7 + 1) AS duration_ms,
        |  n_chars % 640 + 1 AS width,
        |  n_chars % 480 + 1 AS height,
        |  'mp4v' AS codec,
        |  n_chars % 7 + 1 AS n_samples,
        |  CAST(list_sum([(doc_id * 31 + i * 7) % 64 + 8
        |                 for i in range(0, n_chars % 7 + 1)]) AS BIGINT)
        |    AS data_bytes
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,

    // the sample-law mirror of the real demux: per-frame payload sums
    // recomputed from the SLICED container bytes must match the byte
    // law — the proof the stco/stsz offsets landed on the real data
    "media_video_demux" ->
      """WITH v AS (
        |  SELECT doc_id, n_chars % 7 + 1 AS nf FROM documents
        |  WHERE doc_id % 3 = 2),
        |s AS (
        |  SELECT doc_id, f.i, (doc_id * 31 + f.i * 7) % 64 + 8 AS sz
        |  FROM v, LATERAL (SELECT unnest(range(0, nf)) AS i) f)
        |SELECT doc_id AS media_id, i AS frame_idx, sz AS n_bytes,
        |  CAST(list_sum([(doc_id + i + j) % 256
        |                 for j in range(0, sz)]) AS BIGINT) AS sum_bytes
        |FROM s""".stripMargin,

    // the pixel-law mirror of the decoded frames: if demux sliced the
    // wrong ranges or ImageIO mis-decoded, the per-frame sums diverge
    "media_video_frames" ->
      """WITH m AS (
        |  SELECT doc_id, n_chars % 16 + 8 AS w, n_chars % 8 + 8 AS h,
        |    n_chars % 5 + 2 AS nf
        |  FROM documents WHERE doc_id % 15 = 2),
        |fr AS (
        |  SELECT doc_id, w, h, f.i
        |  FROM m, LATERAL (SELECT unnest(range(0, nf)) AS i) f),
        |px AS (
        |  SELECT doc_id, w, h, i,
        |    CAST((gx.x + gy.y + doc_id + 13 * i) % 256 AS BIGINT) AS v
        |  FROM fr,
        |    LATERAL (SELECT unnest(range(0, w)) AS x) gx,
        |    LATERAL (SELECT unnest(range(0, h)) AS y) gy)
        |SELECT doc_id AS media_id, i AS frame_idx, w AS width,
        |  h AS height,
        |  CAST(SUM(v) AS BIGINT) AS sum_gray,
        |  CAST(MIN(v) AS BIGINT) AS min_gray,
        |  CAST(MAX(v) AS BIGINT) AS max_gray
        |FROM px GROUP BY doc_id, i, w, h""".stripMargin,

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
         |FROM documents""".stripMargin,

    // the sample-law mirror of the real WAV round-trip:
    // s(i) = ((i*37 + doc_id*11) % 4096) - 2048 over n samples, zero
    // crossings via lag
    "media_decode_wav" ->
      """WITH m AS (
        |  SELECT doc_id, 64 + n_chars % 128 AS n FROM documents),
        |sm AS (
        |  SELECT m.doc_id, g.i,
        |    CAST(((g.i * 37 + m.doc_id * 11) % 4096) - 2048 AS INTEGER)
        |      AS v
        |  FROM m, LATERAL (SELECT unnest(range(0, m.n)) AS i) g),
        |zc AS (
        |  SELECT doc_id, i, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM sm)
        |SELECT doc_id AS media_id, COUNT(*) AS n_samples,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        |  MIN(v) AS min_s, MAX(v) AS max_s,
        |  CAST(SUM(CASE WHEN pv IS NOT NULL AND
        |    ((pv < 0 AND v >= 0) OR (pv >= 0 AND v < 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
        |FROM zc GROUP BY 1""".stripMargin,

    // the sample-law mirror of the RMS energy readout
    "media_audio_rms" ->
      """WITH m AS (
        |  SELECT doc_id, 64 + n_chars % 128 AS n FROM documents),
        |sm AS (
        |  SELECT m.doc_id,
        |    CAST(((g.i * 37 + m.doc_id * 11) % 4096) - 2048 AS BIGINT)
        |      AS v
        |  FROM m, LATERAL (SELECT unnest(range(0, m.n)) AS i) g)
        |SELECT doc_id AS media_id, COUNT(*) AS n_samples,
        |  CAST(SUM(v * v) AS BIGINT) AS sum_sq,
        |  sqrt(CAST(CAST(SUM(v * v) AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE)) AS rms
        |FROM sm GROUP BY 1""".stripMargin,

    // sample-law mirror with a lag window: crossing ⇔ sign-class
    // change, the decoder's exact branch
    "media_audio_zcr" ->
      """WITH m AS (
        |  SELECT doc_id, 64 + n_chars % 128 AS n FROM documents),
        |sm AS (
        |  SELECT m.doc_id, g.i,
        |    CAST(((g.i * 37 + m.doc_id * 11) % 4096) - 2048 AS BIGINT)
        |      AS v
        |  FROM m, LATERAL (SELECT unnest(range(0, m.n)) AS i) g),
        |sq AS (
        |  SELECT doc_id, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM sm)
        |SELECT doc_id AS media_id, COUNT(*) AS n_samples,
        |  CAST(SUM(CASE WHEN pv IS NOT NULL
        |    AND ((pv < 0) <> (v < 0)) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS zero_cross,
        |  CAST(MAX(CASE WHEN v < 0 THEN -v ELSE v END) AS BIGINT)
        |    AS peak_abs,
        |  CAST(SUM(CASE WHEN v < 0 THEN -v ELSE v END) AS BIGINT)
        |    AS sum_abs,
        |  CAST(CAST(SUM(CASE WHEN pv IS NOT NULL
        |      AND ((pv < 0) <> (v < 0)) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS zcr
        |FROM sq GROUP BY 1""".stripMargin,

    // sample-law replay + island trick (i − row_number) over silent
    // samples; docs with zero silent samples absent on both engines
    "media_audio_silence" ->
      """WITH m AS (
        |  SELECT doc_id, 64 + n_chars % 128 AS n FROM documents),
        |sm AS (
        |  SELECT m.doc_id, g.i,
        |    CAST(((g.i * 37 + m.doc_id * 11) % 4096) - 2048 AS BIGINT)
        |      AS v
        |  FROM m, LATERAL (SELECT unnest(range(0, m.n)) AS i) g),
        |sil AS (
        |  SELECT doc_id, i,
        |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
        |      AS grp
        |  FROM sm WHERE (CASE WHEN v < 0 THEN -v ELSE v END) < 64),
        |runs AS (
        |  SELECT doc_id, grp, COUNT(*) AS len FROM sil GROUP BY 1, 2)
        |SELECT doc_id AS media_id,
        |  CAST(SUM(len) AS BIGINT) AS n_silent,
        |  COUNT(*) AS n_runs,
        |  CAST(MAX(len) AS BIGINT) AS max_run
        |FROM runs GROUP BY 1""".stripMargin,

    // pixel-law replay bucketed v >> 4; empty buckets absent
    "media_pixel_hist" ->
      """WITH m AS (
        |  SELECT doc_id, 8 + n_chars % 32 AS w, 8 + n_chars % 16 AS h
        |  FROM documents),
        |px AS (
        |  SELECT m.doc_id,
        |    ((gx.x + gy.y + m.doc_id) % 256) // 16 AS bucket
        |  FROM m,
        |    LATERAL (SELECT unnest(range(0, m.w)) AS x) gx,
        |    LATERAL (SELECT unnest(range(0, m.h)) AS y) gy)
        |SELECT doc_id AS media_id, CAST(bucket AS BIGINT) AS bucket,
        |  COUNT(*) AS cnt
        |FROM px GROUP BY 1, 2""".stripMargin,

    // the pixel-law mirror of the real ImageIO round-trip: v(x,y) =
    // (x + y + doc_id) % 256 summed over the w×h grid
    "media_decode_imageio" ->
      """WITH m AS (
        |  SELECT doc_id, 8 + n_chars % 32 AS w, 8 + n_chars % 16 AS h
        |  FROM documents),
        |px AS (
        |  SELECT m.doc_id, m.w, m.h,
        |    CAST((gx.x + gy.y + m.doc_id) % 256 AS BIGINT) AS v
        |  FROM m,
        |    LATERAL (SELECT unnest(range(0, m.w)) AS x) gx,
        |    LATERAL (SELECT unnest(range(0, m.h)) AS y) gy)
        |SELECT doc_id AS media_id, w AS width, h AS height,
        |  CAST(SUM(v) AS BIGINT) AS sum_gray,
        |  CAST(MIN(v) AS BIGINT) AS min_gray,
        |  CAST(MAX(v) AS BIGINT) AS max_gray,
        |  CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE)
        |    / CAST(w * h AS DOUBLE) AS mean_gray
        |FROM px GROUP BY doc_id, w, h""".stripMargin,

    "media_phash_neardup" ->
      s"""WITH ks AS (
         |  SELECT doc_id AS media_id,
         |    ${(0 until PhashDim).map(i =>
               s"CAST('0x' || substr(md5(text), ${2 * i + 1}, 2) AS BIGINT) AS k$i")
               .mkString(",\n    ")}
         |  FROM documents),
         |ph AS (
         |  SELECT media_id, $PhashBitsSql AS phash
         |  FROM (SELECT media_id,
         |          ${(0 until PhashDim).map(i => s"k$i").mkString(", ")},
         |          $PhashSumSql AS ksum
         |        FROM ks)),
         |bands AS (
         |  SELECT media_id, phash, j AS band,
         |    (phash // (CAST(1 AS BIGINT) << (4 * j))) % 16 AS bv
         |  FROM ph, (SELECT unnest(range(0, 4)) AS j)),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS media_a, a.phash,
         |    b.media_id AS media_b, b.phash AS phash_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv
         |    AND a.media_id < b.media_id)
         |SELECT media_a, media_b,
         |  CAST(bit_count(xor(phash, phash_b)) AS BIGINT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(phash, phash_b)) <= 3""".stripMargin
  )
}
