package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaFeatures, MediaRecord, StubCodec}

/** Multimodal plumbing: binary-column schema, partition-wise batch decode,
  * frame-sample generator, and the mapPartitions ≡ column-expression
  * equivalence that anchors the SQL oracle to the typed path.
  */
class MultimodalSuite extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRecord(1L, "video/mp4", "hello world, many frames here".getBytes, 4, 3, 3),
    MediaRecord(2L, "image/png", "just pixels".getBytes, 2, 2, 1))

  test("decodeFeatures: schema, batch shape, deterministic stub features") {
    val out = Multimodal.decodeFeatures(media.toDS()).collect()
      .sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(out.forall(_.feature.length === StubCodec.FeatureDim))
    assert(out(0).n_bytes === media(0).bytes.length.toLong)
    // determinism: same payload, same feature
    assert(out(0).feature.toSeq ===
      StubCodec.feature(media(0).bytes).toSeq)
  }

  test("sampleFrames: one row per frame, deterministic byte slices") {
    val frames = Multimodal.sampleFrames(media.toDS().toDF(), frameBytes = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        new String(r.getAs[Array[Byte]](2))))
      .sortBy(r => (r._1, r._2))
    assert(frames.map(f => (f._1, f._2)).toSeq ===
      Seq((1L, 0), (1L, 1), (1L, 2))) // only the video row, n_frames rows
    assert(frames(0)._3 === "hello wo")
    assert(frames(1)._3 === "rld, man")
  }

  test("mapPartitions decode equals the column-expression oracle form") {
    val docs = Seq(
      (1L, "alpha beta gamma", 16L),
      (2L, "delta epsilon", 13L)).toDF("doc_id", "text", "n_chars")
    val m = Multimodal.fromDocuments(docs)
    val typed = m.select(col("media_id"), col("mime"), col("bytes"),
        col("width"), col("height"), col("n_frames"))
      .as[MediaRecord]
    val viaPartitions = Multimodal.decodeFeatures(typed)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    val hex = md5(col("bytes"))
    val viaColumns = m.select(col("media_id"),
        array((0 until StubCodec.FeatureDim).map(i =>
          (conv(substring(hex, 2 * i + 1, 2), 16, 10).cast("double") / 255d)
            .cast("float")): _*).as("feature"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[collection.Seq[Float]](1).toSeq).toMap
    assert(viaPartitions.keySet === viaColumns.keySet)
    viaPartitions.foreach { case (id, f) =>
      f.zip(viaColumns(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6f, s"media $id feature mismatch")
      }
    }
  }

  test("ImageCodec: real ImageIO round-trip recovers the pixel law exactly") {
    val (w, h, off) = (13, 9, 1000L)
    val bytes = Multimodal.ImageCodec.encodeGradientBmp(w, h, off)
    // a real BMP container came out of the writer
    assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte)
    val st = Multimodal.ImageCodec.decodeStats(bytes).get
    assert(st.width === w && st.height === h)
    val expected = for (y <- 0 until h; x <- 0 until w)
      yield ((x + y + off) % 256).toInt
    assert(st.sumGray === expected.map(_.toLong).sum)
    assert(st.minGray === expected.min && st.maxGray === expected.max)
  }

  test("decodeFeatures: real decode for image AND audio payloads, stub fallback") {
    val bmp = Multimodal.ImageCodec.encodeGradientBmp(4, 3, 7L)
    val wav = Multimodal.AudioCodec.encodePcmWav(100, 5L)
    val rows = Seq(
      MediaRecord(10L, "image/bmp", bmp, 4, 3, 1),
      MediaRecord(11L, "audio/wav", "not an image".getBytes, 0, 0, 1),
      MediaRecord(12L, "audio/wav", wav, 0, 0, 1))
    val out = Multimodal.decodeFeatures(rows.toDS()).collect()
      .map(f => f.media_id -> f.feature).toMap
    // image row: features are decoded-pixel stats, not the byte hash
    assert(out(10L).toSeq === Multimodal.ImageCodec.feature(bmp).get.toSeq)
    assert(out(10L)(0) === 4f && out(10L)(1) === 3f)
    // real WAV payload: features are decoded-SAMPLE stats (n_samples
    // first, modality tag 2f last), not the byte hash
    assert(out(12L).toSeq === Multimodal.AudioCodec.feature(wav).get.toSeq)
    assert(out(12L)(0) === 100f && out(12L)(7) === 2f)
    // payload no installed reader accepts: deterministic stub fallback
    assert(out(11L).toSeq === StubCodec.feature("not an image".getBytes).toSeq)
  }

  test("AudioCodec: real javax.sound round-trip recovers the sample law exactly") {
    val (n, off) = (200, 42L)
    val wav = Multimodal.AudioCodec.encodePcmWav(n, off)
    // a real RIFF/WAVE container came out of the encoder
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val st = Multimodal.AudioCodec.decodeStats(wav).get
    val expected = (0 until n).map(i => (((i.toLong * 37 + off * 11) % 4096) - 2048).toInt)
    assert(st.nSamples === n.toLong)
    assert(st.sumAbs === expected.map(v => math.abs(v).toLong).sum)
    assert(st.minS === expected.min && st.maxS === expected.max)
    val zc = expected.sliding(2).count(p =>
      (p(0) < 0 && p(1) >= 0) || (p(0) >= 0 && p(1) < 0))
    assert(st.zeroCross === zc.toLong)
  }

  test("resize stub: truncates or zero-pads to w*h, deterministic") {
    val r = StubCodec.resize("abcdef".getBytes, 2, 2)
    assert(r.length === 4 && new String(r) === "abcd")
    val p = StubCodec.resize("ab".getBytes, 2, 2)
    assert(p.length === 4 && p(2) === 0 && p(3) === 0)
  }

  test("VideoContainer: box-walker round-trip recovers the container law exactly") {
    import graft.ops.VideoContainer
    val (id, nf, w, h) = (42L, 5, 320, 240)
    val bytes = VideoContainer.encodeMp4(id, nf, w, h)
    assert(new String(bytes.slice(4, 8), "US-ASCII") === "ftyp")
    val m = VideoContainer.parse(bytes).getOrElse(
      fail("parser rejected its own MP4"))
    assert(m.brand === "isom" && m.codec === "mp4v")
    assert(m.timescale === 1000L && m.duration === 40L * nf)
    assert(m.width === w && m.height === h)
    assert(m.nSamples === nf)
    assert(m.sampleSizes.toSeq ===
      (0 until nf).map(VideoContainer.sampleSize(id, _)))
  }

  test("VideoContainer: demuxed sample ranges cover the mdat payload exactly") {
    import graft.ops.VideoContainer
    val bytes = VideoContainer.encodeMp4(7L, 4, 64, 48)
    val m = VideoContainer.parse(bytes).get
    val samples = VideoContainer.demuxSamples(m)
    // contiguous coverage from the chunk offset
    assert(samples.head._2 === m.chunkOffset)
    samples.sliding(2).foreach {
      case Seq((_, o1, s1), (_, o2, _)) => assert(o2 === o1 + s1)
      case _ => ()
    }
    // every sliced byte matches the payload law — the offsets point at
    // real data, not just self-consistent arithmetic
    samples.foreach { case (i, off, sz) =>
      (0 until sz).foreach { j =>
        assert(bytes(off.toInt + j) === VideoContainer.sampleByte(7L, i, j),
          s"sample $i byte $j")
      }
    }
    // mdat payload is exactly the samples, nothing more: mdat box size
    // = 8 + sum(sizes) (mdat starts right after the 20-byte ftyp)
    val mdatSize = java.nio.ByteBuffer.wrap(bytes, 20, 4).getInt
    assert(mdatSize === 8 + m.sampleSizes.sum)
  }

  test("VideoContainer: BMP samples round-trip byte-exact and pixel-exact") {
    import graft.ops.VideoContainer
    // real variable-size payloads (BMP row padding makes widths differ
    // in encoded size), not the formulaic byte law — stsz must carry
    // the true lengths for the slices to land
    val frames = (0 until 3).map(f =>
      Multimodal.ImageCodec.encodeGradientBmp(13, 7, 5L + 13 * f))
    val bytes = VideoContainer.encodeSamples(frames, 13, 7)
    val m = VideoContainer.parse(bytes).getOrElse(fail("parse rejected"))
    assert(m.sampleSizes.toSeq === frames.map(_.length))
    val samples = VideoContainer.demuxSamples(m)
    samples.foreach { case (i, off, sz) =>
      val slice = java.util.Arrays.copyOfRange(
        bytes, off.toInt, off.toInt + sz)
      assert(slice.sameElements(frames(i)), s"frame $i slice differs")
      // and the slice DECODES: ImageIO accepts the demuxed range
      val st = Multimodal.ImageCodec.decodeStats(slice)
        .getOrElse(fail(s"ImageIO rejected demuxed frame $i"))
      assert(st.width === 13 && st.height === 7)
      // pixel law on frame i: v = (x + y + 5 + 13*i) % 256
      val expect = (for { y <- 0 until 7; x <- 0 until 13 }
        yield (x + y + 5 + 13 * i) % 256).map(_.toLong).sum
      assert(st.sumGray === expect, s"frame $i pixel sum")
    }
  }

  test("AudioCodec: non-16-bit-LE formats reject as None, not Some(garbage)") {
    // 8-bit PCM is a perfectly valid WAV the JRE provider accepts — but
    // the stats walk reads 16-bit LE frames, so decoding it would emit
    // plausible garbage tagged as real audio; the format check must
    // route it to the stub fallback instead
    val n = 64
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
    bb.put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16).putShort(1).putShort(1) // PCM, mono
    bb.putInt(8000).putInt(8000).putShort(1).putShort(8) // 8-bit
    bb.put("data".getBytes("US-ASCII")).putInt(n)
    (0 until n).foreach(i => bb.put((i * 7 % 256 - 128).toByte))
    assert(Multimodal.AudioCodec.decodeStats(bb.array()) === None)
  }

  test("VideoContainer: sample extent beyond the file rejects as None") {
    import graft.ops.VideoContainer
    val good = VideoContainer.encodeMp4(3L, 2, 16, 16)
    assert(VideoContainer.parse(good).isDefined)
    // patch the stco chunk offset to point at EOF: every table still
    // parses, but the declared sample extent is no longer backed by
    // the file — demux would hand out ranges past the buffer
    val idx = good.indexOfSlice("stco".getBytes("US-ASCII"))
    assert(idx > 0)
    val bad = good.clone()
    val v = good.length
    val off = idx + 4 /* verflags */ + 4 /* count */ + 4
    bad(off) = ((v >> 24) & 0xff).toByte
    bad(off + 1) = ((v >> 16) & 0xff).toByte
    bad(off + 2) = ((v >> 8) & 0xff).toByte
    bad(off + 3) = (v & 0xff).toByte
    assert(VideoContainer.parse(bad) === None)
  }

  test("VideoContainer: structurally broken payloads reject as None, never throw") {
    import graft.ops.VideoContainer
    val good = VideoContainer.encodeMp4(3L, 2, 16, 16)
    assert(VideoContainer.parse(Array[Byte]()) === None)
    assert(VideoContainer.parse("not a video".getBytes) === None)
    assert(VideoContainer.parse(good.dropRight(10)) === None) // truncated moov
    assert(VideoContainer.parse(good.drop(20)) === None) // no ftyp brand
    // image/audio payloads route to their own codecs, not this one
    assert(VideoContainer.parse(
      Multimodal.ImageCodec.encodeGradientBmp(4, 4, 0)) === None)
    assert(VideoContainer.parse(
      Multimodal.AudioCodec.encodePcmWav(16, 1)) === None)
  }
}
