package graft.ops

import java.nio.ByteBuffer

/** Real ISO-BMFF (MP4) container handling — the DEMUX layer of the video
  * path, in pure JVM. The carried "video stub" gap is really two layers:
  * pixel DECODE needs a codec this container doesn't ship (still stubbed,
  * honestly, in [[Multimodal.StubCodec]]), but the CONTAINER — box
  * structure, track metadata, and the sample tables that locate every
  * frame's byte range — is plain big-endian binary parsing, the part of
  * a video pipeline that determines scan/partition behavior at 100 TB
  * (you demux once to know what to ship to GPU decoders; the demux is
  * the Spark-side work). So: [[encodeMp4]] writes a minimal VALID MP4
  * (ftyp/mdat/moov with a full stbl) whose payload follows a pure
  * integer law, [[parse]] is a real recursive box walker extracting
  * mvhd/tkhd/stsd/stts/stsz/stco, and [[demuxSamples]] resolves each
  * sample's (offset, size) from the tables — all oracle-mirrorable in
  * SQL because the law is integer arithmetic, exactly the
  * [[Multimodal.ImageCodec]] / [[Multimodal.AudioCodec]] contract.
  *
  * Reference scope note: the reference pipeline carries no media at all
  * (market data only); this belongs to the LLM-training-data pack, where
  * multimodal corpora are first-class.
  */
object VideoContainer {

  /** Fixed law constants: 25 fps on a millisecond timescale. */
  val Timescale = 1000L
  val FrameDelta = 40L

  /** Sample i's payload size under the law. */
  def sampleSize(mediaId: Long, i: Int): Int =
    (((mediaId * 31 + i * 7) % 64) + 8).toInt

  /** Byte j of sample i under the law. */
  def sampleByte(mediaId: Long, i: Int, j: Int): Byte =
    ((mediaId + i + j) % 256).toByte

  private def box(name: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length)
    b.put(name.getBytes("US-ASCII"))
    b.put(payload)
    b.array()
  }

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = ByteBuffer.allocate(parts.map(_.length).sum)
    parts.foreach(out.put)
    out.array()
  }

  /** Minimal valid MP4: `ftyp` + `mdat` (the samples, concatenated in
    * index order at a known offset) + `moov` with one video track and a
    * complete sample table. Layout puts `mdat` SECOND so the single
    * `stco` chunk offset is a constant (20-byte ftyp + 8-byte mdat
    * header = 28) rather than a moov-size fixpoint.
    */
  def encodeMp4(mediaId: Long, nFrames: Int, width: Int, height: Int): Array[Byte] = {
    require(nFrames >= 1,
      s"mp4 law: nFrames must be positive, got $nFrames")
    encodeSamples((0 until nFrames).map { i =>
      val a = new Array[Byte](sampleSize(mediaId, i))
      var j = 0
      while (j < a.length) { a(j) = sampleByte(mediaId, i, j); j += 1 }
      a
    }, width, height)
  }

  /** Same container, arbitrary codec payloads — one sample per array,
    * concatenated into `mdat` in index order with stsz carrying the
    * real lengths. This is the Motion-JPEG shape (every sample a
    * complete still image the JDK can decode) that lets the video
    * pipeline run END TO END offline: [[Multimodal.Image]] BMP frames
    * in, [[parse]]+[[demuxSamples]] slicing them back out, ImageIO
    * decoding real pixels — no external codec anywhere.
    */
  def encodeSamples(payloads: Seq[Array[Byte]], width: Int,
      height: Int): Array[Byte] = {
    val nFrames = payloads.length
    require(nFrames >= 1 && width >= 1 && height >= 1,
      s"mp4 law: nFrames/width/height must be positive, got " +
        s"($nFrames, $width, $height)")
    val sizes = payloads.map(_.length)
    val mdatPayload = ByteBuffer.allocate(sizes.sum)
    payloads.foreach(mdatPayload.put)
    val ftyp = box("ftyp", {
      val p = ByteBuffer.allocate(12)
      p.put("isom".getBytes("US-ASCII")).putInt(0)
        .put("isom".getBytes("US-ASCII"))
      p.array()
    })
    val mdat = box("mdat", mdatPayload.array())
    val duration = FrameDelta * nFrames

    val mvhd = box("mvhd", {
      val p = ByteBuffer.allocate(100)
      p.putInt(0) // version 0 + flags
      p.putInt(0).putInt(0) // ctime, mtime
      p.putInt(Timescale.toInt).putInt(duration.toInt)
      p.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      p.putLong(0) // reserved
      unityMatrix(p)
      p.position(p.position() + 24) // pre_defined
      p.putInt(2) // next_track_ID
      p.array()
    })
    val tkhd = box("tkhd", {
      val p = ByteBuffer.allocate(84)
      p.putInt(0x000007) // v0 + enabled|in_movie|in_preview
      p.putInt(0).putInt(0) // ctime, mtime
      p.putInt(1).putInt(0) // track_ID, reserved
      p.putInt(duration.toInt)
      p.putLong(0) // reserved
      p.putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/vol/resv
      unityMatrix(p)
      p.putInt(width << 16).putInt(height << 16) // 16.16 fixed
      p.array()
    })
    val mdhd = box("mdhd", {
      val p = ByteBuffer.allocate(24)
      p.putInt(0).putInt(0).putInt(0)
      p.putInt(Timescale.toInt).putInt(duration.toInt)
      p.putShort(0x55C4.toShort).putShort(0) // 'und', pre_defined
      p.array()
    })
    val hdlr = box("hdlr", {
      val p = ByteBuffer.allocate(25)
      p.putInt(0).putInt(0)
      p.put("vide".getBytes("US-ASCII"))
      p.array() // 12 reserved + empty name already zeroed
    })
    val vmhd = box("vmhd", {
      val p = ByteBuffer.allocate(12)
      p.putInt(0x000001) // flags: no-lean-ahead
      p.array()
    })
    val dinf = box("dinf", box("dref", {
      val p = ByteBuffer.allocate(8 + 12)
      p.putInt(0).putInt(1) // entry_count
      p.putInt(12).put("url ".getBytes("US-ASCII")).putInt(0x000001)
      p.array()
    }))
    val stsd = box("stsd", {
      val entry = ByteBuffer.allocate(86) // VisualSampleEntry 'mp4v'
      entry.putInt(86).put("mp4v".getBytes("US-ASCII"))
      entry.position(entry.position() + 6) // reserved
      entry.putShort(1) // data_reference_index
      entry.position(entry.position() + 16) // pre_defined/reserved
      entry.putShort(width.toShort).putShort(height.toShort)
      entry.putInt(0x00480000).putInt(0x00480000) // 72 dpi
      entry.putInt(0).putShort(1) // reserved, frame_count
      entry.position(entry.position() + 32) // compressorname
      entry.putShort(0x0018).putShort(-1) // depth, pre_defined
      val p = ByteBuffer.allocate(8 + 86)
      p.putInt(0).putInt(1).put(entry.array())
      p.array()
    })
    val stts = box("stts", {
      val p = ByteBuffer.allocate(16)
      p.putInt(0).putInt(1).putInt(nFrames).putInt(FrameDelta.toInt)
      p.array()
    })
    val stsc = box("stsc", {
      val p = ByteBuffer.allocate(20)
      p.putInt(0).putInt(1).putInt(1).putInt(nFrames).putInt(1)
      p.array()
    })
    val stsz = box("stsz", {
      val p = ByteBuffer.allocate(12 + 4 * nFrames)
      p.putInt(0).putInt(0).putInt(nFrames)
      sizes.foreach(p.putInt)
      p.array()
    })
    val stco = box("stco", {
      val p = ByteBuffer.allocate(12)
      p.putInt(0).putInt(1).putInt(ftyp.length + 8) // mdat payload start
      p.array()
    })
    val stbl = box("stbl", concat(stsd, stts, stsc, stsz, stco))
    val minf = box("minf", concat(vmhd, dinf, stbl))
    val mdia = box("mdia", concat(mdhd, hdlr, minf))
    val trak = box("trak", concat(tkhd, mdia))
    val moov = box("moov", concat(mvhd, trak))
    concat(ftyp, mdat, moov)
  }

  private def unityMatrix(p: ByteBuffer): Unit = {
    p.putInt(0x00010000).putInt(0).putInt(0)
    p.putInt(0).putInt(0x00010000).putInt(0)
    p.putInt(0).putInt(0).putInt(0x40000000)
  }

  /** Parsed container metadata — everything the sample tables declare,
    * before any codec runs.
    */
  case class Mp4Meta(
      brand: String,
      timescale: Long,
      duration: Long,
      width: Int,
      height: Int,
      codec: String,
      nSamples: Int,
      sampleSizes: Array[Int],
      chunkOffset: Long)

  // trak is handled explicitly (single-track enforcement)
  private val Containers = Set("moov", "mdia", "minf", "stbl")

  /** Real box walker: recursively visits ISO-BMFF boxes and extracts
    * the metadata + sample tables. None ⇔ structurally not an MP4 this
    * demuxer accepts — missing ftyp, truncated box, absent tables, OR
    * any layout whose offsets it cannot model faithfully: multi-track,
    * multi-chunk (stsc/stco beyond one chunk), version-1 boxes. The
    * reject-don't-misread rule is what makes the None signal safe for
    * routing a mixed binary column: a real-world interleaved MP4 parses
    * as None rather than yielding silently wrong frame ranges. Declared
    * counts are bounded against the backing bytes before any allocation
    * and nesting depth is capped, so crafted headers reject instead of
    * raising fatal OOM/StackOverflow past the NonFatal catch.
    */
  def parse(bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      var brand: Option[String] = None
      var timescale = 0L
      var duration = 0L
      var width = 0
      var height = 0
      var codec: Option[String] = None
      var sizes: Option[Array[Int]] = None
      var declaredCount = -1
      var chunkOffset = -1L
      var nTraks = 0

      def reject(why: String): Nothing =
        throw new IllegalArgumentException(why)

      // version-0 full box only: v1 variants carry 64-bit times and
      // would shift every later field under the fixed skips below —
      // reject rather than misread
      def v0(p: ByteBuffer, name: String): Unit =
        if ((p.getInt() >>> 24) != 0) reject(s"$name version != 0")

      def walk(lo: Int, hi: Int, depth: Int): Unit = {
        // a crafted file of nested 8-byte containers must bound at an
        // IllegalArgumentException, not a StackOverflowError (fatal,
        // escapes the NonFatal catch); real files nest 5 deep
        if (depth > 8) reject("box nesting > 8")
        var pos = lo
        while (pos + 8 <= hi) {
          val b = ByteBuffer.wrap(bytes, pos, hi - pos)
          val size = b.getInt()
          val name = {
            val t = new Array[Byte](4); b.get(t); new String(t, "US-ASCII")
          }
          // size==1 (64-bit largesize) and size==0 (to-end-of-file)
          // fall into this reject: both are legal ISO-BMFF but only
          // appear on >4 GiB boxes this demuxer never produces; a
          // foreign file using them parses as None, not wrong offsets
          if (size < 8 || pos + size > hi) reject(s"truncated box $name")
          val payload = pos + 8
          name match {
            case "ftyp" =>
              val t = new Array[Byte](4)
              ByteBuffer.wrap(bytes, payload, 4).get(t)
              brand = Some(new String(t, "US-ASCII"))
            case "mvhd" =>
              val p = ByteBuffer.wrap(bytes, payload, size - 8)
              v0(p, name)
              p.getInt(); p.getInt() // ctime, mtime
              timescale = p.getInt().toLong
              duration = p.getInt().toLong
            case "trak" =>
              // a second track would overwrite the first's tables and
              // demux garbage — this demuxer handles exactly one
              nTraks += 1
              if (nTraks > 1) reject("more than one trak")
              walk(payload, pos + size, depth + 1)
            case "tkhd" =>
              val p = ByteBuffer.wrap(bytes, payload, size - 8)
              v0(p, name)
              // ctime/mtime/track/reserved/duration/reserved
              // + layer/alt/volume/reserved + matrix = 72 bytes to width
              p.position(p.position() + 72)
              width = p.getInt() >>> 16
              height = p.getInt() >>> 16
            case "stsd" =>
              val p = ByteBuffer.wrap(bytes, payload, size - 8)
              p.getInt() // verflags
              if (p.getInt() >= 1) { // entry_count
                p.getInt() // entry size
                val t = new Array[Byte](4); p.get(t)
                codec = Some(new String(t, "US-ASCII"))
              }
            case "stsz" =>
              val p = ByteBuffer.wrap(bytes, payload, size - 8)
              p.getInt() // verflags
              val fixed = p.getInt()
              val n = p.getInt()
              // bound the allocation by what the FILE can back: a
              // crafted 20-byte stsz declaring 2^30 samples must not
              // attempt a 4 GB array (OutOfMemoryError is fatal and
              // escapes the NonFatal catch). Var-size entries must fit
              // the box; fixed-size samples must fit the file.
              if (n < 0) reject("negative stsz count")
              if (fixed == 0 && 12L + 4L * n > size - 8)
                reject("stsz entries exceed box")
              if (fixed != 0 && n.toLong * math.max(fixed, 1) > bytes.length)
                reject("stsz samples exceed file")
              sizes = Some(
                if (fixed != 0) Array.fill(n)(fixed)
                else Array.fill(n)(p.getInt()))
            case "stts" =>
              val p = ByteBuffer.wrap(bytes, payload, size - 8)
              p.getInt() // verflags
              val entries = p.getInt()
              if (entries < 0 || 8L + 8L * entries > size - 8)
                reject("stts entries exceed box")
              var total = 0
              (0 until entries).foreach { _ =>
                total += p.getInt(); p.getInt() // count, delta
              }
              declaredCount = total
            case "stsc" =>
              val p = ByteBuffer.wrap(bytes, payload, size - 8)
              p.getInt() // verflags
              // single chunk only: multi-chunk layouts interleave
              // samples across mdat ranges demuxSamples doesn't model
              if (p.getInt() != 1 || p.getInt() != 1)
                reject("stsc: not a single-chunk layout")
            case "stco" =>
              val p = ByteBuffer.wrap(bytes, payload, size - 8)
              p.getInt() // verflags
              if (p.getInt() != 1) reject("stco: not exactly one chunk")
              chunkOffset = p.getInt().toLong
            case n if Containers(n) => walk(payload, pos + size, depth + 1)
            case _ => () // mdat, hdlr, vmhd, dinf: no metadata to pull
          }
          pos += size
        }
        if (pos != hi) reject("trailing bytes after last box")
      }

      walk(0, bytes.length, 0)
      for {
        b <- brand
        c <- codec
        sz <- sizes
        // cross-table consistency: stts and stsz must agree, exactly
        // the check a production demuxer runs before trusting offsets.
        // The sample EXTENT must also be backed by the file: the count
        // checks above bound only allocation, so var-size stsz VALUES
        // (e.g. 0x7FFFFFFF, or negative) and a stale/oversized stco
        // offset would otherwise pass and make demuxSamples hand out
        // byte ranges beyond (or backwards through) the file — the
        // silently-wrong frame ranges this parser promises to reject
        // as None instead. Sum in Long: n ints of up to 2^31 each.
        if declaredCount == sz.length && sz.forall(_ >= 0) &&
          chunkOffset >= 0 &&
          chunkOffset + sz.foldLeft(0L)(_ + _) <= bytes.length &&
          timescale > 0 && width > 0 && height > 0
      } yield Mp4Meta(b, timescale, duration, width, height, c,
        sz.length, sz, chunkOffset)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Demux: each sample's (index, absolute byte offset, size) resolved
    * from stsz + stco under the single-chunk stsc this encoder writes —
    * the byte ranges a frame-level decoder (or a GPU decode service)
    * would be handed. Pure table arithmetic; no payload scan.
    */
  def demuxSamples(meta: Mp4Meta): Seq[(Int, Long, Int)] = {
    var off = meta.chunkOffset
    meta.sampleSizes.zipWithIndex.map { case (sz, i) =>
      val r = (i, off, sz)
      off += sz
      r
    }.toSeq
  }
}
