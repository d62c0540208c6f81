package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media record: an opaque binary payload plus typed metadata — the
  * multimodal column pattern for LLM-data pipelines (brief requirement). */
case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

/** Features extracted per record by the decoder. Container fields are
  * nullable: width/height for images, sample_rate/channels for audio.
  * `sample_offsets` is a comma-joined string (not array<long>) so the frame
  * stays oracle-comparable and parquet-friendly for downstream SQL engines. */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    magic_hex: String,
    width: Option[Long],
    height: Option[Long],
    sample_rate: Option[Long],
    channels: Option[Long],
    n_frames: Long,
    sample_offsets: String,
    content_digest: String)

/** Multimodal binary-column plumbing with REAL container parsing for all
  * three modalities.
  *
  * The media table is synthesized from `documents` with genuine container
  * headers — a well-formed PNG signature + IHDR chunk (big-endian dims,
  * CRC32-correct) for images, a canonical 44-byte RIFF/WAVE header
  * (little-endian fmt fields) for audio, and a spec-correct RIFF/AVI LIST
  * hdrl + avih main header (little-endian frame geometry) for video —
  * wrapping the document text as the payload body. The decoder does what a
  * production decoder does: sniff the actual magic bytes and parse
  * width/height (PNG IHDR), sample rate/channels (WAV fmt), or
  * frames/width/height (AVI avih) from the binary header. Pixel/sample
  * DECODING (past the container) would need a codec library this
  * environment doesn't ship; the avih header parse is the honest pure-JVM
  * boundary, and a codec slots into `decode` without touching the plumbing.
  *
  * Spark shape: typed `Dataset[MediaRecord]`, per-partition batch iteration
  * via `mapPartitions` (the Scala analog of `mapInPandas` batches — decoder
  * init amortizes per partition), a binary payload column with typed
  * metadata, frame-sampling offsets.
  */
object Multimodal {

  private val PngSig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)
  private val PngHeaderLen = 33 // 8 sig + 4 len + 4 "IHDR" + 13 data + 4 crc
  private val WavHeaderLen = 44 // canonical RIFF/WAVE/fmt /data layout
  private val WavRates = Array(8000L, 16000L, 22050L, 44100L, 48000L)
  private val AviHeaderLen = 88 // RIFF/AVI + LIST hdrl + avih(56)
  private val AviMicros = Array(16667L, 33333L, 40000L, 50000L, 20000L)

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Long): Array[Byte] = Array(v.toByte, (v >> 8).toByte)

  /** A real PNG signature + IHDR chunk (8-bit RGB, CRC32-correct) followed
    * by `body`. Header-accurate fixture: IHDR parses in any PNG reader. */
  def pngBytes(width: Long, height: Long, body: Array[Byte]): Array[Byte] = {
    val data = be32(width) ++ be32(height) ++ Array[Byte](8, 2, 0, 0, 0)
    val typeAndData = "IHDR".getBytes("US-ASCII") ++ data
    val crc = new java.util.zip.CRC32()
    crc.update(typeAndData)
    PngSig ++ be32(13) ++ typeAndData ++ be32(crc.getValue) ++ body
  }

  /** A canonical 44-byte WAV header (PCM16) followed by `body` as the data
    * chunk. */
  def wavBytes(sampleRate: Long, channels: Long, body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32(36L + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * channels * 2) ++ le16(channels * 2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(body.length) ++ body

  /** A spec-correct RIFF/AVI header: 'RIFF' size 'AVI ', a LIST/hdrl
    * wrapping one avih main header chunk (56-byte AVIMAINHEADER:
    * dwMicroSecPerFrame, dwTotalFrames, dwWidth, dwHeight at their standard
    * little-endian offsets), followed by `body`. Header-accurate the same
    * way the PNG/WAV fixtures are: the avih fields parse with any RIFF
    * reader. */
  def aviBytes(width: Long, height: Long, frames: Long, microsPerFrame: Long,
               body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32(AviHeaderLen - 8L + body.length) ++
      "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(4L + 8L + 56L) ++
      "hdrl".getBytes("US-ASCII") ++
      "avih".getBytes("US-ASCII") ++ le32(56) ++
      le32(microsPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ // dwReserved[4]
      body

  /** Fabricates the media table from `documents`: media_type round-robins on
    * doc_id; every payload carries a REAL container header (PNG IHDR dims,
    * WAV fmt audio params, AVI avih frame geometry — each derived
    * deterministically from doc_id and body length so the oracle can
    * predict what the parser must find). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[(Long, String)].map {
      case (docId, text) =>
        val body = text.getBytes("UTF-8")
        (docId % 3) match {
          case 0 => MediaRecord(docId, "image",
            pngBytes(64 + docId % 1857, 64 + body.length % 1017, body))
          case 1 => MediaRecord(docId, "audio",
            wavBytes(WavRates((docId % 5).toInt), 1 + docId % 2, body))
          case _ => MediaRecord(docId, "video",
            aviBytes(320 + docId % 1601, 240 + body.length % 841,
              1 + docId % 300, AviMicros((docId % 5).toInt), body))
        }
    }
  }

  private def u8(b: Byte): Long = b & 0xffL
  private def readBe32(b: Array[Byte], off: Int): Long =
    (u8(b(off)) << 24) | (u8(b(off + 1)) << 16) | (u8(b(off + 2)) << 8) | u8(b(off + 3))
  private def readLe32(b: Array[Byte], off: Int): Long =
    u8(b(off)) | (u8(b(off + 1)) << 8) | (u8(b(off + 2)) << 16) | (u8(b(off + 3)) << 24)
  private def readLe16(b: Array[Byte], off: Int): Long =
    u8(b(off)) | (u8(b(off + 1)) << 8)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= PngHeaderLen && PngSig.indices.forall(i => b(i) == PngSig(i))
  private def fourcc(b: Array[Byte], off: Int, tag: String): Boolean =
    b.slice(off, off + 4).sameElements(tag.getBytes("US-ASCII"))
  private def isWav(b: Array[Byte]): Boolean =
    b.length >= WavHeaderLen && fourcc(b, 0, "RIFF") && fourcc(b, 8, "WAVE")
  private def isAvi(b: Array[Byte]): Boolean =
    b.length >= AviHeaderLen && fourcc(b, 0, "RIFF") && fourcc(b, 8, "AVI ") &&
      fourcc(b, 24, "avih")

  /** Decode one record by sniffing the actual container bytes: PNG IHDR
    * (big-endian dims), WAV fmt (little-endian rate/channels), AVI avih
    * (little-endian dwTotalFrames/dwWidth/dwHeight). The content digest
    * covers the media BODY (payload minus container header) — the content,
    * not the container. */
  def decode(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val n = bytes.length.toLong
    val magic = bytes.take(4).map(b => f"$b%02x").mkString
    val (width, height, sampleRate, channels, frames, headerLen) =
      if (isPng(bytes))
        (Some(readBe32(bytes, 16)), Some(readBe32(bytes, 20)), None, None, 1L, PngHeaderLen)
      else if (isAvi(bytes)) // before WAV: both are RIFF, fourcc at 8 differs
        (Some(readLe32(bytes, 64)), Some(readLe32(bytes, 68)), None, None,
          readLe32(bytes, 48), AviHeaderLen)
      else if (isWav(bytes))
        (None, None, Some(readLe32(bytes, 24)), Some(readLe16(bytes, 22)), 1L, WavHeaderLen)
      else (None, None, None, None, 1L, 0)
    val body = if (headerLen == 0) bytes else bytes.drop(headerLen)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(body).map(b => f"$b%02x").mkString
    val step = math.max(1L, n / 5)
    val offsets = (0 until 5).map(i => i * step).mkString(",")
    MediaFeatures(r.doc_id, r.media_type, n, magic, width, height,
      sampleRate, channels, frames, offsets, digest)
  }

  /** Batch feature extraction: one decoder instance per partition, streaming
    * over the rows — the shape a real codec needs (expensive init amortized,
    * no per-row driver involvement). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real decoders initialize here (per partition, not per row)
      it.map(decode)
    }
  }

  def features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(spark, dir)).toDF()

  // ------------------------------------------------------------------
  // Signal-level decode: the two modalities decodable with ZERO codec
  // libraries — PCM WAV samples (LE int16 frames after the data chunk)
  // and uncompressed 24-bit BMP pixels. Container parsing above stops at
  // headers; these read the actual payload samples/pixels.
  // ------------------------------------------------------------------

  /** Width of the synthesized BMPs: 4 px × 3 B/px = 12 B rows — a multiple
    * of 4, so the pixel array carries no row padding and height is exactly
    * `bodyLen / 12`. (The DECODER still computes padded row strides from
    * the header like a real reader; the fixture just doesn't need them.) */
  private val BmpWidth = 4

  /** A spec-correct uncompressed 24-bit BMP: BITMAPFILEHEADER (14 B) +
    * BITMAPINFOHEADER (40 B) + raw BGR pixel array. `pixels.length` must be
    * `rowSize(width) * height`. */
  def bmpBytes(width: Long, height: Long, pixels: Array[Byte]): Array[Byte] = {
    val rowSize = ((3 * width + 3) / 4) * 4
    require(pixels.length == rowSize * height,
      s"bmpBytes: pixel array ${pixels.length} != rowSize($rowSize) * height($height)")
    "BM".getBytes("US-ASCII") ++ le32(54L + pixels.length) ++
      le32(0) ++ le32(54) ++ // reserved, data offset
      le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(pixels.length) ++ // BI_RGB, image size
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ // ppm, palette
      pixels
  }

  // ---- PNG with a REAL zlib pixel stream -----------------------------
  //
  // r13's §6 claimed pixel decode past the container "needs codec libs the
  // environment doesn't ship" — wrong for PNG: its compression is zlib and
  // java.util.zip.{Deflater, Inflater} ship in every JVM. The synthesis
  // side deflates genuinely filtered scanlines into IDAT; the decoder
  // walks chunks, inflates, and reverses all five spec filters.

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val td = tag.getBytes("US-ASCII") ++ data
    val crc = new java.util.zip.CRC32()
    crc.update(td)
    be32(data.length.toLong) ++ td ++ be32(crc.getValue)
  }

  /** PNG Paeth predictor (spec §4.5.4 — shared by encoder and decoder). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** A complete non-interlaced 8-bit RGB PNG whose IDAT is a genuine zlib
    * stream: scanline y is filtered with type (y % 5) — every one of the
    * five spec filters (None/Sub/Up/Average/Paeth), predicting from the
    * RAW bytes of the current and prior scanlines as the spec requires —
    * then deflated. `pixels.length` must be 3·width·height (RGB rows, no
    * padding). Deflate output bytes may vary by JVM, but only the INFLATED
    * result feeds any query result, so nothing nondeterministic leaks. */
  def pngPixelBytes(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    val bpp = 3
    val stride = bpp * width
    require(pixels.length == stride * height,
      s"pngPixelBytes: pixel array ${pixels.length} != 3*$width*$height")
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val f = y % 5
      raw((stride + 1) * y) = f.toByte
      var i = 0
      while (i < stride) {
        val x = pixels(stride * y + i) & 0xff
        val a = if (i >= bpp) pixels(stride * y + i - bpp) & 0xff else 0
        val b = if (y > 0) pixels(stride * (y - 1) + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) pixels(stride * (y - 1) + i - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, c)
        }
        raw((stride + 1) * y + 1 + i) = ((x - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = be32(width.toLong) ++ be32(height.toLong) ++ Array[Byte](8, 2, 0, 0, 0)
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Decode a non-interlaced 8-bit RGB PNG to (width, height, raw RGB
    * pixels): chunk walk (IHDR geometry, IDAT concatenation, stop at
    * IEND), one Inflater pass, then the five reconstruction filters in
    * place. None for any other PNG flavor or a malformed stream — the
    * caller's decode-failure row, never a crash. */
  private[graft] def decodePngPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      if (!isPng(b)) return None
      var pos = 8
      var w = -1; var h = -1; var ok = true
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && ok && pos + 8 <= b.length) {
        val len = readBe32(b, pos).toInt
        val tag = new String(b, pos + 4, 4, "US-ASCII")
        if (len < 0 || pos + 12L + len > b.length) ok = false
        else {
          tag match {
            case "IHDR" =>
              w = readBe32(b, pos + 8).toInt
              h = readBe32(b, pos + 12).toInt
              // bit depth 8, color type 2 (RGB), default compression/filter,
              // no interlace — the only flavor this decoder speaks
              ok = len == 13 && b(pos + 16) == 8 && b(pos + 17) == 2 &&
                b(pos + 18) == 0 && b(pos + 19) == 0 && b(pos + 20) == 0 &&
                w >= 0 && h >= 0
            case "IDAT" => idat.write(b, pos + 8, len)
            case "IEND" => done = true
            case _ => () // ancillary chunks skip by declared size
          }
          pos += 12 + len
        }
      }
      if (!ok || w < 0 || h < 0) return None
      val stride = 3 * w
      val rawLen = (stride + 1) * h
      val raw = new Array[Byte](rawLen)
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      var off = 0
      while (off < rawLen && !infl.finished()) {
        val k = infl.inflate(raw, off, rawLen - off)
        if (k == 0 && infl.needsInput()) return None // truncated stream
        off += k
      }
      infl.end()
      if (off != rawLen) return None
      val px = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val f = raw((stride + 1) * y) & 0xff
        var i = 0
        while (i < stride) {
          val x = raw((stride + 1) * y + 1 + i) & 0xff
          val a = if (i >= 3) px(stride * y + i - 3) & 0xff else 0
          val bb = if (y > 0) px(stride * (y - 1) + i) & 0xff else 0
          val c = if (y > 0 && i >= 3) px(stride * (y - 1) + i - 3) & 0xff else 0
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => bb
            case 3 => (a + bb) / 2
            case 4 => paeth(a, bb, c)
            case _ => return None // invalid filter type
          }
          px(stride * y + i) = ((x + pred) & 0xff).toByte
          i += 1
        }
        y += 1
      }
      Some((w, h, px))
    } catch { case _: Exception => None }

  /** Per-record signal stats. Audio fields (`peak_abs`/`clip_count`/`rms`)
    * are null for images and for zero-sample audio; channel means are null
    * for audio and zero-pixel images. All doubles are single-rounding
    * quotients of exact integer sums (then one sqrt for RMS), so they hash
    * bit-identically against the closed-form oracle. */
  case class MediaSignal(
      doc_id: Long,
      media_type: String,
      n_units: Long,
      peak_abs: Option[Long],
      clip_count: Option[Long],
      rms: Option[Double],
      mean_b: Option[Double],
      mean_g: Option[Double],
      mean_r: Option[Double])

  /** The signal-bearing media table: doc_id % 3 == 0 becomes a REAL
    * uncompressed 24-bit BMP whose pixel array is the document text bytes
    * (truncated to whole rows), == 1 keeps the [[wavBytes]] PCM16 container
    * whose data chunk is the text bytes, and == 2 (the slot r13 excluded as
    * "needs a codec") is a REAL compressed PNG — same text-byte pixels as
    * the BMP but RGB row-major, filtered with all five spec filters and
    * deflated through the JDK's zlib ([[pngPixelBytes]]). */
  def mediaSignalFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].map { case (docId, text) =>
        val body = text.getBytes("UTF-8")
        val rowSize = 3 * BmpWidth // 12, no padding at width 4
        val h = body.length / rowSize
        (docId % 3) match {
          case 0 =>
            MediaRecord(docId, "image", bmpBytes(BmpWidth, h, body.take(h * rowSize)))
          case 1 =>
            MediaRecord(docId, "audio",
              wavBytes(WavRates((docId % 5).toInt), 1 + docId % 2, body))
          case _ =>
            MediaRecord(docId, "image",
              pngPixelBytes(BmpWidth, h.toInt, body.take(h * rowSize)))
        }
      }
  }

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  /** LE int16 at `off` (sign-extended). */
  private def readLe16s(b: Array[Byte], off: Int): Int =
    ((u8(b(off)) | (u8(b(off + 1)) << 8)).toInt << 16) >> 16

  /** Decode one record's SIGNAL by genuinely walking the container:
    *
    *  - BMP: data offset / width / height / bpp from the BITMAPINFOHEADER,
    *    row stride padded to 4 bytes as the spec requires, per-channel
    *    (B, G, R) byte sums over the located pixel array;
    *  - WAV: a real RIFF chunk walk (not a fixed offset — chunks are
    *    skipped by their declared size, even-padded) to the `data` chunk,
    *    then LE int16 samples: peak |s|, clipping count (±full-scale),
    *    RMS = sqrt(Σs²/n).
    */
  def decodeSignal(r: MediaRecord): MediaSignal = {
    val b = r.payload
    def failed = MediaSignal(r.doc_id, r.media_type, 0L,
      None, None, None, None, None, None)
    if (isBmp(b)) {
      val dataOff = readLe32(b, 10).toInt
      val width = readLe32(b, 18).toInt
      // biHeight is SIGNED: negative height is a spec-legal top-down BMP.
      // Channel sums are row-order-independent, so |height| rows read
      // from dataOff decode both orientations identically.
      val height = math.abs(readLe32(b, 22).toInt)
      val rowSize = ((3 * width + 3) / 4) * 4
      // header-declared geometry is untrusted input: an overstated
      // width/height/dataOff must become a decode-failure row, not an
      // ArrayIndexOutOfBounds from trusting the header
      if (width <= 0 || dataOff < 54 ||
          dataOff.toLong + rowSize.toLong * height > b.length) failed
      else {
        var (sb, sg, sr) = (0L, 0L, 0L)
        var y = 0
        while (y < height) {
          var x = 0
          val row = dataOff + y * rowSize
          while (x < width) {
            val p = row + 3 * x
            sb += u8(b(p)); sg += u8(b(p + 1)); sr += u8(b(p + 2))
            x += 1
          }
          y += 1
        }
        val np = width.toLong * height
        def mean(s: Long) = if (np > 0) Some(s.toDouble / np.toDouble) else None
        MediaSignal(r.doc_id, "image", np, None, None, None,
          mean(sb), mean(sg), mean(sr))
      }
    } else if (isPng(b)) {
      decodePngPixels(b) match {
        case None => failed
        case Some((w, h, px)) =>
          // PNG rows are RGB (the BMP branch reads BGR) — sum accordingly
          var (sr, sg, sb) = (0L, 0L, 0L)
          var i = 0
          while (i < px.length) {
            sr += u8(px(i)); sg += u8(px(i + 1)); sb += u8(px(i + 2))
            i += 3
          }
          val np = w.toLong * h
          def mean(s: Long) = if (np > 0) Some(s.toDouble / np.toDouble) else None
          MediaSignal(r.doc_id, "image", np, None, None, None,
            mean(sb), mean(sg), mean(sr))
      }
    } else if (isWav(b)) {
      // chunk walk from byte 12 (past RIFF size + WAVE tag)
      var pos = 12
      var dataStart = -1
      var dataLen = 0
      while (dataStart < 0 && pos + 8 <= b.length) {
        val size = readLe32(b, pos + 4).toInt
        if (fourcc(b, pos, "data")) {
          dataStart = pos + 8
          dataLen = math.min(size, b.length - dataStart)
        } else pos += 8 + size + (size & 1) // RIFF chunks pad to even
      }
      val n = if (dataStart < 0) 0L else dataLen / 2L
      var (peak, clip, ss) = (0L, 0L, 0L)
      var i = 0
      while (i < n) {
        val s = readLe16s(b, dataStart + 2 * i)
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        if (s == 32767 || s == -32768) clip += 1
        ss += s.toLong * s
        i += 1
      }
      val rms = if (n > 0) Some(math.sqrt(ss.toDouble / n.toDouble)) else None
      MediaSignal(r.doc_id, "audio", n,
        if (n > 0) Some(peak) else None, if (n > 0) Some(clip) else None,
        rms, None, None, None)
    } else
      MediaSignal(r.doc_id, r.media_type, 0L, None, None, None, None, None, None)
  }

  /** Driver query: per-record signal stats over the BMP/WAV media table —
    * the same per-partition batch shape as [[extractFeatures]]. */
  def signal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaSignalFromDocuments(spark, dir).mapPartitions(_.map(decodeSignal)).toDF()
  }

  // ------------------------------------------------------------------
  // AVI FRAME decode — closing §6's last signal boundary with zero new
  // dependencies: AVI video with uncompressed DIB frames ('00db' chunks of
  // raw bottom-up BGR rows) is spec-legal and needs no codec at all, the
  // same way BMP didn't. The synthesis writes a genuine RIFF tree (LIST
  // hdrl/avih + LIST movi with per-frame chunks); the decoder WALKS that
  // tree — chunks by declared size, geometry from avih, stride padded to
  // 4 bytes — it never assumes the writer's fixed layout. MJPEG is covered
  // too (below, r16): javax.imageio ships a JPEG codec in every JDK, so
  // '00dc' compressed frames decode with zero new dependencies; only
  // codecs the JDK lacks (H.264/VP9/AV1) remain out of reach.
  // ------------------------------------------------------------------

  /** Per-record video stats: frame count actually decoded from the movi
    * list, geometry from avih, per-channel means over ALL frames' pixels,
    * and `motion` = mean absolute byte difference between consecutive
    * frames — the standard cheap temporal-activity feature (frame-sample
    * selection upstream of an expensive encoder keys on it). All doubles
    * are single-rounding quotients of exact integer sums. */
  case class VideoSignal(
      doc_id: Long,
      n_frames: Long,
      width: Long,
      height: Long,
      n_units: Long,
      mean_b: Option[Double],
      mean_g: Option[Double],
      mean_r: Option[Double],
      motion: Option[Double])

  /** A complete RIFF/AVI with REAL frame payloads: the [[aviBytes]] header
    * tree plus a LIST/movi of `frames` uncompressed-DIB '00db' chunks.
    * Frame k's pixel array is `body` (truncated to whole rows) cyclically
    * scrolled DOWN by k rows — deterministic motion the oracle can state
    * in closed form, while row size (12 = 3·width at width 4, already
    * 4-byte aligned) keeps the scroll on channel boundaries. */
  def aviMovieBytes(width: Long, height: Long, frames: Int,
                    microsPerFrame: Long, framePixels: Seq[Array[Byte]]): Array[Byte] = {
    val chunks = framePixels.flatMap { px =>
      require(px.length % 2 == 0, "RIFF chunk payloads here are even-sized")
      "00db".getBytes("US-ASCII") ++ le32(px.length.toLong) ++ px
    }.toArray
    val movi = "LIST".getBytes("US-ASCII") ++ le32(4L + chunks.length) ++
      "movi".getBytes("US-ASCII") ++ chunks
    val hdrl = "LIST".getBytes("US-ASCII") ++ le32(4L + 8L + 56L) ++
      "hdrl".getBytes("US-ASCII") ++
      "avih".getBytes("US-ASCII") ++ le32(56) ++
      le32(microsPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    "RIFF".getBytes("US-ASCII") ++ le32(4L + hdrl.length + movi.length) ++
      "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
  }

  /** The video media table: EVERY document becomes an AVI whose frames are
    * its text bytes as 4-px-wide BGR rows, frame k scrolled down by k rows
    * (cyclic). 2–4 frames per doc (doc_id-derived, like every other
    * synthesis parameter). Docs shorter than one 12-byte row produce
    * zero-height frames — the decoder's empty-pixel path. */
  def mediaVideoFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[(Long, String)].map {
      case (docId, text) =>
        val body = text.getBytes("UTF-8")
        val rowSize = 3 * BmpWidth
        val h = body.length / rowSize
        val px = body.take(h * rowSize)
        val frames = (2 + docId % 3).toInt
        val framePx = (0 until frames).map { k =>
          if (px.isEmpty) Array.emptyByteArray
          else {
            val shift = (k * rowSize) % px.length
            px.drop(px.length - shift) ++ px.take(px.length - shift)
          }
        }
        MediaRecord(docId, "video",
          aviMovieBytes(BmpWidth, h, frames, AviMicros((docId % 5).toInt), framePx))
    }
  }

  /** Decode one AVI record by walking the RIFF tree: find avih geometry
    * inside LIST/hdrl, then iterate LIST/movi's '00db' frame chunks.
    * Geometry is untrusted (the BMP lesson): a frame chunk whose declared
    * size disagrees with stride·height, or chunk bounds past the payload,
    * end the walk with what was decoded so far. */
  def decodeVideo(r: MediaRecord): VideoSignal = {
    val b = r.payload
    def failed = VideoSignal(r.doc_id, 0L, 0L, 0L, 0L, None, None, None, None)
    if (b.length < 12 || !fourcc(b, 0, "RIFF") || !fourcc(b, 8, "AVI ")) return failed
    var width = -1L; var height = -1L
    var nFrames = 0L; var nPixels = 0L
    var sb = 0L; var sg = 0L; var sr = 0L
    var motionSum = 0L; var motionBytes = 0L
    var prev: Array[Byte] = null
    var stride = 0
    var pos = 12
    while (pos + 8 <= b.length) {
      val size = readLe32(b, pos + 4)
      val end = pos + 8 + size
      if (size < 0 || end > b.length) return failed
      if (fourcc(b, pos, "LIST") && size >= 4) {
        if (fourcc(b, pos + 8, "hdrl")) {
          // avih is hdrl's first child chunk; read geometry by offset
          // within the chunk the walk located (not a global constant)
          if (size >= 4 + 8 + 56 && fourcc(b, pos + 12, "avih")) {
            width = readLe32(b, pos + 20 + 32)
            height = readLe32(b, pos + 20 + 36)
            if (width < 0 || width > Int.MaxValue / 4) return failed
            stride = (((3 * width + 3) / 4) * 4).toInt
          }
        } else if (fourcc(b, pos + 8, "movi") && width >= 0) {
          var fp = pos + 12
          while (fp + 8 <= end.toInt) {
            val fsize = readLe32(b, fp + 4).toInt
            // Long-side bound: an Int sum wraps negative for fsize near
            // 2^31 and would bypass the check (see decodeMjpeg)
            if (fsize < 0 || fp.toLong + 8 + fsize > end) return failed
            if (fourcc(b, fp, "00db")) {
              if (height >= 0 && fsize.toLong != stride.toLong * height) return failed
              nFrames += 1
              var y = 0
              while (y < height) { // stride-correct: padding bytes skipped
                val row = fp + 8 + y * stride
                var x = 0
                while (x < width) {
                  val p = row + 3 * x
                  sb += u8(b(p)); sg += u8(b(p + 1)); sr += u8(b(p + 2))
                  x += 1
                }
                y += 1
              }
              nPixels += (width * height)
              if (prev != null && fsize == prev.length) {
                var j = 0
                while (j < fsize) {
                  motionSum += math.abs(u8(b(fp + 8 + j)) - u8(prev(j)))
                  j += 1
                }
                motionBytes += fsize.toLong
              }
              prev = java.util.Arrays.copyOfRange(b, fp + 8, fp + 8 + fsize)
            }
            fp += 8 + fsize + (fsize & 1) // RIFF chunks pad to even
          }
        }
      }
      pos = (end + (size & 1)).toInt
    }
    if (width < 0 || height < 0) return failed
    def mean(s: Long) = if (nPixels > 0) Some(s.toDouble / nPixels.toDouble) else None
    val motion =
      if (motionBytes > 0) Some(motionSum.toDouble / motionBytes.toDouble) else None
    VideoSignal(r.doc_id, nFrames, width, height, nPixels,
      mean(sb), mean(sg), mean(sr), motion)
  }

  /** Driver query: frame-level video stats over the all-docs AVI table. */
  def video(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaVideoFromDocuments(spark, dir).mapPartitions(_.map(decodeVideo)).toDF()
  }

  // ------------------------------------------------------------------
  // MJPEG AVI decode (r16, closing the r15 verdict's "out of JDK reach"
  // correction): '00dc' compressed frames whose payloads are REAL JPEG
  // streams, decoded with javax.imageio — a codec every JDK ships, so
  // still zero new dependencies. Determinism contract: JPEG DECODE
  // geometry (frame count, width, height, pixel count) is spec-pinned and
  // identical on every conformant decoder — those columns are the driver-
  // hash-gated surface. Decoded PIXEL VALUES go through an IDCT whose
  // rounding is implementation-defined (ISO/IEC 10918 fixes accuracy
  // bounds, not bits), so per-channel means are deliberately NOT in the
  // gated projection; MultimodalSpec pins them on this JDK with a ±2
  // tolerance and documents the cross-build caveat.
  // ------------------------------------------------------------------

  /** JPEG dimensions used by the MJPEG synthesis: two 8×8 DCT blocks per
    * axis — exercises real block layout without inflating payloads. */
  val JpegDim = 16

  /** ImageIO's default stream cache is DISK-backed: every `ImageIO.read`/
    * `write` call creates and deletes a temp FILE, which serializes the
    * parallel MJPEG encode/decode on temp-dir locks (measured r17: the
    * 32-way repartitioned decode got SLOWER than single-threaded until
    * this flipped). The in-memory cache changes transport only — encoded
    * bytes and decoded pixels are bit-identical. JVM-global by ImageIO's
    * design; set once per JVM at object init (executors touch this object
    * through the codec closures, so it lands everywhere the codecs run). */
  private val _imageIoMemCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** One REAL JPEG frame: a solid (r,g,b) [[JpegDim]]² image through the
    * JDK's own encoder. Solid frames keep the spec's pixel assertions
    * tight (DC-only blocks reconstruct near-exactly). */
  def jpegFrameBytes(r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      JpegDim, JpegDim, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < JpegDim) {
      var x = 0
      while (x < JpegDim) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** RIFF/AVI with '00dc' (compressed) frame chunks — the [[aviMovieBytes]]
    * tree with MJPEG payloads; odd-sized JPEG chunks get the RIFF pad byte
    * (declared size stays the actual payload size, per spec). */
  def mjpegMovieBytes(frames: Seq[Array[Byte]], microsPerFrame: Long): Array[Byte] = {
    val chunks = frames.flatMap { jp =>
      "00dc".getBytes("US-ASCII") ++ le32(jp.length.toLong) ++ jp ++
        (if ((jp.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    }.toArray
    val movi = "LIST".getBytes("US-ASCII") ++ le32(4L + chunks.length) ++
      "movi".getBytes("US-ASCII") ++ chunks
    val hdrl = "LIST".getBytes("US-ASCII") ++ le32(4L + 8L + 56L) ++
      "hdrl".getBytes("US-ASCII") ++
      "avih".getBytes("US-ASCII") ++ le32(56) ++
      le32(microsPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(JpegDim.toLong) ++ le32(JpegDim.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    "RIFF".getBytes("US-ASCII") ++ le32(4L + hdrl.length + movi.length) ++
      "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
  }

  /** The MJPEG media table: every document becomes an AVI of 2 + doc_id%3
    * solid-color JPEG frames, frame k's channels doc_id/k-derived — the
    * same deterministic-synthesis contract as every other media table. */
  def mediaMjpegFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    // repartition by doc_id before the per-row JPEG encode: the documents
    // scan is 1-2 input splits at gate SFs, which single-threads the
    // encode AND the downstream ImageIO decode (optimization r17, guide
    // §2.5 input-parallelism; row-local synthesis, so values are unchanged)
    Tables.documents(spark, dir).select("doc_id")
      .repartition(col("doc_id")).as[Long].map { docId =>
      val frames = (2 + docId % 3).toInt
      val jps = (0 until frames).map { k =>
        jpegFrameBytes(((docId * 31 + k * 17) % 256).toInt,
          ((docId * 53 + k * 29) % 256).toInt,
          ((docId * 97 + k * 41) % 256).toInt)
      }
      MediaRecord(docId, "mjpeg", mjpegMovieBytes(jps, AviMicros((docId % 5).toInt)))
    }
  }

  /** Decoded-MJPEG stats. Geometry columns are decoder-independent (the
    * gated surface); per-channel means are IDCT-implementation-defined
    * (spec-covered, see the section doc). */
  case class MjpegSignal(
      doc_id: Long,
      n_frames: Long,
      width: Long,
      height: Long,
      n_units: Long,
      mean_r: Option[Double],
      mean_g: Option[Double],
      mean_b: Option[Double])

  /** Walk the RIFF tree and ImageIO-decode every '00dc' chunk. Geometry
    * comes from the DECODED images (img.getWidth), not the header — the
    * gate proves the codec actually ran. Untrusted-input contract as
    * everywhere: bad bounds or an undecodable payload end the walk with
    * the failed record. */
  def decodeMjpeg(r: MediaRecord): MjpegSignal = {
    val b = r.payload
    def failed = MjpegSignal(r.doc_id, 0L, 0L, 0L, 0L, None, None, None)
    if (b.length < 12 || !fourcc(b, 0, "RIFF") || !fourcc(b, 8, "AVI ")) return failed
    var nFrames = 0L; var nPixels = 0L
    var w = -1L; var h = -1L
    var sr = 0L; var sg = 0L; var sb = 0L
    var pos = 12
    while (pos + 8 <= b.length) {
      val size = readLe32(b, pos + 4)
      val end = pos + 8 + size
      if (size < 0 || end > b.length) return failed
      if (fourcc(b, pos, "LIST") && size >= 4 && fourcc(b, pos + 8, "movi")) {
        var fp = pos + 12
        while (fp + 8 <= end.toInt) {
          val fsize = readLe32(b, fp + 4).toInt
          // bound check in Long (advice r16): fsize near 2^31 overflows
          // the Int sum to negative and would bypass the bound — fail
          // closed here, not by luck of ImageIO rejecting the garbage
          if (fsize < 0 || fp.toLong + 8 + fsize > end) return failed
          if (fourcc(b, fp, "00dc")) {
            val img = try {
              javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
                b, fp + 8, fsize))
            } catch { case _: java.io.IOException => null }
            if (img == null) return failed
            if (w < 0) { w = img.getWidth.toLong; h = img.getHeight.toLong }
            else if (w != img.getWidth || h != img.getHeight) return failed
            nFrames += 1
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val px = img.getRGB(x, y)
                sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff; sb += px & 0xff
                x += 1
              }
              y += 1
            }
            nPixels += img.getWidth.toLong * img.getHeight
          }
          fp += 8 + fsize + (fsize & 1)
        }
      }
      pos = (end + (size & 1)).toInt
    }
    if (w < 0) return failed
    def mean(v: Long) = if (nPixels > 0) Some(v.toDouble / nPixels.toDouble) else None
    MjpegSignal(r.doc_id, nFrames, w, h, nPixels, mean(sr), mean(sg), mean(sb))
  }

  /** Full decode surface (means included) — the spec's entry. */
  private[graft] def mjpegFull(spark: SparkSession, dir: String): Dataset[MjpegSignal] = {
    import spark.implicits._
    mediaMjpegFromDocuments(spark, dir).mapPartitions(_.map(decodeMjpeg))
  }

  /** Driver query: the decoder-independent geometry surface (see the
    * section doc for why means stay out of the gated projection). */
  def mjpeg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    mjpegFull(spark, dir).toDF()
      .select(col("doc_id"), col("n_frames"), col("width"), col("height"),
        col("n_units"))
  }
}
