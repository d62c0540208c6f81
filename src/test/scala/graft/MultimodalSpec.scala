package graft

import graft.multimodal.{MediaRecord, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("decode genuinely parses a PNG IHDR header") {
    val body = "pixel payload".getBytes("UTF-8")
    val r = MediaRecord(7L, "image", Multimodal.pngBytes(640, 480, body))
    val f = Multimodal.decode(r)
    assert(f.width.contains(640L) && f.height.contains(480L))
    assert(f.sample_rate.isEmpty && f.channels.isEmpty)
    assert(f.magic_hex == "89504e47")
    assert(f.n_bytes == 33 + body.length)
    assert(f.n_frames == 1L)
    // digest covers the BODY (content), not the container header
    val bodyDigest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(body).map(b => f"$b%02x").mkString
    assert(f.content_digest == bodyDigest)
  }

  test("decode genuinely parses a WAV fmt header") {
    val body = "sample payload".getBytes("UTF-8")
    val r = MediaRecord(8L, "audio", Multimodal.wavBytes(44100, 2, body))
    val f = Multimodal.decode(r)
    assert(f.sample_rate.contains(44100L) && f.channels.contains(2L))
    assert(f.width.isEmpty && f.height.isEmpty)
    assert(f.magic_hex == "52494646") // "RIFF"
    assert(f.n_bytes == 44 + body.length)
  }

  test("decode genuinely parses an AVI avih header") {
    val body = "frame payload".getBytes("UTF-8")
    val r = MediaRecord(9L, "video", Multimodal.aviBytes(1280, 720, 240, 33333, body))
    val f = Multimodal.decode(r)
    assert(f.width.contains(1280L) && f.height.contains(720L))
    assert(f.n_frames == 240L)
    assert(f.sample_rate.isEmpty && f.channels.isEmpty)
    assert(f.magic_hex == "52494646") // "RIFF", like WAV — fourcc at 8 disambiguates
    assert(f.n_bytes == 88 + body.length)
    val bodyDigest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(body).map(b => f"$b%02x").mkString
    assert(f.content_digest == bodyDigest) // digest covers the body, not the header
  }

  test("container-less payloads decode to bare byte features") {
    val bytes = "opaque blob with no container".getBytes("UTF-8")
    val a = Multimodal.decode(MediaRecord(10L, "video", bytes))
    assert(a == Multimodal.decode(MediaRecord(10L, "video", bytes))) // deterministic
    assert(a.width.isEmpty && a.sample_rate.isEmpty && a.n_frames == 1L)
    assert(a.content_digest.matches("[0-9a-f]{64}"))
    assert(a.sample_offsets.split(",").length == 5)
  }

  test("decodeSignal reads PCM16 samples via a real RIFF chunk walk") {
    // hand-built samples incl. both full-scale clip values and an LE pair
    val samples = Array[Short](0, 100, -100, 32767, -32768, 258) // 258 = 0x0102
    val body = samples.flatMap(s => Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val r = MediaRecord(1L, "audio", Multimodal.wavBytes(16000, 1, body))
    val g = Multimodal.decodeSignal(r)
    assert(g.n_units == 6L)
    assert(g.peak_abs.contains(32768L))
    assert(g.clip_count.contains(2L))
    val ss = samples.map(s => s.toLong * s).sum
    assert(g.rms.contains(math.sqrt(ss.toDouble / 6.0)))
    assert(g.mean_b.isEmpty && g.mean_g.isEmpty && g.mean_r.isEmpty)
    // odd trailing byte is ignored (not half a sample)
    val odd = Multimodal.decodeSignal(
      MediaRecord(2L, "audio", Multimodal.wavBytes(16000, 1, body :+ 0x7f.toByte)))
    assert(odd.n_units == 6L && odd.rms == g.rms)
  }

  test("decodeSignal walks past a non-data RIFF chunk (odd size, even-padded)") {
    // splice a 3-byte junk chunk between fmt and data: the walk must skip
    // size + pad, not assume the canonical 44-byte layout
    val body = Array[Byte](10, 0, 20, 0) // samples 10, 20
    val wav = Multimodal.wavBytes(8000, 1, body)
    val (head, dataChunk) = wav.splitAt(36)
    val junk = "junk".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val g = Multimodal.decodeSignal(MediaRecord(3L, "audio", head ++ junk ++ dataChunk))
    assert(g.n_units == 2L && g.peak_abs.contains(20L))
  }

  test("decodeSignal reads BMP pixels honoring the padded row stride") {
    // width 3 → rowSize ((9+3)/4)*4 = 12: 3 pad bytes per row that the
    // channel means MUST exclude (set to 0xFF to catch inclusion)
    val row0 = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, -1, -1, -1)
    val row1 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, -1, -1, -1)
    val g = Multimodal.decodeSignal(
      MediaRecord(4L, "image", Multimodal.bmpBytes(3, 2, row0 ++ row1)))
    assert(g.n_units == 6L)
    assert(g.mean_b.contains((1 + 4 + 7 + 10 + 40 + 70) / 6.0))
    assert(g.mean_g.contains((2 + 5 + 8 + 20 + 50 + 80) / 6.0))
    assert(g.mean_r.contains((3 + 6 + 9 + 30 + 60 + 90) / 6.0))
    assert(g.peak_abs.isEmpty && g.rms.isEmpty)
    // zero-height BMP: no pixels, null means
    val z = Multimodal.decodeSignal(
      MediaRecord(5L, "image", Multimodal.bmpBytes(4, 0, Array.empty)))
    assert(z.n_units == 0L && z.mean_b.isEmpty)
  }

  test("decodeSignal rejects untrusted BMP geometry instead of overrunning") {
    // overstated height: 100 declared rows over a 2-row payload — must be
    // a decode-failure row (n_units 0), not ArrayIndexOutOfBounds
    val good = Multimodal.bmpBytes(4, 2, Array.fill[Byte](24)(7))
    val overH = good.clone()
    overH(22) = 100 // biHeight LE byte 0
    val f = Multimodal.decodeSignal(MediaRecord(6L, "image", overH))
    assert(f.n_units == 0L && f.mean_b.isEmpty)
    // overstated dataOff past the payload: failure row too
    val overOff = good.clone()
    overOff(10) = 127 // bfOffBits LE byte 0 → pixel region overruns
    assert(Multimodal.decodeSignal(MediaRecord(7L, "image", overOff)).n_units == 0L)
    // negative height (top-down BMP, spec-legal): |height| rows, identical
    // channel sums — means must match the bottom-up original
    val negH = good.clone()
    negH(22) = -2; negH(23) = -1; negH(24) = -1; negH(25) = -1 // -2 as LE32
    val up = Multimodal.decodeSignal(MediaRecord(8L, "image", good))
    val down = Multimodal.decodeSignal(MediaRecord(8L, "image", negH))
    assert(down.n_units == up.n_units && down.mean_b == up.mean_b &&
      down.mean_g == up.mean_g && down.mean_r == up.mean_r)
  }

  test("PNG pixel round-trip: all five scanline filters reverse exactly") {
    // 5 rows of width 4 → filter types 0..4 all exercised; arbitrary bytes
    val px = Array.tabulate[Byte](3 * 4 * 5)(i => ((i * 37 + 11) % 256).toByte)
    val png = Multimodal.pngPixelBytes(4, 5, px)
    // a genuine PNG: signature + parseable IHDR chunk
    assert(png.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val (w, h, got) = Multimodal.decodePngPixels(png).get
    assert(w == 4 && h == 5)
    assert(got.sameElements(px), "inflate+unfilter did not reproduce the raw pixels")
    // signal stats: RGB channel means over the original bytes
    val s = Multimodal.decodeSignal(MediaRecord(9L, "image", png))
    assert(s.n_units == 20L)
    def meanOf(ch: Int) = px.indices.filter(_ % 3 == ch).map(i => px(i) & 0xff).sum / 20.0
    assert(s.mean_r.contains(meanOf(0)) && s.mean_g.contains(meanOf(1)) &&
      s.mean_b.contains(meanOf(2)))
    // truncated IDAT: failure row, not a crash
    val cut = png.take(png.length - 20)
    assert(Multimodal.decodeSignal(MediaRecord(10L, "image", cut)).n_units == 0L)
  }

  test("signal covers every document with consistent stats") {
    val rows = Multimodal.signal(spark, dir).collect()
    val nExpected = Tables.documents(spark, dir).count()
    assert(rows.length == nExpected)
    rows.foreach { r =>
      val mt = r.getAs[String]("media_type")
      val n = r.getAs[Long]("n_units")
      if (mt == "audio" && n > 0) {
        assert(!r.isNullAt(r.fieldIndex("rms")) && r.getAs[Double]("rms") >= 0)
        assert(r.getAs[Long]("peak_abs") <= 32768L)
        assert(r.isNullAt(r.fieldIndex("mean_b")))
      }
      if (mt == "image" && n > 0) {
        Seq("mean_b", "mean_g", "mean_r").foreach { c =>
          val m = r.getAs[Double](c)
          assert(m >= 0 && m <= 255, s"$c out of byte range: $m")
        }
        assert(r.isNullAt(r.fieldIndex("rms")))
      }
    }
  }

  test("batch extraction parses container-derived metadata for every document") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    assert(feats.map(_.media_type).toSet == Set("image", "audio", "video"))
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      f.media_type match {
        case "image" =>
          // content-derived, parsed back out of the real IHDR bytes
          assert(f.width.exists(_ >= 64) && f.height.exists(_ >= 64))
          assert(f.magic_hex == "89504e47")
        case "audio" =>
          assert(f.sample_rate.exists(Set(8000L, 16000L, 22050L, 44100L, 48000L)))
          assert(f.channels.exists(c => c == 1L || c == 2L))
        case _ =>
          // parsed back out of the real avih bytes
          assert(f.width.exists(_ >= 320) && f.height.exists(_ >= 240))
          assert(f.n_frames >= 1 && f.n_frames <= 300)
          assert(f.magic_hex == "52494646")
      }
      val offs = f.sample_offsets.split(",").map(_.toLong)
      assert(offs.length == 5)
      assert(offs.forall(o => o >= 0 && o < math.max(1, f.n_bytes) * 5))
    }
  }

  test("decodeVideo walks a real movi list: frames, channel sums, motion") {
    // 2 rows of 4 px (24 bytes), 3 frames scrolled by one 12-byte row:
    // frame 0 = px, frame 1 = rows swapped, frame 2 = px again
    val px = Array.tabulate(24)(i => (i * 7 + 3).toByte)
    def scroll(k: Int): Array[Byte] = {
      val shift = (k * 12) % px.length
      px.drop(px.length - shift) ++ px.take(px.length - shift)
    }
    val payload = Multimodal.aviMovieBytes(4, 2, 3, 33333L, (0 until 3).map(scroll))
    val v = Multimodal.decodeVideo(MediaRecord(5L, "video", payload))
    assert(v.n_frames == 3 && v.width == 4 && v.height == 2 && v.n_units == 24)
    // channel means: every frame is a row permutation of px, so the sums
    // are 3x frame 0's per-channel sums
    def chSum(c: Int) = px.indices.filter(_ % 3 == c).map(px(_) & 0xff).sum.toLong
    assert(v.mean_b.contains(3 * chSum(0) / 24.0))
    assert(v.mean_g.contains(3 * chSum(1) / 24.0))
    assert(v.mean_r.contains(3 * chSum(2) / 24.0))
    // motion: each transition is the cyclic 12-shift |diff| total
    val m = px.indices.map(i => math.abs((px(i) & 0xff) - (px((i + 12) % 24) & 0xff))).sum
    assert(v.motion.contains(2L * m / 48.0))
  }

  test("decodeVideo rejects untrusted geometry instead of overrunning") {
    val px = Array.tabulate(24)(_.toByte)
    val good = Multimodal.aviMovieBytes(4, 2, 1, 33333L, Seq(px))
    // (a) frame chunk whose size disagrees with avih stride*height
    val badFrame = good.clone()
    // movi frame chunk size field sits 4 bytes after the '00db' tag
    val db = good.indexOfSlice("00db".getBytes("US-ASCII"))
    badFrame(db + 4) = 12 // declared 12 != stride(12)*height(2)
    val v1 = Multimodal.decodeVideo(MediaRecord(1L, "video", badFrame))
    assert(v1.n_frames == 0 && v1.n_units == 0 && v1.mean_b.isEmpty)
    // (b) top-level chunk size past the payload end
    val badSize = good.clone()
    badSize(db + 4) = -1 // 0xff..: size > remaining bytes
    val v2 = Multimodal.decodeVideo(MediaRecord(2L, "video", badSize))
    assert(v2.n_frames == 0 && v2.mean_b.isEmpty)
    // (c) truncated payload: movi list cut mid-frame
    val v3 = Multimodal.decodeVideo(MediaRecord(3L, "video", good.take(good.length - 5)))
    assert(v3.n_units == 0)
  }

  test("video covers every document; zero-height docs decode empty") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.video(spark, dir).persist()
    val n = Tables.documents(spark, dir).count()
    assert(out.count() == n)
    // frames always parse (2-4 per doc), geometry is width 4
    assert(out.filter(col("n_frames") < 2 || col("n_frames") > 4).count() == 0)
    assert(out.filter(col("width") =!= 4).count() == 0)
    // pixel-bearing docs carry means in [0, 255] and motion in [0, 255]
    val withPx = out.filter(col("n_units") > 0)
    assert(withPx.filter(col("mean_b") < 0 || col("mean_b") > 255).count() == 0)
    assert(withPx.filter(col("motion") < 0 || col("motion") > 255).count() == 0)
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("MJPEG: ImageIO decodes every '00dc' frame; geometry is exact") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.mjpegFull(spark, dir).toDF().persist()
    val n = Tables.documents(spark, dir).count()
    assert(out.count() == n)
    assert(out.filter(col("n_frames") =!= lit(2) + col("doc_id") % 3).count() == 0,
      "frame count must equal the synthesis closed form for every doc")
    assert(out.filter(col("width") =!= Multimodal.JpegDim ||
      col("height") =!= Multimodal.JpegDim).count() == 0)
    assert(out.filter(col("n_units") =!=
      col("n_frames") * Multimodal.JpegDim * Multimodal.JpegDim).count() == 0)
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("MJPEG: solid-frame decoded means are within IDCT tolerance") {
    // Decoded pixels pass through an implementation-defined IDCT, so the
    // assertion is a ±2.5/255 tolerance on THIS JDK, not a hash — the
    // reason the driver query gates geometry only. Single-frame doc: the
    // mean must sit near the encoded solid color.
    val sig = Multimodal.decodeMjpeg(MediaRecord(0L, "mjpeg",
      Multimodal.mjpegMovieBytes(Seq(Multimodal.jpegFrameBytes(200, 100, 50)), 33333L)))
    assert(sig.n_frames == 1 && sig.width == Multimodal.JpegDim)
    assert(math.abs(sig.mean_r.get - 200.0) <= 2.5, s"mean_r ${sig.mean_r.get}")
    assert(math.abs(sig.mean_g.get - 100.0) <= 2.5, s"mean_g ${sig.mean_g.get}")
    assert(math.abs(sig.mean_b.get - 50.0) <= 2.5, s"mean_b ${sig.mean_b.get}")
  }

  test("MJPEG: corrupt payloads fail closed") {
    val good = Multimodal.mjpegMovieBytes(
      Seq(Multimodal.jpegFrameBytes(10, 20, 30)), 33333L)
    // truncated mid-JPEG: ImageIO read fails -> failed record
    val cut = Multimodal.decodeMjpeg(MediaRecord(1L, "mjpeg", good.take(good.length - 9)))
    assert(cut.n_frames == 0 && cut.mean_r.isEmpty)
    // non-RIFF header
    val junk = Multimodal.decodeMjpeg(MediaRecord(2L, "mjpeg", Array.fill[Byte](64)(7)))
    assert(junk.n_frames == 0)
  }
}
