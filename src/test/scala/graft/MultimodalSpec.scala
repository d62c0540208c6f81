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
}
