package graft

import graft.multimodal.{MediaRecord, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("decode stub is deterministic and content-addressed") {
    val r = MediaRecord(7L, "image", "some fake image bytes".getBytes("UTF-8"))
    val a = Multimodal.decodeStub(r)
    val b = Multimodal.decodeStub(r)
    assert(a == b)
    assert(a.n_bytes == 21)
    assert(a.content_digest.matches("[0-9a-f]{64}"))
    assert(a.magic_hex.length == 8)
    assert(a.fake_width >= 64 && a.fake_height >= 64)
    // offsets are a comma-joined string so the frame stays oracle-comparable
    assert(a.sample_offsets.split(",").length == 5)
    // content-addressed dims: h = first 24 digest bits (portable hex parse)
    val h = java.lang.Long.parseLong(a.content_digest.substring(0, 6), 16)
    assert(a.fake_width == 64 + h % 1857)
    assert(a.fake_height == 64 + (h / 1857) % 1017)
  }

  test("batch extraction covers every document with typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    assert(feats.map(_.media_type).toSet == Set("image", "audio", "video"))
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      val offs = f.sample_offsets.split(",").map(_.toLong)
      assert(offs.length == 5)
      assert(offs.forall(o => o >= 0 && o < math.max(1, f.n_bytes) * 5))
    }
  }
}
