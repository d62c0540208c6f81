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
    assert(a.sample_offsets.length == 5)
  }

  test("batch extraction covers every document with typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    assert(feats.map(_.media_type).toSet == Set("image", "audio", "video"))
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.sample_offsets.forall(o => o >= 0 && o < math.max(1, f.n_bytes) * 5))
    }
  }
}
