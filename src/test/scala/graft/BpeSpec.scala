package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def planted(ws: (String, Long)*) = {
    import spark.implicits._
    ws.toSeq.toDF("word", "n")
  }

  test("pair stats count overlapping occurrences; greedy merge is leftmost") {
    // 'aaab'x5: pairs (a,a)x2 weighted 5 -> 10 beats (a,b)=5 and (b,</w>)=5.
    // Greedy application merges positions 1-2 only (3 overlaps 2):
    // [aa, a, b, </w>]
    val m = Bpe.mergesFromWords(spark, planted(("aaab", 5L)), 2).collect()
    assert(m(0).getString(1) == "a" && m(0).getString(2) == "a")
    assert(m(0).getLong(3) == 10L)
    // round 2 ties at 5 between (a,b), (aa,a), (b,</w>) — (a,b) wins the
    // (lhs, rhs) ASC tie-break
    assert(m(1).getString(1) == "a" && m(1).getString(2) == "b")
    assert(m(1).getLong(3) == 5L)
  }

  test("even-length runs merge fully: 'aaaa' collapses to [aa, aa, </w>]") {
    // 'aaaa': (a,a) occurs 3x (overlapping); greedy keeps matches at
    // offsets 0 and 2 -> [aa, aa, </w>]. Round 2 ties (aa,aa) with
    // (aa,</w>) at 3 — '</w>' sorts before 'aa' byte-wise, so the
    // boundary pair wins the rhs ASC tie-break.
    val m = Bpe.mergesFromWords(spark, planted(("aaaa", 3L)), 2).collect()
    assert(m(0).getString(1) == "a" && m(0).getLong(3) == 9L) // 3 pairs x 3
    assert(m(1).getString(1) == "aa" && m(1).getString(2) == "</w>")
    assert(m(1).getLong(3) == 3L)
  }

  test("merged symbols chain across rounds (the 'lo' -> 'low' ladder)") {
    // the paper's canonical example shape: frequent word 'low' drives
    // l+o, then lo+w, then low+</w>
    val m = Bpe.mergesFromWords(spark,
      planted(("low", 100L), ("xq", 1L)), 3).collect()
    val seq = m.map(r => (r.getString(1), r.getString(2))).toSeq
    assert(seq == Seq(("l", "o"), ("lo", "w"), ("low", "</w>")), seq.toString)
  }

  test("corpus run: 20 ranked merges, counts non-increasing in no round jump up past earlier maxima") {
    val out = Bpe.bpeMerges(spark, dir).collect()
    assert(out.length == 20)
    assert(out.map(_.getLong(0)).toSeq == (1L to 20L))
    // counts need not be monotone (merges create new pairs), but every
    // count is positive and the first is the corpus' global max pair count
    assert(out.forall(_.getLong(3) > 0))
  }

  test("encode: merges only ever SHRINK the symbol count, never below word count") {
    val out = graft.text.Bpe.bpeEncode(spark, dir).persist()
    // pre-merge symbols = chars + one </w> per word; encoded length is
    // between n_words (fully merged) and that ceiling
    assert(out.filter(col("n_bpe_tokens") > col("n_chars") + col("n_words"))
      .count() == 0, "encoding inflated a document")
    assert(out.filter(col("n_words") > 0 && col("n_bpe_tokens") < col("n_words"))
      .count() == 0, "a word encoded below one token")
    // the corpus as a whole must actually save something with 20 merges
    val agg = out.agg(sum("n_bpe_tokens"), sum("n_chars"), sum("n_words")).head
    assert(agg.getLong(0) < agg.getLong(1) + agg.getLong(2),
      "20 merges saved nothing corpus-wide")
    assert(out.filter(col("saved_ppm") < 0).count() == 0)
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("strict contract: impossible merge budget throws") {
    val e = intercept[IllegalArgumentException] {
      Bpe.mergesFromWords(spark, planted(("ab", 1L)), 10).collect()
    }
    assert(e.getMessage.contains("exhausted"))
  }
}
