package graft

import graft.dedup.DupSpans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def craftedDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dupspans").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private val P = (1 to 8).map(i => s"p$i").mkString(" ")  // 8-word shared passage
  private val Q = (1 to 9).map(i => s"q$i").mkString(" ")  // 9-word shared passage

  private def corpus = craftedDir(Seq(
    // P once after a 12-word unique prefix: span [12,19], 8/20 = 0.4 → kept
    (0L, (1 to 12).map(i => s"a$i").mkString(" ") + " " + P, "en", "s0"),
    // P after 4 unique + 2 unique after: span [4,11], 8/14 ≈ 0.571 → dropped
    (1L, (1 to 4).map(i => s"b$i").mkString(" ") + " " + P + " b5 b6", "en", "s0"),
    // P twice back-to-back: adjacent islands merge → ONE span [0,15], frac 1.0
    (2L, P + " " + P, "en", "s0"),
    // all-unique doc: zero spans
    (3L, (1 to 10).map(i => s"c$i").mkString(" "), "en", "s0"),
    // shorter than one gram: zero grams, zero spans
    (4L, "d1 d2 d3 d4 d5", "en", "s0"),
    // Q (9 words) shared with doc 6: the two overlapping dup grams inside Q
    // merge → one span of 9 tokens; 9/11 → dropped
    (5L, "f1 f2 " + Q, "en", "s0"),
    // Q + 9 unique words: 9/18 = 0.5 sits exactly on the keep boundary → kept
    (6L, Q + " " + (1 to 9).map(i => s"g$i").mkString(" "), "en", "s0")))

  test("dup spans: hand-computed islands, merge rules, keep boundary") {
    val rows = DupSpans.dupSpans(spark, corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def check(id: Long, nTok: Long, nSpans: Long, dupTok: Long, kept: Boolean) = {
      val r = rows(id)
      assert(r.getAs[Long]("n_tokens") == nTok, s"doc $id n_tokens")
      assert(r.getAs[Long]("n_dup_spans") == nSpans, s"doc $id n_dup_spans")
      assert(r.getAs[Long]("dup_tokens") == dupTok, s"doc $id dup_tokens")
      assert(r.getAs[Double]("dup_frac") == dupTok.toDouble / nTok, s"doc $id dup_frac")
      assert(r.getAs[Boolean]("is_kept") == kept, s"doc $id is_kept")
    }
    check(0L, 20, 1, 8, kept = true)   // 0.4 under budget
    check(1L, 14, 1, 8, kept = false)  // 0.571 over budget
    check(2L, 16, 1, 16, kept = false) // adjacent spans merged into one island
    check(3L, 10, 0, 0, kept = true)
    check(4L, 5, 0, 0, kept = true)    // too short for any gram
    check(5L, 11, 1, 9, kept = false)  // overlapping dup grams merged
    check(6L, 18, 1, 9, kept = true)   // 0.5 is ON the boundary → kept
  }

  test("islands are maximal and disjoint per document") {
    val isl = DupSpans.islands(spark, corpus).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    isl.foreach { case (_, spans) =>
      val sorted = spans.map(r =>
        (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).sortBy(_._1)
      sorted.foreach { case (s, e) => assert(s <= e) }
      // maximal: consecutive islands are separated by a gap > 1
      sorted.zip(sorted.drop(1)).foreach { case ((_, e1), (s2, _)) =>
        assert(s2 > e1 + 1, "adjacent/overlapping islands were not merged")
      }
    }
    // doc 2's single island spans the whole doubled passage
    val d2 = isl(2L).map(r =>
      (r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
    assert(d2.toSeq == Seq((0L, 15L)))
  }

  test("collapsed path: a 3x-duplicated corpus reproduces the direct semantics") {
    // every doc gets two exact twins → duplication factor 3 engages the
    // collapse; every gram of every >=8-token doc is now corpus-duplicated,
    // so full coverage is the hand-computable expectation
    val base = Seq(
      (0L, (1 to 12).map(i => s"a$i").mkString(" ") + " " + P, 20L),
      (3L, (1 to 10).map(i => s"c$i").mkString(" "), 10L),
      (4L, "d1 d2 d3 d4 d5", 5L))
    val tmp = craftedDir(for {
      (id, text, _) <- base
      copy <- Seq(0L, 100L, 200L)
    } yield (id + copy, text, "en", "s0"))
    val rows = DupSpans.dupSpans(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 9, "every copy reported")
    for ((id, _, nTok) <- base; copy <- Seq(0L, 100L, 200L)) {
      val r = rows(id + copy)
      assert(r.getAs[Long]("n_tokens") == nTok)
      if (nTok >= DupSpans.N) {
        // one island covering the whole doc
        assert(r.getAs[Long]("n_dup_spans") == 1 &&
          r.getAs[Long]("dup_tokens") == nTok &&
          !r.getAs[Boolean]("is_kept"))
      } else {
        assert(r.getAs[Long]("n_dup_spans") == 0 &&
          r.getAs[Long]("dup_tokens") == 0 && r.getAs[Boolean]("is_kept"))
      }
    }
  }

  test("span removal: hand-computed cleaned texts") {
    val rows = DupSpans.spanRemoval(spark, corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def check(id: Long, nTok: Long, nRemoved: Long, cleaned: String) = {
      val r = rows(id)
      assert(r.getAs[Long]("n_tokens") == nTok, s"doc $id n_tokens")
      assert(r.getAs[Long]("n_removed") == nRemoved, s"doc $id n_removed")
      assert(r.getAs[String]("cleaned_text") == cleaned, s"doc $id cleaned_text")
    }
    check(0L, 20, 8, (1 to 12).map(i => s"a$i").mkString(" ")) // island cut from the tail
    check(1L, 14, 8, "b1 b2 b3 b4 b5 b6")                      // island cut from the middle
    check(2L, 16, 16, "")                                      // whole doc is one island
    check(3L, 10, 0, (1 to 10).map(i => s"c$i").mkString(" ")) // untouched
    check(4L, 5, 0, "d1 d2 d3 d4 d5")                          // too short for grams
    check(5L, 11, 9, "f1 f2")
    check(6L, 18, 9, (1 to 9).map(i => s"g$i").mkString(" "))
  }

  test("span removal collapsed path: exact twins all clean to the keeper's text") {
    val base = Seq(
      (0L, (1 to 12).map(i => s"a$i").mkString(" ") + " " + P, 20L),
      (3L, (1 to 10).map(i => s"c$i").mkString(" "), 10L),
      (4L, "d1 d2 d3 d4 d5", 5L))
    val tmp = craftedDir(for {
      (id, text, _) <- base
      copy <- Seq(0L, 100L, 200L)
    } yield (id + copy, text, "en", "s0"))
    val rows = DupSpans.spanRemoval(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 9)
    for ((id, text, nTok) <- base; copy <- Seq(0L, 100L, 200L)) {
      val r = rows(id + copy)
      assert(r.getAs[Long]("n_tokens") == nTok)
      if (nTok >= DupSpans.N)
        assert(r.getAs[String]("cleaned_text") == "" &&
          r.getAs[Long]("n_removed") == nTok)
      else
        assert(r.getAs[String]("cleaned_text") == text &&
          r.getAs[Long]("n_removed") == 0L)
    }
  }

  test("corpus run: every doc reported once, fractions in [0,1]") {
    val rows = DupSpans.dupSpans(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val f = r.getAs[Double]("dup_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("dup_tokens") <= r.getAs[Long]("n_tokens"))
    }
  }
}
