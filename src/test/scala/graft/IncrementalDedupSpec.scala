package graft

import graft.dedup.IncrementalDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def craftedDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("incdedup").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("batch vs corpus: precedence, normalization, within-batch keeper") {
    val tmp = craftedDir(Seq(
      // settled corpus (source != src0)
      (10L, "hello world", "en", "src1"),
      (11L, "hello world", "en", "src2"),   // corpus-internal dup — NOT re-deduped
      (12L, "foo bar", "en", "src1"),
      // the new batch
      (0L, "hello  WORLD ", "en", "src0"),  // normalizes to the corpus hash
      (1L, "new stuff", "en", "src0"),      // first of a batch pair
      (2L, "new stuff", "en", "src0"),      // second → batch dup of 1
      (3L, "genuinely novel", "en", "src0"),
      (4L, "hello world", "en", "src0")))   // corpus match wins over batch dup of 0
    val rows = IncrementalDedup.incrementalDedup(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 5, "one row per batch doc, corpus docs absent")
    def check(id: Long, decision: String, keeper: Any) = {
      assert(rows(id).getAs[String]("decision") == decision, s"doc $id decision")
      assert(rows(id).getAs[Any]("keeper_id") == keeper, s"doc $id keeper")
    }
    check(0L, "drop_exact", 10L)      // min corpus doc_id, not 11
    check(1L, "keep", null)
    check(2L, "drop_batch_dup", 1L)
    check(3L, "keep", null)
    check(4L, "drop_exact", 10L)      // precedence: corpus match beats batch dup
  }

  test("corpus run: decisions partition the batch, keepers are consistent") {
    val rows = IncrementalDedup.incrementalDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[String]("decision")
      assert(Set("drop_exact", "drop_batch_dup", "keep")(d))
      if (d == "keep") assert(r.isNullAt(r.fieldIndex("keeper_id")))
      else {
        assert(!r.isNullAt(r.fieldIndex("keeper_id")))
        if (d == "drop_batch_dup")
          assert(r.getAs[Long]("keeper_id") < r.getAs[Long]("doc_id"))
      }
    }
  }

  test("incremental near-dup: corpus match beats batch match, keep is residual") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val tmp = craftedDir(Seq(
      // corpus doc 5 ~ batch doc 100 (high overlap, not exact)
      (5L, base, "en", "corpus"),
      (6L, (1 to 30).map(i => s"u$i").mkString(" "), "en", "corpus"),
      // batch: 100 near-dups corpus 5; 101/102 near-dup each other only;
      // 103 unique
      (100L, base + " extra1 extra2", "en", "src0"),
      (101L, (1 to 35).map(i => s"v$i").mkString(" "), "en", "src0"),
      (102L, (1 to 35).map(i => s"v$i").mkString(" ") + " v36", "en", "src0"),
      (103L, (1 to 25).map(i => s"w$i").mkString(" "), "en", "src0")))
    val out = graft.dedup.IncrementalDedup.incrementalNearDup(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("decision"),
          if (r.isNullAt(r.fieldIndex("keeper_id"))) -1L else r.getAs[Long]("keeper_id"))).toMap
    assert(out.keySet == Set(100L, 101L, 102L, 103L), "batch docs only")
    assert(out(100L) == (("drop_near_corpus", 5L)), out(100L))
    assert(out(101L) == (("keep", -1L)), "earlier batch doc keeps")
    assert(out(102L) == (("drop_near_batch", 101L)), out(102L))
    assert(out(103L) == (("keep", -1L)))
    spark.catalog.clearCache()
  }

  test("near-dup collapse path is bit-identical to the direct path on a duplicated corpus") {
    import spark.implicits._
    // verbatim twins on BOTH sides (corpus content duplicated into the
    // batch, twins within the batch, twins within the corpus), plus a
    // near-match, a batch-only pair, and a shingle-ineligible short doc
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight", "src1"),
      (2L, "the quick brown fox jumps over the lazy dog tonight", "src2"), // corpus twin of 1
      (3L, "an entirely different corpus document about spark shuffles", "src1"),
      (100L, "the quick brown fox jumps over the lazy dog tonight", "src0"), // exact of corpus
      (101L, "the quick brown fox jumps over the lazy dog tonight", "src0"), // batch twin of 100
      (102L, "the quick brown fox jumps over the lazy dog today", "src0"),   // near corpus
      (103L, "novel batch text with no counterpart anywhere at all", "src0"),
      (104L, "novel batch text with no counterpart anywhere at all", "src0"), // batch twin of 103
      (105L, "tiny doc", "src0") // < 3 tokens: shingle-ineligible
    ).toDF("doc_id", "text", "source")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet
    val direct = key(IncrementalDedup.incrementalNearDupDirect(docs, 0.8, 16, 4))
    val collapsed = key(IncrementalDedup.incrementalNearDupCollapsed(docs, 0.8, 16, 4))
    assert(collapsed == direct,
      s"collapse diverged: ${collapsed.diff(direct)} vs ${direct.diff(collapsed)}")
    // and the decisions themselves are the expected ladder
    val m = direct.map(t => t._1 -> (t._2, t._3)).toMap
    assert(m(100L) == (("drop_near_corpus", 1L)))
    assert(m(101L) == (("drop_near_corpus", 1L)))
    assert(m(104L) == (("drop_near_batch", 103L)))
    assert(m(105L) == (("keep", -1L)))
    spark.catalog.clearCache()
  }
}
