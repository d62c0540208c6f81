package graft

import graft.text.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("every document is scored; token counts match the tokenizer") {
    val out = Dsir.dsirSelection(spark, dir).persist()
    val n = Tables.documents(spark, dir).count()
    assert(out.count() == n)
    // n_tokens agrees with the shared tokenization (non-empty split tokens)
    val expected = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("""size(filter(split(lower(trim(text)), '\\s+'), t -> length(t) > 0))""")
          .cast("long").as("exp"))
    val bad = out.join(expected, "doc_id")
      .filter(col("n_tokens") =!= col("exp")).count()
    assert(bad == 0)
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("the target slice scores highest on average") {
    // the fixture langs share ONE 31-word vocabulary and differ only in
    // word frequency, so the signal is weak by construction — but the
    // target (en) must still rank first on mean log-weight
    val means = Dsir.dsirSelection(spark, dir)
      .groupBy("lang").agg(avg("log_weight").as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = means(Dsir.TargetLang)
    means.filter(_._1 != Dsir.TargetLang).foreach { case (l, w) =>
      assert(en > w, f"target mean $en%.4f not above $l's $w%.4f")
    }
    spark.catalog.clearCache()
  }

  test("disjoint vocabularies separate sharply: target-like kept, alien dropped") {
    import spark.implicits._
    // planted corpus: en docs speak only {alpha..delta}, zh docs speak only
    // {omega..psi}; a doc made of target vocabulary must score strongly
    // positive (selected), one of raw-only vocabulary strongly negative
    val enWords = Seq("alpha", "beta", "gamma", "delta")
    val zhWords = Seq("omega", "psi", "chi", "phi")
    def mk(words: Seq[String], seed: Int, n: Int) =
      (0 until n).map(i => words((i * 7 + seed) % words.size)).mkString(" ")
    val rows = (0L to 9L).map(i => (i, mk(enWords, i.toInt, 40), "en", "src0")) ++
      (10L to 19L).map(i => (i, mk(zhWords, i.toInt, 40), "zh", "src0"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dsir.dsirSelection(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    // every en doc selected with positive weight, every zh doc dropped
    (0L to 9L).foreach { i =>
      assert(out(i).getDouble(3) > 0.0 && out(i).getBoolean(4),
        s"target doc $i not selected: w=${out(i).getDouble(3)}")
    }
    (10L to 19L).foreach { i =>
      assert(out(i).getDouble(3) < 0.0 && !out(i).getBoolean(4),
        s"alien doc $i selected: w=${out(i).getDouble(3)}")
    }
    spark.catalog.clearCache()
  }
}
