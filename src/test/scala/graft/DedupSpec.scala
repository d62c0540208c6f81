package graft

import graft.dedup.{Dedup, MinHashLsh, SimHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def plantedDocs = {
    import spark.implicits._
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu".split(" ")
    val rnd = new scala.util.Random(11)
    def salad(seed: Int) = { val r = new scala.util.Random(seed); (1 to 60).map(_ => words(r.nextInt(words.length))).mkString(" ") }
    val base = salad(1)
    val nearDup = base.split(" ").updated(30, "REPLACED").mkString(" ") // one-word edit
    val exactDup = base
    val others = (2 to 40).map(salad)
    (Seq(base, nearDup, exactDup) ++ others).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("minhash LSH finds the planted near-duplicate pair") {
    val pairs = MinHashLsh.candidatePairs(plantedDocs)
      .filter(col("jaccard") >= 0.8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.contains((0L, 1L)), s"planted near-dup missing from $pairs")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // exact dup collides everywhere
  }

  test("LSH candidate volume is sub-quadratic on the real documents table") {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val allPairs = n * (n - 1) / 2
    val candidates = MinHashLsh.candidatePairs(docs).count()
    assert(candidates < allPairs / 10,
      s"LSH produced $candidates candidates of $allPairs possible — not sub-quadratic")
    // and it still finds the planted high-jaccard pairs in the test data
    assert(MinHashLsh.nearDupPairs(spark, dir, threshold = 0.9).count() > 0)
  }

  test("simhash bands find the planted near-duplicate with small hamming") {
    val sh = SimHash.simhashDocs(plantedDocs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(1L)) <= 3)
    assert(sh(0L) == sh(2L)) // identical text, identical simhash
  }

  test("exact dedup groups by normalized content") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, " HELLO\tWORLD "),
      (4L, "something else")).toDF("doc_id", "text")
    val groups = df
      .withColumn("content_hash", md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .groupBy("content_hash").agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
      .collect()
    assert(groups.length == 2)
    assert(groups.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 3L))
    // on the real table every doc is unique — one group per doc
    val real = Dedup.exactDedup(spark, dir)
    assert(real.agg(sum("n_docs")).head.getLong(0) == Tables.documents(spark, dir).count())
  }
}
