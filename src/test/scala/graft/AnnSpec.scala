package graft

import graft.ann.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("LSH top-k recall >= 0.9 vs brute force") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val k = 10
    val brute = Ann.bruteTopK(emb, queries, k).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val lsh = Ann.lshTopK(emb, queries, k).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (|brute|=${brute.size}, |lsh|=${lsh.size})")
  }

  test("brute-force top-k is correctly ordered and self-free") {
    val res = Ann.annTopK(spark, dir).collect()
    res.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq == (1L to byRank.length).toSeq)
      val sims = byRank.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    assert(res.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("vec_id")))
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val v = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val r = Ann.bruteTopK(v, v.filter(col("vec_id") === 1), 1).collect()
    assert(r.length == 1 && math.abs(r(0).getAs[Double]("cos_sim") - 1.0) < 1e-12)
  }

  test("IVF top-k recall >= 0.8 vs brute force at nProbe=3/8 lists") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val k = 10
    val brute = Ann.bruteTopK(emb, queries, k).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Ann.ivfTopK(emb, queries, k).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall < 0.8 (|brute|=${brute.size}, |ivf|=${ivf.size})")
  }

  test("filtered ANN only returns corpus vectors passing the predicate") {
    val emb = Tables.embeddings(spark, dir)
    val res = Ann.annFiltered(spark, dir).select("vec_id")
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getAs[Int]("label") % 2 == 0))
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val pairs = Ann.embeddingNearDups(spark, dir, threshold = 0.35).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("cos_sim") >= 0.35)
    }
  }

  test("IVF model cache is bounded — many distinct corpora don't accumulate") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // six distinct tiny corpora (distinct plans via distinct literal data)
    (0 until 6).foreach { c =>
      val corpus = (0 until 24).map(i =>
        (i.toLong, Array.fill(8)(rnd.nextFloat() + c))).toDF("vec_id", "embedding")
      val q = corpus.filter(col("vec_id") === 0L)
      Ann.ivfTopK(corpus, q, k = 3, nLists = 2, nProbe = 1).count()
    }
    assert(Ann.ivfCacheSize <= 4,
      s"IVF cache grew to ${Ann.ivfCacheSize} entries — eviction not working")
  }
}
