package graft

import graft.text.{Chunking, Embeddings}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Direct reimplementation of the reference chunk loop
    * (text_embeddings.py:137-156) as the test oracle. */
  private def refChunks(text: String, cs: Int, ov: Int): Seq[String] = {
    val words = text.trim.split("\\s+").toSeq
    if (words.length <= cs) Seq(text)
    else {
      val out = Seq.newBuilder[String]
      var start = 0
      var done = false
      while (!done && start < words.length) {
        val end = math.min(start + cs, words.length)
        out += words.slice(start, end).mkString(" ")
        if (end >= words.length) done = true else start = end - ov
      }
      out.result()
    }
  }

  test("chunkDocs matches the reference chunk loop, boundaries included") {
    import spark.implicits._
    def mk(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // boundary cases: under, exactly at, one over chunkSize; at and one over
    // the two-chunk limit; a long tail
    val texts = Seq(1L -> mk(10), 2L -> mk(32), 3L -> mk(33), 4L -> mk(56),
      5L -> mk(57), 6L -> mk(99))
    val got = Chunking.chunkDocs(texts.toDF("doc_id", "text"), 32, 8)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val exp = texts.flatMap { case (id, t) =>
      refChunks(t, 32, 8).zipWithIndex.map { case (c, i) =>
        (id, i, c, c.trim.split("\\s+").length)
      }
    }
    assert(got.toSeq == exp)
  }

  test("fused embed components match the declarative md5 reference form") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sfDir).limit(50)
    val mismatch = docs.select(
        Embeddings.rawComponents(col("text")).as("fused"),
        Embeddings.rawComponentsReference(col("text")).as("ref"))
      .filter(col("fused") =!= col("ref")).count()
    assert(mismatch == 0, s"$mismatch docs diverge from the declarative spec")
    // multi-byte text too (the digest runs over UTF-8 bytes)
    val uni = Seq(Tuple1("héllo wörld — ありがとう")).toDF("text")
    val r = uni.select(
      Embeddings.rawComponents(col("text")).as("fused"),
      Embeddings.rawComponentsReference(col("text")).as("ref")).head()
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("embedding is unit-norm, fixed-width, and deterministic") {
    import spark.implicits._
    val df = Seq(Tuple1("the quick brown fox")).toDF("text")
    def emb() = df.select(Embeddings.embedding(col("text")).as("e"))
      .head().getSeq[Float](0)
    val e = emb()
    assert(e.length == Embeddings.Dim)
    val norm = math.sqrt(e.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(emb() == e) // same text, same vector — seeded, no RNG state
    // different text, different vector
    val other = Seq(Tuple1("a different document")).toDF("text")
      .select(Embeddings.embedding(col("text")).as("e")).head().getSeq[Float](0)
    assert(other != e)
  }

  test("documents chunk, embed, and ANN-search end-to-end") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val chunks = Chunking.chunkDocs(docs, 32, 8)
    val vecs = chunks.select(
      (col("doc_id") * 1000 + col("chunk_id")).as("vec_id"),
      Embeddings.embedding(col("chunk_text")).as("embedding"))
    val queries = vecs.filter(col("vec_id") < 3000) // chunks of the first docs
    val k = 5
    val top = graft.ann.Ann.bruteTopKExact(vecs, queries, k)
    val rows = top.collect()
    val nQueries = queries.count()
    assert(nQueries > 0 && rows.length == nQueries * k)
    // ranks are exactly 1..k per query and scores are valid cosines
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to k).toSeq)
      rs.foreach(r => assert(math.abs(r.getAs[Double]("cos_sim")) <= 1.0 + 1e-9))
    }
  }

  test("chunk+embed runs unchanged under Structured Streaming (stateless projection)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val out = Chunking.chunkDocs(docs, 4, 1)
      .withColumn("embedding", Embeddings.embedding(col("chunk_text")))
    val q = out.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "a b c d e f g"), (2L, "short doc"))
      q.processAllAvailable()
      val rows = spark.table("chunk_stream").collect()
      // doc 1: 7 tokens, chunkSize 4 / stride 3 -> chunks at 0 and 3 ("d e f g")
      val byDoc = rows.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap
      assert(byDoc == Map(1L -> 2, 2L -> 1), byDoc.toString)
      rows.foreach(r => assert(r.getSeq[Float](r.fieldIndex("embedding")).length == Embeddings.Dim))
    } finally q.stop()
  }

  test("identical chunk texts embed identically (cosine 1 end-to-end)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here")).toDF("vec_id", "text")
      .select(col("vec_id"), Embeddings.embedding(col("text")).as("embedding"))
    val top = graft.ann.Ann.bruteTopKExact(corpus, corpus.filter(col("vec_id") === 1L), 2)
      .collect().sortBy(_.getAs[Long]("rank"))
    assert(top.head.getAs[Long]("vec_id") == 2L)
    assert(math.abs(top.head.getAs[Double]("cos_sim") - 1.0) < 1e-9)
  }
}
