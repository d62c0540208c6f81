package graft

import graft.text.TrainPrep
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  /** Write a crafted documents table to a temp dir in the corpus schema. */
  private def craftedDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("trainprep").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("hash split: buckets in range, split bands match, assignment deterministic") {
    val rows = TrainPrep.hashSplit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b < 100)
      val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(r.getAs[String]("split") == expect)
    }
    val again = TrainPrep.hashSplit(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    rows.foreach(r => assert(again(r.getAs[Long]("doc_id")) == r.getAs[String]("split")))
    // the split is a partition: roughly 80/10/10 on any real corpus
    val n = rows.length.toDouble
    val train = rows.count(_.getAs[String]("split") == "train") / n
    assert(train > 0.7 && train < 0.9)
  }

  test("class balance: every language keeps exactly the minority-class count") {
    val out = TrainPrep.classBalance(spark, dir)
    val perLang = out.groupBy("lang").agg(
      count(lit(1)).as("n"),
      sum(when(col("is_kept"), 1L).otherwise(0L)).as("kept"),
      max("class_rank").as("maxr")).collect()
    val m = perLang.map(_.getAs[Long]("n")).min
    perLang.foreach { r =>
      assert(r.getAs[Long]("kept") == m)
      // ranks are a permutation of 1..n within the class
      assert(r.getAs[Long]("maxr") == r.getAs[Long]("n"))
    }
  }

  test("contamination: exact twin of an eval doc is fully contaminated, fresh doc clean") {
    // doc 0 (0 % 97 == 0) is the eval doc; doc 1 is its verbatim twin;
    // doc 2 shares no 5-gram with it
    val d = craftedDir(Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s0"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s0"),
      (2L, "one two three four five six seven eight nine", "en", "s1")))
    val out = TrainPrep.contaminationCheck(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("overlap_frac"), r.getAs[Boolean]("is_contaminated"))).toMap
    assert(!out.contains(0L)) // eval docs are not scored
    assert(out(1L) == ((1.0, true)))
    assert(out(2L) == ((0.0, false)))
  }

  test("repetition filter: hand-computed fractions on a degenerate and a clean doc") {
    val d = craftedDir(Seq(
      (1L, "spam spam spam spam spam spam", "en", "s0"),
      (2L, "the quick brown fox jumps over lazy dogs", "en", "s0")))
    val out = TrainPrep.repetitionFilter(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val spam = out(1L)
    assert(spam.getAs[Long]("n_words") == 6 && spam.getAs[Long]("n_distinct") == 1)
    assert(spam.getAs[Double]("top_word_frac") == 1.0)
    assert(spam.getAs[Double]("top_bigram_frac") == 1.0)   // all 5 bigrams identical
    assert(spam.getAs[Double]("excess_bigram_frac") == 0.8) // (5-1)/5
    assert(spam.getAs[Double]("dup_trigram_frac") == 1.0)  // all 4 trigrams identical
    assert(!spam.getAs[Boolean]("is_kept"))
    val clean = out(2L)
    assert(clean.getAs[Double]("distinct_ratio") == 1.0)
    assert(clean.getAs[Double]("excess_bigram_frac") == 0.0) // no repeats, any length
    assert(clean.getAs[Double]("dup_trigram_frac") == 0.0)
    assert(clean.getAs[Boolean]("is_kept"))
  }

  test("sequence packing: conserves tokens, fills every block except the last") {
    val packs = TrainPrep.sequencePacking(spark, dir).orderBy("pack_id").collect()
    val ids = packs.map(_.getAs[Long]("pack_id"))
    assert(ids.sameElements(ids.indices.map(_.toLong))) // contiguous from 0
    packs.init.foreach { p =>
      assert(p.getAs[Long]("n_tokens") == 256L)
      assert(p.getAs[Double]("utilization") == 1.0)
    }
    assert(packs.last.getAs[Long]("n_tokens") <= 256L)
    val totalInPacks = packs.map(_.getAs[Long]("n_tokens")).sum
    val totalTokens = Tables.documents(spark, dir)
      .select(sum(size(expr("split(lower(trim(text)), '\\\\s+')"))).cast("long"))
      .collect()(0).getLong(0)
    assert(totalInPacks == totalTokens)
  }

  test("hybrid search: driver-side query embedding equals the in-plan expression") {
    import spark.implicits._
    val q = graft.text.HybridSearch.DefaultQuery
    // evaluate the same q20 recipe through the Spark expression path
    val viaPlan = Seq(q).toDF("text")
      .select(graft.text.Embeddings.rawComponents(col("text")).as("v"))
      .select(expr("transform(v, x -> CASE WHEN aggregate(v, 0L, (a, y) -> a + y * y) = 0 THEN 0L " +
        "ELSE CAST(round(CAST(x AS DOUBLE) * 1048576.0 / sqrt(CAST(aggregate(v, 0L, (a, y) -> a + y * y) AS DOUBLE))) AS LONG) END)"))
      .collect()(0).getSeq[Long](0)
    assert(viaPlan == graft.text.HybridSearch.q20Const(q, graft.text.Embeddings.Dim).toSeq)
  }

  test("hybrid search: RRF fuses lexical and vector ranks deterministically") {
    val out = graft.text.HybridSearch.hybridSearch(spark, dir).collect()
    assert(out.length == 20)
    // ranks are distinct within each modality's candidate list (where present)
    def ranks(c: String) = out.flatMap(r => Option(r.getAs[java.lang.Long](c)).map(_.toLong))
    assert(ranks("kw_rank").distinct.length == ranks("kw_rank").length)
    assert(ranks("vec_rank").distinct.length == ranks("vec_rank").length)
    out.foreach { r =>
      def contrib(c: String) =
        Option(r.getAs[java.lang.Long](c)).map(x => 1.0 / (60 + x)).getOrElse(0.0)
      val expect = contrib("kw_rank") + contrib("vec_rank")
      assert(r.getAs[Double]("rrf_score") == expect) // exact replay of the fusion rule
      assert(r.getAs[Double]("rrf_score") <= 2.0 / 61.0)
    }
    // results arrive fused-score-descending with the doc-id tie-break
    val scores = out.map(r => (r.getAs[Double]("rrf_score"), r.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sortBy { case (s, id) => (-s, id) }))
  }

  test("mixing weights: shares sum to one, weights flatten the mixture") {
    val rows = TrainPrep.mixingWeights(spark, dir).collect()
    val shareSum = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
    val k = rows.length.toDouble
    rows.foreach { r =>
      // weight × share == 1/k: the weighted mixture is uniform over sources
      val prod = r.getAs[Double]("mix_weight") * r.getAs[Double]("token_share")
      assert(math.abs(prod - 1.0 / k) < 1e-9)
    }
  }

  test("training shuffle: positions are a permutation, shards balanced ±1") {
    val rows = TrainPrep.trainingShuffle(spark, dir).collect()
    val n = rows.length
    val pos = rows.map(_.getAs[Long]("shuffle_pos")).sorted
    assert(pos.sameElements(Array.tabulate(n)(_.toLong))) // exact permutation 0..n-1
    val shardSizes = rows.groupBy(_.getAs[Long]("shard_id")).values.map(_.length)
    assert(shardSizes.max - shardSizes.min <= 1) // round-robin balance
    rows.foreach { r =>
      assert(r.getAs[Long]("shuffle_pos") ==
        r.getAs[Long]("shard_offset") * 16 + r.getAs[Long]("shard_id"))
    }
    // the shuffle actually permutes: doc-id order and shuffle order differ
    val byId = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("shuffle_pos"))
    assert(!byId.sameElements(byId.sorted))
  }

  test("temperature sample: sqrt flattening with the smallest language at 1.0") {
    val tmp = craftedDir(
      (0L until 90L).map(i => (i, "alpha beta gamma delta", "en", "s0")) ++
        (90L until 100L).map(i => (i, "uno dos tres cuatro", "es", "s0")))
    val rows = TrainPrep.temperatureSample(spark, tmp).collect()
    // 90 en docs × 4 tokens = 360; 10 es docs × 4 = 40 → keep_prob(es) = 1.0,
    // keep_prob(en) = sqrt(40/360) = 1/3
    rows.filter(_.getAs[String]("lang") == "es").foreach { r =>
      assert(r.getAs[Double]("keep_prob") == 1.0)
      assert(r.getAs[Boolean]("is_kept")) // u < 1.0 always (bucket < 65536)
    }
    rows.filter(_.getAs[String]("lang") == "en").foreach { r =>
      assert(r.getAs[Double]("keep_prob") == math.sqrt(40.0 / 360.0))
      assert(r.getAs[Boolean]("is_kept") ==
        r.getAs[Double]("u") < r.getAs[Double]("keep_prob"))
    }
    // the kept en mass heads toward the geometric mean, not zero: some survive
    assert(rows.count(r => r.getAs[String]("lang") == "en" && r.getAs[Boolean]("is_kept")) > 0)
  }

  test("lm quality score: corpus-like text scores high, gibberish scores low") {
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val tmp = craftedDir(
      (0L until 20L).map(i => (i, common, "en", "s0")) :+
        ((20L, "zqxvjkwpbmgfdhtcynrs", "en", "s0"))) // every trigram unique → all hapax
    val rows = TrainPrep.lmQualityScore(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // every trigram of the 20-fold-repeated doc clears the 0.01% floor
    assert(rows(0L).getAs[Double]("hit_rate") == 1.0 && rows(0L).getAs[Boolean]("is_kept"))
    assert(rows(0L).getAs[Long]("n_grams") == common.length - 2)
    // the one-off gibberish doc shares no trigrams with the corpus mass
    assert(rows(20L).getAs[Double]("hit_rate") < 0.8 && !rows(20L).getAs[Boolean]("is_kept"))
  }

  test("corpus stats: hand-computed cell masses and shares") {
    val tmp = craftedDir(Seq(
      (0L, "one two three", "en", "sA"),      // 3 tokens, 13 chars/bytes
      (1L, "four five", "en", "sA"),          // 2 tokens, 9 chars/bytes
      (2L, "six seven eight nine ten", "de", "sB"))) // 5 tokens, 24 chars
    val rows = TrainPrep.corpusStats(spark, tmp).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) -> r).toMap
    val a = rows(("sA", "en"))
    assert(a.getAs[Long]("n_docs") == 2 && a.getAs[Long]("n_tokens") == 5)
    assert(a.getAs[Long]("n_chars") == 22 && a.getAs[Long]("n_bytes") == 22)
    assert(a.getAs[Double]("tokens_per_doc") == 2.5)
    assert(a.getAs[Double]("bytes_per_token") == 22.0 / 5)
    assert(a.getAs[Double]("token_share") == 0.5)
    val b = rows(("sB", "de"))
    assert(b.getAs[Long]("n_tokens") == 5 && b.getAs[Double]("token_share") == 0.5)
    // corpus run: shares sum to 1
    val shares = TrainPrep.corpusStats(spark, dir).collect()
      .map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shares - 1.0) < 1e-9)
  }

  test("stratified sample: proportional quotas with a floor, deterministic draw") {
    val rows = TrainPrep.stratifiedSample(spark, dir).collect()
    val byStrat = rows.groupBy(_.getAs[String]("source"))
    val n = rows.length.toLong
    byStrat.foreach { case (_, docs) =>
      val c = docs.length.toLong
      val expectQuota =
        math.max(TrainPrep.SampleFloor, TrainPrep.SampleBudget * c / n)
      assert(docs.forall(_.getAs[Long]("quota") == expectQuota))
      // sampled count is the quota capped by the stratum size
      val sampled = docs.count(_.getAs[Boolean]("is_sampled"))
      assert(sampled == math.min(expectQuota, c))
      // ranks are a 1-based permutation within the stratum
      val ranks: List[Long] = docs.map(_.getAs[Long]("strat_rank")).toList.sorted
      assert(ranks == (1L to c).toList)
    }
    // deterministic: same draw twice
    val again = TrainPrep.stratifiedSample(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_sampled")).toMap
    rows.foreach(r =>
      assert(again(r.getAs[Long]("doc_id")) == r.getAs[Boolean]("is_sampled")))
  }

  test("curation funnel: hand-computed drops, monotone survivor counts") {
    // 14 tokens; "the" ×2 keeps top_word_frac at 2/14 ≤ 0.2; 8 enStop hits
    // push quality to 0.07 + 0.5 ≥ 0.5
    val good = "the data and the table of a join is that it works in practice"
    val tmp = craftedDir(Seq(
      (0L, good, "en", "s0"),                       // survives every stage
      (1L, "short doc", "en", "s0"),                // dropped at min_length
      (2L, ("spam " * 20).trim, "en", "s0"),        // dropped at repetition
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s0"), // no stopwords → quality drop
      (4L, good + " !!!$$$%%%^^^&&&***((()))!!!$$$%%%^^^&&&", "en", "s0"))) // symbol load
    val rows = TrainPrep.curationFunnel(spark, tmp).collect()
      .map(r => r.getAs[String]("rule") -> r).toMap
    assert(rows("min_length").getAs[Long]("n_in") == 5 &&
      rows("min_length").getAs[Long]("n_dropped") == 1)
    assert(rows("repetition").getAs[Long]("n_in") == 4 &&
      rows("repetition").getAs[Long]("n_dropped") == 1)
    assert(rows("stopword_quality").getAs[Long]("n_in") == 3 &&
      rows("stopword_quality").getAs[Long]("n_dropped") == 1)
    assert(rows("symbol_load").getAs[Long]("n_in") == 2 &&
      rows("symbol_load").getAs[Long]("n_dropped") == 1 &&
      rows("symbol_load").getAs[Long]("n_out") == 1)
    // each stage's n_in is the previous stage's n_out
    Seq("min_length" -> "repetition", "repetition" -> "stopword_quality",
      "stopword_quality" -> "symbol_load").foreach { case (a, b) =>
      assert(rows(a).getAs[Long]("n_out") == rows(b).getAs[Long]("n_in"))
    }
  }

  test("curated corpus: each gate drops its doc, survivors ship cleaned text") {
    // stopword cycle keeps top-word frac low while quality stays >= 0.5
    val stop = Seq("the", "and", "of", "to")
    def mix(prefix: String, n: Int): Seq[String] =
      (1 to n).flatMap(i => Seq(s"$prefix$i", stop((i - 1) % 4)))
    val passage = (1 to 32).map(i => s"p$i")                  // shared 8-gram block
    val aTok = mix("a", 60)                                   // 120 tokens, clean
    val eTok = mix("b", 60) ++ passage                        // 152 tokens, 32 dup
    val dTok = passage ++ mix("d", 14)                        // 60 tokens, 32 dup > 50%
    val evalText = (1 to 12).map(i => s"e$i").mkString(" ")   // doc 97 ≡ 0 mod 97
    val cTok = (1 to 12).map(i => s"e$i") ++ Seq("c1", "c2")  // 8/10 grams shared
    val tmp = craftedDir(Seq(
      (1L, aTok.mkString(" "), "en", "s0"),
      (2L, eTok.mkString(" "), "en", "s0"),
      (3L, dTok.mkString(" "), "en", "s0"),
      (4L, cTok.mkString(" "), "en", "s0"),
      (5L, "too short to pass", "en", "s0"),
      (97L, evalText, "en", "s0")))
    val rows = TrainPrep.curatedCorpus(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.keySet == Set(1L, 2L), s"kept ${rows.keySet}")
    assert(rows(1L).getAs[Long]("n_removed") == 0L)
    assert(rows(1L).getAs[String]("cleaned_text") == aTok.mkString(" "))
    // doc 2 ships with the shared passage excised
    assert(rows(2L).getAs[Long]("n_removed") == 32L)
    assert(rows(2L).getAs[String]("cleaned_text") == mix("b", 60).mkString(" "))
    // absent: 3 (>50% duplicated), 4 (contaminated), 5 (funnel), 97 (eval slice)
  }

  test("dataset card: drop ledger sums to raw and reconciles with curated_corpus") {
    val cells = TrainPrep.datasetCard(spark, dir).collect()
    assert(cells.nonEmpty)
    val stageCols = Seq("d_min_length", "d_repetition", "d_stopword_quality",
      "d_symbol_load", "d_eval_holdout", "d_contaminated", "d_dup_span")
    cells.foreach { r =>
      val drops = stageCols.map(r.getAs[Long]).sum
      assert(drops + r.getAs[Long]("n_docs_kept") == r.getAs[Long]("n_docs_raw"),
        s"ledger does not sum to raw for ${r.getAs[String]("source")}/${r.getAs[String]("lang")}")
      assert(r.getAs[Long]("n_tokens_kept") <= r.getAs[Long]("n_tokens_raw"))
      val dkr = r.getAs[Double]("doc_keep_rate")
      assert(dkr >= 0.0 && dkr <= 1.0)
    }
    // cross-artifact reconciliation: kept docs/tokens equal curatedCorpus's
    val cc = TrainPrep.curatedCorpus(spark, dir)
      .agg(count(lit(1)), sum(col("n_tokens_out"))).head
    assert(cells.map(_.getAs[Long]("n_docs_kept")).sum == cc.getLong(0))
    assert(cells.map(_.getAs[Long]("n_tokens_kept")).sum == cc.getLong(1))
    // token shares sum to 1 over the curated corpus (exact-long numerators)
    val shareSum = cells.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
  }
}
