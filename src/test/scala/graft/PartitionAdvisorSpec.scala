package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning advisor: the profile→strategy ladder lands the
  * recommendations a warehouse engineer would make for the orders table. */
class PartitionAdvisorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private lazy val advice = graft.operators.PartitionAdvisor
    .partitionAdvice(spark, dir).collect()
    .map(r => r.getAs[String]("column_name") -> r).toMap

  test("temporal column wins: o_orderdate is time_based at day granularity") {
    val r = advice("o_orderdate")
    assert(r.getAs[String]("strategy") === "time_based")
    assert(r.getAs[String]("granularity") === "day")
    assert(r.getAs[Boolean]("is_temporal"))
  }

  test("low-cardinality balanced columns partition as lists") {
    Seq("o_orderstatus", "o_orderpriority").foreach { c =>
      val r = advice(c)
      assert(r.getAs[String]("strategy") === "list", s"$c: $r")
      assert(r.getAs[Boolean]("is_categorical"))
      assert(r.getAs[Long]("partition_count") === r.getAs[Long]("distinct_count"))
    }
  }

  test("key columns get a bucketing strategy (hash past 10k distinct, range below)") {
    // at sf0.001 the keys sit under the 10k hash threshold → range; the
    // hash branch itself is exercised by the sf0.01+ oracle gate where
    // o_orderkey crosses 10k
    Seq("o_custkey", "o_orderkey").foreach { c =>
      val r = advice(c)
      val strat = r.getAs[String]("strategy")
      assert(strat === "hash" || strat === "range", s"$c: $r")
      val expected = if (r.getAs[Long]("distinct_count") > 10000) "hash" else "range"
      assert(strat === expected, s"$c strategy $strat vs ladder $expected")
      val pc = r.getAs[Long]("partition_count")
      assert(pc >= 8 && pc <= 1024, s"$c partition_count $pc out of bounds")
    }
  }

  test("the temporal column outranks the unique key on suitability") {
    assert(advice("o_orderdate").getAs[Double]("suitability") >
      advice("o_orderkey").getAs[Double]("suitability"))
  }

  test("suitability is capped at 5 and scores are finite") {
    advice.values.foreach { r =>
      val s = r.getAs[Double]("suitability")
      assert(!s.isNaN && s <= 5.0 && s >= -0.3, s"suitability $s out of range: $r")
    }
  }

  test("sampled scale mode reproduces the exact mode's recommendations") {
    // 10% deterministic sample at sf0.001 (~1500 orders → ~150 sampled rows)
    val sampled = graft.operators.PartitionAdvisor
      .partitionAdviceSampled(spark, dir, sampleMod = 100, sampleKeep = 10)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(sampled.keySet == advice.keySet)
    for ((c, r) <- sampled) {
      val e = advice(c)
      // the advisory decisions must agree; the ingredients may differ by
      // HLL/sampling error
      assert(r.getAs[String]("strategy") === e.getAs[String]("strategy"), s"$c: $r vs $e")
      assert(r.getAs[String]("granularity") === e.getAs[String]("granularity"), s"$c")
      assert(r.getAs[Boolean]("is_temporal") === e.getAs[Boolean]("is_temporal"), s"$c")
      assert(r.getAs[Long]("n") === e.getAs[Long]("n"), s"$c: exact row count differs")
      assert(r.getAs[Double]("null_pct") === e.getAs[Double]("null_pct"), s"$c: exact null pct differs")
      // HLL distinct estimate lands within its documented error band
      val (de, ds) = (e.getAs[Long]("distinct_count"), r.getAs[Long]("distinct_count"))
      assert(math.abs(ds - de) <= math.max(2L, (de * 0.1).toLong), s"$c: distinct $ds vs $de")
    }
    // near-unique columns report no skew in both modes (the minSampledTop
    // guard: a value sampled < 5 times carries no skew signal)
    assert(sampled("o_orderkey").getAs[Double]("skew_excess") === 0.0)
  }
}
