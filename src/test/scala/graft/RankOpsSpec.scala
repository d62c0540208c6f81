package graft

import graft.operators.RankOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sampleDf(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to n).map(i => (i.toLong, rnd.nextInt(50))).toDF("id", "v")
  }

  test("withGlobalRank produces the permutation 1..n under the sort order") {
    val n = 1237
    val ranked = RankOps.withGlobalRank(sampleDf(n), "r", Seq(col("v").desc, col("id").asc))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("v"), r.getAs[Long]("r")))
    spark.catalog.clearCache()
    assert(ranked.map(_._3).sorted.toSeq == (1L to n).toSeq)
    // rank must agree with a local sort
    val local = ranked.sortBy { case (id, v, _) => (-v, id) }
    local.zipWithIndex.foreach { case ((_, _, r), i) => assert(r == i + 1) }
  }

  test("withGlobalNtile matches SQL NTILE semantics exactly (n not divisible by k)") {
    val n = 1237; val k = 5
    val got = RankOps.withGlobalNtile(sampleDf(n), "nt", k, Seq(col("v").desc, col("id").asc))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("nt"))).toMap
    spark.catalog.clearCache()
    val sorted = sampleDf(n).collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy { case (id, v) => (-v, id) }
    val q = n / k; val r0 = n % k
    def bucket(rank: Int): Long =
      if (rank <= (q + 1) * r0) ((rank - 1) / (q + 1) + 1).toLong
      else (r0 + (rank - 1 - r0 * (q + 1)) / q + 1).toLong
    sorted.zipWithIndex.foreach { case ((id, _), i) =>
      assert(got(id) == bucket(i + 1), s"id=$id rank=${i + 1}")
    }
    // bucket sizes: first n%k buckets get one extra row
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    (1 to k).foreach { b =>
      val expect = if (b <= r0) q + 1 else q
      assert(sizes(b.toLong) == expect)
    }
  }

  test("withGroupedRank matches a per-group window row_number exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // few groups, many rows per group — the exact shape the grouped rank
    // exists for; sizes chosen to NOT divide evenly into 32 partitions so
    // groups span partition boundaries
    val df = (1 to 4013).map { i =>
      (i.toLong, s"g${rnd.nextInt(5)}", rnd.nextInt(40))
    }.toDF("id", "g", "v")
    val got = RankOps.withGroupedRank(df, "r", Seq("g"),
        Seq(col("v").desc, col("id").asc), countCol = Some("n"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("g"),
        r.getAs[Int]("v"), r.getAs[Long]("r"), r.getAs[Long]("n")))
    spark.catalog.clearCache()
    val byGroup = got.groupBy(_._2)
    assert(byGroup.size == 5)
    byGroup.foreach { case (_, rows) =>
      // ranks are the permutation 1..|group| and agree with a local sort
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
      rows.sortBy { case (id, _, v, _, _) => (-v, id) }
        .zipWithIndex.foreach { case ((_, _, _, r, _), i) => assert(r == i + 1) }
      // countCol = group size on every row
      assert(rows.forall(_._5 == rows.length))
    }
  }

  test("withGroupedRank handles single-row and single-group frames") {
    import spark.implicits._
    val one = Seq((1L, "a", 5)).toDF("id", "g", "v")
    val got1 = RankOps.withGroupedRank(one, "r", Seq("g"), Seq(col("v"), col("id")))
      .collect()
    spark.catalog.clearCache()
    assert(got1.length == 1 && got1.head.getAs[Long]("r") == 1L)
    // one group spanning every partition = pure boundary-offset path
    val oneGroup = (1 to 500).map(i => (i.toLong, "only", 500 - i)).toDF("id", "g", "v")
    val got2 = RankOps.withGroupedRank(oneGroup, "r", Seq("g"), Seq(col("v").asc, col("id").asc))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("r"))).toMap
    spark.catalog.clearCache()
    (1 to 500).foreach(i => assert(got2(i.toLong) == (500 - i + 1).toLong))
  }

  test("ntile handles n < k (each row its own bucket)") {
    import spark.implicits._
    val df = Seq((1L, 10), (2L, 5), (3L, 1)).toDF("id", "v")
    val got = RankOps.withGlobalNtile(df, "nt", 5, Seq(col("v").desc, col("id").asc))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("nt"))).toMap
    spark.catalog.clearCache()
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("boundedFrame passes values through within the bound") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 100).map(i => (i.toLong, i * 2L)).toDF("id", "v")
    val got = df.withColumn("rn", RankOps.boundedFrame("spec",
      row_number().over(Window.orderBy(col("id"))).cast("long"), maxRows = 100L))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
    (1 to 100).foreach(i => assert(got(i.toLong) == i.toLong))
  }

  test("boundedFrame raises when the frame is data-proportional") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 101).map(i => (i.toLong, i * 2L)).toDF("id", "v")
    val e = intercept[Exception] {
      df.withColumn("rn", RankOps.boundedFrame("spec",
        row_number().over(Window.orderBy(col("id"))).cast("long"), maxRows = 100L))
        .collect()
    }
    assert(e.getMessage.contains("bounded-frame guard 'spec'"),
      s"wrong failure: ${e.getMessage}")
  }

  test("labelEncode refuses a high-cardinality key column") {
    import spark.implicits._
    val keys = (1 to 10001).map(i => (i.toLong, s"k$i")).toDF("id", "k")
    val e = intercept[Exception] {
      graft.operators.FeatureEng.labelEncode(keys, "k", "code").collect()
    }
    assert(e.getMessage.contains("label_encode(k)"), s"wrong failure: ${e.getMessage}")
  }
}
