package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join returns exactly the rows of the plain join") {
    import spark.implicits._
    // heavy skew: 90% of rows share key 1
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 1L, i.toLong)).toDF("k", "row_id")
    val small = Seq((1L, "hot"), (2L, "warm"), (3L, "cool"), (0L, "zero")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).select("k", "row_id", "label")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8, bigUniqueCol = "row_id")
      .select("k", "row_id", "label")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("salt spreads a hot key across buckets") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val salted = big.withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
    val buckets = salted.groupBy("__salt").count().collect().map(_.getLong(1))
    assert(buckets.length == 8)
    assert(buckets.max < 1000 * 0.3) // no bucket holds the whole key
  }
}
