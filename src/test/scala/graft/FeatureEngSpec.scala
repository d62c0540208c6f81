package graft

import graft.operators.FeatureEng
import org.scalatest.funsuite.AnyFunSuite

/** Feature-prep operators (reference feature_engineering.py): imputation,
  * deterministic encoding, scaling. */
class FeatureEngSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("imputeMean fills nulls with the exact mean of the present values") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Double)]((1L, 10.0), (2L, null), (3L, 20.0))
      .toDF("k", "v")
    val out = FeatureEng.imputeMean(df, "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out == Map(1L -> 10.0, 2L -> 15.0, 3L -> 20.0))
  }

  test("labelEncode assigns dense codes in category sort order") {
    import spark.implicits._
    val df = Seq((1L, "b"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "cat")
    val out = FeatureEng.labelEncode(df, "cat", "code").collect()
      .map(r => (r.getAs[String]("cat"), r.getAs[Long]("code"))).toSet
    assert(out == Set("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }

  test("minMaxScale maps to [0,1] and constants to 0.5") {
    import spark.implicits._
    val df = Seq((1L, 0.0), (2L, 5.0), (3L, 10.0)).toDF("k", "v")
    val out = FeatureEng.minMaxScale(df, "v", "s").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("s"))).toMap
    assert(out == Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0))
    val const = Seq((1L, 7.0), (2L, 7.0)).toDF("k", "v")
    val cOut = FeatureEng.minMaxScale(const, "v", "s").collect().map(_.getAs[Double]("s"))
    assert(cOut.forall(_ == 0.5))
  }

  test("oneHot emits a flag per listed category; unknowns get all zeros") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "z")).toDF("k", "cat")
    val out = FeatureEng.oneHot(df, "cat", Seq("a", "b")).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("is_a"), r.getAs[Int]("is_b"))).toSet
    assert(out == Set((1L, 1, 0), (2L, 0, 0)))
  }
}
