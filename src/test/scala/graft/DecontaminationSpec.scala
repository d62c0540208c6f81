package graft

import graft.text.Decontamination
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic train/eval contamination: grain, flag arithmetic, and the LSH
  * detection recall against the brute-force best-neighbor truth. */
class DecontaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private lazy val out = Decontamination.semanticContamination(spark, dir).cache()

  test("one row per non-train embedding; flags follow the threshold") {
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val nonTrain = out.count()
    assert(nonTrain > 0 && nonTrain < n, s"split degenerate: $nonTrain of $n")
    assert(out.filter(col("split") === "train").count() == 0)
    assert(out.filter(col("is_contaminated") &&
      (col("best_cosine").isNull || col("best_cosine") < 0.4)).count() == 0)
    assert(out.filter(!col("is_contaminated") && col("best_cosine") >= 0.4).count() == 0)
  }

  test("LSH detection recall vs the brute-force best train neighbor") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .withColumn("__b", expr("conv(substring(md5(cast(vec_id as string)), 1, 4), 16, 10) % 100"))
    val train = emb.filter(col("__b") < 80)
      .select(col("vec_id").as("train_id"), col("embedding").as("t_emb"))
    val eval = emb.filter(col("__b") >= 80).select(col("vec_id"), col("embedding"))
    val brute = eval.crossJoin(broadcast(train))
      .withColumn("cos", graft.functions.ArrayCosineQ20.of(col("embedding"), col("t_emb")))
      .groupBy("vec_id").agg(max(col("cos")).as("true_best"))
    val trueFlagged = brute.filter(col("true_best") >= 0.4).collect()
      .map(_.getLong(0)).toSet
    val found = out.filter(col("is_contaminated")).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(found.subsetOf(trueFlagged),
      s"false positives: ${found -- trueFlagged}") // LSH can only MISS, never invent
    if (trueFlagged.nonEmpty) {
      val recall = (found & trueFlagged).size.toDouble / trueFlagged.size
      assert(recall >= 0.8, s"detection recall $recall < 0.8 over ${trueFlagged.size} true leaks")
    }
  }
}
