package graft.ann

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbor over the `embeddings` table (brief
  * requirement; replaces the reference's external Typesense index at
  * src/vector_search/indexer.py:44 with Spark-native operators).
  *
  * - `bruteTopK`: broadcast the query set against a full scan — exact
  *   baseline, and the correct shape when |queries| is small: one pass over
  *   the corpus, no shuffle of the corpus itself.
  * - `lshTopK`: random-hyperplane (SRP) LSH — `tables` independent bucket
  *   tables of `bits` sign bits each; candidates are bucket collisions only.
  *   `bits` scales with log(corpus/target-bucket-size): 3 bits suits the
  *   500-row test set, ~20 suits 1e9 rows. Hyperplanes are seeded
  *   deterministically so plans replay identically.
  */
object Ann {

  /** Σ x_i·y_i with per-element widening to double (codegen'd higher-order
    * functions — no UDF). */
  private def dot(a: String, b: String): Column =
    expr(s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
            |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  private def withNorm(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn(out, sqrt(dot(vecCol, vecCol)))

  /** Exact cosine top-k of `queries` against `corpus` (both need
    * vec_id + embedding). */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = withNorm(corpus, "embedding", "c_norm")
    val q = broadcast(
      withNorm(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")), "q_emb", "q_norm"))
    val scored = c.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", dot("embedding", "q_emb") / (col("c_norm") * col("q_norm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** Deterministic pseudo-Gaussian hyperplanes, seed-fixed. */
  private def planes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  private def bucketExpr(plane: Array[Array[Double]], vecCol: String): Column =
    plane.zipWithIndex.map { case (p, b) =>
      val lits = p.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ", ", ")")
      when(expr(
        s"""aggregate(zip_with($vecCol, $lits, (x, w) -> CAST(x AS DOUBLE) * w),
           |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin) > 0, 1 << b).otherwise(0)
    }.reduce((a, b) => a.bitwiseOR(b))

  private def withBuckets(df: DataFrame, vecCol: String, pl: Array[Array[Array[Double]]]): DataFrame = {
    val structs = pl.zipWithIndex.map { case (plane, t) =>
      struct(lit(t).as("tbl"), bucketExpr(plane, vecCol).as("bucket"))
    }
    df.withColumn("__b", explode(array(structs.toIndexedSeq: _*)))
      .withColumn("tbl", col("__b.tbl")).withColumn("bucket", col("__b.bucket"))
      .drop("__b")
  }

  /** SRP-LSH cosine top-k: bucket-collision candidates, exact re-score. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 12, bits: Int = 3, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val pl = planes(tables, bits, dim, seed)
    val c = withBuckets(withNorm(corpus, "embedding", "c_norm"), "embedding", pl)
      .select("tbl", "bucket", "vec_id", "embedding", "c_norm")
    val q = withBuckets(
      withNorm(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")), "q_emb", "q_norm"),
      "q_emb", pl).select("tbl", "bucket", "query_id", "q_emb", "q_norm")
    val cand = c.join(q, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    cand
      .withColumn("cos_sim", dot("embedding", "q_emb") / (col("c_norm") * col("q_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos_sim", "rank")
  }

  /** Query-table entries over the driver testdata. */
  def annTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    bruteTopK(emb, emb.filter(col("vec_id") < 10), k)
      .orderBy(col("query_id"), col("rank"))
  }

  def annLshTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    lshTopK(emb, emb.filter(col("vec_id") < 10), k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-dup pairs via shared LSH buckets. `threshold` is
    * a demo value for the synthetic set (max pairwise cosine ≈ 0.51); real
    * near-dup dedup uses ~0.95. */
  def embeddingNearDups(spark: SparkSession, dir: String, threshold: Double = 0.4,
                        tables: Int = 12, bits: Int = 3): DataFrame = {
    val emb = withNorm(Tables.embeddings(spark, dir), "embedding", "norm")
    val pl = planes(tables, bits, 64, 42L)
    val buckets = withBuckets(emb, "embedding", pl)
    val a = buckets.select(col("tbl"), col("bucket"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("norm").as("norm_a"))
    val b = buckets.select(col("tbl"), col("bucket"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("norm").as("norm_b"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
      .withColumn("cos_sim", dot("emb_a", "emb_b") / (col("norm_a") * col("norm_b")))
      .filter(col("cos_sim") >= threshold)
      .select("vec_a", "vec_b", "cos_sim")
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
