package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("array_cosine: identity, orthogonality, null and length-mismatch handling") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal
      (3L, Array(3.0f, 4.0f), Array(3.0f, 4.0f)),   // identical, non-unit
      (4L, Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)), // length mismatch
      (5L, Array(0.0f, 0.0f), Array(1.0f, 1.0f))    // zero norm
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), expr("array_cosine(a, b)").as("c")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(math.abs(out(1L).get - 1.0) < 1e-12)
    assert(math.abs(out(2L).get) < 1e-12)
    assert(math.abs(out(3L).get - 1.0) < 1e-12)
    assert(out(4L).isEmpty)
    assert(out(5L).isEmpty)
    val n = df.select(expr("array_cosine(a, null)")).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("array_cosine agrees with the declarative zip_with/aggregate form") {
    VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, TestSpark.sfDir).limit(50)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val both = a.crossJoin(b).filter(col("ia") < col("ib"))
      .withColumn("fused", expr("array_cosine(va, vb)"))
      .withColumn("declarative",
        expr("""aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
               |CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin) /
          (sqrt(expr("aggregate(zip_with(va, va, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")) *
           sqrt(expr("aggregate(zip_with(vb, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))))
      .withColumn("diff", abs(col("fused") - col("declarative")))
    assert(both.agg(max("diff")).head.getDouble(0) < 1e-9)
  }

  test("array_cosine_q20 matches the declarative quantize/aggregate chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    // include exact-tie quantization inputs: x*2^20 = k + 0.5 at x = (2k+1)/2^21
    val tie = (3f / 2097152.0f)
    val vecs = (0 until 40).map(i => (i.toLong,
      Array.fill(16)(rnd.nextFloat() * 2 - 1) ++ Array(tie, -tie)))
    val df = vecs.toDF("vec_id", "embedding")
    val a = df.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = df.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    def quant(c: org.apache.spark.sql.Column) = transform(c, x => round(x.cast("double") * lit(1048576.0), 0))
    val dot = aggregate(zip_with(quant(col("ea")), quant(col("eb")), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    def sq(c: org.apache.spark.sql.Column) = aggregate(transform(quant(c), v => v * v), lit(0.0), (acc, v) => acc + v)
    val nn = sq(col("ea")) * sq(col("eb"))
    val declarative = when(nn === 0.0, lit(null).cast("double")).otherwise(dot / sqrt(nn))
    val mismatch = pairs
      .withColumn("fused", graft.functions.ArrayCosineQ20.of(col("ea"), col("eb")))
      .withColumn("decl", declarative)
      .filter(not(col("fused") <=> col("decl"))).count()
    assert(mismatch == 0)
  }
}
