package graft

import graft.operators.{EntityRes, GraphOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EntityResSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("every part appears exactly once; exact name twins share an entity") {
    val out = EntityRes.resolveParts(spark, dir).persist()
    val nParts = Tables.part(spark, dir).count()
    assert(out.count() == nParts)
    assert(out.select("p_partkey").distinct().count() == nParts)
    // identical names can never land in different entities
    val split = out.groupBy("p_name")
      .agg(countDistinct("entity_id").as("e")).filter(col("e") > 1).count()
    assert(split == 0, s"$split names split across entities")
    out.unpersist()
  }

  test("one canonical record per entity, and it is the min partkey") {
    val out = EntityRes.resolveParts(spark, dir).persist()
    val perEnt = out.groupBy("entity_id").agg(
      sum(when(col("is_canonical"), 1L).otherwise(0L)).as("nc"),
      min("p_partkey").as("mn"))
    assert(perEnt.filter(col("nc") =!= 1L).count() == 0)
    assert(out.filter(col("is_canonical") && col("p_partkey") =!= col("entity_id"))
      .count() == 0, "entity_id should be the canonical (min) partkey")
    out.unpersist()
  }

  test("fuzzy matches merge: entities are fewer than distinct names") {
    val out = EntityRes.resolveParts(spark, dir)
    val distinctNames = Tables.part(spark, dir).select("p_name").distinct().count()
    val entities = out.select("entity_id").distinct().count()
    info(s"$distinctNames distinct names -> $entities entities")
    assert(entities <= distinctNames)
    assert(entities > 1, "everything collapsed into one entity — tau too loose")
  }

  test("every within-entity neighbor edge respects the verify threshold") {
    // sample entities with >1 distinct name and check SOME pair is within
    // tau (closure means not ALL pairs are, but each edge used was)
    val out = EntityRes.resolveParts(spark, dir)
    val multi = out.groupBy("entity_id")
      .agg(countDistinct("p_name").as("dn")).filter(col("dn") > 1)
    val names = out.join(multi, "entity_id")
      .select("entity_id", "p_name").distinct()
    val pairs = names.as("a").join(names.as("b"), "entity_id")
      .filter(col("a.p_name") < col("b.p_name"))
      .withColumn("d", levenshtein(col("a.p_name"), col("b.p_name")))
    val close = pairs.filter(col("d") <= EntityRes.Tau)
      .select("entity_id").distinct().count()
    val all = multi.count()
    assert(close == all,
      s"only $close of $all multi-name entities have an edge within Tau")
  }

  test("multipass is monotone: every single-pass merge survives, entities never grow") {
    val single = EntityRes.resolveParts(spark, dir)
      .select(col("p_partkey"), col("entity_id").as("e1"))
    val multi = EntityRes.resolvePartsMultipass(spark, dir)
      .select(col("p_partkey"), col("entity_id").as("e2"))
    val j = single.join(multi, "p_partkey").persist()
    // same-entity under single-pass => same-entity under multipass
    val broken = j.as("a").join(j.as("b"),
        col("a.e1") === col("b.e1") && col("a.e2") =!= col("b.e2")).count()
    assert(broken == 0, "multipass split a single-pass entity")
    val n1 = j.select("e1").distinct().count()
    val n2 = j.select("e2").distinct().count()
    info(s"entities: single-pass $n1, multipass $n2")
    assert(n2 <= n1)
    j.unpersist()
  }

  test("generic connectedComponents: chain merges, strict rail throws") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val comp = GraphOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    val e = intercept[IllegalStateException] {
      GraphOps.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"), maxIters = 1)
    }
    assert(e.getMessage.contains("safety rail"))
  }
}
