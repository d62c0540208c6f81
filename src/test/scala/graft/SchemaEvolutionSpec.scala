package graft

import graft.tools.SchemaEvolution
import graft.tools.SchemaEvolution._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaEvolutionSpec extends AnyFunSuite {

  private val v1 = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("amount", FloatType, nullable = true),
    StructField("flag", BooleanType, nullable = true)))

  test("identical schemas are fully compatible") {
    val (ok, issues) = checkCompatibility(v1, v1, Full)
    assert(ok && issues.isEmpty)
  }

  test("widening lattice: int->long/double, float->double, bool->string pass; narrowing fails") {
    assert(typesCompatible(IntegerType, LongType))
    assert(typesCompatible(IntegerType, DoubleType))
    assert(typesCompatible(FloatType, DoubleType))
    assert(typesCompatible(BooleanType, StringType))
    assert(!typesCompatible(LongType, IntegerType))
    assert(!typesCompatible(DoubleType, FloatType))
    assert(!typesCompatible(StringType, IntegerType))
  }

  test("removed field and nullable->required break backward compatibility") {
    val v2 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = false), // tightened
      StructField("amount", FloatType, nullable = true)))  // flag removed
    val (ok, issues) = checkCompatibility(v1, v2, Backward)
    assert(!ok)
    assert(issues.exists(_.contains("'flag' was removed")))
    assert(issues.exists(_.contains("'name' changed from nullable")))
  }

  test("added required field breaks forward compatibility; added nullable does not") {
    val v2 = v1.add(StructField("extra_req", StringType, nullable = false))
      .add(StructField("extra_opt", StringType, nullable = true))
    val (okF, issues) = checkCompatibility(v1, v2, Forward)
    assert(!okF)
    assert(issues == Seq("Added non-nullable field 'extra_req' (breaks forward compatibility)"))
    // …and backward too: old data has no value for the required column
    val (okB, issuesB) = checkCompatibility(v1, v2, Backward)
    assert(!okB)
    assert(issuesB.exists(_.contains("'extra_req'")))
  }

  test("evolution plan: changes, impacts and reversible migration steps") {
    val v2 = StructType(Seq(
      StructField("id", LongType, nullable = false),     // widened
      StructField("name", StringType, nullable = true),
      StructField("amount", FloatType, nullable = true),
      StructField("tag", StringType, nullable = true)))   // added; flag removed
    val plan = evolutionPlan(v1, v2)
    val byType = plan.changes.groupBy(_.changeType)
    assert(byType("add_column").map(_.field) == Seq("tag"))
    assert(byType("drop_column").map(_.field) == Seq("flag"))
    assert(byType("change_type").map(_.field) == Seq("id"))
    assert(byType("change_type").head.impact == "medium") // int->long widens
    assert(plan.migrationSteps.exists(_ == "ALTER TABLE ADD COLUMN tag string"))
    assert(plan.rollbackSteps.exists(_ == "ALTER TABLE DROP COLUMN tag"))
    assert(!plan.compatible) // drop_column breaks backward
  }

  test("real table schemas evolve compatibly when columns only widen") {
    val spark = TestSpark.spark
    val cur = Tables.customer(spark, TestSpark.sfDir).schema
    val widened = StructType(cur.fields.map {
      case StructField(n, IntegerType, nu, m) => StructField(n, LongType, nu, m)
      case f => f
    })
    val (ok, issues) = checkCompatibility(cur, widened, Full)
    assert(ok, issues.mkString("; "))
  }
}
