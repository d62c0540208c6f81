package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Referential-integrity suite over the star schema's foreign keys
  * (reference: dbt/macros/data_quality_checks.sql:85-94
  * `test_referential_integrity` — orphaned child keys per FK, run here for
  * every edge of the schema in one report).
  *
  * Each edge is a left-anti join on the key (one key-scoped exchange; the
  * calendar/nation-sized parents broadcast) followed by a count — the same
  * physical shape at 100 TB, since an anti-join shuffles only on the FK.
  * integrity_pct recomputes from the two exact counts with the identical
  * IEEE division in the oracle.
  */
object Integrity {

  def referentialIntegrity(spark: SparkSession, dir: String): DataFrame = {
    case class Edge(child: String, fk: String, parent: String, pk: String)
    val edges = Seq(
      Edge("lineitem", "l_orderkey", "orders", "o_orderkey"),
      Edge("lineitem", "l_partkey", "part", "p_partkey"),
      Edge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      Edge("orders", "o_custkey", "customer", "c_custkey"),
      Edge("customer", "c_nationkey", "nation", "n_nationkey"),
      Edge("supplier", "s_nationkey", "nation", "n_nationkey"),
      Edge("nation", "n_regionkey", "region", "r_regionkey"))
    edges.map { e =>
      val child = Tables.read(spark, dir, e.child).select(col(e.fk))
      val parent = Tables.read(spark, dir, e.parent).select(col(e.pk))
      val counts = child
        .join(parent, child(e.fk) === parent(e.pk), "left")
        .agg(
          count(lit(1)).cast("long").as("child_rows"),
          sum(when(parent(e.pk).isNull, 1L).otherwise(0L)).cast("long").as("orphan_rows"))
      counts.select(
        lit(e.child).as("child_table"), lit(e.fk).as("fk_column"),
        lit(e.parent).as("parent_table"),
        col("child_rows"), col("orphan_rows"),
        ((col("child_rows") - col("orphan_rows")).cast("double") /
          col("child_rows").cast("double") * lit(100.0)).as("integrity_pct"))
    }.reduce(_ union _)
  }

  def referentialIntegrityOracle: String = {
    val edges = Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation", "n_regionkey", "region", "r_regionkey"))
    edges.map { case (child, fk, parent, pk) =>
      s"""SELECT '$child' AS child_table, '$fk' AS fk_column, '$parent' AS parent_table,
         |  CAST(COUNT(*) AS BIGINT) AS child_rows,
         |  CAST(SUM(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_rows,
         |  CAST(COUNT(*) - SUM(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) * 100.0 AS integrity_pct
         |FROM $child c LEFT JOIN $parent p ON c.$fk = p.$pk""".stripMargin
    }.mkString("\nUNION ALL\n")
  }
}
