package graft

import graft.operators.{Gold, Silver}
import graft.tools.Lineage
import org.scalatest.funsuite.AnyFunSuite

/** Plan-derived lineage (reference data_lineage_tracker.py re-expressed):
  * the report must name every source table a query reads, show the pruned
  * column set, and surface pushed filters. */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("sales_summary lineage names all four joined tables with pruned columns") {
    val ls = Lineage.scans(Gold.salesSummary(spark, dir))
    val tables = ls.map(_.table).toSet
    assert(tables == Set("lineitem.parquet", "orders.parquet", "customer.parquet", "nation.parquet"))
    val li = ls.find(_.table == "lineitem.parquet").get
    assert(li.columnsRead.contains("l_extendedprice"))
    assert(!li.columnsRead.contains("l_shipdate"), s"unpruned: ${li.columnsRead}")
  }

  test("silver lineage surfaces the pushed business-rule filters") {
    val ls = Lineage.scans(Silver.cleanLineitem(spark, dir))
    val li = ls.find(_.table == "lineitem.parquet").get
    assert(li.pushedFilters.exists(_.contains("l_quantity")), li.pushedFilters.mkString(";"))
  }

  test("report emits one row per scan") {
    val rep = Lineage.report(Gold.salesSummary(spark, dir)).collect()
    assert(rep.length == 4)
    assert(rep.map(_.getString(0)).toSet.contains("lineitem.parquet"))
  }
}
