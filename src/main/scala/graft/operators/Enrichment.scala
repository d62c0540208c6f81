package graft.operators

import graft.Tables
import graft.Exact.{countAll, dec6ToDouble}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension enrichment (reference: src/etl/transformations/enrichment.py:118-242):
  * a broadcast country-metadata lookup with Unknown-fills for unmapped
  * countries, and a first-match keyword CASE ladder categorizing products
  * from their names plus a category→group hierarchy.
  *
  * Spark-first shape: the metadata is a ≤25-row static table — broadcast,
  * never shuffled — while sales⋈part stays a key-shuffle join (part scales
  * with SF, so it is NOT broadcastable at 100 TB). The reference's row-wise
  * `df.apply(categorize_product)` (enrichment.py:210-222) becomes one
  * codegen'd CASE expression; dict-iteration first-match order is preserved
  * by the ladder order. Both the Spark lookup rows and the DuckDB oracle's
  * VALUES list are generated from the same static Seqs so they cannot drift.
  */
object Enrichment {

  /** Partial coverage on purpose (the reference maps 5 countries of many,
    * enrichment.py:123-159): NATION_18..24 fall through to the fills. */
  private val countryMeta: Seq[(String, String, String, String, String)] =
    (0 to 17).map { i =>
      (s"NATION_$i", s"Continent_${i % 4}", s"Region_${i % 8}",
        Seq("Developed", "Emerging", "Frontier")(i % 3), s"CUR_${i % 6}")
    }

  /** First-match ladder (order matters: 'hot gear' is Thermal, not Mechanical). */
  private val categoryRules: Seq[(String, Seq[String])] = Seq(
    "Thermal"    -> Seq("hot", "cold"),
    "Hardware"   -> Seq("bolt", "rod", "plate", "anvil"),
    "Mechanical" -> Seq("gear", "widget", "gizmo"),
    "Jewelry"    -> Seq("ring"))

  private val categoryGroup: Seq[(String, String)] = Seq(
    "Thermal" -> "Specialty", "Hardware" -> "Industrial",
    "Mechanical" -> "Industrial", "Jewelry" -> "Consumer", "Other" -> "Miscellaneous")

  /** Broadcast metadata join + fills; adds continent/region/econ_class/currency. */
  def withCountryMeta(spark: SparkSession, df: DataFrame): DataFrame = {
    val meta = broadcast(spark.createDataFrame(countryMeta)
      .toDF("m_country", "m_continent", "m_region", "m_econ", "m_currency"))
    df.join(meta, df("country") === meta("m_country"), "left")
      .withColumn("continent", coalesce(col("m_continent"), lit("Unknown")))
      .withColumn("region", coalesce(col("m_region"), lit("Unknown")))
      .withColumn("econ_class", coalesce(col("m_econ"), lit("Unknown")))
      .withColumn("currency", coalesce(col("m_currency"), lit("USD")))
      .drop("m_country", "m_continent", "m_region", "m_econ", "m_currency")
  }

  /** First-match keyword categorization over a (lowercased) name column. */
  def productCategory(name: Column): Column = {
    val lower_ = lower(name)
    val ladder = categoryRules.foldLeft(Option.empty[Column]) { case (acc, (cat, kws)) =>
      val hit = kws.map(k => lower_.contains(k)).reduce(_ || _)
      Some(acc.fold(when(hit, cat))(_.when(hit, cat)))
    }.get
    ladder.otherwise("Other")
  }

  def categoryGroupCol(category: Column): Column =
    categoryGroup.foldLeft(Option.empty[Column]) { case (acc, (cat, grp)) =>
      Some(acc.fold(when(category === cat, grp))(_.when(category === cat, grp)))
    }.get

  /** Driver query: line-grain sales enriched with country metadata and
    * product categories, rolled up to the enrichment dimensions. */
  def enrichedSales(spark: SparkSession, dir: String): DataFrame = {
    val sales = Tables.salesFact(spark, dir)
      .select(col("l_partkey"), col("country"), col("l_extendedprice"), col("l_discount"))
    val parts = Tables.part(spark, dir).select(col("p_partkey"), col("p_name"))
    val enriched = withCountryMeta(spark, sales)
      .join(parts, col("l_partkey") === col("p_partkey")) // key-shuffle join: part scales with SF
      .withColumn("product_category", productCategory(col("p_name")))
      .withColumn("product_category_group", categoryGroupCol(col("product_category")))
    enriched.groupBy("continent", "econ_class", "product_category", "product_category_group")
      .agg(
        countAll.cast("long").as("n_lines"),
        countDistinct(col("country")).as("n_countries"),
        dec6ToDouble(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
        ).as("revenue"))
  }

  /** DuckDB oracle mirroring enrichedSales, generated from the same rules. */
  def enrichedSalesOracle: String = {
    val values = countryMeta.map { case (c, cont, reg, econ, cur) =>
      s"('$c','$cont','$reg','$econ','$cur')"
    }.mkString(", ")
    val catCase = categoryRules.map { case (cat, kws) =>
      val cond = kws.map(k => s"lower(p_name) LIKE '%$k%'").mkString(" OR ")
      s"WHEN $cond THEN '$cat'"
    }.mkString("\n         ")
    val grpCase = categoryGroup.map { case (cat, grp) =>
      s"WHEN product_category = '$cat' THEN '$grp'"
    }.mkString("\n         ")
    s"""WITH meta(m_country, m_continent, m_region, m_econ, m_currency) AS (VALUES $values),
       |sales AS (
       |  SELECT l_partkey, n_name AS country, l_extendedprice, l_discount
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |), enr AS (
       |  SELECT s.*,
       |    coalesce(m_continent, 'Unknown') AS continent,
       |    coalesce(m_econ, 'Unknown') AS econ_class,
       |    CASE $catCase ELSE 'Other' END AS product_category
       |  FROM sales s
       |  LEFT JOIN meta ON country = m_country
       |  JOIN part ON l_partkey = p_partkey
       |), enr2 AS (
       |  SELECT *, CASE $grpCase END AS product_category_group FROM enr
       |)
       |SELECT continent, econ_class, product_category, product_category_group,
       |  CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  CAST(COUNT(DISTINCT country) AS BIGINT) AS n_countries,
       |  ${graft.Exact.dec6ToDoubleSql("SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))")} AS revenue
       |FROM enr2
       |GROUP BY 1, 2, 3, 4""".stripMargin
  }
}
