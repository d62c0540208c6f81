package graft.text

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword + faceted search over the document corpus (reference:
  * src/vector_search/typesense_client.py:55,215 — `search` and
  * `faceted_search` against the external Typesense index).
  *
  * Spark-native re-expression: the keyword match is a pushed-down string
  * predicate on the corpus scan, and facets are one grouped aggregate over
  * the matching set — no external index, one shuffle for the facet rollup.
  * (A production deployment at 100 TB would front this with the dedup/
  * curation pipeline's fingerprint index; the semantics here are the
  * filter+facet contract.) */
object Search {

  /** Facet counts (lang × source) plus size stats over docs matching the
    * keyword, lowercase-contains semantics like the reference's default
    * query-by text match. */
  def keywordFacets(docs: DataFrame, keyword: String): DataFrame =
    docs
      .filter(lower(col("text")).contains(keyword.toLowerCase))
      .groupBy("lang", "source")
      .agg(
        countAll.as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        max(col("n_chars")).cast("long").as("max_chars"))

  def facetedSearch(spark: SparkSession, dir: String, keyword: String = "the"): DataFrame =
    keywordFacets(Tables.documents(spark, dir), keyword)

  def facetedSearchOracle: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
      |FROM documents
      |WHERE lower(text) LIKE '%the%'
      |GROUP BY 1, 2""".stripMargin

  /** Structured filter conditions for advanced order search — the Spark
    * analog of the reference's filter dict (range, date-range, IN-lists).
    * Absent fields filter nothing, like the reference's None skips. */
  final case class OrderFilters(
      minTotal: Option[Double] = None, maxTotal: Option[Double] = None,
      fromDate: Option[String] = None, toDate: Option[String] = None,
      countries: Seq[String] = Nil, priorities: Seq[String] = Nil)

  /** Advanced filtered search with ranked pagination (reference:
    * src/vector_search/typesense_client.py:282 `advanced_filter_search` —
    * complex AND-of-conditions filter, sort_by total:desc, per_page/page).
    *
    * Scale shape: every condition is an ordinary pushed-down predicate; the
    * ranked page comes from a distributed TakeOrdered (`orderBy.limit(page ×
    * perPage)`) — never a global row_number over the matching set — so the
    * only single-partition work is the ≤ page·perPage retained rows
    * (bounded by pagination depth, not data). `found` (the reference's
    * response metadata) is a broadcast one-row aggregate. */
  def advancedOrderSearch(spark: SparkSession, dir: String,
                          filters: OrderFilters = OrderFilters(),
                          page: Int = 1, perPage: Int = 20): DataFrame = {
    require(page >= 1 && perPage >= 1)
    val o = Tables.ordersWithCountry(spark, dir).select(
      col("o_orderkey"), col("country"), col("o_orderpriority"),
      to_date(col("o_orderdate")).as("order_day"),
      round(col("o_totalprice") * 100, 0).cast("long").as("__cents"))
    val conds: Seq[org.apache.spark.sql.Column] =
      filters.minTotal.map(v => col("__cents") >= math.round(v * 100)).toSeq ++
        filters.maxTotal.map(v => col("__cents") <= math.round(v * 100)) ++
        filters.fromDate.map(v => col("order_day") >= lit(v).cast("date")) ++
        filters.toDate.map(v => col("order_day") <= lit(v).cast("date")) ++
        (if (filters.countries.nonEmpty) Seq(col("country").isin(filters.countries: _*)) else Nil) ++
        (if (filters.priorities.nonEmpty) Seq(col("o_orderpriority").isin(filters.priorities: _*)) else Nil)
    val m = conds.foldLeft(o)((df, c) => df.filter(c))
    val found = broadcast(m.agg(graft.Exact.countAll.as("found")))
    val top = m.orderBy(col("__cents").desc, col("o_orderkey")).limit(page * perPage)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__cents").desc, col("o_orderkey"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") > (page - 1) * perPage)
      .crossJoin(found)
      .select(col("rank"), col("o_orderkey"), col("country"), col("o_orderpriority"),
        col("order_day"), (col("__cents").cast("double") / 100.0).as("total"), col("found"))
  }

  /** Driver query: page 2 of 15 over a price floor + date range + country
    * and priority IN-lists (exercises every filter type and the offset
    * math). */
  def advancedSearch(spark: SparkSession, dir: String): DataFrame =
    advancedOrderSearch(spark, dir, OrderFilters(
      minTotal = Some(300000.0), fromDate = Some("1996-01-01"), toDate = Some("2000-12-31"),
      countries = (0 to 9).map(i => s"NATION_$i"),
      priorities = Seq("1-URGENT", "2-HIGH")), page = 2, perPage = 15)

  def advancedSearchOracle: String =
    """WITH o AS (
      |  SELECT o_orderkey, n_name AS country, o_orderpriority,
      |    CAST(o_orderdate AS DATE) AS order_day,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |), m AS (
      |  SELECT * FROM o
      |  WHERE cents >= 30000000
      |    AND order_day >= DATE '1996-01-01' AND order_day <= DATE '2000-12-31'
      |    AND country IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4',
      |                    'NATION_5', 'NATION_6', 'NATION_7', 'NATION_8', 'NATION_9')
      |    AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      |), f AS (SELECT COUNT(*) AS found FROM m),
      |r AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, o_orderkey) AS BIGINT) AS "rank" FROM m
      |)
      |SELECT "rank", o_orderkey, country, o_orderpriority, order_day,
      |  CAST(cents AS DOUBLE) / 100.0 AS total, found
      |FROM r CROSS JOIN f
      |WHERE "rank" > 15 AND "rank" <= 30""".stripMargin
}
