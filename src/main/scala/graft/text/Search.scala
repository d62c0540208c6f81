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
}
