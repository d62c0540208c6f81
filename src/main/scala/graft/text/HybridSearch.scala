package graft.text

import graft.Tables
import graft.operators.RankOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval with reciprocal-rank fusion — the
  * query shape a search deployment runs when it combines a keyword index
  * with an embedding index (the reference pairs its Typesense keyword
  * search, typesense_client.py:55, with the vector indexer; RRF is the
  * standard public fusion rule: score = Σ 1/(k + rank_i), k = 60).
  *
  * Determinism: the lexical score is an integer term-occurrence count; the
  * vector score is an exact-integer dot product of q20 fixed-point
  * embeddings (the [[Embeddings]]/[[Chunking]] recipe — round(v·2^20/‖v‖)
  * per component, products ≤ 2^46 so a long sum is exact); both ranks are
  * exact global row_numbers with doc-id tie-breaks; the RRF sum is two IEEE
  * divisions and one add, bit-identical on any engine.
  *
  * Scale shape: scores are pure projections (the query-side embedding is a
  * constant-folded literal); each rank is a RankOps range-repartitioned
  * global sort (never a single-partition window); the final top-k is a
  * distributed TakeOrdered over `limit` rows.
  */
object HybridSearch {

  val DefaultQuery = "spark join table"
  val RrfK = 60

  private def words(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** q20 fixed-point embedding (array<long>) of any text column. */
  private def q20Vec(text: Column, dim: Int): Column = {
    val v = Embeddings.rawComponents(text, dim)
    val n2 = aggregate(v, lit(0L), (a, x) => a + x * x)
    transform(v, x =>
      when(n2 === 0L, lit(0L))
        .otherwise(round(x.cast("double") * lit(1048576.0) / sqrt(n2.cast("double")))
          .cast("long")))
  }

  def hybridSearch(spark: SparkSession, dir: String, query: String = DefaultQuery,
                   limit: Int = 20, dim: Int = Embeddings.Dim): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").toSeq
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val scored = Tables.documents(spark, dir)
      .withColumn("__w", words(col("text")))
      .select(
        col("doc_id"),
        expr(s"size(filter(__w, x -> x IN ($termList)))").cast("long").as("kw_score"),
        aggregate(
          zip_with(q20Vec(col("text"), dim), q20Vec(lit(query), dim), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("vec_score"))
    val ranked = RankOps.withGlobalRank(
      RankOps.withGlobalRank(scored, "kw_rank",
        Seq(col("kw_score").desc, col("doc_id").asc)),
      "vec_rank", Seq(col("vec_score").desc, col("doc_id").asc))
    ranked
      .withColumn("rrf_score",
        lit(1.0) / (lit(RrfK) + col("kw_rank")) + lit(1.0) / (lit(RrfK) + col("vec_rank")))
      .select("doc_id", "kw_score", "vec_score", "kw_rank", "vec_rank", "rrf_score")
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(limit)
  }

  def hybridSearchOracle: String = {
    val terms = DefaultQuery.toLowerCase.split("\\s+").toSeq
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val dim = Embeddings.Dim
    // digit-fold md5 hex → integer, the chunk_embeddings oracle recipe
    def comp(textExpr: String) =
      s"""CAST(list_sum(list_transform(range(1, 9), j ->
         |      (strpos('0123456789abcdef', substring(md5($textExpr || '|' || CAST(i AS VARCHAR)), j, 1)) - 1)
         |        * (16.0 ** (8 - j)))) AS BIGINT) % 2001 - 1000""".stripMargin
    s"""WITH kw AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |      x -> x IN ($termList))) AS BIGINT) AS kw_score
       |  FROM documents
       |), dc AS (
       |  SELECT doc_id, i, ${comp("text")} AS v
       |  FROM documents, UNNEST(generate_series(0, ${dim - 1})) AS u(i)
       |), dn AS (
       |  SELECT doc_id, CAST(SUM(v * v) AS BIGINT) AS n2 FROM dc GROUP BY 1
       |), dq AS (
       |  SELECT dc.doc_id, i,
       |    CASE WHEN n2 = 0 THEN 0
       |         ELSE CAST(round(CAST(v AS DOUBLE) * 1048576.0 / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT)
       |    END AS q20
       |  FROM dc JOIN dn ON dc.doc_id = dn.doc_id
       |), qc AS (
       |  SELECT i, ${comp(s"'${DefaultQuery}'")} AS v
       |  FROM UNNEST(generate_series(0, ${dim - 1})) AS u(i)
       |), qn AS (SELECT CAST(SUM(v * v) AS BIGINT) AS n2 FROM qc
       |), qq AS (
       |  SELECT i,
       |    CASE WHEN n2 = 0 THEN 0
       |         ELSE CAST(round(CAST(v AS DOUBLE) * 1048576.0 / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT)
       |    END AS q20
       |  FROM qc, qn
       |), vs AS (
       |  SELECT doc_id, CAST(SUM(dq.q20 * qq.q20) AS BIGINT) AS vec_score
       |  FROM dq JOIN qq ON dq.i = qq.i GROUP BY 1
       |), r AS (
       |  SELECT kw.doc_id, kw_score, vec_score,
       |    CAST(row_number() OVER (ORDER BY kw_score DESC, kw.doc_id) AS BIGINT) AS kw_rank,
       |    CAST(row_number() OVER (ORDER BY vec_score DESC, kw.doc_id) AS BIGINT) AS vec_rank
       |  FROM kw JOIN vs ON kw.doc_id = vs.doc_id
       |)
       |SELECT doc_id, kw_score, vec_score, kw_rank, vec_rank,
       |  1.0 / ($RrfK + kw_rank) + 1.0 / ($RrfK + vec_rank) AS rrf_score
       |FROM r
       |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin
  }
}
