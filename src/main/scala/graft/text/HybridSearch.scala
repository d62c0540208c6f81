package graft.text

import graft.Tables
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
  * List fusion, not corpus fusion: each modality retrieves its top
  * `candidates` (default 200) via a distributed TakeOrdered, ranks are
  * positions WITHIN each candidate list, and a document absent from a list
  * contributes 0 to the fused score — exactly how production RRF works
  * (Elasticsearch/OpenSearch fuse per-retriever top-k lists). That keeps
  * the expensive part a pure projection + two bounded TakeOrdereds: no
  * global sort anywhere, and the only single-partition work is the
  * ≤ `candidates`-row lists (bounded by the knob, not the data).
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

  /** Driver-side q20 embedding of the (constant) query string — the md5
    * expression tree is not constant-foldable, so evaluating it per row
    * would re-hash the query `dim` times for every document. Bit-identical
    * to q20Vec: same md5-prefix components, same HALF_UP rounding as Spark
    * `round` and the DuckDB oracle. */
  private[graft] def q20Const(text: String, dim: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val v = Array.tabulate(dim) { i =>
      val hex = md.digest(s"$text|$i".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }
    val n2 = v.map(x => x * x).sum
    if (n2 == 0L) Array.fill(dim)(0L)
    else v.map(x => BigDecimal(x.toDouble * 1048576.0 / math.sqrt(n2.toDouble))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
  }

  def hybridSearch(spark: SparkSession, dir: String, query: String = DefaultQuery,
                   limit: Int = 20, candidates: Int = 200,
                   dim: Int = Embeddings.Dim): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = query.toLowerCase.split("\\s+").toSeq
    val scored = Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        // codegen'd count_in kernel (TextKernels.scala): one compiled loop
        // over a shared hash set instead of the interpreted per-token
        // k-term IN-list lambda — same null semantics (null tokens drop).
        graft.functions.CountIn.of(spark, words(col("text")), terms).as("kw_score"),
        aggregate(
          zip_with(q20Vec(col("text"), dim), typedLit(q20Const(query, dim).toSeq),
            (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("vec_score"))
    // per-modality candidate lists: distributed TakeOrdered, then ranks over
    // the ≤ `candidates`-row retained frame (bounded by the knob, not data)
    def topList(scoreCol: String, rankCol: String) = {
      val ord = Seq(col(scoreCol).desc, col("doc_id").asc)
      scored.select(col("doc_id"), col(scoreCol))
        .orderBy(ord: _*).limit(candidates)
        .withColumn(rankCol, row_number().over(Window.orderBy(ord: _*)).cast("long"))
    }
    val fused = topList("kw_score", "kw_rank")
      .join(topList("vec_score", "vec_rank"), Seq("doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(RrfK) + col("kw_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)))
    fused
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
       |), kt AS (
       |  SELECT doc_id, kw_score,
       |    CAST(row_number() OVER (ORDER BY kw_score DESC, doc_id) AS BIGINT) AS kw_rank
       |  FROM kw ORDER BY kw_score DESC, doc_id LIMIT 200
       |), vt AS (
       |  SELECT doc_id, vec_score,
       |    CAST(row_number() OVER (ORDER BY vec_score DESC, doc_id) AS BIGINT) AS vec_rank
       |  FROM vs ORDER BY vec_score DESC, doc_id LIMIT 200
       |)
       |SELECT coalesce(kt.doc_id, vt.doc_id) AS doc_id, kw_score, vec_score,
       |  kw_rank, vec_rank,
       |  coalesce(1.0 / ($RrfK + kw_rank), 0.0) + coalesce(1.0 / ($RrfK + vec_rank), 0.0)
       |    AS rrf_score
       |FROM kt FULL OUTER JOIN vt ON kt.doc_id = vt.doc_id
       |ORDER BY rrf_score DESC, coalesce(kt.doc_id, vt.doc_id) LIMIT 20""".stripMargin
  }
}
