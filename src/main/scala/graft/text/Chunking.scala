package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document chunking with overlap (reference:
  * src/vector_search/embeddings/text_embeddings.py:137-156 `chunk_text` —
  * whitespace-token chunks of `chunk_size` words advancing by
  * `chunk_size - overlap`, with a document at or under `chunk_size` tokens
  * passing through as one verbatim chunk).
  *
  * The reference chunks one Python string at a time on the driver; here the
  * token slice per chunk is a single codegen'd projection
  * (`sequence`/`slice`/`concat_ws` over the split array) — no UDF, no
  * driver loop, embarrassingly parallel over document partitions (zero
  * shuffles), so the operator scales with the scan. Chunk count per doc is
  * `ceil((n - chunkSize) / stride) + 1` — exactly the reference's while-loop
  * emission.
  */
object Chunking {

  /** (doc_id, chunk_id, chunk_text, n_tokens) — `chunk_id` is the 0-based
    * chunk index; a doc with at most `chunkSize` tokens yields one chunk
    * carrying the original text verbatim (reference contract). */
  def chunkDocs(docs: DataFrame, chunkSize: Int = 32, overlap: Int = 8): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val start = col("chunk_id").cast("long") * stride
    val len = least(lit(chunkSize.toLong), col("__n") - start)
    docs
      .withColumn("__toks", split(trim(col("text")), "\\s+"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__nchunks", when(col("__n") <= chunkSize, lit(1L))
        .otherwise(expr(s"(__n - $chunkSize + ${stride - 1}) div $stride + 1")))
      .withColumn("chunk_id", explode(sequence(lit(0), (col("__nchunks") - 1).cast("int"))))
      .select(
        col("doc_id"), col("chunk_id"),
        when(col("__n") <= chunkSize, col("text"))
          .otherwise(concat_ws(" ",
            slice(col("__toks"), (start + 1).cast("int"), len.cast("int")))).as("chunk_text"),
        when(col("__n") <= chunkSize, col("__n")).otherwise(len).cast("int").as("n_tokens"))
  }

  /** Chunks of the documents table, ordered for the driver compare. */
  def docChunks(spark: SparkSession, dir: String,
                chunkSize: Int = 32, overlap: Int = 8): DataFrame =
    chunkDocs(Tables.documents(spark, dir), chunkSize, overlap)
      .orderBy("doc_id", "chunk_id")

  /** Chunk-level embeddings as exploded fixed-point components:
    * (doc_id, chunk_id, dim, q20) where q20 = round(v_i * 2^20 / ||v||) —
    * the deterministic embedder of [[Embeddings]] with L2 normalization
    * expressed in q20 fixed point so the result is bit-identical on any
    * engine (the float path for ANN is `Embeddings.embedding`). */
  def chunkEmbeddings(spark: SparkSession, dir: String, chunkSize: Int = 32,
                      overlap: Int = 8, dim: Int = Embeddings.Dim,
                      ordered: Boolean = true): DataFrame = {
    val c = chunkDocs(Tables.documents(spark, dir), chunkSize, overlap)
    val out = c.withColumn("__v", Embeddings.rawComponents(col("chunk_text"), dim))
      .withColumn("__n2", aggregate(col("__v"), lit(0L), (a, x) => a + x * x))
      .select(col("doc_id"), col("chunk_id"), col("__n2"),
        posexplode(col("__v")).as(Seq("dim", "__x")))
      .select(col("doc_id"), col("chunk_id"), col("dim"),
        when(col("__n2") === 0L, lit(0L))
          .otherwise(round(col("__x").cast("double") * lit(1048576.0)
            / sqrt(col("__n2").cast("double"))).cast("long")).as("q20"))
    // compare-only convenience: the dim-level frame is the library's largest
    // derived output (docs × chunks × dim rows) — production callers keep it
    // unsorted
    if (ordered) out.orderBy("doc_id", "chunk_id", "dim") else out
  }

  private def chunkSqlCte(chunkSize: Int, overlap: Int): String = {
    val stride = chunkSize - overlap
    s"""ck AS (
       |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents
       |), cm AS (
       |  SELECT doc_id, text, toks, CAST(len(toks) AS BIGINT) AS n,
       |    CASE WHEN len(toks) <= $chunkSize THEN 1
       |         ELSE (CAST(len(toks) AS BIGINT) - $chunkSize + ${stride - 1}) // $stride + 1
       |    END AS nchunks
       |  FROM ck
       |), chunks AS (
       |  SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
       |    CASE WHEN n <= $chunkSize THEN text
       |         ELSE array_to_string(toks[(i * $stride + 1):(i * $stride + least($chunkSize, n - i * $stride))], ' ')
       |    END AS chunk_text,
       |    CAST(CASE WHEN n <= $chunkSize THEN n ELSE least($chunkSize, n - i * $stride) END AS INTEGER) AS n_tokens
       |  FROM cm, UNNEST(generate_series(0, nchunks - 1)) AS u(i)
       |)""".stripMargin
  }

  /** DuckDB oracle mirroring docChunks. */
  def docChunksOracle: String =
    s"""WITH ${chunkSqlCte(32, 8)}
       |SELECT doc_id, chunk_id, chunk_text, n_tokens FROM chunks""".stripMargin

  /** DuckDB oracle mirroring chunkEmbeddings (see Embeddings.rawComponents
    * for the shared hash-component contract; the hex parse mirrors Spark's
    * conv(substring(md5(..),1,8),16,10)). */
  def chunkEmbeddingsOracle: String =
    s"""WITH ${chunkSqlCte(32, 8)},
       |comp AS (
       |  SELECT doc_id, chunk_id, CAST(i AS INTEGER) AS dim,
       |    CAST(list_sum(list_transform(range(1, 9), j ->
       |      (strpos('0123456789abcdef', substring(md5(chunk_text || '|' || CAST(i AS VARCHAR)), j, 1)) - 1)
       |        * (16.0 ** (8 - j)))) AS BIGINT) % 2001 - 1000 AS v
       |  FROM chunks, UNNEST(generate_series(0, ${Embeddings.Dim - 1})) AS u(i)
       |), n2 AS (
       |  SELECT doc_id, chunk_id, CAST(SUM(v * v) AS BIGINT) AS n2
       |  FROM comp GROUP BY 1, 2
       |)
       |SELECT comp.doc_id, comp.chunk_id, comp.dim,
       |  CASE WHEN n2 = 0 THEN 0
       |       ELSE CAST(round(CAST(v AS DOUBLE) * 1048576.0 / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT)
       |  END AS q20
       |FROM comp JOIN n2 ON comp.doc_id = n2.doc_id AND comp.chunk_id = n2.chunk_id""".stripMargin
}
