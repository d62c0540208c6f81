package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental (new-batch-vs-corpus) deduplication — the shape every
  * continuously-crawled corpus needs: the nightly batch must dedup against
  * the existing corpus WITHOUT re-deduping the corpus against itself.
  * Reference analog: none (its dedup is whole-corpus only); beyond-reference
  * LLM-pipeline surface. The batch here is the `src0` slice of `documents`
  * standing in for "the new crawl"; everything else is the settled corpus.
  *
  * Decisions, in precedence order:
  *   - `drop_exact`     — the batch document's content hash already exists
  *                        in the corpus (keeper = smallest corpus doc_id);
  *   - `drop_batch_dup` — first seen in THIS batch under the same hash
  *                        (keeper = smallest batch doc_id with the hash);
  *   - `keep`           — new content.
  *
  * Scale shape (100 TB corpus, small daily batch): the corpus side reduces
  * to one (hash → min doc_id) aggregate — distinct hashes, not documents —
  * then joins the batch on the hash key; AQE broadcasts the batch side when
  * it is small, and the shuffle formulation stays correct when a backfill
  * makes it huge. Within-batch dedup is a hash-partitioned min window over
  * the batch only. The settled corpus is never self-joined.
  */
object IncrementalDedup {

  val BatchSource = "src0"

  private def hashed(df: DataFrame): DataFrame =
    df.withColumn("content_hash",
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))

  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = hashed(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), col("content_hash"))
    val batch = docs.filter(col("source") === BatchSource)
    val corpusKeepers = docs.filter(col("source") =!= BatchSource)
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("corpus_keeper_id"))
    val w = Window.partitionBy(col("content_hash"))
    val out = batch
      .withColumn("batch_keeper_id", min(col("doc_id")).over(w))
      .join(corpusKeepers, Seq("content_hash"), "left")
      .withColumn("decision",
        when(col("corpus_keeper_id").isNotNull, "drop_exact")
          .when(col("batch_keeper_id") < col("doc_id"), "drop_batch_dup")
          .otherwise("keep"))
      .withColumn("keeper_id",
        when(col("decision") === "drop_exact", col("corpus_keeper_id"))
          .when(col("decision") === "drop_batch_dup", col("batch_keeper_id"))
          .otherwise(lit(null).cast("long")))
    out.select(col("doc_id"), col("content_hash"), col("decision"), col("keeper_id"))
  }

  def incrementalDedupOracle: String =
    s"""WITH h AS (
       |  SELECT doc_id, source,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash
       |  FROM documents
       |), corpus AS (
       |  SELECT content_hash, MIN(doc_id) AS corpus_keeper_id
       |  FROM h WHERE source <> '$BatchSource' GROUP BY 1
       |), batch AS (
       |  SELECT doc_id, content_hash,
       |    MIN(doc_id) OVER (PARTITION BY content_hash) AS batch_keeper_id
       |  FROM h WHERE source = '$BatchSource'
       |)
       |SELECT doc_id, batch.content_hash,
       |  CASE WHEN corpus_keeper_id IS NOT NULL THEN 'drop_exact'
       |       WHEN batch_keeper_id < doc_id THEN 'drop_batch_dup'
       |       ELSE 'keep' END AS decision,
       |  CASE WHEN corpus_keeper_id IS NOT NULL THEN corpus_keeper_id
       |       WHEN batch_keeper_id < doc_id THEN batch_keeper_id
       |       ELSE NULL END AS keeper_id
       |FROM batch LEFT JOIN corpus ON batch.content_hash = corpus.content_hash""".stripMargin
}
