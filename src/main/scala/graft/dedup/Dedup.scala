package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact deduplication: hash-groupBy on normalized content
  * (brief requirement; reference analog: the keep-one window dedup at
  * src/etl/silver/spark_silver.py:126, here content-addressed).
  *
  * One shuffle on the content hash; group state is O(1) per distinct
  * document — the canonical 100 TB exact-dedup shape.
  */
object Dedup {

  /** Whitespace-collapsed, case-folded md5 groups over `documents`. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("content_hash",
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .groupBy(col("content_hash"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("keeper_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
}
