package graft.text

import graft.operators.RankOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation over the documents table: keep the top-q fraction
  * by quality score (exact global rank — RankOps, no single-partition sort)
  * and the token-length histogram a curation run reports.
  */
object Curation {

  /** doc_id + quality rank + keep flag for the top `keepFraction`. */
  def qualityKeep(spark: SparkSession, dir: String, keepFraction: Double = 0.5): DataFrame = {
    val stats = TextOps.textStats(spark, dir)
      .select("doc_id", "n_tokens", "quality_score")
    val (ranked, n) = RankOps.withGlobalRankCounted(stats, "quality_rank",
      Seq(col("quality_score").desc, col("doc_id").asc))
    val keepPos = math.ceil(n * keepFraction).toLong
    ranked.withColumn("is_kept", col("quality_rank") <= keepPos)
      .select("doc_id", "n_tokens", "quality_score", "quality_rank", "is_kept")
  }

  /** Token-count histogram with fixed bucket edges (0-25, 26-50, 51-75, 75+). */
  def tokenHistogram(spark: SparkSession, dir: String): DataFrame = {
    val stats = TextOps.textStats(spark, dir).select("doc_id", "n_tokens")
    val bucket = (lit(1) + (col("n_tokens") > 25).cast("int")
      + (col("n_tokens") > 50).cast("int") + (col("n_tokens") > 75).cast("int")).cast("long")
    stats.withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
  }
}
