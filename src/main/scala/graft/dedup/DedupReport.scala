package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed dedup report: one pair list unioning every detection signal —
  * exact content hash, MinHash-LSH Jaccard, SimHash Hamming, embedding
  * cosine (doc_id ↔ vec_id share the id space in the test tables). The
  * shape a real training-data pipeline feeds its keep/drop policy.
  */
object DedupReport {

  /** `ordered = false` skips the final global sort — the deterministic
    * output order only exists for the driver's hash compare; a 100 TB
    * pipeline consuming the pair list keyed doesn't want a full-output
    * range exchange appended. */
  def report(spark: SparkSession, dir: String, ordered: Boolean = true): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val hashed = docs.withColumn("h", md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .select("doc_id", "h")
    val exactPairs = hashed.as("a").join(hashed.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        lit("exact").as("method"), lit(1.0).as("score"))
    // sub-detectors run UNORDERED always: the report's own final sort (when
    // requested) supersedes theirs, so their per-detector full-output sorts
    // would be three wasted range exchanges
    val minhashPairs = MinHashLsh.nearDupPairs(spark, dir, threshold = 0.8, ordered = false)
      .select(col("doc_a"), col("doc_b"), lit("minhash").as("method"), col("jaccard").as("score"))
    val simhashPairs = SimHash.nearDupPairs(spark, dir, maxHamming = 3, ordered = false)
      .select(col("doc_a"), col("doc_b"), lit("simhash").as("method"),
        (lit(1.0) - col("hamming") / lit(64.0)).as("score"))
    val embedPairs = graft.ann.Ann.embeddingNearDups(spark, dir, threshold = 0.4, ordered = false)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
        lit("embedding").as("method"), col("cos_sim").as("score"))
    val all = exactPairs.unionByName(minhashPairs).unionByName(simhashPairs)
      .unionByName(embedPairs)
    if (ordered) all.orderBy(col("doc_a"), col("doc_b"), col("method")) else all
  }
}
