package graft.dedup

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (brief requirement).
  *
  * 64-bit SimHash from token-frequency-weighted MD5 bit votes, then the
  * pigeonhole trick: split the 64 bits into 4 × 16-bit bands — any pair with
  * Hamming distance ≤ 3 must agree on at least one whole band — and join on
  * exact band matches only (sub-quadratic candidates), verifying with
  * bit_count(a XOR b).
  */
object SimHash {

  /** doc_id + 64-bit `simhash` (long) — one narrow map through the
    * codegen'd graft.functions.SimHash64 expression (token multiplicity
    * votes fall out of iterating the raw token array; the previous
    * explode → 64-aggregate-column pipeline shuffled every token).
    *
    * The token hash is the MD5-derived portable form (`simhash64_md5`), so
    * a SQL oracle can replay every fingerprint via `md5_number_upper` —
    * that flips the whole detector from rows-only to hash-exact checking.
    * The Murmur3 variant (`simhash64`) remains registered for pipelines
    * that prefer raw speed over cross-engine replayability. */
  def simhashDocs(docs: DataFrame): DataFrame = {
    graft.functions.SimHash64.register(docs.sparkSession)
    docs
      .withColumn("__tokens",
        expr("""filter(split(lower(trim(text)), '\\s+'), t -> length(t) > 0)"""))
      .select(col("doc_id"), expr("simhash64_md5(__tokens)").as("simhash"))
  }

  /** Candidate pairs sharing ≥1 16-bit band, with exact Hamming distance.
    * Exact-duplicate copies collapse to keepers before the pigeonhole join
    * (identical text ⇒ identical simhash ⇒ hamming 0) and expand back after
    * — same output, no m²-inflated buckets on duplicated corpora. */
  /** `ordered = false` skips the output sort (driver-compare convenience
    * only — composed callers re-sort or consume keyed). */
  def nearDupPairs(spark: SparkSession, dir: String, maxHamming: Int = 3,
                   ordered: Boolean = true): DataFrame = {
    val docs = Tables.documents(spark, dir)
    def sorted(df: DataFrame): DataFrame =
      if (ordered) df.orderBy(col("doc_a"), col("doc_b")) else df
    // adaptive: collapse only pays on duplicated corpora; outputs identical
    if (Collapse.duplicationFactor(docs, Collapse.normHash) < Collapse.CollapseThreshold)
      return sorted(keeperPairs(docs, maxHamming))
    val (members, keeperDocs) = Collapse.byNormalizedText(docs)
    val kPairs = keeperPairs(keeperDocs, maxHamming)
    sorted(Collapse.expandPairs(members, kPairs,
      members.select(col("keeper")).distinct(), Seq(lit(0L).as("hamming"))))
  }

  /** Banded pigeonhole pairs among (already distinct) docs. */
  private def keeperPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sh = simhashDocs(docs)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))
    }
    val buckets = sh
      .withColumn("__band", explode(array(bandStructs: _*)))
      .select(col("doc_id"), col("simhash"), col("__band.band").as("band"), col("__band.bucket").as("bucket"))
    val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
