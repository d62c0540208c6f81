package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement main: BPE merge-budget timing — the evidence behind
  * the r16 driver-local merge loop (verdict item #3: "numMerges = 32000
  * should be minutes, not 32k Spark jobs").
  *
  * Two measurements:
  *  1. the full bpeMerges surface on the SF dir at the shipped 20 merges
  *     (corpus pass + loop);
  *  2. large budgets (1k/4k merges) on a SYNTHETIC 50k-word vocabulary —
  *     the gate corpora exhaust their pair vocabulary after ~107 merges,
  *     so big-budget timing needs a big vocab. The generator is
  *     deterministic (md5-derived 6–18 char words, zipf-ish counts).
  * Not part of the query surface. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("bpe-probe", "local[32]")
    import spark.implicits._

    val t0 = System.nanoTime()
    val n20 = graft.text.Bpe.bpeMerges(spark, dir, numMerges = 20).count()
    println(f"BPE dir=$dir merges=20 rows=$n20 wall=${(System.nanoTime() - t0) / 1e9}%.1f s")

    // synthetic 50k-word vocab: word = hex md5 prefix of length 6..18
    // (long enough that pair vocabulary survives thousands of merges),
    // count = zipf-ish 1e6/(rank+1)
    val vocab = spark.range(50000).select(
      substring(md5(col("id").cast("string")), lit(1),
        (col("id") % 13 + 6).cast("int")).as("word"),
      (lit(1000000L) / (col("id") + 1)).cast("long").as("n"))
      .groupBy("word").agg(sum("n").as("n"))
    for (budget <- Seq(1000, 4000)) {
      val t1 = System.nanoTime()
      val n = try {
        graft.text.Bpe.mergesFromWords(spark, vocab, budget).count()
      } catch {
        case e: IllegalArgumentException =>
          println(s"BPE synthetic budget=$budget exhausted: ${e.getMessage}"); -1L
      }
      if (n >= 0)
        println(f"BPE synthetic-50k merges=$budget wall=${(System.nanoTime() - t1) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
