package graft.tools

import graft.Tables
import graft.ann.Ann
import org.apache.spark.sql.functions._

/** Scratch measurement main: recall@10 vs brute force for the IVF
  * coverage ladder at the SIZE-DERIVED list count (r16) and the LSH
  * `tables` ladder at a given SF dir — the evidence behind the shipped
  * ANN defaults (nListsFor, ivfDefaultProbe, lshDefaultTables). Not part
  * of the query surface. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.create("recall-probe", "local[32]")
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val k = 10
    val brute = Ann.bruteTopKExact(emb, queries, k)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val nl = Ann.derivedLists(spark, dir)
    // r17: the ladder reaches down to 1/32 coverage — on CLUSTERED corpora
    // (replicate.py --cluster) recall holds at tiny coverage and the small
    // rungs are where the data-adaptive default lives
    val probeLadder = Seq(nl / 32, nl / 16, nl / 8, nl / 4, nl / 2,
      nl * 5 / 8, nl * 3 / 4, nl * 7 / 8, Ann.ivfDefaultProbe(nl), nl)
      .map(math.max(1, _)).distinct.sorted
    for (nProbe <- probeLadder) {
      val t0 = System.nanoTime()
      val r = recallOf(Ann.ivfTopK(emb, queries, k, nProbe = nProbe))
      val sec = (System.nanoTime() - t0) / 1e9
      val cov = nProbe.toDouble / nl
      println(f"RECALL kind=ivf dir=$dir nLists=$nl nProbe=$nProbe " +
        f"coverage=$cov%.3f recall=$r%.3f sec=$sec%.1f" +
        (if (nProbe == Ann.ivfDefaultProbe(nl)) " (shipped default)" else ""))
    }
    for (tables <- Seq(12, 16, 20, 24, 30)) {
      val t0 = System.nanoTime()
      val r = recallOf(Ann.lshTopK(emb, queries, k, tables = tables))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"RECALL kind=lsh dir=$dir tables=$tables recall=$r%.3f sec=$sec%.1f")
    }
    spark.stop()
  }
}
