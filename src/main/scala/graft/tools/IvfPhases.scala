package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Phase profiler for the IVFADC / IVF append arcs (not part of the
  * library surface): times build / append / probe separately, twice, so
  * cold (fit) and warm (memoized-model) costs separate — the r17
  * optimization-round measurement harness for the append-family queries. */
object IvfPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-job timing: prints every Spark job's wall duration so a phase's
    // cost decomposes into its constituent jobs (gaps = driver-side work)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStarts.remove(je.jobId)
        if (t0 != 0L && sys.env.contains("PHASES_JOBS"))
          println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phases] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm the table reads
    graft.Tables.embeddings(spark, sfDir).count()

    (1 to 2).foreach { rep =>
      println(s"== rep $rep (ivfpq) ==")
      val emb = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val idx = graft.streaming.ReplayScratch.dir("phases_ivfpq_idx")
      time("build")(graft.ann.IvfPq.buildIvfPqIndexFrom(
        spark, emb.filter(col("vec_id") % 5 =!= 4), idx))
      time("append0")(graft.ann.IvfPq.appendToIvfPqIndex(
        spark, idx, emb.filter(col("vec_id") % 10 === 4), 0L))
      time("append1")(graft.ann.IvfPq.appendToIvfPqIndex(
        spark, idx, emb.filter(col("vec_id") % 10 === 9), 1L))
      time("probe")(graft.ann.IvfPq.ivfPqTopKIndexedWithAppends(spark, sfDir, idx)
        .write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
    }
    (1 to 2).foreach { rep =>
      println(s"== rep $rep (ivf) ==")
      val emb = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val idx = graft.streaming.ReplayScratch.dir("phases_ivf_idx")
      time("build")(graft.ann.Ann.buildIvfIndexFrom(
        spark, emb.filter(col("vec_id") % 5 =!= 4), idx))
      time("append0")(graft.ann.Ann.appendToIvfIndex(
        spark, idx, emb.filter(col("vec_id") % 10 === 4), 0L))
      time("append1")(graft.ann.Ann.appendToIvfIndex(
        spark, idx, emb.filter(col("vec_id") % 10 === 9), 1L))
      time("probe")(graft.ann.Ann.ivfTopKIndexedWithAppends(spark, sfDir, idx)
        .orderBy(col("query_id"), col("rank"))
        .write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
