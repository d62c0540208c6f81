package graft.tools

import org.apache.spark.sql.SparkSession

/** Construction-vs-execution profiler for declared queries (not part of
  * the library surface): for each named query, times `fn(spark, dir)`
  * (driver-side plan construction, including any eager sub-arcs) and the
  * noop-sink execution separately, over SPARK_GRAFT_REPS reps — the r17
  * harness for deciding whether a query's cost is planning or tasks. */
object QueryPhases {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryPhases <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => graft.Tables.read(spark, sfDir, t).count())
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly
    args.foreach { name =>
      val fn = all(name)
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        println(f"[qphases] $name rep$rep construct ${(t1 - t0) / 1e9}%6.2f s  exec ${(t2 - t1) / 1e9}%6.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
