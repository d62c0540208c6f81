package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry point (not part of the library surface).
  * SPARK_GRAFT_QUERIES = comma-separated SparkEntry.queries keys to time
  * (default: the as-of pair); SPARK_GRAFT_REPS = times per query (default 3).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "asof_join,asof_native")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to reps).foreach { i =>
      names.foreach { name =>
        graft.SparkEntry.queries.get(name) match {
          case Some(fn) =>
            // noop sink, not count(): count prunes unused projections and
            // unique-key joins, timing a plan nobody actually runs (Bench)
            time(s"$name #$i") {
              fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            }
            spark.catalog.clearCache()
          case None => println(s"[scratch] unknown query: $name")
        }
      }
    }
    spark.stop()
  }
}
