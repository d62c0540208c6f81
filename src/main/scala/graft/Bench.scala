package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. `count()` is the action; every query keeps its
  * aggregates/joins as the final operators, so nothing hides behind a
  * skipped projection. Queries run in sorted-name order (stable timing
  * attribution), with a table-scan warmup so JVM/codegen startup isn't
  * charged to the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table once (footer reads + codegen init)
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "documents", "embeddings")
      .foreach(t => Tables.read(spark, sfDir, t).count())
    Tables.events(spark, sfDir).count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      finally spark.catalog.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
