package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry point (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
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

    (1 to 3).foreach { i =>
      time(s"asof_composed count #$i") { graft.operators.AsOf.eventsAsofOrders(spark, sfDir).count() }
      time(s"asof_native count #$i") { graft.operators.AsOf.eventsAsofOrdersNative(spark, sfDir).count() }
    }
    spark.stop()
  }
}
