package graft

import org.apache.spark.sql.SparkSession

/** One-call session setup for library users: the recommended scale configs
  * (AQE with coalesce + skew handling) and every graft custom function
  * registered. Cluster deployments can instead ship
  * `spark.sql.extensions=graft.functions.GraftExtensions` in spark-defaults.
  */
object GraftSession {

  def builder(appName: String = "graft", master: String = "local[*]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")

  /** getOrCreate + register `array_cosine` and `simhash64` (the
    * parameterized expressions — srp_buckets_*, minhash_sig_* — register
    * themselves on first use with their config baked in). */
  def create(appName: String = "graft", master: String = "local[*]",
             shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(appName, master, shufflePartitions).getOrCreate()
    graft.functions.VectorFunctions.register(spark)
    graft.functions.SimHash64.register(spark)
    graft.functions.TextKernels.register(spark)
    spark
  }
}
