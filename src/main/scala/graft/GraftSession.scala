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

  /** Recommended config for STATE-HEAVY streaming (sessionization over wide
    * key spaces, stream-stream interval joins): the RocksDB state store
    * provider keeps operator state in native memory/disk instead of the
    * default provider's in-heap map, so executor heap no longer bounds key
    * cardinality — at 100 TB / millions of live sessions the default
    * provider OOMs long before RocksDB breaks a sweat. Changelog
    * checkpointing ships per-batch deltas to the checkpoint location
    * instead of full state snapshots. Both are plain runtime SQL confs: a
    * deployment can equally set them per-session (`spark.conf.set`) before
    * starting the query — RocksDbStreamingSpec pins provider parity on the
    * sessionization and join operators. */
  def streamingBuilder(appName: String = "graft", master: String = "local[*]",
                       shufflePartitions: Int = 32): SparkSession.Builder =
    builder(appName, master, shufflePartitions)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")

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
