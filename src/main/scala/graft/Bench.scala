package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. The action is a noop-sink write (`format
  * ("noop")`), NOT `count()`: count uses no output columns, so Catalyst
  * legitimately prunes unreferenced projections and even eliminates
  * unique-key joins (an aggregate's group key is provably unique — a left
  * join against it vanishes under a count-only action, and the "benchmark"
  * times a bare scan). The noop sink materializes every output column with
  * zero write cost, so the measured plan is the plan a consumer pays for.
  *
  * Timing protocol: SWEEPS, not back-to-back repeats. A sweep times every
  * query exactly once, in sorted-name order; the whole sweep is repeated
  * SPARK_GRAFT_BENCH_RUNS times (default 3) and each query reports its
  * MIN across sweeps (median also emitted for the contention monitor).
  * Rationale (BASELINE.md): on this shared box a sustained co-tenant stall
  * lasting minutes poisons *all three* back-to-back runs of the queries it
  * overlaps — BENCH_r07 recorded 12–34 s "minimums" for five alphabetically
  * adjacent sub-second queries that way. With sweeps the same stall overlaps
  * each query in at most one sweep out of three, so min-across-sweeps
  * recovers the steady-state number. Per-sweep wall-clock totals are emitted
  * so a contended sweep is visible in the artifact itself.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // optional args: restrict to these query names (local iteration only;
    // the driver always runs with no args → full sweep), Verify's precedent
    val subset: Option[Set[String]] = if (args.isEmpty) None else Some(args.toSet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
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

    // ---- ambient controls (r14 item #7, landed r16): a PINNED set of
    // three micro-queries that no operator change ever touches — pure CPU
    // (hash over a range), scan+agg (lineitem), and one shuffle (groupBy).
    // Run once per sweep; their min-across-sweeps is emitted, plus
    // ambient_factor = geometric mean of (measured / reference), where the
    // reference constants are this box's idle-state r16 measurements at
    // sf0.1. Cross-round comparison becomes mechanical: divide a query's
    // raw ratio by the rounds' ambient_factor ratio to remove co-tenant
    // noise. Controls are sf-dependent through the two table controls, so
    // compare ambient_factor only between runs at the SAME sf dir.
    import org.apache.spark.sql.functions.{col, expr, sum => fsum}
    val controls: Seq[(String, () => Unit)] = Seq(
      // bit_xor, not sum: ANSI sum of 20M random longs overflows
      ("ctl_cpu", () => spark.range(20000000L).select(expr("bit_xor(xxhash64(id))"))
        .write.mode("overwrite").format("noop").save()),
      ("ctl_scan", () => Tables.read(spark, sfDir, "lineitem")
        .select(fsum(col("l_extendedprice") * col("l_quantity")))
        .write.mode("overwrite").format("noop").save()),
      ("ctl_shuffle", () => Tables.read(spark, sfDir, "lineitem")
        .groupBy(col("l_partkey")).count()
        .write.mode("overwrite").format("noop").save()))
    // idle-box reference seconds (measured r16, local[32] sf0.1 full
    // sweep, min-across-3) — keep in lockstep with the control
    // definitions above
    val ctlRef = Map("ctl_cpu" -> 0.24, "ctl_scan" -> 0.22, "ctl_shuffle" -> 0.36)

    val names = (SparkEntry.queries ++ SparkEntry.benchOnly).toSeq
      .filter { case (name, _) => subset.forall(_.contains(name)) }
      .sortBy(_._1)
    // sweeps(s)(i) = time of query i in sweep s, None on failure
    val ctlSweeps = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    val sweeps: Seq[(Double, Seq[Option[Double]])] = (1 to runs).map { _ =>
      ctlSweeps += controls.map { case (_, fn) =>
        val c0 = System.nanoTime()
        fn()
        val dt = (System.nanoTime() - c0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val s0 = System.nanoTime()
      val times = names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // elapsed is captured INSIDE the try so the finally's cleanup work
        // (cache clear, optional GC) never lands in the measured region
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
        } finally {
          spark.catalog.clearCache()
          // Shuffle files persist until their RDDs are GC'd (ContextCleaner
          // collects weak refs) — back-to-back 600M-row aggregations in one
          // local session accumulated ~26 GB of blockmgr state and the 1000×
          // probe's fifth query filled the disk mid-spill. The GC nudge
          // between queries bounds live shuffle state to roughly the current
          // query's. Off by default; set =1 for disk-bound scale probes.
          if (sys.env.get("SPARK_GRAFT_BENCH_GC").contains("1")) System.gc()
        }
      }
      ((System.nanoTime() - s0) / 1e9, times)
    }

    val results = names.zipWithIndex.map { case ((name, _), i) =>
      val times = sweeps.flatMap(_._2(i))
      // min across sweeps is the contention-robust statistic (a stall hits a
      // query in at most one sweep); median across sweeps is the monitor —
      // the median-vs-min spread IS the co-tenant-contention indicator
      val median = times.sorted.lift((times.size - 1) / 2)
      (name, median.getOrElse(0.0), times.minOption.getOrElse(0.0), times.size == runs)
    }
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.collect { case (k, v, _, true) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val qsMin = results.collect { case (k, _, m, true) => "\"" + k + "\":" + num(m) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, _, true) => v }.sum
    val totalMin = results.collect { case (_, _, m, true) => m }.sum
    val sweepTotals = sweeps.map(s => num(s._1)).mkString("[", ",", "]")
    val ctlMin = controls.indices.map(i => ctlSweeps.map(_(i)).min)
    val ctlJson = controls.zip(ctlMin)
      .map { case ((n, _), v) => "\"" + n + "\":" + num(v) }
      .mkString("{", ",", "}")
    val ambient = math.exp(controls.zip(ctlMin).map { case ((n, _), v) =>
      math.log(math.max(1e-3, v) / ctlRef(n)) }.sum / controls.size)
    // controls/ambient_factor ride at the END of the line (r16 verdict:
    // the driver's tail capture truncates the head of long lines, and the
    // ambient controls exist precisely to make truncated-round artifacts
    // comparable), plus a second compact line as belt-and-braces
    println(s"""{"ambient_factor":${num(ambient)},"controls":$ctlJson}""")
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","total_min":${num(totalMin)},"sweep_wall_sec":$sweepTotals,"protocol":"min-across-$runs-sweeps","queries":$qs,"queries_min":$qsMin,"failed":$failed,"sf":"$sfDir","controls":$ctlJson,"ambient_factor":${num(ambient)}}""")
    spark.stop()
    if (results.exists(!_._4)) sys.exit(1)
  }
}
