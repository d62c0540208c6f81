package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-capture entry point (not part of the library surface): writes
  * `.explain("formatted")` for each named query to `<outDir>/<name>_<tag>.txt`
  * — the r17 optimization-round evidence files (plans/r17/).
  *
  * args: outDir tag query [query ...]
  * env:  SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  *
  * Initial (pre-AQE) plans: the formatted explain is captured before
  * execution, so Exchange counts / join strategies / PushedFilters are the
  * static planner's — the same artifact `df.explain("formatted")` prints
  * interactively, and what the plan-claims audit checks against. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query> [query ...]")
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2).toSeq
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
    new java.io.File(outDir).mkdirs()
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly
    names.foreach { name =>
      all.get(name) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
          java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
          println(s"[plandump] wrote $p (${txt.length} chars)")
        case None => println(s"[plandump] unknown query: $name")
      }
    }
    spark.stop()
  }
}
