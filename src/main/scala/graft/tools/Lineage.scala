package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Data-lineage extraction (reference: src/etl/lineage/data_lineage_tracker.py,
  * which maintains a hand-registered lineage graph in service code).
  * Spark-native re-expression: the TRUE lineage is already in the physical
  * plan — walk it and report, per source scan, the files actually read, the
  * columns actually decoded (post column-pruning) and the filters actually
  * pushed. Nothing to register, nothing to drift out of date: the report is
  * derived from the very plan that executes, so it doubles as a scale audit
  * (a scan reading more columns than the query needs shows up immediately).
  */
object Lineage {

  final case class ScanLineage(
      table: String,          // basename of the scan root (e.g. lineitem.parquet)
      format: String,
      rootPaths: Seq[String],
      columnsRead: Seq[String],
      pushedFilters: Seq[String])

  /** All file scans feeding `df`, descending through AQE wrappers. */
  def scans(df: DataFrame): Seq[ScanLineage] = {
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
    }.flatten
    walk(df.queryExecution.executedPlan).map { s =>
      val roots = s.relation.location.rootPaths.map(_.toString)
      ScanLineage(
        table = roots.headOption.map(_.split('/').last).getOrElse("<unknown>"),
        format = s.relation.fileFormat.toString,
        rootPaths = roots,
        columnsRead = s.requiredSchema.fieldNames.toSeq,
        pushedFilters = s.dataFilters.map(_.sql))
    }
  }

  /** Lineage as a small DataFrame (one row per scan) for reporting sinks. */
  def report(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    scans(df).map(s => (s.table, s.format, s.rootPaths.mkString(","),
      s.columnsRead.sorted.mkString(","), s.pushedFilters.mkString(" AND ")))
      .toDF("table", "format", "root_paths", "columns_read", "pushed_filters")
  }
}
