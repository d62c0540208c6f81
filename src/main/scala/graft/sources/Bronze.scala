package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bronze ingest: CSV/JSON → normalized, metadata-stamped, partitioned
  * parquet (reference: src/etl/bronze/spark_bronze.py:70-260).
  *
  * Differences from the reference, on purpose:
  * - explicit schema instead of `inferSchema` (an inference pass reads the
  *   whole input twice — a non-starter at 100 TB; schema drift should fail
  *   loudly, not silently retype columns);
  * - one `spark.read.csv(paths*)` over the file list instead of a
  *   union-per-file driver loop with periodic `.cache()`
  *   (spark_bronze.py:143-171) — Spark parallelizes multi-file scans natively;
  * - ingestion metadata columns are constant literals, so they compress to
  *   nothing in parquet.
  */
object Bronze {

  /** snake_case normalization for arbitrary source headers
    * (reference: spark_bronze.py:178-236's hand mapping, generalized). */
  def normalizeName(name: String): String =
    name.trim
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")
      .toLowerCase

  def normalizeColumns(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, normalizeName(c)))

  /** Read CSVs with an explicit schema and stamp ingestion metadata. */
  def readCsv(spark: SparkSession, schema: StructType, jobId: String,
              paths: Seq[String], timestampFormat: String = "M/d/yyyy H:mm"): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("timestampFormat", timestampFormat)
      .option("mode", "PERMISSIVE") // bad rows null out, they don't kill the job
      .schema(schema)
      .csv(paths: _*)
    normalizeColumns(raw)
      .withColumn("source_file_path", input_file_name())
      .withColumn("source_file_type", lit("csv"))
      .withColumn("ingestion_job_id", lit(jobId))
      .withColumn("ingestion_timestamp", current_timestamp())
  }

  /** Write a bronze/silver table partitioned by the given columns
    * (reference partitions silver by invoice_year, spark_bronze.py writes
    * partitioned parquet). maxRecordsPerFile bounds file sizes so a skewed
    * partition can't produce one giant file. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
