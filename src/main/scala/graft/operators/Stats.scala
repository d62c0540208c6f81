package graft.operators

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation matrix over the lineitem numeric measures
  * (reference: src/data_quality/core/statistical_analyzer.py:210-337 —
  * `analyze_correlations` + `_identify_strong_correlations`).
  *
  * The reference pulls each column to the driver as a Python list and loops;
  * here it is ONE distributed aggregate pass over lineitem computing every
  * moment (n, Σx per column, Σxy per ordered pair) at once, then a driver-side
  * 6-row explode of the single moment row into long-form (col_x, col_y, corr).
  * Determinism recipe (SURVEY §3, same as anomaly_orders): measures become
  * exact integer cents, the cross-moments are exact DECIMAL(38,0) sums, and
  * only the final Pearson projection runs in IEEE double with the identical
  * expression on both engines. The cents scale factor cancels in r.
  */
object Stats {

  /** (parquet column, short alias) — aliases keep the moment-column names
    * compact and are never exposed in the output. */
  private val measures = Seq(
    "l_quantity" -> "qty", "l_extendedprice" -> "price",
    "l_discount" -> "disc", "l_tax" -> "tax")

  private val orderedPairs = // i <= j: self-pairs give the Σx² terms
    for { (i, ai) <- measures.zipWithIndex; (j, _) <- measures.zipWithIndex.drop(ai) } yield (i, j)

  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.lineitem(spark, dir).select(
      measures.map { case (c, a) => round(col(c) * 100, 0).cast("long").as(a) }: _*)
    def dec(a: String): Column = col(a).cast("decimal(19,0)")
    val moments = cents.agg(
      countAll.as("n"),
      measures.map { case (_, a) => sum(col(a)).as(s"s_$a") } ++
        orderedPairs.map { case ((_, a), (_, b)) => sum(dec(a) * dec(b)).as(s"p_${a}_$b") }: _*)

    val nD = col("n").cast("double")
    def s(a: String): Column = col(s"s_$a").cast("double")
    def p(a: String, b: String): Column = col(s"p_${a}_$b").cast("double")
    def corr(a: String, b: String): Column = {
      val den = sqrt(nD * p(a, a) - s(a) * s(a)) * sqrt(nD * p(b, b) - s(b) * s(b))
      when(den === 0.0, lit(null).cast("double"))
        .otherwise((nD * p(a, b) - s(a) * s(b)) / den)
    }
    val rows = orderedPairs.collect { case ((cx, a), (cy, b)) if a != b =>
      struct(lit(cx).as("col_x"), lit(cy).as("col_y"),
        col("n").as("n"), corr(a, b).as("corr"))
    }
    moments.select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_x"), col("r.col_y"), col("r.n"), col("r.corr"))
      .withColumn("strong", abs(col("corr")) >= 0.7)
  }

  /** DuckDB oracle mirroring corrMatrix, generated from the same
    * measure/pair lists so the two can never drift. */
  def corrMatrixOracle: String = {
    val centsSel = measures.map { case (c, a) => s"CAST(round($c * 100) AS BIGINT) AS $a" }.mkString(", ")
    val momentSel = (Seq("COUNT(*) AS n") ++
      measures.map { case (_, a) => s"CAST(SUM($a) AS BIGINT) AS s_$a" } ++
      orderedPairs.map { case ((_, a), (_, b)) =>
        s"SUM(CAST($a AS DECIMAL(19,0)) * CAST($b AS DECIMAL(19,0))) AS p_${a}_$b" }).mkString(", ")
    def corrSql(a: String, b: String): String = {
      val den = s"(sqrt(CAST(n AS DOUBLE) * CAST(p_${a}_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) * " +
        s"sqrt(CAST(n AS DOUBLE) * CAST(p_${b}_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))"
      s"CASE WHEN $den = 0.0 THEN NULL ELSE " +
        s"(CAST(n AS DOUBLE) * CAST(p_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)) / $den END"
    }
    val branches = orderedPairs.collect { case ((cx, a), (cy, b)) if a != b =>
      s"SELECT '$cx' AS col_x, '$cy' AS col_y, n, ${corrSql(a, b)} AS corr FROM m"
    }.mkString("\nUNION ALL\n")
    s"""WITH c AS (SELECT $centsSel FROM lineitem),
       |m AS (SELECT $momentSel FROM c),
       |long AS (
       |$branches
       |)
       |SELECT col_x, col_y, n, corr, abs(corr) >= 0.7 AS strong FROM long""".stripMargin
  }
}
