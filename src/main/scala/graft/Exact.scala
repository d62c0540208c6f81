package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-determinism helpers (SURVEY.md §3).
  *
  * Distributed double summation is order-dependent, and the driver
  * hash-compares our parquet output against a DuckDB oracle. Every aggregate
  * we emit therefore goes through exact decimal arithmetic (associative — the
  * shuffle/AQE order cannot change the result) and is converted to a plain
  * double exactly once at the end. Ratios are computed in the final projection
  * from exact decimal sums and exact counts with the identical IEEE expression
  * the oracle SQL uses, so the doubles match bit-for-bit.
  */
object Exact {
  /** Scale-6 decimal: no double is exactly halfway between two scale-6
    * decimals unless it is also a scale-7 decimal (never for real data), so
    * the rounding mode difference between engines cannot bite. */
  val Dec = "decimal(18,6)"

  /** Exact decimal sum (keep as decimal for further exact arithmetic). */
  def decSum(c: Column): Column = sum(c.cast(Dec))

  /** Exact decimal sum emitted as a double column. */
  def decSumDbl(c: Column): Column = decSum(c).cast("double")

  /** long-typed count(*) — matches DuckDB COUNT(*) BIGINT. */
  def countAll: Column = count(lit(1))
}
