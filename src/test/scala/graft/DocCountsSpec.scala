package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-check (advice-r14): README's driver-contract counts must track the
  * actual `SparkEntry` maps — the r14 diff grew `queries` without the
  * oracle count following. Derives both numbers from the maps so the doc
  * can never drift silently again. */
class DocCountsSpec extends AnyFunSuite {

  private lazy val readme = {
    val src = scala.io.Source.fromFile("README.md", "UTF-8")
    try src.mkString finally src.close()
  }

  private def firstInt(pattern: String): Int = {
    val m = pattern.r.findFirstMatchIn(readme)
    assert(m.isDefined, s"README.md no longer contains /$pattern/")
    m.get.group(1).toInt
  }

  test("README query count matches SparkEntry.queries") {
    assert(firstInt("""\((\d+) named queries\)""") === SparkEntry.queries.size)
  }

  test("README oracle count matches SparkEntry.oracleSql") {
    assert(firstInt("""\((\d+) DuckDB-equivalent SQL strings""") ===
      SparkEntry.oracleSql.size)
  }

  test("README crosscheck comment matches the oracle count") {
    assert(firstInt("""# (\d+) ok, 0 fail""") === SparkEntry.oracleSql.size)
  }

  test("every query has an oracle (the r14 gate invariant: zero rows-only)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
