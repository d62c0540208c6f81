package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("zInterleave matches a reference Morton implementation") {
    import spark.implicits._
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 1L))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zInterleave(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y), s"interleave($x,$y)")
    }
    // z of the max corner uses exactly 32 bits
    assert(got((65535L, 65535L)) == (1L << 32) - 1)
  }

  test("z-order buckets bound BOTH dims; natural buckets only the ingest key") {
    val rows = Layout.zorderLayout(spark, dir).collect()
    val byLayout = rows.groupBy(_.getAs[String]("layout"))
    val b = Tables.lineitem(spark, dir).agg(
      min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head
    val pkSpan = (b.getLong(1) - b.getLong(0)).toDouble
    val skSpan = (b.getLong(3) - b.getLong(2)).toDouble
    def meanSpan(l: String, lo: String, hi: String): Double = {
      val g = byLayout(l)
      g.map(r => (r.getAs[Long](hi) - r.getAs[Long](lo)).toDouble).sum / g.length
    }
    // each z bucket is a thin slab of the grid: both dims' spans collapse
    assert(meanSpan("zorder", "pk_min", "pk_max") < 0.6 * pkSpan)
    assert(meanSpan("zorder", "sk_min", "sk_max") < 0.6 * skSpan)
    // natural order knows nothing about the probe dims: spans stay ~full
    assert(meanSpan("natural", "pk_min", "pk_max") > 0.9 * pkSpan)
    assert(meanSpan("natural", "sk_min", "sk_max") > 0.9 * skSpan)
    // and the probe-box hit count (files a reader must open) shrinks
    def hits(l: String) = byLayout(l).count(_.getAs[Boolean]("hit"))
    assert(hits("zorder") < hits("natural"),
      s"zorder hits ${hits("zorder")} !< natural ${hits("natural")}")
    assert(hits("natural") == byLayout("natural").length) // probe dims unclustered
    // counts conserve rows per layout
    val n = Tables.lineitem(spark, dir).count()
    byLayout.values.foreach(g => assert(g.map(_.getAs[Long]("n_rows")).sum == n))
  }

  test("writeZOrdered emits range-disjoint z files with bounded dim spans") {
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    out.deleteOnExit()
    val path = new java.io.File(out, "li").getAbsolutePath
    Layout.writeZOrdered(Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey", path, buckets = 16)
    val back = spark.read.parquet(path)
    assert(back.count() == Tables.lineitem(spark, dir).count())
    assert(back.columns.toSet ==
      Set("l_orderkey", "l_partkey", "l_suppkey")) // __z dropped
    // per-file spans: each written file covers a bounded slab of suppkey
    val spans = spark.read.parquet(path)
      .select(input_file_name().as("f"), col("l_suppkey"))
      .groupBy("f").agg((max("l_suppkey") - min("l_suppkey")).as("span"))
      .collect().map(_.getAs[Long]("span"))
    val full = Tables.lineitem(spark, dir)
      .agg(max("l_suppkey") - min("l_suppkey")).head.getLong(0)
    assert(spans.length > 1)
    assert(spans.map(_.toDouble).sum / spans.length < 0.7 * full,
      s"mean file span ${spans.sum / spans.length} vs full $full")
  }
}
