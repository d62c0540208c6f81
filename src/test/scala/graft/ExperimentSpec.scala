package graft

import graft.operators.{Experiment, Stats}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the A/B evaluator and distribution profile. */
class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("ab test: split covers all events, decisions follow the z thresholds") {
    val rows = Experiment.abTestResults(spark, dir).collect()
    assert(rows.length == 2)
    val total = Tables.events(spark, dir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("control_samples") + r.getAs[Long]("treatment_samples") == total)
      val z = r.getAs[Double]("z_stat")
      val sig = r.getAs[Boolean]("statistical_significance")
      assert(sig == (math.abs(z) > 1.959963984540054))
      val decision = r.getAs[String]("decision")
      if (!sig) assert(decision == "inconclusive")
      else if (r.getAs[Double]("lift") > 0) assert(decision == "deploy_treatment")
      val conf = r.getAs[String]("confidence")
      if (math.abs(z) > 2.5758293035489004) assert(conf == "high")
      else if (sig) assert(conf == "medium") else assert(conf == "low")
    }
  }

  test("distribution profile: percentile ladder is monotone, classification present") {
    val rows = Stats.distributionProfile(spark, dir).collect()
    assert(rows.nonEmpty)
    val pcts = Seq("p1", "p5", "p10", "p25", "p50", "p75", "p90", "p95", "p99")
    rows.foreach { r =>
      val ladder = pcts.map(r.getAs[Double])
      assert(ladder.zip(ladder.tail).forall { case (a, b) => a <= b },
        s"non-monotone ladder: $ladder")
      assert(r.getAs[String]("distribution_type").nonEmpty)
    }
  }
}
