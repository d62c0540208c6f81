package graft.ml

import graft.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic gradient-boosted trees (depth-1 histogram boosting) — the
  * engine-replayable sibling of MLlib's GBTRegressor, built so the last
  * rows-only query (model_eval) could become oracle-exact.
  *
  * Why MLlib GBT resists replay: its split candidates come from
  * distributed quantile SKETCHES whose bin boundaries depend on partition
  * order. Every piece here is pinned instead:
  *
  *  - integer features and label (cents) — exact;
  *  - split candidates are the 31 boundaries of 32 EQUAL-WIDTH bins from
  *    the exact train min/max (the js_drift equal-width recipe; clamped
  *    integer arithmetic `((x−min)·bins) div (range+1)` — identical
  *    truncating division on both engines);
  *  - per-(feature, bin) residual statistics are exact long sums of the
  *    CENT-ROUNDED residual (round half-away on both engines) — order-free;
  *  - the best split maximizes the standard SSE-reduction surrogate
  *    s_l²/n_l + s_r²/n_r computed with one fixed IEEE sequence, ties to
  *    the smallest (feature, bin);
  *  - leaf deltas are (s/n)·lr in that order; the prediction accumulates
  *    f0 + Σ stump terms left-associated, iteration order;
  *  - a FIXED stump count (no early stop).
  *
  * Boosted stumps are a real GBT (depth-1 trees, additive on the lag
  * features); ModelEvalSpec keeps the learning-quality gate (train R²
  * beats naive persistence). Scale shape: the stats pass is one
  * map-side-combined treeAggregate over a cached primitive RDD per stump
  * (the DetKMeans loop economics); driver state is T stumps + per-feature
  * ranges — bounded by knobs.
  */
object DetGbt {

  case class Stump(j: Int, b: Long, wl: Double, wr: Double)
  case class Model(f0: Double, mins: Array[Long], maxs: Array[Long],
                   stumps: IndexedSeq[Stump], bins: Int, lr: Double)

  /** Round half-away-from-zero — DuckDB's and Spark SQL's `round`, as a
    * JVM scalar for the residual closure. NOT `floor(r + 0.5)`: that
    * misrounds doubles just below .5 (0.49999999999999994 + 0.5 rounds to
    * 1.0 in IEEE). `|r| − floor(|r|)` is exact below 2^52, so the
    * comparison form is the true half-away rule. */
  def roundHalfAway(r: Double): Long = {
    val a = math.abs(r)
    val f = math.floor(a)
    val m = (if (a - f >= 0.5) f + 1.0 else f).toLong
    if (r < 0) -m else m
  }

  /** Fit over integral columns: `centsCol` label + `featCols` features
    * (longs), rows with `isTrain` participating in stats. */
  def fit(df: DataFrame, centsCol: String, featCols: Seq[String],
          isTrain: Column, bins: Int = 32, t: Int = 30,
          lr: Double = 0.1): Model = {
    val nF = featCols.length
    val tr = df.filter(isTrain)
    val statAggs = Seq(Exact.countAll.as("n"),
      sum(col(centsCol).cast("decimal(38,0)")).as("sc")) ++
      featCols.zipWithIndex.flatMap { case (f, j) =>
        Seq(min(col(f)).as(s"mn$j"), max(col(f)).as(s"mx$j")) }
    val row = tr.agg(statAggs.head, statAggs.tail: _*).head
    val n = row.getLong(0)
    require(n > 0, "DetGbt.fit with an empty train split")
    val f0 = Exact.bigDecToDoubleJvm(row.getDecimal(1)) / n.toDouble
    val mins = Array.tabulate(nF)(j => row.getLong(2 + 2 * j))
    val maxs = Array.tabulate(nF)(j => row.getLong(3 + 2 * j))

    // one primitive materialization: (cents, bin indices, train flag)
    val binsL = bins.toLong
    val ptsRdd = df
      .select(col(centsCol).cast("long") +: featCols.map(col(_).cast("long")) :+
        isTrain.as("__tr"): _*)
      .rdd.map { r =>
        val cents = r.getLong(0)
        val bi = new Array[Int](nF)
        var j = 0
        while (j < nF) {
          val x = r.getLong(j + 1)
          val xc = math.min(math.max(x, mins(j)), maxs(j))
          bi(j) = (((xc - mins(j)) * binsL) / (maxs(j) - mins(j) + 1)).toInt
          j += 1
        }
        (cents, bi, r.getBoolean(nF + 1))
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var stumps = Vector.empty[Stump]
    for (_ <- 1 to t) {
      val sofar = stumps
      val cells = nF * bins
      val (cn, cs) = ptsRdd.treeAggregate((new Array[Long](cells), new Array[Long](cells)))(
        seqOp = { case (acc, (cents, bi, train)) =>
          if (train) {
            var f = f0
            var s = 0
            while (s < sofar.length) {
              val st = sofar(s)
              f += (if (bi(st.j) <= st.b) st.wl else st.wr)
              s += 1
            }
            val rq = roundHalfAway(cents.toDouble - f)
            var j = 0
            while (j < nF) {
              val c = j * bins + bi(j)
              acc._1(c) += 1
              acc._2(c) += rq
              j += 1
            }
          }
          acc
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < cells) { a._1(i) += b._1(i); a._2(i) += b._2(i); i += 1 }
          a
        })
      // best split on the driver: strict > keeps the smallest (j, b) on
      // gain ties — the oracle's ORDER BY gain DESC, j, b LIMIT 1
      var best: Stump = null
      var bestGain = Double.NegativeInfinity
      var j = 0
      while (j < nF) {
        var nl = 0L; var sl = 0L
        var nt = 0L; var st = 0L
        var b = 0
        while (b < bins) { nt += cn(j * bins + b); st += cs(j * bins + b); b += 1 }
        b = 0
        while (b < bins - 1) {
          nl += cn(j * bins + b); sl += cs(j * bins + b)
          val nr = nt - nl; val sr = st - sl
          if (nl > 0 && nr > 0) {
            val gain = (sl.toDouble * sl.toDouble) / nl.toDouble +
              (sr.toDouble * sr.toDouble) / nr.toDouble
            if (gain > bestGain) {
              bestGain = gain
              best = Stump(j, b.toLong,
                (sl.toDouble / nl.toDouble) * lr, (sr.toDouble / nr.toDouble) * lr)
            }
          }
          b += 1
        }
        j += 1
      }
      require(best != null,
        "DetGbt: no valid split (every feature constant on the train split)")
      stumps = stumps :+ best
    }
    ptsRdd.unpersist(blocking = false)
    Model(f0, mins, maxs, stumps, bins, lr)
  }

  /** Bin index of a feature column under the model's train range — the
    * identical clamped integer formula both engines run. */
  private def binExpr(f: String, mn: Long, mx: Long, bins: Int): Column =
    expr(s"((least(greatest($f, ${mn}L), ${mx}L) - ${mn}L) * $bins) div ${mx - mn + 1}L")

  /** Prediction (in cents, double): f0 + the stump terms left-associated in
    * iteration order — literal parameters, one codegen'd projection. */
  def predictExpr(model: Model, featCols: Seq[String]): Column =
    model.stumps.foldLeft(lit(model.f0)) { (acc, s) =>
      acc + when(binExpr(featCols(s.j), model.mins(s.j), model.maxs(s.j),
        model.bins) <= s.b, lit(s.wl)).otherwise(lit(s.wr))
    }

  // ---------------------------------------------------------------- oracle

  /** DuckDB twin of [[fit]] + [[predictExpr]]: given a CTE
    * `f(..., cents BIGINT, x0..x{n-1} BIGINT, is_train BOOLEAN)`, emits the
    * stats/bin CTEs and `t` unrolled stump rounds, ending in CTE `gfin` =
    * f's columns ∪ gb0..gb{n-1} ∪ `pred` (cents, double). MATERIALIZED
    * throughout (the CTE-inlining staging lesson — each round reads its
    * predecessor twice). */
  def oracleCtes(fCte: String, nFeats: Int, bins: Int, t: Int,
                 lr: Double): String = {
    val b = new StringBuilder
    b ++= fCte ++ ",\n"
    b ++= "gtr AS MATERIALIZED (SELECT * FROM f WHERE is_train),\n"
    b ++= "gstat AS MATERIALIZED (SELECT COUNT(*) AS n, " +
      "SUM(CAST(cents AS DECIMAL(38,0))) AS sc, " +
      (0 until nFeats).map(j => s"MIN(x$j) AS mn$j, MAX(x$j) AS mx$j").mkString(", ") +
      " FROM gtr),\n"
    b ++= s"gp AS MATERIALIZED (SELECT n, ${Exact.bigDecToDoubleSignedSql("sc")} / CAST(n AS DOUBLE) AS f0, " +
      (0 until nFeats).flatMap(j => Seq(s"mn$j", s"mx$j")).mkString(", ") +
      " FROM gstat),\n"
    val binCols = (0 until nFeats).map(j =>
      s"((least(greatest(x$j, mn$j), mx$j) - mn$j) * $bins) // (mx$j - mn$j + 1) AS gb$j")
    b ++= "grows0 AS MATERIALIZED (SELECT f.*, " + binCols.mkString(", ") +
      ", CAST(f0 AS DOUBLE) AS pred FROM f CROSS JOIN gp),\n"
    val binCase = "CASE jj.j " +
      (0 until nFeats).map(j => s"WHEN $j THEN gb$j").mkString(" ") + " END"
    val spCase = "CASE sp.j " +
      (0 until nFeats).map(j => s"WHEN $j THEN gb$j").mkString(" ") + " END"
    for (i <- 1 to t) {
      b ++= s"gs$i AS MATERIALIZED (SELECT jj.j AS j, $binCase AS bin, " +
        "COUNT(*) AS n, SUM(CAST(round(cents - pred) AS BIGINT)) AS s " +
        s"FROM grows${i - 1} CROSS JOIN range(0, $nFeats) jj(j) " +
        "WHERE is_train GROUP BY 1, 2),\n"
      b ++= s"gg$i AS MATERIALIZED (SELECT j, bin AS b, " +
        "SUM(n) OVER (PARTITION BY j ORDER BY bin ROWS UNBOUNDED PRECEDING) AS nl, " +
        "SUM(s) OVER (PARTITION BY j ORDER BY bin ROWS UNBOUNDED PRECEDING) AS sl, " +
        "SUM(n) OVER (PARTITION BY j) AS nt, SUM(s) OVER (PARTITION BY j) AS st " +
        s"FROM gs$i),\n"
      b ++= s"gsp$i AS MATERIALIZED (SELECT j, b, " +
        s"(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)) * $lr AS wl, " +
        s"(CAST(st - sl AS DOUBLE) / CAST(nt - nl AS DOUBLE)) * $lr AS wr " +
        s"FROM gg$i WHERE nl > 0 AND nt - nl > 0 AND b < ${bins - 1} " +
        "ORDER BY (CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)) / CAST(nl AS DOUBLE) " +
        "+ (CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)) / CAST(nt - nl AS DOUBLE) DESC, " +
        "j, b LIMIT 1),\n"
      b ++= s"grows$i AS MATERIALIZED (SELECT r.* EXCLUDE (pred), " +
        s"r.pred + CASE WHEN ($spCase) <= sp.b THEN sp.wl ELSE sp.wr END AS pred " +
        s"FROM grows${i - 1} r CROSS JOIN gsp$i sp),\n"
    }
    b ++= s"gfin AS MATERIALIZED (SELECT * FROM grows$t)"
    b.toString
  }
}
