package graft.ml

import graft.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic gradient-boosted trees (histogram boosting, depth 1 or 2) —
  * the engine-replayable sibling of MLlib's GBTRegressor, built so the last
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
  *  - at depth 2 each side of the chosen root split is split AGAIN,
  *    independently, from a second per-(side, feature, bin) exact
  *    histogram pass — same gain surrogate, same tie rule; a side with no
  *    valid split (single occupied bin on every feature) falls back to its
  *    depth-1 leaf value;
  *  - leaf deltas are (s/n)·lr in that order; the prediction accumulates
  *    f0 + Σ tree terms left-associated, iteration order;
  *  - a FIXED tree count (no early stop).
  *
  * Depth-2 trees learn pairwise feature interactions (root on x_j, children
  * on x_k) that depth-1 stumps — purely additive in single features —
  * cannot; the reference's GBTRegressor (model_trainer.py) fits multi-level
  * trees for exactly that reason. Scale shape: one bounded collect of the
  * (already grain-bounded) train matrix + a driver boosting loop — see
  * [[fit]]'s doc for the boundedness argument and the r17 measurement that
  * motivated retiring the per-tree treeAggregate passes.
  */
object DetGbt {

  /** Hard cap on the rows [[fit]] will collect to the driver. The only
    * in-repo caller feeds a calendar-bounded country×day matrix (~60k rows
    * at any corpus scale); 2M rows × (1 + nF) longs is still a few hundred
    * MB at most — far above any grain-bounded frame, far below a corpus.
    * A frame that exceeds it is corpus-proportional by construction, and
    * the fit must fail with a diagnosable message instead of silently
    * OOMing the driver (advice r17). */
  val MaxDriverRows = 2000000L

  /** A child split: feature, bin boundary, and its two leaf deltas. */
  case class Split(j: Int, b: Long, wl: Double, wr: Double)

  /** One boosted tree: root split (j, b); `lw`/`rw` are the depth-1 side
    * leaf deltas (used directly at depth 1, and as the fallback when a side
    * has no valid child split at depth 2); `left`/`right` are the depth-2
    * child splits. */
  case class Tree(j: Int, b: Long, lw: Double, rw: Double,
                  left: Option[Split], right: Option[Split])

  case class Model(f0: Double, mins: Array[Long], maxs: Array[Long],
                   trees: IndexedSeq[Tree], bins: Int, lr: Double)

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

  /** The per-row additive term of one tree given the row's bin indices
    * (flat layout, `off` = row offset) — the JVM twin of [[predictExpr]]'s
    * per-tree CASE (and of the oracle's). */
  private def treeTerm(t: Tree, biA: Array[Int], off: Int): Double =
    if (biA(off + t.j) <= t.b) t.left match {
      case Some(s) => if (biA(off + s.j) <= s.b) s.wl else s.wr
      case None => t.lw
    } else t.right match {
      case Some(s) => if (biA(off + s.j) <= s.b) s.wl else s.wr
      case None => t.rw
    }

  /** Fit over integral columns: `centsCol` label + `featCols` features
    * (longs), rows with `isTrain` participating in stats. `depth` 1 fits
    * boosted stumps; 2 fits two-level trees.
    *
    * Execution (optimization r17, guide §1.2 step 1 + §5): the fit's only
    * input is TRAIN rows of an already-aggregated matrix — the one caller
    * feeds the calendar-bounded country×day lagged frame (≤ nations ×
    * ~2.4k days ≈ 60k rows at ANY corpus scale; the corpus-sized work is
    * the upstream aggregation, which stays distributed). The previous
    * shape ran 2·t treeAggregate jobs (60 at the defaults) over a cached
    * RDD of those rows — measured ~7 s of almost pure job-scheduling
    * latency at sf0.1 for arrays a single core folds in milliseconds. One
    * bounded collect of (cents, features, train-only) longs (~4 MB) and a
    * driver boosting loop now computes the IDENTICAL model: every
    * histogram cell is an order-free exact long sum, [[bestSplit]] is the
    * same code, and the per-row prediction chain keeps the same
    * left-associated IEEE sequence — bit-identical trees, every oracle
    * gate unchanged. Boundedness is the same argument as the BPE
    * vocab-bounded driver frame: grain-bounded, not corpus-bounded. */
  def fit(df: DataFrame, centsCol: String, featCols: Seq[String],
          isTrain: Column, bins: Int = 32, t: Int = 30,
          lr: Double = 0.1, depth: Int = 1,
          maxRows: Long = MaxDriverRows): Model = {
    require(depth == 1 || depth == 2, s"DetGbt depth must be 1 or 2, got $depth")
    val nF = featCols.length
    // one job: the projected train rows (label + features as longs)
    val trRows = df.filter(isTrain)
      .select(col(centsCol).cast("long") +: featCols.map(col(_).cast("long")): _*)
      .collect()
    val n = trRows.length.toLong
    require(n > 0, "DetGbt.fit with an empty train split")
    // grain-boundedness is the caller's contract; enforce it so a future
    // corpus-sized frame fails fast here (spark.driver.maxResultSize backs
    // this up for frames too large to even finish the collect)
    require(n <= maxRows,
      s"DetGbt.fit collected $n train rows — above MaxDriverRows=" +
        s"$maxRows. fit is a driver-local boosting loop over a " +
        "GRAIN-BOUNDED matrix (e.g. country×day); a frame this large is " +
        "corpus-proportional and must be aggregated before fitting")
    // exact stats, identical arithmetic to the old decimal(38,0) agg:
    // Σcents in BigInteger (== the decimal sum), same split-conversion
    var scB = java.math.BigInteger.ZERO
    val mins = Array.fill(nF)(Long.MaxValue)
    val maxs = Array.fill(nF)(Long.MinValue)
    trRows.foreach { r =>
      scB = scB.add(java.math.BigInteger.valueOf(r.getLong(0)))
      var j = 0
      while (j < nF) {
        val x = r.getLong(j + 1)
        if (x < mins(j)) mins(j) = x
        if (x > maxs(j)) maxs(j) = x
        j += 1
      }
    }
    val f0 = Exact.bigDecToDoubleJvm(new java.math.BigDecimal(scB)) / n.toDouble

    // primitive arrays: label cents + bin index per (row, feature) — the
    // identical clamped integer binning formula
    val binsL = bins.toLong
    val nR = trRows.length
    val centsA = new Array[Long](nR)
    val biA = new Array[Int](nR * nF)
    var ri = 0
    while (ri < nR) {
      val r = trRows(ri)
      centsA(ri) = r.getLong(0)
      var j = 0
      while (j < nF) {
        val x = r.getLong(j + 1)
        val xc = math.min(math.max(x, mins(j)), maxs(j))
        biA(ri * nF + j) = (((xc - mins(j)) * binsL) / (maxs(j) - mins(j) + 1)).toInt
        j += 1
      }
      ri += 1
    }

    // best split from a (count, residual-sum) histogram laid out as
    // cell = base + j*bins + b: strict > keeps the smallest (j, b) on gain
    // ties — the oracle's ORDER BY gain DESC, j, b LIMIT 1
    def bestSplit(cn: Array[Long], cs: Array[Long], base: Int): Option[Split] = {
      var best: Split = null
      var bestGain = Double.NegativeInfinity
      var j = 0
      while (j < nF) {
        var nl = 0L; var sl = 0L
        var nt = 0L; var st = 0L
        var b = 0
        while (b < bins) { nt += cn(base + j * bins + b); st += cs(base + j * bins + b); b += 1 }
        b = 0
        while (b < bins - 1) {
          nl += cn(base + j * bins + b); sl += cs(base + j * bins + b)
          val nr = nt - nl; val sr = st - sl
          if (nl > 0 && nr > 0) {
            val gain = (sl.toDouble * sl.toDouble) / nl.toDouble +
              (sr.toDouble * sr.toDouble) / nr.toDouble
            if (gain > bestGain) {
              bestGain = gain
              best = Split(j, b.toLong,
                (sl.toDouble / nl.toDouble) * lr, (sr.toDouble / nr.toDouble) * lr)
            }
          }
          b += 1
        }
        j += 1
      }
      if (best == null) None else Some(best)
    }

    // per-row cent-rounded residual — recomputed per round exactly as the
    // old per-pass closure did: f0 + Σ tree terms left-associated, same
    // IEEE order, then the same half-away rounding
    def residual(row: Int, sofar: Vector[Tree]): Long = {
      var f = f0
      var s = 0
      val off = row * nF
      while (s < sofar.length) { f += treeTerm(sofar(s), biA, off); s += 1 }
      roundHalfAway(centsA(row).toDouble - f)
    }

    var trees = Vector.empty[Tree]
    for (_ <- 1 to t) {
      val sofar = trees
      val cells = nF * bins
      // pass 1: root-level residual histogram (exact long sums, order-free)
      val cn = new Array[Long](cells)
      val cs = new Array[Long](cells)
      var i = 0
      while (i < nR) {
        val rq = residual(i, sofar)
        var j = 0
        while (j < nF) {
          val c = j * bins + biA(i * nF + j)
          cn(c) += 1
          cs(c) += rq
          j += 1
        }
        i += 1
      }
      val root = bestSplit(cn, cs, 0).getOrElse(
        throw new IllegalStateException(
          "DetGbt: no valid split (every feature constant on the train split)"))
      val tree =
        if (depth == 1) Tree(root.j, root.b, root.wl, root.wr, None, None)
        else {
          // pass 2: the same residuals histogrammed per (side, feature, bin)
          // under the chosen root — the exact stats each child split needs
          val rj = root.j; val rb = root.b
          val cells2 = 2 * nF * bins
          val cn2 = new Array[Long](cells2)
          val cs2 = new Array[Long](cells2)
          var i2 = 0
          while (i2 < nR) {
            val rq = residual(i2, sofar)
            val base = (if (biA(i2 * nF + rj) <= rb) 0 else 1) * nF * bins
            var j = 0
            while (j < nF) {
              val c = base + j * bins + biA(i2 * nF + j)
              cn2(c) += 1
              cs2(c) += rq
              j += 1
            }
            i2 += 1
          }
          val left = bestSplit(cn2, cs2, 0)
          val right = bestSplit(cn2, cs2, nF * bins)
          Tree(root.j, root.b, root.wl, root.wr, left, right)
        }
      trees = trees :+ tree
    }
    Model(f0, mins, maxs, trees, bins, lr)
  }

  /** Bin index of a feature column under the model's train range — the
    * identical clamped integer formula both engines run. */
  private def binExpr(f: String, mn: Long, mx: Long, bins: Int): Column =
    expr(s"((least(greatest($f, ${mn}L), ${mx}L) - ${mn}L) * $bins) div ${mx - mn + 1}L")

  /** Prediction (in cents, double): f0 + the tree terms left-associated in
    * iteration order — literal parameters, one codegen'd projection. */
  def predictExpr(model: Model, featCols: Seq[String]): Column = {
    def sideVal(child: Option[Split], fallback: Double): Column = child match {
      case Some(s) =>
        when(binExpr(featCols(s.j), model.mins(s.j), model.maxs(s.j),
          model.bins) <= s.b, lit(s.wl)).otherwise(lit(s.wr))
      case None => lit(fallback)
    }
    model.trees.foldLeft(lit(model.f0)) { (acc, t) =>
      acc + when(binExpr(featCols(t.j), model.mins(t.j), model.maxs(t.j),
        model.bins) <= t.b, sideVal(t.left, t.lw))
        .otherwise(sideVal(t.right, t.rw))
    }
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB twin of [[fit]] + [[predictExpr]]: given a CTE
    * `f(..., cents BIGINT, x0..x{n-1} BIGINT, is_train BOOLEAN)`, emits the
    * stats/bin CTEs and `t` unrolled tree rounds, ending in CTE `gfin` =
    * f's columns ∪ gb0..gb{n-1} ∪ `pred` (cents, double). MATERIALIZED
    * throughout (the CTE-inlining staging lesson — each round reads its
    * predecessor twice). At depth 2 each round adds the conditioned
    * per-(side, feature, bin) histogram and the two child picks; a side
    * whose pick is empty (LEFT JOIN null) falls back to the root side leaf
    * — the JVM's exact rule. */
  def oracleCtes(fCte: String, nFeats: Int, bins: Int, t: Int,
                 lr: Double, depth: Int = 1): String = {
    require(depth == 1 || depth == 2, s"DetGbt oracle depth must be 1 or 2, got $depth")
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
    def binCase(alias: String) = s"CASE $alias.j " +
      (0 until nFeats).map(j => s"WHEN $j THEN gb$j").mkString(" ") + " END"
    val jjCase = binCase("jj")
    val spCase = binCase("sp")
    val gain = "(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)) / CAST(nl AS DOUBLE) " +
      "+ (CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)) / CAST(nt - nl AS DOUBLE)"
    val ws = s"(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)) * $lr AS wl, " +
      s"(CAST(st - sl AS DOUBLE) / CAST(nt - nl AS DOUBLE)) * $lr AS wr"
    for (i <- 1 to t) {
      b ++= s"gs$i AS MATERIALIZED (SELECT jj.j AS j, $jjCase AS bin, " +
        "COUNT(*) AS n, SUM(CAST(round(cents - pred) AS BIGINT)) AS s " +
        s"FROM grows${i - 1} CROSS JOIN range(0, $nFeats) jj(j) " +
        "WHERE is_train GROUP BY 1, 2),\n"
      b ++= s"gg$i AS MATERIALIZED (SELECT j, bin AS b, " +
        "SUM(n) OVER (PARTITION BY j ORDER BY bin ROWS UNBOUNDED PRECEDING) AS nl, " +
        "SUM(s) OVER (PARTITION BY j ORDER BY bin ROWS UNBOUNDED PRECEDING) AS sl, " +
        "SUM(n) OVER (PARTITION BY j) AS nt, SUM(s) OVER (PARTITION BY j) AS st " +
        s"FROM gs$i),\n"
      b ++= s"gsp$i AS MATERIALIZED (SELECT j, b, $ws " +
        s"FROM gg$i WHERE nl > 0 AND nt - nl > 0 AND b < ${bins - 1} " +
        s"ORDER BY $gain DESC, j, b LIMIT 1),\n"
      if (depth == 1) {
        b ++= s"grows$i AS MATERIALIZED (SELECT r.* EXCLUDE (pred), " +
          s"r.pred + CASE WHEN ($spCase) <= sp.b THEN sp.wl ELSE sp.wr END AS pred " +
          s"FROM grows${i - 1} r CROSS JOIN gsp$i sp),\n"
      } else {
        b ++= s"gc$i AS MATERIALIZED (SELECT " +
          s"CASE WHEN ($spCase) <= sp.b THEN 0 ELSE 1 END AS side, " +
          s"jj.j AS j, $jjCase AS bin, " +
          "COUNT(*) AS n, SUM(CAST(round(cents - pred) AS BIGINT)) AS s " +
          s"FROM grows${i - 1} CROSS JOIN gsp$i sp CROSS JOIN range(0, $nFeats) jj(j) " +
          "WHERE is_train GROUP BY 1, 2, 3),\n"
        b ++= s"ggc$i AS MATERIALIZED (SELECT side, j, bin AS b, " +
          "SUM(n) OVER (PARTITION BY side, j ORDER BY bin ROWS UNBOUNDED PRECEDING) AS nl, " +
          "SUM(s) OVER (PARTITION BY side, j ORDER BY bin ROWS UNBOUNDED PRECEDING) AS sl, " +
          "SUM(n) OVER (PARTITION BY side, j) AS nt, SUM(s) OVER (PARTITION BY side, j) AS st " +
          s"FROM gc$i),\n"
        for ((cte, side) <- Seq((s"gl$i", 0), (s"gr$i", 1)))
          b ++= s"$cte AS MATERIALIZED (SELECT j, b, $ws " +
            s"FROM ggc$i WHERE side = $side AND nl > 0 AND nt - nl > 0 AND b < ${bins - 1} " +
            s"ORDER BY $gain DESC, j, b LIMIT 1),\n"
        val glCase = binCase("gl")
        val grCase = binCase("gr")
        b ++= s"grows$i AS MATERIALIZED (SELECT r.* EXCLUDE (pred), r.pred + " +
          s"CASE WHEN ($spCase) <= sp.b THEN " +
          s"(CASE WHEN gl.j IS NULL THEN sp.wl " +
          s"WHEN ($glCase) <= gl.b THEN gl.wl ELSE gl.wr END) " +
          "ELSE " +
          s"(CASE WHEN gr.j IS NULL THEN sp.wr " +
          s"WHEN ($grCase) <= gr.b THEN gr.wl ELSE gr.wr END) " +
          "END AS pred " +
          s"FROM grows${i - 1} r CROSS JOIN gsp$i sp " +
          s"LEFT JOIN gl$i gl ON TRUE LEFT JOIN gr$i gr ON TRUE),\n"
      }
    }
    b ++= s"gfin AS MATERIALIZED (SELECT * FROM grows$t)"
    b.toString
  }
}
