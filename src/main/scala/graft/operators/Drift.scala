package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model/feature drift detection between a reference and a current data
  * window (reference: src/ml/monitoring/model_monitor.py:144-260,
  * FeatureDriftDetector — scipy ks_2samp and Jensen-Shannon divergence on
  * pandas Series; here both are distributed per-group computations).
  *
  * The KS statistic is pure rational arithmetic — cumulative counts divided
  * by group totals — so it is bit-deterministic and oracle-exact (SURVEY.md
  * §3). Jensen-Shannon and PSI need `ln`, whose libm implementations are
  * NOT bitwise-portable (measured ~2e-4 mismatch rate vs DuckDB) — since r9
  * both run through [[portableLn]], an arithmetic-only ln (ladder range
  * reduction + fixed Horner series) whose expression tree is mirrored
  * op-for-op in the DuckDB oracles, making js_drift and psi_drift
  * hash-exact.
  */
object Drift {

  /** Reference window = orders before this date; current window = on/after.
    * Test data spans 1995-01-01..2001-08-01, so this splits roughly 60/40. */
  private val SplitDate = "1998-01-01"

  /** Exact two-sample Kolmogorov-Smirnov drift per country
    * (model_monitor.py:218: `stats.ks_2samp(ref, curr)`).
    *
    * D = max over observed values v of |ECDF_ref(v) − ECDF_cur(v)|, computed
    * from per-(country, value) counts and a cumulative window ordered by
    * value within each country — one shuffle to the (country, cents) grain,
    * one country-partitioned window, one final groupBy. No driver-side data.
    * Severity ladder mirrors model_monitor.py:247-256 (threshold 0.1, 1.5×,
    * 2× grades). */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    val oc = Tables.ordersWithCountry(spark, dir)
      .select(col("country"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        (col("o_orderdate") < lit(SplitDate)).as("is_ref"))
    val counts = oc.groupBy(col("country"), col("cents"))
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("cnt_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cnt_cur"))
    val w = Window.partitionBy(col("country")).orderBy(col("cents"))
    val wAll = Window.partitionBy(col("country"))
    val ecdf = counts
      .withColumn("cum_ref", sum(col("cnt_ref")).over(w))
      .withColumn("cum_cur", sum(col("cnt_cur")).over(w))
      .withColumn("n_ref", sum(col("cnt_ref")).over(wAll))
      .withColumn("n_cur", sum(col("cnt_cur")).over(wAll))
      .withColumn("ecdf_gap", abs(
        col("cum_ref").cast("double") / col("n_ref").cast("double") -
        col("cum_cur").cast("double") / col("n_cur").cast("double")))
    ecdf.groupBy(col("country"))
      .agg(
        max(col("n_ref")).as("n_ref"),
        max(col("n_cur")).as("n_cur"),
        max(col("ecdf_gap")).as("__gap"))
      // one-sided windows (a country with zero rows on either side of the
      // split) have no two-sample ECDF: the raw gap is NaN/Inf there, so the
      // stat and its decisions are NULL, not a garbage severity
      .withColumn("ks_stat",
        when(col("n_ref") === 0 || col("n_cur") === 0, lit(null).cast("double"))
          .otherwise(col("__gap")))
      .drop("__gap")
      .withColumn("drift_detected",
        when(col("ks_stat").isNull, lit(null).cast("boolean"))
          .otherwise(col("ks_stat") > 0.1))
      .withColumn("severity",
        when(col("ks_stat").isNull, lit(null).cast("string"))
          .when(col("ks_stat") > 0.2, "critical")
          .when(col("ks_stat") > 0.15, "high")
          .when(col("ks_stat") > 0.1, "medium")
          .otherwise("low"))
  }

  /** Jensen-Shannon drift per country (model_monitor.py:223-246): 50
    * equal-width bins over the combined [min, max], densities normalized to
    * probabilities with 1e-8 epsilon smoothing, JS distance = sqrt(JSD).
    *
    * HASH-EXACT since r9 (was rows-only): the two non-portable pieces were
    * the libm `ln` and the groupBy-order double summation of the KL terms.
    * The ln now runs through [[portableLn]]; the Σ folds over the
    * bin-SORTED cell array (the featureCells recipe) so the IEEE
    * accumulation order is deterministic in both engines — every other step
    * (bin = floor over doubles, integer counts, smoothing, sqrt) was
    * already one-op-correctly-rounded. DuckDB twin: [[jsDriftOracle]].
    *
    * Two documented deviations from the reference's numerics (~1e-8 effect):
    * np.histogram over np.linspace(min, max, 50) yields 49 bins where this
    * uses a round 50, and the smoothing normalizer (1 + ε·bins) assumes all
    * bins occupied while p0/q0 are normalized over occupied bins only — the
    * smoothed probabilities sum to 1 only up to O(ε). Same drift contract. */
  def jsDrift(spark: SparkSession, dir: String): DataFrame = {
    val bins = 50
    val oc = Tables.ordersWithCountry(spark, dir)
      .select(col("country"), col("o_totalprice").as("v"),
        (col("o_orderdate") < lit(SplitDate)).as("is_ref"))
    val extent = oc.groupBy(col("country").as("e_country"))
      .agg(min(col("v")).as("v_min"), max(col("v")).as("v_max"))
    val binned = oc.join(broadcast(extent), oc("country") === extent("e_country"))
      .withColumn("bin",
        when(col("v_max") === col("v_min"), lit(0L)).otherwise(least(
          floor((col("v") - col("v_min")) / ((col("v_max") - col("v_min")) / bins)).cast("long"),
          lit(bins - 1L))))
      .groupBy(col("country"), col("bin"))
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("cnt_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cnt_cur"))
    val eps = lit(1e-8)
    val cells = binned.groupBy(col("country"))
      .agg(
        sum(col("cnt_ref")).as("n_ref"),
        sum(col("cnt_cur")).as("n_cur"),
        array_sort(collect_list(struct(col("bin"), col("cnt_ref"), col("cnt_cur"))))
          .as("cells"))
    // staged per-element transforms (the oracle's CTE staging, in-plan):
    // each stage MATERIALIZES its struct per element, so the ladder/Horner
    // references are field reads — the nested-tree form re-evaluated the
    // whole ladder per Horner term and measured 120+ s at sf0.1
    val terms = {
      val t1 = transform(col("cells"), x => struct(
        (((x("cnt_ref").cast("double") / col("n_ref").cast("double")) + eps)
          / (lit(1.0) + eps * bins)).as("p"),
        (((x("cnt_cur").cast("double") / col("n_cur").cast("double")) + eps)
          / (lit(1.0) + eps * bins)).as("q")))
      val t2 = transform(t1, y => struct(y("p").as("p"), y("q").as("q"),
        ((y("p") + y("q")) / 2).as("m0")))
      val t3 = transform(t2, y => struct(y("p").as("p"), y("q").as("q"),
        (y("p") / y("m0")).as("rp"), (y("q") / y("m0")).as("rq")))
      val t4 = transform(t3, y => struct(y("p").as("p"), y("q").as("q"),
        lnLadderK(y("rp")).as("kp"), lnLadderM(y("rp")).as("mp"),
        lnLadderK(y("rq")).as("kq"), lnLadderM(y("rq")).as("mq")))
      val t5 = transform(t4, y => struct(y("p").as("p"), y("q").as("q"),
        y("kp").as("kp"), y("kq").as("kq"),
        ((y("mp") - lit(1.0)) / (y("mp") + lit(1.0))).as("zp"),
        ((y("mq") - lit(1.0)) / (y("mq") + lit(1.0))).as("zq")))
      // z² staged as fields before lnFromParts (which reads z2 12×) — the
      // ladder helpers' contract: pass materialized values, never subtrees
      val t6 = transform(t5, y => struct(y("p").as("p"), y("q").as("q"),
        y("kp").as("kp"), y("kq").as("kq"), y("zp").as("zp"), y("zq").as("zq"),
        (y("zp") * y("zp")).as("zp2"), (y("zq") * y("zq")).as("zq2")))
      transform(t6, y =>
        y("p") * lnFromParts(y("kp"), y("zp"), y("zp2"))
          + y("q") * lnFromParts(y("kq"), y("zq"), y("zq2")))
    }
    val fold = aggregate(terms, lit(0.0), (acc, v) => acc + v)
    cells
      .withColumn("js_distance", sqrt(fold / 2))
      .select("country", "n_ref", "n_cur", "js_distance")
      .withColumn("drift_detected", col("js_distance") > 0.1)
  }

  /** χ²(df) 95% critical values for df 1..30 (regularized-incomplete-gamma
    * quantiles; the JB/ab_test precedent — decisions against a shared literal
    * instead of a transcendental p-value). NULL beyond the ladder. */
  private val chi2Crit95 = Seq(
    3.8414588206941245, 5.991464547107977, 7.8147279032511765, 9.48772903678115,
    11.070497693516348, 12.591587243743977, 14.067140449340165, 15.507313055865446,
    16.918977604620444, 18.307038053275143, 19.675137572682488, 21.026069817483055,
    22.36203249482694, 23.684791304840566, 24.995790139728612, 26.296227604864228,
    27.587111638275317, 28.86929943039263, 30.14352720564616, 31.410432844230932,
    32.6705733409173, 33.92443847144379, 35.17246162690806, 36.4150285018073,
    37.65248413348276, 38.88513865983005, 40.11327206941361, 41.33713815142741,
    42.556967804292654, 43.77297182574216)

  private def chi2Critical95(df: Column): Column =
    chi2Crit95.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (v, i)) => when(df === (i + 1), lit(v)).otherwise(acc)
    }

  /** Per-category (category, cnt_ref, cnt_cur) contingency counts plus the
    * category-sorted cell array and window totals — the shared first stage of
    * [[featureChi2]] and [[featurePsi]]. `src` must have columns
    * (category: string, is_ref: boolean). */
  private def featureCells(src: DataFrame): DataFrame =
    src.groupBy("category")
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("cnt_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cnt_cur"))
      .agg(
        count(lit(1)).as("n_categories"),
        sum("cnt_ref").as("n_ref"),
        sum("cnt_cur").as("n_cur"),
        array_sort(collect_list(struct(col("category"), col("cnt_ref"), col("cnt_cur"))))
          .as("cells"))

  /** Chi-square contingency drift for one categorical feature
    * (model_monitor.py:295-312, `stats.chi2_contingency` over the k×2
    * ref/cur table). Algebra: with d_i = cntRef_i·nCur − cntCur_i·nRef and
    * r_i = cntRef_i + cntCur_i, χ² = (Σ_i d_i²/r_i) / (nRef·nCur) —
    * exactly `Σ (O−E)²/E`, but every d_i is exact DECIMAL arithmetic and
    * only the per-cell term and final scaling run in IEEE double. The Σ_i
    * folds over the category-SORTED cell array (seasonality_check's
    * fixed-order-sum recipe generalized to data-dependent categories), so
    * the double accumulation order is deterministic in both engines.
    *
    * drift_score = χ²/k, thresholds ×1/×1.5/×2 on 0.1 and the severity
    * ladder mirror model_monitor.py:340-352; significance is χ² vs the
    * χ²(df) 95% critical value (df = k−1; k×2 table ⇒ no Yates term for
    * k > 2). A one-sided window (nRef or nCur = 0) reports χ² = 0, the
    * reference's `except` contract. Scale: one groupBy on the category (k
    * distinct keys), one k-row fold — the cell array is bounded by feature
    * cardinality, which is what "low-cardinality categorical" means. */
  def featureChi2(src: DataFrame, fname: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(19,0)")
    val kD = col("n_categories").cast("double")
    val nRefD = col("n_ref").cast("double")
    val nCurD = col("n_cur").cast("double")
    val fold = aggregate(col("cells"), lit(0.0), (acc, x) => {
      val d = (dec(x("cnt_ref")) * dec(col("n_cur")) - dec(x("cnt_cur")) * dec(col("n_ref")))
        .cast("double")
      val r = (x("cnt_ref") + x("cnt_cur")).cast("double")
      acc + d * d / r
    })
    val chi2 = when(col("n_ref") === 0 || col("n_cur") === 0, lit(0.0))
      .otherwise(fold / (nRefD * nCurD))
    featureCells(src)
      .withColumn("chi2_stat", chi2)
      .withColumn("df", (col("n_categories") - 1).cast("long"))
      .withColumn("chi2_critical", chi2Critical95(col("df")))
      .withColumn("significant",
        when(col("chi2_critical").isNull, lit(null).cast("boolean"))
          .otherwise(col("chi2_stat") > col("chi2_critical")))
      .withColumn("drift_score", col("chi2_stat") / kD)
      .withColumn("drift_detected", col("drift_score") > 0.1)
      .withColumn("severity",
        when(col("drift_score") > 0.2, "critical")
          .when(col("drift_score") > 0.15, "high")
          .when(col("drift_score") > 0.1, "medium")
          .otherwise("low"))
      .select(lit(fname).as("feature"), col("n_categories"), col("n_ref"), col("n_cur"),
        col("chi2_stat"), col("df"), col("chi2_critical"), col("significant"),
        col("drift_score"), col("drift_detected"), col("severity"))
  }

  /** Bitwise-PORTABLE natural log over (0, 2^31): IEEE +,−,×,÷ are each
    * correctly rounded, so two engines evaluating the SAME expression tree
    * produce the SAME double — the only non-portable step in `ln` is the
    * libm call itself. This replaces it with arithmetic: power-of-two range
    * reduction via a comparison ladder (x = m·2^k, m ∈ [1,2); multiplying
    * by 2^±e is exact), then 2·artanh((m−1)/(m+1)) as a FIXED 13-term
    * Horner series (z ≤ 1/3 ⇒ tail < (1/9)¹³ ≈ 4e-13 relative). The twin
    * SQL emitter [[portableLnSql]] mirrors the tree operation-for-operation,
    * which is what turned psi_drift from rows-only into hash-exact.
    * Accuracy vs Math.log is ~1e-13 relative — identical drift decisions,
    * and DriftSpec pins the agreement. */
  private[graft] val Ln2 = 0.6931471805599453

  /** The ladder/series building blocks. IMPORTANT for cost: `lnLadderK`/
    * `lnLadderM` reference `r` ~120 times and `lnHorner` references `z2`
    * 12 times — callers must pass MATERIALIZED values (an attribute, or a
    * struct field staged by a `transform` chain), never a computed subtree,
    * or the expression tree (and interpreted per-element evaluation inside
    * array lambdas) grows by that factor. jsDrift/featurePsi stage
    * per-element structs; dagostinoCheck stages real columns. A naive
    * nested form measured 120+ s at sf0.1 where the staged one is <1 s. */
  private[graft] def lnLadderK(r: Column): Column =
    (30 to -30 by -1).foldRight(lit(-31.0)) { (e, acc) =>
      when(r >= lit(math.pow(2.0, e)), lit(e.toDouble)).otherwise(acc)
    }
  private[graft] def lnLadderM(r: Column): Column =
    (30 to -30 by -1).foldRight(r * lit(math.pow(2.0, 31))) { (e, acc) =>
      when(r >= lit(math.pow(2.0, e)), r * lit(math.pow(2.0, -e))).otherwise(acc)
    }
  private[graft] def lnHorner(z2: Column): Column =
    (23 to 1 by -2).foldLeft(lit(1.0 / 25)) { (acc, j) =>
      lit(1.0 / j) + z2 * acc
    }
  /** ln from pre-staged ladder parts: k·ln2 + 2z·Σ — z2 must equal z·z. */
  private[graft] def lnFromParts(k: Column, z: Column, z2: Column): Column =
    k * lit(Ln2) + lit(2.0) * z * lnHorner(z2)

  /** One-expression portable ln — convenience for SMALL frames / tests
    * only (the nested tree re-evaluates the ladder per Horner term; see the
    * staging note above for anything hot). */
  private[graft] def portableLn(r: Column): Column = {
    val m = lnLadderM(r)
    val z = (m - lit(1.0)) / (m + lit(1.0))
    lnFromParts(lnLadderK(r), z, z * z)
  }

  /** Stage the portable ln of column `in` into column `out` through real
    * columns (the dagostino path — attributes keep the plan linear). */
  private[graft] def withPortableLn(df: DataFrame, in: String, out: String): DataFrame =
    df.withColumn("__ln_k", lnLadderK(col(in)))
      .withColumn("__ln_m", lnLadderM(col(in)))
      .withColumn("__ln_z", (col("__ln_m") - lit(1.0)) / (col("__ln_m") + lit(1.0)))
      .withColumn("__ln_z2", col("__ln_z") * col("__ln_z"))
      .withColumn(out, lnFromParts(col("__ln_k"), col("__ln_z"), col("__ln_z2")))
      .drop("__ln_k", "__ln_m", "__ln_z", "__ln_z2")

  /** DuckDB twin of [[portableLn]]: emits the same expression tree over the
    * SQL expressions `rExpr` (the ratio), with `kVar`/`mVar`/`zVar`/`z2Var`
    * expected to be bound by the caller's struct-transform chain. Constants
    * are shortest-round-trip Java double reprs — DuckDB's decimal→double
    * literal conversion is correctly rounded to the identical double. */
  private[graft] def lnLadderSqlK(rExpr: String): String =
    "CASE " + (30 to -30 by -1).map(e =>
      s"WHEN $rExpr >= ${math.pow(2.0, e)} THEN ${e.toDouble}").mkString(" ") +
      " ELSE -31.0 END"
  private[graft] def lnLadderSqlM(rExpr: String): String =
    "CASE " + (30 to -30 by -1).map(e =>
      s"WHEN $rExpr >= ${math.pow(2.0, e)} THEN $rExpr * ${math.pow(2.0, -e)}").mkString(" ") +
      s" ELSE $rExpr * ${math.pow(2.0, 31)} END"
  /** Coefficients are CAST(… AS DOUBLE): DuckDB parses bare decimal
    * literals as DECIMAL and folds the nested constant arithmetic in
    * decimal (scale overflow at depth ~12); the cast pins IEEE semantics
    * and the decimal→double literal conversion is correctly rounded to the
    * identical double Scala's `lit` holds. */
  private[graft] def lnHornerSql(z2Var: String): String =
    (23 to 1 by -2).foldLeft(s"CAST(${1.0 / 25} AS DOUBLE)") { (acc, j) =>
      s"(CAST(${1.0 / j} AS DOUBLE) + ($z2Var * ($acc)))"
    }

  /** Scalar JVM twin of [[portableLn]] — the identical operation sequence on
    * doubles, for spec replays and documentation. */
  private[graft] def portableLnScalar(x: Double): Double = {
    val e = (30 to -30 by -1).find(e => x >= math.pow(2.0, e))
    val (k, m) = e match {
      case Some(e) => (e.toDouble, x * math.pow(2.0, -e))
      case None    => (-31.0, x * math.pow(2.0, 31))
    }
    val z = (m - 1.0) / (m + 1.0)
    val z2 = z * z
    var t = 1.0 / 25
    var j = 23
    while (j >= 1) { t = 1.0 / j + z2 * t; j -= 2 }
    k * Ln2 + 2.0 * z * t
  }

  /** Bitwise-portable cube root over (0, 8^16) — the [[portableLn]] recipe
    * for `pow(x, 1/3)`: octave range reduction (v = m·8^k, m ∈ [1,8);
    * dividing by 8^k and scaling by 2^k are exact), then SIX fixed Newton
    * steps t ← (2t + m/t²)/3 from the seed 1 + (m−1)/3. Every step is
    * correctly-rounded IEEE arithmetic, so both engines produce the same
    * double. Because each Newton step references its operands three times,
    * the tree is staged through real output columns ([[withPortableCbrt]])
    * rather than nested — a naive nest grows 3^6 copies of the ladder. */
  private[graft] def cbLadderSqlM(vVar: String): String =
    "CASE " + (15 to -15 by -1).map(e =>
      s"WHEN $vVar >= CAST(${math.pow(8.0, e)} AS DOUBLE) THEN $vVar * CAST(${math.pow(8.0, -e)} AS DOUBLE)").mkString(" ") +
      s" ELSE $vVar * CAST(${math.pow(8.0, 16)} AS DOUBLE) END"
  private[graft] def cbLadderSqlS(vVar: String): String =
    "CASE " + (15 to -15 by -1).map(e =>
      s"WHEN $vVar >= CAST(${math.pow(8.0, e)} AS DOUBLE) THEN CAST(${math.pow(2.0, e)} AS DOUBLE)").mkString(" ") +
      s" ELSE CAST(${math.pow(2.0, -16)} AS DOUBLE) END"

  /** Stage the portable cube root of column `in` into column `out` via
    * intermediate columns (`__cb_m`, `__cb_s`, `__cb_t`); the Newton chain
    * references attributes, so the plan stays linear in steps. */
  private[graft] def withPortableCbrt(df: DataFrame, in: String, out: String): DataFrame = {
    val v = col(in)
    val exps = 15 to -15 by -1
    val m = exps.foldRight(v * lit(math.pow(8.0, 16))) { (e, acc) =>
      when(v >= lit(math.pow(8.0, e)), v * lit(math.pow(8.0, -e))).otherwise(acc)
    }
    val s = exps.foldRight(lit(math.pow(2.0, -16))) { (e, acc) =>
      when(v >= lit(math.pow(8.0, e)), lit(math.pow(2.0, e))).otherwise(acc)
    }
    val seeded = df.withColumn("__cb_m", m).withColumn("__cb_s", s)
      .withColumn("__cb_t", lit(1.0) + (col("__cb_m") - lit(1.0)) / 3.0)
    val iterated = (1 to 6).foldLeft(seeded) { (d, _) =>
      d.withColumn("__cb_t",
        (lit(2.0) * col("__cb_t") + col("__cb_m") / (col("__cb_t") * col("__cb_t"))) / 3.0)
    }
    iterated.withColumn(out, col("__cb_s") * col("__cb_t"))
      .drop("__cb_m", "__cb_s", "__cb_t")
  }

  /** Scalar JVM twin of the staged portable cbrt. */
  private[graft] def portableCbrtScalar(v: Double): Double = {
    val e = (15 to -15 by -1).find(e => v >= math.pow(8.0, e))
    val (m, s) = e match {
      case Some(e) => (v * math.pow(8.0, -e), math.pow(2.0, e))
      case None    => (v * math.pow(8.0, 16), math.pow(2.0, -16))
    }
    var t = 1.0 + (m - 1.0) / 3.0
    var i = 0
    while (i < 6) { t = (2.0 * t + m / (t * t)) / 3.0; i += 1 }
    s * t
  }

  /** Population-stability index for one categorical feature: PSI =
    * Σ_i (q_i − p_i)·ln(q_i/p_i) over smoothed category shares, the
    * industry-standard categorical drift score (the reference's categorical
    * JS branch at model_monitor.py:316-325 fills the same role; PSI is its
    * per-category-share analog). Smoothing is jsDrift's recipe — p =
    * (p0 + ε)/(1 + ε·k), ε = 1e-8 — so empty cells contribute finitely.
    * HASH-EXACT since r9: the ln runs through [[portableLn]] (ladder
    * range-reduction + fixed Horner series — pure IEEE +−×÷, bit-identical
    * on both engines), the Σ folds over the category-sorted cell array, and
    * everything upstream is integer counts — so the whole statistic is
    * deterministic double arithmetic with a DuckDB twin
    * ([[psiDriftOracle]]). DriftSpec still pins the hand-computed case and
    * the psi(self) = 0 / psi ≥ 0 bounds. Bands at 0.1/0.25 are the
    * conventional stable/moderate/significant PSI cut points. */
  def featurePsi(src: DataFrame, fname: String): DataFrame = {
    val eps = lit(1e-8)
    val kD = col("n_categories").cast("double")
    val nRefD = col("n_ref").cast("double")
    val nCurD = col("n_cur").cast("double")
    // staged per-element transforms — see jsDrift's staging note
    val terms = {
      val t1 = transform(col("cells"), x => struct(
        ((x("cnt_ref").cast("double") / nRefD + eps) / (lit(1.0) + eps * kD)).as("p"),
        ((x("cnt_cur").cast("double") / nCurD + eps) / (lit(1.0) + eps * kD)).as("q")))
      val t2 = transform(t1, y => struct(
        (y("q") - y("p")).as("pq"), (y("q") / y("p")).as("r")))
      val t3 = transform(t2, y => struct(y("pq").as("pq"),
        lnLadderK(y("r")).as("k"), lnLadderM(y("r")).as("m")))
      val t4 = transform(t3, y => struct(y("pq").as("pq"), y("k").as("k"),
        ((y("m") - lit(1.0)) / (y("m") + lit(1.0))).as("z")))
      // z² staged as a field before lnFromParts (which reads it 12×) — the
      // ladder helpers' contract: pass materialized values, never subtrees
      val t5 = transform(t4, y => struct(y("pq").as("pq"), y("k").as("k"),
        y("z").as("z"), (y("z") * y("z")).as("z2")))
      transform(t5, y => y("pq") * lnFromParts(y("k"), y("z"), y("z2")))
    }
    val fold = aggregate(terms, lit(0.0), (acc, v) => acc + v)
    featureCells(src)
      .withColumn("psi",
        when(col("n_ref") === 0 || col("n_cur") === 0, lit(null).cast("double"))
          .otherwise(fold))
      .withColumn("stability",
        when(col("psi").isNull, lit(null).cast("string"))
          .when(col("psi") > 0.25, "significant")
          .when(col("psi") > 0.1, "moderate")
          .otherwise("stable"))
      .select(lit(fname).as("feature"), col("n_categories"), col("n_ref"), col("n_cur"),
        col("psi"), col("stability"))
  }

  /** The two low-cardinality order features, split on [[SplitDate]]. */
  private def categoricalSources(spark: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    val oc = Tables.ordersWithCountry(spark, dir)
    def src(c: Column) = oc.select(c.as("category"),
      (col("o_orderdate") < lit(SplitDate)).as("is_ref"))
    Seq("country" -> src(col("country")),
      "order_priority" -> src(col("o_orderpriority")))
  }

  /** Categorical drift report: chi-square contingency test per categorical
    * feature (country, order_priority) — one row per feature. Oracle-exact
    * (the Σ is a sorted fixed-order fold; see [[featureChi2]]). */
  def catDrift(spark: SparkSession, dir: String): DataFrame =
    categoricalSources(spark, dir)
      .map { case (f, src) => featureChi2(src, f) }
      .reduce(_.unionByName(_))

  /** PSI report over the same categorical features — hash-exact via
    * [[portableLn]] since r9. */
  def psiDrift(spark: SparkSession, dir: String): DataFrame =
    categoricalSources(spark, dir)
      .map { case (f, src) => featurePsi(src, f) }
      .reduce(_.unionByName(_))

  /** Two-sided normal critical values (5% / 1% / 0.1%) for the prediction
    * z-test severity ladder. Shared literals on both engines — the decision
    * contract, not a transcendental p-value. */
  private val Z95 = 1.959963984540054
  private val Z99 = 2.5758293035489004
  private val Z999 = 3.2905267314919255

  /** Prediction drift (reference: model_monitor.py:367-445,
    * PredictionDriftDetector — distribution shift of a model's scores
    * between the reference and current windows). The score source is the
    * library's own model: the per-country OLS daily-revenue predictor
    * (Forecast.salesForecast's fit), trained on the REFERENCE window only
    * and scored over both windows — prediction drift over a trending series
    * is then a real signal, not a tautology.
    *
    * Deviation from the reference (documented): scipy's ks_2samp on the
    * prediction series is already re-expressed for feature drift as
    * [[ksDrift]]; predictions are doubles, and an ECDF over computed doubles
    * is not an oracle-safe grain. Instead the shift test is a Welch z-test
    * on the prediction mean — and because pred_i = a + b·x_i is affine in
    * the day index, every window statistic has a CLOSED FORM in the exact
    * integer x-moments: mean_g = a + b·(Σx_g/n_g), var_g = b²·s²_x,g. No
    * per-row double aggregation anywhere, so the whole query is
    * rational-arithmetic deterministic and hash-exact against DuckDB.
    * Mean/std per window mirror the reference's ref_stats/curr_stats block;
    * severity grades |z| on the 5%/1%/0.1% two-sided normal ladder.
    *
    * Scale: one daily rollup shuffle + one per-country moment aggregate —
    * identical shape to sales_forecast; nothing driver-side. */
  def predictionDrift(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.ordersWithCountry(spark, dir)
      .select(col("country"), to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .groupBy("country", "day").agg(sum("cents").as("y"))
      .withColumn("x", datediff(col("day"), lit("1992-01-01").cast("date")).cast("long"))
      .withColumn("is_ref", col("day") < lit(SplitDate).cast("date"))
    def dec(c: Column): Column = c.cast("decimal(19,0)")
    val m = daily.groupBy("country").agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
      sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"),
      sum(when(col("is_ref"), col("x"))).as("sx_ref"),
      sum(when(col("is_ref"), col("y"))).as("sy_ref"),
      sum(when(col("is_ref"), dec(col("x")) * dec(col("y")))).as("sxy_ref"),
      sum(when(col("is_ref"), dec(col("x")) * dec(col("x")))).as("sxx_ref"),
      sum(when(!col("is_ref"), col("x"))).as("sx_cur"),
      sum(when(!col("is_ref"), dec(col("x")) * dec(col("x")))).as("sxx_cur"))
    val nR = col("n_ref").cast("double")
    val nC = col("n_cur").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val num = nR * d("sxy_ref") - d("sx_ref") * d("sy_ref")
    val den = nR * d("sxx_ref") - d("sx_ref") * d("sx_ref")
    val bad = col("n_ref") < 3 || col("n_cur") < 2 || den === 0.0
    val b = num / den
    val a = (d("sy_ref") - (num / den) * d("sx_ref")) / nR
    // pred = a + b·x ⇒ window stats in closed form from the x-moments
    val meanRef = a + b * (d("sx_ref") / nR)
    val meanCur = a + b * (d("sx_cur") / nC)
    val varRef = b * b * ((d("sxx_ref") - d("sx_ref") * d("sx_ref") / nR) / (nR - lit(1.0)))
    val varCur = b * b * ((d("sxx_cur") - d("sx_cur") * d("sx_cur") / nC) / (nC - lit(1.0)))
    val zDen = sqrt(varRef / nR + varCur / nC)
    val z = (meanCur - meanRef) / zDen
    def guarded(c: Column): Column = when(bad, lit(null).cast("double")).otherwise(c)
    m
      .withColumn("mean_ref", guarded(meanRef / 100.0))
      .withColumn("mean_cur", guarded(meanCur / 100.0))
      .withColumn("std_ref", guarded(sqrt(varRef) / 100.0))
      .withColumn("std_cur", guarded(sqrt(varCur) / 100.0))
      .withColumn("z_mean",
        when(bad, lit(null).cast("double"))
          .when(zDen === 0.0, lit(null).cast("double"))
          .otherwise(z))
      .withColumn("drift_detected",
        when(col("z_mean").isNull, lit(null).cast("boolean"))
          .otherwise(abs(col("z_mean")) > Z95))
      .withColumn("severity",
        when(col("z_mean").isNull, lit(null).cast("string"))
          .when(abs(col("z_mean")) > Z999, "critical")
          .when(abs(col("z_mean")) > Z99, "high")
          .when(abs(col("z_mean")) > Z95, "medium")
          .otherwise("low"))
      .select("country", "n_ref", "n_cur", "mean_ref", "mean_cur",
        "std_ref", "std_cur", "z_mean", "drift_detected", "severity")
  }

  /** DuckDB oracle mirroring predictionDrift. */
  def predictionDriftOracle: String =
    s"""WITH daily AS (
       |  SELECT n_name AS country, CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2
       |), xy AS (
       |  SELECT country, y,
       |    CAST(datediff('day', DATE '1992-01-01', day) AS BIGINT) AS x,
       |    day < DATE '$SplitDate' AS is_ref
       |  FROM daily
       |), m AS (
       |  SELECT country,
       |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
       |    CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
       |    CAST(SUM(CASE WHEN is_ref THEN x END) AS BIGINT) AS sx_ref,
       |    CAST(SUM(CASE WHEN is_ref THEN y END) AS BIGINT) AS sy_ref,
       |    SUM(CASE WHEN is_ref THEN CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) END) AS sxy_ref,
       |    SUM(CASE WHEN is_ref THEN CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)) END) AS sxx_ref,
       |    CAST(SUM(CASE WHEN NOT is_ref THEN x END) AS BIGINT) AS sx_cur,
       |    SUM(CASE WHEN NOT is_ref THEN CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)) END) AS sxx_cur
       |  FROM xy GROUP BY 1
       |), p AS (
       |  SELECT country, n_ref, n_cur,
       |    CAST(n_ref AS DOUBLE) AS nr, CAST(n_cur AS DOUBLE) AS nc,
       |    CAST(sx_ref AS DOUBLE) AS sxr, CAST(sy_ref AS DOUBLE) AS syr,
       |    CAST(sxy_ref AS DOUBLE) AS sxyr, CAST(sxx_ref AS DOUBLE) AS sxxr,
       |    CAST(sx_cur AS DOUBLE) AS sxc, CAST(sxx_cur AS DOUBLE) AS sxxc,
       |    n_ref < 3 OR n_cur < 2
       |      OR (CAST(n_ref AS DOUBLE) * CAST(sxx_ref AS DOUBLE) - CAST(sx_ref AS DOUBLE) * CAST(sx_ref AS DOUBLE)) = 0.0 AS bad
       |  FROM m
       |), q AS (
       |  SELECT *,
       |    (nr * sxyr - sxr * syr) / (nr * sxxr - sxr * sxr) AS b,
       |    (syr - ((nr * sxyr - sxr * syr) / (nr * sxxr - sxr * sxr)) * sxr) / nr AS a
       |  FROM p
       |), s AS (
       |  SELECT country, n_ref, n_cur, bad, nr, nc,
       |    a + b * (sxr / nr) AS mean_ref_c,
       |    a + b * (sxc / nc) AS mean_cur_c,
       |    b * b * ((sxxr - sxr * sxr / nr) / (nr - 1.0)) AS var_ref_c,
       |    b * b * ((sxxc - sxc * sxc / nc) / (nc - 1.0)) AS var_cur_c
       |  FROM q
       |), z AS (
       |  SELECT *, sqrt(var_ref_c / nr + var_cur_c / nc) AS z_den,
       |    (mean_cur_c - mean_ref_c) / sqrt(var_ref_c / nr + var_cur_c / nc) AS z_raw
       |  FROM s
       |)
       |SELECT country, n_ref, n_cur,
       |  CASE WHEN bad THEN NULL ELSE mean_ref_c / 100.0 END AS mean_ref,
       |  CASE WHEN bad THEN NULL ELSE mean_cur_c / 100.0 END AS mean_cur,
       |  CASE WHEN bad THEN NULL ELSE sqrt(var_ref_c) / 100.0 END AS std_ref,
       |  CASE WHEN bad THEN NULL ELSE sqrt(var_cur_c) / 100.0 END AS std_cur,
       |  CASE WHEN bad THEN NULL WHEN z_den = 0.0 THEN NULL ELSE z_raw END AS z_mean,
       |  CASE WHEN bad OR z_den = 0.0 THEN NULL ELSE abs(z_raw) > $Z95 END AS drift_detected,
       |  CASE WHEN bad OR z_den = 0.0 THEN NULL
       |       WHEN abs(z_raw) > $Z999 THEN 'critical'
       |       WHEN abs(z_raw) > $Z99 THEN 'high'
       |       WHEN abs(z_raw) > $Z95 THEN 'medium'
       |       ELSE 'low' END AS severity
       |FROM z""".stripMargin

  /** DuckDB oracle mirroring catDrift: the same sorted-cell fold via
    * list_sort + list_transform + list_reduce (list_prepend(0.0, …) matches
    * Spark's `aggregate` zero-initialized left fold term-for-term). */
  def catDriftOracle: String = {
    val critCase = "CASE " + chi2Crit95.zipWithIndex
      .map { case (v, i) => s"WHEN df = ${i + 1} THEN $v" }
      .mkString(" ") + " ELSE NULL END"
    def feature(fname: String, catExpr: String): String =
      s"""SELECT * FROM (
         |WITH src AS (
         |  SELECT $catExpr AS category, o_orderdate < TIMESTAMP '1998-01-01' AS is_ref
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |), counts AS (
         |  SELECT category,
         |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cnt_ref,
         |    CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cnt_cur
         |  FROM src GROUP BY 1
         |), agg AS (
         |  SELECT COUNT(*) AS n_categories,
         |    CAST(SUM(cnt_ref) AS BIGINT) AS n_ref, CAST(SUM(cnt_cur) AS BIGINT) AS n_cur,
         |    list_sort(list({'category': category, 'cnt_ref': cnt_ref, 'cnt_cur': cnt_cur})) AS cells
         |  FROM counts
         |), f AS (
         |  SELECT n_categories, n_ref, n_cur,
         |    list_reduce(list_prepend(0.0, list_transform(
         |      list_transform(cells, x -> {'d':
         |        CAST(CAST(x.cnt_ref AS DECIMAL(19,0)) * CAST(n_cur AS DECIMAL(19,0))
         |           - CAST(x.cnt_cur AS DECIMAL(19,0)) * CAST(n_ref AS DECIMAL(19,0)) AS DOUBLE),
         |        'r': CAST(x.cnt_ref + x.cnt_cur AS DOUBLE)}),
         |      y -> y.d * y.d / y.r)), (a, b) -> a + b) AS fold
         |  FROM agg
         |), c AS (
         |  SELECT n_categories, n_ref, n_cur,
         |    CASE WHEN n_ref = 0 OR n_cur = 0 THEN 0.0
         |         ELSE fold / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)) END AS chi2_stat,
         |    CAST(n_categories - 1 AS BIGINT) AS df
         |  FROM f
         |), k AS (
         |  SELECT *, $critCase AS chi2_critical,
         |    chi2_stat / CAST(n_categories AS DOUBLE) AS drift_score
         |  FROM c
         |)
         |SELECT '$fname' AS feature, n_categories, n_ref, n_cur, chi2_stat, df,
         |  chi2_critical,
         |  CASE WHEN chi2_critical IS NULL THEN NULL ELSE chi2_stat > chi2_critical END AS significant,
         |  drift_score, drift_score > 0.1 AS drift_detected,
         |  CASE WHEN drift_score > 0.2 THEN 'critical'
         |       WHEN drift_score > 0.15 THEN 'high'
         |       WHEN drift_score > 0.1 THEN 'medium'
         |       ELSE 'low' END AS severity
         |FROM k)""".stripMargin
    feature("country", "n_name") + "\nUNION ALL\n" +
      feature("order_priority", "o_orderpriority")
  }

  /** DuckDB twin of [[psiDrift]] — mirrors [[featurePsi]]'s expression tree
    * operation-for-operation (same smoothing order, same sorted-cell fold,
    * same [[portableLn]] ladder/Horner tree), so the psi doubles are
    * bit-identical and the driver hash-compare passes. The ln expansion is
    * staged through chained list_transform structs exactly as the Scala
    * side stages named vals. */
  def psiDriftOracle: String = {
    def feature(fname: String, catExpr: String): String = {
      val pExpr = "((CAST(x.cnt_ref AS DOUBLE) / CAST(n_ref AS DOUBLE)) + 1e-08)" +
        " / (1.0 + (1e-08 * CAST(n_categories AS DOUBLE)))"
      val qExpr = "((CAST(x.cnt_cur AS DOUBLE) / CAST(n_cur AS DOUBLE)) + 1e-08)" +
        " / (1.0 + (1e-08 * CAST(n_categories AS DOUBLE)))"
      s"""SELECT * FROM (
         |WITH src AS (
         |  SELECT $catExpr AS category, o_orderdate < TIMESTAMP '1998-01-01' AS is_ref
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |), counts AS (
         |  SELECT category,
         |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cnt_ref,
         |    CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cnt_cur
         |  FROM src GROUP BY 1
         |), agg AS (
         |  SELECT COUNT(*) AS n_categories,
         |    CAST(SUM(cnt_ref) AS BIGINT) AS n_ref, CAST(SUM(cnt_cur) AS BIGINT) AS n_cur,
         |    list_sort(list({'category': category, 'cnt_ref': cnt_ref, 'cnt_cur': cnt_cur})) AS cells
         |  FROM counts
         |), f AS (
         |  SELECT n_categories, n_ref, n_cur,
         |    list_reduce(list_prepend(0.0, list_transform(
         |      list_transform(
         |        list_transform(
         |          list_transform(
         |            list_transform(cells, x -> {'p': $pExpr, 'q': $qExpr}),
         |            y -> {'pq': y.q - y.p, 'r': y.q / y.p}),
         |          y -> {'pq': y.pq,
         |                'k': ${lnLadderSqlK("y.r")},
         |                'm': ${lnLadderSqlM("y.r")}}),
         |        y -> {'pq': y.pq, 'k': y.k,
         |              'z': (y.m - 1.0) / (y.m + 1.0)}),
         |      y -> y.pq * ((y.k * CAST($Ln2 AS DOUBLE)) + ((CAST(2.0 AS DOUBLE) * y.z) * ${lnHornerSql("(y.z * y.z)")}))
         |    )), (a, b) -> a + b) AS fold
         |  FROM agg
         |)
         |SELECT '$fname' AS feature, n_categories, n_ref, n_cur,
         |  CASE WHEN n_ref = 0 OR n_cur = 0 THEN NULL ELSE fold END AS psi,
         |  CASE WHEN n_ref = 0 OR n_cur = 0 THEN NULL
         |       WHEN fold > 0.25 THEN 'significant'
         |       WHEN fold > 0.1 THEN 'moderate'
         |       ELSE 'stable' END AS stability
         |FROM f)""".stripMargin
    }
    feature("country", "n_name") + "\nUNION ALL\n" +
      feature("order_priority", "o_orderpriority")
  }

  /** DuckDB twin of [[jsDrift]] — same bin construction, same sorted-cell
    * fold, same [[portableLn]] expansion per KL term. The transform chain is
    * assembled by a fold so the nesting can't go out of balance. */
  def jsDriftOracle: String = {
    val pExpr = "((CAST(x.cnt_ref AS DOUBLE) / CAST(n_ref AS DOUBLE)) + 1e-08)" +
      " / (1.0 + (1e-08 * 50))"
    val qExpr = "((CAST(x.cnt_cur AS DOUBLE) / CAST(n_cur AS DOUBLE)) + 1e-08)" +
      " / (1.0 + (1e-08 * 50))"
    def lnOf(k: String, z: String): String =
      s"(($k * CAST($Ln2 AS DOUBLE)) + ((CAST(2.0 AS DOUBLE) * $z) * ${lnHornerSql(s"($z * $z)")}))"
    val stages = Seq(
      s"x -> {'p': $pExpr, 'q': $qExpr}",
      "y -> {'p': y.p, 'q': y.q, 'm': (y.p + y.q) / 2}",
      "y -> {'p': y.p, 'q': y.q, 'rp': y.p / y.m, 'rq': y.q / y.m}",
      s"y -> {'p': y.p, 'q': y.q, 'kp': ${lnLadderSqlK("y.rp")}, 'mp': ${lnLadderSqlM("y.rp")}, " +
        s"'kq': ${lnLadderSqlK("y.rq")}, 'mq': ${lnLadderSqlM("y.rq")}}",
      "y -> {'p': y.p, 'q': y.q, 'kp': y.kp, 'kq': y.kq, " +
        "'zp': (y.mp - 1.0) / (y.mp + 1.0), 'zq': (y.mq - 1.0) / (y.mq + 1.0)}",
      s"y -> ((y.p * ${lnOf("y.kp", "y.zp")}) + (y.q * ${lnOf("y.kq", "y.zq")}))")
    val chain = stages.foldLeft("cells") { (inner, lam) => s"list_transform($inner, $lam)" }
    s"""SELECT * FROM (
       |WITH src AS (
       |  SELECT n_name AS country, o_totalprice AS v,
       |    o_orderdate < TIMESTAMP '1998-01-01' AS is_ref
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |), ext AS (
       |  SELECT country AS e_country, MIN(v) AS v_min, MAX(v) AS v_max FROM src GROUP BY 1
       |), binned AS (
       |  SELECT country,
       |    CASE WHEN v_max = v_min THEN CAST(0 AS BIGINT)
       |         ELSE LEAST(CAST(FLOOR((v - v_min) / ((v_max - v_min) / 50)) AS BIGINT),
       |                    CAST(49 AS BIGINT)) END AS bin,
       |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cnt_ref,
       |    CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cnt_cur
       |  FROM src JOIN ext ON country = e_country
       |  GROUP BY 1, 2
       |), agg AS (
       |  SELECT country, CAST(SUM(cnt_ref) AS BIGINT) AS n_ref,
       |    CAST(SUM(cnt_cur) AS BIGINT) AS n_cur,
       |    list_sort(list({'bin': bin, 'cnt_ref': cnt_ref, 'cnt_cur': cnt_cur})) AS cells
       |  FROM binned GROUP BY 1
       |), f AS (
       |  SELECT country, n_ref, n_cur,
       |    list_reduce(list_prepend(0.0, $chain), (a, b) -> a + b) AS fold
       |  FROM agg
       |)
       |SELECT country, n_ref, n_cur, sqrt(fold / 2) AS js_distance,
       |  sqrt(fold / 2) > 0.1 AS drift_detected
       |FROM f)""".stripMargin
  }
}
