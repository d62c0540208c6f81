package graft.ml

import graft.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed KMeans (Lloyd's) over EXACT integer features —
  * the engine-replayable sibling of MLlib's KMeans.
  *
  * MLlib's kmeans|| init samples by partition order, which makes its
  * assignments irreproducible outside Spark (the reason customer_clusters
  * and anomaly_ml were rows-only queries). This variant pins every source of
  * nondeterminism so a SQL oracle replays the fit bit-for-bit:
  *
  *  - features are exact integers (counts, day counts, cents) — per-row
  *    casts to double are exact below 2^53;
  *  - standardization stats come from exact decimal sums via the shifted-
  *    moment recipe (descriptiveStats precedent) and convert through the
  *    portable hi/lo split once;
  *  - init centers are deterministic Forgy: the k rows with the smallest
  *    md5(id) — a seeded uniform sample both engines order identically
  *    (one distributed TakeOrdered here, ROW_NUMBER over md5 there);
  *  - each Lloyd's iteration re-aggregates per-cluster EXACT integer sums
  *    (associative — shuffle order cannot drift them); new centers are
  *    derived driver-side with the identical IEEE sequence the oracle's CTE
  *    runs ([[Exact.bigDecToDoubleJvm]] mirrors [[Exact.bigDecToDoubleSql]]);
  *  - assignment is an array-literal argmin projection; ties go to the
  *    smallest cluster index on both engines (first-position match here,
  *    lexicographic min(struct) there);
  *  - a FIXED iteration count (no data-dependent early stop).
  *
  * Scale shape: the feature frame is cached once; each iteration is one
  * map-side-combined aggregate producing ≤ k rows; driver state is k×d
  * doubles — bounded by the knobs, not data. `iters` scans of a cached frame is the same cost
  * profile as MLlib's maxIter.
  */
object DetKMeans {

  /** Fitted model: per-feature standardization + final centers (z-space). */
  case class Model(n: Long, mu: Array[Double], sigma: Array[Double],
                   centers: Array[Array[Double]])

  private def dec38(c: Column): Column = c.cast("decimal(38,0)")
  private def dec19(c: Column): Column = c.cast("decimal(19,0)")

  /** Literal-centers assignment via the codegen'd
    * [[graft.functions.KMeansAssign]] kernel — argmin of the
    * left-associated squared distance, ties to the smallest index (see the
    * kernel's doc for why neither a CASE ladder nor the higher-order-
    * function form survives the per-iteration cost test). */
  def assignExpr(zCols: Seq[Column], centers: Array[Array[Double]]): Column =
    graft.functions.KMeansAssign.of(
      array(zCols: _*), typedLit(centers.map(_.toSeq).toSeq))

  /** Fit + assign: returns (df ∪ z-columns ∪ `cluster`, model). `featCols`
    * must be integral columns
    * (long-valued). Constant features standardize with σ := 1 (both
    * engines share the rule). The caller should persist `df` if its lineage
    * is expensive — fit scans it 3 + iters times. */
  def fit(df: DataFrame, idCol: String, featCols: Seq[String],
          k: Int, iters: Int): (DataFrame, Model) = {
    val nF = featCols.length

    // pass 1: n + exact decimal sums → driver (1 row)
    val sumAgg = featCols.map(f => sum(dec38(col(f))).as(s"s_$f"))
    val r1 = df.agg(Exact.countAll.as("n"), sumAgg: _*).head
    val n = r1.getLong(0)
    require(n > 0, "DetKMeans.fit on an empty frame")
    val sums = featCols.indices.map(i => r1.getDecimal(i + 1).toBigInteger)
    val nBig = java.math.BigInteger.valueOf(n)
    val ctr = sums.map(_.divide(nBig).longValueExact())         // S div n (exact)
    val tRem = sums.map(_.mod(nBig).longValueExact().toDouble)  // S mod n (exact)

    // pass 2: shifted second moments with literal centers (exact decimals)
    val sd2Agg = featCols.zip(ctr).map { case (f, c) =>
      val d = dec19(col(f) - lit(c))
      sum(d * d).as(s"sd2_$f")
    }
    val r2 = df.agg(sd2Agg.head, sd2Agg.tail: _*).head
    val nD = n.toDouble
    val mu = sums.map(s => Exact.bigDecToDoubleJvm(new java.math.BigDecimal(s)) / nD).toArray
    val sigma = featCols.indices.map { i =>
      val sd2 = Exact.bigDecToDoubleJvm(r2.getDecimal(i))
      val v = if (n <= 1) 0.0 else (sd2 - (tRem(i) * tRem(i)) / nD) / (nD - 1.0)
      if (v <= 0.0) 1.0 else math.sqrt(v)
    }.toArray

    val zCols = featCols.indices.map(i =>
      ((col(featCols(i)).cast("double") - lit(mu(i))) / lit(sigma(i))).as(s"z$i"))
    val z = df.select(col("*") +: zCols: _*)

    // init: deterministic Forgy — the k rows with the smallest md5(id)
    // (a seeded uniform sample both engines order identically; the
    // hash_split md5-of-id recipe). One distributed TakeOrdered, no global
    // shuffle — this replaced a range-partition rank init whose
    // checkpointed shuffle cost more than all the Lloyd's iterations.
    val zNames = featCols.indices.map(i => s"z$i")
    val initRows = z
      .withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy(col("__h"), col(idCol)).limit(k)
      .select(zNames.map(col): _*)
      .collect()                                               // ≤ k rows
    var centers: Array[Array[Double]] = initRows.map { row =>
      zNames.indices.map(i => row.getDouble(i)).toArray
    }

    val work = z

    // The Lloyd's loop runs as treeAggregate over ONE narrow primitive-array
    // materialization — the MLlib shape. The DataFrame formulation (an agg
    // job per iteration) measured ~0.6 s/iteration of pure driver
    // planning/scheduling overhead at sf0.1; here an iteration is a ~30 ms
    // map-side-combined pass. Per-cluster sums accumulate in BigInteger
    // (exact and associative at any scale — partitioning cannot drift them),
    // the argmin closure is op-for-op the KMeansAssign kernel, and the
    // driver receives k×(1+d) values per iteration.
    val nFi = nF
    val ptsRdd = work.select(featCols.map(col) ++ zNames.map(col): _*).rdd
      .map { r =>
        val xs = new Array[Long](nFi)
        val zs = new Array[Double](nFi)
        var i = 0
        while (i < nFi) { xs(i) = r.getLong(i); zs(i) = r.getDouble(nFi + i); i += 1 }
        (xs, zs)
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val kEff = centers.length
    type Acc = (Array[Long], Array[Array[java.math.BigInteger]])
    def zeroAcc: Acc =
      (new Array[Long](kEff), Array.fill(kEff, nFi)(java.math.BigInteger.ZERO))
    for (_ <- 1 to iters) {
      val ctrs = centers                       // capture this iteration's value
      val (ms, ss) = ptsRdd.treeAggregate(zeroAcc)(
        seqOp = { case (acc, (xs, zs)) =>
          var best = 0
          var bestD = Double.PositiveInfinity
          var j = 0
          while (j < kEff) {
            val c = ctrs(j)
            var d = 0.0
            var i = 0
            while (i < nFi) { val t = zs(i) - c(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          acc._1(best) += 1
          var i = 0
          while (i < nFi) {
            acc._2(best)(i) = acc._2(best)(i).add(java.math.BigInteger.valueOf(xs(i)))
            i += 1
          }
          acc
        },
        combOp = { (a, b) =>
          var j = 0
          while (j < kEff) {
            a._1(j) += b._1(j)
            var i = 0
            while (i < nFi) { a._2(j)(i) = a._2(j)(i).add(b._2(j)(i)); i += 1 }
            j += 1
          }
          a
        })
      centers = centers.zipWithIndex.map { case (old, j) =>
        if (ms(j) == 0L) old                                    // empty cluster
        else {
          val m = ms(j).toDouble
          featCols.indices.map { i =>
            (Exact.bigDecToDoubleJvm(new java.math.BigDecimal(ss(j)(i))) / m
              - mu(i)) / sigma(i)
          }.toArray
        }
      }
    }
    ptsRdd.unpersist(blocking = false)
    val out = work.withColumn("cluster", assignExpr(zNames.map(col), centers))
    (out, Model(n, mu, sigma, centers))
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB twin of [[fit]]: given a CTE `f(id, x0..x{n-1})` of exact
    * integer features, emits the full WITH-chain — standardization stats,
    * rank init, `iters` unrolled assign/update pairs — ending in CTE
    * `afin` = f's columns ∪ z0..z{n-1} ∪ cluster. The caller appends its
    * own final SELECT. Arithmetic mirrors [[fit]] op-for-op (see the
    * class doc); `//`/`%` run on HUGEINT (DuckDB's DECIMAL `//` rounds
    * before flooring — measured, not guessed). Every CTE is MATERIALIZED:
    * with default inlining each iteration references its predecessor twice
    * (assign and carry-forward), so the inlined plan doubles per iteration —
    * the same geometric blowup the portable-ln ladders hit ("the staging
    * lesson"); materialization makes the chain linear. */
  def oracleCtes(fCte: String, idCol: String, nFeats: Int,
                 k: Int, iters: Int): String = {
    val xs = (0 until nFeats).map(i => s"x$i")
    val b = new StringBuilder
    b ++= fCte ++ ",\n"
    b ++= s"st AS MATERIALIZED (SELECT COUNT(*) AS n, " +
      xs.map(x => s"SUM(CAST($x AS DECIMAL(38,0))) AS s_$x").mkString(", ") +
      " FROM f),\n"
    b ++= s"ctr AS MATERIALIZED (SELECT n, " + xs.map(x =>
      s"CAST(CAST(s_$x AS HUGEINT) // n AS BIGINT) AS c_$x, " +
      s"CAST(CAST(s_$x AS HUGEINT) % n AS DOUBLE) AS t_$x, " +
      Exact.bigDecToDoubleSql(s"s_$x") + s" AS sd_$x").mkString(", ") +
      " FROM st),\n"
    b ++= s"sd AS MATERIALIZED (SELECT " + xs.map(x =>
      s"SUM(CAST($x - c_$x AS DECIMAL(19,0)) * CAST($x - c_$x AS DECIMAL(19,0))) AS sd2_$x")
      .mkString(", ") + " FROM f CROSS JOIN ctr),\n"
    b ++= s"ms AS MATERIALIZED (SELECT n, CAST(n AS DOUBLE) AS nd, " + xs.map(x =>
      s"sd_$x / CAST(n AS DOUBLE) AS mu_$x").mkString(", ") + ", " +
      xs.map { x =>
        val v = s"(${Exact.bigDecToDoubleSql(s"sd2_$x")} - (t_$x * t_$x) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)"
        s"CASE WHEN n <= 1 OR $v <= 0.0 THEN 1.0 ELSE sqrt($v) END AS sig_$x"
      }.mkString(", ") +
      " FROM ctr CROSS JOIN sd),\n"
    b ++= s"z AS MATERIALIZED (SELECT f.*, " + xs.zipWithIndex.map { case (x, i) =>
      s"(CAST($x AS DOUBLE) - mu_$x) / sig_$x AS z$i" }.mkString(", ") +
      " FROM f CROSS JOIN ms),\n"
    b ++= s"rk AS MATERIALIZED (SELECT z.*, row_number() OVER " +
      s"(ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol) AS rn FROM z),\n"
    b ++= s"c0 AS MATERIALIZED (SELECT rn - 1 AS cluster, " +
      (0 until nFeats).map(i => s"z$i AS g$i").mkString(", ") +
      s" FROM rk WHERE rn <= $k),\n"
    val zAll = (0 until nFeats).map(i => s"z$i")
    val dist = (0 until nFeats).map(i => s"(z$i - g$i) * (z$i - g$i)")
      .reduce((a, x) => s"($a + $x)")
    def assignCte(name: String, from: String): String =
      s"$name AS MATERIALIZED (SELECT $idCol, " + (xs ++ zAll).mkString(", ") +
        s", (min({'d': $dist, 'j': cluster})).j AS cluster" +
        s" FROM z CROSS JOIN $from GROUP BY " +
        (Seq(idCol) ++ xs ++ zAll).mkString(", ") + ")"
    for (t <- 1 to iters) {
      b ++= assignCte(s"a$t", s"c${t - 1}") ++ ",\n"
      b ++= s"s$t AS MATERIALIZED (SELECT cluster, COUNT(*) AS m, " +
        xs.map(x => s"SUM(CAST($x AS DECIMAL(38,0))) AS s_$x").mkString(", ") +
        s" FROM a$t GROUP BY 1),\n"
      b ++= s"c$t AS MATERIALIZED (SELECT p.cluster, " + xs.zipWithIndex.map { case (x, i) =>
        s"CASE WHEN s$t.m IS NULL THEN p.g$i ELSE " +
          s"(${Exact.bigDecToDoubleSql(s"s$t.s_$x")} / CAST(s$t.m AS DOUBLE) - mu_$x) / sig_$x END AS g$i"
      }.mkString(", ") +
        s" FROM c${t - 1} p LEFT JOIN s$t USING (cluster) CROSS JOIN ms),\n"
    }
    b ++= assignCte("afin", s"c$iters")
    b.toString
  }
}
