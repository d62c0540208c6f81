package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou, Douze, Schmid 2011: "Product
  * Quantization for Nearest Neighbor Search") — the third canonical scale
  * path beside LSH and IVF, and the one with the COMPRESSION story: the
  * 64-dim float embedding (256 B) is encoded as [[SubSpaces]] 4-bit codes
  * (8 B, 32×). At 100 TB of embeddings, the PQ-coded corpus is the
  * representation that fits an executor-memory scan: ADC scoring reads
  * 8 bytes per vector instead of 256, and the exact re-rank touches only
  * the shortlist.
  *
  * Reference anchor: `src/vector_search/indexer.py:44` (HNSW build) — the
  * memory-bound regime PQ addresses is the same one the reference's
  * Typesense index hits at scale.
  *
  * How it works, all engine-replayable:
  *
  *  1. SPLIT the spherical q20 projection ([[Ann.ivfProj]] — the shared
  *     ANN geometry) into [[SubSpaces]] blocks of [[SubDim]] components.
  *  2. TRAIN one SHARED codebook over the union of all subvectors
  *     ([[graft.ml.DetKMeans]], raw-space mode — md5-seeded maxmin init,
  *     fixed iterations): [[CodeBook]] codewords of [[SubDim]] dims.
  *     Classic PQ trains one codebook per block; the shared variant is
  *     chosen deliberately — on the sphere projection the per-block
  *     subvector distributions are near-identical, so sharing costs no
  *     measured recall (PqSpec), trains on M× more points, and the
  *     oracle replays ONE fit instead of M (the M-fit form measured
  *     superlinear in DuckDB's CTE count and broke the default
  *     max_expression_depth at M=16). The codebook is a k×4 literal:
  *     constant-size at any corpus scale.
  *  3. ENCODE the corpus: each (vector, block) → its nearest codeword id.
  *     One projection pass; the M 4-bit codes ARE the stored index.
  *  4. ADC (asymmetric distance computation): per query, precompute the
  *     d² from each query subvector to every codeword (an M×16 table —
  *     tiny, broadcast); a corpus vector's approximate distance is the
  *     left-assoc sum of M table lookups. No per-vector float math at
  *     scan time.
  *  5. RE-RANK: exact fixed-point cosine over the ADC shortlist
  *     ([[adaptiveShortlist]] deep by default), emit top-k. Final quality
  *     = brute-force recall of the shortlist, so the depth is the
  *     recall/cost knob (measured curve below).
  *
  * Distance arithmetic is the exact-replay recipe throughout: z-features
  * are exact integers as doubles, codeword coordinates are the portable
  * DetKMeans means, every d² chain and the M-term ADC sum are
  * left-associated identically in the DuckDB oracle, and ties break on
  * vec_id — so the query is hash-gated, not rows-only. */
object Pq {

  /** Shipped geometry, sized on the measured isotropic worst case (the
    * IVF-default lesson — size for the honest worst case, expose the
    * knobs). 16 subspaces of 4 dims × 16 codewords = 16 4-bit codes =
    * 8 B/vector (32× vs the 256 B float vector). Measured curves: with
    * per-block codebooks, coarser M=4 plateaued at 0.52 recall@10 with a
    * 50-deep shortlist while M=16 measured 0.84 @ R=50 / 0.95-0.97 @
    * R=100 / 0.99 @ R=150 (n=500) and 0.90/0.96/0.99 @ R=150/200/300
    * (n=2000); the SHIPPED shared-codebook M=16 defaults with the
    * adaptive shortlist measure recall@10 = 1.00 / 1.00 / 0.91 at
    * n=500/500/2000 (the three gate corpora). */
  val SubSpaces = 16
  val SubDim: Int = Ann.IvfDims / SubSpaces // 4
  val CodeBook = 16 // codewords (4-bit codes)
  val PqIters = 10

  /** Adaptive re-rank depth: max(200, n/10) clears 0.9 measured recall@10
    * at every gated corpus on the isotropic worst case; real clustered
    * corpora concentrate and the knob drops. Replayable: the oracle
    * computes the same GREATEST(200, n//10). */
  def adaptiveShortlist(n: Long): Int = math.max(200L, n / 10L).toInt

  private def xs(n: Int) = (0 until n).map(i => s"x$i")

  /** Stack every vector's [[SubSpaces]] subvectors into one training
    * frame keyed by uid = vec_id·M + m, and fit the shared codebook.
    * Returns (codes: vec_id, c0..c{M-1} ∪ `carry`; the model). `feats`
    * must carry x0..x63 from [[Ann.ivfProj]]; `carry` names extra feats
    * columns to ride the codes projection (the IVFADC builds carry
    * `cluster`, which used to cost a full-corpus join back onto the
    * codes — guide §2.4). */
  private[ann] def fitSharedCodebook(feats: DataFrame, nCodes: Int, subSpaces: Int,
                                     carry: Seq[String] = Nil)
      : (DataFrame, graft.ml.DetKMeans.Model) = {
    val subDim = Ann.IvfDims / subSpaces
    val stacked = (0 until subSpaces).map { m =>
      feats.select(
        (col("vec_id") * subSpaces + lit(m)).as("uid") +:
          (0 until subDim).map(i => col(s"x${subDim * m + i}").as(s"x$i")): _*)
    }.reduce(_ unionByName _).persist()
    val (_, model) = graft.ml.DetKMeans.fitCached(
      stacked, "uid", xs(subDim), nCodes, PqIters, standardize = false)
    // codes via the frozen-codebook argmin kernel, ONE projection over
    // `feats` (optimization r17, guide §2.3/§2.4): the previous form
    // re-derived the stacked assignment (n·M rows through the kernel,
    // then an n·M→n pivot SHUFFLE) on every build — but the model is the
    // only thing the stacked frame is needed for, and the r16 append-path
    // gate already proved the per-subspace kernel codes are bit-identical
    // to the stacked assignment (same KMeansAssign expression, same
    // centers, same ties-to-min-codeword rule; raw-space mode so z ≡
    // x as double). Cold fits still pay the stacked passes; every build —
    // warm or cold — now skips the pivot exchange entirely.
    val cbLit = typedLit(model.centers.map(_.toSeq).toSeq)
    val codes = feats.select(col("vec_id") +:
      ((0 until subSpaces).map { m =>
        graft.functions.KMeansAssign.of(
          array((0 until subDim).map(i =>
            col(s"x${subDim * m + i}").cast("double")): _*), cbLit).as(s"c$m")
      } ++ carry.map(col)): _*)
    stacked.unpersist()
    (codes, model)
  }

  /** Per-query ADC tables: a[m][j] = d²(query subvector m, codeword j).
    * Computed on the DRIVER from the collected query features (bounded:
    * the 10-row query set) with the identical left-assoc IEEE arithmetic
    * the oracle replays — an expression form generated a ~5000-line
    * wholestage class that FAILED janino's method limit and re-attempted
    * compilation on every execution (measured 8-40 s/call at sf0.1; the
    * literal table makes the call sub-second). In a real deployment the
    * ADC table is client-side query prep anyway. */
  private def adcTables(spark: SparkSession,
                        qRows: Array[org.apache.spark.sql.Row],
                        centers: Array[Array[Double]],
                        nCodes: Int, subSpaces: Int): DataFrame = {
    val subDim = Ann.IvfDims / subSpaces
    val rows = qRows.map { r =>
      val tables = (0 until subSpaces).map { m =>
        (0 until nCodes).map { j =>
          var acc = 0.0
          var i = 0
          while (i < subDim) { // left-assoc: ((d0²+d1²)+d2²)+…
            val diff = r.getLong(1 + subDim * m + i).toDouble - centers(j)(i)
            val sq = diff * diff
            acc = if (i == 0) sq else acc + sq
            i += 1
          }
          acc
        }
      }
      org.apache.spark.sql.Row.fromSeq(r.getLong(0) +: tables)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType) +:
        (0 until subSpaces).map(m => org.apache.spark.sql.types.StructField(
          s"a$m", org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** The ADC scan + exact re-rank tail shared by the fit-per-session and
    * persisted-index paths: M array lookups + M−1 adds per corpus vector,
    * the query-keyed shortlist window, then fixed-point cosine over the
    * shortlist. Bit-identical for the same (codes, qarr) however obtained. */
  private def pqScore(emb: DataFrame, codes: DataFrame, qarr: DataFrame,
                      subSpaces: Int, rerank: Int, k: Int): DataFrame = {
    val approx = (0 until subSpaces).map { m =>
      element_at(col(s"a$m"), col(s"c$m").cast("int") + 1)
    }.reduce(_ + _)
    val ws = Window.partitionBy(col("query_id")).orderBy(col("approx"), col("vec_id"))
    val short = codes.crossJoin(broadcast(qarr))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx", approx)
      .withColumn("__r", row_number().over(ws))
      .filter(col("__r") <= rerank)
      .select(col("query_id"), col("vec_id"))
    val qEmb = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    short.join(emb, "vec_id")
      .join(broadcast(qEmb), "query_id")
      .withColumn("cos_sim", Ann.fixedPointCosine(col("embedding"), col("q_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  def pqTopK(spark: SparkSession, dir: String, k: Int = 10,
             nCodes: Int = CodeBook, shortlist: Int = 0,
             subSpaces: Int = SubSpaces): DataFrame = {
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val rerank =
      if (shortlist > 0) shortlist
      else adaptiveShortlist(Ann.cachedCount(emb.select("vec_id")))
    val feats = Ann.ivfProj(emb, "embedding").persist()
    val (codes, model) = fitSharedCodebook(feats, nCodes, subSpaces)
    val qRows = feats.filter(col("vec_id") < 10)
      .select(col("vec_id") +:
        (0 until Ann.IvfDims).map(i => col(s"x$i")): _*)
      .collect() // bounded: one row per query
    feats.unpersist()
    val qarr = adcTables(spark, qRows, model.centers, nCodes, subSpaces)
    pqScore(emb, codes, qarr, subSpaces, rerank, k)
  }

  /** Driver query. */
  def annPq(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    pqTopK(spark, dir, k)

  // ------------------------------------------------- persisted PQ index

  /** Persist the PQ index: the codes ARE the index (8 B/vector), plus the
    * k×[[SubDim]] codebook and a staleness fingerprint — the ann_ivf_indexed
    * recipe for the representation that actually ships at 100 TB (the coded
    * corpus is written ONCE; every query is a broadcast-table scan over
    * 32×-smaller data plus a shortlist re-rank). */
  private[graft] def buildPqIndex(spark: SparkSession, dir: String,
                                  indexDir: String, nCodes: Int = CodeBook,
                                  subSpaces: Int = SubSpaces): Unit = {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val feats = Ann.ivfProj(emb, "embedding").persist()
    val (codes, model) = fitSharedCodebook(feats, nCodes, subSpaces)
    feats.unpersist()
    codes.sortWithinPartitions("vec_id")
      .write.mode("overwrite").parquet(s"$indexDir/codes")
    model.centers.toIndexedSeq.zipWithIndex
      .map { case (g, j) => (j.toLong, g.toSeq) }
      .toDF("j", "g")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebook")
    val fp = emb.agg(count(lit(1)), max(col("vec_id"))).head
    Seq((subSpaces, SubDim, nCodes, PqIters, fp.getLong(0),
      if (fp.isNullAt(1)) -1L else fp.getLong(1), Ann.corpusDigest(emb)))
      .toDF("sub_spaces", "sub_dim", "n_codes", "iters", "nvecs",
        "max_vec_id", "content_digest")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta")
  }

  /** PQ top-k against a prebuilt index: codes + codebook read from disk
    * (doubles round-trip parquet bit-exactly), the query-side projection is
    * 10 rows — NO fit, no corpus-wide float math. Bit-identical to
    * [[pqTopK]] for a fresh index over the same corpus. */
  def pqTopKIndexed(spark: SparkSession, dir: String, indexDir: String,
                    k: Int = 10, shortlist: Int = 0): DataFrame = {
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val rerank =
      if (shortlist > 0) shortlist
      else adaptiveShortlist(Ann.cachedCount(emb.select("vec_id")))
    val meta = spark.read.parquet(s"$indexDir/meta").head
    val subSpaces = meta.getAs[Int]("sub_spaces")
    val nCodes = meta.getAs[Int]("n_codes")
    // fail-fast geometry validation (advice-r14): an index built under a
    // different geometry read through this direct (non-ensure) path would
    // otherwise mis-decode codes SILENTLY — sub_dim must agree with the
    // current projection width, and the codebook actually read must carry
    // exactly n_codes rows of sub_dim-wide centroids.
    require(subSpaces > 0 && Ann.IvfDims % subSpaces == 0,
      s"PQ index at $indexDir: sub_spaces=$subSpaces does not divide the " +
        s"projection width ${Ann.IvfDims}")
    val metaSubDim = meta.getAs[Int]("sub_dim")
    require(metaSubDim == Ann.IvfDims / subSpaces,
      s"PQ index at $indexDir: meta sub_dim=$metaSubDim != " +
        s"${Ann.IvfDims}/$subSpaces — built under a different geometry; rebuild")
    val codes = spark.read.parquet(s"$indexDir/codes")
    val centers = spark.read.parquet(s"$indexDir/codebook")
      .orderBy("j").collect() // bounded: nCodes rows
      .map(r => r.getSeq[Double](1).toArray)
    require(centers.length == nCodes,
      s"PQ index at $indexDir: codebook has ${centers.length} rows but meta " +
        s"says n_codes=$nCodes — inconsistent index; rebuild")
    require(centers.forall(_.length == metaSubDim),
      s"PQ index at $indexDir: codebook centroid width != sub_dim=$metaSubDim")
    val qRows = Ann.ivfProj(emb.filter(col("vec_id") < 10), "embedding")
      .select(col("vec_id") +:
        (0 until Ann.IvfDims).map(i => col(s"x$i")): _*)
      .collect() // bounded: one row per query
    val qarr = adcTables(spark, qRows, centers, nCodes, subSpaces)
    pqScore(emb, codes, qarr, subSpaces, rerank, k)
  }

  private val ensureMemo =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  /** Test hook: simulate a process restart for the once-per-JVM
    * staleness check (the Ann.resetEnsureMemo recipe). */
  private[graft] def resetEnsureMemo(): Unit = ensureMemo.clear()

  /** Build-once glue keyed by (dir, geometry) under java.io.tmpdir — the
    * ensureIvfIndex recipe verbatim: meta carries the build-time corpus
    * fingerprint (count + max vec_id); a mismatch or unreadable meta
    * rebuilds instead of wedging. */
  private[graft] def ensurePqIndex(spark: SparkSession, dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val key = md.digest(s"$dir|$SubSpaces|$CodeBook|$PqIters|v1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val idx = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_pq_idx_$key").getAbsolutePath
    if (ensureMemo.contains(idx)) return idx
    val p = new org.apache.hadoop.fs.Path(s"$idx/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = fs.exists(p) && scala.util.Try {
      val m = spark.read.parquet(s"$idx/meta").head
      val live = graft.Tables.embeddings(spark, dir)
      val fp = live.agg(count(lit(1)), max(col("vec_id"))).head
      m.getAs[Long]("nvecs") == fp.getLong(0) &&
        m.getAs[Long]("max_vec_id") ==
          (if (fp.isNullAt(1)) -1L else fp.getLong(1)) &&
        m.getAs[Long]("content_digest") == Ann.corpusDigest(live)
    }.getOrElse(false)
    if (!fresh) buildPqIndex(spark, dir, idx)
    if (ensureMemo.size > 64) ensureMemo.clear()
    ensureMemo.add(idx)
    idx
  }

  /** Driver query: the persisted-index PQ path — oracle-identical to
    * ann_pq (same codes, same codebook, precomputed). */
  def annPqIndexed(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    pqTopKIndexed(spark, dir, ensurePqIndex(spark, dir), k)

  /** DuckDB oracle: ONE DetKMeans replay over the stacked subvectors
    * (uid = vec_id·M + m), then the code pivot, the per-query
    * codeword-distance table, the M-join ADC sum (left-assoc), the
    * adaptive shortlist window, and the exact q20 re-rank. */
  def annPqOracle(k: Int = 10, nCodes: Int = CodeBook,
                  subSpaces: Int = SubSpaces): String = {
    val subDim = Ann.IvfDims / subSpaces
    val pre =
      s"""pqv AS MATERIALIZED (
         |  SELECT vec_id, qe,
         |    list_sum(list_transform(qe, v -> CAST(v AS BIGINT) * CAST(v AS BIGINT))) AS nrm
         |  FROM (SELECT vec_id,
         |          list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1048576.0)) AS qe
         |        FROM embeddings)
         |), f AS (
         |  SELECT vec_id * $subSpaces + m AS uid,
         |""".stripMargin +
        (0 until subDim).map { d =>
          s"    CASE WHEN nrm IS NULL OR nrm = 0 THEN 0 ELSE " +
            s"CAST(round(COALESCE(qe[$subDim*m + ${d + 1}], 0) * 1048576.0 / sqrt(CAST(nrm AS DOUBLE))) AS BIGINT) END AS x$d"
        }.mkString(",\n") +
        s"\n  FROM pqv CROSS JOIN (SELECT unnest(range(0, $subSpaces)) AS m) sub)"
    val d2 = (0 until subDim).map(i => s"(a.z$i - c.g$i) * (a.z$i - c.g$i)")
      .reduce((acc, x) => s"($acc + $x)")
    val codePivot = (0 until subSpaces).map(m =>
      s"MAX(CASE WHEN m = $m THEN code END) AS c$m").mkString(", ")
    val adcSum = (0 until subSpaces).map(m => s"q$m.d2")
      .reduce((acc, x) => s"($acc + $x)")
    val adcJoins = (0 until subSpaces).map { m =>
      if (m == 0) s"JOIN qd q0 ON q0.m = 0 AND q0.j = cd.c0"
      else s"JOIN qd q$m ON q$m.m = $m AND q$m.j = cd.c$m AND q$m.query_id = q0.query_id"
    }.mkString("\n  ")
    "WITH " + graft.ml.DetKMeans.oracleCtes(pre, "uid", nFeats = subDim,
      k = nCodes, iters = PqIters, standardize = false) + ",\n" +
      s"""pcodes AS MATERIALIZED (
         |  SELECT uid // $subSpaces AS vec_id, uid % $subSpaces AS m, cluster AS code
         |  FROM afin
         |), cd AS MATERIALIZED (
         |  SELECT vec_id, $codePivot
         |  FROM pcodes GROUP BY 1
         |), qd AS MATERIALIZED (
         |  SELECT a.uid // $subSpaces AS query_id, a.uid % $subSpaces AS m,
         |    c.cluster AS j, $d2 AS d2
         |  FROM afin a CROSS JOIN c$PqIters c
         |  WHERE a.uid // $subSpaces < 10
         |), adc AS MATERIALIZED (
         |  SELECT q0.query_id, cd.vec_id, $adcSum AS approx
         |  FROM cd
         |  $adcJoins
         |  WHERE cd.vec_id <> q0.query_id
         |), sl AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY approx, vec_id) AS rn
         |    FROM adc)
         |  WHERE rn <= GREATEST(200, (SELECT COUNT(*) FROM embeddings) // 10)
         |), nn AS (
         |  SELECT vec_id, qe, list_sum(list_transform(qe, v -> v * v)) AS nrm FROM pqv
         |), pp AS (
         |  SELECT sl.query_id, sl.vec_id,
         |    list_sum(list_transform(range(1, LEAST(len(a.qe), len(b.qe)) + 1),
         |      i -> a.qe[i] * b.qe[i])) AS dot,
         |    a.nrm AS nrm, b.nrm AS q_nrm
         |  FROM sl
         |  JOIN nn a ON a.vec_id = sl.vec_id
         |  JOIN nn b ON b.vec_id = sl.query_id
         |), ss AS (
         |  SELECT query_id, vec_id,
         |    CASE WHEN nrm * q_nrm = 0.0 THEN NULL ELSE dot / sqrt(nrm * q_nrm) END AS cos_sim
         |  FROM pp
         |), rr AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS "rank"
         |  FROM ss
         |)
         |SELECT query_id, vec_id, cos_sim, "rank" FROM rr WHERE "rank" <= $k
         |ORDER BY query_id, "rank"""".stripMargin
  }
}
