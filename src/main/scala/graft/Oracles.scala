package graft

/** DuckDB oracle SQL for every SQL-expressible query in SparkEntry.queries.
  *
  * Rules (SURVEY.md §3): identical aggregate arithmetic to the Spark plans —
  * exact DECIMAL(18,6) sums cast to DOUBLE, ratios written as the same IEEE
  * expression, BIGINT for derived integers, DATE (never raw timestamps),
  * unique tie-breakers in every ranking window. Column names match the Spark
  * output exactly (the driver sorts columns by name before hashing).
  */
object Oracles {

  private val salesJoin =
    """FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  private val ordersJoin =
    """FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  private val revDec = "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))"
  private val qtyDec = "SUM(CAST(l_quantity AS DECIMAL(18,6)))"
  private val priceDec = "SUM(CAST(o_totalprice AS DECIMAL(18,6)))"
  private val valDec = "SUM(CAST(value AS DECIMAL(18,6)))"
  /** engine-portable decimal-sum -> double (see Exact.dec6ToDoubleSql) */
  private def d6(e: String) = graft.Exact.dec6ToDoubleSql(e)

  /** RFM oracle — reused verbatim by rfm_segment_rollup (nested WITH). */
  private val rfmSql =
    s"""WITH m AS (
         |  SELECT o_custkey AS customer_id, n_name AS country,
         |    MIN(CAST(o_orderdate AS DATE)) AS first_purchase,
         |    MAX(CAST(o_orderdate AS DATE)) AS last_purchase,
         |    COUNT(*) AS transaction_count,
         |    ${d6(priceDec)} AS total_spent,
         |    ${d6(priceDec)} / COUNT(*) AS avg_order_value
         |  $ordersJoin
         |  GROUP BY 1, 2
         |), s AS (
         |  SELECT *,
         |    CAST(date_diff('day', first_purchase, last_purchase) AS BIGINT) AS customer_lifetime_days,
         |    CAST(NTILE(5) OVER (ORDER BY last_purchase DESC, customer_id) AS BIGINT) AS recency_score,
         |    CAST(NTILE(5) OVER (ORDER BY transaction_count DESC, customer_id) AS BIGINT) AS frequency_score,
         |    CAST(NTILE(5) OVER (ORDER BY total_spent DESC, customer_id) AS BIGINT) AS monetary_score
         |  FROM m
         |), s2 AS (
         |  SELECT *, CAST(recency_score AS VARCHAR) || CAST(frequency_score AS VARCHAR) ||
         |    CAST(monetary_score AS VARCHAR) AS rfm_score
         |  FROM s
         |)
         |SELECT *,
         |  CASE
         |    WHEN regexp_matches(rfm_score, '^[1-2][1-2][1-2]$$') THEN 'Champions'
         |    WHEN regexp_matches(rfm_score, '^[1-3][3-5][1-2]$$') THEN 'Big Spenders'
         |    WHEN regexp_matches(rfm_score, '^[1-3][1-3][3-5]$$') THEN 'Loyal Customers'
         |    WHEN regexp_matches(rfm_score, '^[1-2][3-5][3-5]$$') THEN 'New Customers'
         |    WHEN regexp_matches(rfm_score, '^[3-4][1-3][1-3]$$') THEN 'Potential Loyalists'
         |    WHEN regexp_matches(rfm_score, '^[2-3][2-3][2-3]$$') THEN 'Need Attention'
         |    WHEN regexp_matches(rfm_score, '^[4-5][1-2][1-2]$$') THEN 'Cannot Lose Them'
         |    WHEN regexp_matches(rfm_score, '^[4-5][4-5][1-2]$$') THEN 'At Risk'
         |    ELSE 'Others'
         |  END AS customer_segment
         |FROM s2""".stripMargin

  import graft.text.TextOps.{sqlList, enStop, esStop, frStop, deStop}

  /** Exact word-3-gram Jaccard near-dup pairs (threshold 0.8) via a shingle
    * inverted-index join — the oracle twin of MinHashLsh.nearDupPairs. The
    * LSH side is seed-fixed and Jaccard-VERIFIES every candidate, so its
    * output equals this exact set whenever banding recall is 100%; recall is
    * deterministic per dataset and verified 100% at sf0.001 and sf0.01 (28
    * and 25 pairs, zero missed, jaccard values bit-identical). */
  private val exactJaccardPairs =
    """t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
      |e AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
      |         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS sh FROM e),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
      |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |pairs AS (SELECT doc_a, doc_b, CAST(isect AS DOUBLE) / (ca.n + cb.n - isect) AS jaccard
      |          FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
      |          WHERE CAST(isect AS DOUBLE) / (ca.n + cb.n - isect) >= 0.8)""".stripMargin

  /** Full replay of the portable-MD5 SimHash detector (SimHash.scala): the
    * per-token 64-bit hash is `md5_number_upper(token)` — numerically the
    * little-endian first-8-digest-bytes long the Spark side computes
    * (SimHash64.md5Long) — so the multiplicity-weighted bit votes, the
    * fingerprint, the 4 × 16-bit pigeonhole bands, and the Hamming verify
    * are all bit-identical across engines. The band join keeps the oracle
    * sub-quadratic too (the pigeonhole guarantee — any pair at Hamming ≤ 3
    * shares a whole band — is mathematical, not probabilistic, so banded
    * output EQUALS the all-pairs answer at every scale). Ends in
    * `shpairs(doc_a, doc_b, hamming)`. */
  private val simhashPairsCte =
    """sd AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |         t -> len(t) > 0) AS toks FROM documents),
      |stc AS (SELECT doc_id, t, COUNT(*) AS c
      |        FROM (SELECT doc_id, unnest(toks) AS t FROM sd) GROUP BY 1, 2),
      |sth AS (SELECT doc_id, c, md5_number_upper(t) AS h FROM stc),
      |svotes AS (SELECT doc_id, j, SUM(CASE WHEN ((h >> j) & 1) = 1 THEN c ELSE -c END) AS v
      |           FROM sth CROSS JOIN range(0, 64) r(j) GROUP BY 1, 2),
      |sraw AS (SELECT doc_id,
      |           SUM(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << j ELSE CAST(0 AS HUGEINT) END) AS uh
      |         FROM svotes GROUP BY 1),
      |ssh AS (SELECT sd.doc_id, COALESCE(uh, CAST(0 AS HUGEINT)) AS uh,
      |          CAST(CASE WHEN COALESCE(uh, CAST(0 AS HUGEINT)) >= CAST(1 AS HUGEINT) << 63
      |               THEN COALESCE(uh, CAST(0 AS HUGEINT)) - (CAST(1 AS HUGEINT) << 64)
      |               ELSE COALESCE(uh, CAST(0 AS HUGEINT)) END AS BIGINT) AS simhash
      |        FROM sd LEFT JOIN sraw USING (doc_id)),
      |sbk AS (SELECT doc_id, simhash, j AS band, CAST((uh >> (16 * j)) & 65535 AS BIGINT) AS bucket
      |        FROM ssh CROSS JOIN range(0, 4) r(j)),
      |shpairs AS (SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
      |            FROM (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |                    a.simhash AS sa, b.simhash AS sb
      |                  FROM sbk a JOIN sbk b USING (band, bucket)
      |                  WHERE a.doc_id < b.doc_id)
      |            WHERE bit_count(xor(sa, sb)) <= 3)""".stripMargin

  private val factJoinRollup =
    s"""SELECT o_orderpriority,
      |  COUNT(*) AS n_lines,
      |  ${d6(revDec)} AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Three-detector ensemble (z + MAD + IQR) oracle — also embedded as
    * the statistical leg of anomaly_ensemble_ml. */
  private val anomalyEnsembleSql: String =
    s"""WITH oc AS (
         |  SELECT o_orderkey, n_name AS country, o_totalprice,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  $ordersJoin
         |), a1 AS (
         |  SELECT country AS a_country, COUNT(*) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS s,
         |    CAST(SUM(cents) AS BIGINT) // COUNT(*) AS center
         |  FROM oc GROUP BY 1
         |), a2 AS (
         |  SELECT a_country AS z_country, n, s, center,
         |    SUM(CAST(cents - center AS DECIMAL(15,0)) * CAST(cents - center AS DECIMAL(15,0))) AS ssd
         |  FROM oc JOIN a1 ON country = a_country
         |  GROUP BY 1, 2, 3, 4
         |), zs AS (
         |  SELECT z_country,
         |    (CAST(s AS DOUBLE) / n) / 100.0 AS mean_price,
         |    CASE WHEN n <= 1 THEN NULL
         |         ELSE sqrt((${Exact.bigDecToDoubleSql("ssd")}
         |      - (CAST(s % n AS DOUBLE) * CAST(s % n AS DOUBLE)) / n) / (n - 1)) / 100.0 END AS std_price
         |  FROM a2
         |), ranked AS (
         |  SELECT country, cents, o_orderkey,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY country ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY country) AS BIGINT) AS n
         |  FROM oc
         |), os AS (
         |  SELECT country AS o_country,
         |    MIN(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med_cents,
         |    MIN(CASE WHEN rn = greatest(1, CAST(ceil(n * 0.25) AS BIGINT)) THEN cents END) AS q1_cents,
         |    MIN(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN cents END) AS q3_cents
         |  FROM ranked GROUP BY 1
         |), dev AS (
         |  SELECT oc.country, oc.o_orderkey, abs(cents - med_cents) AS absdev
         |  FROM oc JOIN os ON oc.country = o_country
         |), ranked2 AS (
         |  SELECT country, absdev,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY country ORDER BY absdev, o_orderkey) AS BIGINT) AS rn2,
         |    CAST(COUNT(*) OVER (PARTITION BY country) AS BIGINT) AS n
         |  FROM dev
         |), ms AS (
         |  SELECT country AS m_country,
         |    MIN(CASE WHEN rn2 = (n + 1) // 2 THEN absdev END) AS mad_cents
         |  FROM ranked2 GROUP BY 1
         |), scored AS (
         |  SELECT o_orderkey, country, o_totalprice,
         |    (o_totalprice - mean_price) / std_price AS z,
         |    CASE WHEN mad_cents = 0 THEN NULL
         |         ELSE (0.6745 * CAST(cents - med_cents AS DOUBLE)) / CAST(mad_cents AS DOUBLE) END AS modified_z,
         |    CAST(cents AS DOUBLE) < CAST(q1_cents AS DOUBLE) - 1.5 * (q3_cents - q1_cents)
         |      OR CAST(cents AS DOUBLE) > CAST(q3_cents AS DOUBLE) + 1.5 * (q3_cents - q1_cents)
         |      AS is_iqr_outlier
         |  FROM oc
         |  JOIN zs ON country = z_country
         |  JOIN os ON country = o_country
         |  JOIN ms ON country = m_country
         |), votes AS (
         |  SELECT *,
         |    (CASE WHEN z IS NULL THEN 0.0 ELSE least(abs(z) / 3.0, 1.0) END
         |     + CASE WHEN modified_z IS NULL THEN 0.0 ELSE least(abs(modified_z) / 3.5, 1.0) END
         |     + CASE WHEN is_iqr_outlier THEN 1.0 ELSE 0.0 END) / 3.0 AS ensemble_score,
         |    CAST(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END
         |     + CASE WHEN abs(modified_z) > 3.5 THEN 1 ELSE 0 END
         |     + CASE WHEN is_iqr_outlier THEN 1 ELSE 0 END AS BIGINT) AS votes
         |  FROM scored
         |)
         |SELECT o_orderkey, country, o_totalprice, z, modified_z, is_iqr_outlier,
         |  ensemble_score, votes, votes >= 2 AS is_anomaly,
         |  CASE WHEN ensemble_score >= 0.9 THEN 'critical'
         |       WHEN ensemble_score >= 0.7 THEN 'high'
         |       WHEN ensemble_score >= 0.5 THEN 'medium'
         |       ELSE 'low' END AS severity
         |FROM votes""".stripMargin

  /** Shared by cluster_keepers and its doc-bounded projection
    * dedup_minhash_keepers: exact-Jaccard pair graph → recursive
    * reachability components → quality-ordered keeper election. */
  private val clusterKeepersSql =
    s"""WITH RECURSIVE $exactJaccardPairs,
       |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT s AS node FROM edges),
       |reach(node, r) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node
       |),
       |lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
       |sz AS (SELECT cluster_id, count(*) AS csz FROM lab GROUP BY 1),
       |tq AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) END AS n_tokens,
       |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |      x -> x IN (${sqlList(enStop)}))) AS BIGINT) AS sw
       |  FROM documents
       |),
       |q AS (
       |  SELECT doc_id,
       |    LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
       |      + CASE WHEN n_tokens = 0 THEN 0.0
       |             ELSE LEAST(1.0, 4.0 * sw / n_tokens) * 0.5 END AS quality_score
       |  FROM tq
       |),
       |m AS (
       |  SELECT d.doc_id,
       |    coalesce(lab.cluster_id, d.doc_id) AS cluster_id,
       |    CAST(coalesce(sz.csz, 1) AS BIGINT) AS cluster_size,
       |    q.quality_score
       |  FROM documents d
       |  LEFT JOIN lab ON d.doc_id = lab.doc_id
       |  LEFT JOIN sz ON lab.cluster_id = sz.cluster_id
       |  JOIN q ON q.doc_id = d.doc_id
       |)
       |SELECT doc_id, cluster_id, cluster_size, quality_score,
       |  first_value(doc_id) OVER (PARTITION BY cluster_id
       |    ORDER BY quality_score DESC NULLS LAST, doc_id) AS keeper_id,
       |  doc_id = first_value(doc_id) OVER (PARTITION BY cluster_id
       |    ORDER BY quality_score DESC NULLS LAST, doc_id) AS is_kept
       |FROM m""".stripMargin

  val sql: Map[String, String] = Map(
    // z-order vs natural layout pruning stats (exact integer replay)
    "zorder_layout" -> graft.operators.Layout.zorderLayoutOracle,
    "ann_topk" -> graft.ann.Ann.annTopKOracle,
    "ann_lsh" -> graft.ann.Ann.annLshOracle,
    "ann_ivf" -> graft.ann.Ann.annIvfOracle(),
    // the persisted-index path scores the same lists/centroids the fit
    // path derives (doubles round-trip parquet bit-exactly), so the same
    // end-to-end replay oracle applies verbatim
    "ann_ivf_indexed" -> graft.ann.Ann.annIvfOracle(),
    // settled-subset KMeans + frozen-centroid assignment of the appended
    // fifth, probe over the union — the append arc replayed end-to-end
    "ann_ivf_append" -> graft.ann.Ann.annIvfAppendOracle(),
    // assign-only appends are batch-boundary-invariant, so the streamed
    // sink replay answers bit-for-bit what the batch arc computes
    "streaming_ivf_append_replay" -> graft.ann.Ann.annIvfAppendOracle(),
    "ann_recall" -> graft.ann.Ann.annRecallOracle(),
    // dispatch replayed in SQL: the same count-vs-threshold rule guards
    // both route oracles, so the gate exercises whichever side of the
    // threshold the gated corpus lands on
    "ann_auto" -> graft.ann.Ann.annAutoOracle,
    "customer_clusters" -> graft.ml.Clustering.customerClustersOracle(),
    "model_eval" -> graft.ml.ModelEval.modelEvalOracle,
    "ann_filtered" -> graft.ann.Ann.annFilteredOracle,
    "embed_neardup" -> graft.ann.Ann.embedNearDupsOracle,
    "faceted_search" -> graft.text.Search.facetedSearchOracle,
    "advanced_search" -> graft.text.Search.advancedSearchOracle,

    "minhash_recall" -> graft.dedup.MinHashLsh.minhashRecallAuditOracle(),

    "dedup_minhash" ->
      s"""WITH $exactJaccardPairs
         |SELECT doc_a, doc_b, jaccard FROM pairs""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $simhashPairsCte
         |SELECT doc_a, doc_b, hamming FROM shpairs""".stripMargin,

    // the composed report: exact ∪ minhash ∪ simhash ∪ embedding — each leg
    // reuses its own detector's oracle form (the simhash leg became
    // SQL-expressible when the detector moved to the portable MD5 hash)
    "dedup_report" ->
      s"""WITH $exactJaccardPairs,
         |$simhashPairsCte,
         |ex AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
         |       FROM documents),
         |expairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |            FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, method, score FROM (
         |  SELECT doc_a, doc_b, 'exact' AS method, CAST(1 AS DOUBLE) AS score FROM expairs
         |  UNION ALL
         |  SELECT doc_a, doc_b, 'minhash', jaccard FROM pairs
         |  UNION ALL
         |  SELECT doc_a, doc_b, 'simhash',
         |    CAST(1 AS DOUBLE) - CAST(hamming AS DOUBLE) / CAST(64 AS DOUBLE) FROM shpairs
         |  UNION ALL
         |  SELECT vec_a AS doc_a, vec_b AS doc_b, 'embedding', cos_sim
         |  FROM (${graft.ann.Ann.embedNearDupsOracle}) emb
         |) u""".stripMargin,

    "dedup_clusters" ->
      s"""WITH RECURSIVE $exactJaccardPairs,
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT s AS node FROM edges),
         |reach(node, r) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node
         |),
         |lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
         |sz AS (SELECT cluster_id, count(*) AS csz FROM lab GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(lab.cluster_id, d.doc_id) AS cluster_id,
         |  d.doc_id = coalesce(lab.cluster_id, d.doc_id) AS is_keeper,
         |  CAST(coalesce(sz.csz, 1) AS BIGINT) AS cluster_size,
         |  TRUE AS converged
         |FROM documents d
         |LEFT JOIN lab ON d.doc_id = lab.doc_id
         |LEFT JOIN sz ON lab.cluster_id = sz.cluster_id""".stripMargin,
    "cluster_keepers" -> clusterKeepersSql,
    // the doc-bounded dedup DEFAULT (MinHashLsh.nearDupKeepers): the same
    // pipeline projected to the decision frame a curation executor consumes
    "dedup_minhash_keepers" ->
      s"""SELECT doc_id, is_kept AS keep, keeper_id, cluster_size
         |FROM ($clusterKeepersSql)""".stripMargin,

    // The Spark side synthesizes REAL container headers (PNG IHDR / WAV fmt)
    // around the text body and then genuinely PARSES them back; the oracle
    // predicts what the parser must find in closed form (same deterministic
    // synthesis parameters), so any parse bug hash-fails the row.
    "multimodal_features" ->
      s"""WITH m AS (
         |  SELECT doc_id, text,
         |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
         |    encode(text) AS body
         |  FROM documents
         |), f AS (
         |  SELECT doc_id, media_type,
         |    CAST(octet_length(body) AS BIGINT) AS body_len,
         |    lower(substr(hex(body), 1, 8)) AS body_magic,
         |    sha256(text) AS content_digest -- VARCHAR overload; hashes the same utf8 bytes
         |  FROM m
         |), g AS (
         |  SELECT doc_id, media_type, content_digest,
         |    CAST(CASE media_type WHEN 'image' THEN body_len + 33
         |                         WHEN 'audio' THEN body_len + 44
         |                         ELSE body_len + 88 END AS BIGINT) AS n_bytes,
         |    CASE media_type WHEN 'image' THEN '89504e47'
         |                    ELSE '52494646' END AS magic_hex,
         |    CAST(CASE WHEN media_type = 'image' THEN 64 + doc_id % 1857
         |              WHEN media_type = 'video' THEN 320 + doc_id % 1601 END AS BIGINT) AS width,
         |    CAST(CASE WHEN media_type = 'image' THEN 64 + body_len % 1017
         |              WHEN media_type = 'video' THEN 240 + body_len % 841 END AS BIGINT) AS height,
         |    CAST(CASE WHEN media_type = 'audio'
         |              THEN ([8000,16000,22050,44100,48000])[CAST(doc_id % 5 AS INT) + 1] END AS BIGINT) AS sample_rate,
         |    CAST(CASE WHEN media_type = 'audio' THEN 1 + doc_id % 2 END AS BIGINT) AS channels
         |  FROM f
         |), h AS (
         |  SELECT *, CAST(greatest(1, n_bytes // 5) AS BIGINT) AS step FROM g
         |)
         |SELECT doc_id, media_type, n_bytes, magic_hex, width, height,
         |  sample_rate, channels,
         |  CAST(CASE WHEN media_type = 'video' THEN 1 + doc_id % 300 ELSE 1 END AS BIGINT) AS n_frames,
         |  concat_ws(',', 0, step, 2 * step, 3 * step, 4 * step) AS sample_offsets,
         |  content_digest
         |FROM h""".stripMargin,

    // Signal-level twin of multimodal_features: the Spark side genuinely
    // walks the BMP header / WAV RIFF chunks / PNG chunk stream (IDAT
    // inflated through the JDK zlib, all five scanline filters reversed)
    // and reads raw pixels / PCM16 samples; the oracle replays the SAME
    // bytes from the text column —
    // hex(encode(text)) exploded per sample (audio) or per pixel byte
    // (image) via closed-form synthesis parameters. All stats are exact
    // integer sums; the emitted doubles are single-rounding quotients
    // (plus one sqrt for RMS), so they hash bit-identically.
    "multimodal_signal" -> {
      // hex-nibble value of the 1-based char at `pos` in column h
      def hv(pos: String) = s"(strpos('0123456789ABCDEF', substr(h, $pos, 1)) - 1)"
      // byte k (0-based) of the blob = two hex chars at 2k+1, 2k+2
      def byteAt(k: String) = s"(${hv(s"($k)*2 + 1")} * 16 + ${hv(s"($k)*2 + 2")})"
      s"""WITH d AS (
         |  SELECT doc_id, CAST(doc_id % 3 AS INT) AS m,
         |    hex(encode(text)) AS h,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n
         |  FROM documents
         |), asamp AS ( -- LE int16 samples: byte 2i low, byte 2i+1 high
         |  SELECT doc_id,
         |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
         |  FROM (
         |    SELECT doc_id, ${byteAt("2*i")} + 256 * ${byteAt("2*i + 1")} AS u
         |    FROM (SELECT doc_id, h, unnest(range(0, d.n // 2)) AS i
         |          FROM d WHERE d.m = 1))
         |), aagg AS (
         |  SELECT doc_id, COUNT(*) AS cnt, MAX(ABS(s)) AS peak,
         |    SUM(CASE WHEN s = 32767 OR s = -32768 THEN 1 ELSE 0 END) AS clip,
         |    SUM(CAST(s AS BIGINT) * s) AS ss
         |  FROM asamp GROUP BY 1
         |), ibyte AS ( -- pixel bytes over whole 12-byte rows (width 4, no
         |              -- pad): m=0 rows are BMP BGR, m=2 rows are the SAME
         |              -- text bytes as PNG RGB (the zlib round-trip is
         |              -- identity on the pixels, so the closed form stays
         |              -- byte-positional — only the channel order flips)
         |  SELECT doc_id, m, CAST(i % 3 AS INT) AS ch, ${byteAt("i")} AS b
         |  FROM (SELECT doc_id, m, h, unnest(range(0, 12 * (d.n // 12))) AS i
         |        FROM d WHERE d.m IN (0, 2))
         |), iagg AS (
         |  SELECT doc_id, COUNT(*) // 3 AS np,
         |    SUM(CASE WHEN ch = CASE m WHEN 0 THEN 0 ELSE 2 END THEN b END) AS sb,
         |    SUM(CASE WHEN ch = 1 THEN b END) AS sg,
         |    SUM(CASE WHEN ch = CASE m WHEN 0 THEN 2 ELSE 0 END THEN b END) AS sr
         |  FROM ibyte GROUP BY 1
         |)
         |SELECT d.doc_id,
         |  CASE d.m WHEN 1 THEN 'audio' ELSE 'image' END AS media_type,
         |  CAST(CASE d.m WHEN 1 THEN d.n // 2 ELSE 4 * (d.n // 12) END AS BIGINT) AS n_units,
         |  CAST(a.peak AS BIGINT) AS peak_abs,
         |  CAST(a.clip AS BIGINT) AS clip_count,
         |  sqrt(CAST(a.ss AS DOUBLE) / CAST(a.cnt AS DOUBLE)) AS rms,
         |  CAST(i.sb AS DOUBLE) / CAST(i.np AS DOUBLE) AS mean_b,
         |  CAST(i.sg AS DOUBLE) / CAST(i.np AS DOUBLE) AS mean_g,
         |  CAST(i.sr AS DOUBLE) / CAST(i.np AS DOUBLE) AS mean_r
         |FROM d
         |LEFT JOIN aagg a USING (doc_id)
         |LEFT JOIN iagg i USING (doc_id)""".stripMargin
    },

    // AVI frame decode: the Spark side walks a real RIFF tree (LIST hdrl
    // avih geometry, LIST movi '00db' uncompressed-DIB frames) and sums
    // pixel bytes + inter-frame |diff|s. The synthesis scrolls frame k by
    // k 12-byte rows (cyclic), so the closed form is: per-frame channel
    // sums equal frame 0's (a whole-row scroll preserves i%3 channel
    // classes), and EVERY transition's motion equals the cyclic 12-shift
    // absolute-difference total — the oracle states both directly. The
    // emitted doubles divide the engine's exact totals (fr-scaled), which
    // IEEE-divide to the identical value.
    "multimodal_video" -> {
      def hv(pos: String) = s"(strpos('0123456789ABCDEF', substr(h, $pos, 1)) - 1)"
      def byteAt(k: String) = s"(${hv(s"($k)*2 + 1")} * 16 + ${hv(s"($k)*2 + 2")})"
      s"""WITH d AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n,
         |    CAST(2 + doc_id % 3 AS BIGINT) AS fr
         |  FROM documents
         |), p AS (
         |  SELECT doc_id, h, fr, n // 12 AS hgt, 12 * (n // 12) AS L FROM d
         |), ib AS (
         |  SELECT doc_id,
         |    SUM(CASE WHEN i % 3 = 0 THEN ${byteAt("i")} END) AS sb,
         |    SUM(CASE WHEN i % 3 = 1 THEN ${byteAt("i")} END) AS sg,
         |    SUM(CASE WHEN i % 3 = 2 THEN ${byteAt("i")} END) AS sr,
         |    SUM(ABS(${byteAt("i")} - ${byteAt("(i + 12) % L")})) AS md
         |  FROM (SELECT doc_id, h, L, unnest(range(0, L)) AS i FROM p WHERE L > 0)
         |  GROUP BY 1
         |)
         |SELECT p.doc_id, p.fr AS n_frames,
         |  CAST(4 AS BIGINT) AS width, CAST(p.hgt AS BIGINT) AS height,
         |  CAST(4 * p.hgt * p.fr AS BIGINT) AS n_units,
         |  CAST(p.fr * ib.sb AS DOUBLE) / CAST(p.fr * 4 * p.hgt AS DOUBLE) AS mean_b,
         |  CAST(p.fr * ib.sg AS DOUBLE) / CAST(p.fr * 4 * p.hgt AS DOUBLE) AS mean_g,
         |  CAST(p.fr * ib.sr AS DOUBLE) / CAST(p.fr * 4 * p.hgt AS DOUBLE) AS mean_r,
         |  CAST((p.fr - 1) * ib.md AS DOUBLE) / CAST((p.fr - 1) * p.L AS DOUBLE) AS motion
         |FROM p LEFT JOIN ib USING (doc_id)""".stripMargin
    },

    // MJPEG decode: the engine walks the RIFF tree and runs every '00dc'
    // JPEG payload through javax.imageio; the gated columns are the
    // DECODED geometry (count/width/height/pixels), which the synthesis
    // fixes in closed form — so a decoder that fails, miscounts frames or
    // returns wrong dimensions hash-mismatches. Pixel means are IDCT-
    // implementation-defined and deliberately not gated (MultimodalSpec).
    "multimodal_mjpeg" ->
      s"""SELECT doc_id,
         |  CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
         |  CAST(${graft.multimodal.Multimodal.JpegDim} AS BIGINT) AS width,
         |  CAST(${graft.multimodal.Multimodal.JpegDim} AS BIGINT) AS height,
         |  CAST(${graft.multimodal.Multimodal.JpegDim} * ${graft.multimodal.Multimodal.JpegDim} * (2 + doc_id % 3) AS BIGINT) AS n_units
         |FROM documents""".stripMargin,

    "ets_forecast" -> graft.operators.EtsForecast.etsForecastOracle(),
    // incremental arc's gate IS the cold replay: warm continuation must be
    // bit-identical to the from-scratch recurrence on the union window
    "ets_incremental" -> graft.operators.EtsForecast.etsForecastOracle(),
    "seasonal_decompose" -> graft.operators.SeasonalDecompose.seasonalDecomposeOracle(),
    "ar_forecast" -> graft.operators.ArForecast.arForecastOracle(),

    "basket_features" ->
      s"""SELECT l_orderkey,
        |  COUNT(*) AS basket_size,
        |  COUNT(DISTINCT l_partkey) AS basket_diversity,
        |  ${d6(qtyDec)} AS basket_total_quantity,
        |  ${d6(revDec)} AS basket_total_value,
        |  ${d6("SUM(CAST(l_extendedprice AS DECIMAL(18,6)))")} / COUNT(*) AS basket_avg_price,
        |  CASE WHEN COUNT(*) <= 1 THEN 'Single'
        |       WHEN COUNT(*) <= 3 THEN 'Small'
        |       WHEN COUNT(*) <= 10 THEN 'Medium'
        |       ELSE 'Large' END AS basket_size_category
        |FROM lineitem
        |GROUP BY 1""".stripMargin,

    "customer_behavior" ->
      s"""WITH o AS (
         |  SELECT o_custkey AS customer_id, n_name AS country, o_totalprice,
         |    CAST(o_orderdate AS DATE) AS od, dayname(CAST(o_orderdate AS DATE)) AS dow
         |  $ordersJoin
         |), base AS (
         |  SELECT customer_id, country, COUNT(*) AS orders_count,
         |    MIN(od) AS first_order, MAX(od) AS last_order,
         |    CAST(date_diff('day', MIN(od), MAX(od)) AS BIGINT) AS tenure_days,
         |    CAST(date_diff('day', MIN(od), MAX(od)) AS DOUBLE) / COUNT(*) AS avg_days_between_orders,
         |    ${d6(priceDec)} AS total_spend,
         |    ${d6(priceDec)} / COUNT(*) AS avg_order_value
         |  FROM o GROUP BY 1, 2
         |), m AS (
         |  SELECT customer_id AS m_cust, dow AS preferred_dow, COUNT(*) AS preferred_dow_orders
         |  FROM o GROUP BY 1, 2
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY customer_id ORDER BY COUNT(*) DESC, dow) = 1
         |)
         |SELECT customer_id, country, orders_count, first_order, last_order, tenure_days,
         |  avg_days_between_orders, total_spend, avg_order_value, preferred_dow, preferred_dow_orders
         |FROM base JOIN m ON customer_id = m_cust""".stripMargin,

    "seasonality" ->
      s"""WITH monthly AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |    CAST(month(o_orderdate) AS BIGINT) AS order_month,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev,
        |    COUNT(*) AS monthly_orders
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT order_year, order_month, monthly_orders,
        |  ${d6("rev")} AS monthly_revenue,
        |  ${d6("(SUM(rev) OVER (PARTITION BY order_year))")} AS year_revenue,
        |  ${d6("rev")} / ${d6("(SUM(rev) OVER (PARTITION BY order_year))")} AS revenue_share_of_year,
        |  (order_month - 1) / 12.0 AS month_angle_turns,
        |  order_month >= 10 AS is_q4
        |FROM monthly""".stripMargin,

    "median_prices" ->
      s"""WITH oc AS (
         |  SELECT o_orderkey, n_name AS country,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  $ordersJoin
         |), ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY country ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY country) AS BIGINT) AS n
         |  FROM oc
         |)
         |SELECT country, n AS orders,
         |  CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS DOUBLE) / 100.0 AS median_price,
         |  CAST(MIN(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN cents END) AS DOUBLE) / 100.0 AS p90_price
         |FROM ranked GROUP BY 1, 2""".stripMargin,

    "iqr_outliers" ->
      s"""WITH oc AS (
         |  SELECT o_orderkey, n_name AS country, o_totalprice,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  $ordersJoin
         |), ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY country ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY country) AS BIGINT) AS n
         |  FROM oc
         |), quart AS (
         |  SELECT country AS q_country,
         |    MIN(CASE WHEN rn = greatest(1, CAST(ceil(n * 0.25) AS BIGINT)) THEN cents END) AS q1_cents,
         |    MIN(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN cents END) AS q3_cents
         |  FROM ranked GROUP BY 1
         |), bounds AS (
         |  SELECT q_country, q1_cents, q3_cents,
         |    CAST(q1_cents AS DOUBLE) - 1.5 * (q3_cents - q1_cents) AS lower_cents,
         |    CAST(q3_cents AS DOUBLE) + 1.5 * (q3_cents - q1_cents) AS upper_cents
         |  FROM quart
         |)
         |SELECT o_orderkey, country, o_totalprice,
         |  CAST(q1_cents AS DOUBLE) / 100.0 AS q1_price,
         |  CAST(q3_cents AS DOUBLE) / 100.0 AS q3_price,
         |  lower_cents / 100.0 AS lower_bound,
         |  upper_cents / 100.0 AS upper_bound,
         |  CAST(cents AS DOUBLE) < lower_cents OR CAST(cents AS DOUBLE) > upper_cents AS is_iqr_outlier
         |FROM oc JOIN bounds ON country = q_country""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS keeper_doc_id, MAX(doc_id) AS max_doc_id
        |FROM documents GROUP BY 1""".stripMargin,

    "dup_spans" -> graft.dedup.DupSpans.dupSpansOracle,
    "span_removal" -> graft.dedup.DupSpans.spanRemovalOracle,
    "incremental_dedup" -> graft.dedup.IncrementalDedup.incrementalDedupOracle,
    "incremental_neardup" -> graft.dedup.IncrementalDedup.incrementalNearDupOracle,
    "semdedup" -> graft.dedup.SemDeDup.semDedupOracle(),
    "semdedup_incremental" -> graft.dedup.SemDeDup.semDedupIncrementalOracle(),
    "ann_pq" -> graft.ann.Pq.annPqOracle(),
    "ann_ivfpq" -> graft.ann.IvfPq.ivfPqOracle(),
    // the persisted-index path is bit-identical to the inline fit by
    // contract (IvfPqSpec), so it rides the same replay
    "ann_ivfpq_indexed" -> graft.ann.IvfPq.ivfPqOracle(),
    "ann_ivfpq_append" -> graft.ann.IvfPq.ivfPqAppendOracle(),
    // batch-independent assign-only appends: the streaming replay rides
    // the two-batch append oracle verbatim
    "streaming_ivfpq_append_replay" -> graft.ann.IvfPq.ivfPqAppendOracle(),
    // index contents are the deterministic fit, so the persisted path
    // replays the identical oracle
    "ann_pq_indexed" -> graft.ann.Pq.annPqOracle(),
    // stream/batch parity (id-ordered micro-batches) makes the streaming
    // sink's decisions equal the whole-batch detector's bit-for-bit, so
    // the replay rides the batch oracle
    "streaming_neardup_replay" -> graft.dedup.IncrementalDedup.incrementalNearDupOracle,

    "text_stats" ->
      s"""WITH t AS (
         |  SELECT *, string_split_regex(lower(trim(text)), '\\s+') AS toks,
         |    CAST(length(text) AS BIGINT) AS n_chars_calc,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) END AS n_tokens
         |  FROM documents
         |), s AS (
         |  SELECT *,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE CAST(len(list_distinct(toks)) AS BIGINT) END AS n_unique_tokens,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS nonspace_chars,
         |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS punct_count,
         |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digit_count,
         |    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS upper_count,
         |    CAST(len(list_filter(toks, x -> x IN (${sqlList(enStop)}))) AS BIGINT) AS stopword_count
         |  FROM t
         |)
         |SELECT doc_id, lang, source, n_chars_calc, n_tokens, n_unique_tokens, nonspace_chars,
         |  CASE WHEN n_tokens = 0 THEN NULL ELSE CAST(nonspace_chars AS DOUBLE) / n_tokens END AS avg_token_len,
         |  punct_count, digit_count, upper_count, stopword_count,
         |  CASE WHEN n_tokens = 0 THEN NULL ELSE CAST(stopword_count AS DOUBLE) / n_tokens END AS stopword_ratio,
         |  LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
         |    + CASE WHEN n_tokens = 0 THEN 0.0
         |           ELSE LEAST(1.0, 4.0 * stopword_count / n_tokens) * 0.5 END AS quality_score
         |FROM s""".stripMargin,

    "curation_keep" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) END AS n_tokens
         |  FROM documents
         |), h AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(len(list_filter(toks, x -> x IN (${sqlList(enStop)}))) AS BIGINT) AS sw
         |  FROM t
         |), q AS (
         |  SELECT doc_id, n_tokens,
         |    LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
         |      + CASE WHEN n_tokens = 0 THEN 0.0
         |             ELSE LEAST(1.0, 4.0 * sw / n_tokens) * 0.5 END AS quality_score
         |  FROM h
         |), r AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) AS BIGINT) AS quality_rank,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS n
         |  FROM q
         |)
         |SELECT doc_id, n_tokens, quality_score, quality_rank,
         |  quality_rank <= CAST(ceil(n * 0.5) AS BIGINT) AS is_kept
         |FROM r""".stripMargin,

    "token_histogram" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) END AS n_tokens
        |  FROM documents
        |), b AS (
        |  SELECT *, CAST(1 + CAST(n_tokens > 25 AS INT) + CAST(n_tokens > 50 AS INT)
        |    + CAST(n_tokens > 75 AS INT) AS BIGINT) AS bucket
        |  FROM t
        |)
        |SELECT bucket, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
        |FROM b GROUP BY 1""".stripMargin,

    "token_counts" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_calc,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) END AS ws_tokens,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
        |    CAST(floor(length(text) / 4.0) AS BIGINT) AS est_tokens_chars_div4
        |  FROM documents
        |)
        |SELECT doc_id, n_chars_calc, ws_tokens, bpe_tokens,
        |  CASE WHEN bpe_tokens = 0 THEN NULL
        |       ELSE CAST(n_chars_calc AS DOUBLE) / bpe_tokens END AS chars_per_bpe_token,
        |  est_tokens_chars_div4
        |FROM b""".stripMargin,

    "lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents
         |), h AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(toks, x -> x IN (${sqlList(enStop)}))) AS BIGINT) AS en_hits,
         |    CAST(len(list_filter(toks, x -> x IN (${sqlList(esStop)}))) AS BIGINT) AS es_hits,
         |    CAST(len(list_filter(toks, x -> x IN (${sqlList(frStop)}))) AS BIGINT) AS fr_hits,
         |    CAST(len(list_filter(toks, x -> x IN (${sqlList(deStop)}))) AS BIGINT) AS de_hits
         |  FROM t
         |)
         |SELECT doc_id, lang, en_hits, es_hits, fr_hits, de_hits,
         |  en_hits + es_hits + fr_hits + de_hits AS total_hits,
         |  CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
         |       WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
         |       WHEN fr_hits >= de_hits THEN 'fr'
         |       ELSE 'de' END AS predicted_lang,
         |  CASE WHEN en_hits + es_hits + fr_hits + de_hits = 0 THEN 0.0
         |       ELSE CAST(greatest(en_hits, es_hits, fr_hits, de_hits) AS DOUBLE)
         |            / (en_hits + es_hits + fr_hits + de_hits) END AS confidence,
         |  (CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
         |        WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
         |        WHEN fr_hits >= de_hits THEN 'fr'
         |        ELSE 'de' END) = lang AS is_match
         |FROM h""".stripMargin,

    // top-k corpus vocabulary with doc frequencies + mass shares
    "vocab_topk" -> graft.text.TextOps.vocabTopKOracle(),
    "bpe_vocab" -> graft.text.Bpe.bpeMergesOracle(),
    "bpe_encode" -> graft.text.Bpe.bpeEncodeOracle(),
    "ngram_perplexity" -> graft.text.Perplexity.perplexityOracle,
    "entity_resolution" -> graft.operators.EntityRes.resolvePartsOracle(),
    "entity_resolution_multipass" ->
      graft.operators.EntityRes.resolvePartsMultipassOracle(),
    "event_funnel" -> graft.operators.Funnel.eventFunnelOracle,
    // batch-boundary invariance (ts-ordered ingest + monotone min state)
    // lets the streaming replay ride the batch oracle verbatim
    "streaming_funnel_replay" -> graft.operators.Funnel.eventFunnelOracle,
    "event_attribution" -> graft.operators.Funnel.attributionOracle,
    "graph_pagerank" -> graft.operators.GraphOps.pageRankOracle(),
    "graph_pagerank_incremental" ->
      graft.operators.GraphOps.pageRankIncrementalOracle(),
    "dsir_selection" -> graft.text.Dsir.dsirSelectionOracle(),
    "tfidf_topterms" -> graft.text.TextOps.tfidfTopTermsOracle(),
    "doc_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |      i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])) END AS grams
        |  FROM t
        |)
        |SELECT doc_id,
        |  list_aggregate(list_transform(grams, x -> md5(x)), 'min') AS fingerprint_min,
        |  list_aggregate(list_transform(grams, x -> md5(x)), 'max') AS fingerprint_max,
        |  CASE WHEN grams IS NULL THEN NULL
        |       ELSE CAST(len(list_distinct(grams)) AS BIGINT) END AS n_distinct_grams
        |FROM g""".stripMargin,

    "sales_summary" ->
      s"""SELECT n_name AS country,
         |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
         |  COUNT(*) AS total_lines,
         |  COUNT(DISTINCT l_orderkey) AS total_orders,
         |  ${d6(revDec)} AS total_revenue,
         |  ${d6(qtyDec)} AS total_quantity,
         |  COUNT(DISTINCT o_custkey) AS unique_customers,
         |  COUNT(DISTINCT l_partkey) AS unique_products,
         |  ${d6(revDec)} / COUNT(*) AS avg_line_value,
         |  ${d6(revDec)} / COUNT(DISTINCT o_custkey) AS revenue_per_customer
         |$salesJoin
         |GROUP BY 1, 2, 3""".stripMargin,

    "product_analysis" ->
      s"""SELECT p_partkey, p_name, p_brand, n_name AS country,
         |  ${d6(qtyDec)} AS total_quantity,
         |  COUNT(*) AS transaction_count,
         |  COUNT(DISTINCT o_custkey) AS unique_customers,
         |  ${d6(revDec)} AS total_revenue,
         |  ${d6("SUM(CAST(l_extendedprice AS DECIMAL(18,6)))")} / COUNT(*) AS avg_extended_price,
         |  ${d6(revDec)} / COUNT(*) AS revenue_per_transaction,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY n_name
         |    ORDER BY ${d6(revDec)} DESC, p_partkey) AS BIGINT) AS revenue_rank_in_country
         |$salesJoin
         |JOIN part ON l_partkey = p_partkey
         |GROUP BY 1, 2, 3, 4""".stripMargin,

    "rfm_segments" -> rfmSql,

    "rfm_segment_rollup" ->
      s"""WITH rfm AS (
         |$rfmSql
         |), a AS (SELECT MAX(last_purchase) AS ref_date FROM rfm),
         |r2 AS (
         |  SELECT customer_id, customer_segment, total_spent, transaction_count,
         |    CAST(recency_score + frequency_score + monetary_score AS BIGINT) AS score3,
         |    -- "asof" is a DuckDB parser keyword (ASOF JOIN) — don't name a column that
         |    CAST(date_diff('day', last_purchase, ref_date) AS BIGINT) AS days_since
         |  FROM rfm CROSS JOIN a
         |), ranked AS (
         |  SELECT *,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY customer_segment ORDER BY total_spent, customer_id) AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY customer_segment) AS BIGINT) AS n
         |  FROM r2
         |), agg AS (
         |  SELECT customer_segment, n AS customer_count,
         |    SUM(CAST(total_spent AS DECIMAL(18,6))) AS rev,
         |    CAST(SUM(transaction_count) AS BIGINT) AS txn,
         |    CAST(SUM(score3) AS BIGINT) AS s3,
         |    CAST(SUM(CASE WHEN days_since <= 180 THEN 1 ELSE 0 END) AS BIGINT) AS active_180d,
         |    CAST(SUM(CASE WHEN days_since <= 365 THEN 1 ELSE 0 END) AS BIGINT) AS active_365d,
         |    MIN(CASE WHEN rn = (n + 1) // 2 THEN total_spent END) AS median_customer_value
         |  FROM ranked GROUP BY 1, 2
         |)
         |SELECT customer_segment, customer_count,
         |  ${d6("rev")} AS segment_revenue,
         |  ${d6("rev")} / CAST(customer_count AS DOUBLE) AS avg_customer_value,
         |  CAST(txn AS DOUBLE) / CAST(customer_count AS DOUBLE) AS avg_transactions,
         |  CAST(s3 AS DOUBLE) / (3.0 * CAST(customer_count AS DOUBLE)) AS avg_value_score,
         |  active_180d, active_365d, median_customer_value
         |FROM agg""".stripMargin,

    "daily_metrics" ->
      s"""WITH d AS (
         |  SELECT CAST(o_orderdate AS DATE) AS order_date, n_name AS country,
         |    ${d6(priceDec)} AS daily_revenue,
         |    COUNT(*) AS daily_transactions,
         |    COUNT(DISTINCT o_custkey) AS unique_customers,
         |    ${d6(priceDec)} / COUNT(*) AS avg_order_value
         |  $ordersJoin
         |  GROUP BY 1, 2
         |)
         |SELECT *,
         |  ${d6("(SUM(CAST(daily_revenue AS DECIMAL(18,6))) OVER w)")} AS revenue_7d_sum,
         |  CAST(COUNT(*) OVER w AS BIGINT) AS window_days,
         |  ${d6("(SUM(CAST(daily_revenue AS DECIMAL(18,6))) OVER w)")}
         |    / CAST(COUNT(*) OVER w AS BIGINT) AS revenue_7d_avg,
         |  dayname(order_date) AS day_of_week,
         |  isodow(order_date) IN (6, 7) AS is_weekend
         |FROM d
         |WINDOW w AS (PARTITION BY country ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "rollup_sales" ->
      s"""SELECT r_name AS region, n_name AS country,
        |  COUNT(*) AS orders,
        |  ${d6(priceDec)} AS revenue,
        |  CAST(GROUPING(r_name) AS BIGINT) AS is_region_total,
        |  CAST(GROUPING(n_name) AS BIGINT) AS is_country_total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,

    "cohort_analysis" ->
      s"""WITH f AS (
        |  SELECT o_custkey AS fp_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_purchase_date
        |  FROM orders GROUP BY 1
        |)
        |SELECT strftime(first_purchase_date, '%Y-%m') AS cohort_month,
        |  CAST((year(CAST(o_orderdate AS DATE)) - year(first_purchase_date)) * 12
        |    + (month(CAST(o_orderdate AS DATE)) - month(first_purchase_date)) AS BIGINT) AS period_number,
        |  COUNT(DISTINCT o_custkey) AS customers,
        |  ${d6(priceDec)} AS revenue,
        |  COUNT(*) AS orders
        |FROM orders JOIN f ON o_custkey = fp_custkey
        |GROUP BY 1, 2""".stripMargin,

    "silver_clean" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS total_amount,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(month(l_shipdate) AS BIGINT) AS ship_month,
        |  CAST(quarter(l_shipdate) AS BIGINT) AS ship_quarter,
        |  dayname(CAST(l_shipdate AS DATE)) AS ship_day_of_week,
        |  CAST((CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END
        |      + CASE WHEN l_partkey IS NOT NULL THEN 1 ELSE 0 END
        |      + CASE WHEN l_suppkey IS NOT NULL THEN 1 ELSE 0 END
        |      + CASE WHEN l_quantity IS NOT NULL THEN 1 ELSE 0 END
        |      + CASE WHEN l_extendedprice IS NOT NULL THEN 1 ELSE 0 END
        |      + CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END
        |      + CASE WHEN l_returnflag IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 7.0 AS completeness_score,
        |  completeness_score >= 0.8 AS is_high_quality
        |FROM lineitem
        |WHERE l_quantity > 0 AND l_extendedprice >= 0 AND l_orderkey IS NOT NULL
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey
        |  ORDER BY l_shipdate DESC, l_linenumber DESC) = 1""".stripMargin,

    "dq_profile" ->
      s"""SELECT COUNT(*) AS total_records,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_orderkey,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_custkey,
        |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_orderstatus,
        |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_totalprice,
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_orderdate,
        |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS distinct_customers,
        |  COUNT(DISTINCT o_orderstatus) AS distinct_statuses,
        |  MIN(o_totalprice) AS min_totalprice,
        |  MAX(o_totalprice) AS max_totalprice,
        |  ${d6(priceDec)} / COUNT(*) AS avg_totalprice,
        |  CAST((COUNT(o_orderkey) + COUNT(o_custkey) + COUNT(o_orderstatus) + COUNT(o_totalprice)
        |    + COUNT(o_orderdate) + COUNT(o_orderpriority)) AS DOUBLE) / (COUNT(*) * 6) AS completeness
        |FROM orders""".stripMargin,

    "corr_matrix" -> graft.operators.Stats.corrMatrixOracle,
    "corr_significance" -> graft.operators.Stats.corrSignificanceOracle,
    "corr_clusters" -> graft.operators.Stats.corrClustersOracle,

    "trend_detection" -> graft.operators.Stats.trendDetectionOracle,

    "descriptive_stats" -> graft.operators.Stats.descriptiveStatsOracle,

    "stationarity_check" -> graft.operators.Stats.stationarityOracle,

    "feature_matrix" -> graft.operators.FeatureEng.customerFeaturesOracle,

    "exec_kpis" -> graft.operators.ExecKpis.revenueKpisOracle,

    "churn_risk" -> graft.operators.Churn.churnRiskOracle,
    "customer_clv" -> graft.operators.Churn.customerClvOracle,

    "change_points" -> graft.operators.TimeSeries.changePointsOracle,
    "anomalous_periods" -> graft.operators.TimeSeries.anomalousPeriodsOracle,
    "seasonality_check" -> graft.operators.TimeSeries.seasonalityCheckOracle,
    "normality_check" -> graft.operators.Stats.normalityCheckOracle,
    "dagostino_check" -> graft.operators.Stats.dagostinoCheckOracle,

    "vault_model" -> graft.operators.Vault.vaultModelOracle,
    "vault_integrity" -> graft.operators.Vault.vaultIntegrityOracle,
    "referential_integrity" -> graft.operators.Integrity.referentialIntegrityOracle,
    "partition_advice" -> graft.operators.PartitionAdvisor.partitionAdviceOracle,
    "behavioral_analytics" -> graft.operators.Behavior.behavioralAnalyticsOracle,

    "distribution_profile" -> graft.operators.Stats.distributionProfileOracle,
    "ab_test_results" -> graft.operators.Experiment.abTestResultsOracle,

    "pii_scan" -> graft.text.Dlp.piiScanOracle,
    "pii_redact" -> graft.text.Dlp.piiRedactOracle,

    "training_matrix" -> graft.operators.FeatureStore.trainingMatrixOracle,

    "quality_trends" -> graft.operators.Monitoring.qualityTrendsOracle,
    "subject_erasure" -> graft.operators.Monitoring.subjectErasureOracle,

    "operational_kpis" -> graft.operators.Views.operationalKpisOracle,
    "financial_kpis" -> graft.operators.Views.financialKpisOracle,
    "daily_sales_kpi" -> graft.operators.Views.dailySalesKpiOracle,
    "anomaly_kpis" -> graft.operators.Views.anomalyKpisOracle,
    "realtime_metrics" -> graft.operators.Views.realtimeMetricsOracle,
    "quality_scorecard" -> graft.operators.QualityScore.scorecardOracle,
    "sales_forecast" -> graft.operators.Forecast.salesForecastOracle,
    "doc_chunks" -> graft.text.Chunking.docChunksOracle,
    "chunk_embeddings" -> graft.text.Chunking.chunkEmbeddingsOracle,

    "customer_segments" -> graft.operators.Segments.customerSegmentsOracle,

    "enriched_sales" -> graft.operators.Enrichment.enrichedSalesOracle,

    "validation_report" -> graft.operators.Validation.validationReportOracle,
    "suggested_rules" -> graft.operators.Validation.suggestedRulesOracle(),

    // identical result by construction — bucketing is a physical layout choice
    "fact_join_shuffled" -> factJoinRollup,
    "fact_join_bucketed" -> factJoinRollup,

    "incremental_events" ->
      """WITH s AS (
        |  SELECT event_id, user_id, event_type, ts
        |  FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
        |), wm AS (
        |  SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS new_watermark FROM s
        |)
        |SELECT event_id, user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts, new_watermark
        |FROM s CROSS JOIN wm""".stripMargin,

    "snapshot_diff" ->
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
        |), cur AS (
        |  SELECT c_custkey,
        |    md5(concat_ws(chr(1), coalesce(CAST(c_mktsegment AS VARCHAR), chr(2)),
        |                          coalesce(CAST(c_nationkey AS VARCHAR), chr(2)))) AS current_hash
        |  FROM base WHERE c_custkey % 10 <> 3
        |), inc0 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'UPGRADED' ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 11 = 0 THEN CAST((c_nationkey + 1) % 25 AS INTEGER)
        |         ELSE c_nationkey END AS c_nationkey
        |  FROM base WHERE c_custkey % 10 <> 7
        |), inc AS (
        |  SELECT c_custkey,
        |    md5(concat_ws(chr(1), coalesce(CAST(c_mktsegment AS VARCHAR), chr(2)),
        |                          coalesce(CAST(c_nationkey AS VARCHAR), chr(2)))) AS incoming_hash
        |  FROM inc0
        |)
        |SELECT coalesce(cur.c_custkey, inc.c_custkey) AS c_custkey,
        |  current_hash, incoming_hash,
        |  CASE WHEN current_hash IS NULL THEN 'insert'
        |       WHEN incoming_hash IS NULL THEN 'delete'
        |       WHEN current_hash <> incoming_hash THEN 'update'
        |       ELSE 'no_change' END AS change_type
        |FROM cur FULL OUTER JOIN inc ON cur.c_custkey = inc.c_custkey""".stripMargin,

    "scd2_merge" ->
      """WITH base AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
        |), cur AS (
        |  SELECT *, DATE '1995-01-01' AS effective_date FROM base WHERE c_custkey % 10 <> 3
        |), inc AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 11 = 0 THEN CAST((c_nationkey + 1) % 25 AS INTEGER)
        |         ELSE c_nationkey END AS c_nationkey,
        |    c_acctbal,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'UPGRADED' ELSE c_mktsegment END AS c_mktsegment
        |  FROM base WHERE c_custkey % 10 <> 7
        |), j AS (
        |  SELECT c.c_custkey AS ck, c.c_name AS cn, c.c_nationkey AS cnk, c.c_acctbal AS cab,
        |         c.c_mktsegment AS cseg, c.effective_date AS ceff,
        |         i.c_custkey AS ik, i.c_name AS inm, i.c_nationkey AS ink, i.c_acctbal AS iab,
        |         i.c_mktsegment AS iseg,
        |         (c.c_mktsegment IS DISTINCT FROM i.c_mktsegment
        |          OR c.c_nationkey IS DISTINCT FROM i.c_nationkey) AS chg
        |  FROM cur c FULL OUTER JOIN inc i ON c.c_custkey = i.c_custkey
        |)
        |SELECT ck AS c_custkey, cn AS c_name, cnk AS c_nationkey, cab AS c_acctbal,
        |  cseg AS c_mktsegment, ceff AS effective_date, DATE '9999-12-31' AS end_date,
        |  TRUE AS is_current, 'unchanged' AS change_type
        |FROM j WHERE ck IS NOT NULL AND ik IS NOT NULL AND NOT chg
        |UNION ALL
        |SELECT ck, cn, cnk, cab, cseg, ceff, DATE '1998-01-01', FALSE, 'closed'
        |FROM j WHERE ck IS NOT NULL AND ik IS NOT NULL AND chg
        |UNION ALL
        |SELECT ik, inm, ink, iab, iseg, DATE '1998-01-01', DATE '9999-12-31', TRUE, 'new_version'
        |FROM j WHERE ck IS NOT NULL AND ik IS NOT NULL AND chg
        |UNION ALL
        |SELECT ik, inm, ink, iab, iseg, DATE '1998-01-01', DATE '9999-12-31', TRUE, 'insert'
        |FROM j WHERE ck IS NULL
        |UNION ALL
        |SELECT ck, cn, cnk, cab, cseg, ceff, DATE '1998-01-01', FALSE, 'delete'
        |FROM j WHERE ik IS NULL
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, 'LEGACY',
        |  DATE '1992-01-01', DATE '1995-01-01', FALSE, 'history'
        |FROM base WHERE c_custkey % 20 = 1""".stripMargin,

    "scd2_customer" ->
      """WITH b AS (
        |  SELECT o_custkey AS customer_id, o_orderkey,
        |    CAST(o_orderdate AS DATE) AS valid_from,
        |    md5(concat_ws('|', o_orderstatus, o_orderpriority)) AS attribute_hash
        |  FROM orders
        |)
        |SELECT customer_id, o_orderkey, valid_from, attribute_hash,
        |  LAG(attribute_hash) OVER w AS prev_hash,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
        |  (ROW_NUMBER() OVER wd) = 1 AS is_current,
        |  CASE WHEN (ROW_NUMBER() OVER wd) = 1 THEN NULL
        |       ELSE LEAD(valid_from) OVER w END AS valid_to,
        |  CASE WHEN LAG(attribute_hash) OVER w IS NULL THEN 'insert'
        |       WHEN LAG(attribute_hash) OVER w <> attribute_hash THEN 'update'
        |       ELSE 'no_change' END AS change_type
        |FROM b
        |WINDOW w AS (PARTITION BY customer_id ORDER BY valid_from, o_orderkey),
        |       wd AS (PARTITION BY customer_id ORDER BY valid_from DESC, o_orderkey DESC)""".stripMargin,

    "running_totals" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |    OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
        |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
        |  LAG(o_totalprice) OVER w AS prev_amount,
        |  LEAD(o_totalprice) OVER w AS next_amount,
        |  CAST(date_diff('day', LAG(CAST(o_orderdate AS DATE)) OVER w,
        |    CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev,
        |  CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS amount_rank,
        |  PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS amount_pct
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)""".stripMargin,

    "pivot_priority" -> {
      val cases = Seq(
        "urgent" -> "1-URGENT", "high" -> "2-HIGH", "medium" -> "3-MEDIUM",
        "not_specified" -> "4-NOT SPECIFIED", "low" -> "5-LOW")
      val cols = cases.map { case (a, p) =>
        s"""COALESCE(${d6(s"SUM(CASE WHEN o_orderpriority = '$p' THEN CAST(o_totalprice AS DECIMAL(18,6)) END)")}, 0.0) AS ${a}_revenue"""
      }.mkString(",\n  ")
      s"""SELECT n_name AS country,
         |  $cols,
         |  urgent_revenue + high_revenue + medium_revenue + not_specified_revenue + low_revenue AS total_revenue
         |$ordersJoin
         |GROUP BY 1""".stripMargin
    },

    "dim_date" ->
      """WITH span AS (
        |  SELECT MIN(CAST(o_orderdate AS DATE)) AS mn, MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders
        |), days AS (
        |  SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM span
        |)
        |SELECT CAST(year(d) * 10000 + month(d) * 100 + day(d) AS BIGINT) AS date_key,
        |  d AS date,
        |  CAST(year(d) AS BIGINT) AS year, CAST(quarter(d) AS BIGINT) AS quarter,
        |  CAST(month(d) AS BIGINT) AS month, CAST(day(d) AS BIGINT) AS day,
        |  dayname(d) AS day_name, monthname(d) AS month_name,
        |  isodow(d) IN (6, 7) AS is_weekend,
        |  date_trunc('month', d) AS first_day_of_month
        |FROM days""".stripMargin,

    "fact_sales" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  md5(CAST(o_custkey AS VARCHAR)) AS customer_sk,
        |  md5(CAST(l_partkey AS VARCHAR)) AS part_sk,
        |  md5(CAST(l_suppkey AS VARCHAR)) AS supplier_sk,
        |  CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100 + day(o_orderdate) AS BIGINT) AS date_key,
        |  n_name AS country, r_name AS region, c_mktsegment,
        |  p_brand, s_name, o_orderpriority,
        |  l_quantity, l_extendedprice,
        |  l_extendedprice * l_discount AS discount_amount,
        |  l_extendedprice * (1 - l_discount) AS net_revenue,
        |  l_extendedprice * (1 - l_discount) * l_tax AS tax_amount
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey""".stripMargin,

    "events_windowed" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type,
        |  COUNT(*) AS events_count,
        |  COUNT(DISTINCT user_id) AS unique_users,
        |  ${d6(valDec)} AS total_value,
        |  ${d6(valDec)} / COUNT(*) AS avg_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "events_sessions" ->
      s"""WITH x AS (
        |  SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
        |      OR date_diff('second', LAG(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM x
        |)
        |SELECT user_id, session_seq,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_seconds,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT event_type) AS distinct_event_types,
        |  ${d6(valDec)} AS total_value
        |FROM s
        |GROUP BY 1, 2""".stripMargin,

    "drift_check" -> {
      val edgeCols = (1 to 9).map(k =>
        s"MIN(CASE WHEN rnk = CAST(ceil(n * 0.$k) AS BIGINT) THEN cents END) AS e$k").mkString(",\n  ")
      val binExpr = (1 to 9).map(i => s"CAST(cents > e$i AS INT)").mkString(" + ")
      s"""WITH oc AS (
         |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         |    CASE WHEN year(o_orderdate) <= 1997 THEN 'ref' ELSE 'cur' END AS period
         |  FROM orders
         |), ranked AS (
         |  SELECT cents, CAST(ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS rnk,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS n
         |  FROM oc WHERE period = 'ref'
         |), edges AS (
         |  SELECT $edgeCols
         |  FROM ranked
         |), binned AS (
         |  SELECT oc.*, CAST(1 + $binExpr AS BIGINT) AS bin
         |  FROM oc CROSS JOIN edges
         |), counts AS (
         |  SELECT bin,
         |    CAST(SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
         |    CAST(SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cur_n
         |  FROM binned GROUP BY 1
         |), tot AS (
         |  SELECT *, CAST(SUM(ref_n) OVER () AS BIGINT) AS ref_total,
         |    CAST(SUM(cur_n) OVER () AS BIGINT) AS cur_total
         |  FROM counts
         |), sh AS (
         |  SELECT *, CAST(ref_n AS DOUBLE) / ref_total AS ref_share,
         |    CAST(cur_n AS DOUBLE) / cur_total AS cur_share
         |  FROM tot
         |)
         |SELECT bin, ref_n, cur_n, ref_total, cur_total, ref_share, cur_share,
         |  abs(cur_share - ref_share) AS abs_diff,
         |  0.5 * abs(cur_share - ref_share) AS tvd_contrib,
         |  CASE WHEN ref_n = 0 THEN NULL
         |       ELSE ((cur_share - ref_share) * (cur_share - ref_share)) / ref_share END AS chi2_contrib
         |FROM sh""".stripMargin
    },

    "mad_outliers" ->
      s"""WITH oc AS (
         |  SELECT o_orderkey, n_name AS country, o_totalprice,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  $ordersJoin
         |), r1 AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY country ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY country) AS BIGINT) AS n
         |  FROM oc
         |), med AS (
         |  SELECT country AS m_country,
         |    MIN(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med_cents
         |  FROM r1 GROUP BY 1
         |), dev AS (
         |  SELECT oc.*, med_cents, abs(cents - med_cents) AS absdev
         |  FROM oc JOIN med ON country = m_country
         |), r2 AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY country ORDER BY absdev, o_orderkey) AS BIGINT) AS rn2,
         |    CAST(COUNT(*) OVER (PARTITION BY country) AS BIGINT) AS n
         |  FROM dev
         |), mad AS (
         |  SELECT country AS d_country, med_cents,
         |    MIN(CASE WHEN rn2 = (n + 1) // 2 THEN absdev END) AS mad_cents
         |  FROM r2 GROUP BY 1, 2
         |)
         |SELECT o_orderkey, country, o_totalprice,
         |  CAST(med_cents AS DOUBLE) / 100.0 AS median_price,
         |  CAST(mad_cents AS DOUBLE) / 100.0 AS mad_price,
         |  CASE WHEN mad_cents = 0 THEN NULL
         |       ELSE (0.6745 * CAST(cents - med_cents AS DOUBLE)) / CAST(mad_cents AS DOUBLE) END AS modified_z,
         |  abs(CASE WHEN mad_cents = 0 THEN NULL
         |       ELSE (0.6745 * CAST(cents - med_cents AS DOUBLE)) / CAST(mad_cents AS DOUBLE) END) > 3.5 AS is_mad_outlier
         |FROM oc JOIN mad ON country = d_country""".stripMargin,

    "rare_categories" ->
      """WITH g AS (
        |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1, 2
        |)
        |SELECT o_orderpriority, o_orderstatus, n,
        |  CAST(SUM(n) OVER () AS BIGINT) AS total,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS BIGINT) AS share,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS BIGINT) < 0.02 AS is_rare
        |FROM g""".stripMargin,

    "date_gaps" ->
      """WITH span AS (
        |  SELECT MIN(CAST(o_orderdate AS DATE)) AS mn, MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders
        |), days AS (
        |  SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS missing_date FROM span
        |)
        |SELECT missing_date, dayname(missing_date) AS day_name,
        |  isodow(missing_date) IN (6, 7) AS is_weekend
        |FROM days
        |WHERE missing_date NOT IN (SELECT DISTINCT CAST(o_orderdate AS DATE) FROM orders)""".stripMargin,

    "events_json" ->
      """WITH e AS (
        |  SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events
        |)
        |SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(k) AS BIGINT) AS k_sum, MIN(k) AS k_min, MAX(k) AS k_max,
        |  CAST(CAST(SUM(k) AS BIGINT) AS DOUBLE) / COUNT(*) AS k_avg
        |FROM e GROUP BY 1""".stripMargin,

    "cdc_apply" ->
      """WITH ch AS (
        |  SELECT *,
        |    CASE WHEN o_orderstatus = 'O' THEN 'I'
        |         WHEN o_orderstatus = 'F' THEN 'U' ELSE 'D' END AS op,
        |    CAST(o_orderdate AS DATE) AS change_date
        |  FROM orders
        |), latest AS (
        |  SELECT * FROM ch
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY change_date DESC, o_orderkey DESC) = 1
        |)
        |SELECT o_custkey AS customer_id, op AS last_op, o_orderkey AS last_orderkey,
        |  change_date AS last_change_date, o_totalprice AS last_totalprice,
        |  o_orderpriority AS last_priority
        |FROM latest WHERE op <> 'D'""".stripMargin,

    // identical semantics through the native custom-plan operator — same oracle
    "asof_native" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM orders
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |    ORDER BY o_orderkey DESC) = 1
        |)
        |SELECT event_id, user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        |  o_orderkey AS matched_o_orderkey,
        |  o_totalprice AS matched_o_totalprice,
        |  CAST(o_orderdate AS DATE) AS matched_order_date
        |FROM events ASOF LEFT JOIN o
        |  ON user_id = o_custkey AND ts >= o_orderdate""".stripMargin,

    "asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM orders
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |    ORDER BY o_orderkey DESC) = 1
        |)
        |SELECT event_id, user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        |  o_orderkey AS matched_o_orderkey,
        |  o_totalprice AS matched_o_totalprice,
        |  CAST(o_orderdate AS DATE) AS matched_order_date
        |FROM events ASOF LEFT JOIN o
        |  ON user_id = o_custkey AND ts >= o_orderdate""".stripMargin,

    "time_features" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date FROM orders
        |), r AS (SELECT MAX(order_date) AS ref_date FROM o)
        |SELECT o_orderkey, order_date,
        |  CAST(year(order_date) AS BIGINT) AS order_year,
        |  CAST(month(order_date) AS BIGINT) AS order_month,
        |  CAST(day(order_date) AS BIGINT) AS order_day,
        |  CAST(isodow(order_date) - 1 AS BIGINT) AS order_weekday,
        |  CAST(quarter(order_date) AS BIGINT) AS order_quarter,
        |  (isodow(order_date) - 1) IN (5, 6) AS is_weekend,
        |  sin(2*pi() * month(order_date) / 12.0) AS month_sin,
        |  cos(2*pi() * month(order_date) / 12.0) AS month_cos,
        |  sin(2*pi() * (isodow(order_date) - 1) / 7.0) AS weekday_sin,
        |  cos(2*pi() * (isodow(order_date) - 1) / 7.0) AS weekday_cos,
        |  CAST(date_diff('day', order_date, ref_date) AS BIGINT) AS days_since
        |FROM o, r""".stripMargin,

    "group_ratio_features" ->
      s"""WITH oc AS (
         |  SELECT o_orderkey, n_name AS country, o_totalprice
         |  $ordersJoin
         |), g AS (
         |  SELECT country AS g_country,
         |    ${d6(priceDec)} / CAST(COUNT(*) AS DOUBLE)
         |      AS country_mean_totalprice,
         |    MAX(o_totalprice) AS country_max_totalprice,
         |    COUNT(*) AS country_orders
         |  FROM oc GROUP BY 1
         |)
         |SELECT o_orderkey, country, o_totalprice,
         |  country_mean_totalprice, country_max_totalprice, country_orders,
         |  o_totalprice / (country_mean_totalprice + 1e-8) AS price_to_country_mean_ratio,
         |  o_totalprice / (country_max_totalprice + 1e-8) AS price_to_country_max_ratio
         |FROM oc JOIN g ON country = g_country""".stripMargin,

    "interaction_features" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity, l_extendedprice, l_discount, l_tax,
        |  l_quantity * l_extendedprice AS quantity_x_extendedprice,
        |  l_quantity * l_discount AS quantity_x_discount,
        |  l_quantity * l_tax AS quantity_x_tax,
        |  l_extendedprice * l_discount AS extendedprice_x_discount,
        |  l_extendedprice * l_tax AS extendedprice_x_tax,
        |  l_discount * l_tax AS discount_x_tax
        |FROM lineitem""".stripMargin,

    "ks_drift" ->
      s"""WITH oc AS (
         |  SELECT n_name AS country,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         |    o_orderdate < TIMESTAMP '1998-01-01' AS is_ref
         |  $ordersJoin
         |), counts AS (
         |  SELECT country, cents,
         |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cnt_ref,
         |    SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS cnt_cur
         |  FROM oc GROUP BY 1, 2
         |), ecdf AS (
         |  SELECT country, cnt_ref, cnt_cur,
         |    CAST(SUM(cnt_ref) OVER (PARTITION BY country ORDER BY cents) AS BIGINT) AS cum_ref,
         |    CAST(SUM(cnt_cur) OVER (PARTITION BY country ORDER BY cents) AS BIGINT) AS cum_cur,
         |    CAST(SUM(cnt_ref) OVER (PARTITION BY country) AS BIGINT) AS n_ref,
         |    CAST(SUM(cnt_cur) OVER (PARTITION BY country) AS BIGINT) AS n_cur
         |  FROM counts
         |), g AS (
         |  SELECT country, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
         |    MAX(abs(CAST(cum_ref AS DOUBLE) / CAST(n_ref AS DOUBLE)
         |          - CAST(cum_cur AS DOUBLE) / CAST(n_cur AS DOUBLE))) AS ks_stat
         |  FROM ecdf GROUP BY 1
         |)
         |SELECT country, n_ref, n_cur,
         |  CASE WHEN n_ref = 0 OR n_cur = 0 THEN NULL ELSE ks_stat END AS ks_stat,
         |  CASE WHEN n_ref = 0 OR n_cur = 0 THEN NULL ELSE ks_stat > 0.1 END AS drift_detected,
         |  CASE WHEN n_ref = 0 OR n_cur = 0 THEN NULL
         |       WHEN ks_stat > 0.2 THEN 'critical'
         |       WHEN ks_stat > 0.15 THEN 'high'
         |       WHEN ks_stat > 0.1 THEN 'medium'
         |       ELSE 'low' END AS severity
         |FROM g""".stripMargin,

    "cat_drift" -> graft.operators.Drift.catDriftOracle,
    "psi_drift" -> graft.operators.Drift.psiDriftOracle,
    "js_drift" -> graft.operators.Drift.jsDriftOracle,
    "prediction_drift" -> graft.operators.Drift.predictionDriftOracle,

    "hash_split" -> graft.text.TrainPrep.hashSplitOracle,
    "class_balance" -> graft.text.TrainPrep.classBalanceOracle,
    "contamination_check" -> graft.text.TrainPrep.contaminationCheckOracle,
    "semantic_contamination" -> graft.text.Decontamination.semanticContaminationOracle(),
    "repetition_filter" -> graft.text.TrainPrep.repetitionFilterOracle,
    "sequence_packing" -> graft.text.TrainPrep.sequencePackingOracle,
    "mixing_weights" -> graft.text.TrainPrep.mixingWeightsOracle,
    "training_shuffle" -> graft.text.TrainPrep.trainingShuffleOracle,
    "temperature_sample" -> graft.text.TrainPrep.temperatureSampleOracle,
    "lm_quality_score" -> graft.text.TrainPrep.lmQualityScoreOracle,
    "curation_funnel" -> graft.text.TrainPrep.curationFunnelOracle,
    "curated_corpus" -> graft.text.TrainPrep.curatedCorpusOracle,
    "corpus_stats" -> graft.text.TrainPrep.corpusStatsOracle,
    "dataset_card" -> graft.text.TrainPrep.datasetCardOracle,
    "stratified_sample" -> graft.text.TrainPrep.stratifiedSampleOracle,
    "hybrid_search" -> graft.text.HybridSearch.hybridSearchOracle,
    "hybrid_search_indexed" -> graft.text.HybridSearch.hybridSearchOracle,
    "hybrid_search_probe" -> graft.text.HybridSearch.hybridSearchProbeOracle,
    // nDCG/RR/P@10 dashboard, integer-scaled harmonic discounts
    "retrieval_metrics" -> graft.text.HybridSearch.retrievalMetricsOracle(),
    // both routes are bit-identical, so the flat oracle gates whichever
    // side of the size threshold the corpus lands on
    "hybrid_search_auto" -> graft.text.HybridSearch.hybridSearchOracle,
    // the streamed index, once every doc has flowed in, answers bit-for-bit
    // what the flat form computes (vecs-only read, same q20 recipe, doc_id
    // dedup across corpus+appends) — same oracle
    "streaming_hybrid_index_replay" -> graft.text.HybridSearch.hybridSearchOracle,

    "table_health" ->
      s"""WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS cnt,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        |  FROM orders GROUP BY 1
        |), a AS (SELECT MAX(d) AS ref_d FROM daily),
        |rc AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN d = ref_d THEN cnt ELSE 0 END) AS BIGINT) AS last_cnt,
        |    CAST(SUM(CASE WHEN d BETWEEN ref_d - 31 AND ref_d - 2 THEN cnt ELSE 0 END) AS BIGINT) AS hist_cnt,
        |    CAST(SUM(CASE WHEN d BETWEEN ref_d - 31 AND ref_d - 2 THEN 1 ELSE 0 END) AS BIGINT) AS hist_days,
        |    SUM(CASE WHEN d = ref_d THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END) AS last_rev,
        |    SUM(CASE WHEN d BETWEEN ref_d - 31 AND ref_d - 2 THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END) AS hist_rev,
        |    CAST(date_diff('day', MIN(d), MAX(d)) + 1 AS BIGINT) AS span_days,
        |    COUNT(*) AS present_days
        |  FROM daily, a
        |), dup AS (
        |  SELECT CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_keys,
        |    COUNT(*) AS total_keys
        |  FROM (SELECT COUNT(*) AS k FROM lineitem GROUP BY l_orderkey, l_linenumber) t
        |), nl AS (
        |  SELECT CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_rows,
        |    COUNT(*) AS total_rows
        |  FROM customer
        |), ea AS (SELECT MAX(ts) AS e_asof FROM events),
        |fr AS (
        |  SELECT CAST(SUM(CASE WHEN ts < e_asof - INTERVAL 24 HOURS THEN 1 ELSE 0 END) AS BIGINT) AS stale_rows,
        |    COUNT(*) AS total_rows
        |  FROM events, ea
        |)
        |SELECT 'orders' AS table_name, 'row_count_anomaly' AS check_name,
        |  CAST(last_cnt AS DOUBLE) AS observed,
        |  CAST(hist_cnt AS DOUBLE) / CAST(hist_days AS DOUBLE) AS expected,
        |  abs(CAST(last_cnt AS DOUBLE) - CAST(hist_cnt AS DOUBLE) / CAST(hist_days AS DOUBLE))
        |    / (CAST(hist_cnt AS DOUBLE) / CAST(hist_days AS DOUBLE)) * 100 AS variance_pct,
        |  abs(CAST(last_cnt AS DOUBLE) - CAST(hist_cnt AS DOUBLE) / CAST(hist_days AS DOUBLE))
        |    / (CAST(hist_cnt AS DOUBLE) / CAST(hist_days AS DOUBLE)) * 100 <= 50 AS passed
        |FROM rc
        |UNION ALL
        |SELECT 'orders', 'revenue_anomaly',
        |  ${d6("last_rev")},
        |  ${d6("hist_rev")} / CAST(hist_days AS DOUBLE),
        |  abs(${d6("last_rev")} - ${d6("hist_rev")} / CAST(hist_days AS DOUBLE))
        |    / (${d6("hist_rev")} / CAST(hist_days AS DOUBLE)) * 100,
        |  abs(${d6("last_rev")} - ${d6("hist_rev")} / CAST(hist_days AS DOUBLE))
        |    / (${d6("hist_rev")} / CAST(hist_days AS DOUBLE)) * 100 <= 30
        |FROM rc
        |UNION ALL
        |SELECT 'orders', 'temporal_consistency',
        |  CAST(span_days - present_days AS DOUBLE),
        |  CAST(span_days AS DOUBLE),
        |  CAST(present_days AS DOUBLE) / CAST(span_days AS DOUBLE) * 100,
        |  span_days - present_days = 0
        |FROM rc
        |UNION ALL
        |SELECT 'lineitem', 'duplicate_records',
        |  CAST(dup_keys AS DOUBLE), CAST(0 AS DOUBLE),
        |  CAST(dup_keys AS DOUBLE) / CAST(total_keys AS DOUBLE) * 100,
        |  dup_keys = 0
        |FROM dup
        |UNION ALL
        |SELECT 'customer', 'null_percentage',
        |  CAST(null_rows AS DOUBLE), CAST(0 AS DOUBLE),
        |  CAST(null_rows AS DOUBLE) / CAST(total_rows AS DOUBLE) * 100,
        |  CAST(null_rows AS DOUBLE) / CAST(total_rows AS DOUBLE) * 100 <= 5
        |FROM nl
        |UNION ALL
        |SELECT 'events', 'data_freshness',
        |  CAST(stale_rows AS DOUBLE), CAST(total_rows AS DOUBLE),
        |  CAST(stale_rows AS DOUBLE) / CAST(total_rows AS DOUBLE) * 100,
        |  total_rows > stale_rows
        |FROM fr""".stripMargin,

    "retention_policy" ->
      s"""WITH o AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, o_totalprice FROM orders
        |), a AS (SELECT MAX(d) AS ref_d FROM o),
        |b AS (
        |  SELECT d, o_totalprice,
        |    CAST(date_diff('day', d, ref_d) AS BIGINT) AS age_days,
        |    CASE WHEN date_diff('day', d, ref_d) <= 730 THEN 'active'
        |         WHEN date_diff('day', d, ref_d) <= 1825 THEN 'archive'
        |         ELSE 'purge' END AS retention_band
        |  FROM o, a
        |), t AS (
        |  SELECT retention_band, COUNT(*) AS row_count,
        |    ${d6(priceDec)} AS revenue,
        |    MIN(d) AS oldest_date, MAX(d) AS newest_date,
        |    MIN(age_days) AS min_age_days, MAX(age_days) AS max_age_days
        |  FROM b GROUP BY 1
        |)
        |SELECT retention_band, row_count, revenue, oldest_date, newest_date,
        |  min_age_days, max_age_days,
        |  CAST(row_count AS DOUBLE) / CAST((SELECT SUM(row_count) FROM t) AS DOUBLE) * 100
        |    AS pct_of_rows
        |FROM t""".stripMargin,

    "lagged_features" ->
      s"""WITH daily AS (
         |  SELECT n_name AS country, CAST(o_orderdate AS DATE) AS day,
         |    ${d6(priceDec)} AS target
         |  $ordersJoin
         |  GROUP BY 1, 2
         |), lagged AS (
         |  SELECT country, day, target,
         |    LAG(target, 1) OVER (PARTITION BY country ORDER BY day) AS lag_1,
         |    LAG(target, 2) OVER (PARTITION BY country ORDER BY day) AS lag_2,
         |    LAG(target, 3) OVER (PARTITION BY country ORDER BY day) AS lag_3,
         |    LAG(target, 4) OVER (PARTITION BY country ORDER BY day) AS lag_4,
         |    LAG(target, 5) OVER (PARTITION BY country ORDER BY day) AS lag_5,
         |    LAG(target, 6) OVER (PARTITION BY country ORDER BY day) AS lag_6,
         |    LAG(target, 7) OVER (PARTITION BY country ORDER BY day) AS lag_7
         |  FROM daily
         |)
         |SELECT * FROM lagged WHERE lag_7 IS NOT NULL""".stripMargin,

    "anomaly_ensemble" -> anomalyEnsembleSql,

    "anomaly_ml" -> graft.ml.MlAnomaly.mlAnomalyOracle(),

    // the 4th-vote composition mirrors Ensemble.anomalyEnsembleMl: the
    // 3-detector composite re-weighted (3·s + ml)/4, one more vote, and the
    // severity ladder re-run on the new score — both legs reuse their own
    // oracles verbatim as subqueries
    "anomaly_ensemble_ml" ->
      s"""SELECT s.o_orderkey, s.country, s.o_totalprice, s.z, s.modified_z,
         |  s.is_iqr_outlier, ml.ml_score, ml.is_ml_anomaly,
         |  (s.ensemble_score * 3.0 + ml.ml_score) / 4.0 AS ensemble_score,
         |  CAST(s.votes + CASE WHEN ml.is_ml_anomaly THEN 1 ELSE 0 END AS BIGINT) AS votes,
         |  s.votes + CASE WHEN ml.is_ml_anomaly THEN 1 ELSE 0 END >= 2 AS is_anomaly,
         |  CASE WHEN (s.ensemble_score * 3.0 + ml.ml_score) / 4.0 >= 0.9 THEN 'critical'
         |       WHEN (s.ensemble_score * 3.0 + ml.ml_score) / 4.0 >= 0.7 THEN 'high'
         |       WHEN (s.ensemble_score * 3.0 + ml.ml_score) / 4.0 >= 0.5 THEN 'medium'
         |       ELSE 'low' END AS severity
         |FROM ($anomalyEnsembleSql) s
         |JOIN (${graft.ml.MlAnomaly.mlAnomalyOracle()}) ml
         |  ON s.o_orderkey = ml.o_orderkey""".stripMargin,

    "business_alerts" ->
      s"""WITH o AS (
        |  SELECT o_custkey, o_totalprice,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS ym
        |  FROM orders
        |), monthly AS (
        |  SELECT ym, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        |  FROM o GROUP BY 1
        |), growth AS (
        |  SELECT ym, 'revenue_growth_rate' AS metric,
        |    (${d6("rev")} - ${d6("(LAG(rev, 1) OVER (ORDER BY ym))")})
        |      / ${d6("(LAG(rev, 1) OVER (ORDER BY ym))")} AS value
        |  FROM monthly
        |  QUALIFY LAG(rev, 1) OVER (ORDER BY ym) IS NOT NULL
        |), g2 AS (
        |  SELECT ym, metric, value,
        |    CASE WHEN value <= -0.20 THEN 'emergency'
        |         WHEN value <= -0.10 THEN 'critical'
        |         WHEN value <= -0.05 THEN 'warning'
        |         ELSE 'ok' END AS severity
        |  FROM growth
        |), active AS (
        |  SELECT DISTINCT o_custkey, ym FROM o
        |), prev_counts AS (
        |  SELECT ym, COUNT(*) AS prev_buyers FROM active GROUP BY 1
        |), retained AS (
        |  SELECT p.ym AS prev_ym, COUNT(*) AS retained_buyers
        |  FROM active p JOIN active c
        |    ON p.o_custkey = c.o_custkey AND c.ym = p.ym + 1
        |  GROUP BY 1
        |), r2 AS (
        |  SELECT pc.ym + 1 AS ym, 'customer_retention_rate' AS metric,
        |    CAST(coalesce(retained_buyers, 0) AS DOUBLE) / CAST(prev_buyers AS DOUBLE) AS value
        |  FROM prev_counts pc
        |  LEFT JOIN retained ON pc.ym = prev_ym
        |  WHERE pc.ym + 1 IN (SELECT ym FROM monthly)
        |), r3 AS (
        |  SELECT ym, metric, value,
        |    CASE WHEN value < 0.65 THEN 'emergency'
        |         WHEN value < 0.75 THEN 'critical'
        |         WHEN value < 0.85 THEN 'warning'
        |         ELSE 'ok' END AS severity
        |  FROM r2
        |), un AS (
        |  SELECT * FROM g2 UNION ALL SELECT * FROM r3
        |)
        |SELECT metric, value, severity,
        |  ym // 12 AS alert_year,
        |  CAST(ym % 12 + 1 AS BIGINT) AS alert_month,
        |  severity <> 'ok' AS is_alert
        |FROM un""".stripMargin,

    "product_features" ->
      """WITH l AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    l_partkey, CAST(l_shipdate AS DATE) AS ship_date,
        |    l_extendedprice, l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_day
        |  FROM lineitem
        |), f AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, ship_date, l_extendedprice,
        |    CAST(COUNT(*) OVER w7 AS BIGINT) AS popularity_7d,
        |    CAST(COUNT(*) OVER w30 AS BIGINT) AS n30,
        |    CAST(SUM(cents) OVER w30 AS BIGINT) AS s30,
        |    CAST(SUM(CAST(cents AS DECIMAL(15,0)) * CAST(cents AS DECIMAL(15,0))) OVER w30 AS BIGINT) AS ss30,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) OVER w7 AS BIGINT) AS returns_7d
        |  FROM l
        |  WINDOW
        |    w7 AS (PARTITION BY l_partkey ORDER BY ship_day RANGE BETWEEN 7 PRECEDING AND CURRENT ROW),
        |    w30 AS (PARTITION BY l_partkey ORDER BY ship_day RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |)
        |SELECT l_orderkey, l_linenumber, l_partkey, ship_date, l_extendedprice,
        |  popularity_7d,
        |  CASE WHEN n30 <= 1 THEN NULL
        |       ELSE sqrt((CAST(ss30 AS DOUBLE)
        |         - (CAST(s30 AS DOUBLE) * CAST(s30 AS DOUBLE)) / CAST(n30 AS DOUBLE))
        |         / (CAST(n30 AS DOUBLE) - 1)) / 100.0 END AS price_volatility_30d,
        |  returns_7d,
        |  CAST(returns_7d AS DOUBLE) / CAST(popularity_7d AS DOUBLE) AS return_rate_7d
        |FROM f""".stripMargin,

    "event_anomalies" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, ts, value,
        |    CAST(hour(ts) AS BIGINT) AS hour_of_day
        |  FROM events
        |), st AS (
        |  SELECT user_id AS s_user, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS sv,
        |    SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS svv
        |  FROM e GROUP BY 1
        |), us AS (
        |  SELECT s_user,
        |    CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS user_mean,
        |    CASE WHEN n <= 1 THEN 0.0
        |         ELSE sqrt((CAST(svv AS DOUBLE)
        |           - (CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) / CAST(n AS DOUBLE))
        |           / (CAST(n AS DOUBLE) - 1)) END AS user_std
        |  FROM st
        |), z AS (
        |  SELECT event_id, user_id, event_type, hour_of_day, value,
        |    (value - user_mean) / (user_std + 0.001) AS value_zscore
        |  FROM e JOIN us ON user_id = s_user
        |), fl AS (
        |  SELECT *,
        |    abs(value_zscore) > 3.0 AS is_value_anomaly,
        |    value > 100.0 AS is_volume_anomaly,
        |    hour_of_day < 6 OR hour_of_day > 23 AS is_time_anomaly
        |  FROM z
        |), sc AS (
        |  SELECT *,
        |    CASE WHEN is_value_anomaly THEN 4 ELSE 0 END
        |      + CASE WHEN is_volume_anomaly THEN 3 ELSE 0 END
        |      + CASE WHEN is_time_anomaly THEN 2 ELSE 0 END AS tenths
        |  FROM fl
        |)
        |SELECT event_id, user_id, event_type, hour_of_day, value, value_zscore,
        |  is_value_anomaly, is_volume_anomaly, is_time_anomaly,
        |  CAST(tenths AS DOUBLE) / 10.0 AS anomaly_score,
        |  tenths > 5 AS is_anomaly
        |FROM sc""".stripMargin,

    "cross_consistency" ->
      """WITH lt AS (
        |  SELECT l_orderkey, SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS line_total,
        |    MIN(l_shipdate) AS first_ship
        |  FROM lineitem GROUP BY 1
        |), j AS (
        |  SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate, lt.l_orderkey,
        |    lt.line_total, lt.first_ship
        |  FROM orders o FULL OUTER JOIN lt ON o.o_orderkey = lt.l_orderkey
        |), a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS records_1,
        |    CAST(SUM(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS records_2,
        |    CAST(SUM(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS common_records,
        |    CAST(SUM(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_1,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL AND l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_2,
        |    CAST(SUM(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
        |      AND abs(o_totalprice - CAST(line_total AS DOUBLE)) >= 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS total_mismatch,
        |    CAST(SUM(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
        |      AND first_ship < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS ship_before_order
        |  FROM j
        |)
        |SELECT 'key_overlap' AS check_id, 'orders~lineitem' AS dataset_pair,
        |  records_1, records_2, common_records, only_1, only_2,
        |  only_1 + only_2 AS inconsistent,
        |  1.0 - CAST(only_1 + only_2 AS DOUBLE) / CAST(records_1 + records_2 AS DOUBLE) AS consistency_rate,
        |  only_1 + only_2 = 0 AS passed
        |FROM a
        |UNION ALL
        |SELECT 'total_consistency', 'orders~lineitem',
        |  records_1, records_2, common_records, only_1, only_2,
        |  total_mismatch,
        |  1.0 - CAST(total_mismatch AS DOUBLE) / CAST(common_records AS DOUBLE),
        |  total_mismatch = 0
        |FROM a
        |UNION ALL
        |SELECT 'ship_after_order', 'orders~lineitem',
        |  records_1, records_2, common_records, only_1, only_2,
        |  ship_before_order,
        |  1.0 - CAST(ship_before_order AS DOUBLE) / CAST(common_records AS DOUBLE),
        |  ship_before_order = 0
        |FROM a""".stripMargin,

    "anomaly_orders" ->
      s"""WITH oc AS (
         |  SELECT o_orderkey, n_name AS country, o_totalprice,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  $ordersJoin
         |), a1 AS (
         |  SELECT country AS a_country, COUNT(*) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS s,
         |    CAST(SUM(cents) AS BIGINT) // COUNT(*) AS center
         |  FROM oc GROUP BY 1
         |), a2 AS (
         |  SELECT a_country AS s_country, n, s, center,
         |    SUM(CAST(cents - center AS DECIMAL(15,0)) * CAST(cents - center AS DECIMAL(15,0))) AS ssd
         |  FROM oc JOIN a1 ON country = a_country
         |  GROUP BY 1, 2, 3, 4
         |), st AS (
         |  SELECT s_country,
         |    (CAST(s AS DOUBLE) / n) / 100.0 AS mean_price,
         |    CASE WHEN n <= 1 THEN NULL
         |         ELSE sqrt((${Exact.bigDecToDoubleSql("ssd")}
         |      - (CAST(s % n AS DOUBLE) * CAST(s % n AS DOUBLE)) / n) / (n - 1)) / 100.0 END AS std_price
         |  FROM a2
         |)
         |SELECT o_orderkey, s_country AS country, o_totalprice, mean_price, std_price,
         |  (o_totalprice - mean_price) / std_price AS z,
         |  abs((o_totalprice - mean_price) / std_price) > 3.0 AS is_outlier
         |FROM oc JOIN st ON country = s_country""".stripMargin
  )
}
