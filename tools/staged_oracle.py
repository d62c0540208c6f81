#!/usr/bin/env python3
"""Staged replay of the replay-heavy DuckDB oracles at the 100x corpus —
driver-side verification tooling only, NOT part of the library.

Why: the five replay-heavy oracles (anomaly_ml, customer_clusters,
cluster_keepers, dedup_clusters, incremental_neardup) die at the 100x
corpus when run as single statements — DuckDB materializes the whole CTE
chain in RAM (>125 GiB) or fills the disk with spill. Two techniques
close the gap without weakening the check:

1. Generic CTE staging (anomaly_ml, customer_clusters): the oracles are
   flat chains of MATERIALIZED CTEs. Execute each CTE as its own
   `COPY (...) TO <stage>/<name>.parquet`, register a view over the file,
   and DELETE a stage file as soon as no later step references it. Peak
   memory = one step's working set; peak disk = the live reference set.
   The SQL text is the oracle's own — semantics untouched.

2. Exact-duplicate text collapse (dedup_clusters, cluster_keepers,
   incremental_neardup): the 100x corpus replicates each document's TEXT
   verbatim (tools/replicate.py strides doc_ids by OFF = (max+1)/factor).
   Shingle sets and Jaccard are functions of text alone, so the oracle's
   all-pairs shingle join is computed over DISTINCT TEXTS (1x-scale) and
   the decisions are expanded back to members in closed form — the same
   equivalence the Spark side's adaptive exact-dup collapse uses. The
   expansion rules are derived per query below; each recipe VERIFIES its
   striding precondition first and aborts if the corpus is not a verbatim
   replication.

Compare: exact, inside DuckDB — symmetric EXCEPT ALL with columns cast to
the Spark parquet schema (engine-equality semantics: -0.0 = 0.0, NULLs
match NULLs via IS NOT DISTINCT semantics of set ops).

Usage: staged_oracle.py <sfdir> <verify_outdir> [query ...]
Env: SO_MEM (default 40GB), SO_THREADS (default 4), SO_STAGE (stage dir).
"""
import sys, os, re, glob, json, shutil
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
HEAVY = ["anomaly_ml", "anomaly_ensemble_ml", "customer_clusters", "cluster_keepers",
         "dedup_clusters", "incremental_neardup", "streaming_neardup_replay",
         # r16 (verdict item #5): the ANN KMeans-replay family stages too —
         # generic CTE staging + centroid inlining handles the (possibly
         # prefixed) fit chains, closing the ann_pq/ann_ivfpq 100x
         # materialized-CTE OOM exclusion
         "ann_ivf", "ann_ivf_indexed", "ann_ivf_append", "ann_auto",
         "streaming_ivf_append_replay", "ann_pq", "ann_pq_indexed",
         "ann_ivfpq", "ann_ivfpq_indexed", "ann_ivfpq_append",
         "streaming_ivfpq_append_replay"]


# --------------------------------------------------------------- splitter

def split_ctes(sql):
    """Split `WITH a AS [MATERIALIZED] (...), b AS (...) SELECT ...` into
    ([(name, body)], final_select). Quote- and paren-aware; rejects
    RECURSIVE chains (the collapse recipes handle those queries)."""
    s = sql.strip()
    assert s.upper().startswith("WITH"), "not a WITH query"
    assert not s.upper().startswith("WITH RECURSIVE"), "recursive chain"
    i = len("WITH")
    ctes = []
    while True:
        m = re.match(r"\s*([A-Za-z_]\w*)\s+AS\s+(?:MATERIALIZED\s+)?\(", s[i:])
        assert m, f"cannot parse CTE header at: {s[i:i+80]!r}"
        name = m.group(1)
        j = i + m.end()  # just past the opening paren
        depth, q = 1, None
        while depth > 0:
            c = s[j]
            if q:
                if c == q:
                    # SQL escapes a quote inside a literal by doubling it
                    # ('' or ""): consume the pair and stay in the string
                    if j + 1 < len(s) and s[j + 1] == q:
                        j += 1
                    else:
                        q = None
            elif c in ("'", '"'):
                q = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        ctes.append((name, s[i + m.end():j - 1]))
        # next: comma -> another CTE; otherwise the final select
        m2 = re.match(r"\s*,", s[j:])
        if m2:
            i = j + m2.end()
        else:
            return ctes, s[j:].strip()


def refs(name, texts):
    pat = re.compile(rf"\b{re.escape(name)}\b")
    return any(pat.search(t) for t in texts)


# The KMeans replay chains' assignment steps: `z CROSS JOIN c_k` then a
# GROUP BY over every z column to recover row identity, with min(struct)
# as the argmin. DuckDB cannot spill that aggregate (OOM-killed at 130 GB
# on 15M x 8 at the 100x corpus, any thread count). But c_k is <= k rows:
# fetch it and inline the centroids as literals, turning the step into a
# pure streaming projection — `least` over structs is the same
# lexicographic (d, j) argmin as min(struct), and literal-vs-column
# operands run the identical IEEE sequence, so results are bit-equal.
# The z table may be PREFIX-NAMESPACED (pz for the PQ codebook fit, any
# `<prefix>z` for composed fits — the r16 geometry work runs several fits
# in one chain), so the FROM side matches any \w*z name and the rewrite
# reuses it.
M_A = re.compile(
    r"^SELECT (?P<cols>[\w ,]+), \(min\(\{'d': (?P<dist>.+), 'j': cluster\}\)\)\.j AS cluster "
    r"FROM (?P<z>\w*z) CROSS JOIN (?P<c>\w+) GROUP BY [\w ,]+$")
M_MD = re.compile(
    r"^SELECT (?P<cols>[\w ,]+), MIN\((?P<dist>.+)\) AS dmin "
    r"FROM (?P<z>\w*z) CROSS JOIN (?P<c>\w+) GROUP BY [\w ,]+$")


def inline_centroid_step(con, body):
    """Rewrite an assignment/min-distance step to a projection with the
    centroid table inlined as literals. Returns None if the body is not
    one of the two KMeans step shapes."""
    b = re.sub(r"\s+", " ", body.strip())
    ma, mm = M_A.match(b), M_MD.match(b)
    m = ma or mm
    if not m:
        return None
    cur = con.execute(f"SELECT * FROM {m.group('c')}")
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    # bound raised 64 -> 512 for the size-derived list counts (k = 45 at
    # the replicated 100x corpus; a distinct-content 10x corpus derives
    # 142). Past 512 arms the inlined projection itself becomes the cost.
    if not rows or len(rows) > 512:
        return None

    def lit(v, cn):
        if cn == "cluster":
            return f"CAST({int(v)} AS BIGINT)"
        # repr() is the shortest round-trip decimal; DuckDB's parse is
        # correctly rounded, so the literal reproduces the exact bits
        return f"CAST({v!r} AS DOUBLE)"

    arms = []
    for r in rows:
        env = dict(zip(names, r))
        expr = m.group("dist")
        for cn in names:
            if cn != "cluster":
                expr = re.sub(rf"\b{cn}\b", lit(env[cn], cn), expr)
        if ma:
            arms.append("{'d': " + expr + ", 'j': " + lit(env["cluster"], "cluster") + "}")
        else:
            arms.append(expr)
    z = m.group('z')
    if ma:
        # least() has no struct overload; list_sort is the same
        # lexicographic (d, j) total order, [1] = the minimum
        sel = f"(list_sort([{', '.join(arms)}])[1]).j"
        return f"SELECT {m.group('cols')}, {sel} AS cluster FROM {z}"
    return f"SELECT {m.group('cols')}, least({', '.join(arms)}) AS dmin FROM {z}"


def stage_chain(con, sql, stage, log=print):
    """Execute a flat CTE chain stepwise through parquet, GC'ing stage
    files at last use. Returns the final SELECT (views in scope).

    Thread throttle: DuckDB's hash-aggregate memory scales with THREADS
    (per-thread partials) and its memory_limit is advisory for them — the
    KMeans assignment steps (fact CROSS JOIN centroids -> GROUP BY the
    fact key) OOM-killed the box at 14 threads / 130 GB RSS at the 100x
    corpus. Steps containing a CROSS JOIN + GROUP BY run at 4 threads;
    pure projections keep the session's thread count."""
    full_threads = int(os.environ.get('SO_THREADS', '4'))
    ctes, final = split_ctes(sql)
    # staged views are registered under the CTE's own name: a CTE shadowing
    # a base table would CREATE OR REPLACE over the table view and then
    # DELETE its backing at GC — fail loudly instead of corrupting the run
    for name, _ in ctes:
        assert name not in TABLES, \
            f"CTE {name!r} collides with a base table name; rename it in the oracle"
    live = []
    for k, (name, body) in enumerate(ctes):
        out = f"{stage}/{name}.parquet"
        inlined = inline_centroid_step(con, body)
        if inlined is not None:
            body = inlined
        heavy = "CROSS JOIN" in body.upper() and "GROUP BY" in body.upper()
        con.execute(f"SET threads={min(4, full_threads) if heavy else full_threads}")
        con.execute(f"COPY ({body}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{out}')")
        live.append(name)
        later = [b for _, b in ctes[k + 1:]] + [final]
        for g in list(live):
            if not refs(g, later):
                con.execute(f"DROP VIEW IF EXISTS {g}")
                os.remove(f"{stage}/{g}.parquet")
                live.remove(g)
        log(f"  staged {name} ({k + 1}/{len(ctes)}), live={len(live)}")
    con.execute(f"SET threads={full_threads}")
    return final


# ------------------------------------------------------------- collapse

def check_striding(con):
    """Verify the replicate.py precondition: doc_ids stride by OFF with
    verbatim (text, source) copies. Returns (factor, OFF) or None."""
    mx, n = con.execute(
        "SELECT MAX(doc_id), COUNT(*) FROM documents").fetchone()
    for f in (100, 30, 10, 3, 1):
        if (mx + 1) % f:
            continue
        off = (mx + 1) // f
        bad = con.execute(f"""
            SELECT COUNT(*) FROM documents d
            LEFT JOIN (SELECT doc_id, text, source FROM documents
                       WHERE doc_id < {off}) o
              ON d.doc_id % {off} = o.doc_id
             AND d.text IS NOT DISTINCT FROM o.text
             AND d.source IS NOT DISTINCT FROM o.source
            WHERE o.doc_id IS NULL""").fetchone()[0]
        if bad == 0 and n == f * con.execute(
                f"SELECT COUNT(*) FROM documents WHERE doc_id < {off}").fetchone()[0]:
            return f, off
    return None


# The 1x-scale rep machinery shared by the three collapse recipes: distinct
# texts (rep = min doc_id), shingles over reps only, rep-pair jaccard.
REP_CTES = """
grp AS (
  SELECT text, MIN(doc_id) AS gid, COUNT(*) AS gsz,
    len(string_split_regex(lower(trim(text)), '\\s+')) >= 3 AS has_sh
  FROM documents GROUP BY text
),
mem AS (SELECT d.doc_id, g.gid FROM documents d JOIN grp g ON d.text IS NOT DISTINCT FROM g.text),
rsh AS (
  SELECT gid, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS sh
  FROM (SELECT gid, string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM grp WHERE has_sh)
),
rcnt AS (SELECT gid, COUNT(*) AS n FROM rsh GROUP BY gid),
rinter AS (
  SELECT a.gid AS ga, b.gid AS gb, COUNT(*) AS isect
  FROM rsh a JOIN rsh b ON a.sh = b.sh AND a.gid < b.gid GROUP BY 1, 2
),
rpairs AS (
  SELECT ga, gb, CAST(isect AS DOUBLE) / (ca.n + cb.n - isect) AS jaccard
  FROM rinter JOIN rcnt ca ON ga = ca.gid JOIN rcnt cb ON gb = cb.gid
  WHERE CAST(isect AS DOUBLE) / (ca.n + cb.n - isect) >= 0.8
)
"""


def run_rep_base(con, stage):
    """Materialize the rep-level frames once (shared by the recipes)."""
    for name, body in split_ctes("WITH " + REP_CTES + " SELECT 1")[0]:
        out = f"{stage}/{name}.parquet"
        con.execute(f"COPY ({body}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{out}')")


def rep_components(con, stage):
    """Connected components over the rep graph: nodes = reps in an edge OR
    (gsz >= 2 AND has_sh); edges = rpairs. 1x-scale, so the recursive
    closure is affordable; labels = min reachable gid."""
    con.execute(f"""
      COPY (
        WITH RECURSIVE e2 AS (
          SELECT ga AS s, gb AS d FROM rpairs
          UNION ALL SELECT gb, ga FROM rpairs
        ),
        nodes AS (
          SELECT DISTINCT s AS node FROM e2
          UNION SELECT gid FROM grp WHERE gsz >= 2 AND has_sh
        ),
        reach(node, r) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e2.d, reach.r FROM reach JOIN e2 ON e2.s = reach.node
        )
        SELECT node AS gid, MIN(r) AS comp FROM reach GROUP BY node
      ) TO '{stage}/rlab.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)""")
    con.execute(f"CREATE OR REPLACE VIEW rlab AS SELECT * FROM read_parquet('{stage}/rlab.parquet')")


def collapse_dedup_clusters(con, stage):
    """dedup_clusters via text collapse. Equivalence: jaccard is a function
    of text; all members of a text group with shingles are mutually jacc-1
    connected, so contracting groups preserves components; cluster_id =
    min doc_id in component = min gid over component groups (gid = group's
    min member); size = sum of gsz."""
    run_rep_base(con, stage)
    rep_components(con, stage)
    return """
      WITH csz AS (
        SELECT l.comp, CAST(SUM(g.gsz) AS BIGINT) AS csz
        FROM rlab l JOIN grp g ON l.gid = g.gid GROUP BY 1
      )
      SELECT m.doc_id,
        coalesce(l.comp, m.doc_id) AS cluster_id,
        m.doc_id = coalesce(l.comp, m.doc_id) AS is_keeper,
        CAST(coalesce(csz.csz, 1) AS BIGINT) AS cluster_size,
        TRUE AS converged
      FROM mem m
      LEFT JOIN rlab l ON m.gid = l.gid
      LEFT JOIN csz ON l.comp = csz.comp"""


def staged_cluster_keepers(con, stage):
    """cluster_keepers: the dedup_clusters components plus quality-keeper
    election. quality_score is text-derived (identical within a group), so
    the original first_value over (quality DESC NULLS LAST, doc_id) per
    cluster equals the (quality DESC NULLS LAST, gid)-first GROUP's gid —
    group min ids are the member minima."""
    run_rep_base(con, stage)
    rep_components(con, stage)
    return """
      WITH q AS (
        SELECT gid,
          LEAST(1.0, CAST(nt AS DOUBLE) / 100.0) * 0.5
            + CASE WHEN nt = 0 THEN 0.0
                   ELSE LEAST(1.0, 4.0 * sw / nt) * 0.5 END AS quality_score
        FROM (
          SELECT gid,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) END AS nt,
            CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
              x -> x IN ('the', 'and', 'of', 'to', 'in', 'is', 'that', 'it'))) AS BIGINT) AS sw
          FROM grp)
      ), gl AS (
        SELECT g.gid, g.gsz, l.comp, q.quality_score
        FROM grp g JOIN q USING (gid) LEFT JOIN rlab l ON g.gid = l.gid
      ), cagg AS (
        SELECT comp, CAST(SUM(gsz) AS BIGINT) AS csz
        FROM gl WHERE comp IS NOT NULL GROUP BY comp
      ), ck AS ( -- NULLS LAST mirrors the original window's ordering
        SELECT comp, gid AS keeper_id FROM (
          SELECT comp, gid, row_number() OVER (PARTITION BY comp
            ORDER BY quality_score DESC NULLS LAST, gid) AS rn
          FROM gl WHERE comp IS NOT NULL) WHERE rn = 1
      )
      SELECT m.doc_id,
        coalesce(gl.comp, m.doc_id) AS cluster_id,
        CAST(coalesce(cagg.csz, 1) AS BIGINT) AS cluster_size,
        gl.quality_score,
        coalesce(ck.keeper_id, m.doc_id) AS keeper_id,
        m.doc_id = coalesce(ck.keeper_id, m.doc_id) AS is_kept
      FROM mem m
      JOIN gl ON m.gid = gl.gid
      LEFT JOIN cagg ON gl.comp = cagg.comp
      LEFT JOIN ck ON gl.comp = ck.comp"""


def staged_incremental_neardup(con, stage, off):
    """incremental_neardup via collapse. Preconditions (checked by
    check_striding): every doc is a verbatim (text, source) copy of an
    original (doc_id < OFF) at doc_id % OFF, and every group's member ids
    are {x + k*OFF}. Under that striding:
      - rep rows (copy 0) = the 1x oracle over originals verbatim;
      - copies k>=1: corpus match -> same corpus decision as the rep;
        else if the text has shingles -> drop_near_batch with keeper =
        min doc_id over the jacc-1 family (own group and any batch group
        with jaccard exactly 1.0), jaccard 1.0;
        else -> keep."""
    # 1x oracle over originals only
    con.execute(f"CREATE OR REPLACE VIEW documents1 AS SELECT * FROM documents WHERE doc_id < {off}")
    base = ORACLES["incremental_neardup"].replace("FROM documents", "FROM documents1")
    con.execute(f"COPY ({base}) TO '{stage}/base1.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")
    con.execute(f"CREATE OR REPLACE VIEW base1 AS SELECT * FROM read_parquet('{stage}/base1.parquet')")
    # jacc-1 batch partners per original batch doc (for the k>=1 rule)
    con.execute(f"""
      COPY (
        WITH t AS (
          SELECT doc_id, source, string_split_regex(lower(trim(text)), '\\s+') AS toks
          FROM documents1
        ), e AS (SELECT doc_id, source, toks FROM t WHERE len(toks) >= 3),
        sh AS (
          SELECT doc_id, source, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS sh
          FROM e
        ), cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        bb AS (
          SELECT a.doc_id AS x, b.doc_id AS y, COUNT(*) AS isect
          FROM sh a JOIN sh b ON a.sh = b.sh
          WHERE a.source = 'src0' AND b.source = 'src0' AND a.doc_id <> b.doc_id
          GROUP BY 1, 2
        )
        SELECT x, MIN(LEAST(x, y)) AS gm
        FROM bb JOIN cnt ca ON x = ca.doc_id JOIN cnt cb ON y = cb.doc_id
        WHERE isect = ca.n AND isect = cb.n  -- jaccard exactly 1
        GROUP BY x
      ) TO '{stage}/j1.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)""")
    con.execute(f"CREATE OR REPLACE VIEW j1 AS SELECT * FROM read_parquet('{stage}/j1.parquet')")
    return f"""
      WITH orig AS (
        SELECT b.doc_id AS x, b.decision, b.keeper_id, b.jaccard,
          len(string_split_regex(lower(trim(d.text)), '\\s+')) >= 3 AS has_sh,
          coalesce(j1.gm, b.doc_id) AS gm
        FROM base1 b
        JOIN documents1 d ON b.doc_id = d.doc_id
        LEFT JOIN j1 ON b.doc_id = j1.x
      )
      SELECT d.doc_id,
        CASE WHEN d.doc_id < {off} THEN o.decision
             WHEN o.decision = 'drop_near_corpus' THEN 'drop_near_corpus'
             WHEN o.has_sh THEN 'drop_near_batch'
             ELSE 'keep' END AS decision,
        CASE WHEN d.doc_id < {off} THEN o.keeper_id
             WHEN o.decision = 'drop_near_corpus' THEN o.keeper_id
             WHEN o.has_sh THEN o.gm
             ELSE NULL END AS keeper_id,
        CASE WHEN d.doc_id < {off} THEN o.jaccard
             WHEN o.decision = 'drop_near_corpus' THEN o.jaccard
             WHEN o.has_sh THEN 1.0
             ELSE NULL END AS jaccard
      FROM (SELECT doc_id FROM documents WHERE source = 'src0') d
      JOIN orig o ON d.doc_id % {off} = o.x"""


def staged_anomaly_ensemble_ml(con, stage):
    """anomaly_ensemble_ml = statistical composite JOIN anomaly_ml score.
    The ML leg embeds the same KMeans chain whose assignment step DuckDB
    cannot run as one statement (the anomaly_ml OOM shape — killed this
    box at CC_THREADS=8 on the 10x corpus); the statistical leg runs fine
    inline. Stage the ML leg stepwise (inlined centroids and all) and
    substitute the staged view into the composed SQL verbatim."""
    ml = ORACLES["anomaly_ml"]
    needle = "(" + ml + ")"
    big = ORACLES["anomaly_ensemble_ml"]
    assert needle in big, \
        "anomaly_ml oracle is no longer an exact subquery of anomaly_ensemble_ml"
    ml_final = stage_chain(con, ml, stage)
    con.execute(f"COPY ({ml_final}) TO '{stage}/__mlleg.parquet'"
                " (FORMAT PARQUET, COMPRESSION ZSTD)")
    con.execute("CREATE OR REPLACE VIEW __mlleg AS "
                f"SELECT * FROM read_parquet('{stage}/__mlleg.parquet')")
    return big.replace(needle, "__mlleg")


# --------------------------------------------------------------- compare

def compare_exact(con, name, spark_files, oracle_sql):
    """Symmetric EXCEPT ALL with columns cast to the Spark parquet schema:
    exact engine-equality compare (NULL-safe, -0.0 = 0.0), O(join) memory."""
    schema = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({spark_files!r})").fetchall()
    cols = [(c[0], c[1]) for c in schema]
    collist = ", ".join(f'"{c}"' for c, _ in cols)
    castlist = ", ".join(f'CAST("{c}" AS {t}) AS "{c}"' for c, t in cols)
    con.execute(f"CREATE OR REPLACE VIEW __spark AS SELECT {collist} FROM read_parquet({spark_files!r})")
    con.execute(f"CREATE OR REPLACE VIEW __oracle AS SELECT {castlist} FROM ({oracle_sql})")
    ns, no = (con.execute(f"SELECT COUNT(*) FROM {v}").fetchone()[0]
              for v in ("__spark", "__oracle"))
    if ns != no:
        print(f"[ROWS] {name}: spark={ns} oracle={no}")
        return False
    diff = con.execute(
        "SELECT COUNT(*) FROM ((SELECT * FROM __spark EXCEPT ALL SELECT * FROM __oracle)"
        " UNION ALL (SELECT * FROM __oracle EXCEPT ALL SELECT * FROM __spark))").fetchone()[0]
    if diff:
        print(f"[FAIL] {name}: {diff} asymmetric rows")
        sample = con.execute(
            "SELECT * FROM (SELECT * FROM __spark EXCEPT ALL SELECT * FROM __oracle) LIMIT 3").fetchall()
        print("  spark-only sample:", sample)
        return False
    print(f"[ OK ] {name}: {ns} rows exact (EXCEPT ALL empty)")
    return True


ORACLES = {}


def main(sfdir, outdir, only):
    global ORACLES
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('SO_MEM', '40GB')}'")
    con.execute(f"SET threads={os.environ.get('SO_THREADS', '4')}")
    spill = os.environ.get('SO_SPILL', '/tmp/duckdb_spill')
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    # row order is irrelevant everywhere (set-compare at the end); dropping
    # order preservation lets COPY stream instead of buffering
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    ORACLES = json.load(open(f"{outdir}/oracle_sql.json"))
    stage = os.environ.get('SO_STAGE', '/tmp/staged_oracle')
    targets = only or HEAVY
    ok = fail = 0
    for name in targets:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); fail += 1; continue
        qstage = f"{stage}/{name}"
        shutil.rmtree(qstage, ignore_errors=True)
        os.makedirs(qstage, exist_ok=True)
        try:
            if name in ("anomaly_ml", "customer_clusters"):
                final = stage_chain(con, ORACLES[name], qstage)
            elif name == "anomaly_ensemble_ml":
                final = staged_anomaly_ensemble_ml(con, qstage)
            elif name == "dedup_clusters":
                final = collapse_dedup_clusters(con, qstage)
            elif name == "cluster_keepers":
                final = staged_cluster_keepers(con, qstage)
            elif name in ("incremental_neardup", "streaming_neardup_replay"):
                strided = check_striding(con)
                assert strided, "corpus is not a verbatim replication; run the raw oracle"
                f, off = strided
                print(f"  striding verified: factor={f} off={off}")
                final = staged_incremental_neardup(con, qstage, off)
            else:
                final = ORACLES[name]
            if compare_exact(con, name, files, final):
                ok += 1
            else:
                fail += 1
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); fail += 1
        finally:
            shutil.rmtree(qstage, ignore_errors=True)
    import resource
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(f"\n{ok} ok, {fail} fail (peak RSS {peak_mb} MB)")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:] or None))
