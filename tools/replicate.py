#!/usr/bin/env python3
"""Build the BASELINE.md scale-probe inputs: replicate the fact-ish tables
(orders, customer, lineitem, events, documents) N times with key offsets so
join fan-outs and per-user window sizes stay constant; dims are copied
as-is. Driver-side python only — NOT part of the library.

Usage: replicate.py <src_sf_dir> <out_dir> <factor> [--perturb]
       [--cluster K] [tables...]

--perturb (r16, verdict item #6): replica i > 0 gets DISTINCT CONTENT —
documents.text gains a per-replica suffix token (shingles shift: texts
become near-dups, not verbatim twins) and embeddings gain a +i*1e-5
all-dims shift (above the q20 quantization step of ~9.5e-7, so the exact-
twin collapse CANNOT fold replicas; below any near-dup threshold, cosine
to the original stays ~0.99999). Replication-based corpora are the twin
collapse's BEST case; perturb mode is the honest distinct-content ladder.

--cluster K (r17, verdict item #3): REPLACES every embedding with a
deterministic mixture-of-K-Gaussians vector — center = vec_id % K, per-dim
center value hash-derived in ±10, within-cluster noise hash-derived in
±0.01 (three orders of magnitude tighter than the center spread). This is
the CLUSTERED recall corpus: real embedding spaces concentrate (classes,
topics, near-dup families), and the IVF probe-coverage economics that the
isotropic gate corpora hide only show up here. Deterministic (hash of
vec_id and dim only), so recall probes are reproducible run to run.
"""
import sys, shutil, os
import duckdb

DIMS = "region nation supplier part".split()
FACTS = {
    # table -> (offset columns, max-key source column)
    "orders":    (["o_orderkey", "o_custkey"], None),
    "customer":  (["c_custkey"], None),
    "lineitem":  (["l_orderkey"], None),
    "events":    (["event_id", "user_id"], None),
    "documents": (["doc_id"], None),
    "embeddings": (["vec_id"], None),
}

def main(src, out, factor, only, perturb=False, cluster=0):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # uncapped DuckDB assumes 80% of box RAM; a 1000x lineitem COPY then
    # fights every co-tenant for ~100 GB. Cap + spill instead.
    con.execute(f"SET memory_limit='{os.environ.get('REP_MEM', '24GB')}'")
    con.execute(f"SET threads={os.environ.get('REP_THREADS', '8')}")
    spill = os.environ.get('REP_SPILL', '/tmp/duckdb_spill')
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    # stream the COPY instead of buffering the whole replicated result for
    # order preservation — a 1000x lineitem otherwise spills ~50 GB
    con.execute("SET preserve_insertion_order=false")
    for t in DIMS:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.exists(s):
            shutil.copyfile(s, d)
    for t, (keys, _) in FACTS.items():
        if only and t not in only:
            shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
            continue
        src_pq = f"{src}/{t}.parquet"
        offs = {k: con.execute(
            f"SELECT MAX({k}) + 1 FROM read_parquet('{src_pq}')").fetchone()[0]
            for k in keys}
        cols = con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src_pq}')").df()
        names = list(cols.column_name)
        # cross join with range(factor): one parser-friendly statement for
        # any factor (1000 UNION ALL branches exceeded the parser depth)
        def col_sel(c):
            if c in offs:
                return f"{c} + t.i * {offs[c]} AS {c}"
            if perturb and t == "documents" and c == "text":
                return ("CASE WHEN t.i = 0 THEN text ELSE "
                        "text || ' r' || CAST(t.i AS VARCHAR) END AS text")
            if perturb and t == "embeddings" and c == "embedding":
                return ("CASE WHEN t.i = 0 THEN embedding ELSE "
                        "list_transform(embedding, x -> "
                        "CAST(x + t.i * 0.00001 AS FLOAT)) END AS embedding")
            if cluster and t == "embeddings" and c == "embedding":
                # new vec_id = vec_id + t.i * off; cluster on the NEW id so
                # replicas spread over centers instead of mirroring
                nid = f"(vec_id + t.i * {offs.get('vec_id', 0)})"
                return (
                    "list_transform(range(len(embedding)), d -> CAST("
                    f"(CAST(hash({nid} % {cluster} * 1024 + d) % 2000 AS BIGINT) - 1000) / 100.0 + "
                    f"(CAST(hash({nid} * 1024 + d) % 2000 AS BIGINT) - 1000) / 100000.0"
                    " AS FLOAT)) AS embedding")
            return c
        sel = ", ".join(col_sel(c) for c in names)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src_pq}'), range({factor}) t(i)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: x{factor} -> {n} rows")

if __name__ == "__main__":
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    rest = sys.argv[4:]
    perturb = "--perturb" in rest
    cluster = 0
    if "--cluster" in rest:
        ci = rest.index("--cluster")
        cluster = int(rest[ci + 1])
        rest = rest[:ci] + rest[ci + 2:]
    only = set(a for a in rest if a != "--perturb")
    main(src, out, factor, only, perturb, cluster)
