#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output vs
DuckDB oracle_sql.json on the same parquet tables. Exact value compare after
sorting columns by name and rows by all values. Driver-side python only —
NOT part of the library.

At replicated corpora >=10x, the replay-heavy oracles (anomaly_ml,
customer_clusters, cluster_keepers, dedup_clusters, incremental_neardup,
streaming_neardup_replay) should run through tools/staged_oracle.py
instead — the raw chains here OOM at 100x regardless of CC_* settings."""
import sys, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main(sfdir, outdir, only=None):
    import os
    con = duckdb.connect()
    # the KMeans/GBT replay oracles materialize big CTE chains at 10x+
    # corpora; uncapped DuckDB assumes ~80% of RAM per PROCESS and the OOM
    # killer reaps it (observed at 130 GB RSS). memory_limit is ADVISORY for
    # these materialized chains — DuckDB has been observed to blow past it —
    # so THREAD COUNT is the effective memory lever: the default is 4, and
    # the four heaviest ML-replay oracles at 10x need solo CC_THREADS=1-2
    # runs (the BASELINE recipe). Spill to disk for the rest.
    con.execute(f"SET memory_limit='{os.environ.get('CC_MEM', '40GB')}'")
    con.execute(f"SET threads={os.environ.get('CC_THREADS', '4')}")
    spill = os.environ.get('CC_SPILL', '/tmp/duckdb_spill')
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); fail += 1; continue
        try:
            got = norm(con.execute(f"SELECT * FROM read_parquet({files!r})").df())
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: spark={list(got.columns)} oracle={list(want.columns)}"); fail += 1; continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} oracle={len(want)}"); fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype) != str(b.dtype):
                bad = f"dtype {c}: {a.dtype} vs {b.dtype}"; break
            if a.dtype.kind == 'f':
                neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = neq.idxmax()
                    bad = f"float {c}: row {i} {a[i]!r} vs {b[i]!r} (diff {abs(a[i]-b[i])})"; break
            else:
                neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = neq.idxmax()
                    bad = f"value {c}: row {i} {a[i]!r} vs {b[i]!r}"; break
        if bad:
            print(f"[FAIL] {name}: {bad}"); fail += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows"); ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
