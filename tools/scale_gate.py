#!/usr/bin/env python3
"""One-command scale gate: replicate sf0.1 by N, run every driver query
against the replicated corpus, and value-verify all of them — raw DuckDB
oracles through crosscheck.py, the replay-heavy set through
staged_oracle.py (stepwise CTE staging + centroid inlining + text
collapse). Driver-side verification tooling only, NOT part of the library.

This is the r13 100x recipe folded into one entry point (VERDICT r13
item 8): what used to be four bespoke commands per round is

    python3 tools/scale_gate.py                # full 100x gate
    python3 tools/scale_gate.py --factor 10    # the 10x gate
    python3 tools/scale_gate.py q1 q2 ...      # subset

Steps (each skippable when its output already exists):
  1. tools/replicate.py sf0.1 -> target/scale/sf0.1x{N} (key-offset
     replication; dims copied as-is) unless the dir is already complete.
  2. graft.Verify over the replicated dir via raw java -cp (the verify
     skill's --add-opens recipe; sbt startup and compile-checks skipped —
     ALWAYS build first: `sbt -batch compile`).
  3. crosscheck.py for every produced query except the staged set.
  4. staged_oracle.py for the staged set (its HEAVY list).

Env knobs (defaults sized for the 32-core/128 GiB gate box):
  SG_XMX (90g)      engine heap      SG_CPUS (32)      local[N] + shuffle parts
  CC_MEM/CC_THREADS/CC_SPILL         crosscheck's DuckDB (40GB / 8)
  SO_MEM/SO_THREADS/SO_STAGE         staged oracle's DuckDB (40GB / 12)
  SG_SKIP_VERIFY=1  reuse the existing verify output dir
"""
import sys, os, glob, json, subprocess, shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from staged_oracle import HEAVY, TABLES  # noqa: E402

OPENS_PKGS = ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
              "java.net", "java.nio", "java.util", "java.util.concurrent",
              "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
              "sun.security.action", "sun.util.calendar"]


def sh(cmd, env=None, tag=""):
    print(f"[scale_gate]{tag} $ {' '.join(cmd[:6])}{' ...' if len(cmd) > 6 else ''}",
          flush=True)
    e = dict(os.environ)
    e.update(env or {})
    return subprocess.run(cmd, env=e).returncode


def main():
    args = [a for a in sys.argv[1:]]
    factor = 100
    src = f"{REPO}/../testdata/sf0.1"
    if not os.path.isdir(src):
        src = "/root/testdata/sf0.1"
    queries = []
    i = 0
    while i < len(args):
        if args[i] == "--factor":
            factor = int(args[i + 1]); i += 2
        elif args[i] == "--src":
            src = args[i + 1]; i += 2
        else:
            queries.append(args[i]); i += 1

    scaled = f"{REPO}/target/scale/sf0.1x{factor}"
    outdir = f"{REPO}/target/scale/verify_x{factor}"

    # 1. replicate (idempotent: skip when every table file exists)
    missing = [t for t in TABLES if not os.path.exists(f"{scaled}/{t}.parquet")]
    if missing:
        rc = sh([sys.executable, f"{REPO}/tools/replicate.py", src, scaled,
                 str(factor), "orders", "customer", "lineitem", "events",
                 "documents", "embeddings"], tag=" replicate")
        if rc:
            return rc
    else:
        print(f"[scale_gate] replicated dir complete: {scaled}")

    # 2. engine run (raw java -cp; requires a prior `sbt -batch compile`)
    classes = f"{REPO}/target/scala-2.13/classes"
    if not os.path.isdir(classes):
        print("[scale_gate] build first: sbt -batch compile"); return 2
    if os.environ.get("SG_SKIP_VERIFY") == "1" and os.path.isdir(outdir):
        print(f"[scale_gate] reusing verify output: {outdir}")
    else:
        opens = []
        for p in OPENS_PKGS:
            opens += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]
        cp = classes + ":" + ":".join(sorted(glob.glob("/opt/spark/jars/*.jar")))
        cmd = (["java"] + opens +
               ["-Xmx" + os.environ.get("SG_XMX", "90g"), "-cp", cp,
                "graft.Verify", scaled, outdir] + queries)
        rc = sh(cmd, env={"SPARK_GRAFT_CPUS": os.environ.get("SG_CPUS", "32")},
                tag=" verify")
        if rc:
            return rc

    produced = {os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)}
    wanted = set(queries) if queries else set(
        json.load(open(f"{outdir}/oracle_sql.json")).keys())
    staged = sorted(wanted & produced & set(HEAVY))
    raw = sorted((wanted & produced) - set(HEAVY))

    # 3 + 4. oracle compares
    fails = 0
    if raw:
        fails += 1 if sh([sys.executable, f"{REPO}/tools/crosscheck.py",
                          scaled, outdir] + raw,
                         env={"CC_THREADS": os.environ.get("CC_THREADS", "8")},
                         tag=" crosscheck") else 0
    # one subprocess PER staged query: DuckDB working memory accumulates
    # across chains in a single process (the 10x r16 run OOM-killed at
    # 130 GB on the 8th chain after 7 green ones) — per-query isolation
    # caps RSS at one chain's working set
    for q in staged:
        # staged_oracle prints its own peak RSS at exit (the r17 100x
        # record wants per-query memory evidence, not just pass/fail)
        import time as _t
        t0 = _t.time()
        rc = sh([sys.executable, f"{REPO}/tools/staged_oracle.py",
                 scaled, outdir, q],
                env={"SO_THREADS": os.environ.get("SO_THREADS", "8")},
                tag=f" staged:{q}")
        print(f"[scale_gate] staged:{q} rc={rc} wall={_t.time() - t0:.0f}s",
              flush=True)
        fails += 1 if rc else 0
    print(f"[scale_gate] {'FAIL' if fails else 'OK'} at {factor}x "
          f"({len(raw)} raw + {len(staged)} staged queries)")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
