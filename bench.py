"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the north-rule
metrics: index-build throughput on the deterministic synthetic graft
corpus and the two-parallelism scaling run (local[N] vs local[4N] on the
same input — the sandbox stand-in for N vs 4N executor clusters, see
BENCH/BASELINE.md).  Prints ONE JSON line.

Env knobs:
  SPARK_GRAFT_SF_DIR       sf dir for the query suite (default sf0.1)
  SPARK_GRAFT_CPUS         cores for the query suite (default 32)
  BEETLE_BENCH_DOCS        synthetic corpus size for build/scaling (default 100000)
  BEETLE_BENCH_SCALING     "0" to skip the scaling pair (default on)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("BEETLE_BENCH_DOCS", "100000"))
SCALING_N = int(os.environ.get("BEETLE_BENCH_N", "1"))  # N vs 4N cores
RUN_SCALING = os.environ.get("BEETLE_BENCH_SCALING", "1") != "0"

HEADLINE = [
    "token_tf",
    "bm25_topk_or",
    "bm25_topk_and",
    "knn_cosine_topk",
    "rrf_hybrid",
    "minhash_signatures",
    "simhash16",
    "engine_bm25_or",
    "ann_lsh_cosine",
]


def run_queries() -> dict[str, float]:
    import __spark_entry__ as entrymod
    from beetle_search_engine_spark.sources.session import get_spark

    spark = get_spark("bench-queries", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # engine entries build their index on first call; do that outside the
    # timed window and report the build separately
    shutil.rmtree(f"/tmp/beetle_idx_{SF_DIR.strip('/').replace('/', '_')}", ignore_errors=True)
    t0 = time.time()
    entrymod._engine_index(spark, SF_DIR)
    idx_build_s = time.time() - t0

    out: dict[str, float] = {"engine_index_build": round(idx_build_s, 3)}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    spark.stop()
    return out


def run_scaling() -> dict:
    here = os.path.dirname(os.path.abspath(__file__))
    res = {}
    for cores in (SCALING_N, SCALING_N * 4):
        p = subprocess.run(
            [sys.executable, f"{here}/tools/bench_build.py", "--cores", str(cores), "--docs", str(BENCH_DOCS)],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        res[cores] = json.loads(line)
    n, n4 = SCALING_N, SCALING_N * 4
    eff = res[n4]["docs_per_sec"] / (4.0 * res[n]["docs_per_sec"])
    return {
        "cores_n": n,
        "cores_4n": n4,
        "docs": BENCH_DOCS,
        "docs_per_sec_n": res[n]["docs_per_sec"],
        "docs_per_sec_4n": res[n4]["docs_per_sec"],
        "postings_per_sec_4n": res[n4]["postings_per_sec"],
        "efficiency": round(eff, 3),
    }


def main():
    queries = run_queries()
    result = {
        "metric": "bm25_engine_index_build_docs_per_sec",
        "unit": "docs/sec",  # queries sub-dict is in seconds
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "queries": queries,
    }
    if RUN_SCALING:
        scaling = run_scaling()
        result["scaling"] = scaling
        result["value"] = scaling["docs_per_sec_4n"]
    else:
        result["value"] = round(1.0 / max(queries.get("engine_bm25_or", 1.0), 1e-9), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
