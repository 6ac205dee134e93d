"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput": {...}}

Each query is forced end-to-end with a noop-format write (full
physical execution, no driver collect bottleneck); aggregate-shaped
results use count(). Run `python bench.py --scaling` for the N vs 4N
(local[8] vs local[32]) scaling-efficiency evidence (separate
processes, one JSON line each).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "pipe_e2e",
    "pipe_route_fanout",
    "pipe_dedup_w1",
    "pipe_parse_grok",
    "pipe_sessionize",
    "tpch_q1_pricing",
    "tpch_q3_top_revenue",
    "window_top3_orders",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh_fast",
    "sim_topk_cosine",
]


def run_suite(cpus: int) -> dict:
    from logging_spark.session import build_session
    from logging_spark import contract

    spark = build_session("bench", cores=cpus, shuffle_partitions=max(2 * cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    queries = contract.build_queries()

    # count the pipeline's input turns once for the throughput metric
    n_turns = contract.turns_with_dups(spark, SF_DIR).count()

    results: dict[str, float] = {}
    for name in HEADLINE:
        df = queries[name](spark, SF_DIR)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()  # operators persist intermediates; isolate queries
    total = round(sum(results.values()), 3)
    out = {
        "metric": "headline suite wall time (12 queries, parse/enrich/route/agg + dedup/ANN/TPCH)",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "cpus": cpus,
        "throughput": {
            "pipe_e2e_turns_per_sec": round(n_turns / results["pipe_e2e"], 1),
            "n_turns": n_turns,
        },
    }
    spark.stop()
    return out


def main() -> int:
    if "--scaling" in sys.argv:
        # N vs 4N parallelism on identical input, fresh JVM each
        lines = {}
        for cpus in (8, 32):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            p = subprocess.run([sys.executable, __file__], env=env,
                               capture_output=True, text=True, check=True)
            lines[cpus] = json.loads(p.stdout.strip().splitlines()[-1])
        tput8 = lines[8]["throughput"]["pipe_e2e_turns_per_sec"]
        tput32 = lines[32]["throughput"]["pipe_e2e_turns_per_sec"]
        eff = (tput32 / tput8) / 4.0
        print(json.dumps({
            "metric": "scaling efficiency pipe_e2e local[8]->local[32]",
            "value": round(eff, 3), "unit": "ratio",
            "turns_per_sec": {"local8": tput8, "local32": tput32},
            "suite_sec": {"local8": lines[8]["value"], "local32": lines[32]["value"]},
            "sf": SF_DIR,
        }))
        return 0

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run_suite(cpus)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
