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
    "sim_ivf_topk",
    "text_chunks",
    "pipe_tumbling_window",
]


def run_suite(cpus: int) -> dict:
    from logging_spark.session import build_session
    from logging_spark import contract

    spark = build_session("bench", cores=cpus, shuffle_partitions=max(2 * cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    queries = contract.build_queries()

    # count the pipeline's input turns once for the throughput metric
    n_turns = contract.turns_with_dups(spark, SF_DIR).count()

    # warm up codegen/JIT and the parquet reader paths so the first
    # timed query doesn't absorb one-time JVM costs
    spark.range(100_000).selectExpr("sum(id)").collect()
    contract.turns_df(spark, SF_DIR).limit(1000).write.format("noop").mode("overwrite").save()

    results: dict[str, float] = {}
    for name in HEADLINE:
        df = queries[name](spark, SF_DIR)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()  # operators persist intermediates; isolate queries
    total = round(sum(results.values()), 3)
    out = {
        "metric": f"headline suite wall time ({len(HEADLINE)} queries, parse/enrich/route/agg + dedup/ANN/TPCH)",
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


def _submit_once(here: str, cpus: int, n_conversations: int,
                 turns_per_conv: int, tag: str) -> dict:
    import shutil
    wh = f"/tmp/wh_bench_{cpus}_{tag}"
    shutil.rmtree(wh, ignore_errors=True)
    cmd = [
        "spark-submit", "--master", f"local[{cpus}]",
        # spark-submit defaults to a 1g driver; in local mode the
        # driver IS the executor, so size it like one
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "--conf", f"spark.sql.shuffle.partitions={2 * cpus}",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", "spark.sql.parquet.compression.codec=zstd",
        "--py-files", os.path.join(here, "dist/logging_spark.zip"),
        os.path.join(here, "run_job.py"),
        "--warehouse", wh,
        "--n-conversations", str(n_conversations),
        "--turns-per-conv", str(turns_per_conv),
        # workload held CONSTANT across parallelism levels: bucket and
        # write-partition counts must not vary with cpus or the two
        # legs run different jobs
        "--num-buckets", "32",
        "--snapshot", f"bench-{cpus}-{tag}",
        "--write-partitions", "64",
    ]
    p = subprocess.run(cmd, capture_output=True, text=True, check=True)
    stats = json.loads(p.stdout.strip().splitlines()[-1])
    shutil.rmtree(wh, ignore_errors=True)
    return stats


def run_scaling(n_conversations: int = 80000, turns_per_conv: int = 100,
                repeats: int = 3) -> dict:
    """North-rule scaling evidence: the SAME end-to-end job
    (parse→enrich→route→aggregate incl. partitioned sink writes) via
    spark-submit --py-files at N and 4N parallelism (local[8] vs
    local[32] — the sandbox proxy for N vs 4N executors) on identical
    deterministic input. Efficiency = (tput_4N / tput_N) / 4.

    Runs are INTERLEAVED (8,32,8,32,...) and best-of-repeats is used:
    this VM shows heavy ambient interference (hypervisor steal time up
    to 15%), and best-of cancels slow outliers that have nothing to do
    with the job. A raw-CPU calibration (multiprocessing busy loop) is
    reported alongside, because the VM itself cannot deliver 4x
    userspace throughput from 8->32 vCPUs; the honest ceiling matters
    when reading the ratio."""
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run([sys.executable, os.path.join(here, "make_pyfiles.py")],
                   check=True, capture_output=True)
    samples: dict[int, list[dict]] = {8: [], 32: []}
    for r in range(repeats):
        for cpus in (8, 32):
            samples[cpus].append(_submit_once(
                here, cpus, n_conversations, turns_per_conv, f"r{r}"))
    runs = {}
    for cpus, ss in samples.items():
        best = min(ss, key=lambda s: s["seconds"])
        runs[cpus] = {"seconds": best["seconds"],
                      "all_seconds": [s["seconds"] for s in ss],
                      "n_input_turns": best["n_input_turns"],
                      "routed_rows": sum(v["n_rows"] for v in best["per_sink_counts"].values()),
                      "turns_per_sec": best["turns_per_sec"]}
    eff = (runs[32]["turns_per_sec"] / runs[8]["turns_per_sec"]) / 4.0
    return {
        "metric": "scaling efficiency e2e pipeline local[8]->local[32] (N vs 4N)",
        "value": round(eff, 3), "unit": "ratio",
        "runs": {f"local{c}": runs[c] for c in (8, 32)},
        "hw_ceiling": _cpu_calibration(),
        "workload": {"n_conversations": n_conversations,
                     "turns_per_conv": turns_per_conv},
    }


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _cpu_calibration() -> dict:
    """Pure-userspace CPU scaling of this VM, 8 vs 32 processes: the
    upper bound any 8->32 Spark measurement can reach here."""
    import multiprocessing as mp

    burn = _burn
    n = 20_000_000
    rates = {}
    for procs in (8, 32):
        t0 = time.time()
        with mp.Pool(procs) as pool:
            pool.map(burn, [n] * procs)
        rates[procs] = procs * n / (time.time() - t0)
    return {"raw_cpu_8to32_efficiency": round((rates[32] / rates[8]) / 4.0, 3)}


def main() -> int:
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
        return 0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run_suite(cpus)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
