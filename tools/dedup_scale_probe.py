"""Dedup-family scale probe: candidate-count and wall-time growth of
the near-dup operators on a synthetic documents corpus at 1x / 3x /
10x the sf0.1 size (round-4 verdict item 6).

The caps that make these operators survive 100 TB (`max_bucket`
bucket anti-join, `max_doc_freq` hot-shingle drop, prefix filtering)
were argued and plan-tested but only ever MEASURED at sf0.1 (~5k
docs). This probe materializes `synth.documents` (planted exact +
near dups, deterministic at any size) at several sizes and reports
per-operator seconds and candidate counts; healthy behavior is
~linear growth in docs — quadratic pair blowup means a cap failed.

Writes bench_results/dedup_scale_<stamp>.json and prints one JSON
line. Usage:
    python tools/dedup_scale_probe.py [sizes ...]   # default 5000 15000 50000
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logging_spark.session import build_session  # noqa: E402
from logging_spark import synth  # noqa: E402
from logging_spark.operators.textdedup import (  # noqa: E402
    containment_pairs, jaccard_threshold_pairs, lsh_candidate_pairs)


def probe(spark, n_docs: int, repeats: int = 2) -> dict:
    out_dir = tempfile.mkdtemp(prefix=f"dedupscale_{n_docs}_",
                               dir="/dev/shm" if os.path.isdir("/dev/shm")
                               else None)
    path = os.path.join(out_dir, "documents.parquet")
    synth.documents(spark, n_docs=n_docs).coalesce(4) \
        .write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)

    ops = {
        # xxhash64 production twin: the md5 path is the oracle's
        "lsh_candidate_pairs": lambda d: lsh_candidate_pairs(
            d, portable=False),
        # 4 rows/band: at 50k docs the r=2 default's per-pair band
        # false-positive rate compounds with n^2 and candidates read
        # ~18x for 10x docs; r=4 collapses that back to ~linear —
        # the knob a 100 TB run would turn
        "lsh_candidate_pairs_r4": lambda d: lsh_candidate_pairs(
            d, num_perm=16, bands=4, portable=False),
        "jaccard_threshold_pairs": lambda d: jaccard_threshold_pairs(
            d, t_pct=50),
        "containment_pairs": lambda d: containment_pairs(d),
    }
    res = {"docs": n_docs}
    for name, fn in ops.items():
        times, pairs = [], None
        for _ in range(repeats):
            t0 = time.time()
            pairs = fn(df).count()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        res[name] = {"seconds": min(times), "pairs": pairs}
    return res


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [5000, 15000, 50000]
    spark = build_session(app_name="dedup-scale", cores=int(
        os.environ.get("SPARK_GRAFT_CPUS", "16")),
        shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [probe(spark, n) for n in sizes]
    spark.stop()

    # growth ratios vs the smallest size (ideal = docs ratio, i.e.
    # linear; >> docs ratio means quadratic pair expansion)
    base = rows[0]
    growth = {}
    for op in ("lsh_candidate_pairs", "lsh_candidate_pairs_r4",
               "jaccard_threshold_pairs", "containment_pairs"):
        growth[op] = [
            {"docs_x": round(r["docs"] / base["docs"], 2),
             "pairs_x": round(r[op]["pairs"] / max(base[op]["pairs"], 1), 2),
             "secs_x": round(r[op]["seconds"]
                             / max(base[op]["seconds"], 1e-9), 2)}
            for r in rows]
    out = {"metric": "dedup-family scale probe (candidates + seconds "
                     "vs corpus size; linear growth expected)",
           "sizes": rows, "growth_vs_smallest": growth}
    here = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_results")
    os.makedirs(here, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    for name in (f"dedup_scale_{stamp}.json", "dedup_scale_latest.json"):
        with open(os.path.join(here, name), "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
