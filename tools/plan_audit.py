"""Physical-plan audit over every contract query.

Prints one line per query: exchange count, sort count, whether any
cartesian/broadcast-nested-loop join appears (should be NONE outside
the explicitly-quadratic *_exact verification modes, documented
fallbacks and SINGLE-ROW scalar cross joins — every current flag is
one of those), and the table-scan count (plans are pre-AQE, so
whole-stage-codegen wrapping is not yet visible). The
shuffle-inventory numbers quoted in SCALE.md come from this tool.

Usage:
    python tools/plan_audit.py [sf_dir]            # default sf0.001
    python tools/plan_audit.py sf0.01 sim_ pipe_   # prefix filters
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logging_spark.session import build_session  # noqa: E402
from logging_spark import contract  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.001"
    if not sf.startswith("/"):
        sf = f"/root/testdata/{sf}"
    prefixes = tuple(args[1:])

    spark = build_session(app_name="plan-audit", cores=4,
                          shuffle_partitions=8)
    contract.set_memo(False)  # audit the real per-query plans
    queries = contract.build_queries()

    rows = []
    for name, fn in sorted(queries.items()):
        if prefixes and not name.startswith(prefixes):
            continue
        try:
            plan = fn(spark, sf)._jdf.queryExecution() \
                                     .executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit keeps going
            rows.append((name, "-", "-", "-", "-", f"ERROR {exc}"))
            continue
        # count true shuffle exchanges only: "Exchange hash/range/
        # SinglePartition" — NOT BroadcastExchange (no shuffle) and
        # NOT ReusedExchange (already counted once)
        import re
        shuffles = len(re.findall(
            r"(?<![A-Za-z])Exchange (?:hashpartitioning|"
            r"rangepartitioning|SinglePartition)", plan))
        rows.append((
            name,
            shuffles,
            plan.count("Sort "),
            plan.count("CartesianProduct")
            + plan.count("BroadcastNestedLoopJoin"),
            plan.count("Scan parquet") + plan.count("Scan ExistingRDD"),
            "",
        ))

    if not rows:
        print(f"no contract query matches prefixes {prefixes}")
        spark.stop()
        return
    w = max(len(r[0]) for r in rows) + 2
    print(f"{'query':<{w}}{'exch':>5}{'sort':>6}{'cart':>6}{'scan':>6}")
    for name, ex, so, ca, cg, err in rows:
        flag = " <-- cartesian!" if isinstance(ca, int) and ca > 0 else ""
        print(f"{name:<{w}}{ex:>5}{so:>6}{ca:>6}{cg:>6}{flag}{err}")
    spark.stop()


if __name__ == "__main__":
    main()
