"""Generate CONTRACT_INVENTORY.md from the live registry.

The inventory is derived from __spark_entry__.queries()/oracle_sql()
at generation time, so it cannot drift from the code the way a
hand-maintained table can. Run after adding contract queries:

    python tools/contract_inventory.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

FAMILY_ORDER = [
    ("pipe_", "Reference pipeline (parse/enrich/route/dedup/aggregate)"),
    ("tpch_", "Relational / TPC-H join shapes"),
    ("agg_", "Aggregation shapes"),
    ("dim_", "Dimensional rollups"),
    ("window_", "Window functions"),
    ("events_", "Event analytics / time series / sessions"),
    ("docs_", "Corpus curation / dedup chains / ranking"),
    ("dedup_", "Text dedup family"),
    ("text_", "Text analysis functions"),
    ("sample_", "Deterministic sampling family"),
    ("sim_", "Embedding similarity / ANN / training samplers"),
    ("mm_", "Multimodal"),
    ("audit_", "Audit / fingerprints"),
    ("dq_", "Data-quality expectations"),
]


def main() -> None:
    queries = sorted(entry.queries())
    oracles = entry.oracle_sql()
    fams: dict[str, list[str]] = defaultdict(list)
    for q in queries:
        for prefix, _ in FAMILY_ORDER:
            if q.startswith(prefix):
                fams[prefix].append(q)
                break
        else:
            fams["_other"].append(q)

    n_oracle = sum(1 for q in queries if q in oracles)
    lines = [
        "# Contract inventory (auto-generated — do not edit)",
        "",
        f"Regenerate with `python tools/contract_inventory.py`.",
        "",
        f"**{len(queries)} queries, {n_oracle} DuckDB-oracle value-checked,"
        f" {len(queries) - n_oracle} rows-only by design** (xxhash64"
        " production twins and collision-tolerant variants whose exact"
        " md5 twins ARE value-checked).",
        "",
    ]
    for prefix, title in FAMILY_ORDER + [("_other", "Other")]:
        qs = fams.get(prefix, [])
        if not qs:
            continue
        n_o = sum(1 for q in qs if q in oracles)
        lines.append(f"## {title} ({len(qs)} queries, {n_o} oracle-checked)")
        lines.append("")
        for q in qs:
            mark = "★" if q in oracles else "○ rows-only"
            lines.append(f"- `{q}` {mark}")
        lines.append("")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CONTRACT_INVENTORY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"{out}: {len(queries)} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
