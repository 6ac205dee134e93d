"""Enrichment: broadcast left join of turns against the metadata
dimension, with default-on-miss coalescing.

Reference semantics: pods supply {namespace, pod, node, service,
ips[]} metadata keyed by label selector (pkg/api/pod.go:37-62,
pkg/service/service.go:180-201); a missing Filter/metadata object
falls back to defaults rather than dropping the row
(pkg/service/service.go:130-144, pkg/api/server.go:100-108).

Scale: the dimension is small relative to the fact table (pods vs
log lines; lookup pairs vs 10^12 turns) -> F.broadcast, no shuffle
of the fact side. If the dimension ever outgrows broadcast range,
drop the hint and let AQE pick; the join stays an equi-join on
(conv_id, tool).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULTS = {
    "namespace": "default",
    "pod_name": "unknown",
    "node_name": "unknown",
    "service_name": "unknown",
}


def enrich(turns: DataFrame, lookup: DataFrame, broadcast: bool = True) -> DataFrame:
    """Left-join metadata on (conv_id, tool); null-tool rows (the
    missing-`app`-label analog, pod.go:32-35) never match and keep
    defaults. Dimension-side columns are pruned to what we attach."""
    dim = lookup.select("conv_id", "tool", "namespace", "pod_name",
                        "node_name", "service_name")
    if broadcast:
        dim = F.broadcast(dim)
    joined = turns.join(dim, on=["conv_id", "tool"], how="left")
    for col, default in DEFAULTS.items():
        joined = joined.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return joined
