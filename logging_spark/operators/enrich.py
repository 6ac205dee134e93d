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


AUTO_BROADCAST_MAX_ROWS = 5_000_000  # ~500 MB of dim rows; beyond this
# a forced broadcast evicts executor memory and the shuffle join wins

# "auto" decision cache: (applicationId, dim plan's semanticHash) ->
# row count. A pipeline run (and the bench loop) calls enrich with the
# SAME dimension plan many times; without this each call pays a full
# dim scan just to re-learn the size. Keyed on the SEMANTIC hash, so
# re-built-but-identical plans hit. Staleness (same plan, files grown
# underneath within one session) can only mis-pick the join strategy,
# never affect results.
_DIM_SIZE_CACHE: dict[tuple[str, int], int] = {}


def _dim_rows(dim: DataFrame, dim_rows: int | None) -> int:
    if dim_rows is not None:
        return dim_rows
    try:
        key = (dim.sparkSession.sparkContext.applicationId, dim.semanticHash())
    except Exception:  # pragma: no cover — semanticHash unsupported
        return dim.count()
    if key not in _DIM_SIZE_CACHE:
        _DIM_SIZE_CACHE[key] = dim.count()
    return _DIM_SIZE_CACHE[key]


def enrich(turns: DataFrame, lookup: DataFrame,
           broadcast: bool | str = "auto",
           dim_rows: int | None = None) -> DataFrame:
    """Left-join metadata on (conv_id, tool); null-tool rows (the
    missing-`app`-label analog, pod.go:32-35) never match and keep
    defaults. Dimension-side columns are pruned to what we attach.

    broadcast: True forces a broadcast join, False leaves the strategy
    to Catalyst/AQE (shuffle join for big dims), "auto" (default)
    counts the dim once PER SESSION (cached on the dim plan's semantic
    hash; pass `dim_rows` when the caller already knows the size, e.g.
    from catalog metadata/file footers) and broadcasts only when it
    fits. At pod-inventory scale the dim always broadcasts; at
    10^12-turn scale with ~10^9 conversations the dim side outgrows
    any executor and MUST shuffle, which "auto" gets right without the
    caller knowing the size."""
    dim = lookup.select("conv_id", "tool", "namespace", "pod_name",
                        "node_name", "service_name")
    if broadcast == "auto":
        broadcast = _dim_rows(dim, dim_rows) <= AUTO_BROADCAST_MAX_ROWS
    if broadcast:
        dim = F.broadcast(dim)
    joined = turns.join(dim, on=["conv_id", "tool"], how="left")
    for col, default in DEFAULTS.items():
        joined = joined.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return joined
