"""Fixed-point integer PageRank over a pair graph.

Second iterative graph operator next to connected components
(operators/cluster.py): where CC answers "which docs are the same
family", PageRank ranks centrality INSIDE the near-duplicate graph —
the classic signal for picking the canonical copy of boilerplate
(the most-linked variant) and for weighting crawl frontier URLs.

All arithmetic is fixed-point integer so the result is bit-identical
on any engine and any partitioning: ranks are scaled longs, the
per-neighbor share is integer division (`div`), and the damping step
is (d * sum) div 100 — no float anywhere. That is what makes this
oracle-checkable where textbook float PageRank is not.

Scale shape: the degree-annotated undirected edge list is built once
and localCheckpointed (it is the static side of every iteration);
each iteration is one equi-join (edges ⨝ ranks on src) + one
hash-partition sum on dst — the same two wide deps Pregel-style
engines pay. Ranks are localCheckpointed per round to truncate
lineage (the cluster.py pattern). Iterations are fixed-count (a
training-data pipeline wants a deterministic budget, not a
convergence race).

Dangling nodes cannot exist here: the graph is symmetrized, so every
node has degree >= 1 and receives at least one message per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_integer(pairs: DataFrame, src: str = "doc_a",
                     dst: str = "doc_b", iterations: int = 3,
                     scale: int = 1_000_000,
                     damping_pct: int = 85) -> DataFrame:
    """(node, pr, deg) after `iterations` rounds over the symmetrized
    pair graph; pr starts at `scale` for every node."""
    und = (pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
           .union(pairs.select(F.col(dst).alias("s"),
                               F.col(src).alias("d")))
           .distinct())
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    und_deg = und.join(deg, "s").localCheckpoint()

    ranks = deg.select(F.col("s").alias("node"),
                       F.lit(int(scale)).cast("long").alias("pr"))
    base = (100 - damping_pct) * scale // 100
    for _ in range(int(iterations)):
        msgs = (und_deg.join(ranks, und_deg["s"] == ranks["node"])
                .select(F.col("d").alias("node"),
                        F.expr("pr div deg").alias("c")))
        ranks = (msgs.groupBy("node")
                 .agg(F.expr(
                     f"CAST({base} + (({damping_pct} * sum(c)) div 100)"
                     " AS BIGINT)").alias("pr"))
                 .localCheckpoint())
    return (ranks.join(deg, ranks["node"] == deg["s"])
            .select("node", "pr", "deg"))
