"""Distributed Lloyd k-means over an embedding column — integer-exact.

The SemDeDup/IVF curation primitive: partition a 10^9-vector embedding
table into k semantic cells (then dedup / sample / balance WITHIN each
cell). `similarity.ivf_topk` already trains float centroids on a
DRIVER-SIDE sample (`_kmeans_centroids`) — fine for routing, but its
float argmin near a Voronoi boundary is summation-order dependent, so
it can't be oracle-checked. This operator is the distributed,
INTEGER-exact tier (the same two-tier pattern as
`embedding_near_duplicates`'s `exact=True`): components are quantized
floor(x * scale) -> BIGINT, every distance is exact integer
arithmetic, assignment ties break on centroid id — bit-identical in
any engine, so a DuckDB oracle can unroll the rounds.

Shapes (rounds = R, k centroids, dim d):
- vectors live in LONG FORM (vec_id, pos, val) — one posexplode at the
  scan, localCheckpoint-pinned because every round re-reads it (the
  link_prediction lesson: Spark re-executes shared lazy subtrees).
- assignment: pts x broadcast(centroids-long) joined ON pos — a k-way
  fan-out of the d-row-per-vector frame, then one (vec_id, cid) sum
  and a windowless argmin (min over (dist, cid) structs, the repo's
  global-argmax trick — no per-vector row_number window).
- update: assignment joined back to pts, one (cluster, pos) groupBy;
  new centroid component = sum(val) DIV count (integer mean).
Per round: two shuffles, both on uniform keys; centroids stay tiny
(k*d rows) and ride a broadcast. Overflow budget: with scale = 1e4
and |x| <= 1, per-dim squared diff <= 4e8, per-pair distance <= 4e8*d;
inertia sums over n vectors — keep n * 4e8 * d < 2^63 (documented;
at 1e9 vectors and d = 64 the inertia sum peaks ~2.6e19: report
per-cluster inertia, never a single global sum, past ~1e8 vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logging_spark.functions.expr import let

QUANT = 10_000


def quantized_points(vectors: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     scale: int = QUANT) -> DataFrame:
    """(id, pos, val): long-form quantized components. pos is
    1-based to match SQL generate_subscripts."""
    q = F.transform(F.col(vec_col),
                    lambda x: F.floor(x.cast("double") * scale)
                    .cast("long"))
    return (vectors.select(F.col(id_col), F.posexplode(q)
                           .alias("_p0", "val"))
            .select(id_col, (F.col("_p0") + 1).alias("pos"), "val"))


def kmeans_assign(vectors: DataFrame, k: int = 4, rounds: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  scale: int = QUANT) -> DataFrame:
    """(id, cluster, dist): Voronoi assignment after `rounds` Lloyd
    iterations from deterministic seeds (ids 0..k-1 — assumes dense
    vector ids, like similarity.negative_samples' checked default;
    with sparse ids remap upstream or fewer seeds silently apply).
    dist is the exact integer squared L2 distance to the winning
    centroid at the FINAL assignment. rounds >= 1."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    pts = quantized_points(vectors, id_col=id_col, vec_col=vec_col,
                           scale=scale).localCheckpoint(eager=False)
    cent = (pts.where(F.col(id_col) < k)
            .select(F.col(id_col).alias("cid"), "pos",
                    F.col("val").alias("cval")))
    assign = None
    for r in range(rounds):
        d = (pts.join(F.broadcast(cent), "pos")
             .groupBy(id_col, "cid")
             .agg(F.sum((F.col("val") - F.col("cval"))
                        * (F.col("val") - F.col("cval")))
                  .cast("long").alias("dist")))
        m = (d.groupBy(id_col)
             .agg(F.min(F.struct("dist", "cid")).alias("_m")))
        assign = m.select(id_col, F.col("_m.cid").alias("cluster"),
                          F.col("_m.dist").alias("dist"))
        if r < rounds - 1:
            cent = (assign.join(pts, id_col)
                    .groupBy("cluster", "pos")
                    .agg(F.expr("CAST(sum(val) AS BIGINT) DIV count(*)")
                         .alias("cval"))
                    .select(F.col("cluster").alias("cid"), "pos", "cval"))
    return assign


def kmeans_summary(vectors: DataFrame, k: int = 4, rounds: int = 2,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   scale: int = QUANT) -> DataFrame:
    """(cluster, n, inertia): cell sizes + exact per-cluster inertia —
    the audit row a curation run logs per k-means pass."""
    a = kmeans_assign(vectors, k=k, rounds=rounds, id_col=id_col,
                      vec_col=vec_col, scale=scale)
    return (a.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("dist").cast("long").alias("inertia")))


def semdedup_summary(vectors: DataFrame, k: int = 4, rounds: int = 2,
                     sim_p: int = 2, sim_q: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     sim_scale: int = 1_000) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embedding space into
    semantic cells, then WITHIN each cell drop every vector that has
    an earlier (lower-id) cell-mate with cosine >= sim_p/sim_q — the
    first-wins convention shared with embedding_near_duplicates.
    Returns (cluster, n, n_dropped).

    The similarity test is integer-exact: components quantized at
    `sim_scale` (1e3, NOT the assignment's 1e4 — the threshold test
    squares the dot product, and (d * q)^2 must stay inside int64:
    with |x|<=1, dim<=64, d <= 64e6, so q^2 d^2 <= 25 * 4.1e15 ~ 1e17),
    and cos >= p/q decided as d > 0 AND q^2 d^2 >= p^2 na nb — no
    sqrt, no float, oracle-mirrorable. numpy int64 matmul is exact at
    these magnitudes, so the Arrow kernel below returns the SAME
    integers as the expression/SQL spelling (the oracle unrolls it).

    Scale shape: the quadratic work is per-cell (that's the POINT of
    SemDeDup — k grows with n so cells stay bounded); ONE shuffle on
    cluster id groups each cell into an Arrow kernel that computes
    the Gram matrix blockwise (int64 MACs in C, row blocks of 1024 so
    peak memory is O(block x m), never O(m^2)). The first draft's
    pair self-join evaluated an interpreted zip_with per pair —
    ~200M interpreted ops at 5k vectors, 4.7 s; the kernel does the
    same integer math in ~0.3 s."""
    import numpy as np
    import pandas as pd

    assign = kmeans_assign(vectors, k=k, rounds=rounds, id_col=id_col,
                           vec_col=vec_col)
    qv = F.transform(F.col(vec_col),
                     lambda x: F.floor(x.cast("double") * sim_scale)
                     .cast("long"))
    v = (vectors.select(F.col(id_col), qv.alias("qv"))
         .join(assign.select(id_col, "cluster"), id_col))
    p2, q2 = sim_p * sim_p, sim_q * sim_q

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        mat = np.asarray(
            [np.asarray(r, dtype=np.int64) for r in pdf["qv"]])
        m = len(pdf)
        nn = (mat * mat).sum(axis=1)
        dropped = np.zeros(m, dtype=bool)
        idx = np.arange(m)
        for s in range(0, m, 1024):
            blk = mat[s:s + min(1024, m - s)]
            d = blk @ mat.T                       # int64, exact
            cond = (d > 0) & (q2 * d * d >= p2
                              * np.outer(nn[s:s + blk.shape[0]], nn))
            # j is dropped if some i < j (globally) is similar
            later = idx[None, :] > (s + np.arange(blk.shape[0]))[:, None]
            dropped |= (cond & later).any(axis=0)
        return pd.DataFrame({"cluster": [int(pdf["cluster"].iloc[0])],
                             "n": [m], "n_dropped": [int(dropped.sum())]})

    return v.groupBy("cluster").applyInPandas(
        kernel, "cluster long, n long, n_dropped long")


def centroid_affinity(points: DataFrame, group_df: DataFrame,
                      id_col: str = "vec_id",
                      group_col: str = "group") -> DataFrame:
    """Pairwise cosine between GROUP centroids — the cross-corpus
    semantic-affinity matrix used to design data mixtures ("which
    sources overlap in embedding space?"). Input is quantized_points
    long form + an (id, group) map.

    Everything collapses before anything pairs: points reduce to
    |groups| x dims centroid rows (integer mean per dimension, the
    only data-sized shuffle), and the pair join runs on that tiny
    table (g_a < g_b upper triangle). Dots/norms are exact BIGINTs
    (|mean| <= QUANT=1e4, so 64 dims tops out at 6.4e9 — far inside
    2^53, hence the final cosine is deterministic-double class: exact
    integer inputs, identically-parenthesized IEEE /,*,sqrt, one
    floor). With 10^4 groups the pair table is 5e7 rows of pure
    arithmetic — still no row of ORIGINAL data involved.

    Output: group_a, group_b, dot, norm_a, norm_b (exact integers),
    cos_x1e6.
    """
    pts = points.join(group_df.select(F.col(id_col),
                                      F.col(group_col).alias("_g")),
                      id_col)
    cent = (pts.groupBy("_g", "pos")
            .agg(F.expr("CAST(sum(val) AS BIGINT) DIV count(*)")
                 .alias("m"))
            .localCheckpoint())  # feeds pairs AND self-norms once
    a = cent.select(F.col("_g").alias("group_a"), "pos",
                    F.col("m").alias("ma"))
    b = cent.select(F.col("_g").alias("group_b"), "pos",
                    F.col("m").alias("mb"))
    # centroids and norms are |groups|-scale — broadcast them so the
    # pair expansion and the norm attach never sort-merge (plan
    # audit: 7 exchanges / 6 sorts -> 1 / 0)
    dots = (a.join(F.broadcast(b), "pos")
            .where(F.col("group_a") < F.col("group_b"))
            .groupBy("group_a", "group_b")
            .agg(F.sum(F.col("ma") * F.col("mb")).cast("long")
                 .alias("dot")))
    norms = (cent.groupBy(F.col("_g"))
             .agg(F.sum(F.col("m") * F.col("m")).cast("long")
                  .alias("nrm")))
    out = (dots
           .join(F.broadcast(norms.select(
               F.col("_g").alias("group_a"),
               F.col("nrm").alias("norm_a"))), "group_a")
           .join(F.broadcast(norms.select(
               F.col("_g").alias("group_b"),
               F.col("nrm").alias("norm_b"))), "group_b"))
    cos = ("CAST(floor((CAST(dot AS DOUBLE) * 1000000.0) / "
           "(sqrt(CAST(norm_a AS DOUBLE)) * "
           "sqrt(CAST(norm_b AS DOUBLE)))) AS BIGINT)")
    return out.select("group_a", "group_b", "dot", "norm_a", "norm_b",
                      F.expr(f"CASE WHEN norm_a = 0 OR norm_b = 0 "
                             f"THEN 0 ELSE {cos} END").alias("cos_x1e6"))
