"""Deterministic sampling, splitting, mixing and shuffling for
training-data curation.

A pretraining pipeline needs reproducible data selection: the same
corpus + the same seed must yield byte-identical train/val/test
membership on any cluster size, any partitioning, any engine — which
rules out `df.sample()` (partition-dependent RNG) and anything float.
The standard technique is content hashing: a document's fate is a pure
function of (seed, id).

All operators here share one primitive: a 60-bit integer drawn from
md5(seed ':' id). Decisions are made by comparing that integer against
integer thresholds precomputed in Python (`floor(fraction * 2^60)`),
so there is no floating-point anywhere on the data path and the DuckDB
oracles reproduce membership bit-exactly (md5 is the only hash both
engines share; 15 hex chars keeps the value inside a signed 64-bit —
same trick as dedup_simhash, see CLAUDE.md).

Scale shape: every operator is a narrow projection + filter — no
shuffle, no state, no skew surface. `global_shuffle` is the one
exception by design: a reproducible total reorder is exactly one
range-partitioned sort, the same wide dependency Spark uses for
ORDER BY, and the md5 key is uniform so the range partitions are
balanced no matter how skewed the input ids are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit hash space: 15 hex chars, always positive in a signed int64.
HASH_SPACE = 1 << 60


def hash60(id_col: str | Column, seed: str) -> Column:
    """Uniform integer in [0, 2^60) that is a pure function of
    (seed, id) — identical in Spark and DuckDB (md5 on the same
    string rendering)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat_ws(":", F.lit(seed), col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def hash60_sql(id_expr: str, seed: str) -> str:
    """The DuckDB rendering of hash60 for oracle SQL."""
    return ("CAST('0x' || substr(md5('" + seed + ":' || CAST(" + id_expr
            + " AS VARCHAR)), 1, 15) AS BIGINT)")


def deterministic_sample(df: DataFrame, fraction: float, seed: str = "s",
                         id_col: str = "doc_id") -> DataFrame:
    """Keep ~fraction of rows, membership decided per id. Reproducible
    across runs, partitionings and engines; nested samples with the
    same seed (0.1 then 0.5) compose like set intersection."""
    thr = int(fraction * HASH_SPACE)
    return df.where(hash60(id_col, seed) < F.lit(thr))


def deterministic_split(df: DataFrame, weights: dict[str, float],
                        seed: str = "s", id_col: str = "doc_id",
                        split_col: str = "split") -> DataFrame:
    """Partition a corpus into named splits (train/val/test) by
    cumulative hash thresholds. Every row lands in exactly one split;
    weights are normalized so they need not sum to 1. Growing one
    split's weight only MOVES the boundary — documents never hop
    between the surviving splits (the property heldout-set hygiene
    depends on)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    h = hash60(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        thr = int(acc * HASH_SPACE)
        cond = h < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, upper_threshold) pairs for oracle SQL generation — the
    same integer literals deterministic_split compares against."""
    total = float(sum(weights.values()))
    acc, out = 0.0, []
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        out.append((name, int(acc * HASH_SPACE)))
    out.append((names[-1], HASH_SPACE))
    return out


def mix_corpora(parts: dict[str, tuple[DataFrame, float]],
                seed: str = "mix", id_col: str = "doc_id",
                source_col: str = "source") -> DataFrame:
    """Weighted union of corpora: each source is deterministically
    downsampled to its rate and tagged. This is the standard way a
    training mixture ('0.3 web, 0.5 code, 0.2 books') is materialized;
    per-source seeds keep membership independent between sources that
    share ids. Sources must be union-compatible on the selected
    columns."""
    out = None
    for name in sorted(parts):
        df, rate = parts[name]
        s = (deterministic_sample(df, rate, seed=f"{seed}:{name}",
                                  id_col=id_col)
             .withColumn(source_col, F.lit(name)))
        out = s if out is None else out.unionByName(s)
    return out


def domain_cap(df: DataFrame, domain_col: str = "source", k: int = 100,
               id_col: str = "doc_id", seed: str = "cap") -> DataFrame:
    """Keep at most k documents per domain (per-source cap, the
    CommonCrawl-style guard against one host dominating the mixture).
    Which k survive is an unbiased deterministic draw: rank documents
    inside each domain by md5(seed, id) and keep the first k — the same
    content-hash primitive as deterministic_sample, so membership is
    reproducible across runs, partitionings and engines (the id
    tiebreak makes the rank total even under hash collisions).

    Scale shape: one hash-partition + per-group sort on the domain key
    (a window, not a global sort). A pathological mega-domain is one
    partition's sort — if a single domain outgrows an executor, cap it
    in two stages (pre-filter with deterministic_sample at a rate that
    overshoots k, then window the survivors)."""
    from pyspark.sql import Window
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))),
        F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k).drop("_rn"))


def global_shuffle(df: DataFrame, seed: str = "s", id_col: str = "doc_id",
                   key_col: str = "shuffle_key",
                   num_partitions: int | None = None) -> DataFrame:
    """Reproducible global permutation: order the corpus by
    md5(seed, id). Implemented as a range-partitioned sort (one
    shuffle, the same physical shape as ORDER BY): the output files
    hold the permutation in file-then-row order, which is what a
    sequential training reader consumes. The hash key is uniform, so
    range partitions stay balanced even when ids are dense or skewed.
    A new seed is a completely new permutation (epoch reshuffle)."""
    keyed = df.withColumn(
        key_col,
        F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))))
    parted = (keyed.repartitionByRange(num_partitions, key_col)
              if num_partitions else keyed.repartitionByRange(key_col))
    return parted.sortWithinPartitions(key_col)


def budget_head(df: DataFrame, amount_col: str, order_cols: list,
                budget: int, cum_col: str = "cum_amount",
                num_partitions: int | None = None) -> DataFrame:
    """Greedy prefix selection under a global budget: order the corpus
    by `order_cols` (must be a TOTAL order — add a unique id as the
    last key) and keep rows while the running total of `amount_col`
    (inclusive of the current row) stays <= budget. The canonical
    pretraining use: "take the highest-quality documents until the
    token budget is spent".

    The naive Spark spelling — sum() OVER (ORDER BY ...) with no
    partitionBy — funnels the corpus through ONE task. This is the
    distributed two-phase prefix sum instead:
      1. range-partition + sort on the order keys (the same physical
         shape as ORDER BY), localCheckpoint to pin the sampled range
         boundaries so both downstream actions see identical
         partitions;
      2. per-partition totals (one shuffle-free aggregate; collects
         exactly one row per partition) -> exclusive prefix offsets
         on the driver;
      3. prune every partition whose offset already exceeds the
         budget (narrow spark_partition_id filter — at a 1000-way
         sort only the partitions holding the prefix are scanned);
      4. an Arrow-batched cumsum kernel seeded with the partition's
         offset; stops consuming its partition once the budget is
         crossed.

    `amount_col` must be a non-negative integer column (tokens,
    bytes); the emitted `cum_col` is the exact inclusive running
    total, independent of partitioning.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    parted = (df.repartitionByRange(num_partitions, *order_cols)
              if num_partitions else df.repartitionByRange(*order_cols))
    d = parted.sortWithinPartitions(*order_cols).localCheckpoint()

    totals = (d.groupBy(F.spark_partition_id().alias("_pid"))
              .agg(F.sum(F.col(amount_col)).alias("_t")).collect())
    offsets: dict[int, int] = {}
    run = 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = run
        run += int(row["_t"])
    live = [pid for pid, off in offsets.items() if off <= budget]
    max_pid = max(live) if live else -1

    schema = StructType(d.schema.fields + [StructField(cum_col, LongType())])
    amount, bud = amount_col, int(budget)

    def kernel(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        total = offsets.get(pid, 0)
        for pdf in batches:
            cum = pdf[amount].cumsum().astype("int64") + total
            total = int(cum.iloc[-1]) if len(cum) else total
            pdf = pdf.assign(**{cum_col: cum})
            yield pdf[pdf[cum_col] <= bud]
            if total > bud:
                return  # rest of this partition is past the budget

    pruned = d.where(F.spark_partition_id() <= F.lit(max_pid))
    return pruned.mapInPandas(kernel, schema)


def stratified_balance(df: DataFrame, group_col: str,
                       id_col: str = "doc_id", seed: str = "s",
                       k: int | None = None) -> DataFrame:
    """Equalize class sizes: keep at most k rows per group (default:
    the SMALLEST group's size, i.e. perfect balance) picked by the
    deterministic md5 rank — the classifier-training counterpart of
    domain_cap, where the cap is data-derived instead of fixed.

    Scale shape: one tiny per-group count aggregate (|groups| rows,
    broadcast back as a single min scalar when k is data-derived) +
    one window shuffle on the group key. Same mega-group caveat as
    domain_cap: pre-thin with deterministic_sample if one class
    outgrows an executor's sort.
    """
    from pyspark.sql import Window

    if k is None:
        kcol = (df.groupBy(group_col)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(F.min("_n").alias("_k")))
        out = df.crossJoin(F.broadcast(kcol))
    else:
        out = df.withColumn("_k", F.lit(int(k)))
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat_ws(":", F.lit(seed),
                          F.col(id_col).cast("string"))),
        F.col(id_col))
    return (out.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= F.col("_k"))
            .drop("_rn", "_k"))


def mix_temperature(df: DataFrame, source_col: str = "source",
                    size_col: str | None = None,
                    budget: int = 10_000) -> DataFrame:
    """Temperature-scaled source mixing (T = 0.5): per-source quota
    proportional to sqrt(size) — the standard multilingual/multi-
    source rebalancing (size^alpha re-weighting, public methodology
    from the multilingual-LM literature) that up-weights small sources
    without letting one giant corpus drown the mix.

    (source, n_docs, size, weight, share_ppm, quota): weight =
    floor(sqrt(size)) — IEEE sqrt is correctly rounded, so the floor
    is bit-identical in Spark and DuckDB; shares and quotas are
    integral ppm ratios. One map-side-combined aggregate plus a
    broadcast single-row total — no window, no second shuffle. Feed
    `quota` to domain_cap/deterministic_sample to materialize the mix.
    """
    size = (F.sum(size_col) if size_col
            else F.count(F.lit(1))).cast("long")
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        size.alias("size"))
    per = per.withColumn(
        "weight", F.floor(F.sqrt(F.col("size"))).cast("long"))
    tot = per.agg(F.sum("weight").alias("_tw"))
    return (per.crossJoin(F.broadcast(tot))
            .select("source", "n_docs", "size", "weight",
                    F.expr("(weight * 1000000) DIV _tw").cast("long")
                    .alias("share_ppm"))
            .withColumn("quota",
                        F.expr(f"(share_ppm * {int(budget)}) DIV 1000000")
                        .cast("long")))


def global_order(df: DataFrame, order_cols: list,
                 rank_col: str = "rank",
                 num_partitions: int | None = None) -> DataFrame:
    """Contiguous 0-based global rank under a TOTAL order (make
    `order_cols` total — end with a unique id) WITHOUT the
    single-partition window that `row_number() OVER (ORDER BY ...)`
    plans: range-partition + sort (the physical shape of ORDER BY),
    localCheckpoint to pin the sampled range bounds across the two
    actions, per-partition row counts -> exclusive offsets on the
    driver (one row per partition), then an Arrow kernel adds each
    partition's offset to its local positions. The primitive behind
    deterministic training-order assignment (curriculum, resumable
    epoch order): every row learns its exact global position and no
    task ever sees more than its partition.

    Same two-phase machinery as `budget_head` with amount == 1 and no
    early stop; the emitted rank is partitioning-independent, hence
    oracle-checkable against row_number().
    """
    from pyspark.sql.types import LongType, StructField, StructType

    parted = (df.repartitionByRange(num_partitions, *order_cols)
              if num_partitions else df.repartitionByRange(*order_cols))
    d = parted.sortWithinPartitions(*order_cols).localCheckpoint()

    counts = (d.groupBy(F.spark_partition_id().alias("_pid"))
              .agg(F.count(F.lit(1)).alias("_n")).collect())
    offsets: dict[int, int] = {}
    run = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = run
        run += int(row["_n"])

    schema = StructType(d.schema.fields + [StructField(rank_col, LongType())])

    def kernel(batches):
        import numpy as np
        from pyspark import TaskContext
        pos = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            n = len(pdf)
            yield pdf.assign(**{rank_col: np.arange(pos, pos + n,
                                                    dtype="int64")})
            pos += n

    return d.mapInPandas(kernel, schema)


def neyman_allocation(df: DataFrame, stratum_col: str, value_col: str,
                      budget: int) -> DataFrame:
    """Neyman-optimal sample-size allocation: split a sampling budget
    across strata proportionally to N_h * S_h (stratum size times
    standard deviation) — the allocation that minimizes the variance
    of the stratified mean estimator.

    Integer-exact trick: with population sd, N_h * S_h =
    N_h * sqrt(SSD_h) / N_h = sqrt(SSD_h) where SSD_h =
    N_h * sum(x^2) - sum(x)^2 is an exact BIGINT, so each stratum
    needs exactly ONE deterministic-double sqrt + floor; everything
    after (largest-remainder seat distribution: floor quotas, then
    +1 to the largest remainders until the budget is exact) is
    integer arithmetic. sum(alloc_n) == budget always.

    Plan: one grouped aggregate collapses the table to strata; the
    seat distribution runs on the collapsed table (the unpartitioned
    rank window is bounded by the stratum-domain size).
    """
    per = (df.groupBy(F.col(stratum_col).alias("stratum"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.col(value_col).cast("long")).alias("_sx"),
                F.sum(F.col(value_col).cast("long")
                      * F.col(value_col).cast("long")).alias("_sxx"))
           .select("stratum", "n_rows",
                   F.expr("CAST(floor(sqrt(CAST(n_rows * _sxx - "
                          "_sx * _sx AS DOUBLE))) AS BIGINT)")
                   .alias("weight")))
    from pyspark.sql import Window
    per = per.localCheckpoint()  # feeds the total + the rank pass
    tot = per.agg(F.sum("weight").alias("_wt"),
                  F.count(F.lit(1)).cast("long").alias("_ns"))
    quo = (per.crossJoin(F.broadcast(tot))
           .select("stratum", "n_rows", "weight", "_wt",
                   F.expr(f"({budget} * weight) DIV greatest(_wt, 1L)")
                   .alias("_base"),
                   F.expr(f"({budget} * weight) % greatest(_wt, 1L)")
                   .alias("_rem")))
    wrk = Window.orderBy(F.col("_rem").desc(), F.col("stratum").asc())
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    return (quo.withColumn("_rk", F.row_number().over(wrk))
            .withColumn("_left",
                        F.lit(budget) - F.sum("_base").over(wall))
            .select("stratum", "n_rows", "weight",
                    (F.col("_base")
                     + (F.col("_rk") <= F.col("_left")).cast("long"))
                    .alias("alloc_n")))


def raking_weights(df: DataFrame, row_col: str, col_col: str,
                   rounds: int = 2) -> DataFrame:
    """Iterative proportional fitting (raking), `rounds` alternating
    adjustments, toward UNIFORM marginals on two attributes — the
    survey-weighting move that reweights a biased corpus to match a
    target joint-marginal profile (e.g. lang x source balance)
    without per-cell targets.

    Integer-exact: weights are x1e6 fixed point; each round computes
    per-level achieved mass M = sum(n * w) and multiplies member
    cells by (T * 1e6) DIV M where T = total_mass / n_levels — the
    DIV truncation is the cross-engine contract. Rounds are unrolled
    (2 by default, the standard "one sweep" of IPF), so the oracle
    mirrors them as two joins, no recursion.

    Everything runs on the COLLAPSED cell table (one row per
    (row_col, col_col) pair); the raw corpus is scanned once.
    Output: cell, n, w_x1e6 plus each round's factor for audit.
    """
    cells = (df.groupBy(F.col(row_col).alias("r"),
                        F.col(col_col).alias("c"))
             .agg(F.count(F.lit(1)).cast("long").alias("n"))
             .localCheckpoint())
    w = F.lit(1000000).cast("long")
    cur = cells.select("r", "c", "n", w.alias("w"))
    for rnd in range(rounds):
        dim = "r" if rnd % 2 == 0 else "c"
        mass = cur.groupBy(dim).agg(
            F.sum(F.col("n") * F.col("w")).alias("_m"))
        tot = cur.agg(F.sum(F.col("n") * F.col("w")).alias("_t"),
                      F.count_distinct(F.col(dim)).alias("_k"))
        cur = (cur.join(F.broadcast(mass), dim)
               .crossJoin(F.broadcast(tot))
               .select("r", "c", "n",
                       F.expr("(w * ((_t DIV _k) * 1000000 DIV _m)) "
                              "DIV 1000000").cast("long").alias("w")))
    return cur.select(F.col("r").alias(row_col),
                      F.col("c").alias(col_col), "n",
                      F.col("w").alias("w_x1e6"))
